package graft.ops

/** A REAL (not stubbed) minimal RIFF/WAVE codec for PCM audio — the first
  * de-stubbed entry of the [[Multimodal]] codec layer. The container ships
  * no audio libraries, but WAV is a 44-byte header over raw PCM, so parsing
  * and writing it needs nothing beyond byte arithmetic; the format is the
  * public RIFF/WAVE spec (chunked: `RIFF<size>WAVE`, then `fmt ` and `data`
  * chunks, little-endian).
  *
  * The parser walks the chunk list (tolerating extra chunks like `LIST` and
  * odd-size padding per spec), validates magics and the PCM format tag, and
  * derives frame count and duration from `data` size / block align — so a
  * wrong chunk walk cannot produce a right answer. `sumSamples` reduces the
  * 16-bit PCM payload itself, proving the parser located the data chunk
  * bytes, not just the header fields.
  */
object WavCodec {

  /** Parsed header facts plus a payload reduction (sum of 16-bit samples). */
  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nFrames: Long, durationMs: Long, sumSamples: Long)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a PCM WAV byte array. Fails loudly on a non-WAV or non-PCM
    * payload — quarantine callers should catch. */
  def parse(bytes: Array[Byte]): WavInfo = {
    require(bytes.length >= 44, s"not a WAV: ${bytes.length} bytes < minimal header")
    require(ascii(bytes, 0, 4) == "RIFF", "not a WAV: missing RIFF magic")
    require(ascii(bytes, 8, 4) == "WAVE", "not a WAV: missing WAVE form type")
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0; var blockAlign = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= bytes.length) {
      val id = ascii(bytes, pos, 4)
      val size = le32(bytes, pos + 4)
      // Long arithmetic: a crafted size near Int.MaxValue must trip this
      // guard, not wrap `pos + 8 + size` negative and sneak past it
      require(size >= 0 && pos.toLong + 8L + size.toLong <= bytes.length,
        s"corrupt WAV: chunk '$id' size $size overruns ${bytes.length}-byte payload")
      id match {
        case "fmt " =>
          require(size >= 16, s"corrupt WAV: fmt chunk size $size < 16")
          val audioFormat = le16(bytes, pos + 8)
          require(audioFormat == 1, s"unsupported WAV: format tag $audioFormat (only PCM=1)")
          channels = le16(bytes, pos + 10)
          sampleRate = le32(bytes, pos + 12)
          blockAlign = le16(bytes, pos + 20)
          bits = le16(bytes, pos + 22)
        case "data" =>
          dataOff = pos + 8; dataLen = size
        case _ => () // LIST/INFO/etc.: skipped per spec
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned; odd sizes pad
    }
    require(sampleRate > 0 && channels > 0 && bits > 0 && blockAlign > 0,
      "corrupt WAV: no fmt chunk before end of payload")
    require(dataOff >= 0, "corrupt WAV: no data chunk")
    val nFrames = dataLen.toLong / blockAlign
    var sum = 0L
    if (bits == 16) {
      var i = dataOff
      val end = dataOff + dataLen - 1
      while (i < end) { sum += le16(bytes, i).toShort.toLong; i += 2 }
    }
    WavInfo(sampleRate, channels, bits, nFrames,
      nFrames * 1000L / sampleRate, sum)
  }

  /** Write a mono-interleavable PCM-16 WAV from samples. */
  def write(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, "sampleRate and channels must be positive")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not tile $channels channels")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putAscii(i: Int, s: String): Unit = {
      var j = 0; while (j < s.length) { out(i + j) = s.charAt(j).toByte; j += 1 }
    }
    def put16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def put32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    putAscii(0, "RIFF"); put32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); put32(16, 16); put16(20, 1); put16(22, channels)
    put32(24, sampleRate); put32(28, sampleRate * channels * 2)
    put16(32, channels * 2); put16(34, 16)
    putAscii(36, "data"); put32(40, dataLen)
    var i = 0
    while (i < samples.length) { put16(44 + i * 2, samples(i).toInt); i += 1 }
    out
  }
}
