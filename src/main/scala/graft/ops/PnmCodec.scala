package graft.ops

/** A REAL (not stubbed) minimal Netpbm codec for binary PPM (`P6`, RGB) and
  * PGM (`P5`, grayscale) images — the image half of the [[Multimodal]] codec
  * layer, de-stubbed the same way [[WavCodec]] de-stubbed audio. The
  * container ships no imaging libraries, but Netpbm is a public text header
  * over raw interleaved samples, so a full parser, writer and resampler need
  * nothing beyond byte arithmetic.
  *
  * The parser consumes the magic, then reads width/height/maxval as
  * whitespace-separated ASCII tokens with `#`-to-end-of-line comments legal
  * between (and inside) them per the spec, then exactly one whitespace byte
  * before the raster. `sumPixels` reduces the raster itself, so a header
  * that lies about dimensions, or a walk that misses the raster offset,
  * cannot produce a matching payload sum. Resize is a real nearest-neighbor
  * resampler over decoded pixels (source index `sy = ty*h/th`,
  * `sx = tx*w/tw`), re-encoded by the writer — not a byte truncation.
  */
object PnmCodec {

  /** A decoded image: `channels` is 3 for P6 (RGB) or 1 for P5 (gray);
    * `pixels` is the row-major interleaved raster, one byte per sample
    * (maxval ≤ 255 only — 2-byte-sample Netpbm is rejected loudly). */
  final case class PnmImage(width: Int, height: Int, channels: Int,
                            maxval: Int, pixels: Array[Byte]) {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(channels == 1 || channels == 3, s"channels must be 1 or 3, got $channels")
    require(maxval > 0 && maxval <= 255, s"maxval $maxval out of byte range")
    require(pixels.length == width * height * channels,
      s"raster ${pixels.length} bytes != ${width}x${height}x$channels")

    /** Payload reduction proving raster location + length, per [[WavCodec]]'s
      * `sumSamples` discipline. */
    def sumPixels: Long = {
      var s = 0L; var i = 0
      while (i < pixels.length) { s += pixels(i) & 0xff; i += 1 }
      s
    }
  }

  private final class HeaderScanner(bytes: Array[Byte]) {
    var pos = 0
    private def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b
    /** Skip whitespace and `#` comments (comment runs to end of line). */
    def skipWsAndComments(): Unit = {
      var advancing = true
      while (advancing && pos < bytes.length) {
        if (isWs(bytes(pos))) pos += 1
        else if (bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n' && bytes(pos) != '\r') pos += 1
        } else advancing = false
      }
    }
    def nextInt(what: String): Int = {
      skipWsAndComments()
      val start = pos
      var v = 0L
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        require(v <= Int.MaxValue, s"corrupt PNM: $what overflows Int")
        pos += 1
      }
      require(pos > start, s"corrupt PNM: expected integer $what at offset $start")
      v.toInt
    }
    /** Exactly one whitespace byte separates maxval from the raster. */
    def consumeRasterSeparator(): Unit = {
      require(pos < bytes.length && isWs(bytes(pos)),
        "corrupt PNM: missing whitespace before raster")
      pos += 1
    }
  }

  /** Parse a binary PPM/PGM byte array. Fails loudly on non-Netpbm input,
    * 2-byte-sample maxval, or a short raster — quarantine callers catch. */
  def parse(bytes: Array[Byte]): PnmImage = {
    require(bytes.length >= 2, s"not a PNM: ${bytes.length} bytes")
    require(bytes(0) == 'P' && (bytes(1) == '5' || bytes(1) == '6'),
      "not a binary PNM: missing P5/P6 magic")
    val channels = if (bytes(1) == '6') 3 else 1
    val sc = new HeaderScanner(bytes)
    sc.pos = 2
    val w = sc.nextInt("width")
    val h = sc.nextInt("height")
    val maxval = sc.nextInt("maxval")
    require(maxval > 0 && maxval <= 255,
      s"unsupported PNM: maxval $maxval (only 1-byte samples)")
    sc.consumeRasterSeparator()
    val n = w.toLong * h * channels
    require(n <= Int.MaxValue && sc.pos + n <= bytes.length,
      s"corrupt PNM: raster needs $n bytes, have ${bytes.length - sc.pos}")
    PnmImage(w, h, channels, maxval,
      java.util.Arrays.copyOfRange(bytes, sc.pos, sc.pos + n.toInt))
  }

  /** Write a binary PPM (channels=3) or PGM (channels=1). */
  def write(img: PnmImage): Array[Byte] = {
    val magic = if (img.channels == 3) "P6" else "P5"
    val header = s"$magic\n${img.width} ${img.height}\n${img.maxval}\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
    out
  }

  /** Nearest-neighbor resample to `tw`x`th`: target pixel (ty,tx) copies
    * source pixel (ty*h/th, tx*w/tw), all channels. Real decoded-pixel
    * work — the formula is the oracle-reproducible contract. */
  def resize(img: PnmImage, tw: Int, th: Int): PnmImage = {
    require(tw > 0 && th > 0, s"resize target must be positive; got ${tw}x$th")
    val ch = img.channels
    // Long guard: a 50000x50000x3 target would wrap tw*th*ch around Int and
    // allocate a short raster whose wrapped indices "work" — fail instead
    val size = tw.toLong * th.toLong * ch.toLong
    require(size <= Int.MaxValue,
      s"resize target ${tw}x$th x$ch needs $size bytes (exceeds array bounds)")
    val out = new Array[Byte](size.toInt)
    var ty = 0
    while (ty < th) {
      val sy = ty * img.height / th
      var tx = 0
      while (tx < tw) {
        val sx = tx * img.width / tw
        val src = (sy * img.width + sx) * ch
        val dst = (ty * tw + tx) * ch
        var c = 0
        while (c < ch) { out(dst + c) = img.pixels(src + c); c += 1 }
        tx += 1
      }
      ty += 1
    }
    PnmImage(tw, th, ch, img.maxval, out)
  }
}
