package graft.ops

/** A REAL (not stubbed) minimal YUV4MPEG2 (`.y4m`) codec — the video entry
  * of the [[Multimodal]] codec layer, completing the triplet next to
  * [[WavCodec]] (audio) and [[PnmCodec]] (image). The container ships no
  * video libraries, but Y4M is the standard UNCOMPRESSED video interchange
  * format (mjpegtools): an ASCII stream header, then one `FRAME` line plus
  * raw planar YCbCr bytes per frame — parsing it needs nothing beyond byte
  * arithmetic, and it is what real pipelines feed encoders with.
  *
  * Layout (public mjpegtools spec):
  * {{{
  * YUV4MPEG2 W<w> H<h> F<num>:<den> [I<.>] [A<.>] [C<cs>] [X<.>]\n
  * FRAME[ <params>]\n <Y plane><Cb plane><Cr plane>   (repeated per frame)
  * }}}
  * Plane sizes depend on the chroma subsampling: C420* = Y w*h plus two
  * (w/2)x(h/2) chroma planes; C422 = two (w/2)xh; C444 = two full planes;
  * Cmono = luma only. The parser walks every frame to EOF and validates the
  * byte budget, so a wrong plane-size computation cannot parse cleanly;
  * consumers that reduce the frame bytes themselves (see
  * [[Multimodal.videoInfo]]) prove the walk reached the payload, not just
  * the header fields. */
object Y4mCodec {

  /** One parsed (or to-be-written) clip: `colorspace` is the tag without the
    * leading `C` ("420", "420jpeg", "422", "444", "mono"); each frame is the
    * concatenated raw planes, exactly [[frameBytes]] long. */
  final case class Y4mVideo(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                            colorspace: String, frames: Vector[Array[Byte]]) {
    def nFrames: Int = frames.length
    /** Clip duration at the header frame rate, floored to ms. */
    def durationMs: Long = nFrames.toLong * 1000L * fpsDen / fpsNum
    /** Sum of every plane byte of every frame — the payload reduction that
      * proves a parser walked the full frame bytes. */
    def sumBytes: Long = {
      var s = 0L
      frames.foreach { f =>
        var i = 0
        while (i < f.length) { s += f(i) & 0xff; i += 1 }
      }
      s
    }
    /** The luma plane of frame `idx` (first `width*height` bytes). */
    def lumaFrame(idx: Int): Array[Byte] =
      java.util.Arrays.copyOf(frames(idx), width * height)
  }

  /** Raw bytes of one frame for the given geometry/subsampling. Computed in
    * Long and bounds-checked: a corrupt header claiming huge dimensions must
    * fail loudly, not wrap `width*height` around Int and "validate" a
    * zero-byte frame budget. */
  def frameBytes(width: Int, height: Int, colorspace: String): Int = {
    val w = width.toLong; val h = height.toLong
    val n: Long = colorspace match {
      case cs if cs.startsWith("420") => w * h + 2 * ((w / 2) * (h / 2))
      case "422" => w * h + 2 * ((w / 2) * h)
      case "444" => 3 * w * h
      case "mono" => w * h
      case other => throw new IllegalArgumentException(
        s"unsupported Y4M colorspace C$other")
    }
    require(n > 0 && n <= Int.MaxValue,
      s"Y4M frame of ${width}x$height C$colorspace needs $n bytes (out of range)")
    n.toInt
  }

  private val Magic = "YUV4MPEG2"

  /** Parse a Y4M byte stream. Fails loudly on bad magic, missing/odd
    * geometry, an unknown colorspace, or a truncated frame — quarantine
    * callers should catch. Unknown header params (I/A/X) are skipped per
    * spec, as are per-frame params. */
  def parse(bytes: Array[Byte]): Y4mVideo = {
    val headerEnd = indexOfNl(bytes, 0)
    require(headerEnd > 0, "not a Y4M: no stream-header line")
    val header = new String(bytes, 0, headerEnd, java.nio.charset.StandardCharsets.US_ASCII)
    val parts = header.split(" ")
    require(parts.head == Magic, s"not a Y4M: magic '${parts.head}'")
    var w = -1; var h = -1; var num = -1; var den = -1; var cs = "420"
    parts.tail.filter(_.nonEmpty).foreach { p =>
      p.charAt(0) match {
        case 'W' => w = p.substring(1).toInt
        case 'H' => h = p.substring(1).toInt
        case 'F' =>
          val Array(n, d) = p.substring(1).split(":", 2)
          num = n.toInt; den = d.toInt
        case 'C' => cs = p.substring(1)
        case _ => () // I (interlace), A (aspect), X (extension): skipped
      }
    }
    require(w > 0 && h > 0, s"corrupt Y4M: geometry ${w}x$h")
    require(num > 0 && den > 0, s"corrupt Y4M: frame rate $num:$den")
    if (cs.startsWith("420"))
      require(w % 2 == 0 && h % 2 == 0, s"corrupt Y4M: C$cs needs even dims, got ${w}x$h")
    if (cs == "422")
      require(w % 2 == 0, s"corrupt Y4M: C422 needs even width, got $w")
    val fb = frameBytes(w, h, cs)
    val frames = Vector.newBuilder[Array[Byte]]
    var pos = headerEnd + 1
    while (pos < bytes.length) {
      val lineEnd = indexOfNl(bytes, pos)
      require(lineEnd >= 0, "corrupt Y4M: unterminated FRAME line")
      val line = new String(bytes, pos, lineEnd - pos, java.nio.charset.StandardCharsets.US_ASCII)
      require(line == "FRAME" || line.startsWith("FRAME "),
        s"corrupt Y4M: expected FRAME line at offset $pos, got '${line.take(20)}'")
      require(lineEnd + 1 + fb <= bytes.length,
        s"corrupt Y4M: truncated frame ${frames.result().length} " +
          s"(${bytes.length - lineEnd - 1} of $fb bytes)")
      frames += java.util.Arrays.copyOfRange(bytes, lineEnd + 1, lineEnd + 1 + fb)
      pos = lineEnd + 1 + fb
    }
    Y4mVideo(w, h, num, den, cs, frames.result())
  }

  /** Write a clip as Y4M bytes — the exact layout [[parse]] reads back. */
  def write(v: Y4mVideo): Array[Byte] = {
    require(v.width > 0 && v.height > 0, s"geometry must be positive: ${v.width}x${v.height}")
    require(v.fpsNum > 0 && v.fpsDen > 0, s"frame rate must be positive: ${v.fpsNum}:${v.fpsDen}")
    val fb = frameBytes(v.width, v.height, v.colorspace)
    v.frames.zipWithIndex.foreach { case (f, i) =>
      require(f.length == fb, s"frame $i has ${f.length} bytes; C${v.colorspace} " +
        s"${v.width}x${v.height} needs $fb")
    }
    val header = s"$Magic W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A0:0 C${v.colorspace}\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val frameHdr = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + v.frames.length * (frameHdr.length + fb))
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    v.frames.foreach { f =>
      System.arraycopy(frameHdr, 0, out, pos, frameHdr.length)
      pos += frameHdr.length
      System.arraycopy(f, 0, out, pos, fb)
      pos += fb
    }
    out
  }

  private def indexOfNl(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i < bytes.length) {
      if (bytes(i) == '\n') return i
      i += 1
    }
    -1
  }
}
