package graft.avro

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

final class AvroEofException(msg: String) extends RuntimeException(msg)

/** Positional binary reader over a byte array implementing the Avro wire
  * primitives: zigzag varints, little-endian IEEE floats, length-prefixed
  * bytes/strings, and type-directed skips.
  *
  * (reference: python-udf/avro/io.py:235-421 — BinaryDecoder read_* / skip_*)
  */
final class AvroBinaryReader(val buf: Array[Byte], var pos: Int, val end: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)

  @inline def remaining: Int = end - pos
  @inline def atEnd: Boolean = pos >= end

  @inline private def need(n: Int): Unit =
    if (pos + n > end) throw new AvroEofException(s"need $n bytes at pos $pos, have ${end - pos}")

  def readByte(): Int = { need(1); val b = buf(pos) & 0xff; pos += 1; b }

  def readBoolean(): Boolean = readByte() != 0

  /** zigzag varint (reference: io.py:248-266; decode `(n>>1)^-(n&1)`). */
  def readLong(): Long = {
    var b = readByte()
    var n: Long = (b & 0x7f).toLong
    var shift = 7
    while ((b & 0x80) != 0) {
      b = readByte()
      n |= (b & 0x7f).toLong << shift
      shift += 7
    }
    (n >>> 1) ^ -(n & 1)
  }

  def readInt(): Int = readLong().toInt

  def readFloat(): Float = {
    need(4)
    val bits = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
      ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
    pos += 4
    java.lang.Float.intBitsToFloat(bits)
  }

  def readDouble(): Double = {
    need(8)
    var bits = 0L
    var i = 7
    while (i >= 0) { bits = (bits << 8) | (buf(pos + i) & 0xffL); i -= 1 }
    pos += 8
    java.lang.Double.longBitsToDouble(bits)
  }

  def readFixed(n: Int): Array[Byte] = {
    need(n)
    val out = java.util.Arrays.copyOfRange(buf, pos, pos + n)
    pos += n
    out
  }

  def readBytes(): Array[Byte] = {
    val n = readLong()
    if (n < 0 || n > Int.MaxValue) throw new AvroEofException(s"bad bytes length $n")
    readFixed(n.toInt)
  }

  def readString(): String = {
    val n = readLong()
    if (n < 0 || n > Int.MaxValue) throw new AvroEofException(s"bad string length $n")
    need(n.toInt)
    val s = new String(buf, pos, n.toInt, StandardCharsets.UTF_8)
    pos += n.toInt
    s
  }

  // ---- skips (decode-free seeking; reference: io.py:394-421,793-822) -----
  def skip(n: Long): Unit = {
    if (n < 0 || pos + n > end) throw new AvroEofException(s"cannot skip $n at $pos")
    pos += n.toInt
  }
  def skipLong(): Unit = { while ((readByte() & 0x80) != 0) () }
  def skipBytes(): Unit = skip(readLong())
}

/** Avro wire-format writer (reference: python-udf/avro/io.py:441-631 write_*). */
final class AvroBinaryWriter(val out: ByteArrayOutputStream = new ByteArrayOutputStream()) {
  def toByteArray: Array[Byte] = out.toByteArray

  def writeBoolean(b: Boolean): Unit = out.write(if (b) 1 else 0)

  /** zigzag varint encode `(n<<1)^(n>>63)` (reference: io.py:454-468). */
  def writeLong(v: Long): Unit = {
    var n = (v << 1) ^ (v >> 63)
    while ((n & ~0x7fL) != 0) {
      out.write(((n & 0x7f) | 0x80).toInt)
      n >>>= 7
    }
    out.write(n.toInt)
  }
  def writeInt(v: Int): Unit = writeLong(v.toLong)

  def writeFloat(v: Float): Unit = {
    val bits = java.lang.Float.floatToIntBits(v)
    out.write(bits & 0xff); out.write((bits >> 8) & 0xff)
    out.write((bits >> 16) & 0xff); out.write((bits >> 24) & 0xff)
  }

  def writeDouble(v: Double): Unit = {
    val bits = java.lang.Double.doubleToLongBits(v)
    var i = 0
    while (i < 8) { out.write(((bits >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  def writeFixed(b: Array[Byte]): Unit = out.write(b, 0, b.length)

  def writeBytes(b: Array[Byte]): Unit = { writeLong(b.length.toLong); out.write(b, 0, b.length) }

  def writeString(s: String): Unit = writeBytes(s.getBytes(StandardCharsets.UTF_8))
}
