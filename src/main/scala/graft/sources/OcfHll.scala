package graft.sources

/** Minimal dense HyperLogLog for the per-file NDV stamp (X89): p = 9 →
  * 512 one-byte registers, ~4.6% relative standard error — plenty for
  * CBO's join-cardinality estimation, where the alternative is a byte-size
  * guess that is off by orders of magnitude. The sketch is MERGEABLE
  * (register-wise max = set union), so the table's NDV folds from per-file
  * stamps at plan time with no data read: the same mergeability discipline
  * as every other header stamp.
  *
  * The value hash is the library's own stable FNV-1a + splitmix64 finisher
  * (the [[OcfBucket]] constants): the stamp is durable layout metadata, so
  * it must not depend on JVM/Spark hash internals. Flink/Trino/Iceberg all
  * stamp NDV sketches for the same reason (Iceberg: puffin
  * `apache-datasketches-theta-v1`); HLL published in Flajolet et al. 2007,
  * the +corrections variant in Heule et al. 2013 (HLL++). */
private[graft] object OcfHll {

  val P = 9
  val M: Int = 1 << P
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  def empty(): Array[Byte] = new Array[Byte](M)

  // FNV-1a + splitmix64, the OcfBucket constants (kept locally: those are
  // private, and this hash is independently frozen by the stamp format)
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def fnv(bytes: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = off
    while (i < off + len) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  def hashLong(v: Long): Long = mix(v)
  /** -0.0 normalizes to 0.0 first: Spark compares them equal, so they must
    * count as ONE distinct value. NaN payloads likewise collapse. */
  def hashDouble(v: Double): Long = {
    val n = if (v == 0.0) 0.0 else if (java.lang.Double.isNaN(v)) Double.NaN else v
    mix(java.lang.Double.doubleToLongBits(n))
  }
  def hashUtf8(v: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = v.getBytes
    mix(fnv(b, 0, b.length))
  }

  def add(regs: Array[Byte], hash: Long): Unit = {
    val idx = (hash >>> (64 - P)).toInt
    val w = hash << P
    // rank = leading zeros of the remaining 64-P bits, +1; w == 0 caps out
    val rank = math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, 64 - P + 1)
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Register-wise max — HLL union. Mutates and returns `into`. */
  def merge(into: Array[Byte], from: Array[Byte]): Array[Byte] = {
    require(into.length == M && from.length == M,
      s"graft-ocf hll: register size mismatch (${into.length}/${from.length})")
    var i = 0
    while (i < M) { if (from(i) > into(i)) into(i) = from(i); i += 1 }
    into
  }

  /** Cardinality estimate with the standard small-range (linear counting)
    * correction; the 64-bit hash makes large-range correction moot. */
  def estimate(regs: Array[Byte]): Long = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = Alpha * M.toDouble * M.toDouble / invSum
    val corrected =
      if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else e
    math.round(corrected)
  }

  def toBase64(regs: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(regs)
  def fromBase64(s: String): Option[Array[Byte]] =
    scala.util.Try(java.util.Base64.getDecoder.decode(s))
      .toOption.filter(_.length == M)
}
