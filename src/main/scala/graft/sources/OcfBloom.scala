package graft.sources

import graft.spark.InternalRowGetters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Per-file Bloom filters for EXACT-MATCH file skipping (`bloomColumns`).
  *
  * Min/max stamps (`statsColumns`) skip files on RANGE predicates, but a
  * point lookup on a high-cardinality column — `WHERE doc_id = X` over a
  * corpus whose ids are spread across every file — matches every file's
  * [min, max] and skips nothing. A Bloom filter answers the question range
  * stats cannot: "might THIS value be in THIS file?" At 100 TB a 1% fpp
  * filter turns a needle lookup over 10k files into ~100 file opens
  * (99% skipped header-only), the same role parquet's bloom filters and
  * Iceberg/Delta file-level blooms play.
  *
  * Layout: one filter per tracked column per file, serialized into the
  * `graft.bloom` OCF header entry as JSON
  * `{"col": {"t": "long"|"string", "m": bits, "k": hashes, "bits": base64}}`.
  * Values hash once to 64 bits (two seeded Murmur3_x86_32 halves) and the k
  * probe positions derive as `h1 + i*h2 mod m` (Kirsch–Mitzenmacher), so
  * the writer stores ONE long per row and sizes the filter optimally at
  * seal time, when the row count is known:
  * `m = -n·ln(p)/ln²2`, `k = m/n·ln 2`.
  *
  * Skipping is CONSERVATIVE by construction: a filter can only prove
  * absence ("no bits set → value definitely not present"); any uncertainty
  * (untracked column, overflowed filter, non-equality predicate, type
  * mismatch, null operand) keeps the file.
  */
private[graft] object OcfBloom {

  /** Columns that can carry a Bloom filter: integral + string. Equality on
    * float is ill-defined; binary/nested have no pushed equality filters
    * to serve. */
  def eligible(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.StringType |
         org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** The i-th Kirsch-Mitzenmacher probe position for a 64-bit value hash —
    * the ONE place the derivation lives; build and probe both use it, so
    * the no-false-negative guarantee cannot be broken by the two halves
    * drifting apart. */
  @inline private def probePos(hash: Long, i: Int, m: Int): Int =
    java.lang.Math.floorMod((hash >>> 32).toInt + i * hash.toInt, m)

  /** One parsed per-column filter. `typ` anchors the hash interpretation:
    * "long" = integral column hashed by long value, "string" = UTF-8 bytes. */
  final case class BloomLite(typ: String, m: Int, k: Int, bits: Array[Long]) {
    def mightContain(hash: Long): Boolean = {
      if (m <= 0) return false // empty filter: nothing was inserted
      var i = 0
      while (i < k) {
        val pos = probePos(hash, i, m)
        if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }

  private val Seed1 = 0x9747b28c
  private val Seed2 = 0x41c64e6d

  def hashLong(v: Long): Long = {
    val h1 = Murmur3_x86_32.hashLong(v, Seed1)
    val h2 = Murmur3_x86_32.hashLong(v, Seed2)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  def hashUtf8(s: UTF8String): Long = {
    val h1 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1)
    val h2 = Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** Optimal bit count for `n` insertions at false-positive rate `fpp`,
    * rounded up to whole longs (min one long). */
  def optimalM(n: Long, fpp: Double): Int = {
    val ln2sq = math.log(2) * math.log(2)
    val raw = math.ceil(-n.toDouble * math.log(fpp) / ln2sq)
    val capped = math.min(raw, (Int.MaxValue - 64).toDouble).toLong
    (((math.max(64L, capped) + 63L) / 64L) * 64L).toInt
  }

  /** Optimal probe count, capped at ceil(-log2(fpp)) — the value implied by
    * an optimally-sized filter. Without the cap, m's 64-bit floor makes tiny
    * files (n of 1-10) compute k in the dozens: harmless to correctness but
    * ~6x the probe cost across a wide listing. */
  def optimalK(m: Int, n: Long, fpp: Double): Int = {
    val cap = math.max(1, math.ceil(-math.log(fpp) / math.log(2)).toInt)
    math.max(1, math.min(cap,
      math.round(m.toDouble / math.max(1L, n) * math.log(2)).toInt))
  }

  /** Build a filter from collected 64-bit value hashes, sized by the
    * DISTINCT hash count — a low-cardinality column over many rows gets a
    * filter proportional to its cardinality, not its row count (the raw
    * count would bloat the header thousands-fold for enum-like columns). */
  def build(typ: String, hashes: Array[Long], count: Int, fpp: Double): BloomLite = {
    if (count == 0) return BloomLite(typ, 0, 1, Array.empty)
    val sorted = java.util.Arrays.copyOf(hashes, count)
    java.util.Arrays.sort(sorted)
    var distinct = 1
    var j = 1
    while (j < count) {
      if (sorted(j) != sorted(j - 1)) { sorted(distinct) = sorted(j); distinct += 1 }
      j += 1
    }
    val m = optimalM(distinct.toLong, fpp)
    val k = optimalK(m, distinct.toLong, fpp)
    val bits = new Array[Long](m >>> 6)
    var r = 0
    while (r < distinct) {
      val hash = sorted(r)
      var i = 0
      while (i < k) {
        val pos = probePos(hash, i, m)
        bits(pos >>> 6) |= 1L << (pos & 63)
        i += 1
      }
      r += 1
    }
    BloomLite(typ, m, k, bits)
  }

  def toJson(byName: Seq[(String, BloomLite)]): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    byName.foreach { case (name, b) =>
      val o = root.putObject(name)
      o.put("t", b.typ)
      o.put("m", b.m)
      o.put("k", b.k)
      val bb = java.nio.ByteBuffer.allocate(b.bits.length * 8)
      b.bits.foreach(bb.putLong)
      o.put("bits", java.util.Base64.getEncoder.encodeToString(bb.array()))
    }
    om.writeValueAsString(root)
  }

  def parse(json: String): Map[String, BloomLite] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(json)
    val b = Map.newBuilder[String, BloomLite]
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next()
      val o = e.getValue
      val raw = java.util.Base64.getDecoder.decode(o.get("bits").asText)
      val bb = java.nio.ByteBuffer.wrap(raw)
      val bits = new Array[Long](raw.length / 8)
      var i = 0
      while (i < bits.length) { bits(i) = bb.getLong(); i += 1 }
      b += e.getKey -> BloomLite(o.get("t").asText, o.get("m").asInt, o.get("k").asInt, bits)
    }
    b.result()
  }

  /** True when the pushed set contains at least one shape a Bloom filter
    * can answer (EqualTo/EqualNullSafe/In, recursing And/Or). Callers gate
    * the per-file JSON parse on this: for a pure range/prefix/null query
    * every filter is guaranteed "keep", so decoding potentially-megabyte
    * bloom entries across a wide listing would be pure planning cost. */
  def anyEqualityShape(filters: Seq[org.apache.spark.sql.sources.Filter]): Boolean = {
    import org.apache.spark.sql.sources._
    def any(f: Filter): Boolean = f match {
      case And(l, r) => any(l) || any(r)
      case Or(l, r) => any(l) || any(r)
      case _: EqualTo | _: EqualNullSafe | _: In => true
      case _ => false
    }
    filters.exists(any)
  }

  /** Conservative per-file evaluation of the pushed filters against the
    * file's parsed Bloom filters: false ONLY when a filter PROVES no row can
    * satisfy the predicate tree. Only equality shapes consult a filter —
    * And/Or recurse soundly, everything else keeps the file. */
  def mayMatch(filters: Seq[org.apache.spark.sql.sources.Filter],
               bloom: String => Option[BloomLite]): Boolean = {
    import org.apache.spark.sql.sources._
    def valueHash(b: BloomLite, v: Any): Option[Long] = (b.typ, v) match {
      case (_, null) => None
      case ("long", n: java.lang.Number) => n match {
        case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
             _: java.lang.Long => Some(hashLong(n.longValue))
        case _ => None // fractional literal against an integral column
      }
      case ("string", s: String) => Some(hashUtf8(UTF8String.fromString(s)))
      case ("string", s: UTF8String) => Some(hashUtf8(s))
      case _ => None
    }
    def may(f: Filter): Boolean = f match {
      case And(l, r) => may(l) && may(r)
      case Or(l, r) => may(l) || may(r)
      case EqualTo(a, v) => check(a, v)
      case EqualNullSafe(a, v) if v != null => check(a, v)
      case In(a, vs) => bloom(a) match {
        case Some(b) if vs != null && vs.nonEmpty =>
          vs.exists(v => valueHash(b, v).forall(b.mightContain))
        case _ => true
      }
      case _ => true
    }
    def check(attr: String, v: Any): Boolean = bloom(attr) match {
      case Some(b) => valueHash(b, v).forall(b.mightContain)
      case None => true
    }
    filters.forall(may)
  }
}

/** Per-open-file Bloom state for the sink: one growable hash log per tracked
  * column (8 bytes/row), drained into an optimally-sized filter at seal.
  * A column whose log exceeds `maxItems` is dropped from the stamp for that
  * file (absent filter = never skipped — conservative), bounding writer
  * memory at `columns × maxItems × 8` bytes. */
private[sources] final class OcfBloomTracker(cfg: OcfWriteConfig) {
  private val n = cfg.bloomCols.length
  private val names = cfg.bloomCols.map(_.name)
  private val getters = cfg.bloomCols.map(c => InternalRowGetters.forType(c.dt))
  private val isString: Array[Boolean] = cfg.bloomCols.map(
    _.dt == org.apache.spark.sql.types.StringType)
  private val logs = new Array[Array[Long]](n)
  private val counts = new Array[Int](n)
  private val overflowed = new Array[Boolean](n)

  def reset(): Unit = {
    var i = 0
    while (i < n) {
      logs(i) = null; counts(i) = 0; overflowed(i) = false
      i += 1
    }
  }

  def update(row: InternalRow): Unit = {
    var i = 0
    while (i < n) {
      // leaf's enclosing struct; a null ancestor makes the leaf null
      val lr = cfg.bloomCols(i).leafRow(row)
      val o = cfg.bloomCols(i).leafOrdinal
      if (!overflowed(i) && lr != null && !lr.isNullAt(o)) {
        if (counts(i) >= cfg.bloomMaxItems) {
          overflowed(i) = true; logs(i) = null
        } else {
          if (logs(i) == null) logs(i) = new Array[Long](1024)
          else if (counts(i) == logs(i).length)
            logs(i) = java.util.Arrays.copyOf(logs(i),
              math.min(logs(i).length * 2, cfg.bloomMaxItems))
          val h =
            if (isString(i))
              OcfBloom.hashUtf8(getters(i)(lr, o)
                .asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
            else OcfBloom.hashLong(getters(i)(lr, o).asInstanceOf[Number].longValue)
          logs(i)(counts(i)) = h
          counts(i) += 1
        }
      }
      i += 1
    }
  }

  /** None when every column overflowed (nothing worth stamping). */
  def toJsonOpt: Option[String] = {
    val built = (0 until n).collect {
      case i if !overflowed(i) =>
        names(i) -> OcfBloom.build(if (isString(i)) "string" else "long",
          if (logs(i) == null) Array.empty[Long] else logs(i), counts(i), cfg.bloomFpp)
    }
    if (built.isEmpty) None else Some(OcfBloom.toJson(built))
  }
}
