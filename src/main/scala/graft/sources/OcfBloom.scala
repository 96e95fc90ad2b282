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

  /** One parsed per-column filter. `typ` anchors the hash interpretation:
    * "long" = integral column hashed by long value, "string" = UTF-8 bytes. */
  final case class BloomLite(typ: String, m: Int, k: Int, bits: Array[Long]) {
    def mightContain(hash: Long): Boolean = {
      if (m <= 0) return false // empty filter: nothing was inserted
      val h1 = (hash >>> 32).toInt
      val h2 = hash.toInt
      var i = 0
      while (i < k) {
        val pos = java.lang.Math.floorMod(h1 + i * h2, m)
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

  def optimalK(m: Int, n: Long): Int =
    math.max(1, math.round(m.toDouble / math.max(1L, n) * math.log(2)).toInt)

  /** Build a sized filter from collected 64-bit value hashes. */
  def build(typ: String, hashes: Array[Long], count: Int, fpp: Double): BloomLite = {
    if (count == 0) return BloomLite(typ, 0, 1, Array.empty)
    val m = optimalM(count.toLong, fpp)
    val k = optimalK(m, count.toLong)
    val bits = new Array[Long](m >>> 6)
    var r = 0
    while (r < count) {
      val hash = hashes(r)
      val h1 = (hash >>> 32).toInt
      val h2 = hash.toInt
      var i = 0
      while (i < k) {
        val pos = java.lang.Math.floorMod(h1 + i * h2, m)
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
  private val n = cfg.bloomOrdinals.length
  private val names = cfg.bloomOrdinals.map(cfg.sql.fields(_).name)
  private val getters = cfg.bloomOrdinals.map(o =>
    InternalRowGetters.forType(cfg.sql.fields(o).dataType))
  private val isString: Array[Boolean] = cfg.bloomOrdinals.map(o =>
    cfg.sql.fields(o).dataType == org.apache.spark.sql.types.StringType)
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
      val o = cfg.bloomOrdinals(i)
      if (!overflowed(i) && !row.isNullAt(o)) {
        if (counts(i) >= cfg.bloomMaxItems) {
          overflowed(i) = true; logs(i) = null
        } else {
          if (logs(i) == null) logs(i) = new Array[Long](1024)
          else if (counts(i) == logs(i).length)
            logs(i) = java.util.Arrays.copyOf(logs(i),
              math.min(logs(i).length * 2, cfg.bloomMaxItems))
          val h =
            if (isString(i))
              OcfBloom.hashUtf8(getters(i)(row, o)
                .asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
            else OcfBloom.hashLong(getters(i)(row, o).asInstanceOf[Number].longValue)
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
