package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash bucketing for `graft-ocf` tables: `PARTITIONED BY (bucket(N, col))`
  * routes every row into one of N stable hash buckets, stored as a synthetic
  * trailing `_bucket=K/` directory level (the bucket columns themselves stay
  * ordinary DATA columns inside the files — only their hash is in the path).
  *
  * Why this matters at 100 TB: identity partitioning cannot key on a
  * high-cardinality column (a directory per `doc_id` is absurd), but a JOIN
  * or GROUP BY on such a column is the expensive shape — every byte moves
  * through a shuffle. Bucketing fixes the layout once at write time:
  *
  *  - two tables bucketed the same way join with NO exchange on either side
  *    (the scan reports `KeyGroupedPartitioning(bucket(N, col))` and Spark's
  *    storage-partitioned join matches bucket ids split-to-split);
  *  - `WHERE col = v` prunes the listing to the one bucket `v` hashes into —
  *    1/N of the files — before any header or data is read, no stats/bloom
  *    stamps required;
  *  - a GROUP BY on the bucket column aggregates shuffle-free for the same
  *    reason the join does.
  *
  * The hash is this library's own fixed function (FNV-1a over the value's
  * canonical bytes, finished with a splitmix64 mix), NOT
  * `Object.hashCode`/Spark-internal murmur: the bucket id is durable layout
  * (directory names), so it must be stable across Spark versions, JVMs and
  * engines. The same function backs the catalog's V2 `bucket` function, so
  * when Spark shuffles the unbucketed side of a partially-clustered join
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`) or clusters an INSERT
  * (the write's required distribution), its row routing agrees byte-for-byte
  * with what the files say. */
private[graft] object OcfBucket {

  /** Reserved directory-level name for the bucket id. Inferred as a normal
    * int partition column by an option-less path read (honest observability
    * of the layout); recognized and folded into the bucket spec when the
    * read declares `bucketColumns`/`numBuckets` (always the case through
    * the catalog). */
  val DirCol = "_bucket"

  /** Bucket-count EVOLUTION (X103): after `ALTER TABLE ... SET
    * TBLPROPERTIES ('numBuckets'='N')`, writes stamp the modulus into the
    * level NAME — `_bucketN=K` — so every file's directory path
    * self-describes which era's hash routed it (the X100 self-describing-
    * level discipline). Files from before the first evolution keep their
    * bare `_bucket=K` level; their modulus is the table's GENESIS bucket
    * count, recorded as `numBucketsGenesis` at the first ALTER. Old-era
    * files prune under their own modulus; storage-partitioned reporting is
    * withheld while eras are mixed (the files are not grouped by ONE
    * bucket function) and returns once compaction unifies the layout. */
  def isLevel(c: String): Boolean =
    c == DirCol || (c.startsWith(DirCol) && c.length > DirCol.length &&
      c.substring(DirCol.length).forall(_.isDigit))

  /** The modulus an era-stamped level name carries; None for the bare
    * (genesis) level, whose modulus is `numBucketsGenesis`. */
  def levelEra(c: String): Option[Int] =
    if (c == DirCol) None else c.substring(DirCol.length).toIntOption

  /** Is this `name=value` path segment a bucket level of ANY era? */
  def isLevelDir(seg: String): Boolean = {
    val eq = seg.indexOf('=')
    eq > 0 && isLevel(seg.substring(0, eq))
  }

  /** Types a bucket column may have. Floating point is excluded for the
    * same reason partition columns exclude it (-0.0/0.0 and NaN-payload
    * equality make a value's identity ambiguous); decimals are excluded
    * because equal values with different scales render different bytes. */
  def supportedType(dt: DataType): Boolean = dt match {
    case StringType | BinaryType | BooleanType | ByteType | ShortType |
         IntegerType | LongType | DateType => true
    case _ => false
  }

  /** splitmix64 finalizer: avalanches a 64-bit value (public-domain
    * constant-set from the SplitMix64 PRNG). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  private def fnv(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * FnvPrime; i += 1 }
    h
  }

  /** Hash of one column value. Accepts BOTH Catalyst-internal forms
    * (UTF8String, Int days for dates) and external forms (String,
    * java.sql.Date/LocalDate from pushed `sources.Filter` values), hashing
    * the LOGICAL value so a filter literal lands in the same bucket the
    * writer put the row in. Null hashes to a fixed constant (one bucket
    * owns the null group, like hive). */
  def hashValue(v: Any, dt: DataType): Long = v match {
    case null => 0x6e756c6c6b657921L
    case u: UTF8String => fnv(u.getBytes)
    case s: String => fnv(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case b: Array[Byte] => fnv(b)
    case b: java.lang.Boolean => mix(if (b) 1L else 0L)
    case n: java.lang.Byte => mix(n.longValue)
    case n: java.lang.Short => mix(n.longValue)
    case n: java.lang.Integer =>
      // for DateType the internal form is Int days-since-epoch; for the
      // integral types the widened long is the logical value — both mix
      // the same way, so no dt dispatch is needed on this branch
      mix(n.longValue)
    case n: java.lang.Long => mix(n.longValue)
    case d: java.sql.Date =>
      mix(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong)
    case d: java.time.LocalDate =>
      mix(org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateToDays(d).toLong)
    case other => throw new IllegalArgumentException(
      s"graft-ocf bucket: cannot hash ${other.getClass.getName} as ${dt.simpleString}")
  }

  /** Multi-column combine: order-dependent mix so (a,b) and (b,a) differ. */
  def combine(acc: Long, h: Long): Long = mix(acc ^ h)

  def idOf(hash: Long, numBuckets: Int): Int = {
    val m = (hash % numBuckets).toInt
    if (m < 0) m + numBuckets else m
  }

  def idOfValues(values: Array[Any], dts: Array[DataType], numBuckets: Int): Int = {
    var h = 0L
    var i = 0
    while (i < values.length) { h = combine(h, hashValue(values(i), dts(i))); i += 1 }
    idOf(h, numBuckets)
  }

  /** Read-side bucket spec: bucket column names (data columns), the
    * DECLARED (current) bucket count, the index of the current-era level's
    * value in each file's inferred partition-value array (-1 when the
    * layout holds no single current-era level), and every observed era as
    * (modulus, valueIdx) — one entry per distinct bucket level name in the
    * layout. `uniform` licenses storage-partitioned reporting: exactly one
    * era, and it is the declared one. */
  final case class Spec(cols: Seq[String], numBuckets: Int, valueIdx: Int,
                        eras: Seq[(Int, Int)] = Nil) {
    def uniform: Boolean = eras.length == 1 && eras.head._1 == numBuckets
  }

  /** Bucket ids admitted by pushed/runtime filters, or None when the
    * filters don't pin every bucket column to concrete values. Only
    * top-level, non-negated equality shapes participate (EqualTo,
    * non-null EqualNullSafe, In, and conjunctions thereof): anything else
    * returns None — pruning must never guess. A multi-column bucket key
    * needs every column pinned; the id set is the cross product of the
    * pinned value sets (capped — an enormous IN-list reverts to no
    * pruning rather than driver-side blowup). */
  def admittedIds(filters: Seq[org.apache.spark.sql.sources.Filter],
                  cols: Seq[String], dts: Seq[DataType], numBuckets: Int,
                  maxProduct: Int = 1024): Option[Set[Int]] = {
    import org.apache.spark.sql.sources._
    // value sets pinned per bucket column across the top-level conjunction;
    // a column pinned twice intersects (WHERE c = 1 AND c IN (1,2))
    val pinned = scala.collection.mutable.Map.empty[String, Set[Any]]
    def pin(col: String, vs: Set[Any]): Unit =
      if (cols.contains(col))
        pinned(col) = pinned.get(col).map(_.intersect(vs)).getOrElse(vs)
    def walk(f: Filter): Unit = f match {
      case EqualTo(c, v) => pin(c, Set(v))
      case EqualNullSafe(c, v) if v != null => pin(c, Set(v))
      case In(c, vs) if !vs.contains(null) => pin(c, vs.toSet)
      case And(l, r) => walk(l); walk(r)
      case _ => () // Or/Not/ranges: contribute nothing (conservative)
    }
    filters.foreach(walk)
    if (!cols.forall(pinned.contains)) return None
    val sets = cols.map(pinned)
    if (sets.map(_.size.toLong).product > maxProduct) return None
    val combos = sets.foldLeft(Seq(Seq.empty[Any])) { (acc, s) =>
      acc.flatMap(prefix => s.toSeq.map(prefix :+ _))
    }
    Some(combos.map(c => idOfValues(c.toArray, dts.toArray, numBuckets)).toSet)
  }
}

/** The catalog's V2 `bucket` function (`FunctionCatalog` name `bucket`,
  * empty namespace — where Spark's `V2ExpressionUtils` resolves transform
  * expressions): binds `(numBuckets INT, key...)` and returns
  * [[OcfBucket.idOf]] of the combined key hash. Registering it is what lets
  * Spark (a) cluster an INSERT's rows by bucket before the write (the
  * sink's required distribution) and (b) shuffle the unbucketed side of a
  * join INTO the bucketed layout instead of shuffling both sides. */
private[sources] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, cols...): stable graft-ocf hash bucket id"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket expects (numBuckets INT, key...), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket: numBuckets must be INT, got ${inputType.fields(0).dataType.simpleString}")
    val keyTypes = inputType.fields.drop(1).map(_.dataType)
    keyTypes.foreach(dt => require(OcfBucket.supportedType(dt),
      s"bucket: unsupported key type ${dt.simpleString}"))
    Bound(keyTypes)
  }

  private[sources] final case class Bound(keyTypes: Array[DataType])
      extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = IntegerType +: keyTypes
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    // BOTH scans of a storage-partitioned join must report the same
    // canonical name for their TransformExpressions to unify
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      var h = 0L
      var i = 0
      while (i < keyTypes.length) {
        val v = if (input.isNullAt(i + 1)) null
          else input.get(i + 1, keyTypes(i))
        h = OcfBucket.combine(h, OcfBucket.hashValue(v, keyTypes(i)))
        i += 1
      }
      Integer.valueOf(OcfBucket.idOf(h, n))
    }
  }
}
