package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout techniques for shuffle avoidance at scale: bucketing for
  * co-located joins, deterministic salting for skewed keys. (AQE's runtime
  * skew-join splitting complements the salting path; bucketing removes the
  * exchange entirely for repeated joins on the same key.) */
object Layout {

  /** Persist `df` bucketed and sorted by `keyCol` into the session catalog.
    * Two tables bucketed by the same key with the same bucket count join
    * with NO shuffle exchange on either side — the layout cost is paid once
    * at write time and amortized over every subsequent join. */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, numBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on the bucketing key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Skew-tolerant equi-join: the skewed side gets a salt in
    * [0, saltFactor) derived from the row's position (so byte-identical
    * duplicate rows — the worst skew case — still spread; a row-content
    * hash would send them all to one reducer), the dimension side is
    * replicated `saltFactor` times, and the join key becomes (key, salt).
    * One hot key's rows spread over `saltFactor` reducers instead of one.
    * The salt is deterministic within a job (partition index + offset), so
    * retried tasks agree; it is NOT stable across different runs, which is
    * fine — any salt distribution yields the same join result. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive; got $saltFactor")
    val salted = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(expr(s"CAST(sequence(0, ${saltFactor - 1}) AS ARRAY<INT>)")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** The raw Z-order (Morton) key for `cols` — a binary column whose
    * unsigned-lexicographic order walks the space-filling curve. See
    * [[graft.spark.ZOrderKey]]. */
  def zorderKey(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Shims.column(
      graft.spark.ZOrderKey(cols.map(org.apache.spark.sql.graft.Shims.expression)))

  /** Cluster `df` along the Z-order curve of `cols` into `numPartitions`
    * output partitions: range-partition on the Morton key (each partition =
    * one compact curve segment), sort within, drop the key. Written out with
    * `statsColumns`/`blockIndex` over the same columns, EVERY column's
    * per-file and per-block min/max stays tight — a selective predicate on
    * ANY of them skips most files, where a lexicographic sort only serves
    * the leading column. The projection that drops the key is narrow, so
    * the per-partition sort order survives into the writer. */
  def zorderBy(df: DataFrame, numPartitions: Int, cols: String*): DataFrame = {
    require(cols.nonEmpty, "zorderBy needs at least one column")
    require(numPartitions > 0, s"numPartitions must be positive; got $numPartitions")
    df.withColumn("__graft_zkey", zorderKey(cols.map(df(_)): _*))
      .repartitionByRange(numPartitions, col("__graft_zkey"))
      .sortWithinPartitions("__graft_zkey")
      .drop("__graft_zkey")
  }
}
