package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing and corpus reporting for pretraining pipelines. */
object Packing {

  /** Contiguous token-budget chunking — the "concatenate the shard, then cut
    * every `budgetTokens` tokens" packing used to build fixed-length
    * pretraining sequences. Within each shard (deterministically ordered by
    * `idCol`) every document is assigned the chunk its FIRST token falls in:
    * `chunk_id = floor(tokens_before / budget)`, `chunk_offset = tokens_before
    * − chunk_id·budget`. Documents may straddle a chunk boundary (that is the
    * concat-then-split semantics, not bin packing — no token is dropped and
    * chunk capacity is exactly `budgetTokens`).
    *
    * Scale: one window over `shardCol` — a single shuffle whose parallelism
    * is the shard count, so shards are the unit of scale-out. A corpus with
    * one giant shard serializes; shard first (hash-bucket the corpus) and
    * this is embarrassingly parallel. Token counts are whitespace tokens
    * ([[TextAnalysis.tokenCount]]), ≤ 2^52 per shard before the double
    * division below loses exactness (≈ 4×10^15 tokens — far past any real
    * shard). */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  shardCol: String, budgetTokens: Int,
                  // token counter: the whitespace heuristic by default;
                  // pass TextAnalysis.bpeTokenCount(_) for exact subword
                  // budgets (X90)
                  counter: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                    TextAnalysis.tokenCount): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive; got $budgetTokens")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", counter(col(textCol)).cast("long"))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id",
        floor(col("tokens_before").cast("double") / budgetTokens))
      .withColumn("chunk_offset",
        col("tokens_before") - col("chunk_id") * budgetTokens)
      .drop("tokens_before")
  }

  /** Per-stratum corpus report: document count, total/mean token counts, and
    * DISCRETE token-count quantiles (p50/p90/p99). Quantiles use the rank
    * rule `value at row ceil(q·n)` of the sorted stratum — integer selection,
    * no interpolation, so any engine reproduces the exact same values
    * (interpolated quantiles differ across engines in the last float bit).
    *
    * Scale: one shuffle to rank within strata + a map-side-combined
    * aggregation. For strata too large to sort, use [[corpusStatsApprox]] —
    * kept exact here because the report feeds correctness-gated curation
    * decisions. */
  def corpusStats(df: DataFrame, stratumCol: String, textCol: String): DataFrame = {
    val ranked = df
      .select(col(stratumCol).as("stratum"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("stratum")).orderBy(col("n_tokens"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("stratum"))))
    def atQuantile(q: Double) =
      max(when(col("rn") === ceil(lit(q) * col("n")), col("n_tokens")))
    ranked.groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        (sum("n_tokens").cast("double") / count(lit(1))).as("mean_tokens"),
        atQuantile(0.5).as("p50_tokens"),
        atQuantile(0.9).as("p90_tokens"),
        atQuantile(0.99).as("p99_tokens"))
  }

  /** The [[corpusStats]] scale path: SKETCHED quantiles via Spark's built-in
    * `percentile_approx` (Greenwald-Khanna summaries — mergeable, map-side
    * combined, bounded memory), for strata too large to window-sort. One
    * shuffle of O(strata × sketch) partial states instead of a full
    * per-stratum sort: a 10 TB stratum costs the same executor memory as a
    * 10 MB one. `accuracy` trades sketch size for rank error ≤ n/accuracy —
    * at the 10000 default, p90 of a billion-row stratum lands within rank
    * ±100k. Use [[corpusStats]] when the report feeds correctness-gated
    * decisions; this when strata outgrow the sort. */
  def corpusStatsApprox(df: DataFrame, stratumCol: String, textCol: String,
                        accuracy: Int = 10000): DataFrame = {
    require(accuracy > 0, s"accuracy must be positive; got $accuracy")
    def pct(q: Double) =
      percentile_approx(col("n_tokens"), lit(q), lit(accuracy))
    df.select(col(stratumCol).as("stratum"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        (sum("n_tokens").cast("double") / count(lit(1))).as("mean_tokens"),
        pct(0.5).as("p50_tokens"),
        pct(0.9).as("p90_tokens"),
        pct(0.99).as("p99_tokens"))
  }

  /** [[corpusStatsApprox]] made ORACLE-COMPARABLE: the raw sketch values are
    * engine-specific (no other engine reproduces a Greenwald-Khanna summary
    * bit-for-bit), so instead of emitting them this report emits the EXACT
    * rank-rule quantiles ([[corpusStats]] machinery) alongside one boolean
    * per quantile stating that the sketch value's rank interval intersects
    * the spec-guaranteed window `q·n ± n/accuracy` (±1 rank of slack for the
    * rank convention). The booleans are a cross-engine contract — an
    * independent oracle asserts them literally TRUE, so a sketch that ever
    * violated its published bound breaks the comparison.
    *
    * The rank of the sketch value is measured as the interval
    * `[count(x < v)+1, count(x ≤ v)]` (duplicates make rank an interval,
    * not a point), computed as two conditional sums in the SAME aggregation
    * as the exact quantiles — one stratum-join of three sketch scalars plus
    * the q43 window, no extra pass. This is the verification path; at scale
    * prefer [[corpusStatsApprox]] (no window sort) once the bound is
    * trusted. */
  def corpusStatsApproxChecked(df: DataFrame, stratumCol: String,
                               textCol: String, accuracy: Int = 10000): DataFrame = {
    require(accuracy > 0, s"accuracy must be positive; got $accuracy")
    val toks = df.select(col(stratumCol).as("stratum"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    def pct(q: Double) =
      percentile_approx(col("n_tokens"), lit(q), lit(accuracy))
    val sketch = toks.groupBy("stratum")
      .agg(pct(0.5).as("a50"), pct(0.9).as("a90"), pct(0.99).as("a99"))
    val ranked = toks
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("stratum")).orderBy(col("n_tokens"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("stratum"))))
      .join(broadcast(sketch), "stratum")
    def atQuantile(q: Double) =
      max(when(col("rn") === ceil(lit(q) * col("n")), col("n_tokens")))
    def inBound(q: Double, a: org.apache.spark.sql.Column) = {
      val n = max(col("n")).cast("double")
      val eps = n / accuracy + 1.0
      val target = lit(q) * n
      val lowRank = sum(when(col("n_tokens") < a, 1L).otherwise(0L)) + lit(1L)
      val highRank = sum(when(col("n_tokens") <= a, 1L).otherwise(0L))
      (highRank.cast("double") >= target - eps) &&
        (lowRank.cast("double") <= target + eps)
    }
    ranked.groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        (sum("n_tokens").cast("double") / count(lit(1))).as("mean_tokens"),
        atQuantile(0.5).as("p50_tokens"),
        atQuantile(0.9).as("p90_tokens"),
        atQuantile(0.99).as("p99_tokens"),
        inBound(0.5, col("a50")).as("p50_in_bound"),
        inBound(0.9, col("a90")).as("p90_in_bound"),
        inBound(0.99, col("a99")).as("p99_in_bound"))
  }
}
