package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the individual operators
  * exist for: exact dedup → language filter → quality floor. Each stage is
  * one of the already-verified primitives, so the pipeline inherits their
  * oracle-reproducible semantics.
  *
  * Scale notes: the stages are ordered cheapest-reduction-first — the dedup
  * stage shuffles only a narrow (digest, id) projection and broadcasts the
  * duplicated-group keepers back (see [[Dedup.exact]]), and language and
  * quality are partition-local expressions over the survivors; no stage
  * shuffles document text. */
object Curation {

  /** Surviving documents with their language and quality, after:
    * 1. exact dedup (keep the minimum-id copy of each distinct text),
    * 2. language-ID filter (`lang`),
    * 3. quality floor (`minQuality`).
    *
    * Output contract: the result carries `lang_pred` and `quality` columns
    * computed HERE — input columns of those names would be replaced, so
    * rename any pre-existing ones before calling.
    *
    * `sortById = true` emits survivors totally ordered by `idCol`, with the
    * sort placed BELOW the language/quality scoring: a consumer's own
    * `orderBy(id)` above `curate` makes the range partitioner SAMPLE its
    * child and so evaluate the expensive langId + quality expressions a
    * second time (measured ~2x the query at sf0.1); here the sampling pass
    * touches only the deduped (id, text) rows, and the per-row scoring
    * projections and filters above preserve the order. A sort below the
    * dedup join would not survive (the optimizer drops sorts under joins),
    * which is why the operator owns this placement. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             lang: String = "en", minQuality: Double = 0.5,
             sortById: Boolean = false): DataFrame = {
    val deduped = Dedup.exact(docs, idCol, textCol)
    // pushdown barrier (sortById only): predicate pushdown would otherwise
    // drag the language/quality conditions BELOW the sort, re-deriving the
    // expensive expressions under the range exchange where the sampling
    // pass evaluates them a second time — the exact duplication sortById
    // exists to remove. A nondeterministic projection blocks filter
    // pushdown at this boundary, and the always-true `barrier >= 0`
    // conjunct keeps the column referenced so pruning cannot remove the
    // barrier (an unused nondeterministic projection is dropped).
    val base =
      if (!sortById) deduped
      else deduped.orderBy(col(idCol))
        .withColumn("__curate_sort_barrier", monotonically_increasing_id())
    val guard =
      if (sortById) col("__curate_sort_barrier") >= lit(0L) else lit(true)
    val scored = base
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .where(col("lang_pred") === lang && guard)
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .where(col("quality") >= minQuality)
    if (sortById) scored.drop("__curate_sort_barrier") else scored
  }

  /** Per-stage survivor counts for pipeline observability (one job, one
    * pass: conditional aggregation, no per-stage actions). */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             lang: String = "en", minQuality: Double = 0.5): DataFrame = {
    val staged = Dedup.exact(docs, idCol, textCol)
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
    staged.agg(
      count(lit(1)).as("after_dedup"),
      sum(when(col("lang_pred") === lang, 1L).otherwise(0L)).as("after_lang"),
      sum(when(col("lang_pred") === lang && col("quality") >= minQuality, 1L)
        .otherwise(0L)).as("after_quality"))
  }
}
