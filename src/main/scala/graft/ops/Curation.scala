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
    * rename any pre-existing ones before calling. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             lang: String = "en", minQuality: Double = 0.5): DataFrame =
    Dedup.exact(docs, idCol, textCol)
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .where(col("lang_pred") === lang)
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .where(col("quality") >= minQuality)

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
