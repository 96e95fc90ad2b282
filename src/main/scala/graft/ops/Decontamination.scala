package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set — the standard guard against
  * train/test contamination in pretraining pipelines (typically run with
  * 8–13-gram overlap against every benchmark before a corpus ships).
  *
  * Scale notes: the eval side is benchmarks (MBs) against a 100 TB corpus,
  * so the eval gram set is BROADCAST; the corpus side explodes grams
  * map-side and the broadcast-hash join filters to matches in place —
  * non-matching grams (≈ all of them) never shuffle. Only the rare
  * (doc, matched-gram) hits cross the wire into the per-document count,
  * so shuffle volume tracks contamination density, not corpus size. */
object Decontamination {

  /** Distinct word-`n`-gram frame (`gram` column) of the eval set —
    * the broadcastable right side. */
  def evalGrams(evalDocs: DataFrame, textCol: String, n: Int): DataFrame =
    evalDocs
      .select(explode(Dedup.wordGrams(textCol, n)).as("gram"))
      .distinct()

  /** Per-document overlap report against the eval set: one row per
    * CONTAMINATED document — (id, n_overlap) with `n_overlap` = number of
    * distinct eval grams the document contains (≥ `minOverlap`).
    * Clean documents produce no row (at scale the clean set is the corpus;
    * materializing it would dwarf the finding). */
  def contaminated(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                   textCol: String, n: Int = 8, minOverlap: Int = 1): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1; got $minOverlap")
    // few-file corpora scan as few partitions, serializing the CPU-heavy
    // gram pass — same treatment as the Dedup operators (no-op at scale)
    val grams = Dedup.spreadSmallInput(docs).select(col(idCol).as("id"),
      explode(Dedup.wordGrams(textCol, n)).as("gram"))
    grams
      .join(broadcast(evalGrams(evalDocs, textCol, n)), "gram")
      .groupBy("id")
      .agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
  }

  /** The corpus with contaminated documents REMOVED (the shipping filter).
    * Anti-join against the flagged set, which is small enough to broadcast
    * at any realistic contamination rate. */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                    textCol: String, n: Int = 8, minOverlap: Int = 1): DataFrame = {
    val flagged = contaminated(docs, evalDocs, idCol, textCol, n, minOverlap)
      .select(col("id").as(idCol))
    docs.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
