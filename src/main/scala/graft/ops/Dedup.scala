package graft.ops

import graft.spark.{MinHashSignature, SimHash64}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale notes (the design target is ~100 TB on a 1000-executor cluster):
  *  - exact dedup is one hash-shuffle on a 16-byte digest, not on document
  *    text — shuffle volume stays proportional to key+id width;
  *  - MinHash-LSH shuffles (band-hash, id) pairs only; candidate pairs are
  *    generated per bucket, so cost tracks true-duplicate density instead of
  *    the O(n²) pair space;
  *  - SimHash near-dup uses 4×16-bit chunk bucketing: any pair within Hamming
  *    distance 3 shares ≥1 of 4 chunks (pigeonhole), again avoiding O(n²).
  */
object Dedup {

  /** Exact dedup on a digest of `textCol`: keeps the first (minimum `idCol`)
    * row of each duplicate group. Shuffle key = md5 digest. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.withColumn("__digest", md5(col(textCol)))
      .withColumn("__keep",
        min(col(idCol)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("__digest"))))
      .where(col(idCol) === col("__keep"))
      .drop("__digest", "__keep")
  }

  /** Duplicate-group summary used by the correctness harness: one row per
    * distinct text with its multiplicity and surviving id. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  def minhashSignature(c: Column, numHashes: Int = 128, shingleSize: Int = 3): Column =
    Shims.column(MinHashSignature(Shims.expression(c), numHashes, shingleSize))

  def simhash(c: Column): Column = Shims.column(SimHash64(Shims.expression(c)))

  /** MinHash-LSH candidate pairs: signature → `numBands` band hashes →
    * explode → bucket self-join → estimated-Jaccard filter.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 128, numBands: Int = 32,
                        shingleSize: Int = 3, threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val sigs = df.select(col(idCol).as("id"),
        minhashSignature(col(textCol), numHashes, shingleSize).as("sig"))
    // band hash = hash of the band's signature slice
    val banded = sigs.select(col("id"), col("sig"),
        posexplode(sequence(lit(0), lit(numBands - 1))).as(Seq("band", "b")))
      .withColumn("band_hash",
        hash(col("b"), slice(col("sig"), col("b") * rowsPerBand + 1, lit(rowsPerBand))))
      .select("id", "sig", "band_hash")
    val a = banded.as("a")
    val b = banded.as("b")
    val pairs = a.join(b,
        col("a.band_hash") === col("b.band_hash") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
    pairs.withColumn("est_jaccard",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / lit(numHashes))
      .where(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** SimHash near-dup pairs within a Hamming radius (default 3 bits).
    * Bucketing on 4 disjoint 16-bit chunks guarantees recall for radius ≤ 3;
    * `bit_count(a^b)` verifies exactly (whole-stage codegen'd). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val chunked = sigs.select(col("id"), col("sh"),
        posexplode(array((0 until 4).map(i =>
          shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*))
          .as(Seq("chunk_idx", "chunk")))
    val a = chunked.as("a")
    val b = chunked.as("b")
    a.join(b, col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** N-gram Jaccard similarity over word shingles for candidate pairs drawn
    * from a blocking column (e.g. same source) — exact set Jaccard via
    * built-in array_intersect/array_union (no UDF in the hot path). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String, blockCol: String,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_distinct(expr(
        s"transform(filter(transform(sequence(0, size(split($textCol, '\\\\s+')) - $n), " +
        s"i -> slice(split($textCol, '\\\\s+'), i + 1, $n)), x -> size(x) = $n), " +
        "x -> array_join(x, ' '))")).as("grams"))
    val a = sh.as("a")
    val b = sh.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("inter", size(array_intersect(col("a.grams"), col("b.grams"))))
      .withColumn("uni", size(array_union(col("a.grams"), col("b.grams"))))
      .where(col("uni") > 0)
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .where(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("jaccard"))
  }
}
