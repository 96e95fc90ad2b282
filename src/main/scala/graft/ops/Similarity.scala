package graft.ops

import graft.spark.{CosineSimilarity, HyperplaneLshBucket}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale notes: brute-force is the correctness baseline (O(|Q|·|C|) dot
  * products — fine when the query side is small and broadcast); the LSH path
  * buckets both sides with seeded random hyperplanes so the join fans out to
  * bucket-local candidates only, and the final exact re-rank touches a small
  * candidate set. At 100 TB the corpus side stays partition-local throughout:
  * no shuffle of the embedding vectors themselves beyond the bucket key.
  */
object Similarity {

  def cosine(a: Column, b: Column): Column =
    Shims.column(CosineSimilarity(Shims.expression(a), Shims.expression(b)))

  def lshBucket(c: Column, numPlanes: Int = 16, seed: Long = 42L): Column =
    Shims.column(HyperplaneLshBucket(Shims.expression(c), numPlanes, seed))

  /** Exact top-k neighbors for each query vector (brute force, broadcast
    * query side). Returns (q_id, n_id, sim, rank). Tie-break on neighbor id
    * keeps results deterministic. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "vec_id", qVec: String = "embedding",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
    val c = corpus.select(col(cId).as("n_id"), col(cVec).as("n_vec"))
    val scored = broadcast(q).crossJoin(c)
      .where(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "sim", "rank")
  }

  /** Approximate top-k via hyperplane LSH with multi-probe (probe 0 = own
    * bucket; additional probes flip one signature bit each, trading recall
    * for fan-out). Exact cosine re-rank inside candidate buckets. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              numPlanes: Int = 12, probes: Int = 4, seed: Long = 42L,
              qId: String = "vec_id", qVec: String = "embedding",
              cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val c = corpus.select(col(cId).as("n_id"), col(cVec).as("n_vec"))
      .withColumn("bucket", lshBucket(col("n_vec"), numPlanes, seed))
    val probeCols = (0 until math.max(1, probes)).map { p =>
      if (p == 0) col("__bucket0")
      else col("__bucket0").bitwiseXOR(lit(1 << (p - 1)))
    }
    val q = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
      .withColumn("__bucket0", lshBucket(col(qVec), numPlanes, seed))
      .withColumn("bucket", explode(array(probeCols: _*)))
      .drop("__bucket0")
    val scored = broadcast(q).join(c, Seq("bucket"))
      .where(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
      .dropDuplicates("q_id", "n_id")
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "sim", "rank")
  }

  /** Embedding-cosine near-duplicate pairs over the whole corpus (id_a < id_b,
    * sim ≥ threshold), LSH-bucketed to avoid the O(n²) pair space. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         numPlanes: Int = 10, seed: Long = 42L): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", lshBucket(col("vec"), numPlanes, seed))
    val l = b.as("a")
    val r = b.as("b")
    l.join(r, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("sim", cosine(col("a.vec"), col("b.vec")))
      .where(col("sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("sim"))
  }
}
