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
  * buckets both sides with `numTables` independent sets of seeded random
  * hyperplanes, so the join fans out to bucket-local candidates only and a
  * neighbor is found if it collides in ANY table (recall 1−(1−p^k)^L).
  * The final exact cosine re-rank touches only the candidate set. At 100 TB
  * the corpus side stays partition-local throughout: the broadcast-hash join
  * on (table, bucket) shuffles no corpus vectors at all.
  */
object Similarity {

  def cosine(a: Column, b: Column): Column =
    Shims.column(CosineSimilarity(Shims.expression(a), Shims.expression(b)))

  /** One bucket id per hash table: `array<int>` of length `numTables`. */
  def lshBuckets(c: Column, numPlanes: Int = 16, numTables: Int = 1, seed: Long = 42L): Column =
    Shims.column(HyperplaneLshBucket(Shims.expression(c), numPlanes, seed, numTables))

  def lshBucket(c: Column, numPlanes: Int = 16, seed: Long = 42L): Column =
    element_at(lshBuckets(c, numPlanes, 1, seed), 1)

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

  /** Approximate top-k via multi-table hyperplane LSH: a candidate is any
    * corpus vector sharing a bucket with the query in at least one of the
    * `numTables` tables; candidates get an exact cosine re-rank. Higher
    * `numTables` → higher recall; higher `numPlanes` → fewer candidates. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              numPlanes: Int = 8, numTables: Int = 16, seed: Long = 42L,
              qId: String = "vec_id", qVec: String = "embedding",
              cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    // Shuffle discipline: the ×numTables bucket join matches on
    // (tbl, bucket) with ids only; both embedding columns are re-joined by
    // id after candidate dedup so they never ride the bucket fan-out.
    val cv = corpus.select(col(cId).as("n_id"), col(cVec).as("n_vec"))
    val qv = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
    val c = cv.select(col("n_id"),
      posexplode(lshBuckets(col("n_vec"), numPlanes, numTables, seed)).as(Seq("tbl", "bucket")))
    val q = qv.select(col("q_id"),
      posexplode(lshBuckets(col("q_vec"), numPlanes, numTables, seed)).as(Seq("tbl", "bucket")))
    val scored = broadcast(q).join(c, Seq("tbl", "bucket"))
      .where(col("q_id") =!= col("n_id"))
      .dropDuplicates("q_id", "n_id")
      .join(broadcast(qv), "q_id")
      .join(cv, "n_id")
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "sim", "rank")
  }

  /** IVF (inverted-file) approximate top-k: a coarse k-means quantizer
    * (cosine distance, trained once on the corpus) partitions vectors into
    * `nlist` cells; each query probes its `nprobe` nearest cells and
    * exact-re-ranks only the vectors in those cells. Recall rises with
    * nprobe (nprobe = nlist is exhaustive); candidate cost is ~nprobe/nlist
    * of the corpus.
    *
    * Scale notes: the quantizer trains EAGERLY at call time on a bounded
    * hash-ordered driver sample (≤65,536 rows, local Lloyd's — the
    * [[pqTrain]]/FAISS discipline, one Spark job); pass `trainFraction < 1`
    * to pre-thin the sample draw at scale.
    * Cell assignment is a partition-local expression
    * with the centroid table shipped in the closure; the probe join matches
    * on the int cell id with ids only — vectors are re-joined by id after
    * candidate dedup, the same discipline as the LSH paths. At 100 TB the
    * corpus side never shuffles: cells are the natural partitioning key for
    * the inverted file. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
              trainFraction: Double = 1.0,
              qId: String = "vec_id", qVec: String = "embedding",
              cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val cv = corpus.select(col(cId).as("n_id"), col(cVec).as("n_vec"))
    val qv = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
    // coarse quantizer: k-means in cosine geometry, deterministic via seed.
    // Zero-norm vectors (padding rows, failed embeds) are excluded from
    // TRAINING only — cosine k-means rejects them — but stay in the corpus
    // (NearestCentroids assigns them deterministically, cosine scores 0).
    val centroids: Seq[Seq[Double]] = trainCentroids(
      cv.select(col("n_id").as("id"), col("n_vec").as("vec")),
      nlist, seed, trainFraction)

    def cells(c: Column, probes: Int): Column =
      Shims.column(graft.spark.NearestCentroids(Shims.expression(c), centroids, probes))

    val corpusCells = cv.select(col("n_id"), element_at(cells(col("n_vec"), 1), 1).as("cell"))
    val queryCells = qv.select(col("q_id"), explode(cells(col("q_vec"), nprobe)).as("cell"))
    val scored = broadcast(queryCells).join(corpusCells, "cell")
      .where(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
      .dropDuplicates("q_id", "n_id")
      .join(broadcast(qv), "q_id")
      .join(cv, "n_id")
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "sim", "rank")
  }

  /** EXACT corpus-wide cosine pairs at a threshold (id_a < id_b,
    * sim ≥ threshold) — a declared O(n²) block-nested-loop, for thresholds
    * that sit inside the corpus's continuous similarity tail. In that regime
    * hyperplane LSH cannot beat brute force at full recall (the collision
    * probability at sim ≈ 0.4 forces more candidate work than the n²/2 pair
    * space — measured on this corpus: 4 planes × 64 tables ≈ 4× brute
    * force), so the honest plan is the exact one. The broadcast side is the
    * (id, vec) projection; at corpora beyond broadcast size, grid-partition
    * both sides (p×p blocks) instead. True NEAR-duplicate corpora
    * (sim ≥ ~0.85) should use [[cosineNearDupPairs]], whose recall at
    * production parameters is spec-proven (LshRecallSpec). */
  def cosineAllPairs(df: DataFrame, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    vecs.select(col("id").as("id_a"), col("vec").as("vec_a"))
      .join(broadcast(vecs.select(col("id").as("id_b"), col("vec").as("vec_b"))),
        col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs over the whole corpus (id_a < id_b,
    * sim ≥ threshold), multi-table LSH-bucketed to avoid the O(n²) pair space
    * while keeping recall high for truly-near pairs. */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         numPlanes: Int = 12, numTables: Int = 8,
                         seed: Long = 42L): DataFrame = {
    // Shuffle discipline: the ×numTables bucket self-join carries only
    // (tbl, bucket, id) — vectors are re-joined by id AFTER pair dedup, so
    // the wide embedding column never rides the candidate-pair explosion
    // (at 64 tables that join is ~numTables× the corpus; carrying two
    // embeddings through it dominates the whole query otherwise).
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val b = vecs.select(col("id"),
        posexplode(lshBuckets(col("vec"), numPlanes, numTables, seed)).as(Seq("tbl", "bucket")))
    b.as("a")
      .join(b.as("b"), col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(vecs.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .where(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** How [[semDedup]] generates its candidate near-duplicate pairs. */
  sealed trait SemDedupCandidates extends Serializable
  /** Exact all-pairs scoring — full recall, declared O(n²); the correctness
    * baseline and the honest plan for thresholds inside the corpus's
    * continuous similarity tail (see [[cosineAllPairs]]). */
  case object ExactCandidates extends SemDedupCandidates
  /** Multi-table hyperplane-LSH buckets ([[cosineNearDupPairs]]) — the scale
    * path for true near-duplicate thresholds (sim ≥ ~0.85), where banded
    * collisions have spec-proven recall (LshRecallSpec). */
  final case class LshCandidates(numPlanes: Int = 12, numTables: Int = 8,
                                 seed: Long = 42L) extends SemDedupCandidates
  /** SemDeDup's cluster scoping (Abbas et al., "SemDeDup", 2023): a coarse
    * k-means quantizer (cosine geometry, [[ivfTopK]]'s machinery) partitions
    * the corpus into `nlist` cells and only WITHIN-cell pairs are scored —
    * cost Σ|cell|²·dim instead of n²·dim. Pairs that straddle a cell
    * boundary are missed by construction; that is the documented SemDeDup
    * approximation, acceptable when clusters are well-separated relative to
    * the threshold (spec-proven equal to exact on planted separated
    * clusters). */
  final case class ClusteredCandidates(nlist: Int = 16, trainFraction: Double = 1.0,
                                       seed: Long = 42L) extends SemDedupCandidates

  /** Semantic deduplication over an embedding column: keep a row iff NO
    * lower-id row sits within cosine `threshold` of it — the id-order local
    * minima of the near-neighbor graph. The decision reads raw pairs only
    * (no iteration, no dependence on what else was kept), so it is cheap
    * and deterministic; a component may retain several rows (a node whose
    * neighbors all have higher ids survives), where
    * [[Dedup.dropNearDups]] keeps exactly one row per CONNECTED COMPONENT.
    * Returns the kept rows with all original columns.
    *
    * Scale notes: the drop set ships as an ids-only left-anti join; with
    * [[ClusteredCandidates]] the pair space is cell-local (embeddings ride
    * exactly one shuffle keyed by cell id) and with [[LshCandidates]] the
    * bucket fan-out carries ids only — the full corpus row never travels
    * with its vector beyond the first projection. */
  def semDedup(df: DataFrame, threshold: Double,
               idCol: String = "vec_id", vecCol: String = "embedding",
               candidates: SemDedupCandidates = ExactCandidates): DataFrame = {
    val pairs = candidates match {
      case ExactCandidates => cosineAllPairs(df, threshold, idCol, vecCol)
      case LshCandidates(planes, tables, seed) =>
        cosineNearDupPairs(df, threshold, idCol, vecCol, planes, tables, seed)
      case ClusteredCandidates(nlist, trainFraction, seed) =>
        val cv = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
        val centroids = trainCentroids(cv, nlist, seed, trainFraction)
        def cells(c: Column): Column =
          Shims.column(graft.spark.NearestCentroids(Shims.expression(c), centroids, 1))
        // ids-first discipline, same as the LSH paths: the cell self-join
        // ships (cell, id) ONLY — a skewed cell's pair explosion fans out
        // 8-byte ids, not Σ|cell|²·2·dim vector doubles into one reducer's
        // shuffle fetch; embeddings re-join by id on the (far smaller)
        // candidate-pair set before the exact cosine
        val celled = cv.select(col("id"), element_at(cells(col("vec")), 1).as("cell"))
        celled.select(col("cell"), col("id").as("id_a"))
          .join(celled.select(col("cell"), col("id").as("id_b")), Seq("cell"))
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b")
          .join(cv.select(col("id").as("id_a"), col("vec").as("vec_a")), "id_a")
          .join(cv.select(col("id").as("id_b"), col("vec").as("vec_b")), "id_b")
          .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
          .where(col("sim") >= threshold)
          .select(col("id_a"), col("id_b"), col("sim"))
    }
    val drops = pairs.select(col("id_b").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** A trained product-quantization codebook: `m` subspaces × `ksub`
    * centroids × `dim/m` dims, over L2-NORMALIZED vectors. */
  final case class PqCodebook(centroids: Seq[Seq[Seq[Double]]]) {
    def m: Int = centroids.size
    def ksub: Int = centroids.head.size
    def dsub: Int = centroids.head.head.size
  }

  /** Train a PQ codebook (Jégou et al. 2011): normalize, split each vector
    * into `m` subvectors, run seeded k-means with `ksub` centers in EACH
    * subspace. Training collects a BOUNDED deterministic sample to the
    * driver (`maxTrainRows`, hash-ordered so the same corpus always yields
    * the same sample) and runs local Lloyd's iterations there — the FAISS
    * discipline: centroids converge on a sample, and 64k × dim doubles
    * (~32 MB at dim=64) is driver-trivial even when the corpus is 100 TB.
    * One Spark job total, vs m distributed fits. */
  def pqTrain(corpus: DataFrame, m: Int = 8, ksub: Int = 16, seed: Long = 42L,
              trainFraction: Double = 1.0, vecCol: String = "embedding",
              maxTrainRows: Int = 65536): PqCodebook = {
    val dim = corpus.select(size(col(vecCol)).as("d")).head.getInt(0)
    require(dim % m == 0, s"pqTrain: dim $dim must divide into m=$m subvectors")
    val dsub = dim / m
    val base = (if (trainFraction < 1.0) corpus.sample(trainFraction, seed) else corpus)
      .select(col(vecCol).as("v"))
      .withColumn("h", xxhash64(col("v")))
      .orderBy("h").limit(maxTrainRows)
      .select("v")
    val sample: Array[Array[Double]] = base.collect().map { r =>
      val s = r.getSeq[Float](0)
      val a = new Array[Double](dim)
      var n2 = 0.0
      var i = 0
      while (i < math.min(dim, s.length)) { a(i) = s(i).toDouble; n2 += a(i) * a(i); i += 1 }
      if (n2 > 0.0 && !java.lang.Double.isNaN(n2)) {
        val inv = 1.0 / math.sqrt(n2); i = 0
        while (i < dim) { a(i) *= inv; i += 1 }
      }
      a
    }
    require(sample.nonEmpty, "pqTrain: empty training set")
    val cents: Seq[Seq[Seq[Double]]] = (0 until m).map { j =>
      localKMeans(sample, j * dsub, dsub, ksub, seed + j).map(_.toSeq).toSeq
    }
    PqCodebook(cents)
  }

  /** Seeded local Lloyd's over one subspace of the collected sample:
    * farthest-point (maximin) init, 10 iterations, empty clusters keep
    * their previous center. Deterministic given the same sample.
    *
    * Init matters here: a plain seeded-shuffle init can drop two seeds
    * into one natural cluster and Lloyd's never recovers (it splits that
    * cluster and merges two others — LshRecallSpec's separated-cluster
    * invariant caught exactly this after the switch from ML KMeans, whose
    * k-means|| seeding avoided it). Maximin picks each next seed as the
    * point farthest from all chosen seeds: on separated clusters that is
    * provably one seed per cluster, and it is deterministic — the first
    * seed comes from a seeded shuffle, ties break on the lowest row index
    * of the deterministic hash-ordered sample. */
  private def localKMeans(sample: Array[Array[Double]], off: Int, dsub: Int,
                          k: Int, seed: Long): Array[Array[Double]] = {
    val n = sample.length
    val rnd = new scala.util.Random(seed)
    val order = rnd.shuffle((0 until n).toVector)
    val centers = Array.ofDim[Double](k, dsub)
    // first seed: first row of the seeded shuffle
    java.lang.System.arraycopy(sample(order(0)), off, centers(0), 0, dsub)
    var taken = 1
    // minD2(r) = distance^2 from row r to its nearest chosen seed
    val minD2 = new Array[Double](n)
    var r0 = 0
    while (r0 < n) {
      var d = 0.0
      var i = 0
      while (i < dsub) { val t = sample(r0)(off + i) - centers(0)(i); d += t * t; i += 1 }
      minD2(r0) = d
      r0 += 1
    }
    while (taken < k) {
      var best = -1
      var bestD = -1.0
      var r = 0
      while (r < n) {
        if (minD2(r) > bestD) { bestD = minD2(r); best = r }
        r += 1
      }
      if (bestD <= 0.0) {
        // fewer distinct rows than k: remaining centers duplicate the last
        java.lang.System.arraycopy(centers(taken - 1), 0, centers(taken), 0, dsub)
        taken += 1
      } else {
        var i = 0
        while (i < dsub) { centers(taken)(i) = sample(best)(off + i); i += 1 }
        r = 0
        while (r < n) {
          var d = 0.0
          i = 0
          while (i < dsub) { val t = sample(r)(off + i) - centers(taken)(i); d += t * t; i += 1 }
          if (d < minD2(r)) minD2(r) = d
          r += 1
        }
        taken += 1
      }
    }
    val assign = new Array[Int](n)
    var iter = 0
    while (iter < 10) {
      var r = 0
      while (r < n) {
        val row = sample(r)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0
          var i = 0
          while (i < dsub) { val t = row(off + i) - centers(c)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(r) = best
        r += 1
      }
      val sums = Array.ofDim[Double](k, dsub)
      val counts = new Array[Long](k)
      r = 0
      while (r < n) {
        val row = sample(r)
        val c = assign(r)
        counts(c) += 1
        var i = 0
        while (i < dsub) { sums(c)(i) += row(off + i); i += 1 }
        r += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < dsub) { centers(c)(i) = sums(c)(i) / counts(c); i += 1 }
        }
        c += 1
      }
      iter += 1
    }
    centers
  }

  /** `binary` PQ codes (`m` bytes) for every corpus row — at scale this is
    * computed ONCE and persisted as a column next to the table (the codes
    * are what the search scans; the fp32 vectors are only touched by the
    * final re-rank). */
  def pqEncode(corpus: DataFrame, cb: PqCodebook,
               vecCol: String = "embedding", codesCol: String = "pq_codes"): DataFrame =
    corpus.withColumn(codesCol,
      Shims.column(graft.spark.PqEncode(Shims.expression(col(vecCol)), cb.centroids)))

  /** Approximate top-k via PQ + ADC: each query builds ONE m·ksub lookup
    * table; every corpus code scores with m table lookups (no vector
    * decoded); the `shortlist` best ADC candidates per query get an exact
    * cosine re-rank on the true vectors. Returns (q_id, n_id, sim, rank).
    *
    * Scale notes: the scoring pass reads m BYTES per corpus row instead of
    * dim floats — 32× less data and ~dim/m× less arithmetic at dim=64,
    * m=8 — and the codes column is partition-local throughout (the
    * broadcast side is queries + LUTs). Only shortlist·|Q| true vectors are
    * ever fetched, by id. Recall is governed by `shortlist` (exact re-rank
    * can only lose a neighbor the ADC pass dropped). */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int, cb: PqCodebook,
             shortlist: Int = 64,
             qId: String = "vec_id", qVec: String = "embedding",
             cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    require(k <= shortlist, s"pqTopK: k=$k must be <= shortlist=$shortlist")
    val cv = corpus.select(col(cId).as("n_id"), col(cVec).as("n_vec"))
    val qv = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
    val codes = pqEncode(cv, cb, "n_vec", "codes").select("n_id", "codes")
    val luts = qv.select(col("q_id"),
      Shims.column(graft.spark.PqLut(Shims.expression(col("q_vec")), cb.centroids)).as("lut"))
    val adc = broadcast(luts).crossJoin(codes)
      .where(col("q_id") =!= col("n_id"))
      .withColumn("adc", Shims.column(graft.spark.PqAdcDistance(
        Shims.expression(col("lut")), Shims.expression(col("codes")))))
    val ws = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("n_id").asc)
    val shortlisted = adc.withColumn("srank", row_number().over(ws))
      .where(col("srank") <= shortlist)
      .select("q_id", "n_id")
    val scored = shortlisted
      .join(broadcast(qv), "q_id")
      .join(cv, "n_id")
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "sim", "rank")
  }

  /** IVF-PQ (the FAISS IndexIVFPQ composition): a coarse quantizer prunes
    * the candidate set to the query's `nprobe` nearest cells, PQ/ADC scores
    * only those cells' CODES (m bytes + m lookups per candidate), and the
    * exact re-rank touches only the `shortlist` best. Candidate cost is
    * ~nprobe/nlist of the corpus × m/(4·dim) of the bytes — at 100 TB of
    * fp32 embeddings that is the difference between scanning terabytes and
    * scanning a few gigabytes of codes. Cells and codes are both
    * partition-local (at scale both are computed once and PERSISTED as
    * columns); the broadcast side is queries + LUTs. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int, cb: PqCodebook,
                nlist: Int = 16, nprobe: Int = 4, shortlist: Int = 64,
                seed: Long = 42L, trainFraction: Double = 1.0,
                qId: String = "vec_id", qVec: String = "embedding",
                cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    require(k <= shortlist, s"ivfPqTopK: k=$k must be <= shortlist=$shortlist")
    val cv = corpus.select(col(cId).as("n_id"), col(cVec).as("n_vec"))
    val qv = queries.select(col(qId).as("q_id"), col(qVec).as("q_vec"))
    val centroids = trainCentroids(
      cv.select(col("n_id").as("id"), col("n_vec").as("vec")),
      nlist, seed, trainFraction)
    def cells(c: Column, probes: Int): Column =
      Shims.column(graft.spark.NearestCentroids(Shims.expression(c), centroids, probes))
    val corpusSide = pqEncode(cv, cb, "n_vec", "codes")
      .select(col("n_id"), element_at(cells(col("n_vec"), 1), 1).as("cell"), col("codes"))
    val querySide = qv.select(col("q_id"),
        explode(cells(col("q_vec"), nprobe)).as("cell"),
        Shims.column(graft.spark.PqLut(Shims.expression(col("q_vec")), cb.centroids)).as("lut"))
    val adc = broadcast(querySide).join(corpusSide, "cell")
      .where(col("q_id") =!= col("n_id"))
      .withColumn("adc", Shims.column(graft.spark.PqAdcDistance(
        Shims.expression(col("lut")), Shims.expression(col("codes")))))
      // a vector can reach one query through several probed cells only if
      // cell assignment were multi-probe on the corpus side — it is not
      // (corpus rows carry their single nearest cell), so no dedup needed
    val ws = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col("n_id").asc)
    val shortlisted = adc.withColumn("srank", row_number().over(ws))
      .where(col("srank") <= shortlist)
      .select("q_id", "n_id")
    val scored = shortlisted
      .join(broadcast(qv), "q_id")
      .join(cv, "n_id")
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "n_id", "sim", "rank")
  }

  /** Coarse k-means quantizer centers in cosine geometry (shared by
    * [[ivfTopK]] and [[semDedup]]'s cluster scoping), deterministic via
    * seed: the same bounded-driver-sample discipline as
    * [[pqTrain]] (the FAISS recipe). A deterministic hash-ordered sample of
    * at most `maxTrainRows` vectors rides back to the driver — 64k × dim
    * doubles (~32 MB at dim=64) regardless of corpus size — and LOCAL
    * Lloyd's runs there in ONE pass of driver arithmetic. Rows are
    * L2-normalized first, which makes Euclidean Lloyd's equivalent to
    * spherical (cosine) k-means for ASSIGNMENT (‖a−b‖² = 2 − 2·cosθ on the
    * unit sphere); zero-norm vectors (padding rows, failed embeds) are
    * excluded from training exactly as before, and cell ASSIGNMENT of the
    * full corpus stays a partition-local expression either way.
    *
    * vs the previous distributed ML KMeans fit: one Spark job instead of
    * 12+ (k-means‖ init rounds + 10 Lloyd jobs), which at any scale is
    * pure scheduling overhead for a quantizer that converges on a sample.
    * Centroid POSITIONS differ from the old fit's; every declared IVF query
    * is constructed to be centroid-placement-independent (exhaustive
    * probes, or colinear-probe top-1 — see q38/q44/q90 notes). */
  private def trainCentroids(cv: DataFrame, nlist: Int, seed: Long,
                             trainFraction: Double,
                             maxTrainRows: Int = 65536): Seq[Seq[Double]] = {
    val trainable = cv
      .where(expr("aggregate(vec, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) > 0"))
    val base = (if (trainFraction < 1.0) trainable.sample(trainFraction, seed) else trainable)
      .select(col("vec").as("v"))
      .withColumn("h", xxhash64(col("v")))
      .orderBy("h").limit(maxTrainRows)
      .select("v")
    val sample: Array[Array[Double]] = base.collect().map { r =>
      val s = r.getSeq[Float](0)
      val a = new Array[Double](s.length)
      var n2 = 0.0
      var i = 0
      while (i < s.length) { a(i) = s(i).toDouble; n2 += a(i) * a(i); i += 1 }
      // n2 > 0 guaranteed by the trainable filter
      val inv = 1.0 / math.sqrt(n2); i = 0
      while (i < a.length) { a(i) *= inv; i += 1 }
      a
    }
    require(sample.nonEmpty, "trainCentroids: empty training set")
    val dim = sample(0).length
    localKMeans(sample, 0, dim, nlist, seed).map(_.toSeq).toSeq
  }
}
