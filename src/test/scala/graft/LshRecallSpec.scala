package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall proof for the LSH operators at PRODUCTION parameters, on a corpus
  * with PLANTED near-duplicates — the regime the operators are built for
  * (the driver's synthetic embeddings have a continuous similarity tail with
  * no true near-dups, so corpus-wide scans there are declared exact instead;
  * see SparkEntry q27/q28).
  *
  * Geometry: planted copies are v + 0.12·g (g standard gaussian, dim 64),
  * giving cos ≈ 1/sqrt(1 + 0.92/64) ≈ 0.993. Per-pair collision probability
  * per table is (1 − θ/π)^planes ≈ 0.63 at 12 planes, so missing all
  * 8 tables has probability ~4e-4 — recall ≈ 1 with margin over the 0.95
  * assertion. Everything is seeded, so the outcome is deterministic.
  */
class LshRecallSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("graft-lsh-recall-spec")
    .getOrCreate()

  private val dim = 64
  private val nBase = 200
  private val nPlanted = 50

  private lazy val rnd = new scala.util.Random(7)
  private lazy val base: Array[Array[Float]] =
    Array.fill(nBase)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  // planted near-duplicate of base(i) under id 1000+i
  private lazy val planted: Array[Array[Float]] =
    Array.tabulate(nPlanted)(i =>
      base(i).map(x => x + 0.12f * rnd.nextGaussian().toFloat))

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def toDf(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
  }

  test("cosineNearDupPairs recall >= 0.95 at production params (12 planes x 8 tables)") {
    val threshold = 0.9
    val all: Seq[(Long, Array[Float])] =
      base.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq ++
        planted.zipWithIndex.map { case (v, i) => (1000L + i, v) }
    // exact ground truth over every pair (driver-side; 250 vectors)
    val truePairs = (for {
      i <- all.indices; j <- (i + 1) until all.length
      if cos(all(i)._2, all(j)._2) >= threshold
    } yield {
      val (a, b) = (all(i)._1, all(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    assert(truePairs.size >= 40, s"plant failed: only ${truePairs.size} true pairs")

    val found = Similarity.cosineNearDupPairs(toDf(all), threshold,
        numPlanes = 12, numTables = 8)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // the exact-verify stage makes every reported pair true (precision 1)
    assert(found.subsetOf(truePairs), s"false positives: ${found -- truePairs}")
    val recall = (found intersect truePairs).size.toDouble / truePairs.size
    assert(recall >= 0.95, s"recall = $recall (${found.size}/${truePairs.size})")
  }

  test("lshTopK finds the source of every noisy probe at production params (8 planes x 16 tables)") {
    val corpus = toDf(base.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq)
    val probes = toDf(planted.zipWithIndex.map { case (v, i) => (1000L + i, v) }.toSeq)
    val res = Similarity.lshTopK(probes, corpus, 1, numPlanes = 8, numTables = 16)
      .collect().map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("n_id")).toMap
    val hits = (0 until nPlanted).count(i => res.get(1000L + i).contains(i.toLong))
    assert(hits >= math.ceil(nPlanted * 0.95).toInt, s"source found for $hits/$nPlanted probes")
  }

  test("semDedup: clustered (SemDeDup) and LSH candidates equal exact on separated clusters") {
    // 6 well-separated gaussian centers (dim 64 → cross-cluster cos ≈ ±0.12),
    // 8 members each at 0.1·g noise (intra-cluster cos ≈ 0.99): at τ = 0.8
    // every cluster is a complete near-dup graph and no pair crosses one, so
    // ALL THREE candidate modes must keep exactly the min id per cluster.
    val r2 = new scala.util.Random(11)
    val centers = Array.fill(6)(Array.fill(dim)(r2.nextGaussian().toFloat))
    val rows = for {
      c <- centers.indices; m <- 0 until 8
    } yield ((c * 100 + m).toLong,
      centers(c).map(x => x + 0.1f * r2.nextGaussian().toFloat))
    // sanity on the plant: separation holds for the chosen seed
    for (i <- centers.indices; j <- (i + 1) until centers.length)
      assert(cos(centers(i), centers(j)) < 0.5, s"centers $i,$j too close")
    val df = toDf(rows)
    val expectKept = centers.indices.map(_ * 100L).toSet
    def keptOf(mode: Similarity.SemDedupCandidates): Set[Long] =
      Similarity.semDedup(df, 0.8, candidates = mode)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptOf(Similarity.ExactCandidates) == expectKept)
    assert(keptOf(Similarity.ClusteredCandidates(nlist = 6)) == expectKept,
      "k-means cell scoping must not lose within-cluster pairs on separated clusters")
    assert(keptOf(Similarity.LshCandidates()) == expectKept)
  }

  test("semDedup clustered candidates: the cell self-join ships ids only") {
    // the pair explosion of a skewed cell must fan out 8-byte ids, not
    // dim-wide vectors — embeddings re-join by id after the pair space
    val r3 = new scala.util.Random(7)
    val rows = (0 until 24).map(i => (i.toLong, Array.fill(dim)(r3.nextGaussian().toFloat)))
    val out = Similarity.semDedup(toDf(rows), 0.8,
      candidates = Similarity.ClusteredCandidates(nlist = 4))
    val cellJoins = out.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.references.exists(_.name == "cell")) => j
    }
    assert(cellJoins.nonEmpty, "expected a join keyed on the cell id")
    cellJoins.foreach { j =>
      val shipped = j.children.flatMap(_.output).map(_.name)
      assert(!shipped.exists(n => n == "vec" || n.startsWith("vec_") || n == "embedding"),
        s"cell join must carry ids only, shipped: $shipped")
    }
  }

  test("semDedup keeps id-order local minima, not one-per-component") {
    // star: a(1)~c(3), b(2)~c(3), a!~b at cos >= 0.7 — c drops (a is an
    // earlier neighbor), but b SURVIVES (its only neighbor has a higher id),
    // unlike a component rule which would keep a alone
    val inv = (1.0 / math.sqrt(2.0)).toFloat
    val star = toDf(Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)), (3L, Array(inv, inv))))
    val keptStar = Similarity.semDedup(star, 0.7)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptStar == Set(1L, 2L), s"star kept $keptStar")
    // chain: x(1)~y(2)~z(3), x!~z — y and z both have earlier neighbors,
    // only x survives (here the rule agrees with the component rule)
    val chain = toDf(Seq(
      (1L, Array(1f, 0f)), (2L, Array(inv, inv)), (3L, Array(0f, 1f))))
    val keptChain = Similarity.semDedup(chain, 0.7)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptChain == Set(1L), s"chain kept $keptChain")
  }
}
