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
    * row of each duplicate group.
    *
    * Plan shape: only DUPLICATED digests need arbitration, and at realistic
    * duplicate rates that set is tiny — so the arbitration frame
    * (digest, keep_id) for groups with n > 1 is built from a narrow
    * (digest, id) projection (map-side partial agg, 16-byte-key shuffle) and
    * broadcast back. Document text therefore NEVER crosses the wire: the
    * survivor filter is a broadcast-hash join against the full rows in place.
    * (A corpus that is MOSTLY duplicates would outgrow the broadcast — drop
    * the hint there and let AQE pick the join, paying one row shuffle.) */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withDigest = df.withColumn("__digest", md5(col(textCol)))
    val dupKeepers = withDigest
      .groupBy(col("__digest"))
      .agg(min(col(idCol)).as("__keep"), count(lit(1)).as("__n"))
      .where(col("__n") > 1)
      .select(col("__digest"), col("__keep"))
    withDigest
      .join(broadcast(dupKeepers), Seq("__digest"), "left_outer")
      .where(col("__keep").isNull || col(idCol) === col("__keep"))
      .drop("__digest", "__keep")
  }

  /** Duplicate-group summary used by the correctness harness: one row per
    * distinct text with its multiplicity and surviving id. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  def minhashSignature(c: Column, numHashes: Int = 128, shingleSize: Int = 3): Column =
    Shims.column(MinHashSignature(Shims.expression(c), numHashes, shingleSize))

  /** Fused signature→band-hash computation (one pass, no signature column
    * ever materialized) — see [[graft.spark.MinHashBandHashes]]. */
  def minhashBandHashes(c: Column, numHashes: Int = 128, numBands: Int = 32,
                        shingleSize: Int = 3): Column =
    Shims.column(graft.spark.MinHashBandHashes(Shims.expression(c), numHashes, numBands, shingleSize))

  def simhash(c: Column): Column = Shims.column(SimHash64(Shims.expression(c)))

  /** Distinct word-`n`-gram set of `textCol` (space-joined shingles).
    * Fewer than `n` tokens collapses to one gram of the whole token sequence
    * (so short docs still dedup against each other); zero tokens → empty set. */
  private[graft] def wordGrams(textCol: String, n: Int): Column = {
    val toks = s"filter(split($textCol, '\\\\s+'), x -> x != '')"
    expr(
      s"""array_distinct(CASE
         |  WHEN size($toks) = 0 THEN CAST(array() AS ARRAY<STRING>)
         |  WHEN size($toks) < $n THEN array(array_join($toks, ' '))
         |  ELSE transform(sequence(0, size($toks) - $n),
         |                 i -> array_join(slice($toks, i + 1, $n), ' '))
         |END)""".stripMargin)
  }

  /** Banded-LSH candidate pairs over a `(id, sig)` frame: band hashes are
    * computed pre-explode so the self-join shuffles only `(band_hash, id)` —
    * the 128-long signatures never ride through the ×numBands explode. */
  private def bandCandidates(sigs: DataFrame, numHashes: Int, numBands: Int): DataFrame = {
    val rowsPerBand = numHashes / numBands
    val banded = sigs.select(col("id"),
        explode(expr(s"transform(sequence(0, ${numBands - 1}), " +
          s"b -> hash(b, slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))")).as("bh"))
    banded.as("a")
      .join(banded.as("b"), col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  private def persistedSigs(df: DataFrame, idCol: String, textCol: String,
                            numHashes: Int, shingleSize: Int): DataFrame =
    // The signature (numHashes permutations over full document text) is
    // referenced more than once (band explode + re-joins); persist so it is
    // computed once instead of 3× — at 100 TB the recompute would dominate.
    // The cache lives until the session drops it (the returned plan is lazy,
    // so this function cannot unpersist); batch jobs end with the session,
    // long-lived services should `spark.catalog.clearCache()` between runs.
    df.select(col(idCol).as("id"),
        minhashSignature(col(textCol), numHashes, shingleSize).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** A corpus that fits a few files scans as that few partitions,
    * serializing the CPU-heavy text passes. Repartition only in that
    * under-parallelized case, detected from FILE METADATA only —
    * `df.rdd.getNumPartitions` would eagerly execute upstream shuffle
    * stages under AQE. Non-file-backed inputs (joins, streams) are left
    * alone: their upstream shuffles already set the parallelism; at
    * production scale inputs carry thousands of files and this is a no-op. */
  private[ops] def spreadSmallInput(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val files = try df.inputFiles.length catch { case _: Exception => 0 }
    if (files == 0 || files >= math.max(2, target / 2)) df
    else df.repartition(target)
  }

  /** MinHash-LSH candidate pairs: signature → `numBands` band hashes →
    * explode → bucket self-join → estimated-Jaccard filter.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 128, numBands: Int = 32,
                        shingleSize: Int = 3, threshold: Double = 0.7): DataFrame = {
    val sigs = persistedSigs(spreadSmallInput(df), idCol, textCol, numHashes, shingleSize)
    bandCandidates(sigs, numHashes, numBands)
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
          .cast("double") / lit(numHashes))
      .where(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
  }

  /** MinHash-LSH near-duplicate pairs with EXACT verification: banded LSH
    * proposes candidates, then exact word-`shingleSize`-gram Jaccard filters
    * at `threshold`. Output (id_a, id_b, jaccard) is the exact similarity,
    * so results are engine-reproducible (the signature only drives candidate
    * generation, never the reported value).
    *
    * Scale: candidate volume tracks true near-duplicate density (band
    * buckets), the exact verify touches only candidates, and the gram
    * arrays are joined by id for candidates only — never exploded. With the
    * default 32 bands × 4 rows, a pair at Jaccard `j` is proposed with
    * probability 1−(1−j⁴)³²  (≥ 0.9998 at j = 0.7). */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 128, numBands: Int = 32,
                        shingleSize: Int = 3, threshold: Double = 0.7): DataFrame = {
    val spread = spreadSmallInput(df) // checked once, shared by both passes
    // Fused signature→band-hash expression: ONE pass over the text computes
    // the banded (id, bh) frame directly — no 128-long signature column is
    // ever materialized or cached. The 16-byte-row banded frame is what the
    // self-join reads twice, so IT is what persists (32 rows/doc vs a 1 KB
    // signature array/doc: ~2× less cache, one fewer corpus text pass).
    val banded = spread
      .select(col(idCol).as("id"),
        explode(minhashBandHashes(col(textCol), numHashes, numBands, shingleSize)).as("bh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = banded.as("a")
      .join(banded.as("b"), col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // gram arrays feed BOTH candidate re-joins; persist so the gram pass
    // runs once on all cores
    val grams = spread
      .select(col(idCol).as("id"), wordGrams(textCol, shingleSize).as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    candidates
      .join(grams.select(col("id").as("id_a"), col("grams").as("g_a")), "id_a")
      .join(grams.select(col("id").as("id_b"), col("grams").as("g_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("g_a"), col("g_b"))))
      .withColumn("uni", size(col("g_a")) + size(col("g_b")) - col("inter"))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter").cast("double") / col("uni")).otherwise(lit(0.0)))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs within a Hamming radius (default 3 bits).
    * Bucketing on 4 disjoint 16-bit chunks guarantees recall for radius ≤ 3;
    * `bit_count(a^b)` verifies exactly (whole-stage codegen'd). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    // the 64-bit signature feeds both sides of the chunk self-join; persist
    // (id, sh) — 16 bytes/row — so SimHash64 runs over the corpus once, the
    // same discipline as the minhash paths
    val sigs = spreadSmallInput(df)
      .select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
    * from a blocking column (e.g. same source) — exact set Jaccard computed
    * via an inverted index: explode grams, self-join on (block, gram), count
    * shared grams per pair, |A∪B| = |A|+|B|−|A∩B|.
    *
    * The inverted index is PREFIX-FILTERED (AllPairs/PPJoin family): each
    * doc indexes only `|A| − ⌈t·|A|⌉ + 1` grams selected under a global
    * total order, which is provably lossless — under ANY total order, two
    * sets with Jaccard ≥ t must share a gram inside both prefixes.
    * Candidates then get an exact `array_intersect` verify.
    *
    * Scale notes: `prefixOrder = "sampled"` (default) orders grams by a
    * driver-sampled document-frequency ranking — per-row prefix selection
    * (no corpus-wide exchange to build the index) that still keeps the
    * corpus's frequent grams OUT of prefixes, so per-gram posting lists
    * stay short and the self-join cannot blow up Θ(m²) on a hot gram.
    * `"df"` is the classic exact rarest-first order (minimum candidates,
    * three extra corpus-wide exchanges); `"hash"` is order-by-hash (zero
    * setup, UNSAFE under stop-gram skew — a gram shared by m docs yields
    * Θ(m²) candidates). The exact verify joins gram arrays by id for
    * surviving candidates only.
    *
    * NOTE: with `prefixOrder = "sampled"` CALLING this method triggers one
    * bounded Spark job at plan-construction time (the hot-gram sample
    * aggregation, ≤ `hotK` rows collected to the driver — the same eager
    * pattern as `ivfTopK`'s quantizer training); the returned DataFrame is
    * otherwise lazy. Use `"hash"`/`"df"` if plan construction must not
    * touch the cluster. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String, blockCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   prefixOrder: String = "sampled",
                   sampleOneIn: Int = 16, hotK: Int = 4096): DataFrame = {
    // The inverted index can only materialize pairs sharing ≥1 gram, so a
    // threshold of 0 (which would include gram-disjoint pairs) is not
    // expressible in this plan shape — reject it instead of silently
    // diverging from exact all-pairs semantics.
    require(threshold > 0.0,
      s"ngramJaccard requires threshold > 0 (inverted index only sees pairs sharing a gram); got $threshold")
    require(Set("sampled", "hash", "df").contains(prefixOrder),
      s"prefixOrder must be 'sampled', 'hash' or 'df'; got $prefixOrder")
    val toks = s"filter(split($textCol, '\\\\s+'), x -> x != '')"
    val gramsOf = array_distinct(expr(
      s"CASE WHEN size($toks) < $n THEN CAST(array() AS ARRAY<STRING>) ELSE " +
      s"transform(sequence(0, size($toks) - $n), " +
      s"i -> array_join(slice($toks, i + 1, $n), ' ')) END"))
    val spread = spreadSmallInput(df)
    val sh = spread.select(col(idCol).as("id"), col(blockCol).as("blk"),
        gramsOf.as("grams"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Prefix selection is lossless under ANY global total order of grams
    // (two sets at Jaccard ≥ t must share a gram inside both prefixes
    // whatever the order is); the order only tunes HOW FEW candidates the
    // index generates. Three orders are offered:
    //  - "sampled" (default): ascending (sampled-df rank, xxhash64(gram),
    //    gram). A deterministic 1-in-`sampleOneIn` id-hash sample of docs is
    //    aggregated ONCE, eagerly, into the top-`hotK` grams by sampled
    //    frequency; that bounded ranking ships inside a HotGramRank
    //    expression (broadcast-style). Hot grams rank 1..K (hottest = K) and
    //    therefore sort LAST — provably excluded from prefixes exactly as in
    //    exact-df order — while the unsampled tail falls back to hash order.
    //    Prefix selection stays a pure per-row array computation: the only
    //    corpus-wide shuffle in the whole plan is the prefix self-join.
    //    Skew-resistant AND exchange-free — r6 measured hash order 3× slower
    //    than df under stop-gram skew; this keeps df's candidate bound
    //    without its three extra corpus-wide exchanges.
    //  - "df": the classic AllPairs rarest-first order (exact global document
    //    frequency, ties by gram). Minimum candidates, at the cost of a
    //    groupBy + join + rank window over the exploded (id, gram) space.
    //  - "hash": order by (xxhash64(gram), gram) with zero setup. Only safe
    //    when gram frequencies are known to be near-uniform.
    val prefix = if (prefixOrder == "df") {
      // carry |grams| from the pre-explode frame — it is size(grams), so the
      // prefix bound needs no count(*) window over the exploded index
      val inv0 = sh.select(col("id"), col("blk"), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("gram"))
      val gramDf = inv0.groupBy("gram").agg(count(lit(1)).as("df"))
      val byId = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      inv0.join(gramDf, "gram")
        .withColumn("rn", row_number().over(byId.orderBy(col("df"), col("gram"))))
        .where(col("rn") <= col("n_grams") - ceil(lit(threshold) * col("n_grams")) + lit(1))
        .select(col("id"), col("blk"), col("gram"))
    } else {
      val ranks: Map[String, Int] = if (prefixOrder == "hash") Map.empty else {
        // Bounded eager driver aggregation (like IVF's sampled k-means
        // training): ≤ hotK rows ride back, ordered deterministically so
        // retries/speculation see the identical ranking. Sample-df-1 grams
        // carry no skew signal and are left to the hash tail.
        val hot = spread
          .where(pmod(xxhash64(col(idCol), lit("graft|hotgrams")), lit(sampleOneIn)) === lit(0))
          .select(explode(gramsOf).as("gram"))
          .groupBy("gram").agg(count(lit(1)).as("df"))
          .where(col("df") >= 2)
          .orderBy(col("df").desc, col("gram"))
          .limit(hotK)
          .collect()
        hot.iterator.zipWithIndex
          .map { case (r, i) => r.getString(0) -> (hot.length - i) }.toMap
      }
      def rank(g: Column): Column =
        if (ranks.isEmpty) lit(0)
        else Shims.column(graft.spark.HotGramRank(Shims.expression(g), ranks))
      val nGrams = size(col("grams"))
      val prefixLen = (nGrams - ceil(lit(threshold) * nGrams) + lit(1)).cast("int")
      val keyed = transform(col("grams"),
        g => struct(rank(g).as("r"), xxhash64(g).as("h"), g.as("g")))
      sh.select(col("id"), col("blk"),
        explode(transform(slice(array_sort(keyed), lit(1), prefixLen),
          s => s.getField("g"))).as("gram"))
    }
    val pairs = prefix.as("a")
      .join(prefix.as("b"), col("a.blk") === col("b.blk") &&
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val grams = sh.select(col("id"), col("grams"))
    pairs
      .join(grams.select(col("id").as("id_a"), col("grams").as("g_a")), "id_a")
      .join(grams.select(col("id").as("id_b"), col("grams").as("g_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("g_a"), col("g_b"))))
      .withColumn("jaccard",
        // inter ≥ 1 for every candidate pair, so the denominator is ≥ 1;
        // the greatest() guard keeps the contract explicit if that invariant
        // ever changes (0/0 must not become a silently-dropped null)
        col("inter").cast("double") /
          greatest(size(col("g_a")) + size(col("g_b")) - col("inter"), lit(1)))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Connected components over an undirected candidate-pair edge set — the
    * CLUSTERING step that turns pairwise near-dup hits ([[simhashPairs]],
    * [[minhashLshPairs]], [[ngramJaccard]]) into dedup groups: every doc in
    * a component gets the component's MINIMUM doc id as its label, so "keep
    * one per cluster" is then `WHERE doc_id = component`.
    *
    * Two regimes, one exact semantics:
    *  - **Bounded graphs** (edge count <= `maxDriverEdges`, default 2^20):
    *    union-find on the driver. A near-dup candidate graph this small is
    *    pure job-scheduling overhead to iterate distributedly (at sf0.1 the
    *    whole graph is a few hundred edges and each Spark round costs more
    *    to PLAN than to run); the collect is provably bounded by the
    *    pre-checked edge count — the same bounded-driver discipline as the
    *    PQ training sample and the Jaccard hot-gram rank.
    *  - **At scale**: iterative min-label propagation to EXACT convergence
    *    — each round every vertex takes the min of its own and its
    *    neighbors' labels; a round is one edges x labels shuffle join plus
    *    a min aggregate, and the rounds needed equal the largest
    *    component's diameter (near-dup clusters are dense, typically 2-4).
    *    The whole round materializes in ONE Spark job: the convergence
    *    count doubles as the lazy checkpoint's materializing action. The
    *    per-round driver cost is ONE scalar (the changed-label count);
    *    labels for the next round stay distributed. `maxRounds` is a
    *    safety valve that THROWS rather than return a partially-converged
    *    (wrong) labeling.
    *
    * At 100 TB the edge set is the already-bucketed candidate pairs —
    * orders of magnitude smaller than the corpus — and only (id, label)
    * pairs ever shuffle. Docs with no near-dup edge are absent from the
    * output (they are their own singleton cluster by definition). */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b",
                          maxRounds: Int = 64,
                          maxDriverEdges: Long = 1L << 20): DataFrame = {
    // ids keep their NATIVE type (long, string, ...): a cast("long") here
    // would turn uncastable ids into nulls and silently collapse the label
    // frame — string/UUID corpora must cluster, not no-op
    val edges = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      // checkpoint (eager) before the regime gate: the candidate-pair
      // producer upstream (simhash/minhash/jaccard) runs ONCE, and the
      // count that picks the regime reads the cached frame
      .localCheckpoint()
    if (edges.count() <= maxDriverEdges)
      return driverComponents(pairs.sparkSession, edges)
    // localCheckpoint (not persist) everywhere a frame re-enters the loop:
    // an iterative plan's LINEAGE grows multiplicatively per round, and by
    // ~10 rounds plan analysis alone exhausts driver heap — truncating
    // lineage each round keeps every round's plan the same constant size
    // (the standard Spark iterative-graph idiom; recompute-on-executor-loss
    // is traded away exactly as GraphFrames does)
    val sym = edges.union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxRounds rounds " +
            "(component diameter exceeds the bound); raise maxRounds")
      val neigh = sym
        .join(labels.select(col("id").as("b"), col("component").as("nl")), "b")
        .groupBy("a").agg(min("nl").as("nl"))
      // the convergence flag rides INSIDE the propagation projection (label
      // shrank iff a neighbor's min label beat the current one), and the
      // changed count is the LAZY checkpoint's materializing action — so
      // propagation, checkpoint and convergence test are ONE job per round
      val next = labels
        .join(neigh.select(col("a").as("id"), col("nl")), Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nl"), col("component"))).as("component"),
          (coalesce(col("nl"), col("component")) < col("component")).as("__changed"))
        .localCheckpoint(false)
      changed = next.where(col("__changed")).count()
      labels = next.drop("__changed")
      round += 1
    }
    labels.select(col("id").as("doc_id"), col("component"))
  }

  /** Exact driver-side finish for a BOUNDED edge set: union-find with path
    * compression, labels = per-component minimum id under the same ordering
    * Spark's `min`/`least` use (numeric order for numbers; UTF-8 byte order
    * for strings — NOT Java's UTF-16 `compareTo`, which disagrees above the
    * BMP). Output rows and labels are identical to the distributed loop's
    * fixpoint. */
  private def driverComponents(spark: org.apache.spark.sql.SparkSession,
                               edges: DataFrame): DataFrame = {
    val idType = edges.schema.fields(0).dataType
    val rows = edges.collect()
    val parent = new java.util.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x // path compression
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    rows.foreach { row =>
      val a = row.get(0); val b = row.get(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(ra, rb)
    }
    // SQL ordering: UTF8String compares unsigned UTF-8 bytes
    def lt(x: Any, y: Any): Boolean = (x, y) match {
      case (a: String, b: String) =>
        val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
        val n = math.min(ab.length, bb.length)
        var i = 0
        while (i < n) {
          val d = (ab(i) & 0xff) - (bb(i) & 0xff)
          if (d != 0) return d < 0
          i += 1
        }
        ab.length < bb.length
      case (a: java.lang.Comparable[_], _) =>
        a.asInstanceOf[java.lang.Comparable[Any]].compareTo(y) < 0
      case _ => throw new IllegalArgumentException(
        s"connectedComponents: unorderable id type $idType")
    }
    val minOfRoot = new java.util.HashMap[Any, Any]()
    parent.keySet().forEach { v =>
      val r = find(v)
      val cur = minOfRoot.get(r)
      if (cur == null || lt(v, cur)) minOfRoot.put(r, v)
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
    parent.keySet().forEach { v =>
      out.add(org.apache.spark.sql.Row(v, minOfRoot.get(find(v))))
    }
    spark.createDataFrame(out, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", idType),
      org.apache.spark.sql.types.StructField("component", idType))))
  }

  /** Keep ONE document per near-dup cluster: the corpus minus every doc
    * whose [[connectedComponents]] label is another doc's id. Docs outside
    * the pair graph pass through untouched (they are singleton clusters).
    * The loser frame carries only ids, so Spark auto-broadcasts it under
    * the usual threshold; above it (a corpus that is MOSTLY near-dups) the
    * anti join degrades to a shuffle on ids alone — never forced into a
    * broadcast that an adversarial duplicate rate could blow past the 8 GB
    * limit (the same escape [[exact]] documents for its survivor join). */
  def dropNearDups(df: DataFrame, idCol: String, pairs: DataFrame,
                   aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .where(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("__loser"))
    df.join(losers, col(idCol) === col("__loser"), "left_anti")
  }
}
