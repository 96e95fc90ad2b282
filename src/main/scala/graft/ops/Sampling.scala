package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus-mixing operators for training-data
  * pipelines.
  *
  * Everything here is keyed on a CONTENT-INDEPENDENT deterministic hash of a
  * row key, never on `rand()`:
  *  - reproducible across runs, engines, and partition layouts (the hash is a
  *    pure function of the key, so a re-run, a task RETRY, or a SPECULATIVE
  *    duplicate task selects the same rows — `rand()` re-rolls per attempt
  *    and can silently duplicate or drop rows under retries);
  *  - pure map-side work: no shuffle, no RNG state, no driver coordination —
  *    at 100 TB a sample is exactly one filtered scan;
  *  - auditable: whether a given row is in the sample is answerable from the
  *    row alone.
  */
object Sampling {

  /** Uniform hash of `key` into [0, 1): the first 8 hex digits of
    * `md5(key # salt)` read as a 32-bit integer, divided by 2^32. Engine-
    * portable (md5 + hex slicing exist everywhere) and exactly reproducible
    * in SQL: `CAST(('0x'||substr(md5(k||'#'||s),1,8)) AS BIGINT)/4294967296.0`.
    * The '#' separator keeps (key="1", salt="12") and (key="11", salt="2")
    * from colliding. */
  def hashUnit(key: Column, salt: Column = lit("")): Column =
    conv(substring(md5(concat(key.cast("string"), lit("#"), salt.cast("string"))), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)

  /** Per-stratum deterministic sampling: keeps a row iff
    * `hashUnit(key, salt) < rates(stratum)`. Strata absent from `rates` are
    * dropped (a missing rate is an explicit "not in this mix"). Rates ≥ 1.0
    * keep the whole stratum; use [[weightedMix]] for oversampling above 1×. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Map[String, Double], salt: String = ""): DataFrame = {
    require(rates.nonEmpty, "stratifiedSample needs at least one stratum rate")
    require(rates.values.forall(r => r >= 0 && r <= 1),
      s"stratified rates must be in [0,1]; got $rates (use weightedMix for >1x)")
    df.where(hashUnit(col(keyCol), lit(salt)) < element_at(typedLit(rates), col(stratumCol)))
  }

  /** Temperature-based corpus mixing (X84): the published alpha-sampling
    * recipe (XLM-R, arXiv:1911.02116 §3.1; mT5, arXiv:2010.11934) — stratum
    * sampling probability p_i ∝ n_i^alpha flattens the source distribution
    * (alpha < 1 raises small sources' relative share), `targetRows` sets
    * the expected output size, and each stratum's keep rate
    * min(1, targetRows·p_i / n_i) feeds the same deterministic md5 filter
    * as [[stratifiedSample]] — no RNG, reproducible under retry, and
    * engine-portable for external audit.
    *
    * Determinism discipline: rates derive from one #strata-row
    * groupBy-count collect (driver-trivial at any corpus size — the SCAN
    * is distributed, only the per-source totals land), alpha = 0.5 runs
    * through sqrt (correctly rounded per IEEE 754, so an external engine
    * recomputing the rates agrees), and the final rate is floored onto a
    * 2^-20 grid in both engines so a last-ulp difference in the
    * normalizer's float sum can never flip a row's membership. Rates cap
    * at 1.0 — temperature mixing DOWN-samples big sources; use
    * [[weightedMix]] when small sources must repeat (oversample). */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
                     targetRows: Long, alpha: Double = 0.5,
                     salt: String = ""): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive; got $targetRows")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]; got $alpha")
    // strata compare as STRINGS (the rate-map key type) and a NULL stratum
    // is "not in the mix" — the same drop semantics as stratifiedSample's
    // missing-rate case, instead of an NPE in the driver-side sort
    val counts: Seq[(String, Long)] = df
      .select(col(stratumCol).cast("string").as("s"))
      .where(col("s").isNotNull)
      .groupBy(col("s")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    require(counts.nonEmpty,
      "temperatureMix needs at least one non-null stratum")
    def powA(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val z = counts.map { case (_, n) => powA(n) }.sum
    val grid = 1048576.0 // 2^20
    val rates: Map[String, Double] = counts.map { case (s, n) =>
      val r = math.min(1.0, targetRows * powA(n) / z / n)
      s -> math.floor(r * grid) / grid
    }.toMap
    // the rate lookup is string-keyed; sample on a cast view of the
    // stratum so int/date-typed strata work too
    stratifiedSample(df.withColumn("__graft_stratum_str",
        col(stratumCol).cast("string")),
        keyCol, "__graft_stratum_str", rates, salt)
      .drop("__graft_stratum_str")
  }

  /** Leakage-safe train/valid/test assignment (X85): every row of a GROUP
    * lands in the SAME split, so near-duplicates (grouped by, e.g., X43's
    * connected-component label) can never straddle the train/eval boundary
    * — the split discipline behind honest held-out evaluation (Lee et al.
    * 2022, arXiv:2107.06499, measured how train/test duplicate leakage
    * inflates eval). The GROUP key hashes through the same deterministic
    * md5 unit as [[stratifiedSample]], and [0,1) is cut at the splits'
    * cumulative weights in DECLARED order — no RNG, retry-reproducible,
    * engine-portable for external audit (an oracle recomputing the same
    * float partial sums in the same order agrees exactly). Appends a
    * `split` column; weights must sum to 1 (every group gets a split). */
  def splitByGroup(df: DataFrame, groupCol: String,
                   splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "splitByGroup needs at least one split")
    require(splits.map(_._1).distinct.length == splits.length,
      s"duplicate split names in ${splits.map(_._1)}")
    require(splits.forall(_._2 > 0), s"split weights must be positive; got $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1; got ${splits.map(_._2).sum}")
    val cuts = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val h = hashUnit(col(groupCol), lit(salt))
    val assign = splits.init.zip(cuts.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), cut), rest) => when(h < lit(cut), lit(name)).otherwise(rest)
    }
    // a NULL group key hashes to null, every `h < cut` is then unknown, and
    // the row would silently fall through to the LAST split — an ungrouped
    // population dumped into the eval slice is exactly the leakage this
    // operator exists to prevent, so it fails the ROW loudly instead
    // (assign every row a lineage group first, e.g. coalesce(component, id))
    val guarded = when(col(groupCol).isNotNull, assign).otherwise(
      raise_error(lit(s"graft splitByGroup: null group key in '$groupCol' — " +
        "assign every row a lineage group (e.g. coalesce(component, id)) " +
        "before splitting")))
    df.withColumn("split", guarded)
  }

  /** EXACT-size per-stratum sampling: keep the `n` rows of each stratum
    * with the smallest deterministic key hash — "give me exactly 20k docs
    * per source" where [[stratifiedSample]]'s rate-based filter gives an
    * expected size. Same auditability: membership is a pure function of
    * (key, salt, the stratum's other keys).
    *
    * Runs in TWO phases so a hot stratum cannot funnel into one task:
    * phase 1 ranks within (stratum, input partition) — the window key
    * carries `spark_partition_id()`, spreading a skewed stratum across the
    * cluster — and keeps `n` per cell; phase 2 ranks the survivors
    * (≤ n × partitions rows per stratum) globally per stratum. Both phases
    * are ordinary window sorts; results are identical to a single global
    * rank because a stratum's true top-n within any partition subset
    * survives phase 1. */
  def exactSamplePerStratum(df: DataFrame, keyCol: String, stratumCol: String,
                            n: Int, salt: String = ""): DataFrame = {
    require(n > 0, s"sample size must be positive; got $n")
    import org.apache.spark.sql.expressions.Window
    val h = hashUnit(col(keyCol), lit(salt))
    val local = Window.partitionBy(col(stratumCol), col("__pid"))
      .orderBy(h.asc, col(keyCol).asc)
    val global = Window.partitionBy(col(stratumCol))
      .orderBy(h.asc, col(keyCol).asc)
    df.withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(local))
      .where(col("__lrn") <= n)
      .withColumn("__rn", row_number().over(global))
      .where(col("__rn") <= n)
      .drop("__pid", "__lrn", "__rn")
  }

  /** Greedy token-budget selection: rank rows by `scoreCol` DESCENDING
    * (ties broken by `idCol`) and keep the prefix whose running token total
    * stays within `tokenBudget` — the "best docs until the budget is spent"
    * step of building a training mix.
    *
    * The running total is a GLOBAL prefix sum computed the scalable way:
    * (1) range-repartition on the global sort key, so partition `p`'s rows
    * all rank before partition `p+1`'s; (2) per-partition token totals —
    * `partitions` longs — come to the driver once and become prefix
    * offsets; (3) a window partitioned BY partition id adds the local
    * cumsum. No single-partition global window ever exists, so at 100 TB
    * the cost is one range exchange plus partition-local windows; the only
    * driver traffic is the `partitions`-row totals array. Selection is a
    * pure function of (score, id, tokens) — partitioning choices cannot
    * change which rows are kept. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, scoreCol: String,
                        tokenCol: String, tokenBudget: Long,
                        partitions: Int = 32): DataFrame = {
    require(tokenBudget >= 0, s"tokenBudget must be non-negative; got $tokenBudget")
    require(partitions > 0, s"partitions must be positive; got $partitions")
    import org.apache.spark.sql.expressions.Window
    // localCheckpoint so the totals pass and the final pass see the SAME
    // range boundaries (the range exchange is sampling-based; recomputing
    // it between passes could mis-align the prefix offsets). Checkpoint
    // blocks — unlike a persist() entry, which lives in the CacheManager
    // until someone calls unpersist/clearCache — are released by the
    // ContextCleaner when the returned frame is garbage-collected, so
    // repeated calls do not accumulate pinned caches. Traded away (as in
    // connectedComponents): checkpoint blocks have no lineage, so losing
    // an executor that held them AFTER this returns fails the caller's
    // action instead of recomputing — an error, never silently wrong data.
    val ranged = df
      .repartitionByRange(partitions, col(scoreCol).desc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // bounded driver traffic: one (pid, tokenTotal) row per range partition.
    // Null tokens count as 0 in BOTH passes (coalesce here, coalesce in the
    // window cumsum below): an all-null partition would otherwise sum to
    // SQL NULL and NPE the driver's getLong, and rows with null tokens
    // would be excluded from offsets yet counted as 0 in the cumsum,
    // skewing the budget across partitions.
    val tokens = coalesce(col(tokenCol).cast("long"), lit(0L))
    val totals = ranged.groupBy("__pid")
      .agg(sum(tokens).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until partitions).scanLeft(0L) {
      (acc, p) => acc + totals.getOrElse(p, 0L)
    }
    val offsetFor = element_at(
      typedLit(offsets.take(partitions).toSeq), col("__pid") + 1)
    val w = Window.partitionBy("__pid")
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    ranged
      .withColumn("__cum", sum(tokens).over(w) + offsetFor)
      .where(col("__cum") <= tokenBudget)
      .drop("__pid", "__cum")
  }

  /** Weighted corpus mixing with oversampling: each row of stratum `s` with
    * weight `w = weights(s)` appears `floor(w)` times (epochs `0..floor(w)-1`)
    * plus one more at probability `w − floor(w)` (epoch `floor(w)`), selected
    * by a per-epoch-salted hash so fractional epochs draw independent subsets.
    * Output gains an `epoch: long` column; strata absent from `weights` (or
    * with weight 0) are dropped.
    *
    * This is the standard "mix web at 0.3×, books at 2.5×" pretraining recipe
    * as one declarative operator: the epoch fan-out is a generated `sequence`
    * (no join against an epoch table), the sample filter is map-side, and no
    * shuffle is introduced — output partitioning follows the input's. */
  def weightedMix(df: DataFrame, keyCol: String, stratumCol: String,
                  weights: Map[String, Double], salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "weightedMix needs at least one stratum weight")
    require(weights.values.forall(_ >= 0), s"weights must be non-negative; got $weights")
    val w = element_at(typedLit(weights), col(stratumCol))
    df.withColumn("__w", w)
      .where(col("__w").isNotNull && col("__w") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), ceil(col("__w")).cast("long") - 1)))
      // '|' delimiter between salt and epoch: without it (salt="r6",
      // epoch=12) and (salt="r61", epoch=2) hash identically, so
      // prefix-related salts across invocations would draw correlated
      // samples (and epoch 0 would equal stratifiedSample(salt + "0"))
      .where(col("epoch") < floor(col("__w")) ||
        hashUnit(col(keyCol), concat(lit(salt), lit("|"), col("epoch"))) <
          col("__w") - floor(col("__w")))
      .drop("__w")
  }
}
