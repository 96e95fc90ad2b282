package graft.streaming

import graft.spark.{functions => gfn}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming decode-on-ingest: the reference's "decode in-flight
  * in the stream processor before landing" option, which it documents but
  * leaves as "Code example TBD" (reference: README.md:54-58). This module
  * fills that slot natively: `readStream` → graft Avro decode expressions →
  * `writeStream`.
  *
  * The reference pipeline is stateless per-message (SURVEY §2.12) — no
  * watermarks or windows are required for parity — but event-time windowed
  * aggregation ([[windowedCounts]]) and custom-state sessionization
  * ([[sessionize]], `flatMapGroupsWithState` + event-time timeout) are the
  * natural Spark extensions and are provided.
  *
  * Scale notes: every decode is a partition-local deterministic expression
  * (no driver funnel, no per-batch state), so throughput scales with
  * executor count; checkpointing and exactly-once file-sink semantics come
  * from Structured Streaming itself.
  */
object StreamingIngest {

  /** Stream OCF payload files landing in a directory (the file-source analog
    * of messages landing on a bus): one input file → N decoded rows.
    * (reference: datafile.py:292-426 for the OCF decode itself.) */
  def ocfFileStream(spark: SparkSession, inputDir: String, readerSchemaJson: String): DataFrame =
    spark.readStream
      .format("binaryFile")
      // streaming file sources require an explicit schema; binaryFile's is fixed
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType))))
      .load(inputDir)
      // Generator form: decodes lazily block-by-block, so one oversized
      // landing file cannot materialize its whole datum array per row
      .select(gfn.avro_ocf_explode(col("content"), readerSchemaJson))

  /** Stream a growing directory of OCF files through the SPLITTABLE
    * DataSource V2 reader (`readStream.format("graft-ocf")`): each trigger
    * picks up newly landed files exactly once (checkpoint-persisted
    * discovery log) and fans each file out over sync-marker splits, so one
    * huge landed file cannot serialize a trigger the way the one-row-per-
    * file [[ocfFileStream]] path does. Spark does not run column-pruning
    * pushdown on streaming V2 relations, so to narrow the decode pass a
    * projected `readerSchemaJson` — the resolving decoder then wire-skips
    * everything else, exactly like the batch scan's pushed prune.
    * The directory must hold at least one file at start (schema comes from
    * its header unless `readerSchemaJson` is given), and files must land
    * atomically (write-then-rename).
    *
    * `maxFilesPerTrigger` / `maxBytesPerTrigger` bound ADMISSION per
    * micro-batch: a stream started over a large existing directory drains
    * the backlog across triggers instead of decoding a year of landings in
    * batch 0, each file still in exactly one batch. */
  def ocfSplitFileStream(spark: SparkSession, inputDir: String,
                         readerSchemaJson: Option[String] = None,
                         splitSize: Option[Long] = None,
                         maxFilesPerTrigger: Option[Int] = None,
                         maxBytesPerTrigger: Option[Long] = None): DataFrame = {
    val r = spark.readStream.format("graft-ocf")
    val r1 = readerSchemaJson.fold(r)(j => r.option("readerSchema", j))
    val r2 = splitSize.fold(r1)(s => r1.option("splitSize", s.toString))
    val r3 = maxFilesPerTrigger.fold(r2)(n => r2.option("maxFilesPerTrigger", n.toString))
    val r4 = maxBytesPerTrigger.fold(r3)(n => r3.option("maxBytesPerTrigger", n.toString))
    r4.load(inputDir)
  }

  /** Decode a bare-datum binary column on a streaming frame (the Kafka/
    * Kinesis `value` shape; registry mode S4). Non-decoded columns pass
    * through unchanged. */
  def decodeBareDatums(stream: DataFrame, valueCol: String, writerSchemaJson: String,
                       readerSchemaJson: Option[String] = None): DataFrame = {
    val decoded = readerSchemaJson match {
      case Some(r) => gfn.from_avro(col(valueCol), writerSchemaJson, r)
      case None    => gfn.from_avro(col(valueCol), writerSchemaJson)
    }
    stream.withColumn("record", decoded)
  }

  /** KPL-aggregated, Spring-framed payloads → one row per decoded
    * sub-record, keeping the Spring headers alongside
    * (reference: springcloud-lambda-udf/lambda_function.py:171-219). */
  def decodeSpringKpl(stream: DataFrame, valueCol: String, writerSchemaJson: String): DataFrame =
    stream
      .select(explode(gfn.kpl_deaggregate(col(valueCol))).as("sub"))
      .select(gfn.spring_extract(col("sub")).as("ex"))
      .select(col("ex.headers").as("headers"),
        gfn.from_avro(col("ex.body"), writerSchemaJson).as("record"))

  /** Event-time tumbling-window counts with a watermark over any decoded
    * stream — the windowed-aggregation extension of §2.12. */
  def windowedCounts(decoded: DataFrame, tsCol: String,
                     watermarkDelay: String, windowLength: String): DataFrame =
    decoded
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))

  /** A closed session: consecutive events of one key whose inter-event gaps
    * stayed within the sessionization gap. */
  final case class Session(key: String, start_ts: java.sql.Timestamp,
                           end_ts: java.sql.Timestamp, n_events: Long)

  /** Event-time sessionization over a decoded stream — the custom-state
    * extension of §2.12 (`flatMapGroupsWithState` + event-time timeout). A
    * session closes when a same-key event arrives more than `gapMs` after
    * the previous one (emitted immediately), or when the watermark passes
    * the session's gap horizon with no new events (emitted by timeout).
    *
    * Scale notes: state per key is three longs regardless of event count,
    * so the state store grows with DISTINCT ACTIVE keys only; events are
    * shuffled once on the key, the same partitioning the state store uses. */
  def sessionize(decoded: DataFrame, keyCol: String, tsCol: String, gapMs: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded
      // project/cast BEFORE the watermark: a cast projected after
      // withWatermark is a new column without the watermark tag, which
      // event-time timeout rejects
      .select(col(keyCol).cast("string").as("_k"), col(tsCol).cast("timestamp").as("_ts"))
      .withWatermark("_ts", watermarkDelay)
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        // state = (startMs, lastMs, n): a plain tuple keeps the state
        // encoder inside codegen (a private case class is not reachable
        // from generated code)
        (key: String, rows: Iterator[(String, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) => {
          def close(s: (Long, Long, Long)) = Session(key,
            new java.sql.Timestamp(s._1), new java.sql.Timestamp(s._2), s._3)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val closed = scala.collection.mutable.Buffer.empty[Session]
            var cur = state.getOption
            // in-batch events may be unordered; late events beyond the
            // watermark were already dropped upstream
            rows.map(_._2.getTime).toSeq.sorted.foreach { t =>
              cur match {
                case Some(s) if t - s._2 <= gapMs =>
                  cur = Some((s._1, math.max(s._2, t), s._3 + 1))
                case Some(s) =>
                  closed += close(s)
                  cur = Some((t, t, 1L))
                case None =>
                  cur = Some((t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the timeout must sit strictly beyond the current watermark
              state.setTimeoutTimestamp(
                math.max(s._2 + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
        })
  }

  /** Streaming exact dedup — the streaming face of `Dedup.exact`: a row is
    * dropped if a row with the same content digest was already emitted
    * within the watermark horizon. State is ONE 16-byte digest per distinct
    * document inside the horizon (`dropDuplicatesWithinWatermark`), so the
    * state store is bounded by arrival rate × horizon, not by stream
    * lifetime — the unbounded-state trap of plain streaming
    * `dropDuplicates` on an eternal ingest stream.
    *
    * Scale note: the dedup exchange hash-partitions by the digest column
    * only, but the FULL row (text included) rides that exchange to its
    * state-store partition — survivors must be emitted there, so unlike
    * batch `Dedup.exact` there is no no-text-shuffle guarantee. What stays
    * digest-only is the STATE: 16 bytes per distinct document in the
    * horizon. If text-shuffle volume matters, pre-project (digest, key, ts),
    * dedup that, and re-join text by key downstream. */
  def dedupStream(decoded: DataFrame, textCol: String, tsCol: String,
                  watermarkDelay: String): DataFrame =
    decoded
      .withColumn("__digest", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Streaming NEAR-duplicate detection — the streaming face of MinHash-LSH
    * dedup (`Dedup.minhashCandidates`): each arriving document's signature
    * is banded into `numBands` hashes, every band CLAIMS its bucket in
    * per-bucket state, and a document is flagged `near_dup` when at least
    * one of its bands hit an already-claimed bucket (the standard LSH
    * candidate rule, applied greedily in arrival order; ties inside a batch
    * break by ascending id, so replays are deterministic). Emits one
    * `(id, near_dup)` verdict per document — act on it downstream (filter a
    * keyed landing, route to quarantine) without the text ever re-shuffling.
    *
    * Two chained stateful operators in append mode: bucket claims keyed by
    * (band, hash), then a per-document OR that emits once all `numBands`
    * verdicts arrived (that second state is transient — removed at emit).
    * The claim state is one boolean per DISTINCT band hash seen — the
    * irreducible memory of "have I seen something like this before"; at
    * ~numBands × distinct-docs entries it is bounded by corpus novelty, not
    * stream length. Like its batch analog this trades a small
    * false-positive rate (band collisions of genuinely different docs) for
    * never missing a pair the banding would catch. */
  def dedupNearStream(decoded: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 128, numBands: Int = 32,
                      shingleSize: Int = 3): DataFrame = {
    val spark = decoded.sparkSession
    import spark.implicits._
    val bands = decoded.select(col(idCol).cast("long").as("id"),
        posexplode(graft.ops.Dedup.minhashBandHashes(
          col(textCol), numHashes, numBands, shingleSize)).as(Seq("band", "hash")))
      .as[(Long, Int, Long)]
    val flagged = bands.groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[Boolean, (Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Boolean]) =>
          val sorted = rows.toSeq.sortBy(_._1)
          val claimed = state.getOption.getOrElse(false)
          state.update(true)
          sorted.zipWithIndex.map { case (r, i) => (r._1, claimed || i > 0) }.iterator
      }
    flagged.groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Boolean), (Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (doc, rows, state: GroupState[(Int, Boolean)]) =>
          val (seen0, dup0) = state.getOption.getOrElse((0, false))
          val rs = rows.toSeq
          val seen = seen0 + rs.size
          val dup = dup0 || rs.exists(_._2)
          if (seen >= numBands) { state.remove(); Iterator((doc, dup)) }
          else { state.update((seen, dup)); Iterator.empty }
      }
      .toDF(idCol, "near_dup")
  }

  /** Land a decoded stream as parquet with exactly-once file-sink semantics;
    * AvailableNow processes the backlog and stops (batch-boundary friendly,
    * used by tests and backfills). */
  def landToParquet(decoded: DataFrame, path: String, checkpoint: String,
                    availableNow: Boolean = true): StreamingQuery = {
    val w = decoded.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Watermarked stream-stream INTERVAL join — the "attach each right-stream
    * event to the left-stream event it belongs to" pattern (impressions ⋈
    * clicks, requests ⋈ responses): equi-join on `keyCol` with the right
    * event's time constrained to `[left.ts, left.ts + withinMs]`.
    *
    * Both sides carry a `watermarkDelayMs` watermark, and the time-range
    * predicate bounds HOW LONG either side's state must be retained: Spark
    * derives the state eviction horizon from watermark + interval, so state
    * is O(in-flight window), not O(stream history) — the property that
    * keeps a stream-stream join alive for months at production rates. Inner
    * join: unmatched events age out silently. Column names are prefixed
    * `left_`/`right_` (except the shared key) so the joined frame is
    * unambiguous downstream. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTsCol: String, rightTsCol: String, withinMs: Long,
                   watermarkDelayMs: Long = 60000L): DataFrame = {
    require(withinMs > 0, s"withinMs must be positive; got $withinMs")
    def delay(ms: Long) = s"$ms milliseconds"
    val l = left.withWatermark(leftTsCol, delay(watermarkDelayMs))
      .select(col(keyCol) +: left.columns.filter(_ != keyCol)
        .map(c => col(c).as(s"left_$c")).toSeq: _*)
    val r = right.withWatermark(rightTsCol, delay(watermarkDelayMs))
      .select(col(keyCol).as("__rk") +: right.columns.filter(_ != keyCol)
        .map(c => col(c).as(s"right_$c")).toSeq: _*)
    l.join(r,
      col(keyCol) === col("__rk") &&
        col(s"right_$rightTsCol") >= col(s"left_$leftTsCol") &&
        col(s"right_$rightTsCol") <= col(s"left_$leftTsCol") + expr(s"INTERVAL $withinMs MILLISECONDS"))
      .drop("__rk")
  }
}
