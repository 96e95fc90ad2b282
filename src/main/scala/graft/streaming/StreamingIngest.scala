package graft.streaming

import graft.spark.{functions => gfn}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming decode-on-ingest: the reference's "decode in-flight
  * in the stream processor before landing" option, which it documents but
  * leaves as "Code example TBD" (reference: README.md:54-58). This module
  * fills that slot natively: `readStream` → graft Avro decode expressions →
  * `writeStream`.
  *
  * The reference pipeline is stateless per-message (SURVEY §2.12) — no
  * watermarks or windows are required for parity — but event-time windowed
  * aggregation over the decoded stream is the natural Spark extension and is
  * provided ([[windowedCounts]]).
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
}
