package graft.spark

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions.col

/** Path-based batch OCF I/O — the file-first face of S1/S2 (reference
  * python-udf/avro/datafile.py:292-426 reads OCF BY PATH; the streaming
  * analog is [[graft.streaming.StreamingIngest.ocfFileStream]]).
  *
  * Scale notes: the scan rides Spark's `binaryFile` source, so file listing,
  * partition planning, and locality come from the standard file-source
  * machinery (one file = one row = one decode unit; a directory of thousands
  * of files decodes with full executor parallelism). The decode is the lazy
  * block-by-block [[AvroOcfExplode]] generator — one oversized file cannot
  * materialize its whole datum array. The writer is partition-local (no
  * shuffle, no driver funnel): each payload blob lands as one file named by
  * (partition, index), so tasks never contend. */
object OcfFiles {

  /** Batch-scan a directory of OCF files into decoded rows (writer schema
    * from each file's header, resolved against `readerSchemaJson`).
    * `glob` filters file names; `recursive` descends subdirectories. */
  def scanDirectory(spark: SparkSession, dir: String, readerSchemaJson: String,
                    glob: String = "*.avro", recursive: Boolean = false): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", recursive.toString)
      .load(dir)
      .select(functions.avro_ocf_explode(col("content"), readerSchemaJson))

  /** [[scanDirectory]] keeping the source path alongside the decoded columns
    * (lineage column for audit/debug pipelines). */
  def scanDirectoryWithPath(spark: SparkSession, dir: String, readerSchemaJson: String,
                            glob: String = "*.avro", recursive: Boolean = false): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", recursive.toString)
      .load(dir)
      .select(col("path"), functions.avro_ocf_explode(col("content"), readerSchemaJson))

  /** Write each payload blob of a `payload: binary` frame (the
    * [[OcfSink.payloads]] output shape) as one `.avro` file under `dir`.
    * Partition-local and eager (an action): file names are
    * `<prefix>-<partition>-<index>.avro`, unique per task without any
    * cross-task coordination. Returns the number of files written.
    *
    * Torn-file safety under speculative execution / zombie retries: each
    * blob is written to an attempt-unique dot-prefixed temp name and then
    * ATOMIC_MOVE'd into place, so two attempts racing on the same final
    * path each rename a fully-written file (POSIX rename replaces
    * atomically — the last winner is whole, never interleaved), and
    * leftover temp files are invisible to scans (the `*.avro` glob misses
    * them and file sources skip dot-files regardless).
    *
    * `dir` must be a filesystem every task can reach (local mode, NFS, a
    * fuse-mounted store); for object stores, land the payload frame through
    * a standard binary-capable sink instead — the OCF bytes are identical. */
  def writePayloadFiles(payloads: DataFrame, dir: String, prefix: String = "part"): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    payloads.select(col("payload")).as(Encoders.BINARY)
      .mapPartitions { blobs =>
        val ctx = org.apache.spark.TaskContext.get()
        val pid = ctx.partitionId()
        val attempt = ctx.taskAttemptId()
        var i = 0
        var n = 0L
        blobs.foreach { bytes =>
          val p = java.nio.file.Paths.get(dir, f"$prefix-$pid%05d-$i%05d.avro")
          val tmp = java.nio.file.Paths.get(dir,
            f".$prefix-$pid%05d-$i%05d.avro.$attempt.tmp")
          java.nio.file.Files.write(tmp, bytes)
          java.nio.file.Files.move(tmp, p,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          i += 1
          n += 1
        }
        Iterator.single(n)
      }(Encoders.scalaLong)
      .reduce(_ + _)
  }
}
