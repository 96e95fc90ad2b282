package graft.sources

import java.io.IOException

import graft.avro._
import graft.spark.{AvroRuntime, CatalystAvroWriter, InternalRowGetters, SchemaConverters}
import org.apache.hadoop.fs.{FSDataOutputStream, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** DataSource V2 WRITE path for Avro Object Container Files — the sink
  * mirror of [[OcfDataSource]]: `df.write.format("graft-ocf")` (batch) and
  * `df.writeStream.format("graft-ocf")` (streaming), completing the
  * source/sink symmetry the reference expresses as producer + consumer of
  * the same container format (python-udf/avro/datafile.py:140-289
  * DataFileWriter vs :292-479 DataFileReader).
  *
  * Scale shape (the 100 TB story):
  *  - each TASK streams its partition's rows straight to one OCF file via
  *    [[graft.avro.OcfStreamWriter]] — memory bounded by one ~64 KB block,
  *    no driver funnel, no shuffle: writing fans out exactly as wide as the
  *    upstream plan;
  *  - row→datum encoding reuses the compiled [[CatalystAvroWriter]]
  *    (one compile per executor via [[AvroRuntime]]'s caches, same as the
  *    read side), fields matched to Avro record fields BY NAME (positional
  *    pairing would silently swap same-typed columns);
  *  - commit protocol: tasks write DOT-PREFIXED temp files (invisible to
  *    [[OcfDataSource]]'s listing and to Spark's own file index), the driver
  *    renames them into place on job/epoch commit — a half-written job is
  *    never observable as data;
  *  - empty partitions produce NO file (a 10k-partition plan with 12
  *    non-empty partitions writes 12 files, not 10k headers);
  *  - streaming epochs use DETERMINISTIC final names
  *    (`part-<epoch>-<partition>.avro`), so a replayed epoch after failure
  *    overwrites its own output — idempotent, giving exactly-once file
  *    contents downstream of Spark's checkpointed offset log.
  *
  * Options: `avroSchema` (explicit writer schema JSON; default derived from
  * the query schema via [[SchemaConverters.toAvroType]]), `codec`
  * (null/deflate/snappy/zstandard/bzip2; default null), `blockBytes`
  * (block flush threshold; default [[Ocf.SyncInterval]]),
  * `maxBytesPerFile` (roll a task's output to a new file past this size;
  * default unbounded).
  * `mode("overwrite")` clears the directory's visible files at commit
  * (`SupportsTruncate`); `mode("append")` adds files.
  */
private[sources] final class OcfWriteBuilder(info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateAll = false
  override def truncate(): WriteBuilder = { truncateAll = true; this }

  override def build(): Write = {
    val opts = info.options()
    val dir = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-ocf write: no 'path' specified"))
    val sql = info.schema()
    val avroJson = Option(opts.get("avroSchema")).getOrElse(
      AvroSchemaParser.toJson(SchemaConverters.toAvroType(sql)))
    val codecName = Option(opts.get("codec")).getOrElse("null")
    AvroCodecs(codecName) // fail the PLAN on an unknown codec, not a task
    val blockBytes = Option(opts.get("blockBytes")).map(_.toInt).getOrElse(Ocf.SyncInterval)
    require(blockBytes > 0, s"graft-ocf write: blockBytes must be positive, got $blockBytes")
    val maxBytesPerFile = Option(opts.get("maxBytesPerFile")).map(_.toLong).getOrElse(Long.MaxValue)
    require(maxBytesPerFile > 0, s"graft-ocf write: maxBytesPerFile must be positive, got $maxBytesPerFile")
    // opt-in append-time schema guard: a directory's existing consumers read
    // every file against ONE reader schema (by convention the first file's),
    // so an append whose schema that reader cannot resolve bricks the whole
    // directory for them. compatCheck=backward fails such appends AT PLAN
    // TIME with the checker's typed incompatibilities (G6) instead of at
    // some future reader's runtime. An OVERWRITE (truncate) replaces every
    // file the gate would protect, so the check is skipped — an
    // intentionally incompatible rewrite is the point of overwriting.
    Option(opts.get("compatCheck")).foreach {
      case "none" => ()
      case "backward" => if (!truncateAll) OcfWrite.checkBackwardCompat(dir, avroJson)
      case other => throw new IllegalArgumentException(
        s"graft-ocf write: compatCheck must be 'none' or 'backward', got '$other'")
    }
    val cfg = OcfWriteConfig(dir, sql, avroJson,
      OcfWrite.fieldOrdinals(sql, avroJson), codecName, blockBytes,
      new SerializableHadoopConf(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()),
      info.queryId(), maxBytesPerFile)
    // compile the row→datum writers once driver-side so schema mismatches
    // (wrong type for a field, non-record schema) fail the plan
    OcfWrite.compileFieldWriters(cfg)
    new OcfWrite(cfg, truncateAll)
  }
}

/** Everything a writer task needs, resolved once at plan time.
  * `maxBytesPerFile` rolls a task's output to a fresh file once the current
  * one exceeds the bound (checked at block-flush granularity) — at 100 TB a
  * skewed 100 GB partition must not become one 100 GB file. */
private[sources] final case class OcfWriteConfig(
    dir: String, sql: StructType, avroJson: String, ordinals: Array[Int],
    codecName: String, blockBytes: Int, conf: SerializableHadoopConf,
    jobId: String, maxBytesPerFile: Long = Long.MaxValue)

private[sources] object OcfWrite {

  /** Map each Avro record field to its DataFrame column ordinal — exact name
    * first, then unique case-insensitive (Spark analysis is case-insensitive
    * by default), mirroring [[OcfDataSource.pruneAvro]]'s matching. Missing
    * or ambiguous columns fail here, at plan time. */
  def fieldOrdinals(sql: StructType, avroJson: String): Array[Int] = {
    val rec = recordOf(avroJson)
    rec.fields.map { f =>
      val exact = sql.fields.indexWhere(_.name == f.name)
      if (exact >= 0) exact
      else sql.fields.zipWithIndex.filter(_._1.name.equalsIgnoreCase(f.name)) match {
        case Array((_, i)) => i
        case Array() => throw new IllegalArgumentException(
          s"graft-ocf write: DataFrame lacks a column for Avro field '${f.name}' " +
            s"(have: ${sql.fieldNames.mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"graft-ocf write: Avro field '${f.name}' matches ${many.length} columns " +
            s"case-insensitively; rename to disambiguate")
      }
    }.toArray
  }

  /** `compatCheck=backward`: every existing file's schema — used as the
    * READER schema by the directory's consumers — must be able to read the
    * new writer schema. The listing is RECURSIVE so files a consumer sees
    * via `recursiveFileLookup=true` are also checked. One header pread per
    * existing file (headers are already deduplicated driver-side); an empty
    * or absent directory passes trivially. */
  def checkBackwardCompat(dir: String, newWriterJson: String): Unit = {
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    if (!fs.exists(dirPath)) return
    val files = OcfDataSource.list(conf, Seq(dir), None, recursive = true)
    if (files.isEmpty) return
    val newSchema = AvroRuntime.parse(newWriterJson)
    OcfDataSource.fetchMetas(conf, files)
      .map(_.writerSchemaJson).distinct.foreach { existingJson =>
        val result = Compatibility.check(
          reader = AvroRuntime.parse(existingJson), writer = newSchema)
        if (!result.isCompatible)
          throw new IllegalArgumentException(
            "graft-ocf write: compatCheck=backward rejected the append — existing " +
              "readers of this directory could not resolve the new schema: " +
              result.incompatibilities.map(i => s"${i.kind} at ${i.location}: ${i.message}")
                .mkString("; "))
      }
  }

  def recordOf(avroJson: String): ARecord = AvroRuntime.parse(avroJson).physical match {
    case r: ARecord => r
    case other => throw new IllegalArgumentException(
      s"graft-ocf write requires a record schema; got ${other.typeName}")
  }

  /** Per-Avro-field (writer, getter) pairs in Avro field order; the ordinal
    * array maps each to its source column. Compiled once per executor
    * ([[AvroRuntime.parse]] caches the schema parse; the closures themselves
    * are cheap to build). */
  def compileFieldWriters(cfg: OcfWriteConfig): Array[(CatalystAvroWriter.Writer, InternalRowGetters.Getter)] = {
    val rec = recordOf(cfg.avroJson)
    rec.fields.zipWithIndex.map { case (f, i) =>
      val dt = cfg.sql.fields(cfg.ordinals(i)).dataType
      (CatalystAvroWriter.compile(dt, f.schema), InternalRowGetters.forType(dt))
    }.toArray
  }
}

/** Custom V2 metrics: per-task counters surfaced on the write node in the
  * Spark UI / listener bus, summed across tasks — the operational face of
  * the sink (how many container files, rows, raw bytes a job produced). */
private[sources] object OcfWriteMetrics {
  final class FilesWritten extends org.apache.spark.sql.connector.metric.CustomSumMetric {
    override def name(): String = "ocfFilesWritten"
    override def description(): String = "OCF files written"
  }
  final class RowsWritten extends org.apache.spark.sql.connector.metric.CustomSumMetric {
    override def name(): String = "ocfRowsWritten"
    override def description(): String = "OCF datums written"
  }
  final class BytesWritten extends org.apache.spark.sql.connector.metric.CustomSumMetric {
    override def name(): String = "ocfBytesWritten"
    override def description(): String = "OCF bytes written (post-codec)"
  }
  def all: Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new FilesWritten, new RowsWritten, new BytesWritten)
}

private[sources] final case class OcfTaskMetric(name: String, value: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric

/** The logical write: one class serves batch (`toBatch`) and streaming
  * (`toStreaming`) — the factories differ only in file naming. */
private[sources] final class OcfWrite(cfg: OcfWriteConfig, truncateAll: Boolean)
    extends Write with BatchWrite {

  override def description(): String =
    s"graft-ocf dir=${cfg.dir} codec=${cfg.codecName} schema=${cfg.sql.simpleString}"

  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    OcfWriteMetrics.all

  override def toBatch: BatchWrite = this
  override def toStreaming: StreamingWrite = new OcfStreamingWrite(cfg, truncateAll)

  override def createBatchWriterFactory(pinfo: PhysicalWriteInfo): DataWriterFactory =
    OcfBatchWriterFactory(cfg)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    OcfCommit.publish(cfg, messages, clearVisible = truncateAll)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    OcfCommit.discard(cfg, messages)
}

private[sources] final class OcfStreamingWrite(cfg: OcfWriteConfig, truncateAll: Boolean)
    extends StreamingWrite {
  override def createStreamingWriterFactory(pinfo: PhysicalWriteInfo): StreamingDataWriterFactory =
    OcfStreamingWriterFactory(cfg)

  /** Epoch commit: rename this epoch's temps over their DETERMINISTIC final
    * names (replacing a failed earlier attempt of the SAME epoch, never a
    * different epoch's output). Before renaming, every visible file carrying
    * THIS epoch's `part-<epoch>-` prefix is deleted: a replayed epoch that
    * produces FEWER files than a previously committed attempt (fewer
    * non-empty partitions, or a different chunk count under
    * `maxBytesPerFile` after a nondeterministic shuffle order) would
    * otherwise leave the stale extras in place as duplicate rows. Delete +
    * rename makes replay idempotent regardless of file count. Complete-output
    * mode (`truncate`) clears ALL visible files instead, so each epoch
    * replaces the directory's contents. */
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    OcfCommit.publish(cfg, messages, clearVisible = truncateAll,
      clearPrefix = if (truncateAll) None else Some(f"part-$epochId%05d-"))

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    OcfCommit.discard(cfg, messages)
}

private[sources] final case class OcfBatchWriterFactory(cfg: OcfWriteConfig)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new OcfDataWriter(cfg,
      f"part-$partitionId%05d-${cfg.jobId}.avro",
      f".part-$partitionId%05d-$taskId-${cfg.jobId}.avro.tmp")
}

private[sources] final case class OcfStreamingWriterFactory(cfg: OcfWriteConfig)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new OcfDataWriter(cfg,
      f"part-$epochId%05d-$partitionId%05d.avro",
      f".part-$epochId%05d-$partitionId%05d-$taskId.avro.tmp")
}

/** Streams one partition's rows to temp OCF files. The file is opened
  * LAZILY on the first row, so empty partitions cost nothing; the temp name
  * is dot-prefixed (invisible to listings) and unique per task ATTEMPT, so
  * speculative/retried attempts never collide — only the committed attempt's
  * temps are renamed by the driver. When `maxBytesPerFile` is set the task
  * ROLLS to a `-cNNN`-suffixed sibling once the current file exceeds the
  * bound (checked at block-flush granularity, so the overshoot is at most
  * one block); chunk names are a deterministic function of the data order,
  * keeping streaming-epoch replay idempotent. */
private[sources] final class OcfDataWriter(
    cfg: OcfWriteConfig, finalName: String, tmpName: String)
    extends DataWriter[InternalRow] {

  private val fieldWriters = OcfWrite.compileFieldWriters(cfg)
  private val ordinals = cfg.ordinals
  private val schema = OcfWrite.recordOf(cfg.avroJson)

  private var out: FSDataOutputStream = _
  private var ocf: OcfStreamWriter = _
  private var chunk = 0
  private var totalRows = 0L
  private var filesSealed = 0L
  private var bytesSealed = 0L
  private val sealedFiles = Seq.newBuilder[OcfWrittenFile]
  // one reusable datum encoder per writer: reset the backing buffer per row
  // instead of allocating a fresh writer + stream per row
  private val enc = new AvroBinaryWriter()

  // chunk 0 keeps the plain name so the common (no-roll) case and the
  // deterministic streaming names are unchanged
  private def chunked(name: String): String =
    if (chunk == 0) name else name.replace(".avro", f"-c$chunk%03d.avro")
  private def currentTmp: Path = new Path(cfg.dir, chunked(tmpName))

  override def write(row: InternalRow): Unit = {
    if (ocf == null) {
      val p = currentTmp
      out = p.getFileSystem(cfg.conf.value).create(p, true)
      ocf = new OcfStreamWriter(out, schema, cfg.codecName, blockBytes = cfg.blockBytes)
    }
    enc.out.reset()
    var i = 0
    while (i < fieldWriters.length) {
      val ord = ordinals(i)
      val (fw, getter) = fieldWriters(i)
      fw(if (row.isNullAt(ord)) null else getter(row, ord), enc)
      i += 1
    }
    ocf.append(enc.toByteArray)
    // getPos counts FLUSHED bytes, so the roll triggers on sealed blocks
    // only — at most one block of overshoot past the bound
    if (out.getPos >= cfg.maxBytesPerFile) {
      sealCurrent()
      chunk += 1
    }
  }

  /** Finish and close the open file, recording its (tmp, dest) pair. */
  private def sealCurrent(): Unit =
    if (ocf != null) {
      totalRows += ocf.rowCount
      ocf.finish()
      bytesSealed += out.getPos
      out.close()
      sealedFiles += OcfWrittenFile(currentTmp.toString,
        new Path(cfg.dir, chunked(finalName)).toString)
      filesSealed += 1
      ocf = null
      out = null
    }

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(
      OcfTaskMetric("ocfFilesWritten", filesSealed + (if (ocf != null) 1 else 0)),
      OcfTaskMetric("ocfRowsWritten", totalRows + (if (ocf != null) ocf.rowCount else 0L)),
      OcfTaskMetric("ocfBytesWritten", bytesSealed + (if (out != null) out.getPos else 0L)))

  override def commit(): WriterCommitMessage = {
    sealCurrent()
    OcfCommitMessage(sealedFiles.result(), totalRows)
  }

  override def abort(): Unit = {
    close()
    val fs = new Path(cfg.dir).getFileSystem(cfg.conf.value)
    (sealedFiles.result().map(f => new Path(f.tmp)) :+ currentTmp).foreach { p =>
      if (fs.exists(p)) fs.delete(p, false)
    }
  }

  override def close(): Unit =
    if (out != null) {
      try out.close() catch { case _: IOException => }
      out = null
    }
}

/** One written file: temp path + rename destination. */
private[sources] final case class OcfWrittenFile(tmp: String, dest: String)

/** One task's committed output: every sealed (tmp, dest) pair — empty for a
  * partition that wrote nothing — plus the row total. */
private[sources] final case class OcfCommitMessage(
    files: Seq[OcfWrittenFile], rows: Long) extends WriterCommitMessage

/** Maintenance for OCF output directories. */
object OcfMaintenance {

  /** Delete ORPHANED writer temps (`.*.avro.tmp`) older than `minAgeMs` —
    * the leftovers of a driver that died between task commit and job
    * commit, which no future job will ever rename or clean. The age gate
    * keeps a LIVE concurrent job's temps safe (its files are younger), the
    * same discipline as any staged-commit janitor. Returns the number of
    * temp files removed. */
  /** Compact a directory of (typically many small) OCF files into
    * size-bounded ones: splittable scan in, V2 sink out — decode and
    * re-encode ride the same verified paths as any query, so mixed writer
    * schemas resolve against `readerSchema` (or the first file's schema)
    * and the output is uniformly that schema at `codec`. The small-files
    * problem is the top operational cost of long-running streaming sinks at
    * scale: a year of 1-minute epochs is half a million files whose
    * per-file open/close dominates scan time; compaction turns them into
    * `targetBytes`-bounded containers. Writes to a SEPARATE directory —
    * an in-place swap is the caller's (atomic rename) decision. */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
              outDir: String, codec: String = "null",
              targetBytes: Long = 128L * 1024 * 1024,
              readerSchemaJson: Option[String] = None): Unit = {
    require(inDir != outDir, "compact writes to a separate directory")
    // one output file per ~targetBytes of INPUT: the sink writes one file
    // per task, so the scan's one-split-per-small-file parallelism must be
    // coalesced (shuffle-free split merging) down to the output file count;
    // maxBytesPerFile still rolls any task whose share lands oversized
    val inputBytes = OcfDataSource
      .list(spark.sessionState.newHadoopConf(), Seq(inDir), None, recursive = false)
      .map(_.len).sum
    val parts = math.max(1L, (inputBytes + targetBytes - 1) / targetBytes).toInt
    val r = spark.read.format("graft-ocf")
    readerSchemaJson.foldLeft(r)((b, j) => b.option("readerSchema", j))
      .load(inDir)
      .coalesce(parts)
      .write.format("graft-ocf").mode("overwrite")
      .option("codec", codec)
      .option("maxBytesPerFile", targetBytes.toString)
      .save(outDir)
  }

  def vacuumTemps(spark: org.apache.spark.sql.SparkSession, dir: String,
                  minAgeMs: Long = 24L * 60 * 60 * 1000): Long = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dirPath)) return 0L
    val cutoff = System.currentTimeMillis() - minAgeMs
    var removed = 0L
    fs.listStatus(dirPath).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && n.startsWith(".") && n.endsWith(".avro.tmp") &&
          st.getModificationTime < cutoff) {
        if (fs.delete(st.getPath, false)) removed += 1
      }
    }
    removed
  }
}

private[sources] object OcfCommit {

  /** Driver-side job/epoch commit: optionally clear the directory's VISIBLE
    * files (overwrite / complete mode) or just the committing epoch's
    * `clearPrefix`-named files (replay idempotence even when the replay
    * writes fewer files), then rename every committed temp over its final
    * name. Replacement uses [[FileContext]] rename with `OVERWRITE` where
    * the filesystem supports it — a SINGLE atomic operation on HDFS/local,
    * so a driver crash mid-commit never leaves a destination deleted but
    * not yet replaced; the exists→delete→rename fallback is only for
    * filesystems without a FileContext binding. */
  def publish(cfg: OcfWriteConfig, messages: Array[WriterCommitMessage],
              clearVisible: Boolean, clearPrefix: Option[String] = None): Unit = {
    val dirPath = new Path(cfg.dir)
    val fs = dirPath.getFileSystem(cfg.conf.value)
    fs.mkdirs(dirPath)
    if (clearVisible || clearPrefix.isDefined) {
      fs.listStatus(dirPath).foreach { st =>
        val n = st.getPath.getName
        val doomed =
          if (clearVisible) !n.startsWith(".") && !n.startsWith("_")
          else clearPrefix.exists(n.startsWith)
        if (st.isFile && doomed) fs.delete(st.getPath, false)
      }
    }
    val fc =
      try Some(org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, cfg.conf.value))
      catch { case _: org.apache.hadoop.fs.UnsupportedFileSystemException => None }
    messages.foreach {
      case OcfCommitMessage(files, _) => files.foreach { f =>
        val src = fs.makeQualified(new Path(f.tmp))
        val dst = fs.makeQualified(new Path(f.dest))
        fc match {
          case Some(c) =>
            // FileContext renames bypass ChecksumFileSystem, so on local FS
            // the `.{name}.crc` sidecars are neither moved nor replaced —
            // drop both (the temp's orphan and any stale one under the
            // destination name, which would fail verification on read)
            Seq(new Path(src.getParent, "." + src.getName + ".crc"),
                new Path(dst.getParent, "." + dst.getName + ".crc"))
              .foreach(p => if (fs.exists(p)) fs.delete(p, false))
            c.rename(src, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          case None =>
            if (fs.exists(dst)) fs.delete(dst, false)
            if (!fs.rename(src, dst))
              throw new IOException(s"graft-ocf write: failed to rename ${f.tmp} to ${f.dest}")
        }
      }
      case _ => ()
    }
  }

  def discard(cfg: OcfWriteConfig, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(cfg.dir).getFileSystem(cfg.conf.value)
    messages.foreach {
      case OcfCommitMessage(files, _) => files.foreach { f =>
        val p = new Path(f.tmp)
        if (fs.exists(p)) fs.delete(p, false)
      }
      case _ => ()
    }
  }
}
