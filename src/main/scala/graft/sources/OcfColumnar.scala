package graft.sources

import graft.avro._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

/** Vectorized (ColumnarBatch) reads for FLAT primitive schemas (X91): when
  * every reader field is a plain Avro primitive (nullable unions included)
  * and resolution is identity, the scan decodes straight into on-heap
  * column vectors — one tight loop per batch instead of a per-row
  * compiled-reader virtual call + row allocation + iterator step. Spark's
  * `ColumnarToRow` (codegen'd) consumes the batches; everything else
  * (nested schemas, resolution/promotion, partition columns, `_file`/
  * `_pos`, position deletes, aggregates) falls back to the row reader —
  * Avro is row-oriented, so the columnar path is an opt-in fast lane for
  * the flat-scan shape, never a second semantics. */
private[graft] object OcfColumnar {

  /** One flat reader field: its name, Spark type, wire primitive, and
    * (for a nullable `[null,T]`/`[T,null]` union) which branch index is
    * null. Doubles as a per-file WIRE plan entry, where the union shape is
    * the WRITER's. */
  final case class Field(name: String, dt: DataType, wire: AvroSchema,
                         nullBranch: Int) {
    def nullable: Boolean = nullBranch >= 0
  }

  private def plainPrimitive(s: AvroSchema): Boolean = s match {
    // logical types (date/timestamp/decimal) are distinct LogicalSchema
    // nodes and convert during decode — the row reader owns those; the
    // columnar lane takes raw primitives only
    case ABoolean | AInt | ALong | AFloat | ADouble | AString | ABytes => true
    case _ => false
  }

  private def sparkTypeOf(s: AvroSchema): DataType = s match {
    case ABoolean => BooleanType
    case AInt => IntegerType
    case ALong => LongType
    case AFloat => FloatType
    case ADouble => DoubleType
    case AString => StringType
    case ABytes => BinaryType
    case other => throw new IllegalStateException(s"not flat: $other")
  }

  private def flatFieldOf(name: String, s: AvroSchema): Option[Field] = s match {
    case p if plainPrimitive(p) => Some(Field(name, sparkTypeOf(p), p, -1))
    case AUnion(Seq(ANull, p)) if plainPrimitive(p) =>
      Some(Field(name, sparkTypeOf(p), p, 0))
    case AUnion(Seq(p, ANull)) if plainPrimitive(p) =>
      Some(Field(name, sparkTypeOf(p), p, 1))
    case _ => None
  }

  /** Field specs when `readerJson` is a flat all-primitive record. */
  def fieldsFor(readerJson: String): Option[Array[Field]] =
    scala.util.Try(AvroSchemaParser.parse(readerJson)).toOption.flatMap {
      case rec: ARecord =>
        val out = new Array[Field](rec.fields.length)
        var i = 0
        while (i < out.length) {
          flatFieldOf(rec.fields(i).name, rec.fields(i).schema) match {
            case Some(f) => out(i) = f
            case None => return None
          }
          i += 1
        }
        Some(out)
      case _ => None
    }

  /** The per-FILE wire plan: how each reader field sits on this writer's
    * wire. Columnar resolution supports exactly the shapes whose decode is
    * a plain positional loop: the writer record has the SAME field names
    * in the SAME order, each field the SAME primitive, where either side
    * may independently be plain (`T`) or nullable (`[null,T]`/`[T,null]`)
    * EXCEPT writer-nullable under reader-plain (a null would have nowhere
    * to go). A plain writer under a nullable reader is the CATALOG's
    * common case — nullable table schema over non-null-written files —
    * and decodes with no branch byte. Promotions, reordered/renamed
    * fields, aliases: None, row-reader fallback. */
  def wirePlanFor(writerJson: String, reader: Array[Field]): Option[Array[Field]] = {
    val key = writerJson + "\u0001" +
      reader.map(f => f.name + ":" + f.dt.simpleString + ":" + f.nullBranch)
        .mkString(",")
    wireCache.computeIfAbsent(key, _ => computeWirePlan(writerJson, reader))
  }

  private val wireCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Array[Field]]]()

  private def computeWirePlan(writerJson: String,
                              reader: Array[Field]): Option[Array[Field]] =
    scala.util.Try(AvroSchemaParser.parse(writerJson)).toOption.flatMap {
      case rec: ARecord =>
        if (rec.fields.length != reader.length) return None
        val out = new Array[Field](reader.length)
        var i = 0
        while (i < out.length) {
          val wf = rec.fields(i)
          val rf = reader(i)
          flatFieldOf(wf.name, wf.schema) match {
            // Avro resolves fields by NAME: equal names in equal order make
            // the positional decode exact
            case Some(w) if w.name == rf.name && w.dt == rf.dt &&
                (!w.nullable || rf.nullable) =>
              out(i) = w
            case _ => return None
          }
          i += 1
        }
        Some(out)
      case _ => None
    }
}

/** The vectorized split reader: the same block walk as [[OcfSplitReader]],
  * decoding up to `batchSize` datums per `next()` into reused on-heap
  * vectors. `limit` counts emitted rows, exactly like the row reader. */
private[graft] final class OcfColumnarSplitReader(
    meta: OcfDataSource.OcfFileMeta, start: Long, end: Long,
    fields: Array[OcfColumnar.Field], conf: Configuration,
    limit: Long = Long.MaxValue, aligned: Boolean = false,
    batchSize: Int = 4096)
    extends PartitionReader[ColumnarBatch] {

  private val hPath = new Path(meta.path)
  private val in = hPath.getFileSystem(conf).open(hPath)
  private val stopAt: Long = if (aligned) end else end + 16L
  private val (codec, firstBlockStart) =
    try {
      val c = AvroCodecs(meta.codecName)
      val b = if (aligned) start
              else if (start == 0L) meta.headerEnd
              else OcfBlocks.syncScan(in, meta.sync, meta.len, start, end)
      (c, b)
    } catch {
      case t: Throwable =>
        try in.close() catch { case s: Throwable => t.addSuppressed(s) }
        throw t
    }

  private var blockStart: Long = firstBlockStart
  private var remaining = 0L
  private var emitted = 0L
  private var bin: AvroBinaryReader = _

  private val vectors: Array[OnHeapColumnVector] =
    fields.map(f => new OnHeapColumnVector(batchSize, f.dt))
  private val batch = new ColumnarBatch(vectors.map(v => v: ColumnVector))

  private var blocksVisited = 0L
  private var bytesFetched = 0L
  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(OcfScanTaskMetric("ocfBlocksRead", blocksVisited),
      OcfScanTaskMetric("ocfBytesRead", bytesFetched))

  override def next(): Boolean = {
    if (emitted >= limit) return false
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var n = 0
    var done = false
    while (n < batchSize && emitted < limit && !done) {
      if (remaining == 0L) {
        if (blockStart < 0L || blockStart >= meta.len || blockStart >= stopAt)
          done = true
        else loadBlock()
      }
      if (!done && remaining > 0L) {
        decodeRow(n)
        remaining -= 1L
        emitted += 1L
        n += 1
      }
    }
    if (n == 0) false
    else { batch.setNumRows(n); true }
  }

  private def decodeRow(row: Int): Unit = {
    var j = 0
    while (j < fields.length) {
      val f = fields(j)
      val v = vectors(j)
      var isNull = false
      if (f.nullable) {
        val br = bin.readLong().toInt
        if (br == f.nullBranch) { v.putNull(row); isNull = true }
      }
      if (!isNull) f.wire match {
        case AInt => v.putInt(row, bin.readLong().toInt)
        case ALong => v.putLong(row, bin.readLong())
        case AFloat => v.putFloat(row, bin.readFloat())
        case ADouble => v.putDouble(row, bin.readDouble())
        case ABoolean => v.putBoolean(row, bin.readBoolean())
        case AString | ABytes =>
          val b = bin.readBytes()
          v.putByteArray(row, b, 0, b.length)
        case other => throw new IllegalStateException(s"not flat: $other")
      }
      j += 1
    }
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    batch.close()
    in.close()
  }

  private def loadBlock(): Unit = {
    val h = OcfBlocks.readBlockHeader(in, meta, blockStart)
    val body = new Array[Byte](h.size.toInt + Ocf.SyncSize)
    in.readFully(h.dataStart, body, 0, body.length)
    blocksVisited += 1
    bytesFetched += 20L + body.length
    var i = 0
    while (i < Ocf.SyncSize) {
      if (body(h.size.toInt + i) != meta.sync(i))
        throw new AvroResolutionException(
          s"OCF sync marker mismatch at ${meta.path}:$blockStart (corrupt block boundary)")
      i += 1
    }
    bin = new AvroBinaryReader(codec.decompress(java.util.Arrays.copyOf(body, h.size.toInt)))
    remaining = h.count
    blockStart = h.dataStart + h.size + Ocf.SyncSize
  }
}
