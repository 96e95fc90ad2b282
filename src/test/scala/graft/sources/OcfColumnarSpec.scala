package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Vectorized flat-schema reads (X91): ColumnarBatch decode for all-
  * primitive schemas with identity resolution; row-reader fallback
  * everywhere else; results identical either way. */
class OcfColumnarSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-columnar-spec")
    .getOrCreate()

  private def tempDir(prefix: String): java.io.File =
    java.nio.file.Files.createTempDirectory(prefix).toFile

  private def isColumnar(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("ColumnarToRow")

  test("flat primitive scans read columnar; results equal the row path") {
    import spark.implicits._
    val dir = tempDir("graft-col")
    val src = (0L until 5000L).map(i =>
      (i, if (i % 7 == 0) null else s"doc $i", i * 0.5, i % 3 == 0))
      .toDF("id", "v", "score", "flag").repartition(3)
    src.write.format("graft-ocf").mode(SaveMode.Append).save(dir.getAbsolutePath)

    val colDf = spark.read.format("graft-ocf")
      .option("splitSize", "65536") // several splits per file
      .load(dir.getAbsolutePath)
    assert(isColumnar(colDf), colDf.queryExecution.executedPlan.toString)

    val rowDf = spark.read.format("graft-ocf")
      .option("splitSize", "65536").option("columnar", "false")
      .load(dir.getAbsolutePath)
    assert(!isColumnar(rowDf), "columnar=false must fall back to rows")

    def canon(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getDouble(2), r.getBoolean(3))).sortBy(_._1).toSeq
    val a = canon(colDf)
    assert(a == canon(rowDf))
    assert(a.length == 5000)
    assert(a(7) == ((7L, null, 3.5, false)))
    assert(a(6) == ((6L, "doc 6", 3.0, true)))

    // pushed limit stops early on the columnar path too
    assert(colDf.limit(5).collect().length == 5)
    // codegen'd filters/aggregates consume the batches
    assert(colDf.where("id % 100 = 3").count() == 50L)
  }

  test("columnar survives codecs and column pruning keeps identity resolution") {
    import spark.implicits._
    val dir = tempDir("graft-col-z")
    (0L until 1000L).map(i => (i, s"z$i")).toDF("id", "v")
      .write.format("graft-ocf").option("codec", "deflate")
      .mode(SaveMode.Append).save(dir.getAbsolutePath)
    val df = spark.read.format("graft-ocf").load(dir.getAbsolutePath)
    assert(isColumnar(df))
    assert(df.count() == 1000L)
    // a projection PRUNES the reader schema — the wire plan decodes the
    // kept columns positionally and type-SKIPS the projected-away ones,
    // so the flat subset still rides the columnar lane
    val pruned = df.select("id")
    assert(isColumnar(pruned), pruned.queryExecution.executedPlan.toString)
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == (0L until 1000L))
    val prunedRows = spark.read.format("graft-ocf").option("columnar", "false")
      .load(dir.getAbsolutePath).select("id")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ==
      prunedRows.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("per-file wire plan: plain writer under nullable reader, both lanes equal") {
    import spark.implicits._
    val dir = tempDir("graft-col-wire")
    // tuple fields (Long, Double) are non-nullable in Spark => the sink
    // writes PLAIN long/double — no union, no branch byte on the wire
    (0L until 3000L).map(i => (i, i * 0.25)).toDF("id", "score")
      .write.format("graft-ocf").mode(SaveMode.Append).save(dir.getAbsolutePath)
    // a NULLABLE reader over those plain files is the catalog's common
    // case (nullable table schema over non-null-written files): the wire
    // plan must decode with NO branch byte, not consume one the writer
    // never wrote
    val readerJson =
      """{"type":"record","name":"topLevelRecord","fields":[
        |{"name":"id","type":["null","long"]},
        |{"name":"score","type":["null","double"]}]}""".stripMargin
    val col = spark.read.format("graft-ocf")
      .option("readerSchema", readerJson).load(dir.getAbsolutePath)
    assert(isColumnar(col), col.queryExecution.executedPlan.toString)
    val row = spark.read.format("graft-ocf").option("columnar", "false")
      .option("readerSchema", readerJson).load(dir.getAbsolutePath)
    def canon(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val got = canon(col)
    assert(got == canon(row), "columnar decode must be bit-identical to the row lane")
    assert(got.length == 3000 && got(17) == ((17L, 4.25)))
    // the inverse — NULLABLE writer under a PLAIN reader — has nowhere to
    // put a null: the lane must refuse and ride the row reader
    val ndir = tempDir("graft-col-wire-n")
    (0L until 100L).map(i => (i, if (i % 9 == 0) null else s"s$i"))
      .toDF("id", "v") // v nullable => union on the wire
      .write.format("graft-ocf").mode(SaveMode.Append).save(ndir.getAbsolutePath)
    val plainReader =
      """{"type":"record","name":"topLevelRecord","fields":[
        |{"name":"id","type":"long"}]}""".stripMargin
    val fb = spark.read.format("graft-ocf")
      .option("readerSchema", plainReader).load(ndir.getAbsolutePath)
    // pruned to id only: writer id is plain, so this DOES vectorize; but a
    // plain reader including v must not
    val fields = OcfColumnar.fieldsFor(
      """{"type":"record","name":"topLevelRecord","fields":[
        |{"name":"id","type":"long"},{"name":"v","type":"string"}]}""".stripMargin).get
    val writerJson = OcfDataSource.fetchMetas(spark.sessionState.newHadoopConf(),
      OcfDataSource.list(spark.sessionState.newHadoopConf(),
        Seq(ndir.getAbsolutePath), None, recursive = false)).head.writerSchemaJson
    assert(OcfColumnar.wirePlanFor(writerJson, fields).isEmpty,
      "nullable-writer-under-plain-reader must refuse the columnar lane")
    assert(fb.collect().map(_.getLong(0)).sorted.toSeq == (0L until 100L))
  }

  test("columnar composes with block-index aligned splits and stats skipping") {
    import spark.implicits._
    val dir = tempDir("graft-col-bi")
    (0L until 20000L).map(i => (i, s"payload $i")).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
      .write.format("graft-ocf")
      .option("statsColumns", "id").option("blockIndex", "true")
      .option("blockBytes", "4096")
      .mode(SaveMode.Append).save(dir.getAbsolutePath)
    val df = spark.read.format("graft-ocf").load(dir.getAbsolutePath)
      .where($"id" >= 19900L)
    assert(isColumnar(df), df.queryExecution.executedPlan.toString)
    val got = df.collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (19900L until 20000L))
    assert(got.length == 100)
    // stamp-size regression pin (X89): the FILE stamp carries the NDV
    // sketch; the per-BLOCK index entries must NOT (a sketch per block
    // would bloat the header ~700 B/entry for a file-level-only quantity)
    val f = OcfDataSource.list(
      spark.sessionState.newHadoopConf(), Seq(dir.getAbsolutePath), None,
      recursive = false).head
    val m = OcfDataSource.fetchMetas(spark.sessionState.newHadoopConf(), Seq(f)).head
    assert(m.statsJson.exists(_.contains("\"hll\"")), "file stamp needs the sketch")
    assert(m.blockIndexJson.exists(j => !j.contains("\"hll\"")),
      "block index entries must stay sketch-free")
  }

  test("row-reader fallback for metadata columns, nested schemas, partitions") {
    import spark.implicits._
    val dir = tempDir("graft-col-fb")
    (0L until 100L).map(i => (i, s"d$i")).toDF("id", "v")
      .write.format("graft-ocf").mode(SaveMode.Append).save(dir.getAbsolutePath)
    val base = spark.read.format("graft-ocf").load(dir.getAbsolutePath)
    // `_file` is an appended per-file constant — row path
    val withFile = base.select($"id", $"_file")
    assert(!isColumnar(withFile))
    assert(withFile.collect().forall(_.getString(1).contains("graft-col-fb")))
    // partitioned layout appends partition values — row path
    val pdir = tempDir("graft-col-part")
    (0L until 100L).map(i => (i, s"p$i", s"g${i % 2}")).toDF("id", "v", "g")
      .write.format("graft-ocf").partitionBy("g")
      .mode(SaveMode.Append).save(pdir.getAbsolutePath)
    val part = spark.read.format("graft-ocf").load(pdir.getAbsolutePath)
    assert(!isColumnar(part))
    assert(part.count() == 100L)
    // nested schema — row path
    val ndir = tempDir("graft-col-nested")
    (0L until 10L).map(i => (i, (s"n$i", i * 2)))
      .toDF("id", "info")
      .write.format("graft-ocf").mode(SaveMode.Append).save(ndir.getAbsolutePath)
    val nested = spark.read.format("graft-ocf").load(ndir.getAbsolutePath)
    assert(!isColumnar(nested))
    assert(nested.count() == 10L)
  }

  test("scalar logical types (date/timestamp) ride the columnar lane; " +
      "values equal the row path exactly") {
    import spark.implicits._
    val dir = tempDir("graft-col-logic")
    val src = (0 until 2000).map { i =>
      (i.toLong,
        java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1577836800L + i, (i % 1000) * 1000L)),
        if (i % 11 == 0) null
        else java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1600000000L + i)))
    }.toDF("id", "d", "ts", "tsn").repartition(2)
    src.write.format("graft-ocf").mode(SaveMode.Append).save(dir.getAbsolutePath)

    val colDf = spark.read.format("graft-ocf")
      .option("splitSize", "65536").load(dir.getAbsolutePath)
    assert(isColumnar(colDf), colDf.queryExecution.executedPlan.toString)
    val rowDf = spark.read.format("graft-ocf")
      .option("splitSize", "65536").option("columnar", "false")
      .load(dir.getAbsolutePath)
    def canon(df: DataFrame) = df.collect().map(r => (r.getLong(0),
      r.getDate(1).toString, r.getTimestamp(2).toInstant.toString,
      if (r.isNullAt(3)) null else r.getTimestamp(3).toInstant.toString))
      .sortBy(_._1).toSeq
    val a = canon(colDf)
    assert(a == canon(rowDf))
    assert(a.length == 2000)
    assert(a(1) == ((1L, "2020-01-02", "2020-01-01T00:00:01.000001Z",
      "2020-09-13T12:26:41Z")))
    assert(a(0)._4 == null)
    // date/timestamp predicates and aggregates consume the batches
    assert(colDf.where($"d" >= java.sql.Date.valueOf("2023-01-01")).count() ==
      rowDf.where($"d" >= java.sql.Date.valueOf("2023-01-01")).count())

    // wire-plan level: an EXTERNAL writer's timestamp-millis resolves under
    // a timestamp-micros reader (same Spark type; decode is writer-driven)
    val reader = OcfColumnar.fieldsFor(
      """{"type":"record","name":"r","fields":[
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}}]}"""
        .stripMargin).get
    val plan = OcfColumnar.wirePlanFor(
      """{"type":"record","name":"r","fields":[
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}}]}"""
        .stripMargin, reader)
    assert(plan.isDefined && plan.get.length == 1 && plan.get.head.target == 0)
    // decimal stays with the row reader
    assert(OcfColumnar.fieldsFor(
      """{"type":"record","name":"r","fields":[
        |{"name":"d","type":{"type":"bytes","logicalType":"decimal",
        |"precision":10,"scale":2}}]}""".stripMargin).isEmpty)
  }
}
