package graft

import graft.spark.{OcfFiles, OcfSink}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Path-based batch OCF scan/write (the file-first S1/S2 surface,
  * reference datafile.py:292-426). */
class OcfFilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-ocffiles-spec")
    .getOrCreate()

  private val schemaJson =
    """{"type":"record","name":"KV","fields":[
      |{"name":"k","type":"long"},{"name":"v","type":"string"}]}""".stripMargin

  private def tempDir(name: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d
  }

  test("directory write then scan round-trips rows across many files") {
    import spark.implicits._
    val rows = (0L until 1000L).map(i => (i, s"val_$i"))
    val df = rows.toDF("k", "v").repartition(4)
    val payloads = OcfSink.payloads(df, schemaJson, "deflate", datumsPerPayload = 100)
    val dir = tempDir("graft-ocf-dir")
    val nFiles = OcfFiles.writePayloadFiles(payloads, dir.getAbsolutePath)
    assert(nFiles >= 4, s"expected multiple files (one per payload blob), got $nFiles")
    assert(dir.listFiles.count(_.getName.endsWith(".avro")) == nFiles)
    val back = OcfFiles.scanDirectory(spark, dir.getAbsolutePath, schemaJson)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(back.toSeq == rows.sorted)
  }

  test("glob filter and path-keeping variant") {
    import spark.implicits._
    val df = (0L until 10L).map(i => (i, s"x$i")).toDF("k", "v").coalesce(1)
    val payloads = OcfSink.payloads(df, schemaJson, "null", datumsPerPayload = 10)
    val dir = tempDir("graft-ocf-glob")
    OcfFiles.writePayloadFiles(payloads, dir.getAbsolutePath)
    // a decoy non-.avro file must be ignored by the default glob
    java.nio.file.Files.write(
      new java.io.File(dir, "decoy.txt").toPath, Array[Byte](1, 2, 3))
    val withPath = OcfFiles.scanDirectoryWithPath(spark, dir.getAbsolutePath, schemaJson)
    val got = withPath.collect()
    assert(got.length == 10)
    assert(got.forall(_.getString(0).endsWith(".avro")), "path column must carry the source file")
  }

  test("scan resolves writer to a projected reader schema per file header") {
    import spark.implicits._
    val df = (0L until 5L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
    val payloads = OcfSink.payloads(df, schemaJson, "null", datumsPerPayload = 5)
    val dir = tempDir("graft-ocf-proj")
    OcfFiles.writePayloadFiles(payloads, dir.getAbsolutePath)
    val readerJson = """{"type":"record","name":"KV","fields":[{"name":"v","type":"string"}]}"""
    val back = OcfFiles.scanDirectory(spark, dir.getAbsolutePath, readerJson)
    assert(back.columns.toSeq == Seq("v"))
    assert(back.collect().map(_.getString(0)).sorted.toSeq == (0 until 5).map(i => s"v$i"))
  }
}
