package graft

import graft.spark.{AvroDecode, GraftSparkExtensions}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions`-style packaging: a session built with
  * [[GraftSparkExtensions]] has the SQL surface and the pruning rule with
  * no imperative registration. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // a fresh session on the shared context, with extensions applied
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions)
      .appName("graft-extensions-spec")
      .getOrCreate()
  }

  test("SQL functions resolve without registerAll") {
    val json = spark.sql(
      s"SELECT fn_decode_avro_binary('${SparkEntry.goldenOcfHex}') AS j")
      .collect()(0).getString(0)
    assert(json.contains("\"Alyssa\"") && json.contains("\"Ben\""))
    // a second surface, via the generic decode path
    val row = spark.sql(
      s"""SELECT avro_ocf_decode(unhex('${SparkEntry.goldenOcfHex}'),
         |'${SparkEntry.userSchemaJson.replace("\n", " ")}') AS arr""".stripMargin)
      .selectExpr("size(arr) AS n").collect()(0)
    assert(row.getInt(0) == 2)
  }

  test("the pruning optimizer rule is active in extension-built sessions") {
    import org.apache.spark.sql.functions._
    val p = java.nio.file.Files.createTempDirectory("graft-ext-prune").toString
    val schemaJson: String =
      """{"type":"record","name":"W","fields":[
        |{"name":"a","type":"int"},{"name":"big","type":"string"}]}""".stripMargin
    locally {
      import spark.implicits._
      (0 until 10).map(i => (i, "x" * 100)).toDF("a", "big")
        .select(graft.spark.functions.to_avro(struct(col("a"), col("big")), schemaJson).as("bin"))
        .write.mode("overwrite").parquet(p)
    }
    val df = spark.read.parquet(p)
      .select(graft.spark.functions.from_avro(col("bin"), schemaJson).as("r"))
      .select(col("r.a").as("a"))
    val readers = df.queryExecution.optimizedPlan.flatMap(n => n.expressions.flatMap(_.collect {
      case d: AvroDecode => graft.avro.AvroSchemaParser
        .parse(d.readerSchemaJson.getOrElse(d.writerSchemaJson))
        .asInstanceOf[graft.avro.ARecord].fields.map(_.name)
    }))
    assert(readers.nonEmpty && readers.forall(_ == Seq("a")),
      s"expected pruned reader [a]; got $readers")
    assert(df.orderBy("a").collect().map(_.getInt(0)).toSeq == (0 until 10))
  }
}
