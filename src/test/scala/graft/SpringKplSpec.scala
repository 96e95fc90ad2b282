package graft

import graft.avro._
import graft.framing.{KplDeaggregator, SpringHeaders}
import graft.spark.{functions => gfn}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** U4 as ONE expression: `spring_kpl_decode_all` reproduces the reference
  * Lambda's one-input-row → one-JSON-array contract, including mixed content
  * types inside a single KPL aggregate.
  * (reference: springcloud-lambda-udf/lambda_function.py:171-219.) */
class SpringKplSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-springkpl-spec")
    .getOrCreate()

  private val kvSchema = """{"type":"record","name":"KV","fields":[
    |{"name":"my_message_key","type":"string"}]}""".stripMargin
  private val ptSchema = """{"type":"record","name":"Pt","fields":[
    |{"name":"x","type":"int"},{"name":"y","type":"int"}]}""".stripMargin

  private def frame(schemaJson: String, contentType: String, values: Array[Any]): Array[Byte] = {
    val schema = AvroSchemaParser.parse(schemaJson).asInstanceOf[ARecord]
    val body = new AvroDatumWriter(schema).toBytes(AvroRecord(schema, values))
    SpringHeaders.frame(Seq("contentType" -> contentType), body)
  }

  test("one KPL row with mixed content types decodes to one JSON array") {
    val kpl = KplDeaggregator.encode(KplDeaggregator.Aggregated(
      Seq("pk"), Nil, Seq(
        KplDeaggregator.KplRecord(0, None,
          frame(kvSchema, "application/vnd.kv.v1+avro", Array[Any]("my_message_value"))),
        KplDeaggregator.KplRecord(0, None,
          frame(ptSchema, "application/vnd.pt.v1+avro", Array[Any](3, 4))))))

    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(kpl)),
      StructType(Seq(StructField("payload", BinaryType))))
    val out = df.select(gfn.spring_kpl_decode_all(org.apache.spark.sql.functions.col("payload"),
        Map("application/vnd.kv.v1+avro" -> kvSchema,
            "application/vnd.pt.v1+avro" -> ptSchema)).as("json"))
      .collect()

    assert(out.length == 1) // the one-row contract: N sub-records, ONE array
    assert(out(0).getString(0) ==
      """[{"my_message_key": "my_message_value"}, {"x": 3, "y": 4}]""")
  }

  test("unknown content type fails the row (reference batch-failure contract)") {
    val kpl = KplDeaggregator.encode(KplDeaggregator.Aggregated(
      Seq("pk"), Nil, Seq(KplDeaggregator.KplRecord(0, None,
        frame(kvSchema, "application/vnd.unknown.v1+avro", Array[Any]("v"))))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(kpl)),
      StructType(Seq(StructField("payload", BinaryType))))
    val e = intercept[Exception] {
      df.select(gfn.spring_kpl_decode_all(org.apache.spark.sql.functions.col("payload"),
        Map("application/vnd.kv.v1+avro" -> kvSchema))).collect()
    }
    assert(e.getMessage != null)
  }
}
