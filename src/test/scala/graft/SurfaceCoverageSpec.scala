package graft

import graft.avro._
import graft.spark.{functions => gfn}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Coverage for surfaces without a driver query: general (multi-branch)
  * unions through the Catalyst layer, the directory-backed schema registry,
  * and the OCF dump CLI. */
class SurfaceCoverageSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-surface-spec")
    .getOrCreate()

  test("general union decodes to struct-of-members with exactly one branch set") {
    // ["int","string"] has no Spark type — policy: struct<member0, member1>
    // (SURVEY §7.4); nullability comes from a null branch
    val schemaJson =
      """{"type":"record","name":"U","fields":[
        |{"name":"u","type":["int","string"]}]}""".stripMargin
    val schema = AvroSchemaParser.parse(schemaJson).asInstanceOf[ARecord]
    val w = new AvroDatumWriter(schema)
    val payloads = Seq(
      w.toBytes(AvroRecord(schema, Array[Any](42))),
      w.toBytes(AvroRecord(schema, Array[Any]("hello"))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(payloads.map(Row(_)): _*),
      StructType(Seq(StructField("payload", BinaryType))))
    val rows = df.select(gfn.from_avro(org.apache.spark.sql.functions.col("payload"),
        schemaJson).as("r"))
      .selectExpr("r.u.member0 AS m0", "r.u.member1 AS m1")
      .collect()
    assert(rows(0).getInt(0) == 42 && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).getString(1) == "hello")
  }

  test("directory-backed registry loads and caches .avsc files by key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-registry")
    java.nio.file.Files.writeString(dir.resolve("person.avsc"),
      """{"type":"record","name":"Person","fields":[{"name":"name","type":"string"}]}""")
    val reg = new graft.framing.DirectorySchemaRegistry(dir.toString)
    val s1 = reg.get("person")
    assert(s1.asInstanceOf[ARecord].name == "Person")
    assert(reg.get("person") eq s1) // cached instance, not re-parsed
    intercept[Exception](reg.get("missing"))
  }

  test("mixed codecs with one schema decode correctly (per-payload framing)") {
    // regression: the per-writer reader cache must NOT capture the codec —
    // a schema seen with codec 'null' first must still inflate 'deflate'
    val schemaJson = """{"type":"record","name":"KV","fields":[{"name":"k","type":"string"}]}"""
    val schema = AvroSchemaParser.parse(schemaJson).asInstanceOf[ARecord]
    val pNull = Ocf.writeAll(schema, Seq(AvroRecord(schema, Array[Any]("plain"))), "null")
    val pDeflate = Ocf.writeAll(schema, Seq(AvroRecord(schema, Array[Any]("packed"))), "deflate")
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(pNull), Row(pDeflate)),
      StructType(Seq(StructField("payload", BinaryType))))
    val viaGenerator = df
      .select(gfn.avro_ocf_explode(org.apache.spark.sql.functions.col("payload"), schemaJson))
      .collect().map(_.getString(0)).sorted
    val viaArray = df
      .select(org.apache.spark.sql.functions.explode(
        gfn.avro_ocf_decode(org.apache.spark.sql.functions.col("payload"), schemaJson)).as("r"))
      .select("r.k").collect().map(_.getString(0)).sorted
    assert(viaGenerator.toSeq == Seq("packed", "plain"))
    assert(viaArray.toSeq == Seq("packed", "plain"))
  }

  test("append-mode reopen keeps the original header and extends the stream") {
    val schemaJson = """{"type":"record","name":"KV","fields":[{"name":"k","type":"string"}]}"""
    val schema = AvroSchemaParser.parse(schemaJson).asInstanceOf[ARecord]
    val original = Ocf.writeAll(schema,
      Seq(AvroRecord(schema, Array[Any]("a"))), "deflate")
    val extended = Ocf.append(original,
      Seq(AvroRecord(schema, Array[Any]("b")), AvroRecord(schema, Array[Any]("c"))))
    val (_, datums) = Ocf.readAll(extended)
    assert(datums.map(_.asInstanceOf[AvroRecord].get("k")) == Vector("a", "b", "c"))
    // original bytes are a strict prefix (append never rewrites)
    assert(extended.take(original.length).sameElements(original))
  }

  test("OcfDump prints one JSON line per datum and --schema prints the schema") {
    val schema = AvroSchemaParser.parse(
      """{"type":"record","name":"KV","fields":[{"name":"k","type":"string"}]}""")
      .asInstanceOf[ARecord]
    val payload = Ocf.writeAll(schema,
      Seq(AvroRecord(schema, Array[Any]("a")), AvroRecord(schema, Array[Any]("b"))))
    val f = java.nio.file.Files.createTempFile("graft-dump", ".ocf")
    java.nio.file.Files.write(f, payload)

    def captured(args: Array[String]): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) { OcfDump.main(args) }
      out.toString("UTF-8")
    }
    assert(captured(Array(f.toString)).trim.linesIterator.toSeq ==
      Seq("""{"k": "a"}""", """{"k": "b"}"""))
    assert(captured(Array("--schema", f.toString)).contains("\"KV\""))
  }
}
