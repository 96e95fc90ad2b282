package graft

import graft.avro._
import graft.spark.{functions => gfn}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** U5 error contracts (FAILFAST mirrors the reference's whole-batch failure,
  * PERMISSIVE is the Spark idiom) and parser error taxonomy.
  * (reference: avro-file-udf/lambda_function.py:26-30 batch failure;
  * python-udf/avro/name.py:186-189 reserved names.) */
class ErrorContractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-errors-spec")
    .getOrCreate()

  private val schemaJson =
    """{"type":"record","name":"KV","fields":[{"name":"k","type":"string"}]}"""

  private def payloadDf(bytes: Array[Byte]) = spark.createDataFrame(
    java.util.Arrays.asList(Row(bytes)),
    StructType(Seq(StructField("payload", BinaryType))))

  test("registry decode: unregistered stream name fails with a clear error") {
    val writer = new AvroDatumWriter(AvroSchemaParser.parse(schemaJson))
    val body = writer.toBytes(AvroRecord(
      AvroSchemaParser.parse(schemaJson).asInstanceOf[ARecord], Array[Any]("v1")))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row("ghost-stream", body)),
      StructType(Seq(
        StructField("stream", org.apache.spark.sql.types.StringType),
        StructField("payload", BinaryType))))
    val registry = graft.framing.SchemaRegistry.inMemory("real-stream" -> schemaJson)
    val e = intercept[Exception] {
      df.select(gfn.registry_decode_json(
        org.apache.spark.sql.functions.col("stream"),
        org.apache.spark.sql.functions.col("payload"), registry)).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("ghost-stream"), s"error must name the stream key: $e")
  }

  test("FAILFAST: corrupt bytes fail the query (reference batch contract)") {
    val corrupt = Array[Byte](0x7f, 0x7f, 0x7f) // truncated varint-length string
    val e = intercept[Exception] {
      payloadDf(corrupt).select(gfn.from_avro(
        org.apache.spark.sql.functions.col("payload"), schemaJson)).collect()
    }
    assert(e != null)
  }

  test("PERMISSIVE: corrupt bytes decode to null instead of failing") {
    val corrupt = Array[Byte](0x7f, 0x7f, 0x7f)
    val rows = payloadDf(corrupt).select(gfn.from_avro_permissive(
      org.apache.spark.sql.functions.col("payload"), schemaJson).as("r")).collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(0))
    // and a VALID payload still decodes on the same path
    val schema = AvroSchemaParser.parse(schemaJson).asInstanceOf[ARecord]
    val good = new AvroDatumWriter(schema).toBytes(AvroRecord(schema, Array[Any]("v")))
    val ok = payloadDf(good).select(gfn.from_avro_permissive(
      org.apache.spark.sql.functions.col("payload"), schemaJson).as("r")).collect()
    assert(ok(0).getStruct(0).getString(0) == "v")
  }

  test("PERMISSIVE corrupt-record mode retains the raw offending bytes") {
    val corrupt = Array[Byte](0x7f, 0x7f, 0x7f)
    val rows = payloadDf(corrupt).select(gfn.from_avro_permissive(
      org.apache.spark.sql.functions.col("payload"), schemaJson, "_corrupt_record")
      .as("r")).select("r.k", "r._corrupt_record").collect()
    assert(rows.length == 1)
    assert(rows(0).isNullAt(0), "data fields must be null on a corrupt row")
    assert(rows(0).getAs[Array[Byte]](1).toSeq == corrupt.toSeq,
      "the corrupt row must retain the exact raw datum bytes")
    // a clean payload decodes normally with a null corrupt field
    val schema = AvroSchemaParser.parse(schemaJson).asInstanceOf[ARecord]
    val good = new AvroDatumWriter(schema).toBytes(AvroRecord(schema, Array[Any]("v")))
    val ok = payloadDf(good).select(gfn.from_avro_permissive(
      org.apache.spark.sql.functions.col("payload"), schemaJson, "_corrupt_record")
      .as("r")).select("r.k", "r._corrupt_record").collect()
    assert(ok(0).getString(0) == "v")
    assert(ok(0).isNullAt(1), "clean rows must carry a null corrupt field")
    // FAILFAST ignores the corrupt column and still fails the batch
    intercept[Exception] {
      payloadDf(corrupt).select(org.apache.spark.sql.graft.Shims.column(
        graft.spark.AvroDecode(
          org.apache.spark.sql.graft.Shims.expression(
            org.apache.spark.sql.functions.col("payload")),
          schemaJson, None, "FAILFAST", Some("_corrupt_record")))).collect()
    }
  }

  test("generator OCF decode matches the array form across multiple blocks") {
    // >64 KB of datums forces multi-block payloads (sync-interval flush)
    val rows = (0 until 5000).map(i => s"value_$i" * 3)
    import spark.implicits._
    val df = rows.toDF("k")
    val valSchema = """{"type":"record","name":"KV","fields":[{"name":"k","type":"string"}]}"""
    val payloads = graft.spark.OcfSink.payloads(df, valSchema, "deflate", datumsPerPayload = 5000)
    assert(payloads.count() >= 1)
    val viaGenerator = payloads
      .select(gfn.avro_ocf_explode(org.apache.spark.sql.functions.col("payload"), valSchema))
      .orderBy("k").collect().map(_.getString(0))
    val viaArray = payloads
      .select(org.apache.spark.sql.functions.explode(
        gfn.avro_ocf_decode(org.apache.spark.sql.functions.col("payload"), valSchema)).as("r"))
      .select("r.k").orderBy("k").collect().map(_.getString(0))
    assert(viaGenerator.toSeq == rows.sorted)
    assert(viaArray.toSeq == viaGenerator.toSeq)
  }

  test("general-union encode: struct-of-members bytes equal kernel-written bytes") {
    // ["int","string"]: member position selects the write branch — the
    // engine-encoded datum must be byte-identical to the kernel writer's
    // first-validating-branch output (io.py:1306-1322 semantics)
    val unionJson = """["int","string"]"""
    val kernel = new AvroDatumWriter(AvroSchemaParser.parse(unionJson))
    import org.apache.spark.sql.functions.{col, struct, when, lit}
    import spark.implicits._
    val df = Seq((0, "zero"), (1, "one"), (2, "two"), (3, "three")).toDF("k", "s")
    val engineBytes = df.select(col("k"), gfn.to_avro(struct(
        when(col("k") % 2 === 0, col("k") * 11).as("member0"),
        when(col("k") % 2 =!= 0, col("s")).as("member1")), unionJson).as("p"))
      .orderBy("k").collect().map(_.getAs[Array[Byte]]("p"))
    val kernelBytes = Seq(0, 1, 2, 3).map { k =>
      kernel.toBytes(if (k % 2 == 0) k * 11 else Seq("zero", "one", "two", "three")(k))
    }
    engineBytes.zip(kernelBytes).zipWithIndex.foreach { case ((e, x), i) =>
      assert(e.sameElements(x), s"row $i: engine ${e.toSeq} != kernel ${x.toSeq}")
    }
    // and the engine decode closes the loop (member0 XOR member1 set)
    val back = df.select(col("k"), gfn.from_avro(gfn.to_avro(struct(
        when(col("k") % 2 === 0, col("k") * 11).as("member0"),
        when(col("k") % 2 =!= 0, col("s")).as("member1")), unionJson), unionJson).as("u"))
      .orderBy("k").collect()
    back.foreach { r =>
      val k = r.getInt(0)
      val u = r.getStruct(1)
      if (k % 2 == 0) { assert(u.getInt(0) == k * 11); assert(u.isNullAt(1)) }
      else { assert(u.isNullAt(0)); assert(!u.isNullAt(1)) }
    }
  }

  test("general-union: three branches incl. a record branch round-trip") {
    // ["int","string",record(x,y)] — one member set per row by k mod 3; the
    // record branch exercises the nested-struct write path and the kernel
    // byte-equality closes the encode side (io.py:1306-1322)
    val u3 =
      """["int","string",{"type":"record","name":"pt","fields":[
        |{"name":"x","type":"long"},{"name":"y","type":"long"}]}]""".stripMargin
    import org.apache.spark.sql.functions.{col, concat_ws, lit, struct, when}
    import spark.implicits._
    val df = (0 until 9).toDF("k")
    val members = struct(
      when(col("k") % 3 === 0, col("k") * 11).as("member0"),
      when(col("k") % 3 === 1, concat_ws("_", lit("s"), col("k"))).as("member1"),
      when(col("k") % 3 === 2,
        struct((col("k") * 2).cast("long").as("x"),
          (col("k") + 100).cast("long").as("y"))).as("member2"))
    val engineBytes = df.select(col("k"), gfn.to_avro(members, u3).as("p"))
      .orderBy("k").collect().map(_.getAs[Array[Byte]]("p"))
    val parsed = AvroSchemaParser.parse(u3)
    val kernel = new AvroDatumWriter(parsed)
    val ptRec = parsed.asInstanceOf[AUnion].branches(2).asInstanceOf[ARecord]
    val kernelBytes = (0 until 9).map { k =>
      kernel.toBytes(k % 3 match {
        case 0 => k * 11
        case 1 => s"s_$k"
        case _ => AvroRecord(ptRec, Array[Any](k * 2L, k + 100L))
      })
    }
    engineBytes.zip(kernelBytes).zipWithIndex.foreach { case ((e, x), i) =>
      assert(e.sameElements(x), s"row $i: engine ${e.toSeq} != kernel ${x.toSeq}")
    }
    val back = df.select(col("k"),
      gfn.from_avro(gfn.to_avro(members, u3), u3).as("u")).orderBy("k").collect()
    back.foreach { r =>
      val k = r.getInt(0)
      val u = r.getStruct(1)
      k % 3 match {
        case 0 => assert(u.getInt(0) == k * 11 && u.isNullAt(1) && u.isNullAt(2))
        case 1 => assert(u.isNullAt(0) && u.getString(1) == s"s_$k" && u.isNullAt(2))
        case _ =>
          assert(u.isNullAt(0) && u.isNullAt(1))
          val pt = u.getStruct(2)
          assert(pt.getLong(0) == k * 2L && pt.getLong(1) == k + 100L)
      }
    }
  }

  test("general-union encode: nullable union writes the null branch for all-null members") {
    val unionJson = """["null","int","string"]"""
    import org.apache.spark.sql.functions.{col, struct, when}
    import spark.implicits._
    val df = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "s")
    // k=2 sets neither member → null branch (index 0) on the wire
    val back = df.select(col("k"), gfn.from_avro(gfn.to_avro(struct(
        when(col("k") === 0, col("k") + 100).as("member0"),
        when(col("k") === 1, col("s")).as("member1")), unionJson), unionJson).as("u"))
      .orderBy("k").collect()
    assert(back(0).getStruct(1).getInt(0) == 100)
    assert(back(1).getStruct(1).getString(1) == "b")
    // the null branch decodes to a NULL struct (nullable-union contract),
    // not a struct of nulls
    assert(back(2).isNullAt(1))
  }

  test("general-union encode: wrong struct arity fails with a clear error") {
    import org.apache.spark.sql.functions.{col, struct}
    import spark.implicits._
    val df = Seq((1, "x")).toDF("k", "s")
    val e = intercept[Exception] {
      df.select(gfn.to_avro(struct(col("k")), """["int","string","boolean"]""")).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(c => Option(c.getMessage).getOrElse("")).getOrElse("")
    assert(msg.contains("union"), s"error must mention the union mismatch: $e")
  }

  test("primitive type names are reserved for named types") {
    for (bad <- Seq("int", "string", "null", "bytes")) {
      intercept[AvroSchemaParseException] {
        AvroSchemaParser.parse(s"""{"type":"record","name":"$bad","fields":[]}""")
      }
      intercept[AvroSchemaParseException] {
        AvroSchemaParser.parse(s"""{"type":"fixed","name":"$bad","size":4}""")
      }
    }
    // ...but a namespaced name that merely ENDS in a primitive word is fine
    assert(AvroSchemaParser.parse(
      """{"type":"fixed","name":"my.ns.int2","size":4}""").isInstanceOf[AFixed])
  }

  test("direct field match shadows an alias to the same slot (no corruption)") {
    // writer has BOTH the current name and the old aliased name: the direct
    // match wins, the alias-named writer field is skipped, never overwritten
    val writer = AvroSchemaParser.parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"a","type":"int"},{"name":"old_a","type":"int"}]}""".stripMargin)
    val reader = AvroSchemaParser.parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"a","type":"int","aliases":["old_a"]}]}""".stripMargin)
    val schema = writer.asInstanceOf[ARecord]
    val bytes = new AvroDatumWriter(schema).toBytes(AvroRecord(schema, Array[Any](1, 2)))
    val back = new AvroDatumReader(writer, Some(reader)).read(bytes).asInstanceOf[AvroRecord]
    assert(back.get("a") == 1) // direct value, not the skipped old_a=2
  }

  test("genuinely ambiguous alias resolution throws instead of last-write-wins") {
    // reader field aliases TWO distinct writer fields and matches neither
    // directly: whichever decoded last would silently win — must throw
    val writer = AvroSchemaParser.parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"w1","type":"int"},{"name":"w2","type":"int"}]}""".stripMargin)
    val reader = AvroSchemaParser.parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"a","type":"int","aliases":["w1","w2"]}]}""".stripMargin)
    val schema = writer.asInstanceOf[ARecord]
    val bytes = new AvroDatumWriter(schema).toBytes(AvroRecord(schema, Array[Any](1, 2)))
    intercept[AvroResolutionException] {
      new AvroDatumReader(writer, Some(reader)).read(bytes)
    }
  }

  test("duplicate alias declarations are harmless when direct matches cover all fields") {
    // both reader fields declare the same alias, but the writer matches both
    // directly — aliases are never consulted, so decode must succeed
    val writer = AvroSchemaParser.parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"x","type":"int"},{"name":"y","type":"int"}]}""".stripMargin)
    val reader = AvroSchemaParser.parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"x","type":"int","aliases":["old"]},
        |{"name":"y","type":"int","aliases":["old"]}]}""".stripMargin)
    val schema = writer.asInstanceOf[ARecord]
    val bytes = new AvroDatumWriter(schema).toBytes(AvroRecord(schema, Array[Any](7, 9)))
    val back = new AvroDatumReader(writer, Some(reader)).read(bytes).asInstanceOf[AvroRecord]
    assert(back.get("x") == 7 && back.get("y") == 9)
  }
}
