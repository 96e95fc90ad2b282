package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.avro.{AvroJson, Ocf}
import graft.spark.AvroRuntime

/** V2 `FunctionCatalog` functions under the catalog's `system` namespace —
  * the reference's SQL-UDF surface (its whole premise: `SELECT
  * fn_decode_avro_binary(hex) FROM …`, reference README.md:29-44) made
  * available catalog-qualified with NO session-extension setup:
  *
  * {{{
  * SELECT g.system.fn_decode_avro_binary(payload_hex) FROM landing;
  * SELECT g.system.avro_decode_json(datum, '<writer avsc>') FROM stream;
  * SELECT explode(g.system.kpl_deaggregate(rec)) FROM kinesis_dump;
  * }}}
  *
  * Each bound function carries a MAGIC `invoke` method (UTF8String/byte[]
  * signatures), so Spark plans a direct `Invoke` call inside whole-stage
  * codegen — no row boxing, same hot path as the session-registered
  * expression forms (U1–U5). Schema-taking functions resolve their compiled
  * reader through [[AvroRuntime]]'s per-executor caches, so the per-row cost
  * after the first call is one map lookup. */
private[sources] object GraftFunctions {

  def load(ident: Identifier): UnboundFunction = {
    // `bucket` lives at the EMPTY namespace: that is where Spark's
    // V2ExpressionUtils resolves partition-transform functions when it
    // plans a bucketed write's distribution or unifies a storage-
    // partitioned join's scan transforms
    if (ident.namespace.isEmpty && ident.name == "bucket")
      return GraftBucketFunction
    // hidden partition transforms (X88) resolve at the same empty namespace
    if (ident.namespace.isEmpty &&
        Set("years", "months", "days", "hours").contains(ident.name))
      return GraftTimeTransformFunction(ident.name)
    if (ident.namespace.isEmpty && ident.name == "truncate")
      return GraftTruncateFunction
    if (ident.namespace.toSeq != Seq("system"))
      throw new RuntimeException(
        s"graft catalog: functions live under the 'system' namespace " +
          s"(<cat>.system.<name>); got ${ident.namespace.mkString(".")}")
    all.getOrElse(ident.name, throw new RuntimeException(
      s"graft catalog: unknown function '${ident.name}'; " +
        s"available: ${all.keys.toSeq.sorted.mkString(", ")}"))
  }

  def list(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.toSeq == Seq("system"))
      all.keys.toSeq.sorted.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  def exists(ident: Identifier): Boolean =
    (ident.namespace.isEmpty && ident.name == "bucket") ||
      (ident.namespace.toSeq == Seq("system") && all.contains(ident.name))

  private val all: Map[String, UnboundFunction] = Map(
    "fn_decode_avro_binary" -> FnDecodeAvroBinary,
    "avro_ocf_decode_json" -> AvroOcfDecodeJsonFn,
    "avro_decode_json" -> AvroDecodeJsonFn,
    "kpl_deaggregate" -> KplDeaggregateFn)

  private def expect(got: StructType, want: DataType*)(name: String): Unit =
    require(got.fields.length == want.length &&
        got.fields.zip(want).forall { case (f, w) => f.dataType == w },
      s"$name expects (${want.map(_.simpleString).mkString(", ")}), got " +
        s"(${got.fields.map(_.dataType.simpleString).mkString(", ")})")

  /** U2 parity: hex varchar in → JSON varchar out (the reference's headline
    * UDF, python-udf/udf.py:7-9). */
  private object FnDecodeAvroBinary extends UnboundFunction
      with ScalarFunction[UTF8String] {
    override def name(): String = "fn_decode_avro_binary"
    override def description(): String = "hex-encoded OCF → JSON rows text"
    override def bind(inputType: StructType): BoundFunction = {
      expect(inputType, StringType)(name()); this
    }
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = StringType
    override def canonicalName(): String = "graft.system.fn_decode_avro_binary"
    def invoke(hex: UTF8String): UTF8String = {
      if (hex == null) return null
      val bytes = org.apache.spark.sql.catalyst.expressions.Hex.unhex(hex.getBytes)
      require(bytes != null, "fn_decode_avro_binary: input is not valid hex")
      val (_, datums) = Ocf.readAll(bytes)
      UTF8String.fromString(AvroJson.renderAll(datums))
    }
    override def produceResult(input: InternalRow): UTF8String =
      invoke(if (input.isNullAt(0)) null else input.getUTF8String(0))
  }

  private object AvroOcfDecodeJsonFn extends UnboundFunction
      with ScalarFunction[UTF8String] {
    override def name(): String = "avro_ocf_decode_json"
    override def description(): String = "OCF bytes → JSON rows text"
    override def bind(inputType: StructType): BoundFunction = {
      expect(inputType, BinaryType)(name()); this
    }
    override def inputTypes(): Array[DataType] = Array(BinaryType)
    override def resultType(): DataType = StringType
    override def canonicalName(): String = "graft.system.avro_ocf_decode_json"
    def invoke(data: Array[Byte]): UTF8String = {
      if (data == null) return null
      val (_, datums) = Ocf.readAll(data)
      UTF8String.fromString(AvroJson.renderAll(datums))
    }
    override def produceResult(input: InternalRow): UTF8String =
      invoke(if (input.isNullAt(0)) null else input.getBinary(0))
  }

  /** Registry-path parity: bare datum + writer schema (a VALUE here, not a
    * literal — the compiled reader is a per-executor cache hit per schema). */
  private object AvroDecodeJsonFn extends UnboundFunction
      with ScalarFunction[UTF8String] {
    override def name(): String = "avro_decode_json"
    override def description(): String = "bare Avro datum + writer avsc → JSON text"
    override def bind(inputType: StructType): BoundFunction = {
      expect(inputType, BinaryType, StringType)(name()); this
    }
    override def inputTypes(): Array[DataType] = Array(BinaryType, StringType)
    override def resultType(): DataType = StringType
    override def canonicalName(): String = "graft.system.avro_decode_json"
    def invoke(data: Array[Byte], schema: UTF8String): UTF8String = {
      if (data == null || schema == null) return null
      val datum = AvroRuntime.genericReader(schema.toString).read(data)
      UTF8String.fromString(AvroJson.render(datum))
    }
    override def produceResult(input: InternalRow): UTF8String =
      invoke(if (input.isNullAt(0)) null else input.getBinary(0),
        if (input.isNullAt(1)) null else input.getUTF8String(1))
  }

  private object KplDeaggregateFn extends UnboundFunction
      with ScalarFunction[ArrayData] {
    override def name(): String = "kpl_deaggregate"
    override def description(): String = "KPL aggregated record → array of sub-payloads"
    override def bind(inputType: StructType): BoundFunction = {
      expect(inputType, BinaryType)(name()); this
    }
    override def inputTypes(): Array[DataType] = Array(BinaryType)
    override def resultType(): DataType = ArrayType(BinaryType, containsNull = false)
    override def canonicalName(): String = "graft.system.kpl_deaggregate"
    def invoke(data: Array[Byte]): ArrayData = {
      if (data == null) return null
      new GenericArrayData(
        graft.framing.KplDeaggregator.subPayloads(data).toArray[Any])
    }
    override def produceResult(input: InternalRow): ArrayData =
      invoke(if (input.isNullAt(0)) null else input.getBinary(0))
  }
}
