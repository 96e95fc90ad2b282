package graft

import graft.avro._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable
import java.util.concurrent.atomic.AtomicLong

/** Property tests over the Avro type algebra: random schema → random datum →
  * encode → decode → equality, plus parser/canonical-form round-trips.
  * Generalizes the reference's single-fixture round-trip test
  * (reference: glue-schema-per-stream-udf/lambda_function.py:66-95) to the
  * whole algebra — SURVEY §5's "where we exceed the reference". */
class AvroPropertySpec extends AnyFunSuite {

  private val nameCounter = new AtomicLong(0)
  private def freshName(prefix: String): String = s"$prefix${nameCounter.incrementAndGet()}"

  // ---- schema generator ---------------------------------------------------

  private val genPrimitive: Gen[AvroSchema] =
    Gen.oneOf(ABoolean, AInt, ALong, AFloat, ADouble, ABytes, AString)

  private def genEnum: Gen[AvroSchema] = for {
    n <- Gen.choose(1, 5)
  } yield AEnum(freshName("E"), None, (0 until n).map(i => s"S$i"))

  private def genFixed: Gen[AvroSchema] = for {
    size <- Gen.choose(0, 8)
  } yield AFixed(freshName("F"), None, size)

  /** Unions keep Avro's constraints (no nested unions, one branch per
    * unnamed type) and additionally use runtime-DISJOINT branches: the
    * writer picks the first branch the datum validates against, and an Int
    * validates as long (Float as double), so int|long unions don't
    * round-trip the runtime type — pick at most one of each family. */
  private def genUnion: Gen[AvroSchema] = for {
    numeric <- Gen.oneOf[AvroSchema](AInt, ALong)
    fp <- Gen.oneOf[AvroSchema](AFloat, ADouble)
    branches <- Gen.pick(2, Seq(numeric, fp, AString, ABoolean))
    nullable <- Gen.oneOf(true, false)
  } yield AUnion((if (nullable) Seq(ANull) else Nil) ++ branches.toSeq)

  private def genSchema(depth: Int): Gen[AvroSchema] =
    if (depth <= 0) genPrimitive
    else Gen.frequency(
      5 -> genPrimitive,
      1 -> genEnum,
      1 -> genFixed,
      1 -> genUnion,
      2 -> Gen.lzy(genSchema(depth - 1).map(AArray(_))),
      2 -> Gen.lzy(genSchema(depth - 1).map(AMap(_))),
      2 -> Gen.lzy(genRecord(depth - 1)))

  private def genRecord(depth: Int): Gen[ARecord] = for {
    n <- Gen.choose(1, 5)
    fields <- Gen.sequence[Seq[AField], AField](
      (0 until n).map(i => genSchema(depth).map(s => AField(s"f$i", s))))
  } yield ARecord(freshName("R"), Some("prop.test"), fields)

  // ---- datum generator ----------------------------------------------------

  private val genUtf: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('é', '中', '\n', '"', '\\', ' '))).map(_.mkString)

  private def genDatum(s: AvroSchema): Gen[Any] = s match {
    case ANull     => Gen.const(null)
    case ABoolean  => Gen.oneOf(true, false)
    case AInt      => Gen.choose(Int.MinValue, Int.MaxValue)
    case ALong     => Gen.choose(Long.MinValue, Long.MaxValue)
    case AFloat    => Gen.oneOf(Gen.choose(-1e30, 1e30).map(_.toFloat), Gen.oneOf(0.0f, -0.0f, Float.MinPositiveValue))
    case ADouble   => Gen.oneOf(Gen.choose(-1e300, 1e300), Gen.oneOf(0.0, -0.0, Double.MinPositiveValue))
    case ABytes    => Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    case AString   => genUtf
    case e: AEnum  => Gen.oneOf(e.symbols)
    case f: AFixed => Gen.listOfN(f.size, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    case AArray(items) => Gen.resize(4, Gen.listOf(Gen.lzy(genDatum(items)))).map(_.toVector)
    case AMap(values) => for {
      n <- Gen.choose(0, 3)
      ks <- Gen.listOfN(n, Gen.identifier)
      vs <- Gen.sequence[Seq[Any], Any](ks.map(_ => Gen.lzy(genDatum(values))))
    } yield mutable.LinkedHashMap(ks.distinct.zip(vs).toSeq: _*)
    case u: AUnion => Gen.oneOf(u.branches).flatMap(b => Gen.lzy(genDatum(b)))
    case r: ARecord => Gen.sequence[Seq[Any], Any](r.fields.map(f => Gen.lzy(genDatum(f.schema))))
      .map(vs => AvroRecord(r, vs.toArray))
    case r: ARef => Gen.lzy(genDatum(r.target))
    case l: LogicalSchema => Gen.lzy(genDatum(l.underlying))
  }

  private val genSchemaAndDatum: Gen[(ARecord, AvroRecord)] = for {
    schema <- genRecord(2)
    datum <- genDatum(schema)
  } yield (schema, datum.asInstanceOf[AvroRecord])

  // ---- structural equality (Array[Byte]-aware; union branches untagged) ---

  private def deepEquals(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
    case (x: AvroRecord, y: AvroRecord) =>
      x.values.length == y.values.length &&
        x.values.zip(y.values).forall { case (u, v) => deepEquals(u, v) }
    case (x: scala.collection.Map[_, _], y: scala.collection.Map[_, _]) =>
      x.size == y.size && x.forall { case (k, v) =>
        y.asInstanceOf[scala.collection.Map[Any, Any]].get(k).exists(deepEquals(v, _)) }
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (u, v) => deepEquals(u, v) }
    case (x, y) => x == y
  }

  private def runProp(prop: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- properties ---------------------------------------------------------

  test("encode→decode round-trips any schema/datum pair (wire-format total)") {
    runProp(Prop.forAll(genSchemaAndDatum) { case (schema, datum) =>
      val bytes = new AvroDatumWriter(schema).toBytes(datum)
      val back = new AvroDatumReader(schema).read(bytes)
      deepEquals(datum, back)
    })
  }

  test("schema JSON round-trips through the parser with identical canonical form") {
    runProp(Prop.forAll(genRecord(2)) { schema =>
      val reparsed = AvroSchemaParser.parse(AvroSchemaParser.toJson(schema))
      reparsed.canonical == schema.canonical &&
        reparsed.fingerprint == schema.fingerprint
    })
  }

  test("reader projection: dropping any field decodes the rest unchanged") {
    val gen = for {
      (schema, datum) <- genSchemaAndDatum
      if schema.fields.length >= 2
      drop <- Gen.choose(0, schema.fields.length - 1)
    } yield (schema, datum, drop)
    runProp(Prop.forAll(gen) { case (schema, datum, drop) =>
      val reader = ARecord(schema.name, schema.namespace,
        schema.fields.zipWithIndex.collect { case (f, i) if i != drop => f })
      val bytes = new AvroDatumWriter(schema).toBytes(datum)
      val back = new AvroDatumReader(schema, Some(reader)).read(bytes).asInstanceOf[AvroRecord]
      val expected = datum.values.zipWithIndex.collect { case (v, i) if i != drop => v }
      back.values.length == expected.length &&
        back.values.zip(expected).forall { case (u, v) => deepEquals(u, v) }
    }, min = 100)
  }

  test("compatibility checker accepts identical random schemas") {
    runProp(Prop.forAll(genRecord(2)) { schema =>
      // parse twice so object identity differs (exercises structural path)
      val a = AvroSchemaParser.parse(AvroSchemaParser.toJson(schema))
      val b = AvroSchemaParser.parse(AvroSchemaParser.toJson(schema))
      Compatibility.check(a, b).isCompatible
    }, min = 100)
  }
}
