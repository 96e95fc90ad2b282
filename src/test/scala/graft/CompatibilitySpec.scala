package graft

import graft.avro._
import graft.avro.Compatibility._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference checker's semantics
  * (reference: python-udf/avro/compatibility.py:57-395): typed results,
  * promotions, enum/union/record evolution, recursive schemas. */
class CompatibilitySpec extends AnyFunSuite {

  private def s(json: String): AvroSchema = AvroSchemaParser.parse(json)

  private def kinds(r: Result): Seq[Kind] = r.incompatibilities.map(_.kind)

  test("identical primitives are compatible; mismatches are typed") {
    for (t <- Seq("\"null\"", "\"boolean\"", "\"int\"", "\"long\"", "\"float\"",
                  "\"double\"", "\"bytes\"", "\"string\""))
      assert(check(s(t), s(t)).isCompatible)
    val r = check(s("\"int\""), s("\"long\"")) // no demotion
    assert(kinds(r) == Seq(TypeMismatch))
    assert(r.incompatibilities.head.location == "/")
  }

  test("reader-side numeric and string/bytes promotions") {
    assert(check(s("\"long\""), s("\"int\"")).isCompatible)
    assert(check(s("\"float\""), s("\"int\"")).isCompatible)
    assert(check(s("\"float\""), s("\"long\"")).isCompatible)
    assert(check(s("\"double\""), s("\"int\"")).isCompatible)
    assert(check(s("\"double\""), s("\"long\"")).isCompatible)
    assert(check(s("\"double\""), s("\"float\"")).isCompatible)
    assert(check(s("\"string\""), s("\"bytes\"")).isCompatible)
    assert(check(s("\"bytes\""), s("\"string\"")).isCompatible)
    assert(!check(s("\"float\""), s("\"double\"")).isCompatible) // no demotion
    assert(!check(s("\"long\""), s("\"float\"")).isCompatible)
  }

  test("array/map recurse into element types with located results") {
    assert(check(s("""{"type":"array","items":"long"}"""),
                 s("""{"type":"array","items":"int"}""")).isCompatible)
    val r = check(s("""{"type":"array","items":"int"}"""),
                  s("""{"type":"array","items":"string"}"""))
    assert(kinds(r) == Seq(TypeMismatch))
    assert(r.incompatibilities.head.location == "/items")
    val m = check(s("""{"type":"map","values":"int"}"""),
                  s("""{"type":"map","values":"string"}"""))
    assert(m.incompatibilities.head.location == "/values")
  }

  test("fixed: name and size must match") {
    val f8a = """{"type":"fixed","name":"F","size":8}"""
    val f8b = """{"type":"fixed","name":"F","size":8}"""
    val f4  = """{"type":"fixed","name":"F","size":4}"""
    val g8  = """{"type":"fixed","name":"G","size":8}"""
    assert(check(s(f8a), s(f8b)).isCompatible)
    assert(kinds(check(s(f4), s(f8a))) == Seq(FixedSizeMismatch))
    assert(kinds(check(s(g8), s(f8a))) == Seq(NameMismatch))
    // reader alias names the writer type
    val aliased = """{"type":"fixed","name":"G","size":8,"aliases":["F"]}"""
    assert(check(s(aliased), s(f8a)).isCompatible)
  }

  test("enum: removed writer symbols are incompatible unless reader has a default") {
    val w = """{"type":"enum","name":"E","symbols":["A","B","C"]}"""
    val rMissing = """{"type":"enum","name":"E","symbols":["A","B"]}"""
    val rDefault = """{"type":"enum","name":"E","symbols":["A","B"],"default":"A"}"""
    val rSuper = """{"type":"enum","name":"E","symbols":["A","B","C","D"]}"""
    assert(check(s(rSuper), s(w)).isCompatible)
    val r = check(s(rMissing), s(w))
    assert(kinds(r) == Seq(MissingEnumSymbols))
    assert(r.incompatibilities.head.location == "/symbols")
    assert(check(s(rDefault), s(w)).isCompatible)
  }

  test("record: field projection, defaults, and typed missing-default errors") {
    val writer =
      """{"type":"record","name":"R","fields":[
        |{"name":"a","type":"int"},{"name":"b","type":"string"}]}""".stripMargin
    // reader drops b: fine (projection)
    assert(check(s("""{"type":"record","name":"R","fields":[{"name":"a","type":"int"}]}"""),
                 s(writer)).isCompatible)
    // reader adds c with default: fine
    assert(check(s("""{"type":"record","name":"R","fields":[
        |{"name":"a","type":"int"},{"name":"c","type":"int","default":7}]}""".stripMargin),
      s(writer)).isCompatible)
    // reader adds c without default: typed error at the field location
    val r = check(s("""{"type":"record","name":"R","fields":[
        |{"name":"a","type":"int"},{"name":"c","type":"int"}]}""".stripMargin),
      s(writer))
    assert(kinds(r) == Seq(ReaderFieldMissingDefaultValue))
    assert(r.incompatibilities.head.message == "c")
    assert(r.incompatibilities.head.location == "/fields/1")
    // promotion inside a field
    assert(check(s("""{"type":"record","name":"R","fields":[{"name":"a","type":"long"}]}"""),
                 s(writer)).isCompatible)
    // reader-field alias finds the renamed writer field
    assert(check(s("""{"type":"record","name":"R","fields":[
        |{"name":"a2","type":"int","aliases":["a"]}]}""".stripMargin),
      s(writer)).isCompatible)
  }

  test("record name mismatch is reported alongside field results") {
    val writer = """{"type":"record","name":"W","fields":[{"name":"a","type":"int"}]}"""
    val reader = """{"type":"record","name":"R","fields":[{"name":"z","type":"int"}]}"""
    val r = check(s(reader), s(writer))
    assert(kinds(r).toSet == Set(NameMismatch, ReaderFieldMissingDefaultValue))
  }

  test("union evolution") {
    // reader widens to a union: compatible
    assert(check(s("""["null","int"]"""), s("\"int\"")).isCompatible)
    // writer union vs plain reader: all branches must be readable
    val r1 = check(s("\"int\""), s("""["null","int"]"""))
    assert(kinds(r1) == Seq(TypeMismatch)) // null branch unreadable by int reader
    // reader union lacking a writer branch
    val r2 = check(s("""["null","int"]"""), s("""["null","int","string"]"""))
    assert(kinds(r2) == Seq(MissingUnionBranch))
    assert(r2.incompatibilities.head.message.contains("STRING"))
    // both unions, reordered branches: compatible
    assert(check(s("""["string","int","null"]"""), s("""["null","int","string"]""")).isCompatible)
    // promotion across union branches
    assert(check(s("""["null","long"]"""), s("""["null","int"]""")).isCompatible)
  }

  test("recursive schemas terminate and compare structurally") {
    val list =
      """{"type":"record","name":"Node","fields":[
        |{"name":"value","type":"int"},
        |{"name":"next","type":["null","Node"]}]}""".stripMargin
    assert(check(s(list), s(list.replace("Node", "Node"))).isCompatible)
    // same shape but incompatible leaf type deep in the cycle
    val listStr = list.replace("\"value\",\"type\":\"int\"", "\"value\",\"type\":\"string\"")
    val r = check(s(list), s(listStr))
    assert(kinds(r).nonEmpty)
    assert(kinds(r).forall(_ == TypeMismatch))
  }

  test("memoized mismatches are rebased per occurrence, not frozen at first path") {
    // two int→string mismatches share the singleton (AInt, AString) memo
    // entry; each must still report its OWN field location
    val r = check(
      s("""{"type":"record","name":"R","fields":[
          |{"name":"a","type":"int"},{"name":"b","type":"int"}]}""".stripMargin),
      s("""{"type":"record","name":"R","fields":[
          |{"name":"a","type":"string"},{"name":"b","type":"string"}]}""".stripMargin))
    assert(kinds(r) == Seq(TypeMismatch, TypeMismatch))
    assert(r.incompatibilities.map(_.location) == Seq("/fields/0/type", "/fields/1/type"))
  }

  test("checker instance memoizes across checks (registry pattern)") {
    val checker = new Checker
    val a = s("""{"type":"record","name":"R","fields":[{"name":"a","type":"int"}]}""")
    val b = s("""{"type":"record","name":"R","fields":[{"name":"a","type":"int"}]}""")
    assert(checker.check(a, b).isCompatible)
    assert(checker.check(a, b).isCompatible) // memo hit, same result
  }

  test("logical types compare by physical type") {
    assert(check(s("""{"type":"long","logicalType":"timestamp-micros"}"""),
                 s("\"long\"")).isCompatible)
    assert(check(s("\"long\""),
                 s("""{"type":"long","logicalType":"timestamp-micros"}""")).isCompatible)
    assert(check(s("""{"type":"bytes","logicalType":"decimal","precision":10,"scale":2}"""),
                 s("\"bytes\"")).isCompatible)
  }
}
