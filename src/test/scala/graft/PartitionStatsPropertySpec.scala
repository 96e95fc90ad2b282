package graft

import graft.sources.{OcfBloom, OcfPartitions}
import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over the partition-layout and stats-skipping layer: path
  * escaping round-trips arbitrary values, partition-directory encode/parse is
  * an identity, and the conservative filter evaluator NEVER refutes a file
  * that contains a matching row (soundness — the only property that matters:
  * over-keeping costs I/O, over-skipping loses rows). */
class PartitionStatsPropertySpec extends AnyFunSuite {

  private def runProp(prop: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, res.status.toString)
  }

  private val genValue: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf('a', '/', '=', '%', '#', ':', ' ', 'é')).map(_.mkString))

  test("path escaping round-trips every value and never emits separators") {
    runProp(Prop.forAll(genValue) { v =>
      val e = OcfPartitions.escape(v)
      OcfPartitions.unescape(e) == v && !e.contains('/') && !e.contains('=')
    })
  }

  test("partitionDir encodes what infer parses back (identity through paths)") {
    val gen = for {
      n <- Gen.choose(1, 3)
      names <- Gen.listOfN(n, Gen.identifier.suchThat(_.nonEmpty)).map(_.zipWithIndex.map {
        case (s, i) => s.take(8) + i  // unique column names
      })
      values <- Gen.listOfN(n, Gen.option(genValue))
    } yield (names.toArray, values.map(_.orNull).toArray)
    runProp(Prop.forAll(gen) { case (names, values) =>
      val rel = OcfPartitions.partitionDir(names, values)
      val root = "/data/t"
      val slice = graft.sources.OcfDataSource.FileSlice(s"$root/$rel/part-0.avro", 1L)
      val (cols, files) = OcfPartitions.infer(Seq(root), Seq(slice))
      cols == names.toSeq && files.head.partitionValues.toSeq == values.toSeq
    })
  }

  /** Brute-force soundness: generate a small long column, stamp its true
    * min/max the way the tracker does, generate a random simple filter, and
    * check that whenever ANY value in the file satisfies the filter, the
    * evaluator keeps the file. */
  test("stats skipping is sound: a file with a matching row is never refuted") {
    val genVals = Gen.nonEmptyListOf(Gen.choose(-50L, 50L))
    val genFilter: Gen[Filter] = for {
      v <- Gen.choose(-60L, 60L)
      f <- Gen.oneOf[Filter](EqualTo("x", v), GreaterThan("x", v),
        GreaterThanOrEqual("x", v), LessThan("x", v), LessThanOrEqual("x", v),
        In("x", Array[Any](v, v + 3)), IsNotNull("x"),
        Not(EqualTo("x", v)), Or(LessThan("x", v), GreaterThan("x", v + 5)),
        And(GreaterThanOrEqual("x", v), LessThanOrEqual("x", v + 10)))
    } yield f
    def evalRow(f: Filter, x: Long): Boolean = f match {
      case EqualTo("x", v) => x == v.asInstanceOf[Long]
      case GreaterThan("x", v) => x > v.asInstanceOf[Long]
      case GreaterThanOrEqual("x", v) => x >= v.asInstanceOf[Long]
      case LessThan("x", v) => x < v.asInstanceOf[Long]
      case LessThanOrEqual("x", v) => x <= v.asInstanceOf[Long]
      case In("x", vs) => vs.exists(_.asInstanceOf[Long] == x)
      case IsNotNull("x") => true
      case Not(g) => !evalRow(g, x)
      case Or(l, r) => evalRow(l, x) || evalRow(r, x)
      case And(l, r) => evalRow(l, x) && evalRow(r, x)
      case _ => true
    }
    runProp(Prop.forAll(genVals, genFilter) { (vals, filter) =>
      val json = s"""{"x":{"t":"long","min":${vals.min},"max":${vals.max},"hasNull":false,"allNull":false}}"""
      val stats = OcfPartitions.parseStats(json)
      val kept = OcfPartitions.mayMatch(Seq(filter), _ => None, stats.get)
      val anyRowMatches = vals.exists(evalRow(filter, _))
      // soundness: matching row somewhere in the file ⇒ file kept
      !anyRowMatches || kept
    }, min = 500)
  }

  test("bloom skipping is sound: a filter built from values never refutes them") {
    val genVals = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val genStrs = Gen.nonEmptyListOf(genValue)
    val genFpp = Gen.oneOf(0.001, 0.01, 0.1, 0.3)
    runProp(Prop.forAll(genVals, genFpp) { (vs, fpp) =>
      val hashes = vs.map(OcfBloom.hashLong).toArray
      val b = OcfBloom.build("long", hashes, hashes.length, fpp)
      val blooms: String => Option[OcfBloom.BloomLite] =
        n => if (n == "c") Some(b) else None
      // every inserted value must survive EqualTo and In probes — and so
      // must the filter after a JSON round-trip (what the header stores)
      val parsed = OcfBloom.parse(OcfBloom.toJson(Seq("c" -> b)))("c")
      vs.forall { v =>
        OcfBloom.mayMatch(Seq(EqualTo("c", v)), blooms) &&
          OcfBloom.mayMatch(Seq(In("c", Array[Any](v))), blooms) &&
          parsed.mightContain(OcfBloom.hashLong(v))
      }
    })
    runProp(Prop.forAll(genStrs, genFpp) { (vs, fpp) =>
      val hashes = vs.map(s => OcfBloom.hashUtf8(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))).toArray
      val b = OcfBloom.build("string", hashes, hashes.length, fpp)
      val parsed = OcfBloom.parse(OcfBloom.toJson(Seq("s" -> b)))("s")
      vs.forall { v =>
        OcfBloom.mayMatch(Seq(EqualTo("s", v)), n => Some(b)) &&
          parsed.mightContain(OcfBloom.hashUtf8(
            org.apache.spark.unsafe.types.UTF8String.fromString(v)))
      }
    })
    // conservative on everything a bloom cannot answer
    val b0 = OcfBloom.build("long", Array(OcfBloom.hashLong(1L)), 1, 0.01)
    val lk: String => Option[OcfBloom.BloomLite] = _ => Some(b0)
    assert(OcfBloom.mayMatch(Seq(GreaterThan("c", 0L)), lk))
    assert(OcfBloom.mayMatch(Seq(IsNull("c")), lk))
    assert(OcfBloom.mayMatch(Seq(Not(EqualTo("c", 99L))), lk))
    assert(OcfBloom.mayMatch(Seq(EqualTo("c", "wrong-type")), lk))
    assert(OcfBloom.mayMatch(Seq(EqualTo("other", 99L)), n => None))
    // Or keeps the file when EITHER side might match
    assert(OcfBloom.mayMatch(Seq(Or(EqualTo("c", 99L), EqualTo("c", 1L))), lk))
  }

  test("blockAlignedRanges: coalescing, chunking, and stale-index fallback") {
    import graft.sources.{OcfDataSource, OcfScan}
    val he = 100L // header end
    def entry(o: Long, l: Long, mn: Long, mx: Long): String =
      s"""{"o":$o,"n":10,"l":$l,"s":{"id":{"t":"long","min":$mn,"max":$mx,""" +
        s""""hasNull":false,"allNull":false}}}"""
    def meta(entries: Seq[String], len: Long) =
      OcfDataSource.OcfFileMeta("f", len, "{}", "null", new Array[Byte](16), he,
        blockIndexJson = Some(entries.mkString("[", ",", "]")))
    // 4 contiguous 100-byte blocks: id ranges [0,99],[100,199],[200,299],[300,399]
    val tiles = Seq(entry(0, 100, 0, 99), entry(100, 100, 100, 199),
      entry(200, 100, 200, 299), entry(300, 100, 300, 399))
    val m = meta(tiles, he + 400)

    // adjacent matches coalesce into ONE range
    assert(OcfScan.blockAlignedRanges(m, Seq(GreaterThanOrEqual("id", 250L)), 1L << 20)
      .contains(Seq((he + 200, he + 400))))
    // disjoint matches stay separate ranges
    assert(OcfScan.blockAlignedRanges(m, Seq(In("id", Array[Any](50L, 250L))), 1L << 20)
      .contains(Seq((he + 0, he + 100), (he + 200, he + 300))))
    // nothing matches -> zero ranges (file contributes no splits)
    assert(OcfScan.blockAlignedRanges(m, Seq(GreaterThan("id", 9999L)), 1L << 20)
      .contains(Seq.empty))
    // no filters -> whole file, chunked at splitSize on block boundaries
    assert(OcfScan.blockAlignedRanges(m, Nil, 150L)
      .contains(Seq((he + 0, he + 100), (he + 100, he + 200),
        (he + 200, he + 300), (he + 300, he + 400))))
    assert(OcfScan.blockAlignedRanges(m, Nil, 200L)
      .contains(Seq((he + 0, he + 200), (he + 200, he + 400))))
    // a stale/foreign index must fall back, never drop data:
    // gap between entries
    assert(OcfScan.blockAlignedRanges(
      meta(Seq(entry(0, 100, 0, 99), entry(150, 100, 100, 199)), he + 250), Nil, 1L).isEmpty)
    // doesn't tile to the file end
    assert(OcfScan.blockAlignedRanges(meta(tiles, he + 401), Nil, 1L).isEmpty)
    // first block not at relative 0
    assert(OcfScan.blockAlignedRanges(
      meta(Seq(entry(10, 100, 0, 99)), he + 110), Nil, 1L).isEmpty)
    // unparsable JSON
    assert(OcfScan.blockAlignedRanges(
      m.copy(blockIndexJson = Some("{not json")), Nil, 1L).isEmpty)
    // absent index
    assert(OcfScan.blockAlignedRanges(m.copy(blockIndexJson = None), Nil, 1L).isEmpty)
  }

  test("partition-value filters evaluate exactly (keep iff the value matches)") {
    // "𐍈" (U+10348) sits ABOVE the BMP: Java String.compareTo
    // (UTF-16 units) and Spark's UTF8String order DISAGREE between it and
    // "￿" — the exact evaluation must follow Spark's order
    def u8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    val genV: Gen[String] = Gen.oneOf("a", "b", "", "a/b", "é", "￿", "𐍈")
    val genF: Gen[String => Filter] = Gen.oneOf(
      (v: String) => EqualTo("p", v),
      (v: String) => Not(EqualTo("p", v)),
      (v: String) => In("p", Array[Any](v, "zzz")),
      (v: String) => StringStartsWith("p", v.take(1)),
      (v: String) => GreaterThan("p", v),
      (v: String) => LessThanOrEqual("p", v),
      (_: String) => IsNull("p"),
      (_: String) => IsNotNull("p"))
    runProp(Prop.forAll(genV, genV, genF) { (fileVal, filterVal, mk) =>
      val f = mk(filterVal)
      def evalExact(f: Filter): Boolean = f match {
        case EqualTo("p", v) => fileVal == v
        case Not(g) => !evalExact(g)
        case In("p", vs) => vs.contains(fileVal)
        case StringStartsWith("p", pre) => u8(fileVal).startsWith(u8(pre))
        case GreaterThan("p", v) => u8(fileVal).compareTo(u8(String.valueOf(v))) > 0
        case LessThanOrEqual("p", v) => u8(fileVal).compareTo(u8(String.valueOf(v))) <= 0
        case IsNull("p") => false // fileVal non-null here
        case IsNotNull("p") => true
        case _ => true
      }
      OcfPartitions.mayMatch(Seq(f),
        n => if (n == "p")
          Some(OcfPartitions.PartVal(fileVal, org.apache.spark.sql.types.StringType))
        else None,
        _ => None) == evalExact(f)
    })
    // the shapes the builder may CONSUME are exactly the definite ones
    val isP: String => Option[org.apache.spark.sql.types.DataType] =
      n => if (n == "p") Some(org.apache.spark.sql.types.StringType) else None
    assert(OcfPartitions.exactOnPartitions(EqualTo("p", "x"), isP))
    assert(OcfPartitions.exactOnPartitions(
      And(In("p", Array[Any]("a", "b")), Not(IsNull("p"))), isP))
    assert(OcfPartitions.exactOnPartitions(GreaterThan("p", "x"), isP))
    assert(!OcfPartitions.exactOnPartitions(EqualTo("data", "x"), isP))
    assert(!OcfPartitions.exactOnPartitions(EqualTo("p", null), isP))
    assert(!OcfPartitions.exactOnPartitions(In("p", Array[Any]("a", null)), isP))
    assert(!OcfPartitions.exactOnPartitions(
      And(EqualTo("p", "x"), EqualTo("data", "y")), isP))
    assert(!OcfPartitions.exactOnPartitions(StringEndsWith("p", "x"), isP))
  }
}
