package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver harness contract itself: a typo'd oracle key or a
  * broken flagship would silently cost correctness rows at round end. */
class DriverContractSpec extends AnyFunSuite {

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("every declared query has an oracle (or is on the declared exception list)") {
    // the driver records a weaker rows-only check for these — each needs a
    // spec-pinned reason, never an accident:
    //  - q105: greedy byte-level BPE is not SQL-expressible; BpeSpec pins
    //    the counts with hand-derived fixtures and a byte-lossless property
    val declaredOracleLess = Set("q105_bpe_packing")
    assert(declaredOracleLess.subsetOf(SparkEntry.queries.keySet),
      "stale exception list")
    assert(declaredOracleLess.intersect(SparkEntry.oracleSql.keySet).isEmpty,
      "exception list entries that DO have oracles")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      declaredOracleLess
    assert(missing.isEmpty, s"queries lacking an oracle: $missing")
  }

  test("the flagship entry() returns rows on sf0.001 (driver smoke contract)") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-contract-spec")
      .getOrCreate()
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle SQL contains no unescaped control characters that would break JSON dumping") {
    // Verify.q() escapes them, but flag early if an oracle picks up e.g. a
    // raw tab that makes diffs confusing
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\r"), s"$name oracle contains a carriage return")
    }
  }
}
