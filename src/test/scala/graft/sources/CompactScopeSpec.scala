package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scoped incremental compaction (X98): `CALL gco.system.compact(..,
  * where => <pred>, small_file_bytes => N, min_input_files => K)` rewrites
  * ONLY the selected data files — at 100 TB maintenance must be O(touched
  * partition), never O(table). Selection rides the table's own scan prune
  * stack (partition values, hidden transforms, stats, blooms), so an
  * identity-partition predicate is file-exact and a stats predicate is
  * conservative. Equality-delete files retire only when every file they
  * may burden is rewritten; kept ones never re-kill the compacted output
  * (its files commit with a newer seq). */
class CompactScopeSpec extends AnyFunSuite {

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft-cscope-wh").toFile

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-compact-scope-spec")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.gco", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gco.warehouse", warehouse.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gco.ns")
    s
  }

  private def fs = new Path(warehouse.getAbsolutePath)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def snapFiles(table: String) = {
    val root = new Path(warehouse.getAbsolutePath, s"ns/$table")
    OcfSnapshots.latest(fs, root).get.files
  }
  private def dataFiles(table: String) =
    snapFiles(table).filter(_.isData).map(f => f.path -> f.len).toMap

  test("where on an identity partition rewrites exactly that partition") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE gco.ns.cs1 (id BIGINT, v STRING, p STRING)
        |USING `graft-ocf` PARTITIONED BY (p)""".stripMargin)
    for (i <- 0 until 3)
      Seq.tabulate(50)(j => (i * 50L + j, s"a$i$j", "a"))
        .toDF("id", "v", "p").coalesce(1).writeTo("gco.ns.cs1").append()
    for (i <- 0 until 3)
      Seq.tabulate(50)(j => (1000 + i * 50L + j, s"b$i$j", "b"))
        .toDF("id", "v", "p").coalesce(1).writeTo("gco.ns.cs1").append()
    val before = dataFiles("cs1")
    assert(before.keys.count(_.startsWith("p=a/")) == 3)
    val res = spark.sql(
      "CALL gco.system.compact(table => 'ns.cs1', where => \"p = 'a'\")")
      .collect()(0)
    assert(res.getLong(0) == 3L, s"3 files in, got ${res.getLong(0)}")
    assert(res.getLong(1) == 1L, s"1 file out, got ${res.getLong(1)}")
    val after = dataFiles("cs1")
    // partition b byte-identical; partition a replaced by one file
    assert(after.filter(_._1.startsWith("p=b/")) ==
      before.filter(_._1.startsWith("p=b/")))
    assert(after.keys.count(_.startsWith("p=a/")) == 1)
    assert(spark.table("gco.ns.cs1").count() == 300L)
    assert(spark.table("gco.ns.cs1").where($"p" === "a")
      .agg(sum($"id")).as[Long].head() == (0L until 150L).sum)
  }

  test("small_file_bytes leaves already-big files untouched; " +
      "min_input_files gates churn") {
    import spark.implicits._
    spark.sql(
      "CREATE TABLE gco.ns.cs2 (id BIGINT, v STRING) USING `graft-ocf`")
    // one big file (10k rows), three small ones (10 rows each)
    spark.range(0, 10000).select($"id", concat(lit("v"), $"id").as("v"))
      .coalesce(1).writeTo("gco.ns.cs2").append()
    for (i <- 0 until 3)
      spark.range(20000 + i * 10L, 20000 + i * 10L + 10)
        .select($"id", lit(s"s$i").as("v"))
        .coalesce(1).writeTo("gco.ns.cs2").append()
    val before = dataFiles("cs2")
    val bigPath = before.maxBy(_._2)._1
    val threshold = before(bigPath) // strictly-smaller-than bound
    // min_input_files above the small-file count: provable no-op
    val vBefore = OcfSnapshots.latest(fs,
      new Path(warehouse.getAbsolutePath, "ns/cs2")).get.version
    val noop = spark.sql("CALL gco.system.compact(table => 'ns.cs2', " +
      s"small_file_bytes => $threshold, min_input_files => 5)").collect()(0)
    assert(noop.getLong(0) == 0L && noop.getLong(1) == 0L)
    assert(OcfSnapshots.latest(fs,
      new Path(warehouse.getAbsolutePath, "ns/cs2")).get.version == vBefore,
      "a gated no-op must not commit")
    val res = spark.sql("CALL gco.system.compact(table => 'ns.cs2', " +
      s"small_file_bytes => $threshold)").collect()(0)
    assert(res.getLong(0) == 3L && res.getLong(1) == 1L, res.toString)
    val after = dataFiles("cs2")
    assert(after(bigPath) == before(bigPath), "big file must survive as-is")
    assert(after.size == 2)
    assert(spark.table("gco.ns.cs2").count() == 10030L)
  }

  test("stats-column where selects only the admitted files") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE gco.ns.cs3 (id BIGINT, v STRING)
        |USING `graft-ocf` OPTIONS (statsColumns 'id')""".stripMargin)
    spark.range(0, 100).select($"id", lit("lo").as("v"))
      .coalesce(1).writeTo("gco.ns.cs3").append()
    spark.range(0, 100).select(($"id" + 100).as("id"), lit("lo2").as("v"))
      .coalesce(1).writeTo("gco.ns.cs3").append()
    spark.range(100000, 100100).select($"id", lit("hi").as("v"))
      .coalesce(1).writeTo("gco.ns.cs3").append()
    val before = dataFiles("cs3")
    val res = spark.sql(
      "CALL gco.system.compact(table => 'ns.cs3', where => 'id < 1000')")
      .collect()(0)
    assert(res.getLong(0) == 2L && res.getLong(1) == 1L, res.toString)
    val after = dataFiles("cs3")
    // the hi-range file is untouched: exactly one surviving path from before
    val survivors = before.keySet.intersect(after.keySet)
    assert(survivors.size == 1)
    assert(spark.table("gco.ns.cs3").count() == 300L)
    assert(spark.table("gco.ns.cs3").where($"id" >= 100000L).count() == 100L)
  }

  test("a partition-scoped compact keeps equality deletes that still " +
      "burden other partitions, and they retire once those compact too") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE gco.ns.cs4 (id BIGINT, v STRING, p STRING)
        |USING `graft-ocf` PARTITIONED BY (p)""".stripMargin)
    Seq.tabulate(100)(j => (j.toLong, "a", "a")).toDF("id", "v", "p")
      .coalesce(1).writeTo("gco.ns.cs4").append()
    Seq.tabulate(100)(j => (100L + j, "b", "b")).toDF("id", "v", "p")
      .coalesce(1).writeTo("gco.ns.cs4").append()
    // one upsert touching BOTH partitions
    Seq((10L, "A", "a"), (110L, "B", "b")).toDF("id", "v", "p")
      .writeTo("gco.ns.cs4").option("upsertKeys", "id").append()
    assert(snapFiles("cs4").exists(_.isEqualityDelete))
    spark.sql("CALL gco.system.compact(table => 'ns.cs4', where => \"p = 'a'\")")
    // partition b is still burdened: its delete state must survive
    assert(snapFiles("cs4").exists(_.isEqualityDelete),
      "equality delete still burdening partition b must be kept")
    assert(spark.table("gco.ns.cs4").count() == 200L)
    assert(spark.table("gco.ns.cs4").where($"id" === 10L)
      .select("v").as[String].head() == "A")
    assert(spark.table("gco.ns.cs4").where($"id" === 110L)
      .select("v").as[String].head() == "B")
    spark.sql("CALL gco.system.compact(table => 'ns.cs4', where => \"p = 'b'\")")
    assert(snapFiles("cs4").forall(!_.isEqualityDelete),
      "every burdened file rewritten: the delete file retires")
    assert(spark.table("gco.ns.cs4").count() == 200L)
    assert(spark.table("gco.ns.cs4").where($"id" === 110L)
      .select("v").as[String].head() == "B")
  }

  test("where conjunct with no file-level translation refuses loudly") {
    import spark.implicits._
    spark.sql(
      "CREATE TABLE gco.ns.cs5 (id BIGINT, v STRING) USING `graft-ocf`")
    spark.range(0, 10).select($"id", lit("x").as("v"))
      .writeTo("gco.ns.cs5").append()
    val e = intercept[Exception] {
      spark.sql(
        "CALL gco.system.compact(table => 'ns.cs5', where => 'id % 2 = 0')")
        .collect()
    }
    assert(e.getMessage.contains("no file-level translation"), e.getMessage)
  }
}
