package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Hash-bucketed tables (X69): `PARTITIONED BY (bucket(N, col))` through the
  * V2 catalog — write-side row clustering via the catalog's `bucket`
  * function, `_bucket=K/` layout, read-side bucket pruning on equality
  * predicates, and storage-partitioned (exchange-free) joins/aggregations
  * between co-bucketed tables. */
class OcfBucketSpec extends AnyFunSuite {

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft-bucket-wh").toFile

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-bucket-spec")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.gb", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gb.warehouse", warehouse.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gb.ns")
    s
  }

  /** Exchanges in the FINAL plan: materializes the frame first, then walks
    * through AQE wrappers (AdaptiveSparkPlanExec re-plans after execution;
    * QueryStageExec nodes hide their subtree from `collect`). A naive
    * `executedPlan.collect` sees zero exchanges under AQE no matter what —
    * a vacuously-passing assertion. */
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        count(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        count(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        count(r.child)
      case s: ShuffleExchangeExec => 1 + s.children.map(count).sum
      case other => other.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  // ---- hash primitive ------------------------------------------------------

  test("bucket hash: deterministic, in range, internal/external forms agree") {
    val n = 32
    (0L until 1000L).foreach { v =>
      val id = OcfBucket.idOf(OcfBucket.hashValue(java.lang.Long.valueOf(v), LongType), n)
      assert(id >= 0 && id < n)
      assert(id == OcfBucket.idOf(OcfBucket.hashValue(java.lang.Long.valueOf(v), LongType), n))
    }
    // a String filter literal and the row's UTF8String land identically
    val s = "doc-00042"
    assert(OcfBucket.hashValue(s, StringType) ==
      OcfBucket.hashValue(org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType))
    // a java.sql.Date literal and the internal Int day count land identically
    val d = java.sql.Date.valueOf("2024-06-01")
    val days = org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d)
    assert(OcfBucket.hashValue(d, DateType) ==
      OcfBucket.hashValue(java.lang.Integer.valueOf(days), DateType))
    // ids spread: 1000 sequential longs over 32 buckets hit most buckets
    val ids = (0L until 1000L).map(v =>
      OcfBucket.idOf(OcfBucket.hashValue(java.lang.Long.valueOf(v), LongType), n)).toSet
    assert(ids.size > n / 2, s"poor spread: ${ids.size} of $n buckets hit")
  }

  test("V2 bucket function binds and agrees with the writer-side hash") {
    val bound = GraftBucketFunction.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("k", LongType))))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](8, 12345L))
    val viaFn = bound.asInstanceOf[
      org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
      .produceResult(row)
    assert(viaFn ==
      OcfBucket.idOfValues(Array[Any](java.lang.Long.valueOf(12345L)),
        Array[DataType](LongType), 8))
  }

  // ---- DDL + layout --------------------------------------------------------

  test("bucketed CREATE/INSERT: _bucket layout, roundtrip, point-lookup pruning") {
    spark.sql(
      """CREATE TABLE gb.ns.docs (doc_id BIGINT, body STRING)
        |USING `graft-ocf` PARTITIONED BY (bucket(4, doc_id))
        |OPTIONS (reportPartitioning 'true')""".stripMargin)
    spark.sql(
      "INSERT INTO gb.ns.docs SELECT id, concat('b', id) FROM range(200)")

    // layout: every data file sits under a _bucket=K directory, all 4 present
    val dir = new java.io.File(warehouse, "ns/docs")
    val bucketDirs = dir.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("_bucket=")).sorted.toSeq
    assert(bucketDirs == Seq("_bucket=0", "_bucket=1", "_bucket=2", "_bucket=3"),
      s"expected 4 bucket dirs, got $bucketDirs")

    // roundtrip: contents and schema survive (bucket cols stay data columns)
    val back = spark.table("gb.ns.docs")
    assert(back.columns.toSeq == Seq("doc_id", "body"))
    assert(back.count() == 200L)
    assert(back.agg(org.apache.spark.sql.functions.sum("doc_id")).head.getLong(0)
      == (0L until 200L).sum)

    // point lookup prunes the listing to exactly the key's bucket
    val hit = spark.sql("SELECT body FROM gb.ns.docs WHERE doc_id = 42")
    assert(hit.collect().map(_.getString(0)).toSeq == Seq("b42"))
    val planned = OcfDataSource.lastPlannedFiles.get()
    val expectedBucket = OcfBucket.idOfValues(
      Array[Any](java.lang.Long.valueOf(42L)), Array[DataType](LongType), 4)
    assert(planned.nonEmpty &&
      planned.forall(_.contains(s"_bucket=$expectedBucket")),
      s"doc_id=42 must prune to _bucket=$expectedBucket; planned $planned")

    // IN-list prunes to the union of the keys' buckets
    spark.sql("SELECT body FROM gb.ns.docs WHERE doc_id IN (1, 2, 3)").collect()
    val inBuckets = Seq(1L, 2L, 3L).map(v => OcfBucket.idOfValues(
      Array[Any](java.lang.Long.valueOf(v)), Array[DataType](LongType), 4)).toSet
    val planned2 = OcfDataSource.lastPlannedFiles.get()
    assert(planned2.forall(p => inBuckets.exists(b => p.contains(s"_bucket=$b"))),
      s"IN (1,2,3) must plan only buckets $inBuckets; planned $planned2")

    // a range predicate cannot pin a bucket: nothing pruned, still correct
    assert(spark.sql("SELECT count(*) FROM gb.ns.docs WHERE doc_id < 50")
      .head.getLong(0) == 50L)
  }

  test("bucketed table surfaces its transform; bucket COLUMNS stay immutable") {
    val t = spark.sessionState.catalogManager.catalog("gb")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "docs"))
    val parts = t.partitioning().map(_.toString).toSeq
    assert(parts.exists(_.contains("bucket(4, doc_id)")),
      s"partitioning must carry the bucket transform, got $parts")
    // the COUNT evolves (X103, BucketEvolutionSpec); the COLUMNS and the
    // engine-managed genesis stamp do not
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gb.ns.docs SET TBLPROPERTIES " +
        "('bucketColumns' = 'body')")
    }
    assert(e.getMessage.contains("cannot be altered"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gb.ns.docs SET TBLPROPERTIES " +
        "('numBucketsGenesis' = '2')")
    }
    assert(e2.getMessage.contains("engine-managed"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE gb.ns.docs UNSET TBLPROPERTIES ('numBuckets')")
    }
    assert(e3.getMessage.contains("cannot be unset"), e3.getMessage)
  }

  test("bare path write with bucketColumns is refused (catalog-managed only)") {
    val out = java.nio.file.Files.createTempDirectory("graft-bucket-path").toFile
    val e = intercept[Exception] {
      spark.range(10).toDF("id")
        .write.format("graft-ocf").mode("overwrite")
        .option("bucketColumns", "id").option("numBuckets", "4")
        .save(out.getAbsolutePath + "/t")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => t.getMessage != null &&
        t.getMessage.contains("catalog table")), s"got: $e")
  }

  // ---- storage-partitioned execution --------------------------------------

  test("co-bucketed join and groupBy run exchange-free") {
    spark.sql(
      """CREATE TABLE gb.ns.docs_meta (doc_id BIGINT, score BIGINT)
        |USING `graft-ocf` PARTITIONED BY (bucket(4, doc_id))
        |OPTIONS (reportPartitioning 'true')""".stripMargin)
    spark.sql(
      "INSERT INTO gb.ns.docs_meta SELECT id, id * 7 FROM range(150)")

    val withSpj = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = withSpj.map { case (k, _) => k -> spark.conf.getOption(k) }
    withSpj.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.sql(
        """SELECT d.doc_id, d.body, m.score
          |FROM gb.ns.docs d JOIN gb.ns.docs_meta m ON d.doc_id = m.doc_id""".stripMargin)
      assert(joined.count() == 150L)
      assert(shuffles(joined) == 0,
        s"co-bucketed join must be exchange-free:\n${joined.queryExecution.executedPlan}")
      // spot-check values through the join
      val r = joined.filter("doc_id = 21").head
      assert(r.getString(1) == "b21" && r.getLong(2) == 147L)

      val agg = spark.sql(
        "SELECT doc_id, count(*) AS c FROM gb.ns.docs GROUP BY doc_id")
      assert(agg.count() == 200L)
      assert(shuffles(agg) == 0,
        s"groupBy on the bucket column must be exchange-free:\n${agg.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("unbucketed side shuffles INTO the bucketed layout (one exchange, not two)") {
    // spark.sql.sources.v2.bucketing.shuffle.enabled routes the small side
    // through OUR catalog-registered bucket function — if its hash disagreed
    // with the writer's, matching rows would land in different partitions
    // and the join would silently LOSE rows, so the row-count assertion is
    // an end-to-end hash-consistency proof, not just a plan check
    val withSpj = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = withSpj.map { case (k, _) => k -> spark.conf.getOption(k) }
    withSpj.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      spark.range(0, 200).selectExpr("id AS doc_id", "id * 3 AS w")
        .createOrReplaceTempView("plain_side")
      val joined = spark.sql(
        """SELECT d.doc_id, d.body, p.w
          |FROM gb.ns.docs d JOIN plain_side p ON d.doc_id = p.doc_id""".stripMargin)
      assert(joined.count() == 200L,
        "every row must match — a hash mismatch between the catalog bucket " +
          "function and the written layout would drop rows here")
      assert(shuffles(joined) == 1,
        s"only the unbucketed side may shuffle:\n${joined.queryExecution.executedPlan}")
      val r = joined.filter("doc_id = 33").head
      assert(r.getString(1) == "b33" && r.getLong(2) == 99L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-bucketed SORTED tables join with zero exchanges AND zero sorts") {
    // bucket(4, k) + sortColumns=k: the write clusters by bucket and sorts
    // within, each bucket lands as ONE sort-stamped file, and the scan
    // reports both the key grouping and (single-split-per-key) the
    // per-partition ordering — the SMJ needs nothing from the engine
    Seq("a", "b").foreach { t =>
      spark.sql(
        s"""CREATE TABLE gb.ns.sorted_$t (k BIGINT, v_$t STRING)
           |USING `graft-ocf` PARTITIONED BY (bucket(4, k))
           |OPTIONS (reportPartitioning 'true', sortColumns 'k')""".stripMargin)
      spark.sql(
        s"INSERT INTO gb.ns.sorted_$t SELECT id, concat('$t', id) FROM range(120)")
    }
    val withSpj = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = withSpj.map { case (k, _) => k -> spark.conf.getOption(k) }
    withSpj.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.sql(
        """SELECT /*+ MERGE(b) */ a.k, a.v_a, b.v_b
          |FROM gb.ns.sorted_a a JOIN gb.ns.sorted_b b ON a.k = b.k""".stripMargin)
      assert(joined.count() == 120L)
      assert(shuffles(joined) == 0,
        s"no exchange expected:\n${joined.queryExecution.executedPlan}")
      joined.collect()
      def sorts(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          sorts(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => sorts(q.plan)
        case s: org.apache.spark.sql.execution.SortExec => 1 + s.children.map(sorts).sum
        case other => other.children.map(sorts).sum
      }
      assert(sorts(joined.queryExecution.executedPlan) == 0,
        s"no sort expected (verified stamps + one split per bucket):\n${joined.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucket + identity partitions compose: layout, pruning, dynamic overwrite") {
    spark.sql(
      """CREATE TABLE gb.ns.events (ev_id BIGINT, payload STRING, day STRING)
        |USING `graft-ocf` PARTITIONED BY (day, bucket(4, ev_id))""".stripMargin)
    spark.sql(
      """INSERT INTO gb.ns.events
        |SELECT id, concat('p', id), CASE WHEN id < 50 THEN 'd1' ELSE 'd2' END
        |FROM range(100)""".stripMargin)
    assert(spark.table("gb.ns.events").count() == 100L)

    // layout: day=…/_bucket=K/
    val d1 = new java.io.File(warehouse, "ns/events/day=d1")
    assert(d1.listFiles().filter(_.isDirectory)
      .forall(_.getName.startsWith("_bucket=")))

    // partition + bucket predicates prune multiplicatively
    spark.sql(
      "SELECT payload FROM gb.ns.events WHERE day = 'd1' AND ev_id = 7").collect()
    val b7 = OcfBucket.idOfValues(
      Array[Any](java.lang.Long.valueOf(7L)), Array[DataType](LongType), 4)
    val planned = OcfDataSource.lastPlannedFiles.get()
    assert(planned.nonEmpty && planned.forall(p =>
      p.contains("day=d1") && p.contains(s"_bucket=$b7")),
      s"day+key lookup must prune to one bucket of one day; planned $planned")

    // dynamic partition overwrite replaces the WHOLE partition — including
    // buckets the new data does not touch
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql(
        "INSERT OVERWRITE TABLE gb.ns.events SELECT id, concat('q', id), 'd1' FROM range(3)")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val after = spark.table("gb.ns.events")
    assert(after.filter("day = 'd1'").count() == 3L,
      "dynamic overwrite must replace every bucket of day=d1")
    assert(after.filter("day = 'd2'").count() == 50L,
      "untouched partition must survive")
  }

  test("compaction preserves the bucket layout") {
    spark.sql("CALL gb.system.compact(`table` => 'ns.docs_meta')")
    val back = spark.table("gb.ns.docs_meta")
    assert(back.count() == 150L)
    val dir = new java.io.File(warehouse, "ns/docs_meta")
    val bucketDirs = dir.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("_bucket=")).toSeq
    assert(bucketDirs.nonEmpty, "compaction must keep _bucket directories")
    // pruning still works post-compaction
    spark.sql("SELECT score FROM gb.ns.docs_meta WHERE doc_id = 42").collect()
    val b = OcfBucket.idOfValues(
      Array[Any](java.lang.Long.valueOf(42L)), Array[DataType](LongType), 4)
    val planned = OcfDataSource.lastPlannedFiles.get()
    assert(planned.nonEmpty && planned.forall(_.contains(s"_bucket=$b")),
      s"post-compaction lookup must still prune; planned $planned")
  }
}
