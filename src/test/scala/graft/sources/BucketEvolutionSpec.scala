package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Bucket-count evolution (X103): `ALTER TABLE ... SET TBLPROPERTIES
  * ('numBuckets'='N')` re-routes future writes under the new modulus with
  * ERA-STAMPED levels (`_bucketN=K`); old files stay under their own era
  * and prune under their own modulus. Storage-partitioned reporting is
  * withheld while eras are mixed and returns once compaction unifies. */
class BucketEvolutionSpec extends AnyFunSuite {

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft-bev-wh").toFile

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-bucket-evolution-spec")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.gbe", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gbe.warehouse", warehouse.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gbe.ns")
    s
  }

  private def planned(): Seq[String] = OcfDataSource.lastPlannedFiles.get()
  private def id4(v: Long): Int = OcfBucket.idOfValues(
    Array[Any](java.lang.Long.valueOf(v)), Array[DataType](LongType), 4)
  private def id8(v: Long): Int = OcfBucket.idOfValues(
    Array[Any](java.lang.Long.valueOf(v)), Array[DataType](LongType), 8)
  private def shuffles(df: DataFrame): Int = {
    df.collect()
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
  }
  private def visibleData(t: String): Seq[String] = {
    val root = new Path(warehouse.getAbsolutePath, s"ns/$t")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    OcfSnapshots.latest(fs, root).get.files.filter(_.isData).map(_.path)
  }

  test("numBuckets ALTER: era-stamped levels, exact reads across eras, " +
      "per-era point-lookup pruning") {
    spark.sql(
      """CREATE TABLE gbe.ns.ev (id BIGINT, v STRING)
        |USING `graft-ocf` PARTITIONED BY (bucket(4, id))""".stripMargin)
    spark.sql("INSERT INTO gbe.ns.ev SELECT id, concat('a', id) FROM range(100)")
    spark.sql("ALTER TABLE gbe.ns.ev SET TBLPROPERTIES ('numBuckets'='8')")
    // descriptor: current count evolved, genesis stamped once
    val props = spark.sessionState.catalogManager.catalog("gbe")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "ev")).properties()
    assert(props.get("numBuckets") == "8")
    assert(props.get("numBucketsGenesis") == "4")
    spark.sql("INSERT INTO gbe.ns.ev SELECT id, concat('b', id) FROM range(100, 200)")

    // new-era files land ERA-STAMPED; old-era files keep their bare level
    val vis = visibleData("ev")
    assert(vis.exists(_.startsWith("_bucket=")), vis.mkString(", "))
    assert(vis.exists(_.startsWith("_bucket8=")), vis.mkString(", "))
    assert(vis.forall(p => p.startsWith("_bucket=") || p.startsWith("_bucket8=")))

    // exact reads across both eras
    import spark.implicits._
    assert(spark.table("gbe.ns.ev").count() == 200L)
    assert(spark.table("gbe.ns.ev").where($"id" === 42L)
      .select("v").as[String].collect().toSeq == Seq("a42"))
    assert(spark.table("gbe.ns.ev").where($"id" === 142L)
      .select("v").as[String].collect().toSeq == Seq("b142"))

    // per-ERA point-lookup pruning: every planned file sits in the bucket
    // the key hashes to UNDER THAT FILE'S OWN ERA
    def checkPruned(key: Long): Unit = {
      spark.table("gbe.ns.ev").where($"id" === key).collect()
      val p = planned()
      assert(p.nonEmpty)
      assert(p.forall(f =>
        f.contains(s"_bucket=${id4(key)}/") || f.contains(s"_bucket8=${id8(key)}/")),
        s"key $key: old era must prune to _bucket=${id4(key)}, new era to " +
          s"_bucket8=${id8(key)}; planned $p")
    }
    checkPruned(42L)
    checkPruned(142L)

    // second evolution: genesis stays the FIRST pre-evolution count
    spark.sql("ALTER TABLE gbe.ns.ev SET TBLPROPERTIES ('numBuckets'='16')")
    val props2 = spark.sessionState.catalogManager.catalog("gbe")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "ev")).properties()
    assert(props2.get("numBuckets") == "16")
    assert(props2.get("numBucketsGenesis") == "4")
    spark.sql("INSERT INTO gbe.ns.ev SELECT id, concat('c', id) FROM range(200, 220)")
    assert(spark.table("gbe.ns.ev").count() == 220L)
    assert(visibleData("ev").exists(_.startsWith("_bucket16=")))
    // three eras, all pruning under their own moduli
    spark.table("gbe.ns.ev").where($"id" === 205L).collect()
    assert(planned().forall(f => !f.startsWith("_bucket16=") ||
      f.contains(s"_bucket16=${OcfBucket.idOfValues(
        Array[Any](java.lang.Long.valueOf(205L)), Array[DataType](LongType), 16)}/")))
  }

  test("SPJ withheld on mixed eras; compact unifies to the current era and " +
      "restores exchange-free joins") {
    spark.sql(
      """CREATE TABLE gbe.ns.sj (id BIGINT, v STRING)
        |USING `graft-ocf` PARTITIONED BY (bucket(4, id))
        |OPTIONS (reportPartitioning 'true')""".stripMargin)
    spark.sql(
      """CREATE TABLE gbe.ns.sjm (id BIGINT, w BIGINT)
        |USING `graft-ocf` PARTITIONED BY (bucket(8, id))
        |OPTIONS (reportPartitioning 'true')""".stripMargin)
    spark.sql("INSERT INTO gbe.ns.sj SELECT id, concat('x', id) FROM range(120)")
    spark.sql("INSERT INTO gbe.ns.sjm SELECT id, id * 5 FROM range(120)")
    spark.sql("ALTER TABLE gbe.ns.sj SET TBLPROPERTIES ('numBuckets'='8')")
    spark.sql("INSERT INTO gbe.ns.sj SELECT id, concat('y', id) FROM range(120, 160)")
    spark.sql("INSERT INTO gbe.ns.sjm SELECT id, id * 5 FROM range(120, 160)")

    val withSpj = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = withSpj.map { case (k, _) => k -> spark.conf.getOption(k) }
    withSpj.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def joined() = spark.sql(
        """SELECT a.id, a.v, b.w FROM gbe.ns.sj a
          |JOIN gbe.ns.sjm b ON a.id = b.id""".stripMargin)
      // mixed eras on sj: key grouping withheld -> the join shuffles, but
      // the ANSWER is exact
      assert(joined().count() == 160L)
      assert(shuffles(joined()) > 0,
        "mixed-era bucket layout must not claim a key-grouped partitioning")
      // compact unifies every visible file under the CURRENT modulus...
      spark.sql("CALL gbe.system.compact(table => 'ns.sj', target_bytes => 1048576)")
      val vis = visibleData("sj")
      assert(vis.nonEmpty && vis.forall(_.startsWith("_bucket8=")),
        vis.mkString(", "))
      // ...reads stay exact, point lookups prune on the unified era, and
      // the co-bucketed join is exchange-free again
      import spark.implicits._
      assert(spark.table("gbe.ns.sj").count() == 160L)
      assert(spark.table("gbe.ns.sj").where($"id" === 47L)
        .select("v").as[String].collect().toSeq == Seq("x47"))
      assert(planned().forall(_.contains(s"_bucket8=${id8(47L)}/")), planned())
      val j2 = joined()
      assert(j2.count() == 160L)
      assert(shuffles(j2) == 0,
        s"unified co-bucketed join must be exchange-free:\n${j2.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("refusals and no-ops: bad counts, unbucketed targets, idempotent ALTER") {
    spark.sql(
      """CREATE TABLE gbe.ns.rf (id BIGINT, v STRING)
        |USING `graft-ocf` PARTITIONED BY (bucket(4, id))""".stripMargin)
    spark.sql("INSERT INTO gbe.ns.rf SELECT id, concat('r', id) FROM range(10)")
    def refuse(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    refuse("ALTER TABLE gbe.ns.rf SET TBLPROPERTIES ('numBuckets'='abc')",
      "must be an integer")
    refuse("ALTER TABLE gbe.ns.rf SET TBLPROPERTIES ('numBuckets'='1')",
      "must be > 1")
    // same-count ALTER is a no-op: no genesis stamp, no era stamping
    spark.sql("ALTER TABLE gbe.ns.rf SET TBLPROPERTIES ('numBuckets'='4')")
    val props = spark.sessionState.catalogManager.catalog("gbe")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("ns"), "rf")).properties()
    assert(props.get("numBuckets") == "4")
    assert(!props.containsKey("numBucketsGenesis"))
    spark.sql("INSERT INTO gbe.ns.rf SELECT id, concat('s', id) FROM range(10, 20)")
    assert(visibleData("rf").forall(_.startsWith("_bucket=")),
      "an unevolved table must keep bare levels")
    assert(spark.table("gbe.ns.rf").count() == 20L)
    // CREATE with a reserved genesis option is refused
    refuse(
      """CREATE TABLE gbe.ns.rf2 (id BIGINT) USING `graft-ocf`
        |PARTITIONED BY (bucket(4, id))
        |OPTIONS (numBucketsGenesis '2')""".stripMargin,
      "engine-managed")
  }
}
