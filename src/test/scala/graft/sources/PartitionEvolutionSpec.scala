package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hidden-transform partition-spec evolution (X100): `ALTER TABLE ... SET
  * TBLPROPERTIES ('transformPartitions'='hours(ts)')` re-routes future
  * writes while files written under former specs stay in place. The scan
  * union-aligns mixed-era layouts by level name and prunes each file
  * through the self-describing `_p_*` levels its own path carries — an
  * absent level admits (says nothing), a null level prunes exactly.
  * Identity partition columns and bucket specs stay immutable. */
class PartitionEvolutionSpec extends AnyFunSuite {

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft-pe-wh").toFile

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-partition-evolution-spec")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.pe", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.pe.warehouse", warehouse.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS pe.ns")
    s
  }

  private def ts(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  private def planned(): Seq[String] = OcfDataSource.lastPlannedFiles.get()

  test("days(ts) -> hours(ts): both eras prune through their own levels") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE pe.ns.ev1 (id BIGINT, ts TIMESTAMP, v STRING)
        |USING `graft-ocf` PARTITIONED BY (days(ts))""".stripMargin)
    // era A: two day-partitions under days(ts)
    Seq((1L, ts("2024-03-01T10:00:00Z"), "a"),
        (2L, ts("2024-03-02T11:00:00Z"), "b"))
      .toDF("id", "ts", "v").coalesce(1).writeTo("pe.ns.ev1").append()
    spark.sql("ALTER TABLE pe.ns.ev1 SET TBLPROPERTIES " +
      "('transformPartitions'='hours(ts)')")
    // era B: two hour-partitions under hours(ts)
    Seq((3L, ts("2024-04-05T08:30:00Z"), "c"),
        (4L, ts("2024-04-05T09:30:00Z"), "d"))
      .toDF("id", "ts", "v").coalesce(1).writeTo("pe.ns.ev1").append()
    val dirs = new java.io.File(warehouse, "ns/ev1").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("_p_days_ts=")), dirs.toString)
    assert(dirs.exists(_.startsWith("_p_hours_ts=")), dirs.toString)

    val all = spark.table("pe.ns.ev1")
    assert(all.count() == 4)
    assert(all.schema.fieldNames.toSeq == Seq("id", "ts", "v"))

    // era-A pruning still works: a day-bounded predicate plans only the
    // matching day file (era-B files pruned through their hour level)
    assert(spark.table("pe.ns.ev1")
      .where($"ts" >= "2024-03-02 00:00:00" && $"ts" < "2024-03-03 00:00:00")
      .count() == 1)
    // predicate matching only era B's first hour: one planned file
    spark.table("pe.ns.ev1")
      .where($"ts" >= "2024-04-05 08:00:00" && $"ts" < "2024-04-05 09:00:00")
      .count()
    assert(planned().length == 1, planned().mkString(", "))
    // predicate matching era A's first day: era-B hour files pruned
    spark.table("pe.ns.ev1")
      .where($"ts" >= "2024-03-01 00:00:00" && $"ts" < "2024-03-02 00:00:00")
      .count()
    assert(planned().length == 1, planned().mkString(", "))
  }

  test("unpartitioned -> days(ts): pre-evolution files always admit") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE pe.ns.ev2 (id BIGINT, ts TIMESTAMP)
        |USING `graft-ocf`""".stripMargin)
    Seq((1L, ts("2024-01-01T00:30:00Z")), (2L, ts("2024-06-01T00:30:00Z")))
      .toDF("id", "ts").coalesce(1).writeTo("pe.ns.ev2").append()
    spark.sql("ALTER TABLE pe.ns.ev2 SET TBLPROPERTIES " +
      "('transformPartitions'='days(ts)')")
    Seq((3L, ts("2024-07-07T12:00:00Z"))).toDF("id", "ts")
      .coalesce(1).writeTo("pe.ns.ev2").append()
    assert(spark.table("pe.ns.ev2").count() == 3)
    // flat-era file admits under any ts predicate (absent level != null);
    // the day file prunes
    spark.table("pe.ns.ev2").where($"ts" < "2024-02-01 00:00:00").count()
    assert(planned().length == 1, planned().mkString(", "))
    assert(spark.table("pe.ns.ev2")
      .where($"ts" < "2024-02-01 00:00:00").count() == 1)
    // and the reverse: a predicate matching only the day-era file plans
    // the flat file too (conservative) but not fewer
    assert(spark.table("pe.ns.ev2")
      .where($"ts" >= "2024-07-07 00:00:00").count() == 1)
  }

  test("UNSET transformPartitions: spec evolves to none, mixed reads stay exact") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE pe.ns.ev3 (id BIGINT, ts TIMESTAMP)
        |USING `graft-ocf` PARTITIONED BY (days(ts))""".stripMargin)
    Seq((1L, ts("2024-01-01T00:30:00Z"))).toDF("id", "ts")
      .coalesce(1).writeTo("pe.ns.ev3").append()
    spark.sql("ALTER TABLE pe.ns.ev3 UNSET TBLPROPERTIES ('transformPartitions')")
    Seq((2L, ts("2024-02-02T00:30:00Z"))).toDF("id", "ts")
      .coalesce(1).writeTo("pe.ns.ev3").append()
    assert(spark.table("pe.ns.ev3").count() == 2)
    val flat = new java.io.File(warehouse, "ns/ev3").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".avro"))
    assert(flat.nonEmpty, "post-UNSET files land at the table root")
  }

  test("identity partitions stay put through a transform evolution") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE pe.ns.ev4 (id BIGINT, ts TIMESTAMP, lang STRING)
        |USING `graft-ocf` PARTITIONED BY (lang, days(ts))""".stripMargin)
    Seq((1L, ts("2024-03-01T10:00:00Z"), "en"),
        (2L, ts("2024-03-01T10:00:00Z"), "fr"))
      .toDF("id", "ts", "lang").coalesce(1).writeTo("pe.ns.ev4").append()
    spark.sql("ALTER TABLE pe.ns.ev4 SET TBLPROPERTIES " +
      "('transformPartitions'='hours(ts)')")
    Seq((3L, ts("2024-03-09T10:00:00Z"), "en"))
      .toDF("id", "ts", "lang").coalesce(1).writeTo("pe.ns.ev4").append()
    assert(spark.table("pe.ns.ev4").count() == 3)
    // identity pruning exact across eras
    assert(spark.table("pe.ns.ev4").where($"lang" === "en").count() == 2)
    spark.table("pe.ns.ev4").where($"lang" === "fr").count()
    assert(planned().length == 1, planned().mkString(", "))
    assert(spark.table("pe.ns.ev4").where($"lang" === "en")
      .select(sum($"id")).as[Long].head() == 4L)
  }

  test("refusals: bad transform specs, immutable bucket; path reads stay loud") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE pe.ns.ev5 (id BIGINT, ts TIMESTAMP, v STRING)
        |USING `graft-ocf` PARTITIONED BY (days(ts))""".stripMargin)
    Seq((1L, ts("2024-03-01T10:00:00Z"), "a")).toDF("id", "ts", "v")
      .coalesce(1).writeTo("pe.ns.ev5").append()
    def refuse(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(frag), e.getMessage)
    }
    refuse("ALTER TABLE pe.ns.ev5 SET TBLPROPERTIES " +
      "('transformPartitions'='days(nope)')", "not a column")
    refuse("ALTER TABLE pe.ns.ev5 SET TBLPROPERTIES " +
      "('transformPartitions'='days(v)')", "does not support type")
    // numBuckets on an UNBUCKETED table: still refused (bucketing itself is
    // not evolvable — X103 only evolves the COUNT of an existing layout)
    refuse("ALTER TABLE pe.ns.ev5 SET TBLPROPERTIES " +
      "('numBuckets'='8')", "not a bucketed table")
    // mixed-era directories WITHOUT the engine's spec option: loud refusal
    spark.sql("ALTER TABLE pe.ns.ev5 SET TBLPROPERTIES " +
      "('transformPartitions'='hours(ts)')")
    Seq((2L, ts("2024-03-02T10:00:00Z"), "b")).toDF("id", "ts", "v")
      .coalesce(1).writeTo("pe.ns.ev5").append()
    val e = intercept[Exception] {
      spark.read.format("graft-ocf")
        .load(new java.io.File(warehouse, "ns/ev5").getAbsolutePath).count()
    }
    assert(e.getMessage.contains("inconsistent partition layout"), e.getMessage)
  }

  test("compact unifies eras to the current spec; upsert folds work " +
      "across eras") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE pe.ns.ev7 (id BIGINT, ts TIMESTAMP, v STRING)
        |USING `graft-ocf` PARTITIONED BY (days(ts))
        |OPTIONS (statsColumns 'id')""".stripMargin)
    Seq((1L, ts("2024-03-01T10:00:00Z"), "a"),
        (2L, ts("2024-03-20T11:00:00Z"), "b"))
      .toDF("id", "ts", "v").coalesce(1).writeTo("pe.ns.ev7").append()
    spark.sql("ALTER TABLE pe.ns.ev7 SET TBLPROPERTIES " +
      "('transformPartitions'='months(ts)')")
    Seq((3L, ts("2024-04-05T08:30:00Z"), "c"))
      .toDF("id", "ts", "v").coalesce(1).writeTo("pe.ns.ev7").append()
    // an upsert whose keys burden BOTH eras, then the fold across them
    Seq((1L, ts("2024-03-01T10:00:00Z"), "A"),
        (3L, ts("2024-04-05T08:30:00Z"), "C"))
      .toDF("id", "ts", "v").writeTo("pe.ns.ev7")
      .option("upsertKeys", "id").append()
    val fold = spark.sql(
      "CALL pe.system.rewrite_position_deletes(table => 'ns.ev7')").collect()(0)
    assert(fold.getLong(1) >= 1L, fold.toString)
    assert(spark.table("pe.ns.ev7").orderBy("id")
      .select("v").as[String].collect().toSeq == Seq("A", "b", "C"))
    // full compact migrates every surviving row under the CURRENT spec
    spark.sql("CALL pe.system.compact(table => 'ns.ev7')")
    val dirs = new java.io.File(warehouse, "ns/ev7").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("_p_")).toSet
    // old-era days dirs may remain on disk as retained history, but the
    // VISIBLE files all live under months(ts)
    val root = new org.apache.hadoop.fs.Path(warehouse.getAbsolutePath, "ns/ev7")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val visible = OcfSnapshots.latest(fs, root).get.files.filter(_.isData)
    assert(visible.nonEmpty)
    assert(visible.forall(_.path.startsWith("_p_months_ts=")),
      visible.map(_.path).mkString(", "))
    assert(spark.table("pe.ns.ev7").orderBy("id")
      .select("v").as[String].collect().toSeq == Seq("A", "b", "C"))
    // and pruning now rides the unified month level
    spark.table("pe.ns.ev7").where($"ts" >= "2024-04-01 00:00:00").count()
    assert(planned().length == 1, planned().mkString(", "))
  }

  test("streaming change feed keeps working across a spec evolution") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE pe.ns.ev6 (id BIGINT, ts TIMESTAMP)
        |USING `graft-ocf` PARTITIONED BY (days(ts))""".stripMargin)
    Seq((1L, ts("2024-03-01T10:00:00Z"))).toDF("id", "ts")
      .coalesce(1).writeTo("pe.ns.ev6").append()
    spark.sql("ALTER TABLE pe.ns.ev6 SET TBLPROPERTIES " +
      "('transformPartitions'='hours(ts)')")
    Seq((2L, ts("2024-03-05T10:00:00Z"))).toDF("id", "ts")
      .coalesce(1).writeTo("pe.ns.ev6").append()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pe-ck").toFile
    spark.catalog.dropTempView("pe_ev6_feed")
    val q = spark.readStream.format("graft-ocf-changes")
      .option("startingVersion", "0")
      .load(new java.io.File(warehouse, "ns/ev6").getAbsolutePath)
      .writeStream.format("memory").queryName("pe_ev6_feed")
      .option("checkpointLocation", ckpt.getAbsolutePath).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("pe_ev6_feed").count() == 2)
  }

  test("observability and overwrites survive an evolution: .files and " +
      "INSERT OVERWRITE work over mixed eras") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE pe.ns.ev8 (id BIGINT, ts TIMESTAMP)
        |USING `graft-ocf` PARTITIONED BY (days(ts))""".stripMargin)
    Seq((1L, ts("2024-03-01T10:00:00Z"))).toDF("id", "ts")
      .coalesce(1).writeTo("pe.ns.ev8").append()
    spark.sql("ALTER TABLE pe.ns.ev8 SET TBLPROPERTIES " +
      "('transformPartitions'='months(ts)')")
    Seq((2L, ts("2024-04-05T08:30:00Z"))).toDF("id", "ts")
      .coalesce(1).writeTo("pe.ns.ev8").append()
    // .files unions eras; the absent level reads as a null map value
    val files = spark.sql("SELECT file, partition FROM pe.ns.ev8.files")
      .collect().map(r => r.getString(0) ->
        r.getMap[String, String](1)).toMap
    assert(files.size == 2, files.toString)
    assert(files.keys.exists(_.contains("_p_days_ts=")) &&
      files.keys.exists(_.contains("_p_months_ts=")), files.keys.toString)
    // a whole-table overwrite still lists and replaces across eras
    spark.sql("INSERT OVERWRITE pe.ns.ev8 VALUES (9, TIMESTAMP '2024-05-01 00:00:00')")
    assert(spark.table("pe.ns.ev8").count() == 1L)
    assert(spark.table("pe.ns.ev8").select("id").as[Long].head() == 9L)
  }

  test("dynamic partition overwrite refuses over mixed eras, works after " +
      "compaction unifies them") {
    import spark.implicits._
    spark.sql(
      """CREATE TABLE pe.ns.ev9 (id BIGINT, ts TIMESTAMP)
        |USING `graft-ocf` PARTITIONED BY (days(ts))""".stripMargin)
    Seq((1L, ts("2024-03-01T10:00:00Z"))).toDF("id", "ts")
      .coalesce(1).writeTo("pe.ns.ev9").append()
    spark.sql("ALTER TABLE pe.ns.ev9 SET TBLPROPERTIES " +
      "('transformPartitions'='months(ts)')")
    Seq((2L, ts("2024-04-05T08:30:00Z"))).toDF("id", "ts")
      .coalesce(1).writeTo("pe.ns.ev9").append()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e = intercept[Exception] {
        spark.sql("INSERT OVERWRITE TABLE pe.ns.ev9 " +
          "VALUES (9, TIMESTAMP '2024-03-15 00:00:00')")
      }
      assert(e.getMessage.contains("MIXED") ||
        Option(e.getCause).exists(_.getMessage.contains("MIXED")), e.getMessage)
      // unify, then the same dynamic overwrite replaces exactly its month
      spark.sql("CALL pe.system.compact(table => 'ns.ev9')")
      spark.sql("INSERT OVERWRITE TABLE pe.ns.ev9 " +
        "VALUES (9, TIMESTAMP '2024-03-15 00:00:00')")
      val rows = spark.table("pe.ns.ev9").select("id").as[Long]
        .collect().toSeq.sorted
      assert(rows == Seq(2L, 9L), rows.toString) // March replaced, April kept
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
