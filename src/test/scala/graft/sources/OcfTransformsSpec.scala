package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Hidden partition transforms (X88): `PARTITIONED BY (days(ts))` etc. —
  * Iceberg-style time/truncate partitioning where the layout serves raw-
  * column predicates and the source column stays a data column. */
class OcfTransformsSpec extends AnyFunSuite {

  private val warehouse =
    java.nio.file.Files.createTempDirectory("graft-tf-wh").toFile

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-transforms-spec")
      .getOrCreate()
    s.conf.set("spark.sql.catalog.gt", classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gt.warehouse", warehouse.getAbsolutePath)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gt.ns")
    s
  }

  test("ordinal/render/parse round-trips, including pre-1970") {
    import OcfTransforms._
    val days = Spec("days", "ts")
    // 2024-03-05T17:30:00Z in micros
    val micros = java.time.Instant.parse("2024-03-05T17:30:00Z")
      .getEpochSecond * 1000000L
    val dOrd = ordinalOf(days, java.lang.Long.valueOf(micros), TimestampType)
    assert(renderOrdinal(days, dOrd) == "2024-03-05")
    assert(parseOrdinal(days, "2024-03-05", stringTruncate = false) == dOrd)

    val hours = Spec("hours", "ts")
    val hOrd = ordinalOf(hours, java.lang.Long.valueOf(micros), TimestampType)
    assert(renderOrdinal(hours, hOrd) == "2024-03-05-17")
    assert(parseOrdinal(hours, "2024-03-05-17", stringTruncate = false) == hOrd)

    val months = Spec("months", "ts")
    val mOrd = ordinalOf(months, java.lang.Long.valueOf(micros), TimestampType)
    assert(renderOrdinal(months, mOrd) == "2024-03")
    assert(parseOrdinal(months, "2024-03", stringTruncate = false) == mOrd)

    val years = Spec("years", "ts")
    assert(renderOrdinal(years,
      ordinalOf(years, java.lang.Long.valueOf(micros), TimestampType)) == "2024")

    // pre-1970 floors DOWN (floorDiv), never toward zero
    val old = java.time.Instant.parse("1969-12-31T22:00:00Z")
      .getEpochSecond * 1000000L
    assert(renderOrdinal(days,
      ordinalOf(days, java.lang.Long.valueOf(old), TimestampType)) == "1969-12-31")
    assert(renderOrdinal(months,
      ordinalOf(months, java.lang.Long.valueOf(old), TimestampType)) == "1969-12")

    val tr = Spec("truncate", "id", 10)
    assert(ordinalOf(tr, java.lang.Long.valueOf(37L), LongType) == 37L - 7L)
    assert(ordinalOf(tr, java.lang.Long.valueOf(-3L), LongType) == -10L)
    val ts = Spec("truncate", "name", 3)
    assert(ordinalOf(ts, "abcdef", StringType) == "abc")
    assert(ordinalOf(ts, "ab", StringType) == "ab")

    // CODE-POINT truncation: "𝄞" (U+1D11E, musical G clef) is
    // ONE code point in TWO UTF-16 chars. Char-based truncation at width 3
    // would cut "ab<clef>x" to "ab\uD834" — a lone surrogate whose UTF-8
    // form ('?') is no longer a prefix of the value, breaking the
    // monotone-prefix property pruning relies on. Code-point truncation
    // keeps the pair whole.
    val clef = new String(Character.toChars(0x1D11E))
    assert(ordinalOf(ts, "ab" + clef + "x", StringType) == "ab" + clef)
    assert(ordinalOf(ts, "ab" + clef, StringType) == "ab" + clef)
    // width counts code points, so a 3-code-point string is exact even
    // when it spans 4 UTF-16 chars
    assert(ordinalOf(Spec("truncate", "name", 2), clef + clef + clef, StringType)
      == clef + clef)
  }

  test("days(ts) DDL: layout, hidden pruning on raw predicates, exact reads") {
    spark.sql(
      """CREATE TABLE gt.ns.ev (ts TIMESTAMP, v BIGINT)
        |USING `graft-ocf` PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql(
      """INSERT INTO gt.ns.ev
        |SELECT timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id*1800),
        |  id
        |FROM range(0, 480)""".stripMargin) // 480 half-hours = 10 days

    // layout: _p_days_ts=YYYY-MM-DD dirs; ts stays a DATA column
    val root = new java.io.File(warehouse, "ns/ev")
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("_p_")).sorted
    assert(dirs.length == 10 && dirs.head == "_p_days_ts=2024-03-01" &&
      dirs.last == "_p_days_ts=2024-03-10", dirs.toSeq.toString)

    // full read returns every row with the original timestamps
    assert(spark.table("gt.ns.ev").count() == 480)
    val one = spark.sql(
      "SELECT v FROM gt.ns.ev WHERE ts = timestamp'2024-03-02 01:00:00'")
    assert(one.collect().map(_.getLong(0)).toSeq == Seq(50L))

    // hidden pruning: a raw-ts range plans ONLY the overlapping day dirs
    spark.sql(
      """SELECT count(*) FROM gt.ns.ev
        |WHERE ts >= timestamp'2024-03-04 06:00:00'
        |  AND ts < timestamp'2024-03-06 00:00:00'""".stripMargin).collect()
    val planned = OcfDataSource.lastPlannedFiles.get()
    assert(planned.nonEmpty &&
      planned.forall(p => p.contains("_p_days_ts=2024-03-04") ||
        p.contains("_p_days_ts=2024-03-05")),
      s"expected only 03-04/03-05 files, got $planned")
    // and the answer is row-exact (pruning is file-level, Spark refilters)
    assert(spark.sql(
      """SELECT count(*) FROM gt.ns.ev
        |WHERE ts >= timestamp'2024-03-04 06:00:00'
        |  AND ts < timestamp'2024-03-06 00:00:00'""".stripMargin)
      .head.getLong(0) == 84L) // 36 on 03-04 after 06:00 + 48 on 03-05

    // equality predicate prunes to one day
    spark.sql(
      "SELECT count(*) FROM gt.ns.ev WHERE ts = timestamp'2024-03-07 12:00:00'")
      .collect()
    val planned2 = OcfDataSource.lastPlannedFiles.get()
    assert(planned2.forall(_.contains("_p_days_ts=2024-03-07")), planned2.toString)
  }

  test("truncate(100, id) prunes integral ranges; value stays a data column") {
    spark.sql(
      """CREATE TABLE gt.ns.tr (id BIGINT, v STRING)
        |USING `graft-ocf` PARTITIONED BY (truncate(100, id))""".stripMargin)
    spark.sql(
      "INSERT INTO gt.ns.tr SELECT id, concat('v', id) FROM range(0, 1000)")
    val root = new java.io.File(warehouse, "ns/tr")
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.contains("_p_truncate_100_id=0") &&
      dirs.contains("_p_truncate_100_id=900"), dirs.toSeq.toString)
    assert(spark.table("gt.ns.tr").count() == 1000)
    spark.sql("SELECT v FROM gt.ns.tr WHERE id = 437").collect()
    val planned = OcfDataSource.lastPlannedFiles.get()
    assert(planned.nonEmpty && planned.forall(_.contains("_p_truncate_100_id=400")),
      planned.toString)
    assert(spark.sql("SELECT v FROM gt.ns.tr WHERE id = 437")
      .head.getString(0) == "v437")
    // range prune
    spark.sql("SELECT count(*) FROM gt.ns.tr WHERE id >= 750 AND id < 820").collect()
    val planned2 = OcfDataSource.lastPlannedFiles.get()
    assert(planned2.forall(p => p.contains("=700") || p.contains("=800")),
      planned2.toString)
  }

  test("months(d) over a DATE column; identity + transform compose") {
    spark.sql(
      """CREATE TABLE gt.ns.md (src STRING, d DATE, n BIGINT)
        |USING `graft-ocf` PARTITIONED BY (src, months(d))""".stripMargin)
    // stored order: data columns (d, n) first, identity partition (src) last
    spark.sql(
      """INSERT INTO gt.ns.md
        |SELECT date_add(date'2023-11-15', CAST(id * 7 AS INT)), id,
        |  CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END
        |FROM range(0, 20)""".stripMargin)
    val sub = new java.io.File(warehouse, "ns/md/src=a")
    assert(sub.isDirectory)
    val mdirs = sub.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(mdirs.head == "_p_months_d=2023-11", mdirs.toSeq.toString)
    assert(spark.table("gt.ns.md").count() == 20)
    // identity + transform prune together
    spark.sql(
      "SELECT count(*) FROM gt.ns.md WHERE src = 'a' AND d < date'2023-12-01'")
      .collect()
    val planned = OcfDataSource.lastPlannedFiles.get()
    assert(planned.nonEmpty && planned.forall(p =>
      p.contains("src=a") && p.contains("_p_months_d=2023-11")), planned.toString)
  }

  test("null transform values land in the null directory and read back") {
    spark.sql(
      """CREATE TABLE gt.ns.nl (ts TIMESTAMP, v BIGINT)
        |USING `graft-ocf` PARTITIONED BY (days(ts))""".stripMargin)
    spark.sql(
      """INSERT INTO gt.ns.nl
        |SELECT CASE WHEN id % 3 = 0 THEN NULL
        |  ELSE timestamp'2024-06-01 12:00:00' END, id FROM range(9)""".stripMargin)
    assert(spark.table("gt.ns.nl").count() == 9)
    assert(spark.sql("SELECT count(*) FROM gt.ns.nl WHERE ts IS NULL")
      .head.getLong(0) == 3L)
    // IS NOT NULL prunes the null directory away
    spark.sql("SELECT count(*) FROM gt.ns.nl WHERE ts IS NOT NULL").collect()
    assert(OcfDataSource.lastPlannedFiles.get()
      .forall(_.contains("_p_days_ts=2024-06-01")))
  }

  test("unsupported transform shapes are refused at DDL time") {
    val e1 = intercept[Exception] {
      spark.sql(
        """CREATE TABLE gt.ns.bad1 (v STRING, ts TIMESTAMP)
          |USING `graft-ocf` PARTITIONED BY (hours(v))""".stripMargin)
    }
    assert(e1.getMessage.contains("does not support type"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(
        """CREATE TABLE gt.ns.bad2 (v STRING, d DOUBLE)
          |USING `graft-ocf` PARTITIONED BY (truncate(4, d))""".stripMargin)
    }
    assert(e2.getMessage.contains("does not support type"), e2.getMessage)
  }

  test("compaction preserves the transform layout and its pruning") {
    spark.sql(
      """CREATE TABLE gt.ns.cmp (ts TIMESTAMP, v BIGINT)
        |USING `graft-ocf` PARTITIONED BY (days(ts))""".stripMargin)
    // many small commits -> fragmented day directories
    (0 until 4).foreach(i => spark.sql(
      s"""INSERT INTO gt.ns.cmp
         |SELECT timestamp'2024-05-01 00:00:00'
         |  + make_interval(0,0,0,0,0,0,(id + ${i * 50}) * 3600), id + ${i * 50}
         |FROM range(0, 50)""".stripMargin)) // 200 hourly rows over ~9 days
    val before = spark.table("gt.ns.cmp").collect().map(_.getLong(1)).sorted
    spark.sql("CALL gt.system.compact(table => 'ns.cmp')").collect()
    // identical rows, layout intact, pruning still works
    val after = spark.table("gt.ns.cmp").collect().map(_.getLong(1)).sorted
    assert(after.toSeq == before.toSeq)
    val root = new java.io.File(warehouse, "ns/cmp")
    assert(root.listFiles().exists(f => f.isDirectory &&
      f.getName.startsWith("_p_days_ts=2024-05-01")))
    spark.sql(
      "SELECT count(*) FROM gt.ns.cmp WHERE ts < timestamp'2024-05-02 00:00:00'")
      .collect()
    val planned = OcfDataSource.lastPlannedFiles.get()
    assert(planned.nonEmpty && planned.forall(_.contains("_p_days_ts=2024-05-01")),
      planned.toString)
  }

  test("streaming reads and writes compose with transform layouts") {
    import org.apache.spark.sql.streaming.Trigger
    // streaming READ of the days(ts) table from the earlier test
    val ck1 = java.nio.file.Files.createTempDirectory("graft-tf-ck1").toString
    val q1 = spark.readStream.table("gt.ns.ev")
      .groupBy().count()
      .writeStream.format("memory").queryName("tf_stream_count")
      .outputMode("complete")
      .option("checkpointLocation", ck1)
      .trigger(Trigger.AvailableNow())
      .start()
    q1.awaitTermination(60000)
    val streamed = spark.sql("SELECT count FROM tf_stream_count").head.getLong(0)
    assert(streamed == spark.table("gt.ns.ev").count(), s"streamed $streamed")

    // streaming WRITE routes epochs into transform directories
    spark.sql(
      """CREATE TABLE gt.ns.evs (ts TIMESTAMP, v BIGINT)
        |USING `graft-ocf` PARTITIONED BY (days(ts))""".stripMargin)
    val src = java.nio.file.Files.createTempDirectory("graft-tf-src").toString
    val ck2 = java.nio.file.Files.createTempDirectory("graft-tf-ck2").toString
    spark.sql(
      """SELECT timestamp'2024-08-01 00:00:00'
        |  + make_interval(0,0,0,0,0,0,id*43200) AS ts, id AS v
        |FROM range(0, 8)""".stripMargin) // 4 days, half-day steps
      .coalesce(1).write.parquet(src + "/p1")
    val q2 = spark.readStream.schema("ts TIMESTAMP, v BIGINT")
      .parquet(src + "/*")
      .writeStream.option("checkpointLocation", ck2)
      .trigger(Trigger.AvailableNow())
      .toTable("gt.ns.evs")
    q2.awaitTermination(60000)
    assert(spark.table("gt.ns.evs").count() == 8L)
    val root = new java.io.File(warehouse, "ns/evs")
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("_p_")).sorted
    assert(dirs.toSeq == Seq("_p_days_ts=2024-08-01", "_p_days_ts=2024-08-02",
      "_p_days_ts=2024-08-03", "_p_days_ts=2024-08-04"), dirs.toSeq.toString)
    // and hidden pruning serves the streamed layout
    spark.sql(
      "SELECT count(*) FROM gt.ns.evs WHERE ts < timestamp'2024-08-02 00:00:00'")
      .collect()
    assert(OcfDataSource.lastPlannedFiles.get()
      .forall(_.contains("_p_days_ts=2024-08-01")))
  }

  test("time travel and snapshots compose with transform layouts") {
    val root = new Path(warehouse.getAbsolutePath, "ns/ev")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    assert(OcfSnapshots.enabled(fs, root))
    spark.sql(
      """INSERT INTO gt.ns.ev
        |SELECT timestamp'2024-03-11 00:00:00', 9999""".stripMargin)
    assert(spark.table("gt.ns.ev").count() == 481)
    assert(spark.sql("SELECT count(*) FROM gt.ns.ev VERSION AS OF 1")
      .head.getLong(0) == 480L)
  }
}
