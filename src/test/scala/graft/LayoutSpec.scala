package graft

import graft.ops.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-avoidance layout techniques: bucketed co-located joins (no
  * exchange) and deterministic skew salting (same results, spread keys). */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .appName("graft-layout-spec")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("same-bucketed tables join with no shuffle exchange") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Layout.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Layout.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 4)

    // disable broadcast so the planner actually uses the bucket layout
    // (tiny test tables would otherwise broadcast and bypass it)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
        .select("o_orderkey", "o_totalprice", "l_quantity")
      val rows = joined.collect() // finalizes THIS query's adaptive plan
      assert(rows.length == orders.join(lineitem, "o_orderkey").count().toInt)
      assert(rows.nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free bucketed join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join returns exactly the plain join's rows with keys spread") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val dim = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("o_custkey"), col("c_name"))

    val plain = orders.join(dim, "o_custkey")
    val salted = Layout.saltedJoin(orders, dim, "o_custkey", saltFactor = 8)
    assert(salted.count() == plain.count())
    // spot-check content equality
    val a = plain.orderBy("o_orderkey").collect().map(_.toSeq.toList).toList
    val b = salted.select(plain.columns.map(col).toIndexedSeq: _*)
      .orderBy("o_orderkey").collect().map(_.toSeq.toList).toList
    assert(a == b)
  }

  test("zorder encodings preserve order; interleave is per-coordinate monotone") {
    import graft.spark.ZOrderKey._
    def uless(a: Long, b: Long) = java.lang.Long.compareUnsigned(a, b) < 0
    // integral: full signed order survives the unsigned mapping
    val ls = Seq(Long.MinValue, -5L, -1L, 0L, 1L, 3L, Long.MaxValue)
    ls.sliding(2).foreach { case Seq(x, y) =>
      assert(uless(encodeLong(x), encodeLong(y)), s"$x vs $y") }
    // floating: total order incl. infinities and signed zero adjacency
    val ds = Seq(Double.NegativeInfinity, -1.5, -0.0, 1e-9, 1.5, Double.PositiveInfinity)
    ds.sliding(2).foreach { case Seq(x, y) =>
      assert(!uless(encodeDouble(y), encodeDouble(x)), s"$x vs $y") }
    // string: unsigned-lexicographic prefix order
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    assert(uless(encodeUtf8(u8("apple")), encodeUtf8(u8("banana"))))
    assert(uless(encodeUtf8(u8("ab")), encodeUtf8(u8("abc"))))
    // Morton key: monotone in each coordinate with the other fixed
    def key(x: Long, y: Long) = interleave(Array(encodeLong(x), encodeLong(y)))
    def bless(a: Array[Byte], b: Array[Byte]): Boolean = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      a.length < b.length
    }
    for (x <- -3L to 3L; y <- -3L to 3L) {
      assert(bless(key(x, y), key(x + 1, y)), s"x step at ($x,$y)")
      assert(bless(key(x, y), key(x, y + 1)), s"y step at ($x,$y)")
    }
    // the expression itself survives CODEGEN_ONLY (doGenCode really compiles)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      import spark.implicits._
      val rows = Seq((1L, "a", 2.5), (-7L, "zz", -0.5)).toDF("l", "s", "d")
        .select(Layout.zorderKey(col("l"), col("s"), col("d")).as("k"))
        .collect()
      assert(rows.forall(_.getAs[Array[Byte]]("k").length == 24))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("zorderBy clusters so file skipping serves EVERY zorder column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    dir.deleteOnExit()
    // 16x16 value grid, 20 rows per cell: two independent dimensions
    val df = (0 until 256).flatMap { c =>
      val (a, b) = ((c % 16) * 1000L, (c / 16) * 1000L)
      Seq.fill(20)((a, b))
    }.toDF("a", "b")
    Layout.zorderBy(df, 16, "a", "b")
      .write.format("graft-ocf").option("statsColumns", "a,b")
      .mode("overwrite").save(dir.getAbsolutePath)
    val files = dir.listFiles().filter(f =>
      f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    assert(files.length == 16, s"expected 16 z-range files, got ${files.length}")

    def plannedFor(p: org.apache.spark.sql.Column): Int = {
      val r = spark.read.format("graft-ocf").load(dir.getAbsolutePath)
        .where(p).count()
      assert(r == 320L, s"every cell has 320 rows; got $r")
      graft.sources.OcfDataSource.lastPlannedFiles.get().size
    }
    // a 16-file Z-layout over a 16x16 grid gives each file a ~4x4 tile:
    // a point predicate on EITHER column should hit ~4 files. Range-
    // partition sampling can smear boundaries — 8 is the generous bound
    // that still proves two-dimensional clustering.
    val pa = plannedFor(col("a") === 3000L)
    val pb = plannedFor(col("b") === 7000L)
    assert(pa <= 8, s"zorder must skip most files on a; planned $pa of 16")
    assert(pb <= 8, s"zorder must skip most files on b; planned $pb of 16")

    // contrast: a lexicographic (a, b) sort leaves the TRAILING column
    // unclustered — the same b predicate keeps (nearly) every file
    val lexDir = java.nio.file.Files.createTempDirectory("graft-lex").toFile
    lexDir.deleteOnExit()
    df.repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions("a", "b")
      .write.format("graft-ocf").option("statsColumns", "a,b")
      .mode("overwrite").save(lexDir.getAbsolutePath)
    assert(spark.read.format("graft-ocf").load(lexDir.getAbsolutePath)
      .where(col("b") === 7000L).count() == 320L)
    val lexPlanned = graft.sources.OcfDataSource.lastPlannedFiles.get().size
    assert(lexPlanned >= 14,
      s"lexicographic trailing column should not skip; planned $lexPlanned of 16")
  }
}
