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
}
