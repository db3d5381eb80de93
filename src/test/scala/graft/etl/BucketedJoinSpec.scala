package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `Warehouse.publishBucketed`: co-bucketed tables must join with ZERO
  * shuffle exchanges — the layout contract that turns the biggest repeated
  * fact⋈fact join of a 100 TB warehouse from two full-data exchanges per
  * run into none (paid once at write time). The assertion reads the
  * EXECUTED plan: no Exchange on either side of the sort-merge join. */
class BucketedJoinSpec extends SparkSpec {

  test("co-bucketed fact tables sort-merge join with no shuffle exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    Warehouse.publishBucketed(spark, "li_bucketed", li, "l_orderkey", 8)
    Warehouse.publishBucketed(spark, "ord_bucketed", ord, "o_orderkey", 8)

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path (broadcast would hide the property under test)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() === expected)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must report bucketing:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")
    Warehouse.publishBucketed(spark, "li_bucketed_agg", li, "l_orderkey", 8)
    try {
      val a = spark.table("li_bucketed_agg")
        .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
      assert(a.count() === li.select("l_orderkey").distinct().count())
      val plan = a.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-keyed aggregation must not shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")
    }
  }
}
