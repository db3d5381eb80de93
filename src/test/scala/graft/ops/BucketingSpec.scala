package graft.ops

import graft.SparkSpec

/** Bucketing evidence for the 100 TB posture (SCALE.md): two tables bucketed
  * on the join key co-locate, so the join plans with NO shuffle exchange on
  * either side — the pre-partitioning pattern for repeated big-big joins. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    // a fresh metastore may not know tables whose dirs survive from an
    // earlier JVM — clear the locations too
    Seq("b_orders", "b_lineitem").foreach { t =>
      graft.etl.Lake.truncate(s, s"/tmp/graft_warehouse/$t")
    }
    s.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    s.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = s.table("b_lineitem").hint("MERGE")
      .join(s.table("b_orders"),
        s.table("b_lineitem")("l_orderkey") === s.table("b_orders")("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
    assert(joined.count() == 6000)

    // contrast: the same join on raw parquet shuffles both sides
    val raw = s.read.parquet(s"$sf/lineitem.parquet").hint("MERGE")
      .join(s.read.parquet(s"$sf/orders.parquet"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
    assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
