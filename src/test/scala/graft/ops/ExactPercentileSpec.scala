package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** ExactPercentile must be BIT-IDENTICAL to Spark's percentile() — same
  * position p·(n−1), same bracketing keys, same interpolation operand
  * order — while planning a domain-bounded histogram instead of the
  * single all-values aggregation buffer (the 100 TB OOM hazard PlanSpec
  * pins). Checked on a continuous money column, an integer column, and
  * per-group. */
class ExactPercentileSpec extends SparkSpec {

  private val fracs = Seq("a" -> 0.25, "b" -> 0.5, "c" -> 0.75, "d" -> 0.9)

  test("global: identical doubles to percentile() on a continuous column") {
    val o = Tables.t(spark, sf, "orders")
    val got = ExactPercentile.bounds(o, col("o_totalprice"), fracs)
      .select("a", "b", "c", "d").collect().head
    val exp = o.agg(expr(
        "percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.9D))"))
      .collect().head.getSeq[Double](0)
    (0 until 4).foreach(i => assert(got.getDouble(i) == exp(i), s"frac $i"))
  }

  test("global: identical doubles to percentile() on an integer column") {
    val li = Tables.t(spark, sf, "lineitem")
      .select(col("l_suppkey").cast("long").as("v"))
    val got = ExactPercentile.bounds(li, col("v"), fracs)
      .select("a", "b", "c", "d").collect().head
    val exp = li.agg(expr("percentile(v, array(0.25D, 0.5D, 0.75D, 0.9D))"))
      .collect().head.getSeq[Double](0)
    (0 until 4).foreach(i => assert(got.getDouble(i) == exp(i), s"frac $i"))
  }

  test("grouped: identical per-group doubles and counts") {
    val o = Tables.t(spark, sf, "orders")
    val got = ExactPercentile.bounds(o, col("o_totalprice"),
        Seq("p50" -> 0.5, "p90" -> 0.9), Seq("o_orderstatus"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val exp = o.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5D)").as("p50"),
        expr("percentile(o_totalprice, 0.9D)").as("p90"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got == exp)
  }
}
