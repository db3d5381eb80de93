package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.Tables._

/** Mergeable HLL sketches (Aggregates.sketchMerge): the union of
  * per-(priority, year) partial sketches must equal the sketch built
  * directly over each priority's keys — the property that makes
  * pre-aggregated sketches SERVABLE (any rollup of partials answers the
  * query the raw scan would) — and the estimate must track the exact
  * distinct count within HLL error. */
class SketchMergeSpec extends SparkSpec {

  private def dir = sf

  test("union of partial sketches equals the directly built sketch") {
    val merged = Aggregates.sketchMerge(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).cast("long").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == direct, s"merged=$merged direct=$direct")
  }

  test("estimates track the exact distinct counts within HLL error") {
    val merged = Aggregates.sketchMerge(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val est = merged(k).toDouble
      assert(math.abs(est - n) <= math.max(4.0, 0.05 * n),
        s"$k: estimate $est vs exact $n")
    }
  }
}
