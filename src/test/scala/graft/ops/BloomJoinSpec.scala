package graft.ops

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Joins.bloomPrunedJoin: the explicit bloom runtime filter. Proves
  * (1) the filter is actually IN the executed plan (might_contain over a
  * subquery result against the fact side), (2) bit-identical results with
  * and without the bloom stage (no false negatives; exact join removes
  * false positives). */
class BloomJoinSpec extends SparkSpec {

  test("bloom-pruned plan carries might_contain against the fact scan") {
    val df = Joins.bloomPrunedJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    df.collect() // and it executes
  }

  test("bloom-pruned join is bit-identical to the plain join") {
    val plain = spark.newSession()
    Seq("bloom_agg", "bloom_contains").foreach { f =>
      plain.sessionState.functionRegistry.dropFunction(FunctionIdentifier(f))
      assert(!plain.catalog.functionExists(f))
    }
    val fn = SparkEntry.queries("q_join_bloom")
    val want = fn(plain, sf).collect().map(_.toString).toSeq
    val got = fn(spark, sf).collect().map(_.toString).toSeq
    assert(want.nonEmpty && got == want)
  }
}
