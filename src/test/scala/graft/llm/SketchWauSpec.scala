package graft.llm

import graft.SparkSpec

/** Approximate WAU (Sessions.activeUsersSketch) vs the exact windowed
  * distinct (Sessions.activeUsers): same day grid, estimates within HLL
  * error of the exact counts. */
class SketchWauSpec extends SparkSpec {

  test("sketch WAU covers the same days and tracks exact WAU within HLL error") {
    val exact = Sessions.activeUsers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val approx = Sessions.activeUsersSketch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(approx.keySet == exact.keySet)
    // default lgK=12 HLL relative error ~1.6%; allow 5% + small-count slack
    approx.foreach { case (day, est) =>
      val ex = exact(day).toDouble
      assert(math.abs(est - ex) <= math.max(3.0, 0.05 * ex),
        s"day $day: est $est vs exact $ex")
    }
  }
}
