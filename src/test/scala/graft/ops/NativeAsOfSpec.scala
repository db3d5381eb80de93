package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft.plans.AsOf — the native LogicalPlan+Strategy+Exec merge as-of
  * join. Pins (1) the executed plan actually uses AsOfJoinExec with exactly
  * one exchange per side, (2) row-for-row identity with the window-form
  * asof2 on the full fixture, (3) correctness on a hand-built fixture with
  * nulls, unmatched probes, and (key,time) ties. */
class NativeAsOfSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of plans as AsOfJoinExec with one exchange per side") {
    val df = Joins.asofNative(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(1500))
    // the output orderBy adds a range exchange; the join itself gets one
    // hash exchange per side — no union-relation, no window
    assert(!p.contains("Window"), p.take(1500))
  }

  test("native as-of equals the window-form asof2 row for row") {
    val native = Joins.asofNative(spark, sf).collect().map(_.toString).toSeq
    val window = Joins.asof2(spark, sf).collect().map(_.toString).toSeq
    assert(native.nonEmpty && native == window)
  }

  test("timestamp time columns join natively (micros-backed, same merge loop)") {
    val probes = Seq((1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 09:00:00"))
      .toDF("p_id", "k", "ts_s")
      .select(col("p_id"), col("k"), col("ts_s").cast("timestamp").as("t"))
    val quotes = Seq((1L, "2024-01-01 09:30:00", 7.0), (1L, "2024-01-01 11:00:00", 9.0))
      .toDF("q_key", "q_ts_s", "q_val")
      .select(col("q_key"), col("q_ts_s").cast("timestamp").as("q_ts"), col("q_val"))
    val out = graft.plans.AsOf.join(probes, quotes, "k", "t", "q_key", "q_ts")
      .orderBy("p_id").select("p_id", "q_val").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    // 10:00 probe sees the 09:30 quote; 09:00 probe predates every quote
    assert(out.toSeq == Seq((1L, 7.0), (2L, null)))
  }

  test("mixed time representations are rejected, not silently unit-mismatched") {
    val probes = Seq((1L, 1L, 100L)).toDF("p_id", "k", "t")
    val quotes = Seq((1L, "2024-01-01 09:30:00", 7.0))
      .toDF("q_key", "q_ts_s", "q_val")
      .select(col("q_key"), col("q_ts_s").cast("timestamp").as("q_ts"), col("q_val"))
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(probes, quotes, "k", "t", "q_key", "q_ts")
    }
    assert(e.getMessage.contains("share one type"))
  }

  test("hand fixture: unmatched probes null, inclusive ties, last tiebreak wins") {
    val probes = Seq(
      (1L, 1L, 100L), // key 1: quote at t=100 exactly (inclusive)
      (2L, 2L, 50L),  // key 2: before any quote -> null
      (3L, 3L, 999L)  // key 3: no quotes at all -> null
    ).toDF("p_id", "p_key", "p_ts")
      .select(col("p_id"), col("p_key").as("k"), col("p_ts").as("t"))
    val quotes = Seq(
      (1L, 100L, 7.0, 1L),  // tie on (key,time): q_id 2 must win (last in order)
      (1L, 100L, 9.0, 2L),
      (1L, 150L, 5.0, 3L),  // after the probe: unusable
      (2L, 60L, 4.0, 4L)    // after key-2's probe time
    ).toDF("q_key", "q_ts", "q_val", "q_id")
    val out = graft.plans.AsOf.join(
        probes, quotes, "k", "t", "q_key", "q_ts", rightTieBreak = Some("q_id"))
      .orderBy("p_id")
      .select("p_id", "q_val")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 9.0), (2L, null), (3L, null)))
  }
}
