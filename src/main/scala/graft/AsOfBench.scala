package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev A/B: native merge as-of join vs the union+window form at BEYOND-
  * fixture scale. At 100 k events the two are at parity (r5 measurement) —
  * the native operator exists for the shuffle-volume gap, which only opens
  * when the unioned super-relation stops fitting the page cache. This blows
  * events up `mult`× by replicating rows under DISTINCT user_id offsets
  * (keys scale with rows, per-key runs stay fixture-length — the realistic
  * growth direction) and times both forms.
  *
  * Usage: runMain graft.AsOfBench [sfDir] [mult] [reps]
  */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val mult = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Verify.session("local[32]", "32")

    val ev0 = Tables.t(spark, dir, "events")
      .select("event_id", "user_id", "ts", "event_type", "value")
    val maxUser = ev0.agg(max("user_id")).collect()(0).getLong(0) + 1L
    val ev = (0 until mult).map { i =>
      ev0.select(
        (col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
        (col("user_id") + lit(i * maxUser)).as("user_id"),
        col("ts"), col("event_type"), col("value"))
    }.reduce(_ unionByName _).localCheckpoint()
    println(s"[asofbench] events rows: ${ev.count()} (${mult}x)")

    val trades = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value").as("t_value"), col("ts"))
    val quotes = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("q_user_id"), col("ts").as("q_ts"),
        col("value").as("q_value"), col("event_id").as("q_event_id"))

    def nativeForm(): DataFrame =
      graft.plans.AsOf.join(trades, quotes,
        "user_id", "ts", "q_user_id", "q_ts", rightTieBreak = Some("q_event_id"))
        .select(col("event_id"), col("q_ts").as("out_ts"), col("q_value").as("out_val"))

    def windowForm(): DataFrame = {
      val q = ev.filter(col("event_type") === "view").select(
        col("user_id"), col("ts"), lit(0).as("side"), col("event_id"),
        lit(null).cast("double").as("t_value"),
        col("ts").as("q_ts"), col("value").as("q_value"))
      val t = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("ts"), lit(1).as("side"), col("event_id"),
        col("value").as("t_value"),
        lit(null).cast("long").as("q_ts"), lit(null).cast("double").as("q_value"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("side"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      q.unionByName(t)
        .withColumn("last_q_ts", last(col("q_ts"), ignoreNulls = true).over(w))
        .withColumn("last_q_value", last(col("q_value"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("last_q_ts").as("out_ts"),
          col("last_q_value").as("out_val"))
    }

    // timed action must CONSUME the join outputs: under a bare count()
    // Catalyst prunes the window expressions out of the window form (the
    // custom native node admits no pruning), and the A/B would time a
    // union+filter against a full merge join
    def run(df: DataFrame): (Long, Double) = {
      val r = df.agg(count(col("out_ts")).as("n"),
        sum(col("out_val")).as("s")).collect()(0)
      (r.getLong(0), r.getDouble(1))
    }
    def time(tag: String, mk: () => DataFrame): Unit = {
      run(mk()) // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val (n, sum) = run(mk())
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[asofbench] $tag: $dt%.2f s, $n matched, checksum $sum%.3f")
        dt
      }.sorted
      println(f"[asofbench] $tag MEDIAN: ${ts(ts.length / 2)}%.2f s")
    }
    time("native", nativeForm)
    time("window", windowForm)
    spark.stop()
  }
}
