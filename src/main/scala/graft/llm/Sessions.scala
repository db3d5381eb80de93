package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Event-time operators over `events` (SURVEY.md §2.2 Group C): gap-based
  * sessionization and tumbling-window aggregation. Batch forms here; the
  * streaming twins (session_window / window + watermark) live in
  * graft.streaming.StreamTwins with identical grouping semantics.
  */
object Sessions {

  /** Session gap: 30 minutes, in nanoseconds (events.ts is Long ns). */
  val GapNs: Long = 1800L * 1000 * 1000 * 1000

  /** Gap-based sessionization: a new session starts when the same user is
    * idle > 30 min. lag + running count of session starts — one shuffle by
    * user_id, linear per partition. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byTs))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > GapNs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(run))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        expr("min(ts) div 1000000").as("start_ms"),
        expr("max(ts) div 1000000").as("end_ms"),
        dsum2(col("value")).as("total_value"))
      .orderBy("user_id", "session_id")
  }

  /** Tumbling 1-hour window aggregation by event_type, via the native
    * window() bucketing (streaming-compatible grouping). */
  def tumbling(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("tsc", nsToTs("ts"))
      .groupBy(window(col("tsc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("total"))
      .select(
        unix_millis(col("window.start")).as("hour_ms"),
        col("event_type"), col("n"), col("total"))
      .orderBy("hour_ms", "event_type")
}
