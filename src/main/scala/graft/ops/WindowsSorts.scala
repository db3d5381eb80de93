package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Group B window functions, top-k, global sort and set operations
  * (SURVEY.md §2.2). Window partitions are keyed on high-cardinality columns
  * (brand / custkey / user_id) so state stays bounded per partition at scale;
  * top-k uses orderBy+limit which Spark plans as TakeOrderedAndProject
  * (per-partition heap, no global sort).
  */
object WindowsSorts {

  /** rank/dense_rank/row_number: `market_cap_rank` reproduction
    * (SURVEY.md §2.1 — ranking arrives as data in the reference). */
  def rank(s: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc)
    val stable = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    t(s, dir, "part")
      .withColumn("rnk", org.apache.spark.sql.functions.rank().over(byPrice).cast("long"))
      .withColumn("rn", row_number().over(stable).cast("long"))
      .filter(col("rn") <= 10)
      .select("p_brand", "p_partkey", "p_retailprice", "rnk", "rn")
      .orderBy("p_brand", "rn")
  }

  /** Window navigation surface: first/last over the full partition frame,
    * quartile ntile, percent_rank — the remaining warehouse window family.
    * The ordering key (o_orderdate, o_orderkey) is unique per customer, so
    * every function is deterministic. */
  def navigation(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "orders")
      .withColumn("first_price", first(col("o_totalprice")).over(full))
      .withColumn("last_price", last(col("o_totalprice")).over(full))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .select("o_custkey", "o_orderkey", "o_totalprice",
        "first_price", "last_price", "quartile", "pct_rank")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Running sum with an explicit frame (decimal-accumulated for the oracle). */
  def running(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("running_total",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "o_totalprice", "running_total")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Value-RANGE window frame: per customer, total of orders within the 30
    * days ending at the current order (the sliding-window-by-value flavor;
    * rowsBetween is demonstrated by `running`). RANGE includes all peers of
    * a tied ordering value, so ties don't break determinism. */
  def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    val days = datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
      .cast("long")
    val w = Window.partitionBy("o_custkey").orderBy(col("days")).rangeBetween(-30, 0)
    t(s, dir, "orders")
      .withColumn("days", days)
      .withColumn("sum_30d",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .select("o_custkey", "o_orderkey", "days", "o_totalprice", "sum_30d")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** lag(): 24h-delta reproduction (`price_change_24h` analog, SURVEY.md §2.1). */
  def lagDelta(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .select(col("event_id"), col("user_id"), nsToMs("ts").as("ts_ms"),
        col("value"), col("prev_value"),
        (col("value") - col("prev_value")).as("delta"))
      .orderBy("user_id", "ts_ms", "event_id")
  }

  /** NTILE bucketing: quartiles of order value WITHIN each priority class,
    * then one summary row per (priority, quartile) — the "spend quartile"
    * report shape. The window partitions on o_orderpriority (each partition
    * sorts independently; no global single-partition window — the global
    * form of this report is q_event_rfm's broadcast-threshold pattern), and
    * the (o_totalprice, o_orderkey) ordering key makes equal prices
    * deterministic in both engines. NTILE's uneven-bucket rule (earlier
    * buckets take the remainder) is identical in Spark and DuckDB. */
  def ntileQuartiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy("o_orderpriority", "quartile")
      .agg(count(lit(1)).as("n"),
        dsum2(col("o_totalprice")).as("total"),
        min("o_totalprice").as("lo"),
        max("o_totalprice").as("hi"))
      .orderBy("o_orderpriority", "quartile")
  }

  /** Relative-standing window surface: percent_rank and cume_dist of each
    * part's price WITHIN its brand (same partitioned-window family as
    * `rank` — per-brand state, never a global window). Both are exact
    * rational definitions — (rank−1)/(n−1) and rows_at_or_below/n — and the
    * one double division per row is identically rounded in both engines.
    * Output keeps only each brand's extremes to stay bounded. */
  def percentRank(s: SparkSession, dir: String): DataFrame = {
    val byPrice = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice"), col("p_partkey"))
    t(s, dir, "part")
      .withColumn("pr", percent_rank().over(byPrice))
      .withColumn("cd", cume_dist().over(byPrice))
      .filter(col("pr") <= 0.02 || col("pr") >= 0.98)
      .select("p_brand", "p_partkey", "p_retailprice", "pr", "cd")
      .orderBy("p_brand", "p_partkey")
  }

  /** Top-N by measure → TakeOrderedAndProject (no global sort at scale). */
  def topk(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Global total order (range-partitioned sort). */
  def sortGlobal(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))

  /** INTERSECT (distinct semantics in both Spark and the oracle). */
  def intersect(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** EXCEPT (distinct semantics). */
  def except(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.select("o_custkey")
      .except(o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
      .orderBy("o_custkey")
  }
}
