package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Column profiling — the data-quality sweep a warehouse runs after every
  * load (null counts, exact cardinalities, value ranges per column). The
  * reference eyeballs its staged CSVs by hand; at 100 TB profiling must be
  * ONE distributed pass: every statistic below is a partial-aggregatable
  * expression over one scan (the multi-distinct is planner-expanded, still
  * map-side partial), finishing in a single final row that `stack` unpivots
  * to one row per column. No per-column rescans, no driver work. */
object Profile {

  private val Cols =
    Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax")

  /** One row per profiled lineitem column: total rows, nulls, exact distinct
    * count, min/max as double.
    *
    * Shape: unpivot FIRST (`stack` to (col_name, value) long form — a pure
    * map stage), then one aggregate with a single `count(distinct value)`
    * per group. N distinct aggregates in one wide agg would make Catalyst
    * Expand every row N ways through MULTIPLE exchanges (measured 4 s at
    * sf0.1); the long form's two-phase distinct shuffles only the DISTINCT
    * (column, value) pairs — the sum of per-column cardinalities, tiny next
    * to the row count at any scale. */
  def profile(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val stacked = Cols.map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ")
    li.select(expr(s"stack(${Cols.size}, $stacked) AS (col_name, v)"))
      .groupBy("col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("v")).as("n_distinct"),
        min("v").as("min_d"),
        max("v").as("max_d"))
      .orderBy("col_name")
  }

  /** Per-source DISTRIBUTION DRIFT: χ² of each source's document-length
    * histogram against the corpus-wide one — the mix monitor a training-
    * data pipeline runs per ingest batch (a source whose length profile
    * shifts is re-crawled, truncated, or spam-flooded). χ² instead of
    * PSI/KL because it needs NO log: every term is (o−e)²/e on exact
    * integer counts, and the only order-sensitive step — the sum over
    * bins — is an array_sort + left-to-right fold, so the statistic is
    * bit-identical on any engine. Scale shape: three partial-aggregated
    * rollups of one scan (corpus bins, source totals, observed cells),
    * then all arithmetic on the sources × bins AGGREGATE domain with the
    * bin histogram broadcast; nothing corpus-sized moves after the
    * groupBys. */
  def drift(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("source"), expr("n_chars div 64").as("bin"))
    val nb = d.groupBy("bin").agg(count(lit(1)).as("nb"))
    val nt = d.agg(count(lit(1)).as("n"))
    val ns = d.groupBy("source").agg(count(lit(1)).as("ns"))
    val o = d.groupBy("source", "bin").agg(count(lit(1)).as("o"))
    ns.crossJoin(broadcast(nb)).crossJoin(broadcast(nt))
      .join(o, Seq("source", "bin"), "left")
      .withColumn("od", coalesce(col("o"), lit(0L)).cast("double"))
      .withColumn("e",
        (col("ns") * col("nb")).cast("double") / col("n").cast("double"))
      .withColumn("term",
        (col("od") - col("e")) * (col("od") - col("e")) / col("e"))
      .groupBy("source")
      .agg(max("ns").as("n_docs"), count(lit(1)).as("n_bins"),
        expr("aggregate(array_sort(collect_list(struct(bin, term))), " +
          "CAST(0 AS DOUBLE), (acc, x) -> acc + x.term)").as("chi2"))
      .orderBy("source")
  }

  /** Join-key skew report: the 20 heaviest l_suppkey values with exact
    * counts and corpus share — the diagnostic that decides whether a join
    * needs salting (q_join_skew_salted) or AQE skew splitting, run BEFORE
    * the join it protects. One partial-aggregated groupBy (shuffles one
    * count per distinct key), a 1-row total broadcast back over it, and a
    * TakeOrderedAndProject top-k — no global sort of the key counts. The
    * share is one double division of two exact BIGINTs. */
  def skew(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "lineitem")
      .groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("n"))
    val total = c.agg(sum("n").as("total"))
    c.crossJoin(broadcast(total))
      .withColumn("pct", col("n").cast("double") / col("total"))
      .orderBy(col("n").desc, col("key")).limit(20)
      .select("key", "n", "pct")
  }

  /** Fixed-width value histogram of o_totalprice (50 k bins): the
    * distribution profile behind partition-sizing and skew decisions. The
    * bucket id is a pure map expression (floor of one double division — the
    * same IEEE op in any engine), so the only shuffle carries one count per
    * occupied bucket — bounded by the value range / width, independent of
    * row count. An equi-height variant would need a percentile pass first;
    * equi-width is the one-scan form. */
  def histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(floor(col("o_totalprice") / lit(50000.0)).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", col("bucket") * lit(50000.0))
      .select("bucket", "lo", "n")
      .orderBy("bucket")

  /** EQUI-DEPTH histogram — the percentile-bounded companion of the
    * equi-width `histogram` (and what an optimizer's column statistics
    * actually store): four exact-quartile boundaries computed ONCE as a
    * 1-row broadcast (the q_event_rfm threshold pattern — never a global
    * ntile window over the rows), then one scan bins every value by
    * comparison. Quartile fractions are binary-exact (0.25/0.5/0.75), so
    * both engines interpolate identical doubles and the bucket cut is
    * deterministic. Depths differ from n/4 only by boundary ties — the
    * point of checking the exact counts. */
  def histogramDepth(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    // ExactPercentile, not percentile(): same interpolated doubles, but the
    // quartile pass shuffles one row per DISTINCT price (cent-bounded
    // domain) instead of buffering every value in one aggregation buffer
    val bounds = ExactPercentile.bounds(o, col("o_totalprice"),
        Seq("q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75))
      .select("q1", "q2", "q3")
    o.select("o_totalprice").crossJoin(broadcast(bounds))
      .select(
        when(col("o_totalprice") <= col("q1"), 0L)
          .when(col("o_totalprice") <= col("q2"), 1L)
          .when(col("o_totalprice") <= col("q3"), 2L)
          .otherwise(3L).as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .orderBy("bucket")
  }
}
