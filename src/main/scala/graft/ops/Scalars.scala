package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Group B scalar-function surface (SURVEY.md §2.2): string, date, math,
  * conditional and JSON functions — all built-in Catalyst expressions, fully
  * codegen'd (no UDFs, per SURVEY.md §2.2 UDF note).
  */
object Scalars {

  /** String functions (symbol-normalization class,
    * /root/reference/data-transformation.py:46-47). */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey"),
      upper(col("c_name")).as("uname"),
      lower(col("c_mktsegment")).as("lseg"),
      substring(col("c_name"), 1, 8).as("prefix"),
      concat_ws("|", col("c_mktsegment"), col("c_name")).as("tag"),
      length(col("c_name")).cast("long").as("name_len"),
      trim(lit("  x  ")).as("trimmed"),
    ).orderBy("c_custkey")

  /** Date/timestamp functions (ISO-8601 handling class,
    * /root/reference/data-transformation.py:56). */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      dayofmonth(col("o_orderdate")).cast("long").as("d"),
      quarter(col("o_orderdate")).cast("long").as("q"),
      trunc(col("o_orderdate"), "quarter").as("q_start"),
      datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
        .cast("long").as("days_since"),
      last_day(col("o_orderdate").cast("date")).as("month_end"),
    ).orderBy("o_orderkey")

  /** Math/arithmetic ((high−low)/low class, SURVEY.md §2.2). Per-row double
    * ops are IEEE-deterministic; `charge` is staged in DECIMAL because
    * round(double) semantics differ between engines on half-way values
    * (Spark rounds the shortest decimal repr, DuckDB the binary value). */
  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice").cast("decimal(12,2)")
          * (lit(1.0) + col("l_tax")).cast("decimal(8,2)")
          * (lit(1.0) - col("l_discount")).cast("decimal(8,2)"), 2)
        .cast("double").as("charge"),
      abs(col("l_extendedprice") - col("l_quantity") * lit(1000.0)).as("absdiff"),
      ((col("l_extendedprice") - col("l_quantity")) / col("l_quantity")).as("pct"),
      sqrt(col("l_extendedprice")).as("root"),
      floor(col("l_discount") * 100).cast("long").as("disc_pct"),
    ).orderBy("l_orderkey", "l_linenumber")

  /** CASE WHEN classification. */
  def caseWhen(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("bucket",
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 200000, "mid")
          .otherwise("big"))
      .groupBy("bucket", "o_orderstatus")
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket", "o_orderstatus")

  /** JSON extraction over events.props (raw-tier class, SURVEY.md §2.1 O6/O7). */
  def jsonFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
    ).orderBy("event_id")
}
