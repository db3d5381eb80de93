package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-1 upsert ("MERGE INTO target USING source ON key"), rewritten as a
  * Spark plan since plain Parquet has no MERGE (reference:
  * /root/reference/coininsights.py:115-127 and 139-161).
  *
  * Semantics the reference leaves undefined (duplicate source keys — Redshift
  * MERGE errors or picks arbitrarily) are made deterministic here: the source
  * is first deduplicated to the latest row per key (orderCols descending,
  * callers append a unique tiebreak column). Then matched rows take all source
  * columns, unmatched target rows survive unchanged, unmatched source rows are
  * inserted — expressed as a full-outer join on the key, which shuffles both
  * sides by the key and scales linearly with no driver-side state.
  */
object Upsert {

  /** Keep the latest row per key: row_number over (key, orderCols desc) = 1. */
  def latestPerKey(df: DataFrame, key: String, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Full-outer SCD1 merge; `source` AND `target` must each be unique per key
    * (targets are outputs of previous merges, so this holds inductively).
    * On a key match the source row wins unconditionally — the reference's
    * MERGE has no conditional UPDATE clause. */
  def scd1(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val tgt = target.alias("t")
    val src = source.alias("s")
    val matched: Column = col(s"s.$key").isNotNull
    val cols = target.columns.map { c =>
      when(matched, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    tgt.join(src, col(s"t.$key") === col(s"s.$key"), "full_outer").select(cols.toSeq: _*)
  }

  /** Dedup-then-merge in one call (the reference's COPY→MERGE round). */
  def merge(target: DataFrame, source: DataFrame, key: String, orderCols: Seq[String]): DataFrame =
    scd1(target, latestPerKey(source, key, orderCols), key)

  /** CDC merge: `changes` carries an `op` column — 'D' tombstones delete the
    * key, anything else ('I'/'U') upserts the payload; unmatched target rows
    * survive. The delete clause is what the reference's TRUNCATE-and-reload
    * sidesteps and every incremental CDC feed needs. Same single full-outer
    * join by key — deletes cost nothing extra. `changes` must be unique per
    * key (pre-dedup with latestPerKey). */
  def applyCdc(target: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val tgt = target.alias("t")
    // Unknown op codes fail the job loudly (distributed, at first evaluation)
    // instead of being silently upserted — a malformed CDC feed is corrupt
    // input, and "treat garbage as UPDATE" is how a feed bug becomes a
    // warehouse bug. raise_error keeps this inside codegen; no UDF.
    val checked = changes.withColumn("op",
      when(col("op").isin("I", "U", "D"), col("op"))
        .otherwise(raise_error(concat(lit("applyCdc: unknown op code: "), col("op")))))
    val chg = checked.alias("s")
    val matched: Column = col(s"s.$key").isNotNull
    val cols = target.columns.map { c =>
      when(matched, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
    }
    tgt.join(chg, col(s"t.$key") === col(s"s.$key"), "full_outer")
      .filter(!matched || col("s.op") =!= "D")
      .select(cols.toSeq: _*)
  }
}
