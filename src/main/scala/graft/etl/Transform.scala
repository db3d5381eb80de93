package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's transform stage as pure DataFrame → DataFrame functions
  * (reference: /root/reference/data-transformation.py:42-59 — projection,
  * rename, key synthesis, reorder, timestamp cast). Column lists and output
  * order are fixed, matching the Redshift COPY column lists
  * (/root/reference/coininsights.py:82,100).
  */
object Transform {

  /** Read a raw snapshot dump (single JSON array per file, multiLine) with
    * the explicit schema (reference write shape: /root/reference/data-extract.py:29-33). */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(RawSchema.schema).option("multiLine", true).json(path)

  /** Same, over an explicit file list — the incremental-ingest path reads
    * ONLY the files the manifest hasn't seen (no prefix re-scan). */
  def readRawFiles(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.schema(RawSchema.schema).option("multiLine", true).json(paths: _*)

  /** dim side: [id, name, symbol, image_url]; id is COPIED FROM symbol —
    * faithfully reproducing the reference's key choice incl. its collision
    * hazard (/root/reference/data-transformation.py:46; SURVEY.md §7.4). */
  def coinInfo(raw: DataFrame): DataFrame =
    raw.select(
      col("symbol").as("id"),
      col("name"),
      col("symbol"),
      col("image").as("image_url"),
    )

  /** fact side: 14 columns in fixed order; last_updated parsed to UTC
    * timestamp (/root/reference/data-transformation.py:53-59). */
  def coinMetrics(raw: DataFrame): DataFrame =
    raw.select(
      col("symbol").as("id"),
      col("current_price").as("current_price_usd"),
      col("market_cap"),
      col("market_cap_rank"),
      col("total_volume"),
      col("price_change_percentage_24h"),
      col("market_cap_change_percentage_24h"),
      col("high_24h"),
      col("low_24h"),
      col("price_change_24h"),
      col("circulating_supply"),
      col("total_supply"),
      col("max_supply"),
      to_timestamp(col("last_updated")).as("last_updated"),
    )
}
