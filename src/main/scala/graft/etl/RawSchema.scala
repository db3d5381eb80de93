package graft.etl

import org.apache.spark.sql.types._

/** Explicit schema for the raw CoinGecko `/coins/markets` snapshot
  * (reference: /root/reference/data-extract.py:12-20 fetches it;
  * field inventory per SURVEY.md §1.2 / FIXTURES.md A1).
  *
  * Always applied explicitly — never schema inference in production paths
  * (SURVEY.md §7.4 "no silent schema drift"): a missing field fails loudly at
  * select time exactly like the reference's pandas KeyError
  * (/root/reference/data-transformation.py:45,53), while unexpected new
  * fields are ignored.
  */
object RawSchema {

  /** Nullable nested `roi` struct — flattened then discarded by the reference
    * (/root/reference/data-transformation.py:42 vs :45,53). */
  val roi: StructType = StructType(Seq(
    StructField("times", DoubleType),
    StructField("currency", StringType),
    StructField("percentage", DoubleType),
  ))

  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("image", StringType),
    StructField("current_price", DoubleType),
    StructField("market_cap", DoubleType),
    StructField("market_cap_rank", IntegerType),
    StructField("fully_diluted_valuation", DoubleType),
    StructField("total_volume", DoubleType),
    StructField("high_24h", DoubleType),
    StructField("low_24h", DoubleType),
    StructField("price_change_24h", DoubleType),
    StructField("price_change_percentage_24h", DoubleType),
    StructField("market_cap_change_24h", DoubleType),
    StructField("market_cap_change_percentage_24h", DoubleType),
    StructField("circulating_supply", DoubleType),
    StructField("total_supply", DoubleType),
    StructField("max_supply", DoubleType),
    StructField("ath", DoubleType),
    StructField("ath_change_percentage", DoubleType),
    StructField("ath_date", StringType),
    StructField("atl", DoubleType),
    StructField("atl_change_percentage", DoubleType),
    StructField("atl_date", StringType),
    StructField("roi", roi),
    StructField("last_updated", StringType),
  ))
}
