package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The reference DAG end-to-end, Spark-native (reference:
  * /root/reference/coininsights.py:358-363 sequencing). One driver program
  * replaces scheduler + Lambdas + warehouse:
  *
  *   raw JSON → transform ×2 → CSV stage → COPY(read) → MERGE(upsert rewrite)
  *   → TRUNCATE stage → archive raw
  *
  * Layout under `root`:
  *   raw_data/            incoming snapshot dumps (O2)
  *   transformed_data/coin_info, coin_metrics   CSV stage (O13/O14)
  *   warehouse/dim_coin_info, fact_coin_metrics parquet targets (O15)
  *   archive/             processed raw files (O18/O19)
  *
  * Each target write goes through the stage→merge→swap pattern, so a crashed
  * run never leaves a half-written target (the reference gets this from
  * Redshift transactionality; we get it from write-new-dir + atomic swap).
  */
class Pipeline(spark: SparkSession, root: String) {
  val rawDir = s"$root/raw_data"
  val infoStage = s"$root/transformed_data/coin_info"
  val metricsStage = s"$root/transformed_data/coin_metrics"
  val dimTarget = s"$root/warehouse/dim_coin_info"
  val factTarget = s"$root/warehouse/fact_coin_metrics"
  val archiveDir = s"$root/archive"

  /** Transform stage (O7–O13): every raw file under raw_data → 2 CSV stages.
    * Like the reference, reprocesses the whole prefix each run
    * (/root/reference/data-transformation.py:32); idempotence comes from the
    * downstream merge. */
  def transform(): Unit = {
    if (!Lake.exists(spark, rawDir)) return
    val raw = Transform.readRaw(spark, rawDir)
    writeCsv(Transform.coinInfo(raw), infoStage)
    writeCsv(Transform.coinMetrics(raw), metricsStage)
  }

  private def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", true).option("quote", "\"")
      .csv(path)

  private def readCsv(path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", true).option("quote", "\"").schema(schema).csv(path)

  /** Load + merge one table (O14+O15): stage CSV → dedup to latest per id →
    * SCD1 merge into the parquet target → atomic swap. */
  private def loadMerge(stage: String, target: String,
                        schema: org.apache.spark.sql.types.StructType,
                        orderCols: Seq[String]): Unit = {
    if (!Lake.exists(spark, stage)) return
    val src = readCsv(stage, schema)
    val merged =
      if (Lake.exists(spark, s"$target/_SUCCESS"))
        Upsert.merge(spark.read.parquet(target), src, "id", orderCols)
      else Upsert.latestPerKey(src, "id", orderCols)
    // write-new-then-swap: the reference's stage→MERGE gives atomicity via
    // Redshift transactions; on a plain object store we write to a fresh dir
    // and swap directories so readers never see a partial target.
    val tmp = s"$target.tmp"
    Lake.truncate(spark, tmp)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    Lake.truncate(spark, target)
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(target))
  }

  /** Full run: transform → load/merge both tables → truncate stages →
    * archive raw (O16–O19 + DAG fan-in, /root/reference/coininsights.py:358-363). */
  def run(): Unit = {
    transform()
    import org.apache.spark.sql.types._
    val infoSchema = StructType(Seq(
      StructField("id", StringType), StructField("name", StringType),
      StructField("symbol", StringType), StructField("image_url", StringType)))
    val metricsSchema = StructType(
      StructField("id", StringType) +:
      Seq("current_price_usd", "market_cap").map(StructField(_, DoubleType)) ++:
      StructField("market_cap_rank", IntegerType) +:
      Seq("total_volume", "price_change_percentage_24h",
        "market_cap_change_percentage_24h", "high_24h", "low_24h",
        "price_change_24h", "circulating_supply", "total_supply",
        "max_supply").map(StructField(_, DoubleType)) :+
      StructField("last_updated", TimestampType))
    // dim has no timestamp: dedup/merge tie-breaks on name for determinism
    loadMerge(infoStage, dimTarget, infoSchema, Seq("name"))
    loadMerge(metricsStage, factTarget, metricsSchema, Seq("last_updated"))
    Lake.truncate(spark, infoStage)
    Lake.truncate(spark, metricsStage)
    Lake.archive(spark, rawDir, archiveDir)
  }

  def dim(): DataFrame = spark.read.parquet(dimTarget)
  def fact(): DataFrame = spark.read.parquet(factTarget)
}
