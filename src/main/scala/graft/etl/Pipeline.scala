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
  * Each target write goes through stage → merge → versioned publish
  * (Warehouse.publish manifest-pointer commit), so a crashed or concurrent
  * run never leaves a half-written target (the reference gets this from
  * Redshift transactionality; we get it from immutable version dirs + one
  * atomic pointer swap). Raw files are processed incrementally via the
  * processed-files Manifest.
  */
class Pipeline(spark: SparkSession, root: String) {
  val rawDir = s"$root/raw_data"
  val infoStage = s"$root/transformed_data/coin_info"
  val metricsStage = s"$root/transformed_data/coin_metrics"
  val dimTarget = s"$root/warehouse/dim_coin_info"
  val factTarget = s"$root/warehouse/fact_coin_metrics"
  val archiveDir = s"$root/archive"
  val manifestDir = s"$root/manifest"

  /** Raw files not yet recorded in the processed-files manifest. */
  def newRawFiles(): Seq[String] = {
    val done = Manifest.processed(spark, manifestDir)
    Lake.list(spark, rawDir)
      .filterNot(p => done.contains(new org.apache.hadoop.fs.Path(p).getName))
  }

  /** Transform stage (O7–O13): NEW raw files under raw_data → 2 CSV stages.
    * Unlike the reference — which re-transforms the whole prefix every run
    * (/root/reference/data-transformation.py:32) — the manifest skips files
    * already staged, so a re-run reads only what arrived since (at 100 TB
    * that is the difference between a nightly full-lake scan and an
    * incremental one). Stage writes APPEND; the stage is truncated after a
    * successful merge, and the dedup-first merge makes the crash paths
    * exactly-once in effect (see Manifest scaladoc). */
  def transform(): Unit = {
    val fresh = newRawFiles()
    if (fresh.isEmpty) return
    val raw = Transform.readRawFiles(spark, fresh)
    writeCsv(Transform.coinInfo(raw), infoStage)
    writeCsv(Transform.coinMetrics(raw), metricsStage)
    Manifest.record(spark, manifestDir,
      fresh.map(p => new org.apache.hadoop.fs.Path(p).getName))
  }

  private def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append)
      .option("header", true).option("quote", "\"")
      .csv(path)

  private def readCsv(path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", true).option("quote", "\"").schema(schema).csv(path)

  /** Load + merge one table (O14+O15): stage CSV → dedup to latest per id →
    * SCD1 merge into the current warehouse version → publish a NEW version
    * via the manifest-pointer commit (Warehouse.publish): readers always see
    * a complete snapshot, and two interleaved runs both leave a consistent
    * target (last pointer swap wins — the reference got this from Redshift
    * transactionality). */
  private def loadMerge(stage: String, target: String,
                        schema: org.apache.spark.sql.types.StructType,
                        orderCols: Seq[String]): Unit = {
    if (!Lake.exists(spark, stage)) return
    Warehouse.upsertPublish(spark, target, readCsv(stage, schema), "id", orderCols)
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
    // single-orchestrator context: the previous version has no readers once
    // the run's own merge finished, so GC it here; a multi-tenant deployment
    // would defer vacuum until readers drain.
    Warehouse.vacuum(spark, dimTarget)
    Warehouse.vacuum(spark, factTarget)
    Lake.archive(spark, rawDir, archiveDir)
  }

  def dim(): DataFrame = Warehouse.read(spark, dimTarget)
  def fact(): DataFrame = Warehouse.read(spark, factTarget)
}
