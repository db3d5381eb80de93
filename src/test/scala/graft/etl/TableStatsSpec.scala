package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Count-once/serve-many row counts (TableStats): the second call must be
  * served from the published manifest (not a rescan), and a corpus
  * rewritten in place must get a fresh count (content-signature keying). */
class TableStatsSpec extends SparkSpec {

  private def writeDocs(dir: String, n: Int): Unit = {
    val rows = (0 until n).map(i => Row(i.toLong, s"doc $i")).toList
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("count is recorded once and served from the manifest thereafter") {
    val dir = java.nio.file.Files.createTempDirectory("tablestats").toString
    writeDocs(dir, 7)
    assert(TableStats.rowCount(spark, dir, "documents") == 7L)
    // poison the manifest for the CURRENT signature: if the second call is
    // served from the manifest (and not a rescan) it must return the poison
    val target = TableStats.statsTarget(spark, dir, "documents")
    val poisoned = spark.createDataFrame(
      java.util.Collections.singletonList(Row(99L)),
      StructType(Seq(StructField("n_rows", LongType, nullable = false))))
    Warehouse.publish(spark, target, poisoned)
    assert(TableStats.rowCount(spark, dir, "documents") == 99L,
      "second call rescanned the corpus instead of reading the manifest")
  }

  test("a rewritten corpus gets a fresh count, not a stale manifest") {
    val dir = java.nio.file.Files.createTempDirectory("tablestats2").toString
    writeDocs(dir, 5)
    assert(TableStats.rowCount(spark, dir, "documents") == 5L)
    Thread.sleep(1100) // parquet mtime granularity can be a full second
    writeDocs(dir, 11)
    assert(TableStats.rowCount(spark, dir, "documents") == 11L)
  }
}
