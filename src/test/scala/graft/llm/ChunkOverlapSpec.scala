package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Chunk-granularity containment (Curation.chunkOverlap): an aligned
  * prefix-copy pair is detected with containment 1.0, unrelated docs pair
  * with nothing, and the absolute df cap drops boilerplate hashes BEFORE
  * the self-join so a large identical-chunk class produces zero pairs
  * (bounded fan-out — the WinnowMaxDf rationale at chunk granularity). */
class ChunkOverlapSpec extends SparkSpec {

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private val boiler = toks("b", 64)

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("overlapspec").toString
    val base = Seq(
      Row(1L, toks("a", 128)),                                // 3 chunks
      Row(2L, (0 until 120).map(i => s"a$i").mkString(" ")),  // aligned prefix of doc 1: 2 chunks
      Row(3L, toks("z", 100)))                                // unrelated
    // 25 identical single-chunk docs: chunk df 25 > OverlapMaxDf 20
    val rows = java.util.Arrays.asList(
      base ++ (100L until 125L).map(i => Row(i, boiler)): _*)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val pairs =
    Curation.chunkOverlap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))

  test("aligned prefix copy is reported with containment 1.0") {
    val p = pairs.filter(x => x._1 == 1L && x._2 == 2L)
    assert(p.length == 1, pairs.mkString(", "))
    assert(p.head._3 == 2L)   // both of doc 2's chunks appear in doc 1
    assert(p.head._4 == 1.0)
  }

  test("unrelated docs produce no pair") {
    assert(!pairs.exists(x => x._1 == 3L || x._2 == 3L))
  }

  test("df cap suppresses the boilerplate class: no pairs among the 25 copies") {
    // without the cap this class alone would emit 25·24/2 = 300 pairs
    assert(!pairs.exists(x => x._1 >= 100L || x._2 >= 100L))
    assert(pairs.length == 1)
  }
}
