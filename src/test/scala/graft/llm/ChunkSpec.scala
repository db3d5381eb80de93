package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Context-window chunking semantics (Curation.chunkRows / chunkDedup):
  * stride coverage with no fully-contained straggler chunk (ADVICE r4),
  * total null handling, and the chunk-granularity dedup property the chunk
  * hash exists for — shared boilerplate collapses across DIFFERENT parents.
  */
class ChunkSpec extends SparkSpec {

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  // 64-token boilerplate paragraph shared by docs 40 and 50
  private val boiler = toks("b", 64)

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("chunkspec").toString
    val rows = java.util.Arrays.asList(
      Row(10L, toks("a", 120)), // starts [0, 56]: 112 would be contained
      Row(20L, toks("c", 121)), // starts [0, 56, 112]: 112 adds token 120
      Row(30L, toks("d", 64)),  // exactly one chunk
      Row(40L, toks("p", 56) + " " + boiler), // boilerplate at start 56
      Row(50L, toks("q", 56) + " " + boiler), // same boilerplate, other parent
      Row(60L, null)            // null text: one empty chunk, not n_tokens=-1
    )
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val chunks =
    Curation.chunkTokens(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("starts stop once a chunk adds no new tokens (no contained straggler)") {
    assert(chunks.filter(_._1 == 10L).map(c => (c._3, c._4)).toSeq ==
      Seq((0L, 64L), (56L, 64L)))
    assert(chunks.filter(_._1 == 20L).map(c => (c._3, c._4)).toSeq ==
      Seq((0L, 64L), (56L, 64L), (112L, 9L)))
    assert(chunks.filter(_._1 == 30L).map(c => (c._3, c._4)).toSeq ==
      Seq((0L, 64L)))
  }

  test("every token of every doc is covered by some chunk") {
    for (doc <- Seq(10L -> 120L, 20L -> 121L, 30L -> 64L)) {
      val covered = chunks.filter(_._1 == doc._1)
        .flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered == (0L until doc._2).toSet, s"doc ${doc._1}")
    }
  }

  test("null text yields one total chunk, never negative n_tokens") {
    val nullDoc = chunks.filter(_._1 == 60L)
    assert(nullDoc.length == 1)
    assert(nullDoc.head._4 == 1L) // split('', ' ') = [''] — 1 empty token
    assert(chunks.forall(_._4 > 0))
  }

  test("chunk dedup collapses cross-doc boilerplate while parents survive") {
    val dedup = Curation.chunkDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the shared 64-token paragraph (start 56 in docs 40 and 50) is ONE group
    val shared = dedup.filter(d => d._2 == 40L && d._3 == 2L && d._4 == 2L)
    assert(shared.length == 1, dedup.mkString(", "))
    // doc-level exact dedup would keep both parents (texts differ)
    val texts = Dedup.exact(spark, dir).collect()
    assert(texts.length == 6, "all six docs are distinct at doc granularity")
  }
}
