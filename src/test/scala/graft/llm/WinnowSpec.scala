package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property tests for the winnowing pair detector (q_dedup_winnow):
  *
  *  1. The WINNOWING GUARANTEE (Schleimer/Wilkerson/Aho SIGMOD'03): any
  *     shared substring of length ≥ WinnowWindow + ShingleLen - 1 chars
  *     produces at least one shared fingerprint — checked on crafted docs.
  *  2. PARTIAL-duplicate sensitivity: a paragraph pasted into an otherwise
  *     unrelated document is found by winnowing but INVISIBLE to the
  *     whole-document set-semantic detector at its 0.95 Jaccard threshold
  *     — the reason this operator exists alongside minhash/simhash.
  */
class WinnowSpec extends SparkSpec {

  private val root = "/tmp/graft_winnow_spec"

  // distinct character material so the only overlap is the one we plant
  private def noise(seed: Char, n: Int): String =
    (0 until n).map(i => ('a' + ((seed + i * 7 + i * i * 3) % 26)).toChar)
      .grouped(6).map(_.mkString).mkString(" ")

  private def writeDocs(docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$root/documents.parquet")
  }

  test("shared run >= guarantee length yields a reported pair; disjoint docs yield none") {
    val shared = "the planted common paragraph that both documents quote verbatim"
    assert(shared.length >= Dedup.WinnowWindow + TextHash.ShingleLen - 1)
    writeDocs(Seq(
      1L -> (noise('q', 200) + " " + shared + " " + noise('z', 200)),
      2L -> (noise('k', 180) + " " + shared + " " + noise('m', 220)),
      3L -> noise('w', 400)))
    val pairs = Dedup.winnowPairs(spark, root).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)),
      s"expected exactly the planted pair, got ${pairs.mkString(", ")}")
    // a long shared run shares MANY consecutive window minima, not just one
    assert(pairs.head.getLong(2) >= Dedup.WinnowMinShared)
  }

  test("a pasted paragraph is caught by winnowing but invisible to whole-doc near-dup") {
    val paragraph = noise('c', 120)
    writeDocs(Seq(
      1L -> (noise('a', 400) + " " + paragraph),
      2L -> (noise('t', 400) + " " + paragraph)))
    val winnow = Dedup.winnowPairs(spark, root).collect()
    assert(winnow.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)),
      "winnowing must flag the pasted paragraph")
    // whole-document set semantics: ~23% token overlap, far below the 0.95
    // verify threshold — the pair correctly does NOT count as a near-dup
    assert(Dedup.jaccard(spark, root).count() === 0,
      "whole-doc jaccard at 0.95 must not flag a partial overlap")
  }

  test("the df cap suppresses corpus-wide boilerplate pairs") {
    val boiler = "standard footer text appended to every single document here"
    // boilerplate in MORE than WinnowMaxDf docs, otherwise-unrelated bodies
    val n = Dedup.WinnowMaxDf + 5
    writeDocs((1 to n).map(i =>
      i.toLong -> (noise(('a' + i % 26).toChar, 300) + " " + boiler)))
    assert(Dedup.winnowPairs(spark, root).count() === 0,
      "fingerprints shared by > WinnowMaxDf docs must not generate pairs")
  }
}
