package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the round-5 sampling/chunking additions: approx percentiles
  * track the exact ones, target-mix rates hit the fair share, sentence
  * chunks respect boundaries and the soft budget. */
class MixChunkSpec extends SparkSpec {

  test("approx percentiles honor the sketch's RANK-accuracy contract") {
    // GK accuracy=1000 bounds the RANK error (≤ n/1000-ish), not the value
    // error — pin the estimate by the fraction of group values at or below
    // it, which must sit within 1% of the target quantile.
    val approx = graft.ops.Aggregates.approxPercentiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val vals = graft.Tables.t(spark, sf, "orders")
      .select(col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(approx.keySet == vals.keySet)
    approx.foreach { case (k, (a50, a90)) =>
      val v = vals(k)
      def rankFrac(x: Double) = v.count(_ <= x).toDouble / v.length
      assert(math.abs(rankFrac(a50) - 0.5) <= 0.01, s"$k p50 rank ${rankFrac(a50)}")
      assert(math.abs(rankFrac(a90) - 0.9) <= 0.01, s"$k p90 rank ${rankFrac(a90)}")
    }
  }

  test("target mix: over-represented sources cut to fair share, others keep all") {
    val rows = Curation.targetMix(spark, sf).collect()
    val total = rows.head.getLong(2)
    val fair = total / rows.length
    rows.foreach { r =>
      val (n, rate, kept) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(rate <= 1000000L && rate > 0L)
      if (n <= fair) assert(rate == 1000000L && kept == n,
        s"under-represented ${r.getString(0)} must keep everything")
      else assert(kept <= fair && kept >= fair - 1,
        s"over-represented ${r.getString(0)}: kept $kept vs fair $fair")
    }
  }

  test("sentence chunking splits on terminators, never mid-sentence") {
    val s = spark
    import s.implicits._
    val dir = s"/tmp/graft_sent_fixture_${System.nanoTime()}"
    Seq((1L, "Alpha beta. Gamma delta epsilon! Zeta?"),
      (2L, "No terminator here at all"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Curation.chunkSentences(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // doc 1: three sentences of 2, 3, 1 tokens; doc 2: one run; doc 3 (null
    // text → empty string) produces no sentence rows
    assert(rows.count(_._1 == 1L) == 3)
    assert(rows.filter(_._1 == 1L).map(_._3).toSeq == Seq(2L, 3L, 1L))
    assert(rows.count(_._1 == 2L) == 1 && rows.find(_._1 == 2L).get._3 == 5L)
    assert(!rows.exists(_._1 == 3L))

    // on the fixture corpus: chunk ids are monotone per doc and every chunk
    // starts at a sentence whose preceding mass crossed the budget line
    val corpus = Curation.chunkSentences(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    corpus.groupBy(_._1).foreach { case (_, sents) =>
      val ordered = sents.sortBy(_._2)
      assert(ordered.map(_._4).sameElements(ordered.map(_._4).sorted))
      ordered.foreach { case (_, _, tokBefore, chunk) =>
        assert(chunk == tokBefore / Curation.SentenceChunkBudget)
      }
    }
  }
}
