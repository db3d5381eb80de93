package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Data-calibrated curation (Curation.qualityThreshold / selectBudget):
  * the percentile gate must drop at most 1/ThresholdDen of the corpus and
  * its threshold must be the exact order statistic; budgeted selection
  * must spend at most half of each source's token mass before admitting a
  * doc, keep docs in strict quality order, and admit the crossing doc. */
class SelectionSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("selspec").toString
    // 10 docs per source, token counts 1..10 (text = k repeated words) —
    // logit is monotone in the token count, so quality order == length order
    val rows = java.util.Arrays.asList(
      (for (src <- Seq("web", "books"); k <- 1 to 10) yield {
        val text = (1 to k).map(_ => "the").mkString(" ")
        Row(src.hashCode.toLong * 100 + k, text, "en", src, text.length.toLong)
      }): _*)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("percentile gate drops at most 1/ThresholdDen and uses the exact order statistic") {
    val logits = Curation.qualityLogit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(6)).toMap
    val kept = Curation.qualityThreshold(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = logits.size
    assert(kept.length >= n - n / Curation.ThresholdDen, s"${kept.length} of $n kept")
    // threshold = smallest logit v with #(logit <= v) >= ceil(n/Den)
    val sorted = logits.values.toSeq.sorted
    val expectedThr = sorted((n + Curation.ThresholdDen - 1) / Curation.ThresholdDen - 1)
    assert(kept.head._3 == expectedThr, s"threshold ${kept.head._3} != $expectedThr")
    assert(kept.forall(k => k._2 >= expectedThr))
    // nothing above the threshold was dropped
    assert(kept.length == logits.count(_._2 >= expectedThr))
  }

  test("budget selection keeps the best docs and spends at most half the mass before each") {
    val sel = Curation.selectBudget(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(sel.nonEmpty)
    for ((src, rows) <- sel.groupBy(_._2)) {
      assert(rows.forall(r => r._5 * 2 < r._6), s"$src budget")
      // token counts 1..10 → mass 55: greedy in logit (≈ length) order
      // keeps 10, 9, 8, 7 (tok_before 0, 10, 19, 27; 27·2 = 54 < 55 admits
      // the crossing doc 7); 6 would start at 34 — dropped
      assert(rows.map(_._3).sorted.toSeq == Seq(7L, 8L, 9L, 10L), s"$src kept ${rows.map(_._3).toSeq}")
    }
    // quality order: logit is monotone in length here, so keeping exactly
    // the three longest docs per source IS the "best docs first" property
  }
}
