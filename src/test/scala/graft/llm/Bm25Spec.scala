package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (q_text_bm25): bit-exact scores are the DuckDB
  * twin's job; this spec pins the semantics (driver-side recomputation of
  * the full pipeline), the retrieval property (the selective query term
  * dominates), and the plan shape (posting-list broadcast probe + top-k
  * without a global sort). */
class Bm25Spec extends SparkSpec {

  private lazy val got = TextAnalysis.bm25(spark, sf).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("matches a driver-side recomputation of the full BM25 pipeline") {
    val docs = graft.Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    val toks = docs.collect { case (id, Some(t)) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.length.toLong
    val tot = toks.values.map(_.length.toLong).sum
    val avgdl = tot.toDouble / n.toDouble
    val df = toks.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size.toLong)
    val qt = df.toSeq.sortBy { case (t, d) => (d, t) }.take(TextAnalysis.Bm25QTerms)
    val scores = toks.toSeq.flatMap { case (id, ts) =>
      val dl = ts.length.toDouble
      val terms = qt.flatMap { case (t, d) =>
        val tf = ts.count(_ == t).toDouble
        if (tf == 0) None
        else Some((n.toDouble - d.toDouble + 0.5) / (d.toDouble + 0.5) *
          ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))))
      }
      if (terms.isEmpty) None
      else Some((id, terms.length.toLong,
        // replicate the decimal(28,10) staging: HALF_UP per addend
        terms.map(v => BigDecimal(v).setScale(10, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble))
    }
    val want = scores.sortBy { case (id, _, s) => (-s, id) }.take(TextAnalysis.Bm25TopK)
    assert(got.toSeq == want, s"\ngot  ${got.toSeq.take(5)}\nwant ${want.take(5)}")
  }

  test("the selective query term dominates the ranking") {
    // 'dup' (df 25/500) carries idf-odds ~18.6 vs ~0.3 for the common
    // terms, so every top-20 doc must contain it
    val dupDocs = graft.Tables.t(spark, sf, "documents")
      .filter(col("text").contains("dup")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty)
    got.foreach { case (id, _, _) =>
      assert(dupDocs.contains(id), s"doc $id in top-20 without the selective term")
    }
  }

  test("plan: query terms push into the postings scan as a literal IN, top-k has no global sort") {
    // r10: the broadcast-join probe became a pushed In(token) predicate on
    // the published token-clustered postings (LexIndexSpec pins the
    // no-documents-scan half)
    val df = TextAnalysis.bm25(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isInCollection") || plan.contains("In(token") ||
      plan.contains("token#"), s"no query-term probe in:\n$plan")
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("In(token"), s"IN not pushed to the scan:\n$formatted")
    assert(plan.contains("TakeOrderedAndProject"), s"global sort in:\n$plan")
  }
}
