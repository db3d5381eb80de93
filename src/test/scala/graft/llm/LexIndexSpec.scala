package graft.llm

import graft.{SparkEntry, SparkSpec}

/** Pins the published-lexical-index serve topology (VERDICT r9 item 1):
  * after the index is published, the BM25 serve must read posting lists —
  * never the corpus — and the hybrid's only documents read is the pushed
  * query-doc scan. */
class LexIndexSpec extends SparkSpec {

  private def formatted(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_text_bm25 serves from published postings: no documents scan at all") {
    val p = formatted("q_text_bm25")
    assert(!p.contains("documents.parquet"),
      s"post-publish BM25 still scans the corpus:\n${p.take(4000)}")
    // the query-term IN literal reaches the token-clustered postings scan
    assert(p.contains("In(token"), s"no pushed In(token) filter:\n${p.take(4000)}")
  }

  test("q_text_tfidf serves from published postings: no documents scan") {
    val p = formatted("q_text_tfidf")
    assert(!p.contains("documents.parquet"), p.take(4000))
  }

  test("hybrid serves from the two published tower rankings; the lex tower pushes In(token)") {
    // r12: the hybrid is a CONSUMER of the two towers' published Q·10
    // rankings (Rankings.lex / Rankings.ivf) — its served plan reads those
    // parquet versions and fuses, touching neither documents NOR postings
    val p = formatted("q_retrieve_hybrid")
    val docScans = "documents\\.parquet".r.findAllIn(p).size
    assert(docScans == 0, s"served hybrid plan must not rescan documents, got $docScans")
    assert(p.contains("graft_rankings/lex_"),
      s"hybrid must read the published lexical ranking:\n${p.take(4000)}")
    assert(p.contains("graft_rankings/ivf_"),
      s"hybrid must read the published dense ranking:\n${p.take(4000)}")
    // the postings-pushdown contract lives on the lexical tower SERVE
    // itself (what the publishing call executes): posting lists only,
    // query-term IN literal reaching the token-clustered scan
    val lex = Fusion.lexTopK(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!lex.contains("documents.parquet"),
      s"lex tower serve must not rescan documents:\n${lex.take(4000)}")
    assert(lex.contains("In(token"),
      s"no pushed In(token) filter on postings:\n${lex.take(4000)}")
  }

  test("the published members carry the exact inline-derivation values") {
    import org.apache.spark.sql.functions._
    // stats is the 1-row (n_docs, tot) statistic the inline form computed
    val st = LexIndex.stats(spark, sf).collect()(0)
    val docs = graft.Tables.t(spark, sf, "documents")
    val inline = docs.agg(count(lit(1)), sum(size(split(col("text"), " ")).cast("long")))
      .collect()(0)
    assert(st.getLong(0) == inline.getLong(0) && st.getLong(1) == inline.getLong(1))
    // postings' denormalized df agrees with the vocab member on every token
    val bad = LexIndex.postings(spark, sf).select("token", "df").distinct()
      .join(LexIndex.vocab(spark, sf).withColumnRenamed("df", "vdf"), "token")
      .filter(col("df") =!= col("vdf")).count()
    assert(bad == 0, s"$bad tokens with drifting df between postings and vocab")
  }
}
