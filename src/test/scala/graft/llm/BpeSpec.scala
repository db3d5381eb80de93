package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** First-principles check of the BPE merge application: a classic
  * priority-queue BPE (find the lowest-rank pair present, merge all leftmost
  * non-overlapping occurrences, repeat) reimplemented in plain Scala must
  * agree with the distributed replace-chain pipeline on every fixture doc —
  * the same three-way-evidence pattern as LshEquivalenceSpec. */
class BpeSpec extends SparkSpec {

  private val rank = TextAnalysis.BpeMerges.zipWithIndex.toMap

  private def bpeRef(piece: String): Vector[String] = {
    var syms = piece.replace(' ', '_').map(_.toString).toVector
    var done = false
    while (!done) {
      val best = syms.zip(syms.drop(1))
        .flatMap(p => rank.get(p).map(r => (r, p)))
        .sortBy(_._1).headOption
      best match {
        case None => done = true
        case Some((_, (l, r))) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.result()
      }
    }
    syms
  }

  test("hand example: merges apply in rank order with word-boundary marker") {
    assert(bpeRef("the") == Vector("the"))
    assert(bpeRef(" thin") == Vector("_", "th", "in"))
    assert(bpeRef(" and") == Vector("_", "and"))
    assert(bpeRef(" our") == Vector("_", "ou", "r"))
  }

  test("replace-chain pipeline equals priority-queue BPE on every fixture doc") {
    val pat = java.util.regex.Pattern.compile(TextAnalysis.BpePattern)
    val got = TextAnalysis.bpeApply(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val m = pat.matcher(text)
      val toks = Iterator.continually(m).takeWhile(_.find())
        .map(_.group()).toVector.flatMap(bpeRef)
      val (n, s) = got(id)
      assert(n == toks.length, s"doc $id count")
      assert(s == toks.mkString(" "), s"doc $id tokens")
    }
  }
}
