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

  test("training learns the true top pair per round (recomputed first-principles)") {
    val rows = TextAnalysis.bpeTrain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1L to TextAnalysis.BpeTrainRounds.toLong))
    // merging the winner can only create pairs bounded by its count —
    // winners are non-increasing
    assert(rows.map(_._4).sliding(2).forall(w => w.head >= w.last))
    // reference trainer: word-frequency BPE over the same pre-tokenizer
    val pat = java.util.regex.Pattern.compile(TextAnalysis.BpePattern)
    val words = scala.collection.mutable.Map[Vector[String], Long]()
    spark.read.parquet(s"$sf/documents.parquet").select("text").collect()
      .foreach { r =>
        val m = pat.matcher(Option(r.getString(0)).getOrElse(""))
        Iterator.continually(m).takeWhile(_.find()).map(_.group()).foreach { p =>
          val syms = p.replace(' ', '_').map(_.toString).toVector
          words(syms) = words.getOrElse(syms, 0L) + 1L
        }
      }
    var vocab = words.toMap
    rows.foreach { case (r, lhs, rhs, cnt) =>
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p =>
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c)
      }
      val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      assert((lhs, rhs) == best._1, s"round $r winner")
      assert(cnt == best._2, s"round $r count")
      // apply the merge (leftmost non-overlapping) to every word
      vocab = vocab.toSeq.map { case (syms, c) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
            out += (lhs + rhs); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.result() -> c
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    }
  }
}
