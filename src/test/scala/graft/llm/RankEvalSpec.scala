package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Rank-aware retrieval metrics (MRR + nDCG@10): the metric identities a
  * hand example pins (hit only at rank r ⇒ rr = 1/r, dcg = discount_r),
  * the self-evaluation fixed point (the exact serve scores exactly 1.0 on
  * both metrics — the DCG fold and the IDCG literal are the same
  * fixed-order sum, so equality is bitwise, no epsilon), and the audit
  * frame's shape over all four families. Bit-exactness vs DuckDB is the
  * oracle's job (shared discount literals + the same DCG text). */
class RankEvalSpec extends SparkSpec {

  test("exact serve scores exactly 1.0 on rr and ndcg (bitwise fixed point)") {
    val exact = Similarity.bruteTopK(spark, sf).select("q_id", "n_id")
    val m = RankEval.metricsOf(Similarity.bruteTopK(spark, sf), exact, "exact")
      .collect()
    assert(m.length == 8)
    m.foreach { r =>
      assert(r.getLong(2) == 1L, "first_hit must be rank 1")
      assert(r.getDouble(3) == 1.0, "rr must be exactly 1.0")
      assert(r.getDouble(5) == 1.0, "ndcg must be exactly 1.0 — same fold")
    }
  }

  test("hand example: single hit at rank 2 ⇒ rr = 1/2, dcg = discount_2") {
    import spark.implicits._
    val served = Seq((0L, 10L, 1L), (0L, 20L, 2L), (0L, 30L, 3L))
      .toDF("q_id", "n_id", "rank")
    val exact = Seq((0L, 20L), (0L, 99L)).toDF("q_id", "n_id")
    val m = RankEval.metricsOf(served, exact, "hand").collect()
    assert(m.length == 1)
    val d2 = java.lang.Double.parseDouble(RankEval.Discounts(1))
    val idcg = java.lang.Double.parseDouble(RankEval.IdcgLit)
    assert(m(0).getLong(2) == 2L)
    assert(m(0).getDouble(3) == 0.5)
    assert(m(0).getDouble(4) == d2, "dcg must be exactly the rank-2 discount")
    assert(m(0).getDouble(5) == d2 / idcg)
  }

  test("no hit anywhere ⇒ all metrics exactly zero") {
    import spark.implicits._
    val served = Seq((0L, 10L, 1L)).toDF("q_id", "n_id", "rank")
    val exact = Seq((0L, 99L)).toDF("q_id", "n_id")
    val m = RankEval.metricsOf(served, exact, "miss").collect()
    assert(m(0).getLong(2) == 0L && m(0).getDouble(3) == 0.0 &&
      m(0).getDouble(4) == 0.0 && m(0).getDouble(5) == 0.0)
  }

  test("audit frame: 4 families × 8 queries, metrics in [0, 1], and the " +
    "rank-discount ordering ndcg ≤ recall-implied ceiling") {
    val rows = RankEval.rankQuality(spark, sf).collect()
    assert(rows.length == 32)
    assert(rows.map(_.getString(0)).distinct.sorted.toSeq ==
      Seq("binary", "fused", "graph", "ivf"))
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      // a query with NO first hit must have zero dcg, and vice versa
      assert((r.getLong(2) == 0L) == (r.getDouble(4) == 0.0))
    }
    val meanNdcg = rows.groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getDouble(5)).sum / rs.length }
    info(s"mean ndcg@10 by family: ${meanNdcg.toSeq.sortBy(_._1).mkString(", ")}")
  }
}
