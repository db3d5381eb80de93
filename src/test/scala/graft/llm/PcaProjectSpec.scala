package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Top-PC projection (Similarity.pcaProject): one score per vector, and
  * agreement with an independent plain-Scala replay of the whole pipeline
  * (naive covariance → 10 power iterations → projection). */
class PcaProjectSpec extends SparkSpec {

  private lazy val scores =
    Similarity.pcaProject(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap

  private lazy val vectors =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap

  test("one score per vector") {
    assert(scores.size == vectors.size)
    assert(scores.keySet == vectors.keySet)
  }

  test("matches an independent naive replay of covariance -> power iteration -> projection") {
    val vs = vectors.values.toArray
    val n = vs.length.toDouble
    val d = vs.head.length
    val mean = Array.tabulate(d)(i => vs.map(_(i)).sum / n)
    val c = Array.tabulate(d, d)((i, j) =>
      vs.map(v => v(i) * v(j)).sum / n - mean(i) * mean(j))
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to Similarity.PcaIters) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-12)
    vectors.foreach { case (id, x) =>
      val expect = (0 until d).map(i => x(i) * v(i)).sum
      assert(math.abs(scores(id) - expect) < 1e-6, s"vec $id")
    }
  }

  test("projection is centered near the corpus mean projection") {
    // sum of scores / n equals the mean vector's projection (linearity)
    val vs = vectors.values.toArray
    val n = vs.length.toDouble
    val meanScore = scores.values.sum / n
    // |mean projection| is bounded by |mean| (pc is unit norm)
    val d = vs.head.length
    val meanNorm = math.sqrt((0 until d).map { i =>
      val m = vs.map(_(i)).sum / n; m * m
    }.sum)
    assert(math.abs(meanScore) <= meanNorm + 1e-9)
  }
}
