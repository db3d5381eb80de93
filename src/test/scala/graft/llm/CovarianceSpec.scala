package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Covariance matrix (Similarity.covariance): shape, the composition
  * identity against independently-collected Gram/mean results, and
  * agreement with a plain-Scala recomputation from raw vectors. */
class CovarianceSpec extends SparkSpec {

  private lazy val cov =
    Similarity.covariance(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getLong(3))))
      .toMap

  private lazy val vectors =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)

  test("upper triangle of d x d, every cell aggregates all n vectors") {
    val d = vectors.head.length
    assert(cov.size == d * (d + 1) / 2)
    assert(cov.keys.forall { case (i, j) => i <= j && i >= 0 && j < d })
    assert(cov.values.forall(_._2 == vectors.length.toLong))
    // diagonal = per-dimension variance ≥ 0 (exactly 0 only for a
    // constant dimension, which the fixture corpus does not have)
    (0 until d).foreach(i => assert(cov((i.toLong, i.toLong))._1 > 0.0, s"C[$i,$i]"))
  }

  test("equals g/n - mean_i*mean_j from the two statistic queries bit-for-bit") {
    val g = Similarity.gram(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val m = Similarity.meanVector(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    val n = vectors.length.toDouble
    cov.foreach { case ((i, j), (c, _)) =>
      assert(c == g((i, j)) / n - m(i) * m(j), s"C[$i,$j]")
    }
  }

  test("close to a naive double-precision covariance from raw vectors") {
    val d = vectors.head.length
    val n = vectors.length.toDouble
    for (i <- Seq(0, d / 2, d - 1); j <- Seq(i, d - 1)) {
      val sxy = vectors.map(v => v(i) * v(j)).sum
      val mi = vectors.map(_(i)).sum / n
      val mj = vectors.map(_(j)).sum / n
      val expect = sxy / n - mi * mj
      assert(math.abs(cov((i.toLong, j.toLong))._1 - expect) < 1e-9, s"C[$i,$j]")
    }
  }
}
