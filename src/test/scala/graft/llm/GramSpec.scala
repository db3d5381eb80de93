package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed Gram matrix (Similarity.gram): shape (upper triangle of a
  * d×d matrix, every cell counting all n vectors), diagonal positivity,
  * and agreement with a plain-Scala recomputation at decimal precision. */
class GramSpec extends SparkSpec {

  private lazy val rows =
    Similarity.gram(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getLong(3))))
      .toMap

  private lazy val vectors =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)

  test("upper triangle of d x d, every cell aggregates all n vectors") {
    val d = vectors.head.length
    assert(rows.size == d * (d + 1) / 2)
    assert(rows.keys.forall { case (i, j) => i <= j && i >= 0 && j < d })
    assert(rows.values.forall(_._2 == vectors.length.toLong))
    // diagonal = sum of squares > 0
    (0 until d).foreach(i => assert(rows((i.toLong, i.toLong))._1 > 0.0, s"G[$i,$i]"))
  }

  test("matches a plain recomputation at the decimal staging precision") {
    val d = vectors.head.length
    for (i <- Seq(0, 1, d / 2, d - 1); j <- Seq(i, d - 1)) {
      val expect = vectors.map(v => BigDecimal(v(i) * v(j)).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val got = rows((i.toLong, j.toLong))._1
      assert(math.abs(got - expect) < 1e-9, s"G[$i,$j]: $got vs $expect")
    }
  }
}
