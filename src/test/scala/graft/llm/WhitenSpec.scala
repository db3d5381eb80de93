package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Whitened embeddings (Similarity.whiten): semantic z-normalization
  * properties (each output dimension has ~zero mean and ~unit variance over
  * the corpus) and a naive per-vector recomputation. */
class WhitenSpec extends SparkSpec {

  private lazy val rows =
    Similarity.whitenVecs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  private lazy val vectors =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap

  test("shape preserved, every output dimension ~N(0,1) over the corpus") {
    val n = rows.length
    assert(n == vectors.size)
    val d = rows.head._2.length
    assert(d == vectors.head._2.length)
    (0 until d).foreach { i =>
      val xs = rows.map(_._2(i))
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(m) < 1e-9, s"dim $i mean $m")
      assert(math.abs(v - 1.0) < 1e-9, s"dim $i var $v")
    }
  }

  test("registered exploded form carries exactly whitenVecs' coordinates") {
    val exploded = Similarity.whiten(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val d = rows.head._2.length
    assert(exploded.size == rows.length * d)
    rows.foreach { case (id, w) =>
      (0 until d).foreach(i => assert(exploded((id, i.toLong)) == w(i)))
    }
  }

  test("matches a naive (x - mu) / sd recomputation") {
    val vs = vectors.values.toArray
    val n = vs.length.toDouble
    val d = vs.head.length
    val mu = Array.tabulate(d)(i => vs.map(_(i)).sum / n)
    val sd = Array.tabulate(d) { i =>
      math.sqrt(vs.map(v => v(i) * v(i)).sum / n - mu(i) * mu(i))
    }
    rows.take(20).foreach { case (id, w) =>
      val x = vectors(id)
      (0 until d).foreach { i =>
        assert(math.abs(w(i) - (x(i) - mu(i)) / sd(i)) < 1e-6, s"vec $id dim $i")
      }
    }
  }
}
