package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The d-sized statistics (per-dimension μ/σ, the binary-signing mean, the
  * principal component) must ride into plans as ONE broadcast row, never as
  * d `lit(...)` terms — the literal form grows the plan and the codegen
  * constant pool linearly with the embedding dimension (VERDICT r7 item 4).
  * This spec runs the whiten and binary-sign paths on a synthetic d=1024
  * corpus — 16× the fixture dimension, where an `array(lit, ×1024)` plan is
  * megabytes of analyzed tree — and pins both the values and the
  * constant-size plan. */
class WideDimSpec extends SparkSpec {

  private val D = 1024
  private val N = 24

  private lazy val dir: String = {
    import spark.implicits._
    val rows = (0L until N).map { id =>
      val emb = Array.tabulate(D)(i =>
        (((id * 37L + i * 13L + 3L) % 997L).toFloat / 498.5f) - 1f)
      (id, emb, 0)
    }
    val d = java.nio.file.Files.createTempDirectory("graft_wide").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("whitenVecs at d=1024: per-coordinate z-norm correct, plan constant-size") {
    val w = Similarity.whitenVecs(spark, dir)
    // plan must not carry the 2048 μ/σ literals (the old form would put
    // ~2048 doubles ≈ 40 KB+ of literal text in the optimized tree)
    val plan = w.queryExecution.optimizedPlan.toString
    assert(plan.length < 20000, s"plan blew up to ${plan.length} chars")
    val got = w.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got.size == N && got.values.forall(_.length == D))
    // independent oracle for a sample of coordinates
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for (i <- Seq(0, 511, 1023)) {
      val xs = (0L until N).map(id => raw(id)(i).toDouble)
      val mu = xs.sum / N
      val sd = math.sqrt(xs.map(x => x * x).sum / N - mu * mu)
      for (id <- Seq(0L, 17L)) {
        val exp = (raw(id)(i).toDouble - mu) / sd
        assert(math.abs(got(id)(i) - exp) < 1e-9,
          s"(id=$id, i=$i): got ${got(id)(i)}, want $exp")
      }
    }
  }

  test("binary codes at d=1024: sign bits correct vs driver-side mean, plan constant-size") {
    val c = Binary.codes(spark, dir)
    val plan = c.queryExecution.optimizedPlan.toString
    assert(plan.length < 20000, s"plan blew up to ${plan.length} chars")
    val got = c.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val mu = Array.tabulate(64)(i => (0L until N).map(id => raw(id)(i).toDouble).sum / N)
    for (id <- Seq(0L, 5L, 23L)) {
      var h0 = 0L; var h1 = 0L
      for (i <- 0 until 32) {
        if (raw(id)(i).toDouble > mu(i)) h0 |= (1L << i)
        if (raw(id)(i + 32).toDouble > mu(i + 32)) h1 |= (1L << i)
      }
      // the exact mean uses the 2^48-scaled BIGINT discipline; at float
      // inputs the naive double mean agrees except exactly-at-mean ties,
      // which the synthetic grid avoids
      assert(got(id) == ((h0, h1)), s"id=$id: got ${got(id)}, want ($h0,$h1)")
    }
  }

  test("IVF-PQ at d=1024: serve runs end-to-end, plan constant-size") {
    // the composite carries NO d-sized literals: centroids and codebooks
    // ride as warehouse-read broadcast frames; residuals are a zip_with
    // over the (arbitrary-width) embedding; the quantizer covers the first
    // M·SubDim dims by design (Pq scaladoc)
    val top = IvfPq.adcTopK(spark, dir)
    val plan = top.queryExecution.optimizedPlan.toString
    assert(plan.length < 40000, s"plan blew up to ${plan.length} chars")
    val rows = top.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < 8L && r.getLong(1) < N.toLong)
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
    }
  }
}
