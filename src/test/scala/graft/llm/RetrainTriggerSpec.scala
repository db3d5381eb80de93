package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The retrain-trigger OPS LOOP closed end-to-end (VERDICT r8 item 8):
  * q_index_drift is the monitor, and the documented response to a wide
  * base→late fit gap is RETRAIN-AND-PUBLISH — this spec proves the loop's
  * effect on a fixture built to drift. A drifted late quarter (orthogonal
  * subspace) trips the monitor against the FROZEN base-trained centroids;
  * retraining on the full corpus (the compaction-cycle rebuild) closes the
  * gap, because Lloyd now places centroids in both subspaces. The serve
  * artifacts' fixture-keyed targets mean the retrained index publishes as
  * a NEW version — nothing here mutates the frozen one. */
class RetrainTriggerSpec extends SparkSpec {

  private val S = Similarity.MeanScale

  /** Per-segment floor-quantized mean best-centroid fit against an
    * arbitrary centroid frame — the drift measurement re-run against a
    * candidate retrained index (the monitor's math, parameterized). */
  private def fitGap(dir: String,
                     cents: org.apache.spark.sql.DataFrame): Double = {
    val dot = Similarity.dotFor(spark) _
    val e = graft.Tables.t(spark, dir, "embeddings").select(
      col("vec_id"), col("embedding"),
      expr(s"sqrt(${dot("embedding", "embedding")})").as("nrm"))
    val cut = IvfMaintenance.baseCut(spark, dir)
    val rows = Similarity.rankAgainst(e, cents)
      .filter(col("crn") === 1)
      .withColumn("segment",
        when(col("vec_id") >= cut, lit("late")).otherwise(lit("base")))
      .groupBy("segment")
      .agg((sum(floor(col("c_cos") * S)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .cast("string").cast("double") /
        (count(lit(1)).cast("double") * lit(S.toDouble))).as("mean_cos"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows("base") - rows("late")
  }

  test("drift trips on a drifted late batch; retrain-and-publish closes the gap") {
    // drifted corpus: base vectors in dims 0-3, the late quarter in dims
    // 4-7 (the GraphDriftSpec fixture) — the frozen base-trained centroids
    // cannot fit the late subspace
    val d = 8
    val n = 64
    val rows = (0L until n).map { id =>
      val emb = Array.tabulate(d) { i =>
        val active = if (id < 48) i < 4 else i >= 4
        if (active) (((id * 31L + i * 17L + 7L) % 1000L).toFloat / 1000f) + 0.1f
        else 0.001f
      }
      (id, emb, 0)
    }
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_retrain").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // 1. the monitor: q_index_drift against the frozen base-trained index
    val drift = IvfMaintenance.drift(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val preGap = drift("base") - drift("late")
    info(f"pre-retrain drift gap = $preGap%.4f")
    assert(preGap > 0.2,
      f"drifted late batch must trip the monitor, gap $preGap%.4f")

    // 2. the documented response: retrain on the FULL corpus (what the
    // rebuild cycle publishes as the next index version)
    val retrained = Similarity.trainCentroids(spark, dir)
      .select("cent_id", "c_emb")
    val postGap = fitGap(dir, retrained)
    info(f"post-retrain drift gap = $postGap%.4f")
    assert(math.abs(postGap) < preGap / 2,
      f"retrain must close the gap: pre $preGap%.4f post $postGap%.4f")
  }
}
