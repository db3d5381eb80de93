package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ENSEMBLE RETRIEVAL — reciprocal-rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009, public method: score(d) = Σ 1/(k + rank_i(d))
  * over the rankers that returned d, k = 60) across the engine's three
  * independently-published index families: the trained IVF serve, the
  * graph-probe beam serve, and the binary sign-bit serve. The production
  * rationale is recall insurance: each family misses DIFFERENT neighbors
  * (cell-boundary losses vs islanding vs quantization), so a rank-level
  * consensus recovers results any single index drops — without touching
  * raw scores, which are not comparable across families (cosine vs
  * hamming-shortlisted cosine at different candidate pools).
  *
  * Spark shapes: the three serves are the ALREADY-PUBLISHED index reads
  * (nothing builds here; each serve keeps its own pruned plan) and emit
  * Q·10 rows each, so the fusion itself is metadata-tier — two
  * full-outer joins on (q_id, n_id) coalescing the three rank columns,
  * one fixed-order RRF sum, a Q·≤30-row ranking window. Determinism:
  * ranks are exact integers, each 1/(k+rank) is one correctly-rounded
  * IEEE division, and the three terms add in fixed textual order
  * (ivf + graph + binary) in BOTH engines — bit-identical, so the fused
  * ranking hash-checks like every other serve. */
object Fusion {

  /** The RRF smoothing constant — k = 60 as published (Cormack et al.
    * found the method insensitive to it; keeping the canonical value
    * makes the scores comparable to the literature's). */
  val FusionK = 60

  /** q_sim_fused: RRF top-10 per sample query over the three families'
    * served top-10s. */
  def fusedTopK(s: SparkSession, dir: String): DataFrame = {
    def side(df: DataFrame, nm: String): DataFrame =
      df.select(col("q_id"), col("n_id"), col("rank").as(nm))
    val j = side(Similarity.ivfTrainedTopK(s, dir), "r_ivf")
      .join(side(Similarity.graphSearchTopK(s, dir), "r_graph"),
        Seq("q_id", "n_id"), "full_outer")
      .join(side(Binary.topK(s, dir), "r_bin"),
        Seq("q_id", "n_id"), "full_outer")
    val w = Window.partitionBy("q_id").orderBy(col("rrf").desc, col("n_id"))
    j.withColumn("rrf", expr(
        s"coalesce(CAST(1 AS DOUBLE) / ($FusionK + r_ivf), 0D) + " +
          s"coalesce(CAST(1 AS DOUBLE) / ($FusionK + r_graph), 0D) + " +
          s"coalesce(CAST(1 AS DOUBLE) / ($FusionK + r_bin), 0D)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "n_id", "rrf", "rank")
      .orderBy("q_id", "rank")
  }

  /** q_sim_fused_recall: the ensemble's recall@10 audit vs the exact
    * cosine top-10 — published next to the member families' audits so the
    * consensus win (or loss) is an oracle-checked number, not a claim. */
  def recallFused(s: SparkSession, dir: String): DataFrame =
    Similarity.recallOf(s, dir, fusedTopK(s, dir))
}
