package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RANK-AWARE RETRIEVAL QUALITY — MRR and nDCG@10 for every serve family,
  * measured against the exact cosine top-10 (binary relevance: a served
  * neighbor is relevant iff it is in the exact top-10). The recall@10
  * audits (q_sim_recall and kin) count WHICH neighbors a serve finds;
  * they are blind to WHERE it puts them — a serve that returns the right
  * ten docs in reverse order scores recall 1.0. Production retrieval
  * evals (TREC, BEIR, MTEB — all public methodology) therefore publish
  * rank-discounted metrics next to recall:
  *
  *  - MRR: 1 / rank of the first relevant result (0 when none) — the
  *    "how far down is the first good hit" number a RAG stack cares
  *    about when only the top context slot matters.
  *  - nDCG@10 (Järvelin & Kekäläinen, TOIS 2002): Σ rel_r / log2(r+1)
  *    over served ranks r, normalized by the ideal DCG — the standard
  *    graded position-discount metric (binary gains here).
  *
  * Determinism across engines: log2 is transcendental, and nothing pins
  * Spark's Math.log to DuckDB's libm bit-for-bit — so the ten discounts
  * 1/log2(r+1), r = 1..10, are precomputed ONCE here and embedded as
  * shortest-round-trip decimal literals in BOTH engines' expression
  * texts (a correct parser reconstructs the identical IEEE double from a
  * shortest repr). Each per-query DCG is then a fixed-textual-order sum
  * of rel_r · discount_r terms — exact integer rel, one correctly-rounded
  * multiply each, left-to-right adds — the q_sim_fused RRF discipline.
  * IDCG is the same fold over all ten discounts (the exact side is top-10
  * by construction), also embedded as one literal. Everything else is
  * integer joins/aggregates plus one division per metric: hash-checkable.
  *
  * Spark shapes: the exact side and the four serve sides are the
  * already-published pruned serves (Q·10 rows each — metadata tier); the
  * metric computation is a left join on (q_id, n_id), one groupBy over
  * Q·10 rows, and a width-10 integer pivot folded row-level. The family
  * serves dominate the cost, which is the operator's definition. */
object RankEval {

  /** 1/log2(r+1) for r = 1..10 as shortest-round-trip literals — the ONE
    * discount table both engines' texts embed. */
  private[graft] val Discounts: Seq[String] =
    (1 to 10).map(r =>
      java.lang.Double.toString(1.0 / (math.log(r + 1.0) / math.log(2.0))))

  /** IDCG@10 — the left-to-right fold of the ten discounts, as a literal
    * (the exact side always carries 10 relevant docs per query). */
  private[graft] val IdcgLit: String =
    java.lang.Double.toString(
      Discounts.map(java.lang.Double.parseDouble).foldLeft(0.0)(_ + _))

  /** The fixed-order DCG sum over rel_1..rel_10 — shared VERBATIM by the
    * Spark serve and the DuckDB twin (the bm25ScoreSql discipline), so the
    * two engines cannot drift on term order or rounding. */
  private[graft] def dcgSqlExpr: String =
    (1 to 10).map(r =>
      s"CAST(rel_$r AS DOUBLE) * CAST(${Discounts(r - 1)} AS DOUBLE)")
      .mkString(" + ")

  /** Per-query metrics of one served ranking vs the exact relevant set:
    * (family, q_id, first_hit, rr, dcg, ndcg). first_hit = 0 ⇒ no served
    * neighbor is exact-relevant (rr, dcg, ndcg all exactly 0.0). */
  private[llm] def metricsOf(served: DataFrame, exact: DataFrame,
                             fam: String): DataFrame = {
    val j = served.select("q_id", "n_id", "rank")
      .join(exact.select("q_id", "n_id").withColumn("h", lit(1L)),
        Seq("q_id", "n_id"), "left")
      .withColumn("hit", coalesce(col("h"), lit(0L)))
    // integer pivot: rel_r = was the doc served at rank r relevant —
    // max() over the Q·10 group is deterministic (integers)
    val relAggs = (1 to 10).map(r =>
      max(when(col("rank") === r, col("hit")).otherwise(lit(0L))).as(s"rel_$r"))
    j.groupBy("q_id")
      .agg(min(when(col("hit") === 1L, col("rank"))).as("fh"), relAggs: _*)
      .withColumn("first_hit", coalesce(col("fh"), lit(0L)))
      .withColumn("rr",
        when(col("fh").isNotNull,
          lit(1.0) / col("fh").cast("double")).otherwise(lit(0.0)))
      .withColumn("dcg", expr(dcgSqlExpr))
      .withColumn("ndcg", col("dcg") / expr(s"CAST($IdcgLit AS DOUBLE)"))
      .select(lit(fam).as("family"), col("q_id"), col("first_hit"),
        col("rr"), col("dcg"), col("ndcg"))
  }

  /** q_sim_rank_quality: MRR + nDCG@10 for each serve family (the three
    * members AND the RRF ensemble) against the exact cosine top-10 — the
    * rank-aware companion of the recall@10 audit row every family already
    * publishes. 4 families × Q queries of output; cost is one run of each
    * member serve (+ the ensemble's members again) plus the exact side. */
  def rankQuality(s: SparkSession, dir: String): DataFrame = {
    // serve each member ONCE; the ensemble row fuses the same frames
    // (Fusion.fuseOf) instead of re-running the serves — the graph
    // member's beam walk executes at frame construction, so a second
    // fusedTopK call would pay it again. Each frame is Q·10 rows and
    // feeds TWO output branches (its own metrics row + the fusion), so it
    // localCheckpoints to a leaf — without it the pruned serve scans
    // re-execute once per branch (exact feeds all four).
    val exact = Similarity.bruteTopK(s, dir).select("q_id", "n_id")
      .localCheckpoint()
    val ivf = Similarity.ivfTrainedTopK(s, dir).localCheckpoint()
    val graph = Similarity.graphSearchTopK(s, dir).localCheckpoint()
    val bin = Binary.topK(s, dir).localCheckpoint()
    metricsOf(ivf, exact, "ivf")
      .unionByName(metricsOf(graph, exact, "graph"))
      .unionByName(metricsOf(bin, exact, "binary"))
      .unionByName(metricsOf(Fusion.fuseOf(ivf, graph, bin), exact, "fused"))
      .orderBy("family", "q_id")
  }
}
