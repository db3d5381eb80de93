package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Graph analytics over the co-purchase graph (parts that appear in the same
  * order), the retail instance of the item-item graph every recommender and
  * influence pipeline starts from. Complements `Dedup.components` (the
  * dedup-side graph op) with the three analytic staples: PageRank, triangle
  * counting, degree distribution.
  *
  * Numeric discipline: PageRank runs in SCALED-BIGINT fixed point (rank mass
  * S = 10^12, integer `div` only — the q_anomaly_zscore discipline applied
  * to an iterative algorithm). Float PageRank accumulates in whatever order
  * partitions arrive — unreproducible across engines AND across re-runs;
  * integer arithmetic is associative, so the result is bit-identical at any
  * parallelism, and the DuckDB twin replays the same five unrolled
  * iterations exactly.
  *
  * Scale shape: pair generation is per-order C(k,2) with k = lines per
  * order — bounded by the order schema (≤7 in TPC-H-shaped data), so edges
  * are linear in lineitem. The iterative loop follows the
  * `Dedup.closureLabels` discipline: `localCheckpoint` per round keeps the
  * plan constant-size (cache alone doubles it per round — driver OOM, seen
  * at sf0.1 in round 3). Triangle counting orients edges by (degree, id) —
  * wedges per node are bounded by its OUT-degree in the orientation
  * (O(sqrt(|E|)) for any graph, the standard compact-forward bound), so a
  * hub product cannot make the wedge join quadratic in its frequency. */
object Graph {

  /** Canonical undirected co-purchase edges (src < dst, distinct). */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val pp = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    pp.as("a").join(pp.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
  }

  private def bothDirections(canon: DataFrame): DataFrame =
    canon.unionByName(
      canon.select(col("dst").as("src"), col("src").as("dst")))

  /** Degree per node over the canonical edge set. */
  private def degrees(canon: DataFrame): DataFrame =
    canon.select(col("src").as("node"))
      .unionByName(canon.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))

  /** Degree distribution: how many nodes have each co-purchase degree — the
    * one-glance skew profile of the graph (a heavy tail here predicts hub
    * trouble in every downstream join). Two tiny shuffles: degree per node,
    * then nodes per degree (domain = distinct degrees). */
  def degreeDist(s: SparkSession, dir: String): DataFrame =
    degrees(edges(s, dir))
      .groupBy(col("d").as("degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")

  /** PageRank, 5 iterations, damping 0.85, scaled-BIGINT fixed point:
    * rank_scaled is out of S = 10^12; every step is integer (`div` floors,
    * matching DuckDB `//` on the non-negative operands) so the five
    * iterations replay bit-for-bit in the oracle's unrolled CTEs. Teleport
    * and node count are 1-row broadcasts (q_stats_skew tier). The loop
    * localCheckpoints each round (constant-size plans); the edge+degree
    * frame checkpoints once before the loop so iterations never rebuild the
    * pair join. Every node of this graph has in-edges (undirected), so no
    * dangling-mass term is needed. */
  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val S = 1000000000000L
    val canon = edges(s, dir)
    val e = bothDirections(canon)
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    // (src, dst, d): the loop's constant input, materialized once
    val ed = e.join(deg, "src").localCheckpoint()
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val tele = nNodes.select(expr(s"(15 * ($S div n_nodes)) div 100").as("t"))
    var ranks = deg.crossJoin(broadcast(nNodes))
      .select(col("src").as("node"), expr(s"$S div n_nodes").as("rank"))
      .localCheckpoint()
    for (_ <- 1 to 5) {
      ranks = ed.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("rank div d").as("contrib"))
        .groupBy(col("dst").as("node2"))
        .agg(sum(col("contrib")).as("m"))
        .crossJoin(broadcast(tele))
        .select(col("node2").as("node"), expr("t + (85 * m) div 100").as("rank"))
        .localCheckpoint()
    }
    ranks.orderBy(col("rank").desc, col("node"))
      .limit(50)
      .select(col("node").as("part_key"), col("rank").as("rank_scaled"))
  }

  /** Per-node triangle counts (top 50), via degree-ordered orientation:
    * each undirected edge points from its (degree, id)-smaller endpoint, so
    * each triangle {p ≺ q ≺ r} materializes exactly once as the wedge
    * p→q→r closed by p→r, and the wedge join fans out on the orientation's
    * OUT-degree — bounded even at a hub node. The closing join is a hash
    * join on the (a, c) pair, never a cartesian. */
  def triangles(s: SparkSession, dir: String): DataFrame = {
    val canon = edges(s, dir)
    val degT = degrees(canon)
    val du = degT.select(col("node").as("src"), col("d").as("du"))
    val dv = degT.select(col("node").as("dst"), col("d").as("dv"))
    // canon has src < dst, so the degree tie keeps src→dst
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("src") < col("dst"))
    val o = canon.join(du, "src").join(dv, "dst")
      .select(
        when(fwd, col("src")).otherwise(col("dst")).as("x"),
        when(fwd, col("dst")).otherwise(col("src")).as("y"))
    val wedges = o.select(col("x").as("a"), col("y").as("b"))
      .join(o.select(col("x").as("b"), col("y").as("c")), "b")
    val tri = wedges.join(
      o.select(col("x").as("a"), col("y").as("c")), Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("part_key"))
      .groupBy("part_key")
      .agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("part_key"))
      .limit(50)
  }
}
