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

  /** Canonical undirected co-purchase edges (src < dst, distinct),
    * graph-once/serve-many: the first caller pays the pair join and
    * PUBLISHES the edge list through the warehouse pointer commit (the
    * `Dedup.components` / IVF-centroid discipline — a production system
    * materializes the item graph once per corpus, it does not rebuild it
    * per analytic); PageRank, triangles, and the degree profile all serve
    * from the same published table. Content-fingerprinted target: a
    * rewritten fixture can never serve a stale graph. */
  private[graft] def edges(s: SparkSession, dir: String): DataFrame = {
    val key = graft.Tables.fixtureKey(s, dir, "lineitem")
    val target = s"${sys.props("java.io.tmpdir")}/graft_graph/edges_$key"
    if (!graft.etl.Warehouse.exists(s, target)) {
      val pp = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val canon = pp.as("a").join(pp.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
      graft.etl.Warehouse.publish(s, target, canon)
    }
    graft.etl.Warehouse.read(s, target)
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
  def pagerank(s: SparkSession, dir: String): DataFrame =
    pagerankOf(edges(s, dir))

  /** The same five rounds over a caller-supplied canonical edge frame —
    * ScaleBench replays it at m× replicated edges. */
  private[graft] def pagerankOf(canon: DataFrame): DataFrame = {
    val S = 1000000000000L
    val e = bothDirections(canon).localCheckpoint()
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val tele = nNodes.select(expr(s"(15 * ($S div n_nodes)) div 100").as("t"))
    // Rank state is one row per NODE of the item graph — dimension-tier
    // (like the part table), never fact-tier. Pre-dividing rank/deg on the
    // node frame and BROADCASTING it means each round's contribution join
    // never shuffles the edge frame: the only per-round exchange is the
    // map-side-combined sum per dst. (A catalog too large to broadcast
    // would swap the hint for edges and ranks bucketed on the same key —
    // the shape stays one exchange per round.)
    var ranks = deg.crossJoin(broadcast(nNodes))
      .select(col("node"), col("d"), expr(s"$S div n_nodes").as("rank"))
      .localCheckpoint()
    for (_ <- 1 to 5) {
      ranks = e.join(
          broadcast(ranks.select(col("node"), expr("rank div d").as("c"))),
          col("src") === col("node"))
        .groupBy(col("dst").as("node2"))
        .agg(sum(col("c")).as("m"))
        .crossJoin(broadcast(tele))
        .select(col("node2").as("node"), expr("t + (85 * m) div 100").as("rank"))
        .join(broadcast(deg.withColumnRenamed("node", "node3")),
          col("node") === col("node3"))
        .select(col("node"), col("d"), col("rank"))
        .localCheckpoint()
    }
    ranks.orderBy(col("rank").desc, col("node"))
      .limit(50)
      .select(col("node").as("part_key"), col("rank").as("rank_scaled"))
  }

  /** Per-node triangle counts (top 50), via degree-ordered orientation +
    * adjacency intersection (the edge-iterator algorithm): each undirected
    * edge points from its (degree, id)-smaller endpoint, so each triangle
    * {p ≺ q ≺ r} is found exactly once — at edge p→q, as r ∈ N⁺(p)∩N⁺(q).
    * Intersecting out-neighbor LISTS keeps the row count at |E| plus one
    * row per actual triangle; the naive wedge join (the DuckDB twin's form)
    * materializes and shuffles every wedge — orders of magnitude more rows
    * on a dense graph. The per-node adjacency array is bounded by the
    * orientation OUT-degree (O(√E) for any graph — the compact-forward
    * bound), not by a hub's raw degree. */
  def triangles(s: SparkSession, dir: String): DataFrame =
    trianglesOf(edges(s, dir))

  private[graft] def trianglesOf(canon: DataFrame): DataFrame = {
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
      .localCheckpoint()
    // The oriented adjacency is DIMENSION-TIER: one row per node of the item
    // graph (bounded by the part catalog), each holding an O(√E)-bounded
    // out-neighbor list — ~10 MB at sf0.1 (20 k nodes × ~60 avg). Same
    // argument as pagerank's rank state: BROADCAST it, never shuffle it.
    // The r5 plan shuffled both ~60-long arrays onto every edge row through
    // two SortMergeJoins (~1.2 GB of array payload, 29% of the whole bench);
    // with both sides broadcast the edge frame streams through one codegen'd
    // map stage and the only remaining exchange is the narrow-row count per
    // part_key. (A catalog too large to broadcast would bucket edges and
    // adjacency on the node key — the shape stays shuffle-free per probe.)
    val adj = o.groupBy(col("x"))
      .agg(sort_array(collect_list(col("y"))).as("nbrs"))
      .localCheckpoint()
    // inner joins: an edge whose head has no out-neighbors closes nothing
    val tri = o
      .join(broadcast(adj.select(col("x").as("xx"), col("nbrs").as("nx"))),
        col("x") === col("xx"))
      .join(broadcast(adj.select(col("x").as("yy"), col("nbrs").as("ny"))),
        col("y") === col("yy"))
      .select(col("x").as("a"), col("y").as("b"),
        explode(expr("array_intersect(nx, ny)")).as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("part_key"))
      .groupBy("part_key")
      .agg(count(lit(1)).as("n_tri"))
      .orderBy(col("n_tri").desc, col("part_key"))
      .limit(50)
  }
}
