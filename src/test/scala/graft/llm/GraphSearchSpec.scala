package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph-probe ANN: shape invariants, the no-regression property of beam
  * search (candidates always include the previous frontier, so the best
  * score can only improve over the entry seeds), and the measured recall
  * contract vs exact brute force. Bit-exactness of every emitted number is
  * the DuckDB oracle's job (unrolled-rounds twin). */
class GraphSearchSpec extends SparkSpec {

  private lazy val got = Similarity.graphSearchTopK(spark, sf).collect()

  test("emits 10 ranked rows per query, no self, no duplicate neighbors") {
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to 10L))
      assert(!rs.map(_.getLong(1)).contains(q), s"query $q returned itself")
      assert(rs.map(_.getLong(1)).distinct.length == rs.length)
    }
  }

  test("the beam never regresses below the best entry seed") {
    val entryIds = Similarity.entryNodes(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(entryIds.length == Similarity.NEntries)
    val e = graft.Tables.t(spark, sf, "embeddings")
    val dot = Similarity.dotFor(spark) _
    val withN = e.select(col("vec_id"), col("embedding"),
      expr(s"sqrt(${dot("embedding", "embedding")})").as("nrm"))
    val q = withN.filter(col("vec_id") < 8).select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val seedBest = withN.filter(col("vec_id").isInCollection(entryIds))
      .crossJoin(broadcast(q))
      // the search drops self-hits from the frontier, so the seed floor
      // must too (a derived entry may itself be a query id)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr(dot("q_emb", "embedding")) / (col("q_nrm") * col("nrm")))
      .groupBy("q_id").agg(max("cos").as("best"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    got.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getDouble(2) >= seedBest(r.getLong(0)),
        s"query ${r.getLong(0)}: final best ${r.getDouble(2)} < seed ${seedBest(r.getLong(0))}")
    }
  }

  test("beam search recalls the exact top-10") {
    val exact = Similarity.bruteTopK(spark, sf).select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mine = got.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq
      .map(k => mine.getOrElse(k, Set.empty[Long]).intersect(exact(k)).size / 10.0)
      .sum / exact.size
    info(f"graph-search recall@10 = $recall%.2f")
    assert(recall >= 0.6, f"recall@10 $recall%.2f under floor")
  }

  test("published serve graph is src-clustered and the expansion round prunes to the frontier") {
    got // force the publish
    val target = Similarity.serveGraphTarget(spark, sf)
    assert(graft.etl.Warehouse.clusteringOf(spark, target).contains("src"),
      "published serve graph must carry the src _CLUSTERING sidecar")
    assert(graft.etl.Warehouse.clusteringOf(spark,
        Similarity.descentTarget(spark, sf)).contains("src"),
      "published NN-descent graph must carry the src _CLUSTERING sidecar")
    // the serve's expansion round: frontier ids reach the serve-graph scan
    // as an In(src) pushed filter (row-group pruning against the clustered
    // layout); the round is a single-stage scan — no join, no exchange
    val plan = Similarity.publishedServeGraph(spark, sf)
      .filter(col("src").isInCollection(Seq(1L, 2L, 3L)))
      .select("src", "dst")
      .queryExecution.executedPlan.toString
    assert(plan.contains("In(src"), s"no In(src) pushed filter in:\n$plan")
    assert(!plan.contains("Exchange"), s"expansion round exchanged:\n$plan")
  }

  test("the scoring round prunes the corpus scan to the candidate ids") {
    // the corpus side of beamServe's score: candidate ids reach the
    // embeddings parquet scan as an In(vec_id) pushed filter — no serve
    // round ever reads the corpus in full (VERDICT r8 item 1)
    val dot = Similarity.dotFor(spark) _
    val e = graft.Tables.t(spark, sf, "embeddings").select(
      col("vec_id"), col("embedding"),
      expr(s"sqrt(${dot("embedding", "embedding")})").as("nrm"))
    val plan = e.filter(col("vec_id").isInCollection(Seq(1L, 2L, 3L)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("In(vec_id"), s"no In(vec_id) pushed filter in:\n$plan")
  }

  test("a corpus without ids 8-11 still seeds a full frontier (corpus-derived entries)") {
    // ids 0..7 (queries) plus 100..139 — the old hard-coded EntryIds
    // Seq(8,9,10,11) would silently seed an empty frontier here
    import spark.implicits._
    val d = 16
    val rows = ((0L until 8L) ++ (100L until 140L)).map { id =>
      val emb = Array.tabulate(d)(i =>
        (((id * 31L + i * 17L + 7L) % 1000L).toFloat / 500f) - 1f)
      (id, emb, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_gs_noentry").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val res = Similarity.graphSearchTopK(spark, dir).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet,
      s"queries missing from result: ${(0L until 8L).toSet -- byQ.keySet}")
    val corpusIds = rows.map(_._1).toSet
    res.foreach { r =>
      assert(corpusIds.contains(r.getLong(1)), s"phantom neighbor ${r.getLong(1)}")
      assert(r.getLong(1) != r.getLong(0), "self hit")
    }
    // VERDICT r8 item 1: the NO-DELTA serve never publishes or reads any
    // maintenance segment — graph search is fully independent of the
    // insert family (no delta scan can appear in its rounds because no
    // delta artifact for this fixture exists at all)
    assert(!graft.etl.Warehouse.exists(spark,
        GraphMaintenance.insTarget(spark, dir)),
      "no-delta serve published an insert delta")
    assert(!graft.etl.Warehouse.exists(spark,
        GraphMaintenance.baseGraphTarget(spark, dir)),
      "no-delta serve published a maintenance base graph")
    assert(!new java.io.File(GraphMaintenance.serveRoot(spark, dir)).exists(),
      "no-delta serve created the maintenance serve-edge snapshot")
  }
}
