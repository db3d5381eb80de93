package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The graph family's past-the-broadcast-ceiling posture, as CODE (VERDICT
  * r6 item 1): pagerank's rank state and triangles' oriented adjacency are
  * node-tier frames that GROW with SF, so both queries pick broadcast vs
  * bucketed by a size check against the session broadcast threshold. With
  * the threshold forced to 1KB this spec pins
  *  - values: the bucketed path is bit-identical to the broadcast path
  *    (same integer arithmetic, so the oracle rows stay green);
  *  - plans: no BroadcastExchange anywhere, and the edge frame is never
  *    re-shuffled — a pagerank round plans with two node-tier exchanges
  *    (re-keying the checkpointed rank state, the per-dst sum) over cached
  *    co-partitioned edge/degree scans; triangles with exactly two (the one
  *    declared array-carrying re-key on y, plus the corner tally).
  */
class GraphDegradeSpec extends SparkSpec {

  private val ThresholdKey = "spark.sql.autoBroadcastJoinThreshold"

  private def withTinyThreshold[A](body: => A): A = {
    val prev = spark.conf.get(ThresholdKey)
    try { spark.conf.set(ThresholdKey, "1KB"); body }
    finally spark.conf.set(ThresholdKey, prev)
  }

  /** (shuffle, broadcast) exchange counts of the OUTER plan: descends into
    * the adaptive wrapper but not into cached InMemoryRelations (leaves),
    * whose build-time exchanges were paid once at layout time — the
    * textual toString embeds them and would overcount. */
  private def exchanges(df: DataFrame): (Int, Int) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    var sh = 0
    var bc = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
        case _: ShuffleExchangeLike => sh += 1
        case _: BroadcastExchangeLike => bc += 1
        case _ => ()
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    (sh, bc)
  }

  test("pagerank output is bit-identical on the bucketed path") {
    val want = Graph.pagerank(spark, sf).collect().map(_.toString).toSeq
    val got = withTinyThreshold {
      Graph.pagerank(spark, sf).collect().map(_.toString).toSeq
    }
    assert(got == want)
  }

  test("a bucketed pagerank round plans with no broadcast and no edge re-shuffle") {
    withTinyThreshold {
      val prep = Graph.pagerankPrep(Graph.edges(spark, sf))
      try {
        assert(!prep.fits, "1KB threshold must force the bucketed layout")
        val ranks = prep.deg
          .select(col("node"), col("d"), lit(prep.initRank).as("rank"))
          .localCheckpoint()
        val round = Graph.pagerankRound(prep.e, ranks, prep.deg, prep.teleV,
          bcast = false)
        val (sh, bc) = exchanges(round)
        val p = round.queryExecution.executedPlan.toString
        assert(bc == 0, s"expected no broadcast, plan:\n$p")
        // exactly two node-tier exchanges: re-keying the checkpointed rank
        // state into the round, and the map-side-combined per-dst sum. The
        // edge frame and the degree frame arrive as partitioned
        // InMemoryTableScans — never exchanged, never re-sorted.
        assert(sh <= 2, s"expected <=2 exchanges, got $sh, plan:\n$p")
        assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
          s"expected cached co-partitioned edge+degree scans, plan:\n$p")
        round.count()
      } finally prep.release()
    }
  }

  test("triangles output is bit-identical on the bucketed path") {
    val want = Graph.triangles(spark, sf).collect().map(_.toString).toSeq
    val got = withTinyThreshold {
      Graph.triangles(spark, sf).collect().map(_.toString).toSeq
    }
    assert(got == want)
  }

  test("bucketed triangles plan with no broadcast and one array-carrying re-key") {
    withTinyThreshold {
      val o = Graph.orientedOf(Graph.edges(spark, sf))
      val parts = spark.sessionState.conf.numShufflePartitions
      val (res, oX, adj) = Graph.trianglesBucketed(o, parts)
      try {
        val (sh, bc) = exchanges(res)
        val p = res.queryExecution.executedPlan.toString
        assert(bc == 0, s"expected no broadcast, plan:\n$p")
        // exchange 1: the declared re-key of (x, y, nx) on y for the second
        // adjacency probe; exchange 2: the narrow corner tally. The
        // adjacency build and the first probe reuse the cached (x, parts)
        // layout.
        assert(sh <= 2, s"expected <=2 exchanges, got $sh, plan:\n$p")
        assert(p.contains("InMemoryTableScan"),
          s"expected cached co-partitioned scans, plan:\n$p")
        res.count()
      } finally { oX.unpersist(); adj.unpersist() }
    }
  }
}
