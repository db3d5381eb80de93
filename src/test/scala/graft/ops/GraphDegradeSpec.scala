package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The graph family's past-the-broadcast-ceiling posture, as CODE (VERDICT
  * r6 item 1): pagerank's rank state and triangles' oriented adjacency are
  * node-tier frames that GROW with SF. PageRank picks broadcast vs bucketed
  * by an explicit size check; triangles (r11, VERDICT r10 item 1) serves
  * from the PUBLISHED adjacency and lets Catalyst's file-size statistics
  * make the pick. With the threshold forced to 1KB this spec pins
  *  - values: the degraded path is bit-identical to the broadcast path
  *    (same integer arithmetic, so the oracle rows stay green);
  *  - plans: no BroadcastExchange anywhere past the threshold; a pagerank
  *    round keeps its cached co-partitioned edge/degree layout with two
  *    node-tier exchanges; the triangle serve holds ZERO in-session state
  *    on BOTH paths (no InMemoryTableScan — the r10 full-bench eviction
  *    finding), broadcast probe + corner tally under the default
  *    threshold, a ≤3-exchange shuffled probe past it.
  */
class GraphDegradeSpec extends SparkSpec {

  private val ThresholdKey = "spark.sql.autoBroadcastJoinThreshold"

  private def withTinyThreshold[A](body: => A): A = {
    val prev = spark.conf.get(ThresholdKey)
    try { spark.conf.set(ThresholdKey, "1KB"); body }
    finally spark.conf.set(ThresholdKey, prev)
  }

  /** (shuffle, broadcast) exchange counts of the OUTER plan: descends into
    * the adaptive wrapper's PREPARED plan (`executedPlan`, where
    * EnsureRequirements has inserted the distribution exchanges —
    * `inputPlan` precedes that rule and undercounts to just the explicit
    * repartitions) but not into cached InMemoryRelations (leaves), whose
    * build-time exchanges were paid once at layout time — the textual
    * toString embeds them and would overcount. */
  private def exchanges(df: DataFrame): (Int, Int) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    var sh = 0
    var bc = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
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

  test("triangles output is bit-identical on the shuffle-degraded path") {
    val want = Graph.triangles(spark, sf).collect().map(_.toString).toSeq
    val got = withTinyThreshold {
      Graph.triangles(spark, sf).collect().map(_.toString).toSeq
    }
    assert(got == want)
  }

  test("published-adjacency triangle serve is stateless and broadcasts under the default threshold") {
    val res = Graph.triangles(spark, sf)
    val (sh, bc) = exchanges(res)
    val p = res.queryExecution.executedPlan.toString
    // the adjacency parquet is far under the default 10MB threshold at the
    // spec fixture, so Catalyst's file-size stats pick the broadcast probe
    assert(bc >= 1, s"expected a broadcast adjacency probe, plan:\n$p")
    assert(sh <= 1, s"expected only the corner-tally exchange, got $sh, plan:\n$p")
    // the r10 finding: any in-session cached layout is eviction bait in a
    // long bench session — the published serve must hold ZERO such state
    assert(!p.contains("InMemoryTableScan"),
      s"serve must not depend on in-session cached state, plan:\n$p")
    assert(p.contains("Scan parquet"),
      s"serve must read the published adjacency parquet, plan:\n$p")
    res.count()
  }

  test("past-the-threshold triangle serve degrades to a stateless shuffled probe") {
    withTinyThreshold {
      val res = Graph.triangles(spark, sf)
      val (sh, bc) = exchanges(res)
      val p = res.queryExecution.executedPlan.toString
      assert(bc == 0, s"expected no broadcast, plan:\n$p")
      // exchange 1+2: the two sides of the one probe join (the declared
      // array-carrying re-key on the edge head, plus the adjacency scan's
      // own re-key); exchange 3: the narrow corner tally. Still no cached
      // or checkpointed state anywhere — both sides are parquet scans.
      assert(sh <= 3, s"expected <=3 exchanges, got $sh, plan:\n$p")
      assert(!p.contains("InMemoryTableScan"),
        s"serve must not depend on in-session cached state, plan:\n$p")
      res.count()
    }
  }
}
