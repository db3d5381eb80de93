package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-6 report tranche (Reports.scala): each query's
  * result is recounted against the raw fixture a second way, so a green
  * oracle row can't hide a self-consistent-but-wrong rewrite. */
class ReportsSpec extends SparkSpec {

  test("orderPriority: semi join counts each order once, recounted") {
    val rows = Reports.orderPriority(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val total = rows.map(_.getAs[Long]("order_count")).sum
    // recount: distinct orders in the quarter having >= 1 late line
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate") >= lit("1996-07-01") &&
        col("o_orderdate") < lit("1996-10-01"))
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val truth = o.join(li, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("o_orderkey").distinct().count()
    assert(total == truth)
  }

  test("marketShare: share in [0,1], numerator bounded by denominator") {
    val rows = Reports.marketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nr = r.getAs[Double]("nation_rev")
      val tr = r.getAs[Double]("total_rev")
      val sh = r.getAs[Double]("mkt_share")
      assert(nr >= 0.0 && nr <= tr)
      assert(sh >= 0.0 && sh <= 1.0)
      assert(sh == nr / tr)
    }
  }

  test("productProfit: grouped by (nation, year) uniquely, years in range") {
    val rows = Reports.productProfit(spark, sf).collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[Long]("o_year")))
    assert(rows.nonEmpty)
    assert(rows.distinct.length == rows.length)
    assert(rows.forall { case (_, y) => y >= 1995 && y <= 2001 })
  }

  test("shipDelayMix: high+low counts conserve the joined line count") {
    val rows = Reports.shipDelayMix(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val total = rows.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    assert(total == spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("custDistribution: distribution covers every customer incl. zero-order") {
    val rows = Reports.custDistribution(spark, sf).collect()
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust)
    // the LEFT join must surface customers with no countable orders, if any:
    // recount directly rather than assuming the fixture has them
    val zeroTruth = spark.read.parquet(s"$sf/customer.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet")
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    val zeroRow = rows.find(_.getAs[Long]("c_count") == 0L)
      .map(_.getAs[Long]("custdist")).getOrElse(0L)
    assert(zeroRow == zeroTruth)
  }

  test("topSupplier: reported revenue is the true per-supplier max") {
    val rows = Reports.topSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val truth = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1996-07-01") &&
        col("l_shipdate") < lit("1996-10-01"))
      .groupBy("l_suppkey")
      .agg(graft.Tables.dsum10(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .agg(max("rev")).collect()(0).getDouble(0)
    rows.foreach(r => assert(r.getAs[Double]("total_revenue") == truth))
  }

  test("partsSupplierCount: counts bounded by the supplier catalog, sizes respected") {
    val rows = Reports.partsSupplierCount(spark, sf).collect()
    assert(rows.nonEmpty)
    val okSizes = Set(3, 9, 14, 19, 23, 36, 45, 49)
    rows.foreach { r =>
      assert(r.getAs[Long]("supplier_cnt") >= 1L)
      assert(r.getAs[Long]("supplier_cnt") <= 100L)
      assert(okSizes.contains(r.getAs[Int]("p_size")))
      assert(r.getAs[String]("p_brand") != "Brand#12")
      assert(r.getAs[String]("p_type") != "PROMO")
    }
  }

  test("smallQtyRevenue: one row; every counted line is below 20% of its part mean") {
    val rows = Reports.smallQtyRevenue(spark, sf).collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Double]("avg_yearly") >= 0.0)
    // recount n with the naive per-row correlated form
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val p = spark.read.parquet(s"$sf/part.parquet")
      .filter(col("p_brand") === "Brand#5" && col("p_type") === "SMALL")
      .select("p_partkey")
    val avg = li.groupBy(col("l_partkey").as("pk"))
      .agg((sum("l_quantity") / count(lit(1))).as("avg_qty"))
    val truth = li.join(p, col("l_partkey") === col("p_partkey"))
      .join(avg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty")).count()
    assert(rows(0).getAs[Long]("n") == truth)
  }

  test("excessSupplier: each reported supplier really holds a majority share somewhere") {
    val named = Reports.excessSupplier(spark, sf).collect()
      .map(_.getAs[String]("s_name"))
    assert(named.nonEmpty && named.distinct.length == named.length)
    // recount one supplier's qualifying part from the raw fixture
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
    val p = spark.read.parquet(s"$sf/part.parquet")
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
      .filter(col("s_name") === named.head).select("s_suppkey")
      .collect().map(_.getLong(0))
    assert(sup.length == 1)
    val perPS = li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey").agg(sum("l_quantity").as("q"))
    val parts = perPS.filter(col("l_suppkey") === sup.head).collect()
    val hasMajority = parts.exists { r =>
      val partTotal = perPS.filter(col("l_partkey") === r.getLong(0))
        .agg(sum("q")).collect()(0).getDouble(0)
      2.0 * r.getAs[Double]("q") > partTotal
    }
    assert(hasMajority)
  }

  test("importantStock: every reported part really exceeds 2x the mean share") {
    val rows = Reports.importantStock(spark, sf).collect()
    assert(rows.nonEmpty)
    // recount the per-part values and the mean from the raw fixture
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
      .join(spark.read.parquet(s"$sf/nation.parquet"),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3").select("s_suppkey")
    val pp = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(sup, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey").agg(sum("l_extendedprice").as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mean = pp.values.sum / pp.size
    // doubles here are a recount, not the exact decimal compare — leave
    // slack only for values hugging the threshold
    rows.foreach { r =>
      val v = pp(r.getAs[Long]("p_partkey"))
      assert(v > 2.0 * mean - 1e-6, s"part ${r.getAs[Long]("p_partkey")}")
    }
    // fewer than half the parts can exceed twice the mean
    assert(rows.length * 2 < pp.size)
  }

  test("recallIvf: 8 audited queries, recall consistent with the two served results") {
    val rows = Similarity_recall()
    assert(rows.length == 8)
    val exact = graft.llm.Similarity.bruteTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = graft.llm.Similarity.ivfTrainedTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id")
      assert(r.getAs[Long]("n_exact") == 10L)
      val hits = exact.count { case (qq, nn) => qq == q && approx((qq, nn)) }
      assert(r.getAs[Long]("n_hit") == hits.toLong)
      assert(r.getAs[Double]("recall") == hits.toDouble / 10.0)
    }
  }

  private def Similarity_recall() =
    graft.llm.Similarity.recallIvf(spark, sf).collect()

  test("lateralTop: exactly the window top-2 per nation, decorrelated plan") {
    val rows = Joins.lateralTop(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Double]("c_acctbal")))
    val perNation = rows.groupBy(_._1)
    assert(perNation.values.forall(_.length <= 2))
    // recount one nation's true top-2 via the window form
    val (n0, got) = perNation.head
    val nk = spark.read.parquet(s"$sf/nation.parquet")
      .filter(col("n_name") === n0).collect()(0).getAs[Int]("n_nationkey")
    val truth = spark.read.parquet(s"$sf/customer.parquet")
      .filter(col("c_nationkey") === nk)
      .orderBy(col("c_acctbal").desc, col("c_custkey")).limit(2)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("c_acctbal")))
    assert(got.map(t => (t._2, t._3)).sortBy(_._1).toSeq ==
      truth.sortBy(_._1).toSeq)
    // decorrelated: a set-based window plan, not a per-outer-row probe
    val plan = Joins.lateralTop(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.linesIterator.take(6).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("flagAggs: every flag recounted from the raw orders") {
    val rows = Aggregates.flagAggs(spark, sf).collect()
    assert(rows.nonEmpty)
    val o = spark.read.parquet(s"$sf/orders.parquet").collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
    rows.foreach { r =>
      val grp = o(r.getString(0))
      assert(r.getAs[Long]("n_big") ==
        grp.count(_.getAs[Double]("o_totalprice") > 100000.0).toLong)
      assert(r.getAs[Boolean]("any_finished") ==
        grp.exists(_.getAs[String]("o_orderstatus") == "F"))
      assert(r.getAs[Boolean]("all_positive") ==
        grp.forall(_.getAs[Double]("o_totalprice") > 0.0))
    }
  }

  test("minBalSupplier: per-part argmin verified for the top row") {
    val rows = Reports.minBalSupplier(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // one row per part
    val parts = rows.map(_.getAs[Long]("p_partkey"))
    assert(parts.distinct.length == parts.length)
    // recount the top row's argmin among its true candidate suppliers
    val r0 = rows.head
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_partkey") === r0.getAs[Long]("p_partkey"))
      .select("l_suppkey").distinct()
    val n = spark.read.parquet(s"$sf/nation.parquet")
    val reg = spark.read.parquet(s"$sf/region.parquet")
      .filter(col("r_name") === "EUROPE")
    val minBal = spark.read.parquet(s"$sf/supplier.parquet")
      .join(li, col("s_suppkey") === col("l_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .agg(min("s_acctbal")).collect()(0).getDouble(0)
    assert(r0.getAs[Double]("s_acctbal") == minBal)
  }
}
