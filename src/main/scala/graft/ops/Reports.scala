package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** The second tranche of warehouse report shapes (SURVEY.md §2.2 Group B —
  * the Redshift capability class the reference loads into,
  * /root/reference/README.md:5). Joins.scala carries Q1/Q3/Q5/Q6/Q7/Q10/Q14/
  * Q18/Q19/Q21/Q22; this file completes the TPC-H report family with the
  * remaining shapes, each adapted to this star schema's columns and written
  * in its scalable form:
  *
  *   - correlated EXISTS / per-group scalars become one keyed exchange that
  *     is reused by a window or a join-back (never a re-scan per row);
  *   - money math stays in the decimal-staged exact discipline (dsum2 /
  *     dsum10) so the DuckDB oracle hash-matches bit-for-bit;
  *   - threshold compares against means/shares are DIVISION-FREE (cross-
  *     multiplied in exact decimal) — a quotient would round differently
  *     per engine while products and sums are exact;
  *   - broadcast hints only on BOUNDED-FOREVER dims (region/nation) and
  *     1-row scalars; supplier/part slices GROW with SF and carry no hint —
  *     the planner broadcasts them while they fit and degrades to a shuffle
  *     join past autoBroadcastJoinThreshold (the Joins.multi customer
  *     discipline) instead of dying at the 8 GB broadcast limit;
  *   - facts cut at the scan, tops are TakeOrderedAndProject.
  */
object Reports {

  /** Order-priority check (TPC-H Q4 shape): orders in one quarter that had
    * at least one late line (shipped > 60 days after order), counted per
    * priority. The EXISTS is a LEFT SEMI join — the quarter predicate cuts
    * orders at the scan, lineitem carries only (orderkey, shipdate), and
    * the non-equi lateness condition rides INSIDE the semi join so each
    * order is emitted at most once with no distinct pass. One orderkey
    * exchange, then a 5-row aggregate. */
  def orderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-07-01") &&
        col("o_orderdate") < lit("1996-10-01"))
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
    o.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** National market share (TPC-H Q8 shape): per order year, the fraction
    * of ASIA-customer revenue supplied by NATION_5. Numerator and
    * denominator ride ONE conditional aggregation over one join tree (no
    * second scan); both are exact decimal sums and the share is a single
    * IEEE division at the very end (promoRevenue discipline). Nation and
    * region broadcast; the two fact joins shuffle on their natural keys. */
  def marketShare(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    val supN = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(n.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .join(supN, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        dsum10(when(col("supp_nation") === "NATION_5", rev).otherwise(lit(0.0)))
          .as("nation_rev"),
        dsum10(rev).as("total_rev"))
      .withColumn("mkt_share", col("nation_rev") / col("total_rev"))
      .orderBy("o_year")
  }

  /** Product-type profit (TPC-H Q9 shape, adapted: no partsupp table, so
    * supply cost is modeled as 60% of the part's retail price). Profit per
    * supplier nation per order year over 'bolt' parts. The part filter cuts
    * the partkey join's build side to a slice the planner broadcasts while
    * it fits (no hint — part grows with SF); the whole profit expression is
    * one decimal-staged exact sum, and the only wide shuffle is the final
    * (nation, year) aggregate. */
  def productProfit(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part").filter(col("p_name").contains("bolt"))
      .select("p_partkey", "p_retailprice")
    val o = t(s, dir, "orders").select("o_orderkey", "o_orderdate")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n = t(s, dir, "nation")
    val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.6) * col("p_retailprice") * col("l_quantity")
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum10(profit).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Shipping-delay priority mix (TPC-H Q12 shape, adapted: no shipmode
    * column, so lines bucket by shipping delay instead). Per delay bucket,
    * how many lines belong to critical- vs normal-priority orders. The
    * bucket derives from an integer datediff (exact on both engines), the
    * two counts ride one conditional aggregation, and the only exchange
    * after the orderkey join is a 4-row aggregate. */
  def shipDelayMix(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
    val o = t(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days",
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      .withColumn("delay_bucket",
        when(col("delay_days") <= 30, "00-30")
          .when(col("delay_days") <= 60, "31-60")
          .when(col("delay_days") <= 90, "61-90")
          .otherwise("90+"))
      .groupBy("delay_bucket")
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("delay_bucket")
  }

  /** Customer order-count distribution (TPC-H Q13 shape): how many
    * customers placed exactly k countable orders (priority '4-NOT
    * SPECIFIED' excluded), INCLUDING the zero-order customers the LEFT
    * join preserves. Two keyed exchanges: custkey (count per customer,
    * partial-aggregated map-side), then the tiny count-of-counts domain.
    * Pure integer arithmetic — exact on any engine. */
  def custDistribution(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select("o_custkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_custkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Top supplier (TPC-H Q15 shape): supplier(s) achieving the maximum
    * quarterly revenue. The revenue rollup partial-aggregates map-side on
    * suppkey; the global max is a one-row broadcast joined back (never a
    * rank-everything sort); equality against the max is safe because both
    * sides surface the SAME exact decimal sum as double. */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-07-01") &&
        col("l_shipdate") < lit("1996-10-01"))
      .groupBy("l_suppkey")
      .agg(dsum10(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .join(t(s, dir, "supplier").select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Parts/supplier relationship (TPC-H Q16 shape): distinct supplier
    * count per (brand, type, size) over a size slice, excluding one brand,
    * PROMO types, and negative-balance suppliers (the schema's stand-in
    * for Q16's complaint suppliers). The part-supplier relation derives
    * from lineitem, collapsed to distinct pairs BEFORE any dimension join
    * (the only fact-sized exchange); the excluded-supplier set is a
    * broadcast anti join; count-distinct re-uses the pair exchange. */
  def partsSupplierCount(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    val p = t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#12" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val badSup = t(s, dir, "supplier").filter(col("s_acctbal") < 0.0)
      .select("s_suppkey")
    pairs
      .join(badSup, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** Small-quantity-order revenue (TPC-H Q17 shape): average yearly
    * revenue lost if small orders (quantity below 20% of the part's mean
    * quantity) were not filled, over one brand+type slice. The correlated
    * per-part mean becomes ONE partkey rollup joined back on the same key;
    * the 20%-of-mean compare is division-free — `5·qty·n < sum` in exact
    * decimal — and only the final /7 is IEEE. */
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#5" && col("p_type") === "SMALL")
      .select("p_partkey")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"),
        count(lit(1)).as("n_qty"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity").cast(DecimalType(18, 2)) * col("n_qty") * lit(5)
        < col("sum_qty"))
      .agg((dsum2(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n"))
  }

  /** Excess-volume suppliers (TPC-H Q20 shape): suppliers who alone
    * shipped more than half of a 'small'-part's 1996 volume, with their
    * nation. One (partkey, suppkey) rollup; the per-part total is a window
    * over the SAME partkey exchange (no join back); the half-share compare
    * is division-free in exact decimal (`2·supp > total`); supplier and
    * nation join after the offenders have collapsed to a rare set. */
  def excessSupplier(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(col("p_name").startsWith("small"))
      .select("p_partkey")
    val perPS = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("supp_qty"))
    val excess = perPS
      .withColumn("part_qty",
        sum(col("supp_qty")).over(Window.partitionBy("l_partkey")))
      .filter(col("supp_qty") * lit(2) > col("part_qty"))
      .select("l_suppkey").distinct()
    excess
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"))
      .orderBy("s_name")
  }

  /** Important stock (TPC-H Q11 shape, adapted: no partsupp, so a part's
    * supply value from one nation's suppliers derives from shipment value).
    * Parts whose NATION_3-supplied value exceeds 2× the mean per-part value
    * — relative to the part-count mean rather than a fixed corpus fraction,
    * because Q11's absolute threshold degenerates as the domain grows (the
    * original benchmark scales its fraction by 1/SF for the same reason).
    * Both structures in scalable form: the global (total, n) is a 1-row
    * broadcast over the SAME partkey rollup (no second scan), and the
    * mean compare is DIVISION-FREE — value·n > 2·total in exact decimal.
    * The nation's supplier set is a semi join cut at the dimension scan
    * (unhinted — supplier grows with SF; the planner broadcasts it while
    * it fits). */
  def importantStock(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3")
      .select("s_suppkey")
    val perPart = t(s, dir, "lineitem")
      .join(sup, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_partkey")
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("v"))
    val tot = perPart.agg(sum(col("v")).as("total"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(tot))
      .filter(col("v") * col("n_parts") > col("total") * lit(2))
      .select(col("l_partkey").as("p_partkey"),
        col("v").cast("string").cast("double").as("supply_value"))
      .orderBy(col("supply_value").desc, col("p_partkey"))
  }

  /** Min-balance supplier per part (TPC-H Q2 shape, adapted: no partsupp,
    * so "cost" is the supplier's account balance and the part-supplier
    * relation derives from shipments). For STANDARD parts under size 16
    * supplied from EUROPE, the single lowest-balance supplier per part
    * (ties break on suppkey — deterministic on both engines). The distinct
    * pair collapse happens before dimension joins; the per-part argmin is
    * a row_number over one partkey exchange; top-100 by balance is
    * TakeOrderedAndProject. */
  def minBalSupplier(s: SparkSession, dir: String): DataFrame = {
    val pairs = t(s, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    val p = t(s, dir, "part")
      .filter(col("p_type") === "STANDARD" && col("p_size") < 16)
      .select("p_partkey", "p_name")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "EUROPE")
    val sup = t(s, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    val w = Window.partitionBy("p_partkey")
      .orderBy(col("s_acctbal"), col("s_suppkey"))
    pairs
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(100)
  }
}
