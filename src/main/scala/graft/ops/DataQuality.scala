package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-quality expectations — the contract checks a warehouse runs after
  * every load (the reference trusts its API payloads blindly; at 100 TB a
  * bad load must be caught by machine, not by a downstream analyst). The
  * audit emits one row per named check with its exact violation count, so
  * a gate is `max(violations) == 0` and a failure names the broken
  * expectation.
  *
  * Scale shape: per-table checks are ONE conditional-aggregation scan per
  * table (every check is a partial-aggregatable SUM(CASE…)/COUNT DISTINCT
  * over the same pass — adding a check adds no scan), then `stack` unpivots
  * the single wide row. Referential checks are LEFT ANTI join counts keyed
  * on the FK — the orphan side shuffles on the key it would join on anyway,
  * and a dimension-sized parent (customer) broadcasts. */
object DataQuality {

  def audit(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val li     = t(s, dir, "lineitem")
    val cust   = t(s, dir, "customer")

    // one scan over orders: pk uniqueness, null FK, value domain
    val ordersChecks = orders
      .agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_dup"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("fk_null"),
        sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)).as("price_dom"))
      .select(expr(
        """stack(3,
             'orders_pk_duplicate',           pk_dup,
             'orders_custkey_null',           fk_null,
             'orders_totalprice_nonpositive', price_dom)
           AS (check_name, violations)"""))

    // one scan over lineitem: value domains + required column
    val liChecks = li
      .agg(
        sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L)).as("qty_dom"),
        sum(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1L)
          .otherwise(0L)).as("disc_dom"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("ship_null"))
      .select(expr(
        """stack(3,
             'lineitem_quantity_nonpositive', qty_dom,
             'lineitem_discount_range',       disc_dom,
             'lineitem_shipdate_null',        ship_null)
           AS (check_name, violations)"""))

    // referential integrity: anti-join orphan counts keyed on the FK
    val liOrphans = li.select("l_orderkey")
      .join(orders.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("lineitem_fk_orders_orphan").as("check_name"), col("violations"))

    // NULL FKs are their own expectation (orders_custkey_null) — the orphan
    // check counts only non-null keys with no parent, so a row never
    // double-counts across checks
    val orderOrphans = orders.select("o_custkey")
      .filter(col("o_custkey").isNotNull)
      .join(broadcast(cust.select("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders_fk_customer_orphan").as("check_name"), col("violations"))

    ordersChecks.unionByName(liChecks)
      .unionByName(liOrphans).unionByName(orderOrphans)
      .orderBy("check_name")
  }

  /** Cross-system table fingerprints — the reconciliation primitive for
    * "does the replica/migrated copy hold EXACTLY the source's rows"
    * without moving either table: per table, the row count plus two
    * ORDER-INDEPENDENT digests of a canonical per-row serialization
    * (XOR of 60-bit row hashes, which an equal-pair insertion can fool,
    * and their exact decimal SUM, which it can't — together they pin the
    * row multiset). Every aggregate is commutative/associative, so each
    * table is ONE partial-aggregatable scan: the shuffle carries 3 values
    * per partition regardless of table size, and two engines can compare
    * 100 TB tables by exchanging three numbers.
    *
    * Canonical form discipline (cross-engine): integers and strings cast
    * verbatim, money through DECIMAL(18,2) (renders scale-padded the same
    * in Spark and DuckDB — never raw double→string), timestamps as epoch
    * MICROSECOND integers (never timestamp→string). */
  def tableChecksum(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.TextHash.tokHash
    def sigOf(name: String, df: DataFrame, cols: org.apache.spark.sql.Column*) = {
      val withH = df.select(tokHash(concat_ws("|", cols: _*)).as("h"))
      withH.agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_sig"),
          // surfaced as a canonical digit string: DECIMAL(38,0) is exact in
          // both engines but its dtype round-trips differently through the
          // driver's hasher (Spark parquet decimal vs DuckDB hugeint render)
          sum(col("h").cast("decimal(38,0)")).cast("string").as("sum_sig"))
        .select(lit(name).as("table_name"), col("n_rows"), col("xor_sig"), col("sum_sig"))
    }
    val orders = sigOf("orders", t(s, dir, "orders"),
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast("decimal(18,2)"),
      unix_micros(col("o_orderdate").cast("timestamp")), col("o_orderpriority"))
    val cust = sigOf("customer", t(s, dir, "customer"),
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal").cast("decimal(18,2)"), col("c_mktsegment"))
    val li = sigOf("lineitem", t(s, dir, "lineitem"),
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(18,2)"),
      col("l_extendedprice").cast("decimal(18,2)"), col("l_returnflag"),
      unix_micros(col("l_shipdate").cast("timestamp")))
    orders.unionByName(cust).unionByName(li).orderBy("table_name")
  }
}
