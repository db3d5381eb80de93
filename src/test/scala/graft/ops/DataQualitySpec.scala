package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The audit must actually DETECT violations — on the clean fixtures every
  * count is zero, which proves nothing. Seed a doctored warehouse (dup pk,
  * null FK, orphans on both FK edges, out-of-domain values) and assert the
  * audit names each broken expectation with its exact count. */
class DataQualitySpec extends SparkSpec {

  private lazy val dirtyDir: String = {
    val s = spark
    import s.implicits._
    val dir = s"/tmp/graft_dq_fixture_${System.nanoTime()}"
    // pk 1 duplicated; custkey 99 has no customer row; one NULL custkey;
    // one non-positive price
    Seq(
      (1L, Some(10L), 100.0), (1L, Some(10L), 100.0),
      (2L, Some(11L), 50.0), (3L, None: Option[Long], 75.0),
      (4L, Some(99L), -5.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // orderkey 77 orphaned; one qty <= 0; one discount out of [0,1];
    // one NULL shipdate
    Seq(
      (1L, 5.0, 0.05, Some("1996-01-01")),
      (2L, 0.0, 0.05, Some("1996-01-02")),
      (77L, 3.0, 1.5, Some("1996-01-03")),
      (2L, 4.0, 0.0, None: Option[String]))
      .toDF("l_orderkey", "l_quantity", "l_discount", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp")).drop("ship")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq(10L, 11L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    dir
  }

  test("audit reports exact violation counts per seeded expectation") {
    val got = DataQuality.audit(spark, dirtyDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "orders_pk_duplicate" -> 1L,            // 5 rows, 4 distinct keys
      "orders_custkey_null" -> 1L,
      "orders_totalprice_nonpositive" -> 1L,
      "lineitem_quantity_nonpositive" -> 1L,
      "lineitem_discount_range" -> 1L,
      "lineitem_shipdate_null" -> 1L,
      "lineitem_fk_orders_orphan" -> 1L,      // orderkey 77
      "orders_fk_customer_orphan" -> 1L))     // custkey 99 (NULL is its own check)
  }

  test("audit is all-zero on the clean fixture") {
    val v = DataQuality.audit(spark, sf).collect()
    assert(v.length == 8 && v.forall(_.getLong(1) == 0L))
  }

  test("incremental merge equals direct recompute (Spark-side identity)") {
    val merged = Aggregates.incrementalMerge(spark, sf).collect()
    val direct = graft.Tables.t(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("o_orderpriority").collect()
    assert(merged.toSeq == direct.toSeq)
  }

  test("exact-moment corr matches Spark's streaming corr() to 1e-9") {
    val exact = Aggregates.corrAgg(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val builtin = graft.Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet == builtin.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-9, s"$k: $v vs ${builtin(k)}")
      assert(v >= -1.0 && v <= 1.0)
    }
  }

  test("full outer keeps rows unique to either side, zero-filled") {
    val rows = graft.ops.Joins.fullOuter(spark, sf).collect()
    assert(rows.exists(_.getLong(1) == 0L), "no supplier-only nation")
    assert(rows.exists(_.getLong(2) == 0L), "no customer-only nation")
    assert(rows.exists(r => r.getLong(1) > 0L && r.getLong(2) > 0L))
  }

  test("cooccurrence pair-explode form equals the relational self-join form") {
    val fast = graft.llm.Sessions.cooccurrence(spark, sf).collect().toSeq
    val ut = graft.Tables.t(spark, sf, "events")
      .select("user_id", "event_type").distinct()
    val naive = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("type_a", "type_b").collect().toSeq
    assert(fast == naive)
  }
}
