package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bucketed-layout contract behind q_join_bucketed: after the one-time
  * bucketed write, the daily join on the bucket key plans as a
  * SortMergeJoin with NO Exchange and NO Sort on either side — each task
  * zips bucket i of both tables straight off disk. Values are the DuckDB
  * oracle's job (plain relational algebra); this spec pins the layout and
  * the plan shape, which ARE the operator. */
class BucketedJoinSpec extends SparkSpec {

  private lazy val df = BucketedJoin.revenueByStatus(spark, sf)

  test("at fixture size the planner broadcasts; the scan is still bucketed") {
    df.count() // force table creation + a full run
    val plan = df.queryExecution.executedPlan.toString
    // small orders side under the broadcast threshold → BHJ is the right
    // plan HERE; the bucketed layout costs nothing and the scan reports it
    assert(plan.contains("BroadcastHashJoin"), s"unexpected join shape:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
  }

  test("past the broadcast threshold the join is a zero-exchange SMJ") {
    df.count() // tables exist
    val s = spark
    val old = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // the 100 TB shape: neither fact side broadcastable — the planner
      // must fall back to the bucketed co-located merge with NO exchange
      // on either side (the claim that matters: nothing corpus-sized
      // crosses the network for this daily join, ever)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = BucketedJoin.revenueByStatus(s, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"join re-shuffled a bucketed side:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan does not report a bucketed read:\n$plan")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("with the sorted-scan flag, the per-task sorts disappear too") {
    df.count()
    val s = spark
    val oldB = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Spark >= 3.1 reports bucketed-scan output ordering only under the
      // legacy flag (it forces one-file-per-bucket reads); our writer
      // produces exactly that layout, so turning it on removes the
      // remaining per-task sorts of already-sorted runs
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val plan = BucketedJoin.revenueByStatus(s, sf)
        .queryExecution.executedPlan.toString
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"), s"re-shuffled:\n$plan")
      assert(!joinPart.contains("+- Sort "),
        s"join re-sorted a bucketed side despite sorted single-file buckets:\n$plan")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", oldB)
      s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }

  test("values equal the plain ad-hoc join") {
    val adhoc = graft.Tables.t(spark, sf, "lineitem")
      .join(graft.Tables.t(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(graft.Tables.dsum10(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val got = df.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.sameElements(adhoc))
  }

  test("each bucket is one sorted file (the zero-sort precondition)") {
    df.count()
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED ${tableNameOf("lineitem")}")
      .filter(col("col_name") === "Location").collect()(0).getString(1)
    val files = new java.io.File(loc.stripPrefix("file:"))
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == BucketedJoin.Buckets,
      s"${files.length} part files for ${BucketedJoin.Buckets} buckets — a bucket wrote >1 file, the scan cannot report sortedness")
  }

  test("orphan sweep reclaims aged foreign layouts, spares live ones") {
    df.count() // materialize this app's layouts
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    // an AGED layout from another application: reclaimable
    val dead = new java.io.File(wh, "bkt_lineitem_app_gone_deadbeef")
    dead.mkdirs()
    java.nio.file.Files.write(new java.io.File(dead, "part-0.parquet").toPath,
      Array[Byte](1))
    dead.setLastModified(System.currentTimeMillis() - 60000)
    // a FRESH layout from another application (possibly live): protected
    val fresh = new java.io.File(wh, "bkt_orders_app_live_cafebabe")
    fresh.mkdirs()
    // >= 1: prior test-run applications may have left real orphans too —
    // the sweep reclaims them all
    val swept = BucketedJoin.sweepOrphans(spark, orphanAgeMs = 1000)
    assert(swept >= 1 && !dead.exists(), "aged foreign layout not reclaimed")
    assert(fresh.exists(), "fresh foreign layout must survive the age guard")
    // this app's own tables are never touched, whatever their age
    assert(spark.catalog.tableExists(tableNameOf("lineitem")))
    assert(df.collect().length > 0, "serve broken after sweep")
    fresh.delete()
  }

  private def tableNameOf(table: String): String =
    BucketedJoin.tableName(spark, sf, table)
}
