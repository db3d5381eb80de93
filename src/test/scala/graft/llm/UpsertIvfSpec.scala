package graft.llm

import graft.SparkSpec

/** IVF index maintenance: the O(batch) incremental add must be EXACTLY the
  * serve a from-scratch rebuild against the same frozen centroids would
  * produce, the late batch must actually be live in results, the add's
  * build must scan only the new rows, and the serve must stay cell-pruned
  * on BOTH list tables. Bit-exactness of the emitted frame is the DuckDB
  * oracle's job (q_sim_ivf_upsert hash-checked). */
class UpsertIvfSpec extends SparkSpec {

  test("serve-after-add equals the from-scratch rebuild, bit for bit") {
    val got = IvfMaintenance.upsertServe(spark, sf).collect().toSeq
    val want = IvfMaintenance.rebuildServe(spark, sf).collect().toSeq
    assert(got == want)
  }

  test("the late batch is live: new neighbors are served without a rebuild") {
    val served = IvfMaintenance.upsertServe(spark, sf)
      .selectExpr("sum(is_new)").collect()(0).getLong(0)
    assert(served > 0L, "no late-batch vector reached any top-10")
    // and every flag is consistent with the cut
    val cut = IvfMaintenance.baseCut(spark, sf)
    IvfMaintenance.upsertServe(spark, sf).collect().foreach { r =>
      assert(r.getLong(4) == (if (r.getLong(1) >= cut) 1L else 0L))
    }
  }

  test("the incremental add scans only the new rows") {
    IvfMaintenance.upsertServe(spark, sf).count() // publishes the index
    val cut = IvfMaintenance.baseCut(spark, sf)
    val plan = IvfMaintenance.assignSlice(spark, sf, cut, newRows = true)
      .queryExecution.executedPlan.toString
    val embScans = plan.linesIterator.filter(_.contains("embeddings.parquet")).toSeq
    assert(embScans.nonEmpty)
    embScans.foreach(l =>
      assert(l.contains("GreaterThanOrEqual(vec_id"),
        s"the add's corpus scan is not slice-pruned (a base re-scan):\n$l"))
  }

  test("the serve prunes BOTH list tables to the probed cells") {
    IvfMaintenance.upsertServe(spark, sf).count()
    val plan = IvfMaintenance.upsertServe(spark, sf)
      .queryExecution.executedPlan.toString
    val pruned = "PartitionFilters: \\[[^\\]]*cent_id".r.findAllIn(plan).size
    assert(pruned >= 2,
      s"expected cell pruning on base AND delta list scans, got $pruned:\n$plan")
  }

  test("frozen-index versions publish once; later serves read the pointers") {
    IvfMaintenance.upsertServe(spark, sf).count()
    val cv = graft.etl.Warehouse.currentVersion(spark,
      IvfMaintenance.centsTarget(spark, sf))
    val snap = graft.etl.Warehouse.readSnapshot(spark,
      IvfMaintenance.listsRoot(spark, sf))
    assert(cv.isDefined && snap.isDefined)
    assert(snap.get.keySet == Set("base", "delta"),
      s"fresh index must snapshot both members, got ${snap.get.keySet}")
    IvfMaintenance.upsertServe(spark, sf).count()
    assert(graft.etl.Warehouse.currentVersion(spark,
      IvfMaintenance.centsTarget(spark, sf)) == cv)
    assert(graft.etl.Warehouse.readSnapshot(spark,
      IvfMaintenance.listsRoot(spark, sf)) == snap,
      "a later serve republished the list snapshot")
  }
}
