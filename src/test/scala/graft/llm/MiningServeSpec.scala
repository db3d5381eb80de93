package graft.llm

import graft.SparkSpec

/** Store-shaped miner: the IVF-served hard negatives must read only probed
  * cell directories of the published inverted lists (partition pruning in
  * the plan), keep every corpus-side scan column-pruned, honor the exact
  * miner's label/ceiling contracts, and land above a recall floor against
  * the exact miner (the serve-quality audit q_mine_recall hash-pins the
  * exact values; this spec pins the floor so a quality collapse fails
  * locally too). */
class MiningServeSpec extends SparkSpec {

  test("serve plan prunes inverted-list partitions; corpus scans stay pruned") {
    Mining.hardNegativesIvf(spark, sf).count() // publish on first call
    val plan = Mining.hardNegativesIvf(spark, sf)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cent_id".r.findFirstIn(plan).isDefined,
      s"no partition filter on the inverted-list scan:\n$plan")
    // the only raw-embeddings scans are the 8-row anchor side (vec_id < 8
    // pushed) and the 2-column label lookup — neither may read the
    // 64-float embedding array for the lookup role
    val embScans = plan.linesIterator
      .filter(l => l.contains("embeddings.parquet") && l.contains("ReadSchema"))
      .toSeq
    assert(embScans.nonEmpty)
    embScans.foreach { l =>
      assert(l.contains("LessThan(vec_id,8)") || !l.contains("embedding:array"),
        s"a corpus-wide embeddings scan reads the vector column:\n$l")
    }
  }

  test("served negatives honor the exact miner's contracts") {
    val rows = Mining.hardNegativesIvf(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) != r.getLong(3), "label predicate must hold")
      assert(r.getDouble(4) <= Mining.NearDupCeiling)
    }
    // ranks contiguous from 1 per anchor
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getLong(5)).sorted.toSeq == (1L to g.length).toSeq)
    }
  }

  test("recall against the exact miner clears the floor") {
    val audit = Mining.mineRecall(spark, sf).collect()
    assert(audit.length == 8)
    val recalls = audit.map(_.getDouble(3))
    info(f"per-anchor recall: min ${recalls.min}%.2f mean ${recalls.sum / recalls.length}%.2f")
    assert(recalls.min >= 0.5,
      s"IVF-served mining recall collapsed: ${recalls.toSeq}")
  }
}
