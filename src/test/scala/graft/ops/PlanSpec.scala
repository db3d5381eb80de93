package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Locks in the physical-plan shapes the 100 TB posture depends on
  * (SCALE.md): broadcasts where intended, pushdown reaching the scans,
  * top-k as TakeOrderedAndProject, no accidental cartesian products. */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("dpp join prunes fact partitions with a runtime dim-key subquery") {
    val p = plan("q_join_dpp")
    assert(p.contains("dynamicpruning"), p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("flagship star join broadcasts every dimension") {
    val p = plan("q_join_multi")
    assert(p.contains("BroadcastHashJoin"))
    // customer, nation, region explicitly broadcast (orders may be too at
    // this fixture size — planner's call)
    assert("BroadcastExchange".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"))
  }

  test("flagship degrades customer join to a shuffle join past the broadcast threshold") {
    // customer carries no broadcast hint (it grows with SF); when the planner
    // may not broadcast it the plan must fall back to a shuffle join — not
    // fail, and not force a broadcast that would blow the 8 GB limit at 100×.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1KB")
      val p = plan("q_join_multi")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
      // region/nation stay broadcast — they are hinted, dimension-sized forever
      assert("BroadcastExchange".r.findAllIn(p).size >= 2, p)
    } finally spark.conf.set(key, prev)
  }

  test("date filter is pushed into the orders parquet scan") {
    val p = SparkEntry.queries("q_join_multi")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(o_orderdate"), p)
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("q_topk").contains("TakeOrderedAndProject"))
  }

  test("Q6-shape predicates all reach the lineitem scan") {
    // executedPlan.toString truncates PushedFilters; formatted mode is full
    val p = SparkEntry.queries("q_agg_revenue_slice")(spark, sf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters"), p)
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
      "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
      "LessThan(l_quantity").foreach(f => assert(p.contains(f), s"$f missing:\n$p"))
  }

  test("column pruning reaches the lineitem scan of the flagship") {
    val p = plan("q_join_multi")
    // ReadSchema must not include unused lineitem columns
    assert(!p.contains("l_shipdate"), "lineitem scan reads unused columns")
    assert(!p.contains("l_comment"))
  }

  test("similarity join is a hash join on the blocking key, not cartesian") {
    val p = plan("q_dedup_embed")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("rank filter uses the WindowGroupLimit pushdown") {
    assert(plan("q_window_rank").contains("WindowGroupLimit"))
  }

  test("partitioned layout prunes directories via PartitionFilters") {
    val p = plan("q_partition_prune")
    assert(p.contains("PartitionFilters") && p.contains("o_year"), p)
  }

  test("round-2 pair generators are bucket joins: no cartesian, no collect_list") {
    for (q <- Seq("q_dedup_shingle", "q_dedup_embed_lsh", "q_decontaminate")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("collect_list"), s"$q: $p")
    }
  }

  test("per-row curation ops stay shuffle-free before the output sort") {
    for (q <- Seq("q_text_repetition", "q_sample_stratified", "q_text_bpe_apply")) {
      val p = plan(q)
      // only the range partitioning of the final orderBy — no hash exchange
      assert(!p.contains("hashpartitioning"), s"$q: $p")
    }
  }

  test("documents scans are column-pruned to what each operator needs") {
    // q_dedup_exact needs (doc_id, text) — the scan must not read the rest
    val p = plan("q_dedup_exact")
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("n_chars") && !p.contains("source"), p)
    // q_text_stats aggregates by (lang, source) — must not read doc_id
    val p2 = plan("q_text_stats")
    assert(!p2.contains("doc_id"), p2)
  }

  test("sequence packing windows by the shard key, never a single partition") {
    val p = plan("q_pack_sequences")
    assert(!p.contains("SinglePartition"), p)
    assert(p.contains("hashpartitioning(source"), p)
  }

  test("round-3 event operators shuffle on user_id, never a global window") {
    // funnel: every join/agg keys on user_id — one co-partitioned shuffle
    // family; retention: no window function at all (min-day via aggregate)
    for (q <- Seq("q_event_funnel", "q_retention")) {
      val p = plan(q)
      assert(p.contains("hashpartitioning(user_id"), s"$q: $p")
      assert(!p.contains("SinglePartition"), s"$q: $p")
      assert(!p.contains("CartesianProduct"), s"$q: $p")
    }
  }

  test("scd2 history runs both windows on ONE custkey shuffle") {
    val p = plan("q_scd2_history")
    // lag (change detect) and lead (validity interval) share the
    // (o_custkey, time) partitioning — exactly one hash exchange before the
    // output sort's range partitioning
    assert("hashpartitioning\\(o_custkey".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("pii scrub and curation gate are pure map stages before the output sort") {
    for (q <- Seq("q_text_pii_scrub", "q_curate_filter")) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning"), s"$q: $p")
      assert(!p.contains("SinglePartition"), s"$q: $p")
    }
  }

  test("round-5 TPC-H shapes: pushdown, pruned customer, top-k, broadcast dims") {
    val p3 = plan("q_join_ship_priority")
    // both fact scans carry pushed date filters; top-10 never global-sorts
    assert(p3.contains("PushedFilters") && p3.contains("LessThan(o_orderdate"), p3)
    assert(p3.contains("GreaterThan(l_shipdate"), p3)
    assert(p3.contains("TakeOrderedAndProject"), p3)
    assert(!p3.contains("CartesianProduct"), p3)
    val p5 = plan("q_join_region_revenue")
    // nation + region broadcast (hinted, fixed-size); date filter pushed
    assert("BroadcastExchange".r.findAllIn(p5).size >= 2, p5)
    assert(p5.contains("GreaterThanOrEqual(o_orderdate"), p5)
    assert(!p5.contains("CartesianProduct"), p5)
  }

  test("round-6 TPC-H shapes: semi-join EXISTS, pushdown, top-k, no cartesian") {
    // Q4: the EXISTS is a LEFT SEMI join with the quarter pushed to the scan
    val p4 = plan("q_join_order_priority")
    assert(p4.contains("LeftSemi"), p4)
    assert(p4.contains("GreaterThanOrEqual(o_orderdate"), p4)
    // Q15: the revenue rollup's quarter predicate reaches the lineitem scan
    val p15 = plan("q_join_top_supplier")
    assert(p15.contains("GreaterThanOrEqual(l_shipdate"), p15)
    assert(!p15.contains("CartesianProduct"), p15)
    // Q2: top-100 is TakeOrderedAndProject, never a global sort
    val p2 = plan("q_join_min_bal_supp")
    assert(p2.contains("TakeOrderedAndProject"), p2)
    // Q17: the per-part rollup and the probe share the partkey — the
    // correlated mean costs ONE extra exchange, not a re-scan per row
    val p17 = plan("q_join_small_qty")
    assert(p17.contains("hashpartitioning(l_partkey") ||
      p17.contains("hashpartitioning(pk"), p17)
    // Q20: per-part total rides a window over the SAME partkey exchange
    val p20 = plan("q_join_excess_supp")
    assert(p20.contains("hashpartitioning(l_partkey"), p20)
    for (q <- Seq("q_join_market_share", "q_join_product_profit",
      "q_join_ship_delay", "q_join_cust_dist", "q_join_parts_supplier",
      "q_join_important_stock"))
      assert(!plan(q).contains("CartesianProduct"), q)
  }

  test("round-5 chunk/quality/attribution shuffle posture") {
    // chunking + quality logit: pure map stages before the output sort
    for (q <- Seq("q_chunk_tokens", "q_quality_logit")) {
      val p = plan(q)
      assert(!p.contains("hashpartitioning"), s"$q: $p")
      assert(!p.contains("SinglePartition"), s"$q: $p")
    }
    // chunk dedup shuffles ONCE, on the digest
    val pd = plan("q_dedup_chunk")
    assert(pd.contains("hashpartitioning(chunk_hash"), pd)
    // attribution: one user_id window exchange, never a global window
    val pa = plan("q_event_attribution")
    assert(pa.contains("hashpartitioning(user_id"), pa)
    assert(!pa.contains("SinglePartition"), pa)
    // chunk packing windows by (source, pack_shard) — the shard sub-key
    // keeps a dominant source from serializing into one task (r13)
    val pp = plan("q_chunk_pack")
    assert(pp.contains("hashpartitioning(source"), pp)
    assert(pp.contains("pack_shard"), pp)
    assert(!pp.contains("SinglePartition"), pp)
    // tf-idf per-doc top-3 is a WindowGroupLimit, not a global sort
    val pt = plan("q_text_tfidf")
    assert(pt.contains("WindowGroupLimit"), pt)
    assert(!pt.contains("CartesianProduct"), pt)
  }

  test("exact percentiles never plan a single-buffer percentile aggregate") {
    // the value-histogram discipline (ExactPercentile): quartile/median
    // bounds must come from a domain-bounded histogram + cumulative window,
    // never from percentile()'s ObjectHashAggregate buffering every value
    for (q <- Seq("q_agg_percentile", "q_event_rfm", "q_histogram_depth")) {
      val p = plan(q)
      assert(!p.contains("percentile("), s"$q plans percentile(): $p")
      assert(!p.contains("ObjectHashAggregate"), s"$q: $p")
    }
  }

  test("ANN serves rank via the k-bounded heap aggregate, never a per-query window") {
    // VERDICT r7 item 1: no serve plan may shuffle a corpus-sized candidate
    // frame into query-cardinality partitioning. The scan-stage serves rank
    // through top_structs (partial aggregation — Q×k rows per partition
    // cross the exchange) and plan NO window partitioned by q_id at all.
    for (q <- Seq("q_sim_topk", "q_sim_lsh", "q_sim_lsh_multiprobe",
      "q_sim_ivf", "q_sim_ivf_trained", "q_sim_ivf_quantized",
      "q_sim_pq_topk", "q_mine_hard_negatives", "q_mine_triplets",
      "q_mine_hard_negatives_ivf", "q_sim_ivf_sweep")) {
      val p = plan(q)
      assert(p.contains("top_structs"), s"$q misses the heap aggregate: $p")
      assert(!p.contains("windowspecdefinition(q_id"),
        s"$q ranks a candidate frame with a q_id window: $p")
    }
    // shortlist+re-rank serves: the corpus-sized Hamming/ADC scan stage is
    // top_structs; the one remaining q_id window ranks only the
    // Q×Shortlist re-rank frame — shortlist-bounded metadata, not a scan
    for (q <- Seq("q_sim_binary_topk", "q_sim_pq_rerank")) {
      val p = plan(q)
      assert(p.contains("top_structs"), s"$q misses the heap aggregate: $p")
      assert("windowspecdefinition\\(q_id".r.findAllIn(p).size <= 1,
        s"$q has more than the re-rank window: $p")
    }
  }

  test("EVERY registered query plans without scale-killers") {
    // catch-all regression net over the whole surface: no cartesian product,
    // no unbounded per-group array aggregation, no single-partition exchange
    // (global sorts are range-partitioned; top-k is TakeOrderedAndProject).
    // allowlisted: the k-means centroid re-assembly collects exactly d=64
    // (pos, mean) elements per centroid — bounded by the embedding dimension,
    // not the corpus (Similarity.trainCentroids).
    // q_stats_drift's collect_list gathers one (bin, term) struct per
    // length-histogram bin — bounded by the bin domain (n_chars/64), not
    // the corpus (Profile.drift's ordered χ² fold).
    // q_graph_triangles' collect_list is the oriented OUT-adjacency — bounded
    // by the degree-orientation out-degree (O(√E), the compact-forward bound),
    // never a hub's raw degree; it is the standard distributed
    // triangle-counting representation (adjacency intersection).
    // q_cluster_kmeans / q_cluster_sizes: the same d=64-bounded centroid
    // reassembly as q_sim_ivf_trained (Clustering.recenter).
    val boundedArrays = Set("q_sim_ivf_trained", "q_stats_drift",
      "q_graph_triangles", "q_cluster_kmeans", "q_cluster_sizes",
      // PQ: every collect_list is bounded by the constant M (8 subspace
      // codes / partial distances) or SubDim (8 recenter means)
      "q_sim_pq_codes", "q_sim_pq_topk", "q_sim_pq_rerank",
      // IVF-PQ: the same M-bounded ADC fold (collect_list of (m, pd) pairs
      // per candidate — exactly M rows per group) plus the SubDim-bounded
      // residual recenter means (llm/IvfPq)
      "q_sim_ivfpq", "q_sim_ivfpq_rerank", "q_sim_ivfpq_recall",
      "q_sim_ivfpq_sweep", "q_sim_ivfpq_upsert",
      // the production freshness serve composes the same M-bounded ADC
      // fold before its Q·Shortlist exact rerank
      "q_sim_ivfpq_upsert_rerank")
    // allowlisted: global SCALAR aggregates (3 labeled counts / one stats
    // row) — the final agg is one row per upstream partition into a 1-row
    // result, after map-side partial aggregation; the single partition
    // carries ~32 rows at any corpus size, not data volume (Joins.antiNull,
    // Profile.profile).
    // q_text_tfidf's N and q_sample_temperature's min(n_source) are the
    // same 1-row broadcast totals as q_stats_skew's corpus count.
    // q_quality_threshold: the global cumulative window runs over the logit
    // VALUE HISTOGRAM — cardinality bounded by the integer logit's domain,
    // independent of corpus rows — and its N / threshold are 1-row
    // broadcasts (Curation.qualityThreshold).
    // q_active_users' max(day) and q_stats_drift's corpus count are the
    // same 1-row broadcast totals as q_stats_skew's.
    // q_dq_audit: every check is a global SCALAR violation count (map-side
    // partial agg → one row per upstream partition into an 8-row audit) —
    // the single partition carries per-check counters, not data volume.
    // q_agg_revenue_slice / q_join_promo_share are single-row reports (the
    // TPC-H Q6/Q14 contract); q_event_rfm's quartile thresholds and
    // max-day are 1-row broadcasts over the per-user aggregate.
    val scalarAggs = Set("q_join_anti_null", "q_stats_profile", "q_stats_skew",
      "q_text_tfidf", "q_sample_temperature", "q_quality_threshold",
      "q_active_users", "q_active_users_sketch", "q_stats_drift", "q_dq_audit",
      // q_active_users_sketch_bound composes the two queries above — same
      // 1-row global max(day) broadcast on each side
      "q_active_users_sketch_bound",
      "q_agg_revenue_slice", "q_join_promo_share", "q_event_rfm",
      // q_sample_target_mix: the corpus total is the same 1-row broadcast
      // as q_sample_temperature's min
      "q_sample_target_mix",
      // q_sample_importance: the (n_raw, n_tgt) corpus totals are the
      // tf-idf 1-row broadcast — one partial per partition, never rows
      "q_sample_importance",
      // q_table_checksum: three global 3-value fingerprint aggregates —
      // the single partition receives one partial row per upstream
      // partition, never data volume (ChecksumSpec)
      "q_table_checksum",
      // q_join_bloom: the scalar subquery that BUILDS the bloom filter is a
      // global aggregate of per-partition bloom partials — one binary value,
      // the runtime-filter shape itself (BloomJoinSpec)
      "q_join_bloom",
      // q_histogram_depth: the quartile BOUNDARIES are a 1-row broadcast
      // (the q_event_rfm threshold pattern); the binning scan is map-only
      "q_histogram_depth",
      // q_agg_cms_topk: the merged corpus sketch is ONE binary value built
      // from per-year partial sketches — bytes per partition, never keys
      "q_agg_cms_topk",
      // q_join_dormant_cust: the above-mean threshold (total, n) is a 1-row
      // broadcast — the q_event_rfm pattern (Joins.dormantCust)
      "q_join_dormant_cust",
      // q_join_top_supplier: the global max revenue is a 1-row broadcast
      // joined back into the per-supplier rollup (Reports.topSupplier)
      "q_join_top_supplier",
      // q_join_small_qty: the TPC-H Q17 contract is a single-row report —
      // the final agg receives one partial per partition (Reports.smallQtyRevenue)
      "q_join_small_qty",
      // q_join_important_stock: the Q11 (total, n) threshold is a 1-row
      // broadcast over the partkey rollup (Reports.importantStock)
      "q_join_important_stock",
      // q_text_bm25: the (n_docs, total_tokens) corpus statistics are the
      // tf-idf 1-row broadcast — one partial per partition, never rows
      "q_text_bm25",
      // q_retrieve_hybrid: inherits bm25's (n_docs, total_tokens) 1-row
      // broadcast for its lexical tower (Fusion.hybridTopK)
      "q_retrieve_hybrid",
      // q_text_bm25_upsert: the merged corpus statistic sums TWO 1-row
      // snapshot members — one partial each, never rows (LexMaintenance)
      "q_text_bm25_upsert",
      // q_retrieve_hybrid_upsert: inherits the same two-member 1-row
      // stats merge for its lexical tower (Fusion.hybridUpsertTopK)
      "q_retrieve_hybrid_upsert",
      // q_curriculum_order: the stage-quartile cumulative window runs over
      // logit HISTOGRAM rows (value-domain cardinality, the
      // q_quality_threshold pattern) + the 1-row n_docs broadcast
      "q_curriculum_order",
      // q_curriculum_pack composes the same histogram stage cut (r11)
      "q_curriculum_pack",
      // q_curriculum_pack_upsert runs that cut once per segment (base +
      // delta addendum) — each cumulative window is over logit-HISTOGRAM
      // rows (value-domain cardinality), plus the same 1-row broadcasts
      "q_curriculum_pack_upsert",
      // q_mix_epochs: the (total_tokens, n_groups) budget base is a 1-row
      // broadcast over the groups-sized schedule frame (Curation.epochSchedule)
      "q_mix_epochs",
      // q_mix_apply embeds the same schedule (and its 1-row budget base)
      "q_mix_apply",
      // q_export_shards: total_tokens -> shard count is the same 1-row
      // broadcast (Curation.shardManifest)
      "q_export_shards")
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val p = plan(q)
      Seq(
        "CartesianProduct" -> p.contains("CartesianProduct"),
        "collect_list" -> (p.contains("collect_list") && !boundedArrays(q)),
        "SinglePartition" -> (p.contains("SinglePartition") && !scalarAggs(q)),
      ).collect { case (what, true) => s"$q: $what" }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
