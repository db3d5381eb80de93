package graft.llm

import graft.SparkSpec

/** The int8 serve path (Similarity.ivfQuantizedTopK) against the float
  * serve as truth: quantization must not wreck retrieval (recall@10), and
  * the recorded dequantization error must respect the analytic per-element
  * bound — which is what makes `quantize` a usable storage format rather
  * than a demo. */
class QuantizedServeSpec extends SparkSpec {

  test("quantized IVF serve keeps high recall vs the float serve") {
    val fl = Similarity.ivfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val qz = Similarity.ivfQuantizedTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    assert(fl.keySet == qz.keySet, "same query set on both paths")
    val recalls = fl.keys.toSeq.map { q =>
      val a = fl(q).map(_._2).toSet
      val b = qz(q).map(_._2).toSet
      a.intersect(b).size.toDouble / a.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.8, s"mean recall@10 $mean (per-query: $recalls)")
  }

  test("dequantization error respects the analytic bound") {
    // per element |x - q·s/127| <= s/254 + ulp slack, so L2^2 <= d·(s/254)^2
    val rows = Similarity.quantCodes(spark, sf)
      .selectExpr("vec_id", "size(codes) AS d")
      .join(Similarity.quantize(spark, sf), "vec_id")
      .selectExpr("d", "maxabs", "l2_err").collect()
    rows.foreach { r =>
      val d = r.getInt(0); val s = r.getDouble(1); val err = r.getDouble(2)
      val bound = d * math.pow(s / 254.0, 2) * (1.0 + 1e-9)
      assert(err <= bound, s"l2_err $err exceeds bound $bound (d=$d, maxabs=$s)")
    }
  }

  test("codes stay within the int8 range") {
    val bad = Similarity.quantCodes(spark, sf)
      .selectExpr("vec_id", "filter(codes, c -> c < -127 OR c > 127) AS oob")
      .where("size(oob) > 0").count()
    assert(bad == 0L)
  }

  test("registered codes_str is exactly the comma-joined int codes") {
    val mismatch = Similarity.quantCodes(spark, sf)
      .selectExpr("vec_id",
        "array_join(transform(codes, c -> CAST(c AS STRING)), ',') AS expect")
      .join(Similarity.quantize(spark, sf), "vec_id")
      .where("expect <> codes_str").count()
    assert(mismatch == 0L)
  }

  test("quantized serve reads only probed cell directories of the code lists") {
    Similarity.ivfQuantizedTopK(spark, sf).count() // publishes the lists
    val plan = Similarity.ivfQuantizedTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cent_id".r.findFirstIn(plan).isDefined,
      s"no partition filter on the code-list scan:\n$plan")
    // the raw embeddings table is touched only by the 16-row centroid and
    // 8-row query sides — every scan of it carries a pushed vec_id bound
    val embScans = plan.linesIterator.filter(_.contains("embeddings.parquet")).toSeq
    assert(embScans.nonEmpty)
    embScans.foreach(l =>
      assert(l.contains("LessThan(vec_id"),
        s"an embeddings scan without a query/centroid pushdown (corpus re-scan):\n$l"))
  }
}
