package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end composition of the curation operators (CurationPipeline):
  * stage row accounting is monotone where it must be, the invariants each
  * stage exists for hold on the FINAL artifact (no duplicate chunk hashes,
  * no benchmark parents, bins within budget, every row split-assigned),
  * and the whole pipeline is deterministic — a re-run produces the
  * identical artifact (no RNG, no timestamp, no partition-order leak). */
class CurationPipelineSpec extends SparkSpec {

  private lazy val root =
    java.nio.file.Files.createTempDirectory("curpipe").toString
  private lazy val pipe = {
    val p = new CurationPipeline(spark, sf, root)
    p.run()
    p
  }

  test("stage accounting: every filter stage is monotone, nothing empties") {
    val rows = pipe.stageRows.toMap
    val n0 = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows("s1_quality") <= n0 && rows("s1_quality") > 0)
    assert(rows("s2_dedup") <= rows("s1_quality") && rows("s2_dedup") > 0)
    assert(rows("s3_decontam") <= rows("s2_dedup") && rows("s3_decontam") > 0)
    assert(rows("s3b_tokenizer") == TextAnalysis.BpeTrainRounds.toLong)
    assert(rows("packed") > 0)
    // the gate keeps at least 1 - 1/ThresholdDen of the corpus
    assert(rows("s1_quality") >= n0 - n0 / Curation.ThresholdDen)
  }

  test("final artifact invariants: chunk-unique, decontaminated, packed, split") {
    val out = pipe.packed()
    val n = out.count()
    assert(out.select("chunk_hash").distinct().count() == n,
      "chunk-level dedup must leave chunk hashes unique")
    assert(out.filter(col("doc_id") % Curation.BenchMod === 0).count() == 0,
      "benchmark docs never reach the packed set")
    assert(out.filter(col("bin_offset") >= Curation.PackBudget).count() == 0)
    assert(out.filter(!col("split").isin("train", "val", "test")).count() == 0)
    // bins are dense per (source, pack_shard): max bin_id consistent with
    // the shard's token mass
    val tot = out.groupBy("source", "pack_shard")
      .agg(sum("n_tokens").as("mass"), max("bin_id").as("maxbin"))
      .collect()
    tot.foreach { r =>
      val bins = r.getLong(3) + 1
      assert(bins <= r.getLong(2) / Curation.PackBudget + 1,
        s"(${r.getString(0)}, shard ${r.getLong(1)}): $bins bins for ${r.getLong(2)} tokens")
    }
  }

  test("a deduped-away benchmark twin still poisons its surviving copy (eval-leak net)") {
    // bench doc 97 (97 % BenchMod == 0) is byte-identical to train doc 5:
    // exact dedup keeps the MIN id (5) and drops 97 — decontamination must
    // still drop 5, because its text IS the benchmark text
    val benchText = (0 until 40).map(i => s"bench$i").mkString(" ")
    val root2 = java.nio.file.Files.createTempDirectory("curpipe_leak").toString
    val src = java.nio.file.Files.createTempDirectory("curpipe_leak_src").toString
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(5L, benchText, "en", "web", benchText.length.toLong),
      org.apache.spark.sql.Row(97L, benchText, "en", "web", benchText.length.toLong),
      org.apache.spark.sql.Row(6L, (0 until 40).map(i => s"clean$i").mkString(" "),
        "en", "web", 400L))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$src/documents.parquet")
    val p = new CurationPipeline(spark, src, root2)
    p.run()
    val parents = p.packed().select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(parents == Set(6L),
      s"only the clean doc may train, got $parents (5 = leaked benchmark twin)")
  }

  test("training order: every train chunk carries its doc's curriculum position") {
    val ord = pipe.ordered()
    val nTrain = pipe.packed().filter(col("split") === "train").count()
    assert(ord.count() == nTrain, "every train chunk gets a position, only those")
    assert(ord.filter(col("stage") < 1 ||
      col("stage") > Curation.CurriculumStages).count() == 0)
    // chunks of one doc share exactly one (stage, shard, seq) position
    assert(ord.select("doc_id", "stage", "shard", "seq").distinct().count() ==
      ord.select("doc_id").distinct().count())
    // the curriculum contract survives the join: stages are quality-logit
    // INTERVALS over the cleaned corpus (easy stage-k floor ≥ stage-k+1 ceiling)
    val logits = Curation.qualityLogit(spark, s"$root/s3_decontam")
      .select("doc_id", "logit_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byStage = ord.select("doc_id", "stage").distinct().collect()
      .groupBy(_.getLong(1)).view
      .mapValues(_.map(r => logits(r.getLong(0)))).toMap
    byStage.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(k, k1) => assert(byStage(k).min >= byStage(k1).max,
        s"ordered stages $k/$k1 overlap on logit")
      case _ =>
    }
  }

  test("the pipeline is deterministic: a re-run yields the identical artifact") {
    val first = pipe.packed().orderBy("doc_id", "chunk_idx").collect().toSeq
    val root2 = java.nio.file.Files.createTempDirectory("curpipe2").toString
    val p2 = new CurationPipeline(spark, sf, root2)
    p2.run()
    val second = p2.packed().orderBy("doc_id", "chunk_idx").collect().toSeq
    assert(first == second)
    assert(pipe.stageRows == p2.stageRows)
    val o2 = p2.ordered().orderBy("stage", "shard", "seq", "chunk_idx")
      .collect().toSeq
    assert(pipe.ordered().orderBy("stage", "shard", "seq", "chunk_idx")
      .collect().toSeq == o2)
  }
}
