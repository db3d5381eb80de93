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
    // bins are dense per source: max bin_id consistent with token mass
    val tot = out.groupBy("source")
      .agg(sum("n_tokens").as("mass"), max("bin_id").as("maxbin"))
      .collect()
    tot.foreach { r =>
      val bins = r.getLong(2) + 1
      assert(bins <= r.getLong(1) / Curation.PackBudget + 1,
        s"${r.getString(0)}: $bins bins for ${r.getLong(1)} tokens")
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
  }
}
