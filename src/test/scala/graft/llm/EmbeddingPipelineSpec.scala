package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end composition of the embedding operators (EmbeddingPipeline):
  * stage accounting, the dedup containment invariant, metadata alignment,
  * and re-run determinism. */
class EmbeddingPipelineSpec extends SparkSpec {

  private lazy val root =
    java.nio.file.Files.createTempDirectory("embpipe").toString
  private lazy val pipe = {
    val p = new EmbeddingPipeline(spark, sf, root)
    p.run()
    p
  }

  test("stage accounting: whiten preserves rows, dedup only removes, metadata aligns") {
    val rows = pipe.stageRows.toMap
    val input = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows("s1_whiten") == input)
    assert(rows("s2_semdedup") <= rows("s1_whiten") && rows("s2_semdedup") > 0)
    assert(rows("s3_scores") == rows("s2_semdedup"))
    assert(rows("s4_codes") == rows("s2_semdedup"))
    assert(rows("s5_serve") > 0)
    assert(rows("s6_balance") <= Clustering.K.toLong && rows("s6_balance") > 0)
  }

  test("balance report conserves the kept set across clusters") {
    pipe // force run
    val sizes = spark.read.parquet(s"$root/s6_balance/clusters.parquet")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n")))
    assert(sizes.map(_._2).sum == pipe.stageRows.toMap.apply("s2_semdedup"))
    // seeds are the K smallest KEPT ids, so every cluster id is a kept id
    val kept = spark.read.parquet(s"$root/s2_semdedup/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(sizes.map(_._1).forall(kept))
  }

  test("kept set is a subset of the input ids with no duplicates") {
    pipe // force run
    val kept = spark.read.parquet(s"$root/s2_semdedup/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0))
    assert(kept.distinct.length == kept.length)
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.forall(all))
  }

  test("re-run is deterministic (same stage accounting)") {
    val first = pipe.stageRows
    val p2 = new EmbeddingPipeline(spark, sf,
      java.nio.file.Files.createTempDirectory("embpipe2").toString)
    p2.run()
    assert(p2.stageRows == first)
  }
}
