package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale check for the parameterized ANN (VERDICT r1 item 7): candidate
  * counts from the bucketed LSH join must grow LINEARLY with corpus size
  * (Q·(planes+1)·N/2^planes), never quadratically — the property that makes
  * the plan survive a 100× scale-up. Runs the real candidate stage on the
  * sf0.1 corpus and on a 10× replica, and logs the counts (ROUNDLOG records
  * them as the stress-tier evidence). */
class AnnStressSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.1"
  private val stress = "/tmp/graft_ann_stress"

  test("LSH candidates scale ~10x at 10x corpus, for both probe settings") {
    val e = spark.read.parquet(s"$base/embeddings.parquet")
    val tenX = (0 until 10).map(i =>
      e.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
    tenX.write.mode("overwrite").parquet(s"$stress/embeddings.parquet")

    for ((planes, dist) <- Seq((Similarity.Planes, 0), (Similarity.MultiProbePlanes, 1))) {
      val c1 = Similarity.lshCandidates(spark, base, planes, dist).count()
      val c10 = Similarity.lshCandidates(spark, stress, planes, dist).count()
      info(s"planes=$planes probeDist=$dist: candidates 1x=$c1 10x=$c10 (ratio ${c10.toDouble / c1})")
      assert(c10 >= c1 * 5, s"expected ~10x growth, got $c1 -> $c10")
      assert(c10 <= c1 * 15, s"super-linear candidate growth: $c1 -> $c10")
    }
  }
}
