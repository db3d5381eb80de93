package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Statistical-LM document score (TextAnalysis.lmScore): a doc whose word
  * sequences the corpus has seen scores higher than one gluing the same
  * vocabulary into unseen orders; scores stay in (0, 1]; degenerate docs
  * (<2 tokens) surface with n_bigrams=0 and NULL score. */
class LmScoreSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("lmspec").toString
    // "the cat sat on the mat" repeated = the corpus's dominant sequences;
    // doc 4 reuses exactly that vocabulary in an order no other doc has
    val common = "the cat sat on the mat"
    val rows = java.util.Arrays.asList(
      Row(1L, common),
      Row(2L, common),
      Row(3L, common),
      Row(4L, "mat the on sat cat the"),
      Row(5L, "the"),
      Row(6L, null))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val rows =
    TextAnalysis.lmScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap

  test("corpus-typical sequences outscore a shuffled reuse of the same words") {
    val typical = rows(1L).getDouble(4)
    val shuffled = rows(4L).getDouble(4)
    assert(typical > shuffled,
      s"typical=$typical shuffled=$shuffled")
  }

  test("scores are prefix-weighted mean conditional probabilities in (0, 1]") {
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val sc = rows(id).getDouble(4)
      assert(sc > 0.0 && sc <= 1.0, s"doc $id: $sc")
    }
    // identical docs get the identical score
    assert(rows(1L).getDouble(4) == rows(2L).getDouble(4))
  }

  test("docs with fewer than 2 tokens surface with 0 bigrams and NULL score") {
    for (id <- Seq(5L, 6L)) {
      assert(rows(id).getLong(1) == 0L, s"doc $id n_bigrams")
      assert(rows(id).isNullAt(4), s"doc $id lm_score")
    }
    assert(rows.size == 6) // the left join keeps every doc
  }
}
