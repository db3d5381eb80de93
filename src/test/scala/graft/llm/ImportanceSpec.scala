package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR-style importance weights: structural bounds (target support can
  * never exceed raw support; weights positive and finite) and the signal
  * contract — documents FROM the target domain must score higher on
  * average than the rest, or the weight would be useless as a resampling
  * key. Bit-exactness of every value is the DuckDB oracle's job. */
class ImportanceSpec extends SparkSpec {

  private lazy val rows = Curation.importanceWeight(spark, sf)
    .join(graft.Tables.t(spark, sf, "documents").select("doc_id", "source"),
      "doc_id")
    .collect()

  test("supports are exact and bounded: 0 <= sup_tgt <= sup_raw, imp > 0") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (supTgt, supRaw, imp) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(supTgt >= 0L && supTgt <= supRaw)
      assert(imp >= 0.0 && !imp.isNaN && !imp.isInfinite)
      assert(r.getLong(1) > 0L) // every fixture doc tokenizes non-empty
    }
  }

  test("target-domain docs score higher on average than the rest") {
    val (tgt, rest) = rows.partition(
      _.getString(5) == Curation.ImportanceTarget)
    assert(tgt.nonEmpty && rest.nonEmpty)
    val meanTgt = tgt.map(_.getDouble(4)).sum / tgt.length
    val meanRest = rest.map(_.getDouble(4)).sum / rest.length
    info(f"mean imp: target $meanTgt%.3f vs rest $meanRest%.3f")
    assert(meanTgt > meanRest)
  }
}
