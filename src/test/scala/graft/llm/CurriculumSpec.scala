package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curriculum ordering: the schedule is a partition of the corpus (every
  * doc exactly once), stages are logit-interval quartiles (easy → hard,
  * ties never straddle a stage), within-(stage, shard) sequences are
  * contiguous from 1, and the within-stage order is decorrelated from
  * doc_id (the content-hash shuffle actually shuffles). */
class CurriculumSpec extends SparkSpec {

  private lazy val got = Curation.curriculumOrder(spark, sf).collect()

  test("partition of the corpus; stages 1..4; shards 0..7") {
    val n = graft.Tables.t(spark, sf, "documents").count()
    assert(got.length == n)
    assert(got.map(_.getLong(0)).distinct.length == got.length)
    assert(got.map(_.getLong(1)).forall(s => s >= 1L && s <= Curation.CurriculumStages))
    assert(got.map(_.getLong(2)).forall(sh => sh >= 0L && sh < Curation.CurriculumShards))
    val sizes = got.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    info(s"stage sizes: ${sizes.toSeq.sortBy(_._1).mkString(", ")}")
    // quartiles up to tie lumping: no stage may be empty or hold > half
    assert(sizes.keySet == (1L to Curation.CurriculumStages).toSet)
    sizes.values.foreach(c => assert(c * 2 <= got.length))
  }

  test("stages are logit intervals: min logit of stage k ≥ max of stage k+1") {
    val logits = Curation.qualityLogit(spark, sf)
      .select("doc_id", "logit_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byStage = got.groupBy(_.getLong(1)).view
      .mapValues(_.map(r => logits(r.getLong(0)))).toMap
    (1L until Curation.CurriculumStages).foreach { k =>
      assert(byStage(k).min >= byStage(k + 1).max,
        s"stage $k (easy) overlaps stage ${k + 1} (harder) on logit")
    }
  }

  test("per-(stage, shard) sequences are contiguous from 1; order is shuffled") {
    got.groupBy(r => (r.getLong(1), r.getLong(2))).foreach { case (k, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length).toSeq,
        s"gap in seq within $k")
    }
    // decorrelation: within at least one populated shard, the seq order
    // must NOT be doc_id order (a sorted-by-id "shuffle" is no curriculum)
    val shuffled = got.groupBy(r => (r.getLong(1), r.getLong(2))).exists {
      case (_, rs) =>
        val bySeq = rs.sortBy(_.getLong(3)).map(_.getLong(0)).toSeq
        rs.length > 2 && bySeq != bySeq.sorted
    }
    assert(shuffled, "every shard emitted docs in doc_id order — hash dead")
  }
}
