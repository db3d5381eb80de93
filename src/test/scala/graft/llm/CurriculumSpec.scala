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

  test("curriculum ↔ pack integration: train-only rows, valid bins, inherited positions") {
    val rows = Curation.curriculumPack(spark, sf).collect()
    assert(rows.nonEmpty)
    // (doc_id, chunk_idx, source, n_tokens, bin_id, bin_offset, stage,
    //  shard, seq, pack_shard)
    val train = Curation.splitAssign(spark, sf).collect()
      .filter(_.getString(2) == "train").map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet.subsetOf(train),
      "a val/test doc's chunk carries a training position")
    rows.foreach { r =>
      assert(r.getLong(5) >= 0L && r.getLong(5) < Curation.PackBudget,
        s"bin_offset out of budget: $r")
      assert(r.getLong(3) >= 1L, s"empty chunk packed: $r")
    }
    // every chunk inherits EXACTLY its parent doc's curriculum position
    val pos = Curation.curriculumOrder(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows.foreach { r =>
      assert(pos(r.getLong(0)) == ((r.getLong(6), r.getLong(7), r.getLong(8))),
        s"chunk's (stage, shard, seq) diverges from its parent doc: $r")
    }
    // bin coordinates are FIXED at pack time over the full (deduped) chunk
    // stream, BEFORE the train filter — so per (source, pack_shard,
    // bin_id) the train chunks' offsets need not tile the bin, but they
    // must never overlap: [offset, offset + n_tokens) disjoint within a bin
    rows.groupBy(r => (r.getString(2), r.getLong(9), r.getLong(4))).foreach { case (k, rs) =>
      val iv = rs.map(r => (r.getLong(5), r.getLong(5) + r.getLong(3)))
        .sortBy(_._1).toSeq
      iv.zip(iv.drop(1)).foreach { case ((_, e1), (s2, _)) =>
        assert(e1 <= s2, s"overlapping chunks in bin $k")
      }
    }
  }
}
