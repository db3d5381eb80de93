package graft.llm

import graft.SparkSpec

/** The recall-vs-nprobe operating curve: one row per probe count, recall
  * monotone non-decreasing in the probe budget (more cells can only add
  * candidates), and the curve's NProbe point must agree exactly with the
  * standing q_sim_recall audit — the sweep is the same serve and the same
  * ground truth, so any disagreement is a sweep bug, not noise. */
class IvfSweepSpec extends SparkSpec {

  private lazy val rows = Similarity.ivfSweep(spark, sf).collect()

  test("one row per probe count, in order") {
    assert(rows.map(_.getLong(0)).toSeq ==
      Similarity.SweepProbes.map(_.toLong).sorted)
  }

  test("recall is monotone non-decreasing in nprobe") {
    val recalls = rows.map(_.getDouble(3)).toSeq
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall curve must not decrease: $recalls")
  }

  test("the NProbe curve point matches the q_sim_recall audit exactly") {
    assert(Similarity.SweepProbes.contains(Similarity.NProbe))
    val sweepAt = rows.find(_.getLong(0) == Similarity.NProbe.toLong).get
    val audit = Similarity.recallIvf(spark, sf).collect()
    val (nExact, nHit) =
      (audit.map(_.getLong(1)).sum, audit.map(_.getLong(2)).sum)
    assert(sweepAt.getLong(1) == nExact && sweepAt.getLong(2) == nHit)
  }
}
