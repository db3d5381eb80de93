package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-constrained epoch schedule: the MaxEpochs cap branch on a synthetic
  * extreme skew (the fixture only reaches ~3 epochs), the planned ≤ alloc /
  * planned ≤ cap·available invariants, and both live branches on the
  * fixture's language skew. */
class MixEpochsSpec extends SparkSpec {

  test("synthetic skew: tiny group hits the MaxEpochs cap, big group downsamples") {
    import spark.implicits._
    val docs = (
      (1 to 100).map(i => ("big", Seq.fill(100)(s"tok$i").mkString(" "))) ++
        (1 to 2).map(i => ("tiny", Seq.fill(10)(s"t$i").mkString(" ")))
      ).toDF("grp", "text")
    val rows = Curation.epochSchedule(docs, "grp")
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // totals: big 10000, tiny 20 -> budget 2x total = 20040, alloc 10020
    val (bAvail, bAlloc, bPpm, bPlanned) = rows("big")
    val (tAvail, _, tPpm, tPlanned) = rows("tiny")
    assert(bAvail == 10000L && tAvail == 20L)
    assert(tPpm == Curation.MaxEpochs * 1000000L,
      "tiny group must saturate the epoch cap")
    assert(tPlanned == tAvail * Curation.MaxEpochs,
      "capped group trains exactly MaxEpochs passes")
    assert(bPpm == (BigInt(bAlloc) * 1000000 / bAvail).toLong && bPpm > 1000000L,
      "big group repeats below the cap (budget is 2x total)")
    assert(bPlanned <= bAlloc, "planned never exceeds the budget share")
  }

  test("materialization: integer schedules replicate exactly, fractional ones land near plan") {
    import spark.implicits._
    val docs = (1 to 50).map(i => (i.toLong, "g", Seq.fill(10)("w").mkString(" ")))
      .toDF("doc_id", "grp", "text")
    // exactly 2.0 epochs: every doc must emit exactly rows 0 and 1 — no
    // lottery involvement at all
    val exact = Curation.scheduledCorpus(docs,
      Seq(("g", 2000000L)).toDF("grp", "epochs_ppm"), "grp").collect()
    assert(exact.length == 100)
    assert(exact.groupBy(_.getLong(0)).forall { case (_, g) =>
      g.map(_.getLong(3)).sorted.toSeq == Seq(0L, 1L) })
    // 0.5 epochs: kept docs have exactly epoch 0; the md5 lottery keeps
    // roughly half (deterministic — pin the exact realized count)
    val half = Curation.scheduledCorpus(docs,
      Seq(("g", 500000L)).toDF("grp", "epochs_ppm"), "grp").collect()
    assert(half.forall(_.getLong(3) == 0L))
    assert(half.length > 10 && half.length < 40, s"lottery kept ${half.length}/50")
    val again = Curation.scheduledCorpus(docs,
      Seq(("g", 500000L)).toDF("grp", "epochs_ppm"), "grp").collect()
    assert(again.map(_.getLong(0)).sorted.sameElements(
      half.map(_.getLong(0)).sorted), "lottery must be deterministic")
  }

  test("q_mix_apply audit: realized tokens within lottery noise of planned") {
    val rows = Curation.mixApply(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(5) <= 100000L,
        s"${r.getString(0)} realized drifted >10% off plan: $r")
    }
  }

  test("fixture languages: dominant lang gets the lowest rate; invariants hold") {
    val rows = Curation.mixEpochs(spark, sf).collect()
    assert(rows.length > 1)
    val ppms = rows.map(_.getLong(4))
    // whether the dominant language lands above or below 1.0 epochs depends
    // on the SF tier's skew (sf0.01: 0.92, sf0.001: 1.08) — the stable
    // contract is the ORDERING (uniform target => rate anti-monotone in
    // supply) plus repetition for the minorities; the branch split itself
    // is pinned by the synthetic test above
    val byAvail = rows.sortBy(_.getLong(2))
    assert(byAvail.last.getLong(4) == ppms.min,
      "largest language must get the lowest epochs_ppm")
    assert(ppms.exists(_ > 1000000L), "minority languages repeat")
    rows.foreach { r =>
      val (avail, alloc, ppm, planned) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(ppm <= Curation.MaxEpochs * 1000000L)
      assert(planned <= alloc)
      assert(planned <= avail * Curation.MaxEpochs)
    }
  }
}
