package graft.llm

import graft.SparkSpec

/** Banding recall audit: structural invariants (counts, bounds, bucket
  * labels) — bit-exactness of every value is the DuckDB oracle's job, and
  * the numbers themselves are the deliverable (the measured S-curve of the
  * b=1, r=16 design point). */
class DedupRecallSpec extends SparkSpec {

  private lazy val rows = Dedup.bandingRecall(spark, sf).collect()

  test("buckets are valid labels with 0 <= caught <= true and exact recall") {
    val labels = Set("[0.80,0.85)", "[0.85,0.90)", "[0.90,0.95)", "[0.95,1.00]")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(labels.contains(r.getString(0)))
      val (nTrue, nCaught) = (r.getLong(1), r.getLong(2))
      assert(nTrue > 0 && nCaught >= 0 && nCaught <= nTrue)
      assert(r.getDouble(3) == nCaught.toDouble / nTrue.toDouble)
    }
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }

  test("the strict 1x16 banding admits few sub-threshold pairs") {
    // the design claim the audit quantifies: at (b=1, r=16) the candidate
    // rate at similarity j is ~j^16, so pairs below the 0.95 verify
    // threshold should mostly NOT be candidates (that suppression is what
    // keeps the band join sub-quadratic on this corpus)
    val below = rows.filter(_.getString(0) != "[0.95,1.00]")
    assert(below.nonEmpty)
    val recallBelow =
      below.map(_.getLong(2)).sum.toDouble / below.map(_.getLong(1)).sum
    assert(recallBelow < 0.5, f"sub-threshold candidate rate $recallBelow%.2f")
  }
}
