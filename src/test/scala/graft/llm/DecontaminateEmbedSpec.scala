package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic decontamination audit (q_decontaminate_embed): bit-exact values
  * are the DuckDB twin's job; this spec pins the contract — exactly K exact
  * nearest training vectors per benchmark item, correct against a
  * driver-side recomputation, and the audit never reports a benchmark
  * vector as its own neighbor. */
class DecontaminateEmbedSpec extends SparkSpec {

  private lazy val got = Curation.decontaminateEmbed(spark, sf).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

  test("K rows per benchmark vector, training side only, ranks 1..K") {
    val byB = got.groupBy(_._1)
    assert(byB.nonEmpty)
    byB.foreach { case (b, rs) =>
      assert(b % Curation.BenchMod == 0)
      assert(rs.map(_._4).sorted.toSeq == (1L to Curation.EmbedAuditK))
      rs.foreach { case (_, t, _, _) =>
        assert(t % Curation.BenchMod != 0, s"bench $b lists benchmark vector $t as a neighbor")
      }
    }
  }

  test("matches a driver-side exact nearest-neighbor recomputation") {
    val vecs = graft.Tables.t(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def nrm(a: Array[Float]) = math.sqrt(dot(a, a))
    val bench = vecs.filter(_._1 % Curation.BenchMod == 0)
    val train = vecs.filter(_._1 % Curation.BenchMod != 0)
    val want = bench.toSeq.flatMap { case (b, bv) =>
      train.toSeq.map { case (t, tv) => (b, t, dot(bv, tv) / (nrm(bv) * nrm(tv))) }
        .sortBy { case (_, t, c) => (-c, t) }
        .take(Curation.EmbedAuditK).zipWithIndex
        .map { case ((bb, t, c), i) => (bb, t, c, (i + 1).toLong) }
    }.sortBy(r => (r._1, r._4))
    // driver recompute accumulates in the same left-to-right order as the
    // engine's fixed-order dot, so equality is on exact doubles
    assert(got.toSeq == want)
  }
}
