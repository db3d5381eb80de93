package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Contrastive pair mining: the label/ceiling contracts, and a full
  * driver-side recomputation of both queries on the sf0.001 corpus — the
  * same left-to-right double accumulation as the engine's dot product, so
  * ids, ranks, and cosines must match exactly (bit-equality is also the
  * DuckDB oracle's check; this pins it without DuckDB in the loop). */
class MiningSpec extends SparkSpec {

  private lazy val corpus: Array[(Long, Long, Array[Float])] =
    graft.Tables.t(spark, sf, "embeddings")
      .select("vec_id", "label", "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).toArray))
      .sortBy(_._1)

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }
  private def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
  private def cosOf(a: Array[Float], b: Array[Float]): Double =
    dot(a, b) / (nrm(a) * nrm(b))

  /** (cos desc, id asc) top-k of (id, cos) candidates. */
  private def topK(c: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    c.sortBy { case (id, cos) => (-cos, id) }.take(k)

  test("hard negatives: labels differ, ceiling holds, exact vs driver recompute") {
    val got = Mining.hardNegatives(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) != r.getLong(3), "q_label must differ from n_label")
      assert(r.getDouble(4) <= Mining.NearDupCeiling)
    }
    val anchors = corpus.filter(_._1 < 8)
    val expected = anchors.flatMap { case (qId, qLabel, qEmb) =>
      val cands = corpus.collect {
        case (id, label, emb) if label != qLabel =>
          (id, cosOf(qEmb, emb))
      }.filter(_._2 <= Mining.NearDupCeiling)
      topK(cands.toSeq, Mining.NegK).zipWithIndex.map {
        case ((nId, cos), i) => (qId, nId, cos, (i + 1).toLong)
      }
    }.toSet
    val gotSet = got.map(r =>
      (r.getLong(0), r.getLong(2), r.getDouble(4), r.getLong(5))).toSet
    assert(gotSet == expected)
  }

  test("triplets: semi-hard contract and exact vs driver recompute") {
    val got = Mining.triplets(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getDouble(4) < r.getDouble(2), "neg_cos must be below pos_cos")
      assert(r.getDouble(5) > 0.0, "margin positive by construction")
    }
    val byLabel = corpus.map(c => c._1 -> c._2).toMap
    got.foreach { r =>
      val qL = byLabel(r.getLong(0))
      assert(byLabel(r.getLong(1)) == qL, "positive must share the anchor label")
      assert(byLabel(r.getLong(3)) != qL, "negative must differ in label")
    }
    val anchors = corpus.filter(_._1 < 8)
    val expected = anchors.flatMap { case (qId, qLabel, qEmb) =>
      val scored = corpus.collect {
        case (id, label, emb) if id != qId => (id, label, cosOf(qEmb, emb))
      }
      topK(scored.collect { case (id, l, c) if l == qLabel => (id, c) }.toSeq, 1)
        .headOption.toSeq.flatMap { case (posId, posCos) =>
          val negs = scored.collect {
            case (id, l, c) if l != qLabel && c < posCos => (id, c)
          }
          topK(negs.toSeq, Mining.TripletNegK).zipWithIndex.map {
            case ((nId, nCos), i) =>
              (qId, posId, posCos, nId, nCos, posCos - nCos, (i + 1).toLong)
          }
        }
    }.toSet
    val gotSet = got.map { r: Row =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))
    }.toSet
    assert(gotSet == expected)
  }
}
