package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph-probe ANN: shape invariants, the no-regression property of beam
  * search (candidates always include the previous frontier, so the best
  * score can only improve over the entry seeds), and the measured recall
  * contract vs exact brute force. Bit-exactness of every emitted number is
  * the DuckDB oracle's job (unrolled-rounds twin). */
class GraphSearchSpec extends SparkSpec {

  private lazy val got = Similarity.graphSearchTopK(spark, sf).collect()

  test("emits 10 ranked rows per query, no self, no duplicate neighbors") {
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 8L).toSet)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to 10L))
      assert(!rs.map(_.getLong(1)).contains(q), s"query $q returned itself")
      assert(rs.map(_.getLong(1)).distinct.length == rs.length)
    }
  }

  test("the beam never regresses below the best entry seed") {
    val e = graft.Tables.t(spark, sf, "embeddings")
    val dot = Similarity.dotFor(spark) _
    val withN = e.select(col("vec_id"), col("embedding"),
      expr(s"sqrt(${dot("embedding", "embedding")})").as("nrm"))
    val q = withN.filter(col("vec_id") < 8).select(
      col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val seedBest = withN.filter(col("vec_id").isInCollection(Similarity.EntryIds))
      .crossJoin(broadcast(q))
      .withColumn("cos", expr(dot("q_emb", "embedding")) / (col("q_nrm") * col("nrm")))
      .groupBy("q_id").agg(max("cos").as("best"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    got.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getDouble(2) >= seedBest(r.getLong(0)),
        s"query ${r.getLong(0)}: final best ${r.getDouble(2)} < seed ${seedBest(r.getLong(0))}")
    }
  }

  test("beam search recalls the exact top-10") {
    val exact = Similarity.bruteTopK(spark, sf).select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mine = got.map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.keys.toSeq
      .map(k => mine.getOrElse(k, Set.empty[Long]).intersect(exact(k)).size / 10.0)
      .sum / exact.size
    info(f"graph-search recall@10 = $recall%.2f")
    assert(recall >= 0.6, f"recall@10 $recall%.2f under floor")
  }
}
