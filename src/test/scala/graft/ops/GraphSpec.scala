package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph-operator semantics: the fixed-point PageRank tracks true (double)
  * PageRank, symmetric nodes rank identically, and the degree-oriented
  * triangle count equals the brute a<b<c enumeration. */
class GraphSpec extends SparkSpec {

  private lazy val pathDir: String = {
    val s = spark
    import s.implicits._
    val dir = s"/tmp/graft_graph_fixture_${System.nanoTime()}"
    // path graph p1 - p2 - p3 (two orders, one shared part)
    Seq((1L, 101L), (1L, 102L), (2L, 102L), (2L, 103L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("pagerank: path-graph symmetry is exact, center outranks leaves") {
    val r = Graph.pagerank(spark, pathDir)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set(101L, 102L, 103L))
    assert(r(101L) == r(103L), "symmetric leaves must rank identically")
    assert(r(102L) > r(101L), "center of the path must outrank the leaves")
  }

  test("fixed-point pagerank tracks double pagerank within 1e-6 relative") {
    val fixed = Graph.pagerank(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive double-arithmetic replay on the driver (test-only collect)
    val pp = graft.Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = pp.as("a").join(pp.as("b"),
        col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = e.groupBy(_._1).view.mapValues(_.length).toMap
    val nodes = deg.keySet
    var rank = nodes.map(_ -> 1.0 / nodes.size).toMap
    for (_ <- 1 to 5) {
      val contrib = e.groupBy(_._2).view.mapValues(
        _.map { case (s0, _) => rank(s0) / deg(s0) }.sum).toMap
      rank = nodes.map(n => n -> (0.15 / nodes.size + 0.85 * contrib(n))).toMap
    }
    fixed.foreach { case (node, scaled) =>
      val expected = rank(node) * 1e12
      assert(math.abs(scaled - expected) / expected < 1e-6,
        s"node $node: fixed $scaled vs double $expected")
    }
  }

  test("oriented triangle count equals brute a<b<c enumeration") {
    val fast = Graph.triangles(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pp = graft.Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val canon = pp.as("a").join(pp.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    val tri = canon.select(col("u").as("a"), col("v").as("b"))
      .join(canon.select(col("u").as("b"), col("v").as("c")), "b")
      .join(canon.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
    val brute = tri.select(explode(array(col("a"), col("b"), col("c"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("n")).limit(50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == brute)
  }

  test("degree distribution masses sum to nodes and twice the edges") {
    val dist = Graph.degreeDist(spark, sf).collect()
    val pp = graft.Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val canon = pp.as("a").join(pp.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p"), col("b.p")).distinct()
    val nEdges = canon.count()
    val nNodes = canon.select(col("a.p").as("n"))
      .unionByName(canon.select(col("b.p").as("n"))).distinct().count()
    assert(dist.map(_.getLong(1)).sum == nNodes)
    assert(dist.map(r => r.getLong(0) * r.getLong(1)).sum == 2 * nEdges)
  }
}
