package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink breadth beyond the reference's JSON/CSV/parquet: ORC (the
  * other columnar format a warehouse migration meets, with working predicate
  * pushdown) and JSON-lines (the streaming-friendly single-record form; the
  * reference's dumps are multiLine JSON arrays). Round-trips are checked
  * value-exact against the parquet fixtures. */
class IoSpec extends SparkSpec {

  private lazy val root = java.nio.file.Files.createTempDirectory("graft_io").toString

  test("ORC round-trip is value-exact and pushes predicates into the scan") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    orders.write.mode("overwrite").orc(s"$root/orders_orc")
    val back = spark.read.orc(s"$root/orders_orc")
    assert(back.count() == orders.count())
    val filtered = back.filter(col("o_totalprice") > 300000)
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(o_totalprice"), p)
    val want = orders.filter(col("o_totalprice") > 300000)
      .collect().map(_.toString).sorted.toSeq
    assert(filtered.collect().map(_.toString).sorted.toSeq == want)
  }

  test("JSON-lines round-trip preserves values (streaming-friendly record form)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.write.mode("overwrite").json(s"$root/docs_jsonl")
    val back = spark.read.schema(docs.schema).json(s"$root/docs_jsonl")
    assert(back.collect().map(_.toString).sorted.toSeq ==
      docs.collect().map(_.toString).sorted.toSeq)
  }
}
