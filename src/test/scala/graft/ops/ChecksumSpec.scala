package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** DataQuality.tableChecksum — reconciliation fingerprints. The properties
  * that make the digest usable for cross-system comparison: invariance to
  * row order/partitioning, and sensitivity to any single-row change (value
  * edit, dropped row, duplicated row — the last is why the SUM digest
  * exists: a row inserted twice XORs to a no-op but can't sum to one). */
class ChecksumSpec extends SparkSpec {
  import graft.llm.TextHash.tokHash

  private def sigOf(df: org.apache.spark.sql.DataFrame) =
    df.select(tokHash(concat_ws("|", col("k"), col("v"))).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"),
        sum(col("h").cast("decimal(38,0)")).as("s"))
      .collect().head

  test("fingerprint is partition- and order-invariant, and flags edits, drops, dupes") {
    import spark.implicits._
    val base = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val ref = sigOf(base.repartition(1))
    assert(sigOf(base.repartition(17).orderBy(col("v").desc)) == ref)

    val edited = base.withColumn("v", when(col("k") === 250L, lit("vX")).otherwise(col("v")))
    assert(sigOf(edited) != ref)

    val dropped = base.filter(col("k") =!= 250L)
    assert(sigOf(dropped) != ref)

    // duplicate an existing row twice: XOR of the pair cancels, SUM does not
    val dup = base.unionAll(base.filter(col("k") === 250L))
      .unionAll(base.filter(col("k") === 250L))
    val d = sigOf(dup)
    assert(d.getLong(1) == ref.getLong(1), "XOR alone is blind to an even duplicate")
    assert(d.getDecimal(2) != ref.getDecimal(2) && d.getLong(0) != ref.getLong(0))
  }

  test("q_table_checksum emits one fingerprint row per table") {
    val out = DataQuality.tableChecksum(spark, sf).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("customer", "lineitem", "orders"))
    assert(out.forall(r => r.getLong(1) > 0))
  }
}
