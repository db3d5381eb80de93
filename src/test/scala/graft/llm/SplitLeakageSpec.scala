package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Split-contamination audit: the content-keyed split protects exact
  * duplicates by construction, so the only possible leak channel is
  * near-dup classes — the fixture's classes demonstrably leak, every row
  * is internally consistent, and the remediation (split-by-component) is
  * well-defined because each component's id is itself a member doc. */
class SplitLeakageSpec extends SparkSpec {

  test("near-dup classes leak across splits; rows are consistent") {
    val rows = Curation.splitLeakage(spark, sf).collect()
    assert(rows.nonEmpty, "fixture lost its multi-member near-dup classes")
    rows.foreach { r =>
      assert(r.getLong(1) > 1, "single-member component emitted")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 3)
      assert((r.getLong(3) == 1L) == (r.getLong(2) > 1),
        s"leaks flag inconsistent with n_splits: $r")
    }
    val leaking = rows.count(_.getLong(3) == 1L)
    info(s"${rows.length} multi-member components, $leaking leaking")
    assert(leaking > 0,
      "no near-dup class straddles a split — the audit would be untestable")
  }

  test("byte-identical duplicates can never leak (content-keyed split)") {
    import spark.implicits._
    val text = "the same exact bytes in every copy of this document"
    val dir = java.nio.file.Files.createTempDirectory("graft_leak").toString
    (0L until 10L).map(i => (i, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val splits = Curation.splitAssign(spark, dir)
      .select("split").distinct().collect()
    assert(splits.length == 1,
      s"identical texts landed in ${splits.length} splits")
  }

  test("remediation is well-defined: every component id is a member doc") {
    val comp = Dedup.components(spark, sf)
      .select("doc_id", "component_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val members = comp.map(_._1).toSet
    comp.map(_._2).distinct.foreach { c =>
      assert(members.contains(c),
        s"component $c has no member doc with that id — split-by-rep undefined")
    }
  }
}
