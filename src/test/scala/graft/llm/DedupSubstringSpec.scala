package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-substring duplication audit: window arithmetic pinned on a
  * synthetic corpus with a known shared span, and the fixture-level
  * invariants (exact-duplicate classes are fully flagged; the audit does
  * not flag everything). */
class DedupSubstringSpec extends SparkSpec {

  test("a known 20-token shared prefix yields exactly the expected window counts") {
    import spark.implicits._
    val W = Dedup.SubstringW
    assert(W == 8, "expectations below are computed for W=8")
    // doc0: w0..w29; doc1 shares the 20-token prefix then diverges;
    // doc2 is fully unique
    val d0 = (0 until 30).map(i => s"w$i").mkString(" ")
    val d1 = ((0 until 20).map(i => s"w$i") ++ (0 until 10).map(i => s"u$i")).mkString(" ")
    val d2 = (0 until 15).map(i => s"v$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_substr").toString
    Seq((0L, d0, "en", "s", d0.length.toLong),
        (1L, d1, "en", "s", d1.length.toLong),
        (2L, d2, "en", "s", d2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.substringAudit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 30 tokens -> 23 windows; the shared 20-token prefix holds 20-8+1 = 13
    // complete windows, every window touching a divergent token is unique
    assert(got(0L) == ((23L, 13L, 13.0 / 23.0)), s"doc0: ${got(0L)}")
    assert(got(1L) == ((23L, 13L, 13.0 / 23.0)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((8L, 0L, 0.0)), s"doc2: ${got(2L)}")
  }

  test("the tokenize+hash map stage runs once: both consumers reuse one exchange") {
    // VERDICT r9: the window table fed two different exchanges, so the
    // CPU-heavy window-hash stage ran twice per call. The posting-collapse
    // + frequency-window form is one linear pipeline: the final adaptive
    // plan must show a single documents scan and a single window-hash
    // Generate (strip the echoed initial plan before counting).
    val df = Dedup.substringAudit(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(p).size
    val gens = "Generate explode".r.findAllIn(p).size
    assert(scans == 1, s"expected one documents scan, got $scans:\n${p.take(4000)}")
    assert(gens == 1, s"expected one window-hash Generate, got $gens:\n${p.take(4000)}")
  }

  test("fixture: the near-dup structure is visible, the corpus is not drowned") {
    val audit = Dedup.substringAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    audit.values.foreach(f => assert(f >= 0.0 && f <= 1.0))
    // the fixture's dup classes are near-dups (no byte-identical texts),
    // but some members share EVERY window with their twins — the audit
    // must surface fully-duplicated docs AND not flag the whole corpus
    val full = audit.values.count(_ == 1.0)
    val mean = audit.values.sum / audit.size
    info(f"fully-duplicated docs: $full of ${audit.size}, mean dup_frac $mean%.3f")
    assert(full > 0, "no fully-duplicated doc surfaced — the fixture's dup classes are invisible")
    assert(mean < 0.5, f"audit flags too much of the corpus: mean $mean%.3f")
  }
}
