package graft.llm

import graft.SparkSpec
import graft.etl.Warehouse

/** Publish-once proof for the served-ranking tier (VERDICT r11 item 1,
  * the IvfPersistSpec pattern applied to rankings): the first audit-side
  * caller per (fixture, variant) runs the member serve once and commits
  * its Q·10 ranking through the warehouse pointer; every later caller is
  * a stateless parquet read — bit-identical rows, no serve re-execution,
  * no session state. Base and upsert variants are distinct artifacts. */
class RankingsSpec extends SparkSpec {

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }

  test("first call publishes, later calls read the same version bit-identically") {
    val t = Rankings.targetOf(spark, sf, "ivf")
    val d = new java.io.File(t)
    if (d.exists()) rm(d)
    assert(!Warehouse.exists(spark, t))

    // publishing call: runs the real serve once, commits the ranking
    val first = Rankings.ivf(spark, sf).collect()
    val v1 = Warehouse.currentVersion(spark, t)
    assert(v1.isDefined, "first audit-side call must publish the ranking")

    // the published copy equals the live serve output — longs and doubles
    // round-trip parquet bit-exactly, so audit hashes cannot move
    val live = Similarity.ivfTrainedTopK(spark, sf).collect()
    assert(first.sameElements(live),
      "published ranking must equal the live serve output row-for-row")

    // second call: pointer untouched (publish-once), rows identical
    val second = Rankings.ivf(spark, sf).collect()
    assert(Warehouse.currentVersion(spark, t) == v1,
      "a later call must not republish")
    assert(second.sameElements(first))
  }

  test("the read path is a stateless published scan, not a serve re-execution") {
    Rankings.ivf(spark, sf).count() // ensure published
    val plan = Rankings.ivf(spark, sf).queryExecution.executedPlan.toString
    val t = Rankings.targetOf(spark, sf, "ivf")
    assert(plan.contains(new java.io.File(t).getName) || plan.contains(t),
      s"read path must scan the published target, plan was:\n$plan")
    // a bare published read: no joins (the serve's probe join is gone) and
    // nothing cached for a long bench session to evict
    assert(!plan.contains("Join"), "published-ranking read must not re-run the serve's joins")
    assert(!plan.contains("InMemoryTableScan"), "published-ranking read must hold no session cache")
  }

  test("base and upsert rankings are distinct published artifacts") {
    val base = Rankings.targetOf(spark, sf, "ivf")
    val ups = Rankings.targetOf(spark, sf, "ivf_upsert")
    assert(base != ups, "variant key must separate base and upsert artifacts")
    // the freshness serve carries the late batch: its rows differ from base
    val b = Rankings.ivf(spark, sf).select("q_id", "n_id").collect().toSet
    val u = Rankings.ivfUpsert(spark, sf).select("q_id", "n_id").collect().toSet
    assert(b != u, "upsert ranking must reflect the late batch, not the base serve")
  }

  test("a serve-version change moves the target and forces a republish (VERDICT r12 item 3)") {
    // the default key embeds the version OWNED NEXT TO THE SERVE — the
    // mechanical-invalidation contract: constants ride in the string, so
    // changing NProbe (or bumping the serve's literal for a logic change)
    // re-keys the artifact without any Rankings-side edit
    val cur = Rankings.targetOf(spark, sf, "ivf")
    assert(cur == Rankings.targetOf(spark, sf, "ivf", Rankings.versionOf("ivf")),
      "default key must embed the serve-owned version")
    assert(Rankings.versionOf("ivf").contains(Similarity.NProbe.toString) &&
      Rankings.versionOf("ivf").contains(Similarity.Cells.toString),
      "tuning constants must ride in the serve-version salt")
    assert(Rankings.versionOf("ivf_upsert")
      .contains(IvfMaintenance.BaseFrac.toString),
      "the freshness variant's salt must embed the maintenance cut")
    val bumped = Rankings.targetOf(spark, sf, "ivf",
      Rankings.versionOf("ivf") + "|logic-bump")
    assert(bumped != cur, "a serve-version change must move the published target")
    // publish under the current version; nothing exists under the bumped
    // key, so the first caller after a version change re-serves instead of
    // reading the stale artifact
    Rankings.ivf(spark, sf).count()
    assert(Warehouse.exists(spark, cur))
    assert(!Warehouse.exists(spark, bumped),
      "a stale artifact must be unreachable from a bumped serve version")
  }
}
