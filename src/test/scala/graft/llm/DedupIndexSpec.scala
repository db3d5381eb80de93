package graft.llm

import graft.SparkSpec
import graft.etl.Warehouse
import org.apache.spark.sql.functions._

/** Index-once/serve-many proof for the published incremental-dedup band
  * index (the batch-vs-corpus pattern): serving probes the warehouse-
  * published index and never rebuilds it — shown by swapping the published
  * version and watching the served answer follow it. */
class DedupIndexSpec extends SparkSpec {

  private val target = "/tmp/graft_dedup_spec/index"

  private def rmAll(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmAll)
    f.delete()
  }

  test("serve-without-reindex reads the published index version") {
    val dir = new java.io.File("/tmp/graft_dedup_spec")
    if (dir.exists()) rmAll(dir)

    val v1 = Dedup.publishDedupIndex(spark, sf, target)
    assert(Warehouse.currentVersion(spark, target).contains(v1))

    val served = Dedup.dedupDeltaServe(spark, sf, target).collect()
    val full = Dedup.incrementalDedup(spark, sf).collect()
    assert(served.sameElements(full),
      "serving the published index must equal the end-to-end query's output")
    assert(Warehouse.currentVersion(spark, target).contains(v1),
      "serving is read-only: the pointer must not move")

    // Publish an EMPTY index version and serve again without any rebuild
    // call: every batch doc must now come back not-a-dup, proving the serve
    // path reads the warehouse rather than recomputing the corpus bands.
    val empty = Warehouse.read(spark, target).limit(0)
    val v2 = Warehouse.publish(spark, target, empty)
    assert(v2 != v1)
    val served2 = Dedup.dedupDeltaServe(spark, sf, target)
    assert(served2.count() === served.length.toLong,
      "batch membership must not depend on the index")
    assert(served2.filter(col("is_dup")).count() === 0L,
      "an empty published index must yield zero dups — a rebuild would have masked it")
  }

  test("incrementalDedup publishes on first call and reuses the version after") {
    val t = Dedup.dedupIndexTarget(spark, sf)
    val d = new java.io.File(t)
    if (d.exists()) rmAll(d)
    assert(!Warehouse.exists(spark, t))
    Dedup.incrementalDedup(spark, sf).count()
    val v = Warehouse.currentVersion(spark, t)
    assert(v.isDefined, "first call must publish the band index")
    Dedup.incrementalDedup(spark, sf).count()
    assert(Warehouse.currentVersion(spark, t) == v,
      "second call must serve the existing version, not republish")
  }

  test("index is |distinct sets|-sized, not |corpus|-sized") {
    val dir = new java.io.File("/tmp/graft_dedup_spec2")
    if (dir.exists()) rmAll(dir)
    val t2 = "/tmp/graft_dedup_spec2/index"
    Dedup.publishDedupIndex(spark, sf, t2)
    val idx = Warehouse.read(spark, t2)
    val corpusDocs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % Dedup.DeltaMod =!= (Dedup.DeltaMod - 1)).count()
    val sets = idx.select("rep").distinct().count()
    // sf0.01 has ~10% exact duplicates: the collapse must be visible
    assert(idx.count() === sets * TextHash.Bands)
    assert(sets < corpusDocs,
      s"index keeps $sets distinct sets for $corpusDocs corpus docs — collapse missing")
  }
}
