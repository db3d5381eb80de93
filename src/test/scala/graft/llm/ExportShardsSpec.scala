package graft.llm

import graft.SparkSpec
import graft.etl.Warehouse
import org.apache.spark.sql.functions._

/** Dataloader export: the manifest must account for every doc and token
  * exactly, hash balance must keep shard fill bounded, and the published
  * shard tree must be one directory per shard whose contents reconcile
  * with the manifest (the trainer's contract). */
class ExportShardsSpec extends SparkSpec {

  private val target = "/tmp/graft_export_spec/shards"

  test("manifest conserves docs and tokens; fill is hash-balanced") {
    val docs = graft.Tables.t(spark, sf, "documents")
    val manifest = Curation.exportShards(spark, sf).collect()
    assert(manifest.nonEmpty)
    val nDocs = docs.count()
    val totToks = docs.select(sum(size(split(coalesce(col("text"), lit("")),
      " "))).cast("long")).collect()(0).getLong(0)
    assert(manifest.map(_.getLong(1)).sum == nDocs, "every doc lands in a shard")
    assert(manifest.map(_.getLong(2)).sum == totToks, "every token accounted")
    // md5 placement balance: no shard beyond 2x / below 0.3x the target
    val fills = manifest.map(_.getLong(3))
    info(s"fill_ppm spread: ${fills.min}..${fills.max}")
    assert(fills.max <= 2000000L && fills.min >= 300000L,
      s"hash balance broke: ${fills.toSeq}")
  }

  test("published shards: one directory per shard, contents match the manifest") {
    val dir = new java.io.File("/tmp/graft_export_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    if (dir.exists()) rm(dir)
    Curation.publishShards(spark, sf, target)
    val manifest = Curation.exportShards(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val v = Warehouse.currentVersion(spark, target).get
    val shardDirs = new java.io.File(s"$target/$v").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(shardDirs.length == manifest.size,
      "one hive directory per manifest shard")
    val published = Warehouse.read(spark, target)
      .groupBy(col("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("toks")).as("t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(published == manifest,
      "published shard contents must reconcile with the manifest")
  }

  test("fertility identity: per-lang BPE totals equal the bpeApply rollup") {
    val viaFert = TextAnalysis.fertility(spark, sf)
      .select("lang", "total_bpe_tokens").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaApply = TextAnalysis.bpeApply(spark, sf)
      .join(graft.Tables.t(spark, sf, "documents").select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(sum("n_bpe_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaFert == viaApply)
  }
}
