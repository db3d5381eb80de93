package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout proof for `Warehouse.publishClustered`: range-partition + sort
  * must leave every part-file owning a DISJOINT cluster-key range — the
  * property that makes parquet min/max statistics selective, so a pushed
  * predicate decodes one file's row groups instead of all of them (on any
  * stats-aware engine, Spark's own scan included). */
class ClusteredLayoutSpec extends SparkSpec {

  private val root = "/tmp/graft_layout_spec"

  private def rmAll(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmAll)
    f.delete()
  }

  private def partFiles(target: String): Seq[String] = {
    val v = Warehouse.currentVersion(spark, target).get
    new java.io.File(s"$target/$v").listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSeq
  }

  test("clustered publish: per-file key ranges are disjoint; plain publish overlaps") {
    val dir = new java.io.File(root)
    if (dir.exists()) rmAll(dir)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")

    val clustered = s"$root/clustered"
    Warehouse.publishClustered(spark, clustered, li, "l_orderkey", 8)
    assert(Warehouse.clusteringOf(spark, clustered).contains("l_orderkey"))

    // data unchanged by the layout
    assert(Warehouse.read(spark, clustered).count() === li.count())

    // per-file [min,max] of the cluster key, read file-by-file (what a
    // footer-stats reader sees)
    def ranges(files: Seq[String]) = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_orderkey"), max("l_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    val cr = ranges(partFiles(clustered)).sortBy(_._1)
    assert(cr.size > 1)
    cr.sliding(2).foreach { case Seq((_, hi), (lo, _)) =>
      assert(hi < lo, s"clustered files must own disjoint key ranges: $cr")
    }

    // the same data published UNCLUSTERED: every file spans ~the full key
    // range, so a point predicate overlaps every file's stats
    val plain = s"$root/plain"
    Warehouse.publish(spark, plain, li.repartition(8))
    assert(Warehouse.clusteringOf(spark, plain).isEmpty)
    val pr = ranges(partFiles(plain))
    val (gmin, gmax) = (cr.map(_._1).min, cr.map(_._2).max)
    val mid = (gmin + gmax) / 2
    assert(pr.count { case (lo, hi) => lo <= mid && mid <= hi } === pr.size,
      s"round-robin files all straddle the median key: $pr")
    assert(cr.count { case (lo, hi) => lo <= mid && mid <= hi } === 1,
      "exactly one clustered file covers any point key")
  }

  test("point predicate on the clustered version is pushed to the scan and correct") {
    val clustered = s"$root/clustered"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val key = li.agg(max("l_orderkey")).head().getLong(0)
    val q = Warehouse.read(spark, clustered).filter(col("l_orderkey") === key)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_orderkey"),
      s"predicate must reach the parquet scan:\n$plan")
    assert(q.count() === li.filter(col("l_orderkey") === key).count())
  }
}
