package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout proof for `Warehouse.publishZOrdered`: interleaved-bit clustering
  * must make per-file min/max statistics narrow in EVERY clustered column,
  * so a predicate box on two columns (or on the SECOND column alone) prunes
  * files — where single-column range clustering is selective only in its one
  * column and round-robin prunes nothing. The file-level [min,max] boxes
  * below are exactly what a parquet footer-stats reader evaluates a pushed
  * predicate against. */
class ZOrderLayoutSpec extends SparkSpec {

  private val root = "/tmp/graft_zorder_spec"
  // 64 files = a 6-bit z-prefix = 3 bits per dimension: file cells are
  // ~1/8 x 1/8 of the key space, fine enough that a quarter-range box maps
  // to a small cell neighborhood instead of straddling the top-bit split.
  private val Files = 64

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

  /** Per-file [min,max] box over both key columns. */
  private def boxes(target: String): Seq[(Long, Long, Long, Long)] =
    partFiles(target).map { f =>
      val r = spark.read.parquet(f).agg(
        min("l_orderkey"), max("l_orderkey"),
        min("l_partkey"), max("l_partkey")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }

  /** Files a stats reader cannot skip for okLo<=l_orderkey<=okHi AND
    * pkLo<=l_partkey<=pkHi (pass the full domain for an unconstrained dim). */
  private def touched(bs: Seq[(Long, Long, Long, Long)],
                      okLo: Long, okHi: Long, pkLo: Long, pkHi: Long): Int =
    bs.count { case (oLo, oHi, pLo, pHi) =>
      oLo <= okHi && okLo <= oHi && pLo <= pkHi && pkLo <= pHi
    }

  test("z-order prunes on both dimensions; 1-D range clustering only on one") {
    val dir = new java.io.File(root)
    if (dir.exists()) rmAll(dir)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")

    val zo = s"$root/zorder"
    Warehouse.publishZOrdered(spark, zo, li, Seq("l_orderkey", "l_partkey"), Files)
    assert(Warehouse.clusteringOf(spark, zo).contains("zorder:l_orderkey,l_partkey"))
    assert(Warehouse.read(spark, zo).count() === li.count())

    val oneCol = s"$root/onecol"
    Warehouse.publishClustered(spark, oneCol, li, "l_orderkey", Files)
    val plain = s"$root/plain"
    Warehouse.publish(spark, plain, li.repartition(Files))

    val (zb, cb, pb) = (boxes(zo), boxes(oneCol), boxes(plain))
    assert(zb.size > 4 && cb.size > 4, s"need real file counts: ${zb.size}/${cb.size}")

    val r = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head()
    val (okMin, okMax, pkMin, pkMax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // [1/4, 1/2) of each range — aligned to the 1/8-cell grid, so the box
    // is a 2x2 cell neighborhood (the favorable-but-typical case; a box
    // astride the midpoint is z-order's known worst case and is not the
    // property under test)
    def quarter(lo: Long, hi: Long): (Long, Long) = {
      val span = hi - lo
      (lo + span / 4, lo + span / 2)
    }
    val (oLo, oHi) = quarter(okMin, okMax)
    val (pLo, pHi) = quarter(pkMin, pkMax)

    // round-robin: every file straddles the box in both dims — zero pruning
    assert(touched(pb, oLo, oHi, pLo, pHi) === pb.size)

    // 2-D box: z-order must beat round-robin and be at least as selective as
    // the 1-D layout (which prunes only via l_orderkey)
    val zBox = touched(zb, oLo, oHi, pLo, pHi)
    val cBox = touched(cb, oLo, oHi, pLo, pHi)
    assert(zBox < pb.size, s"z-order must prune the 2-D box: $zBox/${zb.size}")
    assert(zBox < cBox, s"z-order ($zBox) must beat 1-D clustering ($cBox) on a 2-D box")

    // l_partkey-only predicate: invisible to l_orderkey clustering, but
    // z-order files are narrow in l_partkey too
    val zPk = touched(zb, okMin, okMax, pLo, pHi)
    val cPk = touched(cb, okMin, okMax, pLo, pHi)
    assert(cPk === cb.size, "1-D layout cannot prune on the other column")
    assert(zPk < zb.size, s"z-order must prune on the second column alone: $zPk/${zb.size}")
  }

  test("z-ordered read with a 2-D predicate is pushed to the scan and correct") {
    val zo = s"$root/zorder"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val r = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head()
    val oMid = (r.getLong(0) + r.getLong(1)) / 2
    val pMid = (r.getLong(2) + r.getLong(3)) / 2
    val pred = col("l_orderkey") <= oMid && col("l_partkey") <= pMid
    val q = Warehouse.read(spark, zo).filter(pred)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_orderkey")
      && plan.contains("l_partkey"), s"both predicates must reach the scan:\n$plan")
    assert(q.count() === li.filter(pred).count())
  }
}
