package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Processed-files ledger for incremental ingest (VERDICT r1 item 5).
  *
  * The reference re-transforms its whole raw prefix every run
  * (/root/reference/data-transformation.py:32) — its biggest scale flaw: at
  * 100 TB the nightly run re-reads the lake. This ledger records each raw
  * file once it has been staged, as ONE EMPTY MARKER FILE PER RAW FILE under
  * `manifestDir`. Marker-file form is deliberate:
  *
  *  - append = one atomic create (no read-modify-write of a ledger file, so
  *    concurrent runs never lose entries);
  *  - read = one listStatus (object-store friendly; millions of markers is
  *    still a single prefix listing, and markers can be compacted offline);
  *  - idempotent: re-creating a marker is a no-op.
  *
  * Exactly-once EFFECT comes from the pair (marker after staging, dedup-first
  * merge): a crash between stage-append and marker write re-stages the file —
  * and the latest-per-key merge collapses the duplicate rows; a crash after
  * merge but before stage-truncate re-merges the same rows — a no-op upsert.
  */
object Manifest {

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Names of raw files already processed. */
  def processed(spark: SparkSession, manifestDir: String): Set[String] = {
    val f = fs(spark, manifestDir)
    val p = new Path(manifestDir)
    if (!f.exists(p)) Set.empty
    else f.listStatus(p).map(_.getPath.getName).filter(_.endsWith(".done"))
      .map(_.stripSuffix(".done")).toSet
  }

  /** Record raw files (by name) as processed — one atomic marker each. */
  def record(spark: SparkSession, manifestDir: String, names: Seq[String]): Unit = {
    val f = fs(spark, manifestDir)
    val dir = new Path(manifestDir)
    if (!f.exists(dir)) f.mkdirs(dir)
    names.foreach { n => f.create(new Path(dir, s"$n.done"), true).close() }
  }
}
