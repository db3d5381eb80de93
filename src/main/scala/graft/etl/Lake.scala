package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Object-store lifecycle operators, Hadoop-FS-native (reference:
  * S3List/S3Copy/S3Delete Airflow operators and the S3KeySensor,
  * /root/reference/coininsights.py:193-353 and :33-73). One FileSystem API
  * works for local, HDFS and s3a:// URIs, so the same code runs on a laptop
  * and a 1000-executor cluster's object store.
  */
object Lake {

  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** O17: list keys under a prefix (S3ListOperator analog). */
  def list(spark: SparkSession, dir: String): Seq[String] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.toString).sorted
  }

  /** O20: existence gate (S3KeySensor analog — a precondition, not a poll:
    * batch runs check once; streaming mode subsumes it with AvailableNow). */
  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** O18+O19: archive = atomic rename into archiveDir (copy+delete collapses
    * to one metadata op on a real filesystem; reference does copy-then-delete,
    * /root/reference/coininsights.py:219-312). Returns archived paths. */
  def archive(spark: SparkSession, srcDir: String, archiveDir: String): Seq[String] = {
    val f = fs(spark, srcDir)
    val dst = new Path(archiveDir)
    if (!f.exists(dst)) f.mkdirs(dst)
    list(spark, srcDir).map { s =>
      val sp = new Path(s)
      val tp = new Path(dst, sp.getName)
      f.rename(sp, tp)
      tp.toString
    }
  }

  /** O16: truncate = recursive delete of the stage path. */
  def truncate(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (f.exists(p)) f.delete(p, true)
  }
}
