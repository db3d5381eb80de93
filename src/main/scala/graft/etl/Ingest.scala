package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets

/** O1/O2: the extract stage (reference: /root/reference/data-extract.py:10-33
  * — HTTPS GET of /coins/markets, then a verbatim JSON dump keyed by run
  * timestamp). At ~100 rows per pull, executor-side HTTP is the wrong tool:
  * the fetch stays on the driver (like the reference's single Lambda) and is
  * injected as a thunk so offline environments and tests substitute a local
  * fixture read; only the lake write goes through Hadoop FS (→ s3a:// in
  * production).
  *
  * Run ids must be sortable ISO-basic (SURVEY.md §7.4: the reference embeds
  * `str(datetime.now())` with spaces/colons and has to sanitize it later).
  */
object Ingest {

  /** Dump one raw snapshot verbatim (byte-preserving, like put_object) to
    * rawDir/cryptoinsight_raw_{runId}. Returns the written path. */
  def snapshot(spark: SparkSession, fetch: () => String, rawDir: String,
               runId: String): String = {
    require(runId.matches("[0-9TZ_-]+"), s"runId must be sortable ISO-basic: $runId")
    val body = fetch()
    val dir = new Path(rawDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val out = new Path(dir, s"cryptoinsight_raw_$runId")
    val os = fs.create(out, true)
    try os.write(body.getBytes(StandardCharsets.UTF_8)) finally os.close()
    out.toString
  }

  /** O3: retry wrapper for flaky sources. Unlike the reference's catch-all
    * that swallows failures and lets a downstream sensor time out an hour
    * later (/root/reference/data-extract.py:35-46), this retries with backoff
    * and then fails loudly. */
  @annotation.tailrec
  def withRetry[T](attempts: Int, backoffMs: Long = 500)(thunk: () => T): T = {
    require(attempts >= 1)
    scala.util.Try(thunk()) match {
      case scala.util.Success(v) => v
      case scala.util.Failure(e) if attempts == 1 => throw e
      case scala.util.Failure(_) =>
        Thread.sleep(backoffMs)
        withRetry(attempts - 1, backoffMs * 2)(thunk)
    }
  }

  /** Fixture-backed fetch for offline use (production injects an HTTP call). */
  def fixtureFetch(path: String): () => String =
    () => new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      StandardCharsets.UTF_8)
}
