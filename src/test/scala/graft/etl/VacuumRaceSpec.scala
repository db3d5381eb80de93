package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Publish/vacuum race guard (ADVICE r9): a publish writes its intent
  * marker (`_CURRENT.<nonce>.tmp` / `_SNAPSHOT.<nonce>.tmp`) BEFORE
  * materializing any version dir, and the commit rename consumes it — so
  * vacuum can identify in-flight publishes by marker, not by wall clock.
  * A publish whose member write outlasts any grace window (a large
  * compaction rewrite, clock skew on a shared FS) keeps its
  * not-yet-committed dirs safe from a concurrent vacuum; only a marker
  * that has sat uncommitted past `abandonedMs` is treated as a dead
  * publish and reclaimed. These tests pin the mechanism by simulating the
  * mid-flight window directly. */
class VacuumRaceSpec extends SparkSpec {

  private def mkDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_vac_race").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def df(tag: String) = {
    val s = spark
    import s.implicits._
    (1 to 20).map(i => (i.toLong, tag)).toDF("id", "writer")
  }

  test("snapshot vacuum skips a mid-flight publish's versions via its marker") {
    val root = mkDir()
    Warehouse.publishSnapshot(spark, root, Seq("base" -> df("committed")))
    // simulate a publish caught mid-materialize: marker written, member
    // version dir materialized with an ANCIENT embedded timestamp (so the
    // graceMs age guard alone would delete it), pointer rename not yet run
    val nonce = "feedc0de"
    val marker = new java.io.File(root, s"_SNAPSHOT.$nonce.tmp")
    java.nio.file.Files.write(marker.toPath, nonce.getBytes)
    val inFlightV = f"v_${1L}%013d_$nonce"
    df("inflight").write.parquet(s"$root/base/$inFlightV")

    Warehouse.vacuumSnapshot(spark, root, graceMs = 0)
    assert(new java.io.File(s"$root/base/$inFlightV").exists(),
      "vacuum deleted a version dir protected by a live publish marker")

    // the commit rename consumes the marker; once gone (here: simulate the
    // publish completing or being reclaimed) the superseded dir is fair game
    marker.delete()
    Warehouse.vacuumSnapshot(spark, root, graceMs = 0)
    assert(!new java.io.File(s"$root/base/$inFlightV").exists(),
      "vacuum must reclaim unreferenced versions once no marker protects them")
  }

  test("abandoned snapshot markers are reclaimed after abandonedMs") {
    val root = mkDir()
    Warehouse.publishSnapshot(spark, root, Seq("base" -> df("committed")))
    val nonce = "deadbeef"
    val marker = new java.io.File(root, s"_SNAPSHOT.$nonce.tmp")
    java.nio.file.Files.write(marker.toPath, nonce.getBytes)
    val deadV = f"v_${1L}%013d_$nonce"
    df("dead").write.parquet(s"$root/base/$deadV")
    marker.setLastModified(System.currentTimeMillis() - 60000)

    // young marker window: protected
    Warehouse.vacuumSnapshot(spark, root, graceMs = 0)
    assert(new java.io.File(s"$root/base/$deadV").exists())
    // past the abandonment window: marker swept, then the orphan dir
    Warehouse.vacuumSnapshot(spark, root, graceMs = 0, abandonedMs = 1000)
    assert(!marker.exists(), "dead publish marker must be reclaimed")
    Warehouse.vacuumSnapshot(spark, root, graceMs = 0)
    assert(!new java.io.File(s"$root/base/$deadV").exists(),
      "dead publish's versions must be reclaimed once its marker is swept")
  }

  test("single-target vacuum honors the _CURRENT intent marker") {
    val target = mkDir()
    Warehouse.publish(spark, target, df("committed"))
    val nonce = "cafebabe"
    val marker = new java.io.File(target, s"_CURRENT.$nonce.tmp")
    val inFlightV = f"v_${1L}%013d_$nonce"
    java.nio.file.Files.write(marker.toPath, inFlightV.getBytes)
    df("inflight").write.parquet(s"$target/$inFlightV")

    Warehouse.vacuum(spark, target)
    assert(new java.io.File(s"$target/$inFlightV").exists(),
      "vacuum deleted an in-flight publish's version dir")
    assert(Warehouse.read(spark, target).select(countDistinct("writer"))
      .head().getLong(0) == 1L)

    marker.delete()
    Warehouse.vacuum(spark, target)
    assert(!new java.io.File(s"$target/$inFlightV").exists())
  }

  test("a committed publish leaves no marker behind") {
    val root = mkDir()
    Warehouse.publishSnapshot(spark, root, Seq("a" -> df("x"), "b" -> df("y")))
    val target = mkDir()
    Warehouse.publish(spark, target, df("z"))
    def tmps(dir: String) = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".tmp")).map(_.getName)
    assert(tmps(root).isEmpty, s"snapshot commit left markers: ${tmps(root).toSeq}")
    assert(tmps(target).isEmpty, s"publish commit left markers: ${tmps(target).toSeq}")
  }
}
