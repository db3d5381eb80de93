package graft.etl

import graft.SparkSpec
import java.nio.file.{Files, Paths, StandardCopyOption}

/** End-to-end golden test of the reference pipeline replay (SURVEY.md §5.4):
  * raw fixture → transform → stage → merge → archive, including the
  * duplicate-symbol merge-key hazard and SCD1 update semantics. */
class PipelineSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft_pipe").toString

  private def dropRaw(root: String, name: String): Unit = {
    val res = getClass.getResourceAsStream("/raw_coins.json")
    val dir = Paths.get(root, "raw_data")
    Files.createDirectories(dir)
    Files.copy(res, dir.resolve(name), StandardCopyOption.REPLACE_EXISTING)
  }

  test("full run produces merged dim/fact with duplicate symbols collapsed") {
    val root = freshRoot()
    dropRaw(root, "cryptoinsight_raw_20241115T100000")
    val p = new Pipeline(spark, root)
    p.run()

    val dim = p.dim().collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // 5 raw rows, but two share symbol 'w' → 4 dim rows (latest per id wins;
    // dim tie-breaks on name desc: "Wormhole, Inc. Token" > "Other W Coin")
    assert(dim.size == 4)
    assert(dim("w") == "Wormhole, Inc. Token")
    assert(dim("btc") == "Bitcoin")

    val fact = p.fact().collect()
    assert(fact.length == 4)
    val w = fact.find(_.getString(0) == "w").get
    // fact dedup keys on latest last_updated: 10:00:01 > 09:59:58
    assert(math.abs(w.getDouble(1) - 0.31) < 1e-9)

    // stages truncated, raw archived
    assert(!Lake.exists(spark, p.infoStage))
    assert(!Lake.exists(spark, p.metricsStage))
    assert(Lake.list(spark, p.archiveDir).nonEmpty)
    assert(Lake.list(spark, p.rawDir).isEmpty)
  }

  test("re-run with a newer snapshot upserts (SCD1) instead of duplicating") {
    val root = freshRoot()
    dropRaw(root, "cryptoinsight_raw_1")
    val p = new Pipeline(spark, root)
    p.run()
    val before = p.fact().count()

    // second snapshot: same ids, newer timestamps, changed price
    val updated = new String(
      Files.readAllBytes(Paths.get(getClass.getResource("/raw_coins.json").toURI)))
      .replace("2024-11-15T10:00", "2024-11-15T11:00")
      .replace("64000.12", "65000.99")
    val dir = Paths.get(root, "raw_data")
    Files.createDirectories(dir)
    Files.write(dir.resolve("cryptoinsight_raw_2"), updated.getBytes)
    p.run()

    val fact = p.fact().collect()
    assert(fact.length == before) // upsert, not append
    val btc = fact.find(_.getString(0) == "btc").get
    assert(math.abs(btc.getDouble(1) - 65000.99) < 1e-9)
  }

  test("incremental manifest: re-run reads ONLY the new raw file; merge equals full reprocess") {
    val rootA = freshRoot()
    dropRaw(rootA, "cryptoinsight_raw_1")
    val pA = new Pipeline(spark, rootA)
    pA.run()
    // simulate a retained raw prefix (the reference's shape): bring the
    // archived file back into raw_data — the ledger, not archival, must skip it
    Files.move(Paths.get(rootA, "archive", "cryptoinsight_raw_1"),
      Paths.get(rootA, "raw_data", "cryptoinsight_raw_1"))
    val updated = new String(
      Files.readAllBytes(Paths.get(getClass.getResource("/raw_coins.json").toURI)))
      .replace("2024-11-15T10:00", "2024-11-15T11:00")
      .replace("64000.12", "65000.99")
    Files.write(Paths.get(rootA, "raw_data", "cryptoinsight_raw_2"), updated.getBytes)

    // input-file metrics: the transform's scan must touch only the new file
    val fresh = pA.newRawFiles()
    assert(fresh.map(p => new org.apache.hadoop.fs.Path(p).getName)
      == Seq("cryptoinsight_raw_2"), fresh)
    val scanned = Transform.readRawFiles(spark, fresh).inputFiles
    assert(scanned.nonEmpty && scanned.forall(_.endsWith("cryptoinsight_raw_2")), scanned.toSeq)
    pA.run()

    // full-reprocess twin: both snapshots in one run
    val rootB = freshRoot()
    dropRaw(rootB, "cryptoinsight_raw_1")
    Files.write(Paths.get(rootB, "raw_data", "cryptoinsight_raw_2"), updated.getBytes)
    val pB = new Pipeline(spark, rootB)
    pB.run()

    def dimMap(p: Pipeline) = p.dim().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    def factMap(p: Pipeline) = p.fact().collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getTimestamp(13))).toMap
    assert(dimMap(pA) == dimMap(pB))
    assert(factMap(pA) == factMap(pB))
    assert(factMap(pA)("btc")._1 == 65000.99)
  }

  test("interleaved writers: pointer commits keep the target consistent, last wins") {
    val root = freshRoot()
    val target = s"$root/warehouse/t"
    import spark.implicits._
    // Writer A and writer B both observe the same (empty) current version
    // and compute their outputs — the classic unserialized-merge interleave.
    assert(!Warehouse.exists(spark, target))
    val outA = Seq((1, "a1"), (3, "a3")).toDF("id", "v")
    val outB = Seq((1, "b1"), (2, "b2")).toDF("id", "v")
    // B publishes first; A publishes second without re-reading
    Warehouse.publish(spark, target, outB)
    // between the two commits the target is fully readable (B's snapshot)
    assert(Warehouse.read(spark, target).count() == 2)
    Warehouse.publish(spark, target, outA)
    // last pointer swap wins; the target is complete and consistent
    val rows = Warehouse.read(spark, target).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows == Map(1 -> "a1", 3 -> "a3"))
    // the superseded version stays readable until vacuum, then GC'd
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versionsBefore = fs.listStatus(new org.apache.hadoop.fs.Path(target))
      .count(s => s.isDirectory && s.getPath.getName.startsWith("v_"))
    assert(versionsBefore == 2)
    Warehouse.vacuum(spark, target)
    val versionsAfter = fs.listStatus(new org.apache.hadoop.fs.Path(target))
      .count(s => s.isDirectory && s.getPath.getName.startsWith("v_"))
    assert(versionsAfter == 1)
    assert(Warehouse.read(spark, target).count() == 2)
  }

  test("compact bounds the file count after small publishes; data and commit semantics unchanged") {
    val root = freshRoot()
    val target = s"$root/warehouse/c"
    import spark.implicits._
    // an incremental service accretes small files: publish a version whose
    // data is spread over 16 tiny part files (micro-batch shrapnel)
    val df = (1 to 64).map(i => (i, s"v$i")).toDF("id", "v").repartition(16)
    Warehouse.publish(spark, target, df)
    assert(Warehouse.currentFileCount(spark, target) >= 16)
    val before = Warehouse.read(spark, target).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap

    val vc = Warehouse.compact(spark, target, 2)
    // compaction is a pointer commit like any publish: the new version is
    // current, the old one stays readable until vacuum
    assert(Warehouse.currentVersion(spark, target).contains(vc))
    assert(Warehouse.currentFileCount(spark, target) <= 2)
    val after = Warehouse.read(spark, target).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(after == before, "compaction must not change the data")

    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def versions() = fs.listStatus(new org.apache.hadoop.fs.Path(target))
      .count(s => s.isDirectory && s.getPath.getName.startsWith("v_"))
    assert(versions() == 2)
    Warehouse.vacuum(spark, target)
    assert(versions() == 1)
    assert(Warehouse.read(spark, target).count() == 64)

    // upsert-after-compact behaves exactly as upsert-after-publish
    Warehouse.upsertPublish(spark, target,
      Seq((1, "v1b"), (65, "v65")).toDF("id", "v"), "id", Seq("v"))
    val merged = Warehouse.read(spark, target).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(merged.size == 65 && merged(1) == "v1b" && merged(65) == "v65")
  }

  test("comma-in-name survives the CSV stage round-trip") {
    val root = freshRoot()
    dropRaw(root, "raw")
    val p = new Pipeline(spark, root)
    p.run()
    assert(p.dim().collect().exists(_.getString(1) == "Wormhole, Inc. Token"))
  }

  test("ingest snapshot dumps verbatim bytes under a sortable run id") {
    val root = freshRoot()
    val fixture = getClass.getResource("/raw_coins.json").getPath
    val p = Ingest.snapshot(spark, Ingest.fixtureFetch(fixture),
      s"$root/raw_data", "20241115T100000Z")
    assert(p.endsWith("cryptoinsight_raw_20241115T100000Z"))
    val written = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p.stripPrefix("file:"))))
    val orig = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture)))
    assert(written == orig) // byte-preserving, like the reference's put_object
    intercept[IllegalArgumentException] {
      Ingest.snapshot(spark, () => "x", s"$root/raw_data", "2024-11-15 10:00:00")
    }
    // the dump is readable by the transform stage
    assert(Transform.readRaw(spark, s"$root/raw_data").count() == 5)
  }

  test("ingest retry recovers from transient failures, then fails loudly") {
    var calls = 0
    val flaky = () => { calls += 1; if (calls < 3) sys.error("transient") else "ok" }
    assert(Ingest.withRetry(3, backoffMs = 1)(flaky) == "ok")
    assert(calls == 3)
    intercept[RuntimeException] {
      Ingest.withRetry(2, backoffMs = 1)(() => sys.error("always"))
    }
  }

  test("roi struct is read but dropped by both projections") {
    val raw = Transform.readRaw(spark, getClass.getResource("/raw_coins.json").getPath)
    assert(raw.schema("roi").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(!Transform.coinInfo(raw).columns.contains("roi"))
    assert(!Transform.coinMetrics(raw).columns.contains("roi"))
    // eth carries a non-null roi in the fixture
    assert(raw.filter("roi.currency = 'btc'").count() == 1)
  }
}
