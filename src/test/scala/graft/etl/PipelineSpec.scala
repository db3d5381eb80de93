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
