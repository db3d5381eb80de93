package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `Warehouse.publishEnforced`: the per-write schema contract. Drops and
  * type changes always reject; additive columns need an explicit
  * `evolve = true`; a rejected publish must leave the target untouched
  * (the check runs before any data is written). */
class SchemaContractSpec extends SparkSpec {

  private val root = "/tmp/graft_schema_spec"

  test("schema contract: drop/type-change reject, additive needs evolve, rejects write nothing") {
    import spark.implicits._
    val target = s"$root/t"
    val dir = new java.io.File(root)
    if (dir.exists()) { def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }; rm(dir) }

    val v0 = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    Warehouse.publishEnforced(spark, target, v0)
    assert(Warehouse.schemaOf(spark, target).get.fieldNames.toSeq == Seq("id", "name"))

    // same schema: fine
    Warehouse.publishEnforced(spark, target, Seq((3L, "c")).toDF("id", "name"))

    // dropped column: always rejected
    val eDrop = intercept[RuntimeException] {
      Warehouse.publishEnforced(spark, target, Seq(4L).toDF("id"))
    }
    assert(eDrop.getMessage.contains("dropped column"))

    // type change: always rejected, even with evolve
    val eType = intercept[RuntimeException] {
      Warehouse.publishEnforced(spark, target,
        Seq(("5", "e")).toDF("id", "name"), evolve = true)
    }
    assert(eType.getMessage.contains("type change"))

    // additive column: rejected by default, allowed with evolve
    val widened = Seq((6L, "f", 1.5)).toDF("id", "name", "score")
    val eAdd = intercept[RuntimeException] {
      Warehouse.publishEnforced(spark, target, widened)
    }
    assert(eAdd.getMessage.contains("new column"))

    // every rejection above wrote NOTHING: still the 1-row second version
    val before = Warehouse.currentVersion(spark, target)
    assert(Warehouse.read(spark, target).count() === 1)

    Warehouse.publishEnforced(spark, target, widened, evolve = true)
    assert(Warehouse.currentVersion(spark, target) !== before)
    assert(Warehouse.schemaOf(spark, target).get.fieldNames.toSeq
      == Seq("id", "name", "score"))
  }
}
