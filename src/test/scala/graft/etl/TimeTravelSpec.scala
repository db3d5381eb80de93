package graft.etl

import graft.SparkSpec

/** Warehouse time travel: versions() inventory in publish order,
  * readVersion() historical snapshots, interplay with the pointer and
  * vacuum. */
class TimeTravelSpec extends SparkSpec {

  test("historical versions stay readable until vacuum; current follows the pointer") {
    val s = spark
    import s.implicits._
    val target = java.nio.file.Files.createTempDirectory("tt").toString + "/t"

    val v1 = Warehouse.publish(s, target, Seq((1L, "a")).toDF("id", "v"))
    val v2 = Warehouse.publish(s, target, Seq((1L, "b"), (2L, "c")).toDF("id", "v"))

    assert(Warehouse.versions(s, target) == Seq(v1, v2))
    assert(Warehouse.currentVersion(s, target).contains(v2))
    // time travel to v1 sees the old bytes; read() follows the pointer
    assert(Warehouse.readVersion(s, target, v1).count() == 1)
    assert(Warehouse.read(s, target).count() == 2)
    val old = Warehouse.readVersion(s, target, v1).collect()
    assert(old.length == 1 && old(0).getString(1) == "a")

    // vacuum drops history: v1 gone (loudly), v2 still served
    Warehouse.vacuum(s, target)
    assert(Warehouse.versions(s, target) == Seq(v2))
    intercept[IllegalArgumentException] {
      Warehouse.readVersion(s, target, v1)
    }
    assert(Warehouse.read(s, target).count() == 2)
  }

  test("deleteWhere republishes without the rows; history keeps them until vacuum") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val target = java.nio.file.Files.createTempDirectory("tt3").toString + "/t"
    val v1 = Warehouse.publish(s, target,
      Seq((1L, "keep"), (2L, "erase"), (3L, "keep")).toDF("id", "v"))
    val v2 = Warehouse.deleteWhere(s, target, col("id") === 2L)

    val now = Warehouse.read(s, target).collect().map(_.getLong(0)).sorted
    assert(now.sameElements(Array(1L, 3L)))
    // two-phase erasure: the old snapshot still has the row until vacuum
    assert(Warehouse.readVersion(s, target, v1).count() == 3)
    Warehouse.vacuum(s, target)
    assert(Warehouse.versions(s, target) == Seq(v2))
    intercept[IllegalArgumentException] { Warehouse.readVersion(s, target, v1) }
  }

  test("diffVersions emits the exact change feed between two snapshots") {
    val s = spark
    import s.implicits._
    val target = java.nio.file.Files.createTempDirectory("tt4").toString + "/t"
    val v1 = Warehouse.publish(s, target,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
        (4L, null.asInstanceOf[String], 40.0)).toDF("id", "v", "x"))
    val v2 = Warehouse.publish(s, target,
      Seq((1L, "a", 10.0),                       // unchanged → dropped
        (2L, "B", 20.0),                         // updated payload
        (4L, null.asInstanceOf[String], 40.0),   // unchanged (null payload kept)
        (5L, "e", 50.0)).toDF("id", "v", "x"))   // inserted; 3 deleted
    val diff = Warehouse.diffVersions(s, target, v1, v2, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(2L -> "updated", 3L -> "deleted", 5L -> "inserted"))
  }

  test("versions on an unpublished target is empty, readVersion fails loudly") {
    val target = java.nio.file.Files.createTempDirectory("tt2").toString + "/none"
    assert(Warehouse.versions(spark, target).isEmpty)
    intercept[IllegalArgumentException] {
      Warehouse.readVersion(spark, target, "v_0000000000000_x")
    }
  }
}
