package graft

/** Dev tool: time one query repeatedly and dump its formatted plan.
  * Usage: runMain graft.Prof <query> [sfDir] [reps] */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Verify.session("local[32]", "32")
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // warm
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"PROF $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    if (sys.env.get("PROF_EXPLAIN").contains("1"))
      fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
