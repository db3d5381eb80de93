package graft

/** Dev tool: dump formatted physical plans for selected queries so the
  * shuffle/broadcast/pushdown posture can be reviewed (SURVEY.md §4.2). */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Verify.session("local[8]", "8")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_join_multi")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
