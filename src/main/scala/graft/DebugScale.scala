package graft

/** Scratch profiler for the m15/d13 100× residuals. DELETE before
  * round close. */
object DebugScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf100x_v3"
    val which = if (args.length > 1) args(1) else "both"
    val spark = LocalTuning(org.apache.spark.sql.SparkSession.builder())
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val secs = (for { s <- i.submissionTime; c <- i.completionTime }
          yield (c - s) / 1e3).getOrElse(-1.0)
        if (secs > 2.0)
          println(f"[dbg]   stage ${i.stageId} ${secs}%.1f s tasks=${i.numTasks} ${i.name.take(70)}")
      }
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dbg] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    if (which == "both" || which == "m15") {
      t("m15 rep1") { SparkEntry.queries("m15_frame_dedup")(spark, dir).count() }
      t("m15 rep2") { SparkEntry.queries("m15_frame_dedup")(spark, dir).count() }
    }
    if (which == "both" || which == "d13") {
      t("d13 rep1") { SparkEntry.queries("d13_quality_keep")(spark, dir).count() }
      t("d13 rep2") { SparkEntry.queries("d13_quality_keep")(spark, dir).count() }
    }
    spark.stop()
  }
}
