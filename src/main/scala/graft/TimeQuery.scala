package graft

/** Dev utility: time one `SparkEntry.queries` entry end-to-end
  * (`runMain graft.TimeQuery <name> <sfDir> [reps]`) — build + count
  * per rep, cold first. The bench harness times the full set; this
  * is for iterating on a single query's plan without paying the
  * other 150. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val (name, sfDir) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = LocalTuning(org.apache.spark.sql.SparkSession.builder())
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[time] $name rep$r rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
