package graft.simsearch

/** Dev utility: time the Lloyd k-means build alone
  * (`GRAFT_KM_DEBUG=1` prints per-iteration ms). */
object KmTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val km = SimQueries.convergedKmeans(spark, sfDir)
    println(f"KMBUILD iters=${km.iters} fixed=${km.fixedPoint} sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
