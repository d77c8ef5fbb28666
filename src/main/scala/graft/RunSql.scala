package graft

/** Dev utility: run ad-hoc SQL against the registered lake tables +
  * engine functions (`runMain graft.RunSql <sfDir> "<sql>"`). */
object RunSql {
  def main(args: Array[String]): Unit = {
    val spark = LocalTuning(org.apache.spark.sql.SparkSession.builder())
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, args(0))
    graft.functions.GraftFunctions.install(spark)
    val t0 = System.nanoTime()
    spark.sql(args(1)).show(50, truncate = false)
    println(f"ELAPSED ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
