package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = LocalTuning(org.apache.spark.sql.SparkSession.builder())
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString(if (args.length > 2) args(2) else "formatted")))
  }
}
