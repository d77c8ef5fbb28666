package graft
/** Multi-query physical-plan dump (PLANS.md regeneration):
  * `runMain graft.PlanDumpAll q1,q2,… <sfDir> <outFile>`. */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val spark = LocalTuning(org.apache.spark.sql.SparkSession.builder())
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.io.PrintWriter(args(2))
    args(0).split(",").foreach { n =>
      val df = SparkEntry.queries(n)(spark, args(1))
      out.println(s"## $n\n")
      out.println("```")
      out.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple")).trim)
      out.println("```\n")
    }
    out.close()
    spark.stop()
  }
}
