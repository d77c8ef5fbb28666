package graft
/** Formatted physical-plan dump, one file per query (the r16
  * optimization-round evidence: `plans/r16/<q>_{before,after}.txt`):
  * `runMain graft.PlanDumpDir q1,q2,… <sfDir> <outDir> <suffix>`. */
object PlanDumpDir {
  def main(args: Array[String]): Unit = {
    val spark = LocalTuning(org.apache.spark.sql.SparkSession.builder())
      .master("local[4]").config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(args(2)).mkdirs()
    args(0).split(",").foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, args(1))
        val out = new java.io.PrintWriter(s"${args(2)}/${n}_${args(3)}.txt")
        out.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).trim)
        out.close()
        println(s"[plandump] $n ok")
      } catch { case e: Throwable =>
        println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
