package graft
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.register(spark, "/root/testdata/sf0.1")
    spark.sql("SELECT count(*) FROM documents").count()
    for (q <- Seq("d4_ngram_jaccard_pairs","e4_ann_lsh_pairs","d3_minhash_lsh_pairs","t5_corpus_select"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
      println(f"[perf] $q run$i ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
