package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Dev utility (guide §1: measure first): run one `SparkEntry.queries`
  * entry N times and print, for the LAST (warm) rep, every completed
  * stage with its wall duration, summed executor run/CPU time, task
  * count and shuffle bytes — the local[32] stand-in for the Spark UI's
  * stage table (the UI is disabled in this sandbox). Output is
  * advisory; the bench owns the official timing.
  *
  *   sbt "runMain graft.ProfileQuery <name> <sfDir> [reps]"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val (name, sfDir) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = LocalTuning(org.apache.spark.sql.SparkSession.builder())
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(id: Int, attempt: Int, nm: String, wallMs: Long,
                        runMs: Long, cpuMs: Long, tasks: Int,
                        shRead: Long, shWrite: Long, inBytes: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages += St(si.stageId, si.attemptNumber(), si.name,
            si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
            m.executorRunTime, m.executorCpuTime / 1000000,
            si.numTasks, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead)
        }
      }
    })

    (1 to reps).foreach { r =>
      if (r == reps) {
        stages.synchronized(stages.clear())
        org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      }
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      val n = df.count()
      val t2 = System.nanoTime()
      println(f"[prof] $name rep$r rows=$n build ${(t1 - t0) / 1e9}%.2f s count ${(t2 - t1) / 1e9}%.2f s total ${(t2 - t0) / 1e9}%.2f s")
    }
    println("[rules] top rule times (warm rep):")
    org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
      .split('\n').drop(2).take(18).foreach(l => println("[rules] " + l))
    Thread.sleep(300) // let the listener bus drain
    val snap = stages.synchronized(stages.toVector)
    println(f"[prof] warm-rep stages: ${snap.size}  wall-sum ${snap.map(_.wallMs).sum / 1e3}%.2f s  run-sum ${snap.map(_.runMs).sum / 1e3}%.2f s")
    snap.sortBy(-_.wallMs).take(40).foreach { s =>
      println(f"[prof] stage ${s.id}%5d wall ${s.wallMs / 1e3}%6.2f s  run ${s.runMs / 1e3}%7.2f s  cpu ${s.cpuMs / 1e3}%7.2f s  tasks ${s.tasks}%4d  shR ${s.shRead / 1024}%8d KiB  shW ${s.shWrite / 1024}%8d KiB  in ${s.inBytes / 1024}%8d KiB  ${s.nm.take(110)}")
    }
    spark.stop()
  }
}
