package graft

import org.apache.spark.sql.DataFrame

/** Storage hygiene for eager `localCheckpoint` pipelines.
  *
  * A localCheckpoint'ed DataFrame holds its blocks in the block
  * manager until the SESSION ends — queries that materialize a large
  * intermediate (the t13/t27 tokenize output: ~700 MB at the 100×
  * probe) and derive a small result from it would otherwise leak the
  * large blocks across a 174-query bench run, and the writeback /
  * eviction churn surfaces as multi-second stalls in UNRELATED
  * queries. Call this once every consumer of the checkpoint has
  * itself been materialized (checkpointed or collected); the freed
  * DataFrame must not be executed again.
  */
object CkptUtil {
  def unpersist(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        // BLOCKING: with blocking = false a caller that immediately
        // materializes the next corpus-sized checkpoint races the
        // async release — the block manager holds BOTH for a window,
        // and on repeated calls (bench warm pass, probe warmTimed)
        // that window is where the multi-second eviction stalls
        // live. The release is driver-side bookkeeping, milliseconds
        // against the corpus-scan calls this guards.
        lr.rdd.unpersist(blocking = true)
      case _ => ()
    }
}
