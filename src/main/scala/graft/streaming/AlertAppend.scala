package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental append for alert-style tables (SURVEY §2.7): the
  * reference's `/append` endpoint re-runs load jobs with
  * `INSERT … ON CONFLICT DO NOTHING` idempotency
  * (`table_source_assets.py:221-285`, `load_tabular_data.sh:59-73`).
  * Batch form: left-anti on the unique key then append. Streaming
  * form: Structured Streaming with a watermark and
  * `dropDuplicates(uniqueKey)` — the same idempotency contract for
  * late or replayed events, state bounded by the watermark horizon.
  * At scale the streaming query writes partitioned Parquet and the
  * dedup state shuffles on the unique key exactly like the batch
  * anti-join.
  */
object AlertAppend {

  /** Batch append: `ON CONFLICT DO NOTHING` ≡ anti-join on the unique
    * key, then union. */
  def appendBatch(existing: DataFrame, incoming: DataFrame,
                  uniqueKey: Seq[String]): DataFrame =
    existing.unionByName(
      incoming.join(existing, uniqueKey, "left_anti")
        .dropDuplicates(uniqueKey))

  /** Streaming dedup-append: drop replays of the unique key within the
    * watermark horizon. `input` must be a streaming DataFrame with an
    * event-time column `ts`. KEY-ONLY dedup
    * (`dropDuplicatesWithinWatermark`): a replayed event with the same
    * unique key but a drifted event time is still dropped — the full
    * `ON CONFLICT DO NOTHING` contract the batch path implements —
    * while state stays bounded by the watermark horizon. */
  def streamingDedup(input: DataFrame, uniqueKey: Seq[String],
                     watermarkDelay: String = "10 minutes"): DataFrame =
    input
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(uniqueKey)

  /** Wire a streaming dedup-append into a sink: `format` "memory"
    * (tests) or "parquet" with `path`+`checkpoint` (the production
    * shape). Returns the query handle so callers can await, stop, and
    * observe failures — a discarded handle dies silently. */
  def run(spark: SparkSession, input: DataFrame, queryName: String,
          format: String = "memory", path: Option[String] = None,
          checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = streamingDedup(input, Seq("event_id"))
      .writeStream
      .format(format)
      .queryName(queryName)
      .outputMode("append")
    val withPath = path.fold(w)(w.option("path", _))
    val withCp = checkpoint.fold(withPath)(withPath.option("checkpointLocation", _))
    withCp.start()
  }
}
