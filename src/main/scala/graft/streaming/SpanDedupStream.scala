package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming twin of the batch C4-style span dedup (`d9_span_dedup`
  * in [[graft.textops.TextQueries]]): incoming documents are REWRITTEN
  * at ingestion time — every non-overlapping 10-word span already
  * present in the training corpus (or earlier in the same document)
  * is dropped, and the surviving spans reassemble in order. A document
  * losing every span never lands (the whole-document-duplicate case).
  *
  * Scale shape: the corpus span index is the big, slowly-changing
  * side — one distinct md5 hash per corpus span, partitioned by hash —
  * and each micro-batch anti-joins against it STATELESSLY; the only
  * stateful operator is the per-document rebuild aggregation, whose
  * state is bounded by the event-time watermark (a document's spans
  * all carry its one `ts`, so each group finalizes as soon as the
  * watermark passes it).
  *
  * Parity contract (the [[DedupStream]] one-sided convention): when
  * corpus doc_ids precede stream doc_ids and streamed documents share
  * no spans with EACH OTHER, the gate's rewrite of a streamed document
  * equals the batch `d9_span_dedup` row for it over corpus ∪ stream —
  * the span boundaries and hashes come from the shared
  * [[graft.textops.TextQueries.SpanShape]], so they agree by
  * construction. Cross-document dedup WITHIN one stream batch stays
  * the batch job's (or a re-run's) responsibility, exactly like the
  * LSH gate's stream-vs-stream pairs.
  */
object SpanDedupStream {

  private val shape = graft.textops.TextQueries.SpanShape

  /** The static corpus side: one row per DISTINCT span hash. Persist
    * partitioned by `h` so micro-batch anti-joins co-locate. */
  def spanIndex(docs: DataFrame): DataFrame =
    docs.selectExpr("split(text, ' ') AS w")
      .selectExpr(
        s"""explode(transform(sequence(0, ${shape.countSql("w")} - 1),
           |  i -> md5(${shape.chunkSql("w", "i")}))) AS h""".stripMargin)
      .distinct()

  /** The gate: incoming `(doc_id, text, ts)` documents emit one
    * `(doc_id, ts, kept_text, n_kept)` row once the watermark passes
    * their event time; fully-duplicate documents emit nothing.
    *
    * Within-document keep-first happens in the REBUILD:
    * `array_distinct` over the idx-sorted surviving spans keeps the
    * first occurrence of each — hash-set linear in the span count (a
    * per-span `array_position` filter before the explode would be
    * O(k²) string compares inside one task for a k-span document). */
  def spanGate(stream: DataFrame, index: DataFrame,
               watermarkDelay: String = "10 minutes"): DataFrame = {
    val spans = stream
      .withColumn("w", expr("split(text, ' ')"))
      .withColumn("sp", expr(
        s"""transform(sequence(0, ${shape.countSql("w")} - 1),
           |  i -> struct(i AS idx, ${shape.chunkSql("w", "i")} AS span))""".stripMargin))
      .select(col("doc_id"), col("ts"), explode(col("sp")).as("e"))
      .selectExpr("doc_id", "ts", "e.idx AS idx", "e.span AS span",
        "md5(e.span) AS h")
    spans
      .join(index, Seq("h"), "left_anti")
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("doc_id"), col("ts"))
      .agg(
        expr("array_distinct(transform(array_sort(collect_list(struct(idx, span))), s -> s.span))")
          .as("kept_spans"))
      .select(col("doc_id"), col("ts"),
        expr("array_join(kept_spans, ' ')").as("kept_text"),
        expr("CAST(size(kept_spans) AS BIGINT)").as("n_kept"))
  }
}
