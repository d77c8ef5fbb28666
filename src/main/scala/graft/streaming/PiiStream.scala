package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PII scrub gate — the ingestion-time shape of the batch
  * t11 scrub (`t11_pii_scrub` in [[graft.textops.TextQueries]]): a
  * crawl feed is redacted BEFORE anything lands in training storage,
  * and documents whose PII density exceeds a budget are quarantined
  * for review instead of ingested.
  *
  * Scale shape: the scrub is a pure stateless per-row projection
  * (three chained regexp_replace + two counts) — no state store, no
  * shuffle, no watermark; Structured Streaming runs it map-side in
  * every micro-batch at source parallelism. The regexes are THE batch
  * pipeline's [[graft.textops.TextQueries.PiiShape]] constants —
  * imported, not re-implemented — so stream and batch redactions
  * agree by construction (pinned by `PiiStreamSpec`).
  */
object PiiStream {

  private val shape = graft.textops.TextQueries.PiiShape

  /** Scrub `(doc_id, text, ...)` rows: adds `redacted`, `n_emails`,
    * `n_ips`, `n_phones`. Works on static and streaming frames. */
  def scrub(docs: DataFrame): DataFrame =
    docs
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), lit(shape.email), lit("<EMAIL>")),
            lit(shape.ipv4), lit("<IP>")),
          lit(shape.phone), lit("<PHONE>")))
      .withColumn("n_emails",
        size(regexp_extract_all(col("text"), lit(shape.email), lit(0))))
      .withColumn("n_ips",
        size(regexp_extract_all(col("text"), lit(shape.ipv4), lit(0))))
      .withColumn("n_phones",
        size(regexp_extract_all(col("text"), lit(shape.phone), lit(0))))

  /** The gate: scrubbed documents whose total PII hits stay within
    * `maxHits` pass through (redacted); the rest route to quarantine.
    * `quarantined = false` rows carry the redacted text as `text`. */
  def gate(docs: DataFrame, maxHits: Int = 2): DataFrame =
    scrub(docs)
      .withColumn("quarantined",
        col("n_emails") + col("n_ips") + col("n_phones") > maxHits)
      .withColumn("text",
        when(col("quarantined"), col("text")).otherwise(col("redacted")))
      .drop("redacted")
}
