package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming near-duplicate gate — the ingestion-time shape of the
  * batch MinHash-LSH dedup (`d3_minhash_lsh_pairs` / `t5_corpus_select`
  * in [[graft.textops.TextQueries]]): a crawl feed dedups against the
  * EXISTING corpus before anything lands in training storage.
  *
  * Scale shape (the reason this is a stream-static join, not a
  * self-join): the corpus index is the big, slowly-changing side — it
  * lives partitioned by `(band, bh)` and each micro-batch of incoming
  * documents joins against it with NO streaming state for the join
  * itself; the only stateful operator is the
  * `dropDuplicatesWithinWatermark` collapsing multi-band hits, whose
  * state is bounded by the event-time watermark. Signatures
  * (`shingle_hashes` → `minhash36`, both codegen'd scan-side
  * expressions) compute identically on both sides, so a document
  * flagged here is exactly one the batch pipeline would pair.
  */
object DedupStream {

  // THE batch pipeline's LSH shape, imported — not re-implemented —
  // so stream and batch verdicts agree by construction
  private val shape = graft.textops.TextQueries.LshShape

  /** The static corpus index: one row per (band, band-hash, document),
    * carrying the shingle set for exact verification. Persist this
    * partitioned by `(band, bh)` so micro-batch joins co-locate. */
  def corpusIndex(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", s"${shape.shinglesSql} AS hs")
      .where("size(hs) > 0")
      .selectExpr("doc_id", "hs", "minhash36(hs) AS sg")
      .selectExpr("doc_id", "hs", shape.bandStructsSql("sg"))
      .selectExpr("e.band AS band", "e.bh AS bh", "doc_id", "hs")

  /** The gate: incoming `(doc_id, text, ts)` documents emit one
    * `(doc_id, dup_of, jaccard, ts)` row per corpus document they
    * near-duplicate (exact Jaccard ≥ `tau` on the LSH candidates).
    * Downstream drops flagged documents with a left-anti join, the
    * `t5_corpus_select` shape. */
  def lshGate(stream: DataFrame, index: DataFrame,
              tau: Double = 0.5, watermarkDelay: String = "10 minutes"): DataFrame = {
    val sigs = stream
      .withColumn("hs", expr(shape.shinglesSql))
      .where("size(hs) > 0")
      .withColumn("sg", expr("minhash36(hs)"))
      .select(col("doc_id"), col("ts"), col("hs"), expr(shape.bandStructsSql("sg")))
      .selectExpr("doc_id", "ts", "hs", "e.band AS band", "e.bh AS bh")
    sigs
      .join(index.withColumnRenamed("doc_id", "dup_of")
          .withColumnRenamed("hs", "corpus_hs"),
        Seq("band", "bh"))
      // a re-ingested document carrying an existing corpus id must not
      // flag itself (the batch pipeline's a.doc_id < b.doc_id analog)
      .where(col("doc_id") =!= col("dup_of"))
      // dedup the CANDIDATE pair BEFORE the exact verify (r16): a pair
      // colliding in several bands otherwise pays the array_intersect
      // verify once per band, while the verify is deterministic per
      // pair — dedup-then-verify emits exactly the rows
      // verify-then-dedup did (the batch pipeline's
      // DISTINCT-candidates shape). The one stateful dedup just moves
      // earlier; the watermark bounds it as before.
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("doc_id", "dup_of")
      .withColumn("shared", expr("size(array_intersect(hs, corpus_hs))"))
      .withColumn("jaccard", expr(
        "CAST(shared AS DOUBLE) / (size(hs) + size(corpus_hs) - shared)"))
      .where(col("jaccard") >= tau)
      .select(col("doc_id"), col("dup_of"), col("jaccard"), col("ts"))
  }
}
