package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup gate — the ingestion-time shape of the batch
  * `d10_bloom_gate` ([[graft.textops.TextQueries]]) and the
  * exact-match sibling of [[DedupStream]]'s LSH near-dup gate: a
  * crawl feed drops documents whose text ALREADY EXISTS in the corpus
  * before anything lands in training storage (the reference's
  * ON-CONFLICT-DO-NOTHING append semantics, S2, applied at the
  * stream).
  *
  * Scale shape: the corpus Bloom blob is built ONCE per corpus
  * version (one scan, OR-merged partials) and fans out to every
  * micro-batch as a broadcast single-row frame; rows the filter
  * proves absent (`might_contain = false` — no false negatives)
  * bypass the confirm join entirely, so per micro-batch the
  * stream-static anti-join processes only the candidate sliver (true
  * dups + ~fpp). No streaming state anywhere — the gate is stateless
  * per row apart from the join, and the join is stream-static.
  *
  * Versioning contract: the blob and the corpus snapshot must advance
  * TOGETHER (rebuild the blob when the corpus compacts); a blob older
  * than the corpus would let a duplicate of a newer corpus row bypass
  * the confirm join. Within-stream duplicates are not this gate's job
  * (`dropDuplicatesWithinWatermark` / batch d1 downstream).
  */
object BloomGateStream {

  /** The corpus fingerprint: one serialized Bloom filter of
    * `xxhash64(text)`, auto-sized from the measured corpus count
    * (same knob policy as d10 / e4's band width). */
  def corpusBloom(corpus: DataFrame, fpp: Double = 0.01): Array[Byte] = {
    val n = corpus.count()
    corpus.selectExpr(
        s"bloom_agg(xxhash64(text), ${math.max(1L, n)}L, CAST($fpp AS DOUBLE)) AS b")
      .head().getAs[Array[Byte]](0)
  }

  /** The gate: incoming `(doc_id, text, ...)` documents not already
    * in `corpus` (by exact text) pass through with their columns
    * unchanged. Works on static and streaming frames.
    *
    * The blob enters as a binary LITERAL (`lit(blob)`), so the probe
    * expression is foldable and deserializes the filter once per task
    * — never per row — and no join/extra column touches the stream
    * for the probe itself.
    *
    * DELIBERATE double-scan: the micro-batch source is read twice
    * (`where(!probe)` + `where(probe)`), evaluating the probe twice
    * per row. The single-pass alternative — folding the probe into
    * the anti-join condition (`probe && text === corpusText`) — would
    * send EVERY stream row through the join, and when the corpus side
    * is too large to broadcast that means shuffling the whole batch
    * instead of only the candidate sliver; Catalyst cannot push
    * `probe` below a left-anti join because probe-false rows must be
    * KEPT, not filtered. A micro-batch is small and typically
    * memory-resident, so two cheap codegen'd scans of it beat one
    * full-batch shuffle against a TB corpus. */
  def gate(stream: DataFrame, corpus: DataFrame, blob: Array[Byte]): DataFrame = {
    val corpusText = "__bloom_corpus_text"
    require(!stream.columns.contains(corpusText),
      s"input stream must not carry a '$corpusText' column")
    val probe = call_function("bloom_might_contain",
      lit(blob), xxhash64(col("text")))
    // proven-absent rows skip the join — the common case on a
    // mostly-fresh feed
    val fresh = stream.where(!probe)
    // the candidate sliver confirms against the real corpus
    val confirmed = stream.where(probe)
      .join(corpus.select(col("text").as(corpusText)),
        col("text") === col(corpusText), "left_anti")
    fresh.unionByName(confirmed)
  }
}
