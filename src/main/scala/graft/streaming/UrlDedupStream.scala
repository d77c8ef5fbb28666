package graft.streaming

import graft.textops.TextQueries.UrlCanon
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming URL-dedup gate — the ingestion-time twin of the batch
  * `d11_url_dedup` (C4/CommonCrawl step 1: one page behind many URL
  * variants must land in the corpus ONCE). An incoming crawl row is
  * dropped when its CANONICAL URL — computed by the exact chain d11
  * uses, [[graft.textops.TextQueries.UrlCanon]], so stream and batch
  * keys agree BY CONSTRUCTION — already exists in the corpus.
  *
  * Shape is [[BloomGateStream]]'s, keyed on the canonical URL instead
  * of the text body: the corpus's canonical-key Bloom blob is built
  * once per corpus version and enters every micro-batch as a foldable
  * binary literal (filter deserializes once per task); rows the blob
  * proves absent bypass the confirm join, and only the candidate
  * sliver (true dups + ~fpp) anti-joins the corpus on the canonical
  * key. Stateless — no streaming state store; within-stream variant
  * collapse (two variants of a NEW page in one batch) is downstream
  * batch d11's job, exactly as within-stream text dups are d1's, and
  * the same versioning contract applies: blob and corpus snapshot
  * advance together.
  */
object UrlDedupStream {

  private val canonExpr = UrlCanon.expr("url")

  /** One serialized Bloom filter of `xxhash64(canonical_url)` over the
    * corpus, auto-sized from the measured corpus count (same knob
    * policy as d10 / BloomGateStream). */
  def corpusBloom(corpus: DataFrame, fpp: Double = 0.01): Array[Byte] = {
    val n = corpus.count()
    corpus.selectExpr(
        s"bloom_agg(xxhash64($canonExpr), ${math.max(1L, n)}L, CAST($fpp AS DOUBLE)) AS b")
      .head().getAs[Array[Byte]](0)
  }

  /** The gate: incoming `(doc_id, url, ...)` rows whose canonical URL
    * is not already in `corpus` pass through with their columns
    * unchanged. Works on static and streaming frames. Same deliberate
    * double-scan trade-off as [[BloomGateStream.gate]] (documented
    * there): two cheap codegen'd scans of the micro-batch beat
    * shuffling the whole batch against a TB corpus. */
  def gate(stream: DataFrame, corpus: DataFrame, blob: Array[Byte]): DataFrame = {
    val corpusCanon = "__url_corpus_canon"
    require(!stream.columns.contains(corpusCanon),
      s"input stream must not carry a '$corpusCanon' column")
    val canon = expr(canonExpr)
    val probe = call_function("bloom_might_contain",
      lit(blob), xxhash64(canon))
    val fresh = stream.where(!probe)
    val confirmed = stream.where(probe)
      .join(corpus.select(expr(canonExpr).as(corpusCanon)),
        canon === col(corpusCanon), "left_anti")
    fresh.unionByName(confirmed)
  }
}
