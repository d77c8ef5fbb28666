package graft.streaming

import graft.textops.TextQueries.ChunkShape
import org.apache.spark.sql.DataFrame

/** Streaming document chunker — the ingestion-time twin of the batch
  * `t19_chunk` (split every arriving document into overlapping
  * fixed-token windows so the downstream embedding job consumes
  * encoder-sized pieces as they land, not in a nightly batch).
  *
  * Stream and batch share ONE kernel
  * ([[graft.textops.TextQueries.ChunkShape]]): the tokenizer, the
  * closed-form chunk count, and the per-chunk column arithmetic are
  * the same SQL fragments, so a window/stride change reaches both
  * sides together and chunk ids agree BY CONSTRUCTION. The gate is
  * STATELESS — a per-row generate with fan-out bounded by the
  * document's own length, no state store, no shuffle, no watermark —
  * which is what lets it sit inline on a firehose at any rate. */
object ChunkStream {

  /** Incoming `(doc_id, text)` rows → chunk rows with the batch
    * t19's exact output schema. Works on static and streaming
    * frames. */
  def gate(stream: DataFrame): DataFrame =
    stream
      .selectExpr("doc_id", s"${ChunkShape.tokensExpr("text")} AS w")
      .where("size(w) > 0")
      .selectExpr("doc_id", "w", "size(w) AS n")
      .selectExpr("doc_id", "w", "n",
        s"explode(sequence(0, ${ChunkShape.hiExpr("n")})) AS i")
      .selectExpr(Seq("doc_id") ++ ChunkShape.chunkCols: _*)
      .selectExpr("doc_id", "chunk_idx", "tok_start", "n_tok",
        "chunk_text", "md5(chunk_text) AS chunk_md5")
}
