package graft.streaming

import graft.multimodal.MultimodalQueries
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming CLIP-score curation gate — the ingestion-time twin of
  * batch `m17_clip_filter` (and the quality sibling of
  * [[MediaDedupStream]]): an incoming claimed image-text pair — the
  * REAL media bytes plus the text-tower embedding it arrived with —
  * passes only when the CLIP cosine clears the corpus keep threshold.
  * Both sides of the score come from THE shared definitions: the
  * image tower is [[MultimodalQueries.imgEmbeddingOf]] (the exact
  * kernel the persisted tower sidecar is built with), the text tower
  * is the first-8-dims slice batch m7/m17 use, and the threshold is
  * [[MultimodalQueries.ClipKeepCosineD]] — so a pair the stream
  * admits is exactly a pair batch m17 counts as kept.
  *
  * Scale shape: stateless per-row decode → score → filter, NO join
  * and NO state — the gate is a narrow map at any corpus size, and
  * each executor carries nothing but the code. (Contrast the dedup
  * gates, which must consult corpus state; an alignment score is a
  * pure function of the arriving pair.) */
object ClipFilterStream {

  /** Rows of `stream` — carrying `fmt` (png|jpg), `media` (container
    * bytes) and `embedding` (the claimed text embedding,
    * array<float>) — pass through with their columns unchanged when
    * the pair's CLIP cosine ≥ the m17 threshold. Works on static and
    * streaming frames. */
  def gate(stream: DataFrame): DataFrame = {
    val cosCol = "__clip_cosine"
    require(!stream.columns.contains(cosCol),
      s"input stream must not carry a '$cosCol' column")
    val schema = StructType(stream.schema.fields :+
      StructField(cosCol, DoubleType))
    val fmtIdx = stream.schema.fieldIndex("fmt")
    val mediaIdx = stream.schema.fieldIndex("media")
    val embIdx = stream.schema.fieldIndex("embedding")
    val scored = stream.mapPartitions { it =>
      it.map { row =>
        val img = MultimodalQueries.imgEmbeddingOf(
          row.getString(fmtIdx), row.getAs[Array[Byte]](mediaIdx))
        val emb = row.getSeq[Float](embIdx)
        require(emb.length >= 8,
          s"clip gate: embedding has ${emb.length} dims, text tower needs 8")
        val txt = Array.tabulate(8)(i => emb(i).toDouble)
        // index-ordered folds — the vec_dot arithmetic, so the score
        // is bit-identical to the batch SQL's
        def dot(a: Array[Double], b: Array[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }
          s
        }
        val cos = dot(img, txt) /
          (math.sqrt(dot(img, img)) * math.sqrt(dot(txt, txt)))
        Row.fromSeq(row.toSeq :+ cos)
      }
    }(Encoders.row(schema))
    scored.where(col(cosCol) >= MultimodalQueries.ClipKeepCosineD)
      .drop(cosCol)
  }
}
