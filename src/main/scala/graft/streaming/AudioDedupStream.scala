package graft.streaming

import graft.multimodal.MultimodalQueries
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming perceptual-dedup gate for AUDIO — [[MediaDedupStream]]'s
  * twin on the WAV lake, the ingestion-time shape of batch
  * `m10_audio_fingerprint`: an incoming clip (a real RIFF/WAVE
  * container) is dropped when its 32-bin energy-profile dHash —
  * computed by the exact kernel m10 uses,
  * [[graft.multimodal.MultimodalQueries.afpOf]], so stream and batch
  * verdicts agree BY CONSTRUCTION — lies within Hamming ≤ 3 of any
  * corpus clip.
  *
  * Scale shape is [[MediaDedupStream]]'s verbatim: the 32-bit hash
  * pigeonholes into 4 bands of 8 bits, the gate is four chained
  * stream-static left-anti EQUI-joins with the exact Hamming test as
  * the residual condition, the corpus band tables build once per
  * corpus version. No streaming state; within-stream near-dups are
  * downstream batch m10's job. */
object AudioDedupStream {

  private val bandSchema = StructType(Seq(
    StructField("cfp", LongType),
    StructField("k", IntegerType),
    StructField("bv", LongType)))

  /** The corpus fingerprint: every corpus clip's dHash exploded into
    * its 4 pigeonhole bands `(cfp, k, bv)` — one decode pass over the
    * audio-lake frame `(doc_id, media)`. */
  def corpusBands(corpus: DataFrame): DataFrame =
    corpus.mapPartitions { it =>
      it.flatMap { row =>
        val h = MultimodalQueries.afpOf(row.getAs[Array[Byte]]("media"))
        (0 until 4).iterator.map(k => Row(h, k, (h >> (8 * k)) & 255L))
      }
    }(Encoders.row(bandSchema))

  /** The gate: incoming `(doc_id, media, ...)` rows whose fingerprint
    * is NOT within Hamming ≤ 3 of any corpus clip pass through with
    * their columns unchanged. `bands` must be MATERIALIZED (read from
    * the corpus-version sidecar) — the raw [[corpusBands]] plan would
    * re-decode the corpus per micro-batch per band. */
  def gate(stream: DataFrame, bands: DataFrame): DataFrame = {
    val fp = "__audio_afp"
    require(!stream.columns.contains(fp),
      s"input stream must not carry a '$fp' column")
    val hashed = {
      val schema = StructType(stream.schema.fields :+ StructField(fp, LongType))
      stream.mapPartitions { it =>
        it.map { row =>
          Row.fromSeq(row.toSeq :+
            MultimodalQueries.afpOf(row.getAs[Array[Byte]]("media")))
        }
      }(Encoders.row(schema))
    }
    val survivors = (0 until 4).foldLeft(hashed) { (df, k) =>
      val bk = bands.where(col("k") === k)
        .select(col("bv").as(s"bv_$k"), col("cfp").as(s"cfp_$k"))
      df.join(bk,
        expr(s"(($fp >> ${8 * k}) & 255) = bv_$k " +
          s"AND bit_count($fp ^ cfp_$k) <= 3"),
        "left_anti")
    }
    survivors.drop(fp)
  }
}
