package graft.streaming

import graft.multimodal.MultimodalQueries
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming perceptual-dedup gate for MEDIA — the cross-modal twin
  * of [[DedupStream]] (text LSH) and the ingestion-time shape of the
  * batch `m5_phash_pairs`: an incoming media row (a real PNG) is
  * dropped when its aHash — computed by the exact kernel m5 uses,
  * [[graft.multimodal.MultimodalQueries.phashOf]], so stream and
  * batch verdicts agree BY CONSTRUCTION — lies within Hamming ≤ 3 of
  * any corpus item.
  *
  * Scale shape: Hamming ≤ 3 over 32 bits pigeonholes into 4 bands of
  * 8 bits (4 mismatched bands would need 4 differing bits), so the
  * gate is FOUR chained stream-static left-anti EQUI-joins — band k
  * of the incoming hash against the static corpus band-k table, with
  * the exact Hamming test as the residual condition. Each join has a
  * proper equi key (no nested loop anywhere); the corpus band tables
  * are built once per corpus version (one decode pass) and broadcast
  * when they fit, co-partitioned on the band value when they don't.
  * A row survives iff NO band catches it — exactly the pair
  * predicate m5 mines. No streaming state; within-stream near-dups
  * are downstream batch m5's job (the BloomGateStream convention),
  * and the band tables version with the corpus snapshot. */
object MediaDedupStream {

  private val bandSchema = StructType(Seq(
    StructField("cph", LongType),
    StructField("k", IntegerType),
    StructField("bv", LongType)))

  /** Pigeonhole band table from a MATERIALIZED hash frame (e.g. the
    * phash/afp ingest sidecar): 4 bands of 8 bits — THE split
    * [[gate]] joins on, defined once so a producer cannot drift from
    * the join keys ([[AudioDedupStream]] and the streaming oracle
    * harness build their band tables through this). `outCol` names
    * the full-hash column the gate's residual Hamming test reads
    * (`cph` here, `cfp` for audio). */
  def bandsOf(hashes: DataFrame, hashCol: String, outCol: String): DataFrame =
    hashes.selectExpr(s"$hashCol AS $outCol", "explode(sequence(0, 3)) AS k")
      .selectExpr(outCol, "CAST(k AS INT) AS k",
        s"CAST(shiftright($outCol, 8 * k) & 255 AS BIGINT) AS bv")

  /** The corpus fingerprint: every corpus item's phash exploded into
    * its 4 pigeonhole bands `(cph, k, bv)`. Built from the media-lake
    * frame `(doc_id, fmt, media)` in one decode pass (the `fmt`
    * column drives the mixed-lake PNG/JPEG dispatch, same as m5). */
  def corpusBands(corpus: DataFrame): DataFrame =
    corpus.mapPartitions { it =>
      it.flatMap { row =>
        val h = MultimodalQueries.phashOf(row.getAs[String]("fmt"),
          row.getAs[Array[Byte]]("media"))
        (0 until 4).iterator.map(k => Row(h, k, (h >> (8 * k)) & 255L))
      }
    }(Encoders.row(bandSchema))

  /** The gate: incoming `(doc_id, media, ...)` rows whose phash is
    * NOT within Hamming ≤ 3 of any corpus item pass through with
    * their columns unchanged. Works on static and streaming frames
    * (stream-static left-anti joins). `bands` must be a MATERIALIZED
    * frame (e.g. read back from the corpus-version sidecar) — passing
    * the raw [[corpusBands]] plan would re-decode the corpus per
    * micro-batch per band. */
  def gate(stream: DataFrame, bands: DataFrame): DataFrame = {
    val ph = "__media_phash"
    require(!stream.columns.contains(ph),
      s"input stream must not carry a '$ph' column")
    val hashed = {
      val schema = StructType(stream.schema.fields :+ StructField(ph, LongType))
      stream.mapPartitions { it =>
        it.map { row =>
          val media = row.getAs[Array[Byte]]("media")
          Row.fromSeq(row.toSeq :+
            MultimodalQueries.phashOf(row.getAs[String]("fmt"), media))
        }
      }(Encoders.row(schema))
    }
    val survivors = (0 until 4).foldLeft(hashed) { (df, k) =>
      val bk = bands.where(col("k") === k)
        .select(col("bv").as(s"bv_$k"), col("cph").as(s"cph_$k"))
      df.join(bk,
        expr(s"(($ph >> ${8 * k}) & 255) = bv_$k " +
          s"AND bit_count($ph ^ cph_$k) <= 3"),
        "left_anti")
    }
    survivors.drop(ph)
  }
}
