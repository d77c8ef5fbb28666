package graft.streaming

import graft.textops.TextQueries.TemperatureMix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming quality-temperature sampling gate — the ingestion-time
  * twin of the batch `t16_temperature_sample` (keep MORE of the
  * high-quality tail, progressively less of the low end, with a
  * deterministic per-document coin so the same document makes the
  * same cut on every run, at any cluster size).
  *
  * Stream and batch share ONE kernel
  * ([[graft.textops.TextQueries.TemperatureMix]]): the integer
  * quality proxy, the coin, and the per-quartile rates — so the
  * keep-decisions agree BY CONSTRUCTION given the same thresholds.
  * The quartile THRESHOLDS are corpus statistics: they are computed
  * once per corpus version by [[thresholds]] and enter the stream as
  * three literals — the same snapshot-versioning contract as the
  * Bloom gates' blob ([[BloomGateStream]]); a corpus rebuild re-derives
  * them. The gate itself is STATELESS — a pure codegen'd per-row
  * predicate, no state store, no shuffle, which is what lets it sit
  * in front of a 100 TB/day firehose.
  */
object TemperatureSampleStream {

  /** Quartile thresholds of the quality proxy over the corpus: the
    * t15/t16 histogram-quantile move — the proxy's domain is bounded
    * (0..1000 per-mille values), so the histogram is ≤ 1001 rows at
    * ANY corpus size; one map-side-combined groupBy, cumulative scan
    * on the driver. Returns (q1, q2, q3) with the batch query's exact
    * crossing rule (smallest value whose cumulative count reaches
    * n/4, n/2, 3n/4). */
  def thresholds(corpus: DataFrame): (Long, Long, Long) = {
    val hist = corpus
      .selectExpr(TemperatureMix.qualityExpr("text") + " AS q")
      .groupBy("q").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(hist.nonEmpty, "temperature thresholds need a non-empty corpus")
    val n = hist.map(_._2).sum
    def quant(mult: Long, rhs: Long): Long = {
      var cum = 0L
      hist.foreach { case (q, c) =>
        cum += c
        if (cum * mult >= n * rhs) return q
      }
      hist.last._1
    }
    (quant(4, 1), quant(2, 1), quant(4, 3))
  }

  /** The gate: incoming `(doc_id, text, ...)` rows surviving the
    * temperature coin pass through with their columns unchanged.
    * Works on static and streaming frames. The predicate is BUILT
    * from the shared kernel's SQL text (bucketCase/keepPredicate) —
    * not re-typed — so a rate or bucket-rule change in
    * [[TemperatureMix]] reaches stream and batch together. */
  def gate(stream: DataFrame, thr: (Long, Long, Long)): DataFrame = {
    val (q1, q2, q3) = thr
    val bucket = TemperatureMix.bucketCase(
      s"(${TemperatureMix.qualityExpr("text")})",
      s"${q1}L", s"${q2}L", s"${q3}L")
    stream.where(expr(TemperatureMix.keepPredicate("doc_id", s"($bucket)")))
  }
}
