package graft.streaming

import graft.textops.TextQueries.ClassifierShape
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Streaming classifier-curation gate — the ingestion-time twin of
  * batch `t30_classifier_filter` (and the quality sibling of
  * [[ClipFilterStream]] on the text side): an incoming document
  * passes when the fixed-weight quality classifier's logit clears
  * zero (p ≥ ½). The scorer is THE shared definition
  * ([[graft.textops.TextQueries.ClassifierShape]] — weights,
  * feature formulas and the keep rule in one place), so a document
  * the stream admits is exactly a document batch t30 counts as
  * kept.
  *
  * Scale shape: a stateless per-row codegen'd expression — NO join,
  * NO state, NO decode; the gate costs the same per row at any
  * corpus size, which is why classifier filters run at ingestion in
  * production pipelines (FineWeb-Edu scores pages as they arrive,
  * not in a later global pass). */
object ClassifierGateStream {

  /** Rows of `stream` whose `textCol` scores logit ≥ 0 pass through
    * with their columns unchanged. Works on static and streaming
    * frames. The word count is projected ONCE (batch t30's CTE move):
    * inlining `nw` into the logit recomputes size(split(text, ' '))
    * ~4× per row inside one predicate (uniqPm, awlPm twice, the nw
    * term) — the helper column is dropped after the filter. */
  def gate(stream: DataFrame, textCol: String = "text"): DataFrame = {
    require(stream.columns.contains(textCol),
      s"classifier gate: input has no '$textCol' column")
    val nwCol = "__cls_gate_nw"
    require(!stream.columns.contains(nwCol),
      s"classifier gate: input already has a '$nwCol' column")
    stream
      .withColumn(nwCol, expr(ClassifierShape.nw(textCol, spark = true)))
      .where(expr(
        s"${ClassifierShape.logit(textCol, nwCol, spark = true)} >= 0"))
      .drop(nwCol)
  }
}
