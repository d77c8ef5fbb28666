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
    * frames. */
  def gate(stream: DataFrame, textCol: String = "text"): DataFrame = {
    require(stream.columns.contains(textCol),
      s"classifier gate: input has no '$textCol' column")
    val nwE = ClassifierShape.nw(textCol, spark = true)
    stream.where(expr(
      s"${ClassifierShape.logit(textCol, nwE, spark = true)} >= 0"))
  }
}
