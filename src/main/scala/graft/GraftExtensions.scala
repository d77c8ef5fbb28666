package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Canonical Spark extension entry point: registers the engine's
  * native expression surface through the injection API, so any
  * session configured with
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * gets the full function family (sketches, tile zonal/mask,
  * geometry, histogram merge) with no imperative install call — the
  * cluster-deployment shape of [[graft.functions.GraftFunctions]]'s
  * per-session registration (which remains for programmatic use; both
  * feed the same expression builders). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.injectInto(ext)
}
