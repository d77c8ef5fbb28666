package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers the engine's native Catalyst expressions in the session
  * `FunctionRegistry`, making them callable from the SQL dialect (the
  * reference registers its function surface inside PostgreSQL; ours
  * lives in Catalyst — SURVEY §2.8).
  */
object GraftFunctions {
  def install(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "polyhash", exprs => PolyHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "tile_zonal",
      exprs => graft.raster.TileZonal(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "ngram_hashes", exprs => NGramHashes(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "shingle_hashes", exprs => ShingleHashes(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash36", exprs => MinHash36(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash31", exprs => SimHash31(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "rph_sig", exprs => RphSig(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "tile_mask", exprs => graft.raster.TileMask(exprs), "built-in")
    reg.createOrReplaceTempFunction(
      "hist_merge",
      exprs => graft.raster.HistMergeAgg(exprs(0), exprs(1), exprs(2), exprs(3)),
      "built-in")
    graft.geo.GeoFunctions.install(spark)
  }
}
