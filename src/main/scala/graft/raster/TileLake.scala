package graft.raster

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persisted raster tile lake (SURVEY §2.1 S7/S8 storage path):
  * tiles at rest are Parquet rows `(tile_id, tx, ty, <band arrays>)`
  * partitioned by `tile_id`, so an AOI query's tile-id pruning is
  * Catalyst **partition pruning** — the directory listing drops
  * non-intersecting tiles before any I/O, the at-scale equivalent of
  * the reference geoprocessor reading only AOI-intersecting GeoTIFF
  * tiles (`raster_analysis.py:22-23`). GeoTIFF itself is out of scope
  * (no GDAL here); Parquet-of-arrays is the documented divergence.
  */
object TileLake {

  /** Write the synthetic environment's tiles (idempotent per target
    * dir): one row per tile carrying the raw band arrays. */
  def ensureWritten(spark: SparkSession, dir: String): Unit = synchronized {
    val marker = new java.io.File(s"$dir/_SUCCESS")
    if (marker.exists()) return
    import SyntheticEnv._
    val g = grid
    val px = g.pxPerTile * g.pxPerTile
    val sGx = s"(tx * ${g.pxPerTile} + i % ${g.pxPerTile})"
    val sGy = s"(ty * ${g.pxPerTile} + i DIV ${g.pxPerTile})"
    graft.functions.GraftFunctions.install(spark)
    val tiles = spark.range(g.nTiles).toDF("tile_idx")
      .selectExpr(
        s"CAST(tile_idx % ${g.tilesX} AS INT) AS tx",
        s"CAST(tile_idx DIV ${g.tilesX} AS INT) AS ty")
      .selectExpr(
        "tx", "ty",
        s"transform(sequence(0, ${px - 1}), i -> CAST(${landcover.formula(sGx, sGy)} AS BIGINT)) AS px_landcover",
        s"transform(sequence(0, ${px - 1}), i -> CAST(${tcd.formula(sGx, sGy)} AS BIGINT)) AS px_tcd")
      .withColumn("tile_id", expr("concat(CAST(44 - ty AS STRING), 'N_00', CAST(tx AS STRING), 'E')"))
    tiles.write.mode("overwrite").partitionBy("tile_id").parquet(dir)
  }

  /** Tile ids whose bbox intersects the AOI bbox — the pruning set. */
  def tileIdsForBbox(g: Grid, bxmin: Double, bymin: Double,
                     bxmax: Double, bymax: Double): Seq[String] =
    (for {
      tx <- 0 until g.tilesX
      ty <- 0 until g.tilesY
      lon0 = g.originLon + tx * g.tileDeg
      lat1 = g.originLat - ty * g.tileDeg // top edge
      if lon0 < bxmax && lon0 + g.tileDeg > bxmin &&
        lat1 - g.tileDeg < bymax && lat1 > bymin
    } yield s"${(g.originLat - ty * g.tileDeg).toInt}N_00${tx}E").toSeq

  /** AOI-pruned scan: `tile_id IN (...)` on the partition column. */
  def scanPruned(spark: SparkSession, dir: String, ids: Seq[String]): DataFrame =
    spark.read.parquet(dir).where(col("tile_id").isin(ids: _*))
}
