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

  /** Canonical on-disk location of the synthetic test lake (one
    * writer, many readers; versioned name so schema changes never
    * collide with a stale `_SUCCESS` from an earlier run). */
  def defaultDir: String = s"${sys.props("java.io.tmpdir")}/graft_tile_lake_v2"

  /** Lake band columns, in [[DataEnvironment]] band-index order. */
  val bandColumns: Seq[String] = Seq(
    "px_landcover", "px_tcd", "px_dateconf", "px_biomass10", "px_u", "px_w")

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
    // Tile METADATA (id, tx, ty) is driver-side — it is the partition
    // directory listing, tiny even on planet-scale grids (~10⁴ tiles);
    // pixel arrays are computed distributed, per tile row. Ids come
    // from the one canonical formatter, Grid.tileId.
    import spark.implicits._
    val tileMeta = (0 until g.nTiles).map { i =>
      val tx = i % g.tilesX; val ty = i / g.tilesX
      (g.tileId(tx, ty), tx, ty)
    }
    val tiles = tileMeta.toDF("tile_id", "tx", "ty")
      .repartition(math.min(g.nTiles, 32))
      .selectExpr(Seq("tile_id", "tx", "ty") ++
        Seq(landcover, tcd, dateConf, biomass10, bandU, bandW)
          .zip(bandColumns).map { case (layer, colName) =>
            s"transform(sequence(0, ${px - 1}), i -> CAST(${layer.formula(sGx, sGy)} AS BIGINT)) AS $colName"
          }: _*)
    tiles.write.mode("overwrite").partitionBy("tile_id").parquet(dir)
  }

  /** Tile ids whose bbox intersects the AOI bbox — the pruning set.
    * Uses the canonical [[Grid.tileId]] formatter (`%02d`/`%03d` +
    * N/S/E/W), matching what [[ensureWritten]] partitions by. */
  def tileIdsForBbox(g: Grid, bxmin: Double, bymin: Double,
                     bxmax: Double, bymax: Double): Seq[String] =
    (for {
      tx <- 0 until g.tilesX
      ty <- 0 until g.tilesY
      lon0 = g.originLon + tx * g.tileDeg
      lat1 = g.originLat - ty * g.tileDeg // top edge
      if lon0 < bxmax && lon0 + g.tileDeg > bxmin &&
        lat1 - g.tileDeg < bymax && lat1 > bymin
    } yield g.tileId(tx, ty)).toSeq

  /** AOI-pruned scan: `tile_id IN (...)` on the partition column. */
  def scanPruned(spark: SparkSession, dir: String, ids: Seq[String]): DataFrame =
    spark.read.parquet(dir).where(col("tile_id").isin(ids: _*))
}
