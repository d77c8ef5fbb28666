package graft.raster

import graft.geo.{Geom, MultiPolygon, Polygon}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Programmatic zonal-statistics entry point — the engine behind the
  * `/analysis/zonal` route (SURVEY §3.2): resolve the data
  * environment, prune tiles to the AOI bbox, mask, partial-aggregate,
  * merge, decode. Serves the synthetic data environment (the test
  * lake); the tile source is the persisted [[TileLake]], so the tile
  * pruning is real partition pruning.
  */
object ZonalEngine {

  /** Mirrors the reference's zonal request (`analysis.py:95-108`). */
  final case class Request(
      aoiGeoJson: String,
      groupBy: Seq[String] = Seq("landcover"),
      sumArea: Boolean = true,
      tcdThreshold: Option[Int] = None)

  /** 400-equivalent validation errors (reference error strings). */
  final case class ZonalException(detail: String) extends RuntimeException(detail)

  def run(spark: SparkSession, req: Request): DataFrame = {
    // Polygon/MultiPolygon only (analysis.py:104-107)
    Geom.fromGeoJson(req.aoiGeoJson) match {
      case _: Polygon | _: MultiPolygon => ()
      case _ => throw ZonalException(
        "Geometry must be a Polygon or MultiPolygon for raster analysis")
    }
    val unknown = req.groupBy.filterNot(_ == "landcover")
    if (unknown.nonEmpty)
      throw ZonalException(s"Unknown raster layers: ${unknown.mkString(", ")}")

    import SyntheticEnv._
    val g = grid
    graft.functions.GraftFunctions.install(spark)
    val dir = TileLake.defaultDir
    TileLake.ensureWritten(spark, dir)

    val bb = Geom.fromGeoJson(req.aoiGeoJson).bbox
    val ids = TileLake.tileIdsForBbox(g, bb._1, bb._2, bb._3, bb._4)
    TileLake.scanPruned(spark, dir, ids).createOrReplaceTempView("zonal_scan")

    val px = g.pxPerTile * g.pxPerTile
    val sGx = s"(tx * ${g.pxPerTile} + i % ${g.pxPerTile})"
    val sGy = s"(ty * ${g.pxPerTile} + i DIV ${g.pxPerTile})"
    val aoiMask =
      s"st_intersects(st_point(${g.lonCenterSql(sGx)}, ${g.latCenterSql(sGy)}), " +
        s"st_geomfromgeojson('${req.aoiGeoJson.replace("'", "''")}'))"
    val maskE = req.tcdThreshold match {
      case Some(t) => s"($aoiMask) AND (element_at(px_tcd, i + 1) >= $t)"
      case None => aoiMask
    }
    val decode = "CASE " + landcoverTable.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN p.k = $k THEN '$v'" }.mkString(" ") +
      " ELSE 'unknown' END"

    spark.sql(
      s"""WITH arrs AS (SELECT px_landcover AS keys,
         |  transform(sequence(0, ${px - 1}), i -> ${g.microHaSql(sGy)}) AS vals,
         |  transform(sequence(0, ${px - 1}), i -> $maskE) AS mask
         | FROM zonal_scan),
         |parts AS (SELECT explode(tile_zonal(keys, vals, mask)) AS p FROM arrs)
         |SELECT p.k AS landcover, $decode AS landcover_name,
         |  CAST(sum(p.s) AS DOUBLE) / 1000000.0 AS area_ha,
         |  sum(p.c) AS pixel_count
         |FROM parts GROUP BY p.k ORDER BY p.k""".stripMargin)
  }
}
