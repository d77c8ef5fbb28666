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

  /** The user-SQL raster path (`_query_raster`, `queries.py:548-575`):
    * validate the AOI, resolve the data environment from the catalog
    * (latest-unless-overridden), FROM-rewrite the user's SQL to the
    * dataset's default layer (the reference's exact
    * `re.sub("from \w+", ...)` splice), compile through [[RasterSql]],
    * and run one fused pass over the AOI-pruned lake. */
  def runSql(spark: SparkSession, catalog: graft.catalog.Catalog,
             dataset: String, userSql: String, aoiGeoJson: String,
             overrides: Map[String, String] = Map.empty): DataFrame = {
    val geom = Geom.fromGeoJson(aoiGeoJson)
    geom match {
      case _: Polygon | _: MultiPolygon => ()
      case _ => throw ZonalException(
        "Geostore must be a Polygon or MultiPolygon for raster analysis")
    }
    val env = DataEnvironment.cached(catalog, TileLake.defaultDir, overrides)
    val default = env.defaultLayers.getOrElse(dataset,
      throw RasterSqlException(s"Dataset $dataset has no raster layers"))
    val sql = userSql.replaceAll("(?i)from \\w+",
      java.util.regex.Matcher.quoteReplacement(s"from $default"))
    val cq = RasterSql.compile(sql, env)
    graft.functions.GraftFunctions.install(spark)
    TileLake.ensureWritten(spark, env.lakeDir)
    val bb = geom.bbox
    val ids = TileLake.tileIdsForBbox(env.grid, bb._1, bb._2, bb._3, bb._4)
    val lake = TileLake.scanPruned(spark, env.lakeDir, ids)
    RasterSql.execute(lake, cq, aoiGeoJson, env)
  }

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
    val sGy = s"(ty * ${g.pxPerTile} + i DIV ${g.pxPerTile})"
    val aoiMask =
      s"tile_mask('${req.aoiGeoJson.replace("'", "''")}', tx, ty, " +
        s"${g.originLon}, ${g.originLat}, ${g.tilesX}, ${g.tilesY}, " +
        s"${g.tileDeg}, ${g.pxPerTile})"
    val maskE = req.tcdThreshold match {
      case Some(t) =>
        s"zip_with($aoiMask, transform(px_tcd, v -> v >= $t), (m, c) -> m AND c)"
      case None => aoiMask
    }
    val decode = "CASE " + landcoverTable.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN p.k = $k THEN '$v'" }.mkString(" ") +
      " ELSE 'unknown' END"

    spark.sql(
      s"""WITH arrs AS (SELECT px_landcover AS keys,
         |  transform(sequence(0, ${px - 1}), i -> ${g.microHaSql(sGy)}) AS vals,
         |  $maskE AS mask
         | FROM zonal_scan),
         |parts AS (SELECT explode(tile_zonal(keys, vals, mask)) AS p FROM arrs)
         |SELECT p.k AS landcover, $decode AS landcover_name,
         |  CAST(sum(p.s) AS DOUBLE) / 1000000.0 AS area_ha,
         |  sum(p.c) AS pixel_count
         |FROM parts GROUP BY p.k ORDER BY p.k""".stripMargin)
  }
}
