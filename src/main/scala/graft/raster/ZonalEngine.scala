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
  /** FROM-rewrite + compile against the catalog data environment
    * (shared by the single-AOI and batch paths). */
  private def compileFor(catalog: graft.catalog.Catalog, dataset: String,
                         userSql: String, overrides: Map[String, String])
      : (DataEnvironment, CompiledRasterQuery) = {
    // the environment is built FOR the queried dataset's grid
    // (`_get_data_environment(grid)`): layers on other grids are
    // absent, so cross-grid references fail layer resolution
    val gridSel = catalog.resolveVersions(Seq(dataset), overrides)(dataset)
      .flatMap(_.defaultAsset.filter(_.assetType == graft.catalog.AssetType.RasterTileSet))
      .map(a => DataEnvironment.gridOf(a.creationOptions))
    val env = DataEnvironment.cached(catalog, TileLake.defaultDir, overrides, gridSel)
    val default = env.defaultLayers.getOrElse(dataset,
      throw RasterSqlException(s"Dataset $dataset has no raster layers"))
    val sql = userSql.replaceAll("(?i)from \\w+",
      java.util.regex.Matcher.quoteReplacement(s"from $default"))
    (env, RasterSql.compile(sql, env))
  }

  /** OTF AOI size cap (`GEOSTORE_SIZE_LIMIT_OTF`,
    * `app/settings/globals.py:157-159` default 1e9 ha). */
  val GeostoreSizeLimitOtfHa: Double = 1e9

  private def requireAreal(gj: String): Geom = {
    val g = Geom.fromGeoJson(gj) match {
      case g @ (_: Polygon | _: MultiPolygon) => g
      case _ => throw ZonalException(
        "Geostore must be a Polygon or MultiPolygon for raster analysis")
    }
    if (Geom.areaHa(g) > GeostoreSizeLimitOtfHa)
      throw ZonalException("Geostore area exceeds limit of " +
        s"${GeostoreSizeLimitOtfHa.toLong} ha for raster analysis.")
    g
  }

  def runSql(spark: SparkSession, catalog: graft.catalog.Catalog,
             dataset: String, userSql: String, aoiGeoJson: String,
             overrides: Map[String, String] = Map.empty): DataFrame = {
    val geom = requireAreal(aoiGeoJson)
    val (env, cq) = compileFor(catalog, dataset, userSql, overrides)
    graft.functions.GraftFunctions.install(spark)
    TileLake.ensureLake(spark, env.lakeDir)
    val bb = geom.bbox
    val ids = TileLake.tileIdsForBbox(env.grid, bb._1, bb._2, bb._3, bb._4)
    val lake = TileLake.scanPruned(spark, env.lakeDir, ids)
    RasterSql.execute(lake, cq, aoiGeoJson, env)
  }

  /** Streaming twin of the batch pixel-listing path (`rs7`/`rs10`
    * shape): the same compiled listing query applied to a FILE STREAM
    * over the tile lake — new tile files (an alert drop landing in
    * the lake) emit their in-AOI pixel rows exactly once, in append
    * mode. Listing is stateless per tile, so each micro-batch runs
    * the identical fused [[PixelList]] pass with no streaming state;
    * the `tile_id` pruning filter applies to the file source exactly
    * as it does to the batch scan. Aggregating queries and
    * ORDER BY / LIMIT are rejected — no global order or final
    * aggregate exists on an unbounded stream (a windowed variant is
    * [[graft.streaming.AlertStream.windowedCounts]]'s territory). */
  def runSqlStream(spark: SparkSession, catalog: graft.catalog.Catalog,
                   dataset: String, userSql: String, aoiGeoJson: String,
                   overrides: Map[String, String] = Map.empty,
                   lakeDirOverride: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val geom = requireAreal(aoiGeoJson)
    val (env, cq) = compileFor(catalog, dataset, userSql, overrides)
    if (!cq.listing)
      throw RasterSqlException(
        "Streaming raster queries must be pixel listings (no aggregates)")
    if (cq.orderBy.nonEmpty || cq.limit.nonEmpty)
      throw RasterSqlException(
        "ORDER BY / LIMIT are not available on a streaming listing")
    graft.functions.GraftFunctions.install(spark)
    TileLake.ensureLake(spark, env.lakeDir)
    val bb = geom.bbox
    val ids = TileLake.tileIdsForBbox(env.grid, bb._1, bb._2, bb._3, bb._4)
    val schema = TileLake.scan(spark, env.lakeDir).schema
    val lake = spark.readStream.schema(schema)
      .parquet(lakeDirOverride.getOrElse(env.lakeDir))
      .where(col("tile_id").isin(ids: _*))
    RasterSql.execute(lake, cq, aoiGeoJson, env)
  }

  /** The batch form of the user-SQL raster path (`POST
    * /dataset/{d}/{v}/query/batch`, `queries.py:280-430`): the SAME
    * compiled query runs over every feature as ONE Spark job — a
    * broadcast AOI table bbox-joins the union-pruned tile scan, the
    * fused pass runs per (feature, tile) pair, and one shuffle groups
    * partials by (feature, key). The reference fans out ≤100
    * Step-Function lambdas for this. Output = `fid` + the query's
    * select list. */
  def runSqlBatch(spark: SparkSession, catalog: graft.catalog.Catalog,
                  dataset: String, userSql: String,
                  geoms: Seq[(String, String)],
                  overrides: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.functions._
    geoms.foreach { case (_, gj) => requireAreal(gj) }
    val (env, cq) = compileFor(catalog, dataset, userSql, overrides)
    val g = env.grid
    graft.functions.GraftFunctions.install(spark)
    TileLake.ensureLake(spark, env.lakeDir)
    val bbs = geoms.map { case (fid, gj) => (fid, gj, Geom.fromGeoJson(gj).bbox) }
    val ids = bbs.flatMap { case (_, _, bb) =>
      TileLake.tileIdsForBbox(g, bb._1, bb._2, bb._3, bb._4)
    }.distinct
    val lake = TileLake.scanPruned(spark, env.lakeDir, ids)
    import spark.implicits._
    val aois = bbs.map { case (fid, gj, bb) => (fid, gj, bb._1, bb._2, bb._3, bb._4) }
      .toDF("fid", "gj", "bxmin", "bymin", "bxmax", "bymax")
    RasterSql.executeBatch(tileBboxJoin(lake, aois, g), cq, env)
  }

  /** Broadcast bbox join of the AOI table against a (pruned) lake
    * scan — THE (feature, tile) pairing rule both batch paths share.
    * `aois` must carry `bxmin/bymin/bxmax/bymax` bbox columns. */
  private def tileBboxJoin(lake: DataFrame, aois: DataFrame,
                           g: Grid): DataFrame = {
    import org.apache.spark.sql.functions._
    lake.join(broadcast(aois),
      col("tx") * g.tileDeg + g.originLon < col("bxmax") &&
        col("tx") * g.tileDeg + g.originLon + g.tileDeg > col("bxmin") &&
        lit(g.originLat) - col("ty") * g.tileDeg - g.tileDeg < col("bymax") &&
        lit(g.originLat) - col("ty") * g.tileDeg > col("bymin"))
  }

  /** Whole-batch zonal statistics as ONE Spark job (the
    * `r7_batch_zonal` plan shape behind `/analysis/zonal/batch`):
    * the ≤100-feature AOI table broadcasts into a bbox join against
    * the union-pruned tile scan, each surviving (aoi, tile) pair runs
    * the fused [[ZonalPartial]] pass (AOI parse memoized per distinct
    * feature), and a single shuffle groups the per-tile partials by
    * `(fid, key)`. The reference fans out ≤100 Step-Function lambdas
    * here; a sequential per-feature driver loop (round 1's endpoint)
    * would serialize 100 Spark jobs — this is the plan that survives
    * 100× more features. */
  def runBatch(spark: SparkSession, catalog: graft.catalog.Catalog,
               geoms: Seq[String], tcdThreshold: Option[Int]): DataFrame = {
    import org.apache.spark.sql.functions._
    geoms.foreach { gj =>
      Geom.fromGeoJson(gj) match {
        case _: Polygon | _: MultiPolygon => ()
        case _ => throw ZonalException(
          "Geometry must be a Polygon or MultiPolygon for raster analysis")
      }
    }
    graft.functions.GraftFunctions.install(spark)
    val env = DataEnvironment.cached(catalog, TileLake.defaultDir)
    val g = env.grid
    TileLake.ensureLake(spark, env.lakeDir)

    val bbs = geoms.zipWithIndex.map { case (gj, fid) =>
      (fid, gj, Geom.fromGeoJson(gj).bbox)
    }
    // union of per-AOI pruning sets → one partition-pruned scan
    val ids = bbs.flatMap { case (_, _, bb) =>
      TileLake.tileIdsForBbox(g, bb._1, bb._2, bb._3, bb._4)
    }.distinct
    val lake = TileLake.scanPruned(spark, env.lakeDir, ids)
    import spark.implicits._
    val aois = bbs.map { case (fid, gj, bb) => (fid, gj, bb._1, bb._2, bb._3, bb._4) }
      .toDF("fid", "gj", "bxmin", "bymin", "bxmax", "bymax")
    val pairs = tileBboxJoin(lake, aois, g)

    val keyL = env.layers("landcover_raster__class")
    val tcdL = env.layers("umd_tree_cover_density_2000__threshold")
    val used = (keyL.srcBands ++ tcdThreshold.map(_ => tcdL.srcBands)
      .getOrElse(Set.empty)).toSeq.sorted
    val spec = ZonalSpec(g,
      keys = Seq(keyL.eval), keyStrides = Seq(1L),
      vals = Seq(env.layers("area__ha").eval),
      preds = tcdThreshold.map(t =>
        PixelPreds.Ge(tcdL.eval, t.toDouble)).toSeq,
      usedBands = used, nBands = env.bands.length)
    import org.apache.spark.sql.graft.ColumnBridge
    val zp = ColumnBridge.column(ZonalPartial(spec,
      (col("gj") +: col("tx") +: col("ty") +: used.map(i => col(env.bands(i))))
        .map(ColumnBridge.expression)))
    val decode = SyntheticEnv.landcoverDecodeSql("k")
    pairs.select(col("fid"), explode(zp).as("p"))
      .select(col("fid"), col("p.k").as("k"), col("p.c").as("pc"),
        element_at(col("p.ss"), 1).as("s0"))
      .groupBy("fid", "k")
      .agg(sum("pc").as("pixel_count"), sum("s0").as("s0"))
      .selectExpr("fid", "k AS landcover", s"$decode AS landcover_name",
        "CAST(s0 AS DOUBLE) / 1000000.0 AS area_ha", "pixel_count")
      .orderBy("fid", "landcover")
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

    val aoiMask =
      s"tile_mask('${req.aoiGeoJson.replace("'", "''")}', tx, ty, " +
        s"${g.originLon}, ${g.originLat}, ${g.tilesX}, ${g.tilesY}, " +
        s"${g.tileDeg}, ${g.pxPerTile})"
    val maskE = req.tcdThreshold match {
      case Some(t) => s"arr_and($aoiMask, arr_ge(px_tcd, $t))"
      case None => aoiMask
    }
    val decode = SyntheticEnv.landcoverDecodeSql("p.k")

    spark.sql(
      s"""WITH arrs AS (SELECT px_landcover AS keys,
         |  grid_arr('microha', ty, ${g.originLat}, ${g.tileDeg}, ${g.pxPerTile}) AS vals,
         |  $maskE AS mask
         | FROM zonal_scan),
         |parts AS (SELECT explode(tile_zonal(keys, vals, mask)) AS p FROM arrs)
         |SELECT p.k AS landcover, $decode AS landcover_name,
         |  CAST(sum(p.s) AS DOUBLE) / 1000000.0 AS area_ha,
         |  sum(p.c) AS pixel_count
         |FROM parts GROUP BY p.k ORDER BY p.k""".stripMargin)
  }
}
