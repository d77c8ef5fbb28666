package graft.raster

import graft.geo.Geom

/** Reprojection of lake tiles between the catalog grid (EPSG:4326)
  * and web mercator (EPSG:3857) — the CRS of the reference's raster
  * tile caches (`app/models/enum/assets.py` RasterTileCache; GDAL
  * warps with `-t_srs EPSG:3857` in the tile-cache pipeline). Nearest
  * neighbor, matching the reference's default resampling for
  * categorical pixels.
  *
  * Geometry of the warp: spherical-mercator x is linear in longitude,
  * so columns map 1:1 and only rows resample; the output keeps the
  * source's pixel count with the y scale stretched to the tile's
  * mercator height (an anisotropic but axis-aligned grid — exactly
  * what `ModelPixelScale` expresses).
  */
object Warp {

  /** A lattice of square web-mercator source tiles and its derived
    * geographic (EPSG:4326) target grid — the `unify_projection`
    * ingest warp (`creation_options.py:118-124`: "First re-project to
    * a common projection (EPSG:4326)"; pixETL's warp step). The
    * column mapping is EXACT: mercator x is linear in longitude, so
    * target pixelDeg = pixelM expressed in degrees makes target
    * column c ≡ source column c; only rows resample (nearest
    * neighbor), and the monotone row map lets each source row-band
    * compute exactly the target rows it owns — the warp is
    * embarrassingly parallel over source tiles with ONE shuffle to
    * assemble target tiles. */
  final case class MercatorLattice(x0: Double, yTop: Double, pixelM: Double,
                                   tilesX: Int, tilesY: Int, pxPerTile: Int) {
    def latOfY(y: Double): Double = Math.toDegrees(
      2.0 * Math.atan(Math.exp(y / Geom.WebMercatorR)) - Math.PI / 2.0)
    val pixelDeg: Double = Math.toDegrees(pixelM / Geom.WebMercatorR)
    val originLon: Double = Math.toDegrees(x0 / Geom.WebMercatorR)
    val originLat: Double = latOfY(yTop)
    private val srcRows = tilesY * pxPerTile
    val yBot: Double = yTop - srcRows * pixelM
    val latBot: Double = latOfY(yBot)
    /** Target rows covering the source's latitude span. Always ≥ the
      * source row count (mercator stretches y away from the equator,
      * so pixelDeg covers ≤ one source row of latitude). */
    val targetRows: Int =
      math.max(1, math.ceil((originLat - latBot) / pixelDeg - 1e-9).toInt)
    val tilesYTarget: Int = (targetRows + pxPerTile - 1) / pxPerTile
    /** Source GLOBAL row sampled by target global row `gr`, or -1
      * when the target row center falls outside the source y span. */
    def srcRowOf(gr: Int): Int = {
      val lat = originLat - (gr + 0.5) * pixelDeg
      val y = Geom.toWebMercatorY(lat)
      if (y > yTop || y <= yBot) -1
      else math.min(srcRows - 1, ((yTop - y) / pixelM).toInt)
    }
    /** The target global rows drawing from source tile row-band `ty`
      * — contiguous because the row map is monotone. */
    def targetRowsOf(ty: Int): Seq[Int] = {
      val latHi = latOfY(yTop - ty.toLong * pxPerTile * pixelM)
      val latLo = latOfY(yTop - (ty + 1).toLong * pxPerTile * pixelM)
      val lo = math.max(0, ((originLat - latHi) / pixelDeg - 1.0).toInt)
      val hi = math.min(targetRows - 1, ((originLat - latLo) / pixelDeg + 1.0).toInt)
      (lo to hi).filter { gr =>
        val sr = srcRowOf(gr)
        sr >= 0 && sr / pxPerTile == ty
      }
    }
  }

  /** One 4326 lake tile → a web-mercator [[GeoTiff.Raster]] covering
    * the same bbox. Tiles above ±85.05° (outside the mercator square)
    * are rejected. */
  /** Exact top edge of the web-mercator square: the latitude whose
    * mercator y equals the half-circumference (x of the ±180 edge),
    * ≈ 85.05113°. */
  val WebMercatorMaxLat: Double =
    Math.toDegrees(2.0 * Math.atan(Math.exp(Math.PI)) - Math.PI / 2.0)

  def tileToWebMercator(t: GeoTiff.Tile): GeoTiff.Raster = {
    val latTop = t.originLat
    val latBot = t.originLat - t.height * t.pixelDeg
    require(latTop <= WebMercatorMaxLat && latBot >= -WebMercatorMaxLat,
      f"tile spans latitudes [$latBot%.2f, $latTop%.2f] outside the web-mercator square")
    val x0 = Geom.toWebMercatorX(t.originLon)
    val x1 = Geom.toWebMercatorX(t.originLon + t.width * t.pixelDeg)
    val yTop = Geom.toWebMercatorY(latTop)
    val yBot = Geom.toWebMercatorY(latBot)
    val scaleX = (x1 - x0) / t.width
    val scaleY = (yTop - yBot) / t.height
    val out = new Array[Double](t.width * t.height)
    var row = 0
    while (row < t.height) {
      // output row center in mercator → latitude → nearest source row
      val y = yTop - (row + 0.5) * scaleY
      val lat = Math.toDegrees(
        2.0 * Math.atan(Math.exp(y / Geom.WebMercatorR)) - Math.PI / 2.0)
      val srcRow = math.min(t.height - 1,
        math.max(0, ((latTop - lat) / t.pixelDeg).toInt))
      var col = 0
      while (col < t.width) {
        out(row * t.width + col) = t.pixels(srcRow * t.width + col).toDouble
        col += 1
      }
      row += 1
    }
    GeoTiff.Raster(t.width, t.height, x0, yTop, scaleX, 3857,
      GeoTiff.SampleType.Int32, Seq(out), pixelScaleYOpt = scaleY)
  }
}
