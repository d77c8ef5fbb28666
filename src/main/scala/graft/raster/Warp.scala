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

  /** One 4326 lake tile → a web-mercator [[GeoTiff.Raster]] covering
    * the same bbox. Tiles above ±85.05° (outside the mercator square)
    * are rejected. */
  def tileToWebMercator(t: GeoTiff.Tile): GeoTiff.Raster = {
    val latTop = t.originLat
    val latBot = t.originLat - t.height * t.pixelDeg
    require(latTop <= 85.06 && latBot >= -85.06,
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
