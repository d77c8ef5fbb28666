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

  /** Exact top edge of the web-mercator square: the latitude whose
    * mercator y equals the half-circumference (x of the ±180 edge),
    * ≈ 85.05113°. */
  val WebMercatorMaxLat: Double =
    Math.toDegrees(2.0 * Math.atan(Math.exp(Math.PI)) - Math.PI / 2.0)

  /** One 4326 lake tile → a web-mercator [[GeoTiff.Raster]] covering
    * the same bbox. Tiles outside the mercator square are rejected. */
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

  /** A projected CRS the general ingest warp can resample from:
    * closed-form forward/inverse on the WGS84 ellipsoid plus a DuckDB
    * SQL mirror of the forward, so the correctness oracle can replay
    * the identical projection arithmetic. Every implementation
    * documents the same parity contract: value agreement to ~1e-9 m
    * (libm last-ulp), which cannot flip a 10⁴-meter pixel floor for
    * centers in general position. */
  sealed trait Projection extends Serializable {
    /** (latDeg, lonDeg) → (easting, northing) in meters. */
    def forward(latDeg: Double, lonDeg: Double): (Double, Double)
    /** (easting, northing) → (latDeg, lonDeg). */
    def inverse(x: Double, y: Double): (Double, Double)
    /** SELECT-list fragments deriving the forward's intermediates
      * from double columns `$lat`/`$lon`. */
    def forwardSelect(lat: String, lon: String): String
    /** The easting expression over [[forwardSelect]]'s columns. */
    def xSql: String
    /** The northing expression over [[forwardSelect]]'s columns. */
    def ySql: String
    /** Projected-plane points where the lat/lon graticule is singular
      * — the pole of an azimuthal projection, as `(x, y, latDeg)`.
      * A lattice whose rectangle CONTAINS one has its latitude
      * extreme in the interior (edge sampling cannot see it) and
      * covers every longitude; [[ProjectedLattice]] branches on this.
      * Cylindrical/conic/pseudocylindrical families map the poles to
      * lattice edges or infinity, so the default is none. */
    def planeSingularities: Seq[(Double, Double, Double)] = Nil
  }

  /** The projection of a supported projected-CRS EPSG code: UTM zones
    * (326xx/327xx) and the EASE-Grid 2.0 equal-area CRS (6933). */
  def projectionFor(epsg: Int): Option[Projection] =
    projectionFor(epsg, Map.empty)

  /** Names a RECOGNIZED-but-unsupported projection family, so the
    * rejection a user sees states WHICH family their file is in and
    * WHY it is out of scope — instead of the generic reproject-first
    * hint. These are the documented-out residue of the projection
    * program (the reference warps them by shelling to GDAL/proj,
    * `batch/scripts/unify_projection.sh:13-40`): series-expansion /
    * complex-polynomial families with no closed form at oracle
    * precision. Everything with a published closed or tabular form
    * resolves through [[projectionFor]]. */
  def unsupportedFamily(epsg: Int, geoParams: Map[Int, Double]): Option[String] =
    if (epsg == 27200)
      Some("EPSG:27200 New Zealand Map Grid: a fixed complex-polynomial " +
        "projection (no closed inverse at oracle precision)")
    else geoParams.get(3075).map(_.toInt) match {
      case Some(3) =>
        Some("CT 3 Oblique Mercator: rectified-skew series family")
      case Some(18) =>
        Some("CT 18 Cassini-Soldner: meridian-arc series-expansion family")
      case _ => None
    }

  /** CRS resolution the way `unify_projection.sh` resolves one with
    * GDAL/proj: by EPSG code when the code is known, otherwise from
    * the file's own projection PARAMETERS. A user-defined
    * ProjectedCSType (32767) with coordinate-transformation geokeys
    * (key 3075) builds the projection from the parameter keys —
    * CT 11 Albers equal-area, CT 8 Lambert conformal 2SP, CT 15
    * polar stereographic, CT 24 sinusoidal; an EPSG code that IS a
    * parameterized family (5070/102003-style conic codes are not
    * closed-form enumerable) must ship its keys. */
  def projectionFor(epsg: Int, geoParams: Map[Int, Double]): Option[Projection] =
    if (TransverseMercator.isUtm(epsg)) Some(TransverseMercator.utm(epsg))
    else if (epsg == 6933) Some(CylindricalEqualArea.ease2)
    // conic codes whose EPSG parameter sets are public registry
    // entries — resolved through the same parameter constructors the
    // geokey path uses (GRS80 vs WGS84 flattening differs below the
    // mm level, the usual GIS-practice equivalence)
    else if (epsg == 5070 || epsg == 5071) // NAD83 / CONUS Albers
      Some(AlbersEqualArea(29.5, 45.5, 23.0, -96.0, 0.0, 0.0))
    else if (epsg == 3347) // NAD83 / Statistics Canada Lambert
      Some(LambertConformalConic(49.0, 77.0, 63.390675, -91.866667,
        6200000.0, 3000000.0))
    else if (epsg == 3413) // WGS84 / NSIDC Sea Ice Polar Stereo North
      Some(PolarStereographic(70.0, -45.0, 0.0, 0.0))
    else if (epsg == 3976) // WGS84 / NSIDC Sea Ice Polar Stereo South
      Some(PolarStereographic(-70.0, 0.0, 0.0, 0.0))
    else if (epsg == 3031) // WGS84 / Antarctic Polar Stereographic
      Some(PolarStereographic(-71.0, 0.0, 0.0, 0.0))
    else if (epsg == 3395) // WGS84 / World Mercator (ellipsoidal)
      Some(MercatorEllipsoidal(0.0, 0.0, 0.0, 0.0))
    else if (epsg == 32662 || epsg == 4087) // WGS84 / Plate Carrée
      Some(Equirectangular(0.0, 0.0, 0.0, 0.0))
    else if (epsg == 54009) // ESRI World Mollweide (global equal-area)
      Some(Mollweide.world)
    else if (epsg == 54012) // ESRI World Eckert IV (global equal-area)
      Some(EckertIV.world)
    else if (epsg == 54030) // ESRI World Robinson (compromise world)
      Some(Robinson.world)
    else if (epsg == 54042) // ESRI World Winkel Tripel (NatGeo world)
      Some(WinkelTripel.world)
    else if (epsg == 54003) // ESRI World Miller Cylindrical
      Some(MillerCylindrical.world)
    else if (epsg == 54032) // ESRI World Azimuthal Equidistant
      Some(AzimuthalEquidistant.world)
    else if (epsg == 54029) // ESRI World Van der Grinten I
      Some(VanDerGrinten.world)
    else if (epsg == 54021) // ESRI World Polyconic
      Some(Polyconic.world)
    else if (epsg == 5880) // SIRGAS 2000 / Brazil Polyconic
      Some(Polyconic.brazil)
    else if (epsg == 3035) // ETRS89-extended / LAEA Europe
      Some(LambertAzimuthalEqualArea.laeaEurope)
    else if (epsg == 6931) // WGS84 / EASE-Grid 2.0 North
      Some(LambertAzimuthalEqualArea.ease2North)
    else if (epsg == 6932) // WGS84 / EASE-Grid 2.0 South
      Some(LambertAzimuthalEqualArea.ease2South)
    else if (epsg == 28992) // Amersfoort / RD New (double stereographic)
      // the registry code implies the Amersfoort DATUM, so the
      // closed-form resolution composes the towgs84 shift the way
      // proj does implicitly (unify_projection.sh:13-40) — a Bessel
      // raster lands ON the WGS84 grid, not ~100 m off it
      Some(DatumShifted(ObliqueStereographic.rdNew, Helmert7.amersfoort,
        ObliqueStereographic.BesselA, ObliqueStereographic.BesselE2))
    else {
      val base = geoParams.get(3075).map(_.toInt) match {
        case Some(7) => Some(MercatorEllipsoidal.fromGeoKeys(geoParams))
        case Some(11) => Some(AlbersEqualArea.fromGeoKeys(geoParams))
        case Some(8) => Some(LambertConformalConic.fromGeoKeys(geoParams))
        case Some(9) => Some(LambertConformalConic.fromGeoKeys1SP(geoParams))
        case Some(10) => Some(LambertAzimuthalEqualArea.fromGeoKeys(geoParams))
        case Some(14) | Some(16) => // Stereographic / ObliqueStereographic
          Some(ObliqueStereographic.fromGeoKeys(geoParams))
        case Some(15) => Some(PolarStereographic.fromGeoKeys(geoParams))
        case Some(17) => Some(Equirectangular.fromGeoKeys(geoParams))
        case Some(12) => Some(AzimuthalEquidistant.fromGeoKeys(geoParams))
        case Some(20) => Some(MillerCylindrical.fromGeoKeys(geoParams))
        case Some(23) => Some(Robinson.fromGeoKeys(geoParams))
        case Some(24) => Some(Sinusoidal.fromGeoKeys(geoParams))
        case Some(25) => Some(VanDerGrinten.fromGeoKeys(geoParams))
        case Some(22) => Some(Polyconic.fromGeoKeys(geoParams))
        case Some(28) => Some(CylindricalEqualArea.fromGeoKeys(geoParams))
        case _ => None
      }
      // a GeogTOWGS84GeoKey (2062) riding along composes the datum
      // shift over whatever family the transform keys built; the
      // source figure comes from 2057/2059 exactly as the projection
      // constructors take it (WGS84 absent)
      (base, towgs84Of(geoParams)) match {
        case (Some(b), Some(h)) =>
          val srcA = geoParams.getOrElse(2057, TransverseMercator.A)
          val srcE2 = geoParams.get(2059)
            .map { invF => val f = 1.0 / invF; f * (2.0 - f) }
            .getOrElse(TransverseMercator.E2)
          Some(DatumShifted(b, h, srcA, srcE2))
        case _ => base
      }
    }

  /** The Helmert set carried in GeogTOWGS84GeoKey (2062), surfaced by
    * the GeoTIFF reader as synthetic keys [[GeoTiff.Towgs84Base]]+i
    * (3 translations, or the full 7-parameter position vector). An
    * all-zero set is the identity — no wrap. */
  private def towgs84Of(p: Map[Int, Double]): Option[Helmert7] =
    if (!p.contains(GeoTiff.Towgs84Base)) None
    else {
      def v(i: Int): Double = p.getOrElse(GeoTiff.Towgs84Base + i, 0.0)
      val h = Helmert7(v(0), v(1), v(2), v(3), v(4), v(5), v(6))
      if (h.isIdentity) None else Some(h)
    }

  /** The fully GENERAL projected-CRS → EPSG:4326 ingest warp (the
    * path `unify_projection.sh` covers with gdalwarp): a lattice of
    * square source tiles in projected meters and its derived
    * geographic target grid. Unlike [[MercatorLattice]] (which
    * exploits x-linearity in longitude), every target pixel center
    * FORWARD-projects into the source plane and samples its nearest
    * source pixel — the target-driven nearest-neighbor resample.
    * Distribution shape: each source tile emits one sparse
    * contribution per overlapping target tile (the only shuffle is
    * target-tile assembly, volume = data); ownership of a projected
    * point is the global source-pixel floor, so contributions are
    * exclusive by construction. */
  final case class ProjectedLattice(proj: Projection,
                                    x0: Double, yTop: Double, pixelM: Double,
                                    tilesX: Int, tilesY: Int, pxPerTile: Int) {
    val pxX: Int = tilesX * pxPerTile
    val pxY: Int = tilesY * pxPerTile
    val xRight: Double = x0 + pxX * pixelM
    val yBot: Double = yTop - pxY * pixelM
    /** Target resolution: the source pixel size expressed in equator
      * degrees (one scalar rule, like the mercator path's). */
    val pixelDeg: Double = Math.toDegrees(pixelM / TransverseMercator.A)

    // target bbox: inverse-project a dense boundary sampling, pad a px
    private val boundary: Seq[(Double, Double)] = {
      val n = 64
      (0 to n).flatMap { i =>
        val fx = x0 + (xRight - x0) * i / n
        val fy = yTop - (yTop - yBot) * i / n
        Seq((fx, yTop), (fx, yBot), (x0, fy), (xRight, fy))
      }.map { case (x, y) => proj.inverse(x, y) }
    }
    /** Latitudes of graticule singularities (azimuthal poles) INSIDE
      * the lattice rectangle: their latitude extreme is interior —
      * edge sampling cannot see it — and they force full-longitude
      * coverage (every meridian passes through the pole). */
    private val polesInside: Seq[Double] = proj.planeSingularities.collect {
      case (sx, sy, latDeg)
        if sx >= x0 && sx <= xRight && sy >= yBot && sy <= yTop => latDeg
    }
    /** True when an azimuthal pole is inside the lattice: the target
      * grid snaps to full longitude and the ragged last tile column
      * past +180° is suppressed as duplicate geography (the oracle
      * replays the same rule). */
    val wrapped: Boolean = polesInside.nonEmpty
    val originLon: Double =
      if (wrapped) -180.0 else boundary.map(_._2).min - pixelDeg
    // the pole itself caps the pad: centers past ±90° have no latitude
    val originLat: Double =
      if (polesInside.exists(_ > 0)) 90.0
      else boundary.map(_._1).max + pixelDeg
    private val lonMax =
      if (wrapped) 180.0 else boundary.map(_._2).max + pixelDeg
    private val latMin =
      if (polesInside.exists(_ < 0)) -90.0
      else boundary.map(_._1).min - pixelDeg
    val tilesXTarget: Int = math.max(1,
      math.ceil((lonMax - originLon) / (pxPerTile * pixelDeg)).toInt)
    val tilesYTarget: Int = math.max(1,
      math.ceil((originLat - latMin) / (pxPerTile * pixelDeg)).toInt)

    /** Candidate target tiles of source tile (stx, sty): lon/lat bbox
      * from a 5×5 inverse-projected sample grid over the tile
      * rectangle EXPANDED by `padM` meters (the bilinear stencil
      * reaches one source pixel beyond the tile — padM = pixelM
      * covers that overhang in projected space, where it is exact
      * regardless of distortion), padded angularly by 2 px PLUS one
      * source pixel's local angular extent (estimated from the
      * adjacent-sample gaps: near a pole one meter of northing spans
      * many equator-pixelDeg of latitude, so a fixed pad is
      * structurally too small there). The candidates are only a
      * prefilter — the exact forward test decides membership. A
      * source tile CONTAINING an azimuthal pole has its latitude
      * extreme (and every longitude) interior to it — the
      * sample-based range would silently exclude the polar cap's
      * target rows, so it widens to the full grid edge. */
    private def candidateTargets(stx: Int, sty: Int,
                                 padM: Double = 0.0): Seq[(Int, Int)] = {
      val span = pxPerTile * pixelM
      val tx0 = x0 + stx * span - padM
      val ty0 = yTop - sty * span + padM
      val sampleSpan = span + 2 * padM
      val pts = for (i <- 0 to 4; j <- 0 to 4)
        yield proj.inverse(tx0 + sampleSpan * i / 4.0, ty0 - sampleSpan * j / 4.0)
      // one source pixel's local angular extent ≈ the max adjacent-
      // sample gap (pxPerTile/4 source pixels apart) scaled down
      def gap(sel: ((Double, Double)) => Double): Double = {
        var m = 0.0
        for (i <- 0 to 4; j <- 0 to 4) {
          val p = sel(pts(i * 5 + j))
          if (j < 4) m = math.max(m, math.abs(sel(pts(i * 5 + j + 1)) - p))
          if (i < 4) m = math.max(m, math.abs(sel(pts((i + 1) * 5 + j)) - p))
        }
        m * 4.0 / pxPerTile
      }
      val padLon = 2 * pixelDeg + 2 * gap(_._2)
      val padLat = 2 * pixelDeg + 2 * gap(_._1)
      val tdeg = pxPerTile * pixelDeg
      val tilePole: Option[Double] = proj.planeSingularities.collectFirst {
        case (sx, sy, latDeg)
          if sx >= tx0 && sx <= tx0 + sampleSpan &&
            sy <= ty0 && sy >= ty0 - sampleSpan => latDeg
      }
      val ttxLo = if (tilePole.isDefined) 0 else math.max(0,
        ((pts.map(_._2).min - padLon - originLon) / tdeg).toInt)
      val ttxHi = if (tilePole.isDefined) tilesXTarget - 1 else math.min(tilesXTarget - 1,
        ((pts.map(_._2).max + padLon - originLon) / tdeg).toInt)
      val ttyLo = if (tilePole.exists(_ > 0)) 0 else math.max(0,
        ((originLat - (pts.map(_._1).max + padLat)) / tdeg).toInt)
      val ttyHi = if (tilePole.exists(_ < 0)) tilesYTarget - 1 else math.min(tilesYTarget - 1,
        ((originLat - (pts.map(_._1).min - padLat)) / tdeg).toInt)
      for (ttx <- ttxLo to ttxHi; tty <- ttyLo to ttyHi) yield (ttx, tty)
    }

    /** Sparse contributions of source tile (stx, sty) to each target
      * tile it overlaps: (target tile, (pixel indexes, per-band
      * values)). Pixel-center geometry MUST stay
      * `origin ± (global + 0.5) × pixelDeg` — the oracle replays the
      * identical arithmetic. */
    def contributionsOf(stx: Int, sty: Int, bands: Seq[Array[Double]])
        : Iterator[((Int, Int), (Array[Int], Seq[Array[Double]]))] = {
      candidateTargets(stx, sty)
        .iterator.flatMap { case (ttx, tty) =>
          val idxs = Array.newBuilder[Int]
          val vals = Seq.fill(bands.length)(Array.newBuilder[Double])
          var cy = 0
          while (cy < pxPerTile) {
            val lat = originLat - (tty * pxPerTile + cy + 0.5) * pixelDeg
            var cx = 0
            while (cx < pxPerTile && lat <= 90.0 && lat >= -90.0) {
              val lon = originLon + (ttx * pxPerTile + cx + 0.5) * pixelDeg
              // in the wrapped (pole-inside) case the ragged last tile
              // column can pass +180°, which is the same geography as
              // the −180° column — emitting both would duplicate it
              if (wrapped && lon >= 180.0) { cx = pxPerTile }
              else {
              val (x, y) = proj.forward(lat, lon)
              val sgx = Math.floor((x - x0) / pixelM).toInt
              val sgy = Math.floor((yTop - y) / pixelM).toInt
              if (sgx >= 0 && sgy >= 0 &&
                sgx / pxPerTile == stx && sgy / pxPerTile == sty) {
                val li = (sgy - sty * pxPerTile) * pxPerTile + (sgx - stx * pxPerTile)
                idxs += cy * pxPerTile + cx
                var b = 0
                while (b < bands.length) { vals(b) += bands(b)(li); b += 1 }
              }
              cx += 1
              }
            }
            cy += 1
          }
          val ia = idxs.result()
          if (ia.isEmpty) Iterator.empty
          else Iterator(((ttx, tty), (ia, vals.map(_.result()))))
        }
    }

    /** BILINEAR contributions of source tile (stx, sty) — the
      * continuous-data resample of the reference's ResamplingMethod
      * enum (`app/models/enum/pixetl.py:75-88`; gdalwarp
      * `-r bilinear`). Where the nearest-neighbor path claims each
      * target pixel EXCLUSIVELY, bilinear is ADDITIVE: a target
      * pixel's 2×2 stencil can straddle source tiles, so each tile
      * emits partial `(Σ w·v, Σ w)` sums for its own stencil
      * neighbors and the assembly divides after summing across tiles.
      * Determinism contract: the assembly MUST fold the per-tile
      * partials in `tileKey` order (the key is `sty·tilesX + stx`,
      * returned per contribution) and each partial folds its stencil
      * neighbors in the fixed (j,i) order used here — the DuckDB
      * oracle replays the identical grouped fold, so the doubles
      * agree to the same last-ulp contract as the projections.
      * Neighbors valued `noData` drop out of both sums (GDAL's
      * renormalization); a pixel is emitted only when its CENTER
      * floors inside the source span (same validity rule as nearest,
      * so the two resamplers fill the identical footprint). Stencil
      * indexes clamp to the span (edge replication). */
    def contributionsOfBilinear(stx: Int, sty: Int, bands: Seq[Array[Double]],
                                noData: Double)
        : Iterator[((Int, Int), (Int, Array[Int], Seq[Array[Double]], Seq[Array[Double]]))] = {
      val tileKey = sty * tilesX + stx
      def isNd(v: Double): Boolean = v == noData || (noData.isNaN && v.isNaN)
      // padM = one source pixel: the stencil of a target pixel owned
      // by a NEIGHBORING tile can reach one pixel into this one
      candidateTargets(stx, sty, padM = pixelM)
        .iterator.flatMap { case (ttx, tty) =>
          val idxs = Array.newBuilder[Int]
          val wv = Seq.fill(bands.length)(Array.newBuilder[Double])
          val ws = Seq.fill(bands.length)(Array.newBuilder[Double])
          var cy = 0
          while (cy < pxPerTile) {
            val lat = originLat - (tty * pxPerTile + cy + 0.5) * pixelDeg
            var cx = 0
            while (cx < pxPerTile && lat <= 90.0 && lat >= -90.0) {
              val lon = originLon + (ttx * pxPerTile + cx + 0.5) * pixelDeg
              if (wrapped && lon >= 180.0) { cx = pxPerTile }
              else {
              val (x, y) = proj.forward(lat, lon)
              val gxc = (x - x0) / pixelM
              val gyc = (yTop - y) / pixelM
              val sgx = Math.floor(gxc).toInt
              val sgy = Math.floor(gyc).toInt
              // validity = the nearest rule (center inside the span)
              if (sgx >= 0 && sgx < pxX && sgy >= 0 && sgy < pxY) {
                val fx = gxc - 0.5
                val fy = gyc - 0.5
                val i0 = Math.floor(fx).toInt
                val j0 = Math.floor(fy).toInt
                val wx = fx - Math.floor(fx)
                val wy = fy - Math.floor(fy)
                // stencil in FIXED (j,i) order — the oracle's list order
                val ni = Array(i0, i0 + 1, i0, i0 + 1)
                val nj = Array(j0, j0, j0 + 1, j0 + 1)
                val nw = Array((1 - wy) * (1 - wx), (1 - wy) * wx,
                  wy * (1 - wx), wy * wx)
                var wvAcc: Array[Double] = null
                var wsAcc: Array[Double] = null
                var n = 0
                while (n < 4) {
                  val ci = math.min(pxX - 1, math.max(0, ni(n)))
                  val cj = math.min(pxY - 1, math.max(0, nj(n)))
                  if (ci / pxPerTile == stx && cj / pxPerTile == sty) {
                    if (wvAcc == null) {
                      wvAcc = new Array[Double](bands.length)
                      wsAcc = new Array[Double](bands.length)
                    }
                    val li = (cj - sty * pxPerTile) * pxPerTile + (ci - stx * pxPerTile)
                    var b = 0
                    while (b < bands.length) {
                      val v = bands(b)(li)
                      if (!isNd(v)) {
                        wvAcc(b) += nw(n) * v
                        wsAcc(b) += nw(n)
                      }
                      b += 1
                    }
                  }
                  n += 1
                }
                if (wvAcc != null) {
                  idxs += cy * pxPerTile + cx
                  var b = 0
                  while (b < bands.length) {
                    wv(b) += wvAcc(b); ws(b) += wsAcc(b); b += 1
                  }
                }
              }
              cx += 1
              }
            }
            cy += 1
          }
          val ia = idxs.result()
          if (ia.isEmpty) Iterator.empty
          else Iterator(((ttx, tty),
            (tileKey, ia, wv.map(_.result()), ws.map(_.result()))))
        }
    }
  }

  /** Ellipsoidal transverse mercator (the UTM projection family) —
    * the standard series expansion (Snyder, "Map Projections — A
    * Working Manual", USGS PP 1395, eqs. 3-21, 8-9..8-25; accurate to
    * millimeters inside a UTM zone). This is the second projected CRS
    * the ingest warp handles beyond web mercator, demonstrating the
    * warp path generalizes: mercator exploits x-linearity in
    * longitude; the UTM path is the fully general target-driven
    * resample (reference `unify_projection.sh` shells out to
    * gdalwarp for the same job).
    *
    * Parity note: the oracle replays [[forwardSelect]] — the same
    * formulas in DuckDB SQL. The two engines' libm differ in last
    * ulps, which is FINE: the only discretization is
    * `floor((x-x0)/pixelM)` against 10⁴-meter pixels, and sub-µm
    * projection disagreement cannot flip a floor for pixel centers in
    * general position (nothing aligns a projected center to within
    * 1e-9 m of a source-pixel boundary). */
  final case class TransverseMercator(lon0Deg: Double, falseE: Double,
                                      falseN: Double) extends Projection {
    import TransverseMercator._
    val lam0: Double = Math.toRadians(lon0Deg)

    /** (latDeg, lonDeg) → (easting, northing). */
    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = Math.toRadians(latDeg)
      val sinP = Math.sin(phi); val cosP = Math.cos(phi); val tanP = Math.tan(phi)
      val n = A / Math.sqrt(1.0 - E2 * sinP * sinP)
      val t = tanP * tanP
      val c = Ep2 * cosP * cosP
      val aa = (Math.toRadians(lonDeg) - lam0) * cosP
      val m = A * (M1 * phi - M2 * Math.sin(2 * phi) +
        M3 * Math.sin(4 * phi) - M4 * Math.sin(6 * phi))
      val aa2 = aa * aa; val aa3 = aa2 * aa
      val x = K0 * n * (aa + (1 - t + c) * aa3 / 6.0 +
        (5 - 18 * t + t * t + 72 * c - 58 * Ep2) * aa3 * aa2 / 120.0) + falseE
      val y = K0 * (m + n * tanP * (aa2 / 2.0 +
        (5 - t + 9 * c + 4 * c * c) * aa2 * aa2 / 24.0 +
        (61 - 58 * t + t * t + 600 * c - 330 * Ep2) * aa3 * aa3 / 720.0)) + falseN
      (x, y)
    }

    /** (easting, northing) → (latDeg, lonDeg) (Snyder 8-17..8-25). */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val m = (y - falseN) / K0
      val mu = m / (A * M1)
      val phi1 = mu + P1 * Math.sin(2 * mu) + P2 * Math.sin(4 * mu) +
        P3 * Math.sin(6 * mu) + P4 * Math.sin(8 * mu)
      val sinP = Math.sin(phi1); val cosP = Math.cos(phi1); val tanP = Math.tan(phi1)
      val c1 = Ep2 * cosP * cosP
      val t1 = tanP * tanP
      val n1 = A / Math.sqrt(1.0 - E2 * sinP * sinP)
      val r1 = A * (1.0 - E2) / Math.pow(1.0 - E2 * sinP * sinP, 1.5)
      val d = (x - falseE) / (n1 * K0)
      val d2 = d * d; val d3 = d2 * d
      val lat = phi1 - (n1 * tanP / r1) * (d2 / 2.0 -
        (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * Ep2) * d2 * d2 / 24.0 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * Ep2 - 3 * c1 * c1) *
          d3 * d3 / 720.0)
      val lon = lam0 + (d - (1 + 2 * t1 + c1) * d3 / 6.0 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * Ep2 + 24 * t1 * t1) *
          d3 * d2 / 120.0) / cosP
      (Math.toDegrees(lat), Math.toDegrees(lon))
    }

    /** DuckDB SQL mirror of [[forward]]: SELECT-list fragments deriving
      * easting `x` and northing `y` from double columns `$lat`/`$lon`
      * (the warp-parity contract above: value agreement to ~1e-9 m,
      * not bitwise). Emitted next to the Scala so the formulas cannot
      * drift apart. */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""radians($lat) AS phi_, radians($lon) - ${d(lam0)} AS dlam_,
         |${d(A)} / sqrt(1.0 - ${d(E2)} * sin(radians($lat)) * sin(radians($lat))) AS n_,
         |tan(radians($lat)) * tan(radians($lat)) AS t_,
         |${d(Ep2)} * cos(radians($lat)) * cos(radians($lat)) AS c_,
         |(radians($lon) - ${d(lam0)}) * cos(radians($lat)) AS aa_,
         |${d(A)} * (${d(M1)} * radians($lat) - ${d(M2)} * sin(2 * radians($lat))
         |  + ${d(M3)} * sin(4 * radians($lat)) - ${d(M4)} * sin(6 * radians($lat))) AS m_""".stripMargin
    }

    /** The x/y expressions over [[forwardSelect]]'s columns. */
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(K0)} * n_ * (aa_ + (1 - t_ + c_) * aa_*aa_*aa_ / 6.0 + " +
        s"(5 - 18*t_ + t_*t_ + 72*c_ - 58*${d(Ep2)}) * aa_*aa_*aa_*aa_*aa_ / 120.0) + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(K0)} * (m_ + n_ * tan(phi_) * (aa_*aa_ / 2.0 + " +
        s"(5 - t_ + 9*c_ + 4*c_*c_) * aa_*aa_*aa_*aa_ / 24.0 + " +
        s"(61 - 58*t_ + t_*t_ + 600*c_ - 330*${d(Ep2)}) * aa_*aa_*aa_*aa_*aa_*aa_ / 720.0)) + ${d(falseN)}"
    }
  }

  object TransverseMercator {
    // WGS84 + UTM constants (public: EPSG registry / Snyder PP 1395)
    val A = 6378137.0
    val F: Double = 1.0 / 298.257223563
    val E2: Double = F * (2.0 - F)
    val Ep2: Double = E2 / (1.0 - E2)
    val K0 = 0.9996
    // meridian-arc series coefficients (Snyder 3-21)
    val M1: Double = 1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256
    val M2: Double = 3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024
    val M3: Double = 15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024
    val M4: Double = 35 * E2 * E2 * E2 / 3072
    // footprint-latitude series (Snyder 3-26), e1 = (1-√(1-e²))/(1+√(1-e²))
    private val E1: Double =
      (1 - Math.sqrt(1 - E2)) / (1 + Math.sqrt(1 - E2))
    val P1: Double = 3 * E1 / 2 - 27 * E1 * E1 * E1 / 32
    val P2: Double = 21 * E1 * E1 / 16 - 55 * E1 * E1 * E1 * E1 / 32
    val P3: Double = 151 * E1 * E1 * E1 / 96
    val P4: Double = 1097 * E1 * E1 * E1 * E1 / 512

    /** UTM zone CRS from its EPSG code (326xx north / 327xx south). */
    def utm(epsg: Int): TransverseMercator = {
      require((epsg >= 32601 && epsg <= 32660) || (epsg >= 32701 && epsg <= 32760),
        s"EPSG:$epsg is not a UTM zone code (32601-32660 / 32701-32760)")
      val zone = epsg % 100
      TransverseMercator(lon0Deg = -183.0 + 6.0 * zone, falseE = 500000.0,
        falseN = if (epsg >= 32701) 1.0e7 else 0.0)
    }
    def isUtm(epsg: Int): Boolean =
      (epsg >= 32601 && epsg <= 32660) || (epsg >= 32701 && epsg <= 32760)
  }

  /** Ellipsoidal cylindrical equal-area projection (Snyder PP 1395,
    * eqs. 10-1, 10-2, 3-11/3-12 for the authalic q, 3-18 for the
    * inverse series) — the THIRD projected CRS the ingest warp
    * handles, showing [[ProjectedLattice]] is projection-generic: an
    * equal-area cylinder shares nothing with mercator's conformal
    * x-linearity or the transverse aspect's series. EPSG:6933 is
    * NSIDC EASE-Grid 2.0 Global (standard parallels ±30°) — the grid
    * polar/climate rasters ship in. */
  final case class CylindricalEqualArea(latTsDeg: Double, lon0Deg: Double,
                                        falseE: Double, falseN: Double)
      extends Projection {
    import TransverseMercator.{A, E2}
    private val e: Double = Math.sqrt(E2)
    val lam0: Double = Math.toRadians(lon0Deg)
    /** Scale along the standard parallel: k0 = cosφs/√(1−e²sin²φs). */
    val k0: Double = {
      val s = Math.sin(Math.toRadians(latTsDeg))
      Math.cos(Math.toRadians(latTsDeg)) / Math.sqrt(1.0 - E2 * s * s)
    }
    // a polar standard parallel collapses the cylinder (k0 → 0 scales
    // y by A/2k0 → ∞) — broken georeferencing must fail fast, not
    // warp every pixel by 10²³
    require(k0 > 1e-9,
      s"degenerate equal-area cylinder (standard parallel $latTsDeg° " +
        "is at or beyond the pole)")
    /** Authalic q of a latitude (Snyder 3-12). */
    private def qOf(sinP: Double): Double =
      (1.0 - E2) * (sinP / (1.0 - E2 * sinP * sinP) -
        (1.0 / (2.0 * e)) * Math.log((1.0 - e * sinP) / (1.0 + e * sinP)))
    private val qPole: Double = qOf(1.0)
    // authalic→geodetic series coefficients (Snyder 3-18)
    private val B1: Double = E2 / 3 + 31 * E2 * E2 / 180 + 517 * E2 * E2 * E2 / 5040
    private val B2: Double = 23 * E2 * E2 / 360 + 251 * E2 * E2 * E2 / 3780
    private val B3: Double = 761 * E2 * E2 * E2 / 45360

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val q = qOf(Math.sin(Math.toRadians(latDeg)))
      // association mirrors xSql/ySql exactly (constant × variable)
      (A * k0 * (Math.toRadians(lonDeg) - lam0) + falseE,
        A / (2.0 * k0) * q + falseN)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val q = 2.0 * k0 * (y - falseN) / A
      val beta = Math.asin(math.max(-1.0, math.min(1.0, q / qPole)))
      val lat = beta + B1 * Math.sin(2 * beta) + B2 * Math.sin(4 * beta) +
        B3 * Math.sin(6 * beta)
      val lon = lam0 + (x - falseE) / (A * k0)
      (Math.toDegrees(lat), Math.toDegrees(lon))
    }

    /** DuckDB SQL mirror of [[forward]] (same parity contract as the
      * transverse-mercator mirror: value agreement to last ulps,
      * which cannot flip a 10⁴-meter pixel floor). */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""radians($lon) - ${d(lam0)} AS dlam_,
         |sin(radians($lat)) AS sphi_,
         |${d(1.0 - E2)} * (sin(radians($lat)) / (1.0 - ${d(E2)} * sin(radians($lat)) * sin(radians($lat)))
         |  - ${d(1.0 / (2.0 * e))} * ln((1.0 - ${d(e)} * sin(radians($lat))) / (1.0 + ${d(e)} * sin(radians($lat))))) AS q_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(A * k0)} * dlam_ + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(A / (2.0 * k0))} * q_ + ${d(falseN)}"
    }
  }

  object CylindricalEqualArea {
    /** EPSG:6933 — WGS84 / NSIDC EASE-Grid 2.0 Global. */
    val ease2: CylindricalEqualArea =
      CylindricalEqualArea(latTsDeg = 30.0, lon0Deg = 0.0,
        falseE = 0.0, falseN = 0.0)

    /** Build from GeoTIFF projection geokeys (CT 28,
      * CT_CylindricalEqualArea): standard parallel from
      * ProjStdParallel1 (3078; fallback ProjNatOriginLat 3081),
      * central meridian from ProjNatOriginLong (3080; fallbacks
      * 3088/3084), false offsets 3082/3083. A missing standard
      * parallel fails fast — it sets the aspect ratio of every
      * pixel, load-bearing georeferencing like the conics'. */
    def fromGeoKeys(p: Map[Int, Double]): CylindricalEqualArea = {
      def req(ids: Seq[Int], what: String): Double =
        ids.collectFirst { case id if p.contains(id) => p(id) }
          .getOrElse(throw new IllegalArgumentException(
            s"CylindricalEqualArea GeoKeyDirectory missing $what " +
              s"(keys ${ids.mkString("/")})"))
      CylindricalEqualArea(
        latTsDeg = req(Seq(3078, 3081), "ProjStdParallel1/ProjNatOriginLat"),
        lon0Deg = req(Seq(3080, 3088, 3084), "ProjNatOriginLong/ProjCenterLong"),
        falseE = p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        falseN = p.getOrElse(3083, p.getOrElse(3087, 0.0)))
    }
  }

  /** Ellipsoidal Albers equal-area CONIC (Snyder PP 1395, eqs.
    * 14-1..14-11 with the authalic-latitude series 3-18) — the FOURTH
    * projected CRS of the ingest warp, and the first built from
    * GeoTIFF PARAMETER keys instead of an EPSG code switch
    * ([[fromGeoKeys]]): the projection national land-cover datasets
    * ship in (CONUS Albers, national equal-area grids), where every
    * agency picks its own parallels, so a closed EPSG enumeration can
    * never cover them. `unify_projection.sh` handles these because
    * GDAL reads the parameters from the file; [[fromGeoKeys]] is that
    * same move on the pure-JVM path. */
  final case class AlbersEqualArea(lat1Deg: Double, lat2Deg: Double,
                                   lat0Deg: Double, lon0Deg: Double,
                                   falseE: Double, falseN: Double)
      extends Projection {
    import TransverseMercator.{A, E2}
    private val e: Double = Math.sqrt(E2)
    val lam0: Double = Math.toRadians(lon0Deg)
    /** m = cosφ/√(1−e²sin²φ) (Snyder 14-15). */
    private def mOf(phi: Double): Double = {
      val s = Math.sin(phi)
      Math.cos(phi) / Math.sqrt(1.0 - E2 * s * s)
    }
    /** Authalic q (Snyder 3-12) — shared with the equal-area
      * cylinder; conic vs cylinder differ only in how q maps to the
      * plane. */
    private def qOf(sinP: Double): Double =
      (1.0 - E2) * (sinP / (1.0 - E2 * sinP * sinP) -
        (1.0 / (2.0 * e)) * Math.log((1.0 - e * sinP) / (1.0 + e * sinP)))
    private val qPole: Double = qOf(1.0)
    // cone constant n, C, and the origin radius ρ0 (Snyder 14-14,
    // 14-13, 14-12a); equal parallels degenerate to n = sinφ1
    val coneN: Double = {
      val m1 = mOf(Math.toRadians(lat1Deg))
      val m2 = mOf(Math.toRadians(lat2Deg))
      val q1 = qOf(Math.sin(Math.toRadians(lat1Deg)))
      val q2 = qOf(Math.sin(Math.toRadians(lat2Deg)))
      if (math.abs(lat1Deg - lat2Deg) < 1e-12) Math.sin(Math.toRadians(lat1Deg))
      else (m1 * m1 - m2 * m2) / (q2 - q1)
    }
    require(math.abs(coneN) > 1e-12,
      s"degenerate Albers cone (symmetric parallels $lat1Deg/$lat2Deg)")
    val bigC: Double = {
      val m1 = mOf(Math.toRadians(lat1Deg))
      m1 * m1 + coneN * qOf(Math.sin(Math.toRadians(lat1Deg)))
    }
    /** ρ(q) = RhoK·√(C − n·q) with RhoK = A/n — factored so the Scala
      * and SQL evaluate the identical op sequence. */
    private val rhoK: Double = A / coneN
    val rho0: Double = rhoK * Math.sqrt(bigC - coneN * qOf(Math.sin(Math.toRadians(lat0Deg))))
    /** The cone APEX (ρ = 0) is the finite plane point every meridian
      * converges toward. The ellipsoidal Albers pole is an arc at
      * ρ_pole = (A/n)·√(C − n·q_pole) ≥ 0, so the apex itself sits at
      * or beyond the pole — a lattice containing it still has its
      * latitude extreme interior and spans all longitudes, the same
      * handling as the azimuthal poles (inverse clamps q/q_pole, so
      * off-map apex-side points read as the pole). */
    override def planeSingularities: Seq[(Double, Double, Double)] =
      Seq((falseE, rho0 + falseN, if (coneN >= 0) 90.0 else -90.0))
    // authalic→geodetic series coefficients (Snyder 3-18)
    private val B1: Double = E2 / 3 + 31 * E2 * E2 / 180 + 517 * E2 * E2 * E2 / 5040
    private val B2: Double = 23 * E2 * E2 / 360 + 251 * E2 * E2 * E2 / 3780
    private val B3: Double = 761 * E2 * E2 * E2 / 45360

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val q = qOf(Math.sin(Math.toRadians(latDeg)))
      val dlam = Math.toRadians(lonDeg) - lam0
      // association mirrors xSql/ySql exactly
      (rhoK * Math.sqrt(bigC - coneN * q) * Math.sin(coneN * dlam) + falseE,
        rho0 - rhoK * Math.sqrt(bigC - coneN * q) * Math.cos(coneN * dlam) + falseN)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - falseE
      val yp = rho0 - (y - falseN)
      val rho = Math.hypot(xp, yp)
      // θ sign convention follows the cone constant (Snyder 14-11)
      val theta =
        if (coneN >= 0) Math.atan2(xp, yp) else Math.atan2(-xp, -yp)
      val q = (bigC - (rho / rhoK) * (rho / rhoK)) / coneN
      val beta = Math.asin(math.max(-1.0, math.min(1.0, q / qPole)))
      val lat = beta + B1 * Math.sin(2 * beta) + B2 * Math.sin(4 * beta) +
        B3 * Math.sin(6 * beta)
      (Math.toDegrees(lat), Math.toDegrees(lam0 + theta / coneN))
    }

    /** DuckDB SQL mirror of [[forward]] (same parity contract as the
      * other projections: value agreement to last ulps, which cannot
      * flip a 10⁴-meter pixel floor). */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""radians($lon) - ${d(lam0)} AS dlam_,
         |${d(1.0 - E2)} * (sin(radians($lat)) / (1.0 - ${d(E2)} * sin(radians($lat)) * sin(radians($lat)))
         |  - ${d(1.0 / (2.0 * e))} * ln((1.0 - ${d(e)} * sin(radians($lat))) / (1.0 + ${d(e)} * sin(radians($lat))))) AS q_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(rhoK)} * sqrt(${d(bigC)} - ${d(coneN)} * q_) * sin(${d(coneN)} * dlam_) + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(rho0)} - ${d(rhoK)} * sqrt(${d(bigC)} - ${d(coneN)} * q_) * cos(${d(coneN)} * dlam_) + ${d(falseN)}"
    }
  }

  /** Ellipsoidal Lambert conformal conic, two standard parallels
    * (Snyder PP 1395, eqs. 15-1..15-11; inverse via the conformal-
    * latitude series 3-5) — the conic national topographic and
    * aviation grids ship in, built like Albers from GeoTIFF parameter
    * keys (CT 8, LambertConfConic_2SP). Conformal where Albers is
    * equal-area: same cone machinery (n, ρ0, θ = n·Δλ), but radius
    * follows the isometric t(φ) instead of the authalic q(φ). */
  final case class LambertConformalConic(lat1Deg: Double, lat2Deg: Double,
                                         lat0Deg: Double, lon0Deg: Double,
                                         falseE: Double, falseN: Double,
                                         k0: Double = 1.0)
      extends Projection {
    import TransverseMercator.{A, E2}
    private val e: Double = Math.sqrt(E2)
    val lam0: Double = Math.toRadians(lon0Deg)
    /** Isometric t (Snyder 15-9). Association mirrors the SQL. */
    private def tOf(phi: Double): Double = {
      val s = Math.sin(phi)
      Math.tan(Math.PI / 4 - phi / 2) /
        Math.pow((1.0 - e * s) / (1.0 + e * s), e / 2)
    }
    private def mOf(phi: Double): Double = {
      val s = Math.sin(phi)
      Math.cos(phi) / Math.sqrt(1.0 - E2 * s * s)
    }
    /** Cone constant (Snyder 15-8); equal parallels → n = sinφ1. */
    val coneN: Double = {
      val p1 = Math.toRadians(lat1Deg)
      val p2 = Math.toRadians(lat2Deg)
      if (math.abs(lat1Deg - lat2Deg) < 1e-12) Math.sin(p1)
      else (Math.log(mOf(p1)) - Math.log(mOf(p2))) /
        (Math.log(tOf(p1)) - Math.log(tOf(p2)))
    }
    require(math.abs(coneN) > 1e-12,
      s"degenerate Lambert cone (n = sin φ = 0 at parallels " +
        s"$lat1Deg/$lat2Deg — symmetric 2SP parallels or an equatorial " +
        "1SP origin latitude have no cone)")
    // a zero/negative scale factor collapses every radius — as
    // load-bearing as the parallels, same fail-fast stance
    require(k0 > 1e-9, s"Lambert scale factor k0 = $k0 must be positive")
    /** A·k0·F with F = m1/(n·t1ⁿ) (Snyder 15-10; the 1SP variant
      * 15-4 scales every radius by k0 — the 2SP default k0 = 1 leaves
      * the product bitwise unchanged), factored so Scala and SQL
      * evaluate the identical op sequence ρ = Ak0F·tⁿ. */
    private val aF: Double = {
      val p1 = Math.toRadians(lat1Deg)
      A * k0 * (mOf(p1) / (coneN * Math.pow(tOf(p1), coneN)))
    }
    val rho0: Double = aF * Math.pow(tOf(Math.toRadians(lat0Deg)), coneN)
    /** The cone APEX is a finite plane point — ρ(pole) = 0 because
      * tⁿ → 0 there (the near pole for a northern cone, n > 0; the
      * south pole for a southern one) — where every meridian
      * converges: a lattice containing it needs the full-longitude /
      * interior-latitude-extreme handling, exactly like the azimuthal
      * poles. */
    override def planeSingularities: Seq[(Double, Double, Double)] =
      Seq((falseE, rho0 + falseN, if (coneN >= 0) 90.0 else -90.0))
    // conformal→geodetic series coefficients (Snyder 3-5)
    private val C1: Double = E2 / 2 + 5 * E2 * E2 / 24 + E2 * E2 * E2 / 12
    private val C2: Double = 7 * E2 * E2 / 48 + 29 * E2 * E2 * E2 / 240
    private val C3: Double = 7 * E2 * E2 * E2 / 120

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val t = tOf(Math.toRadians(latDeg))
      val dlam = Math.toRadians(lonDeg) - lam0
      // association mirrors xSql/ySql exactly
      (aF * Math.pow(t, coneN) * Math.sin(coneN * dlam) + falseE,
        rho0 - aF * Math.pow(t, coneN) * Math.cos(coneN * dlam) + falseN)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - falseE
      val yp = rho0 - (y - falseN)
      // ρ carries the cone's sign (Snyder 15-11): southern cones have
      // n < 0 AND aF < 0, and ρ/aF must stay positive or the
      // fractional pow below is NaN
      val rho = (if (coneN >= 0) 1.0 else -1.0) * Math.hypot(xp, yp)
      val theta =
        if (coneN >= 0) Math.atan2(xp, yp) else Math.atan2(-xp, -yp)
      val t = Math.pow(rho / aF, 1.0 / coneN)
      val chi = Math.PI / 2 - 2.0 * Math.atan(t)
      val lat = chi + C1 * Math.sin(2 * chi) + C2 * Math.sin(4 * chi) +
        C3 * Math.sin(6 * chi)
      (Math.toDegrees(lat), Math.toDegrees(lam0 + theta / coneN))
    }

    /** DuckDB SQL mirror of [[forward]] (same parity contract as the
      * other projections). */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""radians($lon) - ${d(lam0)} AS dlam_,
         |tan(pi() / 4 - radians($lat) / 2) /
         |  power((1.0 - ${d(e)} * sin(radians($lat))) / (1.0 + ${d(e)} * sin(radians($lat))), ${d(e / 2)}) AS t_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(aF)} * power(t_, ${d(coneN)}) * sin(${d(coneN)} * dlam_) + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(rho0)} - ${d(aF)} * power(t_, ${d(coneN)}) * cos(${d(coneN)} * dlam_) + ${d(falseN)}"
    }
  }

  object LambertConformalConic {
    /** Build from GeoTIFF projection geokeys (CT 8) — same key scheme
      * as [[AlbersEqualArea.fromGeoKeys]]. */
    def fromGeoKeys(p: Map[Int, Double]): LambertConformalConic = {
      def req(id: Int, alt: Int, what: String): Double =
        p.getOrElse(id, p.getOrElse(alt,
          throw new IllegalArgumentException(
            s"Lambert GeoKeyDirectory missing $what (key $id or $alt)")))
      def opt(a: Int, b: Int): Double = p.getOrElse(a, p.getOrElse(b, 0.0))
      LambertConformalConic(
        lat1Deg = req(3078, 3078, "ProjStdParallel1"),
        lat2Deg = req(3079, 3079, "ProjStdParallel2"),
        // origin keys are load-bearing georeferencing — a writer that
        // omitted them produced a broken file; silently centering on
        // 0/0 would warp every pixel thousands of km off
        lat0Deg = req(3085, 3081, "ProjFalseOriginLat/ProjNatOriginLat"),
        lon0Deg = req(3084, 3080, "ProjFalseOriginLong/ProjNatOriginLong"),
        // false offsets legitimately default to 0
        falseE = opt(3086, 3082),
        falseN = opt(3087, 3083))
    }

    /** Build the SINGLE-parallel variant from CT 9 geokeys
      * (CT_LambertConfConic_Helmert — the national-grid form where an
      * agency picks one origin parallel and a scale factor k0 instead
      * of two standard parallels): both parallels collapse onto the
      * origin latitude (the 2SP machinery degenerates to n = sinφ0
      * exactly) and k0 scales every radius (Snyder 15-4). Keys:
      * ProjNatOriginLat/Long 3081/3080 (fallback the false-origin
      * pair), ProjScaleAtNatOrigin 3092 (default 1). */
    def fromGeoKeys1SP(p: Map[Int, Double]): LambertConformalConic = {
      def req(id: Int, alt: Int, what: String): Double =
        p.getOrElse(id, p.getOrElse(alt,
          throw new IllegalArgumentException(
            s"Lambert-1SP GeoKeyDirectory missing $what (key $id or $alt)")))
      def opt(a: Int, b: Int): Double = p.getOrElse(a, p.getOrElse(b, 0.0))
      val lat0 = req(3081, 3085, "ProjNatOriginLat/ProjFalseOriginLat")
      LambertConformalConic(
        lat1Deg = lat0, lat2Deg = lat0, lat0Deg = lat0,
        lon0Deg = req(3080, 3084, "ProjNatOriginLong/ProjFalseOriginLong"),
        falseE = opt(3082, 3086),
        falseN = opt(3083, 3087),
        k0 = p.getOrElse(3092, 1.0))
    }
  }

  object AlbersEqualArea {
    /** Build from GeoTIFF projection geokeys (CT 11): standard
      * parallels 3078/3079; origin lat/lon from the false-origin keys
      * (3085/3084) or the natural-origin keys (3081/3080) — GeoTIFF
      * writers split between the two; false easting/northing likewise
      * (3086/3082, 3087/3083). Missing parallels fail fast. */
    def fromGeoKeys(p: Map[Int, Double]): AlbersEqualArea = {
      def req(id: Int, alt: Int, what: String): Double =
        p.getOrElse(id, p.getOrElse(alt,
          throw new IllegalArgumentException(
            s"Albers GeoKeyDirectory missing $what (key $id or $alt)")))
      def opt(a: Int, b: Int): Double = p.getOrElse(a, p.getOrElse(b, 0.0))
      AlbersEqualArea(
        lat1Deg = req(3078, 3078, "ProjStdParallel1"),
        lat2Deg = req(3079, 3079, "ProjStdParallel2"),
        // origin keys are load-bearing georeferencing — a writer that
        // omitted them produced a broken file; silently centering on
        // 0/0 would warp every pixel thousands of km off
        lat0Deg = req(3085, 3081, "ProjFalseOriginLat/ProjNatOriginLat"),
        lon0Deg = req(3084, 3080, "ProjFalseOriginLong/ProjNatOriginLong"),
        // false offsets legitimately default to 0
        falseE = opt(3086, 3082),
        falseN = opt(3087, 3083))
    }
  }

  /** Ellipsoidal polar stereographic (Snyder PP 1395, eqs.
    * 21-33..21-41; conformal azimuthal, the projection of the NSIDC
    * sea-ice and Antarctic grids — EPSG:3413/3976/3031) — built like
    * the conics from GeoTIFF parameter keys (CT 15). Both aspects in
    * one parameterization: `s = ±1` mirrors the south aspect onto the
    * north formulas (Snyder p. 161: reverse the signs of x, y, φc, φ,
    * λ0, λ), folded into the isometric t and the y sign so the Scala
    * and its SQL mirror stay one expression.
    *
    * Variant B (standard parallel, |φts| < 90) sets true scale along
    * φts via ρ = A·m(φts)·t/t(φts) (eq. 21-34); variant A (|φts| =
    * 90, scale factor k0 at the pole) uses eq. 21-39's closed-form
    * constant. */
  final case class PolarStereographic(latTsDeg: Double, lon0Deg: Double,
                                      falseE: Double, falseN: Double,
                                      k0: Double = 1.0)
      extends Projection {
    import TransverseMercator.{A, E2}
    private val e: Double = Math.sqrt(E2)
    val lam0: Double = Math.toRadians(lon0Deg)
    /** Aspect sign: +1 north (φts ≥ 0), −1 south. */
    val aspect: Double = if (latTsDeg >= 0) 1.0 else -1.0
    /** Mirrored isometric t (Snyder 15-9 at s·φ): the north-aspect t
      * of the hemisphere-mirrored latitude. */
    private def tOf(phi: Double): Double = {
      val ss = aspect * Math.sin(phi)
      Math.tan(Math.PI / 4 - aspect * phi / 2) /
        Math.pow((1.0 - e * ss) / (1.0 + e * ss), e / 2)
    }
    private def mOf(phi: Double): Double = {
      val s = Math.sin(phi)
      Math.cos(phi) / Math.sqrt(1.0 - E2 * s * s)
    }
    /** ρ = RhoK·t: variant B's A·m(φts)/t(φts) (true scale along the
      * standard parallel; m is even in φ so the south aspect needs no
      * special case) or variant A's 2·A·k0/√((1+e)^(1+e)(1−e)^(1−e)). */
    val rhoK: Double =
      if (math.abs(latTsDeg) >= 90.0 - 1e-9)
        2.0 * A * k0 / Math.sqrt(
          Math.pow(1.0 + e, 1.0 + e) * Math.pow(1.0 - e, 1.0 - e))
      else {
        val pts = Math.toRadians(latTsDeg)
        A * (mOf(pts) / tOf(pts))
      }
    private val negSRhoK: Double = -aspect * rhoK
    /** The pole projects to (FE, FN) — the azimuthal singularity. */
    override def planeSingularities: Seq[(Double, Double, Double)] =
      Seq((falseE, falseN, 90.0 * aspect))
    // conformal→geodetic series coefficients (Snyder 3-5)
    private val C1: Double = E2 / 2 + 5 * E2 * E2 / 24 + E2 * E2 * E2 / 12
    private val C2: Double = 7 * E2 * E2 / 48 + 29 * E2 * E2 * E2 / 240
    private val C3: Double = 7 * E2 * E2 * E2 / 120

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val t = tOf(Math.toRadians(latDeg))
      val dlam = Math.toRadians(lonDeg) - lam0
      // association mirrors xSql/ySql exactly
      (rhoK * t * Math.sin(dlam) + falseE,
        negSRhoK * t * Math.cos(dlam) + falseN)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - falseE
      val yp = y - falseN
      val t = Math.hypot(xp, yp) / rhoK
      val chi = Math.PI / 2 - 2.0 * Math.atan(t)
      val latM = chi + C1 * Math.sin(2 * chi) + C2 * Math.sin(4 * chi) +
        C3 * Math.sin(6 * chi)
      // the pole itself (ρ = 0) lands here naturally: χ = π/2, Δλ = 0
      val lon = lam0 + Math.atan2(xp, -aspect * yp)
      (Math.toDegrees(aspect * latM), Math.toDegrees(lon))
    }

    /** DuckDB SQL mirror of [[forward]] (same parity contract as the
      * other projections: value agreement to last ulps, which cannot
      * flip a 10⁴-meter pixel floor). */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""radians($lon) - ${d(lam0)} AS dlam_,
         |tan(pi() / 4 - ${d(aspect)} * radians($lat) / 2) /
         |  power((1.0 - ${d(e)} * (${d(aspect)} * sin(radians($lat)))) /
         |        (1.0 + ${d(e)} * (${d(aspect)} * sin(radians($lat)))), ${d(e / 2)}) AS t_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(rhoK)} * t_ * sin(dlam_) + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(negSRhoK)} * t_ * cos(dlam_) + ${d(falseN)}"
    }
  }

  object PolarStereographic {
    /** Build from GeoTIFF projection geokeys (CT 15): GDAL writes the
      * standard parallel (or pole latitude, variant A) as
      * ProjNatOriginLat (3081); ESRI-style writers put the standard
      * parallel in ProjStdParallel1 (3078) alongside 3081 = ±90, so
      * 3078 takes PRECEDENCE when present — reading 3081 first would
      * misread those variant-B files as variant A with k0 = 1 (~3%
      * scale error). The central meridian is
      * ProjStraightVertPoleLong (3095; fallbacks 3088/3084/3080), the
      * variant-A scale ProjScaleAtNatOrigin (3092, default 1).
      * Missing origin keys fail fast — same
      * load-bearing-georeferencing stance as the conics. */
    def fromGeoKeys(p: Map[Int, Double]): PolarStereographic = {
      def req(ids: Seq[Int], what: String): Double =
        ids.collectFirst { case id if p.contains(id) => p(id) }
          .getOrElse(throw new IllegalArgumentException(
            s"PolarStereographic GeoKeyDirectory missing $what " +
              s"(keys ${ids.mkString("/")})"))
      PolarStereographic(
        latTsDeg = req(Seq(3078, 3081), "ProjStdParallel1/ProjNatOriginLat"),
        lon0Deg = req(Seq(3095, 3088, 3084, 3080),
          "ProjStraightVertPoleLong/ProjCenterLong"),
        falseE = p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        falseN = p.getOrElse(3083, p.getOrElse(3087, 0.0)),
        k0 = p.getOrElse(3092, 1.0))
    }
  }

  /** Oblique ("double") stereographic — EPSG method 9809, the
    * conformal-sphere construction (IOGP Guidance Note 7-2 §3.2.5.1):
    * the ellipsoid maps conformally to a sphere of radius
    * R = √(ρ₀ν₀), then the sphere maps stereographically from the
    * conformal origin. This is the projection of the Dutch RD grid
    * (EPSG:28992 Amersfoort / RD New) and several Caribbean grids —
    * the last common projection family the closed-form set lacked;
    * the reference warps it via proj (`batch/scripts/
    * unify_projection.sh:13-40`, `+proj=sterea`).
    *
    * Built from GeoTIFF parameter keys: GDAL writes
    * CT_ObliqueStereographic (16) for EPSG 9809; some writers emit
    * CT_Stereographic (14) with the same parameter set — both resolve
    * here. The ellipsoid is a PARAMETER (`aAxis`/`e2`, default WGS84;
    * geokeys 2057/2059 override) because RD is defined on Bessel
    * 1841, where WGS84's figure would be ~100 m off; the
    * Amersfoort↔WGS84 DATUM shift is out of scope — lat/lon are
    * geodetic coordinates on the projection's own ellipsoid, the same
    * stance as the GRS80-vs-WGS84 equivalence elsewhere. */
  final case class ObliqueStereographic(lat0Deg: Double, lon0Deg: Double,
                                        falseE: Double, falseN: Double,
                                        k0: Double = 1.0,
                                        aAxis: Double = TransverseMercator.A,
                                        e2: Double = TransverseMercator.E2)
      extends Projection {
    require(math.abs(lat0Deg) < 90.0 - 1e-9,
      s"ObliqueStereographic origin latitude $lat0Deg is polar — " +
        "use PolarStereographic (CT 15)")
    require(k0 > 1e-9, s"ObliqueStereographic scale k0 = $k0 must be positive")
    require(aAxis > 0.0 && e2 >= 0.0 && e2 < 1.0,
      s"ObliqueStereographic ellipsoid a=$aAxis e2=$e2 is degenerate")
    private val e: Double = Math.sqrt(e2)
    val lam0: Double = Math.toRadians(lon0Deg)
    private val phi0: Double = Math.toRadians(lat0Deg)
    private val sinPhi0: Double = Math.sin(phi0)
    private val w0: Double = 1.0 - e2 * sinPhi0 * sinPhi0
    /** Conformal-sphere radius R = √(ρ₀ν₀) (GN7-2). */
    val bigR: Double =
      Math.sqrt((aAxis * (1.0 - e2) / (w0 * Math.sqrt(w0))) *
        (aAxis / Math.sqrt(w0)))
    /** Conformal-latitude exponent n = √(1 + e²cos⁴φ₀/(1−e²)). */
    val coneN: Double = Math.sqrt(1.0 +
      e2 * Math.pow(Math.cos(phi0), 4) / (1.0 - e2))
    private val w1: Double = Math.pow(
      ((1.0 + sinPhi0) / (1.0 - sinPhi0)) *
        Math.pow((1.0 - e * sinPhi0) / (1.0 + e * sinPhi0), e), coneN)
    private val sinChi00: Double = (w1 - 1.0) / (w1 + 1.0)
    /** c makes the conformal origin's latitude equal χ₀ on the
      * sphere. */
    val cConst: Double = (coneN + sinPhi0) * (1.0 - sinChi00) /
      ((coneN - sinPhi0) * (1.0 + sinChi00))
    private val w2: Double = cConst * w1
    val chi0: Double = Math.asin((w2 - 1.0) / (w2 + 1.0))
    private val sinChi0: Double = Math.sin(chi0)
    private val cosChi0: Double = Math.cos(chi0)
    private val twoRk0: Double = 2.0 * bigR * k0

    /** Both poles map to finite y-axis points (only the origin's
      * antipode is unmappable) — same declaration as the oblique
      * LAEA. */
    override def planeSingularities: Seq[(Double, Double, Double)] =
      Seq(
        (falseE, falseN + twoRk0 * cosChi0 / (1.0 + sinChi0), 90.0),
        (falseE, falseN - twoRk0 * cosChi0 / (1.0 - sinChi0), -90.0))

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val sinPhi = Math.sin(Math.toRadians(latDeg))
      val dlam = coneN * (Math.toRadians(lonDeg) - lam0) // Λ − Λ₀
      // the exact north pole: (1+1)/(1−1) → ∞/∞ would NaN where the
      // limit is finite (χ → π/2) — branch to the limit so BOTH poles
      // land on the planeSingularities points (the south pole's w → 0
      // already gives sinχ = −1 without a branch)
      val w =
        if (sinPhi >= 1.0) Double.PositiveInfinity
        else cConst * Math.pow(
          ((1.0 + sinPhi) / (1.0 - sinPhi)) *
            Math.pow((1.0 - e * sinPhi) / (1.0 + e * sinPhi), e), coneN)
      val sinChi = if (w.isInfinity) 1.0 else (w - 1.0) / (w + 1.0)
      // cos via asin so the SQL mirror is the identical op chain
      val cosChi = Math.cos(Math.asin(sinChi))
      val bb = 1.0 + sinChi0 * sinChi + cosChi0 * (cosChi * Math.cos(dlam))
      (falseE + twoRk0 * cosChi * Math.sin(dlam) / bb,
        falseN + twoRk0 * (sinChi * cosChi0 - sinChi0 * (cosChi * Math.cos(dlam))) / bb)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dE = x - falseE
      val dN = y - falseN
      // GN7-2 inverse: recover (χ, Λ) on the conformal sphere ...
      val g = twoRk0 * Math.tan(Math.PI / 4 - chi0 / 2)
      val h = 2.0 * twoRk0 * Math.tan(chi0) + g
      val ii = Math.atan2(dE, h + dN)
      val jj = Math.atan2(dE, g - dN) - ii
      val chi = chi0 + 2.0 * Math.atan((dN - dE * Math.tan(jj / 2)) / twoRk0)
      val lon = (jj + 2.0 * ii) / coneN + lam0
      // ... then the isometric latitude ψ inverts iteratively on the
      // ellipsoid (quadratic convergence; 1e-14 rad ≈ 0.1 µm)
      val psi = 0.5 * Math.log(
        (1.0 + Math.sin(chi)) / (cConst * (1.0 - Math.sin(chi)))) / coneN
      var phi = 2.0 * Math.atan(Math.exp(psi)) - Math.PI / 2
      var it = 0
      var delta = 1.0
      while (it < 12 && math.abs(delta) > 1e-14) {
        val sp = Math.sin(phi)
        val psiI = Math.log(Math.tan(phi / 2 + Math.PI / 4) *
          Math.pow((1.0 - e * sp) / (1.0 + e * sp), e / 2))
        delta = -(psiI - psi) * Math.cos(phi) * (1.0 - e2 * sp * sp) / (1.0 - e2)
        phi += delta
        it += 1
      }
      (Math.toDegrees(phi), Math.toDegrees(lon))
    }

    /** DuckDB SQL mirror of [[forward]] (same parity contract as the
      * other projections: value agreement to last ulps, which cannot
      * flip a 10⁴-meter pixel floor). The exact-north-pole branch is
      * mirrored too (sin ≥ 1 ⇒ sinχ = 1) so the two stay the
      * identical op chain even at ±90 — without it the SQL's ∞/∞
      * would NaN where the Scala side returns the finite pole
      * image. */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      val w =
        s"""${d(cConst)} * power(((1.0 + sin(radians($lat))) / (1.0 - sin(radians($lat)))) *
           |  power((1.0 - ${d(e)} * sin(radians($lat))) / (1.0 + ${d(e)} * sin(radians($lat))), ${d(e)}), ${d(coneN)})""".stripMargin
      val sinChiSql =
        s"""CASE WHEN sin(radians($lat)) >= 1.0 THEN 1.0
           |  ELSE (($w) - 1.0) / (($w) + 1.0) END""".stripMargin
      s"""${d(coneN)} * (radians($lon) - ${d(lam0)}) AS dlam_,
         |($sinChiSql) AS sinchi_,
         |cos(asin($sinChiSql)) AS coschi_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(falseE)} + ${d(twoRk0)} * coschi_ * sin(dlam_) / " +
        s"(1.0 + ${d(sinChi0)} * sinchi_ + ${d(cosChi0)} * (coschi_ * cos(dlam_)))"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(falseN)} + ${d(twoRk0)} * (sinchi_ * ${d(cosChi0)} - ${d(sinChi0)} * (coschi_ * cos(dlam_))) / " +
        s"(1.0 + ${d(sinChi0)} * sinchi_ + ${d(cosChi0)} * (coschi_ * cos(dlam_)))"
    }
  }

  object ObliqueStereographic {
    /** Bessel 1841 (the RD ellipsoid): a = 6377397.155,
      * 1/f = 299.1528128. */
    val BesselA: Double = 6377397.155
    val BesselInvF: Double = 299.1528128
    private def e2OfInvF(invF: Double): Double = {
      val f = 1.0 / invF
      f * (2.0 - f)
    }
    val BesselE2: Double = e2OfInvF(BesselInvF)

    /** EPSG:28992 — Amersfoort / RD New (the Dutch national grid):
      * origin 52°09′22.178″N 5°23′15.500″E, k₀ = 0.9999079, false
      * origin (155 000, 463 000), Bessel 1841. */
    val rdNew: ObliqueStereographic = ObliqueStereographic(
      lat0Deg = 52.0 + 9.0 / 60 + 22.178 / 3600,
      lon0Deg = 5.0 + 23.0 / 60 + 15.500 / 3600,
      falseE = 155000.0, falseN = 463000.0, k0 = 0.9999079,
      aAxis = BesselA, e2 = BesselE2)

    /** Build from GeoTIFF projection geokeys (CT 14/16): natural
      * origin 3081/3080 (fallbacks the center pair 3089/3088), scale
      * ProjScaleAtNatOrigin 3092 (default 1), false offsets
      * 3082/3083; ellipsoid from GeogSemiMajorAxis 2057 +
      * GeogInvFlattening 2059 when the file carries them (WGS84
      * otherwise). Missing origin keys fail fast — load-bearing
      * georeferencing, same stance as the conics. */
    def fromGeoKeys(p: Map[Int, Double]): ObliqueStereographic = {
      def req(ids: Seq[Int], what: String): Double =
        ids.collectFirst { case id if p.contains(id) => p(id) }
          .getOrElse(throw new IllegalArgumentException(
            s"ObliqueStereographic GeoKeyDirectory missing $what " +
              s"(keys ${ids.mkString("/")})"))
      ObliqueStereographic(
        lat0Deg = req(Seq(3081, 3089, 3085), "ProjNatOriginLat/ProjCenterLat"),
        lon0Deg = req(Seq(3080, 3088, 3084), "ProjNatOriginLong/ProjCenterLong"),
        falseE = p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        falseN = p.getOrElse(3083, p.getOrElse(3087, 0.0)),
        k0 = p.getOrElse(3092, 1.0),
        aAxis = p.getOrElse(2057, TransverseMercator.A),
        e2 = p.get(2059).map(e2OfInvF).getOrElse(TransverseMercator.E2))
    }
  }

  /** 7-parameter Helmert datum transformation (EPSG method 9606,
    * position-vector rotation convention — the `+towgs84=` shift proj
    * applies implicitly when the reference warps a non-WGS84-datum
    * source, `batch/scripts/unify_projection.sh:13-40`). Parameters
    * define SOURCE datum → WGS84: translations in meters, rotations
    * in arc-seconds, scale change in ppm. The REVERSE transformation
    * negates all seven parameters — EPSG GN7-2 §4.3.3 sanctions sign
    * reversal as the reverse of the linearized position-vector form;
    * the neglected rotation×translation cross terms (~1e-5 rad ×
    * ~500 m) put the round-trip error at a few MILLIMETERS on the
    * ground, far below the ~0.25-0.5 m accuracy class of any
    * published towgs84 set (WarpSpec pins the round trip < 1 cm). */
  final case class Helmert7(tx: Double, ty: Double, tz: Double,
                            rxSec: Double, rySec: Double, rzSec: Double,
                            dsPpm: Double) extends Serializable {
    def isIdentity: Boolean =
      tx == 0.0 && ty == 0.0 && tz == 0.0 &&
        rxSec == 0.0 && rySec == 0.0 && rzSec == 0.0 && dsPpm == 0.0
    def negated: Helmert7 =
      Helmert7(-tx, -ty, -tz, -rxSec, -rySec, -rzSec, -dsPpm)
    /** Rotations in radians and the scale factor, precomputed once. */
    private[raster] def rx: Double = Math.toRadians(rxSec / 3600.0)
    private[raster] def ry: Double = Math.toRadians(rySec / 3600.0)
    private[raster] def rz: Double = Math.toRadians(rzSec / 3600.0)
    private[raster] def sFac: Double = 1.0 + dsPpm * 1e-6
  }

  object Helmert7 {
    /** Amersfoort (Bessel 1841) → WGS84, the RDNAPTRANS-derived set
      * proj ships for EPSG:28992/4289 (EPSG transformation 15934,
      * "Amersfoort to WGS 84 (3)"): the 7-param approximation is
      * accurate to ~0.25-0.5 m against the official grid — versus
      * ~100 m with no shift at all. */
    val amersfoort: Helmert7 = Helmert7(
      565.2369, 50.0087, 465.658,
      -0.406857, 0.350733, -1.87035, 4.0812)
  }

  /** A projection on a non-WGS84 DATUM, composed with the Helmert
    * shift that relates its datum to WGS84 — the closed-form
    * equivalent of proj resolving `+towgs84=` during a warp. The
    * lattice contract stays the Projection trait's: [[forward]] takes
    * WGS84 geodetic lat/lon (the target grid) and lands in the source
    * projection's meters, so the shift runs WGS84 → source datum
    * (reverse Helmert) before the base projection's forward;
    * [[inverse]] runs base inverse then source datum → WGS84.
    *
    * The geodetic↔geocentric legs use h = 0 (a raster grid carries no
    * heights — proj's 2D pipeline stance) and Bowring's (1976)
    * single-step geocentric→geodetic, whose error for |h| < 10 km is
    * < 1e-9 rad (sub-mm); the SQL mirror replays the identical op
    * chain, so engine/oracle parity is ulp-exact regardless of the
    * formula's truncation. */
  final case class DatumShifted(base: Projection, shift: Helmert7,
                                srcA: Double, srcE2: Double)
      extends Projection {
    require(!shift.isIdentity,
      "DatumShifted with an identity shift — use the base projection")
    require(srcA > 0.0 && srcE2 >= 0.0 && srcE2 < 1.0,
      s"DatumShifted source ellipsoid a=$srcA e2=$srcE2 is degenerate")
    import DatumShifted.{WgsA, WgsE2, applyShift}
    private val rev = shift.negated // WGS84 → source datum

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val (sLat, sLon) = applyShift(latDeg, lonDeg, WgsA, WgsE2, rev, srcA, srcE2)
      base.forward(sLat, sLon)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val (bLat, bLon) = base.inverse(x, y)
      applyShift(bLat, bLon, srcA, srcE2, shift, WgsA, WgsE2)
    }

    /** The base's plane singularities carry over unchanged: the
      * singular plane POINTS are a property of the source projection;
      * their latitude labels move by the sub-km datum offset, which
      * cannot flip rectangle containment at the 10⁴-meter lattice
      * scales the warp runs at. */
    override def planeSingularities: Seq[(Double, Double, Double)] =
      base.planeSingularities

    /** SQL mirror: the reverse shift's op chain as lateral-alias
      * intermediates producing source-datum `dslat_`/`dslon_`, then
      * the base projection's mirror over those — one SELECT list,
      * exactly the doubles [[forward]] computes. */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      val srcB = srcA * Math.sqrt(1.0 - srcE2)
      val ep2 = srcE2 / (1.0 - srcE2)
      s"""${d(WgsA)} / sqrt(1.0 - ${d(WgsE2)} * sin(radians($lat)) * sin(radians($lat))) AS dsnu_,
         |dsnu_ * cos(radians($lat)) * cos(radians($lon)) AS dsx_,
         |dsnu_ * cos(radians($lat)) * sin(radians($lon)) AS dsy_,
         |dsnu_ * ${d(1.0 - WgsE2)} * sin(radians($lat)) AS dsz_,
         |${d(rev.tx)} + ${d(rev.sFac)} * (dsx_ - ${d(rev.rz)} * dsy_ + ${d(rev.ry)} * dsz_) AS dsx2_,
         |${d(rev.ty)} + ${d(rev.sFac)} * (${d(rev.rz)} * dsx_ + dsy_ - ${d(rev.rx)} * dsz_) AS dsy2_,
         |${d(rev.tz)} + ${d(rev.sFac)} * (-(${d(rev.ry)}) * dsx_ + ${d(rev.rx)} * dsy_ + dsz_) AS dsz2_,
         |sqrt(dsx2_ * dsx2_ + dsy2_ * dsy2_) AS dsp_,
         |atan2(dsz2_ * ${d(srcA)}, dsp_ * ${d(srcB)}) AS dsth_,
         |degrees(atan2(dsz2_ + ${d(ep2 * srcB)} * (sin(dsth_) * sin(dsth_) * sin(dsth_)),
         |  dsp_ - ${d(srcE2 * srcA)} * (cos(dsth_) * cos(dsth_) * cos(dsth_)))) AS dslat_,
         |degrees(atan2(dsy2_, dsx2_)) AS dslon_,
         |${base.forwardSelect("dslat_", "dslon_")}""".stripMargin
    }
    def xSql: String = base.xSql
    def ySql: String = base.ySql
  }

  object DatumShifted {
    /** WGS84 figure (the target datum of every towgs84 set). */
    val WgsA: Double = TransverseMercator.A
    val WgsE2: Double = TransverseMercator.E2

    /** One datum leg: geodetic (h = 0) on the FROM ellipsoid →
      * geocentric → Helmert (position vector, linearized) → Bowring
      * single-step geodetic on the TO ellipsoid. Association mirrors
      * [[DatumShifted.forwardSelect]] exactly. */
    private[raster] def applyShift(latDeg: Double, lonDeg: Double,
                                   aFrom: Double, e2From: Double,
                                   h: Helmert7,
                                   aTo: Double, e2To: Double): (Double, Double) = {
      val phi = Math.toRadians(latDeg)
      val lam = Math.toRadians(lonDeg)
      val sinPhi = Math.sin(phi)
      val cosPhi = Math.cos(phi)
      val nu = aFrom / Math.sqrt(1.0 - e2From * sinPhi * sinPhi)
      val x = nu * cosPhi * Math.cos(lam)
      val y = nu * cosPhi * Math.sin(lam)
      val z = nu * (1.0 - e2From) * sinPhi
      val s = h.sFac
      val x2 = h.tx + s * (x - h.rz * y + h.ry * z)
      val y2 = h.ty + s * (h.rz * x + y - h.rx * z)
      val z2 = h.tz + s * (-h.ry * x + h.rx * y + z)
      val bTo = aTo * Math.sqrt(1.0 - e2To)
      val ep2 = e2To / (1.0 - e2To)
      val p = Math.sqrt(x2 * x2 + y2 * y2)
      val th = Math.atan2(z2 * aTo, p * bTo)
      val sinTh = Math.sin(th)
      val cosTh = Math.cos(th)
      val lat2 = Math.atan2(
        z2 + (ep2 * bTo) * (sinTh * sinTh * sinTh),
        p - (e2To * aTo) * (cosTh * cosTh * cosTh))
      val lon2 = Math.atan2(y2, x2)
      (Math.toDegrees(lat2), Math.toDegrees(lon2))
    }
  }

  /** A projection on a datum related to WGS84 by an NTv2 SHIFT GRID
    * ([[Ntv2.Grid]]) — the accuracy class above [[DatumShifted]]'s
    * 7-parameter Helmert: national grids (NADCON, RDNAPTRANS, OSTN)
    * carry the residual distortion a similarity transform cannot.
    * proj applies these via `+nadgrids=` during the reference's
    * gdalwarp (`unify_projection.sh:13-40`); here the grid enters
    * ingest as an explicit creation option
    * (`grid_shift_gsb`, [[graft.etl.VersionCreation.CreationOptions]]).
    *
    * Contract mirrors [[DatumShifted]]: [[forward]] takes WGS84
    * geodetic (the target lattice) so it applies the grid's INVERSE
    * (fixed two-evaluation iteration, [[Ntv2.Grid.inverseShift]])
    * before the base projection's forward; [[inverse]] applies the
    * grid's native source→target direction after the base inverse.
    * The SQL mirror replays the identical unrolled op chain, so
    * engine/oracle parity is ulp-exact. */
  final case class GridShifted(base: Projection, grid: Ntv2.Grid)
      extends Projection {
    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val (sLat, sLon) = grid.inverseShift(latDeg, lonDeg)
      base.forward(sLat, sLon)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val (bLat, bLon) = base.inverse(x, y)
      grid.forwardShift(bLat, bLon)
    }
    /** Like [[DatumShifted]]: the base's plane singularities carry
      * over — a sub-km datum offset cannot flip rectangle containment
      * at warp lattice scales. */
    override def planeSingularities: Seq[(Double, Double, Double)] =
      base.planeSingularities
    def forwardSelect(lat: String, lon: String): String =
      s"""${grid.inverseSelect(lat, lon)},
         |${base.forwardSelect("gslat_", "gslon_")}""".stripMargin
    def xSql: String = base.xSql
    def ySql: String = base.ySql
  }

  /** Ellipsoidal Mercator (Snyder PP 1395, eqs. 7-7..7-10) — the
    * normal aspect on the WGS84 ellipsoid (EPSG:3395, "World
    * Mercator", used by hydrographic charts), built from CT 7
    * geokeys. NOT the spherical web-mercator special case (EPSG:3857
    * takes the closed-form column-linear path): y = −a·k0·ln t(φ)
    * with the SAME isometric t as the Lambert cone, so conformality
    * machinery is shared. */
  final case class MercatorEllipsoidal(latTsDeg: Double, lon0Deg: Double,
                                       falseE: Double, falseN: Double,
                                       k0In: Double = 1.0)
      extends Projection {
    import TransverseMercator.{A, E2}
    private val e: Double = Math.sqrt(E2)
    val lam0: Double = Math.toRadians(lon0Deg)
    /** Effective scale: an explicit k0, reduced by a standard
      * parallel when one is given (k0 = m(φts), eq. 7-? — true scale
      * along ±φts). */
    val k0: Double =
      if (latTsDeg == 0.0) k0In
      else {
        val s = Math.sin(Math.toRadians(latTsDeg))
        k0In * Math.cos(Math.toRadians(latTsDeg)) / Math.sqrt(1.0 - E2 * s * s)
      }
    private def tOf(phi: Double): Double = {
      val s = Math.sin(phi)
      Math.tan(Math.PI / 4 - phi / 2) /
        Math.pow((1.0 - e * s) / (1.0 + e * s), e / 2)
    }
    // conformal→geodetic series coefficients (Snyder 3-5)
    private val C1: Double = E2 / 2 + 5 * E2 * E2 / 24 + E2 * E2 * E2 / 12
    private val C2: Double = 7 * E2 * E2 / 48 + 29 * E2 * E2 * E2 / 240
    private val C3: Double = 7 * E2 * E2 * E2 / 120

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val dlam = Math.toRadians(lonDeg) - lam0
      // association mirrors xSql/ySql exactly
      (A * k0 * dlam + falseE,
        -(A * k0) * Math.log(tOf(Math.toRadians(latDeg))) + falseN)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val t = Math.exp(-(y - falseN) / (A * k0))
      val chi = Math.PI / 2 - 2.0 * Math.atan(t)
      val lat = chi + C1 * Math.sin(2 * chi) + C2 * Math.sin(4 * chi) +
        C3 * Math.sin(6 * chi)
      (Math.toDegrees(lat), Math.toDegrees(lam0 + (x - falseE) / (A * k0)))
    }

    /** DuckDB SQL mirror of [[forward]] (same parity contract as the
      * other projections). */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""radians($lon) - ${d(lam0)} AS dlam_,
         |tan(pi() / 4 - radians($lat) / 2) /
         |  power((1.0 - ${d(e)} * sin(radians($lat))) / (1.0 + ${d(e)} * sin(radians($lat))), ${d(e / 2)}) AS t_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(A * k0)} * dlam_ + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"-(${d(A * k0)}) * ln(t_) + ${d(falseN)}"
    }
  }

  object MercatorEllipsoidal {
    /** Build from GeoTIFF projection geokeys (CT 7): standard
      * parallel from 3078/3081 (0 when absent), scale from 3092,
      * central meridian from 3080/3084/3088 (0 when absent — the
      * worldwide-natural default for Mercator, unlike the conics'
      * load-bearing origins), false offsets from 3082/3083. */
    def fromGeoKeys(p: Map[Int, Double]): MercatorEllipsoidal =
      MercatorEllipsoidal(
        latTsDeg = p.getOrElse(3078, p.getOrElse(3081, 0.0)),
        lon0Deg = p.getOrElse(3080, p.getOrElse(3084, p.getOrElse(3088, 0.0))),
        falseE = p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        falseN = p.getOrElse(3083, p.getOrElse(3087, 0.0)),
        k0In = p.getOrElse(3092, 1.0))
  }

  /** Equirectangular / equidistant cylindrical (Snyder PP 1395, eqs.
    * 12-1..12-5, spherical form on the WGS84 authalic-free radius A —
    * the GeoTIFF CT 17 convention for plate-carrée rasters; exact for
    * the common lat_ts = 0 case): x = A·cos(φ1)·Δλ, y = A·φ. The
    * simplest projected CRS real datasets ship in (EPSG:32662 /
    * 4087-style world files). */
  final case class Equirectangular(latTsDeg: Double, lon0Deg: Double,
                                   falseE: Double, falseN: Double)
      extends Projection {
    import TransverseMercator.A
    val lam0: Double = Math.toRadians(lon0Deg)
    val cosTs: Double = Math.cos(Math.toRadians(latTsDeg))

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val dlam = Math.toRadians(lonDeg) - lam0
      // association mirrors xSql/ySql exactly
      (A * cosTs * dlam + falseE,
        A * Math.toRadians(latDeg) + falseN)
    }

    def inverse(x: Double, y: Double): (Double, Double) =
      (Math.toDegrees((y - falseN) / A),
        Math.toDegrees(lam0 + (x - falseE) / (A * cosTs)))

    /** DuckDB SQL mirror of [[forward]]. */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"radians($lat) AS phi_, radians($lon) - ${d(lam0)} AS dlam_"
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(A * cosTs)} * dlam_ + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(A)} * phi_ + ${d(falseN)}"
    }
  }

  object Equirectangular {
    /** Build from GeoTIFF projection geokeys (CT 17): standard
      * parallel 3078/3081 (0 = plate carrée when absent), central
      * meridian 3080/3084/3088, false offsets 3082/3083. */
    def fromGeoKeys(p: Map[Int, Double]): Equirectangular =
      Equirectangular(
        latTsDeg = p.getOrElse(3078, p.getOrElse(3081, 0.0)),
        lon0Deg = p.getOrElse(3080, p.getOrElse(3084, p.getOrElse(3088, 0.0))),
        falseE = p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        falseN = p.getOrElse(3083, p.getOrElse(3087, 0.0)))
  }

  /** Ellipsoidal sinusoidal projection (Snyder PP 1395, eqs.
    * 30-8..30-11) — equal-area pseudocylindrical, the projection the
    * MODIS land-product grid ships in; built from GeoTIFF parameter
    * keys (CT 24). x is true-scale along EVERY parallel (x = ν·cosφ·Δλ),
    * y is the meridian arc — the same Snyder 3-21 series the
    * transverse-mercator family uses, so the constants are shared. */
  final case class Sinusoidal(lon0Deg: Double, falseE: Double, falseN: Double)
      extends Projection {
    import TransverseMercator.{A, E2, M1, M2, M3, M4, P1, P2, P3, P4}
    val lam0: Double = Math.toRadians(lon0Deg)

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = Math.toRadians(latDeg)
      val sinP = Math.sin(phi)
      val dlam = Math.toRadians(lonDeg) - lam0
      // association mirrors xSql/ySql exactly
      (A * dlam * Math.cos(phi) / Math.sqrt(1.0 - E2 * sinP * sinP) + falseE,
        A * (M1 * phi - M2 * Math.sin(2 * phi) +
          M3 * Math.sin(4 * phi) - M4 * Math.sin(6 * phi)) + falseN)
    }

    /** Inverse via the footprint-latitude series (Snyder 3-26), then
      * the closed-form λ (30-11). A northing past the pole's meridian
      * arc has no latitude — that is invalid sinusoidal
      * georeferencing (mis-unitted or corrupt), and silently folding
      * it through cos(φ) ≈ 0 would explode the ingest's derived
      * target grid, so it fails fast here instead. */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val mu = (y - falseN) / (A * M1)
      require(math.abs(mu) <= Math.PI / 2,
        f"northing ${y - falseN}%.1f m is beyond the pole's meridian arc " +
          f"(${A * M1 * Math.PI / 2}%.1f m) — invalid sinusoidal georeferencing")
      val phi = mu + P1 * Math.sin(2 * mu) + P2 * Math.sin(4 * mu) +
        P3 * Math.sin(6 * mu) + P4 * Math.sin(8 * mu)
      val sinP = Math.sin(phi)
      val lon = lam0 +
        (x - falseE) * Math.sqrt(1.0 - E2 * sinP * sinP) / (A * Math.cos(phi))
      (Math.toDegrees(phi), Math.toDegrees(lon))
    }

    /** DuckDB SQL mirror of [[forward]] (same parity contract as the
      * other projections). */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"radians($lat) AS phi_, radians($lon) - ${d(lam0)} AS dlam_"
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(A)} * dlam_ * cos(phi_) / sqrt(1.0 - ${d(E2)} * sin(phi_) * sin(phi_)) + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(A)} * (${d(M1)} * phi_ - ${d(M2)} * sin(2 * phi_) + " +
        s"${d(M3)} * sin(4 * phi_) - ${d(M4)} * sin(6 * phi_)) + ${d(falseN)}"
    }
  }

  object Sinusoidal {
    /** Build from GeoTIFF projection geokeys (CT 24): central
      * meridian from ProjCenterLong (3088; fallbacks 3080/3084 —
      * required even when 0, the load-bearing-georeferencing stance),
      * false offsets from 3082/3083 (or the false-origin pair). */
    def fromGeoKeys(p: Map[Int, Double]): Sinusoidal = {
      val lon0 = Seq(3088, 3080, 3084)
        .collectFirst { case id if p.contains(id) => p(id) }
        .getOrElse(throw new IllegalArgumentException(
          "Sinusoidal GeoKeyDirectory missing ProjCenterLong " +
            "(keys 3088/3080/3084)"))
      Sinusoidal(lon0Deg = lon0,
        falseE = p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        falseN = p.getOrElse(3083, p.getOrElse(3087, 0.0)))
    }
  }

  /** American polyconic (Snyder PP 1395, eqs. 18-12..18-15 forward,
    * 18-16..18-21 inverse) — the classic USGS/IBGE topographic
    * projection, ellipsoidal: each parallel is an arc of its own
    * tangent cone (radius N·cotφ, centered on the central meridian),
    * true to scale along every parallel AND the central meridian.
    * Still the official projection of Brazilian systematic mapping
    * (EPSG:5880 SIRGAS 2000 / Brazil Polyconic); ESRI:54021
    * "World_Polyconic"; GeoTIFF CT 22. Closes a named entry of the
    * arbitrary-CRS residue ("What's missing #1" — the reference warps
    * it by shelling to proj, `unify_projection.sh:13-40`).
    *
    * Forward (closed form — the meridian arc M is the same Snyder
    * 3-21 series the transverse-mercator family uses):
    * E = Δλ·sinφ; x = N·cotφ·sinE; y = M − M₀ + N·cotφ·(1 − cosE);
    * the equator row is the cone-radius limit x = a·Δλ, y = −M₀.
    * Inverse: Snyder's Newton iteration (18-21) on φ, driver-side
    * with a convergence test (the inverse has no SQL mirror — only
    * the forward replays in the oracle). */
  final case class Polyconic(lat0Deg: Double, lon0Deg: Double,
                             falseE: Double, falseN: Double)
      extends Projection {
    import TransverseMercator.{A, E2, M1, M2, M3, M4}
    val lam0: Double = Math.toRadians(lon0Deg)
    /** Meridian arc from the equator, meters (Snyder 3-21). */
    private def arcM(phi: Double): Double =
      A * (M1 * phi - M2 * Math.sin(2 * phi) +
        M3 * Math.sin(4 * phi) - M4 * Math.sin(6 * phi))
    private val m0 = arcM(Math.toRadians(lat0Deg))
    /** The pole's meridian arc (sin terms vanish at φ = π/2). */
    private val mPole = A * M1 * Math.PI / 2.0

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = Math.toRadians(latDeg)
      val dlam = Math.toRadians(lonDeg) - lam0
      val sinP = Math.sin(phi)
      // association mirrors xSql/ySql exactly (incl. the equator CASE)
      if (math.abs(sinP) < 1e-12)
        (A * dlam + falseE, arcM(phi) - m0 + falseN)
      else {
        // cotφ/√(1−e²sin²φ): N·cotφ = A × this
        val cot = (Math.cos(phi) / sinP) / Math.sqrt(1.0 - E2 * sinP * sinP)
        val e = dlam * sinP
        (A * cot * Math.sin(e) + falseE,
          arcM(phi) - m0 + A * cot * (1.0 - Math.cos(e)) + falseN)
      }
    }

    /** Inverse, robust over the full plane (round-15 advice): Snyder's
      * Newton iteration (18-21) first — clamped to (−π/2, π/2), it
      * covers the regional windows — with a bracketed bisection
      * fallback for the wide-Δλ / high-latitude region where Newton
      * diverges. The bisection solves the x-residual
      * `sin(E)/C − |X| = 0` with E recovered from the NORTHING via
      * `E = acos(1 − C·(Y − M/A))` — full-range in [0, π], so points
      * whose parallel arcs ABOVE the pole point (y > mPole, perfectly
      * valid off the central meridian for |E| > π/2) invert too; the
      * residual runs from +∞ (φ→0⁺) to −|X| (φ→pole), so a sign
      * change always brackets the root. λ uses the same full-range E
      * (the naive asin recovery is wrong past |E| = π/2). The
      * beyond-the-pole northing check only applies ON the central
      * meridian (x = 0), the one place it is valid. Every result is
      * verified by the forward map to < 1 mm — a non-invertible
      * coordinate fails fast like the sinusoidal inverse. */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val tx = x - falseE
      val ty = y - falseN
      val yN = (m0 + ty) / A // Snyder's A (normalized northing)
      val xN = tx / A
      if (math.abs(yN) < 1e-12)
        return (0.0, Math.toDegrees(lam0 + xN))
      /** C and M/A at φ (Snyder 18-20 / 3-21). */
      def cOf(phi: Double): Double = {
        val sp = Math.sin(phi)
        Math.sqrt(1.0 - E2 * sp * sp) * sp / Math.cos(phi)
      }
      def maOf(phi: Double): Double =
        M1 * phi - M2 * Math.sin(2 * phi) +
          M3 * Math.sin(4 * phi) - M4 * Math.sin(6 * phi)
      val sgnY = math.signum(yN)
      val sgnX = math.signum(xN)
      val xa = math.abs(xN)
      /** Bracketing E ∈ [0, π] from the northing equation alone —
        * well-conditioned exactly where the bisection runs (wide E);
        * NOT used for the final λ (acos(1−ε) loses √ε precision for
        * small E — metre-scale λ error at world x). */
      def eOf(phi: Double): Double = {
        val arg = 1.0 - cOf(phi) * (math.abs(yN) - maOf(phi))
        Math.acos(math.max(-1.0, math.min(1.0, arg)))
      }
      /** Final E ∈ [0, π] via atan2 over BOTH equations — the sine
        * component (x·C, exact to the ulp) carries the precision for
        * small E, the cosine component for E near π. */
      def eFinal(phiAbs: Double): Double = {
        val c = cOf(phiAbs)
        Math.atan2(xa * c, 1.0 - c * (math.abs(yN) - maOf(phiAbs)))
      }
      val lim = Math.PI / 2 - 1e-9
      def finish(phiAbs: Double): (Double, Double) = {
        val phi = sgnY * phiAbs
        val dlam =
          if (xa == 0.0) 0.0
          else sgnX * eFinal(phiAbs) / Math.sin(phiAbs)
        val (fx, fy) = forward(Math.toDegrees(phi), Math.toDegrees(lam0 + dlam))
        require(math.abs(fx - x) <= 1e-3 && math.abs(fy - y) <= 1e-3,
          f"polyconic inverse failed to verify at ($tx%.1f, $ty%.1f) m")
        (Math.toDegrees(phi), Math.toDegrees(lam0 + dlam))
      }
      // -------- Newton (Snyder 18-21), clamped; fast path
      val bB = xN * xN + yN * yN
      var phi = math.max(-lim, math.min(lim, yN))
      var converged = false
      var iter = 0
      while (!converged && iter < 60) {
        val sp = Math.sin(phi)
        val s2 = Math.sin(2 * phi)
        val c = cOf(phi)
        val ma = maOf(phi)
        val mp = M1 - 2 * M2 * Math.cos(2 * phi) +
          4 * M3 * Math.cos(4 * phi) - 6 * M4 * Math.cos(6 * phi)
        val num = yN * (c * ma + 1.0) - ma - 0.5 * (ma * ma + bB) * c
        val den = E2 * s2 * (ma * ma + bB - 2.0 * yN * ma) / (4.0 * c) +
          (yN - ma) * (c * mp - 2.0 / s2) - mp
        val next = phi - num / den
        if (next.isNaN) { iter = 60 }
        else {
          val clamped = math.max(-lim, math.min(lim, next))
          if (math.abs(clamped - phi) < 1e-14) converged = true
          phi = clamped
          iter += 1
        }
      }
      if (converged && math.signum(phi) == sgnY) {
        try return finish(math.abs(phi))
        catch { case _: IllegalArgumentException => () } // fall through
      }
      // -------- bracketed bisection on the x-residual (full plane)
      if (xa == 0.0) {
        // on the central meridian E = 0 and y = M − M₀: the northing
        // really is bounded by the pole's arc, and M is monotone
        require(math.abs(yN) <= mPole / A * (1.0 + 1e-12),
          f"northing $ty%.1f m on the central meridian is beyond the " +
            f"pole's meridian arc (${mPole - m0}%.1f m) — invalid " +
            "polyconic georeferencing")
        var loP = 0.0
        var hiP = Math.PI / 2
        var i = 0
        while (i < 100) { // M/A is increasing in φ
          val mid = 0.5 * (loP + hiP)
          if (maOf(mid) < math.abs(yN)) loP = mid else hiP = mid
          i += 1
        }
        return finish(0.5 * (loP + hiP))
      }
      def resid(phiAbs: Double): Double = {
        val e = eOf(phiAbs)
        Math.sin(e) / cOf(phiAbs) - xa
      }
      // r(0⁺) → +∞, r(pole⁻) → −|X|: walk inward from the pole to
      // find the sign flip, then bisect
      var hiP = lim
      var loP = hiP
      var step = Math.PI / 512
      var found = false
      while (!found && loP > 1e-12) {
        loP = math.max(1e-12, loP - step)
        if (resid(loP) > 0.0) found = true
        else { hiP = loP; step *= 1.5 }
      }
      require(found && resid(hiP) <= 0.0,
        f"polyconic inverse found no latitude bracket at " +
          f"($tx%.1f, $ty%.1f) m — invalid polyconic georeferencing")
      var i = 0
      while (i < 100) {
        val mid = 0.5 * (loP + hiP)
        if (resid(mid) > 0.0) loP = mid else hiP = mid
        i += 1
      }
      finish(0.5 * (loP + hiP))
    }

    /** Both poles are single finite plane points on the central
      * meridian (cotφ → 0 kills x for every longitude) — declared so
      * a pole-containing lattice takes the covered-cap path. */
    override def planeSingularities: Seq[(Double, Double, Double)] =
      Seq((falseE, mPole - m0 + falseN, 90.0),
        (falseE, -mPole - m0 + falseN, -90.0))

    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""radians($lat) AS pcphi_,
         |radians($lon) - ${d(lam0)} AS pcdlam_,
         |sin(radians($lat)) AS pcsin_,
         |CASE WHEN abs(pcsin_) < ${d(1e-12)} THEN ${d(0.0)}
         |  ELSE (cos(pcphi_) / pcsin_) /
         |    sqrt(1.0 - ${d(E2)} * pcsin_ * pcsin_) END AS pccot_,
         |pcdlam_ * pcsin_ AS pce_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"CASE WHEN abs(pcsin_) < ${d(1e-12)} THEN ${d(A)} * pcdlam_ + ${d(falseE)} " +
        s"ELSE ${d(A)} * pccot_ * sin(pce_) + ${d(falseE)} END"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(A)} * (${d(M1)} * pcphi_ - ${d(M2)} * sin(2 * pcphi_) + " +
        s"${d(M3)} * sin(4 * pcphi_) - ${d(M4)} * sin(6 * pcphi_)) - ${d(m0)} + " +
        s"(CASE WHEN abs(pcsin_) < ${d(1e-12)} THEN ${d(0.0)} " +
        s"ELSE ${d(A)} * pccot_ * (1.0 - cos(pce_)) END) + ${d(falseN)}"
    }
  }

  object Polyconic {
    /** ESRI:54021 — World Polyconic. */
    val world: Polyconic = Polyconic(0.0, 0.0, 0.0, 0.0)
    /** EPSG:5880 — SIRGAS 2000 / Brazil Polyconic (GRS80 figure; the
      * usual below-mm GIS-practice equivalence with WGS84). */
    val brazil: Polyconic = Polyconic(0.0, -54.0, 5000000.0, 10000000.0)
    /** Build from GeoTIFF projection geokeys (CT 22): natural-origin
      * latitude 3081 (falling back to the false-origin key 3085;
      * 0 when absent — both ESRI 54021 and EPSG 5880 sit on the
      * equator), central meridian from 3080/3084/3088 (required even
      * when 0, the load-bearing-georeferencing stance), false offsets
      * 3082/3083 (or the false-origin pair). */
    def fromGeoKeys(p: Map[Int, Double]): Polyconic = {
      val lon0 = Seq(3080, 3084, 3088)
        .collectFirst { case id if p.contains(id) => p(id) }
        .getOrElse(throw new IllegalArgumentException(
          "Polyconic GeoKeyDirectory missing ProjNatOriginLong " +
            "(keys 3080/3084/3088)"))
      Polyconic(lat0Deg = p.getOrElse(3081, p.getOrElse(3085, 0.0)),
        lon0Deg = lon0,
        falseE = p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        falseN = p.getOrElse(3083, p.getOrElse(3087, 0.0)))
    }
  }

  /** Mollweide (Snyder PP 1395, eqs. 31-1..31-8) — the standard
    * global EQUAL-AREA pseudocylindrical (ESRI:54009
    * "World_Mollweide"): the CRS global land-cover / ecology /
    * species-range rasters commonly ship in, and a named gap in the
    * arbitrary-CRS residue ("What's missing #1" — the reference warps
    * it by shelling to proj, `unify_projection.sh:13-40`). SPHERICAL
    * on R = a (proj's stance: `+proj=moll` has no ellipsoidal form;
    * GDAL warps 54009 on the a-sphere).
    *
    * Forward: the auxiliary angle θ solves 2θ + sin 2θ = π sin φ —
    * transcendental, so [[NewtonIters]] Newton steps from θ₀ = φ run
    * as a FIXED unrolled sequence (no convergence test: the oracle
    * replays the identical iterate chain, so parity is ulp-exact by
    * construction; 12 steps reach the float64 fixed point for
    * |φ| ≤ 85° — verified — and land within 8 mm at 89.9°, noise at
    * the 10⁴-m lattice scale). Then x = (2√2/π)·R·Δλ·cos θ,
    * y = √2·R·sin θ. The poles map to single plane points
    * (0, ±√2·R) — declared as [[planeSingularities]] exactly like the
    * azimuthal families, so a pole-containing lattice takes the
    * covered-cap path. */
  final case class Mollweide(lon0Deg: Double, falseE: Double, falseN: Double)
      extends Projection {
    import TransverseMercator.A
    import Mollweide.NewtonIters
    val lam0: Double = Math.toRadians(lon0Deg)
    private val sqrt2: Double = Math.sqrt(2.0)
    /** x scale constant 2√2·R/π — ONE precomputed double, embedded as
      * the same literal in the SQL mirror (association parity). */
    val cx: Double = A * 2.0 * sqrt2 / Math.PI
    val cy: Double = A * sqrt2

    private def theta(phi: Double): Double = {
      // exact-pole guard (θ* = ±π/2 makes Newton's 0/0 there); pixel
      // centers never sit at ±90 but the guard keeps the function
      // total — mirrored verbatim in SQL
      if (math.abs(phi) >= Math.PI / 2) math.signum(phi) * (Math.PI / 2)
      else {
        val ps = Math.PI * Math.sin(phi)
        var th = phi
        var i = 0
        while (i < NewtonIters) {
          th = th - (2.0 * th + Math.sin(2.0 * th) - ps) /
            (2.0 + 2.0 * Math.cos(2.0 * th))
          i += 1
        }
        th
      }
    }

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val th = theta(Math.toRadians(latDeg))
      val dlam = Math.toRadians(lonDeg) - lam0
      // association mirrors xSql/ySql exactly
      (cx * dlam * Math.cos(th) + falseE, cy * Math.sin(th) + falseN)
    }

    /** Closed-form inverse (31-6..31-8). A northing beyond ±√2·R is
      * off the map — invalid Mollweide georeferencing, failed fast
      * like the sinusoidal's beyond-pole northing. At the pole rows
      * cos θ = 0 collapses every longitude to the pole point; λ₀ is
      * returned (any λ is correct there). */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val sinTh = (y - falseN) / cy
      require(math.abs(sinTh) <= 1.0 + 1e-12,
        f"northing ${y - falseN}%.1f m is beyond the pole image " +
          f"(${cy}%.1f m) — invalid Mollweide georeferencing")
      val th = Math.asin(math.max(-1.0, math.min(1.0, sinTh)))
      val lat = Math.asin(math.max(-1.0, math.min(1.0,
        (2.0 * th + Math.sin(2.0 * th)) / Math.PI)))
      val cosTh = Math.cos(th)
      val lon =
        if (cosTh < 1e-12) lam0
        else lam0 + (x - falseE) / (cx * cosTh)
      (Math.toDegrees(lat), Math.toDegrees(lon))
    }

    /** Both poles are single finite plane points on the central
      * meridian. */
    override def planeSingularities: Seq[(Double, Double, Double)] =
      Seq((falseE, cy + falseN, 90.0), (falseE, -cy + falseN, -90.0))

    /** DuckDB SQL mirror of [[forward]]: the identical unrolled
      * Newton chain (same parity contract as the other projections).
      * Each step binds the previous iterate ONCE through a
      * single-element `list_transform` lambda — the naive
      * `mth - f(mth)/f'(mth)` alias chain references its predecessor
      * 4×, and DuckDB expands lateral aliases TEXTUALLY, so 12 steps
      * blow up to 4¹² ≈ 16M expression copies (measured: the oracle
      * stopped returning); the lambda form is linear and computes the
      * same doubles in the same order. */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      val sb = new StringBuilder(
        s"""radians($lat) AS mphi_,
           |radians($lon) - ${d(lam0)} AS mdlam_,
           |${d(Math.PI)} * sin(mphi_) AS mps_,
           |mphi_ AS mth0_""".stripMargin)
      for (i <- 1 to NewtonIters) {
        val p = i - 1
        sb ++= s""",
           |list_transform([mth${p}_], th_ -> th_ - (2.0 * th_ + sin(2.0 * th_) - mps_) / (2.0 + 2.0 * cos(2.0 * th_)))[1] AS mth${i}_"""
      }
      sb ++= s""",
           |CASE WHEN abs(mphi_) >= ${d(Math.PI / 2)}
           |  THEN CASE WHEN mphi_ >= 0 THEN ${d(Math.PI / 2)} ELSE ${d(-Math.PI / 2)} END
           |  ELSE mth${NewtonIters}_ END AS mth_"""
      sb.result()
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(cx)} * mdlam_ * cos(mth_) + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(cy)} * sin(mth_) + ${d(falseN)}"
    }
  }

  object Mollweide {
    /** Fixed Newton-step count (see class doc: fixed-count unrolling
      * is what makes the SQL replay bit-exact). */
    val NewtonIters: Int = 12
    /** ESRI:54009 — World Mollweide (λ₀ = 0, no false offsets). */
    val world: Mollweide = Mollweide(0.0, 0.0, 0.0)
  }

  /** Eckert IV (Snyder & Voxland, An Album of Map Projections, PP
    * 1453) — Mollweide's pole-LINE sibling (ESRI:54012
    * "World_Eckert_IV"): the other standard global equal-area
    * pseudocylindrical for thematic / land-cover world rasters.
    * SPHERICAL on R = a, the same stance as [[Mollweide]].
    *
    * Forward: the auxiliary θ solves θ + sin θ·cos θ + 2 sin θ =
    * (2 + π/2)·sin φ — transcendental like Mollweide's, so
    * [[EckertIV.NewtonIters]] Newton steps from θ₀ = φ/2 run as a
    * FIXED unrolled chain mirrored in SQL. Then
    * x = cx·R·Δλ·(1 + cos θ), y = cy·R·sin θ with
    * cx = 2/√(π(4+π)) and cy = 2√(π/(4+π)); cy ≡ π·cx (an exact
    * identity — coded that way so the 2:1 world-frame ratio is
    * structural, not a matching pair of literals). Unlike Mollweide
    * the POLES MAP TO LINES (length half the equator: 1+cos(π/2)=1),
    * so there are NO plane singularities and the inverse is total:
    * 1 + cos θ ≥ 1 everywhere on the map, no division hazard.
    *
    * Equal-area is EXACT by construction: the Jacobian works out to
    * cx·cy·(2+π/2)/2 · R²·cos φ = R²·cos φ (the constant product is
    * identically 1) — WarpSpec pins the property numerically, which
    * verifies the constants without an external worked example. */
  final case class EckertIV(lon0Deg: Double, falseE: Double, falseN: Double)
      extends Projection {
    import TransverseMercator.A
    import EckertIV.{NewtonIters, SinCoef}
    val lam0: Double = Math.toRadians(lon0Deg)
    /** x constant 2/√(π(4+π)) scaled by R. */
    val cx: Double = A * 2.0 / Math.sqrt(Math.PI * (4.0 + Math.PI))
    /** y constant — exactly π·cx (see class doc). */
    val cy: Double = cx * Math.PI

    private def theta(phi: Double): Double = {
      // exact-pole guard: θ* = ±π/2 is a stationary point of the
      // Newton denominator 2 cos θ (1 + cos θ); pixel centers never
      // sit at ±90 but the guard keeps the function total — mirrored
      // verbatim in SQL
      if (math.abs(phi) >= Math.PI / 2) math.signum(phi) * (Math.PI / 2)
      else {
        val ps = SinCoef * Math.sin(phi)
        var th = phi / 2.0
        var i = 0
        while (i < NewtonIters) {
          th = th - (th + Math.sin(th) * Math.cos(th) + 2.0 * Math.sin(th) - ps) /
            (2.0 * Math.cos(th) * (1.0 + Math.cos(th)))
          i += 1
        }
        th
      }
    }

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val th = theta(Math.toRadians(latDeg))
      val dlam = Math.toRadians(lonDeg) - lam0
      (cx * dlam * (1.0 + Math.cos(th)) + falseE, cy * Math.sin(th) + falseN)
    }

    /** Closed-form inverse. A northing beyond ±cy·R is off the map —
      * failed fast like Mollweide's. The pole rows are LINES
      * (1 + cos θ = 1), so λ recovers everywhere. */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val sinTh = (y - falseN) / cy
      require(math.abs(sinTh) <= 1.0 + 1e-12,
        f"northing ${y - falseN}%.1f m is beyond the pole line " +
          f"(${cy}%.1f m) — invalid Eckert IV georeferencing")
      val th = Math.asin(math.max(-1.0, math.min(1.0, sinTh)))
      val lat = Math.asin(math.max(-1.0, math.min(1.0,
        (th + Math.sin(th) * Math.cos(th) + 2.0 * Math.sin(th)) / SinCoef)))
      val lon = lam0 + (x - falseE) / (cx * (1.0 + Math.cos(th)))
      (Math.toDegrees(lat), Math.toDegrees(lon))
    }

    /** DuckDB SQL mirror of [[forward]]: the identical unrolled Newton
      * chain, each step binding its predecessor ONCE through a
      * single-element list_transform lambda (the Mollweide 4¹²-copies
      * lesson — the naive alias chain inlines textually). */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      val sb = new StringBuilder(
        s"""radians($lat) AS kphi_,
           |radians($lon) - ${d(lam0)} AS kdlam_,
           |${d(SinCoef)} * sin(kphi_) AS kps_,
           |kphi_ / 2.0 AS kth0_""".stripMargin)
      for (i <- 1 to NewtonIters) {
        val p = i - 1
        sb ++= s""",
           |list_transform([kth${p}_], th_ -> th_ - (th_ + sin(th_) * cos(th_) + 2.0 * sin(th_) - kps_) / (2.0 * cos(th_) * (1.0 + cos(th_))))[1] AS kth${i}_"""
      }
      sb ++= s""",
           |CASE WHEN abs(kphi_) >= ${d(Math.PI / 2)}
           |  THEN CASE WHEN kphi_ >= 0 THEN ${d(Math.PI / 2)} ELSE ${d(-Math.PI / 2)} END
           |  ELSE kth${NewtonIters}_ END AS kth_"""
      sb.result()
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(cx)} * kdlam_ * (1.0 + cos(kth_)) + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(cy)} * sin(kth_) + ${d(falseN)}"
    }
  }

  object EckertIV {
    /** Fixed Newton-step count: θ₀ = φ/2 reaches the float64 fixed
      * point well inside 14 steps for |φ| ≤ 89° (the denominator
      * only degenerates AT the pole, which the guard owns) —
      * WarpSpec measures the residual across the latitude range. */
    val NewtonIters: Int = 14
    /** The RHS coefficient 2 + π/2. */
    val SinCoef: Double = 2.0 + Math.PI / 2.0
    /** ESRI:54012 — World Eckert IV (λ₀ = 0, no false offsets). */
    val world: EckertIV = EckertIV(0.0, 0.0, 0.0)
  }

  /** Robinson (Robinson 1974, "A New Map Projection"; Snyder &
    * Voxland, An Album of Map Projections, PP 1453) — the NatGeo /
    * world-atlas COMPROMISE pseudocylindrical (ESRI:54030
    * "World_Robinson"), the most-requested residue of the
    * arbitrary-`+proj` gap (the reference warps it by shelling to
    * proj, `batch/scripts/unify_projection.sh:13-40`). SPHERICAL on
    * R = a, the [[Mollweide]] stance.
    *
    * Robinson is TABLE-DEFINED, not formula-defined: the published
    * 5°-interval table gives the parallel-length factor X(φ) and the
    * pole-distance factor Y(φ); x = 0.8487·R·X·Δλ and
    * y = ±1.3523·R·Y (the standard scale constants). Between nodes
    * this implementation interpolates with a NATURAL CUBIC SPLINE
    * over the uniform knot grid u = φ/5° — our documented variant of
    * the interpolation the projection leaves open (proj ships its own
    * precomputed cubic table; Robinson himself used Aitken central
    * interpolation; all pass through the same published nodes, which
    * WarpSpec pins exactly). The 18 per-segment Horner coefficient
    * quadruples are computed ONCE (a Thomas solve at class init) and
    * embedded as the same double literals in the SQL mirror, so the
    * oracle replays the identical piecewise polynomial — the
    * fixed-iterate parity contract of [[Mollweide]], with a spline
    * table in place of a Newton chain.
    *
    * The poles are LINES (X(90°) = 0.5322 > 0), so like [[EckertIV]]
    * there are no plane singularities and the inverse is total in x;
    * a northing beyond ±1.3523·R fails fast. The inverse latitude
    * solves the monotone Y spline by bisection (driver-side only —
    * the warp's per-pixel hot path is the forward). */
  final case class Robinson(lon0Deg: Double, falseE: Double, falseN: Double)
      extends Projection {
    import TransverseMercator.A
    import Robinson._
    val lam0: Double = Math.toRadians(lon0Deg)
    /** x scale 0.8487·R and y scale 1.3523·R (the published scaling
      * constants), embedded as the same literals in the SQL mirror. */
    val cx: Double = A * FXC
    val cy: Double = A * FYC

    /** Horner evaluation of one spline segment — the association the
      * SQL mirror replays verbatim. */
    private def interp(coef: Array[Array[Double]], absLatDeg: Double): Double = {
      val k = math.min(Segments - 1, (absLatDeg / 5.0).toInt)
      val t = absLatDeg / 5.0 - k
      val c = coef(k)
      ((c(3) * t + c(2)) * t + c(1)) * t + c(0)
    }

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val absLat = math.abs(latDeg)
      val xf = interp(SplineX, absLat)
      val yf = interp(SplineY, absLat)
      val sign = if (latDeg >= 0) 1.0 else -1.0
      // association mirrors xSql/ySql exactly
      (cx * xf * (Math.toRadians(lonDeg) - lam0) + falseE,
        cy * sign * yf + falseN)
    }

    /** Inverse: latitude from the monotone Y spline by bisection (64
      * halvings reach float64 noise), longitude from the recovered
      * parallel-length factor. Total in x (pole LINES, X ≥ 0.5322). */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val yy = (y - falseN) / cy
      require(math.abs(yy) <= 1.0 + 1e-12,
        f"northing ${y - falseN}%.1f m is beyond the pole line " +
          f"(${cy}%.1f m) — invalid Robinson georeferencing")
      val ay = math.min(1.0, math.abs(yy))
      var lo = 0.0
      var hi = 90.0
      var i = 0
      while (i < 64) {
        val mid = 0.5 * (lo + hi)
        if (interp(SplineY, mid) < ay) lo = mid else hi = mid
        i += 1
      }
      val absLat = 0.5 * (lo + hi)
      val lat = (if (yy >= 0) 1.0 else -1.0) * absLat
      val lon = lam0 + (x - falseE) / (cx * interp(SplineX, absLat))
      (lat, Math.toDegrees(lon))
    }

    /** DuckDB SQL mirror of [[forward]]: segment lookup through list
      * literals of the SAME spline coefficients, the same Horner
      * association, the same sign fold. */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      def lst(cs: Array[Array[Double]], j: Int): String =
        cs.map(c => d(c(j))).mkString("[", ", ", "]")
      def horner(p: String): String =
        s"((${p}3_[rk_ + 1] * rt_ + ${p}2_[rk_ + 1]) * rt_ + " +
          s"${p}1_[rk_ + 1]) * rt_ + ${p}0_[rk_ + 1]"
      s"""abs($lat) AS rlat_,
         |CAST(least(floor(abs($lat) / 5.0), ${Segments - 1}.0) AS INT) AS rk_,
         |abs($lat) / 5.0 - rk_ AS rt_,
         |${lst(SplineX, 0)} AS rx0_, ${lst(SplineX, 1)} AS rx1_,
         |${lst(SplineX, 2)} AS rx2_, ${lst(SplineX, 3)} AS rx3_,
         |${lst(SplineY, 0)} AS ry0_, ${lst(SplineY, 1)} AS ry1_,
         |${lst(SplineY, 2)} AS ry2_, ${lst(SplineY, 3)} AS ry3_,
         |${horner("rx")} AS rX_,
         |${horner("ry")} AS rY_,
         |CASE WHEN $lat >= 0 THEN CAST(1.0 AS DOUBLE)
         |  ELSE CAST(-1.0 AS DOUBLE) END AS rsign_,
         |radians($lon) - ${d(lam0)} AS rdlam_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(cx)} * rX_ * rdlam_ + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(cy)} * rsign_ * rY_ + ${d(falseN)}"
    }
  }

  object Robinson {
    /** The published scale constants: x = 0.8487·R·X·Δλ,
      * y = 1.3523·R·Y. */
    val FXC: Double = 0.8487
    val FYC: Double = 1.3523
    /** Robinson's published 5°-interval table: parallel-length factor
      * X and pole-distance factor Y at φ = 0, 5, …, 90. */
    val TableX: Array[Double] = Array(
      1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600, 0.9427,
      0.9216, 0.8962, 0.8679, 0.8350, 0.7986, 0.7597, 0.7186, 0.6732,
      0.6213, 0.5722, 0.5322)
    val TableY: Array[Double] = Array(
      0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720, 0.4340,
      0.4958, 0.5571, 0.6176, 0.6769, 0.7346, 0.7903, 0.8435, 0.8936,
      0.9394, 0.9761, 1.0000)
    val Segments: Int = TableX.length - 1

    /** Natural-cubic-spline segment coefficients over the uniform
      * knot grid (knot spacing 1 in u = φ/5°): a Thomas solve for the
      * second derivatives (M₀ = M_n = 0), then the standard
      * per-segment quadruple (a, b, c, d) with
      * S_k(t) = a + b·t + c·t² + d·t³, t ∈ [0, 1]. Computed once in
      * plain doubles; the SQL mirror embeds the identical values. */
    private def spline(ys: Array[Double]): Array[Array[Double]] = {
      val n = ys.length - 1
      // tridiagonal (1, 4, 1)·M = 6·Δ²y, natural ends
      val m = new Array[Double](n + 1)
      val cp = new Array[Double](n + 1)
      val dp = new Array[Double](n + 1)
      var i = 1
      while (i < n) {
        val rhs = 6.0 * (ys(i + 1) - 2.0 * ys(i) + ys(i - 1))
        val denom = 4.0 - (if (i == 1) 0.0 else cp(i - 1))
        cp(i) = 1.0 / denom
        dp(i) = (rhs - (if (i == 1) 0.0 else dp(i - 1))) / denom
        i += 1
      }
      i = n - 1
      while (i >= 1) {
        m(i) = dp(i) - cp(i) * m(i + 1)
        i -= 1
      }
      Array.tabulate(n) { k =>
        Array(
          ys(k),
          ys(k + 1) - ys(k) - m(k) / 3.0 - m(k + 1) / 6.0,
          m(k) / 2.0,
          (m(k + 1) - m(k)) / 6.0)
      }
    }
    val SplineX: Array[Array[Double]] = spline(TableX)
    val SplineY: Array[Array[Double]] = spline(TableY)

    /** ESRI:54030 — World Robinson (λ₀ = 0, no false offsets). */
    val world: Robinson = Robinson(0.0, 0.0, 0.0)

    /** Build from GeoTIFF projection geokeys (CT 23 — how a Robinson
      * raster in the wild actually declares itself: ProjectedCSType
      * 32767 + CoordTrans 23, not the ESRI registry code): central
      * meridian from ProjCenterLong (3088; fallbacks 3080/3084 — the
      * Sinusoidal convention), false offsets from 3082/3083 (or the
      * false-origin pair). */
    def fromGeoKeys(p: Map[Int, Double]): Robinson = {
      val lon0 = Seq(3088, 3080, 3084)
        .collectFirst { case id if p.contains(id) => p(id) }
        .getOrElse(throw new IllegalArgumentException(
          "Robinson GeoKeyDirectory missing ProjCenterLong " +
            "(keys 3088/3080/3084)"))
      Robinson(lon0Deg = lon0,
        falseE = p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        falseN = p.getOrElse(3083, p.getOrElse(3087, 0.0)))
    }
  }

  /** Miller cylindrical (Miller 1942; Snyder PP 1395, eqs.
    * 18-1..18-4) — the compromise world cylinder (ESRI:54003
    * "World_Miller_Cylindrical", GeoTIFF CT 20): Mercator's y
    * compressed by 0.8 so the poles land at finite lines. SPHERICAL
    * on R = a. Closed form BOTH ways:
    *   x = R·Δλ,   y = (R/0.8)·ln tan(π/4 + 0.4·φ)
    *   φ = 2.5·atan(exp(0.8·y/R)) − 0.625·π,  λ = λ₀ + x/R
    * Pole lines at y = ±(R/0.8)·ln tan(0.45π); no singularities. */
  final case class MillerCylindrical(lon0Deg: Double, falseE: Double,
                                     falseN: Double) extends Projection {
    import TransverseMercator.A
    val lam0: Double = Math.toRadians(lon0Deg)
    /** Pole-line |y| (the map frame bound, used for the fail-fast). */
    val yPole: Double = A / 0.8 * Math.log(Math.tan(Math.PI / 4.0 + 0.4 * (Math.PI / 2.0)))

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = Math.toRadians(latDeg)
      // association mirrors xSql/ySql exactly
      (A * (Math.toRadians(lonDeg) - lam0) + falseE,
        A / 0.8 * Math.log(Math.tan(Math.PI / 4.0 + 0.4 * phi)) + falseN)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val ty = y - falseN
      require(math.abs(ty) <= yPole * (1.0 + 1e-12),
        f"northing $ty%.1f m is beyond the pole line ($yPole%.1f m) " +
          "— invalid Miller georeferencing")
      val phi = 2.5 * Math.atan(Math.exp(0.8 * ty / A)) - 0.625 * Math.PI
      (Math.toDegrees(phi), Math.toDegrees(lam0 + (x - falseE) / A))
    }

    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""radians($lat) AS lphi_,
         |radians($lon) - ${d(lam0)} AS ldlam_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(TransverseMercator.A)} * ldlam_ + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(TransverseMercator.A / 0.8)} * ln(tan(${d(Math.PI / 4.0)} + " +
        s"0.4 * lphi_)) + ${d(falseN)}"
    }
  }

  object MillerCylindrical {
    /** ESRI:54003 — World Miller Cylindrical. */
    val world: MillerCylindrical = MillerCylindrical(0.0, 0.0, 0.0)
    /** Build from CT 20 geokeys (the Sinusoidal key convention). */
    def fromGeoKeys(p: Map[Int, Double]): MillerCylindrical = {
      val lon0 = Seq(3088, 3080, 3084)
        .collectFirst { case id if p.contains(id) => p(id) }
        .getOrElse(throw new IllegalArgumentException(
          "Miller GeoKeyDirectory missing ProjCenterLong (keys 3088/3080/3084)"))
      MillerCylindrical(lon0, p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        p.getOrElse(3083, p.getOrElse(3087, 0.0)))
    }
  }

  /** Azimuthal equidistant, spherical (Snyder PP 1395, eqs.
    * 25-1..25-4 / 20-14..20-18) — distances from the center are TRUE
    * (the UN-emblem projection; ESRI:54032
    * "World_Azimuthal_Equidistant", GeoTIFF CT 12; polar aspects
    * serve ground stations and ice datasets). SPHERICAL on R = a.
    *
    * Forward: c = acos(sin φ₁ sin φ + cos φ₁ cos φ cos Δλ) is the
    * angular distance; k = c / sin c (→ 1 at the center, guarded);
    * x = R·k·cos φ·sin Δλ, y = R·k·(cos φ₁ sin φ − sin φ₁ cos φ cos Δλ).
    * The ANTIPODE (c = π) is the one singular plane image — the whole
    * outer circle |r| = πR maps there; pixel centers never sit on it
    * and the inverse fails fast past the rim. Closed-form inverse
    * (20-14..20-17): c = r/R, φ = asin(cos c sin φ₁ + y sin c cos φ₁ / r),
    * λ by the polar-safe atan2 forms. */
  final case class AzimuthalEquidistant(lat0Deg: Double, lon0Deg: Double,
                                        falseE: Double, falseN: Double)
      extends Projection {
    import TransverseMercator.A
    val lam0: Double = Math.toRadians(lon0Deg)
    private val phi1 = Math.toRadians(lat0Deg)
    private val sinP1 = Math.sin(phi1)
    private val cosP1 = Math.cos(phi1)

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = Math.toRadians(latDeg)
      val dlam = Math.toRadians(lonDeg) - lam0
      val cosC = math.max(-1.0, math.min(1.0,
        sinP1 * Math.sin(phi) + cosP1 * Math.cos(phi) * Math.cos(dlam)))
      val c = Math.acos(cosC)
      val k = if (c < 1e-12) 1.0 else c / Math.sin(c)
      // association mirrors xSql/ySql exactly
      (A * k * Math.cos(phi) * Math.sin(dlam) + falseE,
        A * k * (cosP1 * Math.sin(phi) - sinP1 * Math.cos(phi) * Math.cos(dlam))
          + falseN)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val tx = x - falseE
      val ty = y - falseN
      val r = Math.sqrt(tx * tx + ty * ty)
      require(r <= A * Math.PI * (1.0 + 1e-12),
        f"radius $r%.1f m is beyond the antipodal rim (${A * Math.PI}%.1f m)" +
          " — invalid azimuthal-equidistant georeferencing")
      if (r < 1e-9) return (lat0Deg, lon0Deg)
      val c = r / A
      val sinC = Math.sin(c)
      val cosC = Math.cos(c)
      val phi = Math.asin(math.max(-1.0, math.min(1.0,
        cosC * sinP1 + ty * sinC * cosP1 / r)))
      val lam =
        if (math.abs(cosP1) < 1e-12) {
          // polar aspects: the atan2 form degenerates cleanly
          if (sinP1 > 0) lam0 + Math.atan2(tx, -ty)
          else lam0 + Math.atan2(tx, ty)
        } else lam0 + Math.atan2(tx * sinC,
          r * cosP1 * cosC - ty * sinP1 * sinC)
      (Math.toDegrees(phi), Math.toDegrees(lam))
    }

    /** Both poles are single finite plane points on the central
      * meridian, at true distance R·(π/2 ∓ φ₁) from the center —
      * declared so a pole-containing lattice takes the covered-cap
      * path (the Mollweide/LAEA convention). */
    override def planeSingularities: Seq[(Double, Double, Double)] =
      Seq((falseE, A * (Math.PI / 2.0 - phi1) + falseN, 90.0),
        (falseE, -(A * (Math.PI / 2.0 + phi1)) + falseN, -90.0))

    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""radians($lat) AS aphi_,
         |radians($lon) - ${d(lam0)} AS adlam_,
         |acos(greatest(${d(-1.0)}, least(${d(1.0)},
         |  ${d(sinP1)} * sin(aphi_) + ${d(cosP1)} * cos(aphi_) * cos(adlam_)))) AS ac_,
         |CASE WHEN ac_ < ${d(1e-12)} THEN ${d(1.0)}
         |  ELSE ac_ / sin(ac_) END AS ak_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(TransverseMercator.A)} * ak_ * cos(aphi_) * sin(adlam_) + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(TransverseMercator.A)} * ak_ * (${d(cosP1)} * sin(aphi_) - " +
        s"${d(sinP1)} * cos(aphi_) * cos(adlam_)) + ${d(falseN)}"
    }
  }

  object AzimuthalEquidistant {
    /** ESRI:54032 — World Azimuthal Equidistant (center 0°N 0°E). */
    val world: AzimuthalEquidistant = AzimuthalEquidistant(0.0, 0.0, 0.0, 0.0)
    /** Build from CT 12 geokeys: center from ProjCenterLat/Long
      * (3089/3088; NatOrigin 3081/3080 fallbacks), false offsets
      * 3082/3083. */
    def fromGeoKeys(p: Map[Int, Double]): AzimuthalEquidistant = {
      val lat0 = Seq(3089, 3081, 3085)
        .collectFirst { case id if p.contains(id) => p(id) }
        .getOrElse(throw new IllegalArgumentException(
          "Azimuthal-equidistant GeoKeyDirectory missing ProjCenterLat " +
            "(keys 3089/3081/3085)"))
      val lon0 = Seq(3088, 3080, 3084)
        .collectFirst { case id if p.contains(id) => p(id) }
        .getOrElse(throw new IllegalArgumentException(
          "Azimuthal-equidistant GeoKeyDirectory missing ProjCenterLong " +
            "(keys 3088/3080/3084)"))
      AzimuthalEquidistant(lat0, lon0,
        p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        p.getOrElse(3083, p.getOrElse(3087, 0.0)))
    }
  }

  /** Van der Grinten (1904; Snyder PP 1395, eqs. 33-1..33-23) — the
    * circle-bounded compromise world map (National Geographic's world
    * CRS 1922–1988; ESRI:54029 "World_Van_der_Grinten_I", GeoTIFF
    * CT 25). SPHERICAL on R = a. Closed form BOTH ways: the forward
    * is Snyder's A/G/P/Q algebra with the equator and central
    * meridian as explicit branches (mirrored verbatim as SQL CASEs);
    * the inverse solves the latitude cubic by the trigonometric
    * method (33-14..33-23), driver-side. The whole world fits the
    * radius-πR circle; beyond it fails fast. The poles are single
    * plane points (0, ±πR·tan(asin(1)/2)) = (0, ±πR) — declared like
    * Mollweide's. */
  final case class VanDerGrinten(lon0Deg: Double, falseE: Double,
                                 falseN: Double) extends Projection {
    import TransverseMercator.A
    val lam0: Double = Math.toRadians(lon0Deg)
    private val piR: Double = Math.PI * A

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = Math.toRadians(latDeg)
      val dlam = Math.toRadians(lonDeg) - lam0
      val th = Math.asin(math.min(1.0, math.abs(2.0 * phi / Math.PI)))
      if (math.abs(phi) < 1e-12)
        (A * dlam + falseE, falseN)
      else if (math.abs(dlam) < 1e-12 || math.abs(phi) >= Math.PI / 2 - 1e-12)
        (falseE,
          math.signum(phi) * piR * Math.tan(th / 2.0) + falseN)
      else {
        val aa = 0.5 * math.abs(Math.PI / dlam - dlam / Math.PI)
        val g = Math.cos(th) / (Math.sin(th) + Math.cos(th) - 1.0)
        val p = g * (2.0 / Math.sin(th) - 1.0)
        val q = aa * aa + g
        val p2 = p * p
        val a2 = aa * aa
        val x = math.signum(dlam) * piR *
          (aa * (g - p2) + Math.sqrt(math.max(0.0,
            a2 * (g - p2) * (g - p2) - (p2 + a2) * (g * g - p2)))) / (p2 + a2)
        val y = math.signum(phi) * piR *
          (p * q - aa * Math.sqrt(math.max(0.0,
            (a2 + 1.0) * (p2 + a2) - q * q))) / (p2 + a2)
        (x + falseE, y + falseN)
      }
    }

    /** Closed-form inverse (Snyder 33-14..33-23): latitude from the
      * real root of the cubic via the trig method, longitude from the
      * circle identity. */
    def inverse(x0: Double, y0: Double): (Double, Double) = {
      val tx = x0 - falseE
      val ty = y0 - falseN
      val r2 = tx * tx + ty * ty
      require(r2 <= piR * piR * (1.0 + 1e-9),
        f"point ${Math.sqrt(r2)}%.1f m is outside the world circle " +
          f"($piR%.1f m) — invalid Van der Grinten georeferencing")
      if (r2 < 1e-18) return (0.0, Math.toDegrees(lam0))
      val xn = tx / piR
      val yn = ty / piR
      val x2 = xn * xn
      val y2 = yn * yn
      val phi =
        if (math.abs(yn) < 1e-15) 0.0
        else {
          val c1 = -math.abs(yn) * (1.0 + x2 + y2)
          val c2 = c1 - 2.0 * y2 + x2
          val c3 = -2.0 * c1 + 1.0 + 2.0 * y2 + (x2 + y2) * (x2 + y2)
          val d = y2 / c3 +
            (2.0 * c2 * c2 * c2 / (c3 * c3 * c3) -
              9.0 * c1 * c2 / (c3 * c3)) / 27.0
          val a1 = (c1 - c2 * c2 / (3.0 * c3)) / c3
          val m1 = 2.0 * Math.sqrt(-a1 / 3.0)
          val th1 = Math.acos(math.max(-1.0, math.min(1.0,
            3.0 * d / (a1 * m1)))) / 3.0
          math.signum(yn) * Math.PI *
            (-m1 * Math.cos(th1 + Math.PI / 3.0) - c2 / (3.0 * c3))
        }
      val lam =
        if (math.abs(xn) < 1e-15) lam0
        else lam0 + Math.PI * (x2 + y2 - 1.0 +
          Math.sqrt(1.0 + 2.0 * (x2 - y2) + (x2 + y2) * (x2 + y2))) /
          (2.0 * xn)
      (Math.toDegrees(phi), Math.toDegrees(lam))
    }

    /** The poles are single plane points (0, ±πR). */
    override def planeSingularities: Seq[(Double, Double, Double)] =
      Seq((falseE, piR + falseN, 90.0), (falseE, -piR + falseN, -90.0))

    /** DuckDB SQL mirror of [[forward]]: the identical branch CASEs
      * over the same intermediates. */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""radians($lat) AS vphi_,
         |radians($lon) - ${d(lam0)} AS vdlam_,
         |asin(least(${d(1.0)}, abs(2.0 * vphi_ / ${d(Math.PI)}))) AS vth_,
         |CASE WHEN abs(vphi_) < ${d(1e-12)} OR abs(vdlam_) < ${d(1e-12)}
         |     OR abs(vphi_) >= ${d(Math.PI / 2 - 1e-12)} THEN ${d(0.0)}
         |  ELSE 0.5 * abs(${d(Math.PI)} / vdlam_ - vdlam_ / ${d(Math.PI)}) END AS va_,
         |CASE WHEN abs(vphi_) < ${d(1e-12)} OR abs(vdlam_) < ${d(1e-12)}
         |     OR abs(vphi_) >= ${d(Math.PI / 2 - 1e-12)} THEN ${d(0.0)}
         |  ELSE cos(vth_) / (sin(vth_) + cos(vth_) - 1.0) END AS vg_,
         |CASE WHEN abs(vphi_) < ${d(1e-12)} OR abs(vdlam_) < ${d(1e-12)}
         |     OR abs(vphi_) >= ${d(Math.PI / 2 - 1e-12)} THEN ${d(0.0)}
         |  ELSE vg_ * (2.0 / sin(vth_) - 1.0) END AS vp_,
         |va_ * va_ + vg_ AS vq_,
         |vp_ * vp_ AS vp2_,
         |va_ * va_ AS va2_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""CASE WHEN abs(vphi_) < ${d(1e-12)} THEN ${d(A)} * vdlam_ + ${d(falseE)}
         |WHEN abs(vdlam_) < ${d(1e-12)} OR abs(vphi_) >= ${d(Math.PI / 2 - 1e-12)}
         |  THEN ${d(falseE)}
         |ELSE (CASE WHEN vdlam_ >= 0 THEN 1.0 ELSE -1.0 END) * ${d(piR)} *
         |  (va_ * (vg_ - vp2_) + sqrt(greatest(${d(0.0)},
         |    va2_ * (vg_ - vp2_) * (vg_ - vp2_) - (vp2_ + va2_) * (vg_ * vg_ - vp2_))))
         |  / (vp2_ + va2_) + ${d(falseE)} END""".stripMargin
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""CASE WHEN abs(vphi_) < ${d(1e-12)} THEN ${d(falseN)}
         |WHEN abs(vdlam_) < ${d(1e-12)} OR abs(vphi_) >= ${d(Math.PI / 2 - 1e-12)}
         |  THEN (CASE WHEN vphi_ >= 0 THEN 1.0 ELSE -1.0 END) * ${d(piR)}
         |    * tan(vth_ / 2.0) + ${d(falseN)}
         |ELSE (CASE WHEN vphi_ >= 0 THEN 1.0 ELSE -1.0 END) * ${d(piR)} *
         |  (vp_ * vq_ - va_ * sqrt(greatest(${d(0.0)},
         |    (va2_ + 1.0) * (vp2_ + va2_) - vq_ * vq_)))
         |  / (vp2_ + va2_) + ${d(falseN)} END""".stripMargin
    }
  }

  object VanDerGrinten {
    /** ESRI:54029 — World Van der Grinten I. */
    val world: VanDerGrinten = VanDerGrinten(0.0, 0.0, 0.0)
    /** Build from CT 25 geokeys (the Sinusoidal key convention). */
    def fromGeoKeys(p: Map[Int, Double]): VanDerGrinten = {
      val lon0 = Seq(3088, 3080, 3084)
        .collectFirst { case id if p.contains(id) => p(id) }
        .getOrElse(throw new IllegalArgumentException(
          "Van der Grinten GeoKeyDirectory missing ProjCenterLong " +
            "(keys 3088/3080/3084)"))
      VanDerGrinten(lon0, p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        p.getOrElse(3083, p.getOrElse(3087, 0.0)))
    }
  }

  /** Winkel Tripel (Winkel 1921; Snyder, Flattening the Earth — the
    * modified-azimuthal compromise world map; ESRI:54042
    * "World_Winkel_Tripel", the National Geographic world-map CRS
    * since 1998) — with [[Robinson]] this closes the NAMED residue of
    * the arbitrary-`+proj` gap. SPHERICAL on R = a, the Mollweide
    * stance.
    *
    * Forward is CLOSED FORM: the arithmetic mean of the
    * equirectangular projection at standard parallel φ₁ and the
    * Aitoff projection —
    *   α = acos(cos φ · cos(Δλ/2)),  sinc α = sin α / α (→ 1 at 0)
    *   x = (R/2)·(Δλ·cos φ₁ + 2·cos φ·sin(Δλ/2) / sinc α)
    *   y = (R/2)·(φ + sin φ / sinc α)
    * with φ₁ = acos(2/π) (the ESRI:54042 parameter). The only
    * branch is the α → 0 sinc guard (the map center), mirrored
    * verbatim in SQL — no iteration anywhere in the forward, so the
    * oracle replay is a straight-line expression.
    *
    * The INVERSE has no closed form (the defining trait of the
    * modified-azimuthal family): a damped 2-D Newton on the forward
    * with a central-difference Jacobian runs driver-side only
    * (lattice boundary/bbox work — the per-pixel warp hot path is
    * the forward), seeded from the equirectangular mean. Poles map
    * to LINES (x = (R/2)·Δλ·cos φ₁ at |φ| = 90), so there are no
    * plane singularities. */
  final case class WinkelTripel(lon0Deg: Double, falseE: Double, falseN: Double)
      extends Projection {
    import TransverseMercator.A
    val lam0: Double = Math.toRadians(lon0Deg)
    /** Standard parallel cos φ₁ = 2/π — the defining ESRI:54042
      * parameter, embedded as the same literal in the SQL mirror. */
    val cosPhi1: Double = 2.0 / Math.PI
    val half: Double = A / 2.0

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = Math.toRadians(latDeg)
      val dlam = Math.toRadians(lonDeg) - lam0
      val cosPhi = Math.cos(phi)
      val alpha = Math.acos(math.max(-1.0, math.min(1.0,
        cosPhi * Math.cos(dlam / 2.0))))
      val sinc = if (alpha < 1e-12) 1.0 else Math.sin(alpha) / alpha
      // association mirrors xSql/ySql exactly
      (half * (dlam * cosPhi1 + 2.0 * cosPhi * Math.sin(dlam / 2.0) / sinc)
        + falseE,
        half * (phi + Math.sin(phi) / sinc) + falseN)
    }

    /** Damped 2-D Newton with a central-difference Jacobian —
      * driver-side only (boundary sampling); 40 steps from the
      * equirectangular seed reach float64 noise over the whole map
      * (WarpSpec round-trips incl. ±89°). */
    def inverse(x: Double, y: Double): (Double, Double) = {
      val tx = x - falseE
      val ty = y - falseN
      require(math.abs(ty) <= half * Math.PI * 1.0001,
        f"northing $ty%.1f m is beyond the pole line " +
          f"(${half * Math.PI}%.1f m) — invalid Winkel Tripel georeferencing")
      def fwd(phi: Double, lam: Double): (Double, Double) = {
        val cosPhi = Math.cos(phi)
        val alpha = Math.acos(math.max(-1.0, math.min(1.0,
          cosPhi * Math.cos(lam / 2.0))))
        val sinc = if (alpha < 1e-12) 1.0 else Math.sin(alpha) / alpha
        (half * (lam * cosPhi1 + 2.0 * cosPhi * Math.sin(lam / 2.0) / sinc),
          half * (phi + Math.sin(phi) / sinc))
      }
      // seed: the equirectangular mean alone (φ from y/R, λ from x)
      var phi = math.max(-Math.PI / 2, math.min(Math.PI / 2, ty / A))
      var lam = math.max(-Math.PI, math.min(Math.PI,
        tx / (half * (cosPhi1 + math.max(0.05, Math.cos(phi))))))
      val h = 1e-7
      var i = 0
      while (i < 40) {
        val (fx, fy) = fwd(phi, lam)
        val ex = fx - tx
        val ey = fy - ty
        val (fxp, fyp) = fwd(phi + h, lam)
        val (fxm, fym) = fwd(phi - h, lam)
        val (gxp, gyp) = fwd(phi, lam + h)
        val (gxm, gym) = fwd(phi, lam - h)
        val j11 = (fxp - fxm) / (2 * h); val j12 = (gxp - gxm) / (2 * h)
        val j21 = (fyp - fym) / (2 * h); val j22 = (gyp - gym) / (2 * h)
        val det = j11 * j22 - j12 * j21
        if (math.abs(det) < 1e-30) i = 40
        else {
          val dPhi = (ex * j22 - ey * j12) / det
          val dLam = (ey * j11 - ex * j21) / det
          // damped + clamped: the Jacobian degenerates toward the
          // pole line, and an overshoot past |φ| = π/2 would leave
          // the map
          phi = math.max(-Math.PI / 2, math.min(Math.PI / 2, phi - 0.9 * dPhi))
          lam = math.max(-Math.PI, math.min(Math.PI, lam - 0.9 * dLam))
          i += 1
        }
      }
      (Math.toDegrees(phi), Math.toDegrees(lam + lam0))
    }

    /** DuckDB SQL mirror of [[forward]]: straight-line closed form
      * with the identical sinc guard. */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"""radians($lat) AS wphi_,
         |radians($lon) - ${d(lam0)} AS wdlam_,
         |cos(wphi_) AS wcphi_,
         |acos(greatest(${d(-1.0)}, least(${d(1.0)},
         |  wcphi_ * cos(wdlam_ / 2.0)))) AS walpha_,
         |CASE WHEN walpha_ < ${d(1e-12)} THEN ${d(1.0)}
         |  ELSE sin(walpha_) / walpha_ END AS wsinc_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(half)} * (wdlam_ * ${d(cosPhi1)} + " +
        s"2.0 * wcphi_ * sin(wdlam_ / 2.0) / wsinc_) + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      s"${d(half)} * (wphi_ + sin(wphi_) / wsinc_) + ${d(falseN)}"
    }
  }

  object WinkelTripel {
    /** ESRI:54042 — World Winkel Tripel (λ₀ = 0, φ₁ = acos(2/π)). */
    val world: WinkelTripel = WinkelTripel(0.0, 0.0, 0.0)
  }

  /** Ellipsoidal Lambert azimuthal equal-area (Snyder PP 1395, eqs.
    * 24-2..24-28 + the authalic machinery 3-11..3-18) — the azimuthal
    * equal-area family: EPSG:3035 (the pan-European statistical /
    * land-cover grid, oblique aspect at 52°N 10°E) and EPSG:6931/6932
    * (EASE-Grid 2.0 North/South — the POLAR siblings of the 6933
    * cylinder, sharing its authalic q). Built from GeoTIFF parameter
    * keys (CT 10).
    *
    * Both aspects in one class: the oblique formulas (24-17..24-19
    * with D from 24-20) divide by cos β₁, so |φ₀| = 90 takes the
    * closed polar form (24-23/24-24), sign-folded like
    * [[PolarStereographic]] (`aspect = ±1` mirrors south onto the
    * north equations). Equal-area everywhere: the Jacobian of (x, y)
    * w.r.t. authalic (β, λ) has determinant Rq² cos β by
    * construction — WarpSpec pins the property numerically. */
  final case class LambertAzimuthalEqualArea(lat0Deg: Double, lon0Deg: Double,
                                             falseE: Double, falseN: Double)
      extends Projection {
    import TransverseMercator.{A, E2}
    private val e: Double = Math.sqrt(E2)
    val lam0: Double = Math.toRadians(lon0Deg)
    /** Authalic q (Snyder 3-12) — the same q as the Albers cone and
      * the EASE-2 cylinder; the azimuthal map sends it along radii. */
    private def qOf(sinP: Double): Double =
      (1.0 - E2) * (sinP / (1.0 - E2 * sinP * sinP) -
        (1.0 / (2.0 * e)) * Math.log((1.0 - e * sinP) / (1.0 + e * sinP)))
    private val qp: Double = qOf(1.0)
    /** Authalic-sphere radius Rq = a·√(qp/2) (Snyder 3-13). */
    val rq: Double = A * Math.sqrt(qp / 2.0)
    /** Polar aspect when the origin IS a pole (the oblique D would
      * divide by cos β₁ = 0). */
    val polar: Boolean = math.abs(lat0Deg) >= 90.0 - 1e-9
    /** Aspect sign for the polar form: +1 north, −1 south. */
    val aspect: Double = if (lat0Deg >= 0) 1.0 else -1.0
    private val phi0 = Math.toRadians(lat0Deg)
    private val beta1: Double =
      if (polar) 0.0
      else Math.asin(math.max(-1.0, math.min(1.0, qOf(Math.sin(phi0)) / qp)))
    private val sinB1 = Math.sin(beta1)
    private val cosB1 = Math.cos(beta1)
    /** D = a·m₁/(Rq·cos β₁) (Snyder 24-20): the origin-parallel
      * stretch that restores true scale along the φ₀ parallel. */
    val bigD: Double =
      if (polar) 1.0
      else {
        val s = Math.sin(phi0)
        A * (Math.cos(phi0) / Math.sqrt(1.0 - E2 * s * s)) / (rq * cosB1)
      }
    private val rqD: Double = rq * bigD
    private val rqOverD: Double = rq / bigD
    // authalic→geodetic series coefficients (Snyder 3-18)
    private val B1: Double = E2 / 3 + 31 * E2 * E2 / 180 + 517 * E2 * E2 * E2 / 5040
    private val B2: Double = 23 * E2 * E2 / 360 + 251 * E2 * E2 * E2 / 3780
    private val B3: Double = 761 * E2 * E2 * E2 / 45360

    /** The pole images — the oblique aspect maps BOTH poles to finite
      * y-axis points (only the antipode of the origin is unmappable);
      * the polar aspect's own pole is the origin. */
    override def planeSingularities: Seq[(Double, Double, Double)] =
      if (polar) Seq((falseE, falseN, 90.0 * aspect))
      else Seq(
        (falseE, falseN + rqOverD * cosB1 * Math.sqrt(2.0 / (1.0 + sinB1)), 90.0),
        (falseE, falseN - rqOverD * cosB1 * Math.sqrt(2.0 / (1.0 - sinB1)), -90.0))

    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val q = qOf(Math.sin(Math.toRadians(latDeg)))
      val dlam = Math.toRadians(lonDeg) - lam0
      if (polar) {
        // ρ = a·√(qp − s·q) (Snyder 24-23/24-24 folded); association
        // mirrors xSql/ySql exactly
        val rho = A * Math.sqrt(math.max(qp - aspect * q, 0.0))
        (rho * Math.sin(dlam) + falseE,
          -aspect * (rho * Math.cos(dlam)) + falseN)
      } else {
        // sin β clamped (|q| can pass qp by an ulp at the poles)
        val sb = math.max(-1.0, math.min(1.0, q / qp))
        val cb = Math.sqrt(1.0 - sb * sb)
        // B·D and B/D with B = Rq·√(2/(1+sinβ₁sinβ+cosβ₁cosβcosΔλ))
        // (24-17..24-19); association mirrors xSql/ySql exactly
        val k = Math.sqrt(2.0 / (1.0 + sinB1 * sb + cosB1 * (cb * Math.cos(dlam))))
        (rqD * (cb * Math.sin(dlam)) * k + falseE,
          rqOverD * (cosB1 * sb - sinB1 * (cb * Math.cos(dlam))) * k + falseN)
      }
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - falseE
      val yp = y - falseN
      def latOf(beta: Double): Double = beta + B1 * Math.sin(2 * beta) +
        B2 * Math.sin(4 * beta) + B3 * Math.sin(6 * beta)
      if (polar) {
        val rho = Math.hypot(xp, yp)
        if (rho < 1e-9) (lat0Deg, lon0Deg)
        else {
          // q = s·(qp − (ρ/a)²) (Snyder 24-31 folded)
          val q = aspect * (qp - (rho / A) * (rho / A))
          val beta = Math.asin(math.max(-1.0, math.min(1.0, q / qp)))
          (Math.toDegrees(latOf(beta)),
            Math.toDegrees(lam0 + Math.atan2(xp, -aspect * yp)))
        }
      } else {
        // Snyder 24-26..24-28 on the authalic sphere
        val rho = Math.hypot(xp / bigD, bigD * yp)
        if (rho < 1e-9) (lat0Deg, lon0Deg)
        else {
          val ce = 2.0 * Math.asin(math.max(-1.0, math.min(1.0, rho / (2.0 * rq))))
          val beta = Math.asin(math.max(-1.0, math.min(1.0,
            Math.cos(ce) * sinB1 + bigD * yp * Math.sin(ce) * cosB1 / rho)))
          val lon = lam0 + Math.atan2(xp * Math.sin(ce),
            bigD * rho * cosB1 * Math.cos(ce) -
              bigD * bigD * yp * sinB1 * Math.sin(ce))
          (Math.toDegrees(latOf(beta)), Math.toDegrees(lon))
        }
      }
    }

    /** DuckDB SQL mirror of [[forward]] (same parity contract as the
      * other projections: value agreement to last ulps, which cannot
      * flip a 10⁴-meter pixel floor). The oblique fragments expose
      * sin β / cos β so [[xSql]]/[[ySql]] — evaluated in a LATER
      * select over these aliases — can fold B in without lateral
      * alias references. */
    def forwardSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      val q =
        s"""${d(1.0 - E2)} * (sin(radians($lat)) / (1.0 - ${d(E2)} * sin(radians($lat)) * sin(radians($lat)))
           |  - ${d(1.0 / (2.0 * e))} * ln((1.0 - ${d(e)} * sin(radians($lat))) / (1.0 + ${d(e)} * sin(radians($lat)))))""".stripMargin
      if (polar)
        s"""radians($lon) - ${d(lam0)} AS dlam_,
           |$q AS q_""".stripMargin
      else
        s"""radians($lon) - ${d(lam0)} AS dlam_,
           |least(greatest(($q) / ${d(qp)}, -1.0), 1.0) AS sb_,
           |sqrt(1.0 - least(greatest(($q) / ${d(qp)}, -1.0), 1.0) * least(greatest(($q) / ${d(qp)}, -1.0), 1.0)) AS cb_""".stripMargin
    }
    def xSql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      if (polar)
        s"${d(A)} * sqrt(greatest(${d(qp)} - ${d(aspect)} * q_, 0.0)) * sin(dlam_) + ${d(falseE)}"
      else
        s"${d(rqD)} * (cb_ * sin(dlam_)) * sqrt(2.0 / (1.0 + ${d(sinB1)} * sb_ + ${d(cosB1)} * (cb_ * cos(dlam_)))) + ${d(falseE)}"
    }
    def ySql: String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      if (polar)
        s"${d(-aspect)} * (${d(A)} * sqrt(greatest(${d(qp)} - ${d(aspect)} * q_, 0.0)) * cos(dlam_)) + ${d(falseN)}"
      else
        s"${d(rqOverD)} * (${d(cosB1)} * sb_ - ${d(sinB1)} * (cb_ * cos(dlam_))) * sqrt(2.0 / (1.0 + ${d(sinB1)} * sb_ + ${d(cosB1)} * (cb_ * cos(dlam_)))) + ${d(falseN)}"
    }
  }

  object LambertAzimuthalEqualArea {
    /** Build from GeoTIFF projection geokeys (CT 10): GDAL writes the
      * origin as ProjCenterLat/ProjCenterLong (3089/3088; fallbacks
      * the natural-origin pair 3081/3080), false offsets 3082/3083.
      * Missing origin keys fail fast — load-bearing georeferencing,
      * same stance as the conics. */
    def fromGeoKeys(p: Map[Int, Double]): LambertAzimuthalEqualArea = {
      def req(ids: Seq[Int], what: String): Double =
        ids.collectFirst { case id if p.contains(id) => p(id) }
          .getOrElse(throw new IllegalArgumentException(
            s"LambertAzimuthalEqualArea GeoKeyDirectory missing $what " +
              s"(keys ${ids.mkString("/")})"))
      LambertAzimuthalEqualArea(
        lat0Deg = req(Seq(3089, 3081, 3085), "ProjCenterLat/ProjNatOriginLat"),
        lon0Deg = req(Seq(3088, 3080, 3084), "ProjCenterLong/ProjNatOriginLong"),
        falseE = p.getOrElse(3082, p.getOrElse(3086, 0.0)),
        falseN = p.getOrElse(3083, p.getOrElse(3087, 0.0)))
    }

    /** EPSG:3035 — ETRS89-extended / LAEA Europe (the CORINE /
      * EU-statistics grid); GRS80 vs WGS84 differs below the mm. */
    val laeaEurope: LambertAzimuthalEqualArea =
      LambertAzimuthalEqualArea(52.0, 10.0, 4321000.0, 3210000.0)
    /** EPSG:6931 — WGS84 / NSIDC EASE-Grid 2.0 North (polar). */
    val ease2North: LambertAzimuthalEqualArea =
      LambertAzimuthalEqualArea(90.0, 0.0, 0.0, 0.0)
    /** EPSG:6932 — WGS84 / NSIDC EASE-Grid 2.0 South (polar). */
    val ease2South: LambertAzimuthalEqualArea =
      LambertAzimuthalEqualArea(-90.0, 0.0, 0.0, 0.0)
  }
}
