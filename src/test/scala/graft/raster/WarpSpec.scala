package graft.raster

import org.scalatest.funsuite.AnyFunSuite
import graft.geo.Geom

class WarpSpec extends AnyFunSuite {

  test("4326 tile → web mercator: columns exact, rows nearest-neighbor") {
    // 10×10 px, 1°/px tile at (20E, 50N): far enough north that the
    // mercator stretch moves rows visibly
    val px = Array.tabulate(100)(i => (i / 10) * 100 + i % 10) // row*100+col
    val t = GeoTiff.Tile(10, 10, 20.0, 50.0, 1.0, px)
    val r = Warp.tileToWebMercator(t)
    assert(r.epsg == 3857 && r.width == 10 && r.height == 10)
    // x is linear in lon: origin and scale are the exact projections
    assert(r.originX == Geom.toWebMercatorX(20.0))
    assert(r.originY == Geom.toWebMercatorY(50.0))
    val x1 = Geom.toWebMercatorX(30.0)
    assert(math.abs(r.pixelScale - (x1 - r.originX) / 10) < 1e-9)
    // anisotropic: y scale ≠ x scale away from the equator
    assert(math.abs(r.pixelScaleY - r.pixelScale) > 1.0)
    // columns pass through unchanged; every output row holds ONE
    // source row (nearest neighbor), reproducible from the y mapping
    val yBot = Geom.toWebMercatorY(40.0)
    val scaleY = (r.originY - yBot) / 10
    for (row <- 0 until 10) {
      val y = r.originY - (row + 0.5) * scaleY
      val lat = Math.toDegrees(
        2.0 * Math.atan(Math.exp(y / Geom.WebMercatorR)) - Math.PI / 2.0)
      val srcRow = math.min(9, math.max(0, ((50.0 - lat) / 1.0).toInt))
      for (col <- 0 until 10)
        assert(r.bands.head(row * 10 + col) == (srcRow * 100 + col).toDouble,
          s"($row,$col)")
    }
    // the mercator stretch duplicates a southern row into the gap the
    // northern compression opens: rows are monotone non-decreasing
    val rowsUsed = (0 until 10).map(row => (r.bands.head(row * 10) / 100).toInt)
    assert(rowsUsed == rowsUsed.sorted, rowsUsed.toString)
    // round-trips through the codec with the projected CRS
    val p = java.nio.file.Files.createTempFile("warp", ".tif")
    GeoTiff.writeRaster(p, r, "deflate")
    val back = GeoTiff.readRaster(java.nio.file.Files.readAllBytes(p))
    assert(back.epsg == 3857)
    assert(back.pixelScaleY == r.pixelScaleY &&
      back.pixelScale == r.pixelScale)
    assert(back.bands.head.toSeq == r.bands.head.toSeq)
  }

  test("mercator lattice: monotone row map, full target coverage, exact columns") {
    // two stacked 8-px tiles at ~47°N, 10 km pixels
    val lat = Warp.MercatorLattice(x0 = 0.0, yTop = 6000000.0,
      pixelM = 10000.0, tilesX = 1, tilesY = 2, pxPerTile = 8)
    // pixelDeg is the exact linear-x conversion
    assert(lat.pixelDeg == Math.toDegrees(10000.0 / Geom.WebMercatorR))
    // one 10 km source row at 47°N spans pixelDeg·cos(47°) of
    // latitude < pixelDeg, so the 16-row source span needs ≤ 16
    // target rows (≈ 16·cos 47° ≈ 11): the warp SKIPS source rows
    // going north, it never gaps
    assert(lat.targetRows >= 10 && lat.targetRows <= 16,
      s"targetRows ${lat.targetRows}")
    // the row map is monotone non-decreasing; at most the trailing
    // target row (center past the source's south edge) is unmapped
    val srcRows = (0 until lat.targetRows).map(lat.srcRowOf)
    val mapped = srcRows.takeWhile(_ >= 0)
    assert(mapped.length >= lat.targetRows - 1, srcRows.toString)
    assert(srcRows.drop(mapped.length).forall(_ == -1), srcRows.toString)
    assert(mapped.forall(r => r < 16), srcRows.toString)
    assert(mapped == mapped.sorted, srcRows.toString)
    // targetRowsOf(ty) partitions the MAPPED target rows: every one is
    // owned by exactly one source tile row-band
    val owned = (0 until 2).flatMap(lat.targetRowsOf)
    assert(owned.sorted == (0 until mapped.length), owned.toString)
    assert(lat.tilesYTarget == (lat.targetRows + 7) / 8)
  }

  test("transverse mercator: known UTM vectors, mm round trip, zone params") {
    // Zone 31N reference point (the classic 0.5°E example family):
    // forward/inverse must agree to sub-meter with published UTM
    // converters for mid-latitude points well inside the zone
    val z31 = Warp.TransverseMercator.utm(32631)
    assert(z31.lon0Deg == 3.0 && z31.falseN == 0.0)
    // Karney's test point: lat 40.5°, lon 0.5°E is in zone 31 (0-6°E);
    // cross-checked magnitudes: easting < 500000 (west of CM 3°E)
    val (e1, n1) = z31.forward(40.5, 0.5)
    assert(e1 > 200000 && e1 < 500000, s"easting $e1")
    assert(n1 > 4.4e6 && n1 < 4.6e6, s"northing $n1")
    // round trip: forward∘inverse = identity to 1e-8° (≈ 1 mm — the
    // series truncation bound inside a zone)
    for (lat <- Seq(-60.0, -33.3, 0.1, 41.7, 68.9); lon <- Seq(13.2, 15.0, 16.9)) {
      val z33 = Warp.TransverseMercator.utm(if (lat < 0) 32733 else 32633)
      val (x, y) = z33.forward(lat, lon)
      val (lat2, lon2) = z33.inverse(x, y)
      assert(math.abs(lat2 - lat) < 1e-8 && math.abs(lon2 - lon) < 1e-8,
        s"($lat,$lon) → ($x,$y) → ($lat2,$lon2)")
    }
    // southern hemisphere carries the 10⁷ false northing
    val z33s = Warp.TransverseMercator.utm(32733)
    val (_, nS) = z33s.forward(-33.3, 15.0)
    assert(nS > 0 && nS < 1.0e7, s"southern northing $nS")
    // scale at the central meridian is k0 (0.9996): 1° of northing
    // near the CM measures ~k0 × meridian arc
    val (_, ya) = z31.forward(45.0, 3.0)
    val (_, yb) = z31.forward(46.0, 3.0)
    assert(math.abs((yb - ya) / 111141.548 - 0.9996) < 1e-3)
  }

  test("projected lattice: exclusive pixel ownership, full coverage") {
    val latt = Warp.ProjectedLattice(Warp.TransverseMercator.utm(32633),
      x0 = 400000.0, yTop = 5000000.0, pixelM = 10000.0,
      tilesX = 2, tilesY = 2, pxPerTile = 20)
    // target grid covers the source span with padding
    assert(latt.tilesXTarget >= 3 && latt.tilesYTarget >= 2,
      s"${latt.tilesXTarget}×${latt.tilesYTarget}")
    // every (source tile, target tile) contribution set is disjoint:
    // a target pixel is owned by EXACTLY one source tile
    val bands = Seq(Array.tabulate(400)(_.toDouble))
    val seen = scala.collection.mutable.Map.empty[(Int, Int, Int), Int]
    for (stx <- 0 until 2; sty <- 0 until 2) {
      latt.contributionsOf(stx, sty, bands).foreach { case ((ttx, tty), (idxs, _)) =>
        idxs.foreach { i =>
          val key = (ttx, tty, i)
          seen.get(key).foreach(prev =>
            fail(s"pixel $key claimed by both $prev and ${sty * 2 + stx}"))
          seen(key) = sty * 2 + stx
        }
      }
    }
    // interior target pixels (whose centers project inside the source
    // span) are ALL covered: count equals an independent forward scan
    val expected = (for {
      gy <- 0 until latt.tilesYTarget * 20
      gx <- 0 until latt.tilesXTarget * 20
      lat = latt.originLat - (gy + 0.5) * latt.pixelDeg
      lon = latt.originLon + (gx + 0.5) * latt.pixelDeg
      xy = latt.proj.forward(lat, lon)
      sgx = Math.floor((xy._1 - 400000.0) / 10000.0).toInt
      sgy = Math.floor((5000000.0 - xy._2) / 10000.0).toInt
      if sgx >= 0 && sgx < 40 && sgy >= 0 && sgy < 40
    } yield 1).sum
    assert(seen.size == expected, s"${seen.size} covered, $expected expected")
  }

  test("EPSG:6933 cylindrical equal-area: published extent, round-trip") {
    val cea = Warp.CylindricalEqualArea.ease2
    // the EASE-Grid 2.0 published map extent: x(±180°) ≈ ±17367530.45 m
    val (x180, _) = cea.forward(0.0, 180.0)
    assert(math.abs(x180 - 17367530.45) < 1.0, s"x(180°) = $x180")
    // equator northing is 0; standard parallel ±30° maps symmetric
    val (_, y0) = cea.forward(0.0, 10.0)
    assert(math.abs(y0) < 1e-9)
    val (_, yN) = cea.forward(30.0, 0.0)
    val (_, yS) = cea.forward(-30.0, 0.0)
    assert(math.abs(yN + yS) < 1e-6)
    // equal-area property: two 1°-lon strips at 0° and 60° have the
    // same projected area per degree of q — widths equal, so heights
    // encode the cos-shrink: dy at 60° ≈ cos(60°)/cos(0°) × dy at 0°
    // (to ellipsoidal correction <1%)
    val dy0 = cea.forward(0.5, 0.0)._2 - cea.forward(-0.5, 0.0)._2
    val dy60 = cea.forward(60.5, 0.0)._2 - cea.forward(59.5, 0.0)._2
    assert(math.abs(dy60 / dy0 - 0.5) < 0.01, s"dy60/dy0 = ${dy60 / dy0}")
    // forward∘inverse is identity to sub-micron over the usable band
    for (li <- 0 to 18; lj <- 0 to 14) {
      val lat = -80.0 + li * 8.5
      val lon = -170.0 + lj * 23.0
      val (x, y) = cea.forward(lat, lon)
      val (la, lo) = cea.inverse(x, y)
      // 5e-8° ≈ 5 mm: the Snyder 3-18 3-term series' truncation level
      assert(math.abs(la - lat) < 5e-8 && math.abs(lo - lon) < 5e-8,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    // the general lattice accepts it: disjoint contributions as for UTM
    val latt = Warp.ProjectedLattice(cea,
      x0 = 1000000.0, yTop = 4000000.0, pixelM = 10000.0,
      tilesX = 1, tilesY = 1, pxPerTile = 20)
    val bands = Seq(Array.tabulate(400)(_.toDouble))
    val contribs = latt.contributionsOf(0, 0, bands).toSeq
    assert(contribs.nonEmpty)
    val all = contribs.flatMap { case ((ttx, tty), (idxs, _)) =>
      idxs.map(i => (ttx, tty, i)) }
    assert(all.distinct.length == all.length, "overlapping ownership")
    // CT 28 geokeys build the identical cylinder (a parameter-defined
    // equal-area cylinder with agency-picked parallels, not just the
    // EASE-2 registry code); a missing standard parallel fails fast
    assert(Warp.projectionFor(32767,
        Map(3075 -> 28.0, 3078 -> 30.0, 3080 -> 0.0))
      .contains(Warp.CylindricalEqualArea.ease2))
    val eCea = intercept[IllegalArgumentException](
      Warp.CylindricalEqualArea.fromGeoKeys(Map(3075 -> 28.0, 3080 -> 0.0)))
    assert(eCea.getMessage.contains("3078"))
    // a polar standard parallel collapses the cylinder (k0 → 0,
    // y scale → ∞): fail fast instead of warping pixels by 10²³
    val ePolar = intercept[IllegalArgumentException](
      Warp.CylindricalEqualArea.fromGeoKeys(
        Map(3075 -> 28.0, 3078 -> 90.0, 3080 -> 0.0)))
    assert(ePolar.getMessage.contains("degenerate"))
  }

  test("Albers conic from geokeys: origin, parallels true-scale, round-trip") {
    val params = Map[Int, Double](
      3075 -> 11.0, 3078 -> 29.5, 3079 -> 45.5,
      3085 -> 23.0, 3084 -> -96.0, 3086 -> 0.0, 3087 -> 0.0)
    val aea = Warp.AlbersEqualArea.fromGeoKeys(params)
    // the false origin projects to (FE, FN)
    val (x0, y0) = aea.forward(23.0, -96.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6, s"origin → ($x0, $y0)")
    // scale along each STANDARD parallel is 1 (the defining property
    // of a two-parallel conic): measure via a finite difference along
    // the parallel vs the true ellipsoidal parallel arc
    for (latS <- Seq(29.5, 45.5)) {
      val dLon = 0.01
      val (xa, ya) = aea.forward(latS, -96.0)
      val (xb, yb) = aea.forward(latS, -96.0 + dLon)
      val planar = math.hypot(xb - xa, yb - ya)
      val s = math.sin(math.toRadians(latS))
      val nu = Warp.TransverseMercator.A /
        math.sqrt(1 - Warp.TransverseMercator.E2 * s * s)
      val arc = nu * math.cos(math.toRadians(latS)) * math.toRadians(dLon)
      assert(math.abs(planar / arc - 1.0) < 1e-6, s"k at $latS = ${planar / arc}")
    }
    // round-trip across the CONUS window: 5e-8° ≈ 5 mm (series level)
    for (li <- 0 to 6; lj <- 0 to 6) {
      val lat = 25.0 + li * 4.0
      val lon = -120.0 + lj * 8.0
      val (x, y) = aea.forward(lat, lon)
      val (la, lo) = aea.inverse(x, y)
      assert(math.abs(la - lat) < 5e-8 && math.abs(lo - lon) < 5e-8,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    // geokey resolution: CT 11 builds the conic, other CTs refuse,
    // and natural-origin keys are honored when false-origin are absent
    assert(Warp.projectionFor(32767, params).exists(_.isInstanceOf[Warp.AlbersEqualArea]))
    // CT 3 (oblique mercator) is genuinely unsupported → rejected
    assert(Warp.projectionFor(32767, params.updated(3075, 3.0)).isEmpty)
    assert(Warp.projectionFor(32767, Map.empty).isEmpty)
    val nat = Warp.AlbersEqualArea.fromGeoKeys(Map(
      3075 -> 11.0, 3078 -> 29.5, 3079 -> 45.5, 3081 -> 23.0, 3080 -> -96.0))
    assert(nat == aea.copy())
    val e = intercept[IllegalArgumentException](
      Warp.AlbersEqualArea.fromGeoKeys(Map(3075 -> 11.0)))
    assert(e.getMessage.contains("3078"))
    // lattice ownership stays exclusive under the conic (θ rotation
    // makes rows/cols genuinely non-axis-aligned — the general path)
    val latt = Warp.ProjectedLattice(aea,
      x0 = -400000.0, yTop = 1900000.0, pixelM = 10000.0,
      tilesX = 1, tilesY = 1, pxPerTile = 20)
    val contribs = latt.contributionsOf(0, 0,
      Seq(Array.tabulate(400)(_.toDouble))).toSeq
    assert(contribs.nonEmpty)
    val all = contribs.flatMap { case ((ttx, tty), (idxs, _)) =>
      idxs.map(i => (ttx, tty, i)) }
    assert(all.distinct.length == all.length, "overlapping ownership")
  }

  test("Lambert conformal conic from geokeys: origin, parallels, conformality") {
    val params = Map[Int, Double](
      3075 -> 8.0, 3078 -> 33.0, 3079 -> 45.0,
      3085 -> 39.0, 3084 -> -96.0, 3086 -> 0.0, 3087 -> 0.0)
    val lcc = Warp.LambertConformalConic.fromGeoKeys(params)
    // the origin projects to (FE, FN)
    val (x0, y0) = lcc.forward(39.0, -96.0)
    assert(math.abs(x0) < 1e-6 && math.abs(y0) < 1e-6, s"origin → ($x0, $y0)")
    // scale along each standard parallel is 1
    for (latS <- Seq(33.0, 45.0)) {
      val dLon = 0.01
      val (xa, ya) = lcc.forward(latS, -96.0)
      val (xb, yb) = lcc.forward(latS, -96.0 + dLon)
      val planar = math.hypot(xb - xa, yb - ya)
      val s = math.sin(math.toRadians(latS))
      val nu = Warp.TransverseMercator.A /
        math.sqrt(1 - Warp.TransverseMercator.E2 * s * s)
      val arc = nu * math.cos(math.toRadians(latS)) * math.toRadians(dLon)
      assert(math.abs(planar / arc - 1.0) < 1e-6, s"k at $latS = ${planar / arc}")
    }
    // CONFORMALITY (the property Albers lacks): local scale is
    // direction-independent — compare the parallel-wise and
    // meridian-wise finite-difference scales off the std parallels
    for (lat <- Seq(36.0, 42.0)) {
      val eps = 1e-4
      val (xa, ya) = lcc.forward(lat, -100.0)
      val (xb, yb) = lcc.forward(lat, -100.0 + eps)
      val (xc, yc) = lcc.forward(lat + eps, -100.0)
      val s = math.sin(math.toRadians(lat))
      val w = math.sqrt(1 - Warp.TransverseMercator.E2 * s * s)
      val nu = Warp.TransverseMercator.A / w
      val rhoM = Warp.TransverseMercator.A *
        (1 - Warp.TransverseMercator.E2) / (w * w * w)
      val kPar = math.hypot(xb - xa, yb - ya) /
        (nu * math.cos(math.toRadians(lat)) * math.toRadians(eps))
      val kMer = math.hypot(xc - xa, yc - ya) / (rhoM * math.toRadians(eps))
      assert(math.abs(kPar / kMer - 1.0) < 1e-4,
        s"anisotropy at $lat: $kPar vs $kMer")
    }
    // round-trip: 1e-7° ≈ 1 cm (conformal-latitude series level)
    for (li <- 0 to 6; lj <- 0 to 6) {
      val lat = 28.0 + li * 3.5
      val lon = -118.0 + lj * 7.0
      val (x, y) = lcc.forward(lat, lon)
      val (la, lo) = lcc.inverse(x, y)
      assert(math.abs(la - lat) < 1e-7 && math.abs(lo - lon) < 1e-7,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    // geokey resolution: CT 8 builds the conic
    assert(Warp.projectionFor(32767, params)
      .exists(_.isInstanceOf[Warp.LambertConformalConic]))
    val e = intercept[IllegalArgumentException](
      Warp.LambertConformalConic.fromGeoKeys(Map(3075 -> 8.0)))
    assert(e.getMessage.contains("3078"))
    // southern-hemisphere cone (negative parallels, coneN < 0 — the
    // Australia/Argentina national-grid case): the inverse must carry
    // the cone's sign into ρ or pow(negative, 1/n) is NaN
    val south = Warp.LambertConformalConic(-18.0, -36.0, -27.0, 134.0, 0.0, 0.0)
    assert(south.coneN < 0)
    for ((lat, lon) <- Seq((-25.0, 140.0), (-33.5, 121.2), (-12.1, 131.0))) {
      val (xs, ys) = south.forward(lat, lon)
      val (laS, loS) = south.inverse(xs, ys)
      assert(math.abs(laS - lat) < 1e-7 && math.abs(loS - lon) < 1e-7,
        s"southern round-trip ($lat, $lon) → ($laS, $loS)")
    }
    // registry conic codes resolve without geokeys (CONUS Albers,
    // StatCan Lambert) — same constructors as the parameter path
    assert(Warp.projectionFor(5070).exists(_.isInstanceOf[Warp.AlbersEqualArea]))
    val statcan = Warp.projectionFor(3347).get
    // its origin projects to the registry false easting/northing
    val (sx, sy) = statcan.forward(63.390675, -91.866667)
    assert(math.abs(sx - 6200000.0) < 1e-6 && math.abs(sy - 3000000.0) < 1e-6)
    // CT 9 (Helmert single-parallel + k0, the national-grid form):
    // scale along the origin parallel is k0, NOT 1 — the defining
    // difference from the 2SP cone
    val p1sp = Map[Int, Double](
      3075 -> 9.0, 3081 -> 46.5, 3080 -> 3.0, 3092 -> 0.9998)
    val one = Warp.LambertConformalConic.fromGeoKeys1SP(p1sp)
    assert(Warp.projectionFor(32767, p1sp).contains(one))
    val dL = 0.01
    val (x1a, y1a) = one.forward(46.5, 3.0)
    val (x1b, y1b) = one.forward(46.5, 3.0 + dL)
    val s465 = math.sin(math.toRadians(46.5))
    val nu465 = Warp.TransverseMercator.A /
      math.sqrt(1 - Warp.TransverseMercator.E2 * s465 * s465)
    val arc465 = nu465 * math.cos(math.toRadians(46.5)) * math.toRadians(dL)
    assert(math.abs(math.hypot(x1b - x1a, y1b - y1a) / arc465 - 0.9998) < 1e-6,
      s"k at origin parallel = ${math.hypot(x1b - x1a, y1b - y1a) / arc465}")
    val (fx, fy) = one.forward(44.0, 1.0)
    val (fla, flo) = one.inverse(fx, fy)
    assert(math.abs(fla - 44.0) < 5e-8 && math.abs(flo - 1.0) < 5e-8)
    val e1sp = intercept[IllegalArgumentException](
      Warp.LambertConformalConic.fromGeoKeys1SP(Map(3075 -> 9.0, 3080 -> 3.0)))
    assert(e1sp.getMessage.contains("3081"))
    // a broken writer's k0 = 0 must fail fast, not produce aF = 0
    val eK0 = intercept[IllegalArgumentException](
      Warp.LambertConformalConic.fromGeoKeys1SP(
        Map(3075 -> 9.0, 3081 -> 46.5, 3080 -> 3.0, 3092 -> 0.0)))
    assert(eK0.getMessage.contains("k0"))
    // the cone APEX is a declared plane singularity (ρ = 0 at
    // (FE, ρ0+FN), the near pole for a northern cone): a lattice
    // containing it takes the full-longitude path like the azimuthal
    // poles — a pan-Arctic Lambert grid must not silently truncate
    // the polar cap
    val lcc8 = Warp.LambertConformalConic.fromGeoKeys(Map(
      3075 -> 8.0, 3078 -> 33.0, 3079 -> 45.0,
      3085 -> 39.0, 3084 -> -96.0))
    assert(lcc8.planeSingularities ==
      Seq((0.0, lcc8.rho0, 90.0)), lcc8.planeSingularities)
    val apexLatt = Warp.ProjectedLattice(lcc8,
      x0 = -200000.0, yTop = lcc8.rho0 + 200000.0, pixelM = 10000.0,
      tilesX = 2, tilesY = 2, pxPerTile = 20)
    assert(apexLatt.originLon == -180.0 && apexLatt.originLat == 90.0)
    // the Albers apex is declared too (its pole is an arc at
    // ρ_pole ≥ 0, but the apex still forces the interior-extreme /
    // full-longitude handling)
    val aeaApex = Warp.AlbersEqualArea(29.5, 45.5, 23.0, -96.0, 0.0, 0.0)
    assert(aeaApex.planeSingularities == Seq((0.0, aeaApex.rho0, 90.0)))
  }

  test("polar stereographic from geokeys: aspects, true scale, conformality") {
    // EPSG:3413 parameterization via CT 15 geokeys
    val north = Warp.PolarStereographic.fromGeoKeys(Map(
      3075 -> 15.0, 3095 -> -45.0, 3081 -> 70.0))
    // the pole projects to (FE, FN); the pole meridian has x = 0
    val (px, py) = north.forward(90.0, 123.4)
    assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6, s"pole → ($px, $py)")
    val (cx, _) = north.forward(75.0, -45.0)
    assert(math.abs(cx) < 1e-6, s"central-meridian x = $cx")
    // true scale along the standard parallel: ρ(70°) = A·m(70°)
    // (eq. 21-34's defining property), and the finite-difference
    // scale along the parallel is 1
    val s70 = math.sin(math.toRadians(70.0))
    val m70 = math.cos(math.toRadians(70.0)) /
      math.sqrt(1 - Warp.TransverseMercator.E2 * s70 * s70)
    val (x70, y70) = north.forward(70.0, -45.0)
    assert(math.abs(math.hypot(x70, y70) -
      Warp.TransverseMercator.A * m70) < 1e-6)
    for ((proj, latS) <- Seq((north, 70.0),
      (Warp.PolarStereographic(-71.0, 0.0, 0.0, 0.0), -71.0))) {
      val dLon = 0.01
      val (xa, ya) = proj.forward(latS, 10.0)
      val (xb, yb) = proj.forward(latS, 10.0 + dLon)
      val planar = math.hypot(xb - xa, yb - ya)
      val s = math.sin(math.toRadians(latS))
      val nu = Warp.TransverseMercator.A /
        math.sqrt(1 - Warp.TransverseMercator.E2 * s * s)
      val arc = nu * math.cos(math.toRadians(latS)) * math.toRadians(dLon)
      assert(math.abs(planar / arc - 1.0) < 1e-6, s"k at $latS = ${planar / arc}")
    }
    // conformality off the standard parallel (polar stereographic is
    // conformal): parallel-wise and meridian-wise scales agree
    for (lat <- Seq(65.0, 80.0)) {
      val eps = 1e-4
      val (xa, ya) = north.forward(lat, 20.0)
      val (xb, yb) = north.forward(lat, 20.0 + eps)
      val (xc, yc) = north.forward(lat + eps, 20.0)
      val s = math.sin(math.toRadians(lat))
      val w = math.sqrt(1 - Warp.TransverseMercator.E2 * s * s)
      val nu = Warp.TransverseMercator.A / w
      val rhoM = Warp.TransverseMercator.A *
        (1 - Warp.TransverseMercator.E2) / (w * w * w)
      val kPar = math.hypot(xb - xa, yb - ya) /
        (nu * math.cos(math.toRadians(lat)) * math.toRadians(eps))
      val kMer = math.hypot(xc - xa, yc - ya) / (rhoM * math.toRadians(eps))
      assert(math.abs(kPar / kMer - 1.0) < 1e-4,
        s"anisotropy at $lat: $kPar vs $kMer")
    }
    // round-trip both aspects: 1e-7° ≈ 1 cm (conformal series level)
    val south = Warp.PolarStereographic(-71.0, 0.0, 0.0, 0.0)
    for ((proj, lats) <- Seq((north, Seq(62.0, 71.5, 84.0, 89.9)),
      (south, Seq(-62.0, -71.5, -84.0, -89.9)));
         lat <- lats; lon <- Seq(-170.0, -45.0, 0.0, 30.0, 179.0)) {
      val (x, y) = proj.forward(lat, lon)
      val (la, lo) = proj.inverse(x, y)
      val dLon = math.abs((lo - lon + 540.0) % 360.0 - 180.0)
      assert(math.abs(la - lat) < 1e-7 && dLon < 1e-6,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    // variant A (pole latitude + k0) agrees with variant B: derive
    // the pole-scale k0 implied by the 70° standard parallel (eq.
    // 21-39 solved for k0) and check the two constants coincide
    val e = math.sqrt(Warp.TransverseMercator.E2)
    val k0Implied = north.rhoK * math.sqrt(
      math.pow(1 + e, 1 + e) * math.pow(1 - e, 1 - e)) /
      (2.0 * Warp.TransverseMercator.A)
    val ups = Warp.PolarStereographic(90.0, -45.0, 0.0, 0.0, k0 = k0Implied)
    assert(math.abs(ups.rhoK - north.rhoK) < 1e-6)
    // geokey resolution: CT 15 builds it; EPSG registry codes resolve
    assert(Warp.projectionFor(32767, Map(3075 -> 15.0, 3095 -> -45.0,
      3081 -> 70.0)).exists(_.isInstanceOf[Warp.PolarStereographic]))
    assert(Warp.projectionFor(3413).exists(
      _.asInstanceOf[Warp.PolarStereographic].aspect == 1.0))
    assert(Warp.projectionFor(3031).exists(
      _.asInstanceOf[Warp.PolarStereographic].aspect == -1.0))
    val err = intercept[IllegalArgumentException](
      Warp.PolarStereographic.fromGeoKeys(Map(3075 -> 15.0, 3081 -> 70.0)))
    assert(err.getMessage.contains("3095"))
    // ESRI-style variant-B files carry BOTH 3081 = ±90 (pole) and
    // 3078 = the standard parallel: 3078 must win, or the file is
    // misread as variant A with k0 = 1 (~3% scale error)
    val esri = Warp.PolarStereographic.fromGeoKeys(Map(
      3075 -> 15.0, 3095 -> -45.0, 3081 -> 90.0, 3078 -> 70.0))
    assert(esri.latTsDeg == 70.0 && esri.rhoK == north.rhoK)
    // lattice ownership stays exclusive under the azimuthal rotation
    val latt = Warp.ProjectedLattice(north,
      x0 = 300000.0, yTop = -2000000.0, pixelM = 10000.0,
      tilesX = 1, tilesY = 1, pxPerTile = 20)
    val contribs = latt.contributionsOf(0, 0,
      Seq(Array.tabulate(400)(_.toDouble))).toSeq
    assert(contribs.nonEmpty)
    val all = contribs.flatMap { case ((ttx, tty), (idxs, _)) =>
      idxs.map(i => (ttx, tty, i)) }
    assert(all.distinct.length == all.length, "overlapping ownership")
  }

  test("pole-containing polar lattice: full-longitude target, cap covered") {
    // EPSG:3413-style CRS; a 2×2 lattice of 20-px 10 km tiles CENTERED
    // on the pole (x, y ∈ [−200 km, 200 km]) — the canonical NSIDC
    // use case. The latitude extreme (90°N) is interior to the
    // rectangle, so edge-only bbox sampling would silently drop the
    // polar cap; the singularity path must cover every longitude.
    val ps = Warp.PolarStereographic(70.0, -45.0, 0.0, 0.0)
    val latt = Warp.ProjectedLattice(ps,
      x0 = -200000.0, yTop = 200000.0, pixelM = 10000.0,
      tilesX = 2, tilesY = 2, pxPerTile = 20)
    assert(latt.originLat == 90.0, s"originLat ${latt.originLat}")
    assert(latt.originLon == -180.0, s"originLon ${latt.originLon}")
    assert(latt.tilesXTarget * 20 * latt.pixelDeg >= 360.0 - 1e-9,
      s"target grid spans ${latt.tilesXTarget * 20 * latt.pixelDeg}° of longitude")
    val bands = Seq(Array.tabulate(400)(_.toDouble))
    val seen = scala.collection.mutable.Map.empty[(Int, Int, Int), Int]
    for (stx <- 0 until 2; sty <- 0 until 2)
      latt.contributionsOf(stx, sty, bands).foreach { case ((ttx, tty), (idxs, _)) =>
        idxs.foreach { i =>
          val key = (ttx, tty, i)
          seen.get(key).foreach(prev =>
            fail(s"pixel $key claimed by both $prev and ${sty * 2 + stx}"))
          seen(key) = sty * 2 + stx
        }
      }
    // coverage: claimed pixels = an independent scan over ALL target
    // centers (same skip rules: |lat| ≤ 90, wrapped lon < 180) whose
    // forward lands in the source square — catches both the bbox and
    // the per-tile candidate-range versions of the cap-loss bug
    val expected = (for {
      gy <- 0 until latt.tilesYTarget * 20
      gx <- 0 until latt.tilesXTarget * 20
      lat = latt.originLat - (gy + 0.5) * latt.pixelDeg
      lon = latt.originLon + (gx + 0.5) * latt.pixelDeg
      if lat >= -90.0 && lon < 180.0
      xy = ps.forward(lat, lon)
      sgx = Math.floor((xy._1 - -200000.0) / 10000.0).toInt
      sgy = Math.floor((200000.0 - xy._2) / 10000.0).toInt
      if sgx >= 0 && sgx < 40 && sgy >= 0 && sgy < 40
    } yield 1).sum
    assert(seen.size == expected, s"${seen.size} covered, $expected expected")
    // the cap itself is present: the top target row (centers at
    // 90° − pixelDeg/2) is claimed across many longitudes
    val topRow = seen.keys.count { case (_, tty, i) => tty == 0 && i < 20 }
    assert(topRow > 100, s"polar-cap top-row pixels claimed: $topRow")
    // every longitude column appears (full wrap): distinct target tile
    // columns = the full range
    val cols = seen.keys.map(_._1).toSet
    assert(cols == (0 until latt.tilesXTarget).toSet,
      s"missing longitude tile columns: ${(0 until latt.tilesXTarget).toSet -- cols}")
  }

  test("sinusoidal from geokeys: parallel true scale, meridian arc, round-trip") {
    val sinu = Warp.Sinusoidal.fromGeoKeys(Map(
      3075 -> 24.0, 3088 -> 0.0, 3082 -> 0.0, 3083 -> 0.0))
    // equator origin projects to (0, 0)
    val (x0, y0) = sinu.forward(0.0, 0.0)
    assert(math.abs(x0) < 1e-9 && math.abs(y0) < 1e-9)
    // y on the central meridian IS the meridian arc — the transverse-
    // mercator CM northing divided by its k0 (identical Snyder 3-21
    // series, so agreement is to rounding)
    val tm = Warp.TransverseMercator(0.0, 0.0, 0.0)
    for (lat <- Seq(-60.0, -18.5, 7.0, 45.0, 78.0)) {
      val ys = sinu.forward(lat, 0.0)._2
      val yt = tm.forward(lat, 0.0)._2 / Warp.TransverseMercator.K0
      assert(math.abs(ys - yt) < 1e-6, s"meridian arc at $lat: $ys vs $yt")
    }
    // x is true-scale along EVERY parallel (the sinusoidal signature;
    // conics/stereographic hold it only on standard parallels)
    for (latS <- Seq(0.0, 18.0, 43.0, 71.0)) {
      val dLon = 0.01
      val (xa, ya) = sinu.forward(latS, 30.0)
      val (xb, yb) = sinu.forward(latS, 30.0 + dLon)
      val s = math.sin(math.toRadians(latS))
      val nu = Warp.TransverseMercator.A /
        math.sqrt(1 - Warp.TransverseMercator.E2 * s * s)
      val arc = nu * math.cos(math.toRadians(latS)) * math.toRadians(dLon)
      assert(math.abs((xb - xa) / arc - 1.0) < 1e-9 && ya == yb,
        s"k at $latS = ${(xb - xa) / arc}")
    }
    // round-trip: 5e-8° ≈ 5 mm (the footprint-series truncation; the
    // λ leg amplifies it by Δλ·tanφ, so wide-Δλ points sit near the
    // bound)
    for (lat <- Seq(-55.0, -10.0, 16.5, 19.8, 62.0);
         lon <- Seq(-120.0, 0.0, 28.4, 150.0)) {
      val (x, y) = sinu.forward(lat, lon)
      val (la, lo) = sinu.inverse(x, y)
      assert(math.abs(la - lat) < 5e-8 && math.abs(lo - lon) < 5e-8,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    // geokey resolution: CT 24 builds it; the central meridian is
    // load-bearing (missing key fails fast, even though MODIS uses 0)
    assert(Warp.projectionFor(32767, Map(3075 -> 24.0, 3088 -> 0.0))
      .exists(_.isInstanceOf[Warp.Sinusoidal]))
    val err = intercept[IllegalArgumentException](
      Warp.Sinusoidal.fromGeoKeys(Map(3075 -> 24.0)))
    assert(err.getMessage.contains("3088"))
    // lattice ownership stays exclusive under the pseudocylindrical
    // shear (x compresses toward the poles while y stays metric)
    val latt = Warp.ProjectedLattice(sinu,
      x0 = 3000000.0, yTop = 2200000.0, pixelM = 10000.0,
      tilesX = 1, tilesY = 1, pxPerTile = 20)
    val contribs = latt.contributionsOf(0, 0,
      Seq(Array.tabulate(400)(_.toDouble))).toSeq
    assert(contribs.nonEmpty)
    val all = contribs.flatMap { case ((ttx, tty), (idxs, _)) =>
      idxs.map(i => (ttx, tty, i)) }
    assert(all.distinct.length == all.length, "overlapping ownership")
  }

  test("Mollweide: ground truth, equal-area signature, pole images, round-trip") {
    val m = Warp.Mollweide.world
    // ground truth: the converged Newton solution (60 iterations,
    // float64, computed independently) — the 12-step unrolled chain
    // must land on it exactly at mid latitudes
    val truth = Seq(
      (40.0, 10.0, 849276.5182789668, 4789399.149897034),
      (-30.0, -75.0, -6876065.290449834, -3643853.5640796954),
      (52.0, 5.0, 370098.89649033506, 6081278.532523252),
      (85.0, 120.0, 2487662.513287261, 8824978.852256801),
      (0.0, 0.0, 0.0, 0.0))
    for ((lat, lon, ex, ey) <- truth) {
      val (x, y) = m.forward(lat, lon)
      assert(math.abs(x - ex) < 1e-6 && math.abs(y - ey) < 1e-6,
        s"($lat, $lon) → ($x, $y), expected ($ex, $ey)")
    }
    // the map's global frame: equator width 2·(2√2·R), pole images at
    // (0, ±√2·R) — single points, declared as plane singularities
    val (xE, _) = m.forward(0.0, 180.0)
    assert(math.abs(xE - m.cx * Math.PI) < 1e-6)
    val (xp, yp) = m.forward(90.0, 77.0) // ANY longitude hits the point
    assert(math.abs(xp) < 1e-6 && math.abs(yp - m.cy) < 1e-6)
    assert(m.planeSingularities.map(_._3).sorted == Seq(-90.0, 90.0))
    // equal-area signature: the area scale factor h·k of a small
    // quad is 1 everywhere (the projection's defining property) —
    // checked as |det J| ≈ R²·cosφ per unit (dφ, dλ) on the sphere
    for (lat <- Seq(-70.0, -23.0, 0.0, 37.0, 66.0); lon <- Seq(-90.0, 12.0)) {
      val d = 1e-6
      val (x1, y1) = m.forward(lat, lon)
      val (x2, y2) = m.forward(lat + d, lon)
      val (x3, y3) = m.forward(lat, lon + d)
      val dr = math.toRadians(d)
      // |det|: the (φ, λ) → (x, y) frame is orientation-reversing
      // (lat increases up, row order increases down)
      val det = math.abs(
        ((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) / (dr * dr))
      val r = Warp.TransverseMercator.A
      val expect = r * r * math.cos(math.toRadians(lat))
      assert(math.abs(det / expect - 1.0) < 1e-3,
        s"area scale at ($lat, $lon): ${det / expect}")
    }
    // round-trip: the closed-form inverse undoes the converged
    // forward to float64 noise
    for (lat <- Seq(-80.0, -41.5, 0.0, 33.3, 75.0);
         lon <- Seq(-150.0, -7.0, 0.0, 99.9)) {
      val (x, y) = m.forward(lat, lon)
      val (la, lo) = m.inverse(x, y)
      assert(math.abs(la - lat) < 1e-9 && math.abs(lo - lon) < 1e-9,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    // beyond-pole northing fails fast (mis-unitted georeferencing)
    val err = intercept[IllegalArgumentException](m.inverse(0.0, m.cy * 1.01))
    assert(err.getMessage.contains("Mollweide"))
    // registry resolution: ESRI:54009
    assert(Warp.projectionFor(54009).contains(m))
  }

  test("Eckert IV: converged ground truth, exact equal-area, pole lines, round-trip") {
    val k = Warp.EckertIV.world
    val r = Warp.TransverseMercator.A
    // independent ground truth: solve the auxiliary equation by
    // BISECTION (a different algorithm than the shipped Newton chain)
    // to float64 convergence, then apply the closed forward formulas
    def bisectTheta(latDeg: Double): Double = {
      val rhs = Warp.EckertIV.SinCoef * math.sin(math.toRadians(latDeg))
      def f(th: Double) = th + math.sin(th) * math.cos(th) + 2.0 * math.sin(th) - rhs
      var (lo, hi) = (-math.Pi / 2, math.Pi / 2)
      for (_ <- 1 to 200) { val mid = (lo + hi) / 2; if (f(mid) <= 0) lo = mid else hi = mid }
      (lo + hi) / 2
    }
    for (lat <- Seq(-80.0, -41.5, -5.0, 0.0, 33.3, 52.0, 75.0, 85.0);
         lon <- Seq(-150.0, 0.0, 99.9)) {
      val th = bisectTheta(lat)
      val ex = k.cx * (math.toRadians(lon)) * (1.0 + math.cos(th))
      val ey = k.cy * math.sin(th)
      val (x, y) = k.forward(lat, lon)
      assert(math.abs(x - ex) < 1e-5 && math.abs(y - ey) < 1e-5,
        s"($lat, $lon) → ($x, $y), bisection truth ($ex, $ey)")
    }
    // pole LINES, not points: at ±90 the x-extent is half the
    // equator's (1 + cos(π/2) = 1 vs 2 at the equator) and distinct
    // longitudes stay distinct plane points — hence no declared
    // plane singularities
    val (xp1, yp) = k.forward(90.0, 180.0)
    val (xp2, _) = k.forward(90.0, 90.0)
    val (xe, _) = k.forward(0.0, 180.0)
    assert(math.abs(yp - k.cy) < 1e-6)
    assert(math.abs(xp1 - xe / 2.0) < 1e-6, "pole line is half the equator")
    assert(math.abs(xp2 - xp1 / 2.0) < 1e-6)
    assert(k.planeSingularities.isEmpty)
    // the 2:1 world frame is STRUCTURAL: cy = π·cx exactly, so
    // width 2·cx·2π·R... = 2 × height 2·cy·R
    assert(k.cy == k.cx * Math.PI)
    // exact equal-area: |det J| = R²·cosφ (the constants' defining
    // identity cx·cy·(2+π/2)/2 = 1 — verifies both literals without
    // an external worked example)
    for (lat <- Seq(-70.0, -23.0, 0.0, 37.0, 66.0); lon <- Seq(-90.0, 12.0)) {
      val d = 1e-6
      val (x1, y1) = k.forward(lat, lon)
      val (x2, y2) = k.forward(lat + d, lon)
      val (x3, y3) = k.forward(lat, lon + d)
      val dr = math.toRadians(d)
      val det = math.abs(
        ((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) / (dr * dr))
      val expect = r * r * math.cos(math.toRadians(lat))
      assert(math.abs(det / expect - 1.0) < 1e-3,
        s"area scale at ($lat, $lon): ${det / expect}")
    }
    // round-trip incl. a near-pole row (the inverse is total — no
    // longitude collapse at the pole line)
    for (lat <- Seq(-89.0, -41.5, 0.0, 33.3, 75.0, 89.0);
         lon <- Seq(-150.0, -7.0, 0.0, 99.9)) {
      val (x, y) = k.forward(lat, lon)
      val (la, lo) = k.inverse(x, y)
      assert(math.abs(la - lat) < 1e-7 && math.abs(lo - lon) < 1e-7,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    // beyond-pole-line northing fails fast
    val err4 = intercept[IllegalArgumentException](k.inverse(0.0, k.cy * 1.01))
    assert(err4.getMessage.contains("Eckert"))
    // registry resolution: ESRI:54012
    assert(Warp.projectionFor(54012).contains(k))
  }

  test("Robinson: published table nodes, spline properties, pole lines, round-trip") {
    val p = Warp.Robinson.world
    val r = Warp.TransverseMercator.A
    // ground truth = the PUBLISHED Robinson table itself: the spline
    // interpolates, so at every 5° node the forward must reproduce
    // x = 0.8487·R·X·λ and y = 1.3523·R·Y with the table's X/Y
    // exactly (the projection is table-defined — the nodes ARE the
    // authoritative worked examples)
    for (k <- 0 to 18; lon <- Seq(-120.0, 30.0)) {
      val lat = 5.0 * k
      val (x, y) = p.forward(lat, lon)
      val ex = 0.8487 * r * Warp.Robinson.TableX(k) * math.toRadians(lon)
      val ey = 1.3523 * r * Warp.Robinson.TableY(k)
      assert(math.abs(x - ex) < 1e-4 && math.abs(y - ey) < 1e-4,
        s"node $lat° ($lon) → ($x, $y), table ($ex, $ey)")
      // odd/even symmetry in latitude
      val (xs, ys) = p.forward(-lat, lon)
      assert(math.abs(xs - x) < 1e-9 && math.abs(ys + y) < 1e-9)
    }
    // between nodes the spline must stay inside the bracketing node
    // values (X decreasing, Y increasing — monotone table)
    for (k <- 0 until 18; f <- Seq(0.25, 0.5, 0.75)) {
      val lat = 5.0 * (k + f)
      val (x, y) = p.forward(lat, 60.0)
      val (xLo, yLo) = p.forward(5.0 * k, 60.0)
      val (xHi, yHi) = p.forward(5.0 * (k + 1), 60.0)
      assert(x <= xLo + 1e-9 && x >= xHi - 1e-9,
        s"X not bracketed at $lat: $xHi <= $x <= $xLo")
      assert(y >= yLo - 1e-9 && y <= yHi + 1e-9,
        s"Y not bracketed at $lat")
    }
    // pole LINES (X(90°) = 0.5322 > 0): distinct longitudes stay
    // distinct, no plane singularities, inverse total in x
    val (xp1, yp) = p.forward(90.0, 180.0)
    val (xp2, _) = p.forward(90.0, 90.0)
    assert(math.abs(yp - 1.3523 * r) < 1e-6)
    assert(math.abs(xp1 - 2.0 * xp2) < 1e-6)
    assert(p.planeSingularities.isEmpty)
    // round-trip through the bisection inverse
    for (lat <- Seq(-89.0, -62.5, -13.0, 0.0, 33.3, 47.0, 75.0, 89.0);
         lon <- Seq(-150.0, -7.0, 0.0, 99.9)) {
      val (x, y) = p.forward(lat, lon)
      val (la, lo) = p.inverse(x, y)
      assert(math.abs(la - lat) < 1e-7 && math.abs(lo - lon) < 1e-7,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    // beyond-pole-line northing fails fast
    val errR = intercept[IllegalArgumentException](
      p.inverse(0.0, 1.3523 * r * 1.01))
    assert(errR.getMessage.contains("Robinson"))
    // registry resolution: ESRI:54030
    assert(Warp.projectionFor(54030).contains(p))
    // CT 23 geokey resolution (how a wild Robinson raster declares
    // itself: ProjectedCSType 32767 + CoordTrans 23): central
    // meridian + false offsets flow through
    val fromKeys = Warp.projectionFor(32767,
      Map(3075 -> 23.0, 3088 -> 10.0, 3082 -> 1000.0, 3083 -> 2000.0))
    assert(fromKeys.contains(Warp.Robinson(10.0, 1000.0, 2000.0)))
    val (xk, yk) = fromKeys.get.forward(30.0, 10.0)
    val (x0b, y0b) = p.forward(30.0, 0.0)
    assert(math.abs(xk - (x0b + 1000.0)) < 1e-6 &&
      math.abs(yk - (y0b + 2000.0)) < 1e-6,
      "lon0/false offsets must shift the world forward")
    // a CT 23 directory without a central meridian fails fast
    val errK = intercept[IllegalArgumentException](
      Warp.projectionFor(32767, Map(3075 -> 23.0)))
    assert(errK.getMessage.contains("Robinson"))
  }

  test("Winkel Tripel: Aitoff/equirectangular mean, pole lines, Newton round-trip") {
    val w = Warp.WinkelTripel.world
    val r = Warp.TransverseMercator.A
    // ground truth from the DEFINITION: the arithmetic mean of the
    // independently-computed equirectangular (at φ₁ = acos(2/π)) and
    // Aitoff projections
    def aitoff(lat: Double, lon: Double): (Double, Double) = {
      val phi = math.toRadians(lat); val lam = math.toRadians(lon)
      val alpha = math.acos(math.cos(phi) * math.cos(lam / 2))
      val sinc = if (alpha < 1e-12) 1.0 else math.sin(alpha) / alpha
      (2 * r * math.cos(phi) * math.sin(lam / 2) / sinc,
        r * math.sin(phi) / sinc)
    }
    for (lat <- Seq(-75.0, -30.0, 0.0, 18.0, 52.0, 85.0);
         lon <- Seq(-160.0, -45.0, 0.0, 10.0, 120.0)) {
      val (ax, ay) = aitoff(lat, lon)
      val ex = (r * math.toRadians(lon) * (2.0 / Math.PI) + ax) / 2
      val ey = (r * math.toRadians(lat) + ay) / 2
      val (x, y) = w.forward(lat, lon)
      assert(math.abs(x - ex) < 1e-5 && math.abs(y - ey) < 1e-5,
        s"($lat, $lon) → ($x, $y), definitional mean ($ex, $ey)")
    }
    // analytic identities: the equator maps linearly with slope
    // R·(1 + cos φ₁)/2, and the poles are LINES y = ±R·π/2 with
    // x = (R/2)·λ·cos φ₁
    val (xe, ye) = w.forward(0.0, 60.0)
    assert(math.abs(ye) < 1e-9)
    assert(math.abs(xe - r * math.toRadians(60.0) * (1 + 2.0 / Math.PI) / 2) < 1e-5)
    val (xp, yp) = w.forward(90.0, 100.0)
    assert(math.abs(yp - r * Math.PI / 2) < 1e-5, s"pole northing $yp")
    assert(math.abs(xp - w.half * math.toRadians(100.0) * w.cosPhi1) < 1e-5)
    assert(w.planeSingularities.isEmpty)
    // symmetry: x odd in λ and even in φ; y odd in φ
    val (x1, y1) = w.forward(33.0, 70.0)
    val (x2, y2) = w.forward(-33.0, 70.0)
    val (x3, y3) = w.forward(33.0, -70.0)
    assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 + y2) < 1e-9)
    assert(math.abs(x1 + x3) < 1e-9 && math.abs(y1 - y3) < 1e-9)
    // Newton round-trip across the map incl. near-pole rows
    for (lat <- Seq(-89.0, -62.5, -13.0, 0.0, 33.3, 47.0, 75.0, 89.0);
         lon <- Seq(-170.0, -99.9, -7.0, 0.0, 45.0, 170.0)) {
      val (x, y) = w.forward(lat, lon)
      val (la, lo) = w.inverse(x, y)
      assert(math.abs(la - lat) < 1e-6 && math.abs(lo - lon) < 1e-6,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    // beyond-pole-line northing fails fast
    val errW = intercept[IllegalArgumentException](
      w.inverse(0.0, r * Math.PI / 2 * 1.01))
    assert(errW.getMessage.contains("Winkel"))
    // registry resolution: ESRI:54042
    assert(Warp.projectionFor(54042).contains(w))
  }

  test("Miller cylindrical: log-tangent identity, pole lines, round-trip") {
    val m = Warp.MillerCylindrical.world
    val r = Warp.TransverseMercator.A
    // the defining identity: y(φ) = (R/0.8)·ln tan(π/4 + 0.4φ) — and
    // Miller's alternative form y = (R/0.8)·asinh(tan(0.8φ))
    for (lat <- Seq(-85.0, -45.0, -10.0, 0.0, 30.0, 60.0, 89.0)) {
      val (x, y) = m.forward(lat, 25.0)
      val phi = math.toRadians(lat)
      assert(math.abs(y - r / 0.8 * math.log(math.tan(math.Pi / 4 + 0.4 * phi))) < 1e-6)
      assert(math.abs(y - r / 0.8 *
        math.log(math.tan(0.8 * phi) + math.sqrt(1 + math.pow(math.tan(0.8 * phi), 2)))) < 1e-5,
        s"asinh form differs at $lat")
      assert(math.abs(x - r * math.toRadians(25.0)) < 1e-9)
    }
    // pole LINES at finite y (the whole point vs Mercator)
    val (_, yp) = m.forward(90.0, 0.0)
    assert(math.abs(yp - m.yPole) < 1e-9 && yp.isFinite)
    assert(m.planeSingularities.isEmpty)
    for (lat <- Seq(-89.0, -33.0, 0.0, 47.5, 89.0); lon <- Seq(-170.0, 0.0, 60.1)) {
      val (x, y) = m.forward(lat, lon)
      val (la, lo) = m.inverse(x, y)
      assert(math.abs(la - lat) < 1e-9 && math.abs(lo - lon) < 1e-9)
    }
    val errM = intercept[IllegalArgumentException](m.inverse(0.0, m.yPole * 1.01))
    assert(errM.getMessage.contains("Miller"))
    assert(Warp.projectionFor(54003).contains(m))
    assert(Warp.projectionFor(32767, Map(3075 -> 20.0, 3088 -> 5.0))
      .contains(Warp.MillerCylindrical(5.0, 0.0, 0.0)))
  }

  test("azimuthal equidistant: true center distances, pole points, round-trip") {
    val a = Warp.AzimuthalEquidistant.world
    val r = Warp.TransverseMercator.A
    // the DEFINING property: plane distance from the center equals
    // R × the great-circle angular distance, for any direction
    for (lat <- Seq(-60.0, -15.0, 0.0, 40.0, 75.0); lon <- Seq(-120.0, -30.0, 20.0, 90.0)) {
      val (x, y) = a.forward(lat, lon)
      val phi = math.toRadians(lat); val lam = math.toRadians(lon)
      val c = math.acos(math.cos(phi) * math.cos(lam))
      assert(math.abs(math.sqrt(x * x + y * y) - r * c) < 1e-5,
        s"distance not true at ($lat, $lon)")
    }
    // meridian through the center is linear: y = R·φ
    val (x0b, y0b) = a.forward(37.0, 0.0)
    assert(math.abs(x0b) < 1e-9 && math.abs(y0b - r * math.toRadians(37.0)) < 1e-6)
    // poles are single plane points at (0, ±R·π/2), declared
    val (xp, yp) = a.forward(90.0, 123.0)
    assert(math.abs(xp) < 1e-5 && math.abs(yp - r * math.Pi / 2) < 1e-5)
    assert(a.planeSingularities.map(_._3).sorted == Seq(-90.0, 90.0))
    // polar aspect (φ₁ = 90): c = π/2 − φ, due-south central meridian
    val np = Warp.AzimuthalEquidistant(90.0, 0.0, 0.0, 0.0)
    val (xn, yn) = np.forward(80.0, 0.0)
    assert(math.abs(yn + r * math.toRadians(10.0)) < 1e-5 && math.abs(xn) < 1e-9)
    for (lat <- Seq(-75.0, -20.0, 0.1, 33.3, 88.0); lon <- Seq(-150.0, -7.0, 0.0, 99.9)) {
      val (x, y) = a.forward(lat, lon)
      val (la, lo) = a.inverse(x, y)
      assert(math.abs(la - lat) < 1e-7 && math.abs(lo - lon) < 1e-7,
        s"round-trip ($lat, $lon) → ($la, $lo)")
      val (xq, yq) = np.forward(lat, lon)
      val (laq, loq) = np.inverse(xq, yq)
      assert(math.abs(laq - lat) < 1e-7 && math.abs(loq - lon) < 1e-7,
        s"polar round-trip ($lat, $lon) → ($laq, $loq)")
    }
    val errA = intercept[IllegalArgumentException](a.inverse(r * math.Pi * 1.01, 0.0))
    assert(errA.getMessage.contains("azimuthal"))
    assert(Warp.projectionFor(54032).contains(a))
    assert(Warp.projectionFor(32767, Map(3075 -> 12.0, 3089 -> 52.0, 3088 -> 10.0))
      .contains(Warp.AzimuthalEquidistant(52.0, 10.0, 0.0, 0.0)))
  }

  test("Van der Grinten: circle frame, branch identities, cubic-inverse round-trip") {
    val v = Warp.VanDerGrinten.world
    val r = Warp.TransverseMercator.A
    val piR = math.Pi * r
    // equator is linear (x = R·Δλ); central meridian is the
    // tangent-of-half-theta curve; poles are the circle's top/bottom
    val (xe, ye) = v.forward(0.0, 45.0)
    assert(math.abs(ye) < 1e-9 && math.abs(xe - r * math.toRadians(45.0)) < 1e-9)
    val (xm, ym) = v.forward(50.0, 0.0)
    val th50 = math.asin(2.0 * math.toRadians(50.0) / math.Pi)
    assert(math.abs(xm) < 1e-9 && math.abs(ym - piR * math.tan(th50 / 2)) < 1e-6)
    val (xp, yp) = v.forward(90.0, 77.0)
    assert(math.abs(xp) < 1e-9 && math.abs(yp - piR) < 1e-6)
    assert(v.planeSingularities.map(_._3).sorted == Seq(-90.0, 90.0))
    // the whole world stays inside the radius-πR circle, and the
    // antimeridian at the equator sits exactly ON it
    for (lat <- Seq(-80.0, -30.0, 15.0, 60.0); lon <- Seq(-179.0, -90.0, 45.0, 179.0)) {
      val (x, y) = v.forward(lat, lon)
      assert(x * x + y * y <= piR * piR * (1 + 1e-9), s"($lat,$lon) left the circle")
    }
    val (xa, ya) = v.forward(0.0, 180.0)
    assert(math.abs(math.sqrt(xa * xa + ya * ya) - piR) < 1e-6)
    // symmetry: x odd in λ, y odd in φ, each even in the other
    val (x1, y1) = v.forward(33.0, 70.0)
    val (x2, y2) = v.forward(-33.0, 70.0)
    val (x3, y3) = v.forward(33.0, -70.0)
    assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 + y2) < 1e-9)
    assert(math.abs(x1 + x3) < 1e-9 && math.abs(y1 - y3) < 1e-9)
    // closed-form cubic inverse round-trips the general branch AND
    // the equator/meridian/pole-adjacent branches
    for (lat <- Seq(-85.0, -47.3, -0.0, 12.5, 33.3, 66.6, 89.0);
         lon <- Seq(-175.0, -99.9, -7.0, 0.0, 45.0, 175.0)) {
      val (x, y) = v.forward(lat, lon)
      val (la, lo) = v.inverse(x, y)
      assert(math.abs(la - lat) < 1e-6 && math.abs(lo - lon) < 1e-6,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    val errV = intercept[IllegalArgumentException](v.inverse(piR * 1.01, 0.0))
    assert(errV.getMessage.contains("Grinten"))
    assert(Warp.projectionFor(54029).contains(v))
    assert(Warp.projectionFor(32767, Map(3075 -> 25.0, 3088 -> 0.0)).contains(v))
  }

  test("polyconic: arc-per-parallel geometry, true scales, Newton inverse") {
    val p = Warp.Polyconic.world
    val a = Warp.TransverseMercator.A
    val e2 = Warp.TransverseMercator.E2
    // EXTERNAL meridian-arc ground truth: Simpson integration of the
    // ellipsoidal arc integrand M(φ) = ∫ a(1−e²)/(1−e²sin²t)^{3/2} dt
    // — independent of the Snyder 3-21 series the engine evaluates
    def arcNum(latDeg: Double): Double = {
      val phi = math.toRadians(latDeg)
      val n = 20000
      val h = phi / n
      def f(t: Double) = {
        val s = math.sin(t)
        a * (1 - e2) / math.pow(1 - e2 * s * s, 1.5)
      }
      (0 until n).map { i =>
        (f(i * h) + 4 * f((i + 0.5) * h) + f((i + 1) * h)) * h / 6
      }.sum
    }
    // central meridian carries the TRUE meridian arc (scale 1)
    for (lat <- Seq(-60.0, -23.5, 15.0, 45.0, 80.0)) {
      val (x, y) = p.forward(lat, 0.0)
      assert(math.abs(x) < 1e-9, s"x on the central meridian at $lat")
      assert(math.abs(y - arcNum(lat)) < 0.02,
        s"meridian arc at $lat: $y vs ${arcNum(lat)}")
    }
    // the equator row is the true-scale line x = a·Δλ
    val (xe, ye) = p.forward(0.0, 30.0)
    assert(math.abs(xe - a * math.toRadians(30.0)) < 1e-6 && math.abs(ye) < 1e-6)
    // DEFINING property: each parallel is a circular arc of radius
    // N·cotφ centered on the central meridian at (0, M + N·cotφ)
    for (lat <- Seq(-45.0, 20.0, 55.0); lon <- Seq(-40.0, -5.0, 12.0, 60.0)) {
      val phi = math.toRadians(lat)
      val sinP = math.sin(phi)
      val nCot = a / math.sqrt(1 - e2 * sinP * sinP) * math.cos(phi) / sinP
      val (cx, cy) = (0.0, arcNum(lat) + nCot)
      val (x, y) = p.forward(lat, lon)
      assert(math.abs(math.hypot(x - cx, y - cy) - math.abs(nCot)) < 0.02,
        s"parallel $lat not on its arc at lon $lon")
      // …and the parallel is TRUE TO SCALE: the arc angle from the
      // central meridian is E = Δλ·sinφ, so arc length = N·cosφ·Δλ
      val ang = math.atan2(x - cx, (cy - y) * math.signum(sinP))
      assert(math.abs(math.abs(ang) -
        math.abs(math.toRadians(lon) * sinP)) < 1e-9,
        s"arc angle at ($lat, $lon)")
    }
    // poles are single plane points on x = 0, declared as covered caps
    val (xp, yp) = p.forward(90.0, 135.0)
    assert(math.abs(xp) < 1e-6 && math.abs(yp - arcNum(90.0)) < 0.05)
    assert(p.planeSingularities.map(_._3).sorted == Seq(-90.0, 90.0))
    // Newton-inverse round-trip: world instance over a wide window,
    // Brazil instance (EPSG:5880 parameters) over its own territory
    val br = Warp.Polyconic.brazil
    for (lat <- Seq(-75.0, -33.75, -0.0, 0.004, 28.0, 71.5);
         lon <- Seq(-55.0, -9.0, 0.0, 24.0, 48.0)) {
      val (x, y) = p.forward(lat, lon)
      val (la, lo) = p.inverse(x, y)
      assert(math.abs(la - lat) < 5e-8 && math.abs(lo - lon) < 5e-8,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    for (lat <- Seq(-33.0, -15.2, -2.3, 4.4); lon <- Seq(-73.9, -54.0, -34.8)) {
      val (x, y) = br.forward(lat, lon)
      val (la, lo) = br.inverse(x, y)
      assert(math.abs(la - lat) < 5e-8 && math.abs(lo - lon) < 5e-8,
        s"Brazil round-trip ($lat, $lon) → ($la, $lo)")
    }
    // round-15 advice: the inverse must cover the FULL plane, not just
    // |Δλ| ≤ 90° — wide-Δλ points where Newton diverges (lat 20,
    // Δλ 150°) and high-latitude points whose parallel arcs ABOVE the
    // pole's y (lat 80, Δλ 120° has y > mPole — valid off the central
    // meridian) must both invert; ESRI:54021 is registered as
    // World_Polyconic so a world-extent lattice hits these
    for (lat <- Seq(-84.0, -60.0, -20.0, 20.0, 60.0, 80.0, 88.0);
         lon <- Seq(-179.0, -150.0, -120.0, 95.0, 120.0, 150.0, 179.0)) {
      val (x, y) = p.forward(lat, lon)
      val (la, lo) = p.inverse(x, y)
      assert(math.abs(la - lat) < 5e-8 && math.abs(lo - lon) < 5e-7,
        s"wide round-trip ($lat, $lon) → ($la, $lo)")
    }
    // the specific advice reproducer: y beyond the pole's meridian arc
    // off the central meridian is VALID and must invert
    val (xw, yw) = p.forward(80.0, 120.0)
    assert(yw > arcNum(90.0), "lat 80 / Δλ 120 should arc above the pole")
    val (law, low) = p.inverse(xw, yw)
    assert(math.abs(law - 80.0) < 5e-8 && math.abs(low - 120.0) < 5e-7)
    // a northing past the pole's arc ON the central meridian is the
    // one truly-invalid case — fails fast, naming the family
    val errP = intercept[IllegalArgumentException](
      p.inverse(0.0, arcNum(90.0) * 1.01))
    assert(errP.getMessage.contains("polyconic"))
    // registry + geokey resolution, with the key fallback order
    assert(Warp.projectionFor(54021).contains(p))
    assert(Warp.projectionFor(5880).contains(br))
    assert(Warp.projectionFor(32767,
      Map(3075 -> 22.0, 3081 -> 0.0, 3080 -> -54.0,
        3082 -> 5000000.0, 3083 -> 10000000.0)).contains(br))
    val eLon = intercept[IllegalArgumentException](
      Warp.Polyconic.fromGeoKeys(Map(3081 -> 0.0)))
    assert(eLon.getMessage.contains("3080"))
  }

  test("ellipsoidal Mercator and equirectangular from geokeys") {
    // CT 7 — the EPSG:3395 World Mercator shape
    val m = Warp.MercatorEllipsoidal.fromGeoKeys(Map(3075 -> 7.0, 3080 -> 0.0))
    // equator maps to y = 0; x is linear in longitude at A per radian
    assert(math.abs(m.forward(0.0, 10.0)._2) < 1e-9)
    assert(math.abs(m.forward(0.0, 90.0)._1 -
      Warp.TransverseMercator.A * Math.PI / 2) < 1e-6)
    // ellipsoidal ≠ spherical web mercator: the northing difference at
    // 45° is kilometres (the reason EPSG:3395 is its own CRS)
    val ySph = graft.geo.Geom.toWebMercatorY(45.0)
    val yEll = m.forward(45.0, 0.0)._2
    assert(math.abs(ySph - yEll) > 10000.0, s"sph $ySph vs ell $yEll")
    // conformality: parallel-wise and meridian-wise scales agree
    for (lat <- Seq(-30.0, 20.0, 55.0)) {
      val eps = 1e-4
      val (xa, ya) = m.forward(lat, 10.0)
      val (xb, yb) = m.forward(lat, 10.0 + eps)
      val (xc, yc) = m.forward(lat + eps, 10.0)
      val s = math.sin(math.toRadians(lat))
      val w = math.sqrt(1 - Warp.TransverseMercator.E2 * s * s)
      val nu = Warp.TransverseMercator.A / w
      val rhoM = Warp.TransverseMercator.A *
        (1 - Warp.TransverseMercator.E2) / (w * w * w)
      val kPar = math.hypot(xb - xa, yb - ya) /
        (nu * math.cos(math.toRadians(lat)) * math.toRadians(eps))
      val kMer = math.hypot(xc - xa, yc - ya) / (rhoM * math.toRadians(eps))
      assert(math.abs(kPar / kMer - 1.0) < 1e-4, s"anisotropy at $lat")
    }
    // round-trip + a standard-parallel variant reduces scale
    for (lat <- Seq(-60.0, -5.0, 33.3, 70.0); lon <- Seq(-120.0, 0.0, 77.7)) {
      val (x, y) = m.forward(lat, lon)
      val (la, lo) = m.inverse(x, y)
      assert(math.abs(la - lat) < 1e-7 && math.abs(lo - lon) < 1e-7,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    val mTs = Warp.MercatorEllipsoidal(41.0, 0.0, 0.0, 0.0)
    assert(mTs.k0 < 0.76 && mTs.k0 > 0.74, s"k0(41°) = ${mTs.k0}")
    assert(Warp.projectionFor(3395).exists(_.isInstanceOf[Warp.MercatorEllipsoidal]))

    // CT 17 — equidistant cylindrical: closed-form EXACT
    val eq = Warp.Equirectangular.fromGeoKeys(Map(3075 -> 17.0, 3078 -> 45.0,
      3080 -> 10.0))
    val (ex1, ey1) = eq.forward(30.0, 20.0)
    assert(ex1 == Warp.TransverseMercator.A * math.cos(math.toRadians(45.0)) *
      math.toRadians(10.0))
    assert(ey1 == Warp.TransverseMercator.A * math.toRadians(30.0))
    for (lat <- Seq(-80.0, 0.0, 66.6); lon <- Seq(-170.0, 10.0, 150.0)) {
      val (x, y) = eq.forward(lat, lon)
      val (la, lo) = eq.inverse(x, y)
      assert(math.abs(la - lat) < 1e-12 && math.abs(lo - lon) < 1e-12)
    }
    assert(Warp.projectionFor(32662).exists(_.isInstanceOf[Warp.Equirectangular]))
    assert(Warp.projectionFor(4087).exists(_.isInstanceOf[Warp.Equirectangular]))
  }

  test("bilinear contributions: partition of unity, interior value, nd renorm") {
    val latt = Warp.ProjectedLattice(Warp.TransverseMercator.utm(32633),
      x0 = 400000.0, yTop = 5000000.0, pixelM = 10000.0,
      tilesX = 2, tilesY = 2, pxPerTile = 20)
    val mkBands = (f: (Int, Int) => Double) =>
      (stx: Int, sty: Int) => Seq(Array.tabulate(400) { i =>
        f(stx * 20 + i % 20, sty * 20 + i / 20)
      })
    val linear = mkBands((gx, gy) => gx * 2.0 + gy * 3.0)
    // accumulate (wv, ws) per target pixel across all source tiles
    val wv = scala.collection.mutable.Map.empty[(Int, Int, Int), Double]
    val ws = scala.collection.mutable.Map.empty[(Int, Int, Int), Double]
    for (stx <- 0 until 2; sty <- 0 until 2)
      latt.contributionsOfBilinear(stx, sty, linear(stx, sty), -1.0)
        .foreach { case ((ttx, tty), (_, idxs, bwv, bws)) =>
          idxs.indices.foreach { k =>
            val key = (ttx, tty, idxs(k))
            wv(key) = wv.getOrElse(key, 0.0) + bwv.head(k)
            ws(key) = ws.getOrElse(key, 0.0) + bws.head(k)
          }
        }
    assert(wv.nonEmpty)
    // weights sum to 1 for every emitted pixel (all 4 clamped stencil
    // neighbors exist and carry data) — including pixels whose stencil
    // straddles source tiles
    ws.values.foreach(s => assert(math.abs(s - 1.0) < 1e-12, s))
    // a bilinear interpolation of a LINEAR field reproduces the field
    // exactly: value = gxc·2 + gyc·3 at the continuous stencil center
    var checked = 0
    wv.keys.take(500).foreach { case key @ (ttx, tty, i) =>
      val gx = ttx * 20 + i % 20
      val gy = tty * 20 + i / 20
      val lat = latt.originLat - (gy + 0.5) * latt.pixelDeg
      val lon = latt.originLon + (gx + 0.5) * latt.pixelDeg
      val (x, y) = latt.proj.forward(lat, lon)
      val fx = (x - 400000.0) / 10000.0 - 0.5
      val fy = (5000000.0 - y) / 10000.0 - 0.5
      // strictly interior stencils only (clamping bends the field)
      if (fx >= 0 && fx < 38.9 && fy >= 0 && fy < 38.9) {
        val expect = fx * 2.0 + fy * 3.0
        assert(math.abs(wv(key) / ws(key) - expect) < 1e-9,
          s"$key: ${wv(key) / ws(key)} vs $expect")
        checked += 1
      }
    }
    assert(checked > 100, s"only $checked interior pixels checked")
    // no_data neighbors drop out of BOTH sums: a checkerboard where
    // odd pixels are nd keeps the even neighbors' weights only, so
    // the renormalized value is exactly the even-value mean
    val nd = mkBands((gx, gy) => if ((gx + gy) % 2 == 1) -1.0 else 7.0)
    val wv2 = scala.collection.mutable.Map.empty[(Int, Int, Int), Double]
    val ws2 = scala.collection.mutable.Map.empty[(Int, Int, Int), Double]
    for (stx <- 0 until 2; sty <- 0 until 2)
      latt.contributionsOfBilinear(stx, sty, nd(stx, sty), -1.0)
        .foreach { case ((ttx, tty), (_, idxs, bwv, bws)) =>
          idxs.indices.foreach { k =>
            val key = (ttx, tty, idxs(k))
            wv2(key) = wv2.getOrElse(key, 0.0) + bwv.head(k)
            ws2(key) = ws2.getOrElse(key, 0.0) + bws.head(k)
          }
        }
    // every pixel with ANY surviving weight renormalizes to exactly 7
    var renormed = 0
    wv2.foreach { case (key, v) =>
      if (ws2(key) > 1e-9) {
        assert(math.abs(v / ws2(key) - 7.0) < 1e-12, s"$key: ${v / ws2(key)}")
        renormed += 1
      }
    }
    assert(renormed > 100, s"only $renormed renormalized pixels")
  }

  test("bilinear near-pole: stencil overhang is covered, unity holds") {
    // EASE-2 near 89.5°N: one 10 km northing step spans MANY equator-
    // pixelDeg of latitude, so a fixed 2-px angular candidate pad
    // missed target tiles whose stencil reaches one pixel into a
    // neighboring source tile — partial weight silently renormalized
    val cea = Warp.CylindricalEqualArea.ease2
    val yTop = cea.forward(89.5, 10.0)._2
    val latt = Warp.ProjectedLattice(cea,
      x0 = 200000.0, yTop = yTop, pixelM = 10000.0,
      tilesX = 2, tilesY = 2, pxPerTile = 8)
    val bands = (stx: Int, sty: Int) =>
      Seq(Array.tabulate(64)(i => (stx * 1000 + sty * 100 + i).toDouble))
    val ws = scala.collection.mutable.Map.empty[(Int, Int, Int), Double]
    for (stx <- 0 until 2; sty <- 0 until 2)
      latt.contributionsOfBilinear(stx, sty, bands(stx, sty), -1.0)
        .foreach { case ((ttx, tty), (_, idxs, _, bws)) =>
          idxs.indices.foreach { k =>
            val key = (ttx, tty, idxs(k))
            ws(key) = ws.getOrElse(key, 0.0) + bws.head(k)
          }
        }
    // independent scan: the set of VALID target centers (center floors
    // into the source span) — every one must be emitted with total
    // weight exactly 1 (all 4 clamped neighbors exist and carry data)
    var valid = 0
    for {
      gy <- 0 until latt.tilesYTarget * 8
      gx <- 0 until latt.tilesXTarget * 8
    } {
      val lat = latt.originLat - (gy + 0.5) * latt.pixelDeg
      val lon = latt.originLon + (gx + 0.5) * latt.pixelDeg
      val (x, y) = cea.forward(lat, lon)
      val sgx = Math.floor((x - 200000.0) / 10000.0).toInt
      val sgy = Math.floor((yTop - y) / 10000.0).toInt
      if (sgx >= 0 && sgx < 16 && sgy >= 0 && sgy < 16) {
        valid += 1
        val key = (gx / 8, gy / 8, (gy % 8) * 8 + gx % 8)
        val w = ws.getOrElse(key, 0.0)
        assert(math.abs(w - 1.0) < 1e-9,
          s"pixel $key (lat ${lat}%.4f): weight $w — stencil partial lost")
      }
    }
    assert(valid > 50, s"only $valid valid pixels — fixture degenerate")
    assert(ws.size == valid, s"${ws.size} emitted vs $valid valid")
  }

  test("geokey params round-trip through the GeoTIFF writer/reader") {
    val params = Map[Int, Double](
      3075 -> 11.0, 3078 -> 29.5, 3079 -> 45.5,
      3085 -> 23.0, 3084 -> -96.0, 3086 -> 1000.0, 3087 -> 2000.0)
    val r = GeoTiff.Raster(4, 4, -400000.0, 1900000.0, 10000.0, 32767,
      GeoTiff.SampleType.Int32, Seq(Array.tabulate(16)(_.toDouble)),
      geoParams = params)
    val p = java.nio.file.Files.createTempDirectory("aea").resolve("t.tif")
    GeoTiff.writeRaster(p, r)
    val back = GeoTiff.readRaster(java.nio.file.Files.readAllBytes(p))
    assert(back.epsg == 32767)
    assert(back.geoParams == params)
    assert(back.bands.head.toSeq == r.bands.head.toSeq)
    // the COG writer must carry the params too — a user-defined CRS
    // with no parameter keys is an un-georeferenceable file
    val pc = p.resolveSibling("t_cog.tif")
    GeoTiff.writeCogRaster(pc, r, blockSize = 16)
    val backCog = GeoTiff.readRaster(java.nio.file.Files.readAllBytes(pc))
    assert(backCog.epsg == 32767 && backCog.geoParams == params)
  }

  test("Lambert azimuthal equal-area: aspects, area preservation, round-trip") {
    import Warp.TransverseMercator.{A, E2}
    // ----- oblique aspect: the EPSG:3035 Europe parameterization -----
    val params = Map[Int, Double](
      3075 -> 10.0, 3089 -> 52.0, 3088 -> 10.0,
      3082 -> 4321000.0, 3083 -> 3210000.0)
    val laea = Warp.LambertAzimuthalEqualArea.fromGeoKeys(params)
    // the projection center maps to the false offsets
    val (x0, y0) = laea.forward(52.0, 10.0)
    assert(math.abs(x0 - 4321000.0) < 1e-6 && math.abs(y0 - 3210000.0) < 1e-6,
      s"origin → ($x0, $y0)")
    // authalic-sphere radius: the published WGS84 authalic mean radius
    assert(math.abs(laea.rq - 6371007.1809) < 0.01, s"Rq = ${laea.rq}")
    // the DEFINING property — the local area scale is 1 everywhere:
    // finite-difference parallelogram area vs the ellipsoidal area
    // element M·ν·cosφ dφ dλ
    def areaScale(p: Warp.Projection, lat: Double, lon: Double): Double = {
      val h = 1e-4
      val (xa, ya) = p.forward(lat, lon)
      val (xb, yb) = p.forward(lat + h, lon)
      val (xc, yc) = p.forward(lat, lon + h)
      val planar = math.abs(
        (xb - xa) * (yc - ya) - (xc - xa) * (yb - ya))
      val s = math.sin(math.toRadians(lat))
      val w = 1.0 - E2 * s * s
      val m = A * (1.0 - E2) / (w * math.sqrt(w))
      val nu = A / math.sqrt(w)
      planar / (m * nu * math.cos(math.toRadians(lat)) *
        math.toRadians(h) * math.toRadians(h))
    }
    for (lat <- Seq(35.0, 45.0, 52.0, 65.0); lon <- Seq(-10.0, 10.0, 30.0))
      assert(math.abs(areaScale(laea, lat, lon) - 1.0) < 1e-5,
        s"area scale at ($lat, $lon) = ${areaScale(laea, lat, lon)}")
    // round-trip across the European window: 5e-8° ≈ 5 mm
    for (li <- 0 to 6; lj <- 0 to 6) {
      val lat = 34.0 + li * 6.0
      val lon = -15.0 + lj * 10.0
      val (x, y) = laea.forward(lat, lon)
      val (la, lo) = laea.inverse(x, y)
      assert(math.abs(la - lat) < 5e-8 && math.abs(lo - lon) < 5e-8,
        s"round-trip ($lat, $lon) → ($la, $lo)")
    }
    // the oblique aspect maps BOTH poles to finite y-axis points
    val sings = laea.planeSingularities
    assert(sings.map(_._3).sorted == Seq(-90.0, 90.0))
    for ((sx, sy, latDeg) <- sings) {
      val (fx, fy) = laea.forward(latDeg, 123.0) // any longitude
      // cb = √(1−sb²) amplifies the last-ulp error of q/qp at the
      // exact pole to ~√ulp ≈ meter level — irrelevant against the
      // singularity's 2-px containment pad at any real pixel size
      assert(math.abs(fx - sx) < 1.0 && math.abs(fy - sy) < 1.0,
        s"pole $latDeg image ($fx, $fy) vs declared ($sx, $sy)")
    }
    // geokey resolution: CT 10 builds it; registry code too
    assert(Warp.projectionFor(32767, params)
      .exists(_.isInstanceOf[Warp.LambertAzimuthalEqualArea]))
    assert(Warp.projectionFor(3035).contains(Warp.LambertAzimuthalEqualArea.laeaEurope))
    val e = intercept[IllegalArgumentException](
      Warp.LambertAzimuthalEqualArea.fromGeoKeys(Map(3075 -> 10.0, 3088 -> 10.0)))
    assert(e.getMessage.contains("3089"))

    // ----- polar aspects: EASE-Grid 2.0 North / South -----
    val north = Warp.LambertAzimuthalEqualArea.ease2North
    val south = Warp.LambertAzimuthalEqualArea.ease2South
    assert(Warp.projectionFor(6931).contains(north))
    assert(Warp.projectionFor(6932).contains(south))
    // the pole is the origin at any longitude
    for (lon <- Seq(-120.0, 0.0, 77.0)) {
      val (nx, ny) = north.forward(90.0, lon)
      assert(math.hypot(nx, ny) < 1e-6, s"north pole → ($nx, $ny)")
    }
    // constant latitude is a circle; area preserved; round-trip holds
    val rho83 = math.hypot(north.forward(83.0, 0.0)._1, north.forward(83.0, 0.0)._2)
    for (lon <- Seq(-150.0, -45.0, 30.0, 170.0)) {
      val (x, y) = north.forward(83.0, lon)
      assert(math.abs(math.hypot(x, y) - rho83) < 1e-6)
      val (la, lo) = north.inverse(x, y)
      assert(math.abs(la - 83.0) < 5e-8 && math.abs(lo - lon) < 5e-8)
    }
    for (lat <- Seq(60.0, 75.0, 89.0))
      assert(math.abs(areaScale(north, lat, 40.0) - 1.0) < 1e-5)
    // the south aspect mirrors: same radius at the mirrored latitude
    val (sx2, sy2) = south.forward(-83.0, 30.0)
    assert(math.abs(math.hypot(sx2, sy2) - rho83) < 1e-6)
    val (sla, slo) = south.inverse(sx2, sy2)
    assert(math.abs(sla + 83.0) < 5e-8 && math.abs(slo - 30.0) < 5e-8)
    // a pole-containing lattice takes the full-longitude path
    val latt = Warp.ProjectedLattice(north,
      x0 = -200000.0, yTop = 200000.0, pixelM = 10000.0,
      tilesX = 2, tilesY = 2, pxPerTile = 20)
    assert(latt.originLon == -180.0 && latt.originLat == 90.0)
    // exclusive ownership under the azimuthal rotation
    val contribs = latt.contributionsOf(0, 0,
      Seq(Array.tabulate(400)(_.toDouble))).toSeq
    assert(contribs.nonEmpty)
    val all = contribs.flatMap { case ((ttx, tty), (idxs, _)) =>
      idxs.map(i => (ttx, tty, i)) }
    assert(all.distinct.length == all.length, "overlapping ownership")
  }

  test("equator tile is (nearly) isotropic; polar tile is rejected") {
    val t = GeoTiff.Tile(4, 4, 0.0, 2.0, 1.0, Array.tabulate(16)(identity))
    val r = Warp.tileToWebMercator(t)
    // |lat| ≤ 2°: x and y scales agree within 0.1%
    assert(math.abs(r.pixelScaleY / r.pixelScale - 1.0) < 1e-3)
    val polar = GeoTiff.Tile(4, 4, 0.0, 89.0, 1.0, new Array[Int](16))
    val e = intercept[IllegalArgumentException](Warp.tileToWebMercator(polar))
    assert(e.getMessage.contains("mercator"))
  }

  test("oblique stereographic (Dutch RD): published point, round-trip, conformality") {
    val rd = Warp.ObliqueStereographic.rdNew
    // the false origin IS the natural origin: forward(φ0, λ0) = (FE, FN)
    val (ox, oy) = rd.forward(52.0 + 9.0 / 60 + 22.178 / 3600,
      5.0 + 23.0 / 60 + 15.500 / 3600)
    assert(math.abs(ox - 155000.0) < 1e-6 && math.abs(oy - 463000.0) < 1e-6,
      s"origin → ($ox, $oy)")
    // IOGP Guidance Note 7-2's worked example for EPSG method 9809
    // (Amersfoort / RD New): 53°N 6°E → E 196105.283, N 557057.739
    val (ex, ny) = rd.forward(53.0, 6.0)
    assert(math.abs(ex - 196105.283) < 0.01 && math.abs(ny - 557057.739) < 0.01,
      s"GN7-2 example → ($ex, $ny)")
    // mm-level round trip across the RD domain (inverse iterates the
    // isometric latitude to 1e-14 rad)
    for (lat <- Seq(50.6, 51.5, 52.2, 53.4); lon <- Seq(3.2, 4.9, 6.1, 7.2)) {
      val (x, y) = rd.forward(lat, lon)
      val (la, lo) = rd.inverse(x, y)
      assert(math.abs(la - lat) < 1e-9 && math.abs(lo - lon) < 1e-9,
        s"round trip ($lat, $lon) → ($la, $lo)")
    }
    // conformal: meridian and parallel scale factors agree on the
    // PROJECTION'S OWN ellipsoid (Bessel) to finite-difference level
    val a = Warp.ObliqueStereographic.BesselA
    val e2 = Warp.ObliqueStereographic.BesselE2
    for (lat <- Seq(51.0, 52.2, 53.0); lon <- Seq(4.0, 5.4, 6.5)) {
      val h = 1e-4
      val (xa, ya) = rd.forward(lat, lon)
      val (xb, yb) = rd.forward(lat + h, lon)
      val (xc, yc) = rd.forward(lat, lon + h)
      val s = math.sin(math.toRadians(lat))
      val w = 1.0 - e2 * s * s
      val m = a * (1.0 - e2) / (w * math.sqrt(w))
      val nu = a / math.sqrt(w)
      val kLat = math.hypot(xb - xa, yb - ya) / (m * math.toRadians(h))
      val kLon = math.hypot(xc - xa, yc - ya) /
        (nu * math.cos(math.toRadians(lat)) * math.toRadians(h))
      assert(math.abs(kLat / kLon - 1.0) < 1e-6, s"anisotropy at ($lat, $lon)")
      // and scale at the origin parallel sits near k0
      assert(kLat > 0.9998 && kLat < 1.0002, s"scale $kLat at ($lat, $lon)")
    }
  }

  test("oblique stereographic: geokeys, registry code, pole images, degenerates") {
    val rd = Warp.ObliqueStereographic.rdNew
    // registry code resolves to the RD parameterization WITH the
    // Amersfoort datum shift composed (proj's implicit towgs84)
    assert(Warp.projectionFor(28992).contains(Warp.DatumShifted(rd,
      Warp.Helmert7.amersfoort, Warp.ObliqueStereographic.BesselA,
      Warp.ObliqueStereographic.BesselE2)))
    // CT 16 (and the CT 14 alias) with Bessel carried in 2057/2059
    val keys = Map[Int, Double](
      3081 -> rd.lat0Deg, 3080 -> rd.lon0Deg, 3092 -> 0.9999079,
      3082 -> 155000.0, 3083 -> 463000.0,
      2057 -> Warp.ObliqueStereographic.BesselA,
      2059 -> Warp.ObliqueStereographic.BesselInvF)
    for (ct <- Seq(14.0, 16.0)) {
      val p = Warp.projectionFor(32767, keys + (3075 -> ct))
      assert(p.contains(rd), s"CT $ct")
    }
    // without 2057/2059 the figure defaults to WGS84 — a DIFFERENT
    // projection (~100 m): the ellipsoid keys are load-bearing
    val wgs = Warp.projectionFor(32767,
      (keys - 2057 - 2059) + (3075 -> 16.0)).get
    val (bx, by) = rd.forward(53.0, 6.0)
    val (wx, wy) = wgs.forward(53.0, 6.0)
    assert(math.hypot(wx - bx, wy - by) > 10.0, "Bessel vs WGS84 must differ")
    // pole images: forwarding near-pole approaches the declared
    // singularity points (the poles map FINITE in the oblique aspect)
    val Seq((pxn, pyn, pln), (pxs, pys, pls)) = rd.planeSingularities
    assert(pln == 90.0 && pls == -90.0 && pxn == 155000.0 && pxs == 155000.0)
    val (nx, ny2) = rd.forward(89.9999, 77.0) // any longitude
    assert(math.hypot(nx - pxn, ny2 - pyn) < 50.0, s"north pole image ($nx, $ny2)")
    // south pole: the stereographic scale is ~10 there (far
    // hemisphere), so the 1e-4° ≈ 11 m step lands ~100 m away
    val (sx, sy) = rd.forward(-89.9999, -13.0)
    assert(math.hypot(sx - pxs, sy - pys) < 500.0, s"south pole image ($sx, $sy)")
    // the EXACT poles are finite (not NaN) and land ON the declared
    // points — the naive (1+sinφ)/(1−sinφ) would ∞/∞-NaN at +90
    val (nex, ney) = rd.forward(90.0, 123.0)
    assert(math.hypot(nex - pxn, ney - pyn) < 1e-6, s"exact north pole ($nex, $ney)")
    val (sex, sey) = rd.forward(-90.0, -7.0)
    assert(math.hypot(sex - pxs, sey - pys) < 1e-3, s"exact south pole ($sex, $sey)")
    // degenerate parameters fail fast with messages
    val e1 = intercept[IllegalArgumentException](
      Warp.ObliqueStereographic(90.0, 0.0, 0.0, 0.0))
    assert(e1.getMessage.contains("polar"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Warp.ObliqueStereographic(52.0, 5.0, 0.0, 0.0, k0 = 0.0))
    assert(e2.getMessage.contains("k0"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      Warp.ObliqueStereographic(52.0, 5.0, 0.0, 0.0, aAxis = -1.0))
    assert(e3.getMessage.contains("degenerate"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](
      Warp.ObliqueStereographic.fromGeoKeys(Map(3075 -> 16.0)))
    assert(e4.getMessage.contains("missing"), e4.getMessage)
  }

  test("helmert datum shift: Amersfoort ground truth, <1 cm round trip, fallbacks") {
    import Warp.{DatumShifted, Helmert7}
    val bA = Warp.ObliqueStereographic.BesselA
    val bE2 = Warp.ObliqueStereographic.BesselE2
    // Published ground truth: the Amersfoort datum point (Bessel
    // 52°09′22.178″N 5°23′15.500″E) maps to WGS84 (52.155172,
    // 5.387203) — the NSGI/RDNAPTRANS reference value, accurate to the
    // towgs84 set's ~0.25-0.5 m class. 0.5 m ≈ 4.5e-6° lat.
    val latB = 52.0 + 9.0 / 60 + 22.178 / 3600
    val lonB = 5.0 + 23.0 / 60 + 15.500 / 3600
    val (wLat, wLon) = DatumShifted.applyShift(latB, lonB, bA, bE2,
      Helmert7.amersfoort, DatumShifted.WgsA, DatumShifted.WgsE2)
    assert(math.abs(wLat - 52.155172) < 4.5e-6, s"datum point lat $wLat")
    assert(math.abs(wLon - 5.387203) < 7.4e-6, s"datum point lon $wLon")
    // …and through the full registry projection: the RD false origin
    // (155000, 463000) IS the datum point's plane image, so the
    // composed inverse must land on the same WGS84 coordinates.
    val rd28992 = Warp.projectionFor(28992).get
    val (iLat, iLon) = rd28992.inverse(155000.0, 463000.0)
    assert(math.abs(iLat - 52.155172) < 4.5e-6, s"28992 inverse lat $iLat")
    assert(math.abs(iLon - 5.387203) < 7.4e-6, s"28992 inverse lon $iLon")
    // forward∘inverse < 1 cm across the RD domain — the Warp.scala
    // doc claim, both directions: plane→geodetic→plane in meters and
    // geodetic→plane→geodetic in degrees (1 cm ≈ 9e-8° lat).
    for (x <- Seq(10000.0, 155000.0, 260000.0, 390000.0);
         y <- Seq(310000.0, 463000.0, 550000.0, 610000.0)) {
      val (la, lo) = rd28992.inverse(x, y)
      val (x2, y2) = rd28992.forward(la, lo)
      assert(math.hypot(x2 - x, y2 - y) < 0.01,
        s"plane round trip ($x,$y) → ($x2,$y2)")
    }
    for (lat <- Seq(50.8, 51.9, 52.9, 53.4); lon <- Seq(3.4, 4.8, 6.0, 7.1)) {
      val (x, y) = rd28992.forward(lat, lon)
      val (la, lo) = rd28992.inverse(x, y)
      assert(math.abs(la - lat) < 9e-8 && math.abs(lo - lon) < 1.5e-7,
        s"geodetic round trip ($lat,$lon) → ($la,$lo)")
    }
    // identity shift is rejected at construction…
    val eId = intercept[IllegalArgumentException](
      DatumShifted(Warp.ObliqueStereographic.rdNew,
        Helmert7(0, 0, 0, 0, 0, 0, 0), bA, bE2))
    assert(eId.getMessage.contains("identity"))
    // …an all-zero 2062 key set is the identity — generic resolution
    // falls back to the BASE projection (no DatumShifted wrap)…
    val ctKeys = Map[Int, Double](3075 -> 16.0,
      3081 -> latB, 3080 -> lonB, 3092 -> 0.9999079,
      3082 -> 155000.0, 3083 -> 463000.0,
      2057 -> bA, 2059 -> Warp.ObliqueStereographic.BesselInvF)
    val zeros = (0 until 7).map(i => (GeoTiff.Towgs84Base + i) -> 0.0).toMap
    assert(Warp.projectionFor(32767, ctKeys ++ zeros)
      .contains(Warp.ObliqueStereographic.rdNew), "all-zero 2062 = identity")
    // …as does a key set with no 2062 values at all
    assert(Warp.projectionFor(32767, ctKeys)
      .contains(Warp.ObliqueStereographic.rdNew), "no 2062 keys = base")
    // a full 7-value 2062 set composes DatumShifted over the geokey
    // projection with the source figure from 2057/2059 — the GENERIC
    // towgs84Of path must equal the 28992 registry shortcut
    val h = Helmert7.amersfoort
    val seven = Seq(h.tx, h.ty, h.tz, h.rxSec, h.rySec, h.rzSec, h.dsPpm)
    val withShift = ctKeys ++ seven.zipWithIndex.map {
      case (v, i) => (GeoTiff.Towgs84Base + i) -> v }
    assert(Warp.projectionFor(32767, withShift).contains(
      DatumShifted(Warp.ObliqueStereographic.rdNew, h, bA, bE2)),
      "generic 7-value path = registry composition")
    // a 3-value set (geocentric translation, EPSG 9603) wraps with
    // zero rotations/scale
    val three = ctKeys ++ Seq(h.tx, h.ty, h.tz).zipWithIndex.map {
      case (v, i) => (GeoTiff.Towgs84Base + i) -> v }
    assert(Warp.projectionFor(32767, three).contains(
      DatumShifted(Warp.ObliqueStereographic.rdNew,
        Helmert7(h.tx, h.ty, h.tz, 0, 0, 0, 0), bA, bE2)))
  }

  test("geotiff 2062 geokey: 3/7-value write→read round trip, malformed fails fast") {
    val dir = java.nio.file.Files.createTempDirectory("towgs84")
    val h = Warp.Helmert7.amersfoort
    val base = Map[Int, Double](3075 -> 16.0, 3081 -> 52.15, 3080 -> 5.38,
      3092 -> 0.9999079, 3082 -> 155000.0, 3083 -> 463000.0,
      2057 -> Warp.ObliqueStereographic.BesselA,
      2059 -> Warp.ObliqueStereographic.BesselInvF)
    def raster(params: Map[Int, Double]) = GeoTiff.Raster(
      2, 2, 0.0, 600000.0, 10000.0, 32767, GeoTiff.SampleType.Int32,
      Seq(Array(1.0, 2.0, 3.0, 4.0)), geoParams = params)
    for ((n, vals) <- Seq(
        3 -> Seq(h.tx, h.ty, h.tz),
        7 -> Seq(h.tx, h.ty, h.tz, h.rxSec, h.rySec, h.rzSec, h.dsPpm))) {
      val params = base ++ vals.zipWithIndex.map {
        case (v, i) => (GeoTiff.Towgs84Base + i) -> v }
      val p = dir.resolve(s"t$n.tif")
      GeoTiff.writeRaster(p, raster(params), "deflate")
      val back = GeoTiff.readRaster(java.nio.file.Files.readAllBytes(p))
      // bit-exact through the GeoDoubleParams array, and the reader's
      // generic resolution composes the DatumShifted projection
      assert(back.geoParams == params, s"$n-value 2062 round trip")
      val proj = Warp.projectionFor(back.epsg, back.geoParams)
      assert(proj.exists(_.isInstanceOf[Warp.DatumShifted]),
        s"$n-value 2062 must compose DatumShifted")
    }
    // malformed: 5 values is neither 3 nor 7 — the writer fails fast
    val bad5 = base ++ (0 until 5).map(i => (GeoTiff.Towgs84Base + i) -> 1.0)
    val e = intercept[IllegalArgumentException](
      GeoTiff.writeRaster(dir.resolve("bad.tif"), raster(bad5), "none"))
    assert(e.getMessage.contains("3 or 7"), e.getMessage)
    // malformed: non-contiguous indices fail the same guard
    val gap = base + ((GeoTiff.Towgs84Base + 0) -> 1.0) +
      ((GeoTiff.Towgs84Base + 2) -> 2.0) + ((GeoTiff.Towgs84Base + 4) -> 3.0)
    val e2 = intercept[IllegalArgumentException](
      GeoTiff.writeRaster(dir.resolve("bad2.tif"), raster(gap), "none"))
    assert(e2.getMessage.contains("3 or 7"), e2.getMessage)
  }
}
