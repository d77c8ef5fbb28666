package graft.raster

import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz across EVERY projection family (deterministic seed):
  * the targeted WarpSpec cases pin published parameterizations; this
  * sweeps RANDOM parameter sets through the same two contracts —
  * forward∘inverse is the identity to the series-truncation level,
  * and the family's DEFINING metric property holds (conformal
  * families: local isotropy; equal-area families: unit area scale) —
  * so a regression in any family's math fails on parameters nobody
  * hand-picked. */
class WarpFuzzSpec extends AnyFunSuite {

  import Warp.TransverseMercator.{A, E2}
  private val rnd = new scala.util.Random(41)
  private def uni(lo: Double, hi: Double): Double = lo + (hi - lo) * rnd.nextDouble()

  /** forward∘inverse identity over a lat/lon window (5e-8° ≈ 5 mm —
    * the 3-term inverse series' truncation level). */
  private def roundTrip(p: Warp.Projection, lat0: Double, lat1: Double,
                        lon0: Double, lon1: Double, tol: Double = 5e-8): Unit =
    for (li <- 0 to 4; lj <- 0 to 4) {
      val lat = lat0 + (lat1 - lat0) * li / 4.0
      val lon = lon0 + (lon1 - lon0) * lj / 4.0
      val (x, y) = p.forward(lat, lon)
      val (la, lo) = p.inverse(x, y)
      assert(math.abs(la - lat) < tol && math.abs(lo - lon) < tol,
        s"$p round-trip ($lat, $lon) → ($la, $lo)")
    }

  /** Local area scale: finite-difference parallelogram vs the
    * ellipsoidal area element M·ν·cosφ dφ dλ. */
  private def areaScale(p: Warp.Projection, lat: Double, lon: Double): Double = {
    val h = 1e-4
    val (xa, ya) = p.forward(lat, lon)
    val (xb, yb) = p.forward(lat + h, lon)
    val (xc, yc) = p.forward(lat, lon + h)
    val planar = math.abs((xb - xa) * (yc - ya) - (xc - xa) * (yb - ya))
    val s = math.sin(math.toRadians(lat))
    val w = 1.0 - E2 * s * s
    val m = A * (1.0 - E2) / (w * math.sqrt(w))
    val nu = A / math.sqrt(w)
    planar / (m * nu * math.cos(math.toRadians(lat)) *
      math.toRadians(h) * math.toRadians(h))
  }

  /** Conformal isotropy: the meridian and parallel scale factors
    * agree (finite differences vs the ellipsoidal arc elements). */
  private def isotropyError(p: Warp.Projection, lat: Double, lon: Double): Double = {
    val h = 1e-4
    val (xa, ya) = p.forward(lat, lon)
    val (xb, yb) = p.forward(lat + h, lon)
    val (xc, yc) = p.forward(lat, lon + h)
    val s = math.sin(math.toRadians(lat))
    val w = 1.0 - E2 * s * s
    val m = A * (1.0 - E2) / (w * math.sqrt(w))
    val nu = A / math.sqrt(w)
    val kLat = math.hypot(xb - xa, yb - ya) / (m * math.toRadians(h))
    val kLon = math.hypot(xc - xa, yc - ya) /
      (nu * math.cos(math.toRadians(lat)) * math.toRadians(h))
    math.abs(kLat / kLon - 1.0)
  }

  test("transverse mercator: random zones round-trip near the meridian") {
    for (_ <- 0 until 8) {
      val lon0 = uni(-177.0, 177.0)
      val tm = Warp.TransverseMercator(lon0, falseE = 500000.0,
        falseN = if (rnd.nextBoolean()) 0.0 else 1.0e7)
      roundTrip(tm, -80.0, 84.0, lon0 - 3.0, lon0 + 3.0)
      // conformal within the zone (series level at 3° off-meridian)
      for (lat <- Seq(-60.0, 0.0, 45.0))
        assert(isotropyError(tm, lat, lon0 + 2.0) < 1e-5,
          s"TM($lon0) anisotropy at $lat")
    }
  }

  test("equal-area families: unit area scale for random parameters") {
    for (_ <- 0 until 8) {
      val cea = Warp.CylindricalEqualArea(uni(0.0, 60.0), uni(-170.0, 170.0),
        uni(-1e6, 1e6), uni(-1e6, 1e6))
      roundTrip(cea, -80.0, 80.0, cea.lam0.toDegrees - 8.0, cea.lam0.toDegrees + 8.0)
      for (lat <- Seq(-70.0, -10.0, 35.0, 75.0))
        assert(math.abs(areaScale(cea, lat, cea.lam0.toDegrees + 3.0) - 1.0) < 1e-5)

      val s1 = uni(15.0, 40.0); val s2 = s1 + uni(5.0, 25.0)
      val aea = Warp.AlbersEqualArea(s1, s2, uni(s1 - 10, s1), uni(-150.0, 150.0),
        uni(0.0, 1e6), uni(0.0, 1e6))
      roundTrip(aea, math.max(5.0, s1 - 20.0), s2 + 20.0,
        aea.lam0.toDegrees - 30.0, aea.lam0.toDegrees + 30.0)
      for (lat <- Seq(s1 - 5.0, (s1 + s2) / 2, s2 + 10.0))
        assert(math.abs(areaScale(aea, lat, aea.lam0.toDegrees + 10.0) - 1.0) < 1e-5,
          s"Albers($s1, $s2) area at $lat")

      val laea = Warp.LambertAzimuthalEqualArea(uni(-65.0, 65.0), uni(-150.0, 150.0),
        uni(0.0, 5e6), uni(0.0, 5e6))
      roundTrip(laea, laea.lat0Deg - 25.0, laea.lat0Deg + 25.0,
        laea.lon0Deg - 35.0, laea.lon0Deg + 35.0)
      for (dlat <- Seq(-20.0, 0.0, 20.0))
        assert(math.abs(areaScale(laea, laea.lat0Deg + dlat,
          laea.lon0Deg + 15.0) - 1.0) < 1e-5)

      val sin = Warp.Sinusoidal(uni(-150.0, 150.0), 0.0, 0.0)
      roundTrip(sin, -75.0, 75.0, sin.lam0.toDegrees - 40.0, sin.lam0.toDegrees + 40.0)
      for (lat <- Seq(-50.0, 10.0, 60.0))
        assert(math.abs(areaScale(sin, lat, sin.lam0.toDegrees + 20.0) - 1.0) < 1e-5)
    }
  }

  test("conformal families: isotropy for random parameters") {
    for (_ <- 0 until 8) {
      val s1 = uni(20.0, 40.0); val s2 = s1 + uni(5.0, 20.0)
      val lcc = Warp.LambertConformalConic(s1, s2, uni(s1, s2), uni(-150.0, 150.0),
        uni(0.0, 1e6), uni(0.0, 1e6))
      roundTrip(lcc, s1 - 15.0, s2 + 15.0,
        lcc.lam0.toDegrees - 25.0, lcc.lam0.toDegrees + 25.0)
      for (lat <- Seq(s1 - 10.0, (s1 + s2) / 2, s2 + 8.0))
        assert(isotropyError(lcc, lat, lcc.lam0.toDegrees + 12.0) < 1e-5,
          s"LCC($s1, $s2) anisotropy at $lat")

      val one = Warp.LambertConformalConic(s1, s1, s1, uni(-150.0, 150.0),
        0.0, 0.0, k0 = uni(0.96, 1.0))
      roundTrip(one, s1 - 15.0, s1 + 15.0,
        one.lam0.toDegrees - 25.0, one.lam0.toDegrees + 25.0)
      assert(isotropyError(one, s1 + 6.0, one.lam0.toDegrees + 9.0) < 1e-5)

      val ps = Warp.PolarStereographic(
        if (rnd.nextBoolean()) uni(60.0, 85.0) else -uni(60.0, 85.0),
        uni(-150.0, 150.0), uni(0.0, 1e6), uni(0.0, 1e6))
      val sgn = if (ps.latTsDeg >= 0) 1.0 else -1.0
      roundTrip(ps, sgn * 55.0, sgn * 89.5, ps.lon0Deg - 120.0, ps.lon0Deg + 120.0,
        tol = 1e-7)
      assert(isotropyError(ps, sgn * 70.0, ps.lon0Deg + 30.0) < 1e-5)

      val mer = Warp.MercatorEllipsoidal(uni(0.0, 45.0), uni(-150.0, 150.0),
        0.0, 0.0)
      roundTrip(mer, -75.0, 75.0, mer.lam0.toDegrees - 40.0, mer.lam0.toDegrees + 40.0)
      for (lat <- Seq(-55.0, 0.0, 66.0))
        assert(isotropyError(mer, lat, mer.lam0.toDegrees + 11.0) < 1e-5)
    }
  }

  /** Isotropy with the projection's OWN figure — the double
    * stereographic fuzzes RANDOM ellipsoids (its RD instance lives on
    * Bessel), so the WGS84-constant helper above would misreport. */
  private def isotropyErrorOn(p: Warp.Projection, a: Double, e2: Double,
                              lat: Double, lon: Double): Double = {
    val h = 1e-4
    val (xa, ya) = p.forward(lat, lon)
    val (xb, yb) = p.forward(lat + h, lon)
    val (xc, yc) = p.forward(lat, lon + h)
    val s = math.sin(math.toRadians(lat))
    val w = 1.0 - e2 * s * s
    val m = a * (1.0 - e2) / (w * math.sqrt(w))
    val nu = a / math.sqrt(w)
    val kLat = math.hypot(xb - xa, yb - ya) / (m * math.toRadians(h))
    val kLon = math.hypot(xc - xa, yc - ya) /
      (nu * math.cos(math.toRadians(lat)) * math.toRadians(h))
    math.abs(kLat / kLon - 1.0)
  }

  test("oblique stereographic: random origins, scales AND ellipsoids") {
    for (_ <- 0 until 8) {
      val invF = uni(290.0, 310.0)
      val f = 1.0 / invF
      val os = Warp.ObliqueStereographic(
        lat0Deg = uni(-70.0, 70.0), lon0Deg = uni(-150.0, 150.0),
        falseE = uni(0.0, 1e6), falseN = uni(0.0, 1e6),
        k0 = uni(0.999, 1.0),
        aAxis = uni(6.35e6, 6.40e6), e2 = f * (2.0 - f))
      roundTrip(os, os.lat0Deg - 15.0, math.min(85.0, os.lat0Deg + 15.0),
        os.lon0Deg - 20.0, os.lon0Deg + 20.0, tol = 1e-8)
      for (dlat <- Seq(-10.0, 0.0, 10.0))
        assert(isotropyErrorOn(os, os.aAxis, os.e2,
          os.lat0Deg + dlat, os.lon0Deg + 8.0) < 1e-5,
          s"sterea(${os.lat0Deg}, e2=${os.e2}) anisotropy at dlat $dlat")
    }
  }

  test("equirectangular: exact x/y linearity for random parallels") {
    for (_ <- 0 until 8) {
      val eq = Warp.Equirectangular(uni(0.0, 60.0), uni(-150.0, 150.0), 0.0, 0.0)
      roundTrip(eq, -80.0, 80.0, eq.lam0.toDegrees - 40.0, eq.lam0.toDegrees + 40.0,
        tol = 1e-9)
    }
  }

  test("random lattices keep exclusive pixel ownership across families") {
    val projs: Seq[Warp.Projection] = Seq(
      Warp.TransverseMercator(uni(-90.0, 90.0), 500000.0, 0.0),
      Warp.AlbersEqualArea(25.0, 45.0, 30.0, uni(-90.0, 90.0), 0.0, 0.0),
      Warp.LambertConformalConic(30.0, 44.0, 36.0, uni(-90.0, 90.0), 0.0, 0.0),
      Warp.LambertAzimuthalEqualArea(uni(-50.0, 50.0), uni(-90.0, 90.0), 0.0, 0.0),
      Warp.Sinusoidal(uni(-90.0, 90.0), 0.0, 0.0))
    for (p <- projs) {
      // a mid-latitude rectangle in the projection's own plane
      val (cx, cy) = p.forward(38.0, p match {
        case t: Warp.TransverseMercator => Math.toDegrees(t.lam0) + 1.0
        case a: Warp.AlbersEqualArea => Math.toDegrees(a.lam0) + 5.0
        case l: Warp.LambertConformalConic => Math.toDegrees(l.lam0) + 5.0
        case l: Warp.LambertAzimuthalEqualArea => l.lon0Deg + 5.0
        case s: Warp.Sinusoidal => Math.toDegrees(s.lam0) + 5.0
        case _ => 0.0
      })
      val latt = Warp.ProjectedLattice(p,
        x0 = cx - 200000.0, yTop = cy + 200000.0, pixelM = 10000.0,
        tilesX = 2, tilesY = 2, pxPerTile = 20)
      val bands = Seq(Array.tabulate(400)(_.toDouble))
      val owned = (for (stx <- 0 until 2; sty <- 0 until 2)
        yield latt.contributionsOf(stx, sty, bands).toSeq).flatten
      val all = owned.flatMap { case ((ttx, tty), (idxs, _)) =>
        idxs.map(i => (ttx, tty, i)) }
      assert(all.nonEmpty, s"$p produced no contributions")
      assert(all.distinct.length == all.length, s"$p overlapping ownership")
    }
  }
}
