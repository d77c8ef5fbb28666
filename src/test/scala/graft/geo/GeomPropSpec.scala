package graft.geo

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the geometry core (SURVEY §5: bbox
  * consistency, predicate symmetry, codec round-trips, measure
  * positivity). */
class GeomPropSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  private val genCoord: Gen[(Double, Double)] = for {
    x <- Gen.chooseNum(-170.0, 170.0)
    y <- Gen.chooseNum(-80.0, 80.0)
  } yield (x, y)

  private val genRing: Gen[Array[(Double, Double)]] = for {
    n <- Gen.chooseNum(3, 12)
    pts <- Gen.listOfN(n, genCoord)
  } yield (pts :+ pts.head).toArray

  private val genPolygon: Gen[Polygon] = genRing.map(r => Polygon(Array(r)))
  private val genLine: Gen[LineString] =
    Gen.chooseNum(2, 10).flatMap(n => Gen.listOfN(n, genCoord)).map(l => LineString(l.toArray))
  private val genGeom: Gen[Geom] = Gen.oneOf(
    genCoord.map { case (x, y) => Point(x, y) },
    genLine,
    genPolygon,
    genPolygon.map(p => MultiPolygon(Array(p.rings))))

  test("bbox contains every coordinate") {
    check("bbox", Prop.forAll(genGeom) { g =>
      val (minx, miny, maxx, maxy) = g.bbox
      var ok = true
      g.foreachCoord((x, y) =>
        ok &&= x >= minx && x <= maxx && y >= miny && y <= maxy)
      ok
    })
  }

  test("point in polygon implies point in polygon bbox") {
    check("pip-bbox", Prop.forAll(genPolygon, genCoord) { case (poly, (x, y)) =>
      val (minx, miny, maxx, maxy) = poly.bbox
      !Geom.pointInPolygon(x, y, poly.rings) ||
        (x >= minx && x <= maxx && y >= miny && y <= maxy)
    })
  }

  test("intersects is symmetric") {
    check("sym", Prop.forAll(genGeom, genGeom) { (a, b) =>
      Geom.intersects(a, b) == Geom.intersects(b, a)
    })
  }

  test("a polygon intersects itself and its own vertices") {
    check("self", Prop.forAll(genPolygon) { p =>
      Geom.intersects(p, p) &&
        p.rings(0).forall { case (x, y) => Geom.pointInPolygon(x, y, p.rings) }
    })
  }

  test("WKB round-trip preserves canonical GeoJSON") {
    check("wkb", Prop.forAll(genGeom) { g =>
      Geom.toGeoJson(Geom.fromWkb(Geom.toWkb(g))) == Geom.toGeoJson(g)
    })
  }

  test("GeoJSON round-trip is stable") {
    check("geojson", Prop.forAll(genGeom) { g =>
      val j = Geom.toGeoJson(g)
      Geom.toGeoJson(Geom.fromGeoJson(j)) == j
    })
  }

  test("geodesic area is non-negative and monotone for nested boxes") {
    val genBox = for {
      cx <- Gen.chooseNum(-160.0, 160.0)
      cy <- Gen.chooseNum(-70.0, 70.0)
      h <- Gen.chooseNum(0.1, 8.0)
    } yield (cx, cy, h)
    check("area", Prop.forAll(genBox) { case (cx, cy, h) =>
      def box(half: Double) = Polygon(Array(Array(
        (cx - half, cy - half), (cx + half, cy - half),
        (cx + half, cy + half), (cx - half, cy + half), (cx - half, cy - half))))
      val a1 = Geom.areaHa(box(h / 2))
      val a2 = Geom.areaHa(box(h))
      a1 >= 0 && a2 > a1
    })
  }

  test("envelope clip stays inside the envelope") {
    check("clip", Prop.forAll(genPolygon) { p =>
      val clipped = Geom.clipToEnvelope(p, -50, -40, 50, 40)
      var ok = true
      clipped.foreachCoord((x, y) =>
        ok &&= x >= -50 - 1e-9 && x <= 50 + 1e-9 && y >= -40 - 1e-9 && y <= 40 + 1e-9)
      ok
    })
  }

  test("simplify preserves endpoints and never adds vertices") {
    check("simplify", Prop.forAll(genLine, Gen.chooseNum(0.0, 5.0)) { (l, eps) =>
      val s = Geom.simplify(l, eps).asInstanceOf[LineString]
      s.coords.length <= l.coords.length &&
        s.coords.head == l.coords.head && s.coords.last == l.coords.last
    })
  }

  test("haversine distance: symmetric, non-negative, zero at identity") {
    check("dist", Prop.forAll(genCoord, genCoord) { case ((x1, y1), (x2, y2)) =>
      val d = Geom.distanceSphere(x1, y1, x2, y2)
      d >= 0 &&
        math.abs(d - Geom.distanceSphere(x2, y2, x1, y1)) < 1e-6 &&
        Geom.distanceSphere(x1, y1, x1, y1) == 0.0
    })
  }

  test("geometry-to-point distance: zero exactly inside, else positive") {
    check("d2p", Prop.forAll(genPolygon, genCoord) { case (poly, (x, y)) =>
      val d = Geom.distanceToPoint(poly, x, y)
      d >= 0 && ((d == 0.0) == Geom.pointInPolygon(x, y, poly.rings))
    })
    // point geometries delegate to the exact haversine
    check("d2p-pt", Prop.forAll(genCoord, genCoord) { case ((x1, y1), (x2, y2)) =>
      Geom.distanceToPoint(Point(x1, y1), x2, y2) ==
        Geom.distanceSphere(x1, y1, x2, y2)
    })
  }

  test("web mercator is monotone") {
    check("merc", Prop.forAll(Gen.chooseNum(-179.0, 179.0), Gen.chooseNum(-84.0, 84.0)) {
      (lon, lat) =>
        Geom.toWebMercatorX(lon) < Geom.toWebMercatorX(lon + 0.5) &&
          Geom.toWebMercatorY(lat) < Geom.toWebMercatorY(lat + 0.5)
    })
  }
}
