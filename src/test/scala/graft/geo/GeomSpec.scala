package graft.geo

import org.scalatest.funsuite.AnyFunSuite

class GeomSpec extends AnyFunSuite {

  private val square = Polygon(Array(Array(
    (0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0))))

  test("WKB roundtrip for all geometry types") {
    val geoms: Seq[Geom] = Seq(
      Point(1.5, -2.5),
      MultiPoint(Array((1.0, 2.0), (3.0, 4.0))),
      LineString(Array((0.0, 0.0), (1.0, 1.0), (2.0, 0.0))),
      MultiLineString(Array(Array((0.0, 0.0), (1.0, 1.0)), Array((2.0, 2.0), (3.0, 3.0)))),
      square,
      MultiPolygon(Array(square.rings)))
    geoms.foreach { g => assertSame(Geom.fromWkb(Geom.toWkb(g)), g) }
  }

  // case classes with Array fields don't have structural equality; compare via GeoJSON
  private def assertSame(a: Geom, b: Geom): Unit =
    assert(Geom.toGeoJson(a) == Geom.toGeoJson(b))

  test("WKB roundtrip preserves GeoJSON form") {
    val g = MultiPolygon(Array(square.rings))
    assertSame(Geom.fromWkb(Geom.toWkb(g)), g)
  }

  test("GeoJSON roundtrip") {
    val json = """{"type":"Polygon","coordinates":[[[0,0],[10,0],[10,10],[0,10],[0,0]]]}"""
    val g = Geom.fromGeoJson(json)
    assert(Geom.toGeoJson(g) == json)
  }

  test("GeoJSON parses nested MultiPolygon with holes and spaces") {
    val json =
      """{ "type": "MultiPolygon", "coordinates":
        | [[[[0,0],[10,0],[10,10],[0,10],[0,0]], [[2,2],[4,2],[4,4],[2,4],[2,2]]]] }""".stripMargin
    val g = Geom.fromGeoJson(json).asInstanceOf[MultiPolygon]
    assert(g.polys.length == 1 && g.polys(0).length == 2)
  }

  test("point in polygon: interior, exterior, boundary, hole") {
    assert(Geom.pointInPolygon(5, 5, square.rings))
    assert(!Geom.pointInPolygon(15, 5, square.rings))
    assert(Geom.pointInPolygon(0, 5, square.rings)) // boundary counts
    val holed = Polygon(Array(
      square.rings(0),
      Array((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))))
    assert(!Geom.pointInPolygon(3, 3, holed.rings)) // inside hole = outside
    assert(Geom.pointInPolygon(5, 5, holed.rings))
  }

  test("intersects: disjoint, overlap, touch, containment, crossing line") {
    val far = Polygon(Array(Array((20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 30.0), (20.0, 20.0))))
    val overlap = Polygon(Array(Array((5.0, 5.0), (15.0, 5.0), (15.0, 15.0), (5.0, 15.0), (5.0, 5.0))))
    val inner = Polygon(Array(Array((2.0, 2.0), (3.0, 2.0), (3.0, 3.0), (2.0, 3.0), (2.0, 2.0))))
    assert(!Geom.intersects(square, far))
    assert(Geom.intersects(square, overlap))
    assert(Geom.intersects(square, inner)) // containment: no edge crossing
    assert(Geom.intersects(inner, square)) // symmetric
    val crossing = LineString(Array((-5.0, 5.0), (15.0, 5.0)))
    assert(Geom.intersects(square, crossing))
    assert(Geom.intersects(Point(5, 5), square))
    assert(!Geom.intersects(Point(11, 11), square))
  }

  test("within") {
    val inner = Polygon(Array(Array((2.0, 2.0), (3.0, 2.0), (3.0, 3.0), (2.0, 3.0), (2.0, 2.0))))
    assert(Geom.within(Point(5, 5), square))
    assert(!Geom.within(Point(11, 5), square))
    assert(Geom.within(inner, square))
    assert(!Geom.within(square, inner))
  }

  test("geodesic area: 1-degree equatorial square ≈ 1.2364e6 ha") {
    // a 1°×1° cell at the equator is ~111.19 km × ~111.32 km ≈ 1.236e6 ha
    val cell = Polygon(Array(Array((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0))))
    val ha = Geom.areaHa(cell)
    assert(math.abs(ha - 1.2364e6) / 1.2364e6 < 0.01, s"got $ha")
  }

  test("geodesic area shrinks with latitude; holes subtract") {
    val eq = Polygon(Array(Array((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0))))
    val high = Polygon(Array(Array((0.0, 60.0), (1.0, 60.0), (1.0, 61.0), (0.0, 61.0), (0.0, 60.0))))
    assert(Geom.areaHa(high) < Geom.areaHa(eq) * 0.55)
    val holed = Polygon(Array(
      Array((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)),
      Array((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))))
    val full = Polygon(Array(holed.rings(0)))
    assert(Geom.areaHa(holed) < Geom.areaHa(full))
  }

  test("web mercator known values") {
    assert(Geom.toWebMercatorX(0) == 0.0)
    assert(math.abs(Geom.toWebMercatorX(180) - 2.0037508342789244e7) < 1)
    assert(math.abs(Geom.toWebMercatorY(0)) < 1e-6) // tan(π/4) is 1-ulp off 1.0
    assert(math.abs(Geom.toWebMercatorY(45) - 5621521.486192066) < 1)
  }

  test("envelope clip") {
    val clipped = Geom.clipToEnvelope(square, 5, 5, 20, 20).asInstanceOf[Polygon]
    val (minx, miny, maxx, maxy) = clipped.bbox
    assert(minx == 5 && miny == 5 && maxx == 10 && maxy == 10)
    // polygon fully outside the box → empty
    val gone = Geom.clipToEnvelope(square, 50, 50, 60, 60).asInstanceOf[Polygon]
    assert(gone.rings.forall(_.isEmpty))
  }

  test("convex clip: triangle ∩ square") {
    // CCW triangle covering the lower-left of the square
    val tri = Array((-5.0, -5.0), (8.0, -5.0), (-5.0, 8.0), (-5.0, -5.0))
    val clipped = Geom.clipToConvex(square, tri).asInstanceOf[Polygon]
    val (minx, miny, maxx, maxy) = clipped.bbox
    assert(minx == 0 && miny == 0)
    // hypotenuse x+y=3 cuts the square at (3,0) and (0,3)
    assert(math.abs(maxx - 3.0) < 1e-9 && math.abs(maxy - 3.0) < 1e-9)
    // clip area (triangle corner inside square) = 3*3/2
    val area = {
      val r = clipped.rings(0)
      math.abs(r.zip(r.tail).map { case ((x1, y1), (x2, y2)) => x1 * y2 - x2 * y1 }.sum / 2)
    }
    assert(math.abs(area - 4.5) < 1e-9)
    // disjoint convex clip → empty
    val far = Array((50.0, 50.0), (60.0, 50.0), (50.0, 60.0), (50.0, 50.0))
    assert(Geom.clipToConvex(square, far).asInstanceOf[Polygon].rings.forall(_.isEmpty))
    // clip == envelope-clip when the clip is a box
    val box = Array((5.0, 5.0), (20.0, 5.0), (20.0, 20.0), (5.0, 20.0), (5.0, 5.0))
    val viaConvex = Geom.clipToConvex(square, box)
    val viaEnv = Geom.clipToEnvelope(square, 5, 5, 20, 20)
    assert(viaConvex.bbox == viaEnv.bbox)
  }

  test("douglas-peucker simplify drops collinear-ish vertices, keeps corners") {
    val line = LineString(Array((0.0, 0.0), (1.0, 0.01), (2.0, -0.01), (3.0, 0.0), (3.0, 5.0)))
    val simp = Geom.simplify(line, 0.1).asInstanceOf[LineString]
    assert(simp.coords.length == 3)
    assert(simp.coords.head == ((0.0, 0.0)) && simp.coords.last == ((3.0, 5.0)))
  }

  test("geostore id shape: md5-as-uuid") {
    val wkb = Geom.toWkb(Point(1.25, 2.5))
    val json = Geom.toGeoJson(Geom.fromWkb(wkb))
    assert(json == """{"type":"Point","coordinates":[1.25,2.5]}""")
  }
}
