package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** The general-intersection family: ear-clipping triangulation,
  * concave ST_Intersection (both the convex-clip fast path and the
  * decomposition path), snap-to-grid, make-valid. Areas compare
  * through [[Geom.planarArea]]; tolerances cover only float
  * accumulation across pieces (~1e-9 relative). */
class GeomClipSpec extends AnyFunSuite {

  private def poly(pts: (Double, Double)*): Polygon =
    Polygon(Array((pts :+ pts.head).toArray))
  private def area(g: Geom): Double = g match {
    case Polygon(rs) => Geom.planarArea(rs)
    case MultiPolygon(ps) => ps.map(Geom.planarArea).sum
    case _ => 0.0
  }

  private val lShape = poly( // area 1.3*0.5 + 0.5*0.7 = 1.0
    (0, 0), (1.3, 0), (1.3, 0.5), (0.5, 0.5), (0.5, 1.2), (0, 1.2))

  test("triangulation partitions the ring's area (convex and concave)") {
    val star = poly((0, 0), (2, -1), (4, 0), (3, 2), (4, 4), (2, 3), (0, 4), (1, 2))
    for (p <- Seq(lShape, star, poly((0, 0), (3, 0), (3, 3), (0, 3)))) {
      val tris = Geom.triangulate(p.rings(0))
      val sum = tris.map(t => math.abs(Geom.signedArea2(t)) / 2).sum
      assert(math.abs(sum - area(p)) < 1e-9, s"tri sum $sum vs ${area(p)}")
    }
  }

  test("concave subject x rectangle: exact hand-computed areas") {
    // cell fully inside the horizontal arm
    val c1 = Geom.intersection(lShape, poly((0.6, 0.1), (1.0, 0.1), (1.0, 0.4), (0.6, 0.4)))
    assert(math.abs(area(c1) - 0.4 * 0.3) < 1e-12)
    // cell straddling the notch corner: area = cell minus notch overlap
    val c2 = Geom.intersection(lShape, poly((0.3, 0.3), (0.8, 0.3), (0.8, 0.8), (0.3, 0.8)))
    // overlap with notch (x>0.5, y>0.5): 0.3*0.3
    assert(math.abs(area(c2) - (0.25 - 0.09)) < 1e-12)
    // disjoint cell
    val c3 = Geom.intersection(lShape, poly((2.0, 2.0), (3.0, 2.0), (3.0, 3.0), (2.0, 3.0)))
    assert(area(c3) == 0.0)
  }

  test("concave CLIP decomposes: both argument orders agree on area") {
    val convex = poly((0.2, -0.3), (1.6, 0.1), (1.4, 1.5), (0.1, 1.1))
    val viaDecomposition = Geom.intersection(convex, lShape) // L is the clip → triangulated
    val viaConvexPath = Geom.intersection(lShape, convex)    // convex clip → one-pass SH
    assert(math.abs(area(viaDecomposition) - area(viaConvexPath)) < 1e-9,
      s"${area(viaDecomposition)} vs ${area(viaConvexPath)}")
    assert(area(viaConvexPath) > 0)
  }

  test("subject holes subtract from the clipped area") {
    val withHole = Polygon(Array(
      Array((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)),
      Array((0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5))))
    val clip = poly((0.0, 0.0), (1.0, 0.0), (1.0, 2.0), (0.0, 2.0))
    val out = Geom.intersection(withHole, clip)
    // left half of the square (2.0) minus left half of the hole (0.5)
    assert(math.abs(area(out) - 1.5) < 1e-12)
  }

  test("holes in the CLIP geometry subtract exactly") {
    val donutClip = Polygon(Array(
      Array((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)),
      Array((0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5))))
    // subject covers the left half: keeps 1.0 of the outer minus 0.5
    // of the hole
    val subject = poly((0.0, 0.0), (1.0, 0.0), (1.0, 2.0), (0.0, 2.0))
    val out = Geom.intersection(subject, donutClip)
    assert(math.abs(area(out) - 1.5) < 1e-12, s"area ${area(out)}")
    // subject strictly inside the hole → empty
    val inHole = poly((0.7, 0.7), (1.3, 0.7), (1.3, 1.3), (0.7, 1.3))
    assert(area(Geom.intersection(inHole, donutClip)) < 1e-12)
    // concave subject × donut clip: both orders agree (subject holes
    // and clip holes land on the same area)
    val viaClipHole = Geom.intersection(lShape, donutClip)
    val viaSubjHole = Geom.intersection(donutClip, lShape)
    assert(math.abs(area(viaClipHole) - area(viaSubjHole)) < 1e-9,
      s"${area(viaClipHole)} vs ${area(viaSubjHole)}")
    assert(area(viaClipHole) > 0)
    // CONCAVE hole in the clip: L-shaped hole punched from a square;
    // subject = whole square → area is outer minus hole exactly
    val concaveHole = Polygon(Array(
      Array((-1.0, -1.0), (3.0, -1.0), (3.0, 3.0), (-1.0, 3.0), (-1.0, -1.0)),
      lShape.rings(0)))
    val whole = poly((-1.0, -1.0), (3.0, -1.0), (3.0, 3.0), (-1.0, 3.0))
    assert(math.abs(area(Geom.intersection(whole, concaveHole)) - (16.0 - 1.0)) < 1e-9)
  }

  test("grid cells partition a concave polygon (conservation over many cells)") {
    // L placed to straddle 9 cells with awkward offsets
    val shifted = Polygon(Array(lShape.rings(0).map { case (x, y) => (x - 0.87, y - 0.43) }))
    var total = 0.0
    for (ix <- -2 to 1; iy <- -2 to 1) {
      val cell = poly((ix, iy), (ix + 1, iy), (ix + 1, iy + 1), (ix, iy + 1))
      total += area(Geom.intersection(shifted, cell))
    }
    assert(math.abs(total - 1.0) < 1e-9, s"partition total $total")
  }

  test("snapToGrid rounds, dedupes, and drops degenerate rings") {
    val p = poly((0.123, 0.249), (1.01, 0.251), (1.02, 1.248), (0.11, 1.252))
    val snapped = Geom.snapToGrid(p, 0.25) match { case Polygon(rs) => rs; case _ => fail() }
    assert(snapped(0).toSeq == Seq((0.0, 0.25), (1.0, 0.25), (1.0, 1.25), (0.0, 1.25), (0.0, 0.25)))
    // a sliver thinner than the grid collapses to empty
    val sliver = poly((0.0, 0.0), (2.0, 0.001), (2.0, 0.002))
    Geom.snapToGrid(sliver, 0.25) match {
      case Polygon(rs) => assert(rs(0).isEmpty)
      case other => fail(other.toString)
    }
  }

  test("simplifyPreserveTopology never emits degenerate or crossing rings") {
    // a ring whose plain DP at eps=1.0 collapses to a flat triangle:
    // spiky zigzag where aggressive simplification self-destructs
    val zigzag = poly(
      (0, 0), (4, 0.1), (8, 0), (8, 4), (4.1, 3.9), (0, 4), (0.5, 2))
    val plain = Geom.simplify(zigzag, 3.0)
    val safe = Geom.simplifyPreserveTopology(zigzag, 3.0) match {
      case Polygon(rs) => rs; case _ => fail()
    }
    assert(safe(0).length >= 4)
    assert(math.abs(Geom.signedArea2(safe(0))) > 0)
    // preserved version keeps a valid positive-area ring even where the
    // plain one may degenerate; with a tiny eps both are identity
    val id = Geom.simplifyPreserveTopology(zigzag, 1e-9) match {
      case Polygon(rs) => rs; case _ => fail()
    }
    assert(id(0).toSeq == zigzag.rings(0).toSeq)
    assert(plain != null) // plain DP remains the non-topology variant
  }

  test("makeValid closes rings and normalizes winding") {
    // CW outer, CCW hole, outer unclosed — both get flipped + closed
    val messy = Polygon(Array(
      Array((0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0)),           // CW, open
      Array((0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5)))) // CCW
    val fixed = Geom.makeValid(messy) match { case Polygon(rs) => rs; case _ => fail() }
    assert(fixed(0).head == fixed(0).last)
    assert(Geom.signedArea2(fixed(0)) > 0)  // outer CCW
    assert(Geom.signedArea2(fixed(1)) < 0)  // hole CW
    assert(math.abs(Geom.planarArea(fixed) - 3.0) < 1e-12)
  }

  test("distanceToPoint: containment, edge distance, haversine parity") {
    val sq = Polygon(Array(Array(
      (10.0, 45.0), (11.0, 45.0), (11.0, 46.0), (10.0, 46.0), (10.0, 45.0))))
    assert(Geom.distanceToPoint(sq, 10.5, 45.5) == 0.0) // inside
    // 0.1° east of the eastern edge at lat 45.5 ≈ 0.1°·cos(45.5°)·111.195km
    val d = Geom.distanceToPoint(sq, 11.1, 45.5)
    val expect = 0.1 * math.cos(math.toRadians(45.5)) * math.Pi / 180.0 * 6371008.8
    assert(math.abs(d - expect) / expect < 0.01, s"$d vs $expect")
    // point geometry delegates to the exact great-circle formula
    val p = Point(2.0, 48.0)
    assert(Geom.distanceToPoint(p, 2.5, 48.2) ==
      Geom.distanceSphere(2.0, 48.0, 2.5, 48.2))
    // a hole interior is OUTSIDE: distance is to the hole's edge
    val donut = Polygon(Array(
      Array((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)),
      Array((1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0), (1.0, 1.0))))
    val dh = Geom.distanceToPoint(donut, 2.0, 2.0)
    assert(dh > 100000, s"hole-center distance $dh") // ~1° ≈ 111 km
  }

  test("makeValid splits a bowtie into its lobes (node-splitting)") {
    // figure-eight: crosses itself at (1,1); PostGIS returns the
    // MULTIPOLYGON of the two triangular lobes, total area 2·(1/2·2·1)
    val bowtie = Polygon(Array(
      Array((0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0), (0.0, 0.0))))
    val fixed = Geom.makeValid(bowtie) match {
      case MultiPolygon(ps) => ps
      case g => fail(s"expected MultiPolygon, got $g")
    }
    assert(fixed.length == 2)
    fixed.foreach { rings =>
      assert(rings.length == 1)
      assert(Geom.signedArea2(rings(0)) > 0) // each lobe simple + CCW
      assert(rings(0).contains((1.0, 1.0)))  // split at the crossing node
    }
    val total = fixed.map(Geom.planarArea).sum
    assert(math.abs(total - 2.0) < 1e-12, s"area $total")
    // a valid polygon still passes through untouched
    val ok = Polygon(Array(
      Array((0.0, 0.0), (3.0, 0.0), (3.0, 3.0), (0.0, 3.0), (0.0, 0.0))))
    assert(Geom.makeValid(ok).isInstanceOf[Polygon])
  }

  test("makeValid keeps holes with the lobe that contains them") {
    // bowtie whose left lobe carries a small hole
    val poly = Polygon(Array(
      Array((0.0, 0.0), (4.0, 4.0), (4.0, 0.0), (0.0, 4.0), (0.0, 0.0)),
      Array((0.4, 1.8), (0.4, 2.2), (0.8, 2.2), (0.8, 1.8), (0.4, 1.8))))
    val fixed = Geom.makeValid(poly) match {
      case MultiPolygon(ps) => ps
      case g => fail(s"expected MultiPolygon, got $g")
    }
    assert(fixed.length == 2)
    val withHole = fixed.filter(_.length == 2)
    assert(withHole.length == 1, fixed.map(_.length).mkString(","))
    assert(Geom.signedArea2(withHole.head(1)) < 0)
    val totalArea = fixed.map(Geom.planarArea).sum
    assert(math.abs(totalArea - (8.0 - 0.16)) < 1e-9, s"area $totalArea")
  }

  test("makeValid re-clips a hole that straddles the bowtie node") {
    // figure-eight crossing at (2,2); the hole square spans the node,
    // overlapping BOTH lobes (0.15 each, hand-computed) and the empty
    // wedges left/right of the pinch (0.18 discarded)
    val poly = Polygon(Array(
      Array((0.0, 0.0), (4.0, 0.0), (0.0, 4.0), (4.0, 4.0), (0.0, 0.0)),
      Array((1.7, 1.6), (1.7, 2.4), (2.3, 2.4), (2.3, 1.6), (1.7, 1.6))))
    val fixed = Geom.makeValid(poly) match {
      case MultiPolygon(ps) => ps
      case g => fail(s"expected MultiPolygon, got $g")
    }
    assert(fixed.length == 2, fixed.map(_.length).mkString(","))
    // each lobe carries its clipped share of the hole
    fixed.foreach { rings =>
      assert(rings.length >= 2, s"lobe without a hole piece: ${rings.length}")
      rings.drop(1).foreach(h => assert(Geom.signedArea2(h) < 0)) // holes CW
      val holeArea = rings.drop(1).map(r => math.abs(Geom.signedArea2(r)) / 2).sum
      assert(math.abs(holeArea - 0.15) < 1e-12, s"hole area $holeArea")
    }
    val total = fixed.map(Geom.planarArea).sum
    assert(math.abs(total - (8.0 - 0.3)) < 1e-9, s"area $total")
    // a hole clear of the node still attaches whole to its lobe
    val clearHole = Polygon(Array(
      Array((0.0, 0.0), (4.0, 0.0), (0.0, 4.0), (4.0, 4.0), (0.0, 0.0)),
      Array((1.6, 0.2), (1.6, 0.6), (2.4, 0.6), (2.4, 0.2), (1.6, 0.2))))
    val fixed2 = Geom.makeValid(clearHole) match {
      case MultiPolygon(ps) => ps
      case g => fail(s"expected MultiPolygon, got $g")
    }
    val withHole = fixed2.filter(_.length == 2)
    assert(withHole.length == 1)
    // attached unchanged — exactly the input ring's four corners
    assert(withHole.head(1).toSet == Set((1.6, 0.2), (1.6, 0.6), (2.4, 0.6), (2.4, 0.2)))
  }
}
