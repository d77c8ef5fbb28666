package graft.geo

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal 2-D geometry model backing the engine's PostGIS-equivalent
  * function surface (SURVEY §2.6). Geometries travel through Spark
  * plans as WKB `BinaryType` columns; this object is the codec +
  * computational core used by the Catalyst expressions in
  * [[GeoExpressions]].
  *
  * Algorithms are the standard public ones: even-odd ray casting for
  * point-in-polygon, segment intersection tests for boundary crossing,
  * Sutherland–Hodgman for envelope clipping, Douglas–Peucker for
  * simplification, the spherical-excess line integral for geodesic
  * area (sphere radius 6371008.8 m — the reference's PostGIS spheroid
  * area differs by <0.3%; our formula is the documented engine
  * contract), and the spherical-mercator formulas for EPSG:3857.
  */
sealed trait Geom {
  def bbox: (Double, Double, Double, Double) = {
    var minx = Double.MaxValue; var miny = Double.MaxValue
    var maxx = Double.MinValue; var maxy = Double.MinValue
    foreachCoord { (x, y) =>
      if (x < minx) minx = x; if (y < miny) miny = y
      if (x > maxx) maxx = x; if (y > maxy) maxy = y
    }
    (minx, miny, maxx, maxy)
  }
  def foreachCoord(f: (Double, Double) => Unit): Unit
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom
}

final case class Point(x: Double, y: Double) extends Geom {
  def foreachCoord(f: (Double, Double) => Unit): Unit = f(x, y)
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom = {
    val (nx, ny) = f(x, y); Point(nx, ny)
  }
}
final case class MultiPoint(pts: Array[(Double, Double)]) extends Geom {
  def foreachCoord(f: (Double, Double) => Unit): Unit = pts.foreach(p => f(p._1, p._2))
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom = MultiPoint(pts.map(p => f(p._1, p._2)))
}
final case class LineString(coords: Array[(Double, Double)]) extends Geom {
  def foreachCoord(f: (Double, Double) => Unit): Unit = coords.foreach(p => f(p._1, p._2))
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom = LineString(coords.map(p => f(p._1, p._2)))
}
final case class MultiLineString(lines: Array[Array[(Double, Double)]]) extends Geom {
  def foreachCoord(f: (Double, Double) => Unit): Unit = lines.foreach(_.foreach(p => f(p._1, p._2)))
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom = MultiLineString(lines.map(_.map(p => f(p._1, p._2))))
}
/** rings(0) = exterior, rest = holes; rings are closed (first == last). */
final case class Polygon(rings: Array[Array[(Double, Double)]]) extends Geom {
  def foreachCoord(f: (Double, Double) => Unit): Unit = rings.foreach(_.foreach(p => f(p._1, p._2)))
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom = Polygon(rings.map(_.map(p => f(p._1, p._2))))
}
final case class MultiPolygon(polys: Array[Array[Array[(Double, Double)]]]) extends Geom {
  def foreachCoord(f: (Double, Double) => Unit): Unit = polys.foreach(_.foreach(_.foreach(p => f(p._1, p._2))))
  def mapCoords(f: (Double, Double) => (Double, Double)): Geom = MultiPolygon(polys.map(_.map(_.map(p => f(p._1, p._2)))))
}

object Geom {

  // ------------------------------------------------------------------ WKB

  private val PointT = 1
  private val LineT = 2
  private val PolyT = 3
  private val MPointT = 4
  private val MLineT = 5
  private val MPolyT = 6

  def toWkb(g: Geom): Array[Byte] = {
    val buf = ByteBuffer.allocate(wkbSize(g)).order(ByteOrder.LITTLE_ENDIAN)
    writeWkb(buf, g)
    buf.array()
  }

  private def wkbSize(g: Geom): Int = g match {
    case _: Point => 21
    case MultiPoint(p) => 9 + 21 * p.length
    case LineString(c) => 9 + 16 * c.length
    case MultiLineString(ls) => 9 + ls.map(l => 9 + 16 * l.length).sum
    case Polygon(r) => 9 + r.map(ring => 4 + 16 * ring.length).sum
    case MultiPolygon(ps) => 9 + ps.map(r => 9 + r.map(ring => 4 + 16 * ring.length).sum).sum
  }

  private def writeWkb(buf: ByteBuffer, g: Geom): Unit = {
    buf.put(1.toByte) // little-endian
    g match {
      case Point(x, y) =>
        buf.putInt(PointT).putDouble(x).putDouble(y)
      case MultiPoint(pts) =>
        buf.putInt(MPointT).putInt(pts.length)
        pts.foreach { case (x, y) => buf.put(1.toByte).putInt(PointT).putDouble(x).putDouble(y) }
      case LineString(c) =>
        buf.putInt(LineT).putInt(c.length)
        c.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
      case MultiLineString(ls) =>
        buf.putInt(MLineT).putInt(ls.length)
        ls.foreach { l =>
          buf.put(1.toByte).putInt(LineT).putInt(l.length)
          l.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
        }
      case Polygon(rings) =>
        buf.putInt(PolyT).putInt(rings.length)
        rings.foreach { ring =>
          buf.putInt(ring.length)
          ring.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
        }
      case MultiPolygon(ps) =>
        buf.putInt(MPolyT).putInt(ps.length)
        ps.foreach { rings =>
          buf.put(1.toByte).putInt(PolyT).putInt(rings.length)
          rings.foreach { ring =>
            buf.putInt(ring.length)
            ring.foreach { case (x, y) => buf.putDouble(x).putDouble(y) }
          }
        }
    }
  }

  def fromWkb(bytes: Array[Byte]): Geom = {
    val buf = ByteBuffer.wrap(bytes)
    readWkb(buf)
  }

  private def readWkb(buf: ByteBuffer): Geom = {
    val bo = buf.get()
    buf.order(if (bo == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    var tpe = buf.getInt()
    // tolerate EWKB SRID flag (0x20000000)
    if ((tpe & 0x20000000) != 0) { buf.getInt(); tpe = tpe & 0xff }
    tpe match {
      case PointT => Point(buf.getDouble(), buf.getDouble())
      case LineT => LineString(readRing(buf))
      case PolyT => Polygon(Array.fill(buf.getInt())(readRing(buf)))
      case MPointT =>
        MultiPoint(Array.fill(buf.getInt()) {
          readWkb(buf).asInstanceOf[Point] match { case Point(x, y) => (x, y) }
        })
      case MLineT =>
        MultiLineString(Array.fill(buf.getInt()) {
          readWkb(buf).asInstanceOf[LineString].coords
        })
      case MPolyT =>
        MultiPolygon(Array.fill(buf.getInt()) {
          readWkb(buf).asInstanceOf[Polygon].rings
        })
      case t => throw new IllegalArgumentException(s"unsupported WKB type $t")
    }
  }

  private def readRing(buf: ByteBuffer): Array[(Double, Double)] =
    Array.fill(buf.getInt())((buf.getDouble(), buf.getDouble()))

  // -------------------------------------------------------------- GeoJSON

  /** Parse the GeoJSON geometry subset (no Feature/FeatureCollection;
    * the API layer unwraps those). Hand-rolled recursive descent — the
    * build has no JSON dependency by design. */
  def fromGeoJson(s: String): Geom = new GeoJsonParser(s).parseGeometry()

  /** Canonical serialization: shortest-round-trip double formatting
    * (Java `Double.toString`, with integral values printed without
    * ".0"). This is the engine's content-address contract for geostore
    * ids — a DOCUMENTED DIVERGENCE from the reference, whose ids hash
    * PostgreSQL's ST_AsGeoJSON output (byte parity with PG is not
    * reproducible outside PG). */
  def toGeoJson(g: Geom): String = {
    def num(d: Double): String =
      if (d == Math.floor(d) && !d.isInfinite && Math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    def pt(p: (Double, Double)): String = s"[${num(p._1)},${num(p._2)}]"
    def ring(r: Array[(Double, Double)]): String = r.map(pt).mkString("[", ",", "]")
    def rings(rs: Array[Array[(Double, Double)]]): String = rs.map(ring).mkString("[", ",", "]")
    g match {
      case Point(x, y) => s"""{"type":"Point","coordinates":${pt((x, y))}}"""
      case MultiPoint(p) => s"""{"type":"MultiPoint","coordinates":${ring(p)}}"""
      case LineString(c) => s"""{"type":"LineString","coordinates":${ring(c)}}"""
      case MultiLineString(ls) => s"""{"type":"MultiLineString","coordinates":${rings(ls)}}"""
      case Polygon(r) => s"""{"type":"Polygon","coordinates":${rings(r)}}"""
      case MultiPolygon(ps) =>
        s"""{"type":"MultiPolygon","coordinates":${ps.map(rings).mkString("[", ",", "]")}}"""
    }
  }

  // ------------------------------------------------------------ predicates

  /** Even-odd ray casting; boundary points count as inside (matches
    * ST_Intersects, which is true for boundary contact). */
  def pointInPolygon(x: Double, y: Double, rings: Array[Array[(Double, Double)]]): Boolean = {
    var inside = false
    var r = 0
    while (r < rings.length) {
      val ring = rings(r)
      var i = 0
      val n = ring.length
      while (i < n - 1) {
        val (x1, y1) = ring(i)
        val (x2, y2) = ring(i + 1)
        if (onSegment(x, y, x1, y1, x2, y2)) return true
        if ((y1 > y) != (y2 > y)) {
          val xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
          if (x < xin) inside = !inside
        }
        i += 1
      }
      r += 1
    }
    inside
  }

  private def onSegment(px: Double, py: Double, x1: Double, y1: Double,
                        x2: Double, y2: Double): Boolean = {
    val cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    if (cross != 0.0) return false
    px >= math.min(x1, x2) && px <= math.max(x1, x2) &&
      py >= math.min(y1, y2) && py <= math.max(y1, y2)
  }

  private def segsIntersect(ax: Double, ay: Double, bx: Double, by: Double,
                            cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def orient(px: Double, py: Double, qx: Double, qy: Double, rx: Double, ry: Double): Int = {
      val v = (qx - px) * (ry - py) - (qy - py) * (rx - px)
      if (v > 0) 1 else if (v < 0) -1 else 0
    }
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (o1 != o2 && o3 != o4) return true
    (o1 == 0 && onSegment(cx, cy, ax, ay, bx, by)) ||
      (o2 == 0 && onSegment(dx, dy, ax, ay, bx, by)) ||
      (o3 == 0 && onSegment(ax, ay, cx, cy, dx, dy)) ||
      (o4 == 0 && onSegment(bx, by, cx, cy, dx, dy))
  }

  private def boundaries(g: Geom): Array[Array[(Double, Double)]] = g match {
    case Point(x, y) => Array(Array((x, y)))
    case MultiPoint(p) => p.map(pp => Array(pp))
    case LineString(c) => Array(c)
    case MultiLineString(ls) => ls
    case Polygon(r) => r
    case MultiPolygon(ps) => ps.flatten
  }

  private def polygons(g: Geom): Array[Array[Array[(Double, Double)]]] = g match {
    case Polygon(r) => Array(r)
    case MultiPolygon(ps) => ps
    case _ => Array.empty
  }

  /** ST_Intersects semantics: any shared point (interior or boundary). */
  def intersects(a: Geom, b: Geom): Boolean = {
    val (aminx, aminy, amaxx, amaxy) = a.bbox
    val (bminx, bminy, bmaxx, bmaxy) = b.bbox
    if (aminx > bmaxx || bminx > amaxx || aminy > bmaxy || bminy > amaxy) return false

    // any vertex of one inside a polygon of the other
    val pa = polygons(a)
    val pb = polygons(b)
    if (pb.nonEmpty) {
      var hit = false
      a.foreachCoord { (x, y) => if (!hit && pb.exists(r => pointInPolygon(x, y, r))) hit = true }
      if (hit) return true
    }
    if (pa.nonEmpty) {
      var hit = false
      b.foreachCoord { (x, y) => if (!hit && pa.exists(r => pointInPolygon(x, y, r))) hit = true }
      if (hit) return true
    }
    // boundary segment crossing
    val ba = boundaries(a)
    val bb = boundaries(b)
    var i = 0
    while (i < ba.length) {
      val la = ba(i)
      var j = 0
      while (j < bb.length) {
        val lb = bb(j)
        var s = 0
        while (s < la.length - 1) {
          var t = 0
          while (t < lb.length - 1) {
            if (segsIntersect(la(s)._1, la(s)._2, la(s + 1)._1, la(s + 1)._2,
              lb(t)._1, lb(t)._2, lb(t + 1)._1, lb(t + 1)._2)) return true
            t += 1
          }
          s += 1
        }
        j += 1
      }
      i += 1
    }
    // degenerate point-vs-point / point-vs-line
    (a, b) match {
      case (Point(x, y), _) => pointOnBoundary(x, y, bb)
      case (_, Point(x, y)) => pointOnBoundary(x, y, ba)
      case _ => false
    }
  }

  private def pointOnBoundary(x: Double, y: Double,
                              lines: Array[Array[(Double, Double)]]): Boolean = {
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      if (l.length == 1) { if (l(0)._1 == x && l(0)._2 == y) return true }
      else {
        var s = 0
        while (s < l.length - 1) {
          if (onSegment(x, y, l(s)._1, l(s)._2, l(s + 1)._1, l(s + 1)._2)) return true
          s += 1
        }
      }
      i += 1
    }
    false
  }

  /** ST_Within for the point-in-polygon case (the surface the
    * reference exercises: feature lookups inside an AOI). */
  def within(a: Geom, b: Geom): Boolean = a match {
    case Point(x, y) => polygons(b).exists(r => pointInPolygon(x, y, r))
    case _ =>
      val pb = polygons(b)
      if (pb.isEmpty) return false
      var all = true
      a.foreachCoord { (x, y) => if (all && !pb.exists(r => pointInPolygon(x, y, r))) all = false }
      all
  }

  // ------------------------------------------------------------- measures

  val EarthRadius = 6371008.8 // mean radius (m)

  /** Geodesic area in hectares on a sphere via the spherical line
    * integral (L'Huilier-style excess): for each ring,
    * `A = R²/2 · |Σ (λ₂-λ₁)(2 + sin φ₁ + sin φ₂)|` with angles in
    * radians. Holes subtract; multipolygon parts add. */
  def areaHa(g: Geom): Double = {
    def ringArea(ring: Array[(Double, Double)]): Double = {
      var sum = 0.0
      var i = 0
      while (i < ring.length - 1) {
        val (lon1, lat1) = ring(i)
        val (lon2, lat2) = ring(i + 1)
        sum += Math.toRadians(lon2 - lon1) *
          (2.0 + Math.sin(Math.toRadians(lat1)) + Math.sin(Math.toRadians(lat2)))
        i += 1
      }
      Math.abs(sum) * EarthRadius * EarthRadius / 2.0
    }
    val m2 = polygons(g).map { rings =>
      if (rings.isEmpty) 0.0
      else ringArea(rings.head) - rings.tail.map(ringArea).sum
    }.sum
    m2 / 10000.0
  }

  /** Great-circle (haversine) distance in meters between two points.
    * The operation order is part of the engine contract (mirrored in
    * SQL oracles term by term). */
  def distanceSphere(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val sdlat = Math.sin(Math.toRadians(lat2 - lat1) / 2)
    val sdlon = Math.sin(Math.toRadians(lon2 - lon1) / 2)
    val a = sdlat * sdlat +
      Math.cos(Math.toRadians(lat1)) * Math.cos(Math.toRadians(lat2)) * sdlon * sdlon
    2 * EarthRadius * Math.asin(Math.sqrt(a))
  }

  /** Metres from `g` to the query point (lng, lat): great-circle for
    * points; 0 for areal geometries containing the point, else the
    * minimum point-to-edge distance in the local tangent plane at the
    * query point (first-order accurate at feature-lookup radii). */
  def distanceToPoint(g: Geom, lng: Double, lat: Double): Double = {
    val mPerDegLat = EarthRadius * math.Pi / 180.0
    val mPerDegLon = mPerDegLat * math.cos(math.toRadians(lat))
    def planar(x: Double, y: Double): (Double, Double) =
      ((x - lng) * mPerDegLon, (y - lat) * mPerDegLat)
    def segDist(a: (Double, Double), b: (Double, Double)): Double = {
      val (ax, ay) = planar(a._1, a._2)
      val (bx, by) = planar(b._1, b._2)
      val dx = bx - ax; val dy = by - ay
      val len2 = dx * dx + dy * dy
      val t = if (len2 == 0) 0.0
              else math.max(0.0, math.min(1.0, -(ax * dx + ay * dy) / len2))
      val px = ax + t * dx; val py = ay + t * dy
      math.sqrt(px * px + py * py)
    }
    // Empty-safe minimum: the library's own empty results are
    // Polygon(Array(Array.empty)) (clip/intersection), and a bare
    // .min on an empty iterator throws — distance to an empty (or
    // degenerate single-vertex) part falls back to vertex distance,
    // and to +∞ when there are no coordinates at all (an empty
    // geometry is at no finite distance, so radius filters never
    // match it).
    def minOr(it: Iterator[Double], fallback: => Double): Double =
      if (it.hasNext) it.min else fallback
    def vertDist(cs: Iterator[(Double, Double)]): Double =
      minOr(cs.map { case (x, y) =>
        val (px, py) = planar(x, y); math.sqrt(px * px + py * py)
      }, Double.PositiveInfinity)
    def linesDist(ls: Iterator[Array[(Double, Double)]]): Double = {
      val parts = ls.toSeq
      minOr(parts.iterator.flatMap(r => r.dropRight(1).zip(r.drop(1)).iterator)
        .map { case (a, b) => segDist(a, b) },
        vertDist(parts.iterator.flatMap(_.iterator)))
    }
    def ringsDist(rings: Array[Array[(Double, Double)]]): Double =
      linesDist(rings.iterator)
    g match {
      case Point(x, y) => distanceSphere(x, y, lng, lat)
      case MultiPoint(ps) =>
        minOr(ps.iterator.map { case (x, y) => distanceSphere(x, y, lng, lat) },
          Double.PositiveInfinity)
      case LineString(c) => linesDist(Iterator.single(c))
      case MultiLineString(ls) => linesDist(ls.iterator)
      case Polygon(rings) =>
        if (pointInPolygon(lng, lat, rings)) 0.0 else ringsDist(rings)
      case MultiPolygon(ps) =>
        if (ps.exists(pointInPolygon(lng, lat, _))) 0.0
        else minOr(ps.iterator.map(ringsDist), Double.PositiveInfinity)
    }
  }

  /** EPSG:4326 → EPSG:3857 (spherical mercator, the reference's
    * `geom_wm` twin — `clip_and_reproject_geom.sh`). */
  val WebMercatorR = 6378137.0
  def toWebMercatorX(lon: Double): Double = WebMercatorR * Math.toRadians(lon)
  def toWebMercatorY(lat: Double): Double =
    WebMercatorR * Math.log(Math.tan(Math.PI / 4.0 + Math.toRadians(lat) / 2.0))
  def toWebMercator(g: Geom): Geom =
    g.mapCoords((x, y) => (toWebMercatorX(x), toWebMercatorY(clampLat(y))))
  private def clampLat(lat: Double): Double = math.max(-85.05112878, math.min(85.05112878, lat))

  // ----------------------------------------------------------- operations

  /** Sutherland–Hodgman clip of a polygon by an axis-aligned envelope
    * (the reference clips to the ±85° mercator box before projecting). */
  def clipToEnvelope(g: Geom, minx: Double, miny: Double, maxx: Double, maxy: Double): Geom = {
    def clipRing(ring: Array[(Double, Double)]): Array[(Double, Double)] = {
      var pts = ring.toIndexedSeq
      // each clip edge: keep inside, emit intersections
      def clip(inside: ((Double, Double)) => Boolean,
               cross: ((Double, Double), (Double, Double)) => (Double, Double)): Unit = {
        if (pts.isEmpty) return
        val out = IndexedSeq.newBuilder[(Double, Double)]
        var i = 0
        val n = pts.length
        while (i < n) {
          val cur = pts(i)
          val prev = pts((i + n - 1) % n)
          val curIn = inside(cur)
          val prevIn = inside(prev)
          if (curIn) {
            if (!prevIn) out += cross(prev, cur)
            out += cur
          } else if (prevIn) out += cross(prev, cur)
          i += 1
        }
        pts = out.result()
      }
      def xAt(p: (Double, Double), q: (Double, Double), x: Double): (Double, Double) =
        (x, p._2 + (q._2 - p._2) * (x - p._1) / (q._1 - p._1))
      def yAt(p: (Double, Double), q: (Double, Double), y: Double): (Double, Double) =
        (p._1 + (q._1 - p._1) * (y - p._2) / (q._2 - p._2), y)
      // drop the closing vertex, clip, re-close
      if (pts.nonEmpty && pts.head == pts.last) pts = pts.dropRight(1)
      clip(p => p._1 >= minx, (p, q) => xAt(p, q, minx))
      clip(p => p._1 <= maxx, (p, q) => xAt(p, q, maxx))
      clip(p => p._2 >= miny, (p, q) => yAt(p, q, miny))
      clip(p => p._2 <= maxy, (p, q) => yAt(p, q, maxy))
      if (pts.length < 3) Array.empty
      else (pts :+ pts.head).toArray
    }
    g match {
      case Polygon(rings) =>
        val cl = rings.map(clipRing).filter(_.nonEmpty)
        Polygon(if (cl.isEmpty) Array(Array.empty[(Double, Double)]) else cl)
      case MultiPolygon(ps) =>
        MultiPolygon(ps.map(_.map(clipRing).filter(_.nonEmpty)).filter(_.nonEmpty))
      case other => other // points/lines: caller filters by bbox
    }
  }

  /** Sutherland–Hodgman clip of a polygon by a CONVEX clip polygon
    * (CCW exterior ring, closed). Generalizes [[clipToEnvelope]]: the
    * 1×1-export's grid cells and zonal AOI quads are convex, so this
    * covers the reference's `ST_Intersection` uses (J3; general
    * concave×concave intersection is out of scope, documented). */
  def clipToConvex(g: Geom, clip: Array[(Double, Double)]): Geom =
    clipByEdges(g, clip.dropRight(1).zip(clip.dropRight(1).drop(1) :+ clip(0)))

  /** Sutherland–Hodgman against an arbitrary half-plane intersection:
    * each directed edge `(p1, p2)` keeps the points on/left of it. A
    * closed convex ring's edge cycle reproduces [[clipToConvex]]; an
    * OPEN edge set clips by an unbounded convex region (the tool the
    * clip-hole subtraction builds its disjoint pieces from). */
  private def clipByEdges(
      g: Geom, edges: Array[((Double, Double), (Double, Double))]): Geom = {
    def inside(e: ((Double, Double), (Double, Double)), p: (Double, Double)): Boolean = {
      val ((x1, y1), (x2, y2)) = e
      (x2 - x1) * (p._2 - y1) - (y2 - y1) * (p._1 - x1) >= 0
    }
    def cross(e: ((Double, Double), (Double, Double)),
              p: (Double, Double), q: (Double, Double)): (Double, Double) = {
      val ((x1, y1), (x2, y2)) = e
      val dcx = x2 - x1; val dcy = y2 - y1
      val dpx = q._1 - p._1; val dpy = q._2 - p._2
      val denom = dcx * dpy - dcy * dpx
      val t = (dcx * (y1 - p._2) - dcy * (x1 - p._1)) / denom
      (p._1 + t * dpx, p._2 + t * dpy)
    }
    def clipRing(ring: Array[(Double, Double)]): Array[(Double, Double)] = {
      var pts = ring.toIndexedSeq
      if (pts.nonEmpty && pts.head == pts.last) pts = pts.dropRight(1)
      edges.foreach { e =>
        if (pts.nonEmpty) {
          val out = IndexedSeq.newBuilder[(Double, Double)]
          var i = 0
          val n = pts.length
          while (i < n) {
            val cur = pts(i)
            val prev = pts((i + n - 1) % n)
            val curIn = inside(e, cur)
            val prevIn = inside(e, prev)
            if (curIn) {
              if (!prevIn) out += cross(e, prev, cur)
              out += cur
            } else if (prevIn) out += cross(e, prev, cur)
            i += 1
          }
          pts = out.result()
        }
      }
      if (pts.length < 3) Array.empty else (pts :+ pts.head).toArray
    }
    g match {
      case Polygon(rings) =>
        val cl = rings.map(clipRing).filter(_.nonEmpty)
        Polygon(if (cl.isEmpty) Array(Array.empty[(Double, Double)]) else cl)
      case MultiPolygon(ps) =>
        MultiPolygon(ps.map(_.map(clipRing).filter(_.nonEmpty)).filter(_.nonEmpty))
      case other => other
    }
  }

  // ------------------------------------------------- general intersection

  /** Twice the signed planar area of a ring (shoelace; CCW > 0). */
  def signedArea2(ring: Array[(Double, Double)]): Double = {
    var s = 0.0
    var i = 0
    while (i < ring.length - 1) {
      s += ring(i)._1 * ring(i + 1)._2 - ring(i + 1)._1 * ring(i)._2
      i += 1
    }
    s
  }

  /** Planar area of a polygon's ring set (outer minus holes), in
    * squared coordinate units. */
  def planarArea(rings: Array[Array[(Double, Double)]]): Double =
    rings.headOption.map(r => math.abs(signedArea2(r)) / 2).getOrElse(0.0) -
      rings.drop(1).map(r => math.abs(signedArea2(r)) / 2).sum

  private def isConvexRing(ring0: Array[(Double, Double)]): Boolean = {
    val ring = if (ring0.length > 1 && ring0.head == ring0.last) ring0.dropRight(1) else ring0
    val n = ring.length
    if (n < 3) return false
    var sign = 0
    var i = 0
    while (i < n) {
      val (ax, ay) = ring(i)
      val (bx, by) = ring((i + 1) % n)
      val (cx, cy) = ring((i + 2) % n)
      val cr = (bx - ax) * (cy - by) - (by - ay) * (cx - bx)
      if (cr != 0) {
        val s = if (cr > 0) 1 else -1
        if (sign == 0) sign = s else if (s != sign) return false
      }
      i += 1
    }
    true
  }

  /** Ear-clipping triangulation of a simple (possibly concave) ring —
    * O(n²), the standard fan-free decomposition. Returns closed CCW
    * triangles. */
  def triangulate(ring0: Array[(Double, Double)]): Array[Array[(Double, Double)]] = {
    var pts = (if (ring0.length > 1 && ring0.head == ring0.last) ring0.dropRight(1)
               else ring0).toVector
    if (signedArea2((pts :+ pts.head).toArray) < 0) pts = pts.reverse // ensure CCW
    val out = Array.newBuilder[Array[(Double, Double)]]
    def triContains(a: (Double, Double), b: (Double, Double), c: (Double, Double),
                    p: (Double, Double)): Boolean = {
      def cr(p1: (Double, Double), p2: (Double, Double), q: (Double, Double)) =
        (p2._1 - p1._1) * (q._2 - p1._2) - (p2._2 - p1._2) * (q._1 - p1._1)
      cr(a, b, p) > 0 && cr(b, c, p) > 0 && cr(c, a, p) > 0
    }
    var guard = 0
    while (pts.length > 3 && guard < 10000) {
      guard += 1
      val n = pts.length
      var i = 0
      var clipped = false
      while (i < n && !clipped) {
        val a = pts((i + n - 1) % n); val b = pts(i); val c = pts((i + 1) % n)
        val convex = (b._1 - a._1) * (c._2 - b._2) - (b._2 - a._2) * (c._1 - b._1) > 0
        if (convex && !pts.indices.exists(j =>
          j != (i + n - 1) % n && j != i && j != (i + 1) % n &&
            triContains(a, b, c, pts(j)))) {
          out += Array(a, b, c, a)
          pts = pts.patch(i, Nil, 1)
          clipped = true
        }
        i += 1
      }
      if (!clipped) { // degenerate (collinear run): drop the flattest vertex
        val flat = pts.indices.minBy { i =>
          val a = pts((i + pts.length - 1) % pts.length); val b = pts(i)
          val c = pts((i + 1) % pts.length)
          math.abs((b._1 - a._1) * (c._2 - b._2) - (b._2 - a._2) * (c._1 - b._1))
        }
        pts = pts.patch(flat, Nil, 1)
      }
    }
    if (pts.length == 3) out += Array(pts(0), pts(1), pts(2), pts(0))
    out.result().filter(t => math.abs(signedArea2(t)) > 0)
  }

  /** General polygon × polygon intersection (`ST_Intersection` for
    * areal inputs): when the clip polygon is convex the one-pass
    * Sutherland–Hodgman clip applies directly (SH requires only the
    * CLIP region convex — concave subjects are fine); otherwise the
    * clip's outer ring is ear-clipped into triangles and the subject
    * is clipped by each, yielding a piece MultiPolygon (the
    * clip-by-convex-decomposition strategy; pieces share internal
    * edges but cover exactly A∩B, so area/containment semantics are
    * exact). Holes are honored on BOTH sides: subject hole rings clip
    * alongside their outer; clip holes subtract afterwards —
    * `A ∩ (C \ H) = (A ∩ C_outer) \ H`, with each hole triangulated
    * and every triangle removed through the disjoint angular-sweep
    * decomposition of its complement ([[subtractTriangle]]). */
  def intersection(subject: Geom, clip: Geom): Geom = {
    val subjPolys = polygons(subject)
    val clipPolys = polygons(clip)
    val pieces = Array.newBuilder[Array[Array[(Double, Double)]]]
    for (sp <- subjPolys; cp <- clipPolys) {
      val outer0 = cp(0)
      // clip ring must wind CCW for the SH inside-test
      val outer = if (signedArea2(outer0) < 0) outer0.reverse else outer0
      val subjPoly = Polygon(sp)
      val against = Array.newBuilder[Array[Array[(Double, Double)]]]
      if (isConvexRing(outer)) {
        clipToConvex(subjPoly, outer) match {
          case Polygon(rs) if rs.nonEmpty && rs(0).nonEmpty => against += rs
          case _ => ()
        }
      } else {
        triangulate(outer).foreach { tri =>
          clipToConvex(subjPoly, tri) match {
            case Polygon(rs) if rs.nonEmpty && rs(0).nonEmpty &&
              planarArea(rs) > 0 => against += rs
            case _ => ()
          }
        }
      }
      // clip holes: subtract each hole triangle from every piece of
      // THIS clip polygon (holes of one part never affect another's)
      var cur = against.result()
      cp.drop(1).foreach { hole0 =>
        val hole = if (signedArea2(hole0) < 0) hole0.reverse else hole0
        triangulate(hole).foreach { tri =>
          cur = cur.flatMap(p => subtractTriangle(Polygon(p), tri))
        }
      }
      pieces ++= cur
    }
    val ps = pieces.result()
    if (ps.isEmpty) Polygon(Array(Array.empty[(Double, Double)]))
    else if (ps.length == 1) Polygon(ps(0))
    else MultiPolygon(ps)
  }

  /** `piece \ tri` as DISJOINT pieces: for a CCW triangle with edges
    * e₀e₁e₂, region i is (outside eᵢ) ∩ (inside e₀..eᵢ₋₁) — the
    * standard angular-sweep decomposition of a convex complement. The
    * regions partition the plane minus the triangle, so the emitted
    * pieces are non-overlapping and their union is exactly the
    * difference (area semantics stay exact). */
  private def subtractTriangle(piece: Polygon,
                               tri: Array[(Double, Double)])
      : Seq[Array[Array[(Double, Double)]]] = {
    val es = tri.dropRight(1).zip(tri.dropRight(1).drop(1) :+ tri(0))
    (0 until es.length).flatMap { i =>
      val region = (es(i)._2 -> es(i)._1) +: es.take(i) // flipped eᵢ first
      clipByEdges(piece, region.toArray) match {
        case Polygon(rs) if rs.nonEmpty && rs(0).nonEmpty &&
          planarArea(rs) > 0 => Some(rs)
        case _ => None
      }
    }
  }

  /** `ST_SnapToGrid(geom, size)`: round every coordinate to the
    * nearest multiple of `size`, collapse consecutive duplicates, drop
    * degenerate rings (the reference uses it before the 1×1 export,
    * `export_1x1_grid.py:332`). */
  def snapToGrid(g: Geom, size: Double): Geom = {
    def snap(v: Double): Double = math.rint(v / size) * size
    def snapRing(r: Array[(Double, Double)]): Array[(Double, Double)] = {
      val snapped = r.map { case (x, y) => (snap(x), snap(y)) }
      val dedup = Array.newBuilder[(Double, Double)]
      var last: (Double, Double) = null
      snapped.foreach { p => if (p != last) { dedup += p; last = p } }
      var out = dedup.result()
      if (out.length > 1 && out.head != out.last) out = out :+ out.head
      if (out.length < 4 || math.abs(signedArea2(out)) == 0)
        Array.empty[(Double, Double)]
      else out
    }
    g match {
      case Point(x, y) => Point(snap(x), snap(y))
      case MultiPoint(ps) => MultiPoint(ps.map { case (x, y) => (snap(x), snap(y)) })
      case LineString(c) => LineString(c.map { case (x, y) => (snap(x), snap(y)) })
      case MultiLineString(ls) =>
        MultiLineString(ls.map(_.map { case (x, y) => (snap(x), snap(y)) }))
      case Polygon(rs) =>
        val keep = rs.map(snapRing).filter(_.nonEmpty)
        Polygon(if (keep.isEmpty) Array(Array.empty[(Double, Double)]) else keep)
      case MultiPolygon(ps) =>
        MultiPolygon(ps.map(_.map(snapRing).filter(_.nonEmpty)).filter(_.nonEmpty))
    }
  }

  /** Strictly-interior crossing point of segments a-b and c-d, with
    * the parameters along each (t on a-b, u on c-d). */
  private def segCrossPoint(a: (Double, Double), b: (Double, Double),
                            c: (Double, Double), d: (Double, Double))
      : Option[(Double, Double, (Double, Double))] = {
    val rX = b._1 - a._1; val rY = b._2 - a._2
    val sX = d._1 - c._1; val sY = d._2 - c._2
    val denom = rX * sY - rY * sX
    if (denom == 0) return None
    val t = ((c._1 - a._1) * sY - (c._2 - a._2) * sX) / denom
    val u = ((c._1 - a._1) * rY - (c._2 - a._2) * rX) / denom
    val eps = 1e-12
    if (t <= eps || t >= 1 - eps || u <= eps || u >= 1 - eps) None
    else Some((t, u, (a._1 + t * rX, a._2 + t * rY)))
  }

  /** Node-split a closed ring at its self-intersection crossings and
    * return the simple sub-rings (the "bowtie" lobes): insert every
    * crossing point into the vertex walk (the SAME coordinate pair on
    * both segments, so equality holds exactly), then extract a cycle
    * each time the walk revisits a point. A ring with no crossings
    * returns unchanged. O(n²) crossing scan — rings at this layer are
    * API-supplied AOIs, not bulk data. */
  private def splitAtNodes(ring: Array[(Double, Double)])
      : Seq[Array[(Double, Double)]] = {
    val n = ring.length - 1 // closed
    val per = Array.fill(n)(List.empty[(Double, (Double, Double))])
    var found = false
    var i = 0
    while (i < n) {
      var j = i + 2
      while (j < n) {
        if (!(i == 0 && j == n - 1)) {
          segCrossPoint(ring(i), ring(i + 1), ring(j), ring(j + 1)).foreach {
            case (t, u, p) =>
              per(i) ::= (t, p)
              per(j) ::= (u, p)
              found = true
          }
        }
        j += 1
      }
      i += 1
    }
    if (!found) return Seq(ring)
    val noded = Array.newBuilder[(Double, Double)]
    i = 0
    while (i < n) {
      noded += ring(i)
      per(i).sortBy(_._1).foreach { case (_, p) => noded += p }
      i += 1
    }
    val pts = noded.result()
    val out = Seq.newBuilder[Array[(Double, Double)]]
    val path = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    val posOf = scala.collection.mutable.HashMap.empty[(Double, Double), Int]
    for (p <- pts.toSeq :+ pts.head) posOf.get(p) match {
      case Some(k) =>
        val cycle = (path.slice(k, path.length) :+ p).toArray
        if (cycle.length >= 4 && math.abs(signedArea2(cycle)) > 0) out += cycle
        while (path.length > k) { posOf.remove(path.last); path.remove(path.length - 1) }
        posOf(p) = path.length
        path += p
      case None =>
        posOf(p) = path.length
        path += p
    }
    out.result()
  }

  /** `ST_MakeValid` for areal inputs: close open rings, drop
    * degenerate (< 4 point / zero-area) rings, normalize winding
    * (outer CCW, holes CW — the OGC orientation the exporters
    * assume), and repair self-intersecting rings by node-splitting —
    * a bowtie outer ring becomes the multipolygon of its lobes, a
    * bowtie hole splits into the holes it encloses (what PostGIS
    * observably returns for these inputs). Holes attach to the lobe
    * containing them; a hole STRADDLING a lobe boundary (crossing the
    * split node) is re-clipped so each lobe keeps exactly its share. */
  def makeValid(g: Geom): Geom = {
    def fixRing(r0: Array[(Double, Double)], hole: Boolean): Array[(Double, Double)] = {
      var r = r0
      if (r.length > 1 && r.head != r.last) r = r :+ r.head
      if (r.length < 4 || signedArea2(r) == 0) return Array.empty
      val ccw = signedArea2(r) > 0
      if (hole == ccw) r.reverse else r
    }
    // close a ring without judging its area — a bowtie's SIGNED area
    // is zero (lobes cancel) even though its lobes are real, so the
    // degeneracy check must come after node-splitting
    def closeRing(r0: Array[(Double, Double)]): Array[(Double, Double)] = {
      val r = if (r0.length > 1 && r0.head != r0.last) r0 :+ r0.head else r0
      if (r.length < 4) Array.empty else r
    }
    // each input polygon → one or more simple polygons (lobes + holes)
    def fixPoly(rs: Array[Array[(Double, Double)]])
        : Seq[Array[Array[(Double, Double)]]] = {
      val outer0 = closeRing(rs.headOption.getOrElse(Array.empty))
      if (outer0.isEmpty) return Nil
      val lobes = splitAtNodes(outer0).map(r => fixRing(r, hole = false))
        .filter(_.nonEmpty)
      val holes = rs.drop(1).map(closeRing).filter(_.nonEmpty)
        .flatMap(splitAtNodes).map(r => fixRing(r, hole = true))
        .filter(_.nonEmpty)
      // any strictly-interior segment crossing between the two rings?
      def ringsCross(a: Array[(Double, Double)], b: Array[(Double, Double)]): Boolean = {
        var i = 0
        while (i < a.length - 1) {
          var j = 0
          while (j < b.length - 1) {
            if (segCrossPoint(a(i), a(i + 1), b(j), b(j + 1)).isDefined) return true
            j += 1
          }
          i += 1
        }
        false
      }
      lobes.map { o =>
        val attached = holes.toSeq.flatMap { h: Array[(Double, Double)] =>
          val allIn = h.forall { case (hx, hy) => pointInPolygon(hx, hy, Array(o)) }
          if (!ringsCross(h, o)) {
            // no boundary crossing: wholly inside (attach as-is) or
            // wholly outside this lobe (someone else's hole)
            if (allIn) Seq(h) else Nil
          } else {
            // the hole STRADDLES this lobe's boundary (it crosses the
            // split node of a bowtie): only the part inside the lobe
            // is a real hole here — re-clip it with the exact
            // intersection machinery and attach each piece
            val hOuter = if (signedArea2(h) < 0) h.reverse else h
            polygons(intersection(Polygon(Array(hOuter)), Polygon(Array(o))))
              .toSeq.flatMap(_.headOption)
              .filter(r => r.length >= 4 && math.abs(signedArea2(r)) > 0)
              .map(r => if (signedArea2(r) > 0) r.reverse else r) // holes CW
          }
        }
        o +: attached.toArray
      }
    }
    g match {
      case Polygon(rs) =>
        fixPoly(rs) match {
          case Nil => Polygon(Array(Array.empty[(Double, Double)]))
          case Seq(one) => Polygon(one)
          case many => MultiPolygon(many.toArray)
        }
      case MultiPolygon(ps) =>
        MultiPolygon(ps.toSeq.flatMap(fixPoly).toArray)
      case other => other
    }
  }

  /** Douglas–Peucker with tolerance `eps` (ST_Simplify semantics —
    * endpoint-preserving, not topology-preserving). */
  def simplify(g: Geom, eps: Double): Geom = {
    val dp = dpFor(eps)
    // ring 0 is the exterior: when it collapses below a valid ring,
    // the whole polygon is gone — keeping a surviving hole would
    // promote it to exterior (inverted polygon: areaHa counts the
    // hole positive, the MVT winding flips)
    def simpRings(r: Array[Array[(Double, Double)]])
        : Option[Array[Array[(Double, Double)]]] =
      if (r.isEmpty) Some(r)
      else {
        val ext = dp(r.head)
        if (ext.length < 4) None
        else Some(ext +: r.tail.map(dp).filter(_.length >= 4))
      }
    g match {
      case LineString(c) => LineString(dp(c))
      case MultiLineString(ls) => MultiLineString(ls.map(dp))
      case Polygon(r) =>
        // the library's empty-polygon convention (clip/intersection)
        Polygon(simpRings(r).getOrElse(Array(Array.empty[(Double, Double)])))
      case MultiPolygon(ps) => MultiPolygon(ps.flatMap(simpRings))
      case other => other
    }
  }

  private def dpFor(eps: Double): Array[(Double, Double)] => Array[(Double, Double)] = {
    def dp(coords: Array[(Double, Double)]): Array[(Double, Double)] = {
      if (coords.length <= 2) return coords
      def perpDist(p: (Double, Double), a: (Double, Double), b: (Double, Double)): Double = {
        val dx = b._1 - a._1
        val dy = b._2 - a._2
        val len = math.sqrt(dx * dx + dy * dy)
        if (len == 0) math.sqrt((p._1 - a._1) * (p._1 - a._1) + (p._2 - a._2) * (p._2 - a._2))
        else math.abs(dy * p._1 - dx * p._2 + b._1 * a._2 - b._2 * a._1) / len
      }
      var maxD = -1.0
      var maxI = 0
      var i = 1
      while (i < coords.length - 1) {
        val d = perpDist(coords(i), coords.head, coords.last)
        if (d > maxD) { maxD = d; maxI = i }
        i += 1
      }
      if (maxD <= eps) Array(coords.head, coords.last)
      else dp(coords.take(maxI + 1)) ++ dp(coords.drop(maxI)).tail
    }
    dp
  }

  /** Does the closed ring self-intersect (non-adjacent proper segment
    * crossings)? O(n²) — simplified rings are small by construction. */
  private def ringSelfIntersects(ring: Array[(Double, Double)]): Boolean = {
    val n = ring.length - 1 // closed
    var i = 0
    while (i < n) {
      var j = i + 2
      while (j < n) {
        // skip adjacent pairs (share an endpoint), incl. first-last
        if (!(i == 0 && j == n - 1)) {
          if (segsIntersectProper(
            ring(i)._1, ring(i)._2, ring(i + 1)._1, ring(i + 1)._2,
            ring(j)._1, ring(j)._2, ring(j + 1)._1, ring(j + 1)._2))
            return true
        }
        j += 1
      }
      i += 1
    }
    false
  }

  private def segsIntersectProper(ax: Double, ay: Double, bx: Double, by: Double,
                                  cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def orient(px: Double, py: Double, qx: Double, qy: Double, rx: Double, ry: Double): Double =
      (qx - px) * (ry - py) - (qy - py) * (rx - px)
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    o1 * o2 < 0 && o3 * o4 < 0
  }

  /** `ST_SimplifyPreserveTopology` for areal inputs
    * (`app/crud/geostore.py:243-249` uses it before storing admin
    * geometries): Douglas–Peucker per ring, but a ring that collapses
    * (< 4 points / zero area) or self-intersects retries with halved
    * tolerance — falling back to the original ring — so the output is
    * always a valid ring set. Divergence (documented): validity is
    * per-ring; cross-ring topology (hole escaping its shell) is not
    * re-checked, which PostGIS/GEOS does. */
  def simplifyPreserveTopology(g: Geom, eps: Double): Geom = {
    def safeRing(ring: Array[(Double, Double)]): Array[(Double, Double)] = {
      var tol = eps
      var attempts = 0
      while (attempts < 6) {
        val s = dpFor(tol)(ring)
        if (s.length >= 4 && math.abs(signedArea2(s)) > 0 && !ringSelfIntersects(s))
          return s
        tol /= 2
        attempts += 1
      }
      ring
    }
    g match {
      case Polygon(r) => Polygon(r.map(safeRing))
      case MultiPolygon(ps) => MultiPolygon(ps.map(_.map(safeRing)))
      case LineString(c) => LineString(dpFor(eps)(c))
      case MultiLineString(ls) => MultiLineString(ls.map(dpFor(eps)))
      case other => other
    }
  }
}

/** Minimal JSON façade for API request bodies (the build has no JSON
  * dependency): parse to Map/List/String/Double/Boolean/null, and
  * serialize the same shapes back. */
object Json {
  def parseObject(s: String): Map[String, Any] =
    new GeoJsonParser(s).parseRootObject()

  def write(v: Any): String = v match {
    case null => "null"
    case m: Map[_, _] =>
      m.map { case (k, x) => s"${write(k.toString)}:${write(x)}" }
        .mkString("{", ",", "}")
    case l: List[_] => l.map(write).mkString("[", ",", "]")
    case s: String =>
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    case d: Double =>
      if (d == Math.floor(d) && !d.isInfinite && Math.abs(d) < 1e15)
        d.toLong.toString
      else d.toString
    case b: Boolean => b.toString
    case other => other.toString
  }
}

/** Tiny recursive-descent parser for the GeoJSON geometry subset. */
private[geo] final class GeoJsonParser(s: String) {

  private[geo] def parseRootObject(): Map[String, Any] = parseObject()
  private var i = 0

  def parseGeometry(): Geom = {
    val obj = parseObject()
    geomFrom(obj)
  }

  private def geomFrom(obj: Map[String, Any]): Geom = {
    val tpe = obj.getOrElse("type", "").asInstanceOf[String]
    def coords: Any = obj("coordinates")
    def pair(a: Any): (Double, Double) = {
      val l = a.asInstanceOf[List[Any]]
      (num(l(0)), num(l(1)))
    }
    def num(a: Any): Double = a.asInstanceOf[Double]
    def ring(a: Any): Array[(Double, Double)] =
      a.asInstanceOf[List[Any]].map(pair).toArray
    def rings(a: Any): Array[Array[(Double, Double)]] =
      a.asInstanceOf[List[Any]].map(ring).toArray
    tpe match {
      case "Point" => val (x, y) = pair(coords); Point(x, y)
      case "MultiPoint" => MultiPoint(ring(coords))
      case "LineString" => LineString(ring(coords))
      case "MultiLineString" => MultiLineString(rings(coords))
      case "Polygon" => Polygon(rings(coords))
      case "MultiPolygon" =>
        MultiPolygon(coords.asInstanceOf[List[Any]].map(rings).toArray)
      case t => throw new IllegalArgumentException(s"unsupported GeoJSON type '$t'")
    }
  }

  private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
  private def expect(c: Char): Unit = {
    ws()
    if (i >= s.length || s.charAt(i) != c)
      throw new IllegalArgumentException(s"GeoJSON parse error at $i: expected '$c'")
    i += 1
  }

  private def parseValue(): Any = {
    ws()
    s.charAt(i) match {
      case '{' => parseObject()
      case '[' => parseArray()
      case '"' => parseString()
      case 't' => i += 4; true
      case 'f' => i += 5; false
      case 'n' => i += 4; null
      case _ => parseNumber()
    }
  }

  private def parseObject(): Map[String, Any] = {
    expect('{')
    val b = Map.newBuilder[String, Any]
    ws()
    if (s.charAt(i) == '}') { i += 1; return b.result() }
    var done = false
    while (!done) {
      ws()
      val k = parseString()
      expect(':')
      b += (k -> parseValue())
      ws()
      if (s.charAt(i) == ',') i += 1 else { expect('}'); done = true }
    }
    b.result()
  }

  private def parseArray(): List[Any] = {
    expect('[')
    val b = List.newBuilder[Any]
    ws()
    if (s.charAt(i) == ']') { i += 1; return b.result() }
    var done = false
    while (!done) {
      b += parseValue()
      ws()
      if (s.charAt(i) == ',') i += 1 else { expect(']'); done = true }
    }
    b.result()
  }

  private def parseString(): String = {
    expect('"')
    val sb = new StringBuilder
    while (s.charAt(i) != '"') {
      if (s.charAt(i) == '\\') {
        i += 1
        s.charAt(i) match {
          case 'n' => sb.append('\n'); case 't' => sb.append('\t')
          case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
          case c => sb.append(c)
        }
      } else sb.append(s.charAt(i))
      i += 1
    }
    i += 1
    sb.toString
  }

  private def parseNumber(): Double = {
    val start = i
    while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
    s.substring(start, i).toDouble
  }
}
