package graft.geo

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Static vector tile cache builder (SURVEY §2.1 S14; reference
  * `static_vector_tile_cache_assets.py` — an NDJSON export piped
  * through tippecanoe to z/x/y `.pbf` tiles): renders a vector
  * version's geo table as Mapbox Vector Tiles for a zoom range.
  *
  * Distribution shape: one pass over the feature table — each feature
  * flatMaps to the (z, x, y) tiles its bbox overlaps (buffered), one
  * shuffle groups features by tile, and the reducer clips in tile
  * space, quantizes to the 4096 extent, and [[Mvt]]-encodes the
  * layer. Shuffle volume = Σ feature×tile overlaps (bbox-bounded,
  * the tippecanoe equivalent); no driver geometry. Local-filesystem
  * output here; at scale the tile writer targets an object store.
  */
object VectorTileCache {

  /** Tile-space buffer beyond the extent (tippecanoe's default
    * --buffer=5 in 1/256ths ≈ 80/4096; 64 keeps strokes seamless). */
  val BufferUnits = 64

  private def transform(g: Geom)(f: ((Double, Double)) => (Double, Double)): Geom =
    g match {
      case Point(x, y) => val p = f((x, y)); Point(p._1, p._2)
      case MultiPoint(ps) => MultiPoint(ps.map(f))
      case LineString(cs) => LineString(cs.map(f))
      case MultiLineString(ls) => MultiLineString(ls.map(_.map(f)))
      case Polygon(rs) => Polygon(rs.map(_.map(f)))
      case MultiPolygon(ps) => MultiPolygon(ps.map(_.map(_.map(f))))
    }

  /** Quantize a tile-space part to ints, dropping consecutive dupes.
    * Only RINGS drop a duplicated closing vertex (ClosePath implies
    * it) — a loop-shaped LineString keeps its closing segment. */
  private def quantize(part: Array[(Double, Double)],
                       ring: Boolean): Array[(Int, Int)] = {
    val out = Array.newBuilder[(Int, Int)]
    var last: (Int, Int) = null
    part.foreach { case (x, y) =>
      val q = (Math.round(x).toInt, Math.round(y).toInt)
      if (q != last) { out += q; last = q }
    }
    val r = out.result()
    if (ring && r.length > 1 && r.head == r.last) r.dropRight(1) else r
  }

  /** Clip a polyline to the axis-aligned square [lo,hi]², splitting
    * where it exits: Liang–Barsky parametric clip per segment,
    * consecutive surviving segments stitched back into parts (a
    * segment entering at t0=0 starts exactly at the previous
    * segment's t1=1 endpoint, so exact-equality stitching is sound).
    * Without this, a polyline was encoded in FULL into every tile its
    * bbox overlaps — payload O(vertices × tiles) and features in
    * tiles they never intersect. */
  private[geo] def clipLine(cs: Array[(Double, Double)],
                            lo: Double, hi: Double): Seq[Array[(Double, Double)]] = {
    val parts = Seq.newBuilder[Array[(Double, Double)]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    def flush(): Unit = {
      if (cur.length >= 2) parts += cur.toArray
      cur = scala.collection.mutable.ArrayBuffer.empty
    }
    var i = 0
    while (i < cs.length - 1) {
      val (x0, y0) = cs(i)
      val (x1, y1) = cs(i + 1)
      val dx = x1 - x0
      val dy = y1 - y0
      var t0 = 0.0
      var t1 = 1.0
      var ok = true
      def edge(p: Double, q: Double): Unit =
        if (ok) {
          if (p == 0.0) { if (q < 0.0) ok = false }
          else {
            val r = q / p
            if (p < 0.0) { if (r > t1) ok = false else if (r > t0) t0 = r }
            else { if (r < t0) ok = false else if (r < t1) t1 = r }
          }
        }
      edge(-dx, x0 - lo); edge(dx, hi - x0)
      edge(-dy, y0 - lo); edge(dy, hi - y0)
      if (ok && t0 <= t1) {
        val a = if (t0 == 0.0) (x0, y0) else (x0 + t0 * dx, y0 + t0 * dy)
        val b = if (t1 == 1.0) (x1, y1) else (x0 + t1 * dx, y0 + t1 * dy)
        if (cur.nonEmpty && cur.last == a) cur += b
        else { flush(); cur += a; cur += b }
      }
      i += 1
    }
    flush()
    parts.result()
  }

  /** Signed area ×2 (surveyor's formula) of a quantized ring —
    * MVT 2.1 §4.3.4.4 forbids zero-area exteriors, and a sliver that
    * quantized to collinear points would otherwise ship one. */
  private def area2(ring: Array[(Int, Int)]): Long = {
    var s = 0L
    var i = 0
    while (i < ring.length) {
      val (ax, ay) = ring(i)
      val (bx, by) = ring((i + 1) % ring.length)
      s += ax.toLong * by - bx.toLong * ay
      i += 1
    }
    s
  }

  /** MVT features of one source feature on one tile, in tile coords. */
  private def tileFeatures(fid: Long, geom: Geom, attrs: Seq[(String, Any)],
                           z: Int, x: Int, y: Int): Seq[Mvt.Feature] = {
    val ext = Mvt.Extent
    // project lon/lat → tile-local MVT units (y down)
    val proj: ((Double, Double)) => (Double, Double) = { case (lon, lat) =>
      ((graft.raster.TileCache.xOfLon(lon, z) - x) * ext,
        (graft.raster.TileCache.yOfLat(lat, z) - y) * ext)
    }
    val t = transform(geom)(proj)
    val lo = -BufferUnits.toDouble
    val hi = ext + BufferUnits.toDouble
    t match {
      case Point(px, py) =>
        if (px < lo || px > hi || py < lo || py > hi) Nil
        else Seq(Mvt.Feature(fid, 1,
          Seq(Array((Math.round(px).toInt, Math.round(py).toInt))), attrs))
      case MultiPoint(ps) =>
        val in = ps.filter(p => p._1 >= lo && p._1 <= hi && p._2 >= lo && p._2 <= hi)
          .map(p => (Math.round(p._1).toInt, Math.round(p._2).toInt))
        if (in.isEmpty) Nil else Seq(Mvt.Feature(fid, 1, Seq(in), attrs))
      case LineString(cs) =>
        val qs = clipLine(cs, lo, hi)
          .map(quantize(_, ring = false)).filter(_.length >= 2)
        if (qs.isEmpty) Nil else Seq(Mvt.Feature(fid, 2, qs, attrs))
      case MultiLineString(ls) =>
        val qs = ls.toSeq.flatMap(clipLine(_, lo, hi))
          .map(quantize(_, ring = false)).filter(_.length >= 2)
        if (qs.isEmpty) Nil else Seq(Mvt.Feature(fid, 2, qs, attrs))
      case p: Polygon =>
        polyFeature(fid, Array(p.rings), lo, hi, attrs)
      case MultiPolygon(ps) =>
        polyFeature(fid, ps, lo, hi, attrs)
    }
  }

  private def polyFeature(fid: Long, polys: Array[Array[Array[(Double, Double)]]],
                          lo: Double, hi: Double,
                          attrs: Seq[(String, Any)]): Seq[Mvt.Feature] =
    polys.toSeq.flatMap { rings =>
      // clip each polygon to the buffered tile square, then quantize;
      // one MVT feature per polygon (exterior first, holes after —
      // the encoder fixes winding by position)
      val clipped = Geom.clipToEnvelope(Polygon(rings), lo, lo, hi, hi) match {
        case Polygon(rs) => rs
        case _ => Array.empty[Array[(Double, Double)]]
      }
      // Quantize the exterior FIRST and gate on it: if the exterior
      // collapses below 3 vertices the polygon is gone — dropping only
      // the exterior would promote the first surviving hole to
      // exterior (the encoder assigns winding by position).
      if (clipped.isEmpty) Nil
      else {
        val ext = quantize(clipped.head, ring = true)
        // zero-area exteriors (slivers quantized to collinear points)
        // are spec-invalid — drop the polygon, not just the ring
        if (ext.length < 3 || area2(ext) == 0L) Nil
        else {
          val holes = clipped.tail.map(quantize(_, ring = true))
            .filter(h => h.length >= 3 && area2(h) != 0L)
          Seq(Mvt.Feature(fid, 3, ext +: holes.toSeq, attrs))
        }
      }
    }

  /** Build the cache; returns tiles written. `rows` must carry `geom`
    * (WKB) plus the attribute columns in `fields`. */
  def build(spark: SparkSession, rows: DataFrame, layerName: String,
            fields: Seq[String], minZoom: Int, maxZoom: Int,
            outDir: String): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    import graft.raster.TileCache.{xOfLon, yOfLat}
    val fieldArr = fields.toArray
    val src = rows.selectExpr(Seq("geom") ++ fieldArr.map(f => s"`$f`"): _*).rdd
      .zipWithIndex()
    val contribs = src.flatMap { case (r, fid) =>
      // keep the ORIGINAL WKB bytes for the shuffle payload — the
      // geometry was just decoded from them, and re-encoding once per
      // overlapping tile multiplied the serialization work by the
      // tile fan-out
      val wkb = r.getAs[Array[Byte]](0)
      val g = Geom.fromWkb(wkb)
      val attrs: Seq[(String, Any)] = fieldArr.toSeq.zipWithIndex.flatMap {
        case (f, i) => Option(r.get(i + 1)).map(f -> _)
      }
      val (bx0, by0, bx1, by1) = g.bbox
      (minZoom to maxZoom).iterator.flatMap { z =>
        val n = 1 << z
        val pad = BufferUnits.toDouble / Mvt.Extent // tile fraction
        // a lon bbox wider than 180° means the feature crosses the
        // antimeridian (RFC 7946 §3.1.9 asks producers to SPLIT such
        // geometries; for unsplit input we at least fan out only to
        // the two edge ranges instead of every x tile on earth — the
        // per-tile clip drops what does not intersect)
        val xRanges: Seq[(Int, Int)] =
          if (bx1 - bx0 > 180.0)
            Seq((math.max(0, math.floor(xOfLon(bx1, z) - pad).toInt), n - 1),
              (0, math.min(n - 1, math.floor(xOfLon(bx0, z) + pad).toInt)))
          else
            Seq((math.max(0, math.floor(xOfLon(bx0, z) - pad).toInt),
              math.min(n - 1, math.floor(xOfLon(bx1, z) + pad).toInt)))
        val latHi = math.min(by1, graft.raster.Warp.WebMercatorMaxLat)
        val latLo = math.max(by0, -graft.raster.Warp.WebMercatorMaxLat)
        val yLo = math.max(0, math.floor(yOfLat(latHi, z) - pad).toInt)
        val yHi = math.min(n - 1, math.floor(yOfLat(latLo, z) + pad).toInt)
        // distinct x values: the two wrap ranges can overlap for a
        // near-global feature, and a duplicate (tile, fid) pair would
        // render the feature twice in that tile
        val xs = xRanges.flatMap { case (a, b) => a to b }.distinct
        for (x <- xs; y <- yLo to yHi)
          yield ((z, x, y), (fid, wkb, attrs))
      }
    }
    contribs.groupByKey().map { case ((z, x, y), feats) =>
      val mvtFeats = feats.toSeq.sortBy(_._1).flatMap { case (fid, wkb, attrs) =>
        tileFeatures(fid, Geom.fromWkb(wkb), attrs, z, x, y)
      }
      if (mvtFeats.isEmpty) 0L
      else {
        val dir = java.nio.file.Paths.get(outDir, z.toString, x.toString)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"$y.pbf"),
          Mvt.encodeTile(layerName, mvtFeats))
        1L
      }
    }.sum().toLong
  }
}
