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
        val q = quantize(cs, ring = false)
        if (q.length < 2) Nil else Seq(Mvt.Feature(fid, 2, Seq(q), attrs))
      case MultiLineString(ls) =>
        val qs = ls.map(quantize(_, ring = false)).filter(_.length >= 2).toSeq
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
        if (ext.length < 3) Nil
        else {
          val holes = clipped.tail.map(quantize(_, ring = true)).filter(_.length >= 3)
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
        val xLo = math.max(0, math.floor(xOfLon(bx0, z) - pad).toInt)
        val xHi = math.min(n - 1, math.floor(xOfLon(bx1, z) + pad).toInt)
        val latHi = math.min(by1, graft.raster.Warp.WebMercatorMaxLat)
        val latLo = math.max(by0, -graft.raster.Warp.WebMercatorMaxLat)
        val yLo = math.max(0, math.floor(yOfLat(latHi, z) - pad).toInt)
        val yHi = math.min(n - 1, math.floor(yOfLat(latLo, z) + pad).toInt)
        for (x <- xLo to xHi; y <- yLo to yHi)
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
