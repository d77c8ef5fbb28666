package graft.geo

import java.io.ByteArrayOutputStream

/** Mapbox Vector Tile encoder (public spec: mapbox/vector-tile-spec
  * v2.1 — protobuf wire format written by hand, no codegen): one
  * layer per tile, extent 4096, features carry zigzag-delta geometry
  * command streams and tag indexes into the layer's interned
  * key/value tables. The static vector tile cache
  * (`static_vector_tile_cache_assets.py` — the reference shells out
  * to tippecanoe) writes these as `{z}/{x}/{y}.pbf`. */
object Mvt {

  val Extent = 4096

  /** One feature: tile-local integer coordinates (y DOWN, already
    * quantized to the extent), attributes, and the MVT geometry type
    * (1 point, 2 linestring, 3 polygon). For polygons, `rings` are
    * (exterior, holes...) groups in sequence — the encoder enforces
    * spec winding (exterior positive area, interior negative, under
    * the surveyor's formula in tile space). */
  final case class Feature(id: Long, geomType: Int,
                           parts: Seq[Array[(Int, Int)]],
                           attrs: Seq[(String, Any)])

  // ------------------------------------------------------- wire format

  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def key(field: Int, wire: Int): Int = (field << 3) | wire

  private def lenDelim(out: ByteArrayOutputStream, field: Int,
                       body: Array[Byte]): Unit = {
    varint(out, key(field, 2).toLong)
    varint(out, body.length.toLong)
    out.write(body)
  }

  private def valueMsg(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    v match {
      case s: String =>
        lenDelim(out, 1, s.getBytes("UTF-8"))
      case d: Double =>
        varint(out, key(3, 1).toLong)
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 0
        while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
      case b: Boolean =>
        varint(out, key(7, 0).toLong); varint(out, if (b) 1L else 0L)
      case f: Float => // float_value (field 2, fixed32)
        varint(out, key(2, 5).toLong)
        val bits = java.lang.Float.floatToIntBits(f)
        var i = 0
        while (i < 4) { out.write((bits >>> (8 * i)) & 0xff); i += 1 }
      // DECIMAL columns (java/scala BigDecimal from Spark rows) carry
      // fractions — encode as double_value, not a truncated int
      case bd: java.math.BigDecimal =>
        varint(out, key(3, 1).toLong)
        val bits = java.lang.Double.doubleToLongBits(bd.doubleValue())
        var i = 0
        while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
      case bd: scala.math.BigDecimal =>
        varint(out, key(3, 1).toLong)
        val bits = java.lang.Double.doubleToLongBits(bd.toDouble)
        var i = 0
        while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
      case n: Number =>
        varint(out, key(4, 0).toLong); varint(out, n.longValue())
      case other =>
        lenDelim(out, 1, String.valueOf(other).getBytes("UTF-8"))
    }
    out.toByteArray
  }

  /** Signed area ×2 of a ring in tile coords (surveyor's formula —
    * the spec's winding criterion). */
  private def signedArea2(ring: Array[(Int, Int)]): Long = {
    var s = 0L
    var i = 0
    val n = ring.length
    while (i < n) {
      val (x0, y0) = ring(i)
      val (x1, y1) = ring((i + 1) % n)
      s += x0.toLong * y1 - x1.toLong * y0
      i += 1
    }
    s
  }

  private def geometry(f: Feature): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var cx = 0L; var cy = 0L
    def moveTo(p: (Int, Int)): Unit = {
      varint(out, (1 | (1 << 3)).toLong)
      varint(out, zigzag(p._1 - cx)); varint(out, zigzag(p._2 - cy))
      cx = p._1; cy = p._2
    }
    def lineTo(pts: Seq[(Int, Int)]): Unit = {
      if (pts.isEmpty) return
      varint(out, (2 | (pts.length << 3)).toLong)
      pts.foreach { p =>
        varint(out, zigzag(p._1 - cx)); varint(out, zigzag(p._2 - cy))
        cx = p._1; cy = p._2
      }
    }
    f.geomType match {
      case 1 => // points: one MoveTo with count = points
        val pts = f.parts.flatten
        varint(out, (1 | (pts.length << 3)).toLong)
        pts.foreach { p =>
          varint(out, zigzag(p._1 - cx)); varint(out, zigzag(p._2 - cy))
          cx = p._1; cy = p._2
        }
      case 2 =>
        f.parts.foreach { line =>
          moveTo(line.head); lineTo(line.tail.toSeq)
        }
      case 3 =>
        f.parts.zipWithIndex.foreach { case (ring0, i) =>
          // drop a duplicated closing vertex; ClosePath implies it
          val open0 =
            if (ring0.length > 1 && ring0.head == ring0.last) ring0.dropRight(1)
            else ring0
          // winding: ring 0 of each polygon is exterior (positive
          // area required), holes negative — the tile-space y-down
          // convention of spec §4.3.3.3. Caller marks hole rings by
          // position: here every part after the first of a polygon
          // group is a hole only if the caller ordered them so; we
          // normalize by AREA SIGN per the caller's exterior flag.
          val wantPositive = isExterior(f.parts, i)
          val area = signedArea2(open0)
          val ring =
            if ((area > 0) == wantPositive || area == 0) open0
            else open0.reverse
          moveTo(ring.head); lineTo(ring.tail.toSeq)
          varint(out, (7 | (1 << 3)).toLong)
        }
    }
    out.toByteArray
  }

  /** Ring i is an exterior iff the caller's part list marks it so:
    * the convention here is rings arrive grouped (ext, holes…) and the
    * FIRST ring of the feature plus any ring following a hole-less
    * group boundary is exterior. Encoders with multiple polygons pass
    * one Feature per polygon (simplest correct form), so: index 0 is
    * the exterior, the rest are holes. */
  private def isExterior(parts: Seq[Array[(Int, Int)]], i: Int): Boolean = i == 0

  private def featureMsg(f: Feature, keyIdx: Map[String, Int],
                         valIdx: Map[Any, Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    varint(out, key(1, 0).toLong); varint(out, f.id)
    // tags: packed k/v index pairs
    val tags = new ByteArrayOutputStream()
    f.attrs.foreach { case (k, v) =>
      varint(tags, keyIdx(k).toLong); varint(tags, valIdx(v).toLong)
    }
    lenDelim(out, 2, tags.toByteArray)
    varint(out, key(3, 0).toLong); varint(out, f.geomType.toLong)
    lenDelim(out, 4, geometry(f))
    out.toByteArray
  }

  /** Encode one tile holding one layer. */
  def encodeTile(layerName: String, features: Seq[Feature]): Array[Byte] = {
    // intern keys/values in first-seen order (the spec's layer tables)
    val keys = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val vals = scala.collection.mutable.LinkedHashMap.empty[Any, Int]
    features.foreach(_.attrs.foreach { case (k, v) =>
      keys.getOrElseUpdate(k, keys.size)
      vals.getOrElseUpdate(v, vals.size)
    })
    val keyIdx = keys.toMap
    val valIdx = vals.toMap
    val layer = new ByteArrayOutputStream()
    varint(layer, key(15, 0).toLong); varint(layer, 2L) // version 2
    lenDelim(layer, 1, layerName.getBytes("UTF-8"))
    features.foreach(f =>
      lenDelim(layer, 2, featureMsg(f, keyIdx, valIdx)))
    keys.keys.foreach(k => lenDelim(layer, 3, k.getBytes("UTF-8")))
    vals.keys.foreach(v => lenDelim(layer, 4, valueMsg(v)))
    varint(layer, key(5, 0).toLong); varint(layer, Extent.toLong)
    val tile = new ByteArrayOutputStream()
    lenDelim(tile, 3, layer.toByteArray)
    tile.toByteArray
  }
}
