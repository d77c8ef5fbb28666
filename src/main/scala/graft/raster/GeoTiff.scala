package graft.raster

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/** Minimal pure-JVM GeoTIFF codec (TIFF 6.0 + the GeoTIFF geokeys) —
  * the interchange format of the reference's raster pipeline: pixETL
  * reads source GeoTIFF tiles (`raster_tile_set_assets.py:36-117`)
  * and `/download/geotiff` serves per-tile artifacts
  * (`downloads.py:264-292`). No GDAL exists in this build, so the
  * format is written byte-by-byte:
  *
  *   - single-band, 32-bit signed integer samples (the tile lake's
  *     pixel currency), one strip, little-endian;
  *   - compression 1 (none), 8 (zlib/deflate — interoperable by
  *     construction via `java.util.zip`) or 5 (LZW, the TIFF 6.0
  *     MSB-first variant with early code-width change — what
  *     GDAL/libtiff emit by default); the reader also applies the
  *     horizontal-differencing predictor (tag 317 = 2) on int32 rows;
  *   - georeferencing via ModelPixelScale + ModelTiepoint and a
  *     GeoKeyDirectory declaring geographic WGS 84 (EPSG 4326),
  *     pixel-is-area.
  *
  * The reader accepts exactly what the writer produces plus benign
  * variations (extra tags are skipped, multi-strip data is
  * concatenated).
  */
object GeoTiff {

  final case class Tile(width: Int, height: Int,
                        originLon: Double, originLat: Double,
                        pixelDeg: Double, pixels: Array[Int])

  // TIFF tag ids
  private val TWidth = 256
  private val TLength = 257
  private val TBits = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TPredictor = 317
  private val TSampleFormat = 339
  private val TPixelScale = 33550
  private val TTiepoint = 33922
  private val TGeoKeys = 34735

  def write(path: java.nio.file.Path, tile: Tile, deflate: Boolean = true): Unit =
    write(path, tile, if (deflate) "deflate" else "none")

  def write(path: java.nio.file.Path, tile: Tile, compression: String): Unit = {
    val raw = {
      val b = ByteBuffer.allocate(tile.pixels.length * 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      tile.pixels.foreach(b.putInt)
      b.array()
    }
    val compCode = compression match {
      case "none" => 1
      case "lzw" => 5
      case "deflate" => 8
      case c => throw new IllegalArgumentException(
        s"unsupported compression '$c' (none/lzw/deflate)")
    }
    val strip = compCode match {
      case 1 => raw
      case 5 => lzwEncode(raw)
      case 8 =>
        val d = new Deflater()
        d.setInput(raw); d.finish()
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end()
        out.toByteArray
    }

    // GeoKeyDirectory: version 1.1.0, 3 keys:
    //   GTModelType=2 (geographic), GTRasterType=1 (pixel-is-area),
    //   GeographicType=4326
    val geoKeys: Array[Short] = Array(
      1, 1, 0, 3,
      1024, 0, 1, 2,
      1025, 0, 1, 1,
      2048, 0, 1, 4326).map(_.toShort)

    // layout: header(8) + IFD + external values + strip
    val entries = 13
    val ifdSize = 2 + entries * 12 + 4
    val extBase = 8 + ifdSize
    // external blocks: pixelScale (3 doubles), tiepoint (6 doubles),
    // geokeys (16 shorts)
    val scaleOff = extBase
    val tieOff = scaleOff + 24
    val geoOff = tieOff + 48
    val stripOff = geoOff + geoKeys.length * 2

    val out = ByteBuffer.allocate(stripOff + strip.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0, 'I'.toByte).put(1, 'I'.toByte)
    out.putShort(2, 42.toShort)
    out.putInt(4, 8) // first IFD offset

    out.position(8)
    out.putShort(entries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      out.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      out.putInt((value & 0xffffffffL).toInt)
    }
    // tags must ascend
    entry(TWidth, 3, 1, tile.width)
    entry(TLength, 3, 1, tile.height)
    entry(TBits, 3, 1, 32)
    entry(TCompression, 3, 1, compCode)
    entry(TPhotometric, 3, 1, 1) // BlackIsZero
    entry(TStripOffsets, 4, 1, stripOff)
    entry(TSamplesPerPixel, 3, 1, 1)
    entry(TRowsPerStrip, 3, 1, tile.height)
    entry(TStripByteCounts, 4, 1, strip.length)
    entry(TSampleFormat, 3, 1, 2) // signed integer
    entry(TPixelScale, 12, 3, scaleOff)
    entry(TTiepoint, 12, 6, tieOff)
    entry(TGeoKeys, 3, geoKeys.length, geoOff)
    out.putInt(0) // next IFD

    out.position(scaleOff)
    out.putDouble(tile.pixelDeg).putDouble(tile.pixelDeg).putDouble(0.0)
    out.position(tieOff)
    // raster (0,0,0) ↦ model (originLon, originLat, 0)
    out.putDouble(0.0).putDouble(0.0).putDouble(0.0)
    out.putDouble(tile.originLon).putDouble(tile.originLat).putDouble(0.0)
    out.position(geoOff)
    geoKeys.foreach(out.putShort)
    out.position(stripOff)
    out.put(strip)

    java.nio.file.Files.write(path, out.array())
  }

  def read(bytes: Array[Byte]): Tile = {
    val order = (bytes(0) & 0xff, bytes(1) & 0xff) match {
      case (0x49, 0x49) => ByteOrder.LITTLE_ENDIAN // "II"
      case (0x4d, 0x4d) => ByteOrder.BIG_ENDIAN    // "MM"
      case _ => throw new IllegalArgumentException("not a TIFF")
    }
    val b = ByteBuffer.wrap(bytes).order(order)
    require(b.getShort(2) == 42, "bad TIFF magic")
    val ifd = b.getInt(4)
    val n = b.getShort(ifd) & 0xffff
    var width = 0
    var height = 0
    var compression = 1
    var predictor = 1
    var bits = 32
    var stripOffsets = Seq.empty[Long]
    var stripCounts = Seq.empty[Long]
    var scaleOff = -1
    var tieOff = -1
    val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 12 -> 8)
    def values(off: Int): (Int, Int, Seq[Long]) = {
      val typ = b.getShort(off + 2) & 0xffff
      val count = b.getInt(off + 4)
      val inline = typeSize(typ) * count <= 4
      val base = if (inline) off + 8 else b.getInt(off + 8)
      val vs = (0 until count).map { i =>
        typ match {
          case 3 => (b.getShort(base + 2 * i) & 0xffff).toLong
          case 4 => b.getInt(base + 4 * i).toLong & 0xffffffffL
          case 1 | 2 => (b.get(base + i) & 0xff).toLong
          case 12 => java.lang.Double.doubleToLongBits(b.getDouble(base + 8 * i))
        }
      }
      (typ, count, vs)
    }
    var i = 0
    while (i < n) {
      val off = ifd + 2 + i * 12
      val tag = b.getShort(off) & 0xffff
      tag match {
        case TWidth => width = values(off)._3.head.toInt
        case TLength => height = values(off)._3.head.toInt
        case TBits => bits = values(off)._3.head.toInt
        case TCompression => compression = values(off)._3.head.toInt
        case TPredictor => predictor = values(off)._3.head.toInt
        case TStripOffsets => stripOffsets = values(off)._3
        case TStripByteCounts => stripCounts = values(off)._3
        case TPixelScale => scaleOff = b.getInt(off + 8)
        case TTiepoint => tieOff = b.getInt(off + 8)
        case _ => // skip
      }
      i += 1
    }
    require(width > 0 && height > 0, "missing dimensions")
    require(bits == 32, s"unsupported BitsPerSample $bits (int32 only)")
    val data = stripOffsets.zip(stripCounts).map { case (o, c) =>
      java.util.Arrays.copyOfRange(bytes, o.toInt, (o + c).toInt)
    }.reduce(_ ++ _)
    val raw0 = compression match {
      case 1 => data
      case 5 => lzwDecode(data, width * height * 4)
      case 8 | 32946 =>
        val inf = new Inflater()
        inf.setInput(data)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val k = inf.inflate(buf)
          require(k > 0 || inf.finished(), "truncated deflate stream")
          out.write(buf, 0, k)
        }
        inf.end()
        out.toByteArray
      case c => throw new IllegalArgumentException(
        s"unsupported TIFF compression $c (none/lzw/deflate only)")
    }
    require(raw0.length == width * height * 4,
      s"strip decodes to ${raw0.length} B, expected ${width * height * 4}")
    // horizontal differencing (predictor 2): each int32 sample stores
    // the delta to its left neighbor — undo per row
    val raw =
      if (predictor != 2) raw0
      else {
        val pb = ByteBuffer.wrap(raw0).order(order)
        var row = 0
        while (row < height) {
          var col = 1
          while (col < width) {
            val k = (row * width + col) * 4
            pb.putInt(k, pb.getInt(k) + pb.getInt(k - 4))
            col += 1
          }
          row += 1
        }
        raw0
      }
    val px = new Array[Int](width * height)
    val rb = ByteBuffer.wrap(raw).order(order)
    var j = 0
    while (j < px.length) { px(j) = rb.getInt(4 * j); j += 1 }
    val pixelDeg =
      if (scaleOff >= 0) b.getDouble(scaleOff) else Double.NaN
    val (lon, lat) =
      if (tieOff >= 0) (b.getDouble(tieOff + 24), b.getDouble(tieOff + 32))
      else (Double.NaN, Double.NaN)
    Tile(width, height, lon, lat, pixelDeg, px)
  }

  // ------------------------------------------------------------- LZW
  // TIFF 6.0 §13: MSB-first bit packing, ClearCode=256, EOI=257,
  // first table entry 258, 9→12-bit codes with EARLY width change
  // (the width bumps when the NEXT code to assign would be 2^w - 1 —
  // the libtiff/GDAL convention).

  private val LzwClear = 256
  private val LzwEoi = 257

  private def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 16)
    var acc = 0L
    var accBits = 0
    var width = 9
    def put(code: Int): Unit = {
      acc = (acc << width) | code
      accBits += width
      while (accBits >= 8) {
        out.write(((acc >>> (accBits - 8)) & 0xff).toInt)
        accBits -= 8
      }
    }
    // (prefixCode << 8 | byte) → code
    var table = new java.util.HashMap[Integer, Integer](8192)
    var nextCode = 258
    def reset(): Unit = { table = new java.util.HashMap(8192); nextCode = 258; width = 9 }
    put(LzwClear)
    var omega = -1 // current prefix code; -1 = empty
    var i = 0
    while (i < raw.length) {
      val k = raw(i) & 0xff
      if (omega < 0) omega = k
      else {
        val key: Integer = (omega << 8) | k
        val hit = table.get(key)
        if (hit != null) omega = hit.intValue()
        else {
          put(omega)
          table.put(key, nextCode)
          nextCode += 1
          // early change: bump when the next code to ASSIGN hits 2^w - 1
          if (nextCode == (1 << width) - 1 && width < 12) width += 1
          omega = k
          if (nextCode >= 4094) { // table nearly full: flush + clear
            put(omega)
            put(LzwClear)
            reset()
            omega = -1
          }
        }
      }
      i += 1
    }
    if (omega >= 0) put(omega)
    put(LzwEoi)
    if (accBits > 0) out.write(((acc << (8 - accBits)) & 0xff).toInt)
    out.toByteArray
  }

  private def lzwDecode(data: Array[Byte], expected: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(expected)
    // code → byte string; literals are implicit
    var entries = new Array[Array[Byte]](4096)
    var nextCode = 258
    var width = 9
    def reset(): Unit = {
      entries = new Array[Array[Byte]](4096); nextCode = 258; width = 9
    }
    def stringOf(code: Int): Array[Byte] =
      if (code < 256) Array(code.toByte)
      else {
        require(entries(code) != null, s"LZW code $code before definition")
        entries(code)
      }
    var acc = 0L
    var accBits = 0
    var pos = 0
    var prev = -1
    while (pos < data.length || accBits >= width) {
      while (accBits < width && pos < data.length) {
        acc = (acc << 8) | (data(pos) & 0xff)
        accBits += 8
        pos += 1
      }
      if (accBits < width) return out.toByteArray // padding tail
      val code = ((acc >>> (accBits - width)) & ((1L << width) - 1)).toInt
      accBits -= width
      code match {
        case LzwEoi => return out.toByteArray
        case LzwClear =>
          reset()
          prev = -1
        case _ =>
          if (prev < 0) {
            require(code < 256, s"first LZW code after clear must be a literal, got $code")
            out.write(code)
            prev = code
          } else {
            val prevStr = stringOf(prev)
            val cur =
              if (code < 256 || entries(code) != null) stringOf(code)
              else prevStr :+ prevStr(0) // KwKwK case
            out.write(cur, 0, cur.length)
            entries(nextCode) = prevStr :+ cur(0)
            nextCode += 1
            // the decoder reconstructs each entry one code LATER than
            // the encoder assigned it, so its early-change threshold
            // sits one entry lower to keep code widths in lockstep
            if (nextCode == (1 << width) - 2 && width < 12) width += 1
            prev = code
          }
      }
    }
    out.toByteArray
  }
}
