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
  *   - samples in any of the reference's pixel types
  *     (`app/models/enum/pixetl.py:9-23`): u/int8, u/int16, uint32,
  *     int32, float32, float64 — one [[SampleType]] per file;
  *   - 1..64 bands, chunky interleave (PlanarConfiguration 1, the
  *     TIFF default and what GDAL emits) — the reference's calc DSL
  *     addresses multi-band sources as variables A..Z
  *     (`creation_options.py:159-176`) and `band_count` declares
  *     multi-band outputs (`creation_options.py:168-175`);
  *   - compression 1 (none), 8 (zlib/deflate — interoperable by
  *     construction via `java.util.zip`) or 5 (LZW, the TIFF 6.0
  *     MSB-first variant with early code-width change — what
  *     GDAL/libtiff emit by default); the reader also applies the
  *     horizontal-differencing predictor (tag 317 = 2) per band on
  *     integer samples;
  *   - georeferencing via ModelPixelScale + ModelTiepoint and a
  *     GeoKeyDirectory: EPSG 4326 writes geographic keys
  *     (GTModelType=2 + GeographicType), any other EPSG writes
  *     projected keys (GTModelType=1 + ProjectedCSType, e.g. 3857
  *     web mercator — the tile-cache CRS, `_tile_cache_assets`).
  *
  * The reader accepts exactly what the writer produces plus benign
  * variations (extra tags are skipped; multi-strip files decode
  * strip-by-strip — each strip is an independent compressed stream
  * per TIFF 6.0 — and big-endian files are honored).
  *
  * The legacy single-band int32 [[Tile]] API (the tile lake's pixel
  * currency) wraps the general [[Raster]] path.
  */
object GeoTiff {

  final case class Tile(width: Int, height: Int,
                        originLon: Double, originLat: Double,
                        pixelDeg: Double, pixels: Array[Int])

  /** One TIFF sample type: `bits` per sample, TIFF SampleFormat
    * `fmt` (1 = unsigned int, 2 = signed int, 3 = IEEE float). */
  sealed abstract class SampleType(val name: String, val bits: Int, val fmt: Int) {
    def isFloat: Boolean = fmt == 3
  }
  object SampleType {
    case object UInt8   extends SampleType("uint8",   8, 1)
    case object Int8    extends SampleType("int8",    8, 2)
    case object UInt16  extends SampleType("uint16", 16, 1)
    case object Int16   extends SampleType("int16",  16, 2)
    case object UInt32  extends SampleType("uint32", 32, 1)
    case object Int32   extends SampleType("int32",  32, 2)
    case object Float32 extends SampleType("float32", 32, 3)
    case object Float64 extends SampleType("float64", 64, 3)
    val all: Seq[SampleType] =
      Seq(UInt8, Int8, UInt16, Int16, UInt32, Int32, Float32, Float64)
    def of(name: String): SampleType = all.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"unknown sample type '$name'"))
    def of(bits: Int, fmt: Int): SampleType =
      all.find(t => t.bits == bits && t.fmt == fmt).getOrElse(
        throw new IllegalArgumentException(
          s"unsupported sample layout: $bits bits, format $fmt"))
  }

  /** A (possibly multi-band) georeferenced image. Samples are carried
    * as doubles — exact for every supported [[SampleType]] (uint32 <
    * 2^53, float32/64 native). `epsg` 4326 is geographic; any other
    * code is written/read as a projected CRS (ModelPixelScale is then
    * in projected units, e.g. meters for 3857). */
  final case class Raster(width: Int, height: Int,
                          originX: Double, originY: Double,
                          pixelScale: Double, epsg: Int,
                          sampleType: SampleType,
                          bands: Seq[Array[Double]],
                          pixelScaleYOpt: Double = Double.NaN,
                          geoParams: Map[Int, Double] = Map.empty) {
    require(bands.nonEmpty && bands.length <= 64,
      s"1..64 bands supported (got ${bands.length})")
    bands.foreach(b => require(b.length == width * height,
      s"band length ${b.length} != $width×$height"))
    /** Y pixel scale — equals [[pixelScale]] (square pixels) unless a
      * warp produced an anisotropic grid (e.g. 4326 → 3857, where the
      * y span stretches with latitude). */
    def pixelScaleY: Double =
      if (pixelScaleYOpt.isNaN) pixelScale else pixelScaleYOpt
  }

  private def tileOf(r: Raster): Tile = {
    require(r.bands.length == 1,
      s"expected a single-band tile, got ${r.bands.length} bands")
    require(!r.sampleType.isFloat,
      s"expected integer samples, got ${r.sampleType.name}")
    // toLong.toInt wraps (not saturates), so a uint32 file with the
    // sign bit set reads back as the same int32 bit pattern the old
    // signed-only reader produced
    Tile(r.width, r.height, r.originX, r.originY, r.pixelScale,
      r.bands.head.map(_.toLong.toInt))
  }

  private def rasterOf(t: Tile): Raster =
    Raster(t.width, t.height, t.originLon, t.originLat, t.pixelDeg,
      4326, SampleType.Int32, Seq(t.pixels.map(_.toDouble)))

  // TIFF tag ids
  private val TSubfileType = 254
  private val TWidth = 256
  private val TLength = 257
  private val TBits = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStripTag = 278
  private val TStripByteCounts = 279
  private val TPlanarConfig = 284
  private val TPredictor = 317
  private val TTileWidth = 322
  private val TTileLength = 323
  private val TTileOffsets = 324
  private val TTileByteCounts = 325
  private val TExtraSamples = 338
  private val TSampleFormat = 339
  private val TPixelScale = 33550
  private val TTiepoint = 33922
  private val TGeoKeys = 34735
  private val TGeoDoubles = 34736

  /** GeogTOWGS84GeoKey (2062) carries THREE or SEVEN doubles — the
    * one multi-valued key this reader surfaces. `geoParams` is
    * `Map[Int, Double]` (one value per key) through all the ingest
    * plumbing, so the reader unpacks value i of key 2062 to synthetic
    * key `Towgs84Base + i` and the writer packs those back into a
    * single count-N directory entry. The synthetic range sits far
    * outside the 16-bit geokey space, so it can never collide with a
    * real key. */
  private[raster] val Towgs84Base = 206200

  def write(path: java.nio.file.Path, tile: Tile, deflate: Boolean = true): Unit =
    write(path, tile, if (deflate) "deflate" else "none")

  def write(path: java.nio.file.Path, tile: Tile, compression: String): Unit =
    // integer data compresses far better differenced (GDAL writes
    // PREDICTOR=2 on compressed integer rasters by default)
    writeRaster(path, rasterOf(tile), compression,
      predictor = if (compression == "none") 1 else 2)

  private def compCodeOf(compression: String): Int = compression match {
    case "none" => 1
    case "lzw" => 5
    case "deflate" => 8
    case c => throw new IllegalArgumentException(
      s"unsupported compression '$c' (none/lzw/deflate)")
  }

  /** GeoKeyDirectory (version 1.1.0): geographic for 4326, projected
    * (key 3072) for every other EPSG code, pixel-is-area. */
  private def geoKeysFor(epsg: Int): Array[Short] =
    (if (epsg == 4326)
      Array(1, 1, 0, 3, 1024, 0, 1, 2, 1025, 0, 1, 1, 2048, 0, 1, 4326)
    else
      Array(1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1, 3072, 0, 1, epsg))
      .map(_.toShort)

  /** GeoKeyDirectory + GeoDoubleParams for a PARAMETER-DEFINED
    * projected CRS (ProjectedCSType 32767, user-defined — the
    * GeoTIFF 1.1 escape hatch national datasets use for Albers/LCC
    * grids without an EPSG code). Integer-valued keys (the coordinate
    * transformation code 3075) inline as shorts; everything else
    * lands in the double-params array with its directory entry
    * pointing at the value's index. Keys must ascend (GeoTIFF §2.4).
    * Returns (directory shorts, double params). */
  private def geoKeysWithParams(epsg: Int,
                                params: Map[Int, Double]): (Array[Short], Array[Double]) = {
    val (towgs, plain) =
      params.partition(kv => kv._1 >= Towgs84Base && kv._1 < Towgs84Base + 7)
    val sorted = plain.toSeq.sortBy(_._1)
    val dbls = Array.newBuilder[Double]
    val entries = Seq.newBuilder[(Int, Int, Int, Int)]
    entries += ((1024, 0, 1, 1)) // GTModelType: projected
    entries += ((1025, 0, 1, 1)) // GTRasterType: pixel-is-area
    entries += ((3072, 0, 1, epsg))
    var di = 0
    sorted.foreach { case (k, v) =>
      if (k == 3075) entries += ((k, 0, 1, v.toInt))
      else {
        entries += ((k, TGeoDoubles, 1, di))
        dbls += v
        di += 1
      }
    }
    if (towgs.nonEmpty) {
      // re-pack the synthetic keys into one count-N 2062 entry; the
      // spec allows exactly 3 (geocentric translation) or 7 (full
      // position-vector) values, contiguous from index 0
      val n = towgs.size
      require((n == 3 || n == 7) &&
        (0 until n).forall(i => towgs.contains(Towgs84Base + i)),
        s"GeogTOWGS84GeoKey needs 3 or 7 contiguous values, got ${towgs.keys.toSeq.sorted}")
      entries += ((2062, TGeoDoubles, n, di))
      (0 until n).foreach { i => dbls += towgs(Towgs84Base + i); di += 1 }
    }
    val es = entries.result().sortBy(_._1)
    val dir = Array(1, 1, 0, es.length) ++
      es.flatMap { case (a, b, c, d) => Seq(a, b, c, d) }
    (dir.map(_.toShort), dbls.result())
  }

  private def putSample(bb: ByteBuffer, off: Int, t: SampleType, v: Double): Unit =
    t match {
      case SampleType.UInt8 | SampleType.Int8 => bb.put(off, (v.toLong & 0xff).toByte)
      case SampleType.UInt16 | SampleType.Int16 =>
        bb.putShort(off, (v.toLong & 0xffff).toShort)
      case SampleType.UInt32 | SampleType.Int32 =>
        bb.putInt(off, (v.toLong & 0xffffffffL).toInt)
      case SampleType.Float32 => bb.putFloat(off, v.toFloat)
      case SampleType.Float64 => bb.putDouble(off, v)
    }

  private def getSample(bb: ByteBuffer, off: Int, t: SampleType): Double =
    t match {
      case SampleType.UInt8 => (bb.get(off) & 0xff).toDouble
      case SampleType.Int8 => bb.get(off).toDouble
      case SampleType.UInt16 => (bb.getShort(off) & 0xffff).toDouble
      case SampleType.Int16 => bb.getShort(off).toDouble
      case SampleType.UInt32 => (bb.getInt(off).toLong & 0xffffffffL).toDouble
      case SampleType.Int32 => bb.getInt(off).toDouble
      case SampleType.Float32 => bb.getFloat(off).toDouble
      case SampleType.Float64 => bb.getDouble(off)
    }

  /** Serialize the pixel block: chunky interleave (band-major within
    * each pixel), little-endian. */
  private def interleave(r: Raster): Array[Byte] = {
    val spp = r.bands.length
    val bps = r.sampleType.bits / 8
    val n = r.width * r.height
    val raw = new Array[Byte](n * spp * bps)
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < spp) {
        putSample(bb, (i * spp + c) * bps, r.sampleType, r.bands(c)(i))
        c += 1
      }
      i += 1
    }
    raw
  }

  /** One IFD entry in the builder below: external payloads are laid
    * out after the IFD in entry order. */
  private final case class Tag(tag: Int, typ: Int, count: Int,
                               inline: Long = 0L, ext: Array[Byte] = null)

  private def shorts(vs: Seq[Int]): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(v => b.putShort(v.toShort))
    b.array()
  }
  private def doubles(vs: Seq[Double]): Array[Byte] = {
    val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vs.foreach(b.putDouble)
    b.array()
  }

  /** A SHORT-array tag: inline when ≤2 values fit the 4-byte slot
    * (packed low-short-first), external otherwise. */
  private def shortTag(tag: Int, vs: Seq[Int]): Tag =
    if (vs.length == 1) Tag(tag, 3, 1, vs.head)
    else if (vs.length == 2)
      Tag(tag, 3, 2, (vs(0) & 0xffffL) | ((vs(1) & 0xffffL) << 16))
    else Tag(tag, 3, vs.length, ext = shorts(vs))

  /** Apply horizontal differencing (predictor 2) in place: each
    * integer sample becomes the delta to the same band's left
    * neighbor, at the sample byte width — the encode mirror of the
    * reader's `unpredict`. Differenced rasters compress much better
    * under LZW/deflate (GDAL writes PREDICTOR=2 on integer data). */
  private def predict2(raw: Array[Byte], w: Int, h: Int, spp: Int,
                       bps: Int): Array[Byte] = {
    val pb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val rowStride = w * spp
    var row = 0
    while (row < h) {
      var col = rowStride - 1
      while (col >= spp) {
        val k = (row * rowStride + col) * bps
        bps match {
          case 1 => pb.put(k, (pb.get(k) - pb.get(k - spp)).toByte)
          case 2 => pb.putShort(k,
            (pb.getShort(k) - pb.getShort(k - 2 * spp)).toShort)
          case 4 => pb.putInt(k, pb.getInt(k) - pb.getInt(k - 4 * spp))
          case 8 => pb.putLong(k, pb.getLong(k) - pb.getLong(k - 8 * spp))
        }
        col -= 1
      }
      row += 1
    }
    raw
  }

  /** Apply the floating-point predictor (3) in place: per row, split
    * each sample's bytes into planes (MSB plane first) and difference
    * byte-wise at sample stride — the encode mirror of the reader's
    * `unpredictFloat` (the libtiff fpDiff convention). Exponent bytes
    * land adjacent, so smooth float rasters compress far better
    * (GDAL writes PREDICTOR=3 on compressed float data). */
  private def predict3(raw: Array[Byte], w: Int, h: Int, spp: Int,
                       bpsF: Int): Array[Byte] = {
    val rowBytes = w * spp * bpsF
    val wc = w * spp // samples per row
    val tmp = new Array[Byte](rowBytes)
    var row = 0
    while (row < h) {
      val base = row * rowBytes
      // byte-split: plane index is the big-endian byte rank — the
      // file order is little-endian, so byte b of a sample is plane
      // bpsF-1-b (matching the reader's de-shuffle exactly)
      var s = 0
      while (s < wc) {
        var b = 0
        while (b < bpsF) {
          tmp((bpsF - 1 - b) * wc + s) = raw(base + s * bpsF + b)
          b += 1
        }
        s += 1
      }
      var i = rowBytes - 1
      while (i >= spp) {
        tmp(i) = (tmp(i) - tmp(i - spp)).toByte
        i -= 1
      }
      System.arraycopy(tmp, 0, raw, base, rowBytes)
      row += 1
    }
    raw
  }

  /** Write a single-strip GeoTIFF for `r`. `predictor` 2 (integer
    * types only) differences rows before compression; 3 (float types
    * only) byte-splits and differences; 0 (the default) picks GDAL's
    * convention — none on uncompressed output, else 2 for integer /
    * 3 for float samples. */
  def writeRaster(path: java.nio.file.Path, r: Raster,
                  compression: String = "deflate",
                  predictor: Int = 0): Unit = {
    val compCode = compCodeOf(compression)
    val spp = r.bands.length
    val pred =
      if (predictor != 0) predictor
      else if (compCode == 1) 1
      else if (r.sampleType.isFloat) 3
      else 2
    require(pred == 1 || (pred == 2 && !r.sampleType.isFloat) ||
      (pred == 3 && r.sampleType.isFloat),
      s"predictor $pred unsupported for ${r.sampleType.name}")
    val raw = interleave(r)
    if (pred == 2)
      predict2(raw, r.width, r.height, spp, r.sampleType.bits / 8)
    else if (pred == 3)
      predict3(raw, r.width, r.height, spp, r.sampleType.bits / 8)
    val strip = compress(raw, compCode)
    val (geoKeys, geoDbls) =
      if (r.geoParams.nonEmpty) geoKeysWithParams(r.epsg, r.geoParams)
      else (geoKeysFor(r.epsg), Array.empty[Double])

    // tags must ascend; strip offset is patched once layout is known
    val tags = Seq.newBuilder[Tag]
    tags += Tag(TWidth, 3, 1, r.width)
    tags += Tag(TLength, 3, 1, r.height)
    tags += shortTag(TBits, Seq.fill(spp)(r.sampleType.bits))
    tags += Tag(TCompression, 3, 1, compCode)
    tags += Tag(TPhotometric, 3, 1, 1) // BlackIsZero
    tags += Tag(TStripOffsets, 4, 1, -1) // patched below
    tags += Tag(TSamplesPerPixel, 3, 1, spp)
    tags += Tag(TRowsPerStripTag, 3, 1, r.height)
    tags += Tag(TStripByteCounts, 4, 1, strip.length)
    if (spp > 1)
      tags += Tag(TPlanarConfig, 3, 1, 1) // chunky
    if (pred != 1)
      tags += Tag(TPredictor, 3, 1, pred)
    if (spp > 1)
      // bands beyond the photometric's one gray sample must be
      // declared (TIFF 6.0): 0 = unspecified data
      tags += shortTag(TExtraSamples, Seq.fill(spp - 1)(0))
    tags += shortTag(TSampleFormat, Seq.fill(spp)(r.sampleType.fmt))
    tags += Tag(TPixelScale, 12, 3,
      ext = doubles(Seq(r.pixelScale, r.pixelScaleY, 0.0)))
    tags += Tag(TTiepoint, 12, 6,
      ext = doubles(Seq(0.0, 0.0, 0.0, r.originX, r.originY, 0.0)))
    tags += Tag(TGeoKeys, 3, geoKeys.length, ext = shorts(geoKeys.map(_.toInt)))
    if (geoDbls.nonEmpty)
      tags += Tag(TGeoDoubles, 12, geoDbls.length, ext = doubles(geoDbls.toSeq))
    val entries = tags.result()

    val ifdSize = 2 + entries.length * 12 + 4
    var extOff = 8 + ifdSize
    val extOffsets = entries.map { t =>
      val o = extOff
      if (t.ext != null) extOff += t.ext.length
      o
    }
    val stripOff = extOff

    val out = ByteBuffer.allocate(stripOff + strip.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(0, 'I'.toByte).put(1, 'I'.toByte)
    out.putShort(2, 42.toShort)
    out.putInt(4, 8) // first IFD offset
    out.position(8)
    out.putShort(entries.length.toShort)
    entries.zip(extOffsets).foreach { case (t, eo) =>
      out.putShort(t.tag.toShort).putShort(t.typ.toShort).putInt(t.count)
      val v =
        if (t.ext != null) eo.toLong
        else if (t.tag == TStripOffsets) stripOff.toLong
        else t.inline
      out.putInt((v & 0xffffffffL).toInt)
    }
    out.putInt(0) // next IFD
    entries.zip(extOffsets).foreach { case (t, eo) =>
      if (t.ext != null) { out.position(eo); out.put(t.ext) }
    }
    out.position(stripOff)
    out.put(strip)
    java.nio.file.Files.write(path, out.array())
  }

  /** Compress one raw block with the strip codec. */
  private def compress(raw: Array[Byte], compCode: Int): Array[Byte] =
    compCode match {
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

  /** Factor-2 AVERAGE downsample (the reference's default overview
    * resampling, `COGCreationOptions.resampling`): each target pixel
    * is the mean of its ≤2×2 source block — rounded for integer
    * sample types, exact for floats. */
  private def halveBands(w: Int, h: Int, bands: Seq[Array[Double]],
                         float: Boolean): (Int, Int, Seq[Array[Double]]) = {
    val w2 = (w + 1) / 2
    val h2 = (h + 1) / 2
    val out = bands.map { px =>
      val o = new Array[Double](w2 * h2)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          var sum = 0.0
          var cnt = 0
          var dy = 0
          while (dy < 2 && 2 * y + dy < h) {
            var dx = 0
            while (dx < 2 && 2 * x + dx < w) {
              sum += px((2 * y + dy) * w + 2 * x + dx)
              cnt += 1
              dx += 1
            }
            dy += 1
          }
          val mean = sum / cnt
          o(y * w2 + x) = if (float) mean else math.round(mean).toDouble
          x += 1
        }
        y += 1
      }
      o
    }
    (w2, h2, out)
  }

  /** Cloud-optimized GeoTIFF: tiled base image (TileWidth/TileLength/
    * TileOffsets/TileByteCounts) plus a factor-2 average-resampled
    * overview pyramid chained as reduced-resolution IFDs
    * (NewSubfileType = 1), laid out COG-style — header and every IFD
    * at the front, overview tile data before base tile data, so a
    * range reader gets the whole low-resolution pyramid in one seek.
    * The Spark-side at-rest format stays Parquet-of-arrays (partition
    * pruning + columnar band pruning are the scale story); this is
    * the I/O interchange artifact the reference builds with
    * `gdal_translate -of COG` (`app/tasks/cog_assets.py:26-117`). */
  def writeCog(path: java.nio.file.Path, tile: Tile, blockSize: Int = 512,
               compression: String = "deflate"): Unit =
    writeCogRaster(path, rasterOf(tile), blockSize, compression)

  def writeCogRaster(path: java.nio.file.Path, r: Raster, blockSize: Int = 512,
                     compression: String = "deflate"): Unit = {
    require(blockSize > 0 && blockSize % 16 == 0,
      s"TIFF tile dimensions must be multiples of 16 (got $blockSize)")
    val compCode = compCodeOf(compression)
    val spp = r.bands.length
    val pred = predictorFor(compCode, r.sampleType)
    // overview pyramid: halve until the level fits one block
    val levels = {
      val out = scala.collection.mutable.ArrayBuffer(
        (r.width, r.height, r.bands))
      while (math.max(out.last._1, out.last._2) > blockSize) {
        val (w, h, bs) = out.last
        out += halveBands(w, h, bs, r.sampleType.isFloat)
      }
      out.toSeq
    }
    // compress every level's blocks (row-major, edge blocks padded,
    // chunky interleave within each block)
    val packed: Seq[(Int, Int, Seq[Array[Byte]])] = levels.map { case (w, h, bs) =>
      val across = (w + blockSize - 1) / blockSize
      val ndown = (h + blockSize - 1) / blockSize
      val blocks = (0 until across * ndown).map { t =>
        encodeBlock(blockOf(bs, w, h, (t % across) * blockSize,
          (t / across) * blockSize, blockSize), blockSize,
          r.sampleType, pred, compCode)
      }
      (w, h, blocks)
    }
    assembleCog(path,
      packed.map { case (w, h, blks) =>
        CogLevelMeta(w, h, blks.map(_.length).toArray) },
      blockSize, spp, r.sampleType, pred, compCode,
      r.originX, r.originY, r.pixelScale, r.pixelScaleY, r.epsg,
      l => packed(l)._3.iterator, geoParams = r.geoParams)
  }

  /** Predictor choice for a compressed COG block (GDAL's default):
    * 2 on integer samples, the byte-split 3 on float, none when
    * uncompressed. */
  private[raster] def predictorFor(compCode: Int, t: SampleType): Int =
    if (compCode == 1) 1 else if (t.isFloat) 3 else 2

  private[raster] def compressionCode(compression: String): Int =
    compCodeOf(compression)

  /** The zero-padded blockSize² per-band samples of the block whose
    * top-left is (x0, y0) in a w×h image. */
  private[raster] def blockOf(bs: Seq[Array[Double]], w: Int, h: Int,
                              x0: Int, y0: Int,
                              blockSize: Int): Seq[Array[Double]] =
    bs.map { px =>
      val o = new Array[Double](blockSize * blockSize)
      var row = 0
      while (row < blockSize && y0 + row < h) {
        var col = 0
        while (col < blockSize && x0 + col < w) {
          o(row * blockSize + col) = px((y0 + row) * w + x0 + col)
          col += 1
        }
        row += 1
      }
      o
    }

  /** Encode one already-padded block: chunky interleave, predictor,
    * compress. The unit the in-memory writer and the distributed
    * [[Cog]] builder share — byte parity between the two paths
    * reduces to feeding equal sample arrays. */
  private[raster] def encodeBlock(bandsBlk: Seq[Array[Double]],
                                  blockSize: Int, sampleType: SampleType,
                                  pred: Int, compCode: Int): Array[Byte] = {
    val spp = bandsBlk.length
    val bps = sampleType.bits / 8
    val raw = ByteBuffer.allocate(blockSize * blockSize * spp * bps)
      .order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < blockSize * blockSize) {
      var c = 0
      while (c < spp) {
        putSample(raw, (i * spp + c) * bps, sampleType, bandsBlk(c)(i))
        c += 1
      }
      i += 1
    }
    val bytes = raw.array()
    if (pred == 2) predict2(bytes, blockSize, blockSize, spp, bps)
    else if (pred == 3) predict3(bytes, blockSize, blockSize, spp, bps)
    compress(bytes, compCode)
  }

  /** Block-local factor-2 average downsample of the unpadded bw×bh
    * region of a padded block (stride blockSize). Exactly the global
    * [[halveBands]] restricted to the block: blockSize is even, so
    * 2×2 source groups never span a block edge, and the ≤-edge
    * partial-group averaging is identical. */
  private[raster] def halveBlock(blk: Array[Double], blockSize: Int,
                                 bw: Int, bh: Int,
                                 float: Boolean): Array[Double] = {
    val hw = (bw + 1) / 2
    val hh = (bh + 1) / 2
    val o = new Array[Double](hw * hh)
    var y = 0
    while (y < hh) {
      var x = 0
      while (x < hw) {
        var sum = 0.0
        var cnt = 0
        var dy = 0
        while (dy < 2 && 2 * y + dy < bh) {
          var dx = 0
          while (dx < 2 && 2 * x + dx < bw) {
            sum += blk((2 * y + dy) * blockSize + 2 * x + dx)
            cnt += 1
            dx += 1
          }
          dy += 1
        }
        val mean = sum / cnt
        o(y * hw + x) = if (float) mean else math.round(mean).toDouble
        x += 1
      }
      y += 1
    }
    o
  }

  private[raster] final case class CogLevelMeta(w: Int, h: Int,
                                                byteCounts: Array[Int])

  /** Lay out and write a COG: header and every IFD at the front,
    * overview tile data before base tile data (deepest level first).
    * `data(l)` must yield level l's compressed blocks in row-major
    * order; only one block is held in memory at a time, so callers
    * may stream them straight out of a distributed computation. */
  private[raster] def assembleCog(path: java.nio.file.Path,
      meta: Seq[CogLevelMeta], blockSize: Int, spp: Int,
      sampleType: SampleType, pred: Int, compCode: Int,
      originX: Double, originY: Double,
      pixelScale: Double, pixelScaleY: Double, epsg: Int,
      data: Int => Iterator[Array[Byte]],
      geoParams: Map[Int, Double] = Map.empty): Unit = {
    val (geoKeys, geoDbls) =
      if (geoParams.nonEmpty) geoKeysWithParams(epsg, geoParams)
      else (geoKeysFor(epsg), Array.empty[Double])
    // per-level IFD tags (ascending): multi-band levels add
    // PlanarConfig + ExtraSamples, like the strip writer
    def levelTags(l: Int, lv: CogLevelMeta): Seq[Tag] = {
      val tags = Seq.newBuilder[Tag]
      tags += Tag(TSubfileType, 4, 1, if (l == 0) 0 else 1)
      tags += Tag(TWidth, 3, 1, lv.w)
      tags += Tag(TLength, 3, 1, lv.h)
      tags += shortTag(TBits, Seq.fill(spp)(sampleType.bits))
      tags += Tag(TCompression, 3, 1, compCode)
      tags += Tag(TPhotometric, 3, 1, 1)
      tags += Tag(TSamplesPerPixel, 3, 1, spp)
      if (spp > 1) tags += Tag(TPlanarConfig, 3, 1, 1)
      if (pred != 1) tags += Tag(TPredictor, 3, 1, pred)
      tags += Tag(TTileWidth, 3, 1, blockSize)
      tags += Tag(TTileLength, 3, 1, blockSize)
      // TileOffsets/ByteCounts: placeholders — patched during write
      if (lv.byteCounts.length == 1) {
        tags += Tag(TTileOffsets, 4, 1, -1)
        tags += Tag(TTileByteCounts, 4, 1, lv.byteCounts.head)
      } else {
        tags += Tag(TTileOffsets, 4, lv.byteCounts.length,
          ext = new Array[Byte](4 * lv.byteCounts.length))
        tags += Tag(TTileByteCounts, 4, lv.byteCounts.length, ext = {
          val b = ByteBuffer.allocate(4 * lv.byteCounts.length)
            .order(ByteOrder.LITTLE_ENDIAN)
          lv.byteCounts.foreach(b.putInt)
          b.array()
        })
      }
      if (spp > 1) tags += shortTag(TExtraSamples, Seq.fill(spp - 1)(0))
      tags += shortTag(TSampleFormat, Seq.fill(spp)(sampleType.fmt))
      if (l == 0) {
        tags += Tag(TPixelScale, 12, 3,
          ext = doubles(Seq(pixelScale, pixelScaleY, 0.0)))
        tags += Tag(TTiepoint, 12, 6,
          ext = doubles(Seq(0.0, 0.0, 0.0, originX, originY, 0.0)))
        tags += Tag(TGeoKeys, 3, geoKeys.length,
          ext = shorts(geoKeys.map(_.toInt)))
        if (geoDbls.nonEmpty)
          tags += Tag(TGeoDoubles, 12, geoDbls.length,
            ext = doubles(geoDbls.toSeq))
      }
      tags.result()
    }
    val allTags: Seq[Seq[Tag]] = meta.zipWithIndex.map {
      case (lv, l) => levelTags(l, lv)
    }

    // layout: header, IFDs, external arrays (per level, in tag
    // order), tile data (overviews deepest-first, base last)
    val ifdSizes = allTags.map(ts => 2 + ts.length * 12 + 4)
    val ifdOffs = ifdSizes.scanLeft(8)(_ + _).dropRight(1)
    var extOff = 8 + ifdSizes.sum
    val extOffs: Seq[Seq[Int]] = allTags.map(_.map { t =>
      val o = extOff
      if (t.ext != null) extOff += t.ext.length
      o
    })
    val headerEnd = extOff
    var dataOff = headerEnd.toLong
    val dataOffsets: Seq[Array[Long]] = {
      val perLevel = Array.fill(meta.length)(Array.empty[Long])
      for (l <- meta.indices.reverse) {
        perLevel(l) = meta(l).byteCounts.map { n =>
          val o = dataOff; dataOff += n; o
        }
      }
      perLevel.toSeq
    }
    require(dataOff <= 0xffffffffL,
      s"COG needs $dataOff bytes — past the classic-TIFF 32-bit offset" +
        " limit; shrink the extent or split the export")

    val head = ByteBuffer.allocate(headerEnd).order(ByteOrder.LITTLE_ENDIAN)
    head.put(0, 'I'.toByte).put(1, 'I'.toByte)
    head.putShort(2, 42.toShort)
    head.putInt(4, 8)
    meta.indices.foreach { l =>
      head.position(ifdOffs(l))
      head.putShort(allTags(l).length.toShort)
      allTags(l).zip(extOffs(l)).foreach { case (t, eo) =>
        head.putShort(t.tag.toShort).putShort(t.typ.toShort).putInt(t.count)
        val v =
          if (t.tag == TTileOffsets && t.ext == null) dataOffsets(l).head
          else if (t.ext != null) eo.toLong
          else t.inline
        head.putInt((v & 0xffffffffL).toInt)
      }
      head.putInt(if (l + 1 < meta.length) ifdOffs(l + 1) else 0)
      // external arrays (the TileOffsets array is filled from the
      // data layout, everything else was materialized up front)
      allTags(l).zip(extOffs(l)).foreach { case (t, eo) =>
        if (t.ext != null) {
          head.position(eo)
          if (t.tag == TTileOffsets)
            dataOffsets(l).foreach(o => head.putInt((o & 0xffffffffL).toInt))
          else head.put(t.ext)
        }
      }
    }
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(path))
    try {
      out.write(head.array())
      // tile data, deepest overview first — the dataOffsets order
      for (l <- meta.indices.reverse) {
        val it = data(l)
        var i = 0
        while (it.hasNext) {
          val blk = it.next()
          require(i < meta(l).byteCounts.length &&
            blk.length == meta(l).byteCounts(i),
            s"level $l block $i: ${blk.length} bytes, expected " +
              s"${if (i < meta(l).byteCounts.length) meta(l).byteCounts(i) else -1}")
          out.write(blk)
          i += 1
        }
        require(i == meta(l).byteCounts.length,
          s"level $l: $i blocks streamed, expected ${meta(l).byteCounts.length}")
      }
    } finally out.close()
  }

  /** The base (first-IFD) image only, as a legacy single-band integer
    * [[Tile]]; float files must go through [[readRaster]]. */
  def read(bytes: Array[Byte]): Tile = tileOf(readRaster(bytes))

  /** The base (first-IFD) image only — the ingest path's form; the
    * overview pyramid of a COG is skipped, not decoded. */
  def readRaster(bytes: Array[Byte]): Raster = {
    val (b, order) = header(bytes)
    parseIfd(bytes, b, order, b.getInt(4))._1
  }

  private def header(bytes: Array[Byte]): (ByteBuffer, ByteOrder) = {
    val order = (bytes(0) & 0xff, bytes(1) & 0xff) match {
      case (0x49, 0x49) => ByteOrder.LITTLE_ENDIAN // "II"
      case (0x4d, 0x4d) => ByteOrder.BIG_ENDIAN    // "MM"
      case _ => throw new IllegalArgumentException("not a TIFF")
    }
    val b = ByteBuffer.wrap(bytes).order(order)
    require(b.getShort(2) == 42, "bad TIFF magic")
    (b, order)
  }

  /** Every image in the IFD chain — the base image first, then any
    * reduced-resolution overviews ([[writeCog]]'s layout, or any
    * conforming multi-IFD TIFF). */
  def readLevels(bytes: Array[Byte]): Seq[Tile] =
    readRasterLevels(bytes).map(tileOf)

  def readRasterLevels(bytes: Array[Byte]): Seq[Raster] = {
    val (b, order) = header(bytes)
    var ifd = b.getInt(4)
    val seen = scala.collection.mutable.Set.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[Raster]
    while (ifd != 0) {
      // a next-IFD pointer revisiting an offset is a corrupt (or
      // crafted) file — the old single-IFD reader always terminated,
      // and the chain walk must too
      require(seen.add(ifd), s"cyclic IFD chain at offset $ifd")
      require(out.length < 64, "IFD chain exceeds 64 images")
      val (r, next) = parseIfd(bytes, b, order, ifd)
      out += r
      ifd = next
    }
    out.toSeq
  }

  /** One IFD → its image + the next-IFD offset (0 = end of chain).
    * Handles both stripped and tiled ([[writeCog]]) layouts. */
  private def parseIfd(bytes: Array[Byte], b: ByteBuffer, order: ByteOrder,
                       ifd: Int): (Raster, Int) = {
    val n = b.getShort(ifd) & 0xffff
    var width = 0
    var height = 0
    var compression = 1
    var predictor = 1
    var bits = Seq(32L)
    var fmts = Seq(1L) // TIFF default: unsigned
    var spp = 1
    var planar = 1
    var stripOffsets = Seq.empty[Long]
    var stripCounts = Seq.empty[Long]
    var rowsPerStrip = 0
    var tileW = 0
    var tileH = 0
    var tileOffsets = Seq.empty[Long]
    var tileCounts = Seq.empty[Long]
    var geoKeyVals = Seq.empty[Long]
    var geoDblVals = Seq.empty[Long]
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
        case TBits => bits = values(off)._3
        case TCompression => compression = values(off)._3.head.toInt
        case TPredictor => predictor = values(off)._3.head.toInt
        case TSamplesPerPixel => spp = values(off)._3.head.toInt
        case TPlanarConfig => planar = values(off)._3.head.toInt
        case TSampleFormat => fmts = values(off)._3
        case TStripOffsets => stripOffsets = values(off)._3
        case TStripByteCounts => stripCounts = values(off)._3
        case TRowsPerStripTag => rowsPerStrip = values(off)._3.head.toInt
        case TTileWidth => tileW = values(off)._3.head.toInt
        case TTileLength => tileH = values(off)._3.head.toInt
        case TTileOffsets => tileOffsets = values(off)._3
        case TTileByteCounts => tileCounts = values(off)._3
        case TGeoKeys => geoKeyVals = values(off)._3
        case TGeoDoubles => geoDblVals = values(off)._3
        case TPixelScale => scaleOff = b.getInt(off + 8)
        case TTiepoint => tieOff = b.getInt(off + 8)
        case _ => // skip
      }
      i += 1
    }
    require(width > 0 && height > 0, "missing dimensions")
    require(spp >= 1 && spp <= 64, s"unsupported SamplesPerPixel $spp")
    require(planar == 1,
      s"unsupported PlanarConfiguration $planar (chunky only)")
    require(bits.distinct.length == 1 && fmts.distinct.length == 1,
      "bands must share one sample layout")
    val sampleType = SampleType.of(bits.head.toInt, fmts.head.toInt)
    val bps = sampleType.bits / 8
    require(predictor == 1 || (predictor == 2 && !sampleType.isFloat) ||
      (predictor == 3 && sampleType.isFloat),
      s"unsupported Predictor $predictor for ${sampleType.name}")

    def decompress(data: Array[Byte], expected: Int): Array[Byte] = {
      val raw = compression match {
        case 1 => data
        case 5 => lzwDecode(data, expected)
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
      require(raw.length == expected,
        s"block decodes to ${raw.length} B, expected $expected")
      raw
    }
    // floating-point predictor (3): each row stores its samples'
    // bytes split into planes (MSB plane first, regardless of the
    // file's byte order) with byte-wise horizontal differencing at
    // sample stride — undo the differencing, then de-shuffle the
    // planes back into the FILE's byte order so the normal sample
    // decode applies (the libtiff fpAcc convention)
    def unpredictFloat(raw: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val bpsF = sampleType.bits / 8
      val rowBytes = w * spp * bpsF
      val wc = w * spp // samples per row
      val tmp = new Array[Byte](rowBytes)
      var row = 0
      while (row < h) {
        val base = row * rowBytes
        var i = spp
        while (i < rowBytes) {
          raw(base + i) = (raw(base + i) + raw(base + i - spp)).toByte
          i += 1
        }
        System.arraycopy(raw, base, tmp, 0, rowBytes)
        var s = 0
        while (s < wc) {
          var b = 0
          while (b < bpsF) {
            val plane = if (order == ByteOrder.BIG_ENDIAN) b else bpsF - 1 - b
            raw(base + s * bpsF + b) = tmp(plane * wc + s)
            b += 1
          }
          s += 1
        }
        row += 1
      }
      raw
    }

    // horizontal differencing (predictor 2): each integer sample
    // stores the delta to the same band's left neighbor — undo per
    // row, per band, at the sample width
    def unpredict(raw: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (predictor == 3) return unpredictFloat(raw, w, h)
      if (predictor == 2) {
        val pb = ByteBuffer.wrap(raw).order(order)
        val rowStride = w * spp
        var row = 0
        while (row < h) {
          var col = spp // first pixel of the row is stored verbatim
          while (col < rowStride) {
            val k = (row * rowStride + col) * bps
            bps match {
              case 1 => pb.put(k, (pb.get(k) + pb.get(k - spp)).toByte)
              case 2 => pb.putShort(k,
                (pb.getShort(k) + pb.getShort(k - 2 * spp)).toShort)
              case 4 => pb.putInt(k, pb.getInt(k) + pb.getInt(k - 4 * spp))
              case 8 => pb.putLong(k, pb.getLong(k) + pb.getLong(k - 8 * spp))
            }
            col += 1
          }
          row += 1
        }
      }
      raw
    }

    val bands = Seq.fill(spp)(new Array[Double](width * height))
    def scatter(raw: Array[Byte], blockW: Int, blockH: Int,
                x0: Int, y0: Int): Unit = {
      val rb = ByteBuffer.wrap(raw).order(order)
      var row = 0
      while (row < blockH && y0 + row < height) {
        var col = 0
        while (col < blockW && x0 + col < width) {
          var c = 0
          while (c < spp) {
            bands(c)((y0 + row) * width + x0 + col) =
              getSample(rb, ((row * blockW + col) * spp + c) * bps, sampleType)
            c += 1
          }
          col += 1
        }
        row += 1
      }
    }

    if (tileOffsets.nonEmpty) {
      // tiled layout: blocks are always tileW×tileH (edge blocks are
      // padded on disk and cropped here), row-major block order
      require(tileW > 0 && tileH > 0, "tiled IFD without tile dimensions")
      val across = (width + tileW - 1) / tileW
      tileOffsets.zip(tileCounts).zipWithIndex.foreach { case ((o, c), t) =>
        val raw = unpredict(decompress(
          java.util.Arrays.copyOfRange(bytes, o.toInt, (o + c).toInt),
          tileW * tileH * spp * bps), tileW, tileH)
        scatter(raw, tileW, tileH, (t % across) * tileW, (t / across) * tileH)
      }
    } else {
      // each strip is an INDEPENDENT compressed stream (TIFF 6.0 —
      // concatenating the compressed bytes only works for compression
      // 1); decode strip-by-strip against its own row count
      val rps = if (rowsPerStrip > 0) rowsPerStrip else height
      stripOffsets.zip(stripCounts).zipWithIndex.foreach { case ((o, c), s) =>
        val rows = math.min(rps, height - s * rps)
        val raw = unpredict(decompress(
          java.util.Arrays.copyOfRange(bytes, o.toInt, (o + c).toInt),
          rows * width * spp * bps), width, rows)
        scatter(raw, width, rows, 0, s * rps)
      }
    }
    val pixelScale =
      if (scaleOff >= 0) b.getDouble(scaleOff) else Double.NaN
    val pixelScaleY =
      if (scaleOff >= 0) b.getDouble(scaleOff + 8) else Double.NaN
    val (ox, oy) =
      if (tieOff >= 0) (b.getDouble(tieOff + 24), b.getDouble(tieOff + 32))
      else (Double.NaN, Double.NaN)
    // GeoKeyDirectory: groups of 4 shorts (key, location, count,
    // value) after the 4-short header; model type 2 = geographic
    // (key 2048 carries the EPSG), 1 = projected (key 3072)
    val groups = geoKeyVals.grouped(4).toSeq
    val epsg = {
      def key(id: Int): Option[Int] = groups.collectFirst {
        case Seq(k, 0, 1, v) if k == id => v.toInt
      }
      key(1024) match {
        // a projected file MUST carry its EPSG — defaulting here would
        // silently propagate "EPSG 0" into re-written GeoKeyDirectories
        // and downstream CRS branching (fail fast like the rest of the
        // reader)
        case Some(1) => key(3072).getOrElse(throw new IllegalArgumentException(
          "projected GeoKeyDirectory (GTModelType=1) missing ProjectedCSType (key 3072)"))
        case Some(2) => key(2048).getOrElse(4326)
        case _ => 4326 // no keys: assume the lake's geographic CRS
      }
    }
    // projection-parameter keys (user-defined CRSs, ProjectedCSType
    // 32767): SHORT-valued proj keys inline, DOUBLE-valued ones index
    // into GeoDoubleParams (values() surfaced them as raw bits).
    // 2057/2059 (GeogSemiMajorAxis/GeogInvFlattening) ride along so a
    // file on a non-WGS84 ellipsoid (Bessel for the Dutch RD grid)
    // carries its own figure to the projection constructors.
    def keyInRange(k: Long): Boolean =
      (k >= 3073 && k <= 3095) || k == 2057 || k == 2059
    val geoParams: Map[Int, Double] = groups.flatMap {
      case Seq(k, 0, 1, v) if keyInRange(k) =>
        Seq(k.toInt -> v.toDouble)
      case Seq(k, TGeoDoubles, 1, v)
          if keyInRange(k) && v < geoDblVals.length =>
        Seq(k.toInt -> java.lang.Double.longBitsToDouble(geoDblVals(v.toInt)))
      // GeogTOWGS84GeoKey: 3 or 7 doubles unpacked to synthetic keys
      // (see Towgs84Base) so the single-valued map plumbing carries
      // the datum shift to Warp.projectionFor
      case Seq(k, TGeoDoubles, n, v)
          if k == 2062 && (n == 3 || n == 7) && v + n <= geoDblVals.length =>
        (0 until n.toInt).map(i => (Towgs84Base + i) ->
          java.lang.Double.longBitsToDouble(geoDblVals(v.toInt + i)))
      case _ => Nil
    }.toMap
    val next = b.getInt(ifd + 2 + n * 12)
    (Raster(width, height, ox, oy, pixelScale, epsg, sampleType, bands,
      pixelScaleYOpt = pixelScaleY, geoParams = geoParams), next)
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
            // a conforming stream clears before 4094 entries (the
            // encoder's flush); past 4095 is corrupt, not just big
            require(nextCode < 4096, "LZW table overflow (corrupt stream)")
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
