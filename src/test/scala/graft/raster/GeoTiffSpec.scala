package graft.raster

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level checks of the pure-JVM GeoTIFF codec against the public
  * TIFF 6.0 / GeoTIFF layout. */
class GeoTiffSpec extends AnyFunSuite {

  private def tile(n: Int): GeoTiff.Tile = GeoTiff.Tile(
    width = n, height = n,
    originLon = 12.5, originLat = 47.25, pixelDeg = 0.01,
    pixels = Array.tabulate(n * n)(i => (i * 31 + 7) % 97 - 40))

  test("uncompressed round-trip with exact georeferencing") {
    val p = java.nio.file.Files.createTempFile("gt", ".tif")
    val t = tile(16)
    GeoTiff.write(p, t, deflate = false)
    val bytes = java.nio.file.Files.readAllBytes(p)
    // golden header: "II", magic 42, IFD at 8
    assert(bytes(0) == 'I'.toByte && bytes(1) == 'I'.toByte)
    assert((bytes(2) & 0xff) == 42 && bytes(3) == 0)
    assert((bytes(4) & 0xff) == 8)
    // 13 IFD entries
    assert((bytes(8) & 0xff) == 13)
    val back = GeoTiff.read(bytes)
    assert(back.width == 16 && back.height == 16)
    assert(back.originLon == 12.5 && back.originLat == 47.25 &&
      back.pixelDeg == 0.01)
    assert(back.pixels.toSeq == t.pixels.toSeq)
  }

  test("deflate round-trip (interoperable zlib stream)") {
    val p = java.nio.file.Files.createTempFile("gtz", ".tif")
    val t = tile(64)
    GeoTiff.write(p, t, deflate = true)
    val bytes = java.nio.file.Files.readAllBytes(p)
    val back = GeoTiff.read(bytes)
    assert(back.pixels.toSeq == t.pixels.toSeq)
    assert(back.originLon == 12.5 && back.pixelDeg == 0.01)
    // compressed file is actually smaller than raw for this content
    assert(bytes.length < 64 * 64 * 4)
    // the strip is a standard zlib stream: first byte 0x78
    // (CMF: deflate, 32K window) — what every zlib reader expects
    val stripOff = {
      // find StripOffsets (tag 273) in the IFD
      val n = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
      (0 until n).map(i => 10 + i * 12).collectFirst {
        case off if ((bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)) == 273 =>
          java.nio.ByteBuffer.wrap(bytes, off + 8, 4)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      }.get
    }
    assert((bytes(stripOff) & 0xff) == 0x78)
  }

  test("property: random tiles round-trip under all compressions") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genTile = for {
      n <- Gen.chooseNum(1, 40)
      seed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      comp <- Gen.oneOf("none", "deflate", "lzw")
    } yield {
      var s = seed
      def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L
        (s >>> 33).toInt }
      (GeoTiff.Tile(n, n, -5.25, 51.0, 0.25 / n,
        Array.fill(n * n)(next())), comp)
    }
    // forAllNoShrink: the default String shrinker explores comp = ""
    // (invalid by construction) and its IllegalArgumentException then
    // masks the real counterexample — shrinking a 2-element enum buys
    // nothing anyway
    val p = Prop.forAllNoShrink(genTile) { case (t, comp) =>
      val f = java.nio.file.Files.createTempFile("gtp", ".tif")
      GeoTiff.write(f, t, comp)
      val back = GeoTiff.read(java.nio.file.Files.readAllBytes(f))
      java.nio.file.Files.delete(f)
      back.width == t.width && back.pixels.toSeq == t.pixels.toSeq &&
        back.originLon == t.originLon && back.pixelDeg == t.pixelDeg
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  test("LZW: compressible + pathological + table-overflow streams") {
    // highly repetitive data (long LZW matches, KwKwK cases)
    val rep = GeoTiff.Tile(32, 32, 0.0, 0.0, 0.5,
      Array.tabulate(1024)(i => i % 3))
    val p1 = java.nio.file.Files.createTempFile("lzw1", ".tif")
    GeoTiff.write(p1, rep, "lzw")
    val b1 = java.nio.file.Files.readAllBytes(p1)
    assert(GeoTiff.read(b1).pixels.toSeq == rep.pixels.toSeq)
    assert(b1.length < 1024 * 4) // actually compressed
    // constant run: the classic KwKwK ladder
    val const = GeoTiff.Tile(16, 16, 0.0, 0.0, 0.5, Array.fill(256)(-1))
    val p2 = java.nio.file.Files.createTempFile("lzw2", ".tif")
    GeoTiff.write(p2, const, "lzw")
    assert(GeoTiff.read(java.nio.file.Files.readAllBytes(p2))
      .pixels.toSeq == const.pixels.toSeq)
    // 128×128 random ints = 65,536 bytes: the string table overflows
    // 4094 entries mid-stream, forcing the flush + Clear + rebuild path
    var s = 42L
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toInt }
    val big = GeoTiff.Tile(128, 128, 0.0, 0.0, 0.5,
      Array.fill(128 * 128)(next()))
    val p3 = java.nio.file.Files.createTempFile("lzw3", ".tif")
    GeoTiff.write(p3, big, "lzw")
    assert(GeoTiff.read(java.nio.file.Files.readAllBytes(p3))
      .pixels.toSeq == big.pixels.toSeq)
  }

  test("reader undoes the horizontal-differencing predictor (tag 317)") {
    // write uncompressed, then hand-convert the strip to deltas and
    // add Predictor=2 the way a GDAL writer would
    val t = tile(8)
    val p = java.nio.file.Files.createTempFile("gtpred", ".tif")
    GeoTiff.write(p, t, deflate = false)
    val bytes = java.nio.file.Files.readAllBytes(p)
    val n = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    val stripOff = (0 until n).map(i => 10 + i * 12).collectFirst {
      case off if ((bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)) == 273 =>
        java.nio.ByteBuffer.wrap(bytes, off + 8, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    }.get
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    for (row <- 0 until 8; col <- (1 until 8).reverse) {
      val k = stripOff + (row * 8 + col) * 4
      bb.putInt(k, bb.getInt(k) - bb.getInt(k - 4))
    }
    // rewrite the SampleFormat entry (tag 339, last before the
    // externals) as Predictor — tag order stays ascending (317 < 339
    // slot reuse keeps the fixture small and the reader tag-driven)
    val predOff = (0 until n).map(i => 10 + i * 12).find { o =>
      ((bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)) == 339
    }.get
    bb.putShort(predOff, 317.toShort)
    bb.putShort(predOff + 2, 3.toShort)
    bb.putInt(predOff + 4, 1)
    bb.putInt(predOff + 8, 2)
    val back = GeoTiff.read(bytes)
    assert(back.pixels.toSeq == t.pixels.toSeq)
  }

  test("COG: tiled pyramid round-trips, overviews average, layout is cloud-optimized") {
    val w = 100; val h = 80
    val t = GeoTiff.Tile(w, h, -3.5, 48.0, 0.01,
      Array.tabulate(w * h)(i => (i % w) * 100 + i / w)) // px = x*100 + y
    val p = java.nio.file.Files.createTempFile("cog", ".tif")
    GeoTiff.writeCog(p, t, blockSize = 16, compression = "deflate")
    val bytes = java.nio.file.Files.readAllBytes(p)
    val levels = GeoTiff.readLevels(bytes)
    // pyramid: 100×80 → 50×40 → 25×20 → 13×10 (≤ one 16px block)
    assert(levels.map(l => (l.width, l.height)) ==
      Seq((100, 80), (50, 40), (25, 20), (13, 10)))
    // base image + georeferencing exact
    assert(levels.head.pixels.toSeq == t.pixels.toSeq)
    assert(levels.head.originLon == -3.5 && levels.head.originLat == 48.0 &&
      levels.head.pixelDeg == 0.01)
    // overview pixel (x,y) = rounded mean of the 2×2 source block:
    // value form x*100+y → mean = (2x+0.5)*100/2... check directly
    val l1 = levels(1)
    for ((x, y) <- Seq((0, 0), (7, 3), (24, 19))) {
      val srcs = for {
        dy <- 0 to 1; dx <- 0 to 1
        if 2 * x + dx < w && 2 * y + dy < h
      } yield t.pixels((2 * y + dy) * w + 2 * x + dx).toLong
      val expect = math.round(srcs.sum.toDouble / srcs.length).toInt
      assert(l1.pixels(y * l1.width + x) == expect, s"overview px ($x,$y)")
    }
    // interior tiles are identical across the pyramid edge rule
    val l3 = levels(3)
    assert(l3.width == 13 && l3.height == 10)
    // COG layout: every IFD sits in the file head, before all tile
    // data; the deepest overview's data precedes the base image's
    def ifdOffsets(b: Array[Byte]): Seq[Int] = {
      var off = java.nio.ByteBuffer.wrap(b, 4, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (off != 0) {
        out += off
        val n = java.nio.ByteBuffer.wrap(b, off, 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort & 0xffff
        off = java.nio.ByteBuffer.wrap(b, off + 2 + n * 12, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      }
      out.toSeq
    }
    val ifds = ifdOffsets(bytes)
    assert(ifds.length == 4 && ifds == ifds.sorted && ifds.last < 2048,
      s"IFDs not at the head: $ifds")
    // lzw + none variants round-trip the base too
    for (comp <- Seq("none", "lzw")) {
      val q = java.nio.file.Files.createTempFile(s"cog$comp", ".tif")
      GeoTiff.writeCog(q, t, blockSize = 32, compression = comp)
      val back = GeoTiff.readLevels(java.nio.file.Files.readAllBytes(q))
      assert(back.head.pixels.toSeq == t.pixels.toSeq, comp)
      assert(back.length == 3, s"$comp levels ${back.length}") // 100→50→25
    }
    // block size must be a multiple of 16 (TIFF 6.0 tiling rule)
    intercept[IllegalArgumentException](GeoTiff.writeCog(
      java.nio.file.Files.createTempFile("cogbad", ".tif"), t, blockSize = 20))
  }

  test("multi-strip deflate: each strip is an independent zlib stream") {
    // hand-built 4×4 int32 image in two 2-row strips, each deflated
    // separately (what external writers produce; concatenating the
    // compressed bytes would feed Inflater a trailing garbage stream)
    import java.nio.{ByteBuffer, ByteOrder}
    val px = Array.tabulate(16)(i => i * 7 - 11)
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val strips = Seq(0, 1).map { s =>
      val raw = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
      (0 until 8).foreach(i => raw.putInt(px(s * 8 + i)))
      deflate(raw.array())
    }
    val entries = 10
    val ifdSize = 2 + entries * 12 + 4
    val offArr = 8 + ifdSize        // stripOffsets ext array (2×4 B)
    val cntArr = offArr + 8         // stripByteCounts ext array
    val data0 = cntArr + 8
    val data1 = data0 + strips(0).length
    val total = data1 + strips(1).length
    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0, 'I'.toByte).put(1, 'I'.toByte)
    b.putShort(2, 42.toShort)
    b.putInt(4, 8)
    b.position(8)
    b.putShort(entries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      b.putShort(tag.toShort).putShort(typ.toShort).putInt(count).putInt(value)
    }
    entry(256, 3, 1, 4)   // width
    entry(257, 3, 1, 4)   // height
    entry(258, 3, 1, 32)  // bits
    entry(259, 3, 1, 8)   // deflate
    entry(262, 3, 1, 1)   // photometric
    entry(273, 4, 2, offArr) // strip offsets (external)
    entry(277, 3, 1, 1)   // samples
    entry(278, 3, 1, 2)   // rows per strip
    entry(279, 4, 2, cntArr) // strip byte counts (external)
    entry(339, 3, 1, 2)   // signed int
    b.putInt(0)
    b.position(offArr); b.putInt(data0).putInt(data1)
    b.position(cntArr); b.putInt(strips(0).length).putInt(strips(1).length)
    b.position(data0); b.put(strips(0))
    b.position(data1); b.put(strips(1))
    val back = GeoTiff.read(b.array())
    assert(back.width == 4 && back.height == 4)
    assert(back.pixels.toSeq == px.toSeq)
  }

  test("corrupt LZW streams fail cleanly, never out-of-bounds") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // wrap random bytes as the strip of an otherwise-valid LZW tile:
    // decode must either produce a wrong-length error or a targeted
    // require failure — no AIOOBE/NegativeArraySize/stack overflow
    val t = tile(8)
    val p = java.nio.file.Files.createTempFile("gtfz", ".tif")
    GeoTiff.write(p, t, "lzw")
    val good = java.nio.file.Files.readAllBytes(p)
    val n = (good(8) & 0xff) | ((good(9) & 0xff) << 8)
    def tagOff(tag: Int) = (0 until n).map(i => 10 + i * 12).find { o =>
      ((good(o) & 0xff) | ((good(o + 1) & 0xff) << 8)) == tag
    }.get
    val stripOff = java.nio.ByteBuffer.wrap(good, tagOff(273) + 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val gen = for {
      seed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield seed
    val prop = Prop.forAll(gen) { seed =>
      val bytes = good.clone()
      var s = seed
      var i = stripOff
      while (i < bytes.length) {
        s = s * 6364136223846793005L + 1442695040888963407L
        bytes(i) = (s >>> 56).toByte
        i += 1
      }
      try { GeoTiff.read(bytes); true }
      catch { case _: IllegalArgumentException => true }
      // any other throwable fails the property
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("big-endian (MM) files are honored") {
    // hand-built 2×2 uncompressed big-endian image — what a
    // Motorola-order writer produces; every multi-byte field flips
    import java.nio.{ByteBuffer, ByteOrder}
    val px = Array(7, -3, 100000, -100000)
    val entries = 8
    val ifdSize = 2 + entries * 12 + 4
    val dataOff = 8 + ifdSize
    val b = ByteBuffer.allocate(dataOff + 16).order(ByteOrder.BIG_ENDIAN)
    b.put(0, 'M'.toByte).put(1, 'M'.toByte)
    b.putShort(2, 42.toShort)
    b.putInt(4, 8)
    b.position(8)
    b.putShort(entries.toShort)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      b.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      // SHORT values sit in the HIGH half of the big-endian value slot
      if (typ == 3) { b.putShort(value.toShort); b.putShort(0.toShort) }
      else b.putInt(value)
    }
    entry(256, 3, 1, 2)   // width
    entry(257, 3, 1, 2)   // height
    entry(258, 3, 1, 32)  // bits
    entry(259, 3, 1, 1)   // uncompressed
    entry(262, 3, 1, 1)   // photometric
    entry(273, 4, 1, dataOff)
    entry(279, 4, 1, 16)
    entry(339, 3, 1, 2)
    b.putInt(0)
    b.position(dataOff)
    px.foreach(b.putInt)
    val back = GeoTiff.read(b.array())
    assert(back.width == 2 && back.height == 2)
    assert(back.pixels.toSeq == px.toSeq)
  }

  test("multi-band rasters round-trip in every sample type × compression") {
    import GeoTiff.{Raster, SampleType}
    def domain(t: SampleType, v: Long): Double = t match {
      case SampleType.UInt8 => (v & 0xff).toDouble
      case SampleType.Int8 => (v & 0xff).toByte.toDouble
      case SampleType.UInt16 => (v & 0xffff).toDouble
      case SampleType.Int16 => (v & 0xffff).toShort.toDouble
      case SampleType.UInt32 => (v & 0xffffffffL).toDouble
      case SampleType.Int32 => v.toInt.toDouble
      case SampleType.Float32 => java.lang.Float.intBitsToFloat(
        (v.toInt & 0x7fffff) | 0x3f800000).toDouble // finite mantissas
      case SampleType.Float64 => (v % 100000).toDouble / 7.0
    }
    for (t <- SampleType.all; comp <- Seq("none", "deflate", "lzw")) {
      var s = t.bits * 1315423911L + comp.hashCode
      def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L
        s >>> 13 }
      val bands = Seq.tabulate(3)(b =>
        Array.fill(12 * 9)(domain(t, next() + b)))
      val r = Raster(12, 9, -61.5, 4.25, 0.125, 4326, t, bands)
      val p = java.nio.file.Files.createTempFile(s"mb_${t.name}", ".tif")
      GeoTiff.writeRaster(p, r, comp)
      val back = GeoTiff.readRaster(java.nio.file.Files.readAllBytes(p))
      java.nio.file.Files.delete(p)
      assert(back.sampleType == t, s"$t/$comp")
      assert(back.bands.length == 3, s"$t/$comp")
      assert(back.epsg == 4326 && back.originX == -61.5 &&
        back.originY == 4.25 && back.pixelScale == 0.125, s"$t/$comp")
      for (b <- 0 until 3)
        assert(back.bands(b).toSeq == bands(b).toSeq, s"$t/$comp band $b")
    }
  }

  test("projected CRS (EPSG:3857) writes and reads GTModelType=1 + ProjectedCSType") {
    import GeoTiff.{Raster, SampleType}
    // a web-mercator tile: origin/scale in meters
    val r = Raster(8, 8, -8237642.0, 4970241.0, 152.87, 3857,
      SampleType.Int16, Seq(Array.tabulate(64)(i => (i * 13 - 400).toDouble)))
    val p = java.nio.file.Files.createTempFile("merc", ".tif")
    GeoTiff.writeRaster(p, r, "deflate")
    val back = GeoTiff.readRaster(java.nio.file.Files.readAllBytes(p))
    assert(back.epsg == 3857)
    assert(back.originX == -8237642.0 && back.pixelScale == 152.87)
    assert(back.bands.head.toSeq == r.bands.head.toSeq)
    // the geokey directory carries GTModelTypeGeoKey = 1 (projected)
    val bytes = java.nio.file.Files.readAllBytes(p)
    val n = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    val geoOff = (0 until n).map(i => 10 + i * 12).collectFirst {
      case off if ((bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)) == 34735 =>
        java.nio.ByteBuffer.wrap(bytes, off + 8, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    }.get
    val keys = (0 until 16).map(i =>
      java.nio.ByteBuffer.wrap(bytes, geoOff + 2 * i, 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort.toInt)
    assert(keys.grouped(4).exists(_ == Seq(1024, 0, 1, 1)), keys.toString)
    assert(keys.grouped(4).exists(_ == Seq(3072, 0, 1, 3857)), keys.toString)
  }

  test("predictor 2 on multi-band 16-bit data undoes per band") {
    import GeoTiff.{Raster, SampleType}
    // write uncompressed 2-band uint16, hand-difference per band with
    // stride = samplesPerPixel, then declare Predictor=2 by rewriting
    // the SampleFormat slot (format falls back to the unsigned default)
    val w = 6; val h = 4
    val bands = Seq.tabulate(2)(b =>
      Array.tabulate(w * h)(i => ((i * 37 + b * 101) % 65536).toDouble))
    val r = Raster(w, h, 0.0, 0.0, 1.0, 4326, SampleType.UInt16, bands)
    val p = java.nio.file.Files.createTempFile("pred2", ".tif")
    GeoTiff.writeRaster(p, r, "none")
    val bytes = java.nio.file.Files.readAllBytes(p)
    val n = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    def tagOff(tag: Int) = (0 until n).map(i => 10 + i * 12).find { o =>
      ((bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)) == tag
    }.get
    val stripOff = java.nio.ByteBuffer.wrap(bytes, tagOff(273) + 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val spp = 2
    for (row <- 0 until h; col <- (spp until w * spp).reverse) {
      val k = stripOff + (row * w * spp + col) * 2
      bb.putShort(k, (bb.getShort(k) - bb.getShort(k - 2 * spp)).toShort)
    }
    val fmtOff = tagOff(339)
    bb.putShort(fmtOff, 317.toShort)
    bb.putShort(fmtOff + 2, 3.toShort)
    bb.putInt(fmtOff + 4, 1)
    bb.putInt(fmtOff + 8, 2)
    val back = GeoTiff.readRaster(bytes)
    assert(back.sampleType == SampleType.UInt16)
    for (b <- 0 until 2)
      assert(back.bands(b).toSeq == bands(b).toSeq, s"band $b")
  }

  test("predictor 3 (floating-point) decodes: plane shuffle + byte differencing") {
    import GeoTiff.{Raster, SampleType}
    val w = 6; val h = 3; val spp = 2
    val bands = Seq.tabulate(spp)(b =>
      Array.tabulate(w * h)(i => i * 0.37 + b * 11.5 - 3.25))
    val r = Raster(w, h, 2.0, 3.0, 0.5, 4326, SampleType.Float32, bands)
    val p = java.nio.file.Files.createTempFile("pred3", ".tif")
    GeoTiff.writeRaster(p, r, "none")
    val bytes = java.nio.file.Files.readAllBytes(p)
    val n = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    def tagOff(tag: Int) = (0 until n).map(i => 10 + i * 12).find { o =>
      ((bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)) == tag
    }.get
    val stripOff = java.nio.ByteBuffer.wrap(bytes, tagOff(273) + 8, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    // hand-encode the strip the way libtiff's fp predictor does:
    // per row, split sample bytes into MSB-first planes, then
    // byte-difference at sample stride
    val bps = 4
    val wc = w * spp
    val rowBytes = wc * bps
    for (row <- 0 until h) {
      val base = stripOff + row * rowBytes
      val src = java.util.Arrays.copyOfRange(bytes, base, base + rowBytes)
      val planes = new Array[Byte](rowBytes)
      for (s <- 0 until wc; b <- 0 until bps) {
        val plane = bps - 1 - b // little-endian file: byte b is LSB-first
        planes(plane * wc + s) = src(s * bps + b)
      }
      for (i <- (spp until rowBytes).reverse)
        planes(i) = (planes(i) - planes(i - spp)).toByte
      System.arraycopy(planes, 0, bytes, base, rowBytes)
    }
    // declare Predictor=3 by rewriting the Photometric slot
    val phOff = tagOff(262)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putShort(phOff, 317.toShort)
    bb.putInt(phOff + 8, 3)
    val back = GeoTiff.readRaster(bytes)
    assert(back.sampleType == SampleType.Float32)
    for (b <- 0 until spp)
      assert(back.bands(b).map(_.toFloat).toSeq ==
        bands(b).map(_.toFloat).toSeq, s"band $b")
  }

  test("predictor-2 encode round-trips and shrinks smooth rasters") {
    import GeoTiff.{Raster, SampleType}
    // a smooth gradient: deltas are tiny and constant-ish, so
    // differencing + LZW compresses far better than raw LZW
    val w = 64; val h = 64
    val bands = Seq.tabulate(2)(b =>
      Array.tabulate(w * h)(i => (i % w) * 7 + (i / w) * 3 + b * 1000.0))
    val r = Raster(w, h, 0.0, 1.0, 0.01, 4326, SampleType.Int32, bands)
    val plain = java.nio.file.Files.createTempFile("np", ".tif")
    val pred = java.nio.file.Files.createTempFile("p2", ".tif")
    GeoTiff.writeRaster(plain, r, "lzw", predictor = 1)
    GeoTiff.writeRaster(pred, r, "lzw", predictor = 2)
    val plainBytes = java.nio.file.Files.readAllBytes(plain)
    val predBytes = java.nio.file.Files.readAllBytes(pred)
    assert(predBytes.length < plainBytes.length / 2,
      s"predictor ${predBytes.length} B vs plain ${plainBytes.length} B")
    val back = GeoTiff.readRaster(predBytes)
    for (b <- 0 until 2)
      assert(back.bands(b).toSeq == bands(b).toSeq, s"band $b")
    // uint16 single-band too (2-byte differencing path)
    val r16 = Raster(32, 32, 0.0, 1.0, 0.01, 4326, SampleType.UInt16,
      Seq(Array.tabulate(1024)(i => ((i * 13) % 60000).toDouble)))
    GeoTiff.writeRaster(pred, r16, "deflate", predictor = 2)
    val back16 = GeoTiff.readRaster(java.nio.file.Files.readAllBytes(pred))
    assert(back16.bands.head.toSeq == r16.bands.head.toSeq)
    // floats reject the integer predictor
    val f = Raster(4, 4, 0.0, 1.0, 1.0, 4326, SampleType.Float32,
      Seq(Array.fill(16)(1.5)))
    intercept[IllegalArgumentException](
      GeoTiff.writeRaster(pred, f, "lzw", predictor = 2))
  }

  test("predictor-3 encode round-trips and shrinks smooth float rasters") {
    import GeoTiff.{Raster, SampleType}
    // a float ramp with non-dyadic step: the mantissa low bytes churn
    // (raw deflate sees noise) while the byte-split planes group the
    // stable sign/exponent bytes and differencing flattens the rest
    val w = 64; val h = 64
    val band = Array.tabulate(w * h)(i => i * 0.1f + 1000.0f)
      .map(_.toDouble)
    val r = Raster(w, h, 0.0, 1.0, 0.01, 4326, SampleType.Float32, Seq(band))
    val plain = java.nio.file.Files.createTempFile("np3", ".tif")
    val pred = java.nio.file.Files.createTempFile("p3", ".tif")
    GeoTiff.writeRaster(plain, r, "deflate", predictor = 1)
    GeoTiff.writeRaster(pred, r, "deflate", predictor = 3)
    val plainBytes = java.nio.file.Files.readAllBytes(plain)
    val predBytes = java.nio.file.Files.readAllBytes(pred)
    assert(predBytes.length < plainBytes.length / 2,
      s"predictor ${predBytes.length} B vs plain ${plainBytes.length} B")
    assert(GeoTiff.readRaster(predBytes).bands.head.toSeq == band.toSeq)
    // multi-band float32 (interleaved samples diff at band stride)
    val mb = Seq.tabulate(2)(b =>
      Array.tabulate(w * h)(i => (i * 0.1f + b * 10f).toDouble))
    val rmb = Raster(w, h, 0.0, 1.0, 0.01, 4326, SampleType.Float32, mb)
    GeoTiff.writeRaster(pred, rmb, "deflate", predictor = 3)
    val back = GeoTiff.readRaster(java.nio.file.Files.readAllBytes(pred))
    for (b <- 0 until 2)
      assert(back.bands(b).toSeq == mb(b).toSeq, s"band $b")
    // float64 single-band (8-byte plane split)
    val r64 = Raster(32, 32, 0.0, 1.0, 0.01, 4326, SampleType.Float64,
      Seq(Array.tabulate(1024)(i => i * 0.001 + 1e6)))
    GeoTiff.writeRaster(pred, r64, "lzw", predictor = 3)
    val back64 = GeoTiff.readRaster(java.nio.file.Files.readAllBytes(pred))
    assert(back64.bands.head.toSeq == r64.bands.head.toSeq)
    // the default now picks 3 for compressed float output: the file
    // carries the tag and round-trips
    GeoTiff.writeRaster(pred, r, "deflate")
    val db = java.nio.file.Files.readAllBytes(pred)
    assert(GeoTiff.readRaster(db).bands.head.toSeq == band.toSeq)
    assert(db.length.toLong == predBytes.length.toLong,
      "default compressed-float write should equal the explicit predictor-3 file")
    // integers reject the float predictor
    val ri = Raster(4, 4, 0.0, 1.0, 1.0, 4326, SampleType.Int32,
      Seq(Array.fill(16)(3.0)))
    intercept[IllegalArgumentException](
      GeoTiff.writeRaster(pred, ri, "lzw", predictor = 3))
  }

  test("COG generalizes to multi-band and float samples") {
    import GeoTiff.{Raster, SampleType}
    val w = 40; val h = 24
    // 2-band float32: band values reconstruct exactly (x/4 + b has an
    // exact float representation), overview means are true means
    val bands = Seq.tabulate(2)(b =>
      Array.tabulate(w * h)(i => (i % w) / 4.0 + b))
    val r = Raster(w, h, 9.5, 51.0, 0.05, 4326, SampleType.Float32, bands)
    val p = java.nio.file.Files.createTempFile("cogmb", ".tif")
    GeoTiff.writeCogRaster(p, r, blockSize = 16, compression = "deflate")
    val levels = GeoTiff.readRasterLevels(java.nio.file.Files.readAllBytes(p))
    assert(levels.map(l => (l.width, l.height)) ==
      Seq((40, 24), (20, 12), (10, 6)))
    assert(levels.head.sampleType == SampleType.Float32)
    assert(levels.forall(_.bands.length == 2))
    for (b <- 0 until 2)
      assert(levels.head.bands(b).toSeq == bands(b).toSeq, s"band $b")
    // float overviews carry the exact (unrounded) 2×2 mean
    val l1 = levels(1)
    for ((x, y) <- Seq((0, 0), (9, 5), (19, 11)); b <- 0 until 2) {
      val srcs = for (dy <- 0 to 1; dx <- 0 to 1)
        yield bands(b)((2 * y + dy) * w + 2 * x + dx)
      val mean = (srcs.sum / 4).toFloat.toDouble // stored as float32
      assert(math.abs(l1.bands(b)(y * l1.width + x) - mean) < 1e-6,
        s"overview ($x,$y) band $b")
    }
    // projected multi-band int16 COG keeps its CRS through the chain
    val pr = Raster(20, 20, -8237642.0, 4970241.0, 152.87, 3857,
      SampleType.Int16,
      Seq(Array.tabulate(400)(i => (i % 7).toDouble),
        Array.tabulate(400)(i => (i % 11).toDouble)))
    GeoTiff.writeCogRaster(p, pr, blockSize = 16, compression = "lzw")
    val back = GeoTiff.readRasterLevels(java.nio.file.Files.readAllBytes(p))
    assert(back.head.epsg == 3857 && back.head.sampleType == SampleType.Int16)
    assert(back.head.bands(1).toSeq == pr.bands(1).toSeq)
    assert(back.length == 2 && back(1).bands.length == 2)
  }

  test("legacy Tile read rejects float and multi-band files") {
    import GeoTiff.{Raster, SampleType}
    val f = Raster(4, 4, 0.0, 0.0, 1.0, 4326, SampleType.Float32,
      Seq(Array.tabulate(16)(_ * 0.5)))
    val p = java.nio.file.Files.createTempFile("flt", ".tif")
    GeoTiff.writeRaster(p, f)
    val e1 = intercept[IllegalArgumentException](
      GeoTiff.read(java.nio.file.Files.readAllBytes(p)))
    assert(e1.getMessage.contains("integer"))
    val mb = Raster(4, 4, 0.0, 0.0, 1.0, 4326, SampleType.Int32,
      Seq(Array.fill(16)(1.0), Array.fill(16)(2.0)))
    GeoTiff.writeRaster(p, mb)
    val e2 = intercept[IllegalArgumentException](
      GeoTiff.read(java.nio.file.Files.readAllBytes(p)))
    assert(e2.getMessage.contains("single-band"))
    // the INTEGER predictor on float data is rejected, not
    // mis-applied (write with predictor pinned to 1 so the only
    // Predictor tag is the doctored one)
    GeoTiff.writeRaster(p, f, "deflate", predictor = 1)
    val fb = java.nio.file.Files.readAllBytes(p)
    val n = (fb(8) & 0xff) | ((fb(9) & 0xff) << 8)
    val fmtOff = (0 until n).map(i => 10 + i * 12).find { o =>
      ((fb(o) & 0xff) | ((fb(o + 1) & 0xff) << 8)) == 262
    }.get
    // rewrite Photometric as Predictor=2 (262 → 317 keeps ascending
    // order irrelevant to the tag-driven reader)
    val bb2 = java.nio.ByteBuffer.wrap(fb)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.putShort(fmtOff, 317.toShort)
    bb2.putInt(fmtOff + 8, 2)
    val e3 = intercept[IllegalArgumentException](GeoTiff.readRaster(fb))
    assert(e3.getMessage.contains("Predictor"))
  }

  test("reader rejects non-TIFF and unsupported forms") {
    intercept[IllegalArgumentException](GeoTiff.read("nope".getBytes))
    val p = java.nio.file.Files.createTempFile("gt3", ".tif")
    GeoTiff.write(p, tile(4), deflate = false)
    val ok = java.nio.file.Files.readAllBytes(p)
    // flip Compression (tag 259) value to JPEG (7) → rejected
    val n = (ok(8) & 0xff) | ((ok(9) & 0xff) << 8)
    val off = (0 until n).map(i => 10 + i * 12).find { o =>
      ((ok(o) & 0xff) | ((ok(o + 1) & 0xff) << 8)) == 259
    }.get
    ok(off + 8) = 7
    val e = intercept[IllegalArgumentException](GeoTiff.read(ok))
    assert(e.getMessage.contains("compression"))
  }
}
