package graft.raster

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal PNG codec (public spec: W3C PNG, RFC 2083) — pure JVM like
  * the rest of the codec layer.
  *
  * Encoder: 8-bit RGBA, no interlace, filter 0 on every scanline, one
  * zlib-deflated IDAT (the format the reference's tile-cache pipeline
  * emits via gdal2tiles, `raster_tile_cache_assets`).
  *
  * Decoder (the multimodal family's REAL container read path — m1/m5/
  * m7 decode actual PNG bytes, not a stub): any 8-bit-depth
  * non-interlaced image — grayscale (color type 0), RGB (2),
  * gray+alpha (4), RGBA (6) — with ALL five scanline filters
  * (None/Sub/Up/Average/Paeth) and any IDAT chunking, normalized to
  * row-major RGBA on output. Chunk CRCs are verified; palette (3),
  * sub-8-bit / 16-bit depths, and Adam7 interlace fail fast with a
  * message (same fail-fast stance as the projection families) —
  * interop with independently-produced files is spec'd against
  * `javax.imageio`, whose writer picks per-row adaptive filters, so
  * the Sub/Up/Average/Paeth paths are exercised by foreign bytes. */
object Png {

  /** A decoded image, normalized to row-major RGBA (4 bytes/pixel). */
  final case class Image(width: Int, height: Int, rgba: Array[Byte])

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Encode `rgba` (row-major, 4 bytes per pixel: r,g,b,a), with
    * optional tEXt metadata chunks (PNG spec §11.3.4: Latin-1
    * keyword NUL text, keyword 1..79 chars) after IHDR. */
  def encode(width: Int, height: Int, rgba: Array[Byte],
             meta: Seq[(String, String)] = Nil): Array[Byte] = {
    require(rgba.length == width * height * 4,
      s"rgba length ${rgba.length} != $width×$height×4")
    val out = new ByteArrayOutputStream(rgba.length / 4 + 128)
    out.write(Signature)
    // IHDR: width, height, bit depth 8, color type 6 (RGBA),
    // deflate, filter method 0, no interlace
    val ihdr = new Array[Byte](13)
    writeIntBE(ihdr, 0, width)
    writeIntBE(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = 6; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk(out, "IHDR", ihdr)
    meta.foreach { case (key, value) =>
      require(key.nonEmpty && key.length <= 79 && key.trim == key,
        s"png: bad tEXt keyword '$key'")
      chunk(out, "tEXt",
        key.getBytes("ISO-8859-1") ++ Array(0.toByte) ++
          value.getBytes("ISO-8859-1"))
    }
    // raw scanlines: filter byte 0 + row bytes
    val stride = width * 4
    val raw = new Array[Byte](height * (stride + 1))
    var y = 0
    while (y < height) {
      raw(y * (stride + 1)) = 0
      System.arraycopy(rgba, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    chunk(out, "IDAT", deflate(raw))
    chunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](8192)
    val out = new ByteArrayOutputStream(raw.length / 3 + 64)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def chunk(out: ByteArrayOutputStream, tag: String,
                    data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    writeIntBE(len, 0, data.length)
    out.write(len)
    val tagBytes = tag.getBytes("US-ASCII")
    out.write(tagBytes)
    out.write(data)
    val crc = new CRC32()
    crc.update(tagBytes); crc.update(data)
    val c = new Array[Byte](4)
    writeIntBE(c, 0, crc.getValue.toInt)
    out.write(c)
  }

  private def writeIntBE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  // ------------------------------------------------------------ decode

  private def readIntBE(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Decode a PNG byte stream to RGBA. See the object doc for the
    * supported envelope; anything outside it throws
    * `IllegalArgumentException` with the offending parameter. */
  def decode(png: Array[Byte]): Image = {
    require(png.length >= 8 + 12 + 13 + 12 + 12, "png: truncated stream")
    var i = 0
    while (i < 8) {
      require(png(i) == Signature(i), "png: bad signature")
      i += 1
    }
    var pos = 8
    var width = 0; var height = 0; var colorType = -1
    var channels = 0
    val idat = new ByteArrayOutputStream(png.length)
    var sawIhdr = false; var sawIend = false
    while (pos < png.length && !sawIend) {
      require(pos + 8 <= png.length, "png: truncated chunk header")
      val len = readIntBE(png, pos)
      require(len >= 0 && pos + 12 + len <= png.length,
        s"png: chunk length $len overruns the stream")
      val tag = new String(png, pos + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(png, pos + 4, 4 + len)
      val stored = readIntBE(png, pos + 8 + len)
      require(crc.getValue.toInt == stored,
        s"png: CRC mismatch in $tag chunk")
      tag match {
        case "IHDR" =>
          require(!sawIhdr && len == 13, "png: bad IHDR")
          sawIhdr = true
          width = readIntBE(png, pos + 8)
          height = readIntBE(png, pos + 12)
          require(width > 0 && height > 0, s"png: bad dims ${width}x$height")
          val depth = png(pos + 16) & 0xff
          colorType = png(pos + 17) & 0xff
          val compression = png(pos + 18) & 0xff
          val filterMethod = png(pos + 19) & 0xff
          val interlace = png(pos + 20) & 0xff
          require(depth == 8, s"png: unsupported bit depth $depth (only 8)")
          channels = colorType match {
            case 0 => 1 // grayscale
            case 2 => 3 // RGB
            case 4 => 2 // gray + alpha
            case 6 => 4 // RGBA
            case t => throw new IllegalArgumentException(
              s"png: unsupported color type $t (palette/other)")
          }
          require(compression == 0, s"png: bad compression $compression")
          require(filterMethod == 0, s"png: bad filter method $filterMethod")
          require(interlace == 0, "png: Adam7 interlace unsupported")
        case "IDAT" =>
          require(sawIhdr, "png: IDAT before IHDR")
          idat.write(png, pos + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunk (tEXt, pHYs, gAMA, ...) — skip
      }
      pos += 12 + len
    }
    require(sawIhdr && sawIend, "png: missing IHDR or IEND")
    val stride = width * channels
    val raw = inflate(idat.toByteArray, height * (stride + 1))
    // Unfilter scanlines in place (PNG filters are defined on the
    // FILTERED byte stream with the reconstructed previous row/pixel
    // as predictors; bpp for depth-8 is the channel count).
    val px = new Array[Byte](height * stride)
    val bpp = channels
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      val rowOff = y * (stride + 1) + 1
      val outOff = y * stride
      var x = 0
      while (x < stride) {
        val f = raw(rowOff + x) & 0xff
        val a = if (x >= bpp) px(outOff + x - bpp) & 0xff else 0 // left
        val b = if (y > 0) px(outOff - stride + x) & 0xff else 0 // up
        val c = if (x >= bpp && y > 0) px(outOff - stride + x - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + (a + b) / 2
          case 4 => f + paeth(a, b, c)
          case t => throw new IllegalArgumentException(
            s"png: bad filter type $t on row $y")
        }
        px(outOff + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, toRgba(px, width, height, colorType))
  }

  /** Extract tEXt metadata chunks (keyword → text, file order);
    * returns Nil for a file without tEXt. Fail-fast envelope matches
    * [[decode]]: bad signature, overrunning chunk lengths, and a
    * missing IEND all throw. CRC is verified for the chunks this
    * reader USES (tEXt) — pixel chunks are length-validated and
    * skipped without touching their payloads, which is the point:
    * the per-file cost is the header region, not the image
    * ([[decode]] still CRC-checks everything it inflates). */
  def textChunks(png: Array[Byte]): Seq[(String, String)] = {
    require(png.length >= 8, "png: truncated stream")
    var i = 0
    while (i < 8) {
      require(png(i) == Signature(i), "png: bad signature")
      i += 1
    }
    val out = Seq.newBuilder[(String, String)]
    var pos = 8
    var done = false
    while (pos + 8 <= png.length && !done) {
      val len = readIntBE(png, pos)
      require(len >= 0 && pos + 12 + len <= png.length,
        s"png: chunk length $len overruns the stream")
      val tag = new String(png, pos + 4, 4, "US-ASCII")
      if (tag == "tEXt") {
        val crc = new CRC32()
        crc.update(png, pos + 4, 4 + len)
        require(crc.getValue.toInt == readIntBE(png, pos + 8 + len),
          s"png: CRC mismatch in $tag chunk")
        val data = new String(png, pos + 8, len, "ISO-8859-1")
        val nul = data.indexOf('\u0000')
        require(nul > 0, "png: tEXt chunk without keyword separator")
        out += ((data.substring(0, nul), data.substring(nul + 1)))
      }
      if (tag == "IEND") done = true
      pos += 12 + len
    }
    require(done, "png: missing IEND (truncated stream)")
    out.result()
  }

  /** Header-only dimension read: signature + IHDR (CRC-verified),
    * nothing past it — O(header) where [[decode]] is O(pixels). For
    * kernels (m3's resize planning) that need only the declared
    * geometry. */
  def headerDims(png: Array[Byte]): (Int, Int) = {
    require(png.length >= 8 + 12 + 13, "png: truncated stream")
    var i = 0
    while (i < 8) {
      require(png(i) == Signature(i), "png: bad signature")
      i += 1
    }
    require(readIntBE(png, 8) == 13 &&
      new String(png, 12, 4, "US-ASCII") == "IHDR", "png: bad IHDR")
    val crc = new CRC32()
    crc.update(png, 12, 4 + 13)
    require(crc.getValue.toInt == readIntBE(png, 29),
      "png: CRC mismatch in IHDR chunk")
    val w = readIntBE(png, 16)
    val h = readIntBE(png, 20)
    require(w > 0 && h > 0, s"png: bad dims ${w}x$h")
    (w, h)
  }

  /** Paeth predictor (PNG spec §9.4): the neighbor closest to the
    * linear estimate a + b − c, ties broken a, b, c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def toRgba(px: Array[Byte], width: Int, height: Int,
                     colorType: Int): Array[Byte] = colorType match {
    case 6 => px
    case 0 =>
      val out = new Array[Byte](width * height * 4)
      var i = 0
      while (i < width * height) {
        val g = px(i)
        out(i * 4) = g; out(i * 4 + 1) = g; out(i * 4 + 2) = g
        out(i * 4 + 3) = -1 // 0xff
        i += 1
      }
      out
    case 2 =>
      val out = new Array[Byte](width * height * 4)
      var i = 0
      while (i < width * height) {
        out(i * 4) = px(i * 3); out(i * 4 + 1) = px(i * 3 + 1)
        out(i * 4 + 2) = px(i * 3 + 2); out(i * 4 + 3) = -1
        i += 1
      }
      out
    case 4 =>
      val out = new Array[Byte](width * height * 4)
      var i = 0
      while (i < width * height) {
        val g = px(i * 2)
        out(i * 4) = g; out(i * 4 + 1) = g; out(i * 4 + 2) = g
        out(i * 4 + 3) = px(i * 2 + 1)
        i += 1
      }
      out
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    try {
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        require(n > 0 || inf.finished(),
          "png: IDAT inflate stalled (truncated or corrupt)")
        off += n
      }
      require(off == expected,
        s"png: IDAT yields $off bytes, scanlines need $expected")
      out
    } finally inf.end()
  }
}
