package graft.raster

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Minimal PNG encoder (public spec: W3C PNG, RFC 2083) for the
  * raster tile cache: 8-bit RGBA, no interlace, filter 0 on every
  * scanline, one zlib-deflated IDAT. The reference's tile-cache
  * pipeline emits the same format via gdal2tiles
  * (`raster_tile_cache_assets`); this stays pure-JVM like the rest of
  * the codec layer. Decoding is intentionally out of scope — the spec
  * round-trips through `javax.imageio` to prove interoperability. */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Encode `rgba` (row-major, 4 bytes per pixel: r,g,b,a). */
  def encode(width: Int, height: Int, rgba: Array[Byte]): Array[Byte] = {
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
}
