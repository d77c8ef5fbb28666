package graft.raster

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** The PNG decoder: byte-exact round-trip against our encoder, and
  * interop against `javax.imageio`'s INDEPENDENT writer — whose
  * per-row adaptive filter choice exercises the Sub/Up/Average/Paeth
  * reconstruction paths that our own filter-0-only encoder never
  * emits. */
class PngSpec extends AnyFunSuite {

  private def det(i: Int): Byte = ((i * 31 + (i * i) % 97) % 256).toByte

  test("encode -> decode round-trips bytes exactly (RGBA, filter 0)") {
    for ((w, h) <- Seq((1, 1), (3, 5), (16, 16), (31, 7))) {
      val rgba = Array.tabulate(w * h * 4)(det)
      val img = Png.decode(Png.encode(w, h, rgba))
      assert(img.width == w && img.height == h)
      assert(java.util.Arrays.equals(img.rgba, rgba), s"${w}x$h")
    }
  }

  private def viaImageIo(src: BufferedImage): Png.Image = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(src, "png", out), "ImageIO refused png")
    Png.decode(out.toByteArray)
  }

  test("decodes ImageIO-written RGB (color type 2, adaptive filters)") {
    val w = 40; val h = 25
    val src = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // gradient + noise mix so the writer picks varied row filters
      val r = (x * 6) % 256; val g = (y * 9) % 256
      val b = (x * x + y * 3) % 256
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val img = viaImageIo(src)
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = src.getRGB(x, y)
      val o = (y * w + x) * 4
      assert((img.rgba(o) & 0xff) == ((argb >> 16) & 0xff), s"r@$x,$y")
      assert((img.rgba(o + 1) & 0xff) == ((argb >> 8) & 0xff), s"g@$x,$y")
      assert((img.rgba(o + 2) & 0xff) == (argb & 0xff), s"b@$x,$y")
      assert((img.rgba(o + 3) & 0xff) == 255, s"a@$x,$y")
    }
  }

  test("decodes ImageIO-written ARGB (color type 6) and GRAY (type 0)") {
    val w = 17; val h = 11
    val argbSrc = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until h; x <- 0 until w)
      argbSrc.setRGB(x, y, ((x * 15 + y) % 256 << 24) | ((y * 23) % 256 << 16)
        | ((x * 7) % 256 << 8) | ((x + y * 5) % 256))
    val argb = viaImageIo(argbSrc)
    for (y <- 0 until h; x <- 0 until w) {
      val p = argbSrc.getRGB(x, y); val o = (y * w + x) * 4
      assert((argb.rgba(o + 3) & 0xff) == ((p >> 24) & 0xff), s"a@$x,$y")
      assert((argb.rgba(o) & 0xff) == ((p >> 16) & 0xff), s"r@$x,$y")
    }
    val graySrc = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 11 + y * 29) % 256
      graySrc.getRaster.setSample(x, y, 0, v)
    }
    val gray = viaImageIo(graySrc)
    for (y <- 0 until h; x <- 0 until w) {
      val v = graySrc.getRaster.getSample(x, y, 0)
      val o = (y * w + x) * 4
      assert((gray.rgba(o) & 0xff) == v && (gray.rgba(o + 1) & 0xff) == v
        && (gray.rgba(o + 2) & 0xff) == v && (gray.rgba(o + 3) & 0xff) == 255,
        s"gray@$x,$y")
    }
  }

  test("tEXt metadata round-trips and does not disturb pixels or ImageIO") {
    val rgba = Array.tabulate(4 * 4 * 4)(det)
    val meta = Seq("Title" -> "doc 7", "Language" -> "en",
      "Source" -> "web/crawl-01")
    val bytes = Png.encode(4, 4, rgba, meta)
    assert(Png.textChunks(bytes) == meta)
    val img = Png.decode(bytes)
    assert(java.util.Arrays.equals(img.rgba, rgba))
    // a metadata-free file yields no chunks
    assert(Png.textChunks(Png.encode(4, 4, rgba)).isEmpty)
    // independent reader still accepts the file
    assert(ImageIO.read(new ByteArrayInputStream(bytes)) != null)
    // bad keywords fail fast
    val e = intercept[IllegalArgumentException](
      Png.encode(4, 4, rgba, Seq(" lead" -> "x")))
    assert(e.getMessage.contains("keyword"), e.getMessage)
  }

  test("headerDims reads IHDR only; textChunks rejects truncated files") {
    val rgba = Array.tabulate(6 * 9 * 4)(det)
    val bytes = Png.encode(6, 9, rgba, Seq("Title" -> "t"))
    assert(Png.headerDims(bytes) == ((6, 9)))
    // dims agree with the full decode on every lake-shaped file
    val img = Png.decode(bytes)
    assert((img.width, img.height) == Png.headerDims(bytes))
    // a truncated stream (IEND dropped) must NOT yield silent partial
    // metadata — fail-fast envelope matches decode
    val truncated = bytes.take(bytes.length - 12)
    val e = intercept[IllegalArgumentException](Png.textChunks(truncated))
    assert(e.getMessage.contains("IEND"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Png.headerDims("not png but long enough to pass the length gate".getBytes))
    assert(e2.getMessage.contains("signature"), e2.getMessage)
  }

  test("our encoder's output still reads in ImageIO (interop both ways)") {
    val w = 9; val h = 4
    val rgba = Array.tabulate(w * h * 4)(det)
    val img = ImageIO.read(new ByteArrayInputStream(Png.encode(w, h, rgba)))
    assert(img.getWidth == w && img.getHeight == h)
    val argb0 = img.getRGB(0, 0)
    assert(((argb0 >> 16) & 0xff) == (rgba(0) & 0xff))
  }

  test("corrupt CRC and unsupported formats fail fast with messages") {
    val good = Png.encode(4, 4, Array.tabulate(64)(det))
    // flip one byte inside the IDAT payload
    val bad = good.clone()
    bad(bad.length - 20) = (bad(bad.length - 20) ^ 0x5a).toByte
    val e1 = intercept[IllegalArgumentException](Png.decode(bad))
    assert(e1.getMessage.contains("CRC"), e1.getMessage)

    // 16-bit gray via ImageIO → unsupported bit depth, named
    val src16 = new BufferedImage(3, 3, BufferedImage.TYPE_USHORT_GRAY)
    val out = new ByteArrayOutputStream()
    ImageIO.write(src16, "png", out)
    val e2 = intercept[IllegalArgumentException](Png.decode(out.toByteArray))
    assert(e2.getMessage.contains("bit depth"), e2.getMessage)

    val e3 = intercept[IllegalArgumentException](
      Png.decode(("not a png at all, just text bytes " * 4).getBytes))
    assert(e3.getMessage.contains("signature"), e3.getMessage)
  }
}
