package graft.raster

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JFIF codec: exact round trip on the lake's block-constant
  * configuration, bounded error on general images, and two-direction
  * `javax.imageio` interop (their reader on our bytes, our reader on
  * their bytes). */
class JpegSpec extends AnyFunSuite {

  private def blockConstant(w: Int, h: Int, block: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(p => block((p % w) / 8, (p / w) / 8) & 0xff)

  test("block-constant images round-trip bit-exactly (the lake contract)") {
    val rnd = new scala.util.Random(7)
    // dims include a non-multiple-of-8 pair: edge replication stays
    // inside the source block, so constancy (and exactness) survives
    for ((w, h) <- Seq((16, 16), (24, 32), (32, 24), (20, 28))) {
      val vals = Array.fill(((w + 7) / 8) * ((h + 7) / 8))(rnd.nextInt(256))
      val bw = (w + 7) / 8
      val gray = blockConstant(w, h, (bx, by) => vals(by * bw + bx))
      val bytes = Jpeg.encode(w, h, gray)
      val back = Jpeg.decode(bytes)
      assert(back.width == w && back.height == h, s"dims $w×$h")
      assert(back.gray.toSeq == gray.toSeq, s"pixels $w×$h")
    }
  }

  test("general images round-trip within ±2 at quant=1") {
    val rnd = new scala.util.Random(11)
    val (w, h) = (24, 16)
    val gray = Array.fill(w * h)(rnd.nextInt(256))
    val back = Jpeg.decode(Jpeg.encode(w, h, gray))
    val maxErr = gray.indices.map(p => math.abs(back.gray(p) - gray(p))).max
    assert(maxErr <= 2, s"max error $maxErr")
  }

  test("javax.imageio decodes our block-constant stream exactly") {
    val gray = blockConstant(24, 24, (bx, by) => 40 + 60 * ((bx + by) % 4))
    val bytes = Jpeg.encode(24, 24, gray)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 24 && img.getHeight == 24)
    for (y <- 0 until 24; x <- 0 until 24)
      assert(img.getRaster.getSample(x, y, 0) == gray(y * 24 + x),
        s"imageio px ($x,$y)")
  }

  test("our decoder reads a javax.imageio-written JPEG (within IDCT tolerance)") {
    val (w, h) = (40, 24) // exercises multiple MCUs and the DHT/DQT parse
    val rnd = new scala.util.Random(3)
    // smooth-ish content (random blocks + gradient) so default-quality
    // lossy encode stays decodable without ringing surprises
    val src = Array.tabulate(w * h)(p =>
      (((p % w) * 4 + (p / w) * 3) / 2 + rnd.nextInt(8)) % 256)
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, src(y * w + x))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", baos))
    val theirBytes = baos.toByteArray
    val ours = Jpeg.decode(theirBytes)
    val theirs = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(theirBytes))
    assert(ours.width == w && ours.height == h)
    // same bytes, two decoders: differences are IDCT-implementation
    // rounding only (T.81 Annex A accuracy class)
    val maxDiff = (for (y <- 0 until h; x <- 0 until w)
      yield math.abs(ours.gray(y * w + x) - theirs.getRaster.getSample(x, y, 0))).max
    assert(maxDiff <= 2, s"decoder divergence $maxDiff")
    // and headerDims agrees without touching entropy data
    assert(Jpeg.headerDims(theirBytes) == ((w, h)))
  }

  test("COM metadata round-trips and reads header-only") {
    val gray = blockConstant(16, 16, (_, _) => 128)
    val meta = Seq("Title" -> "doc 42", "Language" -> "en", "Source" -> "web crawl")
    val bytes = Jpeg.encode(16, 16, gray, meta)
    assert(Jpeg.comments(bytes) == meta)
    assert(Jpeg.headerDims(bytes) == ((16, 16)))
    // metadata-free stream yields no pairs
    assert(Jpeg.comments(Jpeg.encode(16, 16, gray)).isEmpty)
  }

  test("fuzz: random block-constant images round-trip exactly (200 cases)") {
    // the lake contract swept over parameters nobody hand-picked:
    // random block grids, random values, raggedly-cropped dims (the
    // 8-aligned constant tiling survives edge replication)
    val rnd = new scala.util.Random(101)
    for (k <- 0 until 200) {
      val bw = 2 + rnd.nextInt(4)
      val bh = 2 + rnd.nextInt(4)
      val w = bw * 8 - (if (rnd.nextBoolean()) rnd.nextInt(7) else 0)
      val h = bh * 8 - (if (rnd.nextBoolean()) rnd.nextInt(7) else 0)
      val vals = Array.fill(bw * bh)(rnd.nextInt(256))
      val gray = Array.tabulate(w * h)(p =>
        vals(((p / w) / 8) * bw + ((p % w) / 8)))
      val back = Jpeg.decode(Jpeg.encode(w, h, gray))
      assert(back.width == w && back.height == h, s"case $k dims $w×$h")
      assert(back.gray.toSeq == gray.toSeq, s"case $k pixels $w×$h")
    }
  }

  test("maximum-energy legal block (|AC| = 1020, size 10) encodes and round-trips at quant=1") {
    // The worst legal 8-bit block is the (4,4)-basis-aligned 2×2
    // checkerboard: its dominant AC coefficient is EXACTLY 1020 —
    // the top of Annex K size category 10. (Category 11 is
    // unreachable from 0..255 input; the encoder's sz<=10 require is
    // defense-in-depth should the level-shift contract ever change.)
    def sgn(k: Int, x: Int) = math.cos((2 * x + 1) * k * math.Pi / 16) > 0
    val gray = Array.tabulate(16 * 16)(p =>
      if (sgn(4, p % 16 % 8) == sgn(4, p / 16 % 8)) 255 else 0)
    val back = Jpeg.decode(Jpeg.encode(16, 16, gray))
    val maxErr = gray.indices.map(p => math.abs(back.gray(p) - gray(p))).max
    assert(maxErr <= 2, s"max error $maxErr")
  }

  test("fill bytes and standalone markers between header segments are tolerated") {
    // T.81 B.1.1.2 permits any number of 0xFF fill bytes before a
    // marker; TEM (0xFF01) is standalone (no length word). Splice
    // both after SOI — decode/headerDims/comments must be unaffected.
    val gray = blockConstant(16, 16, (bx, by) => 30 * (bx + by) % 256)
    val clean = Jpeg.encode(16, 16, gray, meta = Seq("origin" -> "specced"))
    val splice = Array(0xff, 0x01, 0xff).map(_.toByte) // TEM + one fill byte
    val padded = clean.take(2) ++ splice ++ clean.drop(2)
    val back = Jpeg.decode(padded)
    assert(back.width == 16 && back.height == 16)
    assert(back.gray.toSeq == Jpeg.decode(clean).gray.toSeq)
    assert(Jpeg.headerDims(padded) == ((16, 16)))
    assert(Jpeg.comments(padded) == Seq("origin" -> "specced"))
  }

  test("malformed streams fail fast with messages") {
    val e1 = intercept[IllegalArgumentException](Jpeg.decode(Array[Byte](1, 2, 3)))
    assert(e1.getMessage.contains("SOI"), e1.getMessage)
    val good = Jpeg.encode(16, 16, blockConstant(16, 16, (_, _) => 7))
    val e2 = intercept[Exception](Jpeg.decode(good.take(40)))
    assert(e2.getMessage != null)
    val e3 = intercept[IllegalArgumentException](Jpeg.headerDims(Array[Byte](1)))
    assert(e3.getMessage.contains("SOI"), e3.getMessage)
    // encoder guards
    val e4 = intercept[IllegalArgumentException](Jpeg.encode(8, 8, Array(1)))
    assert(e4.getMessage.contains("8×8") || e4.getMessage.contains("length"))
    // out-of-range gray would silently clamp through the DCT path —
    // the bit-exact contract demands a fail-fast instead
    val e5 = intercept[IllegalArgumentException](
      Jpeg.encode(8, 8, Array.fill(64)(300)))
    assert(e5.getMessage.contains("0..255"), e5.getMessage)
  }
}
