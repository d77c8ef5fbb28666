package graft.raster

import java.io.ByteArrayOutputStream

/** Baseline-sequential JFIF (ITU-T T.81) — grayscale, pure JVM.
  *
  * The mixed-format media lake ([[graft.multimodal.MediaLake]]) stores
  * a deterministic share of documents as REAL JPEG containers; the
  * multimodal kernels (m1/m3/m5/m7/m8/m9) dispatch on the lake's
  * `fmt` column between this codec and [[Png]]. The reference treats
  * raster/vector media as opaque payloads handed to format libraries
  * (PIL/GDAL do the JFIF walk there); here the container read is
  * in-engine so the decode cost rides the distributed scan kernel.
  *
  * Scope: baseline DCT, 8-bit, single luminance component (what the
  * lake writes and `javax.imageio` emits for `TYPE_BYTE_GRAY`), the
  * standard Annex K Huffman tables on encode, arbitrary DHT/DQT on
  * decode, restart markers honored, COM segments as `key\0value`
  * metadata (the tEXt analogue m8 reads without touching pixels).
  *
  * Exactness contract with the oracle: the lake renders images whose
  * 8×8 blocks are CONSTANT. For a constant block the FDCT is a pure
  * DC (AC terms cancel by cosine symmetry; the float residue is
  * ~1e-12, far inside the round-to-zero), DC = 8·(v−128) is exact in
  * doubles, and with an all-ones quant table the IDCT reconstructs v
  * bit-exactly — so the DuckDB oracle can replay decoded pixels in
  * closed form even though the container is a real lossy-format
  * stream. JpegSpec pins general (non-constant) fidelity against
  * `javax.imageio` both directions.
  */
object Jpeg {

  final case class Image(width: Int, height: Int, gray: Array[Int])

  // ------------------------------------------------------ constants

  /** Zig-zag scan order (T.81 Figure 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Standard luminance DC table (T.81 Annex K.3.3.1). */
  private val StdDcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcVals: Array[Int] = (0 to 11).toArray

  /** Standard luminance AC table (T.81 Annex K.3.3.2). */
  private val StdAcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** cos((2x+1)·u·π/16) · Cu, the shared FDCT/IDCT basis. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ------------------------------------------------------- encoder

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing (F.1.2.3)
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1s (T.81 F.1.2.3). */
    def flush(): Unit =
      if (nbits > 0) { put(0xff, 8 - nbits) }
  }

  /** Canonical code assignment from a BITS/HUFFVAL pair (C.2). */
  private def buildCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        m += vals(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    m.result()
  }

  private def sizeCat(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  private def seg(out: ByteArrayOutputStream, marker: Int, payload: Array[Byte]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write(len >> 8); out.write(len & 0xff)
    out.write(payload, 0, payload.length)
  }

  /** Encode a grayscale image as baseline JFIF. `quant` is the
    * 64-entry quantization table in NATURAL (row-major) order; the
    * all-ones default is the lake's exact-round-trip configuration.
    * `meta` lands as one COM segment per pair (`key\0value`). */
  def encode(w: Int, h: Int, gray: Array[Int],
             meta: Seq[(String, String)] = Nil,
             quant: Array[Int] = Array.fill(64)(1)): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      s"gray length ${gray.length} != $w×$h")
    require(gray.forall(g => g >= 0 && g <= 255),
      "gray values must be 0..255 (mask before encoding)")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in 1..255")
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // APP0 JFIF 1.01, no thumbnail
    seg(out, 0xe0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    meta.foreach { case (k, v) =>
      seg(out, 0xfe, (k + "\u0000" + v).getBytes("UTF-8"))
    }
    // DQT: table 0, 8-bit precision, zig-zag order
    seg(out, 0xdb, (Array(0x00) ++ Zigzag.map(quant(_))).map(_.toByte))
    // SOF0: 8-bit, 1 component, 1×1 sampling, quant table 0
    seg(out, 0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff,
      1, 1, 0x11, 0).map(_.toByte))
    // DHT: DC class 0 id 0, AC class 1 id 0 (standard Annex K tables)
    seg(out, 0xc4, (Array(0x00) ++ StdDcBits ++ StdDcVals).map(_.toByte))
    seg(out, 0xc4, (Array(0x10) ++ StdAcBits ++ StdAcVals).map(_.toByte))
    // SOS: 1 component, DC/AC table 0, full spectral selection
    seg(out, 0xda, Array(1, 1, 0x00, 0, 63, 0).map(_.toByte))

    val dcCodes = buildCodes(StdDcBits, StdDcVals)
    val acCodes = buildCodes(StdAcBits, StdAcVals)
    val bw = new BitWriter(out)
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    val coef = new Array[Double](64)
    var prevDc = 0
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      // level-shifted source block, edge-replicated outside the image
      var v = 0
      while (v < 8) {
        var x = 0
        while (x < 8) {
          val sy = math.min(h - 1, by * 8 + v)
          val sx = math.min(w - 1, bx * 8 + x)
          coef(v * 8 + x) = gray(sy * w + sx) - 128.0
          x += 1
        }
        v += 1
      }
      // separable FDCT: rows then columns (A.3.3 with the 1/4 fold)
      val tmp = new Array[Double](64)
      var y = 0
      while (y < 8) {
        var u = 0
        while (u < 8) {
          var s = 0.0
          var x = 0
          while (x < 8) { s += coef(y * 8 + x) * Cos(u)(x); x += 1 }
          tmp(y * 8 + u) = s
          u += 1
        }
        y += 1
      }
      val zz = new Array[Int](64)
      var u = 0
      while (u < 8) {
        var vv = 0
        while (vv < 8) {
          var s = 0.0
          var yy = 0
          while (yy < 8) { s += tmp(yy * 8 + u) * Cos(vv)(yy); yy += 1 }
          coef(vv * 8 + u) = s / 4.0
          vv += 1
        }
        u += 1
      }
      var k = 0
      while (k < 64) {
        val nat = Zigzag(k)
        zz(k) = math.round(coef(nat) / quant(nat)).toInt
        k += 1
      }
      // DC difference
      val diff = zz(0) - prevDc
      prevDc = zz(0)
      val s0 = sizeCat(diff)
      val (c0, l0) = dcCodes(s0)
      bw.put(c0, l0)
      if (s0 > 0) bw.put(if (diff < 0) diff + (1 << s0) - 1 else diff, s0)
      // AC run-length coding
      var run = 0
      k = 1
      while (k < 64) {
        if (zz(k) == 0) run += 1
        else {
          while (run > 15) { val (cz, lz) = acCodes(0xf0); bw.put(cz, lz); run -= 16 }
          val sz = sizeCat(zz(k))
          // The Annex K AC tables stop at size category 10. For
          // level-shifted 0..255 input the dominant coefficient tops
          // out at exactly 1020 (the (4,4)-aligned checkerboard —
          // JpegSpec pins it), so this is defense-in-depth against a
          // future level-shift/precision change, not a reachable
          // path: a bare table-lookup NoSuchElementException would
          // otherwise surface.
          require(sz <= 10,
            s"jpeg: AC coefficient ${zz(k)} exceeds Annex K size range " +
              "(category 11); lower the quality/contrast")
          val (ca, la) = acCodes((run << 4) | sz)
          bw.put(ca, la)
          bw.put(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ce, le) = acCodes(0x00); bw.put(ce, le) } // EOB
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------- decoder

  /** Canonical Huffman decode tables (F.2.2.3): per code length the
    * smallest/largest code and the HUFFVAL offset. */
  private final class HuffTable(bits: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) == 0) { minCode(len) = 0; maxCode(len) = -1 }
        else {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var sawMarker: Int = -1 // marker byte hit inside entropy data
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) throw new IllegalArgumentException(
          "jpeg: entropy stream ran off the end")
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          val m = if (pos < b.length) b(pos) & 0xff else 0xd9
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else { sawMarker = m; v = 0 } // marker: feed zeros (DNL/EOI region)
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Align to a byte boundary and step past an expected RST marker. */
    def restart(): Unit = {
      nbits = 0
      if (sawMarker >= 0xd0 && sawMarker <= 0xd7) { pos += 1; sawMarker = -1 }
      else {
        // marker not yet consumed from the stream: find it directly
        while (pos + 1 < b.length &&
          !((b(pos) & 0xff) == 0xff && ((b(pos + 1) & 0xff) >= 0xd0) &&
            ((b(pos + 1) & 0xff) <= 0xd7))) pos += 1
        pos += 2
      }
    }
  }

  private def huffDecode(br: BitReader, t: HuffTable): Int = {
    var code = br.bit()
    var len = 1
    while (code > t.maxCode(len)) {
      code = (code << 1) | br.bit()
      len += 1
      if (len > 16) throw new IllegalArgumentException("jpeg: bad Huffman code")
    }
    t.vals(t.valPtr(len) + code - t.minCode(len))
  }

  /** EXTEND (F.2.2.1): map a SIZE-bit magnitude to its signed value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Advance past 0xFF fill bytes (T.81 B.1.1.2 permits any number
    * between segments) to the 0xFF that immediately precedes the
    * marker byte. */
  private def markerStart(bytes: Array[Byte], at: Int): Int = {
    require(at + 2 <= bytes.length, "jpeg: truncated segment stream")
    require((bytes(at) & 0xff) == 0xff, f"jpeg: expected marker at $at")
    var i = at
    while (i + 2 <= bytes.length && (bytes(i + 1) & 0xff) == 0xff) i += 1
    require(i + 2 <= bytes.length, "jpeg: truncated segment stream")
    i
  }

  /** TEM (0x01) and RST0–7 (0xD0–D7) are standalone markers — no
    * length word follows them. */
  private def standalone(marker: Int): Boolean =
    marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)

  /** Walk the segment stream, returning (SOF dims, quant tables,
    * huffman tables, restart interval, SOS entropy-data offset). */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JFIF stream (missing SOI)")
    var i = 2
    var w = -1
    var h = -1
    var qtId = -1
    val quant = Array.ofDim[Int](4, 64) // natural order
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var dcSel = 0
    var acSel = 0
    var restartInterval = 0
    var sosAt = -1
    while (sosAt < 0) {
      i = markerStart(bytes, i)
      val marker = bytes(i + 1) & 0xff
      if (standalone(marker)) { i += 2 }
      else {
      require(i + 4 <= bytes.length, "jpeg: truncated segment stream")
      val len = u16(bytes, i + 2)
      val body = i + 4
      marker match {
        case 0xc0 | 0xc1 => // SOF0/1 (extended sequential decodes the same)
          require((bytes(body) & 0xff) == 8, "jpeg: only 8-bit precision")
          h = u16(bytes, body + 1)
          w = u16(bytes, body + 3)
          val ncomp = bytes(body + 5) & 0xff
          require(ncomp == 1, s"jpeg: only grayscale supported (got $ncomp components)")
          require((bytes(body + 7) & 0xff) == 0x11, "jpeg: only 1×1 sampling")
          qtId = bytes(body + 8) & 0xff
        case 0xc2 => throw new IllegalArgumentException(
          "jpeg: progressive (SOF2) not supported — lake writes baseline")
        case 0xdb =>
          var p = body
          while (p < body + len - 2) {
            val prec = (bytes(p) & 0xff) >> 4
            val id = bytes(p) & 0x0f
            require(prec == 0, "jpeg: only 8-bit quant tables")
            var k = 0
            while (k < 64) {
              quant(id)(Zigzag(k)) = bytes(p + 1 + k) & 0xff
              k += 1
            }
            p += 65
          }
        case 0xc4 =>
          var p = body
          while (p < body + len - 2) {
            val cls = (bytes(p) & 0xff) >> 4
            val id = bytes(p) & 0x0f
            val bits = Array.tabulate(16)(j => bytes(p + 1 + j) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(j => bytes(p + 17 + j) & 0xff)
            val t = new HuffTable(bits, vals)
            if (cls == 0) dcTabs(id) = t else acTabs(id) = t
            p += 17 + n
          }
        case 0xdd =>
          restartInterval = u16(bytes, body)
        case 0xda =>
          val ns = bytes(body) & 0xff
          require(ns == 1, "jpeg: one scan component expected")
          dcSel = (bytes(body + 2) & 0xff) >> 4
          acSel = bytes(body + 2) & 0x0f
          sosAt = i + 2 + len
        case 0xd9 => throw new IllegalArgumentException("jpeg: EOI before SOS")
        case _ => // APPn / COM / others: skip
      }
      if (sosAt < 0) i += 2 + len
      }
    }
    require(w > 0 && h > 0, "jpeg: SOS before SOF")
    require(dcTabs(dcSel) != null && acTabs(acSel) != null, "jpeg: missing DHT")
    val q = quant(qtId)

    val br = new BitReader(bytes, sosAt)
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    val gray = new Array[Int](w * h)
    val zz = new Array[Int](64)
    val nat = new Array[Double](64)
    var prevDc = 0
    var blockIdx = 0
    for (by <- 0 until blocksY; bx <- 0 until blocksX) {
      if (restartInterval > 0 && blockIdx > 0 && blockIdx % restartInterval == 0) {
        br.restart()
        prevDc = 0
      }
      java.util.Arrays.fill(zz, 0)
      val s0 = huffDecode(br, dcTabs(dcSel))
      prevDc += extend(br.bits(s0), s0)
      zz(0) = prevDc
      var k = 1
      while (k < 64) {
        val rs = huffDecode(br, acTabs(acSel))
        val run = rs >> 4
        val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else k = 64 // EOB
        } else {
          k += run
          require(k < 64, "jpeg: AC run past block end")
          zz(k) = extend(br.bits(size), size)
          k += 1
        }
      }
      // dequant to natural order, then separable IDCT (columns, rows)
      k = 0
      while (k < 64) { nat(Zigzag(k)) = zz(k).toDouble * q(Zigzag(k)); k += 1 }
      val tmp = new Array[Double](64)
      var x = 0
      while (x < 8) {
        var y = 0
        while (y < 8) {
          var s = 0.0
          var v = 0
          while (v < 8) { s += Cos(v)(y) * nat(v * 8 + x); v += 1 }
          tmp(y * 8 + x) = s
          y += 1
        }
        x += 1
      }
      var y = 0
      while (y < 8) {
        var xx = 0
        while (xx < 8) {
          var s = 0.0
          var u = 0
          while (u < 8) { s += Cos(u)(xx) * tmp(y * 8 + u); u += 1 }
          val px = (math.round(s / 4.0) + 128).toInt
          val ix = bx * 8 + xx
          val iy = by * 8 + y
          if (ix < w && iy < h)
            gray(iy * w + ix) = math.max(0, math.min(255, px))
          xx += 1
        }
        y += 1
      }
      blockIdx += 1
    }
    Image(w, h, gray)
  }

  /** SOF dims without touching entropy data — the m3 planning read
    * (O(header), the [[Png.headerDims]] analogue). */
  def headerDims(bytes: Array[Byte]): (Int, Int) = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JFIF stream (missing SOI)")
    var i = 2
    while (i + 4 <= bytes.length) {
      i = markerStart(bytes, i) // can advance past the loop guard
      val marker = bytes(i + 1) & 0xff
      if (standalone(marker)) i += 2
      else {
        require(i + 4 <= bytes.length, "jpeg: truncated segment stream")
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 &&
          marker != 0xc8 && marker != 0xcc) {
          require(i + 9 <= bytes.length, "jpeg: truncated SOF")
          return (u16(bytes, i + 7), u16(bytes, i + 5))
        }
        i += 2 + u16(bytes, i + 2)
      }
    }
    throw new IllegalArgumentException("jpeg: no SOF marker")
  }

  /** COM segments as `key\0value` pairs — the metadata walk m8 runs;
    * stops at SOS so the per-row cost is the header region. */
  def comments(bytes: Array[Byte]): Seq[(String, String)] = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JFIF stream (missing SOI)")
    val out = Seq.newBuilder[(String, String)]
    var i = 2
    var done = false
    while (!done && i + 4 <= bytes.length) {
      i = markerStart(bytes, i) // can advance past the loop guard
      val marker = bytes(i + 1) & 0xff
      if (standalone(marker)) { i += 2 }
      else if (marker == 0xda || marker == 0xd9) { done = true }
      else {
      require(i + 4 <= bytes.length, "jpeg: truncated segment stream")
      val len = u16(bytes, i + 2)
      if (marker == 0xfe) {
        val s = new String(bytes, i + 4, len - 2, "UTF-8")
        val cut = s.indexOf('\u0000')
        if (cut >= 0) out += s.substring(0, cut) -> s.substring(cut + 1)
      }
      i += 2 + len
      }
    }
    out.result()
  }
}
