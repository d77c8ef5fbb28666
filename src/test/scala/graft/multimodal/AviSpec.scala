package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The AVI codec: frame/offset/header round-trip, the closed-form
  * layout the m2 oracle replays, and fail-fasts. */
class AviSpec extends AnyFunSuite {

  private def det(k: Int)(p: Int): Int = (k * 37 + p * 11 + (p * p) % 13) % 256

  test("encode -> decode round-trips frames, dims, timing exactly") {
    for (nf <- Seq(1, 4, 9)) {
      val frames = (0 until nf).map(k => Array.tabulate(64)(det(k)))
      val v = Avi.decode(Avi.encode(8, 8, 25, frames))
      assert(v.width == 8 && v.height == 8 && v.usPerFrame == 40000L)
      assert(v.frames.length == nf)
      for (k <- 0 until nf)
        assert(v.frames(k).toSeq == frames(k).toSeq, s"frame $k")
    }
  }

  test("frame data offsets follow the closed-form layout the oracle replays") {
    val frames = (0 until 5).map(k => Array.tabulate(64)(det(k)))
    val bytes = Avi.encode(8, 8, 25, frames)
    val v = Avi.decode(bytes)
    for (k <- 0 until 5) {
      assert(v.frameOffsets(k) == 232L + 200L * k, s"offset of frame $k")
      // and the offset really points at frame k's DIB data: its first
      // byte is the blue sample of the BOTTOM-left pixel (row 7)
      assert((bytes(v.frameOffsets(k).toInt) & 0xff) == det(k)(7 * 8),
        s"frame $k data byte")
    }
  }

  test("non-square dims pad rows to 4 bytes and round-trip") {
    val w = 5; val h = 3 // stride 15 -> padded to 16
    val frames = Seq(Array.tabulate(w * h)(p => (p * 17) % 256))
    val v = Avi.decode(Avi.encode(w, h, 10, frames))
    assert(v.width == w && v.height == h && v.usPerFrame == 100000L)
    assert(v.frames(0).toSeq == frames(0).toSeq)
  }

  test("bad containers fail fast with messages") {
    val good = Avi.encode(8, 8, 25, Seq(Array.fill(64)(7)))
    val e1 = intercept[IllegalArgumentException](
      Avi.decode("RIFFxxxxWAVEdata".getBytes))
    assert(e1.getMessage.contains("signature"), e1.getMessage)
    // corrupt the strf compression field -> unsupported biCompression
    val bad = good.clone()
    // strf data begins after: 12 riff + 8+4 hdrl/list + 64 avih
    //   + 8+4 strl/list + 64 strh + 8 strf hdr = offset 172
    bad(172 + 16) = 1 // biCompression = BI_RLE8
    val e2 = intercept[IllegalArgumentException](Avi.decode(bad))
    assert(e2.getMessage.contains("biCompression"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      Avi.decode(good.take(100)))
    assert(e3.getMessage.contains("overruns") ||
      e3.getMessage.contains("truncated"), e3.getMessage)
    // strf geometry disagreeing with avih would silently mis-stride
    // the frames — must reject instead (biWidth at strf data + 4)
    val badW = good.clone()
    badW(172 + 4) = 16
    val e4 = intercept[IllegalArgumentException](Avi.decode(badW))
    assert(e4.getMessage.contains("disagrees"), e4.getMessage)
  }
}
