package graft.raster

import org.scalatest.funsuite.AnyFunSuite

/** NTv2 codec + grid-shift math: .gsb write→read round trip, the
  * format's node ordering and sign conventions, bilinear sampling,
  * the fixed two-evaluation inverse, and the composed [[Warp.GridShifted]]
  * projection. */
class Ntv2Spec extends AnyFunSuite {

  // 3×4 grid over lat 50..52°N, lon 4..7°E (E_LONG −25200″ positive
  // west), 1° increments, distinctive per-node values
  private def grid: Ntv2.Grid = {
    def node(f: (Int, Int) => Double) =
      Array.tabulate(3 * 4)(i => f(i / 4, i % 4))
    Ntv2.Grid(180000.0, 3600.0, -25200.0, 3600.0, 3, 4,
      node((r, c) => 1.0 + r * 10.0 + c),
      node((r, c) => -2.0 + r + c * 10.0))
  }

  test("gsb write→read round trip (float32-exact, boundaries, counts)") {
    val bytes = Ntv2.write(grid, "SRC", "WGS84")
    val back = Ntv2.read(bytes)
    assert(back.nRows == 3 && back.nCols == 4)
    assert(back.sLatSec == 180000.0 && back.latIncSec == 3600.0)
    assert(back.eLonWSec == -25200.0 && back.lonIncSec == 3600.0)
    // values store as float32; these test values are float-exact
    assert(back.latShiftSec.toSeq == grid.latShiftSec.toSeq)
    assert(back.lonShiftWSec.toSeq == grid.lonShiftWSec.toSeq)
  }

  test("node ordering: row-major from south, east boundary going west") {
    // node (r=1, c=2): lat 51°N, positive-west lon −25200 + 2·3600 =
    // −18000″ = 5°E. latShift there must be 1 + 10 + 2 = 13.
    val (dLat, dLonW) = grid.sample(51.0, 5.0)
    assert(dLat == 13.0, s"latShift $dLat")
    assert(dLonW == -2.0 + 1 + 20.0, s"lonShift $dLonW")
    // midpoint of 4 nodes = their average (bilinear). 4.5°E sits at
    // column coordinate 2.5 (columns count WESTWARD from the 7°E
    // east boundary), between nodes (0,2)=3,(0,3)=4,(1,2)=13,(1,3)=14.
    val (mLat, _) = grid.sample(50.5, 4.5)
    assert(math.abs(mLat - (3.0 + 4.0 + 13.0 + 14.0) / 4) < 1e-12, s"mid $mLat")
    // outside the grid the edge extends (clamped indices)
    val (eLat, _) = grid.sample(40.0, 5.5)
    val (sLat0, _) = grid.sample(50.0, 5.5)
    assert(eLat == sLat0, "south-of-grid must extend the south row")
  }

  test("forward/inverse shift round trip < 1e-9 degrees on a smooth grid") {
    def smooth(f: (Int, Int) => Double) =
      Array.tabulate(5 * 7)(i => f(i / 7, i % 7))
    val g = Ntv2.Grid(180000.0, 3600.0, -28800.0, 3600.0, 5, 7,
      smooth((r, c) => 1.2 + 0.05 * r + 0.03 * c + 0.008 * r * c),
      smooth((r, c) => -0.9 + 0.04 * r - 0.02 * c + 0.006 * r * c))
    for (lat <- Seq(50.3, 51.7, 52.9); lon <- Seq(2.4, 4.8, 7.6)) {
      val (tLat, tLon) = g.forwardShift(lat, lon)
      // the shift is real (~tens of meters)
      assert(math.abs(tLat - lat) * 111320 > 10, "shift too small to test")
      val (sLat, sLon) = g.inverseShift(tLat, tLon)
      assert(math.abs(sLat - lat) < 1e-9 && math.abs(sLon - lon) < 1e-9,
        s"round trip ($lat,$lon) → ($sLat,$sLon)")
    }
  }

  test("fuzz: random smooth grids — codec round trip + inverse fixed point (100 cases)") {
    val rnd = new scala.util.Random(77)
    for (k <- 0 until 100) {
      val nR = 3 + rnd.nextInt(6)
      val nC = 3 + rnd.nextInt(6)
      val sLat = (20 + rnd.nextInt(40)) * 3600.0
      val eLonW = -(2 + rnd.nextInt(30)) * 3600.0
      val inc = Seq(1800.0, 3600.0, 7200.0)(rnd.nextInt(3))
      // smooth low-order fields with bounded gradients (the national-
      // grid shape; a few arcsec of shift, well-conditioned inverse)
      val a0 = rnd.nextDouble() * 4 - 2
      val ar = rnd.nextDouble() * 0.2 - 0.1
      val ac = rnd.nextDouble() * 0.2 - 0.1
      val b0 = rnd.nextDouble() * 4 - 2
      val br = rnd.nextDouble() * 0.2 - 0.1
      val bc = rnd.nextDouble() * 0.2 - 0.1
      def field(c0: Double, cr: Double, cc: Double) =
        Array.tabulate(nR * nC)(i => c0 + cr * (i / nC) + cc * (i % nC))
      val g = Ntv2.read(Ntv2.write(Ntv2.Grid(sLat, inc, eLonW, inc, nR, nC,
        field(a0, ar, ac), field(b0, br, bc))))
      assert(g.nRows == nR && g.nCols == nC, s"case $k dims")
      // interior geographic window of the grid, east-positive degrees
      val latLo = sLat / 3600.0
      val latHi = (sLat + (nR - 1) * inc) / 3600.0
      val lonLo = -(eLonW + (nC - 1) * inc) / 3600.0
      val lonHi = -eLonW / 3600.0
      for (_ <- 0 until 3) {
        val lat = latLo + rnd.nextDouble() * (latHi - latLo)
        val lon = lonLo + rnd.nextDouble() * (lonHi - lonLo)
        val (tLat, tLon) = g.forwardShift(lat, lon)
        val (sLat2, sLon2) = g.inverseShift(tLat, tLon)
        assert(math.abs(sLat2 - lat) < 1e-8 && math.abs(sLon2 - lon) < 1e-8,
          s"case $k round trip ($lat,$lon) → ($sLat2,$sLon2)")
      }
    }
  }

  test("big-endian .gsb reads identically (byte order detected from NUM_OREC)") {
    // Published national grids (e.g. Canada's NTV2_0.GSB) are
    // big-endian; build one by swapping every numeric field of the
    // little-endian writer output. Record layout: 11 overview + 11
    // subgrid 16-byte records (8-byte name + 8-byte value), then
    // nRows*nCols*4 float32s.
    val le = Ntv2.write(grid)
    val be = le.clone()
    def swap(off: Int, width: Int): Unit = {
      var a = off; var b = off + width - 1
      while (a < b) { val t = be(a); be(a) = be(b); be(b) = t; a += 1; b -= 1 }
    }
    // int32 values: NUM_OREC, NUM_SREC, NUM_FILE, GS_COUNT
    Seq(0, 1, 2, 11 + 10).foreach(r => swap(r * 16 + 8, 4))
    // float64 values: MAJOR/MINOR ellipsoids + subgrid boundaries
    ((7 to 10) ++ (11 + 4 to 11 + 9)).foreach(r => swap(r * 16 + 8, 8))
    // float32 grid records
    val data = 22 * 16
    (0 until grid.nRows * grid.nCols * 4).foreach(i => swap(data + i * 4, 4))
    val gLe = Ntv2.read(le)
    val gBe = Ntv2.read(be)
    assert(gBe.nRows == gLe.nRows && gBe.nCols == gLe.nCols)
    assert(gBe.sLatSec == gLe.sLatSec && gBe.latIncSec == gLe.latIncSec)
    assert(gBe.eLonWSec == gLe.eLonWSec && gBe.lonIncSec == gLe.lonIncSec)
    assert(gBe.latShiftSec.toSeq == gLe.latShiftSec.toSeq)
    assert(gBe.lonShiftWSec.toSeq == gLe.lonShiftWSec.toSeq)
  }

  test("garbage NUM_OREC fails naming both byte orders") {
    val bad = Ntv2.write(grid)
    bad(8) = 99 // 99 little-endian, 1660944384 big-endian — neither is 11
    val e = intercept[IllegalArgumentException](Ntv2.read(bad))
    assert(e.getMessage.contains("either byte order"), e.getMessage)
  }

  test("malformed files fail fast") {
    val good = Ntv2.write(grid)
    val e1 = intercept[IllegalArgumentException](Ntv2.read(good.take(100)))
    assert(e1.getMessage.contains("truncated"), e1.getMessage)
    // truncated INSIDE the subgrid header (past the 176-byte overview)
    val e1b = intercept[IllegalArgumentException](Ntv2.read(good.take(200)))
    assert(e1b.getMessage.contains("truncated"), e1b.getMessage)
    // truncated inside the grid records
    val e1c = intercept[IllegalArgumentException](Ntv2.read(good.take(23 * 16 + 8)))
    assert(e1c.getMessage.contains("truncated"), e1c.getMessage)
    // NUM_FILE=2: multi-subgrid unsupported
    val multi = good.clone()
    multi(2 * 16 + 8) = 2
    val e2 = intercept[IllegalArgumentException](Ntv2.read(multi))
    assert(e2.getMessage.contains("subgrid"), e2.getMessage)
    val junk = "NOTAGRID".getBytes("US-ASCII") ++ Array.fill[Byte](200)(0)
    val e3 = intercept[IllegalArgumentException](Ntv2.read(junk))
    assert(e3.getMessage.contains("magic"), e3.getMessage)
  }

  test("GridShifted composes over a base projection; round trips; real offset") {
    val base = Warp.ObliqueStereographic.rdNew
    val g = Ntv2.read(Ntv2.write(grid))
    val p = Warp.GridShifted(base, g)
    // the composed plane differs from the unshifted one by the shift
    // magnitude (tens to hundreds of meters at these test values)
    val (bx, by) = base.forward(52.0, 5.2)
    val (sx, sy) = p.forward(52.0, 5.2)
    val off = math.hypot(sx - bx, sy - by)
    assert(off > 50 && off < 2000, s"composed offset $off m")
    // WGS84 → plane → WGS84 round trip: grid inverse is 2-evaluation
    // fixed-point, base round trip is mm — composed stays < 1 cm
    for (lat <- Seq(50.4, 51.6); lon <- Seq(4.3, 6.1)) {
      val (x, y) = p.forward(lat, lon)
      val (la, lo) = p.inverse(x, y)
      assert(math.abs(la - lat) < 1e-7 && math.abs(lo - lon) < 1e-7,
        s"round trip ($lat,$lon) → ($la,$lo)")
    }
    // singularities delegate to the base
    assert(p.planeSingularities == base.planeSingularities)
  }
}
