package graft.raster

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** NTv2 grid-shift files (.gsb) — the National Transformation v2
  * binary format (Geomatics Canada; the public format proj consumes
  * via `+nadgrids=`). The reference warps non-WGS84 sources with
  * gdalwarp (`batch/scripts/unify_projection.sh:13-40`), and proj
  * applies a grid-shift datum transformation whenever the source CRS
  * references one — the accuracy class above 7-parameter Helmert
  * (NADCON/NTv2 grids carry the residual distortion a similarity
  * transform cannot).
  *
  * Scope: single-subgrid files, little-endian, `GS_TYPE SECONDS` —
  * the common case for national grids; multi-subgrid refinement
  * hierarchies are rejected with a message. The shift DIRECTION is
  * the format's: source datum → target, latitude shift in arc-seconds
  * ADDED, longitude shift in arc-seconds POSITIVE WEST (so an
  * east-positive longitude SUBTRACTS it). Node order is row-major
  * from the south row, within a row from the EAST boundary going
  * west (positive-west longitude increasing) — the ordering
  * Ntv2Spec pins against hand-placed nodes.
  */
object Ntv2 {

  /** A loaded subgrid. Boundaries/increments in arc-seconds,
    * longitudes POSITIVE WEST; shift arrays in file node order. The
    * arrays hold the float32 values the file stores, widened to
    * double — the SQL mirror embeds exactly these doubles, so
    * engine/oracle parity survives the format's precision. */
  final case class Grid(sLatSec: Double, latIncSec: Double,
                        eLonWSec: Double, lonIncSec: Double,
                        nRows: Int, nCols: Int,
                        latShiftSec: Array[Double],
                        lonShiftWSec: Array[Double]) extends Serializable {
    require(nRows >= 2 && nCols >= 2, s"grid needs ≥2×2 nodes ($nRows×$nCols)")
    require(latIncSec > 0 && lonIncSec > 0, "grid increments must be positive")
    require(latShiftSec.length == nRows * nCols &&
      lonShiftWSec.length == nRows * nCols,
      s"shift arrays must hold $nRows×$nCols nodes")

    /** Bilinear sample at a SOURCE-datum geographic position
      * (degrees, east-positive lon) → (dLatSec, dLonWestSec).
      * Outside the grid the edge value extends (index clamp) — the
      * proj convention for points marginally off a national grid.
      * The clamp/weight/fold arithmetic is mirrored EXACTLY by
      * [[inverseSelect]]; keep the association in sync. */
    def sample(latDeg: Double, lonDeg: Double): (Double, Double) = {
      // the COORDINATE clamps (not just the index), so off-grid
      // points take the edge value instead of extrapolating
      val fr = math.min(nRows - 1.0, math.max(0.0,
        (latDeg * 3600.0 - sLatSec) / latIncSec))
      val fc = math.min(nCols - 1.0, math.max(0.0,
        (-lonDeg * 3600.0 - eLonWSec) / lonIncSec))
      val r0 = math.min(nRows - 2.0, math.floor(fr))
      val c0 = math.min(nCols - 2.0, math.floor(fc))
      val wr = fr - r0
      val wc = fc - c0
      val i00 = (r0 * nCols + c0).toInt
      val i01 = i00 + 1
      val i10 = i00 + nCols
      val i11 = i10 + 1
      def interp(a: Array[Double]): Double =
        a(i00) * (1.0 - wr) * (1.0 - wc) + a(i01) * (1.0 - wr) * wc +
          a(i10) * wr * (1.0 - wc) + a(i11) * wr * wc
      (interp(latShiftSec), interp(lonShiftWSec))
    }

    /** Source datum → target (the grid's native direction). */
    def forwardShift(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val (dLat, dLonW) = sample(latDeg, lonDeg)
      (latDeg + dLat / 3600.0, lonDeg - dLonW / 3600.0)
    }

    /** Target → source datum: FIXED two-evaluation iteration (shift
      * sampled at the target seeds a corrected sample at the interim
      * source estimate). Error after the second evaluation is
      * second-order in the grid's gradient — sub-mm for real national
      * grids, and Ntv2Spec pins the round trip < 1e-9° on the test
      * grid. Exactly two evaluations, never adaptive: the SQL mirror
      * unrolls the same two, so engine and oracle agree to the ulp. */
    def inverseShift(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val (d1Lat, d1LonW) = sample(latDeg, lonDeg)
      val s1Lat = latDeg - d1Lat / 3600.0
      val s1Lon = lonDeg + d1LonW / 3600.0
      val (d2Lat, d2LonW) = sample(s1Lat, s1Lon)
      (latDeg - d2Lat / 3600.0, lonDeg + d2LonW / 3600.0)
    }

    /** SQL mirror of [[inverseShift]] (DuckDB dialect — list
      * literals): lateral aliases from target `$lat`/`$lon` (degrees)
      * to source-datum `gslat_`/`gslon_`, replaying the two unrolled
      * bilinear evaluations with the grid embedded as list literals.
      * One sample = the `smp` helper's op chain; association matches
      * [[sample]] term for term. */
    def inverseSelect(lat: String, lon: String): String = {
      def d(v: Double) = s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
      def arr(a: Array[Double]) = a.map(d).mkString("[", ", ", "]")
      // one bilinear evaluation: emits <p>lat_ / <p>lonw_ aliases
      def smp(p: String, la: String, lo: String): String =
        s"""least(${d(nRows - 1.0)}, greatest(0.0, (($la) * 3600.0 - ${d(sLatSec)}) / ${d(latIncSec)})) AS ${p}fr_,
           |least(${d(nCols - 1.0)}, greatest(0.0, (-($lo) * 3600.0 - ${d(eLonWSec)}) / ${d(lonIncSec)})) AS ${p}fc_,
           |least(${d(nRows - 2.0)}, floor(${p}fr_)) AS ${p}r0_,
           |least(${d(nCols - 2.0)}, floor(${p}fc_)) AS ${p}c0_,
           |${p}fr_ - ${p}r0_ AS ${p}wr_,
           |${p}fc_ - ${p}c0_ AS ${p}wc_,
           |CAST(${p}r0_ * $nCols + ${p}c0_ AS INT) + 1 AS ${p}i00_,
           |glat_[${p}i00_] * (1.0 - ${p}wr_) * (1.0 - ${p}wc_) + glat_[${p}i00_ + 1] * (1.0 - ${p}wr_) * ${p}wc_
           |  + glat_[${p}i00_ + $nCols] * ${p}wr_ * (1.0 - ${p}wc_) + glat_[${p}i00_ + $nCols + 1] * ${p}wr_ * ${p}wc_ AS ${p}lat_,
           |glonw_[${p}i00_] * (1.0 - ${p}wr_) * (1.0 - ${p}wc_) + glonw_[${p}i00_ + 1] * (1.0 - ${p}wr_) * ${p}wc_
           |  + glonw_[${p}i00_ + $nCols] * ${p}wr_ * (1.0 - ${p}wc_) + glonw_[${p}i00_ + $nCols + 1] * ${p}wr_ * ${p}wc_ AS ${p}lonw_""".stripMargin
      s"""${arr(latShiftSec)} AS glat_,
         |${arr(lonShiftWSec)} AS glonw_,
         |${smp("ga", lat, lon)},
         |($lat) - galat_ / 3600.0 AS gs1lat_,
         |($lon) + galonw_ / 3600.0 AS gs1lon_,
         |${smp("gb", "gs1lat_", "gs1lon_")},
         |($lat) - gblat_ / 3600.0 AS gslat_,
         |($lon) + gblonw_ / 3600.0 AS gslon_""".stripMargin
    }
  }

  // ------------------------------------------------------ .gsb codec

  private def rec(out: ByteArrayOutputStream, name: String,
                  value: Array[Byte]): Unit = {
    require(name.length == 8 && value.length == 8)
    out.write(name.getBytes("US-ASCII"))
    out.write(value)
  }
  private def dbl(v: Double): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
  private def int(v: Int): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def asc(s: String): Array[Byte] =
    s.padTo(8, ' ').take(8).getBytes("US-ASCII")

  /** Write a single-subgrid little-endian .gsb. Shift values are
    * stored as the format's float32 (accuracy fields write 0). */
  def write(grid: Grid, systemF: String = "SOURCE", systemT: String = "WGS84"): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    rec(out, "NUM_OREC", int(11))
    rec(out, "NUM_SREC", int(11))
    rec(out, "NUM_FILE", int(1))
    rec(out, "GS_TYPE ", asc("SECONDS"))
    rec(out, "VERSION ", asc("NTv2.0"))
    rec(out, "SYSTEM_F", asc(systemF))
    rec(out, "SYSTEM_T", asc(systemT))
    rec(out, "MAJOR_F ", dbl(6378137.0))
    rec(out, "MINOR_F ", dbl(6356752.314))
    rec(out, "MAJOR_T ", dbl(6378137.0))
    rec(out, "MINOR_T ", dbl(6356752.314))
    rec(out, "SUB_NAME", asc("SUB0"))
    rec(out, "PARENT  ", asc("NONE"))
    rec(out, "CREATED ", asc("20260101"))
    rec(out, "UPDATED ", asc("20260101"))
    rec(out, "S_LAT   ", dbl(grid.sLatSec))
    rec(out, "N_LAT   ", dbl(grid.sLatSec + (grid.nRows - 1) * grid.latIncSec))
    rec(out, "E_LONG  ", dbl(grid.eLonWSec))
    rec(out, "W_LONG  ", dbl(grid.eLonWSec + (grid.nCols - 1) * grid.lonIncSec))
    rec(out, "LAT_INC ", dbl(grid.latIncSec))
    rec(out, "LONG_INC", dbl(grid.lonIncSec))
    rec(out, "GS_COUNT", int(grid.nRows * grid.nCols))
    val bb = ByteBuffer.allocate(grid.nRows * grid.nCols * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < grid.nRows * grid.nCols) {
      bb.putFloat(grid.latShiftSec(i).toFloat)
      bb.putFloat(grid.lonShiftWSec(i).toFloat)
      bb.putFloat(0.0f) // LAT_ACC
      bb.putFloat(0.0f) // LONG_ACC
      i += 1
    }
    out.write(bb.array())
    out.write(asc("END     ") ++ Array.fill[Byte](8)(0))
    out.toByteArray
  }

  /** Read the (single) subgrid of a .gsb in either byte order. The
    * order is detected from NUM_OREC: its value 11 is unambiguous —
    * 11 read in the wrong endianness is 184549376, never 11 — so we
    * probe little-endian first and fall back to big-endian (most
    * published national grids, e.g. Canada's NTV2_0.GSB, are
    * big-endian). Values widen float32 → double, so a write→read
    * round trip reproduces [[write]]'s stored precision exactly. */
  def read(bytes: Array[Byte]): Grid = {
    require(bytes.length >= 11 * 16, "ntv2: truncated overview header")
    def name(off: Int): String =
      new String(bytes, off, 8, "US-ASCII")
    require(name(0) == "NUM_OREC", s"ntv2: bad magic '${name(0)}'")
    val le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val bb =
      if (le.getInt(8) == 11) le
      else ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val nOrec = bb.getInt(8)
    require(nOrec == 11,
      s"ntv2: NUM_OREC $nOrec unsupported in either byte order")
    val nFile = bb.getInt(2 * 16 + 8)
    require(nFile == 1,
      s"ntv2: $nFile subgrids — only single-subgrid files supported")
    val gsType = name(3 * 16 + 8)
    require(gsType.trim == "SECONDS", s"ntv2: GS_TYPE '$gsType' unsupported")
    require(bytes.length >= 22 * 16, "ntv2: truncated subgrid header")
    val sub = 11 * 16
    def subDbl(i: Int): Double = bb.getDouble(sub + i * 16 + 8)
    require(name(sub) == "SUB_NAME", "ntv2: subgrid header missing")
    val sLat = subDbl(4)
    val nLat = subDbl(5)
    val eLon = subDbl(6)
    val wLon = subDbl(7)
    val latInc = subDbl(8)
    val lonInc = subDbl(9)
    val count = bb.getInt(sub + 10 * 16 + 8)
    val nRows = math.rint((nLat - sLat) / latInc).toInt + 1
    val nCols = math.rint((wLon - eLon) / lonInc).toInt + 1
    require(nRows * nCols == count,
      s"ntv2: GS_COUNT $count != $nRows×$nCols from the boundaries")
    val data = sub + 11 * 16
    require(bytes.length >= data + count * 16, "ntv2: truncated grid records")
    val latS = new Array[Double](count)
    val lonS = new Array[Double](count)
    var i = 0
    while (i < count) {
      latS(i) = bb.getFloat(data + i * 16).toDouble
      lonS(i) = bb.getFloat(data + i * 16 + 4).toDouble
      i += 1
    }
    Grid(sLat, latInc, eLon, lonInc, nRows, nCols, latS, lonS)
  }
}
