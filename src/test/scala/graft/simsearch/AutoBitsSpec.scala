package graft.simsearch

import org.scalatest.funsuite.AnyFunSuite

/** The LSH band-width knob must keep bucket occupancy bounded at EVERY
  * corpus size — an upper cap would quietly return to superlinear
  * candidate growth past it (the failure mode the knob exists to
  * prevent). */
class AutoBitsSpec extends AnyFunSuite {

  test("e4AutoBits: calibration points, open-ended growth, bounded occupancy") {
    // measured calibration points (BENCH_sf1.md): the oracle fixture
    // and the 10× probe choices must not drift
    assert(SimQueries.e4AutoBits(2000L) == 6)
    assert(SimQueries.e4AutoBits(20000L) == 8)
    // occupancy n / 2^bits stays ≤ 100 at every size — including far
    // past any fixed ladder (the old 16-bit cap broke at ~6.55M)
    for (n <- Seq(1L, 100L, 65000L, 655000L, 6550000L,
      100000000L, 10000000000L)) {
      val b = SimQueries.e4AutoBits(n)
      assert(b >= 6 && b <= 62, s"n=$n bits=$b")
      assert(n.toDouble / math.pow(2.0, b) <= 100.0 + 1e-9,
        s"n=$n bits=$b occupancy ${n.toDouble / math.pow(2.0, b)}")
    }
    // monotone in n (a bigger corpus never narrows the bands)
    val sizes = Seq(1L, 1000L, 10000L, 100000L, 1000000L, 100000000L)
    val bits = sizes.map(SimQueries.e4AutoBits)
    assert(bits == bits.sorted, bits.toString)
  }
}
