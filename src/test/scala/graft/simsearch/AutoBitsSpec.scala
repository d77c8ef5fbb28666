package graft.simsearch

import org.scalatest.funsuite.AnyFunSuite

/** The LSH band-width knob must keep the CANDIDATE BUDGET — bucket
  * occupancy × table count, the expected verify work per vector —
  * bounded at EVERY corpus size, so total candidates scale ∝ n.
  * (Round 7 bounded occupancy alone; the round-8 100× probe measured
  * that rule at exponent 1.91 — with occupancy pinned near its cap,
  * candidates grew as occupancy × tables. See BENCH_sf1.md.) */
class AutoBitsSpec extends AnyFunSuite {

  test("e4AutoBits: calibration points, open-ended growth, bounded budget") {
    // calibration points (BENCH_sf1.md): the oracle fixture sizes
    // must keep choosing the brute-force-oracle-equal 6 bits, and the
    // probe decades must not drift from their measured rows
    assert(SimQueries.e4AutoBits(500L) == 6)
    assert(SimQueries.e4AutoBits(2000L) == 6)
    assert(SimQueries.e4AutoBits(20000L) == 10)
    assert(SimQueries.e4AutoBits(200000L) == 14)
    // budget (n / 2^bits) × 8·bits stays ≤ ~1600 at every size —
    // including far past any fixed ladder
    for (n <- Seq(1L, 100L, 65000L, 655000L, 6550000L,
      100000000L, 10000000000L)) {
      val b = SimQueries.e4AutoBits(n)
      assert(b >= 6 && b <= 62, s"n=$n bits=$b")
      assert(n.toDouble / math.pow(2.0, b) * (8.0 * b) <= 1600.0 + 1e-9,
        s"n=$n bits=$b budget ${n.toDouble / math.pow(2.0, b) * 8.0 * b}")
    }
    // monotone in n (a bigger corpus never narrows the bands)
    val sizes = Seq(1L, 1000L, 10000L, 100000L, 1000000L, 100000000L)
    val bits = sizes.map(SimQueries.e4AutoBits)
    assert(bits == bits.sorted, bits.toString)
  }
}
