package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins the m14 quantized-DFT kernel at the unit level (the oracle
  * checks the full lake pass end-to-end): table values at the
  * cardinal angles, near-cancellation over full periods, re/im
  * linearity, and the defining property — a pure tone's power
  * concentrates in its own bin. */
class SpectrogramSpec extends AnyFunSuite {

  import MultimodalQueries.{specBins, specCos, specFreqs, specSin, specW}

  test("tables pin the cardinal angles") {
    assert(specFreqs.sameElements(Array(1, 2, 4, 8)))
    // bin k=1: cos starts at +1, zero at quarter period, -1 at half
    assert(specCos(0)(0) === 32768)
    assert(specCos(0)(16) === 0)
    assert(specCos(0)(32) === -32768)
    assert(specSin(0)(0) === 0)
    assert(specSin(0)(16) === 32768)
    assert(specSin(0)(48) === -32768)
    // bin k wraps bin 1's table: C[k][n] = C[1][(k·n) mod 64]
    for (bi <- specFreqs.indices; n <- 0 until specW) {
      assert(specCos(bi)(n) === specCos(0)(specFreqs(bi) * n % specW))
      assert(specSin(bi)(n) === specSin(0)(specFreqs(bi) * n % specW))
    }
  }

  test("a constant signal nearly cancels at every bin") {
    // Σ round(cos·2^15) over a full period is 0 up to rounding
    // asymmetry (Math.round is round-half-up, so ±half ties don't
    // cancel exactly); 64 samples bound the residue by 64
    val bins = specBins(Array.fill(specW)(100.toShort), 0, specW)
    bins.foreach { case (re, im, _) =>
      assert(math.abs(re) <= 64 * 100 && math.abs(im) <= 64 * 100)
    }
  }

  test("a pure tone concentrates power in its own bin") {
    val tone = Array.tabulate(specW)(n =>
      Math.round(50.0 * Math.cos(2.0 * Math.PI * 4 * n / specW)).toShort)
    val bins = specBins(tone, 0, specW)
    val own = bins(specFreqs.indexOf(4))._3
    specFreqs.indices.filter(specFreqs(_) != 4).foreach { bi =>
      assert(own > 100L * bins(bi)._3,
        s"bin ${specFreqs(bi)} power ${bins(bi)._3} vs own $own")
    }
  }

  test("re/im are linear in the signal; ragged tails use the table prefix") {
    val a = Array.tabulate(specW)(n => ((n * 7) % 23 - 11).toShort)
    val b = Array.tabulate(specW)(n => ((n * 13) % 31 - 15).toShort)
    val sum = Array.tabulate(specW)(n => (a(n) + b(n)).toShort)
    val (ba, bb, bs) = (specBins(a, 0, specW), specBins(b, 0, specW), specBins(sum, 0, specW))
    specFreqs.indices.foreach { bi =>
      assert(bs(bi)._1 === ba(bi)._1 + bb(bi)._1)
      assert(bs(bi)._2 === ba(bi)._2 + bb(bi)._2)
    }
    // a 10-sample tail correlates against table entries 0..9 of the
    // window it starts, not a re-based window
    val tail = specBins(a, 16, 26)
    specFreqs.indices.foreach { bi =>
      var re = 0L
      (16 until 26).foreach(i => re += a(i).toLong * specCos(bi)(i - 16))
      assert(tail(bi)._1 === re)
    }
  }
}
