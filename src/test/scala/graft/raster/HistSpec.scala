package graft.raster

import org.scalatest.funsuite.AnyFunSuite

class HistSpec extends AnyFunSuite {

  test("single histogram passes through") {
    val h = Hist(0, 10, 4, Array(1L, 2L, 3L, 4L))
    assert(Hist.mergeN(Seq(h)).get eq h)
    assert(Hist.mergeN(Nil).isEmpty)
  }

  test("merge preserves total count") {
    val a = Hist(0, 10, 5, Array(5L, 0L, 3L, 2L, 1L))
    val b = Hist(5, 25, 5, Array(2L, 2L, 2L, 2L, 2L))
    val m = Hist.mergeN(Seq(a, b)).get
    assert(m.counts.sum == a.counts.sum + b.counts.sum)
    assert(m.min == 0 && m.max == 25)
  }

  test("resolution comes from the finest source") {
    // a: width (10-0)/(5-1) = 2.5 ; b: width (25-5)/(5-1) = 5
    val a = Hist(0, 10, 5, Array(1L, 1L, 1L, 1L, 1L))
    val b = Hist(5, 25, 5, Array(1L, 1L, 1L, 1L, 1L))
    val m = Hist.mergeN(Seq(a, b)).get
    assert(m.binCount == math.ceil((25.0 - 0.0) / 2.5).toInt) // 10 bins
  }

  test("re-binning follows linspace approximation") {
    // two identical-range histograms merge to aligned bins: counts add
    val a = Hist(0, 12, 4, Array(1L, 2L, 3L, 4L))
    val b = Hist(0, 12, 4, Array(10L, 20L, 30L, 40L))
    val m = Hist.mergeN(Seq(a, b)).get
    // linspace(0,12,4) = 0,4,8,12; width 4; nb=3; values 0→bin0, 4→bin1, 8→bin2, 12→bin2
    assert(m.binCount == 3)
    assert(m.counts.toSeq == Seq(11L, 22L, 77L))
  }

  test("degenerate zero-range collapses to one bin") {
    val a = Hist(5, 5, 3, Array(1L, 0L, 2L))
    val b = Hist(5, 5, 3, Array(4L, 0L, 0L))
    val m = Hist.mergeN(Seq(a, b)).get
    assert(m.binCount == 1 && m.counts.toSeq == Seq(7L))
  }

  test("a constant tile merges with a real one without exploding bins") {
    // the spike's zero resolution must not vote on the binning (it
    // used to drive bin count to ceil(span/0) = Int.MaxValue → OOM)
    val spike = Hist(2.0, 2.0, 6, Array(0L, 0L, 0L, 0L, 0L, 9L))
    val real = Hist(0.0, 10.0, 6, Array(1L, 1L, 1L, 1L, 1L, 1L))
    val m = Hist.mergeN(Seq(spike, real)).get
    assert(m.binCount == 5, s"binCount ${m.binCount}") // ceil(10 / (10/5))
    assert(m.counts.sum == 15L)
    // the spike's mass lands in the bin containing 2.0
    assert(m.counts(Hist.binIndex(2.0, 0.0, 10.0, m.binCount)) >= 9L)
  }

  test("two distinct spikes merge over the global span") {
    val a = Hist(1.0, 1.0, 4, Array(3L, 0L, 0L, 0L))
    val b = Hist(9.0, 9.0, 4, Array(0L, 0L, 0L, 5L))
    val m = Hist.mergeN(Seq(a, b)).get
    assert(m.binCount == 4 && m.counts.sum == 8L)
    assert(m.counts.head == 3L && m.counts.last == 5L)
  }

  test("endpoint value lands in the last (closed) bin") {
    assert(Hist.binIndex(10.0, 0.0, 10.0, 5) == 4)
    assert(Hist.binIndex(0.0, 0.0, 10.0, 5) == 0)
  }
}
