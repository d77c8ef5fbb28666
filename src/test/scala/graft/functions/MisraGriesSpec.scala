package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pins the sketch guarantees t32 leans on: the merged candidate set
  * must contain every item with true count > N/(k+1), including under
  * adversarial partitionings where the heavy item is locally light
  * everywhere. */
class MisraGriesSpec extends AnyFunSuite {

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("single-pass summary surfaces every item above N/(k+1)") {
    val rnd = new Random(7)
    // zipf-ish stream over 500 items
    val stream = Seq.tabulate(20000)(_ => s"w${(1 / (rnd.nextDouble() + 1e-9)).toInt % 500}")
    val k = 50
    val s = MisraGries.summarize(stream.iterator, k)
    assert(s.size <= k)
    val heavy = exactCounts(stream).filter(_._2 > stream.size.toLong / (k + 1)).keySet
    assert(heavy.nonEmpty)
    assert(heavy.subsetOf(s.keySet), s"missing: ${heavy -- s.keySet}")
    // counters never overcount
    val exact = exactCounts(stream)
    for ((w, c) <- s) assert(c <= exact(w), s"$w overcounted")
  }

  test("merge keeps a globally heavy item that is light in every partition") {
    val k = 9
    // 10 partitions; 'hh' appears 5x per partition (globally 50 of 320,
    // strictly above N/(k+1) = 32); each partition's other 27 tokens
    // are unique junk, so 'hh' never dominates any single partition
    val parts = Seq.tabulate(10) { p =>
      val junk = Seq.tabulate(27)(i => s"junk_${p}_$i")
      new Random(p).shuffle(junk ++ Seq.fill(5)("hh"))
    }
    val n = parts.map(_.size).sum
    assert(50L > n.toLong / (k + 1))
    val merged = MisraGries.merge(parts.map(p => MisraGries.summarize(p.iterator, k)), k)
    assert(merged.size <= k)
    assert(merged.contains("hh"), s"lost the heavy hitter; kept ${merged.keySet}")
  }

  test("PAIRWISE tree merge keeps the guarantee (the t32 treeReduce shape)") {
    // the same adversarial corpus, merged as a binary tree instead of
    // one flat fold — MG is fully mergeable (Agarwal et al. 2012), so
    // any merge tree preserves the N/(k+1) survival bound
    val k = 9
    val parts = Seq.tabulate(10) { p =>
      val junk = Seq.tabulate(27)(i => s"junk_${p}_$i")
      new Random(p).shuffle(junk ++ Seq.fill(5)("hh"))
    }
    var layer = parts.map(p => MisraGries.summarize(p.iterator, k))
    while (layer.size > 1)
      layer = layer.grouped(2).map(g =>
        if (g.size == 1) g.head else MisraGries.merge(Seq(g(0), g(1)), k)).toSeq
    assert(layer.head.size <= k)
    assert(layer.head.contains("hh"),
      s"tree merge lost the heavy hitter; kept ${layer.head.keySet}")
  }
}
