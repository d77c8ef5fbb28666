package graft.functions

import scala.collection.mutable

/** Misra–Gries frequent-items summary (Misra & Gries 1982), with the
  * mergeable-summaries merge rule of Agarwal et al., PODS 2012 — the
  * heavy-hitter sketch behind t32: a bounded k-counter state whose
  * per-partition build + driver merge finds every item with true
  * frequency > N/(k+1) while shuffling NOTHING (the whole summary
  * fleet is k·#partitions counters).
  *
  * Guarantees used by the operator (and pinned in MisraGriesSpec):
  *   - build: each summary's counter undercounts its item's true
  *     partition count by at most n_p/(k+1);
  *   - merge (sum counters, then subtract the (k+1)-th largest and
  *     drop non-positives): undercounts add, so the merged summary
  *     undercounts by at most N/(k+1) total — any item with true
  *     count > N/(k+1) keeps a POSITIVE counter and therefore
  *     surfaces as a candidate. The candidate set is a guaranteed
  *     superset of the true heavy set; an exact second pass over the
  *     (broadcast-small) candidates makes the final answer exact.
  */
object MisraGries {

  /** One pass over `it` with at most `k` live counters. */
  def summarize(it: Iterator[String], k: Int): Map[String, Long] = {
    require(k >= 1)
    val m = mutable.HashMap.empty[String, Long]
    for (x <- it) {
      m.get(x) match {
        case Some(c) => m.update(x, c + 1)
        case None if m.size < k => m.update(x, 1L)
        case None =>
          // decrement-all step; drop counters that reach zero
          val dead = mutable.ArrayBuffer.empty[String]
          for ((w, c) <- m) {
            if (c == 1L) dead += w else m.update(w, c - 1)
          }
          dead.foreach(m.remove)
      }
    }
    m.toMap
  }

  /** Merge per-partition summaries back to at most `k` counters. */
  def merge(parts: Iterable[Map[String, Long]], k: Int): Map[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    for (p <- parts; (w, c) <- p) m.update(w, m.getOrElse(w, 0L) + c)
    if (m.size <= k) m.toMap
    else {
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.iterator.collect { case (w, c) if c > cut => w -> (c - cut) }.toMap
    }
  }
}
