package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 verdict ask #4: the steal gate was blind to SAME-BOX load
  * (`/proc/stat` steal only counts hypervisor preemption), so a
  * concurrent process could corrupt timings while the bench certified
  * quiet. The sampler now derives a foreign-busy share (host busy
  * minus this process's own jiffies); this spec proves a deliberately
  * self-loaded box FAILS certification by the sampler's own fields. */
class ContentionSamplerSpec extends AnyFunSuite {

  test("external spin load drives foreign_share above the quiet gate " +
    "and registers a burst window") {
    assume(new java.io.File("/proc/stat").exists(), "needs procfs")
    val sampler = new Bench.ContentionSampler
    // two spin processes ≈ 2/nproc of host capacity (6.25% at 32
    // cores) — foreign by construction: they are not this JVM
    val nLoad = 2
    val procs = (1 to nLoad).map { _ =>
      new ProcessBuilder("bash", "-c",
        "end=$((SECONDS+20)); while [ $SECONDS -lt $end ]; do :; done")
        .start()
    }
    try {
      val t0 = System.currentTimeMillis()
      Thread.sleep(13000) // > one 10-sample burst window at 1 Hz
      val t1 = System.currentTimeMillis()
      val (_, _, foreignShare, foreignWorst) = sampler.summary()
      val inWindow = sampler.foreignIn(t0, t1)
      // the quiet gate is foreign_share <= 0.02 (Bench.ForeignQuiet);
      // two spin loops must trip it in every derived field
      assert(foreignShare > 0.02,
        s"run-level foreign_share $foreignShare did not register the spin load")
      assert(inWindow > 0.02,
        s"windowed foreignIn $inWindow did not register the spin load")
      assert(foreignWorst > 0.02,
        s"worst-10s foreign $foreignWorst did not register the spin load")
      // and the burst list (what the re-run gate consults) flags the
      // loaded span at the 5% threshold once both spinners are up
      val bursts = sampler.bursts(0.04)
      assert(bursts.exists { case (b0, b1) => b0 < t1 && b1 > t0 },
        s"no foreign burst overlapped the loaded window (bursts=$bursts)")
    } finally procs.foreach(_.destroyForcibly())
  }
}
