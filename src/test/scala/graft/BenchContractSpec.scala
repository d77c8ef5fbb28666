package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract surface of the bench harness (r17 verdict ask
  * #2/#8): the env contract must not regress to hard-coded values,
  * and the compact LAST stdout line — the only line the driver's
  * ~2000-char tail is guaranteed to parse — must carry the worst-15
  * per-query map and still fit, and must surface thrown queries. */
class BenchContractSpec extends AnyFunSuite {

  test("bench reads its data dir and core count from the driver env") {
    assert(Bench.envSfDir(Map("SPARK_GRAFT_SF_DIR" -> "/x/sf9")) == "/x/sf9")
    assert(Bench.envCpus(Map("SPARK_GRAFT_CPUS" -> "8")) == "8")
    // defaults only apply when the driver sets nothing
    assert(Bench.envSfDir(Map.empty).nonEmpty)
    assert(Bench.envCpus(Map.empty).nonEmpty)
  }

  test("compact last line fits the driver tail and carries worst-15 + failures") {
    // worst-case realistic naming: 216 queries with long names
    val qs = (1 to 216).map(i => f"e28_graph_search_variant_$i%03d" -> i / 7.0)
      .sortBy(-_._2)
    val line = Bench.compactLine(
      total = 271.63, warmTotal = 149.65, ordered = qs,
      qfailed = Seq("m6_multisignal_pairs"),
      stealShare = 0.03212, stealWorst = 0.19155,
      foreignShare = 0.02958, foreignWorst = 0.16145,
      quiet = false, warmQuiet = false, reruns = 3, slowReruns = 36,
      sfDir = "/root/testdata/sf0.1")
    assert(line.length < 1800, s"compact line too long: ${line.length}")
    assert(line.startsWith("{") && line.endsWith("}"))
    // the 15 slowest queries are inline (the driver's per-query and
    // scaling comparisons read these)
    assert(line.contains("\"top\":{"))
    assert(qs.take(15).forall { case (k, _) => line.contains("\"" + k + "\":") })
    assert(!line.contains("\"" + qs(15)._1 + "\":"))
    // a thrown query is named, not silently timed
    assert(line.contains("\"qfailed\":1"))
    assert(line.contains("\"failed_queries\":[\"m6_multisignal_pairs\"]"))
    // headline fields the driver already parses stay present
    Seq("\"metric\":\"total\"", "\"warm_total\":", "\"qcount\":216",
      "\"warm_quiet\":false", "\"runs_file\":\"bench_runs.jsonl\"")
      .foreach(f => assert(line.contains(f), f))
  }
}
