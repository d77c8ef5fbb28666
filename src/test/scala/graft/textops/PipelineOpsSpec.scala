package graft.textops

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Value-level invariants for the round-12 pipeline ops (the DuckDB
  * oracle pins exact parity; these pin the SEMANTIC contracts a
  * parity bug could silently preserve on both sides). */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("t26: chrome is gone, body anchor text survives, cut is non-vacuous") {
    val rows = q("t26_html_extract").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      // nav/footer/head stripped => the single BODY anchor remains
      assert(r.getAs[Int]("n_links") == 1, r.toString)
      assert(r.getAs[Long]("anchor_chars") == 11L, r.toString) // "read part N"
      val head = r.getAs[String]("head")
      assert(!head.contains("Home") && !head.contains("<"), head)
    }
    val kept = rows.map(_.getAs[Int]("kept")).toSet
    assert(kept == Set(0, 1), s"length cut is vacuous: kept flags $kept")
  }

  test("m18: resampled stream has exactly (n-1)*5/8+1 samples per doc") {
    import spark.implicits._
    val out = q("m18_audio_resample")
      .groupBy("doc_id").sum("n_samples")
      .as[(Long, Long)].collect().toMap
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "length(text) AS n")
      .where("n > 0").as[(Long, Long)].collect()
    assert(docs.nonEmpty)
    for ((id, n) <- docs)
      assert(out(id) == (n - 1) * 5 / 8 + 1, s"doc $id: n=$n out=${out(id)}")
    // scaled samples are bounded by 5*max|pcm| = 5*191
    val peaks = q("m18_audio_resample").agg(org.apache.spark.sql.functions
      .max("peak_x5")).head.getInt(0)
    assert(peaks <= 5 * 191, s"peak_x5 $peaks exceeds the scaled PCM range")
  }

  test("e21: degrees bounded by k, mutual edges bounded by degree") {
    val rows = q("e21_knn_graph").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val deg = r.getAs[Int]("out_degree")
      assert(deg >= 1 && deg <= 3, r.toString)
      assert(r.getAs[Int]("n_mutual") <= deg, r.toString)
    }
    // the graph must have SOME mutual structure or the mutuality
    // accounting is vacuous
    assert(rows.map(_.getAs[Int]("n_mutual")).sum > 0, "no mutual edges")
  }

  test("e22: per-cell keep counts match the 30%-prune closed form") {
    val rows = q("e22_proto_prune").collect()
    val byCell = rows.groupBy(_.getAs[Long]("cell"))
    assert(byCell.nonEmpty)
    for ((cell, rs) <- byCell) {
      val n = rs.head.getAs[Int]("cell_n")
      assert(rs.length == n, s"cell $cell: ${rs.length} rows, cell_n $n")
      val kept = rs.count(_.getAs[Int]("kept") == 1)
      // kept = ranks with rank*10 > 3n => n - floor(3n/10)
      assert(kept == n - (3 * n) / 10, s"cell $cell: n=$n kept=$kept")
      // ranks are a permutation of 1..n
      assert(rs.map(_.getAs[Int]("proto_rank")).sorted.sameElements(1 to n))
    }
  }

  test("t29: quotas sum exactly to the budget; remainders split both ways") {
    val rows = q("t29_mix_quota").collect()
    assert(rows.map(_.getAs[Long]("quota_tokens")).sum == 1000000L,
      "largest-remainder apportionment failed to conserve the budget")
    assert(rows.map(_.getAs[Int]("got_remainder")).toSet == Set(0, 1),
      "apportionment vacuous: every source rounded the same way")
  }

  test("w6: weekly actives dominate daily; the window visibly widens") {
    val rows = q("w6_rolling_active").collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Long]("wau_7d") >= r.getAs[Long]("dau"), r.toString)
    // after the ramp-in, a 7-day union must exceed a single day
    // somewhere or the fan-out is vacuous
    assert(rows.exists(r => r.getAs[Long]("wau_7d") > r.getAs[Long]("dau")),
      "WAU never exceeds DAU — the trailing window did nothing")
  }

  test("t28: blocklist verdicts are consistent and two-sided") {
    val rows = q("t28_badword_filter").collect()
    for (r <- rows)
      assert((r.getAs[Int]("n_hits") == 0) == (r.getAs[Int]("kept") == 1),
        r.toString)
    val kept = rows.map(_.getAs[Int]("kept")).toSet
    assert(kept == Set(0, 1), s"blocklist vacuous: kept flags $kept")
  }

  test("d15: source matrix is upper-triangular and mass-bounded") {
    val rows = q("d15_cross_source").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[String]("source_a") <= r.getAs[String]("source_b"),
        r.toString)
      // each pair's quantized jaccard lies in (500, 1000]
      val n = r.getAs[Long]("n_pairs")
      val mass = r.getAs[Long]("jacc_milli_sum")
      // >= on the lower edge: a kept pair at jaccard exactly 0.5
      // quantizes to 500 milli and is legitimate under the >= 0.5
      // keep rule
      assert(mass >= 500 * n && mass <= 1000 * n, r.toString)
    }
  }

  test("g12: z-order neighbors are spatially close; key order beats row order") {
    val rows = q("g12_zorder_layout")
      .select("c_custkey", "zx", "zy", "zkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length > 100)
    def meanAdjDist(sorted: Array[(Long, Long, Long, Long)]): Double =
      sorted.sliding(2).map { case Array(a, b) =>
        (math.abs(a._2 - b._2) + math.abs(a._3 - b._3)).toDouble
      }.sum / (sorted.length - 1)
    val byKey = meanAdjDist(rows.sortBy(r => (r._4, r._1)))
    // baseline = ARBITRARY arrival order (a deterministic scramble):
    // real crawl row order carries no spatial structure. (The
    // fixture's custkey order is itself a perfect spatial sort — the
    // lattice is a diagonal line — so it is NOT the honest baseline;
    // z-order loses to an exact 1-D spatial sort by design, that's
    // the curve's √-locality trade.)
    val scrambled = meanAdjDist(rows.sortBy(r => r._1 * 2654435761L % 1000003L))
    // the layout claim: consecutive z-order rows sit in nearby grid
    // cells, so row-group min/max stats stay tight under bbox filters
    assert(byKey * 5 < scrambled,
      f"z-order locality $byKey%.0f not < 1/5 of arrival order $scrambled%.0f")
  }

  test("w5: offset-0 cell retains the whole cohort; rates bounded") {
    val rows = q("w5_retention_cohorts").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Int]("week_offset") >= 0, r.toString)
      assert(r.getAs[Long]("retention_ppm") <= 1000000L, r.toString)
      if (r.getAs[Int]("week_offset") == 0)
        assert(r.getAs[Long]("n_users") == r.getAs[Long]("cohort_size"),
          s"cohort lost users at offset 0: $r")
    }
  }

  test("m19: only full fixed-shape clips ship, each spanning 480 ms") {
    val rows = q("m19_clip_sample").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Int]("n_frames") == 4, r.toString)
      // 4 sampled frames at stride-4 source frames, 40 ms apart
      assert(r.getAs[Double]("ts_end") - r.getAs[Double]("ts_start") == 480.0,
        r.toString)
    }
    // short videos (< 13 source frames) must produce NO clip — the
    // ragged-tail drop is observable, not vacuous
    val docsWithClips = rows.map(_.getAs[Long]("doc_id")).distinct.length
    val allDocs = graft.Tables.load(spark, sf, "documents")
      .where("length(text) > 0").count()
    assert(docsWithClips < allDocs, "every video produced a clip")
  }

  test("e23: recall is monotone in the probe budget, per query") {
    val rows = q("e23_probe_sweep").collect()
    val probes = rows.map(_.getAs[Int]("n_probes")).toSet
    assert(probes == Set(1, 2, 4), s"probe levels $probes")
    for ((qid, rs) <- rows.groupBy(_.getAs[Long]("query_id"))) {
      val m = rs.map(r => r.getAs[Int]("n_probes") -> r.getAs[Long]("hits")).toMap
      assert(m(1) <= m(2) && m(2) <= m(4),
        s"query $qid: probing more cells LOST neighbors: $m")
      assert(m(4) <= 5, s"query $qid: more hits than k: $m")
    }
  }

  test("d16: dropped lines are exactly the cross-doc repeats; order survives") {
    import spark.implicits._
    val rows = q("d16_line_dedup").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Int]("n_kept") + r.getAs[Int]("n_dropped") == r.getAs[Int]("n_lines"))
      val words = r.getAs[String]("clean_text").split(" ").filter(_.nonEmpty)
      assert(words.length >= r.getAs[Int]("n_kept"), r.toString) // >= : last line may be short
    }
    val dropped = rows.map(_.getAs[Int]("n_dropped").toLong).sum
    assert(dropped > 0, "no boilerplate found — the cut is vacuous")
    // a doc untouched by the cut round-trips its own text verbatim
    val clean = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "array_join(filter(split(text,' '), x -> x != ''), ' ') AS t")
      .as[(Long, String)].collect()
    val untouched = docs.filter { case (id, _) =>
      clean.contains(id) && clean(id).getAs[Int]("n_dropped") == 0 }
    assert(untouched.nonEmpty)
    for ((id, t) <- untouched)
      assert(clean(id).getAs[String]("clean_text") == t, s"doc $id reassembly drifted")
  }

  test("e25: hard negatives never share the anchor's label; the cut bites") {
    import spark.implicits._
    val labels = graft.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "label").as[(Long, Long)].collect().toMap
    val rows = q("e25_hard_negatives").collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(labels(r.getAs[Long]("neighbor_id")) != labels(r.getAs[Long]("query_id")),
        s"same-label pair leaked: $r")
    // the per-query predicate must actually change the answer vs the
    // unfiltered serving path for at least one query
    val hard = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val plain = q("e3_ann_ivf").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(hard != plain, "hard-negative cut is vacuous at this fixture")
  }

  test("t32: sketch-gated exact counts match a full groupBy") {
    import spark.implicits._
    val got = q("t32_heavy_hitters")
      .selectExpr("word", "n").as[(String, Long)].collect().toMap
    val full = graft.Tables.load(spark, sf, "documents")
      .selectExpr("explode(filter(split(text,' '), x -> x != '')) AS word")
      .groupBy("word").count().as[(String, Long)].collect()
    val total = full.map(_._2).sum
    val expect = full.filter(_._2 * 64 >= total).toMap
    assert(expect.nonEmpty && got == expect)
  }

  test("d17: exactly d3's pairs that touch the batch — no more, no less") {
    def pairs(name: String) = q(name).collect()
      .map(r => (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"))).toSet
    val full = pairs("d3_minhash_lsh_pairs")
    val inc = pairs("d17_incremental_pairs")
    assert(inc.nonEmpty && inc != full, "split must be non-vacuous")
    assert(inc.subsetOf(full))
    val expected = full.filter { case (a, b) => a % 10 >= 7 || b % 10 >= 7 }
    assert(inc == expected,
      s"missing ${expected -- inc}, extra ${inc -- expected}")
  }

  test("e27: teleport floor, isolated-node fixpoint, bounded mass") {
    val rows = q("e27_pagerank").collect()
    assert(rows.nonEmpty)
    var isolated = 0
    var connected = 0
    var mass = 0L
    for (r <- rows) {
      val rank = r.getAs[Long]("rank_micro")
      mass += rank
      assert(rank >= 150000L, r.toString)
      if (r.getAs[Int]("mdeg") == 0) {
        // no mutual edges => no inbound mass (edges are symmetric):
        // the node sits exactly on the teleport floor
        assert(rank == 150000L, r.toString)
        isolated += 1
      } else connected += 1
    }
    assert(isolated > 0 && connected > 0, "fixture must exercise both paths")
    // mass never exceeds teleport + full damping share of the start mass
    assert(mass <= rows.length * 1000000L)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
  }

  test("m17: bucket accounting conserves pairs and the cut is non-vacuous") {
    val rows = q("m17_clip_filter").collect()
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    val kept = rows.map(_.getAs[Long]("n_kept")).sum
    assert(total > 0 && kept > 0 && kept < total,
      s"threshold cut vacuous: kept $kept of $total")
    // kept pairs live exactly in buckets at/above the threshold bucket
    for (r <- rows) {
      val b = r.getAs[Int]("bucket")
      val nk = r.getAs[Long]("n_kept")
      if (b >= 2) assert(nk == r.getAs[Long]("n_pairs"), r.toString)
      if (b < 2) assert(nk == 0L, r.toString)
    }
  }
}
