package graft.streaming

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Oracle-grade checks for the streaming gates (round-11 verdict ask
  * #8, widened round 14): the 13 ingestion gates were spec-only
  * (batch-parity inside ScalaTest); five now ALSO run through the
  * driver's DuckDB hash compare — near-dup admission (DedupStream),
  * classifier curation (ClassifierGateStream), CLIP-score curation
  * (ClipFilterStream), span-rewrite admission (SpanDedupStream — the
  * one stateful gate here, finalized via the sentinel trick below)
  * and URL dedup (UrlDedupStream). Each query here executes a REAL
  * Structured Streaming query (file source over the same parquet the
  * batch queries read → the gate transform → memory sink, drained
  * with Trigger.AvailableNow) and returns the sink's contents; the
  * oracle is the batch semantics the gate twins (d3's verified pair
  * set, t30's kept set, m17's kept set), so the stream path is held
  * to the same rows+schema+hash bar as every batch operator.
  *
  * Scale shape: the gates themselves are the scale story
  * (stream-static joins / stateless scans — see each gate's
  * scaladoc); the memory sink here is the CHECK harness, not the
  * production sink (S11's streaming download sinks are the
  * at-scale path). Sink contents are fixture-sized: the kept-doc
  * sliver or the verified pair sliver.
  */
object StreamingQueries extends QueryModule {

  /** Runs `gate` over a streaming read of `srcPath` (schema taken
    * from a batch read of the same files), drains it with
    * AvailableNow into a uniquely-named memory sink, and returns the
    * sink table. The name is per-call so bench reps / concurrent
    * sessions never collide; the tiny sink views accumulate only for
    * the session's lifetime. */
  /** The file streaming source requires a DIRECTORY; the driver
    * testdata tables are single parquet files, so a file path is
    * staged behind a content-tagged symlink dir (idempotent; the tag
    * carries mtime+length so regenerated testdata gets a fresh
    * stage). */
  private def asDir(srcPath: String): String = {
    val f = new java.io.File(srcPath)
    if (f.isDirectory) srcPath
    else {
      val tag = Integer.toHexString(
        (f.getAbsolutePath + "#" + f.lastModified + "#" + f.length).hashCode)
      val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sg_src_$tag")
      val link = new java.io.File(dir, f.getName)
      if (!link.exists()) {
        dir.mkdirs()
        try java.nio.file.Files.createSymbolicLink(
          link.toPath, f.toPath.toAbsolutePath)
        catch { case _: java.nio.file.FileAlreadyExistsException => () }
      }
      dir.getPath
    }
  }

  private def drained(spark: SparkSession, srcPath0: String)
                     (gate: DataFrame => DataFrame): DataFrame = {
    val srcPath = asDir(srcPath0)
    val schema = spark.read.parquet(srcPath).schema
    val stream = spark.readStream.schema(schema).parquet(srcPath)
    val sink = "sg_sink_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = gate(stream).writeStream
      .format("memory").queryName(sink)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sink)
  }

  private def classifierStream(spark: SparkSession, sfDir: String): DataFrame =
    drained(spark, s"$sfDir/documents.parquet") { docs =>
      ClassifierGateStream.gate(docs).selectExpr("doc_id", "lang")
    }

  private def clipStream(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.register(spark, sfDir)
    val lake = graft.multimodal.MediaLake.ensure(spark, sfDir)
    // the arriving side is the media pair; its claimed text embedding
    // joins STREAM-STATIC by id (the gate's ingestion shape)
    val emb = spark.table("embeddings")
      .selectExpr("vec_id AS doc_id", "embedding")
    drained(spark, lake) { media =>
      ClipFilterStream.gate(
          media.select("doc_id", "fmt", "media").join(emb, "doc_id"))
        .selectExpr("doc_id", "fmt")
    }
  }

  private def dedupStream(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.register(spark, sfDir)
    val index = DedupStream.corpusIndex(
      spark.table("documents").select("doc_id", "text"))
    drained(spark, s"$sfDir/documents.parquet") { docs =>
      // deterministic event time from the id — the fixture parquet
      // carries no timestamp; the gate's watermark state is exercised,
      // the output drops the synthetic column
      val stream = docs.selectExpr(
        "doc_id", "text",
        "timestamp_seconds(1700000000 + doc_id) AS ts")
      DedupStream.lshGate(stream, index)
        .selectExpr("doc_id", "dup_of", "jaccard")
    }
  }

  /** sg4/sg5 split the fixture the d10 way: doc_id % 10 < 7 is the
    * landed corpus (builds the gate's index), % 10 >= 7 arrives on
    * the stream — so both the pass and drop paths carry rows. */
  private val CorpusPred = "doc_id % 10 < 7"
  private val StreamPred = "doc_id % 10 >= 7"

  /** sg4's source dir: the documents symlink PLUS a one-row sentinel
    * parquet with a far-future event time. Append-mode aggregations
    * only emit once the watermark PASSES a group — without the
    * sentinel the single-batch AvailableNow run leaves every real
    * group within the watermark delay of the stream's max event time
    * and the sink stays empty. The sentinel (doc_id 9 999 999 999 →
    * ts ≈ +316 years) rides the same gate, pushes the final
    * watermark past every real group so the closing no-data batch
    * flushes them, and is itself the one group still withheld — so
    * it never appears in the output and the oracle needs no carve-out. */
  private def sentinelStage(spark: SparkSession, srcPath: String): String = {
    val f = new java.io.File(srcPath)
    // "#v2" bumps the stage tag: the sentinel CONTENT changed (see
    // below) and the staged dir is keyed on the SOURCE fingerprint
    // only, so old /tmp stages would otherwise keep serving the old
    // sentinel row forever
    val tag = Integer.toHexString(
      (f.getAbsolutePath + "#" + f.lastModified + "#" + f.length + "#v2").hashCode)
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_sg4_src_$tag")
    val sent = new java.io.File(dir, "zz_sentinel.parquet")
    if (!sent.exists()) {
      dir.mkdirs()
      val link = new java.io.File(dir, "a_documents.parquet")
      try java.nio.file.Files.createSymbolicLink(
        link.toPath, f.toPath.toAbsolutePath)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      val tmp = java.nio.file.Files.createTempDirectory("graft_sent").toFile
      // sentinel text derives from its own doc_id: the sentinel's one
      // span must SURVIVE the corpus anti-join to reach the watermark
      // node, and a corpus document whose trailing ragged span
      // happened to equal a fixed literal (the old 'zz') would filter
      // it — watermark never advances, sink drains empty, gate fails
      // opaquely. No real document can contain this text: doc ids are
      // dense small integers and the token embeds 9999999999.
      spark.read.parquet(srcPath).limit(1)
        .selectExpr("9999999999L AS doc_id",
          "'sentinel_9999999999' AS text", "lang",
          "source", "CAST(19 AS BIGINT) AS n_chars")
        .coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, sent.toPath)
    }
    dir.getPath
  }

  private def spanStream(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.register(spark, sfDir)
    val index = SpanDedupStream.spanIndex(
      spark.table("documents").where(CorpusPred).select("doc_id", "text"))
    drained(spark, sentinelStage(spark, s"$sfDir/documents.parquet")) { docs =>
      // sentinel doc_id % 10 = 9 passes StreamPred by design — it must
      // flow through the gate to advance the watermark
      val stream = docs.where(StreamPred).selectExpr(
        "doc_id", "text",
        "timestamp_seconds(1700000000 + doc_id) AS ts")
      SpanDedupStream.spanGate(stream, index)
        .selectExpr("doc_id", "n_kept", "md5(kept_text) AS kept_md5")
    }
  }

  private def urlStream(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.register(spark, sfDir)
    val urlExpr = graft.textops.TextQueries.UrlFixture.sparkMulti
    val corpus = spark.table("documents").where(CorpusPred)
      .selectExpr("doc_id", s"$urlExpr AS url")
    val blob = UrlDedupStream.corpusBloom(corpus)
    drained(spark, s"$sfDir/documents.parquet") { docs =>
      val stream = docs.where(StreamPred).selectExpr("doc_id", s"$urlExpr AS url")
      UrlDedupStream.gate(stream, corpus, blob).select("doc_id", "url")
    }
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sg1_stream_classifier" -> (classifierStream _),
    "sg2_stream_clip" -> (clipStream _),
    "sg3_stream_dedup" -> (dedupStream _),
    "sg4_stream_span" -> (spanStream _),
    "sg5_stream_url" -> (urlStream _))

  override def oracles: Map[String, String] = {
    val cls = graft.textops.TextQueries.ClassifierShape
    val nwE = cls.nw("text", spark = false)
    Map(
      // t30's kept set (the shared ClassifierShape scorer, DuckDB
      // dialect) — a document the stream admits is exactly a document
      // batch t30 counts as kept
      "sg1_stream_classifier" ->
        s"""SELECT doc_id, lang FROM documents
           |WHERE ${cls.logit("text", nwE, spark = false)} >= 0""".stripMargin,
      // m7/m17's shared pair-cosine chain at the m17 keep threshold;
      // fmt replays the lake's png/jpg split (MediaLake.isJpeg:
      // doc_id % 4 = 3 → jpg)
      "sg2_stream_clip" ->
        s"""WITH ${graft.multimodal.MultimodalQueries.clipPairOracleCtes}
           |SELECT doc_id,
           |  CASE WHEN doc_id % 4 = 3 THEN 'jpg' ELSE 'png' END AS fmt
           |FROM jn WHERE cosine >= 0.1""".stripMargin,
      // the SYMMETRIC closure of d3's verified pair set: every
      // incoming document flags against the whole corpus index, so
      // each unordered batch pair appears once per direction
      "sg3_stream_dedup" ->
        s"""WITH p AS (${graft.textops.TextQueries.oracles("d3_minhash_lsh_pairs")})
           |SELECT doc_id_a AS doc_id, doc_id_b AS dup_of, jaccard FROM p
           |UNION ALL
           |SELECT doc_id_b AS doc_id, doc_id_a AS dup_of, jaccard FROM p""".stripMargin,
      // sg4: the SpanShape replay (d9's DuckDB span CTEs) — corpus
      // spans index, stream spans anti-join it, then within-doc
      // keep-first rebuild; a stream doc losing every span is absent
      "sg4_stream_span" -> {
        val words = graft.textops.TextQueries.SpanShape.words
        s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           |sp AS (SELECT doc_id,
           |    [array_to_string(w[(i-1)*$words+1:(i-1)*$words+$words], ' ')
           |     for i in generate_series(1, CAST(ceil(len(w) / $words.0) AS BIGINT))] AS spans
           |  FROM w),
           |ch AS (SELECT doc_id, i - 1 AS idx, spans[i] AS span
           |  FROM sp, unnest(generate_series(1, len(spans))) AS t(i)),
           |corp AS (SELECT DISTINCT md5(span) AS h FROM ch WHERE $CorpusPred),
           |inc AS (SELECT doc_id, idx, span, md5(span) AS h
           |  FROM ch WHERE $StreamPred),
           |surv AS (SELECT doc_id, idx, span FROM inc ANTI JOIN corp USING (h)),
           |fk AS (SELECT doc_id, idx, span,
           |    min(idx) OVER (PARTITION BY doc_id, span) AS f FROM surv),
           |kept AS (SELECT doc_id, idx, span FROM fk WHERE idx = f)
           |SELECT doc_id, count(*)::BIGINT AS n_kept,
           |  md5(string_agg(span, ' ' ORDER BY idx)) AS kept_md5
           |FROM kept GROUP BY doc_id""".stripMargin
      },
      // sg5: the bloom-independent truth (the d10 convention): stream
      // rows whose canonical URL has no corpus match pass through
      "sg5_stream_url" -> {
        val urlExpr = graft.textops.TextQueries.UrlFixture.duckMulti
        val canon = graft.textops.TextQueries.UrlCanon.duckExpr("url")
        s"""WITH u AS (SELECT doc_id, $urlExpr AS url FROM documents),
           |norm AS (SELECT doc_id, url, $canon AS canon FROM u),
           |corp AS (SELECT DISTINCT canon FROM norm WHERE $CorpusPred),
           |inc AS (SELECT doc_id, url, canon FROM norm WHERE $StreamPred)
           |SELECT doc_id, url FROM inc
           |WHERE NOT EXISTS (SELECT 1 FROM corp WHERE corp.canon = inc.canon)""".stripMargin
      })
  }
}
