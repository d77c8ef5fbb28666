package graft.streaming

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Oracle-grade checks for the streaming gates (round-11 verdict ask
  * #8): the 13 ingestion gates were spec-only (batch-parity inside
  * ScalaTest); the three load-bearing ones — near-dup admission
  * (DedupStream), classifier curation (ClassifierGateStream) and
  * CLIP-score curation (ClipFilterStream) — now ALSO run through the
  * driver's DuckDB hash compare. Each query here executes a REAL
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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sg1_stream_classifier" -> (classifierStream _),
    "sg2_stream_clip" -> (clipStream _),
    "sg3_stream_dedup" -> (dedupStream _))

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
           |SELECT doc_id_b AS doc_id, doc_id_a AS dup_of, jaccard FROM p""".stripMargin)
  }
}
