package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming media gate drops perceptual near-dups (aHash Hamming
  * ≤ 3) of corpus PNGs, with batch parity: survivors equal the plain
  * Hamming predicate over the same hashes. */
class MediaDedupStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** A real 16×16 PNG from a gray formula. */
  private def png(gray: Int => Int): Array[Byte] = {
    val rgba = new Array[Byte](16 * 16 * 4)
    for (p <- 0 until 256) {
      val g = (gray(p) & 0xff).toByte
      rgba(p * 4) = g; rgba(p * 4 + 1) = g; rgba(p * 4 + 2) = g
      rgba(p * 4 + 3) = -1
    }
    graft.raster.Png.encode(16, 16, rgba)
  }

  // corpus: a checkerboard and a gradient
  private val checker = png(p => if ((p / 16 + p % 16) % 2 == 0) 200 else 40)
  private val gradient = png(p => p)
  // stream: an exact dup, a near-dup (checkerboard with a small patch
  // dimmed — flips at most a few sampled bits), and two fresh images
  private val nearChecker = png(p =>
    if (p < 24) 120 else if ((p / 16 + p % 16) % 2 == 0) 200 else 40)
  private val bands1 = png(p => if (p % 16 < 8) 220 else 20)
  private val rings = png(p => ((p / 16 - 8) * (p / 16 - 8) +
    (p % 16 - 8) * (p % 16 - 8)) * 3 % 256)

  private def hashOf(media: Array[Byte]): Long = {
    import spark.implicits._
    MediaDedupStream.corpusBands(
        Seq(Tuple1(media)).toDF("media"))
      .select("cph").head().getLong(0)
  }
  private def hd(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("gate drops near-dups of corpus media, passes fresh; batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpusHashes = Seq(checker, gradient).map(hashOf)
    val streamMedia = Seq(
      10L -> checker, 11L -> nearChecker, 12L -> bands1, 13L -> rings)
    val streamHashes = streamMedia.map { case (id, m) => id -> hashOf(m) }
    // the fixture must exercise BOTH sides of the threshold — assert
    // the crafted distances, so a drifted formula fails loudly here
    def minDist(h: Long): Int = corpusHashes.map(hd(h, _)).min
    assert(minDist(streamHashes(0)._2) == 0, "exact dup not at distance 0")
    assert(minDist(streamHashes(1)._2) <= 3 && minDist(streamHashes(1)._2) > 0,
      s"near-dup at ${minDist(streamHashes(1)._2)}")
    assert(minDist(streamHashes(2)._2) > 3 && minDist(streamHashes(3)._2) > 3,
      s"fresh at ${minDist(streamHashes(2)._2)}/${minDist(streamHashes(3)._2)}")
    val expected = streamHashes.collect {
      case (id, h) if minDist(h) > 3 => id
    }

    val corpus = Seq(1L -> checker, 2L -> gradient).toDF("doc_id", "media")
    val bands = MediaDedupStream.corpusBands(corpus).cache()
    bands.count()

    val stream = MemoryStream[(Long, Array[Byte])]
    val q = MediaDedupStream.gate(
        stream.toDF().toDF("doc_id", "media"), bands)
      .writeStream.format("memory").queryName("media_gate")
      .outputMode("append").start()
    stream.addData(streamMedia)
    q.processAllAvailable()
    val rows = spark.table("media_gate")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    q.stop()
    assert(rows == expected, s"stream=$rows expected=$expected")

    // batch parity: the gate on a STATIC frame gives the same set
    val static = MediaDedupStream.gate(
        streamMedia.toDF("doc_id", "media"), bands)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(static == expected, s"static=$static expected=$expected")
  }
}
