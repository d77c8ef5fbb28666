package graft.textops

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d18's winnowing properties the oracle cannot see — the paper's
  * (Schleimer, Wilkerson & Aiken 2003) two guarantees, pinned on
  * synthetic corpora:
  *
  *   1. DETECTION: with k=3 and w=4, any shared word run of length
  *      >= k+w-1 = 6 yields at least one shared fingerprint (both
  *      docs winnow the same minimum inside the fully-shared window);
  *   2. ROBUST tie-break: equal hashes inside a window select the
  *      RIGHTMOST position (the rule that keeps fingerprint density
  *      at 2/(w+1) on low-entropy text instead of collapsing).
  *
  * Plus the df cap: a boilerplate fingerprint shared by > 50 docs
  * contributes NO pairs (the m22 fan-out lesson). */
class WinnowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Fingerprint extraction (the d18 fragment, position kept so the
    * tie-break is observable) over a (doc_id, text) view. */
  private val fpSql =
    """WITH w0 AS (SELECT doc_id, filter(split(text, ' '), x -> x != '') AS w
      |  FROM %SRC%),
      |g AS (SELECT doc_id, i AS pos,
      |    CAST(conv(substring(md5(concat_ws(' ', slice(w, i+1, 3))), 1, 10), 16, 10) AS BIGINT) AS gh
      |  FROM w0 LATERAL VIEW explode(sequence(0, size(w) - 3)) t AS i
      |  WHERE size(w) >= 3),
      |s AS (SELECT doc_id, pos,
      |    min(gh * 1048576 + (1048575 - pos)) OVER (PARTITION BY doc_id ORDER BY pos
      |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS sel
      |  FROM g)
      |SELECT DISTINCT doc_id, CAST(sel DIV 1048576 AS BIGINT) AS fp,
      |  CAST(1048575 - (sel % 1048576) AS INT) AS fp_pos
      |FROM s WHERE pos >= 3""".stripMargin

  private def fingerprints(docs: Seq[(Long, String)]): Seq[(Long, Long, Int)] = {
    import spark.implicits._
    docs.toDF("doc_id", "text").createOrReplaceTempView("winnow_fix")
    spark.sql(fpSql.replace("%SRC%", "winnow_fix"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
  }

  test("detection guarantee: a shared 6-word run always shares a fingerprint") {
    // disjoint filler vocabularies; the planted run is the ONLY overlap
    val run = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      1L -> s"p1 p2 p3 p4 $run p5 p6 p7",
      2L -> s"q1 q2 $run q3 q4 q5 q6 q7 q8")
    val fps = fingerprints(docs)
    val shared = fps.filter(_._1 == 1L).map(_._2).toSet
      .intersect(fps.filter(_._1 == 2L).map(_._2).toSet)
    assert(shared.nonEmpty,
      "docs sharing a k+w-1 run must share at least one fingerprint")
  }

  test("no shared 6-run, disjoint vocab: zero shared fingerprints") {
    val docs = Seq(
      1L -> "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10",
      2L -> "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10")
    val fps = fingerprints(docs)
    val shared = fps.filter(_._1 == 1L).map(_._2).toSet
      .intersect(fps.filter(_._1 == 2L).map(_._2).toSet)
    assert(shared.isEmpty)
  }

  test("robust tie-break selects the RIGHTMOST minimum") {
    // every 3-gram of a constant doc hashes identically, so every
    // window is an all-tie: rightmost selection puts the first
    // fingerprint at pos w-1 = 3 and one per window after; leftmost
    // would emit pos 0
    val fps = fingerprints(Seq(1L -> "x x x x x x x x x x"))
    assert(fps.nonEmpty)
    assert(fps.map(_._3).min == 3,
      s"first selected pos must be the first window's END, got ${fps.map(_._3).min}")
    // 8 grams -> windows end at pos 3..7, each selecting its own end
    assert(fps.map(_._3).sorted == Seq(3, 4, 5, 6, 7))
  }

  test("density: fingerprints per doc near 2/(w+1) of grams on random text") {
    val rnd = new scala.util.Random(7)
    val words = Vector("w1","w2","w3","w4","w5","w6","w7","w8","w9","w10",
      "w11","w12","w13","w14","w15","w16")
    val text = Seq.fill(400)(words(rnd.nextInt(words.length))).mkString(" ")
    val n = fingerprints(Seq(1L -> text)).length
    val grams = 400 - 2
    // expected 2/(w+1) = 0.4; duplicate (fp,pos) collapses push it
    // slightly below — accept a broad [0.25, 0.55] band
    assert(n > grams / 4 && n < grams * 11 / 20, s"density off: $n/$grams")
  }

  test("df cap: 60 identical docs produce no pair rows; sf0.001 end-to-end sane") {
    import spark.implicits._
    val boiler = (1L to 60L).map(i => (i, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"))
    // the d18 pair tail over the fixture, df cap included
    boiler.toDF("doc_id", "text").createOrReplaceTempView("winnow_fix")
    val pairs = spark.sql(
      """WITH f AS (%FP%),
        |fd AS (SELECT DISTINCT doc_id, fp FROM f),
        |dfc AS (SELECT fp FROM fd GROUP BY fp HAVING count(*) <= 50),
        |fk AS (SELECT fd.doc_id, fd.fp FROM fd JOIN dfc ON dfc.fp = fd.fp)
        |SELECT a.doc_id, b.doc_id FROM fk a JOIN fk b
        |ON a.fp = b.fp AND a.doc_id < b.doc_id""".stripMargin
        .replace("%FP%", fpSql.replace("%SRC%", "winnow_fix")))
      .collect()
    assert(pairs.isEmpty, "boilerplate beyond the df cap must not fan out")
    val rows = SparkEntry.queries("d18_winnow")(spark, "/root/testdata/sf0.001")
      .collect()
    for (r <- rows) {
      assert(r.getLong(0) < r.getLong(1), "pairs must be ordered a < b")
      assert(r.getLong(2) >= 3, "pair threshold is >= 3 shared fingerprints")
    }
  }
}
