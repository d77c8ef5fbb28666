package graft.raster

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TileLakeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = s"${sys.props("java.io.tmpdir")}/graft_tile_lake_spec"

  test("tile ids prune to the AOI bbox") {
    val g = SyntheticEnv.grid
    // bbox covering roughly the center 2x2 degrees
    val ids = TileLake.tileIdsForBbox(g, 1.2, 41.3, 2.8, 42.7)
    assert(ids.size < g.nTiles)
    assert(ids.contains("43N_001E") && ids.contains("42N_002E"))
    assert(!ids.contains("44N_000E")) // top-left tile: lat (43,44] outside
  }

  test("pruned scan reads only intersecting partitions") {
    TileLake.ensureWritten(spark, dir)
    val g = SyntheticEnv.grid
    val ids = TileLake.tileIdsForBbox(g, 1.2, 41.3, 2.8, 42.7)
    val pruned = TileLake.scanPruned(spark, dir, ids)
    assert(pruned.select("tile_id").distinct().count() == ids.size)
    // the filter lands in the scan's PartitionFilters (directory-level
    // pruning), not a post-scan Filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [tile_id"), plan.take(800))
  }
}
