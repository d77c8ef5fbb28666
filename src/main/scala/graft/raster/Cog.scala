package graft.raster

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Distributed cloud-optimized GeoTIFF build from a raster tile lake.
  *
  * The reference builds COG assets by shelling out to `gdal_translate
  * -of COG` on one node (`app/tasks/cog_assets.py:26-117`). The
  * straight port — mosaic every lake tile into one driver-side pixel
  * array — is driver-OOM by construction at reference grid scale
  * (10/40000 ⇒ ~10¹² px). Here the pixel work is distributed and the
  * driver never holds pixels:
  *
  *  1. every lake tile is cut into fragments keyed by the TIFF block
  *     (COG-internal tile) it lands in — one shuffle of ~image size,
  *     range-partitioned directly into the file's block order;
  *  2. executors assemble each block's samples (uncovered pixels fill
  *     with the declared `noData`; padding beyond the image edge
  *     stays 0, the TIFF convention the in-memory writer shares),
  *     derive the factor-2 average overview pyramid level by level
  *     (block-local halving is exact: block edges are even, so 2×2
  *     source groups never span a block — [[GeoTiff.halveBlock]]),
  *     and encode every block — no second shuffle: encode and the
  *     in-partition sort preserve the assembly partitioning;
  *  3. the driver collects byte COUNTS only (one int per block), lays
  *     out the IFDs, and streams the compressed blocks through
  *     `toLocalIterator` into the file — peak driver memory is ONE
  *     PARTITION of compressed blocks (≈ total compressed size /
  *     `spark.sql.shuffle.partitions`), plus the offset tables; size
  *     the partition count for the expected compressed volume.
  *
  * Byte-identical to [[GeoTiff.writeCog]] on integer lakes: both
  * paths share [[GeoTiff.encodeBlock]] and [[GeoTiff.assembleCog]],
  * so parity reduces to equal per-block sample arrays (pinned by
  * CogSpec).
  */
object Cog {

  /** A rectangle of samples bound for one TIFF block: `vals` is
    * rows×cols row-major, its top-left landing at (row0, col0)
    * inside the block. */
  private final case class Frag(row0: Int, col0: Int,
                                rows: Int, cols: Int,
                                vals: Array[Double])

  /** Build `path` as a COG from the lake's `band` column; returns the
    * lake tile count. Integer lakes encode as int32 (the legacy
    * in-memory writer's layout); float lakes as float64. Lake tiles
    * absent from the grid fill with `noData` (the reference's
    * gdal_translate mosaic fills with the declared nodata; 0 when the
    * asset declares none). */
  def buildFromLake(spark: SparkSession, lakeDir: String, band: String,
                    g: Grid, blockSize: Int, path: java.nio.file.Path,
                    compression: String = "deflate",
                    noData: Double = 0.0): Long = {
    require(blockSize > 0 && blockSize % 16 == 0,
      s"TIFF tile dimensions must be multiples of 16 (got $blockSize)")
    val B = blockSize
    val w = g.pxX
    val h = g.pxY
    val P = g.pxPerTile
    val df = spark.read.parquet(lakeDir).selectExpr("tx", "ty", s"`$band`")
    // validate the element type UP FRONT: an unsupported one must be
    // an immediate rejection, not a distributed MatchError storm
    val isFloat = df.schema(2).dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        import org.apache.spark.sql.types._
        et match {
          case DoubleType | FloatType => true
          case LongType | IntegerType | ShortType | ByteType => false
          case other => throw new IllegalArgumentException(
            s"band '$band' has element type $other — COG encode needs a numeric array")
        }
      case other => throw new IllegalArgumentException(
        s"band '$band' is $other, expected an array column")
    }
    val sampleType =
      if (isFloat) GeoTiff.SampleType.Float64 else GeoTiff.SampleType.Int32
    val compCode = GeoTiff.compressionCode(compression)
    val pred = GeoTiff.predictorFor(compCode, sampleType)
    def across(wl: Int): Int = (wl + B - 1) / B
    def ndown(hl: Int): Int = (hl + B - 1) / B
    val shufParts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    def partsFor(nBlocks: Long): Int =
      math.max(1L, math.min(shufParts.toLong, nBlocks)).toInt

    /** One shuffle: group fragments straight into the file's block
      * order (the range partitioner), assemble each block with the
      * `noData` fill clipped to the block's VALID region (padding
      * beyond the image edge stays 0 for writeCog parity). */
    def assemble(frags: RDD[(Long, Frag)], lw: Int, lh: Int)
        : RDD[(Long, Array[Double])] = {
      val aL = across(lw)
      val nBlocks = aL.toLong * ndown(lh)
      frags.groupByKey(new BlockRangePartitioner(partsFor(nBlocks), nBlocks))
        .mapPartitions(_.map { case (i, fs) =>
          val blk = new Array[Double](B * B)
          if (noData != 0.0) {
            val bx = (i % aL).toInt
            val by = (i / aL).toInt
            val bw = math.min(B, lw - bx * B)
            val bh = math.min(B, lh - by * B)
            var yy = 0
            while (yy < bh) {
              java.util.Arrays.fill(blk, yy * B, yy * B + bw, noData)
              yy += 1
            }
          }
          fs.foreach { f =>
            var yy = 0
            while (yy < f.rows) {
              System.arraycopy(f.vals, yy * f.cols, blk,
                (f.row0 + yy) * B + f.col0, f.cols)
              yy += 1
            }
          }
          (i, blk)
        }, preservesPartitioning = true)
    }

    val sc = spark.sparkContext
    val nTiles = spark.read.parquet(lakeDir).count() // footer-only scan

    // 1. base-level fragments, plus an empty fragment per block so
    //    blocks no lake tile covers still materialize as nodata.
    //    Block keys are LONG: a reference-scale grid (~10¹² px at a
    //    16-px block) has more than 2³¹ base blocks.
    val across0 = across(w)
    val down0 = ndown(h)
    val fill: RDD[(Long, Frag)] = sc.range(0, across0.toLong * down0)
      .map(i => (i, Frag(0, 0, 0, 0, Array.empty[Double])))
    val baseFrags: RDD[(Long, Frag)] = df.rdd.flatMap { r =>
      val tx = r.getInt(0)
      val ty = r.getInt(1)
      val vs = r.getSeq[Any](2)
      val gx0 = tx * P
      val gy0 = ty * P
      for {
        by <- (gy0 / B) to math.min((gy0 + P - 1) / B, down0 - 1)
        bx <- (gx0 / B) to math.min((gx0 + P - 1) / B, across0 - 1)
        x0 = math.max(gx0, bx * B)
        x1 = math.min(math.min(gx0 + P, (bx + 1) * B), w)
        y0 = math.max(gy0, by * B)
        y1 = math.min(math.min(gy0 + P, (by + 1) * B), h)
        if x1 > x0 && y1 > y0
      } yield {
        val cols = x1 - x0
        val rows = y1 - y0
        val vals = new Array[Double](rows * cols)
        var j = 0
        var yy = 0
        while (yy < rows) {
          val src0 = (y0 - gy0 + yy) * P + (x0 - gx0)
          var xx = 0
          while (xx < cols) {
            vals(j) = anyToDouble(vs(src0 + xx))
            j += 1
            xx += 1
          }
          yy += 1
        }
        (by.toLong * across0 + bx, Frag(y0 - by * B, x0 - bx * B, rows, cols, vals))
      }
    }

    // 2. assembled blocks per pyramid level (all persisted: each
    //    feeds both its encode and the next level's halving)
    case class Lvl(w: Int, h: Int, blocks: RDD[(Long, Array[Double])])
    val levels = scala.collection.mutable.ArrayBuffer(
      Lvl(w, h, assemble(baseFrags.union(fill), w, h)
        .persist(StorageLevel.MEMORY_AND_DISK)))
    while (math.max(levels.last.w, levels.last.h) > B) {
      val cur = levels.last
      val curW = cur.w
      val curH = cur.h
      val w2 = (curW + 1) / 2
      val h2 = (curH + 1) / 2
      val aL = across(curW)
      val aL2 = across(w2)
      val halved = cur.blocks.map { case (i, blk) =>
        val bx = (i % aL).toInt
        val by = (i / aL).toInt
        val bw = math.min(B, curW - bx * B)
        val bh = math.min(B, curH - by * B)
        val o = GeoTiff.halveBlock(blk, B, bw, bh, isFloat)
        ((by / 2).toLong * aL2 + bx / 2,
          Frag((by % 2) * (B / 2), (bx % 2) * (B / 2),
            (bh + 1) / 2, (bw + 1) / 2, o))
      }
      levels += Lvl(w2, h2, assemble(halved, w2, h2)
        .persist(StorageLevel.MEMORY_AND_DISK))
    }

    // 3. encode on executors; the driver sees sizes, then streams.
    // Assembly already range-partitioned each level into the file's
    // block order, so encode keeps the partitioning and only an
    // IN-PARTITION sort remains — no second full-data shuffle. The
    // per-partition sort buffer is the same volume `toLocalIterator`
    // later fetches per partition, so it sets no new memory bound.
    val encoded = levels.toSeq.map { lv =>
      lv.blocks.mapPartitions(_.map { case (i, blk) =>
          (i, GeoTiff.encodeBlock(Seq(blk), B, sampleType, pred, compCode))
        }, preservesPartitioning = true)
        .mapPartitions(it => it.toArray.sortBy(_._1).iterator,
          preservesPartitioning = true)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    try {
      val meta = levels.toSeq.zip(encoded).map { case (lv, enc) =>
        GeoTiff.CogLevelMeta(lv.w, lv.h, enc.map(_._2.length).collect())
      }
      GeoTiff.assembleCog(path, meta, B, 1, sampleType, pred, compCode,
        g.originLon, g.originLat, g.pixelDeg, g.pixelDeg, 4326,
        l => encoded(l).map(_._2).toLocalIterator)
    } finally {
      encoded.foreach(_.unpersist(blocking = false))
      levels.foreach(_.blocks.unpersist(blocking = false))
    }
    nTiles
  }

  /** Contiguous equal ranges of the block-index space — partition p
    * holds keys [p·n/parts, (p+1)·n/parts), so iterating partitions
    * in order (with keys sorted within each) yields the global
    * row-major block order `toLocalIterator` streams to the file. */
  private final class BlockRangePartitioner(parts: Int, nBlocks: Long)
      extends org.apache.spark.Partitioner {
    override def numPartitions: Int = parts
    override def getPartition(key: Any): Int = {
      val i = key.asInstanceOf[Long]
      math.min(parts - 1, (i * parts / nBlocks).toInt)
    }
  }

  private def anyToDouble(a: Any): Double = a match {
    case l: java.lang.Long => l.toDouble
    case d: java.lang.Double => d
    case i: java.lang.Integer => i.toDouble
    case f: java.lang.Float => f.toDouble
    case s: java.lang.Short => s.toDouble
    case b: java.lang.Byte => b.toDouble
    case null => 0.0
  }
}
