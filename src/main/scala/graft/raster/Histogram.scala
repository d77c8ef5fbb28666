package graft.raster

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** An equal-width histogram `(min, max, binCount, valueCount)` and the
  * reference's merge algorithm (`app/utils/stats.py:9-96`, itself
  * adapted from a public Stack Overflow answer): approximate each
  * source histogram by its `linspace(min, max, binCount)` points, pick
  * the finest source resolution for the merged binning, and re-bin the
  * approximated values — NOT Spark's `histogram_numeric` (a different
  * algorithm; SURVEY §2.4 A8).
  */
final case class Hist(min: Double, max: Double, binCount: Int, counts: Array[Long])

object Hist {

  /** Bin index of an approximated value in the merged histogram:
    * uniform bins over [gmin, gmax], right-most bin closed. The
    * operation order `(d - gmin) * nb / (gmax - gmin)` is part of the
    * engine contract (mirrored in SQL oracles). */
  def binIndex(d: Double, gmin: Double, gmax: Double, nb: Int): Int =
    math.min(math.floor((d - gmin) * nb / (gmax - gmin)).toLong, nb - 1L).toInt

  def mergeN(hs: Seq[Hist]): Option[Hist] = {
    if (hs.isEmpty) return None
    if (hs.size == 1) return Some(hs.head)
    val gmin = hs.map(_.min).min
    val gmax = hs.map(_.max).max
    if (gmax == gmin)
      return Some(Hist(gmin, gmax, 1, Array(hs.map(_.counts.sum).sum)))
    // finest resolution among NON-degenerate sources: a constant-valued
    // tile (min == max) has resolution 0, which would explode the bin
    // count to ceil(span/0) = Int.MaxValue and OOM the merge — its
    // spike still re-bins below, it just cannot vote on the binning
    val res = hs.collect {
      case h if h.max > h.min && h.binCount > 1 =>
        (h.max - h.min) / (h.binCount - 1)
    }
    val nb =
      if (res.isEmpty) hs.map(_.binCount).max // only distinct spikes
      else math.ceil((gmax - gmin) / res.min).toInt
    require(nb <= (1 << 24),
      s"histogram merge needs $nb bins (span ${gmax - gmin} at resolution " +
        s"${res.min}) — beyond the 16M-bin sanity bound; coarsen the sources")
    val counts = new Array[Long](nb)
    hs.foreach { h =>
      var i = 0
      while (i < h.binCount) {
        val c = h.counts(i)
        if (c > 0) {
          // linspace point i (np.linspace pins the endpoint exactly)
          val d =
            if (i == h.binCount - 1) h.max
            else h.min + ((h.max - h.min) / (h.binCount - 1)) * i
          counts(binIndex(d, gmin, gmax, nb)) += c
        }
        i += 1
      }
    }
    Some(Hist(gmin, gmax, nb, counts))
  }
}

/** `hist_merge(min, max, bin_count, value_count)` — aggregates per-tile
  * histograms into one global histogram with the reference's algorithm.
  * The buffer collects source histograms (one per tile — bounded by
  * tile count, not pixel count) and the final merge runs once at
  * `eval`, because the reference's n-way merge is not associative
  * pairwise: faithful semantics require merging the full list. */
case class HistMergeAgg(
    minExpr: Expression, maxExpr: Expression,
    binCountExpr: Expression, countsExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Hist]] {

  override def children: Seq[Expression] =
    Seq(minExpr, maxExpr, binCountExpr, countsExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (minExpr.dataType, maxExpr.dataType, binCountExpr.dataType, countsExpr.dataType) match {
      case (DoubleType, DoubleType, IntegerType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hist_merge expects (double, double, int, array<bigint>), got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("min", DoubleType), StructField("max", DoubleType),
    StructField("bin_count", IntegerType),
    StructField("value_count", ArrayType(LongType))))

  override def nullable: Boolean = true
  override def prettyName: String = "hist_merge"

  override def createAggregationBuffer(): ArrayBuffer[Hist] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[Hist], input: InternalRow): ArrayBuffer[Hist] = {
    val mn = minExpr.eval(input)
    val mx = maxExpr.eval(input)
    val bc = binCountExpr.eval(input)
    val vc = countsExpr.eval(input)
    if (mn != null && mx != null && bc != null && vc != null) {
      buf += Hist(mn.asInstanceOf[Double], mx.asInstanceOf[Double],
        bc.asInstanceOf[Int], vc.asInstanceOf[ArrayData].toLongArray())
    }
    buf
  }

  override def merge(a: ArrayBuffer[Hist], b: ArrayBuffer[Hist]): ArrayBuffer[Hist] = {
    a ++= b; a
  }

  override def eval(buf: ArrayBuffer[Hist]): Any =
    Hist.mergeN(buf.toSeq) match {
      case None => null
      case Some(h) => InternalRow(h.min, h.max, h.binCount, new GenericArrayData(h.counts))
    }

  override def serialize(buf: ArrayBuffer[Hist]): Array[Byte] = {
    val size = 4 + buf.map(h => 8 + 8 + 4 + 4 + 8 * h.counts.length).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.size)
    buf.foreach { h =>
      bb.putDouble(h.min).putDouble(h.max).putInt(h.binCount).putInt(h.counts.length)
      h.counts.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Hist] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = ArrayBuffer.empty[Hist]
    var i = 0
    while (i < n) {
      val mn = bb.getDouble; val mx = bb.getDouble
      val bc = bb.getInt; val cn = bb.getInt
      val cs = new Array[Long](cn)
      var j = 0
      while (j < cn) { cs(j) = bb.getLong; j += 1 }
      buf += Hist(mn, mx, bc, cs)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): HistMergeAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): HistMergeAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HistMergeAgg =
    copy(minExpr = cs(0), maxExpr = cs(1), binCountExpr = cs(2), countsExpr = cs(3))
}
