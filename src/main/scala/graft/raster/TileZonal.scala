package graft.raster

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-tile partial zonal aggregation: given co-registered pixel
  * arrays `keys` (group key per pixel), `vals` (fixed-point measure per
  * pixel) and `mask` (AOI ∧ WHERE per pixel), emits one
  * `(k, sum, cnt)` row per distinct key in the tile.
  *
  * This is the operator that makes zonal statistics scale: the shuffle
  * after it carries `#tiles × #distinct-keys` rows instead of
  * `#pixels` (a 10⁴–10⁶× reduction on real grids) — the same
  * partial→merge contract the reference's external geoprocessor
  * implements per tile (SURVEY §3.2 step 4). The final
  * `groupBy(k).sum` merge is exact because measures are 64-bit
  * fixed-point integers, which also makes results order-independent
  * and bit-reproducible across engines — no floating-point
  * accumulation anywhere in the aggregation tree.
  *
  * Null pixels (no-data) are skipped, matching the reference's nodata
  * exclusion semantics.
  */
case class TileZonal(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), ArrayType(BooleanType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "tile_zonal expects (array<bigint> keys, array<bigint> vals, array<boolean> mask), got " +
          s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("k", LongType), StructField("s", LongType),
    StructField("c", LongType))))

  override def prettyName: String = "tile_zonal"

  override protected def nullSafeEval(keysAny: Any, valsAny: Any, maskAny: Any): Any = {
    val keys = keysAny.asInstanceOf[ArrayData]
    val vals = valsAny.asInstanceOf[ArrayData]
    val mask = maskAny.asInstanceOf[ArrayData]
    val n = math.min(keys.numElements(), math.min(vals.numElements(), mask.numElements()))
    val sums = new java.util.HashMap[Long, Array[Long]]()
    var i = 0
    while (i < n) {
      if (!mask.isNullAt(i) && mask.getBoolean(i) &&
        !keys.isNullAt(i) && !vals.isNullAt(i)) {
        val k = keys.getLong(i)
        var acc = sums.get(k)
        if (acc == null) { acc = new Array[Long](2); sums.put(k, acc) }
        acc(0) += vals.getLong(i)
        acc(1) += 1L
      }
      i += 1
    }
    val out = new Array[Any](sums.size)
    val it = sums.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(e.getKey, e.getValue()(0), e.getValue()(1))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TileZonal =
    copy(first = f, second = s, third = t)
}
