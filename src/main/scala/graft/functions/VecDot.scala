package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two `array<double>` columns with a strict
  * left-to-right summation order.
  *
  * The similarity-search surface (cosine kNN / near-dup / IVF) needs a
  * dot product that is (a) fast — a primitive `double[]` loop inside
  * whole-stage codegen, no boxed `aggregate`/`zip_with` lambda chain —
  * and (b) bit-reproducible across engines: IEEE-754 addition is
  * exact-rounded per op, so any engine summing `a[i]*b[i]` in index
  * order produces the identical double, which the DuckDB oracle mirrors
  * with an index-ordered `list_reduce`.
  *
  * Arrays must be equal length (query-side contract); excess elements
  * on either side are ignored. Null elements are treated as 0.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<double> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getDouble(i) * y.getDouble(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `vec_sqdist(a, b, off, len)` → double: Σₖ (a[off+k] − b[off+k])²
  * for k in 0 until len (off ZERO-based), summed left-to-right — the
  * fused, codegen'd form of the subspace-distance HOF chain
  * `aggregate(zip_with(slice(a, off+1, len), slice(b, off+1, len),
  * (x, y) -> (x-y)*(x-y)), 0d, (acc, x) -> acc + x)` used by the PQ
  * family (e7/e10/e11). Per-op IEEE rounding and the index order are
  * identical, so for NULL-FREE arrays results are bit-equal to the
  * HOF formulation and the DuckDB oracles' index-ordered
  * `list_reduce` mirrors keep matching without change; what changes
  * is the cost — no per-row slice allocations, no interpreted
  * lambda, and the expression stays inside the whole-stage span.
  * Null elements diverge by design: the HOF chain null-propagates to
  * a NULL result, while this kernel skips null elements and returns
  * the partial sum over the non-null positions (nulls never occur on
  * the query surface, where embeddings are dense); missing tail
  * elements read as absent (loop bound clamps to the arrays'
  * lengths). */
case class VecSqDist(a: Expression, b: Expression,
                     off: Expression, len: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = off
  override def fourth: Expression = len

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType, off.dataType, len.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            org.apache.spark.sql.types.IntegerType,
            org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r, o, n) => TypeCheckResult.TypeCheckFailure(
        s"vec_sqdist requires (array<double>, array<double>, int, int), got " +
          s"${l.catalogString}, ${r.catalogString}, ${o.catalogString}, ${n.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_sqdist"

  override protected def nullSafeEval(av: Any, bv: Any, ov: Any, nv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    // clamp the start: a negative offset on UnsafeArrayData would
    // read header/null-bitmap memory before the element region
    val o = math.max(ov.asInstanceOf[Int], 0)
    val hi = math.min(o.toLong + nv.asInstanceOf[Int],
      math.min(x.numElements(), y.numElements()).toLong).toInt
    var acc = 0.0
    var i = o
    while (i < hi) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, bv, ov, nv) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $lo = java.lang.Math.max($ov, 0);
         |int $hi = (int) java.lang.Math.min((long) $lo + $nv,
         |  (long) java.lang.Math.min($av.numElements(), $bv.numElements()));
         |double $acc = 0.0;
         |for (int $i = $lo; $i < $hi; $i++) {
         |  if (!$av.isNullAt($i) && !$bv.isNullAt($i)) {
         |    double $d = $av.getDouble($i) - $bv.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): VecSqDist =
    copy(a = f, b = s, off = t, len = q)
}

/** `vec_signbits(v, off, len)` → bigint: bit k (0 ≤ k < len ≤ 64) set
  * iff v[off+k] > 0 — the sign-bit BINARY QUANTIZATION code word (1
  * bit per dimension; e17/e18's compression primitive). Packing 32
  * dims per word keeps every oracle-side mirror inside non-negative
  * BIGINT arithmetic (`1::BIGINT << k`, k < 32 — no sign-bit
  * wraparound to reason about in either engine), so a 64-d embedding
  * is two plain BIGINT columns: unlike an array sidecar, ordinary
  * columnar pruning serves a code-only scan, and Hamming distance is
  * two XOR+popcount ops (`bit_count(a ^ b)`), both codegen'd
  * built-ins. Null elements and positions past the array read as
  * "not set"; a negative offset clamps to 0 (the VecSqDist unsafe-
  * read guard). */
case class VecSignBits(v: Expression, off: Expression, len: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = v
  override def second: Expression = off
  override def third: Expression = len

  override def checkInputDataTypes(): TypeCheckResult =
    (v.dataType, off.dataType, len.dataType) match {
      case (ArrayType(DoubleType, _),
            org.apache.spark.sql.types.IntegerType,
            org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, o, n) => TypeCheckResult.TypeCheckFailure(
        s"vec_signbits requires (array<double>, int, int), got " +
          s"${a.catalogString}, ${o.catalogString}, ${n.catalogString}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_signbits"

  override protected def nullSafeEval(av: Any, ov: Any, nv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val o = math.max(ov.asInstanceOf[Int], 0)
    val hi = math.min(o.toLong + math.min(nv.asInstanceOf[Int], 64),
      x.numElements().toLong).toInt
    var acc = 0L
    var i = o
    while (i < hi) {
      if (!x.isNullAt(i) && x.getDouble(i) > 0) acc |= 1L << (i - o)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (av, ov, nv) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $lo = java.lang.Math.max($ov, 0);
         |int $hi = (int) java.lang.Math.min(
         |  (long) $lo + java.lang.Math.min($nv, 64),
         |  (long) $av.numElements());
         |long $acc = 0L;
         |for (int $i = $lo; $i < $hi; $i++) {
         |  if (!$av.isNullAt($i) && $av.getDouble($i) > 0) {
         |    $acc |= 1L << ($i - $lo);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): VecSignBits =
    copy(v = f, off = s, len = t)
}
