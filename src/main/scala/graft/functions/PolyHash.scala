package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic polynomial rolling hash over a string's UTF-8 bytes:
  * `h = fold(0, b => (h*131 + b) % (2^31-1))`.
  *
  * This is the engine's shared text-hash primitive for document
  * fingerprinting, shingle hashing, MinHash and SimHash (SURVEY §2.8's
  * "training-data pipeline" extension surface). Two properties drive
  * the design:
  *
  *   - **Cross-engine reproducibility**: the fold is pure 64-bit
  *     integer arithmetic with all intermediates < 2^63, so the exact
  *     same values are computable in ANSI SQL on any engine (the
  *     DuckDB oracle mirrors it with a `list_reduce` over code points;
  *     for ASCII text code point == UTF-8 byte).
  *   - **Codegen speed**: implemented as a native Catalyst expression
  *     with `doGenCode`, so it stays inside whole-stage codegen — no
  *     boxing, no UDF serialization — and the per-shingle hot loop is
  *     a tight `byte[]` scan.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"polyhash requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "polyhash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 131L + (bytes(i) & 0xff)) % 2147483647L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $b = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = ($h * 131L + ($b[$i] & 0xff)) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
