package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition followed by
  * canonical composition, UAX #15) as a native Catalyst expression —
  * the text-cleaning pass every web-scale corpus pipeline runs before
  * hashing or deduplicating: the same visible glyph can arrive as a
  * precomposed codepoint (é = U+00E9) or a base + combining-mark
  * sequence (e + U+0301), and every downstream exact-dup hash,
  * shingle, or token count treats the two as different documents
  * unless ingestion canonicalizes them.
  *
  * A native `Expression` rather than a UDF so the normalize call
  * stays inside whole-stage codegen (no encoder boxing, no closure
  * serialization); the JDK's `java.text.Normalizer` (ICU-equivalent
  * for the canonical forms) does the per-row work. The ASCII fast
  * path — `Normalizer.isNormalized` over the raw string — skips the
  * (allocating) normalize pass entirely, which at 100 TB is the
  * common case: real corpora are overwhelmingly already-NFC, and
  * `isNormalized` is a non-allocating scan.
  *
  * The DuckDB oracle mirrors it with the built-in `nfc_normalize`
  * (both implement the same published UAX #15 algorithm, so outputs
  * are byte-identical).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${t.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
