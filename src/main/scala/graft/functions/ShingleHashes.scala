package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingle hashers. Equivalent by construction to the
  * compositional forms (`transform(sequence(…), i -> polyhash(…))`)
  * but evaluated as one native loop per document row — higher-order
  * functions run their lambdas interpreted, which costs ~20× on the
  * shingling hot path (see Sketches). Hash = PolyHash's rolling hash
  * over the shingle's bytes, so values are identical to the SQL-oracle
  * formulation (ASCII text).
  */
private[functions] object Rolling {
  final val P = 2147483647L
  def hashRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) {
      h = (h * 131L + (bytes(i) & 0xff)) % P
      i += 1
    }
    h
  }
}

/** `ngram_hashes(text, n)`: hashes of every character n-gram.
  * Codegen emits a call to [[NGramHashes.compute]] so the expression
  * stays inside the whole-stage span (the loop itself gains nothing
  * from inlining; breaking the span around it does cost). */
case class NGramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ngram_hashes expects (string, int), got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "ngram_hashes"

  override protected def nullSafeEval(s: Any, nAny: Any): Any =
    NGramHashes.compute(s.asInstanceOf[UTF8String], nAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, n) =>
      s"graft.functions.NGramHashes.compute($s, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NGramHashes =
    copy(left = l, right = r)
}

object NGramHashes {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val count = bytes.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      out(i) = Rolling.hashRange(bytes, i, i + n)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `shingle_hashes(text, k)`: hashes of every k-word shingle, where
  * words split on single spaces and shingles re-join with a space —
  * i.e. the hash of the exact source substring spanning words
  * i..i+k-1 (space-joined text round-trips), matching
  * `polyhash(concat_ws(' ', w[i..i+k-1]))` byte for byte. Codegen
  * calls [[ShingleHashes.compute]] to keep the whole-stage span. */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects (string, int), got ${l.catalogString}, ${r.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(s: Any, kAny: Any): Any =
    ShingleHashes.compute(s.asInstanceOf[UTF8String], kAny.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) =>
      s"graft.functions.ShingleHashes.compute($s, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShingleHashes =
    copy(left = l, right = r)
}

object ShingleHashes {
  def compute(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    // word start offsets (split on ' ', empties preserved)
    val starts = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') starts += i + 1
      i += 1
    }
    val nWords = starts.length
    val count = nWords - k + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](count)
    var w = 0
    while (w < count) {
      val from = starts(w)
      val until =
        if (w + k < nWords) starts(w + k) - 1 // stop before the joining space
        else bytes.length
      out(w) = Rolling.hashRange(bytes, from, until)
      w += 1
    }
    new GenericArrayData(out)
  }
}
