package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_agg(hash, expected_items, fpp)` → binary: a Bloom filter of
  * the input 64-bit hashes, built distributed (per-partition filters
  * OR-merged — `BloomFilter.mergeInPlace` is a bitwise OR, so the
  * merge is associative and commutative and the result is independent
  * of partitioning). `expected_items`/`fpp` must be literals: they
  * size the bit array, and partial buffers can only merge when every
  * partition built the same shape.
  *
  * The filter is a PREFILTER, not a truth source: membership can
  * false-positive (never false-negative), so callers must pair it
  * with an exact confirm — see `d10_bloom_gate`, whose oracle checks
  * the final (bloom-independent) answer. Scale story: the build is
  * one scan with bounded per-partition state (the bit array), the
  * blob broadcasts to the probe side, and the probe is a per-row
  * bitwise test with no shuffle. */
case class BloomAgg(
    hashExpr: Expression, itemsExpr: Expression, fppExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[Expression] = Seq(hashExpr, itemsExpr, fppExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (hashExpr.dataType, itemsExpr.dataType, fppExpr.dataType) match {
      case (LongType, LongType | IntegerType, DoubleType)
        if itemsExpr.foldable && fppExpr.foldable =>
        // the sizing params configure every partial buffer, so a NULL
        // or out-of-range literal must die at ANALYSIS, not as a
        // per-task MatchError/IllegalArgumentException on executors
        (itemsExpr.eval(), fppExpr.eval()) match {
          case (null, _) | (_, null) => TypeCheckResult.TypeCheckFailure(
            "bloom_agg sizing parameters must not be NULL")
          case (_, f: Double) if !(f > 0.0 && f < 1.0) =>
            TypeCheckResult.TypeCheckFailure(
              s"bloom_agg fpp must be in (0, 1), got $f")
          // a non-positive item count would otherwise be silently
          // clamped to 1 in createAggregationBuffer, producing a
          // near-100%-FP filter — fail fast like the fpp checks
          case (i: Int, _) if i <= 0 => TypeCheckResult.TypeCheckFailure(
            s"bloom_agg expected_items must be positive, got $i")
          case (l: Long, _) if l <= 0L => TypeCheckResult.TypeCheckFailure(
            s"bloom_agg expected_items must be positive, got $l")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_agg expects (bigint, foldable int/bigint, foldable double), got $other")
    }

  private lazy val expectedItems: Long = itemsExpr.eval() match {
    case i: Int => i.toLong
    case l: Long => l
  }
  private lazy val fpp: Double = fppExpr.eval().asInstanceOf[Double]

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(math.max(1L, expectedItems), fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val h = hashExpr.eval(input)
    if (h != null) buf.putLong(h.asInstanceOf[Long])
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b); a
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(off: Int): BloomAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BloomAgg =
    copy(hashExpr = cs(0), itemsExpr = cs(1), fppExpr = cs(2))
}

/** `bloom_might_contain(blob, hash)` → boolean: probe a serialized
  * Bloom filter (from [[BloomAgg]]) with a 64-bit hash.
  *
  * Pass the blob as a FOLDABLE expression (a binary literal /
  * `unbase64('…')` of a driver-held blob — what `d10_bloom_gate` and
  * `BloomGateStream` do): the filter then deserializes ONCE per task
  * (transient lazy val) and the per-row cost is the bit probes. A
  * non-foldable blob column still works but pays a per-row
  * `Arrays.equals` content check against the cached copy (row values
  * surface as fresh byte[] copies out of UnsafeRow, so a reference
  * memo never hits) — correct, but a memcmp per row; the scaladoc-
  * recommended shape is the literal. Codegen keeps the whole-stage
  * span via an instance reference (same pattern as `km_argmax`). */
case class BloomMightContain(blobExpr: Expression, hashExpr: Expression)
    extends BinaryExpression {

  override def left: Expression = blobExpr
  override def right: Expression = hashExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (blobExpr.dataType, hashExpr.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, bigint), got $other")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  // foldable fast path: one deserialization per task, zero per-row work
  @transient private lazy val foldedFilter: BloomFilter =
    if (blobExpr.foldable) {
      val b = blobExpr.eval()
      if (b == null) null
      else BloomFilter.readFrom(
        new ByteArrayInputStream(b.asInstanceOf[Array[Byte]]))
    } else null

  // non-foldable fallback: content-equality memo (reference identity
  // never holds — each row materializes its own byte[] copy)
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: BloomFilter = _

  def probe(blob: AnyRef, hash: Long): Boolean = {
    val folded = foldedFilter
    if (folded != null) return folded.mightContainLong(hash)
    val bytes = blob.asInstanceOf[Array[Byte]]
    if (cachedBytes == null || !java.util.Arrays.equals(cachedBytes, bytes)) {
      cachedFilter = BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      cachedBytes = bytes
    }
    cachedFilter.mightContainLong(hash)
  }

  override protected def nullSafeEval(blob: Any, hash: Any): Any =
    probe(blob.asInstanceOf[AnyRef], hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (b, h) => s"${ev.value} = $ref.probe($b, $h);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContain =
    copy(blobExpr = l, hashExpr = r)
}
