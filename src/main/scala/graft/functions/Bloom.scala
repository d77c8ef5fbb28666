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
        TypeCheckResult.TypeCheckSuccess
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
  * Bloom filter (from [[BloomAgg]]) with a 64-bit hash. The blob
  * column is one scalar fanned out by a broadcast (single-row cross
  * join), so per-task it is the same byte array instance row after
  * row — the expression deserializes once per distinct array
  * (reference-keyed memo) and the per-row cost is the filter's bit
  * probes. Codegen keeps the whole-stage span via an instance
  * reference (same pattern as `km_argmax`). */
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

  // last-seen deserialized filter, keyed on the blob's reference: the
  // broadcast row hands every task the same backing array, so this is
  // a deserialize-once cache in the common case and merely a
  // deserialize-per-change slow path otherwise
  @transient private var cachedRef: AnyRef = _
  @transient private var cachedFilter: BloomFilter = _

  def probe(blob: AnyRef, hash: Long): Boolean = {
    if (!(blob eq cachedRef)) {
      cachedFilter = BloomFilter.readFrom(
        new ByteArrayInputStream(blob.asInstanceOf[Array[Byte]]))
      cachedRef = blob
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
