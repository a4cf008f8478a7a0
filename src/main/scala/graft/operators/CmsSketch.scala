package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.GraftHash

/** Count-min sketch (Cormode & Muthukrishnan 2005): d hash rows × w
  * counters estimate per-key frequencies with one-sided error — the
  * estimate NEVER undercounts, and overcounts by at most the collision
  * mass in the key's luckiest row. The frequency companion of
  * [[HllRegisters]]: d·w longs of mergeable state (elementwise SUM)
  * cross the shuffle instead of per-key counts, for heavy-hitter
  * screening over key spaces too wide to aggregate exactly.
  *
  * Counters are pure integer sums — order-independent and therefore
  * exactly reproducible with no float discipline needed; the
  * q/t oracle re-derives rows and counters in HUGEINT SQL. Row hashes
  * are FNV-1a seeded with the row index, finalized with fmix64. */
object CmsHash {
  def col(bytes: Array[Byte], row: Int, w: Int): Int =
    (GraftHash.fmix64(GraftHash.fnv1a64(bytes, row.toLong)) & (w - 1)).toInt
}

final class CmsBuffer(val d: Int, val w: Int) {
  private[operators] val counts = new Array[Long](d * w)

  def add(bytes: Array[Byte]): Unit = {
    var r = 0
    while (r < d) {
      counts(r * w + CmsHash.col(bytes, r, w)) += 1
      r += 1
    }
  }

  def mergeFrom(other: CmsBuffer): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
  }
}

/** cms_sketch(value) → array<bigint> of d·w counters (row-major). */
case class CmsSketch(
    child: Expression,
    d: Int = 4,
    w: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {

  require(d >= 1 && d <= 16, s"cms_sketch requires 1 <= d <= 16, got $d")
  require(w >= 2 && (w & (w - 1)) == 0, s"cms_sketch requires w a power of 2, got $w")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch requires a string input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(d, w)

  override def update(buffer: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].getBytes)
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: CmsBuffer): Any =
    new GenericArrayData(buffer.counts.clone())

  override def serialize(buffer: CmsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buffer.counts.length)
    bb.putInt(buffer.d).putInt(buffer.w)
    buffer.counts.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CmsBuffer(bb.getInt(), bb.getInt())
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** cms_estimate(key, counters) → bigint: min over the key's d counters
  * — ≥ the true count always, with overcount bounded by the luckiest
  * row's collision mass. */
case class CmsEstimate(key: Expression, regs: Expression,
    d: Int = 4, w: Int = 256)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = key
  override def right: Expression = regs
  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, regs.dataType) match {
      case (StringType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate requires (string, array<bigint>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val bytes = a.asInstanceOf[UTF8String].getBytes
    val counts = b.asInstanceOf[ArrayData]
    // a counters array from a different (d, w) geometry would index
    // with the wrong stride and could silently UNDERcount — the one
    // failure mode this sketch's contract rules out
    require(counts.numElements() == d * w,
      s"cms_estimate expects $d*$w counters, got ${counts.numElements()}")
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = counts.getLong(r * w + CmsHash.col(bytes, r, w))
      if (c < best) best = c
      r += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(key = newLeft, regs = newRight)
}
