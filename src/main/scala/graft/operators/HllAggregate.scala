package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.functions.GraftHash

/** HyperLogLog register sketch (Flajolet et al. 2007, the original
  * formulation — no HLL++ bias tables, so the estimator is replicable
  * in plain SQL) as a mergeable aggregation state: 256 one-byte
  * registers (p = 8, ±6.5 % standard error), elementwise-max merge.
  *
  * This is the distinct-count analog of [[TopKByScore]]: constant-size
  * state combined map-side, so a 100 TB distinct-count shuffles 256
  * bytes per (group, partition) instead of the distinct values
  * themselves (an exact countDistinct shuffles every unique key). The
  * hash is graft's own FNV-1a over the value's 8 LE bytes, finalized
  * with murmur3's fmix64 (raw FNV's top-bit avalanche is too weak for
  * register selection on sequential ids) — deterministic and seeded
  * nowhere — so registers, and therefore the estimate, are exactly
  * reproducible (and re-derived independently by the q_hll_distinct
  * DuckDB oracle in HUGEINT arithmetic).
  *
  * eval() returns the raw register array, not the estimate: registers
  * are the mergeable artifact (persist them, union them across days,
  * estimate at the end); [[graft.GraftSketch.hllEstimate]] turns them
  * into a count with cross-engine-deterministic float math.
  */
final class HllBuffer(val p: Int) {
  val m: Int = 1 << p
  private[operators] val regs = new Array[Byte](m)

  def add(value: Long): Unit = {
    val h = GraftHash.fmix64(GraftHash.fnv1a64OfLong(value))
    val idx = (h >>> (64 - p)).toInt
    val w = h & ((1L << (64 - p)) - 1)
    // rank of the first set bit within the (64-p)-bit window, 1-based;
    // an all-zero window ranks (64-p)+1
    val rho =
      if (w == 0L) 64 - p + 1
      else java.lang.Long.numberOfLeadingZeros(w) - (p - 1)
    if (rho > regs(idx)) regs(idx) = rho.toByte
  }

  def mergeFrom(other: HllBuffer): Unit = {
    var i = 0
    while (i < m) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
  }
}

/** hll_registers(value) → array<int> of 2^p max-rank registers. */
case class HllRegisters(
    child: Expression,
    p: Int = 8,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer]
  with org.apache.spark.sql.graft.LongInputTypes {

  require(p >= 4 && p <= 16, s"hll_registers requires 4 <= p <= 16, got $p")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buffer: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: HllBuffer, other: HllBuffer): HllBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: HllBuffer): Any =
    new GenericArrayData(buffer.regs.map(_.toInt))

  override def serialize(buffer: HllBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + buffer.m)
    out(0) = buffer.p.toByte
    System.arraycopy(buffer.regs, 0, out, 1, buffer.m)
    out
  }

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.regs, 0, buf.m)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
