package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of float-vector columns: the centroid primitive
  * (what KMeans recomputes each iteration, and what the reference's
  * neighbor-pruning heuristic implicitly averages over). Distributive:
  * partial (sum, count) buffers combine map-side, so a centroid over a
  * billion vectors shuffles one buffer per partition.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvgBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "v_avg"

  override def createAggregationBuffer(): VectorAvgBuffer = new VectorAvgBuffer

  override def update(buffer: VectorAvgBuffer, input: InternalRow): VectorAvgBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: VectorAvgBuffer, other: VectorAvgBuffer): VectorAvgBuffer = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: VectorAvgBuffer): Any =
    if (buffer.count == 0) null
    else new GenericArrayData(buffer.sums.map(_ / buffer.count))

  override def serialize(buffer: VectorAvgBuffer): Array[Byte] = {
    val n = if (buffer.sums == null) 0 else buffer.sums.length
    val bb = ByteBuffer.allocate(12 + 8 * n)
    bb.putLong(buffer.count).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buffer.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VectorAvgBuffer
    buf.count = bb.getLong()
    val n = bb.getInt()
    if (n > 0) {
      buf.sums = new Array[Double](n)
      var i = 0
      while (i < n) { buf.sums(i) = bb.getDouble(); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

final class VectorAvgBuffer {
  var sums: Array[Double] = _
  var count: Long = 0L

  def add(v: ArrayData): Unit = {
    val n = v.numElements()
    if (sums == null) sums = new Array[Double](n)
    val m = math.min(n, sums.length)
    var i = 0
    while (i < m) { sums(i) += v.getFloat(i); i += 1 }
    count += 1
  }

  def merge(other: VectorAvgBuffer): Unit = {
    if (other.sums != null) {
      if (sums == null) sums = new Array[Double](other.sums.length)
      val m = math.min(sums.length, other.sums.length)
      var i = 0
      while (i < m) { sums(i) += other.sums(i); i += 1 }
    }
    count += other.count
  }
}
