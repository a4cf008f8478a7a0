package graft.operators

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a max-heap over (score, id) that keeps the k
  * smallest pairs seen. Mirrors the reference's result heap
  * (/root/reference/include/hnsw_index.h `NodeDist` priority queues,
  * engine.h:search_knn top_candidates) — but as an aggregation state that
  * Spark combines map-side, so only k rows per (group, partition) ever
  * cross the shuffle. This is the 100 TB-safe alternative to
  * `Window.orderBy(dist)` over a materialized cross join.
  */
final class TopKBuffer(val k: Int) {
  // max-heap: head is the WORST retained (largest (score, id))
  val heap: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))

  def insert(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wid) = heap.head
      if (score < ws || (score == ws && id < wid)) {
        heap.dequeue(); heap.enqueue((score, id))
      }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, id) => insert(s, id) }

  /** Ascending (score, id). */
  def sorted: Array[(Double, Long)] = heap.toArray.sortBy(identity)
}

/** Typed-imperative aggregate `top_k(score, id, k)` → array<struct<score,id>>
  * ascending. Partial aggregation (ObjectHashAggregate) keeps the heap
  * bounded on the map side.
  */
case class TopKByScore(
    score: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with org.apache.spark.sql.graft.DoubleLongInputTypes {

  require(k > 0, s"top_k requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKByScore.resultType
  override def prettyName: String = "v_top_k"

  // input contract (double, bigint) with analyzer-inserted widening
  // casts comes from DoubleLongInputTypes — without it a SQL caller
  // passing FLOAT/INT got executor ClassCastExceptions

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      buffer.insert(s.asInstanceOf[Double], p.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val arr = buffer.sorted.map { case (s, id) =>
      InternalRow(s, id): InternalRow
    }
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val items = buffer.heap
    val bb = ByteBuffer.allocate(8 + 16 * items.size)
    bb.putInt(buffer.k).putInt(items.size)
    items.foreach { case (s, id) => bb.putDouble(s).putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val kk = bb.getInt(); val n = bb.getInt()
    val buf = new TopKBuffer(kk)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), payload = newChildren(1))
}

object TopKByScore {
  val resultType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
}
