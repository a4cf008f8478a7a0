package graft.operators

import java.nio.ByteBuffer

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
  *
  * State is two primitive arrays, not a boxed PriorityQueue: update()
  * runs once per (row × query) — tens of millions of calls per kNN job —
  * and the saturated-heap fast path (score worse than the current worst)
  * must be a single branch with zero allocation.
  */
final class TopKBuffer(val k: Int) {
  // binary max-heap by (score, id): slot 0 is the WORST retained
  private[operators] val scores = new Array[Double](k)
  private[operators] val ids = new Array[Long](k)
  private[operators] var size: Int = 0

  // total order via Double.compare: NaN ranks worst (evicted first) and
  // -0.0 < 0.0 — identical semantics to Ordering.Double.TotalOrdering,
  // which a bare `>` would lose (IEEE NaN comparisons are all false, so
  // a NaN score could lodge in the heap permanently)
  @inline private def greater(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 > i2)
  }

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      // grow: append + sift up
      var i = size
      scores(i) = score; ids(i) = id; size += 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (greater(scores(i), ids(i), scores(p), ids(p))) {
          val ts = scores(i); val ti = ids(i)
          scores(i) = scores(p); ids(i) = ids(p)
          scores(p) = ts; ids(p) = ti
          i = p
        } else i = 0
      }
    } else if (greater(scores(0), ids(0), score, id)) {
      // replace the worst + sift down
      scores(0) = score; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && greater(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && greater(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true
        else {
          val ts = scores(i); val ti = ids(i)
          scores(i) = scores(m); ids(i) = ids(m)
          scores(m) = ts; ids(m) = ti
          i = m
        }
      }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Ascending (score, id), NaN last. */
  def sorted: Array[(Double, Long)] =
    Array.tabulate(size)(i => (scores(i), ids(i)))
      .sorted(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
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
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)).putLong(buffer.ids(i)); i += 1
    }
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
