package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.functions.GraftHash

/** Bloom filter (Bloom 1970) as mergeable aggregation state — the
  * semi-join-pruning companion of [[HllRegisters]]/[[CmsSketch]]. The
  * classic 100 TB join problem: the dim side's KEY SET is too large to
  * broadcast as a hash set, so the fact side must shuffle in full just
  * to discover that most of its rows match nothing. A Bloom summary of
  * the dim keys is fixed-size (numWords longs) whatever the key count:
  * broadcast it, filter the fact SCAN, and only surviving rows (matches
  * + the bounded false-positive mass) enter the join shuffle. False
  * positives are then removed by the exact join itself, so the final
  * result is EXACTLY the plain join's — which is why q_bloom_join sits
  * under the full hash gate with the un-bloomed SQL as its oracle.
  * (Spark's own runtime bloom pruning exists as an optimizer rule; this
  * is the explicit, deterministic, persistable form — build once, reuse
  * across queries, OR across days.)
  *
  * Bits are set by Kirsch–Mitzenmacher double hashing over graft's own
  * FNV-1a/fmix64 (h1 + i·h2, h2 forced odd; m a power of two) —
  * deterministic and seeded nowhere, so a persisted filter is
  * reproducible bit-for-bit. Merge is elementwise OR: bloom(A ∪ B) =
  * bloom(A) | bloom(B) exactly (spec-asserted), which is what makes the
  * map-side partial aggregation correct and lets filters union across
  * ingest batches without rebuilds.
  */
object BloomHash {
  private val Golden = 0x9e3779b97f4a7c15L

  /** Emitted filters carry a header word (magic tag in the high 32 bits,
    * numHashes in the low bits): a probe run with a different numHashes
    * than the filter was built with silently yields false negatives — the
    * one failure mode the Bloom contract rules out — so the build-side
    * hash count travels WITH the bits and the probe reads it from there
    * instead of trusting its caller. */
  val HeaderMagic: Long = 0x62664C4DL << 32 // "bfLM"
  def header(numHashes: Int): Long = HeaderMagic | numHashes.toLong
  def headerNumHashes(h: Long): Int = {
    require((h & 0xFFFFFFFF00000000L) == HeaderMagic,
      s"not a graft bloom filter: bad header word $h (missing magic)")
    val k = (h & 0xFFFFFFFFL).toInt
    require(k >= 1 && k <= 16, s"bloom header carries numHashes=$k, want 1..16")
    k
  }

  /** Bit index of probe `i` for `key` in an m-bit filter (m = 64·words,
    * power of two). */
  def bit(key: Long, i: Int, mBits: Int): Int = {
    val h1 = GraftHash.fmix64(GraftHash.fnv1a64OfLong(key))
    val h2 = GraftHash.fmix64(h1 ^ Golden) | 1L
    ((h1 + i.toLong * h2) & (mBits - 1)).toInt
  }
}

final class BloomBuffer(val numWords: Int, val numHashes: Int) {
  private[operators] val words = new Array[Long](numWords)
  private val mBits = numWords * 64

  def add(key: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val b = BloomHash.bit(key, i, mBits)
      words(b >>> 6) |= 1L << (b & 63)
      i += 1
    }
  }

  def mergeFrom(other: BloomBuffer): Unit = {
    var i = 0
    while (i < numWords) { words(i) |= other.words(i); i += 1 }
  }
}

/** bloom_filter(key) → array<bigint> of numWords OR-merged bit words. */
case class BloomFilterAgg(
    child: Expression,
    numWords: Int = 1024,
    numHashes: Int = 4,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer]
  with org.apache.spark.sql.graft.LongInputTypes {

  require(numWords >= 1 && (numWords & (numWords - 1)) == 0,
    s"bloom_filter requires numWords a power of 2, got $numWords")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_filter requires 1 <= numHashes <= 16, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_filter"

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(numWords, numHashes)

  override def update(buffer: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BloomBuffer, other: BloomBuffer): BloomBuffer = {
    buffer.mergeFrom(other); buffer
  }

  override def eval(buffer: BloomBuffer): Any = {
    val out = new Array[Long](1 + buffer.numWords)
    out(0) = BloomHash.header(buffer.numHashes)
    System.arraycopy(buffer.words, 0, out, 1, buffer.numWords)
    new GenericArrayData(out)
  }

  override def serialize(buffer: BloomBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * buffer.numWords)
    bb.putInt(buffer.numWords).putInt(buffer.numHashes)
    buffer.words.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new BloomBuffer(bb.getInt(), bb.getInt())
    var i = 0
    while (i < buf.numWords) { buf.words(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** bloom_might_contain(key, words) → boolean: true iff all numHashes
  * probe bits are set, with numHashes read from the filter's own header
  * word (never caller-supplied — a probe with a larger k than the build
  * would be a silent false-negative path). Never a false negative
  * (every inserted key's bits were set by construction); false
  * positives at the standard (1 - e^(-kn/m))^k rate. */
case class BloomMightContain(key: Expression, words: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = key
  override def right: Expression = words
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, words.dataType) match {
      case (LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (bigint, array<bigint>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val k = a.asInstanceOf[Long]
    val arr = b.asInstanceOf[ArrayData]
    require(arr.numElements() >= 2,
      s"bloom_might_contain expects header + words, got ${arr.numElements()} elements")
    val numHashes = BloomHash.headerNumHashes(arr.getLong(0))
    val numWords = arr.numElements() - 1
    // a filter with a non-power-of-two word count came from a different
    // geometry and would mask wrong bit indices — a silent false-negative
    // path, the one failure mode the Bloom contract rules out
    require((numWords & (numWords - 1)) == 0,
      s"bloom_might_contain expects a power-of-two word count, got $numWords")
    val mBits = numWords * 64
    var i = 0
    while (i < numHashes) {
      val bit = BloomHash.bit(k, i, mBits)
      if ((arr.getLong(1 + (bit >>> 6)) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(key = newLeft, words = newRight)
}
