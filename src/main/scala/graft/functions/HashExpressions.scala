package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hashing expressions for dedup/fingerprinting.
  *
  * These exist because the equivalent higher-order-function formulation
  * (`transform(sequence(0,63), h -> array_min(transform(shingles, ...)))`)
  * re-evaluates every free subexpression once per lambda element — a
  * 64× × shingle-count interpreted blowup. A single expression consumes
  * the token array once per row and loops in tight JVM code instead.
  * Per-row cost is dominated by the internal loop, so CodegenFallback's
  * one boxed call per row is irrelevant.
  */
object GraftHash {
  /** FNV-1a 64-bit over raw bytes — deterministic, seed-mixable. */
  def fnv1a64(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Affine permutation family for minhash: h_i(x) = a_i * x + b_i
    * with odd multipliers derived from a splitmix-style generator. */
  def mixA(i: Int): Long = {
    var z = (i.toLong + 0x9e3779b97f4a7c15L) * 0xbf58476d1ce4e5b9L
    z ^= (z >>> 31); (z << 1) | 1L // force odd
  }
  def mixB(i: Int): Long = {
    var z = (i.toLong * 0x94d049bb133111ebL) + 0xda942042e4dd58b5L
    z ^= (z >>> 29); z
  }
}

/** minhash_signature(tokens, shingleWidth, numHashes) → array<bigint>.
  *
  * Word-shingles of width w are hashed once (FNV-1a over the joined
  * shingle), then each of the numHashes affine permutations takes a
  * running min — the standard one-hash MinHash estimator. Replaces the
  * reference's role of content identity at the document level (the
  * reference dedups vectors by id; a data pipeline dedups by content).
  */
case class MinHashSignature(
    child: Expression, shingleWidth: Int, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  require(shingleWidth >= 1 && numHashes >= 1)

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${other.simpleString}")
  }

  private lazy val as: Array[Long] = Array.tabulate(numHashes)(GraftHash.mixA)
  private lazy val bs: Array[Long] = Array.tabulate(numHashes)(GraftHash.mixB)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = math.max(n - shingleWidth + 1, 0)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < nShingles) {
      sb.setLength(0)
      var j = 0
      while (j < shingleWidth) {
        if (j > 0) sb.append(' ')
        val t = toks.getUTF8String(i + j)
        if (t != null) sb.append(t.toString)
        j += 1
      }
      val base = GraftHash.fnv1a64(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0L)
      var h = 0
      while (h < numHashes) {
        val v = as(h) * base + bs(h)
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    if (nShingles == 0) new GenericArrayData(Array.fill[Long](numHashes)(0L))
    else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_bands(tokens, shingleWidth, numHashes, numBands) → array<bigint>
  * of LSH band keys: the minhash signature is band-hashed internally, so
  * the whole shingling→minhash→banding pipeline is one pass per row (no
  * lambda re-evaluation, nothing recomputed). */
case class MinHashBands(
    child: Expression, shingleWidth: Int, numHashes: Int, numBands: Int)
  extends UnaryExpression with CodegenFallback {

  require(numHashes % numBands == 0, "numHashes must divide into numBands")
  private val rowsPerBand = numHashes / numBands

  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<string>, got ${other.simpleString}")
  }

  private lazy val sigExpr = MinHashSignature(child, shingleWidth, numHashes)

  override def nullSafeEval(input: Any): Any = {
    val sig = sigExpr.nullSafeEval(input).asInstanceOf[GenericArrayData]
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = 0xcbf29ce484222325L ^ b.toLong
      var r = 0
      while (r < rowsPerBand) {
        val v = sig.getLong(b * rowsPerBand + r)
        var k = 0
        while (k < 8) { h ^= ((v >>> (k * 8)) & 0xffL); h *= 0x100000001b3L; k += 1 }
        r += 1
      }
      bands(b) = h
      b += 1
    }
    new GenericArrayData(bands)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash64(tokens) → bigint. Per-token FNV-1a votes ±1 on each of 64
  * bit positions; the sign vector is the fingerprint. */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        val h = GraftHash.fnv1a64(t.getBytes, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** jaccard_sorted(a, b) → double: Jaccard similarity |A∩B| / |A∪B| of two
  * SORTED, DISTINCT string arrays via a single merge scan — no per-call
  * hash sets (array_intersect + array_union each build one), ~4× cheaper
  * in the quadratic inner loop of pairwise dedup. Callers must pre-sort
  * (`sort_array(array_distinct(...))`); order is checked nowhere for
  * speed. */
case class JaccardSorted(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "jaccard_sorted"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaccard_sorted requires array<string> inputs, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** rolling_hash64(text) → bigint: FNV-1a document fingerprint over UTF-8
  * bytes (the `t_fingerprint` operator). */
case class RollingHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "rolling_hash64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash64 requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    GraftHash.fnv1a64(input.asInstanceOf[UTF8String].getBytes, 0L)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
