package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Seeded signed-random-projection hyperplanes — the single source of
  * truth shared by the native [[LshBands]] expression, the Column-level
  * helpers in [[graft.operators.LshBuckets]], and the DuckDB oracle SQL
  * generator (all three must compute bit-identical keys). Plays the
  * candidate-narrowing role of the reference's graph descent
  * (/root/reference/include/hnsw_index.h:search_layer restricts
  * comparisons structurally; sign-LSH restricts them probabilistically,
  * which is what distributes).
  */
object LshMath {
  /** `nPlanes` Gaussian hyperplanes of dimension `dim`, drawn from
    * scala.util.Random(seed) in row-major order. */
  def planes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }
}

/** lsh_bands(vec, dim, nTables, bitsPerTable, seed) → array<bigint> of
  * `nTables` LSH table keys: key(t) = t·2^bits + Σ_b [vec·plane(t,b) > 0]·2^b.
  *
  * One pass per row over a locally-copied primitive vector. The previous
  * Column-level formulation built `nTables × bitsPerTable` separate
  * `dot(vec, typedlit(plane))` subtrees — 128 expression nodes each
  * re-reading the ArrayData, which dominated `d_embed_lsh`'s runtime
  * (4.4 s at sf0.1 was plan-interpretation cost, not flops). Per-row cost
  * here is the fused dim×nTables×bits flop loop, so CodegenFallback's one
  * boxed call per row is irrelevant — the same treatment MinHashBands
  * applied to the minhash HOF blowup.
  *
  * The sign math is bit-identical to the old form: doubles accumulated in
  * plane-element order, `> 0` comparison — so persisted band keys, specs,
  * and the SQL oracle all stay valid.
  */
case class LshBands(child: Expression, dim: Int, nTables: Int,
    bitsPerTable: Int, seed: Long)
  extends UnaryExpression with CodegenFallback {

  require(nTables >= 1 && bitsPerTable >= 1 && bitsPerTable <= 62)

  override def prettyName: String = "lsh_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bands requires array<float>, got ${other.simpleString}")
  }

  @transient private lazy val planes: Array[Array[Float]] =
    LshMath.planes(dim, nTables * bitsPerTable, seed)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = v.getFloat(i).toDouble; i += 1 }
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var key = 0L
      var b = 0
      while (b < bitsPerTable) {
        val p = planes(t * bitsPerTable + b)
        var s = 0.0
        var j = 0
        while (j < n) { s += x(j) * p(j).toDouble; j += 1 }
        if (s > 0.0) key |= (1L << b)
        b += 1
      }
      out(t) = key + t.toLong * (1L << bitsPerTable)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
