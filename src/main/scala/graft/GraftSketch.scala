package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shims

import graft.functions.DetMath
import graft.operators.{BloomFilterAgg, BloomMightContain, CmsEstimate, CmsSketch, HllRegisters}

/** Column API over graft's sketch aggregates, plus the estimator math
  * shared — literal for literal, op for op — with the DuckDB oracle
  * generator so sketch results sit under the full hash gate. */
object GraftSketch {

  /** Mergeable HLL register array (2^p bytes of state, map-side
    * combined). Input is cast to bigint: the sketch hashes the value's
    * 8 LE bytes. */
  def hllRegisters(value: Column, p: Int = 8): Column =
    Shims.column(HllRegisters(Shims.expression(value.cast("long")), p)
      .toAggregateExpression())

  /** Mergeable count-min counters (d·w longs, elementwise-sum merge). */
  def cmsSketch(value: Column, d: Int = 4, w: Int = 256): Column =
    Shims.column(CmsSketch(Shims.expression(value), d, w)
      .toAggregateExpression())

  /** Never-undercounting frequency estimate of `key` from counters. */
  def cmsEstimate(key: Column, regs: Column, d: Int = 4, w: Int = 256): Column =
    Shims.column(CmsEstimate(Shims.expression(key), Shims.expression(regs), d, w))

  /** Mergeable Bloom bit words over a bigint key (numWords longs of
    * state, OR-merged map-side) — broadcastable semi-join pruning for
    * dim key sets too large to broadcast exactly. */
  def bloomFilter(key: Column, numWords: Int = 1024, numHashes: Int = 4): Column =
    Shims.column(BloomFilterAgg(Shims.expression(key.cast("long")),
      numWords, numHashes).toAggregateExpression())

  /** No-false-negative membership probe against [[bloomFilter]] words.
    * numHashes travels in the filter's header word — build and probe
    * cannot disagree. */
  def bloomMightContain(key: Column, words: Column): Column =
    Shims.column(BloomMightContain(Shims.expression(key.cast("long")),
      Shims.expression(words)))

  /** α_m·m² of the raw-HLL estimator, computed once here so the Spark
    * plan and the SQL oracle consume the IDENTICAL double. */
  def alphaM2(p: Int): Double = {
    val m = (1 << p).toDouble
    0.7213 / (1.0 + 1.079 / m) * m * m
  }

  val Ln2: Double = math.log(2.0)

  /** Registers → estimated distinct count (bigint). Raw harmonic-mean
    * estimator with Flajolet's small-range linear-counting correction;
    * the register fold runs in index order and ln(m/V) goes through
    * [[DetMath.log2Det]], so the double is bit-identical across engines. */
  def hllEstimate(regs: Column, p: Int = 8): Column = {
    val m = 1 << p
    val s = aggregate(regs, lit(0.0), (acc, r) => acc + pow(lit(2.0), -r))
    val v = size(filter(regs, r => r === 0))
    val eRaw = lit(alphaM2(p)) / s
    val lin = lit(m.toDouble) *
      ((lit(p.toDouble) - DetMath.log2Det(v)) * lit(Ln2))
    floor(when(eRaw <= lit(2.5 * m) && v > 0, lin).otherwise(eRaw) + 0.5)
      .cast("long")
  }

  /** The same estimator over a DuckDB list expression — the same
    * literals and the same evaluation order as [[hllEstimate]]. */
  def hllEstimateSql(regsExpr: String, p: Int = 8): String = {
    val m = 1 << p
    val s = s"list_reduce(list_prepend(0.0, " +
      s"list_transform($regsExpr, r -> pow(2.0, -r))), (a, b) -> a + b)"
    val v = s"len(list_filter($regsExpr, r -> r = 0))"
    val lin = s"$m.0 * ((${p}.0 - ${DetMath.log2DetSql(v)}) * $Ln2)"
    s"floor(CASE WHEN ${alphaM2(p)} / $s <= ${2.5 * m} AND $v > 0 " +
      s"THEN $lin ELSE ${alphaM2(p)} / $s END + 0.5)::BIGINT"
  }
}
