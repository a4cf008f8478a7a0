package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine float math.
  *
  * IEEE-754 specifies `+ - * /` exactly, but leaves `log`/`log2` to the
  * platform's libm — Java and DuckDB may disagree in the last ulp, which
  * is fatal to a hash-compared oracle. For operators whose OUTPUT is a
  * log-derived score (e.g. unigram log-prob quality filtering), graft
  * computes log2 of positive integers via exponent extraction plus a
  * fixed-order atanh series: every step is an exactly-specified double
  * op, so Spark and DuckDB produce bit-identical results. The engine's
  * own `log2` only SEEDS the exponent estimate, which exact comparisons
  * then pin to the true integer — a wrong-by-ulp libm cannot change it.
  *
  * Absolute accuracy is ~1e-8 near odd powers (t -> 1/3 in the series),
  * which is far below any quality-score decision threshold; what matters
  * is that both engines compute the SAME value.
  *
  * [[log2Det]] (Column) and [[log2DetSql]] (DuckDB SQL, nested-lambda
  * let bindings) are the same expression tree by construction — any
  * edit must change both in lockstep.
  */
object DetMath {

  /** 1/ln(2) as the exact double both sides multiply by. */
  val InvLn2: Double = 1.0 / math.log(2.0)

  private val C3 = 1.0 / 3; private val C5 = 1.0 / 5
  private val C7 = 1.0 / 7; private val C9 = 1.0 / 9
  private val C11 = 1.0 / 11; private val C13 = 1.0 / 13

  /** Bit-reproducible log2 of a positive integral column (values must be
    * exactly representable as doubles, i.e. < 2^53 — counts always are). */
  def log2Det(c: Column): Column = {
    val cd = c.cast("double")
    val e0 = floor(log2(cd)) // estimate only; corrected exactly below
    val e = when(pow(lit(2.0), e0 + 1) <= cd, e0 + 1)
      .when(pow(lit(2.0), e0) > cd, e0 - 1)
      .otherwise(e0)
      .cast("double")
    val x = cd / pow(lit(2.0), e)
    val t = (x - lit(1.0)) / (x + lit(1.0))
    val t2 = t * t
    val series = t * (lit(1.0) + t2 * (lit(C3) + t2 * (lit(C5) +
      t2 * (lit(C7) + t2 * (lit(C9) + t2 * (lit(C11) + t2 * lit(C13)))))))
    e + lit(2.0) * series * lit(InvLn2)
  }

  /** The same computation as plain Scala over a positive long — for
    * bounded values already collected to the driver (e.g. one-row corpus
    * stats), where building the Column tree would cost more in plan
    * analysis than the value is worth. Bit-identical to [[log2Det]] /
    * [[log2DetSql]]: the exponent here is computed EXACTLY (bit length)
    * — the Column/SQL forms' estimate-then-correct dance pins the same
    * integer — and every subsequent op is the same exactly-specified
    * double arithmetic in the same order. */
  def log2DetLong(c: Long): Double = {
    require(c > 0 && c < (1L << 53), s"log2DetLong requires 0 < c < 2^53, got $c")
    val cd = c.toDouble
    val e = (63 - java.lang.Long.numberOfLeadingZeros(c)).toDouble
    val x = cd / math.pow(2.0, e) // 2^e exact for integral e
    val t = (x - 1.0) / (x + 1.0)
    val t2 = t * t
    val series = t * (1.0 + t2 * (C3 + t2 * (C5 + t2 * (C7 +
      t2 * (C9 + t2 * (C11 + t2 * C13))))))
    e + 2.0 * series * InvLn2
  }

  /** The same computation as DuckDB SQL over a scalar expression.
    * Nested single-element `list_transform`s serve as let-bindings so
    * each intermediate is computed once and the SQL stays compact. */
  def log2DetSql(cExpr: String): String =
    s"""list_transform([CAST(($cExpr) AS DOUBLE)], cd ->
       |  list_transform([list_transform([floor(log2(cd))], e0 ->
       |      CASE WHEN pow(2.0, e0+1.0) <= cd THEN e0+1.0
       |           WHEN pow(2.0, e0) > cd THEN e0-1.0 ELSE e0 END)[1]], e ->
       |    list_transform([(cd / pow(2.0, e) - 1.0) / (cd / pow(2.0, e) + 1.0)], t ->
       |      list_transform([t*t], t2 ->
       |        e + 2.0 * (t * (1.0 + t2*($C3 + t2*($C5 + t2*($C7 + t2*($C9 + t2*($C11 + t2*$C13))))))) * $InvLn2
       |      )[1])[1])[1])[1]""".stripMargin
}
