package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salting for hot join/aggregation keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; salting is
  * the declarative fallback when one key dominates so heavily that even
  * split partitions bottleneck (e.g. a single viral document id, a null
  * bucket). The skewed side fans each row into one of `factor` salted
  * keys; the replicated side duplicates every row across all `factor`
  * salts — shuffle then spreads the hot key over `factor` reducers.
  */
object Salting {

  /** Deterministic salt in [0, factor) derived from a stable column (so
    * re-runs shuffle identically — no rand(), which would break retries
    * of failed stages). */
  def salt(stable: Column, factor: Int): Column =
    pmod(hash(stable), lit(factor))

  /** Salted inner equi-join: `left` is the skewed side. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      factor: Int, stableLeftCol: String): DataFrame = {
    val l = left.withColumn("__salt", salt(col(stableLeftCol), factor))
    val r = right
      .withColumn("__salt", explode(lit((0 until factor).toArray)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial agg on (key, salt), final agg
    * on key. `aggs` must be algebraic (sum/count/min/max style). */
  def saltedCount(df: DataFrame, key: String, factor: Int,
      stableCol: String): DataFrame =
    df.withColumn("__salt", salt(col(stableCol), factor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n"))
}
