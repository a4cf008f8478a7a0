package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.Shims
import graft.functions._
import graft.operators.TopKByScore

/** Public Column API over graft's native Catalyst vector expressions.
  * The Spark-side equivalent of the reference's distance kernel + top-k
  * machinery (/root/reference/include/distance.h, engine.h:search_knn).
  */
object GraftVector {
  /** Euclidean L2 distance between two float-array columns. */
  def l2(a: Column, b: Column): Column =
    Shims.column(L2Distance(Shims.expression(a), Shims.expression(b)))

  /** Squared L2 distance (the reference's native metric). */
  def l2Sq(a: Column, b: Column): Column =
    Shims.column(L2SqDistance(Shims.expression(a), Shims.expression(b)))

  /** Inner product. */
  def dot(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    Shims.column(CosineSimilarity(Shims.expression(a), Shims.expression(b)))

  /** L2 norm. */
  def norm(a: Column): Column =
    Shims.column(VectorNorm(Shims.expression(a)))

  /** Bounded top-k aggregate: smallest k (score, id) pairs, ascending. */
  def topK(score: Column, id: Column, k: Int): Column =
    Shims.column(
      TopKByScore(Shims.expression(score), Shims.expression(id), k)
        .toAggregateExpression())

  /** Element-wise mean of a float-vector column (centroid aggregate). */
  def vectorAvg(vec: Column): Column =
    Shims.column(
      graft.operators.VectorAvg(Shims.expression(vec)).toAggregateExpression())

  /** Register SQL names (graft_l2 etc.) on a session. */
  def register(spark: SparkSession): Unit = {
    Shims.registerFunction(spark, "graft_l2", es => L2Distance(es(0), es(1)))
    Shims.registerFunction(spark, "graft_l2sq", es => L2SqDistance(es(0), es(1)))
    Shims.registerFunction(spark, "graft_dot", es => DotProduct(es(0), es(1)))
    Shims.registerFunction(spark, "graft_cosine", es => CosineSimilarity(es(0), es(1)))
    Shims.registerFunction(spark, "graft_norm", es => VectorNorm(es(0)))
  }
}
