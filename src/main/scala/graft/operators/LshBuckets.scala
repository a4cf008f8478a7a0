package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftVector._

/** Signed-random-projection LSH for embeddings — an ANN pre-filter
  * playing the role of the reference's graph traversal pruning
  * (/root/reference/include/hnsw_index.h:search_layer narrows candidates
  * structurally; LSH narrows them probabilistically, which distributes):
  * `nPlanes` Gaussian
  * hyperplanes (seeded, regenerated identically everywhere — no state to
  * ship), bucket id = sign-bit vector of the projections. Near vectors
  * (cosine) collide with probability 1 - θ/π per bit. This is the
  * pre-filter that makes embedding near-dup joins sub-quadratic at scale:
  * shuffle on bucket id, compare only within buckets.
  */
object LshBuckets {

  def planes(dim: Int, nPlanes: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val rnd = new Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Bucket id column for a vector column. */
  def bucket(vec: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column =
    planes(dim, nPlanes, seed).zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedlit(p)) > 0d, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB-equivalent bucket expression (double literals printed with
    * full round-trip precision so both engines compute identical dots). */
  def bucketSql(vecSql: String, dim: Int, nPlanes: Int, seed: Long = 42L): String =
    planes(dim, nPlanes, seed).zipWithIndex.map { case (p, i) =>
      val arr = p.map(f => f.toDouble.toString).mkString("[", ",", "]")
      s"(CASE WHEN list_inner_product($vecSql::DOUBLE[], $arr::DOUBLE[]) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")::BIGINT")
}
