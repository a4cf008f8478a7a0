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

  /** Multi-table LSH band keys for near-dup candidate generation:
    * `nTables` independent tables of `bitsPerTable` hyperplanes each.
    * Recall comes from OR-ing tables, precision from bits per table: at
    * 16×8 a true near-dup (cos ≥ 0.9) collides somewhere with P≈0.995
    * while a random near-orthogonal pair collides with P≈0.06 — the
    * knob pair is the cosine analog of minhash band/row counts.
    * Returns array<bigint> of per-table keys
    * (table_id * 2^bits + signBits); explode + equi-join on the key =
    * the sub-quadratic near-dup candidate join.
    */
  def bucketBands(vec: Column, dim: Int, nTables: Int = 16,
      bitsPerTable: Int = 8, seed: Long = 42L): Column = {
    val all = planes(dim, nTables * bitsPerTable, seed)
    val keys = (0 until nTables).map { t =>
      val tableKey = (0 until bitsPerTable).map { b =>
        val p = all(t * bitsPerTable + b)
        when(dot(vec, typedlit(p)) > 0d, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
      (tableKey + lit(t.toLong * (1L << bitsPerTable))).as(s"t$t")
    }
    array(keys: _*)
  }

  /** DuckDB-equivalent bucket expression (double literals printed with
    * full round-trip precision so both engines compute identical dots). */
  def bucketSql(vecSql: String, dim: Int, nPlanes: Int, seed: Long = 42L): String =
    planes(dim, nPlanes, seed).zipWithIndex.map { case (p, i) =>
      val arr = p.map(f => f.toDouble.toString).mkString("[", ",", "]")
      s"(CASE WHEN list_inner_product($vecSql::DOUBLE[], $arr::DOUBLE[]) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")::BIGINT")
}
