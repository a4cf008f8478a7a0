package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftVector._

/** DataFrame-native Lloyd's k-means, batched over independent GROUPS:
  * one invocation fits a separate codebook for every `group` value in the
  * input (e.g. all 8 PQ subspaces at once) — per-iteration cost is two
  * shuffles TOTAL, not two per group, which is what makes PQ codebook
  * training cheap. Centroid recomputation is the [[VectorAvg]]
  * distributive aggregate; assignment is an argmin over broadcast
  * centroids. Deterministic: init takes each group's first k vectors in
  * id order (no RNG), and ties break on centroid code.
  *
  * This is the "index build" computation of the reference
  * (/root/reference/include/hnsw_index.h builds a graph; a quantizer
  * builds codebooks) expressed as pure Catalyst — no MLlib, no driver
  * loops over data.
  */
object DfKMeans {

  /** points: (group int, id long, vec array<float>).
    * Returns (group, code int, centroid array<float>). */
  def fit(points: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val byGroup = Window.partitionBy($"group").orderBy($"id")
    lloydLoop(points,
      points.withColumn("rn", row_number().over(byGroup))
        .filter($"rn" <= k)
        .select($"group", ($"rn" - 1).cast("int").as("code"),
          $"vec".as("centroid")),
      iters)
  }

  /** [[fit]] with a PER-GROUP centroid count — the shape cluster
    * rebalancing needs (each oversized cluster is one group, and its
    * sub-centroid budget scales with its own population, not the
    * worst group's). `kPerGroup`: (group int, kg int), broadcast-sized
    * by contract (one row per group being fit). Same deterministic
    * init (each group's first kg vectors in id order) and the same
    * two-shuffles-per-iteration loop as [[fit]]. */
  def fitVarK(points: DataFrame, kPerGroup: DataFrame, iters: Int)
      : DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val byGroup = Window.partitionBy($"group").orderBy($"id")
    lloydLoop(points,
      points.withColumn("rn", row_number().over(byGroup))
        .join(broadcast(kPerGroup), "group")
        .filter($"rn" <= $"kg")
        .select($"group", ($"rn" - 1).cast("int").as("code"),
          $"vec".as("centroid")),
      iters)
  }

  /** The shared Lloyd iteration: assignment is an argmin over broadcast
    * centroids, recomputation the [[VectorAvg]] distributive aggregate;
    * clusters that go empty keep their previous centroid. `iters` is a
    * CEILING: the loop stops early once an iteration changes no
    * centroid bit-for-bit — from a fixed point every further iteration
    * reproduces it exactly, so the early exit is output-identical to
    * running out the count (degenerate inputs, e.g. an identical-point
    * mass, converge after one pass instead of paying all of them). */
  private def lloydLoop(points: DataFrame, init: DataFrame, iters: Int)
      : DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    var cent = init.cache()
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      val assigned = points.join(broadcast(cent), "group")
        .withColumn("d", l2Sq($"vec", $"centroid"))
        .groupBy($"group", $"id")
        .agg(min_by($"code", struct($"d", $"code")).as("code"),
          first($"vec").as("vec"))
      val recomputed = assigned.groupBy($"group", $"code")
        .agg(vectorAvg($"vec").as("cd"))
        .select($"group", $"code",
          transform($"cd", x => x.cast("float")).as("newCentroid"))
      // keep the previous centroid for clusters that went empty
      val next = cent.join(recomputed, Seq("group", "code"), "left")
        .select($"group", $"code",
          coalesce($"newCentroid", $"centroid").as("centroid"))
        .cache()
      // one bounded job over the (k-sized, cached) centroid frames —
      // never touches `points`
      converged = next.as("n").join(cent.as("c"), Seq("group", "code"))
        .filter(col("n.centroid") =!= col("c.centroid"))
        .isEmpty
      cent.unpersist()
      cent = next
      i += 1
    }
    cent
  }

  /** Assign each point to its nearest centroid → (group, id, code).
    * The broadcast join fans every point out |cent|/|groups| ways, so
    * the stage's parallelism is floored (Expand.floorParallelism) —
    * byte-based split sizing would serialize a small input's k×
    * compute onto one core. */
  def assign(points: DataFrame, cent: DataFrame): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    Expand.floorParallelism(points).join(broadcast(cent), "group")
      .withColumn("d", l2Sq($"vec", $"centroid"))
      .groupBy($"group", $"id")
      .agg(min_by($"code", struct($"d", $"code")).as("code"))
  }

  /** Plain Lloyd's on the driver over a sample; deterministic init
    * (first k points), empty clusters keep their previous centroid. */
  def localLloyd(points: Array[Array[Float]], k: Int, iters: Int)
      : Array[Array[Float]] = {
    val d = points.head.length
    val cent = Array.tabulate(math.min(k, points.length))(i => points(i).clone())
    val assignments = new Array[Int](points.length)
    var it = 0
    while (it < iters) {
      var p = 0
      while (p < points.length) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cent.length) {
          var s = 0.0; var j = 0
          while (j < d) {
            val diff = points(p)(j) - cent(c)(j); s += diff * diff; j += 1
          }
          if (s < bestD) { bestD = s; best = c }
          c += 1
        }
        assignments(p) = best
        p += 1
      }
      val sums = Array.fill(cent.length)(new Array[Double](d))
      val counts = new Array[Long](cent.length)
      p = 0
      while (p < points.length) {
        val a = assignments(p); counts(a) += 1
        var j = 0
        while (j < d) { sums(a)(j) += points(p)(j); j += 1 }
        p += 1
      }
      var c = 0
      while (c < cent.length) {
        if (counts(c) > 0) {
          var j = 0
          while (j < d) { cent(c)(j) = (sums(c)(j) / counts(c)).toFloat; j += 1 }
        }
        c += 1
      }
      it += 1
    }
    cent
  }

}
