package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by minimum-label propagation — the transitive
  * closure step at the end of every real dedup pipeline (pair/keeper
  * edges only say "these two match"; dedup must keep ONE doc per
  * **component** of the match graph, or chains A~B~C keep both A and C).
  *
  * Shape per round: one join of the symmetric edge list against current
  * labels plus one min-aggregate — both shuffle on node ids, nothing
  * quadratic. Rounds needed = graph diameter, which for near-dup
  * components (dense near-cliques glued by LSH buckets) is 2–4; maxIter
  * bounds pathological chains and non-convergence throws rather than
  * returning a silently-partial clustering. Lineage is cut with a lazy
  * localCheckpoint every round — an iterative plan would otherwise grow
  * by one join per round until the optimizer chokes. At 1000-executor
  * scale the same loop holds (each round is a bounded shuffle); if
  * diameters were ever large, swap the round body for alternating
  * large-star/small-star (O(log n) rounds, same per-round shape).
  *
  * The fixpoint is deterministic — min over each component — so the
  * result is independent of iteration count, partitioning, and
  * scheduling, which is what lets a recursive-CTE oracle verify it.
  */
object ConnectedComponents {

  /** (idCol) → (id, component) where component = min node id reachable
    * through `edges` (undirected; pass each pair once in either
    * direction). Nodes absent from `edges` form singleton components. */
  def minLabel(nodes: DataFrame, idCol: String, edges: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 20): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val spark = nodes.sparkSession
    import spark.implicits._
    val e = edges.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
    val sym = e.union(e.select($"b".as("a"), $"a".as("b")))
      .distinct().localCheckpoint(false) // scanned once per round
    var labels = nodes
      .select(col(idCol).cast("long").as("id"), col(idCol).cast("long").as("lab"))
      .localCheckpoint(false)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val prop = sym.join(labels.select($"id".as("a"), $"lab"), "a")
        .select($"b".as("id"), $"lab")
      val next = labels.union(prop).groupBy($"id")
        .agg(min($"lab").as("lab")).localCheckpoint(false)
      changed = next.join(labels.withColumnRenamed("lab", "old"), "id")
        .filter($"lab" < $"old").count()
      labels = next
      iter += 1
    }
    require(changed == 0,
      s"connected components did not converge within $maxIter rounds")
    labels.select($"id", $"lab".as("component"))
  }
}
