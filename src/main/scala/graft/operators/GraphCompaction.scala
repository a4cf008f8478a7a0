package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.IvfDeltaIngest.atomicSwap

/** Graph compaction — the LSM maintenance step that completes the graph
  * family's delete cycle the way [[graft.streaming.IvfDeltaIngest.compact]]
  * completes IVF's. The reference's deletes are soft (hnsw marks nodes and
  * skips them at search time — the v_graph_delete contract); its memory
  * reclamation is EBR, a shared-address-space artifact whose distributed
  * analog is exactly this: periodically FOLD the tombstones out of the
  * persisted edge tables so searches stop paying the mask, then RE-LINK
  * the nodes whose adjacency the fold under-filled.
  *
  * Two passes, both over the same soft-delete predicate:
  *
  *  1. fold: drop every edge row touching a deleted node, and rebuild
  *     the medoid entry table over the live assignments — pure scan-side
  *     predicates, one partitioned write, no shuffle beyond it.
  *  2. re-link: nodes that lost ≥1 out-edge to a tombstone re-search the
  *     already-masked graph ([[GraphSearch.relinkFrames]] — the
  *     v_graph_insert machinery with the query excluded from its own
  *     result) and their top-k REPLACES their adjacency. Bounded work:
  *     |affected| ≤ deleted-degree, the batch rides the broadcast side
  *     of every join exactly as the insert path does.
  *
  * Both tables land via sibling-dir atomic swap (the IvfDeltaIngest
  * crash contract: a failure before the swap leaves the old graph
  * intact, between the renames leaves the complete new table beside it).
  *
  * With `relink = false` the compacted graph's edge set EQUALS the
  * masked search's visible edge set, so an unmasked search over the
  * compacted store is row-identical to v_graph_delete's masked search
  * over the original — the equivalence GraphCompactionSpec pins. With
  * re-linking, affected nodes get a BETTER adjacency than the masked
  * leftovers (beam-searched over the live graph), which the spec pins
  * as: still no tombstoned endpoints, adjacency refilled to k, recall
  * not below the fold-only graph on the clustered fixture.
  */
object GraphCompaction {

  /** Fold tombstones out of `gDir` (edges + medoids) in place, then
    * re-link the under-filled nodes. `ivfDir` supplies the centroid /
    * assignment frames the medoid rule and entry beam need; `e` is the
    * FULL embeddings frame (vec_id, embedding) — the mask is applied
    * here, callers never pre-filter. */
  def compact(s: SparkSession, ivfDir: String, gDir: String, e: DataFrame,
      isDel: Column => Column, k: Int = 5, ef: Int = 16, hops: Int = 3,
      relink: Boolean = true): Unit = {
    import s.implicits._
    val stored = s.read.parquet(s"$gDir/edges")
    val kept = stored
      .filter(!isDel($"vec_id") && !isDel($"neighbor_id"))
      .select($"vec_id", $"neighbor_id", $"rnk", $"dist")
    val cent = s.read.parquet(s"$ivfDir/centroids")
      .select($"cluster_id", $"centroid")
    val med = GraphSearch.medoidsOf(
      s.read.parquet(s"$ivfDir/assignments").filter(!isDel($"vec_id")),
      cent.select($"cluster_id".cast("long").as("cluster_id"), $"centroid"))
    val newEdges =
      if (!relink) kept
      else {
        // affected = live nodes that lost ≥1 stored out-edge to a
        // tombstone; their masked-beam top-k replaces their adjacency
        val affected = stored
          .filter(!isDel($"vec_id") && isDel($"neighbor_id"))
          .select($"vec_id").distinct()
        val q = e.join(affected, "vec_id")
          .select($"vec_id".as("query_id"), $"embedding".as("qv"))
        val live = e.filter(!isDel($"vec_id"))
        val repaired = GraphSearch.relinkFrames(s, cent, med,
            kept.select($"vec_id".as("node"), $"neighbor_id"),
            live, q, k, ef, hops)
          .select($"query_id".as("vec_id"), $"neighbor_id", $"rnk", $"dist")
        kept.join(affected, Seq("vec_id"), "left_anti")
          .unionByName(repaired)
      }
    // materialize BEFORE the swap: newEdges' plan reads gDir/edges, and
    // atomicSwap renames that directory out from under a lazy plan
    val finalEdges = newEdges.localCheckpoint(true)
    val finalMed = med.localCheckpoint(true)
    atomicSwap(gDir, "edges") { tmp =>
      finalEdges.write.parquet(tmp)
    }
    atomicSwap(gDir, "medoids") { tmp =>
      finalMed.coalesce(1).write.parquet(tmp)
    }
  }
}
