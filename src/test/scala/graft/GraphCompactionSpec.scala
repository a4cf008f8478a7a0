package graft

import java.io.File

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.operators.{GraphCompaction, GraphSearch, IndexStore}

/** Graph compaction (the distributed analog of the reference's EBR
  * reclamation): folding tombstones out of the persisted edge tables
  * must leave exactly the graph the masked search was already seeing —
  * so an UNMASKED search over the fold-only compacted store is
  * row-identical to v_graph_delete's masked search over the original.
  * Re-linking then rebuilds the under-filled adjacency; its invariants
  * (no tombstoned endpoints, no self-edges, refilled to k, rows equal
  * the masked relink search) are pinned here, and its row-level values
  * are gated by the v_graph_compact DuckDB oracle.
  */
class GraphCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val tmpRoot =
    java.nio.file.Files.createTempDirectory("graft-compact-spec").toString
  private def isDel(c: Column) = pmod(c, lit(17)) === 5

  private lazy val ivfDir = IndexStore.ivf(spark, sfDir, k = 16)
  private lazy val gDir = IndexStore.knnGraph(spark, sfDir)
  private lazy val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select($"vec_id", $"embedding")

  private def copyStore(dst: String): Unit = {
    spark.read.parquet(s"$gDir/edges")
      .write.mode("overwrite").parquet(s"$dst/edges")
    spark.read.parquet(s"$gDir/medoids")
      .coalesce(1).write.mode("overwrite").parquet(s"$dst/medoids")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3))

  test("fold-only compaction: unmasked search over it == masked search") {
    val dir = s"$tmpRoot/fold"
    copyStore(dir)
    GraphCompaction.compact(spark, ivfDir, dir, e, isDel, relink = false)
    val q = e.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val post = rows(GraphSearch.search(spark, ivfDir, dir, e, q,
      k = 10, ef = 16, hops = 3))
    val masked = rows(SparkEntry.queries("v_graph_delete")(spark, sfDir))
    assert(post === masked,
      "post-compaction search must replay the masked search exactly")
  }

  test("re-link: no tombstoned endpoints, no self-edges, refilled to k") {
    val dir = s"$tmpRoot/relink"
    copyStore(dir)
    val affected = spark.read.parquet(s"$gDir/edges")
      .filter(!isDel($"vec_id") && isDel($"neighbor_id"))
      .select($"vec_id").distinct().cache()
    val nAffected = affected.count()
    assert(nAffected > 0, "fixture must exercise the re-link path")
    GraphCompaction.compact(spark, ivfDir, dir, e, isDel)
    val edges = spark.read.parquet(s"$dir/edges")
    assert(edges.filter(isDel($"vec_id") || isDel($"neighbor_id"))
      .count() === 0, "a tombstoned endpoint survived compaction")
    assert(edges.filter($"vec_id" === $"neighbor_id").count() === 0,
      "re-link must exclude the node from its own adjacency")
    val fills = edges.join(affected, "vec_id")
      .groupBy($"vec_id").agg(count(lit(1)).as("deg"))
    assert(fills.count() === nAffected)
    assert(fills.filter($"deg" =!= 5).count() === 0,
      "every affected node's adjacency must refill to k")
    // medoids were rebuilt over live members only
    val medIds = spark.read.parquet(s"$dir/medoids")
      .select($"medoid_id").collect().map(_.getLong(0))
    assert(medIds.forall(_ % 17 != 5), "a deleted medoid survived")
    affected.unpersist()
  }

  test("re-linked rows equal the masked relink search; swap leaves no debris") {
    val dir = s"$tmpRoot/relink2"
    copyStore(dir)
    GraphCompaction.compact(spark, ivfDir, dir, e, isDel)
    val stored = spark.read.parquet(s"$gDir/edges")
    val affected = stored
      .filter(!isDel($"vec_id") && isDel($"neighbor_id"))
      .select($"vec_id").distinct()
    val got = rows(spark.read.parquet(s"$dir/edges")
      .join(affected, "vec_id")
      .select($"vec_id", $"neighbor_id", $"rnk", $"dist"))
    // independent replay of the re-link search over the masked frames
    val cent = spark.read.parquet(s"$ivfDir/centroids")
      .select($"cluster_id", $"centroid")
    val med = GraphSearch.medoidsOf(
      spark.read.parquet(s"$ivfDir/assignments").filter(!isDel($"vec_id")),
      cent.select($"cluster_id".cast("long").as("cluster_id"), $"centroid"))
    val kept = stored.filter(!isDel($"vec_id") && !isDel($"neighbor_id"))
      .select($"vec_id".as("node"), $"neighbor_id")
    val q = e.join(affected, "vec_id")
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val expect = rows(GraphSearch.relinkFrames(spark, cent, med, kept,
        e.filter(!isDel($"vec_id")), q, k = 5, ef = 16, hops = 3)
      .select($"query_id", $"neighbor_id", $"rnk", $"dist"))
    assert(got === expect)
    assert(!new File(s"$dir/edges.compacting").exists, "swap debris")
    assert(!new File(s"$dir/edges.old").exists, "swap debris")
    assert(!new File(s"$dir/medoids.compacting").exists, "swap debris")
  }
}
