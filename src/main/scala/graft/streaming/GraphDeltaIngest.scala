package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming delta ingest INTO the persisted kNN graph — the graph
  * index's write path made micro-batch, completing the streaming story
  * the IVF / IVF-PQ delta paths already have. Each micro-batch of new
  * vectors beam-searches the CURRENT graph — base edges ∪ previously
  * streamed delta edges, candidates over base corpus ∪ previously
  * streamed vectors, the in-flight batch itself absent from all of
  * them (v_graph_insert's soft-delete discipline, applied per batch) —
  * and each vector's top-k result IS its adjacency, appended to the
  * delta sidecar (hnsw_index.h insert: search_layer proposes, the
  * winners become the links). Later batches therefore link THROUGH
  * earlier batches' nodes: the graph grows incrementally, never
  * rebuilt per batch.
  *
  * Entry medoids stay fixed until compaction, exactly as the IVF delta
  * path keeps centroids fixed — the reference likewise never re-picks
  * its entry per insert (enter_point_ moves only when a new max level
  * appears). Compaction = the IndexStore.knnGraph rebuild once drift
  * warrants it, in a sibling dir + swap like IvfDeltaIngest.compact.
  *
  * Single-writer per delta dir (micro-batches are serialized by
  * Structured Streaming's epoch contract); duplicate vec_ids across
  * batches resolve at compaction.
  */
object GraphDeltaIngest {

  /** Previously streamed edges (vec_id, neighbor_id, rnk, dist), if
    * any batch has landed. */
  def deltaEdges(spark: SparkSession, deltaDir: String): Option[DataFrame] =
    if (new File(s"$deltaDir/edges").isDirectory)
      Some(spark.read.parquet(s"$deltaDir/edges"))
    else None

  /** Previously streamed vectors (vec_id, embedding). */
  def deltaVectors(spark: SparkSession, deltaDir: String): Option[DataFrame] =
    if (new File(s"$deltaDir/vectors").isDirectory)
      Some(spark.read.parquet(s"$deltaDir/vectors"))
    else None

  /** The foreachBatch flush: link `batch` (vec_id, embedding) into the
    * graph formed by `baseEdges` ∪ streamed deltas, with candidates
    * from `baseVecs` ∪ streamed vectors, and append the new adjacency
    * + the batch's vectors to the sidecar. `baseEdges` carries
    * (vec_id, neighbor_id); `cent`/`med` are the persisted entry
    * artifacts (fixed until compaction). */
  def appendBatch(deltaDir: String, cent: DataFrame, med: DataFrame,
      baseEdges: DataFrame, baseVecs: DataFrame, batch: DataFrame,
      k: Int, ef: Int, hops: Int): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (batch.isEmpty) return
    val vecs = deltaVectors(spark, deltaDir)
      .map(d => baseVecs.select($"vec_id", $"embedding")
        .unionByName(d.select($"vec_id", $"embedding")))
      .getOrElse(baseVecs.select($"vec_id", $"embedding"))
    val stored = deltaEdges(spark, deltaDir)
      .map(d => baseEdges.select($"vec_id", $"neighbor_id")
        .unionByName(d.select($"vec_id", $"neighbor_id")))
      .getOrElse(baseEdges.select($"vec_id", $"neighbor_id"))
      .select($"vec_id".as("node"), $"neighbor_id")
    val q = batch.select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val links = graft.operators.GraphSearch
      .searchFrames(spark, cent, med, stored, vecs, q, k, ef, hops)
      .select($"query_id".as("vec_id"), $"neighbor_id", $"rnk", $"dist")
      // materialize BEFORE the first write: the edges select must not
      // re-derive after the vectors append changes the delta dir
      .localCheckpoint(true)
    // vectors first: a crash between the appends then leaves an extra
    // unlinked vector (harmless — it is only a candidate source), never
    // an edge whose endpoint embedding the next batch cannot score
    batch.select($"vec_id", $"embedding")
      .write.mode("append").parquet(s"$deltaDir/vectors")
    links.write.mode("append").parquet(s"$deltaDir/edges")
  }
}
