package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.GraftVector._

/** Streaming delta ingest INTO the persisted IVF index — the full LSM
  * story of the reference (/root/reference/include/engine.h: writes land
  * in buffers, background flush threads merge them into the index) made
  * Spark-native:
  *
  *  - [[appendBatch]] is the foreachBatch flush: each micro-batch of new
  *    vectors is assigned to its nearest persisted centroid (broadcast —
  *    centroids are tiny) and APPENDED into the matching
  *    `cluster_id=N` partition. Searches stay file-level pruned with no
  *    index rebuild; a batch costs one scan of the batch, never of the
  *    index. The same rows are appended to a `delta_log` sidecar — the
  *    durable WRITE BUFFER: bounded by the writes since the last
  *    compaction, it is what lets a search consult "unflushed" entries
  *    exactly like engine.h:search_knn brute-forces its buffers before
  *    the graph (see IvfIndex.searchPruned).
  *  - [[compact]] is the background compaction: latest `seq` wins per
  *    vec_id, the table is rewritten into a SIBLING directory and then
  *    atomically swapped into place (never overwriting the files being
  *    read — an executor-storage loss mid-write can no longer destroy
  *    the table), and the delta log is truncated.
  *
  * Single-writer assumption: one compactor at a time, no concurrent
  * appends during the swap window (the reference serializes its flush
  * threads the same way). On a cluster this swap becomes a metastore /
  * table-format transactional commit; the directory-rename form is the
  * local-filesystem expression of the same idea.
  */
object IvfDeltaIngest {

  /** Assign + append one micro-batch of (vec_id, embedding [, seq]).
    *
    * Duplicate vec_ids WITHIN a batch resolve to one row deterministically
    * — each distinct (vec_id, embedding) is assigned to its own nearest
    * centroid first, then the row with the smallest (distance,
    * cluster_id, embedding-hash) wins — so an embedding is never paired
    * with another row's cluster (a micro-batch has no intra-batch write
    * order; across batches `seq` orders writes).
    *
    * Write order is buffer-first: the delta_log append lands BEFORE the
    * assignments append. A crash between the two leaves a row that is in
    * the buffer but not the index — searches still serve it correctly
    * from the buffer (and its stale predecessor is shadowed); the
    * reverse order would leave an un-shadowed duplicate visible. */
  /** Deduplicate a micro-batch to one row per vec_id and assign each to
    * its nearest centroid — per-(vec_id, embedding) assignment first,
    * then smallest (distance, cluster, hash) row wins, preserving row
    * integrity (see appendBatch scaladoc). Shared by the raw-vector and
    * IVF-PQ delta paths. Returns (vec_id, embedding, seq, cluster_id). */
  private[streaming] def resolveBatch(batch: DataFrame, cent: DataFrame,
      seq: Long): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.crossJoin(broadcast(cent))
      .withColumn("d", l2Sq($"embedding", $"centroid"))
      .groupBy($"vec_id", $"embedding")
      .agg(min(struct($"d", $"cluster_id")).as("best"))
      .groupBy($"vec_id")
      .agg(min_by(struct($"embedding", $"best.cluster_id".as("cluster_id")),
        struct($"best.d", $"best.cluster_id", hash($"embedding"))).as("r"))
      .select($"vec_id", $"r.embedding".as("embedding"),
        lit(seq).as("seq"), $"r.cluster_id".as("cluster_id"))
  }

  def appendBatch(spark: SparkSession, indexDir: String,
      batch: DataFrame, seq: Long): Unit = {
    val cent = spark.read.parquet(s"$indexDir/centroids")
    val assigned = resolveBatch(batch, cent, seq)
      .persist(StorageLevel.MEMORY_AND_DISK) // one assignment pass, two writes
    assigned.write.mode("append").parquet(s"$indexDir/delta_log")
    assigned.write.mode("append").partitionBy("cluster_id")
      .parquet(s"$indexDir/assignments")
    assigned.unpersist()
  }

  /** Latest row per vec_id from the delta log (the write buffer), or None
    * if no deltas have landed since the last compaction. Bounded by the
    * append volume between compactions — small by design, broadcastable. */
  def deltaLatest(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    import spark.implicits._
    if (!new File(s"$indexDir/delta_log").exists()) None
    else Some(spark.read.parquet(s"$indexDir/delta_log")
      .groupBy($"vec_id")
      .agg(max_by(struct($"embedding", $"cluster_id"), $"seq").as("r"),
        max($"seq").as("seq"))
      .select($"vec_id", $"r.embedding".as("embedding"),
        $"r.cluster_id".as("cluster_id"), $"seq"))
  }

  /** Read the assignments table with latest-wins duplicate resolution
    * (base rows written without `seq` count as seq 0). */
  def latestAssignments(spark: SparkSession, indexDir: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(s"$indexDir/assignments")
    val withSeq =
      if (raw.columns.contains("seq"))
        raw.withColumn("seq", coalesce($"seq", lit(0L)))
      else raw.withColumn("seq", lit(0L))
    withSeq.groupBy($"vec_id")
      .agg(max_by(struct($"embedding", $"seq", $"cluster_id"), $"seq").as("r"))
      .select($"vec_id", $"r.embedding".as("embedding"),
        $"r.seq".as("seq"), $"r.cluster_id".as("cluster_id"))
  }

  /** LSM compaction: rewrite the partitioned table with one row per
    * vec_id (newest seq) into `assignments.compacting`, atomically swap
    * it over `assignments`, and truncate the delta log. Run periodically,
    * not per batch. Crash-safe: the source files are never overwritten —
    * a failure before the swap leaves the old table intact; a failure
    * between the two renames leaves the complete new table in the
    * sibling dir for recovery. */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    val tmp = s"$indexDir/assignments.compacting"
    val old = s"$indexDir/assignments.old"
    deleteRecursively(new File(tmp)); deleteRecursively(new File(old))
    latestAssignments(spark, indexDir)
      .repartition(col("cluster_id"))
      .write.partitionBy("cluster_id").parquet(tmp)
    Files.move(Paths.get(s"$indexDir/assignments"), Paths.get(old),
      StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(s"$indexDir/assignments"),
      StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(new File(old))
    deleteRecursively(new File(s"$indexDir/delta_log"))
  }

  private[streaming] def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
