package graft.streaming

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.PqIndex

/** Streaming delta ingest into the COMPOSITE IVF-PQ index — the LSM
  * write path (engine.h buffers → background flush → merge) extended to
  * the inverted-list-with-codes layout:
  *
  *  - [[appendBatch]]: each micro-batch is deduplicated and assigned to
  *    its nearest persisted centroid (IvfDeltaIngest.resolveBatch), then
  *    PQ-ENCODED against the persisted codebooks — appended codes are
  *    directly comparable to the index's — and appended into the
  *    matching `cluster_id=N` lists partition. The raw embeddings land
  *    in the `delta_log` write buffer: buffered rows are served by
  *    EXACT distance (brute force over a bounded set beats re-quantized
  *    approximation, exactly as the reference brute-forces its write
  *    buffers while the graph serves approximate results).
  *  - [[compact]]: folds the buffer in — latest seq wins per vec_id,
  *    lists rewritten into a sibling directory and atomically swapped
  *    (same crash-safety argument as IvfDeltaIngest.compact), buffer
  *    truncated. Compacted rows keep only codes; their exact-distance
  *    serving window ends at compaction, which is the quantization
  *    contract of the index itself.
  */
object IvfPqDeltaIngest {

  /** Assign + encode + append one micro-batch of (vec_id, embedding). */
  def appendBatch(spark: SparkSession, listsDir: String, ivfDir: String,
      pqDir: String, batch: DataFrame, seq: Long,
      numSub: Int = 8, subDim: Int = 8): Unit = {
    import spark.implicits._
    val cent = spark.read.parquet(s"$ivfDir/centroids")
    val books = spark.read.parquet(s"$pqDir/codebooks")
    val assigned = IvfDeltaIngest.resolveBatch(batch, cent, seq)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // buffer first (see IvfDeltaIngest.appendBatch's crash-window note)
    assigned.write.mode("append").parquet(s"$listsDir/delta_log")
    val coded = PqIndex
      .encode(assigned, "vec_id", "embedding", books, numSub, subDim)
      .join(assigned.select($"vec_id", $"seq", $"cluster_id"), "vec_id")
      .select($"vec_id", $"codes", $"seq", $"cluster_id")
    coded.write.mode("append").partitionBy("cluster_id")
      .parquet(s"$listsDir/lists")
    assigned.unpersist()
  }

  /** Latest buffered row per vec_id, or None if the buffer is empty. */
  def deltaLatest(spark: SparkSession, listsDir: String): Option[DataFrame] = {
    import spark.implicits._
    if (!new File(s"$listsDir/delta_log").exists()) None
    else Some(spark.read.parquet(s"$listsDir/delta_log")
      .groupBy($"vec_id")
      .agg(max_by(struct($"embedding", $"cluster_id"), $"seq").as("r"))
      .select($"vec_id", $"r.embedding".as("embedding")))
  }

  /** Fold the buffer into the lists (latest seq per vec_id), atomically
    * swap, truncate the buffer. */
  def compact(spark: SparkSession, listsDir: String): Unit = {
    import spark.implicits._
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(s"$listsDir/lists")
    val withSeq =
      if (raw.columns.contains("seq"))
        raw.withColumn("seq", coalesce($"seq", lit(0L)))
      else raw.withColumn("seq", lit(0L))
    val compacted = withSeq.groupBy($"vec_id")
      .agg(max_by(struct($"codes", $"seq", $"cluster_id"), $"seq").as("r"))
      .select($"vec_id", $"r.codes".as("codes"),
        $"r.seq".as("seq"), $"r.cluster_id".as("cluster_id"))
      .repartition(col("cluster_id"))
    val tmp = new File(s"$listsDir/lists.compacting")
    val old = new File(s"$listsDir/lists.old")
    IvfDeltaIngest.deleteRecursively(tmp); IvfDeltaIngest.deleteRecursively(old)
    compacted.write.partitionBy("cluster_id").parquet(tmp.getPath)
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$listsDir/lists"), old.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    java.nio.file.Files.move(tmp.toPath,
      java.nio.file.Paths.get(s"$listsDir/lists"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    IvfDeltaIngest.deleteRecursively(old)
    IvfDeltaIngest.deleteRecursively(new File(s"$listsDir/delta_log"))
  }
}
