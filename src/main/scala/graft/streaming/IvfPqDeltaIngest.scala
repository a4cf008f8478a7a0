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
  *    matching `cluster_id=N` lists partition. The buffer row carries
  *    BOTH the raw embedding and the codes: searches brute-force the
  *    bounded buffer at EXACT distance (exactly as the reference
  *    brute-forces its write buffers while the graph serves approximate
  *    results), and compaction folds the codes into the lists without
  *    needing the codebooks again.
  *  - [[compact]]: folds lists ∪ buffer to the latest seq per vec_id
  *    (a row that reached only the buffer — the appendBatch crash
  *    window — is folded in, never dropped), atomically swaps, then
  *    truncates the buffer. Compacted rows keep only codes; their
  *    exact-distance serving window ends at compaction, which is the
  *    quantization contract of the index itself.
  */
object IvfPqDeltaIngest {

  /** Assign + encode + append one micro-batch of (vec_id, embedding).
    * Subspace geometry is DERIVED from the persisted codebooks
    * (PqIndex.bookGeometry), so appended codes can never be sliced
    * against the wrong boundaries. Buffer written first — see
    * IvfDeltaIngest.appendBatch's crash-window note. */
  def appendBatch(spark: SparkSession, listsDir: String, ivfDir: String,
      pqDir: String, batch: DataFrame, seq: Long): Unit = {
    import spark.implicits._
    val cent = spark.read.parquet(s"$ivfDir/centroids")
    val books = spark.read.parquet(s"$pqDir/codebooks")
    val (numSub, subDim) = PqIndex.bookGeometry(books)
    // persisted: referenced by both the encode input and the re-join —
    // recomputing the resolveBatch aggregation twice would also let a
    // nondeterministic source pair codes with a different row's embedding
    val assigned = IvfDeltaIngest.resolveBatch(batch, cent, seq)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val coded = PqIndex
      .encode(assigned, "vec_id", "embedding", books, numSub, subDim)
      .join(assigned, "vec_id")
      .select($"vec_id", $"embedding", $"codes", $"seq", $"cluster_id")
      .persist(StorageLevel.MEMORY_AND_DISK) // one encode pass, two writes
    coded.write.mode("append").parquet(s"$listsDir/delta_log")
    coded.select($"vec_id", $"codes", $"seq", $"cluster_id")
      .write.mode("append").partitionBy("cluster_id")
      .parquet(s"$listsDir/lists")
    coded.unpersist(); assigned.unpersist()
  }

  /** Latest buffered row per vec_id, or None if the buffer is empty. */
  def deltaLatest(spark: SparkSession, listsDir: String): Option[DataFrame] =
    IvfDeltaIngest.deltaLatest(spark, listsDir)

  /** Fold lists ∪ buffer codes (latest seq per vec_id), atomically swap,
    * truncate the buffer. */
  def compact(spark: SparkSession, listsDir: String): Unit = {
    val compacted = IvfDeltaIngest
      .latestTable(spark, listsDir, "lists", Seq("codes"))
      .repartition(col("cluster_id"))
    IvfDeltaIngest.atomicSwap(listsDir, "lists") { tmp =>
      compacted.write.partitionBy("cluster_id").parquet(tmp)
    }
    IvfDeltaIngest.deleteRecursively(new File(s"$listsDir/delta_log"))
  }
}
