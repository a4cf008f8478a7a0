package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  *    index.
  *  - [[compact]] is the background compaction: latest `seq` wins per
  *    vec_id, partitions rewritten in place. Between compactions a
  *    reader resolves duplicates with the same max_by(seq) rule —
  *    exactly the reference's "newest buffer entry shadows the graph"
  *    contract (engine.h:search_knn consults buffers before the index).
  */
object IvfDeltaIngest {

  /** Assign + append one micro-batch of (vec_id, embedding [, seq]). */
  def appendBatch(spark: SparkSession, indexDir: String,
      batch: DataFrame, seq: Long): Unit = {
    import spark.implicits._
    val cent = spark.read.parquet(s"$indexDir/centroids")
    batch.crossJoin(broadcast(cent))
      .withColumn("d", l2Sq($"embedding", $"centroid"))
      .groupBy($"vec_id")
      .agg(min_by($"cluster_id", struct($"d", $"cluster_id")).as("cluster_id"),
        first($"embedding").as("embedding"))
      .withColumn("seq", lit(seq))
      .select($"vec_id", $"embedding", $"seq", $"cluster_id")
      .write.mode("append").partitionBy("cluster_id")
      .parquet(s"$indexDir/assignments")
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
    * vec_id (newest seq). Run periodically, not per batch. */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    val compacted = latestAssignments(spark, indexDir)
      .repartition(col("cluster_id"))
      .localCheckpoint(true) // sever lineage from the files being replaced
    compacted.write.mode("overwrite").partitionBy("cluster_id")
      .parquet(s"$indexDir/assignments")
  }
}
