package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** The §3 claim made concrete: IVF assignments written
  * `partitionBy(cluster_id)` give nprobe searches physical partition
  * pruning — a probe reads nprobe/k of the files, the vector analog of
  * predicate pushdown. */
class IvfPartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("nprobe read prunes cluster partitions at the file level") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (_, assign) = IvfIndex.build(e, "vec_id", "embedding", k = 8)
    val out = "target/tmp-ivf/assignments"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("target/tmp-ivf"))
    assign.write.partitionBy("cluster_id").mode("overwrite").parquet(out)

    val probed = spark.read.parquet(out).filter($"cluster_id".isin(1, 3))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters:\n$plan")

    // physical proof: only the probed partitions' files are scanned
    val scanned = probed.select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    assert(scanned.nonEmpty)
    assert(scanned.forall(f => f.contains("cluster_id=1") || f.contains("cluster_id=3")),
      s"read files outside probed clusters: $scanned")

    // row-level sanity: the pruned read returns exactly those clusters
    val clusters = probed.select("cluster_id").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(clusters.subsetOf(Set(1, 3)))
  }
}
