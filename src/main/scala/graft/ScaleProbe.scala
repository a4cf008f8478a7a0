package graft

import org.apache.spark.sql.SparkSession

/** Scaling-rule probe for the SURVEY §5 artifact: the kNN-graph build
  * (and every IVF probe) does n/k work per row, so a corpus grown N×
  * under a FIXED k grows per-probe candidate lists N× — O(n²/k) total,
  * the classic IVF sizing failure. The documented rule is k ∝ n
  * (bounded cluster populations, the d_semantic_dedup contract); this
  * probe times the SAME knnGraph computation at a caller-chosen k so
  * the rule's effect is a measured number, not an assertion.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> <k> [nprobe]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = args(1).toInt
    val nprobe = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.cache.serializer",
        "graft.functions.GraftCachedBatchSerializer")
      .config("spark.sql.extensions", "graft.plans.GraftCacheScanExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val dir = operators.IndexStore.ivf(spark, sfDir, k = k)
    val buildSec = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
    val e = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    // warm footers/codegen, then time the graph build proper
    Bench.exhaust(operators.GraphSearch.knnGraph(spark, dir, e, 5, nprobe))
    val t1 = System.nanoTime()
    Bench.exhaust(operators.GraphSearch.knnGraph(spark, dir, e, 5, nprobe))
    val graphSec = math.rint((System.nanoTime() - t1) / 1e6) / 1e3
    val n = e.count()
    spark.stop()
    println(s"""{"sf":"$sfDir","n_vectors":$n,"k":$k,"nprobe":$nprobe,""" +
      s""""ivf_build_sec":$buildSec,"knn_graph_sec":$graphSec}""")
  }
}
