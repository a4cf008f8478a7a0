package graft

import org.apache.spark.sql.SparkSession

/** Prints the PRE-CHECKPOINT production plans of the entries whose
  * declared frame is checkpoint-truncated (LocalTableScan / ExistingRDD
  * in ExplainMain's dump) — the raw shapes PlanSpec guards, made
  * reviewable as plan files. */
object ExplainRaw {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .config("spark.sql.cache.serializer",
        "graft.functions.GraftCachedBatchSerializer")
      .config("spark.sql.extensions", "graft.plans.GraftCacheScanExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val raws: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "d_dsir_weights" -> (() =>
        graft.queries.DedupQueries.dsirWeightsRaw(spark, sfDir)._1),
      "p_curation_pipeline" -> (() =>
        graft.queries.PipelineQueries.curationPipelineRaw(spark, sfDir)._1),
      "t_entropy" -> (() =>
        graft.queries.TextQueries.entropyRaw(spark, sfDir)))
    (if (names.nonEmpty) names else raws.keys.toSeq.sorted).foreach { n =>
      println(s"===== $n (raw, pre-checkpoint) =====")
      raws(n)().explain("formatted")
    }
    spark.stop()
  }
}
