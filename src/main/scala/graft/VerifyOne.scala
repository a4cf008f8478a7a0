package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Scratch driver: dump ONE query + its oracle SQL for a quick local
  * DuckDB compare while iterating. Not part of the contract.
  * Usage: runMain graft.VerifyOne <query> [sfDir] [outDir]. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else "/tmp/verify_one"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
    sys.props("graft.oracle.sfDir") = sfDir
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    // ANN oracles are generated from the persisted index (already built
    // by the query run above); for every other key use the static maps
    // so this tool never pays an index build for an unrelated query
    val oracle =
      if (queries.IndexQueries.AnnOracleKeys(name)) SparkEntry.oracleSql.get(name)
      else (queries.VectorQueries.oracles ++ queries.AnalyticsQueries.oracles ++
        queries.TextQueries.oracles ++ queries.DedupQueries.oracles ++
        queries.IndexQueries.staticOracles ++ queries.PipelineQueries.oracles)
        .get(name)
    oracle.foreach { sql =>
      Files.writeString(Paths.get(s"$outDir/$name.sql"), sql)
    }
    spark.stop()
  }
}
