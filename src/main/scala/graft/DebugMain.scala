package graft

import org.apache.spark.sql.SparkSession

/** Scratch driver for timing individual queries. Not part of the contract.
  * Usage: runMain graft.DebugMain <query> [sfDir] [reps]. Times with the
  * same noop-sink full execution as Bench; reps > 1 shows warm-vs-cold. */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val reps = if (args.length > 2) args(2).toInt else 1
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
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      Bench.exhaust(SparkEntry.queries(name)(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // outside the timed window
      println(f"[debug] $name rep=$r time=$sec%.2fs")
    }
    spark.stop()
  }
}
