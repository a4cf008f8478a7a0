package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: run ONE query warm and print every Spark job's
  * wall + description, to attribute barrier cost (descent hops,
  * broadcast builds, checkpoints). Not part of the contract. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.cache.serializer",
        "graft.functions.GraftCachedBatchSerializer")
      .config("spark.sql.extensions", "graft.plans.GraftCacheScanExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    Bench.exhaust(fn(spark, sfDir)) // warm stores + JIT
    Bench.resetSharedState(spark)
    val starts = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, desc) =>
          lines.synchronized { lines += f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.3f s  ${desc.take(110)}" }
        }
    })
    val t0 = System.nanoTime()
    Bench.exhaust(fn(spark, sfDir))
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    lines.foreach(println)
    println(f"JOBPROBE $name wall $wall%.3f s jobs ${lines.size}")
    spark.stop()
  }
}
