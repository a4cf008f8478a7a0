package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement main: decompose the distance SCAN throughput
  * into its legs — (a) the no-kernel floor (consume the cached rows,
  * touch one array element), (b) the staging-only cost (toFloatArray,
  * discard), (c) the full kernel — so the scan-vs-kernel gap is
  * attributed to decode vs arithmetic instead of guessed at. */
object ScanFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.cache.serializer",
        "graft.functions.GraftCachedBatchSerializer")
      .config("spark.sql.extensions", "graft.plans.GraftCacheScanExtensions").master("local[1]")
      .config("spark.sql.shuffle.partitions", 1)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.GraftVector._
    val e = Tables.load(spark, sfDir, "embeddings").select($"embedding")
    val n = math.max(e.count(), 1L)
    val rep = math.max(1L, 10_000_000L / n)
    val base = e.crossJoin(broadcast(spark.range(rep))).select($"embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val evals = n * rep
    val probe = typedlit(Array.fill(64)(0.5f).toSeq)
    def time(name: String, c: org.apache.spark.sql.Column): Unit = {
      Bench.exhaust(base.select(c.as("d")))
      val t0 = System.nanoTime()
      Bench.exhaust(base.select(c.as("d")))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCANFLOOR $name ${evals / sec / 1e6}%.2f Meval/s ($sec%.2f s)")
    }
    time("floor_element_at", element_at($"embedding", 1))
    time("floor_size", size($"embedding"))
    time("l2_full", l2($"embedding", probe))
    time("dot_full", dot($"embedding", probe))
    spark.stop()
  }
}
