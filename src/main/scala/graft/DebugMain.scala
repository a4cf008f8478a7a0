package graft

import org.apache.spark.sql.SparkSession

/** Scratch driver for timing individual queries. Not part of the contract. */
object DebugMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[debug] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.stop()
  }
}
