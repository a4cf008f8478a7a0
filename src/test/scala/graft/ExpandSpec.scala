package graft

import graft.operators.Expand

/** Expand.floorParallelism contract: a one-split scan feeding a
  * k×-expansion stage is lifted to cluster parallelism; a layout that
  * already has enough splits is left untouched (no added shuffle at
  * real scale); rows pass through unchanged either way.
  */
class ExpandSpec extends SparkSpec {
  import spark.implicits._

  test("a single-partition frame is lifted to default parallelism") {
    val df = (1 to 100).toDF("id").repartition(1)
    val out = Expand.floorParallelism(df)
    assert(out.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    assert(out.count() === 100)
  }

  test("pinJoinParallelism keys the shuffle and pins default parallelism") {
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "k")
      .repartition(1)
    val out = Expand.pinJoinParallelism(df, $"k")
    assert(out.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    assert(out.count() === 100)
  }

  test("a frame already at/above default parallelism is returned as-is") {
    val n = spark.sparkContext.defaultParallelism + 2
    val df = (1 to 100).toDF("id").repartition(n)
    val out = Expand.floorParallelism(df)
    assert(out.rdd.getNumPartitions === n)
    assert(out eq df, "no-op path must not rewrite the plan")
  }
}
