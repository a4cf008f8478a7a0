package graft

import org.apache.spark.sql.functions._

import graft.GraftSketch._

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = spark.range(20000).toDF("i")
    .select(concat(lit("k"), ($"i" % 997).cast("string")).as("k"))
    .cache()

  test("count-min never undercounts, and is exact when w dwarfs the key space") {
    val exact = keys.groupBy($"k").agg(count(lit(1)).as("n"))
    // tight sketch: collisions certain (997 keys into 64 columns)
    val tight = keys.agg(cmsSketch($"k", 4, 64).as("r"))
    val est = exact.crossJoin(broadcast(tight))
      .select($"k", $"n", cmsEstimate($"k", $"r", 4, 64).as("e"))
      .collect()
    est.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"undercount for ${r.getString(0)}: ${r.getLong(2)} < ${r.getLong(1)}"))
    // roomy sketch: 997 keys into 4096 columns x 4 rows — a key is only
    // overestimated if ALL 4 of its rows collide: p ≈ (997/4096)^4 ≈
    // 0.35 %, so expect ~3-4 of 997 keys; gate well above that tail
    val roomy = keys.agg(cmsSketch($"k", 4, 4096).as("r"))
    val overEst = exact.crossJoin(broadcast(roomy))
      .select($"n", cmsEstimate($"k", $"r", 4, 4096).as("e"))
      .filter($"n" =!= $"e").count()
    assert(overEst <= 20, s"$overEst of 997 keys overestimated at w=4096")
  }

  test("estimating against mismatched sketch geometry throws, never undercounts silently") {
    val sk = keys.limit(100).agg(cmsSketch($"k", 4, 64).as("r"))
    val ex = intercept[Exception] {
      sk.select(cmsEstimate(lit("k1"), $"r", 4, 256)).head()
    }
    assert(ex.getMessage.contains("cms_estimate expects"))
  }

  test("counters merge by elementwise sum: split-and-merge == direct") {
    val direct = keys.agg(cmsSketch($"k", 4, 64).as("r"))
      .head().getSeq[Long](0)
    val parts = keys.groupBy(length($"k").as("g"))
      .agg(cmsSketch($"k", 4, 64).as("r"))
      .collect().map(_.getSeq[Long](1))
    val merged = parts.reduce((a, b) => a.zip(b).map(t => t._1 + t._2))
    assert(merged === direct)
  }
}
