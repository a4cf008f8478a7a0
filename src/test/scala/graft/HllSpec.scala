package graft

import org.apache.spark.sql.functions._

import graft.GraftSketch._

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def estimate(n: Long): Long =
    spark.range(n).toDF("v")
      .agg(hllRegisters($"v").as("r"))
      .select(hllEstimate($"r").as("e"))
      .head().getLong(0)

  test("estimates track true cardinality across both estimator regimes") {
    // linear-counting regime (n << m=256) and raw-HLL regime (n >> m);
    // p=8 gives ~6.5 % standard error — gate at 3σ
    for (n <- Seq(50L, 200L, 2000L, 50000L)) {
      val e = estimate(n)
      val err = math.abs(e - n).toDouble / n
      assert(err <= 0.20, s"HLL estimate $e for true $n: err $err > 0.20")
    }
  }

  test("registers merge by elementwise max: split-and-merge == direct") {
    val direct = spark.range(10000).toDF("v")
      .agg(hllRegisters($"v").as("r"))
      .head().getSeq[Int](0)
    val parts = spark.range(10000).toDF("v")
      .groupBy(($"v" % 7).as("g"))
      .agg(hllRegisters($"v").as("r"))
      .collect().map(_.getSeq[Int](1))
    val merged = parts.reduce((a, b) => a.zip(b).map(t => t._1 max t._2))
    assert(merged === direct)
  }

  test("sketch is insensitive to duplication: dups change nothing") {
    val base = spark.range(1000).toDF("v")
    val dup = base.union(base).union(base)
    val e1 = base.agg(hllRegisters($"v").as("r"))
      .select(hllEstimate($"r").as("e")).head().getLong(0)
    val e2 = dup.agg(hllRegisters($"v").as("r"))
      .select(hllEstimate($"r").as("e")).head().getLong(0)
    assert(e1 === e2)
  }
}
