package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LshBuckets

/** The corpus-self-sizing laws added after the sf10 probe: LSH band
  * width bounds expected bucket population (the sub-quadratic candidate
  * contract), and the session tune keeps TypedImperativeAggregate
  * fan-outs in hash mode instead of Spark's 128-group sort fallback. */
class ScaleLawSpec extends AnyFunSuite {

  test("chooseBits floors at the oracle contract's 8 bits") {
    for (n <- Seq(1L, 100L, 500L, 2000L, 8192L))
      assert(LshBuckets.chooseBits(n) === 8, s"n=$n")
  }

  test("chooseBits bounds expected bucket population at the target") {
    for (n <- Seq(8193L, 100000L, 200000L, 10000000L, 1000000000L)) {
      val b = LshBuckets.chooseBits(n)
      assert(n.toDouble / (1L << b) <= 32.0,
        s"n=$n b=$b pop=${n.toDouble / (1L << b)}")
      // minimal: one fewer bit would overflow the target
      assert(n.toDouble / (1L << (b - 1)) > 32.0, s"n=$n b=$b not minimal")
    }
  }

  test("candidate volume per table is linear in n under chooseBits") {
    // pairs/table ~ n^2 / 2^(b+1) <= 16n when 2^b >= n/32
    for (n <- Seq(200000L, 10000000L)) {
      val b = LshBuckets.chooseBits(n)
      val pairsPerTable = n.toDouble * n / (1L << (b + 1)).toDouble
      assert(pairsPerTable <= 16.0 * n, s"n=$n: super-linear candidates")
    }
  }

  test("tune raises the ObjectHashAggregate sort-based fallback threshold") {
    val s = TestSpark.spark // SparkSpec sessions are tuned at creation
    assert(s.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold") ===
      "262144")
  }
}
