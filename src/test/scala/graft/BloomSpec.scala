package graft

import org.apache.spark.sql.functions._

import graft.GraftSketch._
import graft.queries.AnalyticsQueries

/** Bloom-filter laws (the contract that makes q_bloom_join's oracle
  * equivalence hold by construction) and the prune behavior that makes
  * it worth running. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key passes the probe") {
    val keys = spark.range(0, 1000).select($"id".as("k"))
    val bf = keys.agg(bloomFilter($"k").as("bf"))
    val misses = keys.crossJoin(broadcast(bf))
      .filter(!bloomMightContain($"k", $"bf"))
      .count()
    assert(misses === 0L)
  }

  test("false-positive rate on disjoint probes is small and bounded") {
    val bf = spark.range(0, 1000).agg(bloomFilter($"id").as("bf"))
    // 10k probe keys fully disjoint from the inserted 0..999
    val fp = spark.range(1000000, 1010000)
      .crossJoin(broadcast(bf))
      .filter(bloomMightContain($"id", $"bf"))
      .count()
    // m=65536 bits, n=1000, k=4 → theoretical fp ≈ 1.2e-5; allow 100×
    assert(fp <= 10L, s"false-positive count $fp out of 10000 probes")
  }

  test("merge law: bloom(A ∪ B) = bloom(A) OR bloom(B), bit for bit") {
    def bits(lo: Long, hi: Long): Array[Long] =
      spark.range(lo, hi).agg(bloomFilter($"id").as("bf"))
        .collect()(0).getSeq[Long](0).toArray
    val a = bits(0, 500)
    val b = bits(500, 1000)
    val union = bits(0, 1000)
    assert(a.zip(b).map { case (x, y) => x | y }.sameElements(union))
  }

  test("q_bloom_join: fact side is pruned before the join, result is exact") {
    val d = sfDir
    val cust = spark.read.parquet(s"$d/customer.parquet")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val bloom = cust.agg(bloomFilter($"c_custkey").as("bf"))
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val pre = orders.crossJoin(broadcast(bloom))
      .filter(bloomMightContain($"o_custkey", $"bf"))
    val total = orders.count()
    val kept = pre.count()
    // BUILDING is ~1/5 of customers: the scan-side probe must drop the
    // bulk of the fact table before any join shuffle
    assert(kept < total * 0.4,
      s"bloom kept $kept of $total fact rows — not pruning")
    // and the survivors are a superset of the true matches (no false
    // negatives end-to-end)
    val trueMatches = orders.join(cust, $"o_custkey" === $"c_custkey").count()
    assert(kept >= trueMatches)

    // plan shape: the bloom probe is a Filter on the fact side BELOW the
    // exact join — prune first, shuffle what survives
    val plan = AnalyticsQueries.all("q_bloom_join")(spark, d)
      .queryExecution.optimizedPlan.toString
    val joinAt = plan.indexOf("Join")
    val probeAt = plan.indexOf("bloom_might_contain")
    assert(joinAt >= 0 && probeAt > joinAt,
      s"bloom probe must sit below the join:\n$plan")
  }
}
