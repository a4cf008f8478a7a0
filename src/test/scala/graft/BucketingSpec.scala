package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-location: the storage-level answer to "don't shuffle
  * the fact table on every join". Writing both sides bucketed by the join
  * key lets SortMergeJoin consume them with NO Exchange — at 100 TB this
  * is the difference between a join that re-shuffles petabytes and one
  * that streams co-located buckets.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables runs without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val wh = new java.io.File("target/tmp-bucketed").getAbsoluteFile
      org.apache.commons.io.FileUtils.deleteQuietly(wh)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/b_orders").mode("overwrite").saveAsTable("b_orders")
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/b_lineitem").mode("overwrite").saveAsTable("b_lineitem")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(sum($"l_quantity").as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinExchanges = plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning") &&
          (l.contains("l_orderkey") || l.contains("o_orderkey")))
      assert(joinExchanges === 0,
        s"bucketed join must not re-shuffle on the join key:\n$plan")

      // and results match the plain-parquet join
      val expect = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(sum($"l_quantity").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
