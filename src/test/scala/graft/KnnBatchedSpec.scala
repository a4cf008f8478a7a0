package graft

import org.apache.spark.sql.functions._

import graft.operators.KnnSearch

/** Query-table-scale kNN: the batched-broadcast path must return
  * EXACTLY the single-broadcast plan's rows for any batch count, and
  * must handle a query set far larger than the per-batch broadcast
  * (10k queries here — the shape that OOMs a naive all-queries
  * broadcast at a billion rows). */
class KnnBatchedSpec extends SparkSpec {
  import spark.implicits._

  test("10k-query batched kNN == single-broadcast results, batch-count invariant") {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // 10k queries: 20 deterministically perturbed copies of each vector
    val queries = base.crossJoin(spark.range(20).toDF("rep"))
      .select(($"vec_id" * 20 + $"rep").as("query_id"),
        transform($"embedding",
          x => x + $"rep".cast("float") * lit(0.001f)).as("qv"))
    assert(queries.count() === 10000)

    def run(nb: Int): Array[(Long, Long, Long)] =
      KnnSearch.searchBatched(base, queries, "vec_id", "embedding", 5, nb)
        .select($"query_id", $"neighbor_id", $"rnk")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._3))

    val single = run(1)
    val batched = run(16)
    assert(single.length === 10000 * 5)
    assert(batched.sameElements(single),
      "batched result must equal the single-broadcast plan row-for-row")
  }
}
