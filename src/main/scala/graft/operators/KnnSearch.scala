package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftVector._

/** Exact kNN for query sets of ANY size — the batch answer to the
  * reference's unbounded query stream (/root/reference/include/engine.h:100
  * `search_knn` serves one request at a time forever; the batch analog is
  * a query TABLE, possibly as large as the corpus).
  *
  * The single-broadcast plan (broadcast all queries, scan base once,
  * bounded-heap partial agg) is optimal while the query set fits in the
  * broadcast budget, and DIES past it — a billion-row query table cannot
  * broadcast. `searchBatched` splits queries into `numBatches`
  * deterministic hash-batches, runs the same broadcast plan per batch,
  * and unions the per-batch results: each batch stays under the
  * broadcast budget, the base table streams once per batch, and no
  * all-pairs shuffle ever materializes. Batch count is the knob trading
  * base re-scans against broadcast size (at extreme query volume, run
  * batches as separate jobs against a persisted base — same plan shape).
  */
object KnnSearch {

  /** queries: (query_id, qv array<float>); base: idCol + vecCol.
    * Returns (query_id, neighbor_id, rnk, dist) — identical rows to the
    * single-broadcast plan, any numBatches >= 1. */
  def searchBatched(base: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, numBatches: Int): DataFrame = {
    require(numBatches >= 1, s"numBatches must be >= 1, got $numBatches")
    val spark = base.sparkSession
    import spark.implicits._
    val batched = queries.withColumn("__batch",
      pmod(hash($"query_id"), lit(numBatches)))
    // per-batch work is |batch|× the base scan — parallelism must not
    // be left to byte-based split sizing (Expand.floorParallelism)
    val spread = Expand.floorParallelism(base)
    val perBatch = (0 until numBatches).map { b =>
      spread.crossJoin(broadcast(batched.filter($"__batch" === b).drop("__batch")))
        .groupBy($"query_id")
        .agg(topK(l2Sq(col(vecCol), $"qv"), col(idCol), k).as("nn"))
    }
    perBatch.reduce(_ unionByName _)
      .select($"query_id", posexplode($"nn"))
      .select($"query_id", $"col.id".as("neighbor_id"),
        ($"pos" + 1).cast("long").as("rnk"),
        round(sqrt($"col.score"), 4).as("dist"))
  }
}
