package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftVector._

/** Product Quantization: the compressed-vector sketch the reference
  * never got to (its HNSW stores raw floats — hnsw_node.h keeps a
  * `const float*` per node). PQ splits each vector into `numSub`
  * subvectors, k-means-quantizes each subspace to `codebookSize`
  * centroids, and stores only the centroid ids: 64-dim float32 (256 B)
  * → 8 codes (8 B) at numSub=8 — the difference between an index that
  * fits in cluster RAM at 100 TB of raw vectors and one that doesn't.
  *
  * Search uses Asymmetric Distance Computation as a join-aggregate:
  * a tiny (query × sub × code) distance-table DF joins the exploded
  * codes on (sub, code) and sums per (query, vector) — no UDFs, no
  * driver-side loops, shuffle keys are the bounded code space.
  */
object PqIndex {

  /** Fit per-subspace codebooks and encode every vector.
    * Returns (codebooks, codes):
    *  - codebooks(sub int, code int, centroid array<float>)
    *  - codes(idCol, codes array<int> of length numSub)
    */
  def build(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, numSub: Int = 8, codebookSize: Int = 16,
      iters: Int = 5): (DataFrame, DataFrame) = {
    require(dim % numSub == 0, "numSub must divide dim")
    val subDim = dim / numSub
    val spark = embeddings.sparkSession
    import spark.implicits._

    // every subspace becomes a k-means GROUP: all codebooks train in one
    // batched DfKMeans run (two shuffles per iteration total, not per sub)
    val src = embeddings.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("__vec"))
    val pts = src.select($"id",
        posexplode(lit((0 until numSub).toArray)).as(Seq("pos", "group")),
        $"__vec")
      .select($"group", $"id",
        slice($"__vec", $"group" * subDim + 1, lit(subDim)).as("vec"))

    val codebooks = DfKMeans.fit(pts, codebookSize, iters)
      .select($"group".as("sub"), $"code", $"centroid")
    val codes = DfKMeans.assign(pts,
        codebooks.select($"sub".as("group"), $"code", $"centroid"))
      .groupBy($"id")
      .agg(transform(array_sort(collect_list(struct($"group", $"code"))),
        x => x.getField("code")).as("codes"))
      .select($"id".as(idCol), $"codes")
    (codebooks, codes)
  }

  /** ADC top-k: queries(query_id, qv array<float>) → (query_id,
    * neighbor_id, rnk, adist). Distances are approximate (quantized). */
  def search(codebooks: DataFrame, codes: DataFrame, queries: DataFrame,
      idCol: String, dim: Int, numSub: Int, k: Int): DataFrame = {
    val subDim = dim / numSub
    val spark = codes.sparkSession
    import spark.implicits._
    // distance table: |queries| × numSub × codebookSize rows (tiny)
    val dtab = queries.crossJoin(broadcast(codebooks))
      .select($"query_id", $"sub", $"code",
        l2Sq(slice($"qv", $"sub" * subDim + 1, lit(subDim)), $"centroid").as("d"))
    // exploded codes join the table on the bounded (sub, code) key space
    val exploded = codes.select(col(idCol).as("neighbor_id"),
      posexplode($"codes").as(Seq("sub", "code")))
    exploded.join(broadcast(dtab), Seq("sub", "code"))
      .groupBy($"query_id", $"neighbor_id")
      .agg(sum($"d").as("adist"))
      .groupBy($"query_id")
      .agg(topK($"adist", $"neighbor_id", k).as("nn"))
      .select($"query_id", posexplode($"nn"))
      .select($"query_id", $"col.id".as("neighbor_id"),
        ($"pos" + 1).cast("long").as("rnk"),
        round($"col.score", 4).as("adist"))
  }
}
