package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism floor for k×-expansion stages. */
object Expand {

  /** Byte-based split sizing is blind to per-row work: a stage that
    * evaluates every row against k broadcast centroids does k× the
    * scan's compute, so a small input that fits one split serializes
    * the whole expansion onto one core (measured: the sf10 probe ran
    * the 200k-row × 782-centroid kNN-graph probe stage in ONE task for
    * 16+ min on a 32-core box — the input parquet is ~100 MB of bytes,
    * ~10 GFLOP of work). Floor such a stage's parallelism at the
    * cluster default. At real scale the scan already carries more
    * splits than cores and this is a no-op — no shuffle is ever added
    * where the layout was already sufficient, and the added shuffle in
    * the small case moves only scan-sized bytes, a rounding error next
    * to the k× compute it unblocks. */
  def floorParallelism(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (df.rdd.getNumPartitions < sc.defaultParallelism)
      df.repartition(sc.defaultParallelism)
    else df
  }

  /** The shuffle-side twin: a join whose OUTPUT is k× the size of
    * either INPUT (candidate-expansion joins — each probed cluster's
    * members fan out to every query probing it) defeats AQE the same
    * way, from the other side: adaptive coalescing sizes the joined
    * stage by its shuffle INPUT bytes (a few MB of probe ids), merges
    * it onto one partition, and the k× fan-out serializes there
    * (measured at sf10: one task, 540 s of CPU, 31 cores idle).
    * `repartition(n, key)` is user-specified and therefore AQE-EXEMPT
    * — adaptive execution never coalesces it — so the expansion stage
    * keeps cluster-default parallelism while every downstream
    * (shrinking) stage stays fully adaptive. */
  def pinJoinParallelism(df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    val sc = df.sparkSession.sparkContext
    df.repartition(sc.defaultParallelism, key)
  }
}
