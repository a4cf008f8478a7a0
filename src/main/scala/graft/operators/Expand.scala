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
}
