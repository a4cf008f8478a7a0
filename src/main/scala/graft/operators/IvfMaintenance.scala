package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftVector._

/** Index maintenance actions over a persisted IVF layout — the
  * operations the v_ivf_stats audit motivates. The first: split the
  * hottest cluster (the partition whose population makes every probe
  * touching it the scan-skew straggler) by deterministic farthest-point
  * 2-seeding. Between full rebuilds this is the rebalance step; the
  * reference has no analog (its graph has no partitions to skew), the
  * FAISS-world equivalent is re-training the coarse quantizer.
  */
object IvfMaintenance {

  /** One split pass: populations, the hottest cluster id (population
    * DESC, cluster_id tie-break), and the per-member side frame —
    * seed A = the member farthest from the cluster's own centroid,
    * seed B = the member farthest from seed A (both (d², min-vec_id)
    * tie-broken), members side with their nearer seed (ties → A).
    *
    * Scale shape: populations are one small aggregate; the member pass
    * is a PRUNED scan of exactly the hot partition (the probe
    * machinery reused for maintenance); seeds are two bounded 1-row
    * driver collects (the collectProbeIds precedent); side assignment
    * is scan-side against two dim-float literals. */
  private def splitCore(assign: DataFrame, cent: DataFrame)
      : (DataFrame, Long, DataFrame) = {
    val spark = assign.sparkSession
    import spark.implicits._
    val pops = assign.groupBy($"cluster_id".cast("long").as("cluster_id"))
      .agg(count(lit(1)).as("population"))
    val hot = pops.orderBy($"population".desc, $"cluster_id")
      .limit(1).collect()(0).getLong(0)
    // pruned scan: only the hot cluster's partition is read; cached
    // ONLY across the two seed collects, released before returning
    // (the lazy sides frame rebuilds from the pruned scan — one extra
    // read at action time beats a cached block leaked per invocation)
    val mem = assign.filter($"cluster_id" === hot)
      .join(broadcast(cent.filter($"cluster_id" === hot)), "cluster_id")
      .select($"vec_id", $"embedding",
        l2Sq($"embedding", $"centroid").as("d2own"))
      .cache()
    val seedA = mem.orderBy($"d2own".desc, $"vec_id").limit(1)
      .select($"embedding").collect()(0).getSeq[Float](0)
    val aLit = typedlit(seedA)
    val seedB = mem.orderBy(l2Sq($"embedding", aLit).desc, $"vec_id")
      .limit(1).select($"embedding").collect()(0).getSeq[Float](0)
    val bLit = typedlit(seedB)
    mem.unpersist(false)
    // seeds are literals now — sides depend only on the pruned scan
    val sides = assign.filter($"cluster_id" === hot)
      .select($"vec_id",
        when(l2Sq($"embedding", aLit) <= l2Sq($"embedding", bLit),
          lit("split_a")).otherwise(lit("split_b")).as("origin"))
    (pops, hot, sides)
  }

  /** Split the most-populated cluster of `assign` in two. Returns the
    * post-split population table: kept clusters unchanged, `split_a`
    * keeps the original cluster id, `split_b` gets id `k`. */
  def splitHottest(assign: DataFrame, cent: DataFrame, k: Long): DataFrame = {
    val spark = assign.sparkSession
    import spark.implicits._
    val (pops, hot, sideFrame) = splitCore(assign, cent)
    // BOTH split rows always appear: a degenerate split (singleton hot
    // cluster, or every member tying to seed A) must surface as an
    // explicit population-0 split_b row, not silently return the input
    // relabeled — a caller provisioning partition k on this table
    // needs to see the no-op
    val sides = Seq(("split_a", hot), ("split_b", k))
      .toDF("origin", "cluster_id")
      .join(sideFrame.groupBy($"origin")
        .agg(count(lit(1)).as("population")), Seq("origin"), "left")
      .select($"cluster_id", coalesce($"population", lit(0L)).as("population"),
        $"origin")
    pops.filter($"cluster_id" =!= hot)
      .select($"cluster_id", $"population", lit("kept").as("origin"))
      .unionAll(sides)
  }

  /** Per-member side assignment of the hottest cluster (the detail
    * frame behind [[splitHottest]]'s counts) — exposed for specs. */
  def splitSides(assign: DataFrame, cent: DataFrame): DataFrame =
    splitCore(assign, cent)._3
}
