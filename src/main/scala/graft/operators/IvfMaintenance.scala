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

  /** The inverse maintenance action: merge COLD clusters (population
    * strictly below `num/den` of the mean) into their nearest surviving
    * sibling — FAISS-world: inverted-list concatenation, reclaiming
    * probe slots from clusters the data has drifted away from (a probe
    * spent on a 3-member cluster buys ~nothing; after the merge the
    * same nprobe budget covers more of the corpus). Members keep the
    * absorber's id WITHOUT re-argmin — list merge semantics, the exact
    * dual of [[splitHottest]]'s relabel.
    *
    * Target rule (deterministic): nearest surviving centroid by
    * centroid-to-centroid d², ties to the lowest cluster id. Survivors
    * always exist: any cluster at or above the mean is never cold
    * (pop ≥ total/k ⇒ pop·k·den ≥ total·den > total·num for num<den).
    *
    * Scale shape: populations are one aggregate over the assignment;
    * the cold set and the k×k_cold distance argmin live on bounded
    * centroid frames (k rows — broadcast both sides); nothing
    * corpus-sized moves. Returns the post-merge audit — one row per
    * ORIGINAL cluster id: (cluster_id, merged_into, population) where
    * cold rows show their absorber and population 0, survivors show
    * themselves and own + absorbed counts. */
  def mergeCold(assign: DataFrame, cent: DataFrame,
      num: Int = 9, den: Int = 10): DataFrame = {
    require(0 < num && num < den, s"need 0 < num=$num < den=$den")
    val spark = assign.sparkSession
    import spark.implicits._
    val popsRaw = assign.groupBy($"cluster_id".cast("int").as("cluster_id"))
      .agg(count(lit(1)).as("pop"))
    // skeleton from the centroid table: a zero-member cluster is real
    // layout (and maximally cold) — GROUP BY alone would drop it
    val k = cent.count()
    val pops = cent.select($"cluster_id".cast("int").as("cluster_id"))
      .join(popsRaw, Seq("cluster_id"), "left")
      .select($"cluster_id", coalesce($"pop", lit(0L)).as("pop"))
    val tot = pops.agg(sum($"pop").as("total"))
    val flags = pops.crossJoin(broadcast(tot))
      .select($"cluster_id", $"pop",
        ($"pop" * lit(k) * lit(den.toLong) < lit(num.toLong) * $"total")
          .as("cold"))
      .localCheckpoint(true) // three consumers below; pops is k rows
    val centI = cent.select($"cluster_id".cast("int").as("cluster_id"),
      $"centroid")
    val coldCent = centI.join(
      flags.filter($"cold").select($"cluster_id"), Seq("cluster_id"))
    val survCent = centI.join(
      flags.filter(!$"cold").select($"cluster_id"), Seq("cluster_id"))
    // k_surv × k_cold distance argmin on bounded frames; ties → lowest
    // surviving id (min_by on the (d², dst) struct)
    val tgt = survCent
      .select($"cluster_id".as("dst"), $"centroid".as("sc"))
      .crossJoin(broadcast(coldCent
        .select($"cluster_id".as("src"), $"centroid".as("cc"))))
      .groupBy($"src")
      .agg(min_by($"dst", struct(graft.GraftVector.l2Sq($"sc", $"cc"),
        $"dst")).as("dst"))
    val absorbed = tgt
      .join(flags.select($"cluster_id".as("src"), $"pop"), "src")
      .groupBy($"dst").agg(sum($"pop").as("extra"))
    flags
      .join(tgt.withColumnRenamed("src", "cluster_id"),
        Seq("cluster_id"), "left")
      .join(absorbed.withColumnRenamed("dst", "cluster_id"),
        Seq("cluster_id"), "left")
      .select($"cluster_id".cast("long").as("cluster_id"),
        coalesce($"dst", $"cluster_id").cast("long").as("merged_into"),
        when($"cold", lit(0L))
          .otherwise($"pop" + coalesce($"extra", lit(0L)))
          .as("population"))
      .orderBy("cluster_id")
  }
}
