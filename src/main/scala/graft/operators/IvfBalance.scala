package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Population-bounded IVF rebuild — the build-time generalization of
  * [[IvfMaintenance.splitHottest]]'s one-cluster action. A coarse
  * quantizer trained on a bounded global sample can leave GIANT
  * clusters behind (a dense mode that drew few sample points gets few
  * centroids — measured on the second-decade probe: 2 of 782 clusters
  * held 37 % of a 200k corpus, and every probe or kNN-graph build
  * touching them paid an O(pop²) candidate bill). The reference never
  * meets this (its HNSW graph has no partitions to skew;
  * /root/reference/include/hnsw_index.h); the FAISS-world analog is
  * IVF re-training plus list splitting. Here: after assignment, every
  * cluster over `maxPop` is re-clustered INTO ITS OWN sub-centroids —
  * all oversized clusters in one grouped [[DfKMeans.fitVarK]] (two
  * shuffles per Lloyd iteration total, not per cluster), trained on a
  * deterministic hash-uniform member sample, assigned distributed.
  * Sub-clusters still over the bound after the geometric pass (an
  * identical-point mass admits no geometric split — every member ties
  * to one sub-centroid) are SALT-split: members spread by an avalanche
  * hash of the id across enough fresh ids to bound the population,
  * every salt sub carrying its parent's centroid (geometrically the
  * probe ranking cannot distinguish them, so ties break to the lowest
  * sub id — for the identical-point mass that triggers this path, any
  * sub serves queries equally).
  *
  * Scale shape: populations are one aggregate; the oversized list is a
  * bounded driver collect (≤ n/maxPop rows — the collectProbeIds
  * precedent); training touches only hash-sampled members of oversized
  * clusters; the only corpus-touching passes are the one argmin
  * re-assignment of oversized members and the final remap join. The
  * geometric sub-budget is capped at [[GeoKCap]] per cluster (a pass
  * is O(members × kg) — a cluster wanting more subs than the cap is
  * the coarse quantizer's failure, and the salt pass still enforces
  * the bound exactly).
  */
object IvfBalance {

  /** Geometric sub-centroid budget cap per oversized cluster. */
  val GeoKCap = 256

  /** Training-sample budget: `TrainFactor` × kg members per cluster. */
  val TrainFactor = 32

  /** The avalanche id hash shared with the uniform-sample discipline
    * (IvfIndex.buildSampled / d_stratified_sample): Knuth
    * multiplicative step folded through 2³². */
  private[operators] def idHash(id: Column): Column =
    pmod(id.cast("long") * lit(2654435761L), lit(4294967296L))

  /** Rebalance (centroids, assignments) so no cluster's population
    * exceeds `maxPop`. Input: `cent` (cluster_id int, centroid),
    * `assign` = any frame carrying `idCol`, `vecCol` and `cluster_id`.
    * Returns (centroids', assignments'):
    *
    *  - centroids': (cluster_id int, centroid, parent_id int, method
    *    string) — `kept` rows pass through (parent = self); `split`
    *    rows are trained sub-centroids of an oversized parent (only
    *    those that captured members — a sub no member is nearest to
    *    can never be assigned, so dropping it changes nothing);
    *    `salt` rows are hash-shard subs of a still-oversized cluster,
    *    ALL retained (the hash, not geometry, decides membership, so
    *    an empty salt sub is real layout the caller must see).
    *  - assignments': `assign` with `cluster_id` rewritten for moved
    *    members — same rows, same columns, a partition of the same id
    *    set.
    */
  def balance(cent: DataFrame, assign: DataFrame, idCol: String,
      vecCol: String, targetPop: Int = 256, maxPop: Int = 1024,
      iters: Int = 8): (DataFrame, DataFrame) = {
    require(targetPop > 0 && maxPop >= targetPop,
      s"need 0 < targetPop=$targetPop <= maxPop=$maxPop")
    val spark = cent.sparkSession
    import spark.implicits._

    // cut the caller's build lineage ONCE: every pass below (populations,
    // member scan, two remap joins) consumes the assignment, and a lazy
    // buildSampled plan replicated into each consumer grows the tree
    // multiplicatively (measured: the spec fixture OOMed the driver just
    // PRINTING the plan). A build pipeline at scale persists assignments
    // before maintenance anyway; this is the in-memory equivalent.
    val c0 = cent.localCheckpoint(true)
    val a0 = assign.localCheckpoint(true)

    val keptTag = c0.select($"cluster_id".cast("int").as("cluster_id"),
      $"centroid", $"cluster_id".cast("int").as("parent_id"),
      lit("kept").as("method"))

    // -------- geometric pass: grouped sub-Lloyd over oversized clusters
    val pops = a0.groupBy($"cluster_id".cast("int").as("cluster_id"))
      .agg(count(lit(1)).as("pop"))
    // bounded driver collect: at most n/maxPop clusters can be oversized
    val over = pops.filter($"pop" > maxPop)
      .orderBy("cluster_id").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    if (over.isEmpty) return (keptTag, a0)

    val base = c0.agg(max($"cluster_id".cast("int"))).head.getInt(0) + 1
    // deterministic id layout: offsets in cluster_id order
    var off = base
    val plan = over.map { case (c, p) =>
      val kg = math.min(GeoKCap,
        math.ceil(p.toDouble / targetPop).toInt) max 2
      // sample threshold in millionths: expected TrainFactor·kg rows
      val thresh = math.min(1000000L,
        math.ceil(1000000.0 * TrainFactor * kg / p).toLong)
      val o = off; off += kg
      (c, kg, o, thresh)
    }
    val planDf = plan.toSeq.toDF("group", "kg", "offset", "thresh")
    val overIds = plan.map(_._1)

    val members = a0
      .filter($"cluster_id".isin(overIds.map(i => i: Any): _*))
      .select($"cluster_id".cast("int").as("group"),
        col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val sample = members.join(broadcast(planDf), "group")
      .filter(pmod(idHash($"id"), lit(1000000L)) < $"thresh")
      .select($"group", $"id", $"vec")
    val subCent = DfKMeans.fitVarK(sample,
      planDf.select($"group", $"kg"), iters).localCheckpoint(true)
    // Guard: a group whose hash-sample selected zero rows (possible —
    // the threshold is probabilistic) trains zero sub-centroids, and
    // DfKMeans.assign's inner join would silently drop its members
    // from the remap while the filter below removed its centroid row,
    // leaving assignments that reference a nonexistent cluster. Such
    // groups KEEP their original centroid row instead and fall through
    // to the salt pass (their population is unchanged, so `still`
    // necessarily picks them up), whose anchor/extension centroids are
    // drawn from the kept rows below. Bounded collect: ≤ |over| rows.
    val trainedGroups = subCent.select($"group").distinct()
      .collect().map(_.getInt(0)).toSet
    val untrainedKept = keptTag
      .filter($"cluster_id".isin(
        overIds.filterNot(trainedGroups.contains).map(i => i: Any): _*))
    // argmin over the cluster's own subs; ties to the lowest code —
    // the fan-out is kg× the member scan, floored inside assign()
    val subAssign = DfKMeans.assign(members, subCent)
    // bounded: two longs per MOVED member — checkpointed so the three
    // consumers below (populations, salt filter, final remap) each cost
    // one broadcast probe, not a sub-Lloyd replay
    val remapGeo = subAssign.join(broadcast(planDf), "group")
      .select($"id", ($"offset" + $"code").cast("int").as("new_cluster"))
      .localCheckpoint(true)

    val idL = col(idCol).cast("long")
    val a1 = a0
      .join(remapGeo.withColumnRenamed("id", "__bid"),
        idL === $"__bid", "left")
      .withColumn("cluster_id",
        coalesce($"new_cluster", $"cluster_id".cast("int")))
      .drop("__bid", "new_cluster")

    // -------- salt pass: exact bound for geometrically unsplittable mass
    val pops1 = a1.groupBy($"cluster_id").agg(count(lit(1)).as("pop"))
    val still = pops1.filter($"pop" > maxPop)
      .orderBy("cluster_id").collect()
      .map(r => (r.getInt(0), r.getLong(1)))

    val geoCent = subCent.join(broadcast(planDf), "group")
      .select(($"offset" + $"code").cast("int").as("cluster_id"),
        $"centroid", $"group".cast("int").as("parent_id"),
        lit("split").as("method"))

    // the candidate centroid rows every salted cluster draws from:
    // trained geo subs plus the kept originals of untrained groups
    val candCent = geoCent.unionByName(untrainedKept)

    if (still.isEmpty) {
      // drop memberless geometric subs (argmin can never produce them).
      // (An untrained group keeps its full population, so it is always
      // in `still` — untrainedKept here is empty; unioned for safety.)
      val live = geoCent.join(
        a1.select($"cluster_id").distinct(), Seq("cluster_id"), "leftsemi")
      return (keptTag.filter(!$"cluster_id".isin(overIds.map(i => i: Any): _*))
        .unionByName(live).unionByName(untrainedKept), a1)
    }

    // The still-oversized cluster becomes the ANCHOR of its own salt
    // family: it stays in place as shard 0 (keeping its trained
    // centroid, its id, and ~1/ks of its members — no probe slot is
    // wasted on an emptied id) and ks−1 fresh EXTENSION shards absorb
    // the rest. Keeping the anchor row, with its geo lineage intact,
    // is what lets an auditor (and the DuckDB oracle) replay the whole
    // derivation: the geometric argmin that routed members to the
    // anchor needs the anchor's centroid in the candidate list.
    var off2 = off
    val saltPlan = still.map { case (c, p) =>
      val ks = math.ceil(p.toDouble / targetPop).toInt max 2
      val o = off2; off2 += ks - 1
      (c, ks, o)
    }
    val saltDf = saltPlan.toSeq.toDF("anchor", "ks", "salt_base")
    val saltIds = saltPlan.map(_._1)

    val remapSalt = a1
      .filter($"cluster_id".isin(saltIds.map(i => i: Any): _*))
      .select(idL.as("__sid"), $"cluster_id".as("anchor"))
      .join(broadcast(saltDf), "anchor")
      .select($"__sid",
        when(pmod(idHash($"__sid"), $"ks".cast("long")) === 0, $"anchor")
          .otherwise($"salt_base" +
            pmod(idHash($"__sid"), $"ks".cast("long")) - 1)
          .cast("int").as("salt_cluster"))
    val a2 = a1
      .join(remapSalt, idL === $"__sid", "left")
      .withColumn("cluster_id", coalesce($"salt_cluster", $"cluster_id"))
      .drop("__sid", "salt_cluster")

    // anchor rows: the salted geo sub relabeled (lineage unchanged);
    // extension rows: fresh ids carrying the anchor's centroid, ALL
    // ks−1 retained populated or not (the hash, not geometry, decides
    // membership — an empty shard is real layout the caller must see)
    val anchorCent = candCent
      .filter($"cluster_id".isin(saltIds.map(i => i: Any): _*))
      .select($"cluster_id", $"centroid", $"parent_id",
        lit("salt_anchor").as("method"))
    val saltCent = candCent
      .filter($"cluster_id".isin(saltIds.map(i => i: Any): _*))
      .select($"cluster_id".as("anchor"), $"centroid")
      .join(broadcast(saltDf), "anchor")
      .select(explode(sequence(lit(1), $"ks" - 1)).as("j"),
        $"salt_base", $"centroid", $"anchor")
      .select(($"salt_base" + $"j" - 1).cast("int").as("cluster_id"),
        $"centroid", $"anchor".as("parent_id"), lit("salt").as("method"))

    val liveGeo = geoCent
      .filter(!$"cluster_id".isin(saltIds.map(i => i: Any): _*))
      .join(a2.select($"cluster_id").distinct(), Seq("cluster_id"), "leftsemi")
    (keptTag.filter(!$"cluster_id".isin(overIds.map(i => i: Any): _*))
      .unionByName(liveGeo).unionByName(anchorCent).unionByName(saltCent), a2)
  }
}
