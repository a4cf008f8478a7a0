package graft

import org.apache.spark.sql.functions._

import graft.GraftVector._
import graft.operators.{IvfBalance, IvfIndex}

/** The population-bound law of IvfBalance.balance: after balancing,
  * no cluster exceeds maxPop, the assignment stays a partition of the
  * same id set, and every assigned cluster id has a centroid row. The
  * adversarial fixtures are the two ways a coarse quantizer leaves
  * giant clusters: a dense-but-spread mode (geometrically splittable —
  * the sub-Lloyd pass must bound it) and an identical-point mass (no
  * geometric split exists — the salt pass must bound it). */
class IvfBalanceSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** n vectors near `center` with per-point deterministic jitter of
    * the given amplitude (0.0 = identical-point mass). */
  private def blob(idFrom: Long, n: Int, center: Float, amp: Float) =
    (0 until n).map { i =>
      val id = idFrom + i
      (id, Array.tabulate(dim)(d =>
        center + amp * (((id * 31 + d * 7) % 13).toFloat / 13f - 0.5f)))
    }

  private def frames(rows: Seq[(Long, Array[Float])]) = {
    val e = rows.toDF("vec_id", "embedding")
      .select($"vec_id", transform($"embedding",
        x => x.cast("float")).as("embedding"))
    IvfIndex.buildSampled(e, "vec_id", "embedding", k = 4, sampleSize = 200)
  }

  private def checkInvariants(centB: org.apache.spark.sql.DataFrame,
      aB: org.apache.spark.sql.DataFrame, ids: Set[Long], maxPop: Int)
      : Unit = {
    // partition of the same id set
    val got = aB.select($"vec_id").collect().map(_.getLong(0))
    assert(got.length === ids.size, "row count changed")
    assert(got.toSet === ids, "id set changed")
    // population bound
    val pops = aB.groupBy($"cluster_id").count()
      .collect().map(r => (r.get(0), r.getLong(1)))
    assert(pops.forall(_._2 <= maxPop),
      s"over-bound clusters remain: ${pops.filter(_._2 > maxPop).toSeq}")
    // every assigned cluster has a centroid row
    val centIds = centB.select($"cluster_id").collect()
      .map(_.getInt(0)).toSet
    val assignIds = aB.select($"cluster_id").distinct().collect()
      .map(_.get(0).asInstanceOf[Int]).toSet
    assert(assignIds.subsetOf(centIds),
      s"assignments without centroid: ${assignIds.diff(centIds)}")
  }

  test("dense spread mode: geometric pass bounds populations") {
    // 1200 of 1500 vectors in one spread blob: the 4-centroid build
    // leaves a giant cluster no matter where Lloyd puts centroids
    val rows = blob(0, 1200, 0f, 2f) ++ blob(10000, 150, 50f, 1f) ++
      blob(20000, 150, -50f, 1f)
    val (cent, assign) = frames(rows)
    val before = assign.groupBy($"cluster_id").count()
      .agg(max($"count")).head.getLong(0)
    assert(before > 200, s"fixture must start skewed, max pop $before")

    val (centB, aB) = IvfBalance.balance(cent, assign, "vec_id",
      "embedding", targetPop = 100, maxPop = 200)
    checkInvariants(centB, aB, rows.map(_._1).toSet, maxPop = 200)
    // the spread mode splits geometrically — no salt rows needed
    assert(centB.filter($"method".isin("salt", "salt_anchor")).count() === 0,
      "spread mode must not need the salt fallback")
    // split rows point at a real oversized parent
    val parents = centB.filter($"method" === "split")
      .select($"parent_id").distinct().collect().map(_.getInt(0)).toSet
    assert(parents.nonEmpty, "geometric pass produced no splits")
  }

  test("identical-point mass: salt pass bounds what geometry cannot") {
    val rows = blob(0, 900, 1f, 0f) ++ blob(10000, 150, 50f, 1f) ++
      blob(20000, 150, -50f, 1f)
    val (cent, assign) = frames(rows)
    val (centB, aB) = IvfBalance.balance(cent, assign, "vec_id",
      "embedding", targetPop = 100, maxPop = 200)
    checkInvariants(centB, aB, rows.map(_._1).toSet, maxPop = 200)
    val salts = centB.filter($"method" === "salt")
    assert(salts.count() > 0, "identical mass requires salt shards")
    // every salt family has exactly one anchor (the salted geo sub,
    // kept in place as shard 0) and every extension shard carries the
    // anchor's centroid verbatim
    val anchors = centB.filter($"method" === "salt_anchor")
    assert(anchors.count() > 0, "salt families must keep their anchor")
    val anchorIds = anchors.select($"cluster_id").collect()
      .map(_.getInt(0)).toSet
    val extParents = salts.select($"parent_id").distinct().collect()
      .map(_.getInt(0)).toSet
    assert(extParents === anchorIds,
      s"extension shards must point at anchors: $extParents vs $anchorIds")
    val anchorCent = anchors.select($"cluster_id".as("parent_id"),
      $"centroid".as("pc"))
    assert(salts.join(anchorCent, "parent_id")
      .filter($"centroid" =!= $"pc").count() === 0,
      "salt shard centroid must equal its anchor's")
  }

  test("a cluster whose hash-sample selects zero rows keeps its centroid " +
      "and salt-splits (no orphaned assignments)") {
    // Adversarial ids: every member of the oversized cluster hashes
    // ABOVE the sample threshold, so the geometric pass trains zero
    // sub-centroids for it. p=1000, targetPop=100 ⇒ kg=10, thresh =
    // ceil(1e6·32·10/1000) = 320000 millionths; all ids chosen with
    // idHash%1e6 ≥ 350000 ⇒ the sample is empty by construction.
    def hMil(id: Long): Long =
      java.lang.Long.remainderUnsigned(id * 2654435761L, 4294967296L) % 1000000L
    // EVERY id in the fixture is adversarial, so whatever coarse
    // cluster shapes the build produces, any oversized cluster's
    // sample is empty (side blobs merging with the mass can only
    // RAISE p, which lowers thresh further)
    val advIds = Iterator.iterate(100000L)(_ + 1)
      .filter(hMil(_) >= 350000L).take(1300).toSeq
    // identical-point mass so the coarse argmin puts all 1000 in ONE
    // cluster (ties to the lowest code)
    val rows = advIds.take(1000).map(id => (id, Array.fill(dim)(0f))) ++
      advIds.slice(1000, 1150).map(id => (id, Array.tabulate(dim)(d =>
        50f + (((id * 31 + d * 7) % 13).toFloat / 13f - 0.5f)))) ++
      advIds.slice(1150, 1300).map(id => (id, Array.tabulate(dim)(d =>
        -50f + (((id * 31 + d * 7) % 13).toFloat / 13f - 0.5f))))
    val (cent, assign) = frames(rows)
    val before = assign.groupBy($"cluster_id").count()
      .agg(max($"count")).head.getLong(0)
    assert(before >= 1000L, s"fixture must hold an oversized cluster: $before")

    val (centB, aB) = IvfBalance.balance(cent, assign, "vec_id",
      "embedding", targetPop = 100, maxPop = 200)
    // the load-bearing invariant the guard restores: every assigned
    // cluster id has a centroid row (pre-guard, the mass's members kept
    // a cluster_id whose centroid row was dropped)
    checkInvariants(centB, aB, rows.map(_._1).toSet, maxPop = 200)
    // the untrained path is visible: no geometric splits happened at
    // all, and the salt anchor is the ORIGINAL centroid row (parent =
    // self — a trained geo anchor would carry its group as parent)
    assert(centB.filter($"method" === "split").count() === 0,
      "an empty sample cannot have trained geometric subs")
    val anchors = centB.filter($"method" === "salt_anchor").collect()
    assert(anchors.nonEmpty, "the untrained cluster must be salt-anchored")
    assert(anchors.forall(r => r.getInt(0) == r.getInt(2)),
      "untrained anchors keep their own centroid row (parent = self)")
  }

  test("already-balanced input passes through untouched") {
    val rows = blob(0, 100, 0f, 2f) ++ blob(10000, 100, 50f, 1f) ++
      blob(20000, 100, -50f, 1f) ++ blob(30000, 100, 25f, 1f)
    val (cent, assign) = frames(rows)
    val (centB, aB) = IvfBalance.balance(cent, assign, "vec_id",
      "embedding", targetPop = 100, maxPop = 400)
    assert(centB.filter($"method" =!= "kept").count() === 0)
    assert(centB.count() === cent.count())
    assert(aB.select($"vec_id", $"cluster_id").collect().toSet ===
      assign.select($"vec_id", $"cluster_id".cast("int")).collect().toSet)
  }

  test("balanced index still searches: full probe of the query's mode") {
    // recall against brute force with probes covering the split mode:
    // a query inside the dense mode must find its true neighbors among
    // the sub-clusters the balance created
    val rows = blob(0, 1200, 0f, 2f) ++ blob(10000, 150, 50f, 1f)
    val (cent, assign) = frames(rows)
    val (centB, aB) = IvfBalance.balance(cent, assign, "vec_id",
      "embedding", targetPop = 100, maxPop = 200)
    val nClusters = centB.count().toInt
    val e = rows.toDF("vec_id", "embedding")
      .select($"vec_id", transform($"embedding",
        x => x.cast("float")).as("embedding"))
    val q = e.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val res = IvfIndex.search(centB, aB, q, "vec_id", "embedding",
        k = 10, nprobe = nClusters)
      .groupBy($"query_id").agg(collect_set($"neighbor_id").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val gt = e.crossJoin(broadcast(q))
      .groupBy($"query_id")
      .agg(topK(l2($"embedding", $"qv"), $"vec_id", 10).as("nn"))
      .select($"query_id", transform($"nn", x => x.getField("id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    gt.foreach { case (qid, ids) =>
      assert(res(qid) === ids, s"query $qid: full probe must be exact") }
  }
}
