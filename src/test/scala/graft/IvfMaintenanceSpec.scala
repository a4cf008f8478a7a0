package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfMaintenance

/** The split-hottest maintenance action. The full decision replay is
  * oracle-gated (v_ivf_split); these specs pin the split QUALITY on a
  * planted fixture — two well-separated modes mis-filed in one cluster
  * must come apart along the mode boundary — and the accounting laws. */
class IvfMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  // cluster 0: two planted modes (ids 0..19 near (0,…,0), ids 20..44
  // near (10,…,10)), centroid between them; cluster 1: a small loose
  // cluster that must come through untouched
  private def fixture = {
    val rnd = new scala.util.Random(11)
    def jitter(base: Float) =
      Seq.tabulate(8)(_ => base + rnd.nextGaussian().toFloat * 0.1f)
    val rows =
      (0L until 20L).map(i => (i, jitter(0f), 0)) ++
      (20L until 45L).map(i => (i, jitter(10f), 0)) ++
      (45L until 55L).map(i => (i, jitter(100f), 1))
    val assign = rows.toDF("vec_id", "embedding", "cluster_id")
    val cent = Seq(
      (0, Seq.fill(8)(5f)),    // between the two planted modes
      (1, Seq.fill(8)(100f))).toDF("cluster_id", "centroid")
    (assign, cent)
  }

  test("split separates the planted modes exactly along the mode boundary") {
    val (assign, cent) = fixture
    val sides = IvfMaintenance.splitSides(assign, cent).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sides.size === 45, "only the hot cluster's members take sides")
    val bySide = sides.groupBy(_._2).view.mapValues(_.keySet).toMap
    // each side must be exactly one planted mode (which mode gets the
    // 'a' label depends on which member is farthest from the centroid)
    val modes = Set((0L until 20L).toSet, (20L until 45L).toSet)
    assert(Set(bySide("split_a"), bySide("split_b")) === modes,
      s"sides do not match the planted modes: $bySide")
  }

  test("degenerate split surfaces as an explicit population-0 split_b row") {
    // singleton hot cluster: nothing can move to side B, but the
    // caller provisioning partition k must SEE the no-op
    val assign = Seq((0L, Seq.fill(8)(1f), 0), (1L, Seq.fill(8)(50f), 1))
      .toDF("vec_id", "embedding", "cluster_id")
    val cent = Seq((0, Seq.fill(8)(1f)), (1, Seq.fill(8)(50f)))
      .toDF("cluster_id", "centroid")
    val rows = IvfMaintenance.splitHottest(assign, cent, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(rows.contains((2L, 0L, "split_b")), s"missing 0-row: $rows")
    assert(rows.contains((0L, 1L, "split_a")))
  }

  test("population accounting: kept untouched, split sides sum to the hot cluster") {
    val (assign, cent) = fixture
    val rows = IvfMaintenance.splitHottest(assign, cent, k = 2).collect()
    val kept = rows.filter(_.getString(2) == "kept")
    assert(kept.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 10L)))
    val a = rows.find(_.getString(2) == "split_a").get
    val b = rows.find(_.getString(2) == "split_b").get
    assert(a.getLong(0) === 0L, "split_a keeps the original cluster id")
    assert(b.getLong(0) === 2L, "split_b takes id k")
    assert(a.getLong(1) + b.getLong(1) === 45L)
    assert(rows.map(_.getLong(1)).sum === assign.count())
  }
}
