package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfMaintenance

/** The merge law of IvfMaintenance.mergeCold: clusters under the
  * relative population threshold are absorbed by their geometrically
  * nearest surviving sibling, total mass is conserved, survivors keep
  * their own id, and a balanced layout passes through untouched. */
class IvfMergeSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  /** (cluster_id, centroid at `center`, n members near it). */
  private def layout(specs: Seq[(Int, Float, Int)]) = {
    val cent = specs.map { case (c, ctr, _) =>
      (c, Array.fill(dim)(ctr).toSeq)
    }.toDF("cluster_id", "centroid")
      .select($"cluster_id",
        transform($"centroid", x => x.cast("float")).as("centroid"))
    val assign = specs.flatMap { case (c, _, n) =>
      (0 until n).map(i => (c * 100000L + i, c))
    }.toDF("vec_id", "cluster_id")
    (cent, assign)
  }

  test("cold cluster merges into the geometrically nearest survivor") {
    // clusters at 0 / 10 / 11 / 50; cluster 2 (center 11) is cold and
    // must land on cluster 1 (center 10), not 0 or 3
    val (cent, assign) = layout(Seq(
      (0, 0f, 40), (1, 10f, 40), (2, 11f, 3), (3, 50f, 40)))
    val out = IvfMaintenance.mergeCold(assign, cent)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (0L, 0L, 40L), (1L, 1L, 43L), (2L, 1L, 0L), (3L, 3L, 40L)))
  }

  test("total mass is conserved and absorbed rows report zero") {
    val (cent, assign) = layout(Seq(
      (0, 0f, 50), (1, 5f, 2), (2, 20f, 50), (3, 21f, 4), (4, 40f, 50)))
    val out = IvfMaintenance.mergeCold(assign, cent)
    assert(out.agg(sum($"population")).head.getLong(0) === 156L)
    val cold = out.filter($"merged_into" =!= $"cluster_id")
    assert(cold.select($"cluster_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 3L))
    assert(cold.filter($"population" =!= 0L).count() === 0)
  }

  test("zero-member cluster is cold layout, not a dropped row") {
    // cluster 1 has a centroid row but no members: it must appear in
    // the audit, absorbed (population 0), not vanish
    val (cent, assign) = layout(Seq(
      (0, 0f, 40), (1, 1f, 0), (2, 30f, 40)))
    val out = IvfMaintenance.mergeCold(assign, cent)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 0L, 40L), (1L, 0L, 0L), (2L, 2L, 40L)))
  }

  test("balanced layout passes through: every row keeps itself") {
    val (cent, assign) = layout(Seq(
      (0, 0f, 30), (1, 10f, 31), (2, 20f, 29), (3, 30f, 30)))
    val out = IvfMaintenance.mergeCold(assign, cent)
    assert(out.filter($"merged_into" =!= $"cluster_id").count() === 0)
    assert(out.agg(sum($"population")).head.getLong(0) === 120L)
  }
}
