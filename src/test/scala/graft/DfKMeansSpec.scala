package graft

import org.apache.spark.sql.functions._

import graft.operators.DfKMeans

class DfKMeansSpec extends SparkSpec {
  import spark.implicits._

  test("batched fit recovers separated clusters in every group") {
    // two groups, each with two well-separated blobs around 0 and 100
    val pts = (for {
      g <- 0 to 1
      i <- 0 until 40
    } yield {
      val base = if (i % 2 == 0) 0f else 100f
      (g, i.toLong, Seq(base + (i % 5) * 0.1f, base - (i % 3) * 0.1f))
    }).toDF("group", "id", "vec")

    val cent = DfKMeans.fit(pts, k = 2, iters = 5)
    assert(cent.count() === 4) // 2 groups × 2 codes
    val centers = cent.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
    centers.foreach { case (_, _, c) =>
      val m = c.head
      assert(m < 10f || m > 90f, s"centroid $c not at a blob")
    }
    // assignment separates the blobs
    val assigned = DfKMeans.assign(pts, cent)
      .join(pts, Seq("group", "id"))
      .select($"group", $"id", $"code", element_at($"vec", 1).as("x"))
      .collect()
    val byCode = assigned.groupBy(r => (r.getInt(0), r.getInt(2)))
    byCode.values.foreach { rows =>
      val xs = rows.map(_.getFloat(3))
      assert(xs.forall(_ < 10f) || xs.forall(_ > 90f),
        "a cluster mixed the two blobs")
    }
  }
}
