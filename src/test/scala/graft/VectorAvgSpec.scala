package graft

import org.apache.spark.sql.functions._

import graft.GraftVector._

class VectorAvgSpec extends SparkSpec {
  import spark.implicits._

  test("vectorAvg equals manual element-wise mean") {
    val df = Seq(
      (1L, Seq(1f, 2f, 3f)), (1L, Seq(3f, 4f, 5f)), (2L, Seq(10f, 0f, 0f))
    ).toDF("g", "v")
    val got = df.groupBy($"g").agg(vectorAvg($"v").as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) === Seq(2.0, 3.0, 4.0))
    assert(got(2L) === Seq(10.0, 0.0, 0.0))
  }

  test("distributed partials merge correctly and nulls are skipped") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").repartition(7)
    val viaAgg = e.groupBy($"label").agg(vectorAvg($"embedding").as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val manual = e.select($"label", posexplode($"embedding"))
      .groupBy($"label", $"pos").agg(avg($"col").as("a"))
      .collect().groupBy(_.getInt(0))
      .map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
    viaAgg.foreach { case (l, c) =>
      c.zip(manual(l)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    val withNull = Seq((1L, Some(Seq(2f, 2f))), (1L, None)).toDF("g", "v")
      .groupBy($"g").agg(vectorAvg($"v").as("c")).head().getSeq[Double](1)
    assert(withNull === Seq(2.0, 2.0))
  }
}
