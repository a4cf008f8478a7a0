package graft

import org.apache.spark.sql.functions._

import graft.GraftVector._

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("topK returns k smallest scores ascending with id tie-break") {
    val data = Seq(
      (1L, 5.0, 10L), (1L, 1.0, 11L), (1L, 3.0, 12L), (1L, 1.0, 9L),
      (1L, 4.0, 13L), (2L, 2.0, 20L)
    ).toDF("g", "score", "id")
    val rows = data.groupBy($"g")
      .agg(topK($"score", $"id", 3).as("top"))
      .select($"g", $"top")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getDouble(0), x.getLong(1))))
      .toMap
    assert(rows(1L) === Seq((1.0, 9L), (1.0, 11L), (3.0, 12L)))
    assert(rows(2L) === Seq((2.0, 20L)))
  }

  test("topK distributed matches full sort on real data") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .repartition(7) // force partial/merge paths across partitions
    val q = e.filter($"vec_id" === 0)
      .select($"embedding".as("qv"))
    val viaAgg = e.crossJoin(broadcast(q))
      .select(l2($"embedding", $"qv").as("d"), $"vec_id")
      .agg(topK($"d", $"vec_id", 15).as("top"))
      .select(explode($"top").as("t")).select($"t.id")
      .collect().map(_.getLong(0)).toSeq
    val viaSort = e.crossJoin(broadcast(q))
      .select(l2($"embedding", $"qv").as("d"), $"vec_id")
      .orderBy($"d", $"vec_id").limit(15)
      .collect().map(_.getLong(1)).toSeq
    assert(viaAgg === viaSort)
  }

  test("topK handles groups smaller than k and null scores") {
    val data = Seq((1L, Some(2.0), 1L), (1L, None, 2L)).toDF("g", "s", "id")
    val r = data.groupBy($"g").agg(topK($"s", $"id", 5).as("top"))
      .select(size($"top")).head().getInt(0)
    assert(r === 1)
  }
}
