package graft

import org.apache.spark.sql.functions._

import graft.GraftVector._
import graft.operators.Sq8Index

class Sq8IndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
  private lazy val q = e.filter($"vec_id" < 8)
    .select($"vec_id".as("query_id"), $"embedding".as("qv"))

  test("SQ8 decode error is bounded by half a quantization step per dim") {
    val grid = Sq8Index.buildGrid(e, "embedding")
    val (mins, scales) = Sq8Index.gridArrays(grid)
    val codes = Sq8Index.encode(e, "vec_id", "embedding", mins, scales)
    val mn = typedlit(mins); val sc = typedlit(scales)
    val bad = e.join(codes, "vec_id")
      .select(exists(
        transform(sequence(lit(1), lit(mins.length)), j =>
          abs(element_at($"embedding", j).cast("double") -
            (element_at(mn, j) + element_at($"codes", j) * element_at(sc, j)))
            > element_at(sc, j) * 0.5 + 1e-9), identity _).as("over"))
      .filter($"over").count()
    assert(bad === 0, s"$bad vectors decode outside half a step")
  }

  test("SQ4 (levels=15): decode stays in half a step; wider refine holds " +
      "the recall floor one rung coarser") {
    val grid = Sq8Index.buildGrid(e, "embedding", levels = 15)
    val (mins, scales) = Sq8Index.gridArrays(grid)
    val codes = Sq8Index.encode(e, "vec_id", "embedding", mins, scales,
      levels = 15)
    // half-step decode bound holds at any level count
    val mn = typedlit(mins); val sc = typedlit(scales)
    val bad = e.join(codes, "vec_id")
      .select(exists(
        transform(sequence(lit(1), lit(mins.length)), j =>
          abs(element_at($"embedding", j).cast("double") -
            (element_at(mn, j) + element_at($"codes", j) * element_at(sc, j)))
            > element_at(sc, j) * 0.5 + 1e-9), identity _).as("over"))
      .filter($"over").count()
    assert(bad === 0, s"$bad vectors decode outside half a step")
    // codes actually use the 4-bit range
    assert(codes.select(max(array_max($"codes"))).head.getInt(0) <= 15)
    val gt = e.crossJoin(broadcast(q))
      .groupBy($"query_id")
      .agg(topK(l2Sq($"embedding", $"qv"), $"vec_id", 10).as("nn"))
      .select($"query_id", transform($"nn", x => x.getField("id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val res = Sq8Index.searchRefined(grid, codes, e, "vec_id", "embedding",
        q, k = 10, refineFactor = 8)
      .groupBy($"query_id").agg(collect_list($"neighbor_id").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val recall = gt.map { case (qid, ids) =>
      (res.getOrElse(qid, Set.empty) & ids).size.toDouble / ids.size
    }.sum / gt.size
    assert(recall >= 0.8, s"SQ4 refined recall $recall < 0.8")
  }

  test("refined SQ8 search recovers the exact top-10 almost perfectly") {
    val grid = Sq8Index.buildGrid(e, "embedding")
    val (mins, scales) = Sq8Index.gridArrays(grid)
    val codes = Sq8Index.encode(e, "vec_id", "embedding", mins, scales)
    val gt = e.crossJoin(broadcast(q))
      .groupBy($"query_id")
      .agg(topK(l2Sq($"embedding", $"qv"), $"vec_id", 10).as("nn"))
      .select($"query_id", transform($"nn", x => x.getField("id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val res = Sq8Index.searchRefined(grid, codes, e, "vec_id", "embedding",
        q, k = 10, refineFactor = 4)
      .groupBy($"query_id").agg(collect_list($"neighbor_id").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val recall = gt.map { case (qid, ids) =>
      (res.getOrElse(qid, Set.empty) & ids).size.toDouble / ids.size
    }.sum / gt.size
    assert(recall >= 0.9, s"SQ8 refined recall $recall < 0.9")
    // self is its own nearest neighbor at rank 1
    val selfTop = Sq8Index.searchRefined(grid, codes, e, "vec_id",
        "embedding", q, k = 1, refineFactor = 4)
      .filter($"query_id" === $"neighbor_id" && $"rnk" === 1)
    assert(selfTop.count() === 8)
  }
}
