package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.MmrSelect

/** Laws for MMR diversified retrieval: the greedy selection actually
  * diversifies (an exact duplicate of the top hit is displaced by a
  * less relevant but novel item), λ=1 degenerates to pure relevance,
  * and the output is a well-formed ranking. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  /** t and its exact duplicate t' lead on relevance; b is less relevant
    * but novel; c is weakly relevant and novel. */
  private lazy val fixture: DataFrame = Seq(
    (100L, Seq(0.95f, 0.3122499f, 0f, 0f)),   // t: rel ≈ 0.95
    (101L, Seq(0.95f, 0.3122499f, 0f, 0f)),   // t' = t (exact duplicate)
    (102L, Seq(0.6f, -0.55f, 0.58f, 0f)),     // b: rel ≈ 0.6, sim(b,t) ≈ 0.4
    (103L, Seq(0.2f, 0.1f, -0.9f, 0.3f)))     // c: rel ≈ 0.21
    .toDF("vec_id", "embedding")
    .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))

  private lazy val query = Seq((0L, Seq(1f, 0f, 0f, 0f)))
    .toDF("query_id", "qv")
    .select($"query_id", $"qv".cast("array<float>").as("qv"))

  private def pick(lambda: Double, k: Int): Seq[Long] =
    MmrSelect.diversify(fixture, "vec_id", "embedding", query,
        nCandidates = 4, k = k, lambda = lambda)
      .orderBy("rnk").collect().map(_.getLong(2)).toSeq

  test("an exact duplicate of the top hit is displaced by novel items") {
    // λ=0.5: t' scores 0.5·0.95 − 0.5·1 < 0 and loses to both b and c
    assert(pick(lambda = 0.5, k = 3) === Seq(100L, 102L, 103L))
  }

  test("λ=1 degenerates to pure relevance order (duplicate and all)") {
    assert(pick(lambda = 1.0, k = 3) === Seq(100L, 101L, 102L))
  }

  test("v_mmr on the corpus: k distinct results per query, rank 1 = cosine argmax") {
    val out = queries.VectorQueries.all("v_mmr")(spark, sfDir).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size === 8)
    byQ.foreach { case (q, rows) =>
      assert(rows.length === 8, s"query $q returned ${rows.length} rows")
      val ids = rows.map(_.getLong(2))
      assert(ids.distinct.length === ids.length, s"query $q repeated a result")
      assert(!ids.contains(q), s"query $q returned itself")
    }
    // rank 1 is the plain cosine argmax (MMR only re-ranks from rank 2)
    val e = Tables.load(spark, sfDir, "embeddings")
    val q0 = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val top1 = e.filter($"vec_id" =!= 0).crossJoin(broadcast(q0))
      .select($"vec_id", GraftVector.cosine($"embedding", $"qv").as("c"))
      .orderBy($"c".desc, $"vec_id").limit(1).head().getLong(0)
    val mmr1 = out.filter(r => r.getLong(0) == 0L && r.getLong(1) == 1L)
      .head.getLong(2)
    assert(mmr1 === top1)
  }
}
