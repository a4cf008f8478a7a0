package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftVector._

/** Maximal-marginal-relevance diversified retrieval (Carbonell &
  * Goldstein 1998): a plain top-k returns k near-copies when the corpus
  * has duplicates; MMR greedily picks the next result by
  * λ·rel(c, q) − (1−λ)·max_{s∈S} sim(c, s) — relevance to the query
  * discounted by similarity to what is already selected. It is the
  * result-diversification face of the dedup stage: the same
  * cosine-redundancy measure d_embed_neardup removes at corpus build
  * time, applied at query time.
  *
  * Scale shape: the corpus is touched ONCE — a broadcast-query scan
  * with a bounded map-side top-nCandidates heap (the v_knn_bruteforce
  * plan) — and the greedy loop then runs k rounds over the BOUNDED
  * candidate frame (|queries| × nCandidates rows): per round one
  * equi-join against the ≤k selected rows and one argmax. Candidate
  * count per query is a constant, queries scale out, the raw corpus
  * never re-enters. Greedy selection is inherently sequential in k
  * (each pick changes the next round's scores) — k bounded rounds with
  * lineage cut per round, the BpeTrain/ConnectedComponents shape.
  *
  * Determinism: every argmax has the total tie-break (score desc, id);
  * λ and 1−λ are Scala doubles interpolated literal-for-literal into
  * the oracle (1−0.7 is 0.30000000000000004 — interpolation makes the
  * engines share it exactly); max over selected sims is order-free.
  */
object MmrSelect {

  /** Greedy MMR over the top-`nCandidates` cosine candidates of each
    * query. Returns (query_id, rnk, vec_id, mmr_score) with
    * rnk ∈ 1..k; rank 1 carries λ·rel (empty selected set). */
  def diversify(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, nCandidates: Int, k: Int,
      lambda: Double): DataFrame = {
    require(k >= 1 && nCandidates >= k, s"need 1 <= k <= nCandidates")
    require(lambda > 0.0 && lambda <= 1.0, s"lambda in (0, 1], got $lambda")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val oneMinus = 1 - lambda // interpolated into the oracle verbatim

    // one corpus scan: bounded top-n heap per query on (-cos, id)
    val shortlist = embeddings
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cv"))
      .crossJoin(broadcast(queries))
      .filter($"cid" =!= $"query_id")
      .groupBy($"query_id")
      .agg(topK(-cosine($"cv", $"qv"), $"cid", nCandidates).as("nn"))
      .select($"query_id", explode($"nn").as("x"))
      .select($"query_id", $"x.id".as("cid"), (-$"x.score").as("rel"))
    val cand = shortlist
      .join(embeddings.select(col(idCol).cast("long").as("cid"),
        col(vecCol).as("cv")), "cid")
      .localCheckpoint(true)

    val w = Window.partitionBy($"query_id").orderBy($"score".desc, $"cid")
    // round 1 argmaxes on rel ITSELF (not λ·rel: multiplying two
    // 1-ulp-apart rels by λ can collapse them, flipping the tie-break)
    val w1 = Window.partitionBy($"query_id").orderBy($"rel".desc, $"cid")
    var sel = cand
      .withColumn("r", row_number().over(w1)).filter($"r" === 1)
      .select($"query_id", lit(1L).as("rnk"), $"cid", $"cv",
        (lit(lambda) * $"rel").as("score"))
      .localCheckpoint(true)
    for (round <- 2 to k) {
      val winner = cand
        .join(sel.select($"query_id", $"cid".as("sid"), $"cv".as("sv")),
          "query_id")
        .filter($"cid" =!= $"sid")
        .groupBy($"query_id", $"cid", $"rel", $"cv")
        // count(selected) < |sel| ⇔ cid is already selected (its self
        // pair was filtered) — the anti-join folded into the aggregate
        .agg(max(cosine($"cv", $"sv")).as("msim"),
          count(lit(1)).as("n_sel"))
        .filter($"n_sel" === (round - 1))
        .withColumn("score", lit(lambda) * $"rel" - lit(oneMinus) * $"msim")
        .withColumn("r", row_number().over(w)).filter($"r" === 1)
        .select($"query_id", lit(round.toLong).as("rnk"), $"cid", $"cv",
          $"score")
      sel = sel.unionByName(winner).localCheckpoint(true)
    }
    sel.select($"query_id", $"rnk", $"cid".as("vec_id"),
        round($"score", 4).as("mmr_score"))
      .orderBy("query_id", "rnk")
  }

  /** The DuckDB oracle: same shortlist, k greedy rounds unrolled as
    * chained CTEs — per-candidate max-sim over the selected set, the
    * same λ/(1−λ) literals, the same (score desc, cid) argmax. */
  def oracleSql(nCandidates: Int, k: Int, lambda: Double,
      numQueries: Int): String = {
    val oneMinus = 1 - lambda
    def cos(a: String, b: String) =
      s"list_cosine_similarity($a::DOUBLE[], $b::DOUBLE[])"
    def round(i: Int): String =
      s"""sc$i AS (
         |  SELECT c.query_id, c.cid, c.rel, c.cv,
         |    $lambda * c.rel - $oneMinus * max(${cos("c.cv", "s.cv")}) AS score
         |  FROM cand c JOIN sel${i - 1} s USING (query_id)
         |  WHERE c.cid <> s.cid
         |  GROUP BY c.query_id, c.cid, c.rel, c.cv
         |  HAVING count(*) = ${i - 1}),
         |sel$i AS (
         |  SELECT * FROM sel${i - 1}
         |  UNION ALL
         |  SELECT query_id, ${i}::BIGINT AS rnk, cid, cv, score FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, cid) AS r FROM sc$i) WHERE r = 1)""".stripMargin
    s"""WITH c0 AS (
       |  SELECT q.vec_id AS query_id, b.vec_id AS cid, b.embedding AS cv,
       |    ${cos("b.embedding", "q.embedding")} AS rel
       |  FROM embeddings b
       |  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < $numQueries) q
       |  WHERE b.vec_id <> q.vec_id),
       |cand AS (
       |  SELECT query_id, cid, cv, rel FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, cid) AS crnk FROM c0)
       |  WHERE crnk <= $nCandidates),
       |sel1 AS (
       |  SELECT query_id, 1::BIGINT AS rnk, cid, cv, $lambda * rel AS score
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY rel DESC, cid) AS r FROM cand) WHERE r = 1),
       |${(2 to k).map(round).mkString(",\n")}
       |SELECT query_id, rnk, cid AS vec_id, round(score, 4) AS mmr_score
       |FROM sel$k ORDER BY query_id, rnk""".stripMargin
  }
}
