package graft

import graft.operators.MaxSim

/** MaxSim late-interaction scoring. The full derivation is oracle-gated
  * (v_maxsim_search); this spec pins the PROPERTY that makes
  * late interaction worth its storage: a document whose vectors cover
  * the query's distinct aspects beats one that averaged them away —
  * exactly the failure mode of single-vector retrieval. */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  private def vec(axis: Int, scale: Float = 1f): Seq[Float] =
    Seq.tabulate(8)(i => if (i == axis) scale else 0f)

  test("aspect-covering group beats averaged group beats one-aspect group") {
    val h = (math.sqrt(0.5)).toFloat // (e0+e1)/sqrt(2) coordinates
    val corpus = Seq(
      // group 0: covers BOTH query aspects with distinct vectors
      (0L, 0L, vec(0)), (0L, 1L, vec(1)),
      // group 1: both vectors are the average direction
      (1L, 2L, Seq(h, h, 0f, 0f, 0f, 0f, 0f, 0f)),
      (1L, 3L, Seq(h, h, 0f, 0f, 0f, 0f, 0f, 0f)),
      // group 2: one aspect twice, the other absent
      (2L, 4L, vec(0)), (2L, 5L, vec(0))
    ).toDF("doc_group", "vec_id", "vec")
    val queries = Seq(
      (0L, 0L, vec(0)), (0L, 1L, vec(1))
    ).toDF("query_group", "q_vec_id", "qv")
    val rows = MaxSim.topK(corpus, queries, k = 3)
      .orderBy("rnk").collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L),
      "ranking must be coverage > average > single-aspect")
    assert(rows(0).getDouble(3) === 2.0)          // 1 + 1
    assert(math.abs(rows(1).getDouble(3) - math.sqrt(2.0)) < 1e-3) // 2/sqrt(2)
    assert(rows(2).getDouble(3) === 1.0)          // 1 + 0
  }

  test("pruned two-stage MaxSim finds the brute-force winner and most of its top-5") {
    val brute = SparkEntry.queries("v_maxsim_search")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pruned = SparkEntry.queries("v_maxsim_pruned")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val bTop1 = brute.filter(_._3 == 1L).map(t => t._1 -> t._2).toMap
    val pTop1 = pruned.filter(_._3 == 1L).map(t => t._1 -> t._2).toMap
    assert(pTop1 === bTop1, "stage-1 ANN must surface the true winner")
    val bSets = brute.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val pSets = pruned.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val overlap = bSets.map { case (qg, ids) =>
      (ids & pSets(qg)).size.toDouble / ids.size }.sum / bSets.size
    assert(overlap >= 0.6, s"top-5 overlap $overlap < 0.6")
  }

  test("per-query-vector maxima are independent: adding an irrelevant vector never hurts") {
    val corpus = Seq(
      (0L, 0L, vec(0)), (0L, 1L, vec(1)),
      (1L, 2L, vec(0)), (1L, 3L, vec(1)), (1L, 4L, vec(5)) // + noise vector
    ).toDF("doc_group", "vec_id", "vec")
    val queries = Seq(
      (0L, 0L, vec(0)), (0L, 1L, vec(1))
    ).toDF("query_group", "q_vec_id", "qv")
    val scores = MaxSim.topK(corpus, queries, k = 2).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(scores(0L) === scores(1L), "max is per query vector — extra doc vectors don't dilute")
  }
}
