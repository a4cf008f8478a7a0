package graft

import org.apache.spark.sql.Row

/** p_curation_pipeline — the composed curation funnel. The full
  * stage-for-stage derivation is oracle-gated (the composed DuckDB
  * SQL re-runs gate → exact → near → mixture); these specs pin the
  * funnel LAWS that must hold on any corpus, and stage consistency
  * against the standalone entries the stages are composed from. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows: Seq[Row] =
    SparkEntry.queries("p_curation_pipeline")(spark, sfDir).collect().toSeq

  test("funnel shape: five ordered stages, docs and tokens both monotone non-increasing") {
    assert(rows.map(_.getString(0)) === Seq("0_raw", "1_filter_gate",
      "2_exact_dedup", "3_near_dedup", "4_mixture_sample"))
    val docs = rows.map(_.getLong(1))
    val toks = rows.map(_.getLong(2))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a },
      s"docs not monotone: $docs")
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a },
      s"tokens not monotone: $toks")
    assert(docs.head > 0 && docs.last > 0)
  }

  test("stage 0 equals the corpus; stage 1 equals t_filter_gate's keep count") {
    val n = Tables.load(spark, sfDir, "documents").count()
    assert(rows.head.getLong(1) === n)
    val gateKeep = SparkEntry.queries("t_filter_gate")(spark, sfDir)
      .filter($"keep").count()
    assert(rows(1).getLong(1) === gateKeep)
  }

  test("near-dedup stage: survivors are exactly the non-dup keepers of the stage-2 set") {
    // WIRING check, not an independent derivation (that is the composed
    // DuckDB oracle's job): rebuild the survivor frame from the shared
    // stage definitions and assert stage 3 counts exactly its non-dup
    // keepers — catches a stage mis-chained or a filter dropped in the
    // entry, while the keeper logic itself is pinned by the oracle
    val gate = graft.queries.TextQueries.filterGateRaw(
      Tables.load(spark, sfDir, "documents"))
    val s1 = Tables.load(spark, sfDir, "documents")
      .join(gate.filter($"keep").select($"doc_id"), "doc_id")
      .select($"doc_id",
        GraftText.rollingHash64($"text").as("fp"),
        org.apache.spark.sql.functions.sort_array(
          org.apache.spark.sql.functions.array_distinct(
            GraftText.whitespaceTokens($"text"))).as("ws"))
    val s2 = s1.join(
      s1.groupBy($"fp").agg(
        org.apache.spark.sql.functions.min($"doc_id").as("doc_id"))
        .select($"doc_id"), "doc_id")
    val nonDup = graft.queries.DedupQueries.minhashKeeperAssign(
        s2.select($"doc_id", $"ws"), GraftText.jaccardSorted(_, _), 0.7)
      .filter($"keeper_id" === $"doc_id").count()
    assert(rows(3).getLong(1) === nonDup)
  }
}
