package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._

import graft.GraftVector._
import graft.queries.AnalyticsQueries

/** WholeStageCodegen span guards: the hot scan paths must stay INSIDE
  * codegen stages — a custom Expression that loses its doGenCode (or a
  * plan change that splits the stage) silently drops the scan pipeline
  * to interpreted/volcano eval, a multi-× regression the bench only
  * shows as a slow number with no cause attached. These pins name the
  * cause. (The reference's AVX2 kernels are its codegen analog:
  * /root/reference/src/distance.cpp.)
  */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  /** Codegen stages of the df's physical plan. Codegen collapse runs in
    * the executedPlan preparations, and under AQE the wrapper hides the
    * tree until execution — so the probe plans with AQE off (the stage
    * shapes asserted here are AQE-independent: they sit below any
    * exchange AQE could re-plan). */
  private def codegenStages(build: => org.apache.spark.sql.DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try build.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w.toString
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q6: scan -> filter -> project -> partial agg is ONE codegen stage") {
    val stages = codegenStages(
      AnalyticsQueries.all("q6_forecast_revenue")(spark, sfDir))
    assert(stages.exists(s =>
      s.contains("HashAggregate") && s.contains("Scan parquet") &&
        s.contains("Filter")),
      s"pushdown probe must fuse scan/filter/agg in one span:\n" +
        stages.mkString("\n---\n"))
  }

  test("distance kernels evaluate inside a codegen stage over the scan") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter($"vec_id" < 2)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val df = e.crossJoin(broadcast(q))
      .select(l2Sq($"embedding", $"qv").as("d2"),
        dot($"embedding", $"qv").as("dp"),
        cosine($"embedding", $"qv").as("cs"))
      .filter($"d2" >= 0)
    val stages = codegenStages(df)
    // all three kernels fused into a span that also holds the corpus scan
    assert(stages.exists(s => s.contains("v_l2sq") && s.contains("v_dot") &&
      s.contains("v_cosine") && s.contains("Scan parquet")),
      s"distance kernels fell out of whole-stage codegen:\n" +
        stages.mkString("\n---\n"))
  }

  test("the kNN candidate expansion (scan + broadcast join + distance) " +
      "is codegen'd up to the top-k aggregate boundary") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val df = e.crossJoin(broadcast(q))
      .select($"query_id", $"vec_id", l2Sq($"embedding", $"qv").as("d2"))
    val stages = codegenStages(df)
    // the fan-out rows must be produced by generated code — the top-k
    // ObjectHashAggregate above is the one legitimate codegen boundary
    assert(stages.exists(s => s.contains("BroadcastNestedLoopJoin") &&
      s.contains("v_l2sq")),
      s"candidate expansion must stay in codegen:\n" +
        stages.mkString("\n---\n"))
  }
}
