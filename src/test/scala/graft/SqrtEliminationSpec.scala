package graft

import org.apache.spark.sql.functions._

import graft.GraftVector._
import graft.plans.SqrtEliminationRule

class SqrtEliminationSpec extends SparkSpec {
  import spark.implicits._

  test("l2 < r radius predicate is rewritten to squared form, same rows") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = e.filter($"vec_id" === 3).select($"embedding".as("qv"))
    def range = e.crossJoin(broadcast(q))
      .filter(l2($"embedding", $"qv") < 1.2)
      .select($"vec_id")

    val before = range.collect().map(_.getLong(0)).toSet

    spark.experimental.extraOptimizations ++= Seq(SqrtEliminationRule)
    try {
      val optimized = range
      val planStr = optimized.queryExecution.optimizedPlan.toString
      assert(planStr.contains("v_l2sq"), s"rewrite did not fire:\n$planStr")
      assert(!planStr.contains("v_l2("), s"rooted distance survived:\n$planStr")
      assert(optimized.collect().map(_.getLong(0)).toSet === before)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SqrtEliminationRule)
    }
  }

  test("rewrite leaves projected (non-predicate) l2 untouched") {
    spark.experimental.extraOptimizations ++= Seq(SqrtEliminationRule)
    try {
      // parquet-backed input: ConvertToLocalRelation would eagerly fold
      // a projection over literal local data
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(5)
      val df = e.crossJoin(broadcast(e.filter($"vec_id" === 0)
          .select($"embedding".as("qv"))))
        .select(l2($"embedding", $"qv").as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("v_l2("))
      assert(df.collect().length === 5)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == SqrtEliminationRule)
    }
  }
}
