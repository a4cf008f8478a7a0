package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("v_knn_bruteforce")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    VectorQueries.all ++ AnalyticsQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ IndexQueries.all ++ PipelineQueries.all

  /** DuckDB oracle SQL per query key (omitted ⇒ rows-only check). */
  def oracleSql: Map[String, String] =
    VectorQueries.oracles ++ AnalyticsQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ IndexQueries.oracles ++ PipelineQueries.oracles
}
