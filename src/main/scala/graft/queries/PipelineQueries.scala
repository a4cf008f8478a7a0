package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftVector._
import graft.Tables.load
import graft.operators.Multimodal

/** Pipeline-surface queries: multimodal feature plumbing and the batch
  * equivalent of the streaming ingest state (latest event per key). The
  * streaming path itself (mapGroupsWithState / foreachBatch) is exercised
  * in StreamIngestSpec against this same batch semantics.
  */
object PipelineQueries {

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary media columns → typed metadata + stub featurizer → vector
    // ops on the extracted features (rows-only: hash of stub features).
    "m_multimodal_meta" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val media = Multimodal.asMedia(load(s, d, "documents"))
      Multimodal.featurize(media).toDF()
        .select($"doc_id", $"mime", $"n_bytes",
          round(norm($"features"), 4).as("feat_norm"))
        .orderBy("doc_id")
    }),

    // Latest event per user — the materialized state the streaming
    // ingest maintains incrementally.
    "s_stream_ingest" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
      load(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id".as("last_event_id"),
          round($"value", 2).as("last_value"))
        .orderBy("user_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "s_stream_ingest" ->
      """SELECT user_id, event_id AS last_event_id,
        |  round(value, 2) AS last_value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin
  )
}
