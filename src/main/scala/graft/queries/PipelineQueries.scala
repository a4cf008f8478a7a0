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
    // Replicates the stub featurizer exactly: 16-bin byte histogram of
    // the UTF-8 payload (ASCII corpus → ord(char) == byte), normalized
    // in FLOAT (matching the operator's float division), L2-normed in
    // DOUBLE. Proves the multimodal plumbing end-to-end against SQL.
    "m_multimodal_meta" ->
      """SELECT doc_id, mime, n_bytes, round(sqrt(list_sum(
        |    [ (len(list_filter([ord(text[i]) for i in range(1, length(text)+1)],
        |         b -> b // 16 = bin))::FLOAT / greatest(length(text), 1)::FLOAT)::DOUBLE
        |      * (len(list_filter([ord(text[i]) for i in range(1, length(text)+1)],
        |         b -> b // 16 = bin))::FLOAT / greatest(length(text), 1)::FLOAT)::DOUBLE
        |      for bin in range(0, 16) ])), 4) AS feat_norm
        |FROM (SELECT doc_id, 'application/x-fake' AS mime,
        |        length(text)::BIGINT AS n_bytes, text FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "s_stream_ingest" ->
      """SELECT user_id, event_id AS last_event_id,
        |  round(value, 2) AS last_value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin
  )
}
