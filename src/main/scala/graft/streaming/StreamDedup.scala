package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup — the continuous-ingest face of
  * `d_dedup_exact`: documents arrive in micro-batches and only the
  * FIRST document per content fingerprint ever crosses the operator;
  * every later arrival (same batch or any later one) is dropped. This
  * is the dedup shape of a live crawl pipeline, where "the corpus" is
  * an unbounded stream and keep-one must be decided online.
  *
  * Within a micro-batch, ties resolve to the smallest doc_id (the
  * deterministic keep-min rule of the batch operator); across batches,
  * arrival order decides — so a stream fed in doc_id order reaches
  * exactly the batch result (proven in StreamDedupSpec).
  *
  * State is one boolean per distinct fingerprint and NEVER expires
  * (GroupStateTimeout.NoTimeout): exact dedup against all of history
  * needs all of history, which at 100 TB means a state store sized to
  * the distinct-fingerprint count (8-byte keys — the RocksDB state
  * backend holds billions). Bounding state with a watermark/TTL turns
  * the operator into windowed dedup (duplicates only caught within the
  * TTL) — a semantics change callers must opt into, not a default.
  */
object StreamDedup {

  case class Doc(doc_id: Long, fp: Long)

  /** Append-mode stateful filter: emits a Doc iff its fingerprint was
    * never seen before. Shuffles only (fp → doc) pairs; state lookups
    * are local to each fingerprint's partition. */
  def firstPerFingerprint(docs: Dataset[Doc]): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator(rows.minBy(_.doc_id))
          }
      }
  }
}
