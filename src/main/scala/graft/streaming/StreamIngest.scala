package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming ingest: the Spark-native analog of the
  * reference's LSM write path (/root/reference/include/engine.h:insert,
  * write_buffer.h). The reference absorbs writes in an active buffer,
  * rotates it into an immutable queue, and background threads merge into
  * the index; here each micro-batch is the "immutable buffer", and the
  * stateful operator / foreachBatch merge is the background flush.
  * Backpressure (soft/hard limits) is the engine's trigger interval +
  * maxFilesPerTrigger instead of hand-rolled throttling.
  */
object StreamIngest {

  case class Upsert(key: Long, seq: Long, value: Double)
  case class KeyState(key: Long, seq: Long, value: Double)

  /** Latest-write-wins per key via mapGroupsWithState — the streaming
    * equivalent of "newest buffer entry shadows the graph". */
  def latestPerKey(updates: Dataset[Upsert]): Dataset[KeyState] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.key)
      .mapGroupsWithState[KeyState, KeyState](GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[KeyState]) =>
          val incoming = rows.maxBy(u => (u.seq, u.value))
          val best = state.getOption match {
            case Some(cur) if cur.seq >= incoming.seq => cur
            case _ => KeyState(key, incoming.seq, incoming.value)
          }
          state.update(best)
          best
      }
  }

  /** Batch-side merge used with foreachBatch: base ∪ delta, newest seq
    * wins — identical semantics to the batch `s_stream_ingest` query, so
    * streaming and batch paths are provably consistent. */
  def mergeBatch(base: DataFrame, delta: DataFrame, keyCol: String,
      seqCol: String): DataFrame = {
    val all = base.unionByName(delta)
    all.groupBy(col(keyCol))
      .agg(max_by(struct(all.columns.map(col): _*), col(seqCol)).as("r"))
      .select(col("r.*"))
  }
}
