package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream interval join — the streaming face of q_range_join's
  * purchase attribution: each event matches the same user's purchases
  * whose timestamp falls in the trailing one-hour window.
  *
  * Both sides carry watermarks, which is what makes this run UNBOUNDED:
  * Spark buffers each side's rows only until the other side's watermark
  * passes the join interval, so state is bounded by (event rate ×
  * (watermark + interval)), never by stream length — the same
  * keep-only-what-can-still-match discipline as the reference's
  * write-buffer flush cycle (engine.h: buffers drain once merged, they
  * don't accumulate). Append-mode output: a match is emitted exactly
  * once, when both rows have arrived.
  *
  * Batch equivalence (the correctness contract) is spec-gated in
  * StreamJoinSpec: the streamed match set over adversarially split
  * micro-batches equals the batch join of the union — the batch form
  * (and its DuckDB oracle) is q_range_join.
  */
object StreamJoin {

  /** events(user_id, ts, event_id) ⋈ purchases(p_uid, p_ts, p_id):
    * same user, p_ts ∈ (ts - 1 hour, ts] — i.e. exactly q_range_join's
    * half-open anchor window ts ∈ [p_ts, p_ts + 1h) seen from the
    * event side, so the two operators agree pair-for-pair INCLUDING
    * the one-hour boundary (an event exactly 1 h after a purchase
    * matches in neither). */
  def attribution(events: DataFrame, purchases: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .join(purchases.withWatermark("p_ts", "2 hours"),
        expr("""user_id = p_uid AND
                p_ts > ts - INTERVAL 1 HOUR AND p_ts <= ts"""))
      .select("event_id", "user_id", "p_id", "ts", "p_ts")
}
