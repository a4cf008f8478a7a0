package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoin

/** Stream-stream interval join ≡ the batch join of the union — matches
  * must appear exactly once regardless of which micro-batch each side
  * of a pair arrives in. */
case class JEv(event_id: Long, user_id: Long, ts: Timestamp)
case class JPu(p_id: Long, p_uid: Long, p_ts: Timestamp)

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("interval join over adversarially split micro-batches equals the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      JEv(1L, 10L, ts(60)),  // matches purchases at 5..60 for user 10
      JEv(2L, 10L, ts(200)), // matches nothing (gap > 1h)
      JEv(3L, 20L, ts(90)),  // matches the late-arriving purchase at 40
      JEv(4L, 30L, ts(30)))  // user with no purchases
    val purchases = Seq(
      JPu(100L, 10L, ts(5)),
      JPu(104L, 10L, ts(0)),  // EXACTLY 1h before event 1: boundary, no match
      JPu(101L, 10L, ts(59)),
      JPu(102L, 20L, ts(40)),
      JPu(103L, 99L, ts(60))) // user with no events

    val evStream = MemoryStream[JEv]
    val puStream = MemoryStream[JPu]
    val joined = StreamJoin.attribution(evStream.toDF(), puStream.toDF())
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append()).start()
    // adversarial split: each pair's two sides arrive in DIFFERENT
    // micro-batches, in both orders (event-first and purchase-first)
    evStream.addData(events.take(2))
    q.processAllAvailable()
    puStream.addData(purchases.take(2))
    q.processAllAvailable()
    puStream.addData(purchases.slice(2, 4))
    q.processAllAvailable()
    puStream.addData(purchases.drop(4))
    q.processAllAvailable()
    evStream.addData(events.drop(2))
    q.processAllAvailable()

    val streamed = spark.table("sj_out")
      .select($"event_id", $"p_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    q.stop()

    val batch = StreamJoin.attribution(events.toDF(), purchases.toDF())
      .select($"event_id", $"p_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // exactly-once: sets equal AND no duplicate emissions
    assert(streamed.sorted === batch.sorted)
    assert(streamed.distinct.length === streamed.length)
    assert(batch.toSet === Set((1L, 100L), (1L, 101L), (3L, 102L)))
  }
}
