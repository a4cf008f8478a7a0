package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming windowed aggregation with watermark — the streaming form of
  * q_event_window_agg — checked against the batch result on the same
  * rows. */
case class Ev(ts: Timestamp, event_type: String, value: Double)

class StreamWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("streaming tumbling-window agg with watermark matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Ev(ts(1), "click", 1.0), Ev(ts(5), "click", 2.0),
      Ev(ts(62), "click", 4.0), Ev(ts(7), "view", 8.0),
      Ev(ts(65), "view", 16.0), Ev(ts(130), "click", 32.0))

    val stream = MemoryStream[Ev]
    val agg = stream.toDS()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Complete()).start()
    stream.addData(rows.take(3): _*)
    q.processAllAvailable()
    stream.addData(rows.drop(3): _*)
    q.processAllAvailable()

    val streamed = spark.table("win_agg")
      .select($"window.start", $"event_type", $"n", $"sv")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    q.stop()

    val batch = rows.toDS()
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sv"))
      .select($"window.start", $"event_type", $"n", $"sv")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed === batch)
  }

  test("streaming session windows (30-min gap) match q_sessionize semantics") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Ev(ts(0), "u1", 1.0), Ev(ts(10), "u1", 1.0),   // session 1 (2 events)
      Ev(ts(60), "u1", 1.0),                          // session 2
      Ev(ts(0), "u2", 1.0))                           // u2 session 1
    val stream = MemoryStream[Ev]
    val agg = stream.toDS()
      .withWatermark("ts", "2 hours")
      .groupBy(session_window($"ts", "30 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sess_agg")
      .outputMode(OutputMode.Complete()).start()
    stream.addData(rows: _*)
    q.processAllAvailable()
    val got = spark.table("sess_agg")
      .select($"event_type", $"n").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    q.stop()
    assert(got === Seq(("u1", 1L), ("u1", 2L), ("u2", 1L)))
  }
}
