package graft

import java.nio.file.Files

import graft.queries.AnalyticsQueries

/** Error contract of the histogram-quantile sketch: estimates land
  * within one bin width of the true quantile, and the histogram's
  * integer counts make the sketch partition-order independent (the
  * property that lets it merge across days without re-sorting). */
class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("q_hist_quantiles: estimate within one bin width of the exact quantile") {
    val dir = Files.createTempDirectory("graft_hq").toString
    // uniform 0..10239 → bin width (10239-0)/256 ≈ 40
    val n = 10240
    // ts as epoch-nanos long: the shape Tables.loadEvents expects
    (0 until n).map { i =>
      (i.toLong, 1L, 1700000000000000000L + i * 1000000000L, "t", i.toDouble)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val row = AnalyticsQueries.all("q_hist_quantiles")(spark, dir).collect()(0)
    val width = (n - 1).toDouble / 256
    val exact = Map(0.5 -> 0.5 * (n - 1), 0.9 -> 0.9 * (n - 1), 0.99 -> 0.99 * (n - 1))
    assert(row.getLong(1) === n.toLong)
    assert(math.abs(row.getDouble(2) - exact(0.5)) <= width)
    assert(math.abs(row.getDouble(3) - exact(0.9)) <= width)
    assert(math.abs(row.getDouble(4) - exact(0.99)) <= width)
  }

  test("q_resample_ffill: empty hours appear with the last value carried forward") {
    val dir = Files.createTempDirectory("graft_ffill").toString
    val h = 3600L * 1000000000L // one hour of nanos
    val t0 = 1700000000000000000L
    Seq(
      (1L, 7L, t0, "a", 1.0, "{}"),
      (2L, 7L, t0 + 3 * h, "a", 2.0, "{}"),         // 2-hour gap before this
      (3L, 7L, t0 + 3 * h + 1000000000L, "a", 5.0, "{}")) // same hour, later ts wins
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = AnalyticsQueries.all("q_resample_ffill")(spark, dir)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === Seq(1L, 0L, 0L, 2L)) // spine covers the gap
    assert(rows.map(_._2).toSeq === Seq(1.0, 1.0, 1.0, 5.0)) // fill + latest-in-hour
  }

  test("q_funnel: stages require strict event-time order, not mere presence") {
    val dir = Files.createTempDirectory("graft_funnel").toString
    val t0 = 1700000000000000000L
    def ev(id: Long, uid: Long, minute: Int, typ: String) =
      (id, uid, t0 + minute * 60000000000L, typ, 1.0, "{}")
    Seq(
      ev(1, 1, 0, "view"),                                        // stage 1
      ev(2, 2, 0, "view"), ev(3, 2, 5, "click"),                  // stage 2
      ev(4, 3, 0, "click"), ev(5, 3, 5, "view"),                  // click BEFORE view → stage 1
      ev(6, 4, 0, "view"), ev(7, 4, 5, "click"), ev(8, 4, 9, "purchase"), // stage 3
      ev(9, 5, 0, "purchase"), ev(10, 5, 5, "view"), ev(11, 5, 9, "click")) // purchase too early → 2
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val stages = AnalyticsQueries.all("q_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stages === Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 3L, 5L -> 2L))
  }

  test("q_json_extract: malformed payloads become NULLs, never errors") {
    val dir = Files.createTempDirectory("graft_json").toString
    Seq(
      (1L, 1L, 1700000000000000000L, "a", 1.0, """{"k": 7}"""),
      (2L, 1L, 1700000001000000000L, "a", 1.0, """not json at all"""),
      (3L, 1L, 1700000002000000000L, "a", 1.0, """{"other": 1}"""),
      (4L, 1L, 1700000003000000000L, "a", 1.0, """{"k": 35}"""),
      // typed strictness: a string-encoded number and a double are NOT
      // longs — from_json(LongType) nulls both (and the oracle's
      // json_type gate must agree)
      (5L, 1L, 1700000004000000000L, "a", 1.0, """{"k": "7"}"""),
      (6L, 1L, 1700000005000000000L, "a", 1.0, """{"k": 7.5}"""))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = AnalyticsQueries.all("q_json_extract")(spark, dir).collect()(0)
    assert(r.getLong(1) === 6L) // n_events counts every row
    assert(r.getLong(2) === 2L) // only the two INTEGER k payloads parse
    assert(r.getLong(3) === 42L)
    assert(r.getLong(4) === 7L && r.getLong(5) === 35L)
  }

  test("q_hist_quantiles: result is partition-layout independent") {
    val dir = Files.createTempDirectory("graft_hq2").toString
    val rows = (0 until 5000).map { i =>
      (i.toLong, (i % 97).toLong, 1700000000000000000L + i * 1000000000L,
        if (i % 2 == 0) "a" else "b", (i * 37 % 1009).toDouble)
    }
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val one = AnalyticsQueries.all("q_hist_quantiles")(spark, dir)
      .collect().map(_.toSeq).toSet

    val dir2 = Files.createTempDirectory("graft_hq3").toString
    // same rows, adversarial order and different file layout
    rows.reverse.toDF("event_id", "user_id", "ts", "event_type", "value")
      .repartition(7)
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val two = AnalyticsQueries.all("q_hist_quantiles")(spark, dir2)
      .collect().map(_.toSeq).toSet
    assert(one === two)
  }
}
