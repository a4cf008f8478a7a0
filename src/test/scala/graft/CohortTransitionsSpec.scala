package graft

import java.nio.file.Files

import graft.queries.{AnalyticsQueries, DedupQueries}

/** Hand-computed fixtures for the behavioral-analytics additions
  * (cohort retention, Markov transitions, exact-integer outliers) and
  * the cross-source shingle-overlap audit. */
class CohortTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private val weekNs = 7L * 86400L * 1000000000L
  // t0 chosen ON a week boundary in epoch-week arithmetic so "+k weeks"
  // in the fixture lands exactly k week-indexes later
  private val t0 = 1700000000000000000L / weekNs * weekNs

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    val dir = Files.createTempDirectory("graft_ct").toString
    rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q_retention_cohort: activity counts against the FIRST-touch cohort") {
    def ev(id: Long, uid: Long, week: Int) =
      (id, uid, t0 + week * weekNs, "view", 1.0, "{}")
    // u1 first in week 0, active 0/1/3; u2 only week 0; u3 first in week 1,
    // active 1/2 — u3's week-1 activity must NOT appear under cohort 0,
    // and u1's week-1 activity must NOT appear under cohort 1
    val dir = eventsDir(Seq(
      ev(1, 1, 0), ev(2, 1, 1), ev(3, 1, 3),
      ev(4, 2, 0),
      ev(5, 3, 1), ev(6, 3, 2)))
    val rows = AnalyticsQueries.all("q_retention_cohort")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // t0 is a multiple of weekNs, so the ns-week index equals the
    // operator's us-week index ((t0/1000) div (weekNs/1000)) exactly
    val w0 = t0 / weekNs
    assert(rows.toSeq === Seq(
      (w0, 0L, 2L, 2L), (w0, 1L, 1L, 2L), (w0, 3L, 1L, 2L),
      (w0 + 1, 0L, 1L, 1L), (w0 + 1, 1L, 1L, 1L)))
  }

  test("q_event_transitions: per-user sequence order, event_id tiebreak, exact p_next") {
    val m = 60000000000L // one minute of nanos
    val dir = eventsDir(Seq(
      // u1: A(t0) B(t0+1m) A(t0+2m) C(t0+3m) → A→B, B→A, A→C
      (1L, 1L, t0, "A", 1.0, "{}"),
      (2L, 1L, t0 + m, "B", 1.0, "{}"),
      (3L, 1L, t0 + 2 * m, "A", 1.0, "{}"),
      (4L, 1L, t0 + 3 * m, "C", 1.0, "{}"),
      // u2: two events at the SAME ts — event_id must break the tie,
      // so the sequence is B(id=5) then A(id=6) → B→A
      (5L, 2L, t0, "B", 1.0, "{}"),
      (6L, 2L, t0, "A", 1.0, "{}")))
    val rows = AnalyticsQueries.all("q_event_transitions")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      ("A", "B", 1L, 0.5), ("A", "C", 1L, 0.5), ("B", "A", 2L, 1.0)))
  }

  test("q_zscore_outliers: the 3-sigma gate fires on exact integers, not float luck") {
    // 10 events at 10.00 + one at 100.00: the spike's z is 3.017 — just
    // over the gate; the rest sit at z ≈ 0.30. Cleared-denominator check
    // (BigInt, the same inequality the operator evaluates in Decimal):
    val cents = Seq.fill(10)(1000L) :+ 10000L
    val n = BigInt(cents.size)
    val sx = BigInt(cents.sum)
    val sxx = cents.map(c => BigInt(c) * c).sum
    def flagged(x: Long) = {
      val dev = n * x - sx
      dev * dev * (n - 1) > 9 * (n * sxx - sx * sx) * n
    }
    assert(flagged(10000L) && !flagged(1000L)) // fixture sanity
    val dir = eventsDir(cents.zipWithIndex.map { case (c, i) =>
      (i.toLong, 1L, t0 + i * 1000000000L, "A", c / 100.0, "{}")
    })
    val out = AnalyticsQueries.all("q_zscore_outliers")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq === Seq((10L, 10000L)))
  }

  test("d_source_overlap: shared 5-gram mass between source pairs; disjoint pairs absent") {
    val dir = Files.createTempDirectory("graft_so").toString
    Seq(
      (1L, "a b c d e f", "en", "s1"), // shingles: "a b c d e", "b c d e f"
      (2L, "a b c d e x", "en", "s2"), // shingles: "a b c d e", "b c d e x"
      (3L, "p q r s t", "en", "s3"),   // one shingle, disjoint from both
      (4L, "too short", "en", "s3"))   // <5 tokens: contributes nothing
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = DedupQueries.all("d_source_overlap")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // only (s1, s2) share anything: 1 of 2∪2 ⇒ jaccard 1/3, containment 1/2
    assert(rows.toSeq === Seq(("s1", "s2", 1L, 2L, 2L, 0.3333, 0.5)))
  }
}
