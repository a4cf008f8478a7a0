package graft

import graft.queries.AnalyticsQueries

/** SCD Type-2 interval laws: versions are gapless, intervals chain
  * exactly (next valid_from == previous valid_to), and each key has
  * exactly one open current version carrying the sentinel. */
class Scd2Spec extends SparkSpec {

  private lazy val rows =
    AnalyticsQueries.all("q_scd2")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getBoolean(4)))

  test("versions are 1..n per key with chained intervals") {
    rows.groupBy(_._1).foreach { case (key, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to vs.length).toSeq,
        s"key $key has version gaps")
      sorted.sliding(2).foreach {
        case Array((_, _, _, vTo, _), (_, _, vFrom, _, _)) =>
          assert(vTo === vFrom,
            s"key $key: interval break between $vTo and $vFrom")
        case _ =>
      }
    }
  }

  test("exactly one current version per key, and it carries the sentinel") {
    rows.groupBy(_._1).foreach { case (key, vs) =>
      val current = vs.filter(_._5)
      assert(current.length === 1, s"key $key has ${current.length} current rows")
      assert(current.head._4 === "9999-12-31 00:00:00")
      assert(current.head._2 === vs.map(_._2).max,
        s"key $key: current is not the latest version")
      assert(vs.filterNot(_._5).forall(_._4 != "9999-12-31 00:00:00"),
        s"key $key: a closed version carries the sentinel")
    }
  }

}
