package graft

/** Driver-contract smoke: entry() must work on a vanilla session (no
  * extensions, no special confs) and return rows at sf0.001. */
class EntrySpec extends SparkSpec {
  test("entry returns rows on a plain session") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every declared oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query is oracle-gated (full-oracle invariant since round 3)") {
    val unGated = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unGated.isEmpty, s"queries without oracles: $unGated")
  }

  test("all queries run at sf0.001 and return rows") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows at sf0.001: $empty")
  }
}
