package graft

import java.nio.file.Files

import graft.queries.TextQueries

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("t_repetition: repeated-phrase doc scores high, diverse doc scores low") {
    val dir = Files.createTempDirectory("graft_rep").toString
    Seq(
      // "buy now" repeated 6x: 12 tokens, 2 distinct
      (1L, "buy now buy now buy now buy now buy now buy now", "en", "web", 47L),
      // 10 distinct tokens, no repetition
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "web", 55L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = TextQueries.all("t_repetition")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    val (n1, dup1, topw1, topb1) = rows(1L)
    assert(n1 === 12L)
    assert(dup1 === math.rint((12.0 - 2) / 12 * 1e4) / 1e4) // 0.8333
    assert(topw1 === 0.5)                                   // "buy" 6/12
    assert(topb1 === math.rint(6.0 / 11 * 1e4) / 1e4)       // "buy now" 6/11

    val (n2, dup2, topw2, topb2) = rows(2L)
    assert(n2 === 10L)
    assert(dup2 === 0.0)
    assert(topw2 === 0.1)
    assert(topb2 === math.rint(1.0 / 9 * 1e4) / 1e4)
  }
}
