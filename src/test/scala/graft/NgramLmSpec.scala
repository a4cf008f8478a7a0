package graft

import java.nio.file.Files

import graft.queries.TextQueries

/** Laws for the bigram-LM quality score: positivity, bigram accounting,
  * and the discriminative property the filter exists for — docs built
  * from corpus-common bigrams score fewer bits than docs of rare ones. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def run(dir: String) =
    TextQueries.all("t_ngram_lm")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("ngramlm").toString
    Seq(
      (0L, "a b a b a b"), // (a,b) x3, (b,a) x2 — the common bigrams
      (1L, "a b a b"),
      (2L, "q r s t"),     // three singleton bigrams
      (3L, "z"))           // single token: no bigrams, drops out
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("scores are positive and bigram counts are n_tokens - 1") {
    val out = run(fixtureDir)
    assert(out.map(_._1) === Seq(0L, 1L, 2L)) // doc 3 dropped by contract
    assert(out.map(_._2) === Seq(5L, 3L, 3L))
    assert(out.forall(_._3 > 0.0), s"non-positive bits in $out")
  }

  test("common-bigram docs score fewer bits than rare-bigram docs") {
    val out = run(fixtureDir).map(r => r._1 -> r._3).toMap
    assert(out(0L) < out(2L),
      s"common bigrams ${out(0L)} should beat rare ${out(2L)}")
    assert(out(1L) < out(2L))
  }

  test("corpus run: every doc with >= 2 tokens appears, with n_bigrams = tokens - 1") {
    val out = run(sfDir)
    val toks = TextQueries.all("t_token_count")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { case (doc, nBg, bits) =>
      assert(nBg === toks(doc) - 1, s"doc $doc bigram accounting broke")
      assert(bits > 0.0)
    }
  }
}
