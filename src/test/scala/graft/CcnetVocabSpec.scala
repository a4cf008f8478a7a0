package graft

import java.nio.file.Files

import graft.queries.TextQueries

/** Laws for the CCNet perplexity terciles and the vocabulary growth
  * curve: exact tercile populations from the integer cut rule, score
  * ordering across buckets, planted common-vs-rare displacement, and
  * growth-curve accounting (Σ new_types == |vocab|, monotone cumsums).
  */
class CcnetVocabSpec extends SparkSpec {
  import spark.implicits._

  private def buckets(dir: String) =
    TextQueries.all("t_ccnet_bucket")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toSeq

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("ccnet").toString
    // One language, three docs of >= 2 tokens: the doc built from the
    // corpus-common bigram must rank head, the rare-bigram doc tail.
    Seq(
      (0L, "a b a b a b a b", "en"),
      (1L, "a b c d", "en"),
      (2L, "q r s t", "en"),
      (3L, "z", "en")) // single token: drops out by contract
      .toDF("doc_id", "text", "lang")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("tercile populations follow the integer cut rule exactly") {
    val out = buckets(sfDir)
    out.groupBy(_._2).foreach { case (lang, docs) =>
      val n = docs.size
      val byB = docs.groupBy(_._4).view.mapValues(_.size).toMap
      def cnt(lo: Int, hi: Int) = // #{r in 1..n : lo <= (r-1)*3 < hi}
        (1 to n).count(r => (r - 1) * 3 >= lo && (r - 1) * 3 < hi)
      assert(byB.getOrElse("head", 0) === cnt(Int.MinValue, n), s"$lang head")
      assert(byB.getOrElse("middle", 0) === cnt(n, 2 * n), s"$lang middle")
      assert(byB.getOrElse("tail", 0) === n - cnt(Int.MinValue, 2 * n),
        s"$lang tail")
    }
  }

  test("within a language, head scores <= middle scores <= tail scores") {
    val out = buckets(sfDir)
    out.groupBy(_._2).foreach { case (lang, docs) =>
      def rng(b: String) = docs.filter(_._4 == b).map(_._3)
      for {
        h <- Some(rng("head")).filter(_.nonEmpty)
        m <- Some(rng("middle")).filter(_.nonEmpty)
      } assert(h.max <= m.min + 1e-9, s"$lang head>middle")
      for {
        m <- Some(rng("middle")).filter(_.nonEmpty)
        t <- Some(rng("tail")).filter(_.nonEmpty)
      } assert(m.max <= t.min + 1e-9, s"$lang middle>tail")
    }
  }

  test("planted common-bigram doc lands head, rare-bigram doc tail") {
    val out = buckets(fixtureDir)
    assert(out.map(_._1) === Seq(0L, 1L, 2L)) // doc 3 dropped
    val byDoc = out.map(r => r._1 -> r._4).toMap
    assert(byDoc(0L) === "head", s"common-bigram doc: $out")
    assert(byDoc(2L) === "tail", s"rare-bigram doc: $out")
  }

  private def growth(dir: String) =
    TextQueries.all("t_vocab_growth")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq

  test("growth curve accounting: totals, monotone cumsums, Heaps shape") {
    val out = growth(sfDir)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    val toks = docs.select(org.apache.spark.sql.functions.explode(
      GraftText.whitespaceTokens($"text")).as("t"))
    val nTok = toks.count()
    val nVocab = toks.distinct().count()
    assert(out.map(_._2).sum === nDocs)
    assert(out.map(_._3).sum === nTok)
    assert(out.map(_._4).sum === nVocab, "sum(new_types) != |vocab|")
    assert(out.last._5 === nTok && out.last._6 === nVocab)
    assert(out.map(_._5) === out.map(_._5).sorted, "tokens_cum not monotone")
    assert(out.map(_._6) === out.map(_._6).sorted, "vocab_cum not monotone")
    // Heaps' law in data: the first span must introduce more new types
    // than the last (vocabulary growth decelerates)
    assert(out.head._4 > out.last._4, s"no deceleration: $out")
  }

  test("hand-computed spans on a 4-doc fixture") {
    val dir = Files.createTempDirectory("vocabg").toString
    Seq((0L, "a b"), (1L, "a c"), (2L, "b c"), (3L, "d d"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // buckets: doc_id*16 div 4 = 0, 4, 8, 12
    val out = growth(dir)
    assert(out.map(_._1) === Seq(0L, 4L, 8L, 12L))
    assert(out.map(_._4) === Seq(2L, 1L, 0L, 1L)) // new: {a,b} {c} {} {d}
    assert(out.map(_._6) === Seq(2L, 3L, 3L, 4L))
    assert(out.map(_._5) === Seq(2L, 4L, 6L, 8L))
  }
}
