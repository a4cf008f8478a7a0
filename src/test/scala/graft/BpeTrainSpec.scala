package graft

import graft.operators.BpeTrain

/** Laws for BPE merge training: hand-computed merges on a tiny corpus,
  * the greedy left-to-right merge semantics the wrapped-string replace
  * must honor, merged symbols participating in later rounds, and
  * round-trip integrity of tokenization under the learned merges. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("learns the hand-computed merge sequence on a tiny corpus") {
    // vocab: "abab" x3, "abc" x2  →  pairs: (a,b) 3*2+2 = 8, (b,a) 3,
    // (b,c) 2  →  round 1 merges (a,b).
    // then "␟ab␟␟ab␟" x3, "␟ab␟␟c␟" x2  →  pairs: (ab,ab) 3, (ab,c) 2
    // →  round 2 merges (ab,ab) — a merged symbol pairing with itself.
    val m = BpeTrain.learn(
      corpus("abab abab abab abc abc"), rounds = 2).collect()
    assert(m.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq === Seq(
      (1L, "a", "b", "ab", 8L),
      (2L, "ab", "ab", "abab", 3L)))
  }

  test("encodeStats agrees with driver-side applyMerges doc for doc") {
    val docs = corpus("abab abab cc dd", "abc abab xyz", "zz9 A", "ee abab")
    val merges = BpeTrain.learn(docs, rounds = 3).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val expected = docs.collect().map { r =>
      val toks = r.getString(1).split("\\s+").toSeq
        .filter(w => w.matches("^[a-z]+$") && w.length >= 2)
      (r.getLong(0), toks.size.toLong,
        toks.map(_.length.toLong).sum,
        toks.map(w => BpeTrain.applyMerges(w, merges).size.toLong).sum)
    }.filter(_._2 > 0).toSet
    val got = BpeTrain.encodeStats(docs, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === expected)
  }

  test("encode survives training exhaustion: fewer merges than rounds") {
    // vocab {ab}: round 1 merges (a,b), round 2 finds no pairs -> learn
    // stops with 1 merge; encode must apply just that one (the oracle's
    // coalesce-to-sentinel guard covers the same case in SQL)
    val docs = corpus("ab ab", "ab")
    assert(BpeTrain.learn(docs, rounds = 6).count() === 1)
    val out = BpeTrain.encodeStats(docs, rounds = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out === Seq((0L, 2L, 4L, 2L), (1L, 1L, 2L, 1L)))
  }

  test("encode compression laws: words <= symbols <= chars, doc 2 drops") {
    val docs = corpus("abab abab abab", "xy wz", "A9 77") // doc 2: nothing
    val out = BpeTrain.encodeStats(docs, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet === Set(0L, 1L))
    out.foreach { case (id, words, chars, syms) =>
      assert(words <= syms && syms <= chars, s"doc $id: $words/$syms/$chars")
    }
    // the merge-heavy doc compresses strictly; the untouched one doesn't
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(0L)._4 < byId(0L)._3, "abab doc must compress")
    assert(byId(1L)._4 === byId(1L)._3, "xy/wz doc must stay at chars")
  }

  test("merge application is greedy left-to-right, non-overlapping") {
    // "aaa" under (a,a): LTR gives [aa, a] — never [a, aa], never [aa, aa]
    assert(BpeTrain.applyMerges("aaa", Seq(("a", "a"))) === Seq("aa", "a"))
    assert(BpeTrain.applyMerges("aaaa", Seq(("a", "a"))) === Seq("aa", "aa"))
    // and the engine-side replace agrees: train on a corpus where the
    // winning pair self-overlaps
    val m = BpeTrain.learn(corpus("aaa aaa"), rounds = 2).collect()
    // round 1: (a,a) count 4 (two words x two adjacent pairs); after the
    // greedy merge each word is [aa, a] so round 2 sees (aa, a) count 2
    assert(m.map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      === Seq(("a", "a", 4L), ("aa", "a", 2L)))
  }

  test("tie-break is total: (count desc, lhs, rhs) picks the lexicographic winner") {
    // "ab" and "cd" both appear twice: (a,b) and (c,d) tie at 2 — (a,b) wins
    val m = BpeTrain.learn(corpus("ab ab cd cd"), rounds = 1).collect()
    assert((m(0).getString(1), m(0).getString(2)) === ("a", "b"))
  }

  test("non-alphabetic and single-char tokens stay out of the vocabulary") {
    val m = BpeTrain.learn(corpus("a a a a x9 x9 x9 zz"), rounds = 1).collect()
    // "a" (1 char) and "x9" (non-alphabetic) contribute nothing; only
    // "zz" has a pair
    assert(m.map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      === Seq(("z", "z", 1L)))
  }

  test("stops early when every word is fully merged") {
    val m = BpeTrain.learn(corpus("ab ab"), rounds = 5).collect()
    assert(m.length === 1) // after merging (a,b), no pairs remain
  }

  test("learned merges tokenize the corpus: round-trip and compression") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val out = BpeTrain.learn(docs, rounds = 6).collect()
    // pair counts are non-increasing in rank: a merge-created pair's
    // count is bounded by the count of the pair that created it, and
    // pre-existing pairs only lose occurrences
    val counts = out.map(_.getLong(4)).toSeq
    assert(counts === counts.sorted.reverse, s"counts not monotone: $counts")
    val merges = out.map(r => (r.getString(1), r.getString(2))).toSeq
    // round-trip on the 20 most frequent vocabulary words; the top
    // merges come from exactly these, so at least one must compress
    val top = docs
      .select(explode(GraftText.whitespaceTokens(coalesce($"text", lit("")))).as("w"))
      .filter($"w".rlike("^[a-z]+$") && length($"w") >= 2)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .orderBy(desc("freq"), $"w").limit(20)
      .collect().map(_.getString(0)).toSeq
    val toks = top.map(w => w -> BpeTrain.applyMerges(w, merges))
    toks.foreach { case (w, ts) =>
      assert(ts.mkString === w, s"round-trip broke for '$w': $ts") }
    assert(toks.exists { case (w, ts) => ts.length < w.length },
      s"no frequent word compressed under $merges")
  }
}
