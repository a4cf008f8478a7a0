package graft

import java.nio.file.Files

import graft.queries.{TextQueries, VectorQueries}

/** BM25 ranking laws on planted corpora, and reciprocal-rank-fusion
  * semantics on a fixture where lexical and vector evidence point at the
  * same document. */
class Bm25FusionSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("bm25: tf monotonicity, length normalization, IDF contrast, zero gate") {
    val dir = Files.createTempDirectory("graft_bm25").toString
    val filler = ('a' to 'j').map(_.toString)
    writeDocs(dir, Seq(
      1L -> ("dup " + filler.take(9).mkString(" ")),          // tf=1, dl=10
      2L -> ("dup dup " + filler.take(8).mkString(" ")),      // tf=2, dl=10
      3L -> filler.mkString(" "),                             // no query terms
      4L -> ("dup " + (filler ++ filler.take(9)).mkString(" ")), // tf=1, dl=20
      5L -> ("vector " + filler.take(9).mkString(" ")),       // tf=1, dl=10
      // padding docs that raise df(vector) above df(dup): the rarer term
      // must contribute the larger IDF
      6L -> ("vector " + filler.take(5).mkString(" ")),
      7L -> ("vector " + filler.take(5).mkString(" ")),
      8L -> ("vector " + filler.take(5).mkString(" "))))
    val scores = TextQueries.bm25Scored(
      spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    assert(scores(3L) === 0.0) // no term: exactly zero, filtered by the gate
    assert(scores(2L) > scores(1L), "higher tf must score higher")
    assert(scores(1L) > scores(4L), "same tf in a longer doc must score lower")
    // doc 1 ("dup", df=2) vs doc 5 ("vector", df=4): same tf, same dl —
    // only IDF differs, and the rarer term must win
    assert(scores(1L) > scores(5L), "rarer term must out-score common term")
    assert(scores.values.forall(s => !s.isNaN && !s.isInfinite))
  }

  test("log2DetLong (driver form) is bit-identical to log2Det (Column form)") {
    import org.apache.spark.sql.functions.col
    import graft.functions.DetMath
    val vals = (1L to 4096L) ++ Seq(65537L, 999983L, 1L << 40, (1L << 53) - 1)
    val viaColumn = vals.toDF("c")
      .select(col("c"), DetMath.log2Det(col("c")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    vals.foreach { c =>
      // exact double equality — the whole point of the Det family
      assert(DetMath.log2DetLong(c) === viaColumn(c), s"c=$c")
    }
  }

  test("t_chunk_windows: chunks tile each doc with declared overlap, clipped at the end") {
    val dir = Files.createTempDirectory("graft_chunk").toString
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    writeDocs(dir, Seq(
      1L -> words(10),   // shorter than ctx → exactly one clipped chunk
      2L -> words(32),   // exactly ctx → one full chunk
      3L -> words(33),   // one token over → a second, overlapping chunk
      4L -> words(80)))  // three chunks: 0-32, 24-56, 48-80
    val rows = TextQueries.all("t_chunk_windows")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)

    assert(rows(1L).map(t => (t._3, t._4)).toSeq === Seq((0L, 10L)))
    assert(rows(2L).map(t => (t._3, t._4)).toSeq === Seq((0L, 32L)))
    assert(rows(3L).sortBy(_._2).map(t => (t._3, t._4)).toSeq ===
      Seq((0L, 32L), (24L, 33L)))
    assert(rows(4L).sortBy(_._2).map(t => (t._3, t._4)).toSeq ===
      Seq((0L, 32L), (24L, 56L), (48L, 80L)))
    // coverage + overlap laws on every doc: first chunk starts at 0,
    // consecutive chunks overlap (stride < ctx), the last ends at n_toks
    rows.values.foreach { cs =>
      val s = cs.sortBy(_._2)
      assert(s.head._3 === 0L)
      s.zip(s.tail).foreach { case (a, b) =>
        assert(b._3 === a._3 + 24L)
        assert(b._3 < a._4, "consecutive chunks must overlap")
      }
      assert(s.forall(c => c._5 === c._4 - c._3))
    }
  }

  test("t_tfidf_keywords: ubiquitous terms score zero, rare terms lead their doc") {
    val dir = Files.createTempDirectory("graft_tfidf").toString
    // 3-token docs so the top-3 window must SURFACE every term —
    // "common" (in every doc, idf = ln((N+1)/(N+1)) = 0) is then
    // guaranteed to appear in the output, making the zero-score law
    // observable rather than vacuously cut by the rank filter
    writeDocs(dir, Seq(
      1L -> "common rare alpha",
      2L -> "common alpha gamma",
      3L -> "common gamma beta"))
    val rows = TextQueries.all("t_tfidf_keywords")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    // rare (df=1) must be doc 1's top keyword
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.head._3 === "rare")
    // a term present in EVERY doc surfaces with score exactly 0
    val common = rows.filter(_._3 == "common")
    assert(common.length === 3)
    assert(common.forall(_._4 === 0.0))
    // exactly top-3 per doc, ranks 1..3
    rows.groupBy(_._1).values.foreach { ks =>
      assert(ks.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L))
    }
  }

  test("t_hash_features: token-order invariant, dictionary-free, fixed width") {
    val dir = Files.createTempDirectory("graft_hashfeat").toString
    writeDocs(dir, Seq(
      1L -> "alpha beta gamma delta",
      2L -> "delta gamma beta alpha", // same multiset, different order
      3L -> "zeta",                   // never-seen token: no OOV concept
      // 200 distinct tokens — MORE than D, so the fixed-width bound is
      // actually load-bearing, not satisfied by a short doc trivially
      4L -> (1 to 200).map(i => s"tok$i").mkString(" ")))
    val rows = TextQueries.all("t_hash_features")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = rows.map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L) === byId(2L), "features must be order-invariant")
    assert(byId(3L)._1 === 1L) // one bucket, no dictionary required
    assert(byId(4L)._1 <= 64L, "200 distinct tokens must fold into <= D buckets")
    assert(byId(4L)._1 >= 40L, "the hash must actually spread across buckets")
  }

  test("t_textrank: the hub token of a star graph ranks first") {
    val dir = Files.createTempDirectory("graft_textrank").toString
    // every doc is "hub spokeN hub" — hub co-occurs with every spoke,
    // spokes only with hub: a star, whose center must dominate
    writeDocs(dir, (1L to 8L).map(i => i -> s"hub spoke$i hub"))
    val rows = TextQueries.all("t_textrank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.head._2 === "hub")
    // damped PageRank floor: every rank >= 0.15/N (N = 9 nodes)
    assert(rows.forall(_._3 >= 0.15 / 9 - 1e-9))
    // and the hub strictly dominates every spoke
    assert(rows.tail.forall(_._3 < rows.head._3))
  }

  test("rrf fusion: document strong in BOTH lists outranks single-list documents") {
    val dir = Files.createTempDirectory("graft_rrf").toString
    // vec 0 is the query embedding; vec 1 is nearest to it AND the most
    // lexically relevant doc. Docs 2..9: progressively farther vectors,
    // weak-to-no lexical signal.
    val docs = (0L to 9L).map {
      case 1L => 1L -> "dup dup dup vector merge a b c d e"
      case 2L => 2L -> "dup a b c d e f g h i"
      case i => i -> s"filler$i a b c d e f g h i"
    }
    writeDocs(dir, docs)
    (0L to 9L).map { i =>
      (i, Seq(i.toFloat / 10f, 0f), (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = VectorQueries.all("v_rrf_fusion")(spark, dir).collect()
    assert(out.nonEmpty)
    // ranks are 1..n and the fused score is non-increasing
    assert(out.map(_.getLong(0)).toSeq === (1L to out.length))
    val rrf = out.map(_.getDouble(2))
    assert(rrf.zip(rrf.tail).forall { case (a, b) => a >= b })
    // doc 1: lexical winner (3×dup + vector + merge) and vector rank 2
    // (only the query itself is closer) — nothing can beat two strong
    // lists under RRF here
    val top = out.head
    assert(top.getLong(1) === 1L)
    val lexRnk = top.getLong(3); val vecRnk = top.getLong(4)
    assert(lexRnk === 1L && vecRnk === 2L)
    val expect = math.rint((1.0 / (60 + lexRnk) + 1.0 / (60 + vecRnk)) * 1e6) / 1e6
    assert(top.getDouble(2) === expect)
  }
}
