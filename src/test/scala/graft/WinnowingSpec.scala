package graft

import org.apache.spark.sql.functions._

import graft.GraftText.winnowFingerprints

/** Laws for winnowing fingerprints: the shared-substring guarantee
  * (Schleimer et al. 2003 §3 — any common substring of length >= k+w-1
  * produces a shared fingerprint), the short-doc empty contract, the
  * density bound, and set semantics (sorted, distinct, text-determined).
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val W = 4

  private def fps(texts: String*): Seq[Seq[Long]] =
    texts.toDF("text")
      .select(winnowFingerprints($"text", K, W).as("f"))
      .collect().map(_.getSeq[Long](0)).toSeq

  test("shared substring of length k+w-1 guarantees a shared fingerprint") {
    // 11-byte shared region embedded in otherwise-disjoint text; 200
    // random-ish contexts so the law is exercised across alignments
    val shared = "QWERTYUIOPA" // k+w-1 = 11 bytes
    val rnd = new scala.util.Random(7)
    def ctx(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    (0 until 200).foreach { _ =>
      val Seq(a, b) =
        fps(ctx(rnd.nextInt(30)) + shared + ctx(rnd.nextInt(30)),
          ctx(rnd.nextInt(30)) + shared + ctx(rnd.nextInt(30)))
      assert((a.toSet & b.toSet).nonEmpty, "no shared fingerprint")
    }
  }

  test("docs shorter than k+w-1 bytes yield no fingerprints") {
    val Seq(a, b, c) = fps("", "x", "0123456789") // 10 < 11
    assert(a.isEmpty && b.isEmpty && c.isEmpty)
    val Seq(d) = fps("0123456789A") // exactly 11: one window
    assert(d.size === 1)
  }

  test("output is sorted, distinct, and bounded by the window count") {
    val text = Seq.fill(40)("spark data agg").mkString(" ")
    val Seq(f) = fps(text)
    assert(f === f.sorted && f.size === f.distinct.size)
    val nWindows = (text.length - K + 1) - W + 1
    assert(f.nonEmpty && f.size <= nWindows)
    // repetitive text compresses far below the window count — the
    // whole point of selecting local minima
    assert(f.size < nWindows / 4, s"${f.size} of $nWindows")
  }

  test("overlap join: rare shared region pairs; df-capped common text does not") {
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    val rare = "the quick brown fox jumps over the lazy dog again and again today"
    val common = "all of these documents carry exactly this same boilerplate banner"
    val docs =
      Seq((0L, s"unique left context $rare"),
        (1L, s"$rare completely different right side")) ++
        (2L until 15L).map(i => (i, common)) // 13 identical docs: df > 10
    docs.toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = queries.DedupQueries.all("d_winnow_overlap")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(p => (p._1, p._2)).toSeq === Seq((0L, 1L)),
      s"expected only the rare-region pair: ${out.toSeq}")
    assert(out.head._3 >= 3, s"shared fingerprints: ${out.head._3}")
  }

  test("fingerprints are a pure function of text; disjoint texts disjoint") {
    val Seq(a, b) = fps("the quick brown fox jumps over it",
      "the quick brown fox jumps over it")
    assert(a === b)
    val Seq(c, d) = fps("aaaaaaaaaaaaaaaaaaaaaa", "bbbbbbbbbbbbbbbbbbbbbb")
    assert((c.toSet & d.toSet).isEmpty)
  }
}
