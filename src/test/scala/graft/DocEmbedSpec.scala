package graft

import org.apache.spark.sql.functions._

import graft.GraftText.{simhash64, simhashVotes, whitespaceTokens}

/** Laws tying the dense document embedding to the SimHash it exposes:
  * sign(votes) IS the fingerprint, votes obey the ±1-per-token parity
  * and magnitude bounds, and the embedding is text-determined.
  */
class DocEmbedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val frame = spark.read.parquet(s"$sfDir/documents.parquet")
    .select($"doc_id", whitespaceTokens($"text").as("toks"))
    .select($"doc_id", size($"toks").as("n"),
      simhashVotes($"toks").as("v"), simhash64($"toks").as("fp"))
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2), r.getLong(3)))

  test("sign of every vote recovers the simhash fingerprint bit") {
    frame.foreach { case (id, _, votes, fp) =>
      votes.zipWithIndex.foreach { case (v, b) =>
        assert((v > 0) === (((fp >>> b) & 1L) == 1L), s"doc $id bit $b")
      }
    }
  }

  test("votes obey per-token parity and magnitude bounds") {
    frame.foreach { case (id, n, votes, _) =>
      assert(votes.size === 64, s"doc $id")
      votes.foreach { v =>
        assert(math.abs(v) <= n, s"doc $id |$v| > $n")
        assert((v + n) % 2 === 0, s"doc $id vote $v parity vs n=$n")
      }
    }
  }

  test("embedding is a pure function of text") {
    val out = Seq(("a b c a", 0), ("a b c a", 1)).toDF("text", "i")
      .select(simhashVotes(whitespaceTokens($"text")).as("v"))
      .collect().map(_.getSeq[Int](0))
    assert(out(0) === out(1))
  }
}
