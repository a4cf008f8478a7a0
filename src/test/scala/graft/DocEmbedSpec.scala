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

  test("hard negatives: never the query's own source, ranked, complete") {
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = queries.DedupQueries.all("d_hard_negatives")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 40)
    out.foreach { case (q, n, _, _) =>
      assert(src(q) !== src(n), s"neighbor $n shares source with query $q")
    }
    out.groupBy(_._1).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3) === (1L to 5L), s"query $q ranks")
      assert(byRank.map(_._4) === byRank.map(_._4).sorted, s"query $q order")
    }
  }

  test("embedding is a pure function of text") {
    val out = Seq(("a b c a", 0), ("a b c a", 1)).toDF("text", "i")
      .select(simhashVotes(whitespaceTokens($"text")).as("v"))
      .collect().map(_.getSeq[Int](0))
    assert(out(0) === out(1))
  }
}
