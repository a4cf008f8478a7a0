package graft

import org.apache.spark.sql.functions._

import graft.queries.{DedupQueries, TextQueries}

/** Pipeline-stage invariants for sequence packing and mixture sampling
  * that the hash-gate oracle (same formula, other engine) cannot speak
  * to: packing must tile each shard's token stream exactly, and rate
  * sampling must actually LAND near its token targets.
  */
class MixturePackSpec extends SparkSpec {
  import spark.implicits._

  test("t_seq_pack tiles each shard gaplessly in doc_id order") {
    val rows = TextQueries.all("t_seq_pack")(spark, sfDir)
      .select($"shard", $"doc_id", $"n_toks", $"start_tok",
        $"seq_first", $"seq_last")
      .collect()
      .map(r => (r.getLong(1) % 8, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (shard, docs) =>
      val ordered = docs.sortBy(_._2)
      var expectedStart = 0L
      ordered.foreach { case (_, id, n, start, sf, sl) =>
        assert(start === expectedStart,
          s"shard $shard doc $id starts at $start, expected $expectedStart")
        assert(sf === start / 2048 && sl === (start + n - 1) / 2048,
          s"shard $shard doc $id window span wrong")
        expectedStart += n
      }
    }
  }

  test("d_mixture_sample lands near its per-language token targets") {
    // sf0.01, where every language's rate is < 1 (at sf0.001 the corpus
    // is smaller than the budget and sampling degenerates to keep-all)
    val d = "/root/testdata/sf0.01"
    val got = DedupQueries.all("d_mixture_sample")(spark, d)
      .groupBy($"lang").agg(sum($"n_toks").as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val targets = Map("en" -> 3200.0, "de" -> 1200.0, "es" -> 1200.0,
      "fr" -> 1200.0, "zh" -> 1200.0) // budget 8000 × declared weights
    targets.foreach { case (lang, tgt) =>
      val a = got.getOrElse(lang, 0L).toDouble
      assert(a > tgt * 0.5 && a < tgt * 1.5,
        s"$lang achieved $a tokens vs target $tgt")
    }
    // deterministic: a second run is the identical sample
    val again = DedupQueries.all("d_mixture_sample")(spark, d)
      .agg(count(lit(1)), sum($"doc_id")).head()
    val first = DedupQueries.all("d_mixture_sample")(spark, d)
      .agg(count(lit(1)), sum($"doc_id")).head()
    assert(again === first)
  }
}
