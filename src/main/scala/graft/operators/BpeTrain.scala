package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge learning (Sennrich et al. 2016, arXiv:1508.07909) — the
  * tokenizer-TRAINING stage of the pipeline, next to t_bpe_tokens'
  * pretokenizer: iteratively find the most frequent adjacent symbol
  * pair in the corpus vocabulary and fuse it into a new symbol. The
  * learned merge list IS the tokenizer.
  *
  * Scale shape: the corpus collapses to its VOCABULARY frame first
  * (distinct word → frequency, one shuffle on words — the standard BPE
  * trick: merge statistics depend only on (word, freq), so 100 TB of
  * text becomes a few million vocab rows), and every round is one
  * bounded pair-count aggregate over that frame. The round winner is a
  * single argmax row (the bounded-driver-scalar pattern: like
  * t_tfidf_keywords' corpus N, it is O(1) per round whatever the data
  * size); lineage is cut per round so R rounds don't stack into one
  * R-deep plan.
  *
  * Determinism: pure integer counts and string ops — no floats
  * anywhere. Winner tie-break is total: (count desc, lhs, rhs).
  *
  * The merge step is the part that usually needs imperative code; here
  * it is a plain `replace`. A symbol list is represented as a string
  * with every symbol wrapped in U+001F separators ("abc" as atoms →
  * "␟a␟␟b␟␟c␟"), so the pair (l, r) occurs as the substring "␟l␟␟r␟"
  * and occurrences can never share characters — which makes standard
  * left-to-right non-overlapping replace() EXACTLY the greedy BPE merge
  * ("aaa" + (a,a) → [aa, a], never [a, aa]), identical in Spark and the
  * SQL oracle. The vocabulary is restricted to /^[a-z]+$/ tokens (the
  * classic alphabetic formulation), which also guarantees the separator
  * cannot collide with symbol text.
  */
object BpeTrain {

  val Sep = "\u001F"
  val Rounds = 6

  /** "abc" → "␟a␟␟b␟␟c␟": every char wrapped in separators. */
  def wrap(word: Column): Column =
    regexp_replace(word, "(.)", s"$Sep$$1$Sep")

  /** rep-string → symbol array (strip outer seps, split on the doubled
    * inner sep). */
  def symbols(rep: Column): Column =
    split(trim(rep, Sep), s"$Sep$Sep")

  /** Learn `rounds` merges over the documents' text column. Returns
    * (merge_rank, lhs, rhs, merged, pair_count), one row per round. */
  def learn(docs: DataFrame, rounds: Int = Rounds): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(graft.GraftText.whitespaceTokens(
        coalesce(col("text"), lit("")))).as("w"))
      .filter($"w".rlike("^[a-z]+$") && length($"w") >= 2)
      .groupBy($"w").agg(count(lit(1)).as("freq"))
      .select(wrap($"w").as("rep"), $"freq")
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = words
        .select($"freq", symbols($"rep").as("syms"))
        .select($"freq", explode(zip_with(
          slice($"syms", lit(1), size($"syms") - 1),
          slice($"syms", lit(2), size($"syms") - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy($"p.l".as("lhs"), $"p.r".as("rhs"))
        .agg(sum($"freq").as("cnt"))
        .orderBy($"cnt".desc, $"lhs", $"rhs")
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // every word fully merged
      else {
        val (l, rr, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, l, rr, l + rr, cnt))
        words = words.select(
          replace($"rep", lit(s"$Sep$l$Sep$Sep$rr$Sep"), lit(s"$Sep$l$rr$Sep"))
            .as("rep"), $"freq")
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.result().toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy("merge_rank")
  }

  /** Re-tokenize a word with the learned merges applied in rank order —
    * the inference side of the tokenizer, used by the spec to assert
    * that training output actually tokenizes. */
  def applyMerges(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var rep = word.map(c => s"$Sep$c$Sep").mkString
    merges.foreach { case (l, rr) =>
      rep = rep.replace(s"$Sep$l$Sep$Sep$rr$Sep", s"$Sep$l$rr$Sep")
    }
    rep.stripPrefix(Sep).stripSuffix(Sep).split(s"$Sep$Sep").toSeq
  }

  /** Per-document encode statistics — the INFERENCE side of the
    * tokenizer, as a corpus operator: the learned merges applied in
    * rank order to every alphabetic token (same wrapped-separator
    * replace as training — LTR non-overlap == greedy BPE), reporting
    * words, characters, and post-merge symbol counts per doc. The
    * merge list rides the bounded-driver-scalar pattern (R rows,
    * O(1) whatever the corpus size — the PQ-codebook discipline);
    * the encode itself is a pure scan-side projection chain, one
    * doc-keyed aggregate, nothing corpus-global. Docs without
    * qualifying tokens drop out — by contract. */
  def encodeStats(docs: DataFrame, rounds: Int = Rounds): DataFrame =
    encodeWithMerges(docs, learn(docs, rounds).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq) // rank order

  /** The encode proper, taking an already-learned merge list (rank
    * order) — the shape the persisted-tokenizer path uses. */
  def encodeWithMerges(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select($"doc_id",
        explode(graft.GraftText.whitespaceTokens(
          coalesce(col("text"), lit("")))).as("w"))
      .filter($"w".rlike("^[a-z]+$") && length($"w") >= 2)
    val rep = merges.foldLeft(wrap($"w")) { case (c, (l, r)) =>
      replace(c, lit(s"$Sep$l$Sep$Sep$r$Sep"), lit(s"$Sep$l$r$Sep")) }
    base.select($"doc_id", length($"w").cast("long").as("n_chars"),
        size(symbols(rep)).cast("long").as("n_syms"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"), sum($"n_chars").as("n_chars"),
        sum($"n_syms").as("n_symbols"))
  }

  /** The DuckDB oracle: the same vocabulary collapse, the same wrapped
    * representation (chr(31) separators), R rounds unrolled as chained
    * CTEs — pair counts, (cnt DESC, lhs, rhs) argmax, replace-merge —
    * then the merge list unioned back in rank order. */
  def oracleSql(rounds: Int = Rounds): String = {
    s"""WITH ${trainCtes(rounds)}
       |SELECT merge_rank, lhs, rhs, lhs || rhs AS merged, cnt AS pair_count FROM (
       |${(1 to rounds).map(i =>
           s"  SELECT ${i}::BIGINT AS merge_rank, lhs, rhs, cnt FROM m$i")
          .mkString("\n  UNION ALL\n")}
       |) ORDER BY merge_rank""".stripMargin
  }

  /** Shared CTE block `w0, p1/m1/w1, …, pR/mR/wR` — the training rounds
    * both oracles chain from. */
  private def trainCtes(rounds: Int): String = {
    val sep = "chr(31)"
    def round(i: Int): String =
      s"""p$i AS (
         |  SELECT (pr).l AS lhs, (pr).r AS rhs, sum(freq)::BIGINT AS cnt FROM (
         |    SELECT freq, unnest([struct_pack(l := syms[j], r := syms[j+1])
         |                         for j in range(1, len(syms))]) AS pr
         |    FROM (SELECT freq, string_split(trim(rep, $sep), $sep||$sep) AS syms
         |          FROM w${i - 1}))
         |  GROUP BY 1, 2),
         |m$i AS (SELECT lhs, rhs, cnt FROM p$i ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |w$i AS (
         |  SELECT replace(rep, $sep||lhs||$sep||$sep||rhs||$sep,
         |                 $sep||lhs||rhs||$sep) AS rep, freq
         |  FROM w${i - 1} CROSS JOIN m$i)""".stripMargin
    s"""w0 AS (
       |  SELECT regexp_replace(w, '(.)', $sep || '\\1' || $sep, 'g') AS rep, freq
       |  FROM (
       |    SELECT w, count(*)::BIGINT AS freq FROM (
       |      SELECT unnest(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS w
       |      FROM documents)
       |    WHERE regexp_matches(w, '^[a-z]+$$') AND len(w) >= 2
       |    GROUP BY w)),
       |${(1 to rounds).map(round).mkString(",\n")}""".stripMargin
  }

  /** t_bpe_encode oracle: the training CTEs re-derive the merge list,
    * then each alphabetic token runs the SAME rank-ordered replace
    * chain (each round's pattern/replacement a scalar subquery against
    * that round's single-row m_i) before the per-doc aggregate. */
  def encodeOracleSql(rounds: Int = Rounds): String = {
    val sep = "chr(31)"
    // coalesce to a sentinel that cannot occur in a wrapped rep
    // (chr(30); symbols are [a-z] + chr(31)): if training exhausts
    // before round i, m_i is empty and the scalar subquery is NULL —
    // without the guard replace(acc, NULL, NULL) would NULL every
    // doc's counts, while encodeStats just applies fewer merges
    val rep = (1 to rounds).foldLeft(
      s"regexp_replace(w, '(.)', $sep || '\\1' || $sep, 'g')") { (acc, i) =>
      s"replace($acc,\n      coalesce((SELECT $sep||lhs||$sep||$sep||rhs||$sep FROM m$i), chr(30))," +
        s"\n      coalesce((SELECT $sep||lhs||rhs||$sep FROM m$i), chr(30)))"
    }
    s"""WITH ${trainCtes(rounds)},
       |etok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS w
       |  FROM documents),
       |eal AS (SELECT doc_id, w FROM etok
       |  WHERE regexp_matches(w, '^[a-z]+$$') AND len(w) >= 2),
       |eenc AS (SELECT doc_id, length(w)::BIGINT AS n_chars,
       |    len(string_split(trim($rep, $sep), $sep||$sep))::BIGINT AS n_syms
       |  FROM eal)
       |SELECT doc_id, count(*)::BIGINT AS n_words, sum(n_chars)::BIGINT AS n_chars,
       |  sum(n_syms)::BIGINT AS n_symbols
       |FROM eenc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
