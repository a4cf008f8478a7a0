package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftText

/** Benchmark decontamination — mark corpus documents sharing any
  * `width`-word shingle with a held-out evaluation set (the GPT-3
  * appendix-C / PaLM overlap check): a training corpus must not
  * contain the benchmarks it will be scored on, so any doc with a
  * verbatim n-gram overlap gets flagged for removal or audit.
  *
  * Scale shape: the eval side is bounded by construction (benchmarks,
  * not corpora), so its DISTINCT shingle hashes broadcast; corpus
  * shingles stream scan-side through the broadcast hash join and the
  * only shuffle is the per-doc rollup on doc_id — linear in corpus
  * size, no shuffle of text, exactly one pass. Shingles ride the
  * one-pass native [[graft.GraftText.wordShingleHashes]] expression
  * (8-byte hashes, never strings, across the join).
  */
object Decontaminate {

  private def toks(c: org.apache.spark.sql.Column) = GraftText.whitespaceTokens(c)

  /** Per-corpus-doc contamination stats against `evalDocs`:
    * (doc_id, n_shingles, n_eval_shingles, contaminated_frac,
    * is_contaminated). Docs shorter than `width` tokens carry no
    * shingles and are excluded by contract (same as substring dedup). */
  def mark(corpus: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, width: Int = 8): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val spark = corpus.sparkSession
    import spark.implicits._
    def shingles(df: DataFrame) = df
      .select(col(idCol).cast("long").as("doc_id"), toks(col(textCol)).as("toks"))
      .filter(size($"toks") >= width)
      .select($"doc_id",
        explode(GraftText.wordShingleHashes($"toks", width)).as("sh"))
    val evalSh = shingles(evalDocs)
      .select($"sh").distinct().withColumn("hit", lit(1L))
    shingles(corpus)
      .join(broadcast(evalSh), Seq("sh"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce($"hit", lit(0L))).as("n_eval_shingles"))
      .select($"doc_id", $"n_shingles", $"n_eval_shingles",
        round($"n_eval_shingles".cast("double") / $"n_shingles", 4)
          .as("contaminated_frac"),
        ($"n_eval_shingles" > 0L).as("is_contaminated"))
  }
}
