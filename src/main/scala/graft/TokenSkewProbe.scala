package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r11 verdict #6): q_skew_metrics' spectrum run
  * over the TOKEN join key that t_unigram_logprob / t_tfidf_keywords
  * shuffle on — is the Zipf head actually task-dominating at sf10, or
  * merely warm? Prints the (doc, token)-pair frame's size, the top
  * tokens' pair counts and row-mass shares in basis points, and the
  * log2 frequency spectrum. Not part of the contract.
  * Usage: runMain graft.TokenSkewProbe [sfDir] */
object TokenSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft-scale/sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.cache.serializer",
        "graft.functions.GraftCachedBatchSerializer")
      .config("spark.sql.extensions", "graft.plans.GraftCacheScanExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val tok = Tables.load(spark, sfDir, "documents")
      .select($"doc_id",
        explode(graft.GraftText.whitespaceTokens($"text")).as("token"))
    // the frame both queries shuffle by token: distinct (doc, token)
    // pairs (t_tfidf's df side; t_unigram's grouped tf frame is the
    // same key distribution)
    val pairs = tok.select($"doc_id", $"token").distinct()
      .groupBy($"token").agg(count(lit(1)).as("c"))
      .cache()
    val total = pairs.agg(sum($"c")).head().getLong(0)
    val nKeys = pairs.count()
    println(s"TOKENSKEW total_pairs=$total n_tokens=$nKeys " +
      s"avg_per_32task=${total / 32}")
    pairs.orderBy($"c".desc).limit(10).collect().foreach { r =>
      val share = r.getLong(1) * 10000 / total
      println(s"TOKENSKEW top token=${r.getString(0)} pairs=${r.getLong(1)} " +
        s"share_bp=$share of_one_task_bp=${r.getLong(1) * 10000 / (total / 32)}")
    }
    val spec = pairs
      .select((length(bin($"c")) - 1).cast("long").as("b"), $"c")
      .groupBy($"b").agg(count(lit(1)).as("n_keys"), sum($"c").as("mass"))
      .orderBy($"b").collect()
    spec.foreach(r => println(s"TOKENSKEW bucket=2^${r.getLong(0)} " +
      s"n_keys=${r.getLong(1)} mass=${r.getLong(2)}"))
    spark.stop()
  }
}
