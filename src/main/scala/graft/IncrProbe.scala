package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition of d_dedup_incremental's wall at scale.
  * Not part of the contract. Usage: runMain graft.IncrProbe [sfDir]. */
object IncrProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/tmp/graft-scale/sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .config("spark.sql.cache.serializer",
        "graft.functions.GraftCachedBatchSerializer")
      .config("spark.sql.extensions", "graft.plans.GraftCacheScanExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[incrprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val docs = s.read.parquet(s"$d/documents.parquet")
      .select($"doc_id", $"lang",
        sort_array(array_distinct(
          GraftText.wordShingleHashes(
            GraftText.whitespaceTokens($"text"), 1))).as("ws"))
      .withColumn("nw", size($"ws").cast("long"))
      .cache()
    t("docs cache build")(docs.count())
    val batch = docs.filter(pmod($"doc_id", lit(20)) === 7)
    val corpus = docs.filter(pmod($"doc_id", lit(20)) =!= 7)
    val maxNw = t("maxNw agg")(docs.agg(max($"nw")).head.getLong(0))
    val np = (2L * maxNw / 9L + 1L).toInt
    val partsCol = expr(
      s"transform(sequence(0, ${np - 1}), p -> " +
        s"xxhash64(filter(ws, w -> pmod(w, $np) = p)))")
    t("corpus parts compute only")(
      corpus.withColumn("pb", partsCol)
        .select(xxhash64($"pb").as("h")).agg(max($"h")).head)
    val bParts = batch.withColumn("pa", partsCol)
    val bKeys = bParts.select($"doc_id", $"lang", $"nw".as("na"),
      posexplode($"pa").as(Seq("p", "ph")))
    val candSlim = corpus
      .withColumn("pb", partsCol)
      .select($"doc_id".as("cid"), $"lang", $"nw".as("nb"),
        posexplode($"pb").as(Seq("p", "ph")))
      .join(broadcast(bKeys), Seq("lang", "p", "ph"))
      .filter(lit(5) * least($"na", $"nb") >= lit(4) * greatest($"na", $"nb"))
    t("candSlim count")(println("  n=" + candSlim.count()))
    val veriPairs = candSlim
      .groupBy($"doc_id", $"cid", $"na", $"nb")
      .agg(count(lit(1)).as("ac"))
      .filter($"ac" >= lit(np) - expr("(na + nb) div 9"))
      .select($"doc_id", $"cid")
    t("veriPairs agg+filter")(println("  n=" + veriPairs.count()))
    val near = veriPairs
      .join(corpus.select($"doc_id".as("cid"), $"ws".as("wb")), Seq("cid"))
      .join(bParts.select($"doc_id", $"ws".as("wa")), Seq("doc_id"))
      .filter(GraftText.jaccardSortedLong($"wa", $"wb") >= 0.8)
      .groupBy($"doc_id").agg(min($"cid").as("near_keeper"))
    t("near full")(println("  n=" + near.count()))
    s.stop()
  }
}
