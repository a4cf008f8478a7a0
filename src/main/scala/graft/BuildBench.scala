package graft

import org.apache.spark.sql.SparkSession

/** Scratch driver: time each persisted-artifact BUILD cold (fresh index
  * dir), separating the amortized build cost from the serve cost the
  * per-query bench measures — the build/serve split the IndexStore
  * design is for. Not part of the contract.
  * Usage: runMain graft.BuildBench [sfDir]. */
object BuildBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // fresh root: every build below is genuinely cold
    val dir = java.nio.file.Files
      .createTempDirectory("graft-buildbench").toString
    sys.props("graft.index.dir") = dir
    val spark = SparkSession.builder()
      .config("spark.sql.cache.serializer",
        "graft.functions.GraftCachedBatchSerializer")
      .config("spark.sql.extensions", "graft.plans.GraftCacheScanExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.IndexStore
    val builds: Seq[(String, () => Any)] = Seq(
      "ivf" -> (() => IndexStore.ivf(spark, sfDir, k = 16)),
      "ivf_balanced" -> (() => IndexStore.ivfBalanced(spark, sfDir,
        k = graft.operators.IvfIndex.chooseK(
          Tables.load(spark, sfDir, "embeddings").count()))),
      "pq" -> (() => IndexStore.pq(spark, sfDir)),
      "opq" -> (() => IndexStore.opq(spark, sfDir)),
      "sq8" -> (() => IndexStore.sq8(spark, sfDir)),
      "sq4" -> (() => IndexStore.sq4(spark, sfDir)),
      "ivfpq" -> (() => IndexStore.ivfpq(spark, sfDir)),
      "ivfpq_residual" -> (() => IndexStore.ivfpqResidual(spark, sfDir)),
      "mips" -> (() => IndexStore.mips(spark, sfDir)),
      "knn_graph" -> (() => IndexStore.knnGraph(spark, sfDir)),
      "hnsw_layers" -> (() => IndexStore.hnsw(spark, sfDir)),
      "knn_graph_compacted" -> (() => IndexStore.knnGraphCompacted(
        spark, sfDir, graft.queries.IndexQueries.DeleteMod,
        graft.queries.IndexQueries.DeleteResidue)),
      "hnsw_compacted" -> (() => IndexStore.hnswCompacted(
        spark, sfDir, graft.queries.IndexQueries.DeleteMod,
        graft.queries.IndexQueries.DeleteResidue)),
      "jaccard_edges" -> (() => graft.queries.DedupQueries.jaccardEdgeStore(spark, sfDir)),
      "components" -> (() => graft.queries.DedupQueries.componentStore(spark, sfDir)),
      "lm_scores" -> (() => graft.queries.TextQueries.lmStore(spark, sfDir)),
      "bpe_merges" -> (() => graft.queries.TextQueries.bpeStore(spark, sfDir)))
    val times = builds.map { case (name, build) =>
      val t0 = System.nanoTime()
      build()
      val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
      println(s"BUILDBENCH $name $sec s")
      name -> sec
    }
    spark.stop()
    val js = times.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"build_total","value":${
      math.rint(times.map(_._2).sum * 1000) / 1000},"builds":{$js},"sf":"$sfDir"}""")
    // scratch artifacts: leave no multi-GB tmp dirs behind
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
