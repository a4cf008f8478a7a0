package graft

import org.apache.spark.sql.SparkSession

/** Scratch driver: time ONE query N times at a scale factor (warm
  * stores, steady-state JVM) to separate plan cost from box noise.
  * Not part of the contract.
  * Usage: runMain graft.BenchOne <query>[,<query>…] [sfDir] [reps]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    names.foreach { name =>
      if (name == "distance") {
        println(s"BENCHONE distance ${Bench.distanceBench(spark, sfDir)}")
        println(s"BENCHONE distance_kernel ${
          Bench.distanceKernelBench(spark, sfDir)}")
        spark.stop(); return
      }
      if (name == "throughput") {
        println(s"BENCHONE throughput ${Bench.throughput(spark, sfDir)}")
        spark.stop(); return
      }
      if (name == "throughput_batched") {
        val clients = sys.env.getOrElse("SPARK_GRAFT_TB_CLIENTS", "32").toInt
        println(s"BENCHONE throughput_batched ${
          Bench.throughputBatched(spark, sfDir, clients = clients)}")
        spark.stop(); return
      }
      if (name == "insert_sweep") {
        println(s"BENCHONE insert_sweep ${Bench.insertSweep(spark, sfDir)}")
        spark.stop(); return
      }
      if (name == "insert_split") {
        // the insert-path floor analysis (r12 verdict #6): decompose
        // ONE group-commit batch's commit job into its three legs —
        // the per-batch IVF assignment pass (resolveBatch: broadcast
        // centroids × batch, two keep-min aggregates, materialized),
        // the delta-log append, and the partitioned assignments
        // append — timed standalone against a scratch store, the
        // dedup_cluster_split convention. Queue-wait (the OTHER half
        // of the split) is measured live by insert_sweep's
        // queue_wait_ms_mean; this leg prices the job side.
        import org.apache.spark.sql.functions._
        val src = graft.operators.IndexStore.ivf(spark, sfDir, k = 16)
        val scratch = java.nio.file.Files
          .createTempDirectory("graft-insert-split-ivf").toString
        spark.read.parquet(s"$src/centroids")
          .coalesce(1).write.mode("overwrite").parquet(s"$scratch/centroids")
        spark.read.parquet(s"$src/assignments")
          .write.partitionBy("cluster_id").mode("overwrite")
          .parquet(s"$scratch/assignments")
        val rows = Tables.load(spark, sfDir, "embeddings")
          .filter(col("vec_id") < 64).select(col("embedding")).collect()
          .map(_.getSeq[Float](0))
        val idBase: Long = Tables.load(spark, sfDir, "embeddings")
          .agg(max(col("vec_id"))).collect()(0).getLong(0) + 1L
        (0 until reps).foreach { i =>
          import spark.implicits._
          val batch = rows.zipWithIndex.map { case (e, j) =>
            (idBase + i.toLong * rows.length + j, e) }
            .toSeq.toDF("vec_id", "embedding")
          val cent = spark.read.parquet(s"$scratch/centroids")
          val t0 = System.nanoTime()
          val assigned = graft.streaming.IvfDeltaIngest
            .resolveBatch(batch, cent, seq = 1000L + i)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          assigned.count()
          val t1 = System.nanoTime()
          assigned.write.mode("append").parquet(s"$scratch/delta_log")
          val t2 = System.nanoTime()
          assigned.write.mode("append").partitionBy("cluster_id")
            .parquet(s"$scratch/assignments")
          val t3 = System.nanoTime()
          assigned.unpersist()
          println(f"BENCHONE insert_split rep$i batch=${rows.length} " +
            f"assign=${(t1 - t0) / 1e9}%.3f s delta_append=${(t2 - t1) / 1e9}%.3f s " +
            f"part_append=${(t3 - t2) / 1e9}%.3f s")
        }
        spark.stop(); return
      }
      if (name == "latency") {
        val t0 = System.nanoTime()
        val lat = Bench.latencyBench(spark, sfDir)
        println(f"BENCHONE latency wall ${(System.nanoTime() - t0) / 1e9}%.1f s $lat")
        spark.stop(); return
      }
      if (name == "dedup_cluster_split") {
        // the d_dedup_cluster floor analysis (r10 verdict #7): split
        // the entry into its three legs — edge-STORE scan, the
        // label-contraction closure (ConnectedComponents.minLabel),
        // and the output join+sort — timed separately with the same
        // reset discipline, so the sf10 cost attributes to a leg
        // instead of a single opaque number.
        import org.apache.spark.sql.functions._
        val edgeDir = graft.queries.DedupQueries.jaccardEdgeStore(spark, sfDir)
        (0 until reps).foreach { i =>
          val keep = Bench.persistedRddIds(spark)
          val t0 = System.nanoTime()
          val nEdges = spark.read.parquet(edgeDir).count()
          val t1 = System.nanoTime()
          val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"))
          val comp = graft.operators.ConnectedComponents.minLabel(
            docs, "doc_id", spark.read.parquet(edgeDir), "doc_a", "doc_b",
            validateNodes = false, trustedEndpoints = true)
          Bench.exhaust(comp)
          val t2 = System.nanoTime()
          Bench.exhaust(SparkEntry.queries("d_dedup_cluster")(spark, sfDir))
          val t3 = System.nanoTime()
          println(f"BENCHONE dedup_cluster_split rep$i edges=$nEdges " +
            f"scan=${(t1 - t0) / 1e9}%.2f s closure=${(t2 - t1) / 1e9}%.2f s " +
            f"full_query=${(t3 - t2) / 1e9}%.2f s")
          Bench.resetSharedState(spark, keep)
        }
        spark.stop(); return
      }
      if (name == "resample_ffill_split") {
        // the q_resample_ffill floor analysis (r11 verdict #7): time the
        // entry's own stage legs — hourly aggregation, the anchor
        // window, the gap-fill explode, and the full query —
        // separately under the same reset discipline. Legs recompute
        // their inputs (no cross-leg caching: each number is the leg's
        // standalone cost, the dedup_cluster_split convention).
        import graft.queries.AnalyticsQueries._
        (0 until reps).foreach { i =>
          val keep = Bench.persistedRddIds(spark)
          val ev = resampleEv(Tables.load(spark, sfDir, "events"))
          val t0 = System.nanoTime()
          Bench.exhaust(resampleHourly(ev))
          val t1 = System.nanoTime()
          Bench.exhaust(resampleAnchors(resampleHourly(ev)))
          val t2 = System.nanoTime()
          Bench.exhaust(resampleExplode(resampleAnchors(resampleHourly(ev))))
          val t3 = System.nanoTime()
          Bench.exhaust(SparkEntry.queries("q_resample_ffill")(spark, sfDir))
          val t4 = System.nanoTime()
          println(f"BENCHONE resample_ffill_split rep$i " +
            f"hourly=${(t1 - t0) / 1e9}%.2f s anchors=${(t2 - t1) / 1e9}%.2f s " +
            f"explodefill=${(t3 - t2) / 1e9}%.2f s full_query=${(t4 - t3) / 1e9}%.2f s")
          Bench.resetSharedState(spark, keep)
        }
        spark.stop(); return
      }
      // "probe:<entry>" times the bounded pair probe instead of the
      // full-output entry (PairProbes — the sf10 skip-list companions)
      val fn =
        if (name.startsWith("probe:"))
          graft.queries.PairProbes.all(name.stripPrefix("probe:"))
        else SparkEntry.queries(name)
      (0 until reps).foreach { i =>
        val keep = Bench.persistedRddIds(spark)
        val t0 = System.nanoTime()
        Bench.exhaust(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"BENCHONE $name rep$i $sec%.3f s")
        Bench.resetSharedState(spark, keep)
      }
    }
    spark.stop()
  }
}
