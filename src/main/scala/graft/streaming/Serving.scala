package graft.streaming

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import scala.concurrent.{Future, Promise}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** Micro-batching serving front ends — the Spark-shaped answer to the
  * reference's multi-client server (/root/reference/proto/
  * vector_search.proto: Search/Insert RPCs; client_bench.cpp drives
  * them concurrently). A per-request Spark job pays the scheduler's
  * fixed costs — plan, job submit, stage barriers — which floor
  * per-request latency near ~2 s however small the data (measured r9:
  * 8.7 QPS at 8 clients on sf0.1, flat across two data decades — a
  * scheduler artifact, not a data cost). The serving fix is GROUP
  * COMMIT in both directions:
  *
  *  - [[SearchServer]]: requests enqueue; a dispatcher drains whatever
  *    is pending (≤ maxBatch) and runs ONE pruned-search job for the
  *    whole batch. The pruned search is per-query independent (every
  *    stage keys by query_id), so the batched job is answer-identical
  *    to per-request jobs — ServingSpec proves equality against
  *    searchPruned — while the fixed job cost amortizes across the
  *    batch: QPS scales with offered concurrency. Probe resolution
  *    runs DRIVER-SIDE against the collected centroids (bounded index
  *    metadata, the same rows the reference server holds in RAM),
  *    saving the two per-request Spark jobs the DataFrame form pays.
  *  - [[IngestServer]]: concurrent insert requests coalesce into one
  *    delta-log append per dispatch round under a single writer — the
  *    LSM group-commit discipline (the reference serializes its write
  *    buffer behind a mutex the same way).
  *
  * On a real cluster the dispatcher is exactly this code on the
  * driver; batch size rides offered load, and the per-batch job scans
  * only the probed partitions, so serving cost stays nprobe/k of the
  * corpus regardless of concurrency.
  */
object Serving {
  /** One ranked hit. */
  final case class Hit(neighborId: Long, rnk: Long, dist: Double)
}

/** See [[Serving]]. `close()` drains the queue, then stops the
  * dispatcher. */
final class SearchServer(spark: SparkSession, indexDir: String, k: Int,
    nprobe: Int, maxBatch: Int = 128, maxInFlight: Int = 3)
    extends AutoCloseable {
  import Serving.Hit

  // a cloned session tuned for bounded serving jobs (shares the
  // SparkContext and all caches; separate SQLConf): a probe batch
  // aggregates a few thousand rows, so the analytics session's
  // shuffle width just mints empty tasks, and AQE's stage-by-stage
  // re-planning adds a barrier per exchange for plans whose joins are
  // all explicit broadcasts anyway. Answers are conf-independent —
  // ServingSpec's equality against searchPruned holds on this session.
  private val serve: SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    s2
  }
  import serve.implicits._

  // bounded index metadata, collected once per server lifetime
  private val cents: Array[(Int, Array[Float])] =
    serve.read.parquet(s"$indexDir/centroids")
      .select(col("cluster_id").cast("int"), col("centroid"))
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
  require(cents.nonEmpty, s"no centroids under $indexDir")

  private final case class Req(rid: Long, qv: Array[Float], p: Promise[Seq[Hit]])
  private val queue = new LinkedBlockingQueue[Req]()
  private val nextRid = new AtomicLong(0L)
  // gate: the open-check + put must be atomic with respect to close()'s
  // open=false flip — a put that wins this lock lands while the
  // dispatcher loop is provably still live (it exits only after
  // observing open==false), so no request can slip in after the final
  // straggler drain and hang its caller. Uncontended in steady state.
  private val gate = new Object
  @volatile private var open = true

  /** Enqueue one search; completes when its batch's job does. Results
    * are exactly searchPruned's rows for this query vector. Throws
    * (synchronously) once the server is closed — never hands back a
    * promise nobody will complete. */
  def search(qv: Array[Float]): Future[Seq[Hit]] = {
    val p = Promise[Seq[Hit]]()
    gate.synchronized {
      require(open, "SearchServer is closed")
      queue.put(Req(nextRid.getAndIncrement(), qv, p))
    }
    p.future
  }

  // the engine's l2Sq lane-4 fold exactly (VectorKernels — the shared
  // implementation, so it cannot drift): probe ranking must be
  // decision-identical to resolveProbes' (cdist, cluster_id) order
  private def l2sq(a: Array[Float], b: Array[Float]): Double =
    graft.functions.VectorKernels.l2sqF(a, b)

  private def runBatch(reqs: Seq[Req]): Unit =
    try {
      val probeRows = reqs.flatMap { r =>
        cents.map { case (cid, cv) => (l2sq(r.qv, cv), cid) }
          .sorted.take(nprobe)
          .map { case (_, cid) => (r.rid, r.qv.toSeq, cid) }
      }
      val probeIds = probeRows.map(_._3).distinct.sorted
      val probes = probeRows.toDF("query_id", "qv", "cluster_id")
      val queries = reqs.map(r => (r.rid, r.qv.toSeq)).toDF("query_id", "qv")
      val byRid = IvfIndex
        .searchPrunedFrames(serve, indexDir, queries, probes, probeIds, k)
        .collect()
        .groupBy(_.getLong(0))
      reqs.foreach { r =>
        val hits = byRid.getOrElse(r.rid, Array.empty).toSeq
          .map(row => Hit(row.getLong(1), row.getLong(2), row.getDouble(3)))
          .sortBy(_.rnk)
        r.p.success(hits)
      }
    } catch { case e: Throwable => reqs.foreach(_.p.tryFailure(e)) }

  // PIPELINED dispatch: up to maxInFlight batch jobs overlap (Spark
  // schedules concurrent jobs fine — stages interleave on the
  // executor pool), so the scheduler's per-job latency stops gating
  // aggregate QPS. The semaphore doubles as natural batch sizing:
  // while maxInFlight jobs run, arrivals accumulate in the queue and
  // the NEXT drain picks them all up — load adaptively deepens the
  // batches instead of the queue.
  private val inFlight = new java.util.concurrent.Semaphore(maxInFlight)
  private val workers =
    java.util.concurrent.Executors.newFixedThreadPool(maxInFlight)
  private val dispatcher = new Thread(() => {
    while (open || !queue.isEmpty) {
      val first = queue.poll(10, TimeUnit.MILLISECONDS)
      if (first != null) {
        inFlight.acquire()
        val drained = new java.util.ArrayList[Req](maxBatch)
        drained.add(first)
        queue.drainTo(drained, maxBatch - 1)
        import scala.jdk.CollectionConverters._
        val batch = drained.asScala.toSeq
        workers.submit(new Runnable {
          override def run(): Unit =
            try runBatch(batch) finally inFlight.release()
        })
      }
    }
    inFlight.acquire(maxInFlight) // wait out the in-flight jobs
    workers.shutdown()
    // belt-and-braces: the gate lock means nothing can be here, but a
    // leftover would hang its caller forever, so drain loudly anyway
    val stragglers = new java.util.ArrayList[Req]()
    queue.drainTo(stragglers)
    stragglers.forEach(r =>
      r.p.tryFailure(new IllegalStateException("SearchServer closed")))
  }, "graft-search-server")
  dispatcher.setDaemon(true)
  dispatcher.start()

  override def close(): Unit = {
    gate.synchronized { open = false }
    dispatcher.join(60000)
  }
}

/** See [[Serving]]: single-writer group commit into the IVF delta log.
  * Requests drained in one dispatch round share ONE sequence number
  * and ONE append job; per-request ordering between colliding vec_ids
  * within a round is therefore undefined (callers needing it must
  * serialize their own submissions — the reference's mutexed buffer
  * gives the same guarantee boundary). */
final class IngestServer(spark: SparkSession, indexDir: String,
    startSeq: Long, maxBatch: Int = 64) extends AutoCloseable {
  import spark.implicits._

  private final case class Req(rows: Seq[(Long, Seq[Float])], p: Promise[Long],
      enq: Long = System.nanoTime())
  private val queue = new LinkedBlockingQueue[Req]()
  private val nextSeq = new AtomicLong(startSeq)
  // split accounting (cumulative, lifetime of the server): where an
  // insert request's wall goes — QUEUE WAIT (enqueue → its batch's
  // dispatch, the group-commit formation time) vs the COMMIT JOB
  // (appendBatch: the per-batch IVF assignment pass + the two
  // appends). p99 growth under depth attributes to whichever leg
  // grows; the bench's insert_sweep records both per sweep point.
  private val waitNs = new AtomicLong(0)
  private val commitNs = new AtomicLong(0)
  private val nBatchesDone = new AtomicLong(0)
  private val nReqsDone = new AtomicLong(0)

  /** (batches, requests, total queue-wait sec summed over requests,
    * total commit-job sec summed over batches) since construction. */
  def splitStats: (Long, Long, Double, Double) =
    (nBatchesDone.get, nReqsDone.get, waitNs.get / 1e9, commitNs.get / 1e9)
  // see SearchServer.gate: open-check + put atomic vs close()'s flip
  private val gate = new Object
  @volatile private var open = true

  /** Enqueue one insert batch; the future completes with the sequence
    * number its group commit landed under. Throws (synchronously) once
    * the server is closed — never hands back a dead promise. */
  def insert(rows: Seq[(Long, Seq[Float])]): Future[Long] = {
    val p = Promise[Long]()
    gate.synchronized {
      require(open, "IngestServer is closed")
      queue.put(Req(rows, p))
    }
    p.future
  }

  // Centroids collected ONCE per server — the bounded index metadata
  // the reference server holds in RAM (SearchServer resolves probes
  // against the same collected rows). Lazy so construction stays
  // job-free; single-writer discipline means no compactor swaps them
  // mid-serve (and IVF compaction never rewrites centroids anyway).
  private lazy val centroids: Seq[(Int, Array[Float])] =
    spark.read.parquet(s"$indexDir/centroids")
      .select("cluster_id", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq

  private def runBatch(reqs: Seq[Req]): Unit =
    try {
      val t0 = System.nanoTime()
      reqs.foreach(r => waitNs.addAndGet(t0 - r.enq))
      nReqsDone.addAndGet(reqs.size)
      val seq = nextSeq.getAndIncrement()
      // assignment runs driver-side (resolveBatchLocal — bit-identical
      // to the resolveBatch plan by spec); the commit job is just the
      // two bounded appends, which halves the per-batch wall the
      // insert_sweep split showed dominating p99
      val resolved = IvfDeltaIngest.resolveBatchLocal(
        reqs.flatMap(_.rows).map { case (id, e) => (id, e.toArray) },
        centroids, seq)
      IvfDeltaIngest.appendBatchResolved(spark, indexDir, resolved)
      commitNs.addAndGet(System.nanoTime() - t0)
      nBatchesDone.incrementAndGet()
      reqs.foreach(_.p.success(seq))
    } catch { case e: Throwable => reqs.foreach(_.p.tryFailure(e)) }

  private val dispatcher = new Thread(() => {
    while (open || !queue.isEmpty) {
      val first = queue.poll(10, TimeUnit.MILLISECONDS)
      if (first != null) {
        val drained = new java.util.ArrayList[Req](maxBatch)
        drained.add(first)
        queue.drainTo(drained, maxBatch - 1)
        import scala.jdk.CollectionConverters._
        runBatch(drained.asScala.toSeq)
      }
    }
    // belt-and-braces: the gate lock means nothing can land post-drain,
    // but a leftover would hang its caller forever — drain loudly anyway
    val stragglers = new java.util.ArrayList[Req]()
    queue.drainTo(stragglers)
    stragglers.forEach(r =>
      r.p.tryFailure(new IllegalStateException("IngestServer closed")))
  }, "graft-ingest-server")
  dispatcher.setDaemon(true)
  dispatcher.start()

  override def close(): Unit = {
    gate.synchronized { open = false }
    dispatcher.join(30000)
  }
}
