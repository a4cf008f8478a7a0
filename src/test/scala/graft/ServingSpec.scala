package graft

import scala.concurrent.Await
import scala.concurrent.duration.Duration

import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, IvfIndex}
import graft.streaming.{IngestServer, SearchServer}

/** The micro-batching serving front ends: batched answers must equal
  * per-request searchPruned answers exactly (per-query independence),
  * group-committed inserts must land in the delta log and shadow the
  * index for subsequent searches. */
class ServingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-serving-spec")
      .toString
    val rnd = new scala.util.Random(246)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat * 3f))
    val rows = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(v => v + rnd.nextGaussian().toFloat * 0.3f).toSeq,
        (i % 4).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
        $"label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** A scratch copy of the fixture IVF store (inserts must not dirty
    * the shared artifact). */
  private def scratchStore(): String = {
    val src = IndexStore.ivf(spark, fixtureDir, k = 16)
    val dst = java.nio.file.Files.createTempDirectory("graft-serving-ivf")
      .toString
    spark.read.parquet(s"$src/centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$dst/centroids")
    spark.read.parquet(s"$src/assignments")
      .write.partitionBy("cluster_id").mode("overwrite")
      .parquet(s"$dst/assignments")
    dst
  }

  private def vecsOf(ids: Seq[Long]): Seq[(Long, Array[Float])] =
    spark.read.parquet(s"$fixtureDir/embeddings.parquet")
      .filter($"vec_id".isin(ids: _*))
      .select($"vec_id", $"embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq

  private def prunedRows(dir: String, ids: Seq[Long], k: Int, nprobe: Int)
      : Map[Long, Seq[(Long, Long, Double)]] = {
    val q = spark.read.parquet(s"$fixtureDir/embeddings.parquet")
      .filter($"vec_id".isin(ids: _*))
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    IvfIndex.searchPruned(spark, dir, q, k, nprobe)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
      .map { case (q2, rs) =>
        q2 -> rs.sortBy(_._3).map(t => (t._2, t._3, t._4)).toSeq
      }
  }

  test("concurrent batched searches equal per-request searchPruned exactly") {
    val dir = scratchStore()
    val ids = (0L until 24L)
    val vecs = vecsOf(ids)
    val server = new SearchServer(spark, dir, k = 10, nprobe = 4)
    try {
      // all submitted before any completes: forces multi-request batches
      val futs = vecs.map { case (id, qv) => id -> server.search(qv) }
      val got = futs.map { case (id, f) =>
        id -> Await.result(f, Duration(120, "s"))
          .map(h => (h.neighborId, h.rnk, h.dist))
      }.toMap
      val want = prunedRows(dir, ids, k = 10, nprobe = 4)
      assert(got == want)
    } finally server.close()
  }

  test("group-committed inserts land once and shadow the index for search") {
    val dir = scratchStore()
    val ingest = new IngestServer(spark, dir, startSeq = 1L)
    val rnd = new scala.util.Random(99)
    val newRows = (1000L until 1012L).map { id =>
      id -> Array.fill(64)(rnd.nextGaussian().toFloat)
    }
    try {
      val futs = newRows.map { case (id, v) =>
        ingest.insert(Seq(id -> v.toSeq))
      }
      val seqs = futs.map(Await.result(_, Duration(120, "s")))
      assert(seqs.nonEmpty && seqs.forall(_ >= 1L))
      // every inserted row is in the buffer exactly once
      val buf = graft.streaming.IvfDeltaIngest.deltaLatest(spark, dir).get
        .select($"vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(buf == newRows.map(_._1).sorted)
    } finally ingest.close()
    // a search AT an inserted vector finds it at rank 1, dist 0 — and
    // the batched server answer still equals searchPruned's
    val (qid, qv) = newRows.head
    val server = new SearchServer(spark, dir, k = 5, nprobe = 2)
    try {
      val got = Await.result(server.search(qv), Duration(120, "s"))
      assert(got.head.neighborId == qid && got.head.dist == 0.0)
      val want = IvfIndex.searchPruned(spark, dir,
          Seq((qid, qv.toSeq)).toDF("query_id", "qv"), 5, 2)
        .orderBy("rnk").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got.map(h => (h.neighborId, h.rnk, h.dist)) == want)
    } finally server.close()
  }

  test("insert splitStats accounts every request and batch") {
    val dir = scratchStore()
    val ingest = new IngestServer(spark, dir, startSeq = 1L)
    val rnd = new scala.util.Random(7)
    try {
      val futs = (2000L until 2010L).map { id =>
        ingest.insert(Seq(id -> Array.fill(64)(rnd.nextGaussian().toFloat).toSeq))
      }
      futs.foreach(Await.result(_, Duration(120, "s")))
      val (batches, reqs, waitSec, commitSec) = ingest.splitStats
      assert(reqs == 10L)                      // every request counted once
      assert(batches >= 1L && batches <= 10L)  // group commit coalesces
      assert(commitSec > 0.0)                  // the append jobs took time
      assert(waitSec >= 0.0)                   // queue wait is non-negative
    } finally ingest.close()
  }

  test("close() completes every already-enqueued request") {
    val dir = scratchStore()
    val vecs = vecsOf(0L until 8L)
    val server = new SearchServer(spark, dir, k = 5, nprobe = 2)
    val futs = vecs.map { case (_, qv) => server.search(qv) }
    server.close()
    futs.foreach { f =>
      assert(Await.result(f, Duration(120, "s")).nonEmpty)
    }
  }

  test("a request racing close() either completes or throws — never hangs") {
    // the r10 TOCTOU: require(open) passes, close() flips + final-drains,
    // THEN the put lands → a promise nobody completes. The gate lock
    // makes open-check+put atomic vs the flip, so every submitter either
    // gets a completable future or a synchronous IllegalArgumentException.
    // Hammer the window: many submitter threads racing one close().
    val dir = scratchStore()
    val qv = vecsOf(Seq(0L)).head._2
    for (_ <- 1 to 5) {
      val server = new SearchServer(spark, dir, k = 3, nprobe = 2)
      val outcomes =
        new java.util.concurrent.ConcurrentLinkedQueue[
          Either[Throwable, scala.concurrent.Future[Seq[graft.streaming.Serving.Hit]]]]()
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (1 to 16).map { _ =>
        val t = new Thread(() => {
          start.await()
          try outcomes.add(Right(server.search(qv)))
          catch { case e: IllegalArgumentException => outcomes.add(Left(e)) }
        })
        t.start(); t
      }
      start.countDown()
      Thread.sleep(1) // let some submits land before, some after the flip
      server.close()
      threads.foreach(_.join(30000))
      import scala.jdk.CollectionConverters._
      assert(outcomes.size == 16)
      outcomes.asScala.foreach {
        case Right(f) =>
          // accepted ⇒ the dispatcher must complete it (success or failure)
          Await.ready(f, Duration(120, "s"))
          assert(f.value.isDefined)
        case Left(e) =>
          assert(e.getMessage.contains("closed"))
      }
    }
    // post-close calls always throw synchronously on both servers
    val closedSearch = new SearchServer(spark, dir, k = 3, nprobe = 2)
    closedSearch.close()
    intercept[IllegalArgumentException](closedSearch.search(qv))
    val closedIngest = new IngestServer(spark, dir, startSeq = 100L)
    closedIngest.close()
    intercept[IllegalArgumentException](
      closedIngest.insert(Seq(5000L -> qv.toSeq)))
  }
}
