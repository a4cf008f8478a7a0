package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamIngest
import graft.streaming.StreamIngest.Upsert

class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streaming latest-per-key state equals batch merge semantics") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Upsert]
    val query = StreamIngest.latestPerKey(stream.toDS())
      .writeStream.format("memory").queryName("ingest_state")
      .outputMode(OutputMode.Update()).start()

    // micro-batch 1: initial writes (the "active buffer" fills)
    stream.addData(Upsert(1L, 1L, 10.0), Upsert(2L, 1L, 20.0), Upsert(3L, 1L, 30.0))
    query.processAllAvailable()
    // micro-batch 2: overwrites + a late (stale) write that must lose
    stream.addData(Upsert(1L, 3L, 11.0), Upsert(2L, 2L, 21.0), Upsert(1L, 2L, 99.0))
    query.processAllAvailable()

    val state = spark.table("ingest_state")
      .groupBy($"key").agg(max_by($"value", $"seq").as("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    query.stop()
    assert(state === Map(1L -> 11.0, 2L -> 21.0, 3L -> 30.0))
  }

  test("foreachBatch-style mergeBatch: newest seq wins") {
    val base = Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("key", "seq", "value")
    val delta = Seq((1L, 2L, 11.0), (3L, 1L, 30.0)).toDF("key", "seq", "value")
    val merged = StreamIngest.mergeBatch(base, delta, "key", "seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(merged === Set((1L, 2L, 11.0), (2L, 1L, 20.0), (3L, 1L, 30.0)))
  }

  test("tombstone merge: deletes win by seq, updates land, rest untouched") {
    val out = graft.queries.VectorQueries.all("v_delete_merge")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val ids = out.map(_._1).toSet
    labels.keys.foreach { id =>
      if (id % 11 == 0) assert(!ids.contains(id), s"tombstoned $id survived")
      else assert(ids.contains(id), s"live id $id missing")
    }
    out.foreach { case (id, label, seq) =>
      if (id % 7 == 0) assert(label === labels(id) + 1000 && seq === 1L, s"$id")
      else assert(label === labels(id) && seq === 0L, s"$id")
    }
  }

  test("file-source readStream + foreachBatch merge reaches batch state") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val dir = "target/tmp-stream/in"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("target/tmp-stream"))
    Files.createDirectories(Paths.get(dir))
    // two delta files = two micro-batches of vector upserts
    Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("key", "seq", "value")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((1L, 2L, 11.0), (3L, 1L, 30.0)).toDF("key", "seq", "value")
      .coalesce(1).write.mode("append").parquet(dir)

    var state = Seq.empty[(Long, Long, Double)].toDF("key", "seq", "value")
    val q = spark.readStream
      .schema("key LONG, seq LONG, value DOUBLE")
      .option("maxFilesPerTrigger", "1") // one "immutable buffer" per flush
      .parquet(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        state = StreamIngest.mergeBatch(state, batch.toDF(), "key", "seq")
          .localCheckpoint(true)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", "target/tmp-stream/ckpt")
      .start()
    q.awaitTermination(60000)

    val got = state.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 2L, 11.0), (2L, 1L, 20.0), (3L, 1L, 30.0)))
  }

  test("backpressure: a flood of input files is throttled to bounded micro-batches") {
    // the engine.h:79-90 soft/hard write-limit analog: 12 waiting delta
    // files must NOT land in one giant batch — maxFilesPerTrigger=2 caps
    // every micro-batch, bounding flush memory no matter the backlog
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val dir = "target/tmp-stream-flood/in"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File("target/tmp-stream-flood"))
    Files.createDirectories(Paths.get(dir))
    (0 until 12).foreach { i =>
      Seq((i.toLong, 1L, i.toDouble)).toDF("key", "seq", "value")
        .coalesce(1).write.mode("append").parquet(dir)
    }

    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream
      .schema("key LONG, seq LONG, value DOUBLE")
      .option("maxFilesPerTrigger", "2")
      .parquet(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes.synchronized { batchSizes += batch.count() }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", "target/tmp-stream-flood/ckpt")
      .start()
    q.awaitTermination(120000)

    assert(batchSizes.sum === 12, s"all rows must arrive: $batchSizes")
    assert(batchSizes.nonEmpty && batchSizes.forall(_ <= 2),
      s"micro-batches must stay within the 2-file throttle: $batchSizes")
    assert(batchSizes.size >= 6, s"flood must spread over >= 6 batches: $batchSizes")
  }

  test("streaming file-source ingest of vector batches unions with base") {
    // batch-mode check of the union-view read path used for streamed
    // vector inserts: base ∪ delta with id dedup (engine.h hybrid search
    // over graph + buffers).
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding", lit(0L).as("seq"))
    val delta = base.filter($"vec_id" % 50 === 0)
      .select($"vec_id", $"embedding", lit(1L).as("seq"))
    val merged = StreamIngest.mergeBatch(base, delta, "vec_id", "seq")
    assert(merged.count() === base.count())
    assert(merged.filter($"seq" === 1L).count() === delta.count())
  }
}
