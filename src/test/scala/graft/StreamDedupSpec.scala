package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamDedup
import graft.streaming.StreamDedup.Doc

/** Streaming exact dedup must agree with the batch keep-min rule when
  * the stream arrives in doc_id order, drop later-batch duplicates via
  * retained state, and emit each fingerprint exactly once — ever. */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches(batches: Seq[Seq[Doc]]): Seq[Doc] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Doc]
    val query = StreamDedup.firstPerFingerprint(stream.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    batches.foreach { b => stream.addData(b); query.processAllAvailable() }
    val out = spark.table("dedup_out").as[Doc].collect().toSeq
    query.stop()
    spark.sql("DROP TABLE IF EXISTS dedup_out")
    out
  }

  test("doc_id-ordered stream reaches exactly the batch min-per-fingerprint") {
    val docs = Seq(
      Doc(1, 100), Doc(2, 200), Doc(3, 100), // dup of 1 in same batch
      Doc(4, 300), Doc(5, 200), // dup of 2 across batches
      Doc(6, 100), Doc(7, 400))
    val out = runBatches(docs.grouped(3).toSeq)
    val batchExpected = docs.groupBy(_.fp).values.map(_.minBy(_.doc_id)).toSet
    assert(out.toSet === batchExpected)
    assert(out.map(_.fp).distinct.size === out.size, "fingerprint emitted twice")
  }

  test("the gated batch entry equals the streamed state on real documents") {
    val dir = java.nio.file.Files.createTempDirectory("sdd").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").limit(40).cache()
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val arrival = docs
      .select($"doc_id", GraftText.rollingHash64($"text").as("fp"))
      .as[Doc].collect().toSeq.sortBy(_.doc_id)
    val streamed = runBatches(arrival.grouped(7).toSeq)
      .map(d => (d.doc_id, d.fp)).toSet
    val gated = queries.PipelineQueries.all("s_stream_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gated === streamed)
  }

  test("a duplicate arriving many batches later is still dropped") {
    val out = runBatches(Seq(
      Seq(Doc(1, 7)), Seq(Doc(10, 8)), Seq(Doc(20, 9)), Seq(Doc(30, 7))))
    assert(out.toSet === Set(Doc(1, 7), Doc(10, 8), Doc(20, 9)))
  }
}
