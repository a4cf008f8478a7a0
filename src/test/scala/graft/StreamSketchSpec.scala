package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.GraftSketch._

/** The sketch aggregates are mergeable by construction (elementwise
  * max/sum), which is exactly what incremental streaming aggregation
  * needs: registers accumulated across micro-batches must equal the
  * batch sketch of the union — no decay, no order sensitivity. This is
  * the streaming face of the same write-path story as StreamIngest
  * (micro-batches fold into persistent state, engine.h's buffer→index
  * merge). */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming HLL over micro-batches equals the batch sketch of the union") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val query = stream.toDS().toDF("g", "v")
      .groupBy($"g").agg(hllRegisters($"v").as("r"))
      .writeStream.format("memory").queryName("hll_state")
      .outputMode(OutputMode.Complete()).start()

    val batch1 = (0L until 400L).map(v => (v % 2, v))
    val batch2 = (300L until 900L).map(v => (v % 2, v)) // overlaps batch1
    stream.addData(batch1)
    query.processAllAvailable()
    stream.addData(batch2)
    query.processAllAvailable()

    val streamed = spark.table("hll_state")
      .select($"g", hllEstimate($"r").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    query.stop()

    val batch = (batch1 ++ batch2).toDF("g", "v")
      .groupBy($"g").agg(hllRegisters($"v").as("r"))
      .select($"g", hllEstimate($"r").as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
  }

  test("streaming bounded top-k state equals the batch heap of the union") {
    // the top-k partial-agg law, streamed: k rows of state per group
    // survive micro-batch merges exactly as map-side combines do
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Double, Long)]
    val query = stream.toDS().toDF("g", "score", "id")
      .groupBy($"g").agg(GraftVector.topK($"score", $"id", 5).as("nn"))
      .writeStream.format("memory").queryName("topk_state")
      .outputMode(OutputMode.Complete()).start()
    val batch1 = (0L until 300L).map(v => (v % 3, (v * 37 % 101).toDouble, v))
    val batch2 = (300L until 700L).map(v => (v % 3, (v * 37 % 101).toDouble, v))
    stream.addData(batch1); query.processAllAvailable()
    stream.addData(batch2); query.processAllAvailable()
    def render(df: org.apache.spark.sql.DataFrame) =
      df.select($"g", $"nn").collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getDouble(0), x.getLong(1)))).toMap
    val streamed = render(spark.table("topk_state"))
    query.stop()
    val batch = render((batch1 ++ batch2).toDF("g", "score", "id")
      .groupBy($"g").agg(GraftVector.topK($"score", $"id", 5).as("nn")))
    assert(streamed === batch)
  }

  test("streaming CMS counters equal the batch counters of the union") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val query = stream.toDS().toDF("k")
      .agg(cmsSketch($"k", 4, 64).as("r"))
      .writeStream.format("memory").queryName("cms_state")
      .outputMode(OutputMode.Complete()).start()

    val b1 = (0 until 500).map(i => s"k${i % 37}")
    val b2 = (0 until 700).map(i => s"k${i % 53}")
    stream.addData(b1)
    query.processAllAvailable()
    stream.addData(b2)
    query.processAllAvailable()

    val streamed = spark.table("cms_state").head().getSeq[Long](0)
    query.stop()
    val batch = (b1 ++ b2).toDF("k")
      .agg(cmsSketch($"k", 4, 64).as("r")).head().getSeq[Long](0)
    assert(streamed === batch)
  }

  test("streaming Bloom words equal the batch filter of the union") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Long]
    val query = stream.toDS().toDF("k")
      .agg(bloomFilter($"k").as("bf"))
      .writeStream.format("memory").queryName("bloom_state")
      .outputMode(OutputMode.Complete()).start()

    val b1 = (0L until 600L)
    val b2 = (400L until 1200L) // overlaps b1: OR-merge is idempotent
    stream.addData(b1)
    query.processAllAvailable()
    stream.addData(b2)
    query.processAllAvailable()

    val streamed = spark.table("bloom_state").head().getSeq[Long](0)
    query.stop()
    val batch = (b1 ++ b2).toDF("k")
      .agg(bloomFilter($"k").as("bf")).head().getSeq[Long](0)
    assert(streamed === batch)
  }
}
