package graft

import org.apache.spark.sql.functions._

import graft.GraftVector._
import graft.operators.LshBuckets

class EmbedLshSpec extends SparkSpec {
  import spark.implicits._

  test("multi-table LSH finds planted near-dups and prunes random pairs") {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // plant near-duplicates: a deterministically perturbed copy of every
    // 10th vector (cos ≈ 0.999 to its original)
    val planted = base.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000).as("vec_id"),
        transform($"embedding", x => x * lit(1.01f) + lit(0.002f)).as("embedding"))
    val e = base.select($"vec_id", $"embedding").unionByName(planted).cache()

    val buckets = e.select($"vec_id",
        posexplode(LshBuckets.bucketBands($"embedding", 64)).as(Seq("t", "bk")))
      .select($"vec_id", $"bk")
    val cand = buckets.as("x").join(buckets.as("y"),
        $"x.bk" === $"y.bk" && $"x.vec_id" < $"y.vec_id")
      .select($"x.vec_id".as("va_id"), $"y.vec_id".as("vb_id"))
      .distinct()
      .cache()

    // every planted pair (v, v+100000) should collide in some table
    val truth = base.filter($"vec_id" % 10 === 0)
      .select($"vec_id").collect().map(_.getLong(0))
      .map(v => (v, v + 100000L)).toSet
    val candSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (candSet & truth).size.toDouble / truth.size
    assert(recall >= 0.95, s"planted near-dup recall $recall < 0.95")

    // and the candidate set must be a small fraction of all pairs
    val n = e.count()
    val frac = candSet.size.toDouble / (n * (n - 1) / 2)
    assert(frac < 0.15, s"LSH did not prune: candidate fraction $frac")
    cand.unpersist(); e.unpersist()
  }
}
