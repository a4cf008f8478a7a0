package graft

import org.apache.spark.sql.functions._

import graft.GraftVector._
import graft.operators.PqIndex

class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
  private lazy val q = e.filter($"vec_id" < 8)
    .select($"vec_id".as("query_id"), $"embedding".as("qv"))

  test("build compresses to numSub codes per vector with bounded code ids") {
    val (books, codes) = PqIndex.build(e, "vec_id", "embedding", dim = 64,
      numSub = 8, codebookSize = 16)
    assert(books.count() === 8 * 16)
    assert(codes.count() === e.count())
    val bad = codes.filter(size($"codes") =!= 8 ||
      exists($"codes", c => c < 0 || c >= 16)).count()
    assert(bad === 0)
  }

  test("ADC search ranks the true nearest neighbors near the top") {
    val (books, codes) = PqIndex.build(e, "vec_id", "embedding", dim = 64,
      numSub = 8, codebookSize = 16)
    // generous candidate list vs exact top-10: quantized distances on
    // uniform-random vectors are noisy, but recall@(10→50) must beat the
    // random baseline (50/500 = 0.1) by a wide margin
    val approx = PqIndex.search(books, codes, q, "vec_id", dim = 64,
        numSub = 8, k = 50)
      .groupBy($"query_id").agg(collect_list($"neighbor_id").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val gt = e.crossJoin(broadcast(q))
      .groupBy($"query_id")
      .agg(topK(l2Sq($"embedding", $"qv"), $"vec_id", 10).as("nn"))
      .select($"query_id", transform($"nn", x => x.getField("id")).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val recall = gt.map { case (qid, ids) =>
      (approx.getOrElse(qid, Set.empty) & ids.toSet).size.toDouble / ids.size
    }.sum / gt.size
    assert(recall >= 0.4, s"PQ recall@(10 in 50) $recall < 0.4")
  }

  test("index persists to parquet and searches identically after reload") {
    val (books, codes) = PqIndex.build(e, "vec_id", "embedding", dim = 64,
      numSub = 8, codebookSize = 16)
    val dir = "target/tmp-pq"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    books.write.parquet(s"$dir/books")
    codes.write.parquet(s"$dir/codes")
    val booksBack = spark.read.parquet(s"$dir/books")
    val codesBack = spark.read.parquet(s"$dir/codes")
    def run(b: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      PqIndex.search(b, c, q, "vec_id", dim = 64, numSub = 8, k = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(booksBack, codesBack) === run(books, codes))
  }

  test("refined search: exact distances, and recall beats raw ADC") {
    val (books, codes) = PqIndex.build(e, "vec_id", "embedding", dim = 64,
      numSub = 8, codebookSize = 16)
    val gt = e.crossJoin(broadcast(q))
      .groupBy($"query_id")
      .agg(topK(l2Sq($"embedding", $"qv"), $"vec_id", 10).as("nn"))
      .select($"query_id", posexplode($"nn"))
      .select($"query_id", $"col.id".as("neighbor_id"),
        round(sqrt($"col.score"), 4).as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val refined = PqIndex.searchRefined(books, codes, e, "vec_id",
        "embedding", q, k = 10, refineFactor = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // every reported distance must be the EXACT brute-force distance
    refined.foreach { case (key, dist) =>
      gt.get(key).foreach(exact => assert(dist === exact,
        s"refined dist for $key is $dist, exact is $exact"))
    }
    // and refinement must not lose recall vs raw ADC@10
    val raw = PqIndex.search(books, codes, q, "vec_id", dim = 64,
        numSub = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(res: Set[(Long, Long)]) =
      (res & gt.keySet).size.toDouble / gt.size
    assert(recall(refined.keySet) >= recall(raw),
      s"refined recall ${recall(refined.keySet)} < raw ${recall(raw)}")
    // self is its own nearest neighbor at exact distance 0
    val selfTop = PqIndex.searchRefined(books, codes, e, "vec_id",
        "embedding", q, k = 1, refineFactor = 4)
      .filter($"query_id" === $"neighbor_id" && $"rnk" === 1)
    assert(selfTop.count() === 8)
  }

  test("a vector's own quantized distance is smallest-ish: self in top-5") {
    val (books, codes) = PqIndex.build(e, "vec_id", "embedding", dim = 64,
      numSub = 8, codebookSize = 16)
    val res = PqIndex.search(books, codes, q, "vec_id", dim = 64,
        numSub = 8, k = 5)
      .filter($"query_id" === $"neighbor_id")
    assert(res.count() >= 6, "self should usually be within PQ top-5")
  }
}
