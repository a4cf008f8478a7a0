package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.GraftVector._
import graft.queries.IndexQueries

/** SemDeDup laws: the greedy min-id survivor rule, agreement with an
  * independent re-derivation, and the planted-duplicate contract. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("every cluster's min vec_id survives; flags equal a re-derived exists") {
    val out = IndexQueries.all("d_semantic_dedup")(spark, sfDir)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

    // greedy survivor law: the smallest id in each cluster has nothing
    // smaller to collide with
    rows.groupBy(_._2).values.foreach { cs =>
      val mn = cs.minBy(_._1)
      assert(!mn._3, s"cluster ${mn._2}: min id ${mn._1} flagged dup")
    }

    // independent re-derivation of the dup set from the same persisted
    // assignments (pair-join + aggregation instead of a semi-join)
    val dir = graft.operators.IndexStore.graphIvf(spark, sfDir)
    val a = spark.read.parquet(s"$dir/assignments")
      .select($"vec_id", $"embedding", $"cluster_id")
    val expected = a.as("x").join(a.as("y"), Seq("cluster_id"))
      .filter($"y.vec_id" < $"x.vec_id" &&
        cosine($"x.embedding", $"y.embedding") > IndexQueries.SemDedupTau)
      .select($"x.vec_id".as("v")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(rows.filter(_._3).map(_._1).toSet === expected)
    assert(rows.length === a.count())
  }

  test("planted identical pair: larger id flagged, survivor kept") {
    val dir = Files.createTempDirectory("graft_semdedup").toString
    // deterministic spread-out vectors; ids 7 and 23 identical
    def vec(i: Long): Seq[Float] =
      Seq.tabulate(64)(j => (((i * 31 + j * 17) % 101).toFloat / 101f) - 0.5f)
    (0L until 40L).map { i =>
      val v = if (i == 23L) vec(7L) else vec(i)
      (i, v, (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = IndexQueries.all("d_semantic_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(rows(23L), "identical larger id must be flagged dup")
    assert(!rows(7L), "identical smaller id must survive")
  }
}
