package graft

import org.apache.spark.sql.functions._

/** The scaling-probe data builder's invariants: the SCALE_sf1 artifact
  * is only evidence if the derived corpus is (a) exactly factor× the
  * source, (b) referentially intact across every shifted FK family, and
  * (c) content-DISTINCT across replicas — byte-identical replicas make
  * similarity operators' match cardinalities quadratic in the factor,
  * so the probe would measure duplicate blowup, not scaling.
  */
class ScaleDataSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("graft-scale-spec").toString
    ScaleData.run(spark, sfDir, d, 3)
    d
  }

  test("every table is exactly factor x the source; fixed dims stay fixed") {
    for (t <- Seq("embeddings", "documents", "events", "lineitem",
        "orders", "customer", "supplier", "part")) {
      val n0 = spark.read.parquet(s"$sfDir/$t.parquet").count()
      val n1 = spark.read.parquet(s"$dst/$t.parquet").count()
      assert(n1 === n0 * 3, s"$t: $n1 != 3 x $n0")
    }
    for (t <- Seq("region", "nation")) {
      assert(spark.read.parquet(s"$dst/$t.parquet").count() ===
        spark.read.parquet(s"$sfDir/$t.parquet").count(), s"$t must not grow")
    }
  }

  test("FK families shift in lockstep: no orphans, keys stay unique") {
    val li = spark.read.parquet(s"$dst/lineitem.parquet")
    val ord = spark.read.parquet(s"$dst/orders.parquet")
    val cust = spark.read.parquet(s"$dst/customer.parquet")
    assert(li.join(ord, $"l_orderkey" === $"o_orderkey", "left_anti")
      .count() === 0, "orphan lineitem rows")
    assert(ord.join(cust, $"o_custkey" === $"c_custkey", "left_anti")
      .count() === 0, "orphan order rows")
    for ((t, k) <- Seq(("embeddings", "vec_id"), ("documents", "doc_id"),
        ("orders", "o_orderkey"), ("customer", "c_custkey"))) {
      val df = spark.read.parquet(s"$dst/$t.parquet")
      assert(df.count() === df.select(k).distinct().count(),
        s"$t.$k not unique after shifting")
    }
  }

  test("replica content is distinct: no cross-replica exact-dup blowup") {
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    val srcDupTexts = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy($"text").count().filter($"count" > 1).count()
    // duplicate texts in the scaled corpus come only from duplicates the
    // SOURCE already had (x3), never from replication itself
    val dupTexts = docs.groupBy($"text").count().filter($"count" > 1).count()
    assert(dupTexts === srcDupTexts * 3,
      s"replication minted $dupTexts duplicate texts (source had $srcDupTexts)")
    val e = spark.read.parquet(s"$dst/embeddings.parquet")
    assert(e.groupBy($"embedding").count().filter($"count" > 1).count() === 0,
      "replication minted exact-duplicate embeddings")
    // rotation preserves the norm (it must not distort the distribution)
    val src = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(round(GraftVector.norm($"embedding"), 4).as("nm"))
    val rep = e.select(round(GraftVector.norm($"embedding"), 4).as("nm"))
    assert(rep.distinct().join(src.distinct(),
        rep("nm") === src("nm"), "left_anti").count() === 0,
      "rotation changed some embedding norm")
  }
}
