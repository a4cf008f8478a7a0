package graft

import java.nio.file.Files

import graft.queries.VectorQueries

/** Properties of the power-iteration principal component: it finds a
  * planted dominant axis, returns a unit vector, and — the property the
  * two-level ordered fold exists for — is byte-identical under any
  * physical partitioning of the input. */
class PcaPowerSpec extends SparkSpec {
  import spark.implicits._

  private def planted(dir: String, nFiles: Int): Unit = {
    // 300 vectors: strong component along axis 5, small deterministic
    // off-axis wobble — the dominant eigenvector is unmistakably e5
    val rows = (0 until 300).map { i =>
      val v = Array.fill(64)(0.0f)
      v(5) = (3.0 + 0.01 * (i % 7)).toFloat * (if (i % 2 == 0) 1 else -1)
      v((i * 13) % 64) += 0.05f * ((i % 5) - 2)
      (i.toLong, v.toSeq, i % 4)
    }
    rows.toDF("vec_id", "embedding", "label")
      .repartition(nFiles)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("v_pca_power: planted dominant axis is recovered as a unit vector") {
    val dir = Files.createTempDirectory("graft_pca").toString
    planted(dir, 3)
    val pc = VectorQueries.all("v_pca_power")(spark, dir)
      .collect().map(_.getDouble(1))
    assert(pc.length === 64)
    assert(math.abs(pc(5)) > 0.95, s"axis 5 must dominate, got ${pc(5)}")
    val norm = math.sqrt(pc.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"unit vector expected, norm $norm")
  }

  test("v_pca_remove: removing the dominant component collapses on-axis mass") {
    val dir = Files.createTempDirectory("graft_pcar").toString
    planted(dir, 2)
    val rows = VectorQueries.all("v_pca_remove")(spark, dir)
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    // on-axis vectors have |proj| ≈ their norm (≈3) and tiny residual
    val meanAbsProj = rows.map(p => math.abs(p._1)).sum / rows.length
    val meanResid = rows.map(_._2).sum / rows.length
    assert(meanAbsProj > 2.5, s"projection must carry the axis mass: $meanAbsProj")
    assert(meanResid < 0.2, s"residual must be the off-axis wobble only: $meanResid")
  }

  test("v_pca_power: byte-identical under different physical partitionings") {
    val d1 = Files.createTempDirectory("graft_pca1").toString
    val d2 = Files.createTempDirectory("graft_pca2").toString
    planted(d1, 1)
    planted(d2, 7)
    def run(d: String) = VectorQueries.all("v_pca_power")(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(run(d1) === run(d2),
      "the two-level ordered fold must erase partition-layout effects")
  }
}
