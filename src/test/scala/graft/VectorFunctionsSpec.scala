package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.GraftVector._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def df2(a: Seq[Float], b: Seq[Float]) =
    Seq((a, b)).toDF("a", "b")

  test("l2 / l2Sq match scalar math") {
    val a = Seq(1f, 2f, 3f); val b = Seq(4f, 6f, 3f)
    val r = df2(a, b).select(
      l2($"a", $"b").as("l2"), l2Sq($"a", $"b").as("sq")).head()
    assert(r.getDouble(1) === 9.0 + 16.0)
    assert(math.abs(r.getDouble(0) - math.sqrt(25.0)) < 1e-12)
  }

  test("dot, cosine, norm") {
    val a = Seq(1f, 0f, 2f); val b = Seq(3f, 4f, 0f)
    val r = df2(a, b).select(
      dot($"a", $"b").as("d"), cosine($"a", $"b").as("c"),
      norm($"a").as("na")).head()
    assert(r.getDouble(0) === 3.0)
    val expC = 3.0 / (math.sqrt(5.0) * 5.0)
    assert(math.abs(r.getDouble(1) - expC) < 1e-12)
    assert(math.abs(r.getDouble(2) - math.sqrt(5.0)) < 1e-12)
  }

  test("zero-norm cosine is 0.0, null input is null") {
    val r = df2(Seq(0f, 0f), Seq(1f, 1f)).select(cosine($"a", $"b")).head()
    assert(r.getDouble(0) === 0.0)
    val withNull = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    assert(withNull.select(l2($"a", $"b")).head().isNullAt(0))
  }

  test("interpreted eval matches codegen on real embeddings") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50).cache()
    val pairs = e.select($"vec_id", $"embedding".as("va"))
      .join(e.select(($"vec_id" - 1).as("vec_id"), $"embedding".as("vb")), "vec_id")
    val viaExpr = pairs.select(l2($"va", $"vb").as("d")).collect().map(_.getDouble(0))
    // independent recomputation on collected rows
    val raw = pairs.select($"va", $"vb").collect().map { r =>
      val x = r.getSeq[Float](0); val y = r.getSeq[Float](1)
      math.sqrt(x.zip(y).map { case (p, q) =>
        val d = p.toDouble - q.toDouble; d * d }.sum)
    }
    viaExpr.zip(raw).foreach { case (g, e0) => assert(math.abs(g - e0) < 1e-9) }
  }

  test("SQL registration works") {
    GraftVector.register(spark)
    df2(Seq(1f, 2f), Seq(1f, 4f)).createOrReplaceTempView("t_vec")
    val r = spark.sql("SELECT graft_l2sq(a, b) AS d FROM t_vec").head()
    assert(r.getDouble(0) === 4.0)
  }
}
