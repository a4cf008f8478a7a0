package graft

import org.apache.spark.sql.functions._

import graft.operators.{OpqIndex, PqIndex}

/** OPQ-lite — the variance-balancing dimension permutation ahead of PQ.
  * The search path is oracle-gated (v_opq_search); these specs pin the
  * permutation's defining properties and the reason it exists: on
  * variance-skewed data, balanced subspaces quantize strictly better
  * than natural-order subspaces at the SAME byte budget. */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  test("permutation is a bijection of the dimensions and deterministic") {
    // per-dim SCALE varies (d+1), so every dimension has a distinct
    // variance and the ranking path is load-bearing — a constant
    // per-dim offset would leave all variances equal and test only the
    // tie-break
    val sample = Array.tabulate(200, 16) { (i, d) => ((i % 29) * (d + 1)).toFloat }
    val p1 = OpqIndex.permutation(sample, dim = 16, numSub = 4)
    val p2 = OpqIndex.permutation(sample, dim = 16, numSub = 4)
    assert(p1.toSeq === p2.toSeq)
    assert(p1.sorted.toSeq === (0 until 16))
    // variance grows with d, so rank order is d descending: position 0
    // (subspace 0, slot 0) must hold the highest-variance dimension
    assert(p1(0) === 15)
  }

  test("round-robin deal balances subspace variance vs natural order") {
    // dims 0..3 carry ~25x the variance of dims 4..15: natural-order
    // grouping puts every hot dim in subspace 0
    val rnd = new scala.util.Random(42)
    val sample = Array.fill(500)(Array.tabulate(16) { d =>
      (if (d < 4) rnd.nextGaussian() * 5.0 else rnd.nextGaussian() * 1.0).toFloat
    })
    val perm = OpqIndex.permutation(sample, dim = 16, numSub = 4)
    def subVar(group: Int => Int): Seq[Double] = {
      val n = sample.length.toDouble
      val v = (0 until 16).map { d =>
        var s = 0.0; var s2 = 0.0
        sample.foreach { r => val x = r(d).toDouble; s += x; s2 += x * x }
        s2 / n - (s / n) * (s / n)
      }
      (0 until 4).map(sub => (0 until 16).filter(p => group(p) == sub)
        .map(v).sum)
    }
    val natural = subVar(d => d / 4)
    val balanced = subVar(p => perm.indexOf(p) / 4)
    assert(balanced.max / balanced.min < natural.max / natural.min,
      s"balance did not improve: natural=$natural opq=$balanced")
    // the deal puts exactly one hot dim (0..3) in each subspace
    (0 until 4).foreach { sub =>
      val dims = (sub * 4 until sub * 4 + 4).map(perm)
      assert(dims.count(_ < 4) === 1, s"subspace $sub got dims $dims")
    }
  }

  test("on variance-skewed data OPQ reconstructs strictly better than natural-order PQ") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 400L).map { i =>
      (i, Seq.tabulate(16) { d =>
        (if (d < 4) rnd.nextGaussian() * 5.0 else rnd.nextGaussian() * 0.5).toFloat
      })
    }
    val e = rows.toDF("vec_id", "embedding")
    def mse(books: org.apache.spark.sql.DataFrame,
        codes: org.apache.spark.sql.DataFrame,
        toCoded: org.apache.spark.sql.Column): Double = {
      // decode: per subspace, the selected centroid; error vs the CODED
      // representation of the vector (permuted for OPQ, raw for PQ)
      val decoded = codes.select($"vec_id", posexplode($"codes").as(Seq("sub", "code")))
        .join(broadcast(books), Seq("sub", "code"))
        .groupBy($"vec_id")
        .agg(flatten(transform(array_sort(collect_list(struct($"sub", $"centroid"))),
          x => x.getField("centroid"))).as("dec"))
      e.select($"vec_id", toCoded.as("cv"))
        .join(decoded, "vec_id")
        .select(GraftVector.l2Sq($"cv", $"dec").as("err"))
        .agg(avg($"err")).head().getDouble(0)
    }
    val (pqBooks, pqCodes) = PqIndex.build(e, "vec_id", "embedding",
      dim = 16, numSub = 4, codebookSize = 8, sampleSize = 400)
    val (permDf, opqBooks, opqCodes) = OpqIndex.build(e, "vec_id", "embedding",
      dim = 16, numSub = 4, codebookSize = 8, sampleSize = 400)
    val perm = OpqIndex.permArray(permDf)
    val pqMse = mse(pqBooks, pqCodes, $"embedding")
    val opqMse = mse(opqBooks, opqCodes,
      OpqIndex.permuteCol($"embedding", perm))
    // permutation preserves total energy, so the MSEs are directly
    // comparable; balanced subspaces must win on this skew
    assert(opqMse < pqMse,
      s"OPQ mse $opqMse not below natural-order PQ mse $pqMse")
  }
}
