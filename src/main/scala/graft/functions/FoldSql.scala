package graft.functions

/** The DuckDB-side twin of the native kernels' LANE-4 FOLD CONTRACT
  * (VectorExpressions.scala header: element i accumulates into lane
  * i mod 4, each lane a sequential left fold from 0.0 in ascending i,
  * lanes combine as (l0 + l1) + (l2 + l3)).
  *
  * Every oracle that replays a kernel-computed distance decision for
  * decision (the l2sqLit/l2sqCol/dotSelfSql family in IndexOracle, the
  * MaxSim dot folds, the multimodal feature-kNN folds) renders its
  * per-element term through [[lane4]] so Spark and DuckDB keep
  * producing bit-identical doubles under the faster fold law. Folds
  * that mirror plan-side zip_with/aggregate HOF chains (pca, centroid
  * drift, hard negatives, quantize error) are a SEPARATE sequential
  * contract and must NOT use this.
  */
object FoldSql {

  /** `term` is a DuckDB scalar expression over the 1-based loop
    * variable `i`; the fold covers i = 1..dim with lane j taking the
    * i ≡ j+1 (mod 4) stride. Lanes short of elements (dim < 4 or a
    * ragged tail) fold to 0.0 — exactly the kernels' untouched
    * accumulators, and x + 0.0 is the same no-op in both engines
    * because every lane sum here is a fold seeded from +0.0. */
  def lane4(term: String, dim: Int): String = {
    def lane(j: Int) =
      s"list_reduce(list_prepend(0.0, [$term for i in range(${1 + j}, ${dim + 1}, 4)]), (acc_, el_) -> acc_ + el_)"
    s"((${lane(0)} + ${lane(1)}) + (${lane(2)} + ${lane(3)}))"
  }
}
