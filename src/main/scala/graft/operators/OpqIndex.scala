package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OPQ-lite: Optimized Product Quantization's deterministic core —
  * the dimension-PERMUTATION variant (Ge et al., "Optimized Product
  * Quantization", CVPR 2013: their "natural order vs structured order"
  * finding — PQ quality depends heavily on HOW dimensions are grouped
  * into subspaces). Full OPQ learns an arbitrary rotation R by
  * alternating Procrustes solves; the permutation variant captures the
  * dominant failure mode (subspaces with wildly unequal energy: an
  * all-noise subspace wastes its entire codebook, an all-signal one is
  * starved at the same resolution) while staying exactly replicable in
  * portable SQL and costing ZERO extra flops at encode/search time — a
  * permutation is a scan-side column shuffle, where a dense rotation
  * would be a 64×64 mat-vec per row on every encode AND every query.
  *
  * Balance rule: rank dimensions by descending sample variance and deal
  * them round-robin into the numSub subspaces — subspace s receives
  * ranks s, s+numSub, s+2·numSub, … so each subspace holds a top-,
  * mid-, and low-variance mix. Variances come from the SAME bounded
  * vec_id-ordered driver sample the PQ codebooks train on (sequential
  * driver fold ⇒ bit-deterministic permutation, build after build).
  *
  * Reference anchor: hnsw_node.h keeps a raw `const float*` per node —
  * compression is the capability the reference lacks at 100 TB, and
  * this is its tuned form. The permutation is persisted beside the
  * codebooks (IndexStore.opq) and enters plans as a 64-int literal.
  */
object OpqIndex {

  /** Variance-balancing permutation: perm(p) = the source dimension
    * stored at permuted position p. Position p = s·subDim + j holds the
    * dimension of variance-rank j·numSub + s (rank-major round-robin
    * deal). Ties rank by dimension index, so the permutation is a pure
    * function of the sample. */
  def permutation(sample: Array[Array[Float]], dim: Int,
      numSub: Int): Array[Int] = {
    require(dim % numSub == 0, "numSub must divide dim")
    val subDim = dim / numSub
    val n = sample.length.toDouble
    val variances = (0 until dim).map { d =>
      var s = 0.0; var s2 = 0.0
      sample.foreach { v => val x = v(d).toDouble; s += x; s2 += x * x }
      s2 / n - (s / n) * (s / n)
    }
    val ranked = (0 until dim).sortBy(d => (-variances(d), d))
    Array.tabulate(dim) { p =>
      val s = p / subDim; val j = p % subDim
      ranked(j * numSub + s)
    }
  }

  /** Scan-side permutation of a vector column (numSub·subDim element_at
    * lookups against the literal permutation — stays in codegen). */
  def permuteCol(vec: Column, perm: Array[Int]): Column =
    transform(typedlit(perm.toSeq), p => element_at(vec, p + 1))

  /** Fit: sample → permutation → PqIndex.build on the PERMUTED frame —
    * OPQ is literally PQ after a column shuffle, so the entire
    * training/encoding pipeline is delegated (one definition: a
    * sampling or Lloyd fix in PqIndex reaches OPQ automatically; the
    * cost is one extra bounded sample collect for the permutation).
    * Returns (perm as a (pos, src_dim) frame, codebooks, codes). */
  def build(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, numSub: Int = 8, codebookSize: Int = 16,
      iters: Int = 10, sampleSize: Int = 10000)
      : (DataFrame, DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val sample = embeddings
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .orderBy("id").limit(sampleSize)
      .collect().map(_.getSeq[Float](1).toArray)
    val perm = permutation(sample, dim, numSub)
    val permDf = perm.zipWithIndex
      .map { case (src, pos) => (pos, src) }.toSeq
      .toDF("pos", "src_dim")
    val (codebooks, codes) = PqIndex.build(
      embeddings.select(col(idCol),
        permuteCol(col(vecCol), perm).as(vecCol)),
      idCol, vecCol, dim, numSub, codebookSize, iters, sampleSize)
    (permDf, codebooks, codes)
  }

  /** The persisted permutation as the int array plans embed. */
  def permArray(permDf: DataFrame): Array[Int] = {
    val rows = permDf.orderBy("pos").collect()
    rows.map(_.getInt(1))
  }

  /** ADC search in the permuted space + exact refine on the RAW
    * vectors: queries are permuted scan-side with the same literal
    * permutation the corpus was encoded under; exact L2 is
    * permutation-invariant, so the refine stage never touches the
    * permutation at all (PqIndex.refineExact, the shared contract). */
  def searchRefined(perm: Array[Int], codebooks: DataFrame,
      codes: DataFrame, embeddings: DataFrame, idCol: String,
      vecCol: String, queries: DataFrame, k: Int,
      refineFactor: Int = 4): DataFrame = {
    val (numSub, subDim) = PqIndex.bookGeometry(codebooks)
    val spark = codes.sparkSession
    import spark.implicits._
    val qPermuted = queries.select($"query_id",
      permuteCol($"qv", perm).as("qv"))
    val shortlist = PqIndex.search(codebooks, codes, qPermuted, idCol,
        numSub * subDim, numSub, k * refineFactor)
      .select($"query_id", $"neighbor_id")
    PqIndex.refineExact(shortlist, embeddings, idCol, vecCol, queries, k)
  }
}
