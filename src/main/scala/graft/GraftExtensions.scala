package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point: registers every graft SQL function
  * so the library plugs into any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), mirroring how the reference
  * exposes its engine behind a service interface
  * (/root/reference/proto/vector_search.proto) — here the "service
  * surface" is SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  // SQL integer literals arrive as INT or BIGINT depending on how the
  // caller writes them (42 vs CAST(42 AS BIGINT)); accept every integral
  // spelling but stay LOUD on anything lossy — a BIGINT that overflows
  // Int must not silently truncate (4294967297 -> k=1), and a fractional
  // literal must not silently floor.
  private def integralArg(e: Expression): Long = e.eval() match {
    case i: java.lang.Integer => i.longValue
    case l: java.lang.Long => l.longValue
    case s: java.lang.Short => s.longValue
    case b: java.lang.Byte => b.longValue
    case other => throw new IllegalArgumentException(
      s"expected an integral literal, got $other (${if (other == null) "null" else other.getClass.getSimpleName})")
  }
  private def intArg(e: Expression): Int = Math.toIntExact(integralArg(e))
  private def longArg(e: Expression): Long = integralArg(e)

  /** A foldable numeric-array literal (e.g. `array(0.1D, ...)`). */
  private def doubleArrayArg(e: Expression): Seq[Double] = {
    require(e.foldable, s"expected a literal array, got non-foldable $e")
    val ad = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    e.dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, _) =>
        ad.toDoubleArray().toSeq
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) =>
        ad.toFloatArray().map(_.toDouble).toSeq
      case other => throw new IllegalArgumentException(
        s"expected array<double>/array<float> literal, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.SqrtEliminationRule)

    def reg(name: String, usage: String)(b: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), b))

    reg("graft_l2", "graft_l2(a, b) - Euclidean distance between float vectors") {
      es => L2Distance(es(0), es(1)) }
    reg("graft_l2sq", "graft_l2sq(a, b) - squared L2 distance") {
      es => L2SqDistance(es(0), es(1)) }
    reg("graft_dot", "graft_dot(a, b) - inner product") {
      es => DotProduct(es(0), es(1)) }
    reg("graft_cosine", "graft_cosine(a, b) - cosine similarity") {
      es => CosineSimilarity(es(0), es(1)) }
    reg("graft_norm", "graft_norm(a) - L2 norm") {
      es => VectorNorm(es(0)) }
    reg("graft_simhash", "graft_simhash(tokens) - 64-bit simhash") {
      es => SimHash64(es(0)) }
    reg("graft_simhash_votes",
        "graft_simhash_votes(tokens) - pre-sign simhash vote accumulator") {
      es => SimHashVotes(es(0)) }
    reg("graft_fingerprint", "graft_fingerprint(text) - FNV-1a 64 fingerprint") {
      es => RollingHash64(es(0)) }
    reg("graft_minhash", "graft_minhash(tokens, width, n) - minhash signature") {
      es => MinHashSignature(es(0), intArg(es(1)), intArg(es(2))) }
    reg("graft_minhash_bands", "graft_minhash_bands(tokens, width, n, bands) - LSH band keys") {
      es => MinHashBands(es(0), intArg(es(1)), intArg(es(2)), intArg(es(3))) }
    reg("graft_jaccard", "graft_jaccard(a, b) - Jaccard of sorted distinct string arrays") {
      es => JaccardSorted(es(0), es(1)) }
    reg("graft_char_ngrams", "graft_char_ngrams(text, n) - sorted distinct n-gram set") {
      es => CharNgramSet(es(0), intArg(es(1))) }
    reg("graft_char_ngrams_packed",
        "graft_char_ngrams_packed(text, n) - sorted distinct packed n-gram bigints (n <= 3)") {
      es => CharNgramLongSet(es(0), intArg(es(1))) }
    reg("graft_jaccard_long", "graft_jaccard_long(a, b) - Jaccard of sorted distinct bigint arrays") {
      es => JaccardSortedLong(es(0), es(1)) }
    reg("graft_lsh_bands",
        "graft_lsh_bands(vec, dim, nTables, bits, seed) - seeded sign-LSH table keys") {
      es => LshBands(es(0), intArg(es(1)), intArg(es(2)), intArg(es(3)),
        longArg(es(4))) }
    reg("graft_shingle_hashes",
        "graft_shingle_hashes(tokens, width) - FNV-1a hash per word shingle") {
      es => WordShingleHashes(es(0), intArg(es(1))) }
    reg("graft_winnow",
        "graft_winnow(text, k, w) - winnowing fingerprints (distinct " +
        "window minima of k-byte gram hashes)") {
      es => WinnowFingerprints(es(0), intArg(es(1)), intArg(es(2))) }
    reg("graft_sq8_adc",
        "graft_sq8_adc(codes, qv, mins, scales) - decoded-ADC squared distance " +
        "against a literal SQ8 grid") {
      es => Sq8AdcDistance(es(0), es(1),
        doubleArrayArg(es(2)), doubleArrayArg(es(3))) }
    reg("graft_random_project",
        "graft_random_project(vec, inDim, outDim, seed) - seeded ±1 JL " +
        "projection to outDim dims") {
      es => {
        val inDim = intArg(es(1)); val outDim = intArg(es(2))
        RandomProject(es(0),
          graft.operators.RpSearch.signs(outDim, inDim, longArg(es(3))), outDim)
      } }
    // aggregates
    reg("graft_topk", "graft_topk(score, id, k) - k smallest (score,id) pairs") {
      es => graft.operators.TopKByScore(es(0), es(1), intArg(es(2))) }
    reg("graft_vector_avg", "graft_vector_avg(vec) - element-wise mean") {
      es => graft.operators.VectorAvg(es(0)) }
    reg("graft_hll", "graft_hll(value) - mergeable HyperLogLog registers (p=8)") {
      es => graft.operators.HllRegisters(es(0)) }
    reg("graft_cms", "graft_cms(key) - mergeable count-min counters (4x256)") {
      es => graft.operators.CmsSketch(es(0)) }
    reg("graft_cms_estimate",
        "graft_cms_estimate(key, counters) - never-undercounting frequency estimate") {
      es => graft.operators.CmsEstimate(es(0), es(1)) }
    reg("graft_bloom", "graft_bloom(key) - mergeable Bloom bit words (header + 1024x64 bits, k=4)") {
      es => graft.operators.BloomFilterAgg(es(0)) }
    reg("graft_bloom_contains",
        "graft_bloom_contains(key, words) - no-false-negative membership probe (k from the header word)") {
      es => graft.operators.BloomMightContain(es(0), es(1)) }
  }
}
