package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Shims
import graft.functions._

/** Column API over graft's native text-hashing expressions. */
object GraftText {
  /** THE whitespace tokenizer of the text stage — every operator and
    * every DuckDB oracle (`regexp_split_to_array(trim(text), '\s+')`)
    * assume exactly this split; one definition so engine/oracle
    * agreement can't drift per-operator. */
  def whitespaceTokens(text: Column): Column =
    org.apache.spark.sql.functions.split(
      org.apache.spark.sql.functions.trim(text), "\\s+")

  def minhashSignature(tokens: Column, shingleWidth: Int = 3,
      numHashes: Int = 64): Column =
    Shims.column(MinHashSignature(Shims.expression(tokens), shingleWidth, numHashes))

  def minhashBands(tokens: Column, shingleWidth: Int = 3,
      numHashes: Int = 64, numBands: Int = 16): Column =
    Shims.column(MinHashBands(Shims.expression(tokens), shingleWidth, numHashes, numBands))

  def simhash64(tokens: Column): Column =
    Shims.column(SimHash64(Shims.expression(tokens)))

  /** Pre-sign SimHash vote accumulator (array<int>, 64 dims). */
  def simhashVotes(tokens: Column): Column =
    Shims.column(SimHashVotes(Shims.expression(tokens)))

  def rollingHash64(text: Column): Column =
    Shims.column(RollingHash64(Shims.expression(text)))

  /** One-pass entropy ingredients of a SORTED token array (see
    * [[graft.functions.EntropyStats]]). */
  def entropyStats(sortedTokens: Column): Column =
    Shims.column(EntropyStats(Shims.expression(sortedTokens)))

  /** Jaccard of two SORTED distinct string arrays (merge scan). */
  def jaccardSorted(a: Column, b: Column): Column =
    Shims.column(JaccardSorted(Shims.expression(a), Shims.expression(b)))

  /** Sorted distinct n-character-gram set of a string (one pass). */
  def charNgramSet(text: Column, n: Int): Column =
    Shims.column(CharNgramSet(Shims.expression(text), n))

  /** Sorted distinct PACKED n-gram set (array<long>, injective; n <= 3). */
  def charNgramLongSet(text: Column, n: Int): Column =
    Shims.column(CharNgramLongSet(Shims.expression(text), n))

  /** Jaccard of two sorted distinct bigint arrays (merge scan). */
  def jaccardSortedLong(a: Column, b: Column): Column =
    Shims.column(JaccardSortedLong(Shims.expression(a), Shims.expression(b)))

  /** First position where two equal-length bigint arrays agree, or -1
    * (the LSH band-ownership primitive; see FirstEqIndex). */
  def firstEqIndex(a: Column, b: Column): Column =
    Shims.column(FirstEqIndex(Shims.expression(a), Shims.expression(b)))

  /** FNV-1a hash per width-word shingle, one pass (array<long>). */
  def wordShingleHashes(tokens: Column, width: Int): Column =
    Shims.column(WordShingleHashes(Shims.expression(tokens), width))

  /** Winnowing fingerprints: sorted distinct w-window minima of k-byte
    * gram FNV hashes (array<long>), one pass. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    Shims.column(WinnowFingerprints(Shims.expression(text), k, w))

  /** Per-pigeonhole-partition content hashes of a bigint set, one pass
    * (array<long> of length np; see PartSumHashes). */
  def partSumHashes(ws: Column, np: Column): Column =
    Shims.column(PartSumHashes(Shims.expression(ws), Shims.expression(np)))
}
