package graft.functions

/** DuckDB-SQL replication of the native hashing expressions in
  * [[GraftHash]]/[[SimHash64]]/[[MinHashSignature]]/[[MinHashBands]], so
  * the seeded-hash dedup operators can be held to the full DuckDB hash
  * oracle instead of a rows-only row-count check. 64-bit wrapping
  * arithmetic is folded in HUGEINT modulo 2^64 (the t_fingerprint
  * technique); signed comparisons re-map through 2^63. The corpus is
  * ASCII, so `ord(char) == byte` — any non-ASCII text would break the
  * hash match itself, which is exactly the kind of drift the gate is
  * for.
  */
object HashSql {

  /** Rewrite every plain `name AS (` CTE definition in a DuckDB oracle
    * to `name AS MATERIALIZED (`. DuckDB RE-INLINES non-MATERIALIZED
    * CTEs at every reference, so an oracle whose unrolled rounds each
    * read a shared subtree (t_textrank's `ew`, the components family's
    * `edges`) re-derives that subtree once PER REFERENCE — measured at
    * sf0.01: t_textrank 159 s → 0.5 s, d_dedup_cluster 62 s → 6.6 s,
    * identical results (the hint is an evaluation-strategy note, never
    * semantics). Applied per oracle, only where profiled to win — a
    * handful of oracles (tiny CTEs, one-reference chains) run faster
    * inlined and keep the plain form. The pattern deliberately skips
    * CTEs with a column list (`reach(node, lab) AS (` — the recursive
    * members, which cannot be materialized) because the name there is
    * followed by `(`, not `AS`. */
  def materializeCtes(sql: String): String =
    sql.replaceAll(
      "\\b([A-Za-z_][A-Za-z0-9_]*)(\\s+AS\\s*)\\(", "$1$2MATERIALIZED (")

  private val Mod = "18446744073709551616::HUGEINT" // 2^64
  private val SignBit = "9223372036854775808::HUGEINT" // 2^63
  private val FnvOffset = "14695981039346656037::HUGEINT" // 0xcbf29ce484222325
  private val FnvPrime = "1099511628211::HUGEINT" // 0x100000001b3

  /** FNV-1a 64 of a string SQL expression, as HUGEINT in [0, 2^64).
    * Exactly GraftHash.fnv1a64(bytes, 0): fold h = ((h XOR byte) * prime)
    * mod 2^64 from the offset basis. */
  def fnvSql(strSql: String): String = fnvSeededSql(strSql, "0")

  /** FNV-1a 64 over the 8 little-endian bytes of a non-negative BIGINT
    * expression — GraftHash.fnv1a64OfLong, the packed-gram base hash. */
  def fnvLongSql(longSql: String): String = {
    val bytes = (0 until 8)
      .map(k => s"((($longSql)::UBIGINT >> ${8 * k}) & 255)::HUGEINT")
      .mkString("[", ", ", "]")
    s"list_reduce(list_prepend($FnvOffset, $bytes)," +
      s" (h, b) -> ((xor(h::UBIGINT, b::UBIGINT))::HUGEINT * $FnvPrime) % $Mod)"
  }

  /** FNV-1a 64 with a runtime seed: the offset basis is XORed with a
    * seed SQL expression (GraftHash.fnv1a64(bytes, seed)) — used by the
    * count-min oracle where the seed is the hash-row index column. */
  def fnvSeededSql(strSql: String, seedSql: String): String =
    s"""list_reduce(
       |    list_prepend(xor(($FnvOffset)::UBIGINT, ($seedSql)::UBIGINT)::HUGEINT,
       |      [ord(($strSql)[i]) for i in range(1, length($strSql)+1)]::HUGEINT[]),
       |    (h, b) -> ((xor(h::UBIGINT, b::UBIGINT))::HUGEINT * $FnvPrime) % $Mod)""".stripMargin

  /** The Knuth multiplicative avalanche step `pmod(id * 2654435761L, m)`
    * exactly as the engine computes it in Java long arithmetic — the
    * multiply wraps SILENTLY mod 2^64 to a signed long, then pmod takes
    * the non-negative residue. A naive BIGINT replication raises a
    * DuckDB overflow error once `id` exceeds ~3.5e9, diverging from the
    * engine (error vs wrapped result); this form routes through HUGEINT
    * (id < 2^63 × K < 2^32 never overflows INT128), reproduces the
    * 64-bit wrap, re-maps the signed view through 2^63, and reduces —
    * identical to the engine at ANY id magnitude. */
  def knuthSql(idSql: String, m: Long): String = {
    val w = s"((($idSql)::HUGEINT * 2654435761::HUGEINT) % $Mod)"
    val xs = s"($w - CASE WHEN $w >= $SignBit THEN $Mod ELSE 0::HUGEINT END)"
    s"((($xs % $m::HUGEINT) + $m::HUGEINT) % $m::HUGEINT)"
  }

  /** Murmur3 fmix64 over a HUGEINT-in-[0, 2^64) SQL expression —
    * exactly [[GraftHash.fmix64]]. Nested single-element list_transforms
    * serve as let bindings; the two multiplications use the 32-bit-split
    * trick so no partial product overflows INT128. */
  def fmixSql(hExpr: String): String = {
    def xs(e: String): String =
      s"xor(($e)::UBIGINT, ($e)::UBIGINT >> 33)::HUGEINT"
    def mul(e: String, c: Long): String = {
      val c0 = java.lang.Long.toUnsignedString(c & 0xffffffffL)
      val c1 = java.lang.Long.toUnsignedString(c >>> 32)
      s"($c0::HUGEINT * ($e) + (($c1::HUGEINT * ($e)) % 4294967296::HUGEINT)" +
        s" * 4294967296::HUGEINT) % $Mod"
    }
    s"list_transform([$hExpr], h1 -> " +
      s"list_transform([${mul(xs("h1"), 0xff51afd7ed558ccdL)}], h2 -> " +
      s"list_transform([${mul(xs("h2"), 0xc4ceb9fe1a85ec53L)}], h3 -> " +
      s"${xs("h3")})[1])[1])[1]"
  }

  /** CTE chain `toks/tok/th/dv`: per-document token stream joined to a
    * DISTINCT-token FNV-1a hash table (each unique token is hashed once
    * corpus-wide, not once per occurrence). `dv` has (doc_id, hu UBIGINT)
    * with one row per token OCCURRENCE — the multiset SimHash votes on. */
  def tokenHashCtes(table: String = "documents"): String =
    s"""toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
       |  FROM $table
       |),
       |tok AS (SELECT DISTINCT t FROM toks),
       |th AS (
       |  SELECT t, (${fnvSql("t")})::UBIGINT AS hu
       |  FROM tok
       |),
       |dv AS (SELECT toks.doc_id, th.hu FROM toks JOIN th ON toks.t = th.t)""".stripMargin

  /** Per-bit majority vote: fp bit b is set iff strictly more token
    * hashes have bit b set than clear — SimHash64's votes(b) > 0. */
  private def simhashFpExpr: String =
    (0 until 64).map { b =>
      s"CASE WHEN sum(CASE WHEN (hu >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN ${java.lang.Long.toUnsignedString(1L << b)}::UBIGINT ELSE 0::UBIGINT END"
    }.mkString("(", "\n     + ", ")")

  /** One minhash permutation as SQL over a token-hash list `hs`:
    * signed-64 min over tokens of a_i*h + b_i (mod 2^64), matching
    * MinHashSignature's Java-long wrap and SIGNED `<` comparison.
    * INT128 can't hold a full 64×64-bit product, so the multiplier is
    * split into 32-bit halves: a*h ≡ a0*h + ((a1*h) mod 2^32)·2^32 —
    * every partial product stays under 2^96. */
  private def permMinExpr(i: Int): String = {
    val a = GraftHash.mixA(i); val b = GraftHash.mixB(i)
    val a0 = java.lang.Long.toUnsignedString(a & 0xffffffffL)
    val a1 = java.lang.Long.toUnsignedString(a >>> 32)
    val bU = java.lang.Long.toUnsignedString(b)
    val perm = s"($a0::HUGEINT * h + (($a1::HUGEINT * h) % 4294967296::HUGEINT)" +
      s" * 4294967296::HUGEINT + $bU::HUGEINT) % $Mod"
    s"list_min(list_transform(list_transform(hs, h -> $perm)," +
      s" x -> CASE WHEN x >= $SignBit THEN x - $Mod ELSE x END))"
  }

  /** LSH band keys from the unsigned signature list `su`: band b FNV-folds
    * the 8 little-endian bytes of each of its rowsPerBand signature values,
    * seeded with offset_basis XOR band_id — byte-for-byte MinHashBands. */
  private def bandExpr(b: Int, rowsPerBand: Int): String = {
    val bytes = (0 until rowsPerBand).flatMap { r =>
      val idx = b * rowsPerBand + r + 1 // SQL lists are 1-indexed
      (0 until 8).map(k => s"((su[$idx]::UBIGINT >> ${8 * k}) & 255)::HUGEINT")
    }
    val h0 = java.lang.Long.toUnsignedString(0xcbf29ce484222325L ^ b.toLong)
    s"list_reduce(list_prepend($h0::HUGEINT, [${bytes.mkString(", ")}])," +
      s" (h, b) -> ((xor(h::UBIGINT, b::UBIGINT))::HUGEINT * $FnvPrime) % $Mod)"
  }

  /** Full oracle for the minhash keeper-assignment dedup operators
    * (d_dedup_minhash, d_ngram_jaccard): the entire seeded pipeline —
    * per-distinct-token FNV, 64 affine permutations with signed mins,
    * 16-band FNV folding, bucket rep election, candidate edges, exact
    * Jaccard verification, smallest-verified-keeper — replicated in SQL.
    * `wsDef` must be a SELECT producing (doc_id, ws) with ws the sorted
    * distinct token list exactly as the Spark plan builds it. */
  /** The seeded-minhash CTE prefix shared by the keeper and eval
    * oracles: (doc_id, ws) → per-token FNV → numHashes affine
    * permutations with signed mins → numBands FNV band folds →
    * `buckets(doc_id, band_id, bh)`. Byte-for-byte MinHashBands. */
  private def minhashBucketsCtes(wsDef: String, numHashes: Int,
      numBands: Int, tokenHashSql: String => String): String = {
    require(numHashes % numBands == 0)
    val sigExpr = (0 until numHashes).map(permMinExpr)
      .mkString("[", ",\n ", "]")
    val bandsExpr = (0 until numBands).map(bandExpr(_, numHashes / numBands))
      .mkString("[", ",\n ", "]")
    val bandIds = (0 until numBands).mkString("[", ",", "]")
    s"""d AS ($wsDef),
       |tok AS (SELECT DISTINCT unnest(ws) AS t FROM d),
       |th AS (SELECT t, (${tokenHashSql("t")})::HUGEINT AS hu FROM tok),
       |dh AS (
       |  SELECT u.doc_id, list(th.hu) AS hs
       |  FROM (SELECT doc_id, unnest(ws) AS t FROM d) u JOIN th ON u.t = th.t
       |  GROUP BY u.doc_id
       |),
       |sigs AS (SELECT doc_id, $sigExpr AS sig FROM dh),
       |su AS (SELECT doc_id, list_transform(sig,
       |  v -> CASE WHEN v < 0::HUGEINT THEN v + $Mod ELSE v END) AS su FROM sigs),
       |buckets AS (
       |  SELECT doc_id, unnest($bandIds) AS band_id, unnest($bandsExpr) AS bh FROM su
       |)""".stripMargin
  }

  /** The keeper-assignment CTE chain WITHOUT the leading WITH or final
    * SELECT: everything from `d AS (wsDef)` through
    * `keepassign(doc_id, keeper_id)` — embeddable inside a larger
    * composed oracle (p_curation_pipeline chains it between the filter
    * gate and the mixture stage). Relation names used: d, tok, th, dh,
    * sigs, su, buckets, reps, edges, verified, keepassign — composing
    * queries must avoid these. */
  def minhashKeeperCtes(wsDef: String, jaccardThreshold: Double,
      numHashes: Int = 64, numBands: Int = 16,
      tokenHashSql: String => String = fnvSql): String = {
    s"""${minhashBucketsCtes(wsDef, numHashes, numBands, tokenHashSql)},
       |reps AS (SELECT band_id, bh, min(doc_id) AS rep FROM buckets GROUP BY band_id, bh),
       |edges AS (
       |  SELECT DISTINCT b.doc_id, r.rep FROM buckets b
       |  JOIN reps r ON b.band_id = r.band_id AND b.bh = r.bh
       |  WHERE r.rep < b.doc_id
       |),
       |verified AS (
       |  SELECT e.doc_id, min(e.rep) AS keeper
       |  FROM edges e
       |  JOIN d da ON da.doc_id = e.doc_id
       |  JOIN d db ON db.doc_id = e.rep
       |  WHERE len(list_intersect(da.ws, db.ws))::DOUBLE
       |        / len(list_distinct(list_concat(da.ws, db.ws))) >= $jaccardThreshold
       |  GROUP BY e.doc_id
       |),
       |keepassign AS (
       |  SELECT d.doc_id AS doc_id, coalesce(v.keeper, d.doc_id) AS keeper_id
       |  FROM d LEFT JOIN verified v ON d.doc_id = v.doc_id
       |)""".stripMargin
  }

  /** The VERIFIED-EDGE CTE chain (DedupQueries.minhashVerifiedEdges
    * twin): intra-bucket candidate pairs (deduped across bands,
    * doc_a < doc_b) exact-verified at `jaccardThreshold`. Ends at
    * `edges(doc_a, doc_b, jaccard)` — embeddable under WITH RECURSIVE
    * for the component consumers. Relation names used: d, tok, th,
    * dh, sigs, su, buckets, cand, edges. */
  def minhashEdgesCtes(wsDef: String, jaccardThreshold: Double,
      numHashes: Int = 64, numBands: Int = 16,
      tokenHashSql: String => String = fnvSql): String = {
    s"""${minhashBucketsCtes(wsDef, numHashes, numBands, tokenHashSql)},
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM buckets x JOIN buckets y
       |    ON x.band_id = y.band_id AND x.bh = y.bh AND x.doc_id < y.doc_id
       |),
       |edges AS (
       |  SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM (
       |    SELECT c.doc_a, c.doc_b,
       |      len(list_intersect(da.ws, db.ws))::DOUBLE
       |        / len(list_distinct(list_concat(da.ws, db.ws))) AS j
       |    FROM cand c
       |    JOIN d da ON da.doc_id = c.doc_a
       |    JOIN d db ON db.doc_id = c.doc_b)
       |  WHERE j >= $jaccardThreshold
       |)""".stripMargin
  }

  def minhashKeeperOracle(wsDef: String, jaccardThreshold: Double,
      numHashes: Int = 64, numBands: Int = 16,
      tokenHashSql: String => String = fnvSql): String = {
    s"""WITH ${minhashKeeperCtes(wsDef, jaccardThreshold, numHashes, numBands, tokenHashSql)}
       |SELECT doc_id, keeper_id, keeper_id != doc_id AS is_dup
       |FROM keepassign
       |ORDER BY doc_id""".stripMargin
  }

  /** Full oracle for d_minhash_eval: candidate pairs = bucket-mates in
    * ANY band (the same seeded pipeline), truth = the UNFILTERED
    * quadratic j ≥ threshold pair set — so the hash match also proves,
    * against an independent derivation, that the engine's banded truth
    * side lost nothing. One summary row. */
  def minhashEvalOracle(wsDef: String, jaccardThreshold: Double,
      numHashes: Int = 64, numBands: Int = 16,
      tokenHashSql: String => String = fnvSql): String = {
    val jac = (a: String, b: String) =>
      s"len(list_intersect($a.ws, $b.ws))::DOUBLE" +
        s" / len(list_distinct(list_concat($a.ws, $b.ws)))"
    s"""WITH ${minhashBucketsCtes(wsDef, numHashes, numBands, tokenHashSql)},
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM buckets x JOIN buckets y
       |    ON x.band_id = y.band_id AND x.bh = y.bh AND x.doc_id < y.doc_id),
       |hits AS (
       |  SELECT count(*)::BIGINT AS n_hits FROM cand c
       |  JOIN d da ON da.doc_id = c.doc_a
       |  JOIN d db ON db.doc_id = c.doc_b
       |  WHERE ${jac("da", "db")} >= $jaccardThreshold),
       |truth AS (
       |  SELECT count(*)::BIGINT AS n_truth
       |  FROM d da JOIN d db ON da.doc_id < db.doc_id
       |  WHERE ${jac("da", "db")} >= $jaccardThreshold),
       |nc AS (SELECT count(*)::BIGINT AS n_candidates FROM cand)
       |SELECT n_truth, n_candidates, n_hits,
       |  CASE WHEN n_candidates > 0
       |       THEN round(n_hits::DOUBLE / n_candidates, 4) END AS precision_at_j,
       |  CASE WHEN n_truth > 0
       |       THEN round(n_hits::DOUBLE / n_truth, 4) END AS recall_at_j
       |FROM truth, nc, hits""".stripMargin
  }

  /** (doc_id, ws) definition for word-token minhash (d_dedup_minhash). */
  val wordSetDef: String =
    """SELECT doc_id, list_sort(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS ws FROM documents"""

  /** (doc_id, ws) definition for PACKED character-trigram minhash
    * (d_ngram_jaccard): each trigram packed into a BIGINT as
    * cp1·2^42 + cp2·2^21 + cp3 — CharNgramLongSet's injective encoding
    * (fields don't overlap, so addition == the bitwise OR). Docs with no
    * trigram identity (length < 3) are excluded, as in the plan. */
  val packedTrigramSetDef: String =
    "SELECT doc_id, ws FROM (SELECT doc_id, list_sort(list_distinct(" +
      "[ord(text[i])*4398046511104 + ord(text[i+1])*2097152 + ord(text[i+2]) " +
      "for i in range(1, greatest(length(text)-1, 1))])) AS ws " +
      "FROM documents) WHERE len(ws) > 0"

  /** t_doc_embed oracle: the SimHash vote accumulator per (doc, bit),
    * normalized by the doc's token-occurrence count — same token-hash
    * CTEs as the simhash oracle, per-bit ±1 sums in pure integers, ONE
    * exact IEEE division per cell, rounding only in the projection. */
  def docEmbedOracle(table: String = "documents"): String =
    s"""WITH ${tokenHashCtes(table)},
       |nv AS (SELECT doc_id, count(*)::BIGINT AS n FROM dv GROUP BY doc_id),
       |vb AS (
       |  SELECT doc_id, bb.dim,
       |    sum(CASE WHEN (hu >> bb.dim) & 1 = 1 THEN 1 ELSE -1 END)::BIGINT AS v
       |  FROM dv CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) bb
       |  GROUP BY doc_id, bb.dim)
       |SELECT vb.doc_id, vb.dim::BIGINT AS dim,
       |  round(vb.v::DOUBLE / nv.n, 4) AS value
       |FROM vb JOIN nv USING (doc_id) ORDER BY doc_id, dim""".stripMargin

  /** d_hard_negatives oracle: the t_doc_embed vectors re-derived (per-bit
    * vote sums / token count), other-source filter BEFORE ranking, exact
    * per-dim fold in index order — the same left fold as zip_with →
    * aggregate — rank on raw d² with doc_id tie-break. */
  def hardNegativesOracle(k: Int, numQueries: Int): String = {
    val votesArr = (0 until 64).map { b =>
      s"sum(CASE WHEN (hu >> $b) & 1 = 1 THEN 1 ELSE -1 END)"
    }.mkString("[", ",\n     ", "]")
    s"""WITH ${tokenHashCtes()},
       |hn AS (SELECT doc_id, count(*)::BIGINT AS n FROM dv GROUP BY doc_id),
       |hv AS (SELECT doc_id, $votesArr AS vs FROM dv GROUP BY doc_id),
       |he AS (
       |  SELECT v.doc_id, d.source,
       |    list_transform(v.vs, s -> s::DOUBLE / n.n) AS ev
       |  FROM hv v JOIN hn n ON n.doc_id = v.doc_id
       |  JOIN documents d ON d.doc_id = v.doc_id),
       |hq AS (SELECT doc_id AS query_id, source AS q_source, ev AS qv
       |  FROM he WHERE doc_id < $numQueries)
       |SELECT query_id, neighbor_id, rnk, dist FROM (
       |  SELECT query_id, doc_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dd, doc_id) AS rnk,
       |    round(sqrt(dd), 4) AS dist
       |  FROM (
       |    SELECT hq.query_id, he.doc_id,
       |      list_reduce(list_prepend(0.0,
       |        [ (he.ev[i] - hq.qv[i]) * (he.ev[i] - hq.qv[i])
       |          for i in range(1, 65) ]), (x, y) -> x + y) AS dd
       |    FROM he CROSS JOIN hq
       |    WHERE he.source <> hq.q_source)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** Full oracle for d_dedup_simhash: SimHash64 per document replicated
    * bit-for-bit, then ALL pairs within `maxHamming` — the straight
    * quadratic contract. The Spark plan answers it through 16-bit chunk
    * banding, so the hash match doubles as a direct proof of the
    * banding's completeness guarantee at the declared radius. */
  def simhashPairsOracle(maxHamming: Int, table: String = "documents"): String =
    s"""WITH ${tokenHashCtes(table)},
       |fp AS (SELECT doc_id, $simhashFpExpr AS fp_u FROM dv GROUP BY doc_id)
       |SELECT doc_a, doc_b, hamming FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    bit_count(xor(a.fp_u, b.fp_u))::BIGINT AS hamming
       |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |) WHERE hamming <= $maxHamming ORDER BY doc_a, doc_b""".stripMargin
}
