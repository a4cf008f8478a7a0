package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Shims

import graft.functions.{LshBands, LshMath}

/** Signed-random-projection LSH for embeddings — an ANN pre-filter
  * playing the role of the reference's graph traversal pruning
  * (/root/reference/include/hnsw_index.h:search_layer narrows candidates
  * structurally; LSH narrows them probabilistically, which distributes):
  * `nPlanes` Gaussian hyperplanes (seeded, regenerated identically
  * everywhere — no state to ship), bucket id = sign-bit vector of the
  * projections. Near vectors (cosine) collide with probability 1 - θ/π
  * per bit. This is the pre-filter that makes embedding near-dup joins
  * sub-quadratic at scale: shuffle on bucket id, compare only within
  * buckets.
  *
  * All hashing runs through the one-pass native [[graft.functions.LshBands]]
  * expression; plane generation lives in [[graft.functions.LshMath]] so the
  * Spark path and the DuckDB oracle SQL below share one seed → plane → key
  * derivation.
  */
object LshBuckets {

  def planes(dim: Int, nPlanes: Int, seed: Long = 42L): Seq[Seq[Float]] =
    LshMath.planes(dim, nPlanes, seed).map(_.toSeq).toSeq

  /** Bucket id column for a vector column (single table of nPlanes bits). */
  def bucket(vec: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column =
    Shims.column(LshBands(Shims.expression(vec), dim, 1, nPlanes, seed))
      .getItem(0)

  /** Multi-table LSH band keys for near-dup candidate generation:
    * `nTables` independent tables of `bitsPerTable` hyperplanes each.
    * Recall comes from OR-ing tables, precision from bits per table: at
    * 16×8 a true near-dup (cos ≥ 0.9) collides somewhere with P≈0.995
    * while a random near-orthogonal pair collides with P≈0.06 — the
    * knob pair is the cosine analog of minhash band/row counts.
    * Returns array<bigint> of per-table keys
    * (table_id * 2^bits + signBits); explode + equi-join on the key =
    * the sub-quadratic near-dup candidate join.
    */
  def bucketBands(vec: Column, dim: Int, nTables: Int = 16,
      bitsPerTable: Int = 8, seed: Long = 42L): Column =
    Shims.column(LshBands(Shims.expression(vec), dim, nTables, bitsPerTable, seed))

  /** DuckDB-equivalent bucket expression (double literals printed with
    * full round-trip precision so both engines compute identical dots). */
  def bucketSql(vecSql: String, dim: Int, nPlanes: Int, seed: Long = 42L): String =
    LshMath.planes(dim, nPlanes, seed).zipWithIndex.map { case (p, i) =>
      val arr = p.map(f => f.toDouble.toString).mkString("[", ",", "]")
      s"(CASE WHEN list_inner_product($vecSql::DOUBLE[], $arr::DOUBLE[]) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")::BIGINT")

  /** Multiprobe LSH search (Lv et al. 2007, VLDB): instead of paying
    * more tables for recall, each query probes its own sign bucket AND
    * the `nPlanes` buckets at Hamming distance 1 (one sign bit flipped
    * — the buckets a near neighbor most likely fell into when a
    * projection landed near zero), then the candidate union gets the
    * exact-L2 refine that decides. 1+nPlanes probes of ONE table ≈ the
    * recall of many tables at 1/nTables the index footprint — the
    * trade the paper is about. Scale shape: candidates come from an
    * equi-join on the bucket code (at 100 TB nPlanes grows so
    * 2^nPlanes buckets keep per-bucket populations bounded — the knob
    * is the same bits-per-table one [[bucketBands]] documents), then
    * [[PqIndex.refineExact]] touches raw vectors for candidates only. */
  def multiprobeSearch(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, dim: Int, nPlanes: Int, k: Int,
      seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val b = embeddings.select(col(idCol).cast("long").as("neighbor_id"),
      bucket(col(vecCol), dim, nPlanes, seed).as("b"))
    val qcode = bucket($"qv", dim, nPlanes, seed)
    val probes = array(qcode +:
      (0 until nPlanes).map(i => qcode.bitwiseXOR(lit(1L << i))): _*)
    // no distinct needed: each vector has ONE bucket code and the
    // 1+nPlanes probe codes of a query are pairwise distinct, so a
    // (query, neighbor) pair can match at most one probe — a distinct
    // here would only add a shuffle
    val shortlist = queries
      .select($"query_id", explode(probes).as("pb"))
      .join(b, $"pb" === $"b")
      .select($"query_id", $"neighbor_id")
    PqIndex.refineExact(shortlist, embeddings, idCol, vecCol, queries, k)
  }

  /** Corpus-sized band width for [[bandedPairs]]: bits so the EXPECTED
    * bucket population stays ≈32 (b = ⌈log₂(n/32)⌉, floored at the
    * oracle contract's 8). At a FIXED width, bucket populations grow
    * linearly with the corpus and the candidate-pair volume n²/2^(b+1)
    * per table grows quadratically — measured at sf10 (200k vectors,
    * b=8): ~1.2 B candidate pairs, a ~70 GB DISTINCT spill, disk-full
    * abort (the uniform estimate 16·n²/2⁹ predicts exactly this).
    * Self-sizing restores the sub-quadratic contract: pairs per table
    * ≈ n·16, linear in n — and the pair-verify join, which shuffles
    * BOTH vectors per candidate (~0.5 KB/pair at d=64), stays
    * shuffle-affordable (target 32 ⇒ ~0.2 GB per million corpus rows
    * vs ~13 GB at target 128's b). More bits lowers per-table
    * collision odds for MODERATELY similar pairs (the
    * probabilistic-candidates contract these operators declare);
    * genuinely-near pairs agree on almost every hyperplane and keep
    * colliding across the 16 tables (planted-near-dup recall ≥ 99 % at
    * n=200k, p_agree=0.9: 1−(1−0.9¹³)¹⁶). The floor means oracle/spec
    * scales (≲8k vectors) are bit-for-bit unchanged. */
  def chooseBits(n: Long, targetPopulation: Int = 32): Int =
    math.max(8, 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, (n - 1) / targetPopulation)))

  /** [[chooseBits]] for the ORACLE-generation side: same law, same
    * corpus (the pinned oracle sfDir — `graft.oracle.sfDir`, which
    * Verify sets to the dataset it actually runs, the one channel the
    * fixed `oracleSql: Map[String, String]` contract offers), so the
    * `bandedPairsSql` CTEs stay bit-for-bit aligned with the engine at
    * ANY verify scale. Counts rows straight from parquet footers (no
    * session needed) and FAILS LOUDLY on a missing dataset — a silent
    * fallback would size the oracle for the wrong corpus and surface as
    * an inscrutable hash mismatch instead of a config error. */
  def oracleBits: Int = chooseBits(IndexStore.corpusNFromFooters(
    sys.props.getOrElse("graft.oracle.sfDir", "/root/testdata/sf0.01")))

  /** Banded candidate pairs WITH their vectors (vec_a, vec_b, va, vb):
    * explode the [[bucketBands]] keys, self-join on the band key plus
    * any `extraKeys` equi-columns (e.g. a label/shard column), emit
    * each colliding pair from exactly its FIRST colliding table
    * (vec_a < vec_b). The one sub-quadratic candidate-generation
    * skeleton shared by every LSH near-dup operator — callers filter
    * on their own metric verify over (va, vb), which Catalyst folds
    * into the join stage, so candidates only ever exist as streaming
    * fan-out rows.
    *
    * Table-OWNERSHIP emission (the minhashVerifiedEdges discipline)
    * replaced the previous distinct() + caller-side vector-attach
    * joins: [[chooseBits]] sizes buckets for the UNIFORM case, but
    * clustered embeddings (every real corpus; the sf10 fixture's
    * label clusters) concentrate sign-codes onto hot buckets, where
    * Σ bucket² detaches from the uniform estimate — the candidate
    * distinct() spilled ~60 GB at the sf10 probe and the two attach
    * joins shuffled candidate-scale again. Each bucket row now carries
    * its vector and full per-table key array (corpus-linear ×
    * nTables), a pair is emitted exactly once (bk values embed the
    * table id, so positions align and firstEqIndex is the owner), and
    * the pinned exchange keeps AQE from coalescing the fan-out by its
    * corpus-linear input bytes. */
  /** `bucketSampleMod` > 1 keeps only buckets with
    * xxhash64(bk) ≡ 0 (mod it) — the deterministic COMPUTE bound the
    * sf10 probes use ([[graft.queries.PairProbes]]): per-bucket
    * candidate fan-out is quadratic in occupancy, so dropping
    * (mod-1)/mod of the buckets cuts the verify work ~linearly while
    * the surviving buckets run the identical plan. Emission stays
    * exactly-once (a pair whose FIRST colliding band is filtered is
    * dropped, never re-emitted from a later band — firstEqIndex keys
    * on the full band list). Entries pass the default 1 (no
    * sampling); only probes sample. */
  /** `occupantCap` > 0 bounds each bucket to its deterministic top-M
    * occupants (Knuth-hash of the id, id tie-break) — the sf10 probes'
    * SECOND compute bound beside `bucketSampleMod`: on a duplicate-
    * saturated corpus the hot buckets are giant and per-bucket verify
    * mass is quadratic in occupancy, so BUCKET-level sampling keeps
    * whole giant buckets (v_knn_self_pairs measured 942 s at 1/16
    * sampling at sf10) while an occupant cap bounds every bucket's
    * work at M² whatever the saturation. Like the sampling bound, the
    * cap is probe-only (entries pass 0) and reported in the probe row
    * beside its spill count ([[cappedSpillCount]]); a pair whose first
    * colliding band lost an endpoint to the cap is dropped, never
    * re-emitted from a later band. */
  def bandedPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      extraKeys: Seq[String] = Nil, nTables: Int = 16,
      bitsPerTable: Int = 8, seed: Long = 42L,
      bucketSampleMod: Int = 1, occupantCap: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val buckets = cappedBucketRows(df, idCol, vecCol, dim, extraKeys,
        nTables, bitsPerTable, seed, bucketSampleMod, occupantCap)
      .filter(col("__occ") <= (if (occupantCap > 0) occupantCap
        else Int.MaxValue))
      .drop("__occ")
      .repartition(spark.sparkContext.defaultParallelism, col("bk"))
    val joinCond = (Seq(col(s"x.bk") === col(s"y.bk"),
        col(s"x.$idCol") < col(s"y.$idCol"),
        col(s"x.t") === graft.GraftText.firstEqIndex(
          col("x.bks"), col("y.bks"))) ++
      extraKeys.map(k => col(s"x.$k") === col(s"y.$k")))
      .reduce(_ && _)
    buckets.as("x").join(buckets.as("y"), joinCond)
      .select(col(s"x.$idCol").as("vec_a"), col(s"y.$idCol").as("vec_b"),
        col(s"x.$vecCol").as("va"), col(s"y.$vecCol").as("vb"))
  }

  /** The exploded, sampled bucket rows with their deterministic
    * occupant rank `__occ` (1-based within each bucket, Knuth-hash
    * order) — shared by [[bandedPairs]] and the probe-side
    * [[cappedSpillCount]] so cap semantics have one definition. With
    * occupantCap ≤ 0 the rank is still computed only when a consumer
    * asks for it (the plain entry path filters on Int.MaxValue, which
    * Catalyst cannot eliminate — so the no-cap path skips the window
    * entirely). */
  private def cappedBucketRows(df: DataFrame, idCol: String,
      vecCol: String, dim: Int, extraKeys: Seq[String], nTables: Int,
      bitsPerTable: Int, seed: Long, bucketSampleMod: Int,
      occupantCap: Int): DataFrame = {
    val bucketsAll = df.select(
      (Seq(col(idCol), col(vecCol)) ++ extraKeys.map(col) :+
        bucketBands(col(vecCol), dim, nTables, bitsPerTable, seed)
          .as("bks")): _*)
      .select(
        (Seq(col(idCol), col(vecCol), col("bks")) ++ extraKeys.map(col) :+
          posexplode(col("bks")).as(Seq("t", "bk"))): _*)
    val sampled = if (bucketSampleMod > 1)
        bucketsAll.filter(
          pmod(xxhash64(col("bk")), lit(bucketSampleMod.toLong)) === 0)
      else bucketsAll
    if (occupantCap <= 0) sampled.withColumn("__occ", lit(1))
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy((col("bk") +: extraKeys.map(col)): _*)
        .orderBy(pmod(col(idCol) * lit(2654435761L), lit(4294967296L)),
          col(idCol))
      sampled.withColumn("__occ", row_number().over(w))
    }
  }

  /** One-row (occ_cap, n_spilled) frame for the probe report: how many
    * bucket rows the occupant cap dropped, over the identical sampled
    * bucket derivation [[bandedPairs]] ran. Corpus-linear. */
  def cappedSpillCount(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, extraKeys: Seq[String] = Nil, nTables: Int = 16,
      bitsPerTable: Int = 8, seed: Long = 42L, bucketSampleMod: Int = 1,
      occupantCap: Int = 0): DataFrame =
    cappedBucketRows(df, idCol, vecCol, dim, extraKeys, nTables,
      bitsPerTable, seed, bucketSampleMod, occupantCap)
      .agg(sum(when(col("__occ") > (if (occupantCap > 0) occupantCap
          else Int.MaxValue), 1L).otherwise(0L)).as("n_spilled"))
      .select(lit(occupantCap.toLong).as("occ_cap"),
        coalesce(col("n_spilled"), lit(0L)).as("n_spilled"))

  /** DuckDB equivalent of [[bandedPairs]]: a `b AS (...), cand AS (...)`
    * CTE fragment producing (vec_a, vec_b) from `tableName`, replicating
    * the banding exactly. Callers append their own verify SELECT. */
  def bandedPairsSql(tableName: String, idCol: String, vecCol: String,
      dim: Int, extraKeys: Seq[String] = Nil, nTables: Int = 16,
      bitsPerTable: Int = 8, seed: Long = 42L): String = {
    val bands = bandsSql(vecCol, dim, nTables, bitsPerTable, seed)
    val ek = extraKeys.map(k => s", $k").mkString
    val ekCond = extraKeys.map(k => s" AND x.$k = y.$k").mkString
    s"""b AS (
       |  SELECT $idCol$ek, unnest($bands) AS bk FROM $tableName
       |), cand AS (
       |  SELECT DISTINCT x.$idCol AS vec_a, y.$idCol AS vec_b
       |  FROM b x JOIN b y
       |    ON x.bk = y.bk$ekCond AND x.$idCol < y.$idCol
       |)""".stripMargin
  }

  /** DuckDB-equivalent of [[bucketBands]]: a SQL list literal of per-table
    * band keys, replicating seed, plane order, and offset math exactly —
    * lets the multi-table LSH near-dup operator be gated by the full
    * DuckDB hash oracle instead of a rows-only check. */
  def bandsSql(vecSql: String, dim: Int, nTables: Int = 16,
      bitsPerTable: Int = 8, seed: Long = 42L): String = {
    val all = LshMath.planes(dim, nTables * bitsPerTable, seed)
    val tables = (0 until nTables).map { t =>
      val bits = (0 until bitsPerTable).map { b =>
        val arr = all(t * bitsPerTable + b)
          .map(f => f.toDouble.toString).mkString("[", ",", "]")
        s"(CASE WHEN list_inner_product($vecSql::DOUBLE[], $arr::DOUBLE[]) > 0 THEN ${1L << b} ELSE 0 END)"
      }.mkString("(", " + ", ")")
      s"($bits + ${t.toLong * (1L << bitsPerTable)})::BIGINT"
    }
    tables.mkString("[", ", ", "]")
  }
}
