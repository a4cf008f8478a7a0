package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftVector._
import graft.Tables.load
import graft.operators.{IndexStore, IvfIndex, IvfPq, LshBuckets, PqIndex}

/** ANN-index surface: IVF build/search, LSH bucketing, recall evaluation
  * (the recall_bench.cpp analog). IVF/LSH outputs depend on seeded
  * training/hashing, so they are rows-only gated with property specs;
  * recall@k and LSH histograms are exactly replicable in SQL.
  */
object IndexQueries {

  private val NumQueries = 8
  private val K = 10
  /** v_graph_search beam width / hop budget (k ≤ ef required: the final
    * top-k is read off the last ef-beam's scored set). */
  private val GraphEf = 16
  private val GraphHops = 3
  /** d_semantic_dedup's cosine ε-ball (same radius family as the
    * embed-neardup operators — the synthetic corpus' planted near-dups
    * sit well above it, the random mass well below). */
  private[graft] val SemDedupTau = 0.4
  /** v_ivf_balance thresholds — aggressive at oracle scale on purpose:
    * at the oracle scale's ~31-member average clusters (sf0.01: 500
    * vectors, k=16) maxPop=16 guarantees the geometric pass actually
    * fires, so the oracle replays real splits, not a no-op. Past oracle
    * scale the floor scales with the corpus (n/2000, maxPop=2×): the
    * fixed 8/16 at sf10 produced ~25k sub-clusters, and the store
    * write's one-file-per-cluster layout — right at production
    * populations — became a 25k-tiny-file bill (measured 268 s). Both
    * the entry AND its oracle builder derive thresholds here, so the
    * persisted literals replayed by the oracle always match. The
    * production defaults (graphIvf) remain 256/1024. */
  private[graft] def balancePops(s: SparkSession, d: String): (Int, Int) = {
    val t = math.max(8, (IndexStore.corpusN(s, d) / 2000L).toInt)
    (t, 2 * t)
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // IVF index build: sampled-Lloyd centroids fitted + assignments
    // persisted partitionBy(cluster_id) (IndexStore), reported as the
    // cluster histogram. The build entry PAYS the build; search entries
    // only read — the reference's own build/serve separation (engine.h
    // builds via inserts, search_knn never re-fits anything).
    "v_ivf_build" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.ivf(s, d, k = 16)
      s.read.parquet(s"$dir/assignments")
        .groupBy($"cluster_id")
        .agg(count(lit(1)).as("n_vectors"))
        .select($"cluster_id".cast("long").as("cluster_id"), $"n_vectors")
        .orderBy("cluster_id")
    }),

    // IVF ANN search: k=10, nprobe=4 of 16 clusters, against the
    // persisted index — the probed clusters become literal partition
    // filters on the scan (file-level pruning, ~nprobe/k of the data).
    "v_ivf_search" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.ivf(s, d, k = 16)
      val q = load(s, d, "embeddings").filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      IvfIndex.searchPruned(s, dir, q, K, nprobe = 4)
        .orderBy("query_id", "rnk")
    }),

    // Filtered ANN (FAISS/Milvus "metadata filtering"): the label
    // predicate pushes into the SCAN of the probed cluster partitions —
    // metadata rides in the index beside each vector, so this is a
    // parquet filter under the partition pruning, not a corpus id-join
    // — and the top-k heap only sees predicate-passing candidates
    // (pre-filter: always fills to k when k matches exist in the
    // probed clusters, where post-filtering a plain top-k under-fills).
    "v_ivf_filtered" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.ivf(s, d, k = 16)
      val q = load(s, d, "embeddings").filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      IvfIndex.searchPrunedFiltered(s, dir, q, K, nprobe = 4,
          labels = Seq(1, 2, 3))
        .orderBy("query_id", "rnk")
    }),

    // Product-quantization ANN: 8×16 codebooks (32× compression),
    // asymmetric-distance top-k as a join-aggregate over the PERSISTED
    // codes table — search cost is ADC, not codebook training.
    "v_pq_search" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.pq(s, d, dim = 64, numSub = 8, codebookSize = 16)
      val books = s.read.parquet(s"$dir/codebooks")
      val codes = s.read.parquet(s"$dir/codes")
      val q = load(s, d, "embeddings").filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      PqIndex.search(books, codes, q, "vec_id", dim = 64, numSub = 8, k = K)
        .orderBy("query_id", "rnk")
    }),

    // PQ + exact refinement: ADC proposes 4×k candidates, their raw
    // vectors (and ONLY theirs) are fetched by id, exact L2 decides the
    // final top-k — quantization error no longer touches the reported
    // ranking, at the cost of |queries|×4k full-vector reads.
    "v_pq_rerank" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.pq(s, d, dim = 64, numSub = 8, codebookSize = 16)
      val books = s.read.parquet(s"$dir/codebooks")
      val codes = s.read.parquet(s"$dir/codes")
      val e = load(s, d, "embeddings")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      PqIndex.searchRefined(books, codes, e, "vec_id", "embedding", q,
          k = K, refineFactor = 4)
        .orderBy("query_id", "rnk")
    }),

    // OPQ-lite: PQ behind a variance-balancing dimension PERMUTATION
    // (Ge et al. 2013's structured-order finding — see OpqIndex): the
    // permutation is a persisted 64-int artifact entering the plan as a
    // literal (zero extra flops: a scan-side column shuffle, where full
    // OPQ's learned rotation would be a 64×64 mat-vec per row), codes
    // live in the permuted space, exact refine on RAW vectors (L2 is
    // permutation-invariant). Same scale shape as v_pq_rerank.
    "v_opq_search" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.opq(s, d)
      val perm = graft.operators.OpqIndex.permArray(
        s.read.parquet(s"$dir/perm"))
      val books = s.read.parquet(s"$dir/codebooks")
      val codes = s.read.parquet(s"$dir/codes")
      val e = load(s, d, "embeddings")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      graft.operators.OpqIndex.searchRefined(perm, books, codes, e,
          "vec_id", "embedding", q, k = K, refineFactor = 4)
        .orderBy("query_id", "rnk")
    }),

    // Composite IVF-PQ: partition-pruned inverted lists of PQ codes —
    // probes pick WHICH vectors to score (nprobe/k of the files), codes
    // decide WHAT is read for them (8 B/vector instead of 256 B). The
    // 100 TB configuration of this library's ANN stack.
    "v_ivfpq_search" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val ivfDir = IndexStore.ivf(s, d, k = 16)
      val pqDir = IndexStore.pq(s, d)
      val listsDir = IndexStore.ivfpq(s, d)
      val q = load(s, d, "embeddings").filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      IvfPq.searchPruned(s, ivfDir, pqDir, listsDir, q, K, nprobe = 4)
        .orderBy("query_id", "rnk")
    }),

    // Residual-encoded IVF-PQ (the FAISS IndexIVFPQ default): PQ
    // trained on and encoding r = x − centroid(x) — within a cluster
    // residuals concentrate near zero, so the same 8-byte budget
    // spends its resolution on a far smaller spread (ADC error
    // measured 1.7× lower than raw-PQ on the clustered spec fixture,
    // where tight planted modes cap the win; see ResidualPqSpec); ADC
    // still
    // estimates ‖x−q‖ because the query subtracts the SAME probed
    // centroid. Scan shape identical to v_ivfpq_search: probes are
    // literal partition filters, codes-only reads, per-(query,cluster)
    // broadcast ADC tables.
    "v_ivfpq_residual" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val ivfDir = IndexStore.ivf(s, d, k = 16)
      val rDir = IndexStore.ivfpqResidual(s, d)
      val q = load(s, d, "embeddings").filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      IvfPq.searchPrunedResidual(s, ivfDir, rDir, q, K, nprobe = 4)
        .orderBy("query_id", "rnk")
    }),

    // MIPS behind the IVF machinery: the Neyshabur–Srebro reduction
    // (every vector augmented with √(m²−‖x‖²); L2 order on the
    // augmented space == descending-⟨q,x⟩ order, so inner-product
    // retrieval needs NO new index structure) — the indexed scale path
    // whose exact ground truth is v_mips_search. Queries ride in with
    // a 0 augment; the probed clusters become literal partition
    // filters exactly as v_ivf_search; reported score = the true
    // inner product recomputed on the raw vectors.
    "v_mips_ivf" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.mips(s, d, k = 16)
      val e = load(s, d, "embeddings")
      val qRaw = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qraw"))
      val q = qRaw.select($"query_id",
        concat($"qraw", array(lit(0.0f))).as("qv"))
      IvfIndex.searchPruned(s, dir, q, K, nprobe = 4)
        .join(e.select($"vec_id".as("neighbor_id"), $"embedding".as("nv")),
          "neighbor_id")
        .join(broadcast(qRaw), "query_id")
        .select($"query_id", $"neighbor_id", $"rnk",
          round(dot($"nv", $"qraw"), 4).as("score"))
        .orderBy("query_id", "rnk")
    }),

    // Scalar-quantized (SQ8) search: byte codes against the per-dim
    // min/max grid (4× compression), decoded-ADC shortlist, exact L2
    // refine. No seeded training anywhere, so the oracle re-derives
    // grid+codes+ranking entirely from the raw table.
    "v_sq8_search" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.sq8(s, d)
      val grid = s.read.parquet(s"$dir/grid")
      val codes = s.read.parquet(s"$dir/codes")
      val e = load(s, d, "embeddings")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      graft.operators.Sq8Index.searchRefined(grid, codes, e, "vec_id",
          "embedding", q, k = K, refineFactor = 4)
        .orderBy("query_id", "rnk")
    }),

    // Int4 rung of the scalar-quantization ladder (levels = 15, 8× at
    // rest — the point modern quantized serving runs at): same grid /
    // encode / decoded-ADC / exact-refine machinery as SQ8 one rung
    // coarser, with a wider refine (8×) buying back the recall the
    // coarser grid costs. Like SQ8 there is no seeded training, so the
    // oracle re-derives the ENTIRE index from the raw table.
    "v_sq4_search" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.sq4(s, d)
      val grid = s.read.parquet(s"$dir/grid")
      val codes = s.read.parquet(s"$dir/codes")
      val e = load(s, d, "embeddings")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      graft.operators.Sq8Index.searchRefined(grid, codes, e, "vec_id",
          "embedding", q, k = K, refineFactor = 8)
        .orderBy("query_id", "rnk")
    }),

    // Johnson–Lindenstrauss random-projection search: a seeded ±1 sign
    // matrix compresses 64-dim vectors to 16 (4×), the shortlist is
    // ranked in the projected space, exact L2 refine decides — the
    // training-free rung of the approximate ladder (no grid pass, no
    // KMeans fit, just a seed).
    "v_rp_search" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val e = load(s, d, "embeddings")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      graft.operators.RpSearch.searchRefined(e, "vec_id", "embedding", q,
          inDim = 64, outDim = 16, k = K, refineFactor = 4)
        .orderBy("query_id", "rnk")
    }),

    // Binary (sign-bit) quantization search: 64 dims → 64 bits (256×
    // compression, the ladder's last rung), Hamming shortlist via
    // popcount-of-xor on two packed 32-bit halves, exact-L2 refine —
    // training-free like RP, and the fingerprint is seedless: a pure
    // scan-side function of the vector.
    "v_bq_search" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val e = load(s, d, "embeddings")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      graft.operators.BqSearch.searchRefined(e, "vec_id", "embedding", q,
          dim = 64, k = K, refineFactor = 8)
        .orderBy("query_id", "rnk")
    }),

    // Embedding outlier audit (OOD screening for curation): distance of
    // every vector to its ASSIGNED centroid in the persisted IVF
    // clustering, top-50 farthest — the vectors no cluster explains,
    // flagged for review before they pollute dedup/retrieval quality.
    // One scan of the assignments table against the broadcast 16-row
    // centroid frame; ranking on RAW squared distance (sqrt only in the
    // projection — the refineExact discipline) with vec_id tie-break;
    // top-50 is a TakeOrdered.
    "v_ood_score" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      import graft.GraftVector._
      val dir = IndexStore.ivf(s, d, k = 16)
      val cent = s.read.parquet(s"$dir/centroids")
      s.read.parquet(s"$dir/assignments")
        .select($"vec_id", $"embedding", $"cluster_id")
        .join(broadcast(cent), "cluster_id")
        .withColumn("d2", l2Sq($"embedding", $"centroid"))
        .orderBy($"d2".desc, $"vec_id")
        .limit(50)
        .select($"vec_id", $"cluster_id".cast("long").as("cluster_id"),
          round(sqrt($"d2"), 4).as("dist"))
    }),

    // Two-stage MaxSim serving (how late-interaction actually ships —
    // ColBERT's own retrieve-then-rerank): stage 1, every query VECTOR
    // runs a pruned IVF search (partition-pruned scans, k'=8,
    // nprobe=2) and the hit vectors' doc groups form the candidate
    // set; stage 2, exact MaxSim scores ONLY the candidate groups
    // (MaxSim.topKCandidates — the bounded candidate frame broadcasts,
    // the corpus joins it by group key). v_maxsim_search is this
    // entry's exact ground truth, exactly as v_knn_bruteforce is
    // v_ivf_search's.
    "v_maxsim_pruned" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      import graft.operators.MaxSim
      val dir = IndexStore.ivf(s, d, k = 16)
      // contract: compaction-steady store — this entry's oracle replays
      // searchPruned WITHOUT the write-buffer branch, so uncompacted
      // deltas in the shared store must fail loudly, not drift silently
      graft.streaming.IvfDeltaIngest.requireCompacted(s, dir)
      val e = load(s, d, "embeddings")
      val q = MaxSim.queryGroups(e)
      val ann = IvfIndex.searchPruned(s, dir,
        q.select($"q_vec_id".as("query_id"), $"qv"), k = 8, nprobe = 2)
      val cand = ann
        .select($"query_id".as("q_vec_id"),
          ($"neighbor_id" / MaxSim.GroupWidth).cast("long").as("doc_group"))
        .join(q.select($"q_vec_id", $"query_group"), "q_vec_id")
        .select($"query_group", $"doc_group").distinct()
      MaxSim.topKCandidates(MaxSim.corpusGroups(e), q, cand, k = 5)
        .orderBy("query_group", "rnk")
    }),

    // IVF index-health audit (the ops table consulted BEFORE trusting a
    // probe plan: at 100 TB the cluster populations ARE the partition
    // sizes, so imbalance here is scan skew in every pruned search, and
    // inertia growth is the rebuild signal as data drifts away from the
    // centroids): per cluster — population, population share, mean and
    // max squared distance to the assigned centroid. One scan of the
    // persisted assignments against the broadcast 16-row centroid
    // frame; per-vector d² folds in dimension order then rounds to
    // integer MICROS before the cross-vector sum (the v_quantize_error
    // discipline — a float sum across a distributed scan has no defined
    // order), shares and means by exact pinned divisions.
    "v_ivf_stats" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      import graft.GraftVector._
      val dir = IndexStore.ivf(s, d, k = 16)
      // audit reads only the persisted assignments — uncompacted deltas
      // would silently undercount, so demand compaction-steady state
      graft.streaming.IvfDeltaIngest.requireCompacted(s, dir)
      val cent = s.read.parquet(s"$dir/centroids")
      val per = s.read.parquet(s"$dir/assignments")
        .select($"vec_id", $"embedding", $"cluster_id")
        .join(broadcast(cent), "cluster_id")
        .select($"cluster_id".cast("long").as("cluster_id"),
          round(l2Sq($"embedding", $"centroid") * 1e6).cast("long").as("d2u"))
        .groupBy($"cluster_id")
        .agg(count(lit(1)).as("population"),
          sum($"d2u").as("sd2u"), max($"d2u").as("mx"))
      val total = per.agg(sum($"population").as("n_total"))
      per.crossJoin(broadcast(total))
        .select($"cluster_id", $"population",
          round($"population".cast("double") / $"n_total", 4).as("pop_share"),
          round(($"sd2u".cast("double") / $"population") / 1e6, 6)
            .as("mean_sq_dist"),
          round($"mx".cast("double") / 1e6, 6).as("max_sq_dist"))
        .orderBy("cluster_id")
    }),

    // IVF maintenance ACTION on the #9o audit: split the hottest
    // cluster (the partition whose population makes every probe that
    // touches it the scan-skew straggler) into two via deterministic
    // farthest-point 2-seeding — seed A = the member farthest from the
    // cluster's own centroid, seed B = the member farthest from seed A
    // (both (d², min-vec_id) tie-broken), members side to their nearer
    // seed (ties → A). Output: the post-split population table (kept
    // clusters unchanged, split_a keeps the original id, split_b gets
    // id k). Scale shape: populations are one small aggregate, the
    // member pass is a PRUNED scan of exactly the hot partition (the
    // probe machinery reused for maintenance), seeds are two bounded
    // 1-row driver collects (the collectProbeIds precedent), side
    // assignment is scan-side against two 64-float literals. At 100 TB
    // this is the rebalance step run between full rebuilds.
    "v_ivf_split" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.ivf(s, d, k = 16)
      val cent = s.read.parquet(s"$dir/centroids")
      val assign = s.read.parquet(s"$dir/assignments")
        .select($"vec_id", $"embedding", $"cluster_id")
      // k is the build parameter two lines up — no count job needed
      graft.operators.IvfMaintenance
        .splitHottest(assign, cent, k = 16L)
        .orderBy("cluster_id", "origin")
    }),

    // Population-BOUNDED rebuild (IvfBalance): the build-time
    // generalization of v_ivf_split's one-cluster action — every
    // cluster over maxPop re-clustered into its own sub-centroids
    // (grouped sub-Lloyd, hash-uniform training sample), identical-
    // point residue salt-sharded. At 100 TB this is how the graph
    // family's coarse store self-bounds (IndexStore.graphIvf past
    // oracle scale); the entry exercises it at oracle scale with
    // aggressive thresholds so splits actually trigger on 2k vectors.
    // Output: the post-balance layout audit — one row per surviving
    // centroid with its parent, method, and re-counted population.
    "v_ivf_balance" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val (tp, mp) = balancePops(s, d)
      val dir = IndexStore.ivfBalanced(s, d, k = 16,
        targetPop = tp, maxPop = mp)
      val cent = s.read.parquet(s"$dir/centroids")
        .select($"cluster_id".cast("long").as("cluster_id"),
          $"parent_id".cast("long").as("parent_id"), $"method")
      val pops = s.read.parquet(s"$dir/assignments")
        .groupBy($"cluster_id".cast("long").as("cluster_id"))
        .agg(count(lit(1)).as("population"))
      cent.join(pops, Seq("cluster_id"), "left")
        .select($"cluster_id", $"parent_id", $"method",
          coalesce($"population", lit(0L)).as("population"))
        .orderBy("cluster_id")
    }),

    // The inverse maintenance action (IvfMaintenance.mergeCold): merge
    // clusters colder than 90% of the mean population into their
    // nearest surviving sibling — FAISS-world inverted-list
    // concatenation, reclaiming probe slots from clusters the data has
    // drifted away from. Relative threshold (not an absolute count) so
    // the entry exercises real merges on whatever population spread
    // the regenerated fixture has. Populations one aggregate; the cold
    // set and the target argmin live on bounded broadcast centroid
    // frames — nothing corpus-sized moves. Output: the post-merge
    // audit — every ORIGINAL cluster id with its absorber (self for
    // survivors) and re-counted population (0 for absorbed rows).
    "v_ivf_merge" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.ivf(s, d, k = 16)
      val cent = s.read.parquet(s"$dir/centroids")
      val assign = s.read.parquet(s"$dir/assignments")
        .select($"vec_id", $"cluster_id")
      graft.operators.IvfMaintenance.mergeCold(assign, cent)
    }),

    // Matryoshka (prefix-dimension) search: coarse rank on the first 16
    // of 64 coordinates (4× less data in the hot scan — and a column
    // slice, so there is no index to build, persist, or invalidate),
    // exact-L2 refine on the full vectors. Training-free AND seedless
    // like v_bq_search; the fidelity knob is just how much of the
    // stored column the scan reads.
    "v_matryoshka_search" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val e = load(s, d, "embeddings")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      graft.operators.MatryoshkaSearch.searchRefined(
          e, "vec_id", "embedding", q,
          dim = 64, prefixDim = 16, k = K, refineFactor = 4)
        .orderBy("query_id", "rnk")
    }),

    // Multiprobe LSH search (Lv et al. 2007): each query probes its own
    // sign bucket + the 8 Hamming-1 flips of one table, exact-L2 refine
    // decides — many-table recall at one table's footprint. Candidates
    // are an equi-join on the bucket code; raw vectors touched for
    // candidates only.
    "v_lsh_multiprobe" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val e = load(s, d, "embeddings")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      LshBuckets.multiprobeSearch(e, "vec_id", "embedding", q,
          dim = 64, nPlanes = 8, k = K)
        .orderBy("query_id", "rnk")
    }),

    // Refine-factor sweep — the quantization ladder's analog of
    // v_nprobe_sweep (recall per probe cost there; recall per shortlist
    // cost here): matryoshka prefix-16 recall@10 vs exact truth at
    // refineFactor 1/2/4/8. Recall is non-decreasing in the factor by
    // the nested-shortlist law (MatryoshkaSpec) — this table shows
    // where the curve flattens, i.e. the cheapest factor that buys full
    // recall. Same exchange-reuse shape as the nprobe sweep: the four
    // branches share plan-identical gt/shortlist subtrees.
    "v_refine_sweep" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val e = load(s, d, "embeddings")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val gt = e.crossJoin(broadcast(q))
        .groupBy($"query_id")
        .agg(topK(l2Sq($"embedding", $"qv"), $"vec_id", K).as("gt"))
        .select($"query_id",
          explode(transform($"gt", x => x.getField("id"))).as("neighbor_id"))
      val nq = q.agg(count(lit(1)).as("n_queries"))
      Seq(1, 2, 4, 8).map { rf =>
        graft.operators.MatryoshkaSearch
          .searchRefined(e, "vec_id", "embedding", q,
            dim = 64, prefixDim = 16, k = K, refineFactor = rf)
          .select($"query_id", $"neighbor_id")
          .join(gt, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("total_hits"))
          .select(lit(rf.toLong).as("refine_factor"), $"total_hits")
      }.reduce(_ unionAll _)
        .crossJoin(broadcast(nq))
        .select($"refine_factor", $"n_queries", $"total_hits",
          round($"total_hits" / (lit(K) * $"n_queries"), 4).as("avg_recall"))
        .orderBy("refine_factor")
    }),

    // LSH bucket histogram (8 seeded hyperplanes → 256 buckets).
    "v_lsh_bucket" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      load(s, d, "embeddings")
        .select(LshBuckets.bucket($"embedding", 64, 8).as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n_vectors"))
        .orderBy("bucket")
    }),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup =
    // k-means the embedding space, then drop within-cluster ε-ball
    // duplicates — the named method for pruning web-scale corpora of
    // paraphrases exact dedup can't see. Rides the SAME persisted IVF
    // clustering as the ANN entries (one index, two jobs). The survivor
    // rule is the deterministic greedy: a vector is a dup iff a
    // SMALLER-id vector in its cluster is within the cosine ball — an
    // EXISTS semi-join on the cluster key. Per-cluster work is
    // quadratic BY DESIGN (SemDeDup's own shape), so the coarse store
    // must be the corpus-sized one: graphIvf (chooseK + population
    // bounds past the oracle floor), which keeps cluster populations
    // bounded and the per-cluster O(pop²) bill flat per decade — a
    // pinned k=16 measured 9.8× per 10× data (SCALE r12/r13). At
    // oracle scale chooseK floors at 16, so this rides the SAME
    // ivf16m store the gate's literal-centroid CTEs embed. The
    // equi-join on cluster_id shuffles each cluster to one place — no
    // global pair enumeration. Cross-cluster near-dups are missed BY
    // CONTRACT (the method's documented recall trade; the spec pins
    // it).
    "d_semantic_dedup" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.graphIvf(s, d)
      val asg = s.read.parquet(s"$dir/assignments")
        .select($"vec_id", $"embedding", $"cluster_id")
      val r = asg.select($"vec_id".as("r_id"), $"embedding".as("r_emb"),
        $"cluster_id".as("r_cl"))
      val dup = asg.join(r,
          $"cluster_id" === $"r_cl" && $"r_id" < $"vec_id" &&
            cosine($"embedding", $"r_emb") > SemDedupTau, "left_semi")
        .select($"vec_id")
      asg.join(dup.withColumn("d", lit(1)), Seq("vec_id"), "left")
        .select($"vec_id", $"cluster_id".cast("long").as("cluster_id"),
          $"d".isNotNull.as("is_dup"))
        .orderBy("vec_id")
    }),

    // recall@10 of inner-product ranking vs true-L2 ground truth — the
    // Spark analog of benchmark/recall_bench.cpp's hit counting. Both
    // bounded heaps ride ONE aggregation over one scan of the pairs (two
    // groupBys over the same cross join would execute it twice).
    "v_recall_at_k" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val e = load(s, d, "embeddings")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      e.crossJoin(broadcast(q))
        .groupBy($"query_id")
        .agg(topK(l2($"embedding", $"qv"), $"vec_id", K).as("gt"),
          topK(-dot($"embedding", $"qv"), $"vec_id", K).as("ap"))
        .select($"query_id",
          round(
            size(array_intersect(
              transform($"gt", x => x.getField("id")),
              transform($"ap", x => x.getField("id")))).cast("double") / K,
            4).as("recall"))
        .orderBy("query_id")
    }),

    // The recall-vs-cost curve (recall_bench.cpp's ef_search sweep,
    // IVF-shaped): recall@k against exact ground truth at nprobe = 1,
    // 2, 4, 8 of 16 clusters — the table an operator consults to pick
    // its quality/cost point before a production run. Each sweep point
    // searches the SAME persisted index (partition-pruned scans, no
    // re-fit anywhere); ground truth is one broadcast-kNN pass.
    // avg_recall = Σ hits / (k·|Q|): a single exact long→double
    // division — never a float MEAN of per-query recalls, whose
    // summation order is engine-dependent.
    "v_nprobe_sweep" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dir = IndexStore.ivf(s, d, k = 16)
      val e = load(s, d, "embeddings")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val gt = e.crossJoin(broadcast(q))
        .groupBy($"query_id")
        .agg(topK(l2Sq($"embedding", $"qv"), $"vec_id", K).as("gt"))
        .select($"query_id",
          explode(transform($"gt", x => x.getField("id"))).as("neighbor_id"))
        // EAGER checkpoint of the |Q|·k ground-truth rows: the four
        // sweep branches' gt subtrees are plan-identical and exchange
        // reuse USUALLY collapses them, but reuse is best-effort under
        // AQE — record runs swung 2.1–4.5 s with the occasional branch
        // recomputing the corpus pass. 80 stored rows make the truth
        // side compute exactly once, unconditionally. (A lazy .cache()
        // here measured WORSE — the two-sided-read race — which is why
        // the earlier note rejected caching; the eager checkpoint has
        // neither failure mode.)
        .localCheckpoint(true)
      val nq = q.agg(count(lit(1)).as("n_queries"))
      // ONE probe resolution at the sweep's max width (the ef-sweep
      // prefix law on the IVF knob: the (cdist, cluster_id) ranking is
      // nprobe-independent, so each point's probe set is the crnk ≤ np
      // PREFIX). The ranked rows collect once — bounded |Q|·max — and
      // each point re-plants its prefix as a LocalRelation, replacing
      // four per-point (cross-join rank + distinct-collect) jobs with
      // one; decision-for-decision identical to four independent
      // searchPruned calls, which is what the oracle replays.
      val cent = s.read.parquet(s"$dir/centroids")
      val ranked = IvfIndex.resolveProbesRanked(q, cent, NprobeSweep.max)
      val rankedRows = ranked.collect()
      val probeSchema = org.apache.spark.sql.types.StructType(
        ranked.schema.fields.take(3))
      NprobeSweep.map { np =>
        val rows = rankedRows.filter(_.getInt(3) <= np)
        val probesLocal = s.createDataFrame(java.util.Arrays.asList(
          rows.map(r => org.apache.spark.sql.Row(r.get(0), r.get(1),
            r.get(2))): _*), probeSchema)
        val probeIds = rows.map(_.getInt(2)).distinct.sorted.toSeq
        IvfIndex.searchPrunedFrames(s, dir, q, probesLocal, probeIds, K)
          .join(gt, Seq("query_id", "neighbor_id"))
          .agg(count(lit(1)).as("total_hits"))
          .select(lit(np.toLong).as("nprobe"), $"total_hits")
      }.reduce(_ unionAll _)
        .crossJoin(broadcast(nq))
        .select($"nprobe", $"n_queries", $"total_hits",
          round($"total_hits" / (lit(K) * $"n_queries"), 4).as("avg_recall"))
        .orderBy("nprobe")
    }),

    // Approximate kNN-GRAPH construction (the all-vectors-are-queries
    // face of IVF search — input to graph clustering, NN-Descent
    // refinement, offline HNSW builds): every vector probes its
    // nprobe=2 nearest clusters and ranks the members it finds there.
    // No query-side broadcast anywhere — probe selection is a bounded
    // map-side top-k against the broadcast CENTROIDS (k rows; k sized
    // by the corpus via IndexStore.graphIvf, so cluster populations —
    // and with them the per-row candidate list — stay bounded), and
    // candidates come from a cluster_id-keyed join whose fan-out is
    // cluster population × probing queries, never corpus². Self-pairs
    // drop BEFORE ranking.
    "v_knn_graph" -> ((s: SparkSession, d: String) =>
      knnGraphRaw(s, d)
        .transform(graft.queries.DedupQueries.orderedLarge(_, "vec_id", "rnk"))),

    // Graph maintenance AUDIT (the v_ivf_stats analog for the graph
    // family): the in-degree distribution of the persisted kNN graph —
    // out-degree is k by construction, so in-degree is where hubs and
    // orphans (unreachable-by-backlink nodes, the beam search's blind
    // spots) show up; the histogram is what tells an operator the graph
    // needs re-linking before search recall quietly sags. One count per
    // neighbor key (map-side combinable), a corpus left join for the
    // in-degree-0 nodes, a bounded (≤ max-degree) histogram frame,
    // shares in basis points by integer division.
    "v_graph_stats" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val gDir = IndexStore.knnGraph(s, d, k = 5, nprobe = 2)
      val inDeg = load(s, d, "embeddings").select($"vec_id")
        .join(s.read.parquet(s"$gDir/edges")
          .groupBy($"neighbor_id".as("vec_id"))
          .agg(count(lit(1)).as("c")), Seq("vec_id"), "left")
        .select(coalesce($"c", lit(0L)).as("in_degree"))
      val hist = inDeg.groupBy($"in_degree")
        .agg(count(lit(1)).as("n_nodes"))
      val total = hist.agg(sum($"n_nodes").as("n"))
      hist.crossJoin(broadcast(total))
        .select($"in_degree", $"n_nodes",
          expr("n_nodes * 10000 DIV n").as("share_bp"))
        .orderBy("in_degree")
    }),

    // Graph-traversal ANN search — the reference's HNSW beam search
    // (hnsw_index.h:268-330) re-expressed set-at-a-time: entry = the
    // medoid of the query's nearest coarse centroid, then 3 rounds of
    // expand-through-the-persisted-edge-table → exact-L2 → keep-ef=16,
    // final top-10 from the last scored set. Graph + medoids are
    // build-once artifacts (IndexStore.knnGraph); search joins them BY
    // KEY with a broadcast beam (|Q|·ef rows), so each hop is a
    // map-side probe of the partitioned graph — never a scan of it.
    // The recall-vs-probe-cost story is spec-gated (GraphSearchSpec:
    // clustered recall floor vs brute force); the traversal itself is
    // fully oracle-replayed (unrolled CTE rounds, every rank tie-broken
    // by node id).
    "v_graph_search" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val ivfDir = IndexStore.graphIvf(s, d)
      val gDir = IndexStore.knnGraph(s, d, k = 5, nprobe = 2)
      val e = load(s, d, "embeddings").select($"vec_id", $"embedding")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      graft.operators.GraphSearch.search(s, ivfDir, gDir, e, q,
          k = K, ef = GraphEf, hops = GraphHops)
        .orderBy("query_id", "rnk")
    }),

    // The FULL layered search (hnsw_index.h:268-330): deterministic
    // hash levels put ~1/8^l of nodes on layer l (the reference's
    // geometric get_random_level, M=8), the layer COUNT data-sized
    // from the corpus (GraphSearch.levelsFor — the max_level_
    // contract: 10× the data adds ~1.1 layers, keeping the descent
    // O(log n)); each upper layer persisted as a kNN edge table over
    // its slice; search descends greedily (beam 2) from the global
    // entry through layerL → … → layer1, and the surviving frontier
    // REPLACES v_graph_search's medoid entry for the layer-0 ef-beam.
    // Same scale shape as v_graph_search — upper layers add tiny
    // broadcast-probe stages, never a corpus shuffle.
    "v_hnsw_search" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val hDir = IndexStore.hnsw(s, d, k = HnswLayerK)
      val gDir = IndexStore.knnGraph(s, d, k = 5, nprobe = 2)
      val e = load(s, d, "embeddings").select($"vec_id", $"embedding")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      graft.operators.GraphSearch.hnswSearch(s, hDir, gDir, e, q,
          k = K, ef = GraphEf, hops = GraphHops,
          descentEf = HnswDescentEf, descentHops = HnswDescentHops)
        .orderBy("query_id", "rnk")
    }),

    // The recall-vs-beam-width curve over the GRAPH serving path
    // (recall_bench.cpp's ef_search sweep; v_nprobe_sweep covers the
    // IVF knob): recall@k vs exact ground truth at ef = 10, 16, 24 of
    // the persisted graph, fixed 3 hops. Recall typically grows with
    // ef (a wider kept beam explores more of the graph) but is NOT a
    // theorem across runs: a larger beam's extra frontier can displace
    // the carrier node whose edge reached a true neighbor in the
    // smaller run — unlike the hops curve, where monotonicity IS
    // provable within one run (answer-set gt members persist through
    // every later candidate pool). The deterministic clustered spec
    // fixture pins the typical behavior as a regression guard.
    // One shared ground-truth pass; each sweep point searches the SAME
    // persisted artifacts.
    "v_ef_sweep" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val ivfDir = IndexStore.graphIvf(s, d)
      val gDir = IndexStore.knnGraph(s, d, k = 5, nprobe = 2)
      val e = load(s, d, "embeddings").select($"vec_id", $"embedding")
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val gt = e.crossJoin(broadcast(q))
        .groupBy($"query_id")
        .agg(topK(l2Sq($"embedding", $"qv"), $"vec_id", K).as("gt"))
        .select($"query_id",
          explode(transform($"gt", x => x.getField("id"))).as("neighbor_id"))
        // eager |Q|·k checkpoint — the v_nprobe_sweep discipline
        .localCheckpoint(true)
      val nq = q.agg(count(lit(1)).as("n_queries"))
      // GraphSearch.sweep shares the entry beam and hop-1 scored set
      // across the sweep points (provably ef-independent up to
      // prefix); each point's result is decision-for-decision the
      // independent search the oracle replays
      graft.operators.GraphSearch
        .sweep(s, ivfDir, gDir, e, q, k = K, efs = EfSweep,
          hops = GraphHops)
        .map { case (ef, res) =>
          res.join(gt, Seq("query_id", "neighbor_id"))
            .agg(count(lit(1)).as("total_hits"))
            .select(lit(ef.toLong).as("ef"), $"total_hits")
        }.reduce(_ unionAll _)
        .crossJoin(broadcast(nq))
        .select($"ef", $"n_queries", $"total_hits",
          round($"total_hits" / (lit(K) * $"n_queries"), 4).as("avg_recall"))
        .orderBy("ef")
    }),

    // The HNSW INSERT path (hnsw_index.h's add: search the existing
    // graph for the new point's neighbors, link to the best k) made
    // set-at-a-time: a batch of "new" vectors (the vec_id % 25 == 3
    // slice) beam-searches the persisted graph with the batch MASKED
    // out of medoids, edges, and candidates — the reference's own
    // soft-delete filtering, never a per-query graph rebuild — and
    // each vector's top-5 IS its new adjacency (v_knn_graph's row
    // shape, so the output unions straight into the edge table).
    // Scale shape: identical to v_graph_search (the batch is the
    // broadcast side everywhere); masks are scan-side predicates.
    "v_graph_insert" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val ivfDir = IndexStore.graphIvf(s, d)
      val gDir = IndexStore.knnGraph(s, d, k = 5, nprobe = 2)
      def isNew(c: org.apache.spark.sql.Column) =
        pmod(c, lit(InsertBatchMod)) === InsertBatchResidue
      val e = load(s, d, "embeddings").select($"vec_id", $"embedding")
      val existing = e.filter(!isNew($"vec_id"))
      val batch = e.filter(isNew($"vec_id"))
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val cent = s.read.parquet(s"$ivfDir/centroids")
        .select($"cluster_id", $"centroid")
      // entry medoids over EXISTING members only (a not-yet-inserted
      // node must not serve as an entry point) — the ONE medoid rule,
      // shared with the persisted-store build (GraphSearch.medoidsOf)
      val med = graft.operators.GraphSearch.medoidsOf(
        s.read.parquet(s"$ivfDir/assignments").filter(!isNew($"vec_id")),
        cent.select($"cluster_id".cast("long").as("cluster_id"), $"centroid"))
      val stored = s.read.parquet(s"$gDir/edges")
        .filter(!isNew($"vec_id") && !isNew($"neighbor_id"))
        .select($"vec_id".as("node"), $"neighbor_id")
      graft.operators.GraphSearch.searchFrames(s, cent, med, stored,
          existing, batch, k = 5, ef = GraphEf, hops = GraphHops)
        .select($"query_id".as("vec_id"), $"neighbor_id", $"rnk", $"dist")
        .orderBy("vec_id", "rnk")
    }),

    // The LAYERED-index insert path (hnsw_index.h's add beyond layer 0:
    // assign the new node its level, then link it at every layer ≤
    // that level with the select-neighbors heuristic — the
    // add_neighbor_inplace pruning). Set-at-a-time: batch nodes at
    // level ≥ l compute their layer-l adjacency by the SAME rule the
    // layer BUILD uses (IVF probe → bounded shortlist → diversity fold
    // → backfill, GraphSearch.layerInsert == layerGraph's core) with
    // the batch masked out of the candidate pool — so inserting then
    // reading equals rebuilding, and the new edges union straight into
    // the layer tables (the sibling-dir swap IvfDeltaIngest uses).
    // Layer 0's ingest is v_graph_insert (the flat graph IS layer 0).
    // Scale shape: the batch rides the probe/broadcast side of every
    // join; members are hit by cluster key; upper layers hold n/8^l
    // nodes so each layer's pass shrinks geometrically.
    "v_hnsw_insert" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val ivfDir = IndexStore.graphIvf(s, d)
      def isNew(c: org.apache.spark.sql.Column) =
        pmod(c, lit(HnswInsertMod)) === HnswInsertResidue
      val e = load(s, d, "embeddings").select($"vec_id", $"embedding")
      val batch = e.filter(isNew($"vec_id"))
      val existing = s.read.parquet(s"$ivfDir/assignments")
        .filter(!isNew($"vec_id"))
      val nClusters = s.read.parquet(s"$ivfDir/centroids").count().toInt
      (1 to IndexStore.hnswLevels(s, d)).map { lv =>
        graft.operators.GraphSearch.layerInsert(s, ivfDir, e, batch,
            existing, minLevel = lv, k = HnswLayerK,
            nprobe = graft.operators.GraphSearch.hnswNprobe(lv, nClusters))
          .select(lit(lv.toLong).as("layer"), $"vec_id", $"neighbor_id",
            $"rnk", $"dist")
      }.reduce(_ unionAll _).orderBy("layer", "vec_id", "rnk")
    }),

    // The DELETE path (the reference's soft-delete contract: deleted
    // nodes are MARKED and skipped during traversal — hnsw search
    // filters them out, the graph is never restructured per delete;
    // EBR then reclaims their memory, a shared-address-space artifact
    // whose distributed analog is simply compaction). Here the deleted
    // slice (vec_id % 17 == 5) is masked out of medoids, edges, and
    // candidates at SEARCH time — scan-side predicates, zero index
    // mutation — and the beam fills to k from live nodes only. Same
    // scale shape as v_graph_search.
    "v_graph_delete" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val ivfDir = IndexStore.graphIvf(s, d)
      val gDir = IndexStore.knnGraph(s, d, k = 5, nprobe = 2)
      def isDel(c: org.apache.spark.sql.Column) =
        pmod(c, lit(DeleteMod)) === DeleteResidue
      val e = load(s, d, "embeddings").select($"vec_id", $"embedding")
      val live = e.filter(!isDel($"vec_id"))
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val cent = s.read.parquet(s"$ivfDir/centroids")
        .select($"cluster_id", $"centroid")
      val med = graft.operators.GraphSearch.medoidsOf(
        s.read.parquet(s"$ivfDir/assignments").filter(!isDel($"vec_id")),
        cent.select($"cluster_id".cast("long").as("cluster_id"), $"centroid"))
      val stored = s.read.parquet(s"$gDir/edges")
        .filter(!isDel($"vec_id") && !isDel($"neighbor_id"))
        .select($"vec_id".as("node"), $"neighbor_id")
      graft.operators.GraphSearch.searchFrames(s, cent, med, stored,
          live, q, k = K, ef = GraphEf, hops = GraphHops)
        .orderBy("query_id", "rnk")
    }),

    // Graph COMPACTION — the maintenance step that closes the delete
    // cycle the way IvfDeltaIngest.compact closes IVF's (the
    // distributed analog of the reference's EBR reclamation: fold the
    // v_graph_delete tombstones out of the persisted edge tables so
    // searches stop paying the mask, then re-link the nodes whose
    // adjacency the fold under-filled via the masked beam search —
    // the v_graph_insert machinery with self excluded). The entry
    // builds the compacted SIBLING store (sibling-dir + atomic swap,
    // the shared graph stays untouched) and returns the repair delta:
    // each affected node's new top-5 adjacency. Scale shape: the fold
    // is scan-side predicates + one partitioned write; the re-link
    // batch (≤ deleted-degree nodes) rides the broadcast side of
    // every join exactly as the insert path does.
    "v_graph_compact" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val gDir = IndexStore.knnGraph(s, d, k = 5, nprobe = 2)
      val cDir = IndexStore.knnGraphCompacted(s, d, DeleteMod, DeleteResidue)
      def isDel(c: org.apache.spark.sql.Column) =
        pmod(c, lit(DeleteMod)) === DeleteResidue
      val affected = s.read.parquet(s"$gDir/edges")
        .filter(!isDel($"vec_id") && isDel($"neighbor_id"))
        .select($"vec_id").distinct()
      s.read.parquet(s"$cDir/edges")
        .join(broadcast(affected), "vec_id")
        .select($"vec_id", $"neighbor_id", $"rnk", $"dist")
        .orderBy("vec_id", "rnk")
    }),

    // Layered-index maintenance AUDIT (v_graph_stats' layer face): per
    // upper layer, node occupancy (the level rule's geometric census —
    // drift here means the id hash degraded), edge count and average
    // out-degree in millis (under-filled layers mean the probe budget
    // found no same-layer neighbors: raise nprobe), and the share of
    // layer nodes with NO incoming edge in basis points (orphans are
    // descent blind spots — a greedy walk can never land on them; the
    // signal that schedules a layer re-link). Counts and integer
    // ratios only — exact at any scale; two corpus-free aggregates per
    // layer (the layer tables are n/8^l rows).
    "v_hnsw_stats" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val hDir = IndexStore.hnsw(s, d, k = HnswLayerK)
      val e = load(s, d, "embeddings").select($"vec_id")
      (1 to graft.operators.GraphSearch.storedLevels(s, hDir)).map { lv =>
        val name = s"layer$lv"
        val nodes = e.filter(graft.operators.GraphSearch.levelAtLeast($"vec_id", lv))
        val edges = s.read.parquet(s"$hDir/$name")
          .select($"vec_id", $"neighbor_id")
        val nn = nodes.agg(count(lit(1)).as("n_nodes"))
        val ne = edges.agg(count(lit(1)).as("n_edges"))
        val orphans = nodes.join(
            edges.select($"neighbor_id".as("vec_id")).distinct(),
            Seq("vec_id"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        nn.crossJoin(broadcast(ne)).crossJoin(broadcast(orphans))
          .select(lit(lv.toLong).as("layer"), $"n_nodes", $"n_edges",
            expr("n_edges * 1000 DIV n_nodes").as("avg_degree_milli"),
            expr("n_orphans * 10000 DIV n_nodes").as("orphan_bp"))
      }.reduce(_ unionAll _).orderBy("layer")
    }),

    // The LAYERED delete path: the reference's soft-delete contract
    // applied per layer — the deleted slice is masked out of every
    // layer's edge table (both endpoints), the global entry is
    // recomputed over live top-layer nodes, scoring sees live vectors
    // only, and the IDENTICAL layered traversal runs (zero index
    // mutation; scan-side predicates). Queries are NOT filtered: a
    // deleted vector may still be searched FOR, it just can't be
    // returned or traversed through. Same scale shape as
    // v_hnsw_search.
    "v_hnsw_delete" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val hDir = IndexStore.hnsw(s, d, k = HnswLayerK)
      val gDir = IndexStore.knnGraph(s, d, k = 5, nprobe = 2)
      def isDel(c: org.apache.spark.sql.Column) =
        pmod(c, lit(DeleteMod)) === DeleteResidue
      val e = load(s, d, "embeddings").select($"vec_id", $"embedding")
      val live = e.filter(!isDel($"vec_id"))
      val q = e.filter($"vec_id" < NumQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      val levels = graft.operators.GraphSearch.storedLevels(s, hDir)
      def masked(name: String) = s.read.parquet(s"$hDir/$name")
        .filter(!isDel($"vec_id") && !isDel($"neighbor_id"))
      val entry = live
        .filter(graft.operators.GraphSearch.levelAtLeast($"vec_id", levels))
        .agg(min($"vec_id").as("node"))
      val stored = s.read.parquet(s"$gDir/edges")
        .filter(!isDel($"vec_id") && !isDel($"neighbor_id"))
      graft.operators.GraphSearch.hnswSearchFrames(s,
          (levels to 1 by -1).map(l => masked(s"layer$l")),
          entry, stored, live, q,
          k = K, ef = GraphEf, hops = GraphHops,
          descentEf = HnswDescentEf, descentHops = HnswDescentHops)
        .orderBy("query_id", "rnk")
    }),

    // LAYERED compaction — close the layered delete cycle the way
    // v_graph_compact closes the flat one: fold the tombstone slice
    // out of each persisted layer table, re-link the nodes whose
    // adjacency the fold under-filled via the layer BUILD rule over
    // live members (GraphSearch.layerInsert — the same
    // insert-equals-rebuild core), recompute the entry over live
    // top-layer nodes; all into a compacted SIBLING store (atomic-swap
    // discipline, the shared artifact stays untouched). The entry
    // returns the repair delta: each affected node's new per-layer
    // adjacency. Scale shape: folds are scan-side predicates + one
    // write per layer; the re-link batch rides the probe/broadcast
    // side exactly as the insert path does, and upper layers shrink
    // geometrically.
    "v_hnsw_compact" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val hDir = IndexStore.hnsw(s, d, k = HnswLayerK)
      val cDir = IndexStore.hnswCompacted(s, d, DeleteMod, DeleteResidue,
        k = HnswLayerK)
      def isDel(c: org.apache.spark.sql.Column) =
        pmod(c, lit(DeleteMod)) === DeleteResidue
      (1L to graft.operators.GraphSearch.storedLevels(s, hDir)).map { lv =>
        val name = s"layer$lv"
        val affected = s.read.parquet(s"$hDir/$name")
          .filter(!isDel($"vec_id") && isDel($"neighbor_id"))
          .select($"vec_id").distinct()
        s.read.parquet(s"$cDir/$name")
          .join(broadcast(affected), "vec_id")
          .select(lit(lv).as("layer"), $"vec_id", $"neighbor_id",
            $"rnk", $"dist")
      }.reduce(_ unionAll _).orderBy("layer", "vec_id", "rnk")
    }),

    // Mutual-kNN clustering (the curation grouping pass: concept /
    // near-duplicate families over the embedding space): keep only
    // RECIPROCAL kNN-graph edges — a↔b each in the other's top-5, the
    // standard filter that stops hub vectors gluing everything into one
    // blob — then connected components (the d_dedup_cluster machinery)
    // label the families, with sizes. Edge set is bounded by n·k before
    // the reciprocity join; components contract label edges, never
    // enumerate pairs.
    "v_embed_clusters" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      // consumed on both sides of the reciprocity join: cache so the
      // probe→topK pipeline computes once — populated EAGERLY, or the
      // join's concurrent scans compute uncached partitions twice
      val g = knnGraphRaw(s, d).select($"vec_id".as("a"), $"neighbor_id".as("b"))
        .cache()
      g.count()
      val mutual = g.join(g.select($"a".as("b2"), $"b".as("a2")),
          $"a" === $"a2" && $"b" === $"b2")
        .filter($"a" < $"b").select($"a", $"b").distinct()
      val nodes = load(s, d, "embeddings").select($"vec_id")
      // trustedEndpoints: the kNN-graph edges are ranked members of the
      // same embeddings frame the nodes project from — ⊆ by construction
      val comp = graft.operators.ConnectedComponents.minLabel(
        nodes, "vec_id", mutual, "a", "b",
        validateNodes = false, trustedEndpoints = true)
      // minLabel checkpoints its edge set on entry, so by
      // now the reciprocity join has run — the graph cache is dead
      g.unpersist(false)
      val sizes = comp.groupBy($"component").agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "component")
        .select($"id".as("vec_id"), $"component".as("cluster_id"),
          $"cluster_size")
        .transform(graft.queries.DedupQueries.orderedLarge(_, "vec_id"))
    }),

    // Reconstruction-error audit of the compression ladder — the
    // companion table to v_nprobe_sweep (that one: recall per probe
    // cost; this one: information lost per compression rung). Mean
    // squared reconstruction error of SQ8 (4×) and PQ (32×) against the
    // raw vectors, each decoded exactly as its ADC scorer decodes.
    // Per-vector errors fold in dimension order, then round to integer
    // MICROS before the cross-vector sum — a float sum across a
    // distributed scan has no defined order, so the corpus total rides
    // exact longs (the q_zscore_outliers discipline).
    "v_quantize_error" -> ((s: SparkSession, d: String) => {
      import s.implicits._
      val dim = 64
      val e = load(s, d, "embeddings").select($"vec_id", $"embedding")
      def err(xhat: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        round(aggregate(sequence(lit(1), lit(dim)), lit(0.0), (acc, j) => {
          val xj = element_at($"embedding", j).cast("double")
          val dlt = xj - xhat(j)
          acc + dlt * dlt
        }) * 1e6).cast("long").as("em")
      val sqDir = IndexStore.sq8(s, d)
      val (mins, scales) = graft.operators.Sq8Index
        .gridArrays(s.read.parquet(s"$sqDir/grid"))
      val (mn, sc) = (typedlit(mins), typedlit(scales))
      val sq8 = e.join(s.read.parquet(s"$sqDir/codes"), "vec_id")
        .select(err(j => element_at(mn, j) +
          element_at($"codes", j).cast("double") * element_at(sc, j)))
        .agg(count(lit(1)).as("n_vectors"), sum($"em").as("total_err_micro"))
        .select(lit("sq8").as("method"), $"n_vectors", $"total_err_micro")
      val pqDir = IndexStore.pq(s, d)
      val books = s.read.parquet(s"$pqDir/codebooks").orderBy("sub", "code")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
      val cb: Seq[Seq[Seq[Double]]] = (0 until 8).map(su =>
        books.filter(_._1 == su).sortBy(_._2)
          .map(_._3.map(_.toDouble).toSeq).toSeq)
      val cbLit = typedlit(cb)
      val pq = e.join(s.read.parquet(s"$pqDir/codes"), "vec_id")
        .select(err { j =>
          val sub = floor((j - 1) / 8).cast("int")
          val pos = pmod(j - 1, lit(8)).cast("int")
          element_at(element_at(element_at(cbLit, sub + 1),
            element_at($"codes", sub + 1) + 1), pos + 1)
        })
        .agg(count(lit(1)).as("n_vectors"), sum($"em").as("total_err_micro"))
        .select(lit("pq8x16").as("method"), $"n_vectors", $"total_err_micro")
      pq.unionAll(sq8)
        .select($"method", $"n_vectors", $"total_err_micro",
          round(($"total_err_micro".cast("double") / $"n_vectors") / 1e6, 6)
            .as("mean_sq_err"))
        .orderBy("method")
    })
  )

  private val NprobeSweep = Seq(1, 2, 4, 8)

  /** v_ef_sweep's beam widths (all >= K: the final top-k reads off the
    * ef-beam's scored set). */
  private val EfSweep = Seq(10, 16, 24)

  /** v_hnsw_search's layer parameters: per-node edge budget of the
    * upper-layer graphs, and the descent's beam width / hop budget per
    * layer (beam 2 = greedy with one fallback frontier; ONE set of
    * constants feeds the engine, the oracle, and the spec). */
  private[graft] val HnswLayerK = 3
  private[graft] val HnswDescentEf = 2
  private[graft] val HnswDescentHops = 2

  /** The hnsw oracles replay the SAME data-sized layer ladder the
    * engine builds: one (level, nprobe) pair per upper layer, levels
    * from IndexStore.hnswLevels (the occupancy law + populated-slice
    * clamp + any forcing override) and nprobe from
    * GraphSearch.hnswNprobe over the SAME centroid count the build
    * probed — derived in one place so engine and oracle can only
    * agree or both be wrong. Ascending (layer 1 first). */
  private[graft] def hnswLayerLadder(s: SparkSession, d: String,
      nClusters: Int): Seq[(Int, Int)] =
    (1 to IndexStore.hnswLevels(s, d)).map(l =>
      l -> graft.operators.GraphSearch.hnswNprobe(l, nClusters))

  /** v_graph_insert's "new batch" slice: vec_id % mod == residue.
    * ONE pair of constants feeds the engine Column predicate, the
    * oracle SQL string, and the spec — three hand-copies of the
    * predicate could silently drift and only surface as an opaque
    * hash-gate mismatch. */
  private[graft] val InsertBatchMod = 25
  private[graft] val InsertBatchResidue = 3

  /** v_graph_delete's soft-deleted slice: vec_id % mod == residue —
    * same ONE-definition discipline as the insert batch. */
  private[graft] val DeleteMod = 17
  private[graft] val DeleteResidue = 5

  /** v_hnsw_insert's "new batch" slice — its own rule (disjoint from
    * the flat-graph slices) chosen so the batch holds nodes at EVERY
    * level at gate scale (sf0.01: 25 ids, 4 at level ≥1, 2 at level 2
    * under [[graft.operators.GraphSearch.levelCol]]); a batch with no
    * upper-level node would leave the layer-2 linking rule exercised
    * by an empty frame. Levels are a pure function of the id, so the
    * slice's level census shifts only if the corpus size does. */
  private[graft] val HnswInsertMod = 20
  private[graft] val HnswInsertResidue = 11

  /** Oracles for the seeded-KMeans entries, generated from the PERSISTED
    * index (see [[graft.operators.IndexOracle]]): centroids/codebooks are
    * read back and embedded as exact double literals, and assignment +
    * probe selection + ranking are re-derived independently in SQL. The
    * generation needs a live session and a built index — Verify runs all
    * queries (which build it) before dumping oracle SQL and pins the
    * sfDir via `graft.oracle.sfDir`; anywhere that context is missing
    * these entries simply stay rows-only (the pre-round-3 behavior). */
  /** The oracle keys whose SQL is generated FROM the persisted index —
    * computing them forces an index build. Single-query tooling
    * (VerifyOne) consults this to avoid paying a full IVF+PQ fit just
    * to materialize oracle strings for unrelated queries. */
  val AnnOracleKeys: Set[String] =
    Set("v_ivf_build", "v_ivf_search", "v_ivf_filtered", "v_pq_search",
      "v_pq_rerank", "v_opq_search", "v_ivfpq_search", "d_semantic_dedup",
      "v_nprobe_sweep", "v_quantize_error", "v_knn_graph", "v_ivf_stats",
      "v_ivf_split", "v_ivf_balance", "v_ivf_merge", "v_maxsim_pruned",
      "v_ood_score", "v_embed_clusters", "v_graph_search", "v_ef_sweep",
      "v_graph_insert", "v_hnsw_search", "v_hnsw_insert", "v_hnsw_delete",
      "v_hnsw_compact", "v_hnsw_stats", "v_mips_ivf", "v_ivfpq_residual",
      "v_graph_delete", "v_graph_compact", "v_graph_stats")

  /** The approximate kNN graph (v_knn_graph before output ordering):
    * every vector probes its 2 nearest persisted IVF centroids and
    * ranks candidates from those clusters — shared by the graph entry
    * and the mutual-kNN clustering. */
  private def knnGraphRaw(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val dir = IndexStore.graphIvf(s, d)
    val cent = s.read.parquet(s"$dir/centroids")
      .select($"cluster_id", $"centroid")
    val e = load(s, d, "embeddings").select($"vec_id", $"embedding")
    // k×-expansion stages: scan and join parallelism both floored
    // (Expand scaladocs — byte-based split sizing and AQE are blind
    // to the |cent|× probe fan-out and the population× join fan-out);
    // qv rides the probe row so the fan-out is scored AT the members
    // join and dies in the same stage's partial top-k — only
    // |queries|×k rows ever cross a shuffle (GraphSearch discipline)
    val probes = graft.operators.Expand.floorParallelism(e)
      .crossJoin(broadcast(cent))
      .groupBy($"vec_id")
      .agg(topK(l2Sq($"embedding", $"centroid"), $"cluster_id".cast("long"), 2)
        .as("ps"),
        first($"embedding").as("qv"))
      .select($"vec_id".as("query_id"), $"qv",
        explode(transform($"ps", p => p.getField("id"))).as("cluster_id"))
    val members = s.read.parquet(s"$dir/assignments")
      .select($"vec_id".as("neighbor_id"), $"embedding".as("nv"),
        $"cluster_id".cast("long").as("cluster_id"))
    graft.operators.Expand.pinJoinParallelism(probes, $"cluster_id")
      .join(graft.operators.Expand.floorParallelism(members), "cluster_id")
      .filter($"neighbor_id" =!= $"query_id")
      .groupBy($"query_id")
      .agg(topK(l2Sq($"nv", $"qv"), $"neighbor_id", 5).as("nn"))
      .select($"query_id".as("vec_id"), posexplode($"nn"))
      .select($"vec_id", $"col.id".as("neighbor_id"),
        ($"pos" + 1).cast("long").as("rnk"),
        round(sqrt($"col.score"), 4).as("dist"))
  }

  private def annOracles: Map[String, String] = try {
    val s = SparkSession.active
    val d = sys.props.getOrElse("graft.oracle.sfDir", "/root/testdata/sf0.01")
    val ivfDir = IndexStore.ivf(s, d, k = 16)
    val cent = s.read.parquet(s"$ivfDir/centroids").orderBy("cluster_id")
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
    // the graph family replays the GRAPH coarse store (graphIvf). At
    // oracle scale chooseK floors at 16 so this is the same ivf16m
    // artifact — collected separately so oracle and engine stay keyed
    // to one store by construction, not by coincidence of scale
    val gcent = {
      val gDir = IndexStore.graphIvf(s, d)
      s.read.parquet(s"$gDir/centroids").orderBy("cluster_id")
        .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
    }
    val pqDir = IndexStore.pq(s, d)
    val books = s.read.parquet(s"$pqDir/codebooks").orderBy("sub", "code")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2))).toSeq
    val built = Map(
      "v_ivf_build" -> graft.operators.IndexOracle.ivfBuildOracle(cent),
      "v_ivf_search" -> graft.operators.IndexOracle
        .ivfSearchOracle(cent, K, nprobe = 4, NumQueries),
      "v_ivf_filtered" -> graft.operators.IndexOracle
        .ivfFilteredSearchOracle(cent, K, nprobe = 4, NumQueries,
          labels = Seq(1, 2, 3)),
      "v_pq_search" -> graft.operators.IndexOracle
        .pqSearchOracle(books, numSub = 8, subDim = 8, K, NumQueries),
      "v_pq_rerank" -> graft.operators.IndexOracle
        .pqRerankOracle(books, numSub = 8, subDim = 8, K,
          refineFactor = 4, NumQueries),
      "v_opq_search" -> {
        val opqDir = IndexStore.opq(s, d)
        val operm = graft.operators.OpqIndex.permArray(
          s.read.parquet(s"$opqDir/perm")).toSeq
        val obooks = s.read.parquet(s"$opqDir/codebooks")
          .orderBy("sub", "code").collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2))).toSeq
        graft.operators.IndexOracle.opqRerankOracle(operm, obooks,
          numSub = 8, subDim = 8, K, refineFactor = 4, NumQueries)
      },
      "v_ivfpq_search" -> graft.operators.IndexOracle
        .ivfPqSearchOracle(cent, books, numSub = 8, subDim = 8, K,
          nprobe = 4, NumQueries),
      // keyed to the GRAPH coarse store (graphIvf) like the graph
      // family: at oracle scale it resolves to the same ivf16m
      // centroids, by construction rather than coincidence
      "d_semantic_dedup" -> graft.operators.IndexOracle
        .semanticDedupOracle(gcent, SemDedupTau),
      "v_ood_score" -> graft.operators.IndexOracle
        .oodScoreOracle(cent, topN = 50),
      "v_ivf_stats" -> graft.operators.IndexOracle.ivfStatsOracle(cent),
      "v_ivf_split" -> graft.operators.IndexOracle
        .ivfSplitOracle(cent, dim = 64),
      "v_ivf_merge" -> graft.operators.IndexOracle
        .ivfMergeOracle(cent, dim = 64, num = 9, den = 10),
      "v_ivf_balance" -> {
        val (tp, mp) = balancePops(s, d)
        val bDir = IndexStore.ivfBalanced(s, d, k = 16,
          targetPop = tp, maxPop = mp)
        val baseCent = s.read.parquet(s"$bDir/centroids0")
          .orderBy("cluster_id").collect()
          .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
        val balRows = s.read.parquet(s"$bDir/centroids")
          .orderBy("cluster_id").collect()
        graft.operators.IndexOracle.ivfBalanceOracle(
          baseCent,
          balRows.map(r => (r.getInt(0), r.getInt(2), r.getString(3))).toSeq,
          // the argmin replay needs every per-parent candidate: trained
          // geo subs AND salt anchors. An anchor is usually a relabeled
          // geo sub (parent = its group), but after the empty-sample
          // guard it can be an UNTRAINED group's original centroid
          // (parent = self; IvfBalanceSpec pins that case) — the replay
          // degenerates to a single candidate and members stay put, so
          // do NOT "simplify" this filter to method == 'split' or
          // assert parent != self
          balRows.filter(r => Set("split", "salt_anchor")(r.getString(3)))
            .map(r => (r.getInt(0), r.getInt(2), r.getSeq[Float](1))).toSeq)
      },
      "v_maxsim_pruned" -> graft.operators.IndexOracle
        .maxsimPrunedOracle(cent, kAnn = 8, nprobe = 2, k = 5,
          groupWidth = graft.operators.MaxSim.GroupWidth,
          numQueryVecs = graft.operators.MaxSim.NumQueryVecs),
      "v_nprobe_sweep" -> graft.operators.IndexOracle
        .nprobeSweepOracle(cent, K, NprobeSweep, NumQueries),
      "v_quantize_error" -> graft.operators.IndexOracle
        .quantizeErrorOracle(books, numSub = 8, subDim = 8, dim = 64),
      "v_knn_graph" -> graft.operators.IndexOracle
        .knnGraphOracle(gcent, k = 5, nprobe = 2),
      "v_graph_stats" -> graft.operators.IndexOracle
        .graphStatsOracle(gcent, k = 5, nprobe = 2),
      "v_embed_clusters" -> graft.operators.IndexOracle
        .embedClustersOracle(gcent, k = 5, nprobe = 2),
      "v_graph_search" -> graft.operators.IndexOracle
        .graphSearchOracle(gcent, K, GraphEf, GraphHops, NumQueries,
          graphK = 5, graphNprobe = 2),
      "v_ef_sweep" -> graft.operators.IndexOracle
        .efSweepOracle(gcent, K, EfSweep, GraphHops, NumQueries,
          graphK = 5, graphNprobe = 2),
      "v_graph_insert" -> graft.operators.IndexOracle
        .graphInsertOracle(gcent, k = 5, ef = GraphEf, hops = GraphHops,
          batchPredOf = c => s"($c % $InsertBatchMod) = $InsertBatchResidue",
          graphK = 5, graphNprobe = 2),
      "v_hnsw_search" -> graft.operators.IndexOracle
        .hnswSearchOracle(gcent, K, GraphEf, GraphHops, NumQueries,
          graphK = 5, graphNprobe = 2, layerK = HnswLayerK,
          descentEf = HnswDescentEf, descentHops = HnswDescentHops,
          layers = hnswLayerLadder(s, d, gcent.size)),
      "v_hnsw_insert" -> graft.operators.IndexOracle
        .hnswInsertOracle(gcent, layerK = HnswLayerK,
          batchPredOf = c => s"($c % $HnswInsertMod) = $HnswInsertResidue",
          layers = hnswLayerLadder(s, d, gcent.size)),
      "v_hnsw_stats" -> graft.operators.IndexOracle
        .hnswStatsOracle(gcent, layerK = HnswLayerK,
          layers = hnswLayerLadder(s, d, gcent.size)),
      "v_hnsw_delete" -> graft.operators.IndexOracle
        .hnswDeleteOracle(gcent, K, GraphEf, GraphHops, NumQueries,
          delPredOf = c => s"($c % $DeleteMod) = $DeleteResidue",
          graphK = 5, graphNprobe = 2, layerK = HnswLayerK,
          descentEf = HnswDescentEf, descentHops = HnswDescentHops,
          layers = hnswLayerLadder(s, d, gcent.size)),
      "v_hnsw_compact" -> graft.operators.IndexOracle
        .hnswCompactOracle(gcent, layerK = HnswLayerK,
          delPredOf = c => s"($c % $DeleteMod) = $DeleteResidue",
          layers = hnswLayerLadder(s, d, gcent.size)),
      "v_graph_delete" -> graft.operators.IndexOracle
        .graphDeleteOracle(gcent, K, GraphEf, GraphHops, NumQueries,
          delPredOf = c => s"($c % $DeleteMod) = $DeleteResidue",
          graphK = 5, graphNprobe = 2),
      "v_graph_compact" -> graft.operators.IndexOracle
        .graphCompactOracle(gcent, k = 5, ef = GraphEf, hops = GraphHops,
          delPredOf = c => s"($c % $DeleteMod) = $DeleteResidue",
          graphK = 5, graphNprobe = 2),
      "v_ivfpq_residual" -> {
        val rDir = IndexStore.ivfpqResidual(s, d)
        val rbooks = s.read.parquet(s"$rDir/codebooks").orderBy("sub", "code")
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
          .toSeq
        graft.operators.IndexOracle.ivfPqResidualOracle(cent, rbooks,
          numSub = 8, subDim = 8, K, nprobe = 4, NumQueries)
      },
      "v_mips_ivf" -> {
        val mipsDir = IndexStore.mips(s, d, k = 16)
        val mipsCent = s.read.parquet(s"$mipsDir/centroids")
          .orderBy("cluster_id")
          .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
        val m2 = s.read.parquet(s"$mipsDir/meta").collect()(0).getDouble(0)
        graft.operators.IndexOracle
          .mipsIvfOracle(mipsCent, m2, K, nprobe = 4, NumQueries)
      })
    // AnnOracleKeys is VerifyOne's routing table for exactly this map:
    // a key added here but not there would silently route to the static
    // maps and emit no oracle
    require(built.keySet == AnnOracleKeys,
      s"AnnOracleKeys out of sync: ${built.keySet.diff(AnnOracleKeys)} / " +
        s"${AnnOracleKeys.diff(built.keySet)}")
    built
  } catch {
    // the documented degrade-to-rows-only cases (no live session / no
    // index context) — but NEVER silently: a generation regression that
    // dropped four queries from the hash gate with no signal would let
    // the "every query oracle-gated" claim rot invisibly
    case scala.util.control.NonFatal(e) =>
      System.err.println(
        s"[graft] ANN oracle generation skipped (rows-only fallback): $e")
      Map.empty
  }

  /** Oracles whose unrolled/shared CTE chains profiled faster under
    * DuckDB MATERIALIZED hints (HashSql.materializeCtes — measured at
    * sf0.01, results identical: v_ef_sweep 71→20 s, v_ivf_split 36→9 s,
    * v_graph_search 33→19 s, v_ivf_merge 28→9 s, v_knn_graph 17→10 s).
    * Entries NOT listed (v_hnsw_search, v_nprobe_sweep, the quantizer
    * family…) measured neutral-to-slower materialized and keep the
    * inlined form. */
  private val MaterializedOracles = Set(
    "d_semantic_dedup", "v_ivf_split", "v_ivf_merge", "v_knn_graph",
    "v_graph_stats", "v_graph_search", "v_ef_sweep", "v_graph_insert",
    "v_hnsw_delete", "v_hnsw_compact", "v_graph_delete", "v_graph_compact")

  def oracles: Map[String, String] = (annOracles ++ staticOracles).map {
    case (k, sql) if MaterializedOracles(k) =>
      k -> graft.functions.HashSql.materializeCtes(sql)
    case kv => kv
  }

  /** The index-independent oracle entries (safe to evaluate anywhere). */
  def staticOracles: Map[String, String] = Map(
    "v_sq8_search" -> graft.operators.IndexOracle
      .sq8SearchOracle(dim = 64, K, refineFactor = 4, NumQueries),

    "v_sq4_search" -> graft.operators.IndexOracle
      .sq8SearchOracle(dim = 64, K, refineFactor = 8, NumQueries,
        levels = 15),

    "v_bq_search" -> graft.operators.IndexOracle
      .bqSearchOracle(dim = 64, K, refineFactor = 8, NumQueries),

    "v_rp_search" -> graft.operators.IndexOracle.rpSearchOracle(
      graft.operators.RpSearch.signs(outDim = 16, inDim = 64),
      dim = 64, outDim = 16, K, refineFactor = 4, NumQueries),

    "v_matryoshka_search" -> graft.operators.IndexOracle
      .matryoshkaOracle(dim = 64, prefixDim = 16, K,
        refineFactor = 4, NumQueries),

    "v_lsh_multiprobe" -> graft.operators.IndexOracle
      .multiprobeOracle(dim = 64, nPlanes = 8, K, NumQueries),

    "v_refine_sweep" -> graft.operators.IndexOracle
      .refineSweepOracle(dim = 64, prefixDim = 16, K,
        factors = Seq(1, 2, 4, 8), NumQueries),

    "v_lsh_bucket" -> {
      val b = LshBuckets.bucketSql("embedding", 64, 8)
      s"""SELECT $b AS bucket, count(*) AS n_vectors
         |FROM embeddings GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "v_recall_at_k" ->
      """WITH ranked AS (
        |  SELECT q.vec_id AS query_id, b.vec_id AS nid,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_distance(b.embedding::DOUBLE[], q.embedding::DOUBLE[]), b.vec_id) AS r_l2,
        |    row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY -list_inner_product(b.embedding::DOUBLE[], q.embedding::DOUBLE[]), b.vec_id) AS r_dp
        |  FROM embeddings b CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 8) q
        |)
        |SELECT query_id,
        |  round(len(list_intersect(
        |    list(nid) FILTER (r_l2 <= 10),
        |    list(nid) FILTER (r_dp <= 10)))::DOUBLE / 10, 4) AS recall
        |FROM ranked GROUP BY query_id ORDER BY query_id""".stripMargin
  )
}
