package graft.operators

/** DuckDB oracle SQL for the ANN search entries, generated from the
  * PERSISTED index artifacts (IndexStore): the fitted centroids /
  * codebooks are embedded as exact round-trip double literals, and
  * everything downstream of the fit — nearest-centroid assignment, probe
  * selection, asymmetric-distance ranking, tie-breaks, rounding — is
  * recomputed independently in SQL and held to the full hash gate.
  *
  * What this does and does not verify: the Lloyd FITTING itself is
  * deterministic-seeded and remains property-spec-gated (IvfIndexSpec,
  * ClusteredRecallSpec); the oracle takes the fitted codebook as given,
  * the way benchmark/recall_bench.cpp takes its built graph as given
  * and then checks the search results against ground truth. Every
  * float op after the fit is replicated bit-for-bit: l2Sq's sequential
  * double fold over float32 elements is mirrored with an ordered
  * list_reduce, so argmin/rank decisions agree exactly, not just to a
  * rounding tolerance.
  */
object IndexOracle {

  private def lit(v: Seq[Float]): String =
    v.map(_.toDouble.toString).mkString("[", ",", "]")

  /** Exact L2SqDistance replication: the kernels' lane-4 fold of
    * squared element diffs (float32 read as exact double), matching
    * the native expression's lane law term for term
    * ([[graft.functions.FoldSql.lane4]]) — no list_sum (summation
    * order there is unspecified), no list_distance (sqrt could
    * collapse adjacent doubles and flip an argmin). `off` = 0-based
    * element offset into `vexpr` (for PQ subvectors — the engine
    * slices BEFORE the kernel, so lane position is position within
    * the subvector, exactly this fold's `i`). */
  private def l2sqLit(vexpr: String, off: Int, cvec: Seq[Float]): String = {
    val c = lit(cvec)
    val idx = if (off == 0) "i" else s"$off+i"
    graft.functions.FoldSql.lane4(
      s"(($vexpr)[$idx]::DOUBLE - ($c)[i])*(($vexpr)[$idx]::DOUBLE - ($c)[i])",
      cvec.length)
  }

  /** Column-vs-column variant of the same fold. */
  private def l2sqCol(a: String, b: String, dim: Int): String =
    graft.functions.FoldSql.lane4(
      s"(($a)[i]::DOUBLE - ($b)[i]::DOUBLE)*(($a)[i]::DOUBLE - ($b)[i]::DOUBLE)",
      dim)

  /** CTE `a`: every vector re-assigned to its nearest literal centroid
    * (first-position tie-break == min_by(code, struct(d, code))). */
  private def assignCte(centroids: Seq[(Int, Seq[Float])]): String = {
    val dists = centroids.map { case (_, c) => l2sqLit("embedding", 0, c) }
      .mkString("[", ",\n ", "]")
    s"""a AS (
       |  SELECT vec_id, embedding, list_position(ds, list_min(ds)) - 1 AS cluster_id
       |  FROM (SELECT vec_id, embedding, $dists AS ds FROM embeddings)
       |)""".stripMargin
  }

  /** v_ivf_build: the persisted cluster histogram, from scratch. */
  def ivfBuildOracle(centroids: Seq[(Int, Seq[Float])]): String =
    s"""WITH ${assignCte(centroids)}
       |SELECT cluster_id::BIGINT AS cluster_id, count(*) AS n_vectors
       |FROM a GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  /** d_semantic_dedup: re-derive the cluster assignment from literal
    * centroids, then flag every vector with a SMALLER-id same-cluster
    * neighbor inside the cosine ball — a fully disjoint derivation
    * (list_cosine_similarity vs the native expression, LEFT JOIN
    * DISTINCT vs the semi-join). */
  def semanticDedupOracle(centroids: Seq[(Int, Seq[Float])],
      tau: Double): String =
    s"""WITH ${assignCte(centroids)},
       |dup AS (
       |  SELECT DISTINCT x.vec_id
       |  FROM a x JOIN a y ON y.cluster_id = x.cluster_id
       |    AND y.vec_id < x.vec_id
       |    AND list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) > $tau)
       |SELECT a.vec_id, a.cluster_id::BIGINT AS cluster_id,
       |  dup.vec_id IS NOT NULL AS is_dup
       |FROM a LEFT JOIN dup USING (vec_id)
       |ORDER BY vec_id""".stripMargin

  /** v_ivf_search: probe the nprobe nearest literal centroids per query
    * (cdist then cluster_id, as the Window in searchPruned), fetch that
    * probe set's re-derived assignments, rank top-k by (l2sq, vec_id). */
  def ivfSearchOracle(centroids: Seq[(Int, Seq[Float])],
      k: Int, nprobe: Int, numQueries: Int): String = {
    val qdists = centroids.map { case (_, c) => l2sqLit("qv", 0, c) }
      .mkString("[", ",\n ", "]")
    val cids = centroids.map(_._1).mkString("[", ",", "]")
    s"""WITH ${assignCte(centroids)},
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |probes AS (
       |  SELECT query_id, cluster_id FROM (
       |    SELECT query_id, cid AS cluster_id, d,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS crnk
       |    FROM (SELECT query_id, unnest($cids) AS cid, unnest(ds) AS d
       |          FROM (SELECT query_id, $qdists AS ds FROM q))
       |  ) WHERE crnk <= $nprobe
       |),
       |cand AS (
       |  SELECT p.query_id, q.qv, a.vec_id, a.embedding
       |  FROM probes p JOIN a ON a.cluster_id = p.cluster_id
       |  JOIN q ON q.query_id = p.query_id
       |)
       |SELECT query_id, neighbor_id, rnk, dist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rnk,
       |    round(sqrt(d), 4) AS dist
       |  FROM (SELECT query_id, vec_id, ${l2sqCol("embedding", "qv", 64)} AS d FROM cand)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_nprobe_sweep: recall@k vs exact ground truth for EVERY swept
    * nprobe in one statement — probes ranked once, each sweep point
    * takes its crnk ≤ nprobe prefix (non-equi join on the bounded
    * ranked-cluster frame). avg_recall is total_hits / (k·n_queries):
    * one exact integer division, never a float average of per-query
    * recalls (whose summation order is engine-dependent). */
  def nprobeSweepOracle(centroids: Seq[(Int, Seq[Float])],
      k: Int, nprobes: Seq[Int], numQueries: Int): String = {
    val qdists = centroids.map { case (_, c) => l2sqLit("qv", 0, c) }
      .mkString("[", ",\n ", "]")
    val cids = centroids.map(_._1).mkString("[", ",", "]")
    s"""WITH ${assignCte(centroids)},
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |ranked AS (
       |  SELECT query_id, cid AS cluster_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS crnk
       |  FROM (SELECT query_id, unnest($cids) AS cid, unnest(ds) AS d
       |        FROM (SELECT query_id, $qdists AS ds FROM q))),
       |gt AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT q.query_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${l2sqCol("e.embedding", "q.qv", 64)}, e.vec_id) AS rnk
       |    FROM embeddings e, q) WHERE rnk <= $k),
       |np AS (SELECT unnest([${nprobes.mkString(",")}]) AS nprobe),
       |cand AS (
       |  SELECT n.nprobe, r.query_id, a.vec_id,
       |    ${l2sqCol("a.embedding", "q.qv", 64)} AS dd
       |  FROM np n
       |  JOIN ranked r ON r.crnk <= n.nprobe
       |  JOIN a ON a.cluster_id = r.cluster_id
       |  JOIN q ON q.query_id = r.query_id),
       |res AS (
       |  SELECT nprobe, query_id, vec_id FROM (
       |    SELECT nprobe, query_id, vec_id,
       |      row_number() OVER (PARTITION BY nprobe, query_id
       |        ORDER BY dd, vec_id) AS rnk
       |    FROM cand) WHERE rnk <= $k),
       |hits AS (
       |  SELECT nprobe, count(*) AS total_hits
       |  FROM res JOIN gt USING (query_id, vec_id) GROUP BY nprobe),
       |nq AS (SELECT count(*)::BIGINT AS n_queries FROM q)
       |SELECT n.nprobe::BIGINT AS nprobe, n_queries,
       |  coalesce(total_hits, 0)::BIGINT AS total_hits,
       |  round(coalesce(total_hits, 0)::DOUBLE / ($k * n_queries), 4) AS avg_recall
       |FROM np n LEFT JOIN hits h ON h.nprobe = n.nprobe, nq
       |ORDER BY nprobe""".stripMargin
  }

  /** v_ivf_filtered: the ivfSearchOracle pipeline with the metadata
    * predicate applied to candidates BEFORE ranking (the pre-filter
    * contract: the heap only sees label-passing vectors). */
  def ivfFilteredSearchOracle(centroids: Seq[(Int, Seq[Float])],
      k: Int, nprobe: Int, numQueries: Int, labels: Seq[Int]): String = {
    val qdists = centroids.map { case (_, c) => l2sqLit("qv", 0, c) }
      .mkString("[", ",\n ", "]")
    val cids = centroids.map(_._1).mkString("[", ",", "]")
    val labelList = labels.mkString("(", ", ", ")")
    s"""WITH ${assignCte(centroids)},
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |probes AS (
       |  SELECT query_id, cluster_id FROM (
       |    SELECT query_id, cid AS cluster_id, d,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS crnk
       |    FROM (SELECT query_id, unnest($cids) AS cid, unnest(ds) AS d
       |          FROM (SELECT query_id, $qdists AS ds FROM q))
       |  ) WHERE crnk <= $nprobe
       |),
       |cand AS (
       |  SELECT p.query_id, q.qv, a.vec_id, a.embedding
       |  FROM probes p JOIN a ON a.cluster_id = p.cluster_id
       |  JOIN embeddings em ON em.vec_id = a.vec_id
       |  JOIN q ON q.query_id = p.query_id
       |  WHERE em.label IN $labelList
       |)
       |SELECT query_id, neighbor_id, rnk, dist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rnk,
       |    round(sqrt(d), 4) AS dist
       |  FROM (SELECT query_id, vec_id, ${l2sqCol("embedding", "qv", 64)} AS d FROM cand)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_knn_graph: every vector re-assigned (assignCte), every vector's
    * nprobe nearest clusters re-ranked from the literal centroids, the
    * probed members ranked by exact L2 with self-pairs dropped before
    * ranking — byte-for-byte the graph construction, re-derived. */
  /** CTE block ending in `kg(vec_id, neighbor_id, rnk, dist)` — the
    * approximate kNN graph, shared by the graph and clustering oracles. */
  private def knnGraphCtes(centroids: Seq[(Int, Seq[Float])],
      k: Int, nprobe: Int): String = {
    val qdists = centroids.map { case (_, c) => l2sqLit("embedding", 0, c) }
      .mkString("[", ",\n ", "]")
    val cids = centroids.map(_._1).mkString("[", ",", "]")
    s"""${assignCte(centroids)},
       |probes AS (
       |  SELECT query_id, cluster_id FROM (
       |    SELECT query_id, cid AS cluster_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS crnk
       |    FROM (SELECT query_id, unnest($cids) AS cid, unnest(ds) AS d
       |          FROM (SELECT vec_id AS query_id, $qdists AS ds FROM embeddings))
       |  ) WHERE crnk <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id,
       |    ${l2sqCol("a.embedding", "q.embedding", 64)} AS d
       |  FROM probes p
       |  JOIN a ON a.cluster_id = p.cluster_id
       |  JOIN embeddings q ON q.vec_id = p.query_id
       |  WHERE a.vec_id != p.query_id),
       |kg AS (
       |  SELECT vec_id, neighbor_id, rnk, dist FROM (
       |    SELECT query_id AS vec_id, cand.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d, cand.vec_id) AS rnk,
       |      round(sqrt(d), 4) AS dist
       |    FROM cand
       |  ) WHERE rnk <= $k)""".stripMargin
  }

  def knnGraphOracle(centroids: Seq[(Int, Seq[Float])],
      k: Int, nprobe: Int): String =
    s"""WITH ${knnGraphCtes(centroids, k, nprobe)}
       |SELECT vec_id, neighbor_id, rnk, dist FROM kg
       |ORDER BY vec_id, rnk""".stripMargin

  /** v_graph_stats: the in-degree distribution of the kNN graph,
    * re-derived from the literal coarse centroids (same edge CTEs as
    * the v_knn_graph gate) — in-degree-0 nodes surface via the corpus
    * left join, shares in basis points by integer division. */
  def graphStatsOracle(centroids: Seq[(Int, Seq[Float])],
      k: Int, nprobe: Int): String =
    s"""WITH ${knnGraphCtes(centroids, k, nprobe)},
       |ind AS (
       |  SELECT e.vec_id, coalesce(g.c, 0) AS in_degree
       |  FROM (SELECT vec_id FROM embeddings) e
       |  LEFT JOIN (SELECT neighbor_id AS vec_id, count(*) AS c
       |             FROM kg GROUP BY neighbor_id) g USING (vec_id)),
       |nn AS (SELECT count(*) AS n FROM ind)
       |SELECT in_degree::BIGINT AS in_degree, count(*)::BIGINT AS n_nodes,
       |  ((count(*) * 10000) // n)::BIGINT AS share_bp
       |FROM ind, nn GROUP BY in_degree, n
       |ORDER BY in_degree""".stripMargin

  /** v_graph_search: the beam search over the kNN graph, re-derived end
    * to end — graph edges from the literal centroids (knnGraphCtes),
    * per-cluster medoids (nearest-own-centroid member, ties by vec_id),
    * entry = the medoids of each query's `entries` nearest centroids
    * (the engine's multi-entry frontier), then `hops`
    * UNROLLED expand→score→keep-ef rounds (UNION dedup == the engine's
    * distinct), final answer = the k best of the last scored set. Every
    * rank orders by (exact-fold d, node), so the traversal is replayed
    * decision for decision. */
  def graphSearchOracle(centroids: Seq[(Int, Seq[Float])], k: Int, ef: Int,
      hops: Int, numQueries: Int, graphK: Int, graphNprobe: Int,
      entries: Int = 2): String =
    s"""WITH ${graphHeadCtes(centroids, numQueries, entries, graphK, graphNprobe)},
       |${beamRounds("", ef, hops)}
       |SELECT query_id, node AS neighbor_id, r AS rnk,
       |  round(sqrt(d), 4) AS dist
       |FROM s$hops WHERE r <= $k ORDER BY query_id, rnk""".stripMargin

  /** v_ef_sweep: the recall-vs-beam-width curve (recall_bench.cpp's
    * ef_search sweep over the GRAPH serving path — v_nprobe_sweep
    * covers the IVF knob). The graph, entry, and ground-truth CTEs are
    * ef-independent and shared; each sweep point unrolls its own
    * prefixed beam rounds, and hits are counted against the exact
    * top-k per query. */
  def efSweepOracle(centroids: Seq[(Int, Seq[Float])], k: Int,
      efs: Seq[Int], hops: Int, numQueries: Int, graphK: Int,
      graphNprobe: Int, entries: Int = 2): String = {
    val perEf = efs.map(ef => beamRounds(s"e${ef}_", ef, hops)).mkString(",\n")
    val hits = efs.map { ef =>
      s"""h$ef AS (
         |  SELECT count(*) AS n FROM (
         |    SELECT query_id, node FROM e${ef}_s$hops WHERE r <= $k) g
         |  JOIN gtq ON gtq.query_id = g.query_id
         |    AND gtq.neighbor_id = g.node)""".stripMargin
    }.mkString(",\n")
    val rows = efs.map { ef =>
      s"""SELECT $ef::BIGINT AS ef, nq.n AS n_queries, h$ef.n AS total_hits,
         |  round(h$ef.n::DOUBLE / ($k * nq.n), 4) AS avg_recall
         |FROM h$ef, nq""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${graphHeadCtes(centroids, numQueries, entries, graphK, graphNprobe)},
       |gtq AS MATERIALIZED (
       |  SELECT query_id, vec_id AS neighbor_id FROM (
       |    SELECT q.query_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${l2sqCol("e.embedding", "q.qv", 64)}, e.vec_id) AS r
       |    FROM embeddings e CROSS JOIN q
       |  ) WHERE r <= $k),
       |nq AS (SELECT count(*)::BIGINT AS n FROM q),
       |$perEf,
       |$hits
       |SELECT * FROM ($rows) ORDER BY ef""".stripMargin
  }

  /** v_graph_insert: the HNSW insert path — each "new" vector (the
    * doc-slice predicate) beam-searches the graph with the new batch
    * MASKED out of medoids, edges, and candidates (the reference's
    * soft-delete filtering), and its k best become its new adjacency.
    * Same unrolled rounds as graphSearchOracle over the masked CTEs. */
  def graphInsertOracle(centroids: Seq[(Int, Seq[Float])], k: Int,
      ef: Int, hops: Int, batchPredOf: String => String, graphK: Int,
      graphNprobe: Int, entries: Int = 2): String =
    s"""WITH ${graphHeadCtes(centroids, 0, entries, graphK, graphNprobe,
           qPred = Some(batchPredOf("vec_id")),
           nodeMask = Some(batchPredOf))},
       |${beamRounds("", ef, hops)}
       |SELECT query_id AS vec_id, node AS neighbor_id, r AS rnk,
       |  round(sqrt(d), 4) AS dist
       |FROM s$hops WHERE r <= $k ORDER BY vec_id, rnk""".stripMargin

  /** v_graph_delete: the soft-delete search — deleted nodes masked out
    * of medoids, edges, and (by unreachability) candidates, queries
    * unchanged; graphSearchOracle's rounds over the masked head. */
  def graphDeleteOracle(centroids: Seq[(Int, Seq[Float])], k: Int,
      ef: Int, hops: Int, numQueries: Int, delPredOf: String => String,
      graphK: Int, graphNprobe: Int, entries: Int = 2): String =
    s"""WITH ${graphHeadCtes(centroids, numQueries, entries, graphK,
           graphNprobe, nodeMask = Some(delPredOf))},
       |${beamRounds("", ef, hops)}
       |SELECT query_id, node AS neighbor_id, r AS rnk,
       |  round(sqrt(d), 4) AS dist
       |FROM s$hops WHERE r <= $k ORDER BY query_id, rnk""".stripMargin

  /** v_graph_compact: the re-link search of graph compaction — each
    * AFFECTED node (live, with ≥1 tombstoned out-edge in the literal
    * graph) beam-searches the masked graph (graphDeleteOracle's head:
    * deleted nodes out of medoids, edges, and — by unreachability —
    * candidates) and its k best EXCLUDING ITSELF become its new
    * adjacency. Self-exclusion re-ranks after the filter, exactly as
    * GraphSearch.relinkFrames does (k ≤ ef−1, so the slots still
    * fill). */
  def graphCompactOracle(centroids: Seq[(Int, Seq[Float])], k: Int,
      ef: Int, hops: Int, delPredOf: String => String, graphK: Int,
      graphNprobe: Int, entries: Int = 2): String = {
    val qPred = s"NOT (${delPredOf("vec_id")}) AND vec_id IN " +
      s"(SELECT g2.vec_id FROM kg g2 WHERE ${delPredOf("g2.neighbor_id")})"
    s"""WITH ${graphHeadCtes(centroids, 0, entries, graphK, graphNprobe,
           qPred = Some(qPred), nodeMask = Some(delPredOf))},
       |${beamRounds("", ef, hops)}
       |SELECT vec_id, neighbor_id, rnk, dist FROM (
       |  SELECT query_id AS vec_id, node AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, node) AS rnk,
       |    round(sqrt(d), 4) AS dist
       |  FROM s$hops WHERE node <> query_id
       |) WHERE rnk <= $k ORDER BY vec_id, rnk""".stripMargin
  }

  /** The ef-independent head of the graph-search oracles: literal kNN
    * graph (MATERIALIZED), per-cluster medoids, the query frame, the
    * `entries`-nearest-centroid entry beam b0, and the undirected edge
    * view kgu. */
  private def graphHeadCtes(centroids: Seq[(Int, Seq[Float])],
      numQueries: Int, entries: Int, graphK: Int,
      graphNprobe: Int,
      qPred: Option[String] = None,
      nodeMask: Option[String => String] = None): String = {
    val edists = centroids.map { case (_, c) => l2sqLit("embedding", 0, c) }
      .mkString("[", ",\n ", "]")
    val qdists = centroids.map { case (_, c) => l2sqLit("qv", 0, c) }
      .mkString("[", ",\n ", "]")
    val cids = centroids.map(_._1).mkString("[", ",", "]")
    // a and kg are read in every unrolled round: MATERIALIZED, or the
    // engine may re-inline the literal-fold graph per reference (the
    // embedClustersOracle lesson)
    val ctes = knnGraphCtes(centroids, graphK, graphNprobe)
      .replaceFirst("\\Aa AS \\(", "a AS MATERIALIZED (")
      .replace("kg AS (", "kg AS MATERIALIZED (")
    s"""$ctes,
       |med AS (
       |  SELECT cluster_id, vec_id AS medoid FROM (
       |    SELECT cluster_id, vec_id,
       |      row_number() OVER (PARTITION BY cluster_id
       |        ORDER BY ds[cluster_id + 1], vec_id) AS r
       |    FROM (SELECT vec_id, cluster_id, $edists AS ds FROM a
       |          WHERE ${nodeMask.map(m => s"NOT (${m("vec_id")})").getOrElse("TRUE")})
       |  ) WHERE r = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qv
       |      FROM embeddings
       |      WHERE ${qPred.getOrElse(s"vec_id < $numQueries")}),
       |qc AS (
       |  SELECT query_id, cluster_id FROM (
       |    SELECT query_id, cid AS cluster_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS crnk
       |    FROM (SELECT query_id, unnest($cids) AS cid, unnest(ds) AS d
       |          FROM (SELECT query_id, $qdists AS ds FROM q))
       |  ) WHERE crnk <= $entries),
       |b0 AS (SELECT qc.query_id, med.medoid AS node
       |       FROM qc JOIN med USING (cluster_id)),
       |-- undirected expansion: every stored a->b edge is followed both
       |-- ways (the engine unions the reversed edge table; UNION dedup
       |-- == its distinct)
       |kept AS (
       |  SELECT vec_id, neighbor_id FROM kg
       |  WHERE ${nodeMask.map(m =>
             s"NOT (${m("vec_id")}) AND NOT (${m("neighbor_id")})")
            .getOrElse("TRUE")}),
       |kgu AS MATERIALIZED (
       |  SELECT vec_id, neighbor_id FROM kept
       |  UNION
       |  SELECT neighbor_id AS vec_id, vec_id AS neighbor_id FROM kept)""".stripMargin
  }

  /** One unrolled expand->score->keep-ef beam round chain; `prefix`
    * namespaces the round CTEs so several ef sweep points can share
    * one statement (hop 1 always enters from the shared b0). `edges` /
    * `entry` parametrize the undirected edge CTE and the entry beam —
    * the layered oracle runs this same chain per layer. */
  private def beamRounds(prefix: String, ef: Int, hops: Int,
      edges: String = "kgu", entry: String = "b0"): String =
    (1 to hops).map { h =>
      val prev = if (h == 1) entry else s"${prefix}b${h - 1}"
      s"""${prefix}c$h AS (
         |  SELECT query_id, node FROM $prev
         |  UNION
         |  SELECT b.query_id, $edges.neighbor_id AS node
         |  FROM $prev b JOIN $edges ON $edges.vec_id = b.node),
         |${prefix}s$h AS (
         |  SELECT query_id, node, d,
         |    row_number() OVER (PARTITION BY query_id ORDER BY d, node) AS r
         |  FROM (SELECT c.query_id, c.node,
         |          ${l2sqCol("e.embedding", "q2.qv", 64)} AS d
         |        FROM ${prefix}c$h c
         |        JOIN embeddings e ON e.vec_id = c.node
         |        JOIN q q2 ON q2.query_id = c.query_id)),
         |${prefix}b$h AS (SELECT query_id, node FROM ${prefix}s$h WHERE r <= $ef)""".stripMargin
    }.mkString(",\n")

  /** The deterministic HNSW level rule (GraphSearch.levelCol): a
    * multiplicative hash folded through a prime, a mid-square
    * avalanche pass, power-of-eight level buckets — P(≥l) = 8^-l up
    * to `maxLevel` (the buckets nest: 8^l | 8^(l+1)). */
  private def lvlCte(maxLevel: Int): String = {
    val arms = (maxLevel to 1 by -1).map { l =>
      s"WHEN (h * h + h) % 999983 % ${math.pow(8, l).toLong} = 0 THEN $l"
    }.mkString("\n    ", "\n         ", "")
    s"""lvl AS MATERIALIZED (
       |  SELECT vec_id,
       |    CASE$arms
       |         ELSE 0 END AS lv
       |  FROM (SELECT vec_id, KNUTH_H AS h
       |        FROM embeddings))""".stripMargin
      .replace("KNUTH_H", graft.functions.HashSql.knuthSql("vec_id", 1000003L))
  }

  /** One upper-layer graph re-derived among the level-≥`minLvl` nodes:
    * the knnGraphCtes probe rule truncated to the `shortlist`, then the
    * reference's select-neighbors heuristic unrolled BY SELECTION SLOT
    * (at most k=`k` neighbors ever get selected, so k CTEs cover the
    * whole sequential scan: slot j = the first candidate after slot
    * j-1 that is closer to the node than to every already-selected
    * neighbor), then nearest-rejected backfill — selected first in
    * scan order, rejected after, truncated at k. Ends in the
    * undirected `${p}kgu`. */
  private def layerGraphCtes(centroids: Seq[(Int, Seq[Float])],
      k: Int, nprobe: Int, minLvl: Int, p: String,
      shortlist: Int = 32,
      qPred: Option[String] = None,
      memberMask: Option[String => String] = None): String = {
    val qdists = centroids.map { case (_, c) => l2sqLit("embedding", 0, c) }
      .mkString("[", ",\n ", "]")
    val cids = centroids.map(_._1).mkString("[", ",", "]")
    val slots = (2 to k).map { j =>
      val joins = (1 until j).map(i =>
        s"""  JOIN ${p}sel$i s$i ON s$i.query_id = c.query_id
           |  JOIN embeddings se$i ON se$i.vec_id = s$i.vec_id""".stripMargin)
        .mkString("\n")
      val conds = (1 until j).map(i =>
        s"${l2sqCol("ce.embedding", s"se$i.embedding", 64)} >= c.d")
        .mkString("\n    AND ")
      s"""${p}sel$j AS (
         |  SELECT query_id, vec_id, cr FROM (
         |    SELECT c.query_id, c.vec_id, c.cr,
         |      row_number() OVER (PARTITION BY c.query_id ORDER BY c.cr) AS rr
         |    FROM ${p}cand c
         |    JOIN embeddings ce ON ce.vec_id = c.vec_id
         |$joins
         |    WHERE c.cr > s${j - 1}.cr
         |    AND $conds
         |  ) WHERE rr = 1)""".stripMargin
    }.mkString(",\n")
    val selUnion = (1 to k).map(j =>
      s"SELECT query_id, vec_id FROM ${p}sel$j").mkString("\n  UNION ALL\n  ")
    s"""${p}probes AS (
       |  SELECT query_id, cluster_id FROM (
       |    SELECT query_id, cid AS cluster_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS crnk
       |    FROM (SELECT query_id, unnest($cids) AS cid, unnest(ds) AS d
       |          FROM (SELECT e.vec_id AS query_id, $qdists AS ds
       |                FROM embeddings e JOIN lvl ON lvl.vec_id = e.vec_id
       |                WHERE lvl.lv >= $minLvl${qPred.map(q => s" AND $q").getOrElse("")}))
       |  ) WHERE crnk <= $nprobe),
       |${p}cand AS MATERIALIZED (
       |  SELECT query_id, vec_id, d, cr FROM (
       |    SELECT query_id, vec_id, d,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS cr
       |    FROM (
       |      SELECT p.query_id, a.vec_id,
       |        ${l2sqCol("a.embedding", "q.embedding", 64)} AS d
       |      FROM ${p}probes p
       |      JOIN a ON a.cluster_id = p.cluster_id
       |      JOIN lvl lm ON lm.vec_id = a.vec_id AND lm.lv >= $minLvl
       |      JOIN embeddings q ON q.vec_id = p.query_id
       |      WHERE a.vec_id != p.query_id${memberMask.map(m =>
             s" AND NOT (${m("a.vec_id")})").getOrElse("")})
       |  ) WHERE cr <= $shortlist),
       |${p}sel1 AS (SELECT query_id, vec_id, cr FROM ${p}cand WHERE cr = 1),
       |$slots,
       |${p}selall AS (
       |  $selUnion),
       |${p}kg AS MATERIALIZED (
       |  SELECT vec_id, neighbor_id, rnk, dist FROM (
       |    SELECT c.query_id AS vec_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY c.query_id
       |        ORDER BY (CASE WHEN s.vec_id IS NOT NULL THEN 0 ELSE 1 END),
       |                 c.cr) AS rnk,
       |      round(sqrt(c.d), 4) AS dist
       |    FROM ${p}cand c
       |    LEFT JOIN ${p}selall s
       |      ON s.query_id = c.query_id AND s.vec_id = c.vec_id
       |  ) WHERE rnk <= $k),
       |${p}kgu AS MATERIALIZED (
       |  SELECT vec_id, neighbor_id FROM ${p}kg
       |  UNION
       |  SELECT neighbor_id AS vec_id, vec_id AS neighbor_id FROM ${p}kg)""".stripMargin
  }

  /** v_hnsw_search: the full layered traversal re-derived end to end —
    * level rule, both upper-layer graphs, the min-id top-layer entry,
    * `descentHops` beam-`descentEf` rounds per upper layer (each
    * layer's final beam entering the next), then the standard layer-0
    * ef-beam rounds off the full kNN graph, final top-k. Every rank
    * orders by (exact-fold d, node), so the descent is replayed
    * decision for decision. */
  /** `layers` = the engine's data-sized ladder (ascending (level,
    * nprobe) pairs, IndexQueries.hnswLayerLadder): one layer-graph
    * unroll per level, then the descent chains top layer → … →
    * layer 1 → the layer-0 ef-beam, exactly the hnswSearchFrames
    * fold. */
  def hnswSearchOracle(centroids: Seq[(Int, Seq[Float])], k: Int, ef: Int,
      hops: Int, numQueries: Int, graphK: Int, graphNprobe: Int,
      layerK: Int, descentEf: Int, descentHops: Int,
      layers: Seq[(Int, Int)]): String = {
    val top = layers.map(_._1).max
    val l0 = knnGraphCtes(centroids, graphK, graphNprobe)
      .replaceFirst("\\Aa AS \\(", "a AS MATERIALIZED (")
      .replace("kg AS (", "kg AS MATERIALIZED (")
    val layerCtes = layers.map { case (lv, np) =>
      layerGraphCtes(centroids, layerK, nprobe = np, minLvl = lv, p = s"l$lv")
    }.mkString(",\n")
    val descent = layers.sortBy(-_._1).map(_._1)
      .foldLeft(("hb0", List.empty[String])) { case ((entry, acc), lv) =>
        (s"d${lv}_b$descentHops",
          acc :+ beamRounds(s"d${lv}_", descentEf, descentHops,
            edges = s"l${lv}kgu", entry = entry))
      }
    s"""WITH $l0,
       |kgu AS MATERIALIZED (
       |  SELECT vec_id, neighbor_id FROM kg
       |  UNION
       |  SELECT neighbor_id AS vec_id, vec_id AS neighbor_id FROM kg),
       |${lvlCte(top)},
       |$layerCtes,
       |q AS (SELECT vec_id AS query_id, embedding AS qv
       |      FROM embeddings WHERE vec_id < $numQueries),
       |ent AS (SELECT min(vec_id) AS node FROM lvl WHERE lv >= $top),
       |hb0 AS (SELECT query_id, ent.node FROM q, ent),
       |${descent._2.mkString(",\n")},
       |${beamRounds("h_", ef, hops, edges = "kgu", entry = descent._1)}
       |SELECT query_id, node AS neighbor_id, r AS rnk,
       |  round(sqrt(d), 4) AS dist
       |FROM h_s$hops WHERE r <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_hnsw_delete: the layered traversal with the soft-delete masks
    * applied per layer — both layer graphs re-derived AS BUILT (over
    * the full corpus), then edges touching the deleted slice filtered
    * from every undirected view (the scan-side mask), the entry
    * recomputed over live top-layer nodes, the layer-0 graph masked
    * the same way; queries unchanged. Deleted nodes never score: they
    * are unreachable through masked edges and the masked entry. */
  def hnswDeleteOracle(centroids: Seq[(Int, Seq[Float])], k: Int, ef: Int,
      hops: Int, numQueries: Int, delPredOf: String => String,
      graphK: Int, graphNprobe: Int, layerK: Int, descentEf: Int,
      descentHops: Int, layers: Seq[(Int, Int)]): String = {
    val top = layers.map(_._1).max
    val l0 = knnGraphCtes(centroids, graphK, graphNprobe)
      .replaceFirst("\\Aa AS \\(", "a AS MATERIALIZED (")
      .replace("kg AS (", "kg AS MATERIALIZED (")
    def keep(src: String, p: String) =
      s"""${p}kept AS (
         |  SELECT vec_id, neighbor_id FROM $src
         |  WHERE NOT (${delPredOf("vec_id")})
         |    AND NOT (${delPredOf("neighbor_id")})),
         |${p}kgud AS MATERIALIZED (
         |  SELECT vec_id, neighbor_id FROM ${p}kept
         |  UNION
         |  SELECT neighbor_id AS vec_id, vec_id AS neighbor_id
         |  FROM ${p}kept)""".stripMargin
    val layerCtes = layers.map { case (lv, np) =>
      layerGraphCtes(centroids, layerK, nprobe = np, minLvl = lv, p = s"l$lv")
    }.mkString(",\n")
    val keeps = layers.map { case (lv, _) => keep(s"l${lv}kg", s"d${lv}m") }
      .mkString(",\n")
    val descent = layers.sortBy(-_._1).map(_._1)
      .foldLeft(("hb0", List.empty[String])) { case ((entry, acc), lv) =>
        (s"d${lv}_b$descentHops",
          acc :+ beamRounds(s"d${lv}_", descentEf, descentHops,
            edges = s"d${lv}mkgud", entry = entry))
      }
    s"""WITH $l0,
       |${lvlCte(top)},
       |$layerCtes,
       |${keep("kg", "g0")},
       |$keeps,
       |q AS (SELECT vec_id AS query_id, embedding AS qv
       |      FROM embeddings WHERE vec_id < $numQueries),
       |ent AS (SELECT min(vec_id) AS node FROM lvl
       |        WHERE lv >= $top AND NOT (${delPredOf("vec_id")})),
       |hb0 AS (SELECT query_id, ent.node FROM q, ent),
       |${descent._2.mkString(",\n")},
       |${beamRounds("h_", ef, hops, edges = "g0kgud",
           entry = descent._1)}
       |SELECT query_id, node AS neighbor_id, r AS rnk,
       |  round(sqrt(d), 4) AS dist
       |FROM h_s$hops WHERE r <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_hnsw_compact: the layered repair delta re-derived — each layer
    * graph AS BUILT identifies the affected nodes (live, ≥1 tombstoned
    * out-edge), then the SAME layer rule re-runs for exactly those
    * nodes with the deleted slice masked out of the candidate pool
    * (the re-link = the insert rule over live members). */
  def hnswCompactOracle(centroids: Seq[(Int, Seq[Float])], layerK: Int,
      delPredOf: String => String, layers: Seq[(Int, Int)]): String = {
    val top = layers.map(_._1).max
    def aff(builtKg: String) =
      s"e.vec_id IN (SELECT b.vec_id FROM $builtKg b " +
        s"WHERE ${delPredOf("b.neighbor_id")}) " +
        s"AND NOT (${delPredOf("e.vec_id")})"
    val built = layers.map { case (lv, np) =>
      layerGraphCtes(centroids, layerK, nprobe = np, minLvl = lv, p = s"b$lv")
    }.mkString(",\n")
    val relinked = layers.map { case (lv, np) =>
      layerGraphCtes(centroids, layerK, nprobe = np, minLvl = lv,
        p = s"c$lv", qPred = Some(aff(s"b${lv}kg")),
        memberMask = Some(delPredOf))
    }.mkString(",\n")
    val union = layers.map { case (lv, _) =>
      s"SELECT $lv::BIGINT AS layer, vec_id, neighbor_id, rnk, dist FROM c${lv}kg"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${assignCte(centroids)},
       |${lvlCte(top)},
       |$built,
       |$relinked
       |SELECT layer, vec_id, neighbor_id, rnk::BIGINT AS rnk, dist FROM (
       |  $union)
       |ORDER BY layer, vec_id, rnk""".stripMargin
  }

  /** v_hnsw_stats: the per-layer maintenance audit re-derived — both
    * layer graphs from the level rule + literal centroids (the same
    * unrolls the search oracle replays), then exact-integer occupancy,
    * edge count, milli out-degree, and orphan (in-degree-0) share per
    * layer. */
  def hnswStatsOracle(centroids: Seq[(Int, Seq[Float])],
      layerK: Int, layers: Seq[(Int, Int)]): String = {
    val top = layers.map(_._1).max
    def row(lv: Int, p: String) =
      s"""SELECT $lv::BIGINT AS layer,
         |  (SELECT count(*) FROM lvl WHERE lv >= $lv)::BIGINT AS n_nodes,
         |  (SELECT count(*) FROM ${p}kg)::BIGINT AS n_edges,
         |  ((SELECT count(*) FROM ${p}kg) * 1000
         |    // (SELECT count(*) FROM lvl WHERE lv >= $lv))::BIGINT
         |    AS avg_degree_milli,
         |  ((SELECT count(*) FROM lvl WHERE lv >= $lv
         |     AND vec_id NOT IN (SELECT neighbor_id FROM ${p}kg)) * 10000
         |    // (SELECT count(*) FROM lvl WHERE lv >= $lv))::BIGINT
         |    AS orphan_bp""".stripMargin
    val layerCtes = layers.map { case (lv, np) =>
      layerGraphCtes(centroids, layerK, nprobe = np, minLvl = lv, p = s"s$lv")
    }.mkString(",\n")
    val rows = layers.map { case (lv, _) => row(lv, s"s$lv") }
      .mkString("\nUNION ALL\n")
    s"""WITH ${assignCte(centroids)},
       |${lvlCte(top)},
       |$layerCtes
       |SELECT * FROM (
       |$rows)
       |ORDER BY layer""".stripMargin
  }

  /** v_hnsw_insert: the layered-index insert re-derived end to end —
    * the level rule assigns each batch node its level, and for every
    * upper layer ≤ that level the node's new adjacency is the layer
    * BUILD rule (probe → shortlist → select-neighbors heuristic →
    * backfill, the layerGraphCtes unroll) with the batch masked out of
    * the candidate pool (each insert computed as if it were first —
    * the engine's v_graph_insert masking discipline, layered). Layer
    * nprobe values match the build — `layers` is the engine's ladder
    * (IndexQueries.hnswLayerLadder). */
  def hnswInsertOracle(centroids: Seq[(Int, Seq[Float])], layerK: Int,
      batchPredOf: String => String, layers: Seq[(Int, Int)]): String = {
    val top = layers.map(_._1).max
    val qp = batchPredOf("e.vec_id")
    val layerCtes = layers.map { case (lv, np) =>
      layerGraphCtes(centroids, layerK, nprobe = np, minLvl = lv,
        p = s"i$lv", qPred = Some(qp), memberMask = Some(batchPredOf))
    }.mkString(",\n")
    val union = layers.map { case (lv, _) =>
      s"SELECT $lv::BIGINT AS layer, vec_id, neighbor_id, rnk, dist FROM i${lv}kg"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ${assignCte(centroids)},
       |${lvlCte(top)},
       |$layerCtes
       |SELECT layer, vec_id, neighbor_id, rnk::BIGINT AS rnk, dist FROM (
       |  $union)
       |ORDER BY layer, vec_id, rnk""".stripMargin
  }

  /** The native DotProduct fold: the lane-4 double accumulation of
    * float32 products (VectorExpressions.DotProduct's lane law),
    * mirrored so the augmented coordinate is bit-identical. */
  private def dotSelfSql(vexpr: String, dim: Int): String =
    graft.functions.FoldSql.lane4(
      s"($vexpr)[i]::DOUBLE * ($vexpr)[i]::DOUBLE", dim)

  /** v_mips_ivf: the Neyshabur–Srebro MIPS reduction re-derived end to
    * end — every vector's augmented coordinate √(m²−‖x‖²) recomputed
    * (double sqrt, float32 round — both IEEE-correctly-rounded in both
    * engines), assignment to the literal 65-dim centroids, probe
    * selection, augmented-L2 ranking, and the reported score as the
    * raw inner product. `m2` is the persisted exact max squared norm. */
  def mipsIvfOracle(centroids: Seq[(Int, Seq[Float])], m2: Double,
      k: Int, nprobe: Int, numQueries: Int): String = {
    val dim = centroids.head._2.length // 65: raw + augment
    val adists = centroids.map { case (_, c) => l2sqLit("aug", 0, c) }
      .mkString("[", ",\n ", "]")
    val qdists = centroids.map { case (_, c) => l2sqLit("qaug", 0, c) }
      .mkString("[", ",\n ", "]")
    val cids = centroids.map(_._1).mkString("[", ",", "]")
    s"""WITH augE AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    list_append(embedding,
       |      CAST(sqrt($m2 - ${dotSelfSql("embedding", dim - 1)}) AS REAL)) AS aug
       |  FROM embeddings),
       |a AS (
       |  SELECT vec_id, embedding, aug,
       |    list_position(ds, list_min(ds)) - 1 AS cluster_id
       |  FROM (SELECT vec_id, embedding, aug, $adists AS ds FROM augE)),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qv,
       |    list_append(embedding, CAST(0.0 AS REAL)) AS qaug
       |  FROM embeddings WHERE vec_id < $numQueries),
       |probes AS (
       |  SELECT query_id, cluster_id FROM (
       |    SELECT query_id, cid AS cluster_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS crnk
       |    FROM (SELECT query_id, unnest($cids) AS cid, unnest(ds) AS d
       |          FROM (SELECT query_id, $qdists AS ds FROM q))
       |  ) WHERE crnk <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id, a.embedding, q.qv,
       |    ${l2sqCol("a.aug", "q.qaug", dim)} AS d
       |  FROM probes p
       |  JOIN a ON a.cluster_id = p.cluster_id
       |  JOIN q ON q.query_id = p.query_id)
       |SELECT query_id, neighbor_id, rnk, score FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rnk,
       |    round(list_inner_product(embedding::DOUBLE[], qv::DOUBLE[]), 4) AS score
       |  FROM cand
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_embed_clusters: connected components over the MUTUAL edges of
    * the kNN graph (a↔b both within each other's top-k — the
    * reciprocity filter that keeps hubs from gluing everything into
    * one blob), flooded with the d_dedup_cluster recursive CTE. */
  def embedClustersOracle(centroids: Seq[(Int, Seq[Float])],
      k: Int, nprobe: Int): String = {
    // MATERIALIZED is load-bearing, not a hint to taste: inside WITH
    // RECURSIVE the engine may re-inline upstream CTEs into every flood
    // round, re-evaluating the literal-fold kNN graph per iteration
    // (measured: >500 s inlined vs ~10 s materialized at sf0.01)
    val ctes = knnGraphCtes(centroids, k, nprobe)
      .replaceFirst("\\Aa AS \\(", "a AS MATERIALIZED (")
      .replace("kg AS (", "kg AS MATERIALIZED (")
    s"""WITH RECURSIVE $ctes,
       |me AS MATERIALIZED (
       |  SELECT g1.vec_id AS a, g1.neighbor_id AS b
       |  FROM kg g1 JOIN kg g2
       |    ON g2.vec_id = g1.neighbor_id AND g2.neighbor_id = g1.vec_id
       |  WHERE g1.vec_id < g1.neighbor_id),
       |sym AS MATERIALIZED (SELECT a, b FROM me UNION ALL SELECT b, a FROM me),
       |reach(node, lab) AS (
       |  SELECT vec_id, vec_id FROM embeddings
       |  UNION
       |  SELECT sym.b, r.lab FROM reach r JOIN sym ON sym.a = r.node),
       |comp AS (SELECT node AS vec_id, min(lab) AS cluster_id
       |         FROM reach GROUP BY node),
       |sizes AS (SELECT cluster_id, count(*) AS cluster_size
       |          FROM comp GROUP BY cluster_id)
       |SELECT c.vec_id, c.cluster_id, z.cluster_size
       |FROM comp c JOIN sizes z USING (cluster_id)
       |ORDER BY c.vec_id""".stripMargin
  }

  /** v_quantize_error: reconstruction-error audit of the compression
    * ladder. The SQ8 half re-derives grid and codes from raw (the
    * sq8SearchOracle derivation); the PQ half re-derives codes from the
    * literal codebooks and decodes through a nested codebook literal.
    * Per-vector squared error folds in dimension order, then rounds to
    * integer MICROS before the cross-vector sum — a float sum across
    * vectors would be partition/scan-order dependent. */
  def quantizeErrorOracle(books: Seq[(Int, Int, Seq[Float])],
      numSub: Int, subDim: Int, dim: Int): String = {
    val d1 = dim + 1
    val PqSqlParts(dsExprs, codeExprs, _, _) = pqParts(books, numSub, subDim)
    val clList = (0 until numSub).map(s => s"code$s").mkString("[", ",", "]")
    val cb = (0 until numSub).map { s =>
      books.filter(_._1 == s).sortBy(_._2).map { case (_, _, c) => lit(c) }
        .mkString("[", ",", "]")
    }.mkString("[", ",\n ", "]")
    val sq8Term =
      "(e.embedding[j]::DOUBLE - (sgl.mns[j] + c.cs[j] * sgl.scales[j]))"
    val sub = s"((j-1)//$subDim)+1"
    val pqTerm =
      s"(e.embedding[j]::DOUBLE - cbv.cb[$sub][cl[$sub]+1][((j-1)%$subDim)+1])"
    s"""WITH sg AS (
       |  SELECT j, min(x)::DOUBLE AS mn,
       |    (max(x)::DOUBLE - min(x)::DOUBLE) / 255.0 AS scale
       |  FROM (SELECT unnest(embedding) AS x, unnest(range(1, $d1)) AS j FROM embeddings)
       |  GROUP BY j),
       |sgl AS (SELECT list(mn ORDER BY j) AS mns, list(scale ORDER BY j) AS scales FROM sg),
       |scodes AS (
       |  SELECT vec_id, list(code ORDER BY j) AS cs FROM (
       |    SELECT v.vec_id, v.j,
       |      CASE WHEN g.scale = 0.0 THEN 0.0
       |           ELSE least(greatest(floor((v.x::DOUBLE - g.mn) / g.scale + 0.5), 0.0), 255.0) END AS code
       |    FROM (SELECT vec_id, unnest(embedding) AS x, unnest(range(1, $d1)) AS j FROM embeddings) v
       |    JOIN sg g USING (j))
       |  GROUP BY vec_id),
       |sq8e AS (
       |  SELECT e.vec_id, round(list_reduce(list_prepend(0.0,
       |    [$sq8Term * $sq8Term for j in range(1, $d1)]),
       |    (a, b) -> a + b) * 1000000)::BIGINT AS em
       |  FROM embeddings e JOIN scodes c USING (vec_id), sgl),
       |pcodes AS (
       |  SELECT vec_id, $clList AS cl FROM (
       |    SELECT vec_id, $codeExprs
       |    FROM (SELECT vec_id, $dsExprs FROM embeddings))),
       |cbv AS (SELECT $cb AS cb),
       |pqe AS (
       |  SELECT e.vec_id, round(list_reduce(list_prepend(0.0,
       |    [$pqTerm * $pqTerm for j in range(1, $d1)]),
       |    (a, b) -> a + b) * 1000000)::BIGINT AS em
       |  FROM embeddings e JOIN pcodes USING (vec_id), cbv)
       |SELECT method, n_vectors, total_err_micro,
       |  round((total_err_micro::DOUBLE / n_vectors) / 1000000.0, 6) AS mean_sq_err
       |FROM (
       |  SELECT 'pq${numSub}x${books.map(_._2).max + 1}' AS method,
       |    count(*)::BIGINT AS n_vectors, sum(em)::BIGINT AS total_err_micro
       |  FROM pqe
       |  UNION ALL
       |  SELECT 'sq8', count(*)::BIGINT, sum(em)::BIGINT FROM sq8e)
       |ORDER BY method""".stripMargin
  }

  /** The shared PQ SQL fragments: per-sub distance lists against the
    * literal codebooks, argmin code derivation, per-query ADC lists, and
    * the subspace-ordered adist fold — used identically by the flat PQ
    * oracle and the IVF-PQ composite so the two can never drift. */
  private final case class PqSqlParts(
      dsExprs: String, codeExprs: String, qdExprs: String, adist: String)

  private def pqParts(books: Seq[(Int, Int, Seq[Float])],
      numSub: Int, subDim: Int, baseExpr: String = "embedding",
      queryExpr: String = "qv"): PqSqlParts = {
    def subDists(vexpr: String, s: Int): String =
      books.filter(_._1 == s).sortBy(_._2)
        .map { case (_, _, c) => l2sqLit(vexpr, s * subDim, c) }
        .mkString("[", ",", "]")
    PqSqlParts(
      dsExprs = (0 until numSub)
        .map(s => s"${subDists(baseExpr, s)} AS ds$s").mkString(", "),
      codeExprs = (0 until numSub)
        .map(s => s"list_position(ds$s, list_min(ds$s)) - 1 AS code$s").mkString(", "),
      qdExprs = (0 until numSub)
        .map(s => s"${subDists(queryExpr, s)} AS qd$s").mkString(", "),
      adist = (0 until numSub).foldLeft("0.0") {
        case (acc, s) => s"($acc + qd$s[code$s + 1])"
      })
  }

  /** v_ivfpq_search: the composite — IVF probe selection over literal
    * centroids restricts the candidate set, then PQ codes re-derived
    * from literal codebooks are ADC-ranked within it. Exactly the two
    * component oracles composed: candidates come from the re-derived
    * assignment of the probed clusters, distances from the re-derived
    * codes. */
  def ivfPqSearchOracle(centroids: Seq[(Int, Seq[Float])],
      books: Seq[(Int, Int, Seq[Float])], numSub: Int, subDim: Int,
      k: Int, nprobe: Int, numQueries: Int): String = {
    val PqSqlParts(dsExprs, codeExprs, qdExprs, adist) =
      pqParts(books, numSub, subDim)
    val qdists = centroids.map { case (_, c) => l2sqLit("qv", 0, c) }
      .mkString("[", ",\n ", "]")
    val cids = centroids.map(_._1).mkString("[", ",", "]")
    s"""WITH ${assignCte(centroids)},
       |codes AS (
       |  SELECT vec_id, $codeExprs
       |  FROM (SELECT vec_id, $dsExprs FROM embeddings)
       |),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |qd AS (
       |  SELECT query_id, $qdExprs
       |  FROM (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries)
       |),
       |probes AS (
       |  SELECT query_id, cluster_id FROM (
       |    SELECT query_id, cid AS cluster_id, d,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS crnk
       |    FROM (SELECT query_id, unnest($cids) AS cid, unnest(ds) AS d
       |          FROM (SELECT query_id, $qdists AS ds FROM q))
       |  ) WHERE crnk <= $nprobe
       |),
       |cand AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM probes p JOIN a ON a.cluster_id = p.cluster_id
       |)
       |SELECT query_id, neighbor_id, rnk, adist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY ad, vec_id) AS rnk,
       |    round(ad, 4) AS adist
       |  FROM (SELECT cand.query_id, cand.vec_id, $adist AS ad
       |        FROM cand JOIN codes ON codes.vec_id = cand.vec_id
       |        JOIN qd ON qd.query_id = cand.query_id)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_ivfpq_residual: the residual-encoded composite (FAISS IndexIVFPQ
    * semantics) re-derived end to end — assignment to literal raw
    * centroids, per-vector residual x − c(x) in FLOAT32 arithmetic
    * (DuckDB REAL ops are IEEE float32, matching the engine's
    * zip_with on float arrays), codes re-derived from the literal
    * RESIDUAL codebooks, probes on raw centroids, the query's residual
    * against EACH probed centroid feeding its own ADC table, adist
    * summed in subspace order. */
  def ivfPqResidualOracle(centroids: Seq[(Int, Seq[Float])],
      books: Seq[(Int, Int, Seq[Float])], numSub: Int, subDim: Int,
      k: Int, nprobe: Int, numQueries: Int): String = {
    val dim = numSub * subDim
    val PqSqlParts(dsExprs, codeExprs, qdExprs, adist) =
      pqParts(books, numSub, subDim, baseExpr = "res", queryExpr = "qres")
    val qdists = centroids.map { case (_, c) => l2sqLit("qv", 0, c) }
      .mkString("[", ",\n ", "]")
    val cids = centroids.map(_._1).mkString("[", ",", "]")
    // the 16×64 centroid matrix as a REAL[][] literal so residual
    // subtraction happens in float32 on both sides
    val clit = centroids.sortBy(_._1).map { case (_, c) =>
      c.map(_.toDouble.toString).mkString("[", ",", "]") + "::REAL[]"
    }.mkString("[", ",\n ", "]")
    s"""WITH ${assignCte(centroids)},
       |res AS MATERIALIZED (
       |  SELECT vec_id, cluster_id,
       |    [embedding[i] - ($clit)[cluster_id + 1][i]
       |     for i in range(1, ${dim + 1})] AS res
       |  FROM a),
       |codes AS (
       |  SELECT vec_id, cluster_id, $codeExprs
       |  FROM (SELECT vec_id, cluster_id, $dsExprs FROM res)
       |),
       |q AS (SELECT vec_id AS query_id, embedding AS qv
       |      FROM embeddings WHERE vec_id < $numQueries),
       |probes AS (
       |  SELECT query_id, cluster_id FROM (
       |    SELECT query_id, cid AS cluster_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY d, cid) AS crnk
       |    FROM (SELECT query_id, unnest($cids) AS cid, unnest(ds) AS d
       |          FROM (SELECT query_id, $qdists AS ds FROM q))
       |  ) WHERE crnk <= $nprobe
       |),
       |qres AS (
       |  SELECT p.query_id, p.cluster_id,
       |    [qv[i] - ($clit)[p.cluster_id + 1][i]
       |     for i in range(1, ${dim + 1})] AS qres
       |  FROM probes p JOIN q ON q.query_id = p.query_id),
       |qd AS (
       |  SELECT query_id, cluster_id, $qdExprs FROM qres
       |)
       |SELECT query_id, neighbor_id, rnk, adist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY ad, vec_id) AS rnk,
       |    round(ad, 4) AS adist
       |  FROM (SELECT qd.query_id, codes.vec_id, $adist AS ad
       |        FROM codes
       |        JOIN qd ON qd.cluster_id = codes.cluster_id)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_pq_search: every vector re-encoded against the literal codebooks
    * (argmin per subspace, smallest-code tie-break), ADC distance summed
    * in subspace order exactly as the `aggregate` fold in PqIndex.search,
    * top-k by (adist, vec_id). */
  def pqSearchOracle(books: Seq[(Int, Int, Seq[Float])],
      numSub: Int, subDim: Int, k: Int, numQueries: Int): String = {
    val PqSqlParts(dsExprs, codeExprs, qdExprs, adist) =
      pqParts(books, numSub, subDim)
    s"""WITH codes AS (
       |  SELECT vec_id, $codeExprs
       |  FROM (SELECT vec_id, $dsExprs FROM embeddings)
       |),
       |q AS (
       |  SELECT query_id, $qdExprs
       |  FROM (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries)
       |)
       |SELECT query_id, neighbor_id, rnk, adist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY ad, vec_id) AS rnk,
       |    round(ad, 4) AS adist
       |  FROM (SELECT q.query_id, c.vec_id, $adist AS ad FROM codes c CROSS JOIN q)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_sq8_search: the one oracle that re-derives the WHOLE index from
    * the raw table — SQ8 has no seeded training, so the per-dim min/max
    * grid, the byte codes, the decoded-ADC shortlist and the exact
    * refine are all recomputed in SQL with no embedded literals. Every
    * step is exact-specified double arithmetic in the same evaluation
    * order as Sq8Index. */
  def sq8SearchOracle(dim: Int, k: Int, refineFactor: Int,
      numQueries: Int, levels: Int = 255): String = {
    val d1 = dim + 1
    s"""WITH g AS (
       |  SELECT j, min(x)::DOUBLE AS mn, max(x)::DOUBLE AS mx,
       |    (max(x)::DOUBLE - min(x)::DOUBLE) / $levels.0 AS scale
       |  FROM (SELECT unnest(embedding) AS x, unnest(range(1, $d1)) AS j FROM embeddings)
       |  GROUP BY j),
       |gl AS (SELECT list(mn ORDER BY j) AS mns, list(scale ORDER BY j) AS scales FROM g),
       |codes AS (
       |  SELECT vec_id, list(code ORDER BY j) AS cs FROM (
       |    SELECT v.vec_id, v.j,
       |      CASE WHEN g.scale = 0.0 THEN 0.0
       |           ELSE least(greatest(floor((v.x::DOUBLE - g.mn) / g.scale + 0.5), 0.0), $levels.0) END AS code
       |    FROM (SELECT vec_id, unnest(embedding) AS x, unnest(range(1, $d1)) AS j FROM embeddings) v
       |    JOIN g USING (j))
       |  GROUP BY vec_id),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY ad, vec_id) AS arnk
       |    FROM (
       |      SELECT q.query_id, c.vec_id,
       |        list_reduce(list_prepend(0.0,
       |          [(q.qv[j]::DOUBLE - (gl.mns[j] + c.cs[j] * gl.scales[j])) *
       |           (q.qv[j]::DOUBLE - (gl.mns[j] + c.cs[j] * gl.scales[j]))
       |           for j in range(1, $d1)]), (a, b) -> a + b) AS ad
       |      FROM codes c CROSS JOIN q CROSS JOIN gl)
       |  ) WHERE arnk <= ${k * refineFactor})
       |SELECT query_id, neighbor_id, rnk, dist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rnk,
       |    round(sqrt(d), 4) AS dist
       |  FROM (SELECT s.query_id, s.vec_id, ${l2sqCol("e.embedding", "q.qv", dim)} AS d
       |        FROM short s JOIN embeddings e ON e.vec_id = s.vec_id
       |        JOIN q ON q.query_id = s.query_id)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_rp_search: projection, shortlist and refine all re-derived in
    * SQL — the ±1 sign matrix is seeded (not trained), so like SQ8 this
    * oracle is static. Each projected coordinate mirrors
    * [[graft.functions.RandomProject]]'s fixed-order double
    * multiply-accumulate with an ordered list_reduce, cast to FLOAT
    * once — bit-identical coordinates, so the projected-space ranks
    * (and therefore the shortlist membership) agree exactly. */
  def rpSearchOracle(signs: Seq[Double], dim: Int, outDim: Int,
      k: Int, refineFactor: Int, numQueries: Int): String = {
    def projExpr(vexpr: String): String =
      (0 until outDim).map { i =>
        val row = signs.slice(i * dim, (i + 1) * dim)
          .map(_.toString).mkString("[", ",", "]")
        s"list_reduce(list_prepend(0.0, " +
          s"[(($row)[j] * ($vexpr)[j]::DOUBLE) for j in range(1, ${dim + 1})]), " +
          s"(a, b) -> a + b)::FLOAT"
      }.mkString("[", ",\n    ", "]")
    s"""WITH p AS (SELECT vec_id, ${projExpr("embedding")} AS pv FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |pq AS (SELECT vec_id AS query_id, ${projExpr("embedding")} AS pqv FROM embeddings WHERE vec_id < $numQueries),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY pd, vec_id) AS arnk
       |    FROM (SELECT pq.query_id, p.vec_id, ${l2sqCol("p.pv", "pq.pqv", outDim)} AS pd
       |          FROM p CROSS JOIN pq)
       |  ) WHERE arnk <= ${k * refineFactor})
       |SELECT query_id, neighbor_id, rnk, dist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rnk,
       |    round(sqrt(d), 4) AS dist
       |  FROM (SELECT s.query_id, s.vec_id, ${l2sqCol("e.embedding", "q.qv", dim)} AS d
       |        FROM short s JOIN embeddings e ON e.vec_id = s.vec_id
       |        JOIN q ON q.query_id = s.query_id)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_bq_search: sign-bit fingerprints (two 32-bit halves, the same
    * reverse-fold acc·2+bit arithmetic as BqSearch.fingerprintHalf),
    * Hamming shortlist by (popcount-of-xor, vec_id), exact-L2 refine —
    * no literals at all: fingerprints, ranking, and refine are all
    * re-derived from the raw embeddings table. */
  def bqSearchOracle(dim: Int, k: Int, refineFactor: Int,
      numQueries: Int): String = {
    require(dim == 64, s"bq oracle packs exactly 64 dims, got $dim")
    def half(vexpr: String, lo: Int): String =
      s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
        s"list_reverse(($vexpr)[${lo + 1}:${lo + 32}]), " +
        s"x -> CASE WHEN x > 0 THEN 1::BIGINT ELSE 0::BIGINT END)), " +
        s"(a, b) -> a * 2 + b)"
    s"""WITH f AS (SELECT vec_id, ${half("embedding", 0)} AS flo,
       |    ${half("embedding", 32)} AS fhi FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |fq AS (SELECT vec_id AS query_id, ${half("embedding", 0)} AS qlo,
       |    ${half("embedding", 32)} AS qhi FROM embeddings WHERE vec_id < $numQueries),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY hd, vec_id) AS arnk
       |    FROM (SELECT fq.query_id, f.vec_id,
       |            bit_count(xor(f.flo, fq.qlo)) + bit_count(xor(f.fhi, fq.qhi)) AS hd
       |          FROM f CROSS JOIN fq)
       |  ) WHERE arnk <= ${k * refineFactor})
       |SELECT query_id, neighbor_id, rnk, dist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rnk,
       |    round(sqrt(d), 4) AS dist
       |  FROM (SELECT s.query_id, s.vec_id, ${l2sqCol("e.embedding", "q.qv", dim)} AS d
       |        FROM short s JOIN embeddings e ON e.vec_id = s.vec_id
       |        JOIN q ON q.query_id = s.query_id)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_ood_score: every vector's distance to its nearest literal
    * centroid (list_min of the same per-centroid fold assignCte ranks
    * with — nearest IS assigned, first-position tie-break), top-N
    * farthest by RAW squared distance with vec_id tie-break, sqrt only
    * in the projection. */
  def oodScoreOracle(centroids: Seq[(Int, Seq[Float])], topN: Int): String = {
    val dists = centroids.map { case (_, c) => l2sqLit("embedding", 0, c) }
      .mkString("[", ",\n ", "]")
    s"""WITH oo AS (
       |  SELECT vec_id, list_min(ds) AS d2,
       |    list_position(ds, list_min(ds)) - 1 AS cluster_id
       |  FROM (SELECT vec_id, $dists AS ds FROM embeddings))
       |SELECT vec_id, cluster_id::BIGINT AS cluster_id, round(sqrt(d2), 4) AS dist
       |FROM oo ORDER BY d2 DESC, vec_id LIMIT $topN""".stripMargin
  }

  /** v_ivf_stats: assignment re-derived against the literal centroids
    * (the argmin law — nearest IS assigned, spec-pinned for
    * v_ood_score), per-vector d² = list_min of the same distance list,
    * micros-rounded BEFORE the cross-vector sum (the
    * quantizeErrorOracle discipline), shares/means by the identical
    * pinned division chains. */
  def ivfStatsOracle(centroids: Seq[(Int, Seq[Float])]): String = {
    val dists = centroids.map { case (_, c) => l2sqLit("embedding", 0, c) }
      .mkString("[", ",\n ", "]")
    s"""WITH oo AS (
       |  SELECT vec_id,
       |    round(list_min(ds) * 1000000)::BIGINT AS d2u,
       |    (list_position(ds, list_min(ds)) - 1)::BIGINT AS cluster_id
       |  FROM (SELECT vec_id, $dists AS ds FROM embeddings)),
       |m AS (
       |  SELECT cluster_id, count(*)::BIGINT AS population,
       |    sum(d2u)::BIGINT AS sd2u, max(d2u)::BIGINT AS mx
       |  FROM oo GROUP BY cluster_id),
       |t AS (SELECT sum(population)::BIGINT AS n_total FROM m)
       |SELECT cluster_id, population,
       |  round(population::DOUBLE / n_total, 4) AS pop_share,
       |  round((sd2u::DOUBLE / population) / 1000000.0, 6) AS mean_sq_dist,
       |  round(mx::DOUBLE / 1000000.0, 6) AS max_sq_dist
       |FROM m, t ORDER BY cluster_id""".stripMargin
  }

  /** v_maxsim_pruned: the two-stage late-interaction serving replayed
    * end to end — per-QUERY-VECTOR probe selection and pruned exact-L2
    * ANN over the literal centroids (the ivfSearchOracle machinery),
    * hit vectors' doc groups collected as the candidate set, then the
    * exact MaxSim tail (explicit LTR dot folds, ordered maxima sum,
    * same tie-breaks as the v_maxsim_search oracle) over candidates
    * only. */
  def maxsimPrunedOracle(centroids: Seq[(Int, Seq[Float])],
      kAnn: Int, nprobe: Int, k: Int, groupWidth: Int,
      numQueryVecs: Int): String = {
    val qdists = centroids.map { case (_, c) => l2sqLit("qv", 0, c) }
      .mkString("[", ",\n ", "]")
    val cids = centroids.map(_._1).mkString("[", ",", "]")
    val dotFold = graft.functions.FoldSql.lane4(
      "cv.embedding[i]::DOUBLE * qq.qv[i]::DOUBLE", 64)
    s"""WITH ${assignCte(centroids)},
       |qq AS (SELECT vec_id // $groupWidth AS query_group,
       |         vec_id AS q_vec_id, embedding AS qv
       |       FROM embeddings WHERE vec_id < $numQueryVecs),
       |probes AS (
       |  SELECT q_vec_id, qv, cluster_id FROM (
       |    SELECT q_vec_id, qv, cid AS cluster_id,
       |      row_number() OVER (PARTITION BY q_vec_id ORDER BY d, cid) AS crnk
       |    FROM (SELECT q_vec_id, qv, unnest($cids) AS cid, unnest(ds) AS d
       |          FROM (SELECT q_vec_id, qv, $qdists AS ds FROM qq))
       |  ) WHERE crnk <= $nprobe
       |),
       |annr AS (
       |  SELECT q_vec_id, vec_id FROM (
       |    SELECT q_vec_id, vec_id,
       |      row_number() OVER (PARTITION BY q_vec_id ORDER BY d, vec_id) AS rnk
       |    FROM (SELECT p.q_vec_id, a.vec_id,
       |            ${l2sqCol("a.embedding", "p.qv", 64)} AS d
       |          FROM probes p JOIN a ON a.cluster_id = p.cluster_id)
       |  ) WHERE rnk <= $kAnn
       |),
       |cand AS (
       |  SELECT DISTINCT qq.query_group,
       |    annr.vec_id // $groupWidth AS doc_group
       |  FROM annr JOIN qq ON qq.q_vec_id = annr.q_vec_id),
       |cv AS (SELECT vec_id // $groupWidth AS doc_group, vec_id, embedding
       |       FROM embeddings),
       |mx AS (
       |  SELECT qq.query_group, qq.q_vec_id, cv.doc_group,
       |    max($dotFold) AS mx
       |  FROM cv JOIN cand ON cv.doc_group = cand.doc_group
       |  JOIN qq ON qq.query_group = cand.query_group
       |  GROUP BY qq.query_group, qq.q_vec_id, cv.doc_group),
       |sc AS (
       |  SELECT query_group, doc_group,
       |    list_reduce(list_prepend(0.0, list(mx ORDER BY q_vec_id)),
       |      (x, y) -> x + y) AS score
       |  FROM mx GROUP BY query_group, doc_group)
       |SELECT query_group, doc_group, rnk, score FROM (
       |  SELECT query_group, doc_group,
       |    row_number() OVER (PARTITION BY query_group
       |      ORDER BY score DESC, doc_group) AS rnk,
       |    round(score, 4) AS score
       |  FROM sc) WHERE rnk <= $k
       |ORDER BY query_group, rnk""".stripMargin
  }

  /** v_ivf_split: the maintenance action replayed decision for
    * decision against the literal centroids — assignment + populations
    * re-derived (the argmin law), hottest cluster by (population DESC,
    * cluster_id), seed A = member farthest from its own centroid
    * (list_min of the distance list IS that distance), seed B = member
    * farthest from A, sides by nearer-seed with ties to A; the kept
    * rows and both split rows re-counted. No literals beyond the
    * centroid table — the seeds are derived data on both sides. */
  def ivfSplitOracle(centroids: Seq[(Int, Seq[Float])], dim: Int): String = {
    val dists = centroids.map { case (_, c) => l2sqLit("embedding", 0, c) }
      .mkString("[", ",\n ", "]")
    val k = centroids.size
    s"""WITH aa AS (
       |  SELECT vec_id, embedding, list_min(ds) AS d2own,
       |    (list_position(ds, list_min(ds)) - 1)::BIGINT AS cluster_id
       |  FROM (SELECT vec_id, embedding, $dists AS ds FROM embeddings)),
       |pops AS (
       |  SELECT cluster_id, count(*)::BIGINT AS population
       |  FROM aa GROUP BY cluster_id),
       |h AS (SELECT cluster_id FROM pops
       |      ORDER BY population DESC, cluster_id LIMIT 1),
       |mem AS (SELECT aa.vec_id, aa.embedding, aa.d2own
       |        FROM aa JOIN h ON aa.cluster_id = h.cluster_id),
       |sa AS (SELECT vec_id, embedding FROM mem
       |       ORDER BY d2own DESC, vec_id LIMIT 1),
       |sb AS (SELECT m.vec_id, m.embedding FROM mem m, sa
       |       ORDER BY ${l2sqCol("m.embedding", "sa.embedding", dim)} DESC,
       |         m.vec_id LIMIT 1),
       |cnt AS (
       |  SELECT origin, count(*)::BIGINT AS population
       |  FROM (
       |    SELECT m.vec_id,
       |      CASE WHEN ${l2sqCol("m.embedding", "sa.embedding", dim)}
       |             <= ${l2sqCol("m.embedding", "sb.embedding", dim)}
       |           THEN 'split_a' ELSE 'split_b' END AS origin
       |    FROM mem m, sa, sb)
       |  GROUP BY origin),
       |sides AS (
       |  -- both split rows always appear: a degenerate split surfaces
       |  -- as an explicit population-0 split_b row (engine-identical)
       |  SELECT so.cluster_id,
       |    coalesce(cnt.population, 0)::BIGINT AS population, so.origin
       |  FROM (SELECT 'split_a' AS origin,
       |          (SELECT cluster_id FROM h) AS cluster_id
       |        UNION ALL SELECT 'split_b', $k) so
       |  LEFT JOIN cnt ON cnt.origin = so.origin)
       |SELECT cluster_id, population, origin FROM (
       |  SELECT p.cluster_id, p.population, 'kept' AS origin
       |  FROM pops p WHERE p.cluster_id != (SELECT cluster_id FROM h)
       |  UNION ALL SELECT cluster_id::BIGINT, population, origin FROM sides)
       |ORDER BY cluster_id, origin""".stripMargin
  }

  /** v_ivf_merge: the cold-cluster merge replayed end to end from the
    * literal centroids — assignment by the argmin law, populations on
    * the full literal-id skeleton (a zero-member cluster is real, cold
    * layout), the cold rule in exact integer arithmetic
    * (pop·k·den < num·total ⟺ pop < (num/den)·mean), the target argmin
    * over the literal k×k centroid distance matrix restricted to
    * cold→surviving pairs with the same (d², dst) tie-break, and the
    * audit accounting (cold rows absorbed to population 0, survivors
    * gain what they absorb). */
  def ivfMergeOracle(centroids: Seq[(Int, Seq[Float])], dim: Int,
      num: Int, den: Int): String = {
    val k = centroids.size
    val centl = centroids.sortBy(_._1).map { case (i, c) =>
      s"($i, ${lit(c)}::FLOAT[])"
    }.mkString(",\n    ")
    s"""WITH ${assignCte(centroids)},
       |centl(cluster_id, c) AS (VALUES
       |    $centl),
       |popsr AS (SELECT cluster_id, count(*)::BIGINT AS pop
       |          FROM a GROUP BY cluster_id),
       |pops AS (SELECT cl.cluster_id, coalesce(p.pop, 0)::BIGINT AS pop
       |         FROM centl cl LEFT JOIN popsr p USING (cluster_id)),
       |tot AS (SELECT sum(pop)::BIGINT AS total FROM pops),
       |flags AS (SELECT cluster_id, pop,
       |            (pop * $k * $den < $num * total) AS cold
       |          FROM pops, tot),
       |dmat AS (SELECT s.cluster_id AS src, t.cluster_id AS dst,
       |           ${l2sqCol("s.c", "t.c", dim)} AS d2
       |         FROM centl s JOIN centl t ON s.cluster_id <> t.cluster_id),
       |tgt AS (SELECT src, dst FROM (
       |          SELECT d.src, d.dst,
       |            row_number() OVER (PARTITION BY d.src
       |                               ORDER BY d.d2, d.dst) AS rn
       |          FROM dmat d
       |          JOIN flags fs ON fs.cluster_id = d.src AND fs.cold
       |          JOIN flags ft ON ft.cluster_id = d.dst AND NOT ft.cold)
       |        WHERE rn = 1),
       |absorbed AS (SELECT t.dst AS cluster_id, sum(f.pop)::BIGINT AS extra
       |             FROM tgt t JOIN flags f ON f.cluster_id = t.src
       |             GROUP BY t.dst)
       |SELECT f.cluster_id::BIGINT AS cluster_id,
       |  coalesce(t.dst, f.cluster_id)::BIGINT AS merged_into,
       |  (CASE WHEN f.cold THEN 0
       |        ELSE f.pop + coalesce(ab.extra, 0) END)::BIGINT AS population
       |FROM flags f
       |LEFT JOIN tgt t ON t.src = f.cluster_id
       |LEFT JOIN absorbed ab ON ab.cluster_id = f.cluster_id
       |ORDER BY cluster_id""".stripMargin
  }

  /** v_ivf_balance: the population-bounded rebuild replayed decision
    * for decision against the persisted literals. Base assignment is
    * the argmin law over the PRE-balance centroids; members of split
    * parents re-argmin over that parent's literal sub-centroids (ids
    * ascending = engine code order, first-min tie-break both sides);
    * members of salt parents re-shard by the avalanche id hash over
    * the parent's literal (base, ks) layout. Populations re-counted
    * from scratch and joined onto the literal centroid-row skeleton —
    * empty salt subs must surface as explicit population-0 rows.
    *
    * `baseCent`: the pre-balance (cluster_id, centroid) rows.
    * `rows`: every POST-balance centroid row (cluster_id, parent_id,
    * method). `subs`: the method=split rows with their trained
    * centroids. */
  def ivfBalanceOracle(baseCent: Seq[(Int, Seq[Float])],
      rows: Seq[(Int, Int, String)],
      subs: Seq[(Int, Int, Seq[Float])]): String = {
    val splitParents = subs.map(_._2).distinct.sorted
    // per split parent: pick the nearest sub id (first-position min ==
    // the engine's min_by(code, struct(d, code)) — sub ids ascend with
    // code inside a parent). `subs` includes the salt ANCHORS (still
    // method-tagged geo subs): the argmin must see every trained
    // sub-centroid, or members of a salted family would be misrouted
    // to the nearest surviving sibling.
    val geoPick = splitParents.map { p =>
      val ps = subs.filter(_._2 == p).sortBy(_._1)
      val ids = ps.map(_._1).mkString("[", ",", "]")
      val ds = ps.map { case (_, _, c) => l2sqLit("embedding", 0, c) }
        .mkString("[", ",\n ", "]")
      s"WHEN $p THEN ($ids)[list_position($ds, list_min($ds))]"
    }.mkString("\n      ")
    // per salt anchor: shard 0 keeps the anchor id, shards 1..ks−1 map
    // to base..base+ks−2 (ALL extension rows are persisted, populated
    // or not, so base = min extension id and ks = extensions + 1)
    val saltRows = rows.filter(_._3 == "salt")
    val saltPick = saltRows.groupBy(_._2).toSeq.sortBy(_._1).map {
      case (p, ss) =>
        val base = ss.map(_._1).min
        val ks = ss.size + 1
        // HUGEINT-wrapped Knuth step (HashSql.knuthSql): BIGINT would
        // raise an overflow error past vec_id ~3.5e9 where the engine
        // wraps silently — the oracle must replay the wrap, not error.
        val h = graft.functions.HashSql.knuthSql("vec_id", 4294967296L)
        s"WHEN $p THEN CASE ($h) % $ks " +
          s"WHEN 0 THEN $p " +
          s"ELSE $base + ($h) % $ks - 1 END"
    }.mkString("\n      ")
    val geoCase =
      if (splitParents.isEmpty) "cluster_id"
      else s"CASE cluster_id\n      $geoPick\n      ELSE cluster_id END"
    val saltCase =
      if (saltRows.isEmpty) "g.cluster_id"
      else s"CASE g.cluster_id\n      $saltPick\n      ELSE g.cluster_id END"
    val skeleton = rows.sortBy(_._1).map { case (c, p, m) =>
      s"($c, $p, '$m')"
    }.mkString(",\n    ")
    s"""WITH ${assignCte(baseCent)},
       |g AS (
       |  SELECT vec_id, $geoCase AS cluster_id
       |  FROM a),
       |f AS (SELECT vec_id, $saltCase AS cluster_id FROM g),
       |pops AS (SELECT cluster_id, count(*)::BIGINT AS population
       |         FROM f GROUP BY cluster_id),
       |skel(cluster_id, parent_id, method) AS (VALUES
       |    $skeleton)
       |SELECT s.cluster_id::BIGINT AS cluster_id,
       |  s.parent_id::BIGINT AS parent_id, s.method,
       |  coalesce(p.population, 0)::BIGINT AS population
       |FROM skel s LEFT JOIN pops p ON p.cluster_id = s.cluster_id
       |ORDER BY cluster_id""".stripMargin
  }

  /** v_refine_sweep: the matryoshka prefix shortlist ranked ONCE, then
    * each refine factor takes its own prefix of it, exact-refines, and
    * scores against the brute-force truth — no literals anywhere. */
  def refineSweepOracle(dim: Int, prefixDim: Int, k: Int,
      factors: Seq[Int], numQueries: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |sr AS (
       |  SELECT query_id, vec_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY pd, vec_id) AS arnk
       |  FROM (SELECT q.query_id, e.vec_id, ${l2sqCol("e.embedding", "q.qv", prefixDim)} AS pd
       |        FROM embeddings e CROSS JOIN q)),
       |gt AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT q.query_id, e.vec_id,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY ${l2sqCol("e.embedding", "q.qv", dim)}, e.vec_id) AS rnk
       |    FROM embeddings e, q) WHERE rnk <= $k),
       |rf AS (SELECT unnest([${factors.mkString(",")}]) AS refine_factor),
       |res AS (
       |  SELECT refine_factor, query_id, vec_id FROM (
       |    SELECT f.refine_factor, s.query_id, s.vec_id,
       |      row_number() OVER (PARTITION BY f.refine_factor, s.query_id
       |        ORDER BY ${l2sqCol("e.embedding", "q.qv", dim)}, s.vec_id) AS rnk
       |    FROM rf f
       |    JOIN sr s ON s.arnk <= $k * f.refine_factor
       |    JOIN embeddings e ON e.vec_id = s.vec_id
       |    JOIN q ON q.query_id = s.query_id
       |  ) WHERE rnk <= $k),
       |hits AS (
       |  SELECT refine_factor, count(*) AS total_hits
       |  FROM res JOIN gt USING (query_id, vec_id) GROUP BY refine_factor),
       |nq AS (SELECT count(*)::BIGINT AS n_queries FROM q)
       |SELECT f.refine_factor::BIGINT AS refine_factor, n_queries,
       |  coalesce(total_hits, 0)::BIGINT AS total_hits,
       |  round(coalesce(total_hits, 0)::DOUBLE / ($k * n_queries), 4) AS avg_recall
       |FROM rf f LEFT JOIN hits h ON h.refine_factor = f.refine_factor, nq
       |ORDER BY refine_factor""".stripMargin

  /** v_lsh_multiprobe: the seeded sign-bucket code re-derived from
    * plane literals ([[LshBuckets.bucketSql]]), the same 1+nPlanes
    * Hamming-1 probe set via xor, candidate equi-join on the code,
    * exact-L2 refine under the standard ranking contract. */
  def multiprobeOracle(dim: Int, nPlanes: Int, k: Int,
      numQueries: Int): String = {
    val b = LshBuckets.bucketSql("embedding", dim, nPlanes)
    val bq = LshBuckets.bucketSql("qv", dim, nPlanes)
    val probeList = (0L +: (0 until nPlanes).map(i => 1L << i))
      .mkString("[", ", ", "]")
    s"""WITH mb AS (SELECT vec_id, $b AS b FROM embeddings),
       |mq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |mqb AS (SELECT query_id, $bq AS qb FROM mq),
       |mpr AS (SELECT query_id, xor(qb::UBIGINT, p::UBIGINT)::BIGINT AS pb
       |  FROM mqb, (SELECT unnest($probeList) AS p)),
       |mcand AS (SELECT DISTINCT p.query_id, mb.vec_id
       |  FROM mpr p JOIN mb ON mb.b = p.pb)
       |SELECT query_id, neighbor_id, rnk, dist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rnk,
       |    round(sqrt(d), 4) AS dist
       |  FROM (SELECT c.query_id, c.vec_id, ${l2sqCol("e.embedding", "q.qv", dim)} AS d
       |        FROM mcand c JOIN embeddings e ON e.vec_id = c.vec_id
       |        JOIN mq q ON q.query_id = c.query_id)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** v_matryoshka_search: prefix-L2 shortlist over the first prefixDim
    * coordinates of the raw embedding — no literals, no seed, nothing
    * derived: both stages are the same column-vs-column fold differing
    * only in how far it runs. */
  def matryoshkaOracle(dim: Int, prefixDim: Int, k: Int,
      refineFactor: Int, numQueries: Int): String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY pd, vec_id) AS arnk
       |    FROM (SELECT q.query_id, e.vec_id, ${l2sqCol("e.embedding", "q.qv", prefixDim)} AS pd
       |          FROM embeddings e CROSS JOIN q)
       |  ) WHERE arnk <= ${k * refineFactor})
       |SELECT query_id, neighbor_id, rnk, dist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rnk,
       |    round(sqrt(d), 4) AS dist
       |  FROM (SELECT s.query_id, s.vec_id, ${l2sqCol("e.embedding", "q.qv", dim)} AS d
       |        FROM short s JOIN embeddings e ON e.vec_id = s.vec_id
       |        JOIN q ON q.query_id = s.query_id)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin

  /** v_pq_rerank: the ADC shortlist (top k×refine by (adist, vec_id),
    * exactly the flat-PQ ranking) re-ranked by the exact squared-L2
    * fold, sqrt applied only to the rounded output — mirroring
    * PqIndex.searchRefined's heap-on-d² decision order. */
  /** v_opq_search: pqRerankOracle with the literal PERMUTATION applied
    * first — permuted corpus/query vectors in MATERIALIZED CTEs (the
    * ivfPqResidualOracle discipline), codes re-derived from the literal
    * permuted-space codebooks, ADC ranked in the permuted space, exact
    * refine on the RAW vectors (L2 is permutation-invariant — the
    * engine's refine never touches the permutation either). */
  def opqRerankOracle(perm: Seq[Int], books: Seq[(Int, Int, Seq[Float])],
      numSub: Int, subDim: Int, k: Int, refineFactor: Int,
      numQueries: Int): String = {
    val PqSqlParts(dsExprs, codeExprs, qdExprs, adist) =
      pqParts(books, numSub, subDim, baseExpr = "pvec", queryExpr = "qpv")
    val dim = numSub * subDim
    val permLit = perm.mkString("[", ",", "]")
    s"""WITH pv AS MATERIALIZED (
       |  SELECT vec_id, [embedding[p + 1] for p in $permLit] AS pvec
       |  FROM embeddings),
       |codes AS (
       |  SELECT vec_id, $codeExprs
       |  FROM (SELECT vec_id, $dsExprs FROM pv)
       |),
       |qadc AS (
       |  SELECT query_id, $qdExprs
       |  FROM (SELECT vec_id AS query_id,
       |          [embedding[p + 1] for p in $permLit] AS qpv
       |        FROM embeddings WHERE vec_id < $numQueries)
       |),
       |qraw AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY ad, vec_id) AS arnk
       |    FROM (SELECT qadc.query_id, c.vec_id, $adist AS ad
       |          FROM codes c CROSS JOIN qadc)
       |  ) WHERE arnk <= ${k * refineFactor}
       |)
       |SELECT query_id, neighbor_id, rnk, dist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rnk,
       |    round(sqrt(d), 4) AS dist
       |  FROM (SELECT s.query_id, s.vec_id, ${l2sqCol("e.embedding", "qraw.qv", dim)} AS d
       |        FROM short s
       |        JOIN embeddings e ON e.vec_id = s.vec_id
       |        JOIN qraw ON qraw.query_id = s.query_id)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  def pqRerankOracle(books: Seq[(Int, Int, Seq[Float])],
      numSub: Int, subDim: Int, k: Int, refineFactor: Int,
      numQueries: Int): String = {
    val PqSqlParts(dsExprs, codeExprs, qdExprs, adist) =
      pqParts(books, numSub, subDim)
    val dim = numSub * subDim
    s"""WITH codes AS (
       |  SELECT vec_id, $codeExprs
       |  FROM (SELECT vec_id, $dsExprs FROM embeddings)
       |),
       |qadc AS (
       |  SELECT query_id, $qdExprs
       |  FROM (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries)
       |),
       |qraw AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $numQueries),
       |short AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY ad, vec_id) AS arnk
       |    FROM (SELECT qadc.query_id, c.vec_id, $adist AS ad
       |          FROM codes c CROSS JOIN qadc)
       |  ) WHERE arnk <= ${k * refineFactor}
       |)
       |SELECT query_id, neighbor_id, rnk, dist FROM (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d, vec_id) AS rnk,
       |    round(sqrt(d), 4) AS dist
       |  FROM (SELECT s.query_id, s.vec_id, ${l2sqCol("e.embedding", "qraw.qv", dim)} AS d
       |        FROM short s
       |        JOIN embeddings e ON e.vec_id = s.vec_id
       |        JOIN qraw ON qraw.query_id = s.query_id)
       |) WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }
}
