package graft

import java.nio.file.Files

import graft.queries.{AnalyticsQueries, DedupQueries, TextQueries}

/** Hand-computed fixtures for the corpus-quality/audit additions:
  * per-doc token entropy, the key-skew spectrum, and the minhash
  * dedup-quality evaluation. */
class QualityAuditSpec extends SparkSpec {
  import spark.implicits._

  test("q_dau_wau: hand-computed 7-day windows on a 3-day fixture") {
    val dir = Files.createTempDirectory("graft_dw").toString
    // day 1: users {1,2}; day 3: {2,3}; day 8: {4}
    // WAU(1)=[day -5..1]={1,2}; WAU(3)=[day -3..3]={1,2,3};
    // WAU(8)=[day 2..8]={2,3,4} (day 1 outside the window)
    // ts is stored as epoch NANOS in a long, the events.parquet layout
    // Tables.loadEvents expects
    Seq(
      (0L, "2024-01-01 10:00:00", 1L), (1L, "2024-01-01 11:00:00", 2L),
      (2L, "2024-01-03 10:00:00", 2L), (3L, "2024-01-03 11:00:00", 3L),
      (4L, "2024-01-08 10:00:00", 4L))
      .toDF("event_id", "ts_s", "user_id")
      .select($"event_id",
        (org.apache.spark.sql.functions.unix_timestamp(
          $"ts_s".cast("timestamp")) * 1000000000L).as("ts"),
        $"user_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.all("q_dau_wau")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-03", 2L, 3L, 0.6667),
      ("2024-01-08", 1L, 3L, 0.3333)))
  }

  test("v_embed_clusters: exact partition, min-label ids, sizes account") {
    val out = graft.queries.IndexQueries.all("v_embed_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(out.length === n, "every vector labeled exactly once")
    assert(out.map(_._1).distinct.length === n)
    out.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid, s"cluster $cid not min-labeled")
      assert(members.forall(_._3 === members.size), s"cluster $cid size")
    }
    assert(out.map(_._1).toSet.intersect(out.map(_._2).toSet).size ===
      out.map(_._2).distinct.size, "cluster ids are member ids")
  }

  test("q_fk_audit counts planted orphans and NULL fks; clean rels at zero") {
    val dir = Files.createTempDirectory("graft_fk").toString
    def pq(name: String, df: org.apache.spark.sql.DataFrame) =
      df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    pq("region", Seq((0L, "R0")).toDF("r_regionkey", "r_name"))
    pq("nation", Seq((0L, "N0", 0L), (1L, "N1", 7L), (2L, "N2", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")) // regionkey 7: orphan
    pq("customer", Seq((0L, "C0", 0L), (1L, "C1", 9L))
      .toDF("c_custkey", "c_name", "c_nationkey")) // nationkey 9: orphan
    pq("supplier", Seq((0L, "S0", 1L)).toDF("s_suppkey", "s_name", "s_nationkey"))
    pq("orders", Seq((0L, 0L), (1L, 1L), (2L, 5L))
      .toDF("o_orderkey", "o_custkey")) // custkey 5: orphan
    pq("part", Seq((0L, "P0")).toDF("p_partkey", "p_name"))
    pq("lineitem",
      Seq((0L, Some(0L), 0L), (1L, None, 0L), (9L, Some(0L), 0L))
        .toDF("l_orderkey", "l_partkey", "l_suppkey")) // NULL partkey
        // orphan; l_orderkey 9 orphan
    val out = AnalyticsQueries.all("q_fk_audit")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("nation.n_regionkey->region") === ((3L, 1L)))
    assert(out("customer.c_nationkey->nation") === ((2L, 1L)))
    assert(out("orders.o_custkey->customer") === ((3L, 1L)))
    assert(out("lineitem.l_partkey->part") === ((3L, 1L)), "NULL fk is an orphan")
    assert(out("lineitem.l_orderkey->orders") === ((3L, 1L)))
    assert(out("lineitem.l_suppkey->supplier") === ((3L, 0L)))
    assert(out("supplier.s_nationkey->nation") === ((1L, 0L)))
  }

  test("t_entropy: uniform tokens hit the log2 ceiling, constant docs hit zero") {
    val dir = Files.createTempDirectory("graft_ent").toString
    Seq(
      (1L, "a a a a", "en", "s1"),   // H = 0, norm undefined (1 type)
      (2L, "a b c d", "en", "s1"),   // H = 2 bits, norm = 1
      (3L, "a a b b", "en", "s1"),   // H = 1 bit, norm = 1
      (4L, "a a a b", "en", "s1"))   // H = 0.8113, norm = 0.8113
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.all("t_entropy")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(rows.toSeq === Seq(
      (1L, 4L, 1L, 0.0, None),
      (2L, 4L, 4L, 2.0, Some(1.0)),
      (3L, 4L, 2L, 1.0, Some(1.0)),
      (4L, 4L, 2L, 0.8113, Some(0.8113))))
  }

  test("q_skew_metrics: log2 frequency spectrum with exact bucket boundaries") {
    val dir = Files.createTempDirectory("graft_skew").toString
    // l_suppkey counts: k1:1, k2:1, k3:2, k4:4 → buckets 0(2 keys,2 rows),
    // 1(1 key,2 rows), 2(1 key,4 rows); l_partkey: all 8 rows one key
    val supp = Seq(1L, 2L, 3L, 3L, 4L, 4L, 4L, 4L)
    supp.map(k => (k, 77L)).toDF("l_suppkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = AnalyticsQueries.all("q_skew_metrics")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.toSeq === Seq(
      ("l_partkey", 3L, 1L, 8L, 8L, 8L, 1.0),
      ("l_suppkey", 0L, 2L, 2L, 8L, 4L, 0.5),
      ("l_suppkey", 1L, 1L, 2L, 8L, 4L, 0.5),
      ("l_suppkey", 2L, 1L, 4L, 8L, 4L, 0.5)))
  }

  test("d_minhash_eval: planted duplicates are recalled; sample cap and truth are exact") {
    // The audit sample is the FIXED-COUNT smallest-256-by-Knuth-hash
    // subset (a rate sample is unbounded at 100 TB). Fixture: 300 docs
    // ranked by the unsigned Knuth hash; the planted identical pair
    // sits at the two SMALLEST ranks (in-sample by construction), a
    // third identical copy sits at the LARGEST rank (the cap must drop
    // it — with a rate gate it would sneak in and inflate truth to 3).
    def hk(id: Long) =
      java.lang.Long.remainderUnsigned(id * 2654435761L, 4294967296L)
    val ranked = (1L to 300L).sortBy(hk)
    val Seq(a, b) = ranked.take(2)
    val out = ranked.last // rank 300 of 300 > 256: outside the sample
    val dup = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val dir = Files.createTempDirectory("graft_mhe").toString
    val filler = ranked.drop(2).dropRight(1).zipWithIndex.map {
      case (id, i) =>
        // 10 unique tokens per doc: no cross-doc overlap anywhere
        (id, (0 until 10).map(j => s"f${i}_$j").mkString(" "), "en", "s1")
    }
    (filler ++ Seq(
      (a, dup, "en", "s1"), // identical pair: j = 1, both in-sample
      (b, dup, "en", "s1"),
      (out, dup, "en", "s1"))) // identical but beyond the 256-cap
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = DedupQueries.all("d_minhash_eval")(spark, dir).collect()(0)
    val (truth, cand, hits) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(truth === 1L,
      "exactly the planted in-sample identical pair is truth (the cap drops the third copy)")
    assert(hits === 1L, "the identical pair must be recalled")
    assert(r.getDouble(4) === 1.0, "recall must be 1.0")
    assert(cand >= 1L)
  }

  test("q_data_profile: typed min/max (never string-ordered), nulls and distincts counted") {
    val dir = Files.createTempDirectory("graft_prof").toString
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    Seq(
      (9L, Some(1L), 10.00, ts, "1-URGENT", "F"),
      (10L, Some(1L), 2.50, ts, "5-LOW", "O"),   // key 10 > 9 numerically, "10" < "9" as strings
      (2L, None, 7.25, ts, "5-LOW", "F"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "o_orderpriority", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = AnalyticsQueries.all("q_data_profile")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))))
      .toMap
    assert(rows("o_orderkey") === ((3L, 0L, 3L, "2", "10")),
      "max must be typed (10), not string-ordered (9)")
    assert(rows("o_custkey") === ((3L, 1L, 1L, "1", "1")),
      "nulls counted and excluded from distinct/min/max")
    assert(rows("o_totalprice_cents") === ((3L, 0L, 3L, "250", "1000")))
  }

  test("t_collocations: a fused pair tops PMI; an independent pair scores near zero") {
    val dir = Files.createTempDirectory("graft_coll").toString
    // "aa bb" always adjacent (fused); "xx"/"yy" frequent but paired
    // with everything equally (independent)
    val fused = Seq.fill(8)("aa bb").mkString(" ")
    val indep = (1 to 8).map(i => s"xx w$i yy v$i").mkString(" ")
    Seq((1L, fused, "en", "s1"), (2L, indep, "en", "s1"),
      (3L, fused + " " + indep, "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.all("t_collocations")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.head._1 === (("aa", "bb")),
      s"the fused bigram must rank first: ${rows.take(3).toSeq}")
    // TakeOrdered, never a global sort of the bigram frame
    spark.catalog.clearCache()
    val p = TextQueries.all("t_collocations")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a bounded TakeOrdered:\n$p")
  }

  test("v_quantize_error: the ladder trades error for compression (sq8 << pq)") {
    val rows = graft.queries.IndexQueries.all("v_quantize_error")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val (nPq, _, ePq) = rows("pq8x16")
    val (nSq, _, eSq) = rows("sq8")
    assert(nPq === nSq, "both rungs must cover the whole corpus")
    assert(eSq >= 0.0 && ePq >= 0.0)
    assert(eSq < ePq / 100,
      s"4x compression must reconstruct far better than 32x: sq8=$eSq pq=$ePq")
  }

  test("t_lang_confusion: misdeclared docs land off-diagonal with exact shares") {
    val dir = Files.createTempDirectory("graft_lc").toString
    Seq(
      (1L, "the cat and the dog", "en", "s1"),  // en → en
      (2L, "the fish and a bird", "en", "s1"),  // en → en
      (3L, "the boat and a car", "de", "s1"),   // declared de, reads en
      (4L, "der hund ist und das", "de", "s1"), // de → de
      (5L, "zzz qqq www", "fr", "s1"))          // no evidence → unknown
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.all("t_lang_confusion")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq === Seq(
      ("de", "de", 1L, 0.5), ("de", "en", 1L, 0.5),
      ("en", "en", 2L, 1.0),
      ("fr", "unknown", 1L, 1.0)))
  }

  test("v_nprobe_sweep: recall is monotone in nprobe and exactly hit-counted") {
    val rows = graft.queries.IndexQueries.all("v_nprobe_sweep")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L))
    val recalls = rows.map(_._4)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not decrease with nprobe: ${recalls.toSeq}")
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    // avg_recall must be the exact integer ratio, not a float mean
    rows.foreach { case (_, nq, hits, rec) =>
      assert(rec === math.rint(hits.toDouble / (10 * nq) * 10000) / 10000)
    }
  }

  test("v_knn_graph: no self-loops, ranks dense, distances monotone per vector") {
    val rows = graft.queries.IndexQueries.all("v_knn_graph")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (v, n, _, _) => v != n }, "self-loops must be dropped")
    rows.groupBy(_._1).foreach { case (v, ns) =>
      val byRnk = ns.sortBy(_._3)
      assert(byRnk.map(_._3).toSeq === (1L to byRnk.length).toSeq,
        s"ranks must be dense for $v")
      val ds = byRnk.map(_._4)
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
        s"distances must be monotone in rank for $v")
      assert(ns.length <= 5)
    }
  }

  test("d_minhash_eval: no cartesian — truth pairs come from the length-range band join") {
    spark.catalog.clearCache()
    val p = DedupQueries.all("d_minhash_eval")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"truth/candidate generation must never be a cartesian:\n$p")
  }

  test("perceptron classifier converges on a separable fixture and is rerun-stable") {
    // disjoint token sets per class: linearly separable in the hashed
    // bucket space (with overwhelming probability under FNV), so the
    // batch perceptron must classify every doc correctly within the
    // entry's 6 rounds
    val docs = Seq(
      (1L, "alpha beta gamma alpha", "src0"),
      (2L, "beta gamma alpha beta beta", "src1"),
      (3L, "delta epsilon zeta zeta", "src9"),
      (4L, "epsilon zeta delta", "src8"),
      (5L, "alpha gamma beta", "src2"),
      (6L, "zeta delta epsilon epsilon", "src7")
    ).toDF("doc_id", "text", "source")
    val out = TextQueries.perceptronQuality(docs, rounds = 6)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getBoolean(2) === r.getBoolean(3),
        s"doc ${r.getLong(0)} misclassified after training: score=${r.getLong(1)}")
    }
    val again = TextQueries.perceptronQuality(docs, rounds = 6)
      .orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq,
      "training must be deterministic run-to-run")
  }
}
