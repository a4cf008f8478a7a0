package graft

import org.apache.spark.sql.graft.Shims

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions SQL functions work end-to-end") {
    Shims.applyFunctionExtensions(spark, new GraftExtensions)
    val r = spark.sql(
      """SELECT graft_l2sq(array(1.0f, 2.0f), array(1.0f, 4.0f)) AS d,
        |       graft_l2(array(0.0f, 3.0f), array(4.0f, 0.0f)) AS e,
        |       graft_dot(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS dp,
        |       graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c,
        |       graft_norm(array(3.0f, 4.0f)) AS n,
        |       graft_simhash(array('a', 'b')) AS s,
        |       graft_fingerprint('hello') AS f,
        |       graft_minhash(array('a', 'b', 'c'), 1, 8) AS m,
        |       graft_minhash_bands(array('a', 'b', 'c'), 1, 8, 4) AS mb
        |""".stripMargin).head()
    assert(r.getDouble(0) === 4.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === 11.0)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    assert(r.getDouble(4) === 5.0)
    assert(r.getSeq[Long](7).length === 8)
    assert(r.getSeq[Long](8).length === 4)
  }

  test("SQL aggregates: graft_topk and graft_vector_avg") {
    Shims.applyFunctionExtensions(spark, new GraftExtensions)
    import spark.implicits._
    Seq((1L, 5.0, 10L), (1L, 1.0, 11L), (1L, 3.0, 12L))
      .toDF("g", "s", "id").createOrReplaceTempView("t_agg")
    val top = spark.sql(
      "SELECT graft_topk(s, id, 2) AS t FROM t_agg GROUP BY g")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(top === Seq((1.0, 11L), (3.0, 12L)))
    Seq((1L, Seq(1f, 3f)), (1L, Seq(3f, 5f))).toDF("g", "v")
      .createOrReplaceTempView("t_vec_agg")
    val avg = spark.sql(
      "SELECT graft_vector_avg(v) AS c FROM t_vec_agg GROUP BY g")
      .head().getSeq[Double](0)
    assert(avg === Seq(2.0, 4.0))
  }

  test("graft_topk implicitly widens FLOAT scores and INT ids at analysis time") {
    Shims.applyFunctionExtensions(spark, new GraftExtensions)
    import spark.implicits._
    // pre-fix this was an executor ClassCastException; now the analyzer
    // inserts casts via the declared inputTypes
    Seq((1L, 5.0f, 10), (1L, 1.0f, 11), (1L, 3.0f, 12))
      .toDF("g", "s", "id").createOrReplaceTempView("t_agg_narrow")
    val top = spark.sql(
      "SELECT graft_topk(s, id, 2) AS t FROM t_agg_narrow GROUP BY g")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(top === Seq((1.0, 11L), (3.0, 12L)))
  }

  test("identical token sets give identical minhash via SQL and Column API") {
    Shims.applyFunctionExtensions(spark, new GraftExtensions)
    import spark.implicits._
    val viaSql = spark.sql(
      "SELECT graft_minhash(array('x','y','z'), 1, 16) AS m").head().getSeq[Long](0)
    val viaCol = Seq(Seq("x", "y", "z")).toDF("t")
      .select(GraftText.minhashSignature($"t", 1, 16)).head().getSeq[Long](0)
    assert(viaSql === viaCol)
  }

  test("graft_lsh_bands SQL equals the Column API band keys") {
    Shims.applyFunctionExtensions(spark, new GraftExtensions)
    import spark.implicits._
    val vec = Seq.tabulate(8)(i => (i + 1).toFloat / 10f)
    val viaSql = spark.sql(
      s"SELECT graft_lsh_bands(array(${vec.mkString("f,")}f), 8, 4, 4, 42) AS b")
      .head().getSeq[Long](0)
    val viaCol = Seq(Tuple1(vec)).toDF("v")
      .select($"v".cast("array<float>").as("v"))
      .select(graft.operators.LshBuckets.bucketBands($"v", 8, 4, 4)).head().getSeq[Long](0)
    assert(viaSql === viaCol)
    assert(viaSql.length === 4)
  }

  test("parity audit: every registered graft_* function is SQL-exercised") {
    Shims.applyFunctionExtensions(spark, new GraftExtensions)
    import spark.implicits._
    // one sample invocation per function; the set-equality assertion
    // below makes this spec fail when a new function is registered
    // without being exercised here (or a sample goes stale)
    val scalar = Map(
      "graft_l2" -> "graft_l2(array(0.0f,3.0f), array(4.0f,0.0f))",
      "graft_l2sq" -> "graft_l2sq(array(1.0f,2.0f), array(1.0f,4.0f))",
      "graft_dot" -> "graft_dot(array(1.0f,2.0f), array(3.0f,4.0f))",
      "graft_cosine" -> "graft_cosine(array(1.0f,0.0f), array(1.0f,0.0f))",
      "graft_norm" -> "graft_norm(array(3.0f,4.0f))",
      "graft_simhash" -> "graft_simhash(array('a','b'))",
      "graft_fingerprint" -> "graft_fingerprint('hello')",
      "graft_minhash" -> "graft_minhash(array('a','b','c'), 1, 8)",
      "graft_minhash_bands" -> "graft_minhash_bands(array('a','b','c'), 1, 8, 4)",
      "graft_jaccard" -> "graft_jaccard(array('a','b'), array('b','c'))",
      "graft_char_ngrams" -> "graft_char_ngrams('abcd', 3)",
      "graft_char_ngrams_packed" -> "graft_char_ngrams_packed('abcd', 3)",
      "graft_jaccard_long" -> "graft_jaccard_long(array(1L,2L), array(2L,3L))",
      "graft_lsh_bands" ->
        "graft_lsh_bands(array(0.1f,0.2f,0.3f,0.4f), 4, 2, 4, 42)",
      "graft_shingle_hashes" -> "graft_shingle_hashes(array('a','b','c'), 2)",
      "graft_winnow" -> "graft_winnow('abcdefghijklmnop', 8, 4)",
      "graft_simhash_votes" -> "graft_simhash_votes(array('a','b','c'))",
      "graft_sq8_adc" ->
        ("graft_sq8_adc(array(0, 255), array(0.0f, 1.0f), " +
          "array(0.0D, 0.0D), array(0.003921568627451D, 0.003921568627451D))"),
      "graft_cms_estimate" ->
        "graft_cms_estimate('k', array_repeat(1L, 1024))",
      "graft_random_project" ->
        "graft_random_project(array(0.5f,1.5f,2.5f,3.5f), 4, 2, 42)")
    val aggregate = Map(
      "graft_topk" -> "graft_topk(s, id, 2)",
      "graft_vector_avg" -> "graft_vector_avg(v)",
      "graft_hll" -> "graft_hll(id)",
      "graft_cms" -> "graft_cms(CAST(id AS STRING))",
      "graft_bloom" -> "graft_bloom(id)",
      // probe against a really-built filter: the words array now carries
      // a header word (magic + numHashes), so a bare literal array is no
      // longer a valid filter — by design
      "graft_bloom_contains" -> "graft_bloom_contains(10L, graft_bloom(id))")
    val registered = spark.sessionState.functionRegistry.listFunction()
      .map(_.funcName).filter(_.startsWith("graft_")).toSet
    assert(registered === scalar.keySet ++ aggregate.keySet,
      s"unexercised: ${registered -- scalar.keySet -- aggregate.keySet}, " +
        s"stale: ${scalar.keySet ++ aggregate.keySet -- registered}")
    val row = spark.sql(
      "SELECT " + scalar.values.map(s => s"$s IS NOT NULL").mkString(" AND "))
      .head()
    assert(row.getBoolean(0), "a scalar graft_* sample evaluated to NULL")
    Seq((1L, 5.0, 10L, Seq(1f, 2f)), (1L, 1.0, 11L, Seq(3f, 4f)))
      .toDF("g", "s", "id", "v").createOrReplaceTempView("t_parity")
    val aggRow = spark.sql(
      s"""SELECT ${aggregate.values.map(a => s"$a IS NOT NULL").mkString(" AND ")}
         |FROM t_parity GROUP BY g""".stripMargin).head()
    assert(aggRow.getBoolean(0), "an aggregate graft_* sample evaluated to NULL")
  }

  test("graft_hll via SQL equals the Column API registers") {
    Shims.applyFunctionExtensions(spark, new GraftExtensions)
    import spark.implicits._
    spark.range(100).toDF("v").createOrReplaceTempView("t_hll_sql")
    val viaSql = spark.sql("SELECT graft_hll(v) FROM t_hll_sql")
      .head().getSeq[Int](0)
    val viaCol = spark.range(100).toDF("v")
      .agg(GraftSketch.hllRegisters($"v")).head().getSeq[Int](0)
    assert(viaSql === viaCol)
    // INT input widens at analysis time instead of a runtime CCE
    spark.sql("SELECT graft_hll(CAST(v AS INT)) FROM t_hll_sql").head()
  }

  test("static int params accept INT and BIGINT literal spellings alike") {
    Shims.applyFunctionExtensions(spark, new GraftExtensions)
    val vec = Seq.tabulate(8)(i => (i + 1).toFloat / 10f)
    def bands(seedSql: String) = spark.sql(
      s"SELECT graft_lsh_bands(array(${vec.mkString("f,")}f), 8, 4, 4, $seedSql) AS b")
      .head().getSeq[Long](0)
    assert(bands("42") === bands("CAST(42 AS BIGINT)"))
    // and a seed that doesn't fit in an INT at all
    assert(bands("CAST(4294967298 AS BIGINT)").length === 4)
  }
}
