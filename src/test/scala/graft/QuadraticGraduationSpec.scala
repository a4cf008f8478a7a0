package graft

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

import graft.GraftVector._
import graft.queries.{DedupQueries, VectorQueries}

/** The round-2 graduation contract for the ex-quadratic operators: their
  * plans are bucketed joins now, and these specs hold them to the exact
  * quadratic forms (which live on here as verification oracles only).
  *
  *  - `d_edit_distance`'s q-gram prefilter is LOSSLESS, so its output
  *    must EQUAL the quadratic reference, row for row.
  *  - `v_knn_self_pairs` / `d_embed_neardup` run behind probabilistic
  *    LSH candidates (no lossless prefilter exists at their radii on
  *    unit 64-d vectors): output must be a SUBSET of the quadratic
  *    reference (precision 1.0 — the exact verify guarantees it) and
  *    must recover ≥95 % of planted true near-dups.
  */
class QuadraticGraduationSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "target/tmp-graduation"

  private def plantVectors(): Unit = {
    FileUtils.deleteQuietly(new java.io.File(s"$dir/embeddings.parquet"))
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val planted = base.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000).as("vec_id"),
        transform($"embedding", x => x * lit(1.01f) + lit(0.002f)).as("embedding"),
        $"label")
    base.select($"vec_id", $"embedding", $"label").unionByName(planted)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def plantedIds(): Set[(Long, Long)] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter($"vec_id" % 10 === 0).select($"vec_id")
      .collect().map(_.getLong(0)).map(v => (v, v + 100000L)).toSet

  test("banded v_knn_self_pairs: precision 1.0 vs exact, planted recall >= 0.95") {
    plantVectors()
    val res = VectorQueries.all("v_knn_self_pairs")(spark, dir)
      .select($"vec_a", $"vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = e.select($"vec_id".as("vec_a"), $"embedding".as("va"))
      .crossJoin(e.select($"vec_id".as("vec_b"), $"embedding".as("vb")))
      .filter($"vec_a" < $"vec_b" && round(l2($"va", $"vb"), 4) < 1.1)
      .select($"vec_a", $"vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res.subsetOf(exact), "banded output must never invent a pair")
    val truth = plantedIds()
    val recall = (res & truth).size.toDouble / truth.size
    assert(recall >= 0.95, s"planted near-pair recall $recall < 0.95")
  }

  test("banded d_embed_neardup: precision 1.0 vs exact, planted recall >= 0.95") {
    plantVectors()
    val res = DedupQueries.all("d_embed_neardup")(spark, dir)
      .select($"vec_a", $"vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = e.select($"vec_id".as("vec_a"), $"label", $"embedding".as("va"))
      .join(e.select($"vec_id".as("vec_b"), $"label", $"embedding".as("vb")), "label")
      .filter($"vec_a" < $"vec_b" && cosine($"va", $"vb") > 0.4)
      .select($"vec_a", $"vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res.subsetOf(exact), "banded output must never invent a pair")
    // planted copies share their original's label, so all are in-scope
    val truth = plantedIds()
    val recall = (res & truth).size.toDouble / truth.size
    assert(recall >= 0.95, s"planted near-dup recall $recall < 0.95")
  }

  test("d_edit_distance q-gram prefilter is lossless: output EQUALS quadratic reference") {
    FileUtils.deleteQuietly(new java.io.File(s"$dir/documents.parquet"))
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    // plant small-edit near-dups: 3 leading chars replaced (edit <= 3)
    val planted = base.filter($"doc_id" % 10 === 0 && $"n_chars" < 197)
      .select(($"doc_id" + 100000).as("doc_id"),
        concat(lit("zq!"), substring($"text", 4, 100000)).as("text"),
        $"lang", $"source", $"n_chars")
    base.unionByName(planted)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val res = DedupQueries.all("d_edit_distance")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val d = spark.read.parquet(s"$dir/documents.parquet").filter($"n_chars" < 200)
    val exact = d.select($"doc_id".as("doc_a"), $"lang", $"text".as("ta"))
      .join(d.select($"doc_id".as("doc_b"), $"lang", $"text".as("tb")), "lang")
      .filter($"doc_a" < $"doc_b")
      .withColumn("edit_dist", levenshtein($"ta", $"tb").cast("long"))
      .filter($"edit_dist" <= 5)
      .select($"doc_a", $"doc_b", $"edit_dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty, "planting must create qualifying pairs")
    assert(res === exact,
      s"lossless prefilter violated: missing=${exact -- res} extra=${res -- exact}")
  }

  test("d_edit_distance occupant cap: probe-only bound never invents pairs, discloses spill") {
    // reuses the planted corpus from the lossless test (runs after it)
    val (uncapped, spill0) =
      DedupQueries.editDistancePlanCapped(spark, dir, 1, occupantCap = 0)
    val full = uncapped.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(spill0.collect().head.getLong(1) === 0L)
    // a cap far above any group's occupancy is a no-op
    val (capHuge, spillHuge) =
      DedupQueries.editDistancePlanCapped(spark, dir, 1, occupantCap = 1 << 20)
    assert(capHuge.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === full)
    assert(spillHuge.collect().head.getLong(1) === 0L)
    // a tight cap bounds the work: subset of the full pairs, spill > 0
    val (capped, spill) =
      DedupQueries.editDistancePlanCapped(spark, dir, 1, occupantCap = 2)
    val cappedPairs = capped.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedPairs.subsetOf(full), "cap must never invent a pair")
    val sp = spill.collect().head
    assert(sp.getLong(0) === 2L)
    assert(sp.getLong(1) > 0L, "tight cap on this corpus must spill rows")
  }
}
