package graft

import java.nio.file.Files

import graft.queries.DedupQueries

/** Laws for DSIR importance weighting: target-like raw docs outrank
  * target-unlike ones, target docs never appear in the output, the
  * selection is exactly top-100 (or all raw docs when fewer), and
  * the weight is a pure function of the corpus (rerun-stable).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def run(dir: String) =
    DedupQueries.all("d_dsir_weights")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("dsir").toString
    // target slice (src0): "alpha beta gamma" vocabulary; raw pool:
    // doc 100 written in the target vocabulary, docs 101/102 in a
    // disjoint one — DSIR must rank 100 first
    val target = (0L until 20L).map(i => (i, "alpha beta gamma delta", "en", "src0"))
    val raw = Seq(
      (100L, "alpha beta gamma delta alpha beta", "en", "src9"),
      (101L, "zulu yankee xray whiskey victor uniform", "en", "src9"),
      (102L, "november oscar papa quebec romeo sierra", "en", "src9"))
    (target ++ raw).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("target-vocabulary raw doc outranks disjoint-vocabulary docs") {
    val out = run(fixtureDir)
    assert(out.size === 3) // fewer raw docs than 100: all ranked
    assert(out.head._1 === 100L, s"expected doc 100 first: $out")
    assert(out.head._2 > out.tail.map(_._2).max,
      s"target-like weight not strictly highest: $out")
  }

  test("target docs never appear; disjoint-vocab docs weigh negative") {
    val out = run(fixtureDir)
    assert(out.forall(_._1 >= 100L), s"target doc leaked into output: $out")
    // tokens absent from the target slice: p_target comes only from
    // smoothing, so log(p_t/p_r) < 0 for every feature
    out.filter(r => r._1 == 101L || r._1 == 102L)
      .foreach { case (id, w) => assert(w < 0, s"doc $id weight $w") }
  }

  test("sf corpus: exactly top-100, rerun-stable, sorted by weight") {
    val a = run(sfDir)
    val b = run(sfDir)
    assert(a.size === 100)
    assert(a === b, "weights not rerun-stable")
    val ws = a.map(_._2)
    assert(ws === ws.sortBy(-_), "output not descending in weight")
  }
}
