package graft

import org.scalatest.funsuite.AnyFunSuite

/** SPARK_GRAFT_SKIP contract: out-of-contract scale probes may exclude
  * the suite's declared quadratics, but never silently — the parse is
  * the gate that makes a typo loud instead of quietly timing the query
  * it meant to exclude.
  */
class BenchSkipSpec extends AnyFunSuite {
  private val known = Set("q1", "v_knn_graph", "store:knng")

  test("absent / empty env skips nothing") {
    assert(Bench.parseSkip(None, known) === Set.empty)
    assert(Bench.parseSkip(Some(""), known) === Set.empty)
    assert(Bench.parseSkip(Some(" , ,"), known) === Set.empty)
  }

  test("known names parse, whitespace-tolerant, queries and stores alike") {
    assert(Bench.parseSkip(Some("v_knn_graph, store:knng"), known) ===
      Set("v_knn_graph", "store:knng"))
  }

  test("an unknown name throws naming the offender (no silent skip)") {
    val e = intercept[IllegalArgumentException] {
      Bench.parseSkip(Some("v_knn_graph,v_knn_grpah"), known)
    }
    assert(e.getMessage.contains("v_knn_grpah"))
  }
}
