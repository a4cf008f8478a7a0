package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.GraftSketch._
import graft.GraftText
import graft.GraftVector._

/** Algebraic laws over deterministic scalacheck-generated inputs. The
  * per-operator specs pin concrete values; these pin the EXACT
  * identities the distributed shapes rely on for any input: minhash's
  * elementwise-min union law is what makes its map-side combine
  * correct, HLL's elementwise-max merge IS mergeability, simhash's
  * permutation invariance is why token order never needs a sort, and
  * top-k-of-concatenation is the partial-aggregate contract. All
  * generators are seeded — failures reproduce.
  */
class LawsSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int = 100): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  private val tokenGen: Gen[List[String]] =
    Gen.chooseNum(1, 40).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(0, 60).map(i => s"w$i")))

  test("minhash union law: sig(A ++ B) = elementwise min(sig(A), sig(B))") {
    val df = cases(Gen.zip(tokenGen, tokenGen)).toDF("a", "b")
    val bad = df.select(
        GraftText.minhashSignature(concat($"a", $"b"), 1, 64).as("u"),
        zip_with(GraftText.minhashSignature($"a", 1, 64),
          GraftText.minhashSignature($"b", 1, 64),
          (x, y) => least(x, y)).as("m"))
      .filter(!($"u" <=> $"m")).count()
    assert(bad === 0, "minhash signature of a union must be the min of signatures")
  }

  test("simhash permutation invariance: token order never matters") {
    val rnd = new scala.util.Random(7)
    val df = cases(tokenGen).map(ts => (ts, rnd.shuffle(ts))).toDF("a", "p")
    val bad = df.select(GraftText.simhash64($"a").as("x"),
        GraftText.simhash64($"p").as("y"))
      .filter($"x" =!= $"y").count()
    assert(bad === 0)
  }

  test("jaccard merge-scan equals the set-arithmetic reference exactly") {
    val longSet: Gen[List[Long]] =
      Gen.chooseNum(1, 30).flatMap(k => Gen.listOfN(k, Gen.chooseNum(0L, 50L)))
    val data = cases(Gen.zip(longSet, longSet)).map { case (a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      (sa.toSeq.sorted, sb.toSeq.sorted,
        (sa & sb).size.toDouble / (sa | sb).size)
    }
    val bad = data.toDF("a", "b", "expected")
      .select(GraftText.jaccardSortedLong($"a", $"b").as("j"), $"expected")
      .filter($"j" =!= $"expected").count()
    assert(bad === 0, "same |∩|/|∪| double division — must be bit-equal")
  }

  test("packed n-gram sets are injective: long-set size == string-set size") {
    val textGen = Gen.chooseNum(0, 30).flatMap(k =>
      Gen.listOfN(k, Gen.alphaLowerChar).map(_.mkString))
    val df = cases(textGen).toDF("t")
    for (n <- Seq(2, 3)) {
      val bad = df.select(
          size(GraftText.charNgramSet($"t", n)).as("s"),
          size(GraftText.charNgramLongSet($"t", n)).as("l"))
        .filter($"s" =!= $"l").count()
      assert(bad === 0, s"n=$n: packing collapsed distinct grams")
    }
  }

  test("top-k of a concatenation = top-k of merged per-part top-ks (partial-agg law)") {
    val pairGen = Gen.chooseNum(1, 25).flatMap(k => Gen.listOfN(k,
      Gen.zip(Gen.chooseNum(-1000, 1000).map(_ / 7.0), Gen.chooseNum(0L, 40L))))
    val data = cases(Gen.zip(pairGen, pairGen))
    val rows = data.zipWithIndex.flatMap { case ((a, b), cid) =>
      a.map(p => (cid.toLong, 0, p._1, p._2)) ++
        b.map(p => (cid.toLong, 1, p._1, p._2))
    }.toDF("cid", "part", "s", "id")
    val whole = rows.groupBy($"cid")
      .agg(topK($"s", $"id", 5).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val merged = rows.groupBy($"cid", $"part")
      .agg(topK($"s", $"id", 5).as("t"))
      .select($"cid", explode($"t").as("e"))
      .select($"cid", $"e.score".as("s"), $"e.id".as("id"))
      .groupBy($"cid").agg(topK($"s", $"id", 5).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(whole === merged)
  }

  test("HLL merge law: registers(A ++ B) = elementwise max of part registers") {
    val valGen = Gen.chooseNum(1, 50).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(0L, 100000L)))
    val data = cases(Gen.zip(valGen, valGen), n = 40)
    val rows = data.zipWithIndex.flatMap { case ((a, b), cid) =>
      a.map(v => (cid.toLong, 0, v)) ++ b.map(v => (cid.toLong, 1, v))
    }.toDF("cid", "part", "v")
    val whole = rows.groupBy($"cid").agg(hllRegisters($"v").as("r"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
    val parts = rows.groupBy($"cid", $"part").agg(hllRegisters($"v").as("r"))
      .collect().groupBy(_.getLong(0)).map { case (cid, rs) =>
        cid -> rs.map(_.getSeq[Int](2).toVector).reduce((x, y) =>
          x.zip(y).map { case (p, q) => math.max(p, q) })
      }
    assert(whole === parts)
  }

  test("bloom laws: no false negative for ANY key set; merge = bitwise OR") {
    // through the REAL aggregate and probe expression (not a re-derived
    // bit check): one batched plan over all generated sets
    val setGen = Gen.chooseNum(1, 200).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(Long.MinValue, Long.MaxValue)))
    val sets = cases(setGen, n = 20)
    val rows = sets.zipWithIndex.flatMap { case (ks, g) =>
      ks.zipWithIndex.map { case (k, i) => (g, i % 2, k) }
    }.toDF("g", "half", "k")
    // no false negative: every key probes true against its set's filter
    val filters = rows.groupBy($"g").agg(bloomFilter($"k").as("bf"))
    val misses = rows.join(filters, "g")
      .filter(!bloomMightContain($"k", $"bf")).count()
    assert(misses === 0L, "false negative through BloomMightContain")
    // merge = bitwise OR: the half-split filters OR together into the
    // whole-set filter, bit for bit, for every generated set
    val halves = rows.groupBy($"g", $"half").agg(bloomFilter($"k").as("hbf"))
      .groupBy($"g").agg(collect_list($"hbf").as("hs"))
    val badMerges = filters.join(halves, "g")
      .select($"bf", when(size($"hs") === 1, $"hs"(0))
        .otherwise(zip_with($"hs"(0), $"hs"(1), (a, b) => a.bitwiseOR(b)))
        .as("ored"))
      .filter(!($"bf" <=> $"ored")).count()
    assert(badMerges === 0L, "OR of split filters != whole-set filter")
  }

  test("chunk-window arithmetic tiles every doc length: cover, overlap, clip") {
    // the same integer formulas as t_chunk_windows, over all n in 1..500
    val ctx = 32L; val stride = 24L
    (1L to 500L).foreach { n =>
      val nChunks = 1L + math.max(0L, n - ctx + stride - 1) / stride
      val spans = (0L until nChunks).map { i =>
        (i * stride, math.min(i * stride + ctx, n))
      }
      assert(spans.head._1 === 0L)
      assert(spans.last._2 === n, s"n=$n: last chunk must end at n")
      spans.foreach { case (s, e) => assert(e > s, s"n=$n: empty chunk") }
      spans.zip(spans.tail).foreach { case ((s1, e1), (s2, _)) =>
        assert(s2 === s1 + stride && s2 < e1, s"n=$n: gap between chunks")
      }
    }
  }

  test("winnowing laws: concat guarantee, gram-subset, density bound") {
    // random lowercase strings; every selected fingerprint must be a
    // window minimum of the gram hashes (subset law), the count is
    // bounded by the window count, and appending a shared >= k+w-1
    // tail to two different strings forces a shared fingerprint
    val strGen = Gen.chooseNum(12, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum('a'.toInt, 'z'.toInt).map(_.toChar))
        .map(_.mkString))
    val pairs = cases(Gen.zip(strGen, strGen), 60)
    val df = pairs.toDF("x", "y")
      .select(GraftText.winnowFingerprints($"x", 8, 4).as("fx"),
        GraftText.winnowFingerprints(concat($"x", lit("SHAREDTAIL9"), $"y"),
          8, 4).as("fxy"),
        GraftText.winnowFingerprints(concat($"y", lit("SHAREDTAIL9"), $"x"),
          8, 4).as("fyx"),
        length($"x").as("nx"))
    val rows = df.collect()
    rows.foreach { r =>
      val fx = r.getSeq[Long](0); val n = r.getInt(3)
      assert(fx.size <= n - 8 + 1 - 4 + 1, "more fingerprints than windows")
      assert(fx == fx.sorted && fx.distinct.size == fx.size)
      // the 11-byte shared tail guarantees a common fingerprint between
      // the two concatenations regardless of surrounding context
      val shared = r.getSeq[Long](1).toSet & r.getSeq[Long](2).toSet
      assert(shared.nonEmpty, "winnowing guarantee violated")
    }
  }

  test("random projection is odd: project(-x) = -project(x) exactly") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-10000, 10000).map(_ / 129.0f))
    val signs = graft.operators.RpSearch.signs(outDim = 4, inDim = 8, seed = 9L)
    val df = cases(vecGen).map(v => (v, v.map(x => -x))).toDF("x", "nx")
    val bad = df.select(
        graft.operators.RpSearch.project($"x", signs, 4).as("px"),
        graft.operators.RpSearch.project($"nx", signs, 4).as("pnx"))
      .select(zip_with($"px", $"pnx", (a, b) => a + b).as("z"))
      // IEEE negation is exact, so px + pnx must be exactly ±0.0 per coord
      .filter(exists($"z", c => c =!= 0.0f)).count()
    assert(bad === 0)
  }
}
