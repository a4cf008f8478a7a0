package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media wrapping preserves ids and byte counts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.asMedia(docs)
    val feats = Multimodal.featurize(media).toDF()
    assert(feats.count() === docs.count())
    val joined = feats.join(docs, "doc_id")
      .filter($"n_bytes" =!= length($"text").cast("long"))
    assert(joined.count() === 0) // ASCII text: bytes == chars
  }

  test("frame sampling covers every byte exactly once with bounded frames") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.asMedia(docs)
    val frames = Multimodal.frameSample(media, frameBytes = 256).toDF().cache()
    // per-doc frame bytes sum back to the payload size; every frame <= 256
    val sums = frames.groupBy($"doc_id")
      .agg(sum($"n_bytes").as("total"), max($"n_bytes").as("widest"),
        count(lit(1)).as("n_frames"))
      .join(docs.select($"doc_id", length($"text").cast("long").as("len")), "doc_id")
    assert(sums.filter($"total" =!= $"len").count() === 0)
    assert(sums.filter($"widest" > 256).count() === 0)
    // empty payloads still emit one (empty) frame — frameSample's
    // max(frames, 1), mirrored by the oracle's greatest(..., 1)
    assert(sums.filter($"n_frames" =!=
      greatest(ceil($"len" / lit(256.0)).cast("long"), lit(1L))).count() === 0)
    frames.unpersist()
  }

  test("resize stub: output bounded at target, short payloads untouched, deterministic") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.asMedia(docs)
    val resized = Multimodal.resizeStub(media, targetBytes = 128)
    val lens = resized.toDF()
      .select($"doc_id", length($"payload").cast("long").as("out_len"))
      .join(docs.select($"doc_id", length($"text").cast("long").as("in_len")), "doc_id")
    assert(lens.filter($"out_len" > 128).count() === 0)
    assert(lens.filter($"in_len" <= 128 && $"out_len" =!= $"in_len").count() === 0)
    val a = resized.collect().map(r => r.doc_id -> r.payload.toSeq).toMap
    val b = Multimodal.resizeStub(media, 128).collect()
      .map(r => r.doc_id -> r.payload.toSeq).toMap
    assert(a === b)
  }

  test("feature kNN: 8 queries x 5 ranked rows, rank-1 at distance zero") {
    val out = graft.queries.PipelineQueries.all("m_feature_knn")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 40)
    assert(out.map(_._1).distinct.sorted === (0L until 8L))
    out.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted === (1L to 5L), s"query $q ranks")
      // some doc at distance 0 exists (the query payload itself), so
      // rank 1 must sit at 0; distances are non-decreasing in rank
      val byRank = rows.sortBy(_._3)
      assert(byRank.head._4 === 0.0, s"query $q rank-1 dist")
      assert(byRank.map(_._4) === byRank.map(_._4).sorted, s"query $q order")
    }
  }

  test("stub featurizer is deterministic and produces unit-L1 features") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(20)
    val f1 = Multimodal.featurize(Multimodal.asMedia(docs)).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    val f2 = Multimodal.featurize(Multimodal.asMedia(docs)).collect()
      .map(f => f.doc_id -> f.features.toSeq).toMap
    assert(f1 === f2)
    f1.values.foreach { feat =>
      assert(feat.length === Multimodal.FeatureDim)
      assert(math.abs(feat.map(_.toDouble).sum - 1.0) < 1e-5)
    }
  }
}
