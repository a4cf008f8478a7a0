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
