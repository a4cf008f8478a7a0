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

  test("a REAL image decoder (javax.imageio JPEG/PNG) runs through the mapPartitions seam") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // in-memory fixtures: a solid mid-gray JPEG and a left-black/
    // right-white PNG — encoded with the SAME JDK codecs a real media
    // pipeline would decode with, so this proves the seam end to end
    // with a genuine (lossy!) decoder, not a byte trick
    def encode(fmt: String, paint: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, paint(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"no $fmt writer in this JDK")
      bos.toByteArray
    }
    val gray = 0x808080
    val jpeg = encode("jpg", (_, _) => gray)
    val png = encode("png", (x, _) => if (x < 8) 0x000000 else 0xffffff)
    val rows = Seq(
      Multimodal.MediaRow(1L, jpeg, "image/jpeg"),
      Multimodal.MediaRow(2L, png, "image/png"))
    // >1 partitions: the decoder factory must initialize per partition
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
      .repartition(2)
    val out = Multimodal.featurizeWith(ds, Multimodal.imageDecoder _)
      .collect().map(f => f.doc_id -> f).toMap
    assert(out.size === 2)
    // solid gray: every 4x4 cell's mean luminance ≈ 128/255 (JPEG is
    // lossy — tolerance, not equality)
    val g = out(1L).features
    assert(g.length === Multimodal.FeatureDim)
    g.foreach(v => assert(math.abs(v - 128f / 255f) < 0.05, s"gray cell $v"))
    // half-black/half-white PNG (lossless): left grid columns ~0,
    // right ~1
    val p = out(2L).features
    for (r <- 0 until 4; c <- 0 until 4) {
      val v = p(r * 4 + c)
      if (c < 2) assert(v < 0.02, s"cell ($r,$c)=$v should be black")
      else assert(v > 0.98, s"cell ($r,$c)=$v should be white")
    }
    // byte counts reflect the ENCODED payload (metadata travels intact)
    assert(out(1L).n_bytes === jpeg.length.toLong)
  }

  test("synthPngMedia emits genuine PNG bytes and decodeStats recovers " +
      "the exact pixel rule (lossless encode->decode round trip)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).limit(30).repartition(3)
    val media = Multimodal.synthPngMedia(docs)
    // real compressed media: PNG magic on every payload
    media.collect().foreach { r =>
      val m = r.payload.take(8).map(_ & 0xff)
      assert(m.startsWith(Seq(0x89, 0x50, 0x4e, 0x47)),
        s"doc ${r.doc_id} payload is not a PNG")
    }
    val got = Multimodal.decodeStats(media).collect()
      .map(s => s.doc_id -> s).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, s) =>
      val w = 8 + (id % 5).toInt
      val h = 8 + (id % 3).toInt
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(s.width == w && s.height == h && s.px_sum == want,
        s"doc $id stats ${(s.width, s.height, s.px_sum)} != ${(w, h, want)}")
    }
  }

  test("rasterPoolDecoder features equal the pixel rule pooled exactly " +
      "(decode -> pool round trip, no colorspace drift)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).limit(20).repartition(2)
    val got = Multimodal.featurizeWith(Multimodal.synthPngMedia(docs),
        Multimodal.rasterPoolDecoder _)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, fv) =>
      val w = 8 + (id % 5).toInt
      val h = 8 + (id % 3).toInt
      val sums = new Array[Long](16)
      val counts = new Array[Long](16)
      for (y <- 0 until h; x <- 0 until w) {
        val cell = math.min(3, y * 4 / h) * 4 + math.min(3, x * 4 / w)
        sums(cell) += (id * 31 + x * 7 + y * 13) % 256
        counts(cell) += 1
      }
      val want = (0 until 16).map(i =>
        (sums(i).toDouble / counts(i) / 255.0).toFloat)
      assert(fv == want, s"doc $id features drifted from the pixel rule")
    }
  }

  test("synthGifMedia emits genuine multi-frame GIFs and decodeFrames " +
      "recovers every frame's exact pixel rule (lossless round trip)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).limit(30).repartition(3)
    val media = Multimodal.synthGifMedia(docs)
    // real container bytes: GIF89a/GIF87a magic on every payload
    media.collect().foreach { r =>
      assert(new String(r.payload.take(3), "US-ASCII") == "GIF",
        s"doc ${r.doc_id} payload is not a GIF")
    }
    val got = Multimodal.decodeFrames(media).collect()
      .groupBy(_.doc_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, frames) =>
      val w = 8 + (id % 5).toInt
      val h = 8 + (id % 3).toInt
      // one row per STORED frame, indices contiguous from 0
      assert(frames.length == 2 + (id % 3).toInt, s"doc $id frame count")
      assert(frames.map(_.frame_idx).toSeq == (0L until frames.length),
        s"doc $id frame indices")
      frames.foreach { fr =>
        val want = (for (y <- 0 until h; x <- 0 until w)
          yield (id * 31 + fr.frame_idx * 17 + x * 7 + y * 13) % 256).sum
        assert(fr.width == w && fr.height == h && fr.px_sum == want,
          s"doc $id frame ${fr.frame_idx}: " +
            s"${(fr.width, fr.height, fr.px_sum)} != ${(w, h, want)}")
      }
    }
    // the demux is deterministic across runs
    assert(Multimodal.decodeFrames(media).collect().toSet ==
      got.values.flatten.toSet)
  }

  test("decodeStats fails loudly on an undecodable payload") {
    val bad = spark.createDataset(Seq(
      Multimodal.MediaRow(7L, Array[Byte](1, 2, 3), "image/png")))(
      org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeStats(bad).collect()
    }
    assert(e.getMessage != null)
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
