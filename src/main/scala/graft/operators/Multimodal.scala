package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (beyond the reference's float-vector-only
  * data model — /root/reference/proto/vector_search.proto carries
  * `repeated float`; a training-data pipeline also moves the raw media
  * the vectors describe): media payloads ride as opaque `binary`
  * columns with a typed metadata struct; feature extraction runs as a
  * typed `mapPartitions` (the Scala analog of `mapInPandas` batch UDFs) so
  * heavyweight decoders initialize once per partition, not per row.
  *
  * Two decode tiers coexist behind one seam ([[featurizeWith]]):
  * the deterministic byte-histogram STUB (`featurize`) remains the
  * default for the text-payload corpus, and REAL javax.imageio
  * decoders run in the gated, benched paths — [[synthPngMedia]] +
  * [[decodeStats]] (m_decode_stats: encode→decode round trip, exact
  * raster stats) and [[rasterPoolDecoder]] (m_image_knn: similarity
  * search over genuinely decoded, exactly-pooled features). A CNN
  * featurizer or audio codec plugs into the same per-partition
  * factory shape.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long, features: Array[Float])
  case class MediaFrame(
      doc_id: Long, frame_idx: Long, n_bytes: Long, features: Array[Float])

  val FeatureDim = 16

  /** Shared stub "decode": 16-bin byte histogram of a payload slice,
    * L1-normalized in float (replicable bit-for-bit in the SQL oracle).
    * Counts accumulate EXACTLY in long — a float accumulator saturates
    * at 2^24 occurrences per bin while the oracle counts exactly, so
    * engine/oracle hashes would diverge for >16.7 MB-per-bin payloads.
    * The final count→float conversion is exact for any payload this
    * side of 2^53 bytes, and for sub-2^24 counts the emitted values are
    * bit-identical to the old float-accumulated ones. */
  private[operators] def byteHistogram(
      payload: Array[Byte], from: Int, until: Int): Array[Float] = {
    val counts = new Array[Long](FeatureDim)
    var i = from
    while (i < until) {
      counts((payload(i) & 0xff) >> 4) += 1L
      i += 1
    }
    val n = math.max(until - from, 1)
    Array.tabulate(FeatureDim)(j => counts(j).toFloat / n.toFloat)
  }

  /** The decoder SEAM: featurize with a caller-supplied decoder factory.
    * The factory runs ONCE PER PARTITION (where a real pipeline
    * initializes its codec/model), the returned function once per row —
    * the exact batch shape a heavyweight decoder needs. The stub
    * [[featurize]] and the real [[imageDecoder]] both plug in here, so
    * the Spark-side plumbing is identical whichever decoder is live. */
  def featurizeWith(ds: Dataset[MediaRow],
      decoder: () => Array[Byte] => Array[Float]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val decode = decoder() // heavyweight init: once per partition
      it.map { r =>
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
          decode(r.payload))
      }
    }
  }

  /** STUB featurizer: byte histogram over the whole payload — the
    * oracle-gated default ([[featurizeWith]] with the stub plugged in).
    * Deterministic stand-in for a real per-partition decoder. */
  def featurize(ds: Dataset[MediaRow]): Dataset[MediaFeatures] =
    featurizeWith(ds, () => p => byteHistogram(p, 0, p.length))

  /** A REAL image decoder for the seam (javax.imageio — PNG/JPEG/BMP/GIF
    * readers ship with the JDK, no external codec needed): decode the
    * payload to pixels, mean-pool Rec.601 luminance onto a 4×4 grid →
    * a 16-dim feature vector in [0,1]. Used by MultimodalSpec to prove
    * [[featurizeWith]] carries a genuine decoder end to end; the
    * byte-histogram stub stays the oracle-gated default (the synthetic
    * corpus payloads are text, not images). */
  def imageDecoder(): Array[Byte] => Array[Float] = { payload =>
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Double](FeatureDim)
    val counts = new Array[Long](FeatureDim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
          (rgb & 0xff) * 114L) / 1000.0
        val cell = math.min(3, y * 4 / h) * 4 + math.min(3, x * 4 / w)
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(FeatureDim)(i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i) / 255.0).toFloat)
  }

  case class MediaStats(doc_id: Long, width: Int, height: Int, px_sum: Long)

  /** A REAL image featurizer with EXACT arithmetic: decode, mean-pool
    * the raw first-band raster samples onto a 4×4 grid, feature =
    * (cellSum / cellCount) / 255 — integer sums, one double division
    * chain, one float rounding, all IEEE-exact and therefore
    * re-derivable in SQL (unlike [[imageDecoder]], whose getRGB path
    * runs the gray→sRGB colorspace conversion — deterministic but not
    * clean arithmetic). The decoded-feature similarity entry
    * (m_image_knn) rides this through [[featurizeWith]], so the
    * oracle-gated kNN ranks features a genuine decoder produced. */
  def rasterPoolDecoder(): Array[Byte] => Array[Float] = {
    javax.imageio.ImageIO.setUseCache(false) // per-partition init
    payload =>
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val sums = new Array[Long](FeatureDim)
    val counts = new Array[Long](FeatureDim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cell = math.min(3, y * 4 / h) * 4 + math.min(3, x * 4 / w)
        sums(cell) += raster.getSample(x, y, 0)
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(FeatureDim)(i =>
      if (counts(i) == 0) 0f
      else (sums(i).toDouble / counts(i) / 255.0).toFloat)
  }

  /** Synthesize a REAL PNG per document: a (8 + id%5) × (8 + id%3)
    * grayscale test pattern with pixel(x,y) = (id·31 + x·7 + y·13)
    * mod 256, encoded through javax.imageio — genuine compressed media
    * bytes, not a stand-in. The pixel rule is a pure integer function
    * of (id, x, y), and PNG is lossless, so anything computed from the
    * DECODED raster is independently re-derivable from the rule alone
    * (the m_decode_stats oracle re-derives it in SQL) — this is how a
    * real decoder gets a full hash gate without shipping image
    * fixtures. Same mapPartitions shape a real encode stage has. */
  def synthPngMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    // codec work is ~0.5 ms/row against an 8-byte input row: byte-based
    // split sizing would serialize the whole encode+decode leg onto the
    // id column's one or two file splits (measured: 24.8 s at sf1 on
    // 32 idle cores) — floor the stage's parallelism explicitly
    Expand.floorParallelism(docs.select(col("doc_id").cast("long")))
      .as[Long].mapPartitions { it =>
      // per-partition codec init (the featurizeWith seam discipline):
      // ImageIO's default stream cache is a TEMP FILE per image — a
      // file create/write/delete round trip that dwarfs the encode of
      // a tiny raster and serializes on the filesystem — and the
      // ImageIO.write convenience method re-scans the SPI registry per
      // call. One in-memory-stream writer per partition.
      javax.imageio.ImageIO.setUseCache(false)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      it.map { id =>
        val w = 8 + (id % 5).toInt
        val h = 8 + (id % 3).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, ((id * 31 + x * 7 + y * 13) % 256).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(img)
        ios.flush()
        MediaRow(id, bos.toByteArray, "image/png")
      }
    }
  }

  /** REAL media decode to integer raster stats: ImageIO-decode the
    * payload (per-partition reader shape, like [[featurizeWith]]),
    * read the first band straight off the raster (no colorspace
    * conversion — the exact stored samples), fold width/height/pixel
    * sum. Exact longs end to end, so the output is hash-stable across
    * engines — the LIVE decode path the oracle gate runs. */
  def decodeStats(ds: Dataset[MediaRow]): Dataset[MediaStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // see synthPngMedia
      it.map { r =>
        // the static ImageIO.read re-runs format sniffing + SPI lookup
        // per call; that stays — payload formats may vary row to row
        // (the decoder seam's contract) and the sniff is cheap next to
        // the temp-file cache the setUseCache call removes
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"payload of ${r.doc_id} is not decodable media")
        val raster = img.getRaster
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            s += raster.getSample(x, y, 0)
            x += 1
          }
          y += 1
        }
        MediaStats(r.doc_id, img.getWidth, img.getHeight, s)
      }
    }
  }

  case class FrameStats(
      doc_id: Long, frame_idx: Long, width: Int, height: Int, px_sum: Long)

  /** Synthesize a REAL multi-frame GIF per document — the moving-media
    * sibling of [[synthPngMedia]]: 2 + id%3 frames of the same
    * (8 + id%5) × (8 + id%3) grayscale test pattern, frame f's
    * pixel(x,y) = (id·31 + f·17 + x·7 + y·13) mod 256, written as one
    * animated-GIF sequence through javax.imageio (prepareWriteSequence
    * → writeToSequence per frame → endWriteSequence — the only
    * multi-frame container the JRE encodes natively, so no external
    * codec). GIF's LZW is lossless over palette indices and the gray
    * ramp palettizes losslessly, so every DECODED frame raster is
    * re-derivable from the pixel rule alone — the m_decode_stats
    * fixture-free gate, extended over the frame axis. Same
    * per-partition writer discipline as the PNG leg (the 24.8 s → 1.4 s
    * sf1 lesson: floor the codec stage's parallelism, keep streams in
    * memory, init the writer once per partition). */
  def synthGifMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    Expand.floorParallelism(docs.select(col("doc_id").cast("long")))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      it.map { id =>
        val w = 8 + (id % 5).toInt
        val h = 8 + (id % 3).toInt
        val nFrames = 2 + (id % 3).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0,
                ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        ios.flush()
        MediaRow(id, bos.toByteArray, "image/gif")
      }
    }
  }

  /** REAL multi-frame decode — the demuxer [[frameSample]]'s byte
    * windows stood in for: one ImageIO reader per PARTITION (the
    * featurizeWith seam), per payload getNumImages(true) walks the
    * container's frame directory and reader.read(f) decodes each
    * stored frame raster. Indexed rasters (GIF) map samples through
    * the frame's own IndexColorModel — the sample is a palette INDEX,
    * not a luminance; reading it raw would be exact only while the
    * writer happens to emit an identity ramp. Output: one row per
    * DECODED frame with exact integer stats (hash-stable across
    * engines). Scale shape: embarrassingly parallel, no shuffle; the
    * frame fan-out happens inside the partition iterator. */
  def decodeFrames(ds: Dataset[MediaRow]): Dataset[FrameStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      it.flatMap { r =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        require(n >= 1, s"payload of ${r.doc_id} has no decodable frames")
        // strict map: every frame decodes before the rows are emitted,
        // so the payload-sized input stream can close HERE — leaving it
        // to GC would pin one memory-cache buffer per row across the
        // whole partition (setUseCache(false) caches in heap, not tmp)
        val rows = (0 until n).map { f =>
          val img = reader.read(f)
          val raster = img.getRaster
          val gray: Int => Int = img.getColorModel match {
            case icm: java.awt.image.IndexColorModel => i => icm.getRed(i)
            case _ => identity
          }
          var s = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              s += gray(raster.getSample(x, y, 0))
              x += 1
            }
            y += 1
          }
          FrameStats(r.doc_id, f.toLong, img.getWidth, img.getHeight, s)
        }
        reader.setInput(null) // drop the reader's reference before close
        iis.close()
        rows
      }
    }
  }

  /** Frame sampling for "video" payloads: fixed-size byte windows play
    * the role of decoded frames; each frame runs the stub featurizer.
    * The real-codec version swaps the slicing for a demuxer/decoder
    * initialized once per partition — [[decodeFrames]] IS that version
    * for the JRE's native multi-frame container (GIF); this byte-window
    * form remains for opaque formats the JRE can't demux. */
  def frameSample(ds: Dataset[MediaRow], frameBytes: Int): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.payload.length
        val frames = math.max((n + frameBytes - 1) / frameBytes, 1)
        (0 until frames).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(n, from + frameBytes)
          MediaFrame(r.doc_id, f.toLong, (until - from).toLong,
            byteHistogram(r.payload, from, until))
        }
      }
    }
  }

  /** Resize stub: deterministic stride resampling of the payload to
    * `targetBytes` (the real version decodes pixels and interpolates —
    * same row-in/row-out shape, metadata updated alongside payload). */
  def resizeStub(ds: Dataset[MediaRow], targetBytes: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val n = r.payload.length
        if (n <= targetBytes) r
        else {
          val out = new Array[Byte](targetBytes)
          var i = 0
          while (i < targetBytes) {
            out(i) = r.payload((i.toLong * n / targetBytes).toInt)
            i += 1
          }
          MediaRow(r.doc_id, out, r.mime)
        }
      }
    }
  }

  /** Wrap a text table as a fake media table (payload = UTF-8 bytes). */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("application/x-fake").as("mime")).as[MediaRow]
  }
}
