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
  * The decode step is a STUB — image/audio codecs are not available in
  * this environment. `featurize` applies a deterministic byte-histogram
  * featurizer where a real decoder (JPEG → pixels → CNN features, PCM →
  * mel spectrogram, …) would plug in; everything around it (schema,
  * encoders, batch shape, partitioning) is real and tested.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long, features: Array[Float])

  val FeatureDim = 16

  /** STUB featurizer: 16-bin byte histogram, L1-normalized. Deterministic
    * stand-in for a real per-partition decoder. */
  def featurize(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: init decoder/model once per partition here
      it.map { r =>
        val hist = new Array[Float](FeatureDim)
        var i = 0
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xff) >> 4) += 1f
          i += 1
        }
        val n = math.max(r.payload.length, 1)
        var j = 0
        while (j < FeatureDim) { hist(j) /= n.toFloat; j += 1 }
        MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong, hist)
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
