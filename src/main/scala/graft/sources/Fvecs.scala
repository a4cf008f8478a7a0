package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the SIFT `.fvecs` / `.ivecs` binary formats
  * (/root/reference/include/utils.h:load_fvecs/load_ivecs): records of
  * `int32 dim` followed by `dim` little-endian float32 / int32 values.
  *
  * Distributed design: `binaryFile` gives one whole-file blob per row;
  * parsing fans out with flatMap so a directory of shard files
  * parallelizes naturally (the format has no record-boundary markers, so
  * intra-file splits are not possible — shard at write time for scale,
  * as SIFT distributions already do).
  */
object Fvecs {

  /** Read .fvecs → (id bigint, vector array<float>). Ids are the record
    * index within each file offset by `idOffset`. */
  def readFvecs(spark: SparkSession, path: String, idOffset: Long = 0L): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) =>
        val bytes = pds.toArray()
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        Iterator.unfold(0L) { idx =>
          if (bb.remaining() < 4) None
          else {
            val dim = bb.getInt()
            val vec = Array.ofDim[Float](dim)
            var i = 0
            while (i < dim) { vec(i) = bb.getFloat(); i += 1 }
            Some(((idOffset + idx, vec.toSeq), idx + 1))
          }
        }
      }
      .toDF("id", "vector")
  }

  /** Read .ivecs (ground-truth neighbor lists) → (id, neighbors array<int>). */
  def readIvecs(spark: SparkSession, path: String, idOffset: Long = 0L): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) =>
        val bytes = pds.toArray()
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        Iterator.unfold(0L) { idx =>
          if (bb.remaining() < 4) None
          else {
            val dim = bb.getInt()
            val ids = Array.ofDim[Int](dim)
            var i = 0
            while (i < dim) { ids(i) = bb.getInt(); i += 1 }
            Some(((idOffset + idx, ids.toSeq), idx + 1))
          }
        }
      }
      .toDF("id", "neighbors")
  }

  /** Write a DataFrame(id, neighbors array<int>) as a single .ivecs file
    * (utils.h's ground-truth layout) — records in the frame's row order,
    * so callers order by id first. */
  def writeIvecs(df: DataFrame, file: String): Unit = {
    val rows = df.collect()
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(file)))
    try rows.foreach { r =>
      val ids = r.getSeq[Int](r.fieldIndex("neighbors"))
      val bb = ByteBuffer.allocate(4 + 4 * ids.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(ids.length)
      ids.foreach(bb.putInt)
      out.write(bb.array())
    } finally out.close()
  }

  /** Write a DataFrame(id, vector array<float>) as a single .fvecs file —
    * test fixture + interop writer. */
  def writeFvecs(df: DataFrame, file: String): Unit = {
    val rows = df.collect()
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(file)))
    try rows.foreach { r =>
      val vec = r.getSeq[Float](r.fieldIndex("vector"))
      val bb = ByteBuffer.allocate(4 + 4 * vec.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(vec.length)
      vec.foreach(bb.putFloat)
      out.write(bb.array())
    } finally out.close()
  }
}
