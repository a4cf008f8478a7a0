package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver-generated TPC-H-ish test schema. */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet has shipped with two physical `ts` encodings across
    * testdata generations: TIMESTAMP(NANOS) (which Spark's parquet
    * reader rejects — read nanos as long via the legacy conf and
    * convert with exact integer division, since epoch-nanos overflow
    * double's 53-bit mantissa) and plain TIMESTAMP(MICROS) (read as
    * TIMESTAMP_NTZ). Normalize BOTH to session-zone TimestampType so
    * every downstream query and oracle sees one schema regardless of
    * which generation is on disk; the session zone is pinned to UTC, so
    * the NTZ→LTZ cast is value-preserving.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
