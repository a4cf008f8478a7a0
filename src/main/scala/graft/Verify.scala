package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Default parallelism follows the box instead of a fixed 4: at 168
    // queries a local[4] run is a 45-75 minute wall (cold stores), the
    // plausible mechanism behind two rounds of empty driver artifacts
    // (a timed-out Verify leaves nothing to compare). Half the cores,
    // capped at 16, floored at 4 — leaves headroom for the caller's
    // own work; the env override still wins.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, math.min(16,
        Runtime.getRuntime.availableProcessors / 2)).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // pin the data dir for oracle generators that read persisted index
    // artifacts (IndexQueries.annOracles) — the queries below build them
    sys.props("graft.oracle.sfDir") = sfDir
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (comma-separated names); driver never sets it
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Dump oracle_sql.json FIRST: a truncated run (driver timeout,
    // OOM-kill) then still leaves a gradeable partial artifact — the
    // driver can compare every query dir that did land against its SQL.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val wall0 = System.nanoTime()
    var done = 0
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val marker = Paths.get(s"$outDir/$name/_SUCCESS")
      done += 1
      // Resumable: a re-run over a partially-filled outDir (set
      // GRAFT_VERIFY_RESUME=1) skips queries whose parquet already
      // committed, so a timed-out run can be completed incrementally.
      if (sys.env.contains("GRAFT_VERIFY_RESUME") && Files.exists(marker)) {
        System.err.println(s"[verify] $name skipped (already dumped)")
      } else try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // stderr progress per query: a partial run (timeout, OOM-kill)
        // leaves a readable trail of how far it got and where the time
        // went — the diagnosis an empty driver artifact needs
        System.err.println(
          f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
          f"($done/${selected.size}, cum ${(System.nanoTime() - wall0) / 1e9}%.0f s)")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally spark.catalog.clearCache() // per-query caches don't accumulate
    }
    spark.stop()
  }
}
