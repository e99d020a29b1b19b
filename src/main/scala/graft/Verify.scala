package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // tolerate legacy TIMESTAMP(NANOS) fixtures (Spark can't read them
      // natively — surface as LongType nanos); the engine resolves event
      // time per-schema (SparkEntry.eventTsUs), so plain `timestamp`
      // fixtures are unaffected by this config.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // read ms-precision NTZ parquet timestamps as session-TZ timestamps
      // (session is UTC) so unix_micros matches DuckDB's epoch_us.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // session-global so plan shapes are execution-order-independent:
      // only bucketed graft scans report KeyGroupedPartitioning anyway
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration subset (unset in the driver's run → all queries)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // A thrown query must be IMPOSSIBLE to miss: the r6 fixtures broke 17
    // queries and this loop's old catch-and-log let the round read as
    // 130-green-of-130. Every failure is now (a) collected, (b) dumped to
    // _FAILED_QUERIES.json in outDir, (c) re-printed as the LAST stderr
    // lines, and (d) reflected in a non-zero exit code.
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      System.err.println(s"[verify] running $name")
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        System.err.println(s"[verify] $name FAILED: ${failed(name)}")
      }
    }
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
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Failure manifest: always written (empty object when all green), so
    // its ABSENCE is also a signal — an aborted run leaves no manifest.
    Files.writeString(Paths.get(s"$outDir/_FAILED_QUERIES.json"),
      failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))
    // Written-output audit: every selected query must have produced its
    // dir — catches silent losses beyond thrown exceptions too.
    val missing = selected.keys.filterNot(n =>
      Files.exists(Paths.get(s"$outDir/$n/_SUCCESS"))).toSeq
    spark.stop()
    System.err.println(
      s"[verify] ${selected.size - missing.size}/${selected.size} queries " +
        s"wrote output; ${failed.size} threw")
    if (missing.nonEmpty)
      System.err.println(
        s"[verify] MISSING OUTPUT (${missing.size}): ${missing.mkString(", ")}")
    failed.foreach { case (n, m) =>
      System.err.println(s"[verify] FAILED $n: $m")
    }
    if (failed.nonEmpty || missing.nonEmpty) sys.exit(1)
  }
}
