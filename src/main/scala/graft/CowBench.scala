package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Row-level COW write-amplification evidence (r11 VERDICT ask #1):
  * on a doc_id-clustered graft table, time a SELECTIVE SQL UPDATE
  * (one key range ≈ 1/32 of the table) against an UNCONDITIONED one,
  * and report how many files each statement rewrote. With file-group
  * pruning the selective statement must rewrite O(matched files) —
  * the whole-table COW it replaced rewrote every file every time.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=stress/sf1 sbt "runMain graft.CowBench"`
  * Emits one JSON line:
  * `{"rows":N,"files":32,"selective_s":…,"selective_files":…,
  *   "full_s":…,"full_files":32,"amplification":…}`
  */
object CowBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "stress/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files
      .createTempDirectory("graft_cowbench").toString
    // replicate ×40 (distinct doc_ids) so the table is rewrite-bound,
    // not session-floor-bound — 2M rows across 32 range-clustered files
    val reps = sys.env.getOrElse("SPARK_GRAFT_COW_REPS", "40").toInt
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .crossJoin(spark.range(0, reps).select(col("id").as("rep")))
      .select((col("doc_id") * reps + col("rep")).as("doc_id"),
        col("lang"), col("n_chars"), col("text"))
      .repartitionByRange(32, col("doc_id"))
    graft.table.TxnTable.create(spark, root, d, Seq("doc_id"))
    val rows = graft.table.TxnTable.rowCount(spark, root)
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set("spark.sql.catalog.gcow", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcow.warehouse",
      p.getParent.toString)
    val t = s"gcow.`${p.getName}`"
    // warm the session (catalog resolution, codegen)
    spark.sql(s"SELECT COUNT(*) FROM $t").collect()

    def filesAt(v: Long) =
      graft.table.TxnTable.readManifest(spark, root, v).files
    def freshCount(v: Long): Int = {
      val prev = filesAt(v - 1).map(_.path).toSet
      filesAt(v).count(f => !prev.contains(f.path))
    }
    def timed(sql: String): Double = {
      val t0 = System.nanoTime()
      spark.sql(sql)
      (System.nanoTime() - t0) / 1e9
    }

    // selective: one 1/32nd range (the clustered layout maps it to
    // one file group)
    val hi = rows / 32
    val selS = timed(
      s"UPDATE $t SET n_chars = n_chars + 1 WHERE doc_id < $hi")
    val selFiles = freshCount(1L)
    val fullS = timed(s"UPDATE $t SET n_chars = n_chars + 1")
    val fullFiles = freshCount(2L)

    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(v))
    val line =
      s"""{"rows":$rows,"files":${filesAt(0L).size},""" +
        s""""selective_s":${f3(selS)},"selective_files":$selFiles,""" +
        s""""full_s":${f3(fullS)},"full_files":$fullFiles,""" +
        s""""amplification":${f3(fullS / math.max(selS, 1e-9))}}"""
    spark.sparkContext.setLogLevel("ERROR")
    try spark.stop() catch { case _: Throwable => () }
    System.out.println(line)
    System.out.flush()
  }
}
