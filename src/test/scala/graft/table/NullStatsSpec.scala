package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file NULL COUNTS ([[TxnTable.FileEntry]] `nulls`): collected in
  * the same stats pass as min/max, they index what min/max cannot —
  * an all-null file has no min/max entry at all, but `IS NOT NULL`
  * (implied by Spark under almost every predicate) prunes it, `IS
  * NULL` prunes null-free files, and a pushed-down COUNT(col) is
  * answered from metadata with zero file IO.
  */
class NullStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("graft_nullstats").toString

  /** 3 files: one all-null v, one half-null, one null-free. */
  private def layout(root: String): Unit = {
    val allNull = spark.range(0, 100).selectExpr(
      "id AS k", "CAST(NULL AS DOUBLE) AS v")
    val halfNull = spark.range(100, 200).selectExpr(
      "id AS k", "CASE WHEN id % 2 = 0 THEN CAST(id AS DOUBLE) END AS v")
    val noNull = spark.range(200, 300).selectExpr(
      "id AS k", "CAST(id AS DOUBLE) AS v")
    TxnTable.create(spark, root, allNull.coalesce(1), Seq("k", "v"))
    TxnTable.append(spark, root, halfNull.coalesce(1), Seq("k", "v"))
    TxnTable.append(spark, root, noNull.coalesce(1), Seq("k", "v"))
  }

  test("null counts land in the manifest per file, including the " +
      "all-null file that has no min/max entry") {
    val root = freshRoot(); layout(root)
    val m = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    val byNulls = m.files.flatMap(_.nulls.flatMap(_.get("v"))).sorted
    assert(byNulls == Seq(0L, 50L, 100L))
    val allNullFile = m.files.find(_.nulls.exists(_.get("v").contains(100L)))
    assert(allNullFile.exists(!_.stats.contains("v")),
      "all-null file must carry a null count but no min/max")
  }

  test("IS NOT NULL prunes the all-null file; IS NULL prunes the " +
      "null-free file; answers stay exact") {
    val root = freshRoot(); layout(root)
    val df = spark.read.format("graft.table.GraftTableProvider").load(root)
    val notNull = df.filter(col("v").isNotNull)
    assert(notNull.count() == 150)
    assert(notNull.rdd.getNumPartitions == 2,
      "IS NOT NULL should plan 2 of 3 files")
    val isNull = df.filter(col("v").isNull)
    assert(isNull.count() == 150)
    assert(isNull.rdd.getNumPartitions == 2,
      "IS NULL should plan 2 of 3 files")
    // comparison predicates imply IS NOT NULL: the all-null file is
    // skipped even though it has no min/max stats to test
    val gt = df.filter(col("v") > 250.0)
    assert(gt.count() == 49)
    assert(gt.rdd.getNumPartitions == 1,
      "v > 250 implies v IS NOT NULL: all-null file skipped, range " +
        "prunes the half-null file")
  }

  test("COUNT(col) is answered from the manifest: the plan is the " +
      "1-row agg scan, zero data-file partitions") {
    val root = freshRoot(); layout(root)
    val df = spark.read.format("graft.table.GraftTableProvider").load(root)
      .agg(count(col("v")).as("nn"), count(lit(1)).as("n"))
    val row = df.head()
    assert(row.getLong(0) == 150 && row.getLong(1) == 300)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTableScan aggregated="),
      s"expected the metadata agg scan:\n$plan")
  }

  test("a file without null counts (pre-field manifest) is never " +
      "pruned by null probes") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      spark.range(0, 10).selectExpr("id AS k",
        "CAST(NULL AS DOUBLE) AS v").coalesce(1),
      Seq.empty) // no stats opt-in: no null counts either
    val df = spark.read.format("graft.table.GraftTableProvider").load(root)
    assert(df.filter(col("v").isNotNull).count() == 0)
    assert(df.filter(col("v").isNotNull).rdd.getNumPartitions == 1,
      "no index: the file must be read, not guessed away")
  }
}
