package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimistic-conflict contract of the row-level COW commit,
  * pinned mechanically at the [[TxnTable.commitCow]] seam (the SQL
  * surface can't interleave a racing commit deterministically). The
  * WriteSerializable rule:
  *
  *   - a commit planned against v_base REBASES onto later versions
  *     when the intervening commits only ADDED files (blind appends)
  *     and left the replaced files, schema, column map, constraints
  *     and retired set untouched — equivalent to the statement having
  *     run BEFORE the appends, so a long-running UPDATE under
  *     continuous ingest no longer loses every race;
  *   - anything that touched the replaced files (rewrite, compact,
  *     delete, MOR tombstone), changed schema, or RESTOREd history
  *     still ABORTS LOUDLY — never overwrites the winner, never
  *     silently rebases past a true conflict.
  */
class CowConflictSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkTable(root: String): Unit =
    TxnTable.create(spark, root,
      spark.range(0, 10).select(col("id").as("k"),
        (col("id") % 3).cast("double").as("score"))
        .coalesce(1), Seq("k"))

  test("commitCow survives a concurrent disjoint append: the " +
      "statement rebases onto the new base and both writes land") {
    val root = Files.createTempDirectory("graft_cowrebase").toString
    mkTable(root)
    val baseFiles = TxnTable.readManifest(spark, root, 0L).files
    // the replacement group: ALL of v0's files (a whole-table UPDATE)
    val replaced = baseFiles.map(_.path)
    // the replacement rows, pre-written as a graft data file the way a
    // COW task would: reuse append on a scratch table to mint a file
    val scratch = Files.createTempDirectory("graft_scratch").toString
    TxnTable.create(spark, scratch,
      spark.range(0, 10).select(col("id").as("k"),
        lit(-1.0).as("score")).coalesce(1), Seq("k"))
    val newEntry = TxnTable.readManifest(spark, scratch, 0L).files.head
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = s"${TxnTable.dataDirName}/cow-rebased-test.parquet"
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/${TxnTable.dataDirName}"))
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$scratch/${newEntry.path}"), fs,
      new org.apache.hadoop.fs.Path(s"$root/$dst"), false,
      spark.sparkContext.hadoopConfiguration)
    // a racing BLIND APPEND moves the table to v1 after planning at v0
    TxnTable.append(spark, root,
      spark.range(100, 102).select(col("id").as("k"),
        lit(9.0).as("score")), Seq("k"))
    val v = TxnTable.commitCow(spark, root, "update",
      "k BIGINT, score DOUBLE",
      Seq(newEntry.copy(path = dst)), baseVersion = 0L,
      replaced = Some(replaced))
    assert(v == 2L, "the rebase must land ON TOP of the append")
    val snap = TxnTable.snapshot(spark, root)
    assert(snap.count() == 12L)
    // the appended rows survived the rebase verbatim
    assert(snap.filter(col("k") >= 100L).count() == 2L)
    // the replaced rows carry the update
    assert(snap.filter(col("k") < 100L && col("score") === -1.0)
      .count() == 10L)
  }

  test("commitCow aborts when a concurrent commit REWROTE a replaced " +
      "file (true overlap) and commits nothing") {
    val root = Files.createTempDirectory("graft_cowrace").toString
    mkTable(root)
    val replaced = TxnTable.readManifest(spark, root, 0L).files
      .map(_.path)
    // the racing commit REWRITES the table (compact replaces every
    // file) — the replaced group no longer exists at the new version
    TxnTable.compact(spark, root, statsCols = Seq("k"))
    val e = intercept[IllegalStateException] {
      TxnTable.commitCow(spark, root, "update",
        "k BIGINT, score DOUBLE", Seq.empty, baseVersion = 0L,
        replaced = Some(replaced))
    }
    assert(e.getMessage.contains("conflicting concurrent commit"))
    assert(TxnTable.versions(spark, root) == Seq(0L, 1L))
    assert(TxnTable.snapshot(spark, root).count() == 10L)
  }

  test("commitCow aborts when the schema evolved underneath it") {
    val root = Files.createTempDirectory("graft_cowschema").toString
    mkTable(root)
    TxnTable.addColumn(spark, root, "tag",
      org.apache.spark.sql.types.StringType)
    val e = intercept[IllegalStateException] {
      TxnTable.commitCow(spark, root, "update",
        "k BIGINT, score DOUBLE", Seq.empty, baseVersion = 0L,
        replaced = Some(Seq.empty))
    }
    assert(e.getMessage.contains("conflicting concurrent commit"))
  }

  test("commitCow aborts across an intervening RESTORE even when the " +
      "replaced files happen to survive it") {
    val root = Files.createTempDirectory("graft_cowrestore").toString
    mkTable(root)
    TxnTable.append(spark, root,
      spark.range(50, 52).select(col("id").as("k"),
        lit(1.0).as("score")), Seq("k"))
    TxnTable.restore(spark, root, 0L) // v2: rewind — v0's files survive
    val e = intercept[IllegalStateException] {
      TxnTable.commitCow(spark, root, "update",
        "k BIGINT, score DOUBLE", Seq.empty, baseVersion = 0L,
        replaced = Some(Seq.empty))
    }
    assert(e.getMessage.contains("conflicting concurrent commit"))
  }
}
