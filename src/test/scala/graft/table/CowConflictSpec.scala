package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The serializable-conflict contract of the row-level COW commit,
  * pinned mechanically at the [[TxnTable.commitCow]] seam (the SQL
  * surface can't interleave a racing commit deterministically): a
  * commit planned against a version the table has moved past must
  * ABORT LOUDLY — never overwrite the winner, never silently rebase.
  */
class CowConflictSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("commitCow against a stale base version aborts loudly and " +
      "commits nothing") {
    val root = Files.createTempDirectory("graft_cowrace").toString
    TxnTable.create(spark, root,
      spark.range(0, 10).select(col("id").as("k"),
        (col("id") % 3).cast("double").as("score")), Seq("k"))
    // a racing append moves the table to v1 AFTER the COW planned v0
    TxnTable.append(spark, root,
      spark.range(10, 12).select(col("id").as("k"),
        lit(9.0).as("score")), Seq("k"))
    val e = intercept[IllegalStateException] {
      TxnTable.commitCow(spark, root, "update",
        "k BIGINT, score DOUBLE", Seq.empty, baseVersion = 0L,
        replaced = Some(Seq.empty))
    }
    assert(e.getMessage.contains("concurrent commit"))
    // nothing published: the table is exactly the append's result
    assert(TxnTable.versions(spark, root) == Seq(0L, 1L))
    assert(TxnTable.snapshot(spark, root).count() == 12L)
  }
}
