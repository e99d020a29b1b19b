package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 CHECK constraints (the Spark 4 constraint SPIP surface wired
  * through [[GraftCatalog.alterTable]] / [[TxnTable.addConstraint]]):
  * SQL ADD/DROP CONSTRAINT, existing-row validation, enforcement on
  * every write path, and refusal of key constraints this format
  * cannot enforce.
  */
class ConstraintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("graft_constraint").toString

  private def mk(root: String): String = {
    TxnTable.create(spark, root,
      spark.range(0, 10).select(col("id").as("k"),
        (col("id") % 5).cast("double").as("score")), Seq("k"))
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set("spark.sql.catalog.gcons", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcons.warehouse",
      p.getParent.toString)
    s"gcons.`${p.getName}`"
  }

  test("SQL ALTER TABLE ADD CONSTRAINT CHECK: commits O(metadata), " +
      "reported on the table, enforced on every subsequent write") {
    val root = freshRoot()
    val t = mk(root)
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT score_nonneg " +
      "CHECK (score >= 0)")
    val m = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    assert(m.op == "add-constraint" &&
      m.constraints.exists(_.contains("score_nonneg")))
    // reported through the DSv2 table
    val cons = spark.sessionState.catalogManager
      .catalog("gcons")
      .asInstanceOf[GraftCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, new org.apache.hadoop.fs.Path(root).getName))
      .constraints()
    assert(cons.length == 1 && cons.head.name() == "score_nonneg")
    // a violating append is refused loudly by the write path
    val e = intercept[Exception] {
      TxnTable.append(spark, root,
        spark.range(100, 101).select(col("id").as("k"),
          lit(-3.0).as("score")))
    }
    assert(e.getMessage.contains("constraint violation"))
    // a conforming append lands
    TxnTable.append(spark, root,
      spark.range(100, 101).select(col("id").as("k"),
        lit(3.0).as("score")))
    assert(TxnTable.snapshot(spark, root).count() == 11L)
  }

  test("ADD CONSTRAINT validates EXISTING rows first: a predicate the " +
      "table already violates never commits") {
    val root = freshRoot()
    val t = mk(root) // scores 0..4: k > 3 fails on existing rows
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ADD CONSTRAINT k_big CHECK (k > 3)")
    }
    // Spark's analyzer validates existing rows itself
    // (NEW_CHECK_CONSTRAINT_VIOLATION) before alterTable; the Scala
    // API path hits TxnTable.addConstraint's own validation
    assert(e.getMessage.contains("constraint violation") ||
      e.getMessage.contains("NEW_CHECK_CONSTRAINT_VIOLATION"))
    // ...and the TxnTable seam validates independently (the Scala path)
    val e2 = intercept[Exception] {
      TxnTable.addConstraint(spark, root, "k_big", "k > 3")
    }
    assert(e2.getMessage.contains("constraint violation"))
    assert(TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max).constraints.isEmpty)
  }

  test("DROP CONSTRAINT removes enforcement; unknown name errors " +
      "without IF EXISTS") {
    val root = freshRoot()
    val t = mk(root)
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT score_nonneg " +
      "CHECK (score >= 0)")
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT score_nonneg")
    // enforcement gone: the previously-refused append now lands
    TxnTable.append(spark, root,
      spark.range(100, 101).select(col("id").as("k"),
        lit(-3.0).as("score")))
    assert(TxnTable.snapshot(spark, root)
      .filter(col("score") < 0).count() == 1L)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t DROP CONSTRAINT nope")
    }
    // IF EXISTS tolerates the missing name
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT IF EXISTS nope")
  }

  test("key constraints (PRIMARY KEY / UNIQUE) are refused — no index " +
      "to enforce them, and informational lies don't commit") {
    val root = freshRoot()
    val t = mk(root)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ADD CONSTRAINT pk PRIMARY KEY (k)")
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t =>
        Option(t.getMessage).toSeq ++ msgs(t.getCause))
    assert(msgs(e).exists(m => m.contains("only CHECK constraints") ||
      m.contains("not supported") || m.contains("NOT_SUPPORTED")))
  }
}
