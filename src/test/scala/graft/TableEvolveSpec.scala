package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.TxnTable

/** Column rename/drop via column mapping ([[TxnTable.renameColumn]] /
  * [[TxnTable.dropColumn]]) and the SQL catalog surface
  * ([[graft.table.GraftCatalog]]): O(metadata) evolution commits,
  * mixed-generation reads, travel/vacuum across the evolution,
  * collision refusals, and `VERSION AS OF` / `TIMESTAMP AS OF`
  * binding.
  */
class TableEvolveSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_evo").toString

  private def kv(rows: (Long, Double)*): DataFrame =
    rows.toDF("k", "score")

  test("rename is O(metadata): file set untouched, old files serve " +
      "under the new name, new appends co-read with them") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)), Seq("k"))
    val before = TxnTable.readManifest(spark, root, 0L).files
    TxnTable.renameColumn(spark, root, "score", "weight")
    val after = TxnTable.readManifest(spark, root, 1L).files
    assert(after == before, "rename rewrote data files")
    // mixed generations: post-rename append uses the NEW logical name
    TxnTable.append(spark, root, Seq((3L, 3.0)).toDF("k", "weight"))
    val snap = TxnTable.snapshot(spark, root)
    assert(snap.columns.toSeq == Seq("k", "weight"))
    assert(snap.select("k", "weight").as[(Long, Double)].collect()
      .sortBy(_._1).toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    // time travel to the pre-rename version serves the OLD name
    val v0 = TxnTable.snapshotAt(spark, root, 0L)
    assert(v0.columns.toSeq == Seq("k", "score"))
    assert(v0.select("score").as[Double].collect().sorted.toSeq ==
      Seq(1.0, 2.0))
  }

  test("drop is O(metadata): column gone, files untouched, re-adding " +
      "the name is refused until a rewrite materializes the mapping") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("k", "score", "tag"))
    TxnTable.dropColumn(spark, root, "tag")
    assert(TxnTable.readManifest(spark, root, 1L).files ==
      TxnTable.readManifest(spark, root, 0L).files)
    val snap = TxnTable.snapshot(spark, root)
    assert(snap.columns.toSeq == Seq("k", "score"))
    // the dropped column's physical name is retired: a new column
    // named `tag` would resurrect the old files' bytes — refused
    val e = intercept[IllegalArgumentException] {
      TxnTable.append(spark, root,
        Seq((3L, 3.0, "zzz")).toDF("k", "score", "tag"))
    }
    assert(e.getMessage.contains("collide with physical names"))
    // travel: v0 still serves the dropped column
    assert(TxnTable.snapshotAt(spark, root, 0L).columns.toSeq ==
      Seq("k", "score", "tag"))
    // a full rewrite materializes the mapping and frees the name
    TxnTable.compact(spark, root)
    assert(TxnTable.readManifest(spark, root,
      TxnTable.latestVersion(spark, root).get).colMap.isEmpty)
    TxnTable.append(spark, root,
      Seq((3L, 3.0, "zzz")).toDF("k", "score", "tag"))
    assert(TxnTable.snapshot(spark, root)
      .filter(col("tag").isNotNull).count() == 1)
  }

  test("rename refusals: existing target, missing source, occupied " +
      "physical, constraint reference, pending deletion vectors; " +
      "type change stays refused") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0)), Seq("k"),
      constraints = Map("pos_score" -> "score >= 0"))
    intercept[IllegalArgumentException] {
      TxnTable.renameColumn(spark, root, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      TxnTable.renameColumn(spark, root, "score", "k")
    }
    // the stored CHECK references score — renaming would break it
    val e = intercept[IllegalArgumentException] {
      TxnTable.renameColumn(spark, root, "score", "weight")
    }
    assert(e.getMessage.contains("pos_score"))
    // pending MOR deletion vectors block evolution
    val root2 = freshRoot()
    TxnTable.create(spark, root2, kv((1L, 1.0), (2L, 2.0)), Seq("k"))
    TxnTable.deleteMor(spark, root2, Seq(1L).toDF("k"), Seq("k"))
    val e2 = intercept[IllegalArgumentException] {
      TxnTable.renameColumn(spark, root2, "score", "weight")
    }
    assert(e2.getMessage.contains("deletion vectors"))
    // type change is a rewrite, not an evolution — still refused
    val e3 = intercept[IllegalArgumentException] {
      TxnTable.append(spark, root2,
        Seq((3L, "oops")).toDF("k", "score"))
    }
    assert(e3.getMessage.contains("cannot change"))
  }

  test("pruning, point lookup, DSv2 and vacuum all translate through " +
      "the column map") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      (1L to 50L).map(i => (i, i.toDouble)).toDF("k", "score"),
      Seq("k", "score"), bloomCols = Seq("k"))
    TxnTable.renameColumn(spark, root, "score", "weight")
    TxnTable.append(spark, root,
      (51L to 60L).map(i => (i, i.toDouble)).toDF("k", "weight"),
      Seq("k", "weight"))
    // stats pruning on the RENAMED column still prunes + still answers
    assert(TxnTable.snapshotPruned(spark, root, "weight", 55.0, 58.0)
      .filter(col("weight").between(55.0, 58.0)).count() == 4)
    assert(TxnTable.statsRange(spark, root, "weight")
      .exists(r => r.min == 1.0 && r.max == 60.0))
    // bloom point lookup through the renamed table
    assert(TxnTable.snapshotPointEq(spark, root, "k", 7L).count() == 1)
    // DSv2 read serves the new name over old physical files
    val dsv2 = spark.read.format("graft.table.GraftTableProvider")
      .load(root)
    assert(dsv2.columns.toSeq == Seq("k", "weight"))
    assert(dsv2.filter(col("weight") > 57.5).count() == 3)
    assert(dsv2.agg(sum("k")).head().getLong(0) == (1L to 60L).sum)
    // vacuum across the evolution: old manifests go, data stays readable
    TxnTable.compact(spark, root)
    TxnTable.vacuum(spark, root, retainLast = 1, graceMs = 0L)
    assert(TxnTable.snapshot(spark, root)
      .agg(sum("weight")).head().getDouble(0) == (1L to 60L).map(_.toDouble).sum)
  }

  test("SQL catalog: VERSION AS OF and TIMESTAMP AS OF bind; bad " +
      "version and pre-first timestamp fail loudly; ALTER TABLE " +
      "RENAME/DROP COLUMN route through the catalog") {
    val wh = Files.createTempDirectory("graft_wh_cat").toString
    val root = s"$wh/t1"
    TxnTable.create(spark, root, kv((1L, 1.0)), Seq("k"))
    Thread.sleep(5)
    TxnTable.append(spark, root, kv((2L, 2.0)), Seq("k"))
    spark.conf.set("spark.sql.catalog.evocat", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.evocat.warehouse", wh)
    assert(spark.sql("SELECT k FROM evocat.t1 VERSION AS OF 0")
      .as[Long].collect().toSeq == Seq(1L))
    assert(spark.sql("SELECT count(*) FROM evocat.t1").head().getLong(0) == 2)
    val t0 = TxnTable.readManifest(spark, root, 0L).timestampMs
    val tsLit = new java.sql.Timestamp(t0).toInstant.toString
    assert(spark.sql(
      s"SELECT count(*) FROM evocat.t1 TIMESTAMP AS OF '$tsLit'")
      .head().getLong(0) == 1)
    intercept[Exception] {
      spark.sql("SELECT * FROM evocat.t1 VERSION AS OF 99").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM evocat.t1 TIMESTAMP AS OF '1999-01-01'")
        .collect()
    }
    intercept[Exception] { // unknown table → NoSuchTableException path
      spark.sql("SELECT * FROM evocat.nope").collect()
    }
    // DDL surface: ALTER TABLE ... RENAME COLUMN / DROP COLUMN
    spark.sql("ALTER TABLE evocat.t1 RENAME COLUMN score TO weight")
    assert(TxnTable.snapshot(spark, root).columns.toSeq ==
      Seq("k", "weight"))
    spark.sql("ALTER TABLE evocat.t1 DROP COLUMN weight")
    assert(TxnTable.snapshot(spark, root).columns.toSeq == Seq("k"))
  }

  test("streaming-into an evolved table: appendBatch writes physical " +
      "names; scoped merge carries the mapping") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)), Seq("k"))
    TxnTable.renameColumn(spark, root, "score", "weight")
    TxnTable.appendBatch(spark, root,
      Seq((3L, 3.0)).toDF("k", "weight"), batchId = 0L)
    assert(TxnTable.snapshot(spark, root).agg(sum("weight"))
      .head().getDouble(0) == 6.0)
    // scoped merge: kept files keep physical names, written files match
    TxnTable.mergeScoped(spark, root,
      Seq((2L, 20.0)).toDF("k", "weight"), Seq("k"), "k",
      Seq("k", "weight"))
    assert(TxnTable.snapshot(spark, root).orderBy("k")
      .select("weight").as[Double].collect().toSeq ==
      Seq(1.0, 20.0, 3.0))
  }

  test("SQL DELETE FROM: predicate rows removed with NULL-pred rows " +
      "kept, history records a delete commit, inexpressible " +
      "predicates refused at analysis") {
    val root = freshRoot()
    val rows = Seq[(Long, java.lang.Double)](
      (1L, 1.0), (2L, 5.0), (3L, null), (4L, 9.0))
      .toDF("k", "score")
    TxnTable.create(spark, root, rows, Seq("k"))
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set("spark.sql.catalog.gcat_evo", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat_evo.warehouse",
      p.getParent.toString)
    spark.sql(s"DELETE FROM gcat_evo.`${p.getName}` WHERE score > 4")
    // score=5,9 deleted; score NULL (predicate NULL) KEPT — SQL contract
    assert(TxnTable.snapshot(spark, root)
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    assert(TxnTable.history(spark, root)
      .select("op").as[String].collect().toSeq ==
      Seq("create", "delete"))
    // an RLIKE predicate has no v1-filter form, so the metadata
    // SupportsDelete path refuses it — and Spark then FALLS BACK to
    // the row-level COW delete, which executes it correctly (the
    // two-tier contract: cheap filter deletes when expressible, full
    // rewrite when not, never an approximation)
    spark.sql(s"DELETE FROM gcat_evo.`${p.getName}` " +
      "WHERE CAST(k AS STRING) RLIKE '1.*'")
    assert(TxnTable.snapshot(spark, root)
      .select("k").as[Long].collect().sorted.toSeq == Seq(3L))
    assert(TxnTable.history(spark, root)
      .select("op").as[String].collect().toSeq ==
      Seq("create", "delete", "delete"))
  }

  test("SQL UPDATE and MERGE INTO (row-level COW): rows rewritten " +
      "exactly per statement, history records the commands, " +
      "unchanged rows survive the whole-table replace") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      kv((1L, 1.0), (2L, 2.0), (3L, 3.0)), Seq("k"))
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set("spark.sql.catalog.gcat_rl", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat_rl.warehouse",
      p.getParent.toString)
    spark.sql(
      s"UPDATE gcat_rl.`${p.getName}` SET score = score * 10 WHERE k >= 2")
    assert(TxnTable.snapshot(spark, root).orderBy("k")
      .as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.0), (2L, 20.0), (3L, 30.0)))
    spark.sql("SELECT * FROM (VALUES (2, 200.0), (9, 9.0)) AS t(k, score)")
      .selectExpr("CAST(k AS BIGINT) AS k", "CAST(score AS DOUBLE) AS score")
      .createOrReplaceTempView("mrg_src")
    spark.sql(
      s"""MERGE INTO gcat_rl.`${p.getName}` t USING mrg_src s
         ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET score = s.score
         WHEN NOT MATCHED THEN INSERT *""")
    assert(TxnTable.snapshot(spark, root).orderBy("k")
      .as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.0), (2L, 200.0), (3L, 30.0), (9L, 9.0)))
    assert(TxnTable.history(spark, root)
      .select("op").as[String].collect().toSeq ==
      Seq("create", "update", "merge"))
  }

  test("SQL ALTER TABLE ADD COLUMN: O(metadata) commit, old files " +
      "serve NULL, post-add appends carry values; NOT NULL and " +
      "positioned adds are refused") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)), Seq("k"))
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set("spark.sql.catalog.gcat_add", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat_add.warehouse",
      p.getParent.toString)
    val before = TxnTable.readManifest(spark, root, 0L).files
    spark.sql(s"ALTER TABLE gcat_add.`${p.getName}` ADD COLUMN tag STRING")
    val m1 = TxnTable.readManifest(spark, root, 1L)
    assert(m1.op == "add-column" && m1.files == before,
      "add must be metadata-only")
    TxnTable.append(spark, root,
      Seq((3L, 3.0, "x")).toDF("k", "score", "tag"))
    val snap = TxnTable.snapshot(spark, root)
    assert(snap.columns.toSeq == Seq("k", "score", "tag"))
    assert(snap.orderBy("k").select("tag").as[String].collect().toSeq ==
      Seq(null, null, "x"))
    // SQL reads see the evolved schema through the catalog too
    assert(spark.sql(
      s"SELECT COUNT(*) FROM gcat_add.`${p.getName}` WHERE tag IS NULL")
      .as[Long].head() == 2L)
    intercept[Exception] {
      spark.sql(s"ALTER TABLE gcat_add.`${p.getName}` " +
        "ADD COLUMN bad STRING NOT NULL")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE gcat_add.`${p.getName}` " +
        "ADD COLUMN bad2 STRING FIRST")
    }
    // dropped column's physical name stays refused until materialized
    TxnTable.dropColumn(spark, root, "tag")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE gcat_add.`${p.getName}` ADD COLUMN tag STRING")
    }
  }

  test("restore across a rename translates bloom columns into the " +
      "target namespace") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)), Seq("k"),
      bloomCols = Seq("score"))
    TxnTable.renameColumn(spark, root, "score", "pts") // v1
    // restore to v0 (schema k/score): current bloomCols says "pts",
    // which does not exist at v0 — it must come back as "score"
    TxnTable.restore(spark, root, 0L) // v2
    val m2 = TxnTable.readManifest(spark, root, 2L)
    assert(m2.bloomCols.contains(Seq("score")),
      s"bloomCols must translate to the target namespace, got " +
        s"${m2.bloomCols}")
    // post-restore append keeps maintaining the bloom under the
    // restored name (this is what broke before the translation)
    TxnTable.append(spark, root, kv((9L, 9.0)), Seq("k"))
    assert(TxnTable.snapshot(spark, root).columns.toSeq ==
      Seq("k", "score"))
    // (constraints are create-time-only and rename/drop refuse
    // constrained columns, so a restore can never orphan one — the
    // restore-side require is defense in depth)
  }

  test("vacuum grace window: a young unreferenced file survives the " +
      "default vacuum (in-flight-write protection) and is reclaimed " +
      "with graceMs = 0") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0)))
    TxnTable.overwrite(spark, root, kv((2L, 2.0))) // v0's files now old
    // orphan: written but never referenced (a lost race / in-flight
    // write's file)
    val orphan = new org.apache.hadoop.fs.Path(root, "data/cow-inflight.parquet")
    val f = orphan.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val o = f.create(orphan, true); o.write(1); o.close()
    val young = TxnTable.vacuum(spark, root, retainLast = 1)
    assert(young.isEmpty,
      s"default vacuum must skip young files, deleted $young")
    assert(f.exists(orphan))
    val now = TxnTable.vacuum(spark, root, retainLast = 1, graceMs = 0L)
    assert(now.nonEmpty && !f.exists(orphan))
  }

  test("catalog identifiers cannot traverse outside the warehouse") {
    spark.conf.set("spark.sql.catalog.gcat_tv", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat_tv.warehouse",
      Files.createTempDirectory("graft_wh").toString)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gcat_tv.`..`.`..`.`etc`.`passwd`").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("illegal identifier segment") ||
        m.contains("TABLE_OR_VIEW_NOT_FOUND")))
    // and directly at the catalog seam, the guard is the error
    val cat = new graft.table.GraftCatalog
    cat.initialize("gtv", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("warehouse", "/tmp/graft_wh_direct")))
    val e2 = intercept[IllegalArgumentException] {
      cat.tableExists(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array(".."), "etc"))
    }
    assert(e2.getMessage.contains("illegal identifier segment"))
  }

  test("MERGE schema evolution (opt-in): a source carrying a new " +
      "column widens the table atomically with the merge — stored " +
      "rows back-fill NULL, source rows carry values; without the " +
      "option the extra column is projected away") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)), Seq("k"))
    val src = Seq((2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "score", "tag")
    // default: NO evolution — the merge lands, tag is dropped
    TxnTable.merge(spark, root, src, Seq("k"), Seq("k"))
    assert(TxnTable.snapshot(spark, root).columns.toSeq ==
      Seq("k", "score"))
    // opt-in: the schema widens in the SAME commit as the merge
    val src2 = Seq((3L, 33.0, "c3"), (4L, 44.0, "d4"))
      .toDF("k", "score", "tag")
    val v = TxnTable.merge(spark, root, src2, Seq("k"), Seq("k"),
      evolveSchema = true)
    val m = TxnTable.readManifest(spark, root, v)
    assert(m.op == "merge" &&
      m.schemaDdl.toLowerCase.contains("tag"),
      s"schema must widen atomically with the merge: ${m.schemaDdl}")
    val snap = TxnTable.snapshot(spark, root)
      .select("k", "score", "tag").as[(Long, Double, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(snap == Seq(
      (1L, 1.0, None),          // stored row: NULL back-fill
      (2L, 20.0, None),         // pre-evolution merge result: NULL
      (3L, 33.0, Some("c3")),   // evolved source rows carry values
      (4L, 44.0, Some("d4"))))
    // time travel still serves the narrow generations
    assert(!TxnTable.snapshotAt(spark, root, 0L).columns.contains("tag"))
    // and mergeFull evolves the same way, atomically with its delete
    val root2 = freshRoot()
    TxnTable.create(spark, root2, kv((1L, 1.0), (2L, 2.0)), Seq("k"))
    TxnTable.mergeFull(spark, root2,
      Seq((2L, 22.0, 9L)).toDF("k", "score", "rev"),
      Seq("k"), deleteWhen = lit(true), Seq("k"), evolveSchema = true)
    val snap2 = TxnTable.snapshot(spark, root2)
      .select("k", "score", "rev").as[(Long, Double, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(snap2 == Seq((2L, 22.0, Some(9L)))) // k=1 deleted-by-absence
  }
}
