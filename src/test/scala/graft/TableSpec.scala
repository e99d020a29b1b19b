package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.TxnTable

/** Transactional-table-format specs: commit atomicity under concurrent
  * writers, time travel, CDC, stats pruning, schema evolution, vacuum.
  */
class TableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_tbl").toString

  private def kv(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("k", "name", "score")

  private def sortedRows(df: DataFrame): Seq[(Long, String, Double)] =
    df.select("k", "name", "score").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq

  test("create/append/snapshot roundtrip; reads never list data dir") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, "a", 1.0), (2L, "b", 2.0)))
    val v1 = TxnTable.append(spark, root, kv((3L, "c", 3.0)))
    assert(v1 == 1L)
    assert(sortedRows(TxnTable.snapshot(spark, root)) ==
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    // A stray uncommitted file in data/ must be invisible to readers.
    kv((99L, "ghost", 9.9)).write.parquet(s"$root/data/uncommitted")
    assert(sortedRows(TxnTable.snapshot(spark, root)).map(_._1) ==
      Seq(1L, 2L, 3L))
  }

  test("time travel: every version stays readable after later rewrites") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, "a", 1.0)))
    TxnTable.append(spark, root, kv((2L, "b", 2.0)))
    TxnTable.overwrite(spark, root, kv((7L, "z", 7.0)))
    assert(sortedRows(TxnTable.snapshotAt(spark, root, 0)).map(_._1) == Seq(1L))
    assert(sortedRows(TxnTable.snapshotAt(spark, root, 1)).map(_._1) ==
      Seq(1L, 2L))
    assert(sortedRows(TxnTable.snapshotAt(spark, root, 2)).map(_._1) == Seq(7L))
    assert(TxnTable.versions(spark, root) == Seq(0L, 1L, 2L))
  }

  test("merge upserts by key, delete tombstones, compact preserves data") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      kv((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    TxnTable.merge(spark, root,
      kv((2L, "B", 20.0), (4L, "d", 4.0)), Seq("k"))
    assert(sortedRows(TxnTable.snapshot(spark, root)) ==
      Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "c", 3.0), (4L, "d", 4.0)))
    TxnTable.delete(spark, root, Seq(3L).toDF("k"), Seq("k"))
    assert(sortedRows(TxnTable.snapshot(spark, root)).map(_._1) ==
      Seq(1L, 2L, 4L))
    val before = sortedRows(TxnTable.snapshot(spark, root))
    val vCompact = TxnTable.compact(spark, root)
    assert(sortedRows(TxnTable.snapshot(spark, root)) == before)
    val hist = TxnTable.history(spark, root)
      .orderBy("version").select("op").as[String].collect().toSeq
    assert(hist == Seq("create", "merge", "delete", "compact"))
    assert(vCompact == 3L)
  }

  test("concurrent appends both commit (optimistic retry, no lost update)") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((0L, "seed", 0.0)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = (1 to 4).map { i =>
      scala.concurrent.Future {
        TxnTable.append(spark, root, kv((i.toLong, s"w$i", i.toDouble)))
      }
    }
    val vs = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    // Four writers -> four DISTINCT versions 1..4, all rows present.
    assert(vs.sorted == Seq(1L, 2L, 3L, 4L))
    assert(sortedRows(TxnTable.snapshot(spark, root)).map(_._1) ==
      Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("append racing compact: both commit, no rows lost or duplicated") {
    // The nastier race than append-vs-append: a REWRITE (compact reads
    // snapshot v_k and proposes v_{k+1} replacing ALL files) racing an
    // APPEND. Whichever loses the version claim must recompute against
    // the winner's manifest — a compact that silently dropped a
    // concurrently-appended file would lose data with no error.
    val root = freshRoot()
    TxnTable.create(spark, root,
      kv((0 until 50).map(i => (i.toLong, s"r$i", i.toDouble)): _*))
    (1 to 3).foreach { r =>
      TxnTable.append(spark, root,
        kv((50 * r until 50 * (r + 1)).map(i =>
          (i.toLong, s"r$i", i.toDouble)): _*))
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val fCompact = scala.concurrent.Future {
      TxnTable.compact(spark, root)
    }
    val fAppend = scala.concurrent.Future {
      TxnTable.append(spark, root,
        kv((200 until 220).map(i => (i.toLong, s"r$i", i.toDouble)): _*))
    }
    val vs = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(Seq(fCompact, fAppend)),
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(vs.toSet == Set(4L, 5L), s"expected versions 4 and 5, got $vs")
    // Every row survives exactly once, whatever the commit order was.
    assert(sortedRows(TxnTable.snapshot(spark, root)).map(_._1) ==
      ((0L until 200L) ++ (200L until 220L)).toSeq)
  }

  test("cdc reports insert/update/delete with pre/post images") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      kv((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    TxnTable.merge(spark, root, kv((2L, "B", 20.0), (4L, "d", 4.0)), Seq("k"))
    TxnTable.delete(spark, root, Seq(1L).toDF("k"), Seq("k"))
    val changes = TxnTable.cdc(spark, root, 0L, 2L, Seq("k"))
      .select("k", "_change_type", "name", "score")
      .as[(Long, String, String, Double)].collect().sortBy(_._1).toSeq
    assert(changes == Seq(
      (1L, "delete", "a", 1.0), // pre-image
      (2L, "update", "B", 20.0), // post-image
      (4L, "insert", "d", 4.0)))
  }

  test("stats pruning skips non-overlapping files at the manifest") {
    val root = freshRoot()
    // 4 disjoint key ranges -> 4 files with disjoint k stats.
    val df = spark.range(0, 400).select(
      col("id").as("k"), lit("x").as("name"),
      col("id").cast("double").as("score"))
      .repartitionByRange(4, col("k"))
    TxnTable.create(spark, root, df, statsCols = Seq("k"))
    val all = TxnTable.snapshot(spark, root)
    val pruned = TxnTable.snapshotPruned(spark, root, "k", 10.0, 20.0)
    assert(all.inputFiles.length == 4)
    assert(pruned.inputFiles.length < all.inputFiles.length)
    // Pruning must not change the answer for an in-range predicate.
    assert(pruned.filter(col("k").between(10, 20)).count() ==
      all.filter(col("k").between(10, 20)).count())
  }

  test("snapshotWhere pushes conjunct bounds to the manifest, stays conservative") {
    val root = freshRoot()
    val df = spark.range(0, 400).select(
      col("id").as("k"), lit("x").as("name"),
      col("id").cast("double").as("score"))
      .repartitionByRange(4, col("k"))
    TxnTable.create(spark, root, df, statsCols = Seq("k"))
    val q = TxnTable.snapshotWhere(spark, root,
      col("k") >= 10 && col("k") <= 20 && col("name") === "x")
    assert(q.inputFiles.length == 1, "one key-range file overlaps [10,20]")
    assert(q.count() == 11)
    // Literal-on-the-left and reversed operators prune the same way.
    assert(TxnTable.snapshotWhere(spark, root,
      lit(10L) <= col("k") && col("k") < 21).inputFiles.length == 1)
    // OR contributes no bounds: all files read, result still correct.
    val orQ = TxnTable.snapshotWhere(spark, root,
      col("k") === 5 || col("k") === 395)
    assert(orQ.inputFiles.length == 4)
    assert(orQ.count() == 2)
    // A predicate on a column without stats reads everything, correctly.
    assert(TxnTable.snapshotWhere(spark, root,
      col("score") < 3.0).count() == 3)
  }

  test("appendsSince tails only new files; rewrites in range throw") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, "a", 1.0)))
    TxnTable.append(spark, root, kv((2L, "b", 2.0)))
    TxnTable.append(spark, root, kv((3L, "c", 3.0)))
    val tail = TxnTable.appendsSince(spark, root, 0L)
    assert(sortedRows(tail).map(_._1) == Seq(2L, 3L))
    // Only the appended files are read — not the whole table.
    assert(tail.inputFiles.length <
      TxnTable.snapshot(spark, root).inputFiles.length)
    assert(sortedRows(TxnTable.appendsSince(spark, root, 2L)).isEmpty)
    TxnTable.merge(spark, root, kv((1L, "A", 10.0)), Seq("k"))
    intercept[IllegalStateException] {
      TxnTable.appendsSince(spark, root, 0L)
    }
  }

  test("schema evolution: new column appends, old rows read as null") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, "a", 1.0)))
    val evolved = Seq((2L, "b", 2.0, "en")).toDF("k", "name", "score", "lang")
    TxnTable.append(spark, root, evolved)
    val snap = TxnTable.snapshot(spark, root)
    assert(snap.columns.toSeq == Seq("k", "name", "score", "lang"))
    val rows = snap.select("k", "lang").as[(Long, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq((1L, None), (2L, Some("en"))))
    // Narrow append (missing column) conforms with nulls too.
    TxnTable.append(spark, root, Seq((3L, "c", 3.0)).toDF("k", "name", "score"))
    assert(TxnTable.snapshot(spark, root).filter(col("k") === 3)
      .select("lang").as[Option[String]].head().isEmpty)
    // Type change is refused.
    intercept[IllegalArgumentException] {
      TxnTable.append(spark, root, Seq(("4", "d", 4.0))
        .toDF("k", "name", "score"))
    }
  }

  test("mergeScoped rewrites only stats-overlapping files, carries the rest") {
    val root = freshRoot()
    val df = spark.range(0, 400).select(
      col("id").as("k"), (col("id") % 4).as("scope"),
      col("id").cast("double").as("score"))
      .repartitionByRange(4, col("scope"))
    TxnTable.create(spark, root, df, statsCols = Seq("scope", "k"))
    val v0Files = TxnTable.readManifest(spark, root, 0).files
      .map(_.path).toSet
    // Updates touch scope 0 only (keys divisible by 4 -> k % 4 == 0).
    val updates = spark.range(0, 10).select(
      (col("id") * 4).as("k"), lit(0L).as("scope"),
      lit(-1.0).as("score"))
    TxnTable.mergeScoped(spark, root, updates, Seq("k"), "scope",
      statsCols = Seq("scope", "k"))
    val m1 = TxnTable.readManifest(spark, root, 1)
    val carried = m1.files.map(_.path).toSet.intersect(v0Files)
    assert(carried.nonEmpty, "out-of-scope files must be carried verbatim")
    assert(carried.size < v0Files.size, "in-scope files must be rewritten")
    // Data equals a full-table merge of the same updates.
    val snap = TxnTable.snapshot(spark, root)
    assert(snap.count() == 400)
    assert(snap.filter(col("score") === -1.0).count() == 10)
    assert(snap.filter(col("k") % 4 === 0 && col("k") < 40)
      .agg(sum("score")).head().getDouble(0) == -10.0)
  }

  test("appendBatch is exactly-once: a replayed batch id is a no-op") {
    val root = freshRoot()
    assert(TxnTable.appendBatch(spark, root, kv((1L, "a", 1.0)), 0L)
      .contains(0L)) // first batch creates the table
    assert(TxnTable.appendBatch(spark, root, kv((2L, "b", 2.0)), 1L)
      .contains(1L))
    // Crash-replay of batch 1 with different (wrong) content: fenced out.
    assert(TxnTable.appendBatch(spark, root, kv((99L, "dup", 9.9)), 1L)
      .isEmpty)
    assert(TxnTable.appendBatch(spark, root, kv((3L, "c", 3.0)), 2L)
      .contains(2L))
    assert(sortedRows(TxnTable.snapshot(spark, root)).map(_._1) ==
      Seq(1L, 2L, 3L))
    // A non-stream append must not regress the fence.
    TxnTable.append(spark, root, kv((4L, "d", 4.0)))
    assert(TxnTable.appendBatch(spark, root, kv((98L, "dup", 9.8)), 2L)
      .isEmpty)
    assert(sortedRows(TxnTable.snapshot(spark, root)).map(_._1) ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("CHECK constraints gate every commit path; NULL passes (SQL semantics)") {
    val root = freshRoot()
    val cs = Map("score_nonneg" -> "score >= 0", "key_present" -> "k IS NOT NULL")
    TxnTable.create(spark, root, kv((1L, "a", 1.0)), constraints = cs)
    // Violating append aborts BEFORE publishing; table state unchanged.
    intercept[IllegalArgumentException] {
      TxnTable.append(spark, root, kv((2L, "bad", -5.0)))
    }
    assert(TxnTable.latestVersion(spark, root).contains(0L))
    // Violating merge updates abort too.
    intercept[IllegalArgumentException] {
      TxnTable.merge(spark, root, kv((1L, "bad", -1.0)), Seq("k"))
    }
    // Violating streaming batch aborts (no silent skip).
    intercept[IllegalArgumentException] {
      TxnTable.appendBatch(spark, root, kv((3L, "bad", -2.0)), 0L)
    }
    // Clean rows commit, and the constraint survives the commit chain.
    TxnTable.append(spark, root, kv((2L, "b", 2.0)))
    intercept[IllegalArgumentException] {
      TxnTable.append(spark, root, kv((3L, "bad", -1.0)))
    }
    // NULL predicate result passes: score IS NULL -> NULL >= 0 -> pass.
    val withNull = spark.sql(
      "SELECT 4L AS k, 'n' AS name, CAST(NULL AS DOUBLE) AS score")
    TxnTable.append(spark, root, withNull)
    assert(TxnTable.snapshot(spark, root).count() == 3)
    // Violating create never writes a table at all.
    val root2 = freshRoot()
    intercept[IllegalArgumentException] {
      TxnTable.create(spark, root2, kv((1L, "x", -1.0)), constraints = cs)
    }
    assert(TxnTable.latestVersion(spark, root2).isEmpty)
  }

  test("latest-version hint: stale, missing, and future hints all resolve right") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, "a", 1.0)))
    TxnTable.append(spark, root, kv((2L, "b", 2.0)))
    TxnTable.append(spark, root, kv((3L, "c", 3.0)))
    val hint = java.nio.file.Paths.get(root, "_log", "_LAST")
    assert(java.nio.file.Files.exists(hint), "commits maintain the hint")
    assert(TxnTable.latestVersion(spark, root).contains(2L))
    // Stale hint (crash between commit and hint write): probe forward.
    java.nio.file.Files.writeString(hint, "0")
    assert(TxnTable.latestVersion(spark, root).contains(2L))
    // Missing hint: full-listing fallback.
    java.nio.file.Files.delete(hint)
    assert(TxnTable.latestVersion(spark, root).contains(2L))
    // Hint pointing past any manifest (impossible by protocol, but a
    // corrupt file must not break reads): fallback.
    java.nio.file.Files.writeString(hint, "99")
    assert(TxnTable.latestVersion(spark, root).contains(2L))
    java.nio.file.Files.writeString(hint, "not-a-number")
    assert(TxnTable.latestVersion(spark, root).contains(2L))
  }

  test("model check: random op sequences match an in-memory reference at every version") {
    val rnd = new scala.util.Random(42) // seeded: failures reproduce
    type Bag = Vector[(Long, String, Double)]
    def randomRows(): Bag =
      Vector.fill(1 + rnd.nextInt(4))(
        (rnd.nextInt(20).toLong, "n" + rnd.nextInt(5),
          rnd.nextInt(100).toDouble))
    def toDf(b: Bag) = kv(b: _*)
    for (_ <- 1 to 3) {
      val root = freshRoot()
      val init = randomRows()
      TxnTable.create(spark, root, toDf(init))
      var model: Bag = init
      var history = Vector(model)
      var nextBatch = 0L
      for (_ <- 1 to 5) {
        rnd.nextInt(6) match {
          case 0 =>
            val rows = randomRows()
            TxnTable.append(spark, root, toDf(rows))
            model = model ++ rows
          case 1 => // merge: updates replace all rows of their keys
            val upd = randomRows().distinctBy(_._1)
            TxnTable.merge(spark, root, toDf(upd), Seq("k"))
            val keys = upd.map(_._1).toSet
            model = model.filterNot(r => keys(r._1)) ++ upd
          case 2 =>
            val keys = Vector.fill(2)(rnd.nextInt(20).toLong).distinct
            import spark.implicits._
            TxnTable.delete(spark, root, keys.toDF("k"), Seq("k"))
            model = model.filterNot(r => keys.contains(r._1))
          case 3 =>
            val rows = randomRows()
            TxnTable.overwrite(spark, root, toDf(rows))
            model = rows
          case 4 =>
            TxnTable.compact(spark, root)
          case 5 => // streaming append + an immediate replay (must no-op)
            val rows = randomRows()
            assert(TxnTable.appendBatch(spark, root, toDf(rows),
              nextBatch).isDefined)
            assert(TxnTable.appendBatch(spark, root, toDf(randomRows()),
              nextBatch).isEmpty)
            nextBatch += 1
            model = model ++ rows
        }
        history = history :+ model
        assert(sortedRows(TxnTable.snapshot(spark, root)).sorted ==
          model.sorted.toSeq, "snapshot diverged from model")
      }
      // Every historical version must still read back exactly.
      history.zipWithIndex.foreach { case (m, v) =>
        assert(sortedRows(TxnTable.snapshotAt(spark, root, v.toLong))
          .sorted == m.sorted.toSeq, s"time travel to v$v diverged")
      }
    }
  }

  test("maintenance chain: small appends -> compact -> cluster -> vacuum") {
    val root = freshRoot()
    // 10 interleaved-key appends: many small files, every file's k stats
    // span nearly the whole domain (pruning degenerates to full scan).
    TxnTable.create(spark, root,
      kv((0 until 100 by 10).map(i => (i.toLong, s"n$i", i.toDouble)): _*),
      statsCols = Seq("k"))
    (1 to 9).foreach { r =>
      TxnTable.append(spark, root,
        kv((r until 100 by 10).map(i => (i.toLong, s"n$i", i.toDouble)): _*),
        statsCols = Seq("k"))
    }
    val expected = sortedRows(TxnTable.snapshot(spark, root))
    val preFiles = TxnTable.snapshot(spark, root).inputFiles.length
    assert(preFiles >= 10)
    // Pre-maintenance the probe touches at least one file PER APPEND —
    // probe cost grows with commit count, the degradation maintenance
    // exists to undo.
    assert(TxnTable.snapshotWhere(spark, root,
      col("k").between(40L, 49L)).inputFiles.length >= 10)
    TxnTable.compact(spark, root, statsCols = Seq("k"))
    TxnTable.cluster(spark, root, Seq("k"), 4, statsCols = Seq("k"))
    val deleted = TxnTable.vacuum(spark, root, retainLast = 1, graceMs = 0L)
    assert(deleted.nonEmpty, "superseded files must be reclaimed")
    // Content survives the whole chain bit-exactly.
    assert(sortedRows(TxnTable.snapshot(spark, root)) == expected)
    // Clustering restored disjoint stats: the probe now reads ~1 of 4.
    val probe = TxnTable.snapshotWhere(spark, root, col("k").between(40L, 49L))
    assert(probe.inputFiles.length < 4)
    assert(probe.count() == 10)
    // Post-vacuum the data dir holds EXACTLY the live manifest's files
    // (no orphans left paying storage).
    val live = TxnTable.readManifest(spark, root,
      TxnTable.latestVersion(spark, root).get).files.map(_.path).toSet
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$root/data"), true)
    var onDisk = Set.empty[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !st.getPath.getName.startsWith("_"))
        onDisk += st.getPath.toUri.getPath
          .stripPrefix(new org.apache.hadoop.fs.Path(root).toUri.getPath)
          .stripPrefix("/")
    }
    assert(onDisk == live)
  }

  test("DSv2 source: inferred schema, pruned planning, evolution nulls") {
    val root = freshRoot()
    val df = spark.range(0, 400).select(
      col("id").as("k"), concat(lit("n"), col("id")).as("name"),
      col("id").cast("double").as("score"))
      .repartitionByRange(4, col("k"))
    TxnTable.create(spark, root, df, statsCols = Seq("k"))
    val v2 = spark.read.format("graft.table.GraftTableProvider").load(root)
    // Inferred schema comes from the manifest.
    assert(v2.schema.fieldNames.toSeq == Seq("k", "name", "score"))
    // Full read round-trips.
    assert(v2.count() == 400)
    assert(v2.agg(sum("k")).head().getLong(0) == (0L until 400L).sum)
    // Comparison predicates prune at PLANNING: only the range files
    // overlapping [100, 200) survive as input partitions (sampling in
    // repartitionByRange can put the boundary inside a file, so assert
    // strictly-fewer-than-all rather than exactly one).
    val probe = v2.filter(col("k") >= 100 && col("k") < 200)
    assert(probe.rdd.getNumPartitions < 4,
      s"no planning-time pruning: ${probe.rdd.getNumPartitions} of 4")
    assert(probe.count() == 100)
    // Residual re-application: pruning never widens results (the file
    // holds 100..199; the row filter must still drop to 5 rows).
    assert(v2.filter(col("k") >= 100 && col("k") < 105).count() == 5)
    // A filter DSv2 can't bound (inequality on a stats-less string)
    // stays conservative: all partitions, correct answer.
    assert(v2.filter(col("name") === "n7").count() == 1)
    // Schema evolution: append a column; old files read as NULL through
    // the connector.
    TxnTable.append(spark, root,
      spark.range(400, 410).select(col("id").as("k"),
        concat(lit("n"), col("id")).as("name"),
        col("id").cast("double").as("score"),
        col("id").cast("long").as("extra")),
      statsCols = Seq("k"))
    val evolved = spark.read.format("graft.table.GraftTableProvider")
      .load(root)
    assert(evolved.schema.fieldNames.contains("extra"))
    assert(evolved.filter(col("extra").isNull).count() == 400)
    assert(evolved.filter(col("extra").isNotNull).count() == 10)
  }

  test("DSv2 write path: append and overwrite commit table versions with stats") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, "a", 1.0), (2L, "b", 2.0)),
      statsCols = Seq("k"))
    // DSv2 append -> a committed version, readable from BOTH surfaces.
    kv((3L, "c", 3.0), (4L, "d", 4.0))
      .write.format("graft.table.GraftTableProvider")
      .option("statsCols", "k")
      .mode("append").save(root)
    assert(TxnTable.latestVersion(spark, root).contains(1L))
    assert(sortedRows(TxnTable.snapshot(spark, root)).map(_._1) ==
      Seq(1L, 2L, 3L, 4L))
    val v2 = spark.read.format("graft.table.GraftTableProvider").load(root)
    assert(v2.count() == 4)
    // DSv2-written files carry stats: a probe above the first commit's
    // range prunes it at planning.
    val probe = v2.filter(col("k") >= 3)
    assert(probe.rdd.getNumPartitions <
      spark.read.format("graft.table.GraftTableProvider").load(root)
        .rdd.getNumPartitions)
    assert(probe.count() == 2)
    // DSv2 overwrite -> a rewrite commit; time travel still serves v1.
    kv((9L, "z", 9.0))
      .write.format("graft.table.GraftTableProvider")
      .option("statsCols", "k")
      .mode("overwrite").save(root)
    assert(sortedRows(TxnTable.snapshot(spark, root)).map(_._1) == Seq(9L))
    assert(sortedRows(TxnTable.snapshotAt(spark, root, 1L)).map(_._1) ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("DSv2 SQL surface: CREATE TABLE ... USING the provider, query by name") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      kv((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)),
      statsCols = Seq("k"))
    spark.sql("DROP TABLE IF EXISTS graft_sql_t")
    spark.sql(
      s"""CREATE TABLE graft_sql_t
          USING graft.table.GraftTableProvider
          OPTIONS (path '$root')""")
    try {
      val got = spark.sql(
        "SELECT k, name FROM graft_sql_t WHERE k >= 2 ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((2L, "b"), (3L, "c")))
      // INSERT INTO through the SQL surface commits a table version.
      spark.sql("INSERT INTO graft_sql_t VALUES (4, 'd', 4.0)")
      assert(TxnTable.latestVersion(spark, root).contains(1L))
      assert(spark.sql("SELECT COUNT(*) FROM graft_sql_t")
        .head().getLong(0) == 4L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_t")
  }

  test("vacuum reclaims pre-rewrite files; retained versions unaffected") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, "a", 1.0), (2L, "b", 2.0)))
    TxnTable.overwrite(spark, root, kv((9L, "z", 9.0)))
    TxnTable.compact(spark, root)
    val before = sortedRows(TxnTable.snapshot(spark, root))
    val deleted = TxnTable.vacuum(spark, root, retainLast = 2, graceMs = 0L)
    assert(deleted.nonEmpty) // v0's files are unreferenced by v1/v2
    assert(sortedRows(TxnTable.snapshot(spark, root)) == before)
    assert(sortedRows(TxnTable.snapshotAt(spark, root, 1)).map(_._1) ==
      Seq(9L))
    // v0's data files are gone: reading it now fails (documented).
    intercept[Exception] {
      TxnTable.snapshotAt(spark, root, 0).collect()
    }
  }

  test("bloom point lookup skips files min/max stats cannot prune") {
    val root = freshRoot()
    // interleaved high-cardinality keys: round-robin partitioning puts
    // every value range in every file, so [min,max] never prunes — the
    // exact case the bloom index exists for
    val df = spark.range(0, 4000).select(
      col("id").as("k"), lit("x").as("name"),
      col("id").cast("double").as("score"))
      .repartition(8)
    TxnTable.create(spark, root, df, statsCols = Seq("k"),
      bloomCols = Seq("k"))
    val all = TxnTable.snapshot(spark, root)
    assert(all.inputFiles.length == 8)
    // min/max is useless here (every file straddles the probe)
    val statsPruned = TxnTable.snapshotPruned(spark, root, "k", 77.0, 77.0)
    assert(statsPruned.inputFiles.length == 8)
    // bloom prunes to ~1 file (fpp allows the odd extra)
    val probe = TxnTable.snapshotPointEq(spark, root, "k", 77L)
    assert(probe.inputFiles.length <= 3,
      s"bloom kept ${probe.inputFiles.length} of 8 files")
    assert(probe.collect().map(_.getLong(0)).toSeq == Seq(77L))
    // absent key: usually zero files survive, and never a wrong row
    val miss = TxnTable.snapshotPointEq(spark, root, "k", 999999L)
    assert(miss.count() == 0)
  }

  test("blooms are maintained by every commit path and absent blooms stay conservative") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, "a", 1.0), (2L, "b", 2.0)),
      bloomCols = Seq("k"))
    // append inherits the table property (no bloomCols arg)
    TxnTable.append(spark, root, kv((3L, "c", 3.0)))
    // a rewrite keeps maintaining blooms
    TxnTable.compact(spark, root)
    val m = TxnTable.readManifest(spark, root,
      TxnTable.latestVersion(spark, root).get)
    assert(m.bloomCols.contains(Seq("k")))
    assert(m.files.filter(_.rows > 0).forall(_.blooms.exists(_.contains("k"))))
    // every key still found through the bloom probe after the chain
    Seq(1L, 2L, 3L).foreach { k =>
      assert(TxnTable.snapshotPointEq(spark, root, "k", k).count() == 1,
        s"bloom probe lost k=$k")
    }
    // a table WITHOUT the property: probes read everything, still right
    val plain = freshRoot()
    TxnTable.create(spark, plain, kv((1L, "a", 1.0)))
    val p = TxnTable.snapshotPointEq(spark, plain, "k", 1L)
    assert(p.inputFiles.length ==
      TxnTable.snapshot(spark, plain).inputFiles.length)
    assert(p.count() == 1)
  }

  test("layout evolution: clustered era prunes tightly, arrival-ordered era reads conservatively, answers exact") {
    val root = freshRoot()
    // era 1: clustered on k -> disjoint per-file ranges
    val era1 = spark.range(0, 400).select(
      col("id").as("k"), lit("x").as("name"),
      col("id").cast("double").as("score"))
    TxnTable.create(spark, root, era1, statsCols = Seq("k"))
    TxnTable.cluster(spark, root, Seq("k"), nFiles = 4,
      statsCols = Seq("k"))
    // era 2: arrival-ordered append (interleaved keys, wide stats)
    val era2 = spark.range(400, 800).select(
      col("id").as("k"), lit("y").as("name"),
      col("id").cast("double").as("score"))
      .orderBy(expr("id % 7")) // scrambled arrival order
    TxnTable.append(spark, root, era2, statsCols = Seq("k"))
    val total = TxnTable.snapshot(spark, root).inputFiles.length
    // probe inside era 1's key space: era-1 files prune to ~1, era-2
    // files are kept only where stats overlap — strictly fewer than all
    val probe = TxnTable.snapshotPruned(spark, root, "k", 10.0, 20.0)
    assert(probe.inputFiles.length < total,
      s"no pruning across mixed-layout eras (${probe.inputFiles.length}/$total)")
    assert(probe.filter(col("k").between(10, 20)).count() == 11)
    // both eras answer: full count intact across the mixed layout
    assert(TxnTable.snapshot(spark, root).count() == 800)
  }

  test("deleteMor: no data rewrite; re-insert visible; rewrite materializes") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      kv((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    val filesBefore = TxnTable.readManifest(spark, root, 0).files.map(_.path)
    TxnTable.deleteMor(spark, root, Seq(2L).toDF("k"), Seq("k"))
    val m1 = TxnTable.readManifest(spark, root, 1)
    // the delete commit references the SAME data files — zero rewrite IO
    assert(m1.files.map(_.path) == filesBefore)
    assert(m1.files.forall(_.dvs.exists(_.nonEmpty)))
    assert(sortedRows(TxnTable.snapshot(spark, root)).map(_._1) ==
      Seq(1L, 3L))
    // re-insert after delete: the new file carries no dv, so the key
    // returns — SQL DELETE-then-INSERT semantics, not a key blacklist
    TxnTable.append(spark, root, kv((2L, "b2", 22.0)))
    assert(sortedRows(TxnTable.snapshot(spark, root)) ==
      Seq((1L, "a", 1.0), (2L, "b2", 22.0), (3L, "c", 3.0)))
    // metadata-only aggregates refuse to overcount under dvs
    intercept[IllegalArgumentException] { TxnTable.rowCount(spark, root) }
    assert(TxnTable.statsRange(spark, root, "k").isEmpty)
    // any rewrite materializes the deletes and clears the dvs
    TxnTable.compact(spark, root)
    val mc = TxnTable.readManifest(spark, root,
      TxnTable.latestVersion(spark, root).get)
    assert(mc.files.forall(_.dvs.isEmpty))
    assert(sortedRows(TxnTable.snapshot(spark, root)) ==
      Seq((1L, "a", 1.0), (2L, "b2", 22.0), (3L, "c", 3.0)))
    assert(TxnTable.rowCount(spark, root) == 3L)
  }

  test("vacuum retains referenced deletion-vector sidecars") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, "a", 1.0), (2L, "b", 2.0)))
    TxnTable.deleteMor(spark, root, Seq(1L).toDF("k"), Seq("k"))
    TxnTable.vacuum(spark, root, retainLast = 1, graceMs = 0L)
    // the dv sidecar must have survived the vacuum — the delete still applies
    assert(sortedRows(TxnTable.snapshot(spark, root)).map(_._1) == Seq(2L))
  }

  test("shallow clone: zero-copy branch; divergence and vacuum stay isolated") {
    val src = freshRoot()
    TxnTable.create(spark, src, kv((1L, "a", 1.0), (2L, "b", 2.0)))
    TxnTable.append(spark, src, kv((3L, "c", 3.0)))
    val dst = freshRoot() + "/clone"
    TxnTable.cloneTable(spark, src, dst)
    // the clone wrote NO data files of its own
    val dstData = new java.io.File(s"$dst/data")
    assert(!dstData.exists || dstData.listFiles().isEmpty)
    assert(sortedRows(TxnTable.snapshot(spark, dst)) ==
      sortedRows(TxnTable.snapshot(spark, src)))
    // divergence: append to the clone, source unchanged
    TxnTable.append(spark, dst, kv((9L, "z", 9.0)))
    assert(sortedRows(TxnTable.snapshot(spark, dst)).map(_._1) ==
      Seq(1L, 2L, 3L, 9L))
    assert(sortedRows(TxnTable.snapshot(spark, src)).map(_._1) ==
      Seq(1L, 2L, 3L))
    // clone's vacuum deletes nothing it doesn't own
    TxnTable.vacuum(spark, dst, retainLast = 1, graceMs = 0L)
    assert(sortedRows(TxnTable.snapshot(spark, src)).map(_._1) ==
      Seq(1L, 2L, 3L))
  }

  test("DSv2 versionAsOf: pinned read resolves old files AND old schema; bad versions refused") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, "a", 1.0), (2L, "b", 2.0)))
    // v1 evolves the schema; v2 rewrites the data
    TxnTable.append(spark, root,
      kv((3L, "c", 3.0)).withColumn("extra", lit(7L)))
    TxnTable.overwrite(spark, root, kv((9L, "z", 9.0)))
    def read(v: Long) = spark.read
      .format("graft.table.GraftTableProvider")
      .option("versionAsOf", v.toString).load(root)
    // v0: pre-evolution schema (no `extra`), pre-overwrite rows
    assert(!read(0).columns.contains("extra"))
    assert(read(0).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    // v1: evolved schema, evolution nulls on old files
    val v1 = read(1)
    assert(v1.columns.contains("extra"))
    assert(v1.select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L))
    assert(v1.filter(col("extra").isNull).count() == 2)
    // latest (no option) sees only the overwrite
    assert(spark.read.format("graft.table.GraftTableProvider").load(root)
      .select("k").as[Long].collect().toSeq == Seq(9L))
    // unknown and malformed versions are loud errors
    intercept[Exception] { read(99).collect() }
    intercept[Exception] {
      spark.read.format("graft.table.GraftTableProvider")
        .option("versionAsOf", "abc").load(root).collect()
    }
  }

  test("DSv2 limit pushdown: a LIMIT-only scan opens a file prefix, not the snapshot") {
    val root = freshRoot()
    // four commits, coalesced -> four data files of exactly 3 rows each
    TxnTable.create(spark, root, kv((1L, "a", 1.0), (2L, "b", 2.0),
      (3L, "c", 3.0)).coalesce(1))
    for (i <- 1 to 3)
      TxnTable.append(spark, root, kv((i * 10L, "x", 0.5),
        (i * 10L + 1, "y", 0.5), (i * 10L + 2, "z", 0.5)).coalesce(1))
    val df = spark.read.format("graft.table.GraftTableProvider").load(root)
    assert(df.count() == 12)
    // Spark must actually push the limit into the scan (the scan's
    // description carries it)...
    val limited = df.limit(2)
    assert(limited.queryExecution.executedPlan.toString.contains("limit=2"),
      "limit did not reach the scan:\n" +
        limited.queryExecution.executedPlan.toString)
    assert(limited.collect().length == 2)
    // ...and the scan bounds its planned FILE SET from manifest row
    // counts: LIMIT 2 fits in the first 3-row file; LIMIT 5 needs two
    // files; LIMIT 13 > |table| keeps all four.
    def plannedFiles(l: Int): Int =
      new graft.table.GraftScan(root, df.schema, Array.empty,
        None, Some(l)).planInputPartitions().length
    assert(plannedFiles(2) == 1, s"LIMIT 2 planned ${plannedFiles(2)} files")
    assert(plannedFiles(5) == 2, s"LIMIT 5 planned ${plannedFiles(5)} files")
    assert(plannedFiles(13) == 4)
    assert(df.limit(5).collect().length == 5)
    // with a residual filter the bound must NOT apply: the filter could
    // drop every row the prefix holds — all files stay planned and the
    // answer is exact
    val filtered = df.filter(col("score") < 1.0).limit(2)
    assert(filtered.collect().length == 2)
    assert(filtered.select(sum("score")).head().getDouble(0) == 1.0)
  }

  test("DSv2 aggregate pushdown: COUNT/MIN/MAX answered from the manifest, zero file reads") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      kv((5L, "a", 1.5), (2L, "b", 2.0), (9L, "c", 0.25)),
      statsCols = Seq("k", "score"))
    TxnTable.append(spark, root, kv((7L, "d", 9.75)),
      statsCols = Seq("k", "score"))
    val df = spark.read.format("graft.table.GraftTableProvider").load(root)
    val agg = df.selectExpr("count(*) AS n", "min(k) AS mn",
      "max(score) AS mx")
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("aggregated=["),
      s"aggregation not answered by the manifest scan:\n$plan")
    val r = agg.head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L &&
      r.getDouble(2) == 9.75)
    // a filter disqualifies complete pushdown: falls back to the file
    // scan and still answers correctly
    val filtered = df.filter(col("k") > 4).selectExpr("count(*) AS n")
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("aggregated=["))
    assert(filtered.head().getLong(0) == 3L)
    // a column without complete stats declines too
    val noStats = freshRoot()
    TxnTable.create(spark, noStats, kv((1L, "a", 1.0)))
    val ns = spark.read.format("graft.table.GraftTableProvider")
      .load(noStats).selectExpr("min(k) AS mn")
    assert(!ns.queryExecution.executedPlan.toString.contains("aggregated=["))
    assert(ns.head().getLong(0) == 1L)
  }

  test("mergeFull: matched update, unmatched insert, not-matched-by-source conditional delete") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv(
      (1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0)))
    // source: updates k=1, inserts k=9; k=2/3/4 unmatched by source —
    // delete only those with score >= 3 (k=3, k=4), carry k=2
    TxnTable.mergeFull(spark, root,
      kv((1L, "A", 10.0), (9L, "i", 9.0)),
      Seq("k"), deleteWhen = col("score") >= 3.0)
    assert(sortedRows(TxnTable.snapshot(spark, root)) ==
      Seq((1L, "A", 10.0), (2L, "b", 2.0), (9L, "i", 9.0)))
    // NULL delete condition must carry the row (SQL three-valued logic)
    val root2 = freshRoot()
    TxnTable.create(spark, root2,
      Seq((1L, "a", Option.empty[Double]), (2L, "b", Some(2.0)))
        .toDF("k", "name", "score"))
    TxnTable.mergeFull(spark, root2,
      Seq((2L, "B", Some(20.0))).toDF("k", "name", "score"),
      Seq("k"), deleteWhen = col("score") > 100.0)
    val left = TxnTable.snapshot(spark, root2)
      .select("k").as[Long].collect().sorted.toSeq
    assert(left == Seq(1L, 2L), "null-scored unmatched row was dropped")
  }

  test("cdf: updates emit paired pre/post images; delta application equals the target snapshot") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      kv((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    // v1: update k=2 + insert k=4; v2: delete k=3
    TxnTable.merge(spark, root,
      kv((2L, "b2", 20.0), (4L, "d", 4.0)), Seq("k"))
    TxnTable.delete(spark, root,
      Seq(3L).toDF("k"), Seq("k"))
    val rows = TxnTable.cdf(spark, root, 0L, 2L, Seq("k"))
      .select("k", "_change_type", "name", "score")
      .as[(Long, String, String, Double)].collect().sortBy(r => (r._1, r._2))
    assert(rows.toSeq == Seq(
      (2L, "update_postimage", "b2", 20.0),
      (2L, "update_preimage", "b", 2.0),
      (3L, "delete", "c", 3.0),
      (4L, "insert", "d", 4.0)), rows.mkString(", "))
    // incremental maintenance algebra: count delta from signed rows
    // equals the snapshot-count difference
    val signed = rows.map {
      case (_, "insert", _, _) | (_, "update_postimage", _, _) => 1L
      case _ => -1L
    }.sum
    val n0 = TxnTable.snapshotAt(spark, root, 0L).count()
    val n2 = TxnTable.snapshot(spark, root).count()
    // the update pre/post pair cancels, so the signed sum IS the
    // row-count delta — the invariant incremental maintenance rides on
    assert(n0 + signed == n2, s"n0=$n0 signed=$signed n2=$n2")
  }
}
