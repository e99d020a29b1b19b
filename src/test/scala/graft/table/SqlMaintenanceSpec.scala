package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL maintenance surface ([[GraftSqlParser]] via
  * [[graft.GraftExtensions]]): OPTIMIZE / OPTIMIZE CLUSTER BY / VACUUM
  * parsed ahead of Spark's grammar and executed as commands — commit
  * protocol, stats preservation, retention, and the pass-through of
  * ordinary SQL.
  */
class SqlMaintenanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // extensions (the injected parser) apply only at SESSION
    // CONSTRUCTION: when an earlier suite in this JVM already built
    // the shared session WITHOUT them, getOrCreate would hand it back
    // with the conf set but the parser absent — rebuild instead.
    // Suites run sequentially in the forked test JVM, so stopping the
    // finished session is safe; later suites getOrCreate this one.
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .filterNot(_.conf.getOption("spark.sql.extensions")
        .contains("graft.GraftExtensions"))
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_sqlmaint").toString

  private def cat(root: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set(s"spark.sql.catalog.$name", "graft.table.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse",
      p.getParent.toString)
    s"$name.`${p.getName}`"
  }

  private def smallFiles(root: String): Unit =
    TxnTable.create(spark, root,
      spark.range(0, 400).select(col("id").as("k"),
        (col("id") % 7).cast("double").as("score"))
        .repartition(8), Seq("k"))

  test("graft_changes TVF: distributed change rows between versions; " +
      "refused without CDF") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      spark.range(0, 100).select(col("id").as("k"),
        (col("id") % 5).cast("double").as("v")), Seq("k"))
    // no CDF yet: loud refusal at analysis
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_changes('$root', 0, 0)").collect()
    }
    assert(e.getMessage.contains("change data feed"))
    TxnTable.enableCdf(spark, root, Seq("k"))
    TxnTable.append(spark, root,
      spark.range(100, 150).select(col("id").as("k"),
        lit(9.0).as("v")), Seq("k"))
    TxnTable.deleteWhere(spark, root, col("k") < 10)
    val got = spark.sql(
      s"""SELECT _change_type, COUNT(*) AS n
         FROM graft_changes('$root', 0, 2)
         GROUP BY 1 ORDER BY 1""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("delete" -> 10L, "insert" -> 50L))
    // the plan is the distributed diff, not a driver materialization
    val plan = spark.sql(
      s"SELECT * FROM graft_changes('$root', 0, 2)")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("LocalRelation"),
      s"change rows must never land on the driver:\n$plan")
  }

  test("TVFs accept catalog identifiers: graft_history / graft_files " +
      "/ graft_changes on cat.t resolve through the catalog's " +
      "warehouse; non-graft first segments stay paths") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      spark.range(0, 60).select(col("id").as("k"),
        (col("id") % 3).cast("double").as("v")), Seq("k"))
    TxnTable.enableCdf(spark, root, Seq("k"))
    TxnTable.append(spark, root,
      spark.range(60, 90).select(col("id").as("k"),
        lit(7.0).as("v")), Seq("k"))
    val tblName = new org.apache.hadoop.fs.Path(root).getName
    cat(root, "gtvf") // registers gtvf with warehouse = parent dir
    val ident = s"gtvf.$tblName"
    // identifier and path forms answer identically
    val hi = spark.sql(
      s"SELECT version, op FROM graft_history('$ident') ORDER BY 1")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val hp = spark.sql(
      s"SELECT version, op FROM graft_history('$root') ORDER BY 1")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hi == hp && hi.map(_._2) == Seq("create", "append"))
    val fi = spark.sql(
      s"SELECT COUNT(*) c, CAST(SUM(n_rows) AS BIGINT) r " +
        s"FROM graft_files('$ident')").head()
    assert(fi.getLong(1) == 90)
    val ci = spark.sql(
      s"""SELECT _change_type, COUNT(*) AS n
         FROM graft_changes('$ident', 0, 1) GROUP BY 1""").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ci == Map("insert" -> 30L))
    // traversal guard: identifier segments cannot escape the warehouse
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_history('gtvf...$tblName')")
        .collect()
    }
    assert(e.getMessage.contains("illegal identifier segment"))
    // a dotted string whose first segment is NOT a graft catalog is a
    // path and keeps the containment conf
    spark.conf.set("spark.graft.sql.history.root", "/nonexistent_allow")
    try {
      val e2 = intercept[Exception] {
        spark.sql("SELECT * FROM graft_history('no_such_cat.t')")
          .collect()
      }
      assert(e2.getMessage.contains("outside the configured"))
      // identifier form is warehouse-contained by construction: exempt
      assert(spark.sql(s"SELECT COUNT(*) c FROM graft_history('$ident')")
        .head().getLong(0) == 2)
    } finally spark.conf.unset("spark.graft.sql.history.root")
  }

  test("OPTIMIZE ... WHERE <partition> = v compacts ONLY the named " +
      "partition: other partitions' files carry verbatim, rows exact") {
    val root = freshRoot()
    def slice(lo: Int, hi: Int) =
      spark.range(lo, hi).select(col("id").as("k"),
        when(col("id") % 2 === 0, "A").otherwise("B").as("st"),
        (col("id") % 7).cast("double").as("v"))
    TxnTable.create(spark, root, slice(0, 40), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    (1 to 3).foreach(i => TxnTable.append(spark, root,
      slice(40 * i, 40 * (i + 1)), Seq("k")))
    val before = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    val aBefore = before.files.filter(_.pv.contains("A"))
    val bBefore = before.files.filter(_.pv.contains("B"))
    assert(aBefore.size >= 4 && bBefore.size >= 4) // ingest debris
    val t = cat(root, "gow")
    val r = spark.sql(s"OPTIMIZE $t WHERE st = 'A'").head()
    assert(r.getString(0) == "compact-partition")
    val after = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    // B's files carried VERBATIM; A's bin-packed down
    assert(after.files.filter(_.pv.contains("B")).toSet == bBefore.toSet)
    val aAfter = after.files.filter(_.pv.contains("A"))
    assert(aAfter.size < aBefore.size,
      s"expected A's ${aBefore.size} files to bin-pack, got ${aAfter.size}")
    assert(aAfter.forall(_.pv.contains("A")))
    assert(TxnTable.snapshot(spark, root).count() == 160)
    assert(TxnTable.snapshot(spark, root)
      .filter(col("st") === "A").count() == 80)
    // wrong column / unpartitioned targets are refused loudly
    val e = intercept[Exception] {
      spark.sql(s"OPTIMIZE $t WHERE v = 3")
    }
    assert(e.getMessage.contains("partition column"))
  }

  test("SHOW PARTITIONS lists per-partition file/row/byte counts " +
      "from the manifest, with straggler (pv-less) files visible") {
    val root = freshRoot()
    def sdf(lo: Int, hi: Int) =
      spark.range(lo, hi).select(col("id").as("k"),
        when(col("id") % 3 === 0, "A")
          .when(col("id") % 3 === 1, "B").otherwise("C").as("st"),
        (col("id") % 5).cast("double").as("v"))
    TxnTable.create(spark, root, sdf(0, 90), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    val t = cat(root, "gshow")
    val rows = spark.sql(s"SHOW PARTITIONS $t")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows == Map("A" -> 30L, "B" -> 30L, "C" -> 30L))
    // COW rewrite creates pv-less stragglers: they surface as NULL
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE k = 6")
    val rows2 = spark.sql(s"SHOW PARTITIONS $t")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    assert(rows2.contains(None), s"stragglers must be visible: $rows2")
    assert(rows2.values.sum == 90)
    // unpartitioned table: loud refusal; non-graft SHOW PARTITIONS
    // syntax still parses through the delegate
    val root2 = freshRoot()
    TxnTable.create(spark, root2, sdf(0, 10), Seq("k"))
    val e = intercept[Exception] {
      spark.sql(s"SHOW PARTITIONS '$root2'").collect()
    }
    assert(e.getMessage.contains("partition layout"))
  }

  test("RESTORE TABLE ... TO VERSION AS OF commits the target's file " +
      "set; restoring to a non-earlier version is refused") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      spark.range(0, 100).select(col("id").as("k")), Seq("k"))
    TxnTable.append(spark, root,
      spark.range(100, 200).select(col("id").as("k")), Seq("k"))
    TxnTable.append(spark, root,
      spark.range(200, 300).select(col("id").as("k")), Seq("k"))
    val r = spark.sql(
      s"RESTORE TABLE '$root' TO VERSION AS OF 1").collect()
    assert(r.head.getString(0) == "restore")
    assert(r.head.getLong(1) == 3) // the restore commit
    assert(TxnTable.snapshot(spark, root).count() == 200)
    // the reverted slice still time-travels
    assert(TxnTable.snapshotAt(spark, root, 2).count() == 300)
    intercept[Exception] {
      spark.sql(s"RESTORE TABLE '$root' TO VERSION AS OF 9")
    }
  }

  test("OPTIMIZE ... SMALLER THAN bin-packs only the small files: " +
      "the healthy file carries VERBATIM, content stays exact, and " +
      "a second run is a no-op") {
    val root = freshRoot()
    // one healthy file (4000 rows) + 6 debris files (~60 rows each)
    TxnTable.create(spark, root,
      spark.range(0, 4000).select(col("id").as("k"),
        (col("id") % 7).cast("double").as("score")).coalesce(1),
      Seq("k"))
    (0 until 6).foreach { i =>
      TxnTable.append(spark, root,
        spark.range(4000 + i * 60L, 4000 + (i + 1) * 60L)
          .select(col("id").as("k"),
            (col("id") % 7).cast("double").as("score")).coalesce(1),
        Seq("k"))
    }
    val m0 = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    assert(m0.files.size == 7)
    val bulk = m0.files.maxBy(_.bytes)
    val r = spark.sql(
      s"OPTIMIZE '$root' SMALLER THAN ${bulk.bytes}").collect()
    assert(r.head.getString(0) == "compact-small")
    assert(r.head.getLong(2) == 6 && r.head.getLong(3) >= 1)
    val m1 = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    assert(m1.files.exists(_.path == bulk.path),
      "the healthy file must carry verbatim")
    assert(m1.files.size < 7)
    // content exact, stats preserved on the packed files
    assert(TxnTable.snapshot(spark, root).count() == 4360)
    assert(m1.files.filter(_.rows > 0).forall(_.stats.contains("k")))
    // second run: nothing below the threshold anymore except possibly
    // the one packed file — no-op commits nothing
    val v1 = TxnTable.versions(spark, root).max
    val r2 = spark.sql(
      s"OPTIMIZE '$root' SMALLER THAN 2").collect()
    assert(r2.head.getLong(2) == 0 && r2.head.getLong(3) == 0)
    assert(TxnTable.versions(spark, root).max == v1)
    // refusal: SMALLER THAN cannot combine with a re-layout
    intercept[Exception] {
      spark.sql(s"OPTIMIZE '$root' SMALLER THAN 100 CLUSTER BY (k)")
    }
  }

  test("OPTIMIZE '<path>' compacts as a committed rewrite and " +
      "PRESERVES the table's opted-in stats columns") {
    val root = freshRoot()
    smallFiles(root)
    assert(TxnTable.readManifest(spark, root, 0L).files.size == 8)
    val r = spark.sql(s"OPTIMIZE '$root'").collect()
    assert(r.length == 1 && r.head.getString(0) == "compact" &&
      r.head.getLong(1) == 1L)
    val m = TxnTable.readManifest(spark, root, 1L)
    assert(m.op == "compact" && m.files.size < 8)
    // stats survived the SQL rewrite (k was the opted-in stats column)
    assert(m.files.forall(_.stats.contains("k")),
      s"OPTIMIZE dropped pruning stats: ${m.files.map(_.stats)}")
    assert(TxnTable.snapshot(spark, root).count() == 400L)
    // the result row's file accounting matches the manifest diff
    assert(r.head.getLong(2) == 8L &&
      r.head.getLong(3) == m.files.size.toLong)
  }

  test("OPTIMIZE cat.t CLUSTER BY (k) INTO 4 FILES range-clusters " +
      "through the catalog identifier with the traversal guard") {
    val root = freshRoot()
    smallFiles(root)
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set("spark.sql.catalog.gmaint", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmaint.warehouse",
      p.getParent.toString)
    val r = spark.sql(
      s"OPTIMIZE gmaint.`${p.getName}` CLUSTER BY (k) INTO 4 FILES")
      .collect()
    assert(r.head.getString(0) == "cluster")
    val m = TxnTable.readManifest(spark, root, 1L)
    assert(m.op == "cluster" && m.files.size == 4)
    // clustered: per-file k-ranges disjoint
    val ranges = m.files.map(_.stats("k")).sortBy(_.min)
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a.max < b.min, s"overlap: $ranges")
      case _ => ()
    }
    // traversal guard holds on the SQL path too
    val e = intercept[Exception] {
      spark.sql("OPTIMIZE gmaint.`..`").collect()
    }
    assert(e.getMessage.contains("illegal identifier segment") ||
      e.getMessage.contains("must be <catalog>"))
  }

  test("OPTIMIZE ZORDER BY (k, j): every interleaved dimension gets " +
      "tight per-file stats boxes — multi-dim pruning, not just the " +
      "leading sort column") {
    val root = freshRoot()
    // two INDEPENDENT dimensions (score = k % 7 would make every file
    // span the full second range and prove nothing)
    TxnTable.create(spark, root,
      spark.range(0, 4096).select(col("id").as("k"),
        ((col("id") * 2654435761L) % 4096L).as("j"))
        .repartition(8), Seq("k", "j"))
    val t = cat(root, "gmaint_z")
    val r = spark.sql(
      s"OPTIMIZE $t ZORDER BY (k, j) INTO 16 FILES").collect()
    assert(r.head.getString(0) == "zorder")
    val m = TxnTable.readManifest(spark, root, 1L)
    assert(m.op == "cluster" && m.files.size == 16)
    // a 16-file Morton layout over a 4096×4096-ish grid ≈ 4×4 boxes:
    // every file's box must be FAR narrower than the full range in
    // BOTH dims (a lexicographic sort would leave j spanning ~full)
    Seq("k", "j").foreach { c =>
      val widths = m.files.map(f =>
        f.stats(c).max - f.stats(c).min)
      assert(widths.max <= 4096.0 * 0.6,
        s"$c box widths not clustered: $widths")
    }
    // rows intact, box probe exact
    assert(TxnTable.snapshot(spark, root).count() == 4096L)
    assert(TxnTable.snapshotWhere(spark, root,
      col("k") < 100L && col("j") < 2048L).count() ==
      spark.range(0, 4096).filter(col("id") < 100L &&
        (col("id") * 2654435761L) % 4096L < 2048L).count())
  }

  test("VACUUM '<path>' RETAIN 1 VERSIONS deletes files referenced " +
      "only by aged-out versions (subject to the write grace window)") {
    val root = freshRoot()
    smallFiles(root)
    spark.sql(s"OPTIMIZE '$root'").collect() // v1 rewrites all files
    val r = spark.sql(s"VACUUM '$root' RETAIN 1 VERSIONS").collect()
    assert(r.head.getString(0) == "vacuum")
    // the 20-minute in-flight-writer grace window protects the young
    // v0 files in this fresh fixture — vacuum must delete NOTHING here
    // (deleting young files is the unsafe behavior r11 flagged)
    assert(r.head.getLong(2) == 0L,
      "grace window must protect freshly-written files")
    // data intact either way
    assert(TxnTable.snapshot(spark, root).count() == 400L)
  }

  test("non-maintenance SQL parses through the delegate untouched, " +
      "and malformed maintenance stays a parse error") {
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    intercept[Exception] { spark.sql("OPTIMIZE") }
    intercept[Exception] { spark.sql("VACUUM") }
    // a table named optimize is still reachable via standard grammar
    spark.range(3).createOrReplaceTempView("optimize")
    assert(spark.sql("SELECT COUNT(*) FROM optimize").head().getLong(0)
      == 3L)
  }

  test("OPTIMIZE ... WHERE IN tokenizes quoted literals exactly: a " +
      "comma INSIDE a value stays part of the value, malformed lists " +
      "are refused instead of silently mis-scoping") {
    // a quoted value containing a comma must scope to THAT partition
    assert(GraftSqlParser.splitInList("'a,b', 'c'") == Seq("a,b", "c"))
    assert(GraftSqlParser.splitInList("1, 2,3") == Seq("1", "2", "3"))
    assert(GraftSqlParser.splitInList("'x'") == Seq("x"))
    intercept[IllegalArgumentException] {
      GraftSqlParser.splitInList("'a,b', 'c") // unbalanced quote
    }
    intercept[IllegalArgumentException] {
      GraftSqlParser.splitInList("a b, c") // junk between separators
    }
    intercept[IllegalArgumentException] {
      GraftSqlParser.splitInList("a,,b") // empty element
    }
  }

  test("compaction policy is O(debris) on a partitioned table: a " +
      "partition already packed to one file never re-churns, and a " +
      "second pass is a version-for-version no-op") {
    val root = freshRoot()
    val df = spark.range(0, 1200).select(
      col("id").as("k"),
      expr("substr('ABC', CAST(id % 3 AS INT) + 1, 1)").as("st"),
      (col("id") % 7).cast("double").as("v"))
    TxnTable.create(spark, root, df.filter(col("k") % 4 === 0),
      Seq("k"), partitionBy = Some(TxnTable.PartitionSpec("st")))
    (1 to 3).foreach(i => TxnTable.append(spark, root,
      df.filter(col("k") % 4 === i), Seq("k")))
    def files = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max).files
    assert(files.groupBy(_.pv).values.forall(_.size >= 2),
      "fixture must land per-partition debris")
    // threshold ABOVE every file: byte-wise everything reads "small"
    val v1 = TxnTable.compactSmall(spark, root, 64L << 20,
      statsCols = Seq("k"))
    assert(files.groupBy(_.pv).values.forall(_.size == 1),
      "first pass must bin-pack every partition to one file")
    // anti-churn fence: the old table-wide >=2 guard would now
    // rewrite every partition's lone file forever, O(partitions) per
    // maintenance run — the per-group policy must no-op instead
    val v2 = TxnTable.compactSmall(spark, root, 64L << 20,
      statsCols = Seq("k"))
    assert(v2 == v1,
      s"second pass must commit nothing, got v$v2 over v$v1")
    assert(TxnTable.snapshot(spark, root).count() == 1200)
  }

  test("dictionary/ZSTD-aware accounting: a well-compressed FULL file " +
      "(rows >= the table's minBytes-worth) is not debris, however " +
      "few bytes it holds") {
    val root = freshRoot()
    // file A: 100k rows that encode to almost nothing (low-cardinality
    // key + constant string — dictionary/RLE heaven); B, C: 500
    // genuinely small row slices of high-entropy values
    TxnTable.create(spark, root,
      spark.range(0, 100000).select((col("id") % 100).as("k"),
        lit("zzzz").as("tag")).coalesce(1), Seq("k"))
    TxnTable.append(spark, root,
      spark.range(100000, 100500).select(col("id").as("k"),
        concat(lit("t"), col("id")).as("tag")).coalesce(1), Seq("k"))
    TxnTable.append(spark, root,
      spark.range(100500, 101000).select(col("id").as("k"),
        concat(lit("t"), col("id")).as("tag")).coalesce(1), Seq("k"))
    def files = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max).files
    val a = files.maxBy(_.rows)
    assert(a.rows == 100000L)
    // a threshold ABOVE every file's bytes but BELOW 100k × the
    // debris files' bytes-per-row: byte-wise everything reads small,
    // and the rows floor (minBytes / median bpr) exempts exactly the
    // well-compressed full file
    val minBytes = 512L << 10
    assert(files.forall(_.bytes < minBytes),
      s"fixture assumption: every file under the threshold — $files")
    TxnTable.compactSmall(spark, root, minBytes, statsCols = Seq("k"))
    val after = files
    assert(after.exists(_.path == a.path),
      "the dictionary-compressed full file must carry VERBATIM — " +
        "byte-threshold accounting would churn it every run")
    assert(after.size == 2,
      s"the two true-debris files must pack to one: $after")
    assert(TxnTable.snapshot(spark, root).count() == 101000)
  }
}
