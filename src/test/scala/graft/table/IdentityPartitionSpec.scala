package graft.table

import java.nio.file.Files

import org.apache.spark.sql.{sources, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** IDENTITY / DAYS PARTITION LAYOUT ([[TxnTable.PartitionSpec]]):
  * every data file carries its single partition value in the manifest
  * (`pv`), equality/IN scans prune to the named partitions' files,
  * and `DELETE WHERE <partition> = …` commits as an O(metadata)
  * manifest operation ([[TxnTable.dropPartitions]]) — kept files
  * carry forward VERBATIM, dropped files are never read. Also pins
  * the degradation contract: layout-unaware files (no pv) are kept
  * conservatively by scans and rewritten SCOPED by partition drops.
  */
class IdentityPartitionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // the SHOW PARTITIONS / OPTIMIZE tests need the injected parser,
    // which applies only at session CONSTRUCTION (SqlMaintenanceSpec's
    // rebuild pattern): drop a shared session built without it
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

  private def freshRoot(): String =
    Files.createTempDirectory("graft_idpart").toString

  private def cat(root: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set(s"spark.sql.catalog.$name", "graft.table.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse",
      p.getParent.toString)
    s"$name.`${p.getName}`"
  }

  private def statusDf(lo: Int, hi: Int) = {
    import spark.implicits._
    spark.range(lo, hi).select(col("id").as("k"),
      when(col("id") % 3 === 0, "A")
        .when(col("id") % 3 === 1, "B").otherwise("C").as("st"),
      (col("id") * 7 % 11).cast("double").as("v"))
  }

  private def latest(root: String): TxnTable.Manifest =
    TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)

  test("every file written through create/append carries its single " +
      "partition value; snapshot round-trips") {
    val root = freshRoot()
    TxnTable.create(spark, root, statusDf(0, 90), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    TxnTable.append(spark, root, statusDf(90, 120), Seq("k"))
    val m = latest(root)
    assert(m.files.nonEmpty)
    assert(m.files.filter(_.rows > 0).forall(_.pv.isDefined),
      s"pv missing on ${m.files.filterNot(_.pv.isDefined)}")
    assert(m.files.flatMap(_.pv).toSet == Set("A", "B", "C"))
    // every file is genuinely single-valued
    assert(TxnTable.snapshot(spark, root).count() == 120)
    val perPart = TxnTable.snapshot(spark, root)
      .groupBy("st").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perPart == Map("A" -> 40L, "B" -> 40L, "C" -> 40L))
  }

  test("equality and IN probes on the partition column prune the " +
      "planned file set to the named partitions") {
    val root = freshRoot()
    TxnTable.create(spark, root, statusDf(0, 90), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    TxnTable.append(spark, root, statusDf(90, 120), Seq("k"))
    val m = latest(root)
    val schema = StructType.fromDDL(m.schemaDdl)
    def planned(fs: Array[sources.Filter]): Seq[String] = {
      val b = new GraftScanBuilder(root, schema)
      b.pushFilters(fs)
      b.build().asInstanceOf[GraftScan].planInputPartitions()
        .map(_.asInstanceOf[GraftInputPartition].relPath).toSeq
    }
    val all = planned(Array.empty)
    val eq = planned(Array(sources.EqualTo("st", "A")))
    val in = planned(Array(sources.In("st", Array("A", "B"))))
    val aFiles = m.files.filter(_.pv.contains("A")).map(_.path)
    assert(eq.toSet == aFiles.toSet,
      s"expected exactly partition A's files, got $eq of $all")
    assert(in.toSet ==
      m.files.filter(_.pv.exists(Set("A", "B"))).map(_.path).toSet)
    assert(all.size > eq.size && in.size > eq.size)
    // pruning never drops rows the predicate selects
    assert(TxnTable.snapshot(spark, root)
      .filter(col("st") === "A").count() == 40)
  }

  test("dropPartitions is O(metadata): kept files carry forward " +
      "verbatim, dropped files leave without being read") {
    val root = freshRoot()
    TxnTable.create(spark, root, statusDf(0, 90), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    val before = latest(root)
    val keptBefore = before.files.filterNot(_.pv.contains("B"))
    val v = TxnTable.dropPartitions(spark, root, Seq("B"))
    val after = latest(root)
    assert(after.version == v && after.op == "drop-partition")
    // VERBATIM carry: identical entries, not just same paths
    assert(after.files.toSet == keptBefore.toSet)
    assert(TxnTable.snapshot(spark, root)
      .filter(col("st") === "B").count() == 0)
    assert(TxnTable.snapshot(spark, root).count() == 60)
    // idempotent no-op: nothing matches, no new commit
    assert(TxnTable.dropPartitions(spark, root, Seq("B")) == v)
  }

  test("SQL DELETE WHERE <partition> = value routes through the " +
      "O(metadata) drop; a mixed predicate stays a rewrite") {
    val root = freshRoot()
    TxnTable.create(spark, root, statusDf(0, 90), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    val t = cat(root, "gidp")
    spark.sql(s"DELETE FROM $t WHERE st = 'C'")
    assert(latest(root).op == "drop-partition")
    assert(spark.sql(s"SELECT COUNT(*) c FROM $t").head().getLong(0)
      == 60)
    // predicate touching a non-partition column must NOT drop whole
    // partitions — it rewrites
    spark.sql(s"DELETE FROM $t WHERE st = 'A' AND k < 30")
    assert(latest(root).op == "delete")
    val left = spark.sql(
      s"SELECT st, COUNT(*) c FROM $t GROUP BY st ORDER BY st")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(left("B") == 30 && left("A") == 20 && !left.contains("C"))
  }

  test("layout-unaware files (SQL UPDATE's COW writer) degrade " +
      "gracefully: scans keep them, partition drops rewrite them " +
      "scoped — rows stay exact") {
    val root = freshRoot()
    TxnTable.create(spark, root, statusDf(0, 90), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    val t = cat(root, "gidp2")
    // COW rewrite: produces pv-less files for the touched group
    spark.sql(s"UPDATE $t SET v = v + 100 WHERE k = 6")
    val m = latest(root)
    assert(m.files.exists(f => f.pv.isEmpty && f.rows > 0),
      "expected the COW writer to produce layout-unaware files")
    // equality probe still returns exact rows (unknown files kept)
    assert(spark.sql(s"SELECT COUNT(*) c FROM $t WHERE st = 'B'")
      .head().getLong(0) == 30)
    // partition drop: B's known files leave via metadata; the unknown
    // files are rewritten scoped; result is exact
    TxnTable.dropPartitions(spark, root, Seq("B"))
    val after = TxnTable.snapshot(spark, root)
    assert(after.filter(col("st") === "B").count() == 0)
    assert(after.count() == 60)
    assert(after.filter(col("k") === 6).head().getDouble(2) > 100,
      "the COW update must survive the scoped rewrite")
    // the scoped rewrite's replacement files are partition-aware again
    assert(latest(root).files.filter(_.rows > 0).forall(_.pv.isDefined))
  }

  test("RANGE RETENTION: DELETE WHERE <partition> < bound commits as " +
      "an O(metadata) partition drop with typed comparison (ints " +
      "compare numerically, not lexically)") {
    val root = freshRoot()
    // identity partitioning on an INT-like column: day index 0..11
    val df = spark.range(0, 120).select(col("id").as("k"),
      (col("id") % 12).as("day"),
      (col("id") % 5).cast("double").as("v"))
    TxnTable.create(spark, root, df, Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("day")))
    val t = cat(root, "gret")
    val before = latest(root)
    val keepFiles = before.files.filter(_.pv.exists(_.toLong >= 10))
    // retention: drop everything older than day 10 — 10 and 11 stay.
    // Lexical pv compare would wrongly keep day "2".."9" (> "10");
    // the typed path must not.
    spark.sql(s"DELETE FROM $t WHERE day < 10")
    val after = latest(root)
    assert(after.op == "drop-partition",
      s"range retention must be a metadata drop, got ${after.op}")
    assert(after.files.toSet == keepFiles.toSet,
      "surviving partitions' files must carry verbatim")
    val left = TxnTable.snapshot(spark, root)
    assert(left.count() == 20)
    assert(left.agg(min(col("day"))).head().getLong(0) == 10)
    // mixed range + equality conjunction on the partition column also
    // resolves to a metadata drop
    spark.sql(s"DELETE FROM $t WHERE day >= 10 AND day IN (10, 11, 12)")
    assert(latest(root).op == "drop-partition")
    assert(TxnTable.snapshot(spark, root).count() == 0)
  }

  test("IS [NOT] NULL conjuncts stay on the fast path: the NULL " +
      "partition drops as metadata, and range+IS NOT NULL is still " +
      "a metadata drop") {
    val root = freshRoot()
    val df = spark.range(0, 60).select(col("id").as("k"),
      when(col("id") % 3 === 0, lit(null).cast("string"))
        .when(col("id") % 3 === 1, "B").otherwise("C").as("st"),
      (col("id") % 5).cast("double").as("v"))
    TxnTable.create(spark, root, df, Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    val t = cat(root, "gnul")
    assert(latest(root).files.filter(_.rows > 0)
      .exists(_.pv.contains("NULL")),
      "the null partition must carry the sentinel pv")
    // range + IS NOT NULL: still a metadata drop; nulls survive a
    // range predicate by SQL semantics
    spark.sql(s"DELETE FROM $t WHERE st IS NOT NULL AND st >= 'C'")
    assert(latest(root).op == "drop-partition")
    assert(TxnTable.snapshot(spark, root).count() == 40)
    // IS NULL drops exactly the null partition — as metadata
    spark.sql(s"DELETE FROM $t WHERE st IS NULL")
    assert(latest(root).op == "drop-partition")
    val left = TxnTable.snapshot(spark, root)
    assert(left.count() == 20)
    assert(left.filter(col("st").isNull).count() == 0)
    assert(left.filter(col("st") === "B").count() == 20)
  }

  test("partition values with URI-escapable characters (spaces) keep " +
      "full manifest entries — rows/stats/pv survive the encoded " +
      "input_file_name round-trip, and their partition still drops") {
    val root = freshRoot()
    val df = spark.range(0, 60).select(col("id").as("k"),
      when(col("id") % 3 === 0, "NOT SPECIFIED")
        .when(col("id") % 3 === 1, "HIGH %20 TRICKY")
        .otherwise("LOW").as("pri"),
      (col("id") % 5).cast("double").as("v"))
    TxnTable.create(spark, root, df, Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("pri")))
    val m = latest(root)
    assert(m.files.filter(_.rows > 0).forall(f =>
      f.pv.isDefined && f.stats.contains("k")),
      s"every data file must carry pv+stats, got ${m.files}")
    assert(m.files.map(_.rows).sum == 60)
    assert(m.files.flatMap(_.pv).toSet ==
      Set("NOT SPECIFIED", "HIGH %20 TRICKY", "LOW"))
    // the spaced partition drops as metadata like any other
    val keep = m.files.filterNot(_.pv.contains("NOT SPECIFIED"))
    TxnTable.dropPartitions(spark, root, Seq("NOT SPECIFIED"))
    val after = latest(root)
    assert(after.op == "drop-partition" &&
      after.files.toSet == keep.toSet)
    assert(TxnTable.snapshot(spark, root).count() == 40)
    assert(TxnTable.snapshot(spark, root)
      .filter(col("pri") === "NOT SPECIFIED").count() == 0)
  }

  test("days(ts) partitioning: per-file pv is the UTC day; DELETE of " +
      "one day via dropPartitions") {
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try {
      val root = freshRoot()
      val df = spark.range(0, 96).select(col("id").as("k"),
        timestamp_seconds(lit(1700000000L) + col("id") * 3600)
          .as("ts"),
        (col("id") % 5).cast("double").as("v"))
      TxnTable.create(spark, root, df, Seq("k"),
        partitionBy = Some(TxnTable.PartitionSpec("ts", "days")))
      val m = latest(root)
      assert(m.files.filter(_.rows > 0).forall(_.pv.isDefined))
      val days = m.files.flatMap(_.pv).distinct.sorted
      assert(days.size == 5, s"96 hourly rows span 5 UTC days: $days")
      val dropDay = days.head
      TxnTable.dropPartitions(spark, root, Seq(dropDay))
      val snap = TxnTable.snapshot(spark, root)
      assert(snap.filter(to_date(col("ts")).cast("string") === dropDay)
        .count() == 0)
      assert(snap.count() ==
        96 - df.filter(to_date(col("ts")).cast("string") === dropDay)
          .count())
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("catalog DDL: CREATE TABLE PARTITIONED BY (col), INSERT " +
      "through SQL keeps the layout, graft_files surfaces pv, " +
      "rename/drop of the partition column are refused") {
    val root = freshRoot()
    val t = cat(root, "gidp3")
    spark.sql(s"CREATE TABLE $t (k BIGINT, st STRING, v DOUBLE) " +
      "PARTITIONED BY (st) TBLPROPERTIES ('statsCols'='k')")
    assert(TxnTable.partitionSpec(
      spark.sparkContext.hadoopConfiguration, root)
      .contains(TxnTable.PartitionSpec("st", "identity")))
    statusDf(0, 60).createOrReplaceTempView("idp_src")
    spark.sql(s"INSERT INTO $t SELECT k, st, v FROM idp_src")
    val m = latest(root)
    assert(m.files.filter(_.rows > 0).forall(_.pv.isDefined),
      "SQL INSERT must write partition-aware files")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t RENAME COLUMN st TO status")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t DROP COLUMN st")
    }
    // composed layouts are allowed on DISJOINT columns (r16 — see
    // PartBucketSpec); the same column in both roles stays refused
    intercept[Exception] {
      TxnTable.create(spark, freshRoot(), statusDf(0, 10),
        bucketBy = Some(TxnTable.BucketSpec("st", 4)),
        partitionBy = Some(TxnTable.PartitionSpec("st")))
    }
  }

  // ---- multi-column layouts (tuple pv) -------------------------------

  private def multiSpec(cs: (String, String)*): TxnTable.PartitionSpec =
    TxnTable.PartitionSpec(cs.head._1, cs.head._2,
      Some(cs.map(_._1)), Some(cs.map(_._2)))

  private def twoColDf(lo: Int, hi: Int) = {
    import spark.implicits._
    spark.range(lo, hi).select(col("id").as("k"),
      when(col("id") % 3 === 0, "A")
        .when(col("id") % 3 === 1, "B").otherwise("C").as("st"),
      (col("id") % 2).cast("int").as("g"),
      (col("id") * 7 % 11).cast("double").as("v"))
  }

  test("multi-column layout: every file carries a decodable pv TUPLE; " +
      "probes on either component (and both) prune per-component") {
    val root = freshRoot()
    TxnTable.create(spark, root, twoColDf(0, 90), Seq("k"),
      partitionBy = Some(multiSpec("st" -> "identity", "g" -> "identity")))
    TxnTable.append(spark, root, twoColDf(90, 120), Seq("k"))
    val m = latest(root)
    assert(m.files.filter(_.rows > 0).forall(_.pv.isDefined))
    val tuples = m.files.flatMap(_.pv)
      .flatMap(pv => TxnTable.pvComponents(pv, 2)).toSet
    assert(tuples == (for (s <- Set("A", "B", "C"); g <- Set("0", "1"))
      yield Seq(s, g)))
    val schema = StructType.fromDDL(m.schemaDdl)
    def planned(fs: Array[sources.Filter]): Set[String] = {
      val b = new GraftScanBuilder(root, schema)
      b.pushFilters(fs)
      b.build().asInstanceOf[GraftScan].planInputPartitions()
        .map(_.asInstanceOf[GraftInputPartition].relPath).toSet
    }
    def files(p: Seq[String] => Boolean): Set[String] =
      m.files.filter(_.pv.flatMap(TxnTable.pvComponents(_, 2)).exists(p))
        .map(_.path).toSet
    assert(planned(Array(sources.EqualTo("st", "A"))) ==
      files(t => t.head == "A"))
    assert(planned(Array(sources.EqualTo("g", 1))) ==
      files(t => t(1) == "1"))
    assert(planned(Array(sources.EqualTo("st", "A"),
      sources.EqualTo("g", 1))) == files(t => t == Seq("A", "1")))
    // correctness under pruning
    assert(TxnTable.snapshot(spark, root)
      .filter(col("st") === "A" && col("g") === 1).count() ==
      twoColDf(0, 120).filter(col("st") === "A" && col("g") === 1)
        .count())
  }

  test("multi-column layout: DELETE on a component subset commits as " +
      "an O(metadata) drop; ranges and full tuples too; mixed " +
      "predicates rewrite") {
    val root = freshRoot()
    TxnTable.create(spark, root, twoColDf(0, 90), Seq("k"),
      partitionBy = Some(multiSpec("st" -> "identity", "g" -> "identity")))
    val t = cat(root, "gmc1")
    val keep = latest(root).files.filterNot(
      _.pv.flatMap(TxnTable.pvComponents(_, 2)).exists(_.head == "C"))
    // subset conjunct (st only): whole metadata drop, g unconstrained
    spark.sql(s"DELETE FROM $t WHERE st = 'C'")
    assert(latest(root).op == "drop-partition")
    assert(latest(root).files.toSet == keep.toSet)
    // both components constrained: still metadata
    spark.sql(s"DELETE FROM $t WHERE st = 'A' AND g = 0")
    assert(latest(root).op == "drop-partition")
    assert(TxnTable.snapshot(spark, root)
      .filter(col("st") === "A" && col("g") === 0).count() == 0)
    // range on the int component: typed comparison
    spark.sql(s"DELETE FROM $t WHERE g < 1")
    assert(latest(root).op == "drop-partition")
    assert(TxnTable.snapshot(spark, root).filter(col("g") === 0)
      .count() == 0)
    // non-partition column in the predicate: rewrite, exact rows
    spark.sql(s"DELETE FROM $t WHERE st = 'B' AND k < 30")
    assert(latest(root).op == "delete")
    assert(TxnTable.snapshot(spark, root)
      .filter(col("st") === "B" && col("k") < 30).count() == 0)
  }

  test("multi-column layout: values containing '/' and '%' escape " +
      "into the tuple pv and round-trip through prune + drop") {
    import spark.implicits._
    val root = freshRoot()
    val df = spark.range(0, 40).select(col("id").as("k"),
      when(col("id") % 2 === 0, "a/b").otherwise("c%2Fd").as("seg"),
      (col("id") % 2).cast("int").as("g"))
    TxnTable.create(spark, root, df, Seq("k"),
      partitionBy = Some(multiSpec("seg" -> "identity", "g" -> "identity")))
    val m = latest(root)
    val tuples = m.files.flatMap(_.pv)
      .flatMap(pv => TxnTable.pvComponents(pv, 2)).map(_.head).toSet
    assert(tuples == Set("a/b", "c%2Fd"),
      s"escape round-trip broke: $tuples")
    val t = cat(root, "gmc2")
    spark.sql(s"DELETE FROM $t WHERE seg = 'a/b'")
    assert(latest(root).op == "drop-partition")
    assert(TxnTable.snapshot(spark, root).count() == 20)
    assert(TxnTable.snapshot(spark, root)
      .filter(col("seg") === "c%2Fd").count() == 20)
  }

  test("multi-column catalog DDL: PARTITIONED BY (days(ts), st) " +
      "creates the composite layout; SHOW PARTITIONS lists tuples; " +
      "OPTIMIZE WHERE scopes to one component") {
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try {
      import spark.implicits._
      val root = freshRoot()
      val t = cat(root, "gmc3")
      spark.sql(s"CREATE TABLE $t (k BIGINT, ts TIMESTAMP, st STRING) " +
        "PARTITIONED BY (days(ts), st) TBLPROPERTIES ('statsCols'='k')")
      val spec = TxnTable.partitionSpec(
        spark.sparkContext.hadoopConfiguration, root).get
      assert(TxnTable.partCompsOf(spec) == Seq(
        TxnTable.PartitionSpec("ts", "days"),
        TxnTable.PartitionSpec("st", "identity")))
      val df = spark.range(0, 48).select(col("id").as("k"),
        concat(lit("2026-03-0"), (col("id") % 3 + 1).cast("string"))
          .cast("timestamp").as("ts"),
        when(col("id") % 2 === 0, "x").otherwise("y").as("st"))
      df.createOrReplaceTempView("gmc3_src")
      spark.sql(s"INSERT INTO $t SELECT k, ts, st FROM gmc3_src")
      spark.sql(s"INSERT INTO $t SELECT k + 100, ts, st FROM gmc3_src")
      val parts = spark.sql(s"SHOW PARTITIONS $t").collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(parts.keySet == (for (d <- Set("1", "2", "3");
        s <- Set("x", "y")) yield s"2026-03-0$d/$s"))
      assert(parts.values.sum == 96)
      // partition-scoped compaction on ONE component: each day-03/x|y
      // partition had 2 files (two inserts) -> 1 after; others keep
      // their debris
      val before = latest(root)
      spark.sql(s"OPTIMIZE $t WHERE st = 'x'")
      val after = latest(root)
      def nFiles(pred: Seq[String] => Boolean, m: TxnTable.Manifest) =
        m.files.filter(_.pv.flatMap(TxnTable.pvComponents(_, 2))
          .exists(pred)).size
      assert(nFiles(_.last == "x", before) == 6 &&
        nFiles(_.last == "x", after) == 3,
        "OPTIMIZE WHERE st='x' must bin-pack exactly the x partitions")
      assert(nFiles(_.last == "y", after) == 6,
        "y partitions' debris must carry verbatim")
      // retention across the days component: range drop is metadata
      spark.sql(s"DELETE FROM $t WHERE st = 'y'")
      assert(latest(root).op == "drop-partition")
      assert(spark.sql(s"SELECT COUNT(*) c FROM $t").head().getLong(0)
        == 48)
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("partition-spec EVOLUTION: the new era stamps generation-tagged " +
      "pvs, the old era's stamps are never misread (the st->g aliasing " +
      "trap), drops rewrite the old era scoped, OPTIMIZE heals it") {
    val root = freshRoot()
    TxnTable.create(spark, root, twoColDf(0, 60), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    // evolve identity(st) -> identity(g) via SQL; atomic, zero data IO
    val t = cat(root, "gevo1")
    val r = spark.sql(s"ALTER TABLE $t SET PARTITIONED BY (g)").collect()
    assert(r.head.getString(0) == "evolve-partition" &&
      r.head.getLong(1) == 1L)
    assert(TxnTable.partitionSpec(
      spark.sparkContext.hadoopConfiguration, root)
      .contains(TxnTable.PartitionSpec("g", "identity", gen = Some(1))))
    TxnTable.append(spark, root, twoColDf(60, 120), Seq("k"))
    val m = latest(root)
    val (newEra, oldEra) = m.files.partition(_.pvg.contains(1))
    assert(oldEra.nonEmpty && newEra.nonEmpty)
    assert(oldEra.forall(f => f.pv.isDefined && f.pvg.isEmpty),
      "old-era files keep their stamps, just untrusted")
    assert(newEra.flatMap(_.pv).toSet == Set("0", "1"))
    // the aliasing trap: WITHOUT generations, EqualTo(g, 1) would
    // prune old-era files (pv 'A'/'B'/'C' not in {'1'}) and LOSE rows
    val schema = StructType.fromDDL(m.schemaDdl)
    def planned(fs: Array[sources.Filter]): Set[String] = {
      val b = new GraftScanBuilder(root, schema)
      b.pushFilters(fs)
      b.build().asInstanceOf[GraftScan].planInputPartitions()
        .map(_.asInstanceOf[GraftInputPartition].relPath).toSet
    }
    val g1 = planned(Array(sources.EqualTo("g", 1)))
    assert(oldEra.map(_.path).toSet.subsetOf(g1),
      "old-era files must be kept conservatively under the new spec")
    assert(g1.intersect(newEra.map(_.path).toSet) ==
      newEra.filter(_.pv.contains("1")).map(_.path).toSet,
      "new-era files must prune exactly on the new component")
    assert(TxnTable.snapshot(spark, root).filter(col("g") === 1)
      .count() == twoColDf(0, 120).filter(col("g") === 1).count())
    // DELETE on the NEW partition column: new era drops as metadata,
    // old era rewrites scoped — and comes out re-stamped gen 1
    spark.sql(s"DELETE FROM $t WHERE g = 0")
    val after = latest(root)
    assert(after.op == "drop-partition")
    assert(TxnTable.snapshot(spark, root).filter(col("g") === 0)
      .count() == 0)
    assert(TxnTable.snapshot(spark, root).count() ==
      twoColDf(0, 120).filter(col("g") === 1).count())
    assert(after.files.filter(_.rows > 0).forall(_.pvg.contains(1)),
      "the scoped rewrite must heal old-era files into the new layout")
    // SHOW PARTITIONS now lists only the new-era value space
    val parts = spark.sql(s"SHOW PARTITIONS $t").collect()
      .map(_.getString(0)).toSet
    assert(parts == Set("1"))
  }

  test("partition-spec EVOLUTION to a multi-column spec; prior-era " +
      "debris groups under NULL in SHOW PARTITIONS until OPTIMIZE " +
      "heals it era by era") {
    val root = freshRoot()
    TxnTable.create(spark, root, twoColDf(0, 60), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    val t = cat(root, "gevo2")
    spark.sql(s"ALTER TABLE $t SET PARTITIONED BY (st, g)")
    TxnTable.append(spark, root, twoColDf(60, 90), Seq("k"))
    val listed = spark.sql(s"SHOW PARTITIONS $t").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    assert(listed.contains(None), "old era must surface as NULL debris")
    assert(listed.keys.flatten.toSet ==
      (for (s <- Set("A", "B", "C"); g <- Set("0", "1"))
        yield s"$s/$g"))
    // OPTIMIZE ... WHERE heals the old era into tuple partitions
    spark.sql(s"OPTIMIZE $t WHERE st = 'A'")
    val healed = latest(root)
    assert(healed.files.filter(_.rows > 0).forall(_.pvg.contains(1)),
      "partition-scoped compaction must heal ALL prior-era files")
    assert(TxnTable.snapshot(spark, root).count() == 90)
    // and the listing is now fully tuple-partitioned
    assert(spark.sql(s"SHOW PARTITIONS $t").collect()
      .forall(_.getString(0) != null))
  }

  test("time travel ACROSS a partition-spec evolution reads exact rows " +
      "— pre-evolution versions' old-era stamps are never pruned in " +
      "the new spec's value space") {
    val root = freshRoot()
    TxnTable.create(spark, root, twoColDf(0, 60), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    val t = cat(root, "gevo3")
    spark.sql(s"ALTER TABLE $t SET PARTITIONED BY (g)")
    TxnTable.append(spark, root, twoColDf(60, 90), Seq("k"))
    // pinned pre-evolution version, probed on the NEW partition column:
    // version 0's files carry 'A'/'B'/'C' stamps (gen 0); under the
    // evolved sidecar (gen 1) they must read conservatively, not prune
    val v0 = spark.read.format("graft.table.GraftTableProvider")
      .option("versionAsOf", "0").load(root)
    assert(v0.count() == 60)
    assert(v0.filter(col("g") === 1).count() ==
      twoColDf(0, 60).filter(col("g") === 1).count())
    // pinned pre-evolution version probed on the OLD partition column
    // also stays exact (its stamps are simply untrusted now)
    assert(v0.filter(col("st") === "A").count() ==
      twoColDf(0, 60).filter(col("st") === "A").count())
    // current version: both eras, new-era pruning, exact rows
    assert(TxnTable.snapshot(spark, root).filter(col("g") === 0)
      .count() == twoColDf(0, 90).filter(col("g") === 0).count())
  }

  test("DYNAMIC PARTITION OVERWRITE: the backfill batch replaces " +
      "exactly its partitions (untouched files carry VERBATIM), " +
      "straggler files rewrite scoped, empty batch is a no-op") {
    val root = freshRoot()
    TxnTable.create(spark, root, statusDf(0, 90), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    val before = latest(root)
    val untouched = before.files.filterNot(_.pv.contains("B"))
    // backfill partition B with a corrected slice (30 -> 10 rows)
    val backfill = statusDf(0, 90).filter(col("st") === "B" && col("k") < 30)
      .withColumn("v", col("v") + 1000)
    val v = TxnTable.overwritePartitions(spark, root, backfill, Seq("k"))
    val after = latest(root)
    assert(after.version == v && after.op == "overwrite-partitions")
    assert(untouched.forall(after.files.contains),
      "untouched partitions' files must carry verbatim")
    val snap = TxnTable.snapshot(spark, root)
    assert(snap.count() == 70) // 60 untouched + 10 backfilled
    assert(snap.filter(col("st") === "B").count() == 10)
    assert(snap.filter(col("st") === "B").agg(min(col("v"))).head()
      .getDouble(0) >= 1000, "partition B must hold ONLY the backfill")
    // the write-option surface routes the same way
    statusDf(200, 230).filter(col("st") === "C")
      .write.format("graft.table.GraftTableProvider")
      .mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .option("statsCols", "k").save(root)
    assert(latest(root).op == "overwrite-partitions")
    val snap2 = TxnTable.snapshot(spark, root)
    assert(snap2.filter(col("st") === "C").count() ==
      statusDf(200, 230).filter(col("st") === "C").count())
    assert(snap2.filter(col("st") === "A").count() == 30,
      "partition A must be untouched by both dynamic overwrites")
    // empty incoming batch: no partitions named, no commit
    val vBefore = latest(root).version
    assert(TxnTable.overwritePartitions(spark, root,
      statusDf(0, 90).filter(col("k") < 0)) == vBefore)
    // straggler healing: a COW UPDATE leaves pv-less files; a dynamic
    // overwrite of B must remove B's rows from them scoped, keep others
    val t = cat(root, "gdpo")
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE k = 3") // touches A's group
    assert(latest(root).files.exists(f => f.pv.isEmpty && f.rows > 0))
    TxnTable.overwritePartitions(spark, root,
      statusDf(0, 9).filter(col("st") === "B"), Seq("k"))
    val snap3 = TxnTable.snapshot(spark, root)
    assert(snap3.filter(col("st") === "B").count() == 3) // k=1,4,7
    assert(snap3.filter(col("st") === "A").count() == 30)
    assert(snap3.filter(col("k") === 3).head().getDouble(2) > 10,
      "the COW update must survive the scoped straggler rewrite")
  }

  test("ALTER ... SET PARTITIONED BY accepts days(ts) and tuple " +
      "(days(ts), col) specs — the transform parens must not truncate " +
      "the component list (ADVICE r15)") {
    val root = freshRoot()
    val df = statusDf(0, 60).withColumn("ts", expr(
      "timestamp'2026-03-01 00:00:00' + " +
        "make_interval(0, 0, 0, CAST(k % 3 AS INT))"))
    TxnTable.create(spark, root, df, Seq("k"))
    val t = cat(root, "gdays1")
    // single days() component — previously fell through to Spark's
    // parser and threw ParseException
    val r1 = spark.sql(s"ALTER TABLE $t SET PARTITIONED BY (days(ts))")
      .collect()
    assert(r1.head.getString(0) == "evolve-partition" &&
      r1.head.getLong(1) == 1L)
    val conf = spark.sparkContext.hadoopConfiguration
    assert(TxnTable.partitionSpec(conf, root).contains(
      TxnTable.PartitionSpec("ts", "days", gen = Some(1))))
    // writes now stamp day pvs and day drops are O(metadata)
    TxnTable.append(spark, root, df.withColumn("k", col("k") + 100),
      Seq("k"))
    assert(latest(root).files.filter(_.pvg.contains(1))
      .flatMap(_.pv).toSet ==
      Set("2026-03-01", "2026-03-02", "2026-03-03"))
    // tuple spec with a transform component
    val r2 = spark.sql(s"ALTER TABLE $t SET PARTITIONED BY (days(ts), st)")
      .collect()
    assert(r2.head.getLong(1) == 2L)
    assert(TxnTable.partitionSpec(conf, root).contains(
      TxnTable.PartitionSpec("ts", "days",
        Some(Seq("ts", "st")), Some(Seq("days", "identity")),
        gen = Some(2))))
  }

  test("generation-collision safety: pv stamps carry the spec " +
      "fingerprint, so a same-generation DIFFERENT spec (the lost " +
      "evolution race) never trusts them (ADVICE r15)") {
    val root = freshRoot()
    TxnTable.create(spark, root, statusDf(0, 60), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    val gen = TxnTable.evolvePartitionSpec(spark, root,
      TxnTable.PartitionSpec("k"))
    assert(gen == 1)
    TxnTable.append(spark, root, statusDf(60, 70), Seq("k"))
    val conf = spark.sparkContext.hadoopConfiguration
    val installed = TxnTable.partitionSpec(conf, root).get
    val stamped = latest(root).files.filter(_.pvg.contains(1))
    assert(stamped.nonEmpty && stamped.forall(f =>
      f.pvf.contains(TxnTable.specFingerprint(installed))))
    assert(stamped.forall(f => TxnTable.pvCurrent(f, installed)))
    // simulate the LOSING race: a concurrent evolution to a different
    // column also installed generation 1 and won the sidecar rename —
    // the files stamped above now carry pvs in the WRONG value space
    val winner = TxnTable.PartitionSpec("st", gen = Some(1))
    val p = new org.apache.hadoop.fs.Path(s"$root/_log",
      "_partition.json")
    val f = p.getFileSystem(conf)
    val out = f.create(p, true)
    try out.write(org.json4s.jackson.Serialization.write(winner)(
      org.json4s.jackson.Serialization.formats(org.json4s.NoTypeHints))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // gen matches (the collision!) but the fingerprint does not: the
    // stamps must be UNTRUSTED — conservative reads, scoped rewrites
    assert(stamped.forall(f => !TxnTable.pvCurrent(f, winner)),
      "k-space pvs must never be read as st-space partitions")
    // functional: a snapshot filter on st still returns exact rows
    // (k-stamped files are scanned conservatively, never pruned away)
    assert(TxnTable.snapshot(spark, root)
      .filter(col("st") === "A").count() ==
      statusDf(0, 70).filter(col("st") === "A").count())
  }

  test("overwritePartitions refuses a batch missing the partition " +
      "column(s) with a named error, like append degrades (ADVICE r15)") {
    val root = freshRoot()
    TxnTable.create(spark, root, statusDf(0, 30), Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st")))
    val e = intercept[IllegalArgumentException] {
      TxnTable.overwritePartitions(spark, root,
        statusDf(0, 10).drop("st"))
    }
    assert(e.getMessage.contains("lacks partition column(s) st"),
      s"unexpected message: ${e.getMessage}")
  }
}
