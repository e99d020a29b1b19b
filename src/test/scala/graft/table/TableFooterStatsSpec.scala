package graft.table

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17 footer fast path (guide §6, r16 VERDICT item 6): for flat /
  * single-key-bucket layouts with no bloom columns and only footer-
  * exact stats types, `writeFiles` recovers the per-file manifest
  * entries (rows, min/max, null counts, bucket id) from the parquet
  * FOOTERS the write tasks already produced, instead of re-scanning
  * every written byte as a Spark job. The contract pinned here: both
  * paths emit IDENTICAL manifests — stats, null counts, zero-row
  * files, bucket ids, everything — and ineligible layouts (doubles,
  * decimals, blooms, partitioned) keep using the scan pass.
  */
class TableFooterStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("graft_fs").toString

  /** Run `build` twice — footer path on, then off — and return both
    * manifests' file entries, path-normalized (the data dir carries a
    * per-write uuid) and sorted for comparison.
    */
  private def bothPaths(build: String => Unit): (Seq[TxnTable.FileEntry], Seq[TxnTable.FileEntry]) = {
    def run(flag: String): Seq[TxnTable.FileEntry] = {
      spark.conf.set("spark.graft.write.footerStats", flag)
      try {
        val root = freshRoot()
        build(root)
        val m = TxnTable.readManifest(spark, root,
          TxnTable.versions(spark, root).max)
        m.files.map(f => f.copy(path = f.path
            .replaceAll(
              "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
              "U")                                   // writer job uuid
            .replaceAll("(data/c\\d+)-[0-9a-f]{8}", "$1-X"))) // dir uuid
          .sortBy(f => (f.path, f.rows, f.stats.toSeq.sortBy(_._1).toString))
      } finally spark.conf.set("spark.graft.write.footerStats", "true")
    }
    (run("true"), run("false"))
  }

  /** ints with nulls + negatives, a date, an instant timestamp, an
    * ALL-NULL long column — every footer-exact type and null shape.
    */
  private def mixedDf: DataFrame =
    spark.range(0, 1000).select(
      col("id").as("k"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(col("id") * 13 % 101 - 50).cast("int").as("i"),
      lit(null).cast("long").as("gone"),
      date_add(lit(java.sql.Date.valueOf("2020-01-06")),
        (col("id") % 365).cast("int")).as("d"),
      timestamp_micros(col("id") * 1000000L + 1577836800000000L).as("ts"),
      concat(lit("s"), col("id")).as("s"))

  test("footer and scan paths emit identical manifests: flat table, " +
      "int/long/date/timestamp stats, nulls and an all-null column") {
    val stats = Seq("k", "i", "gone", "d", "ts")
    val (footer, scan) = bothPaths { root =>
      TxnTable.create(spark, root, mixedDf.repartition(3), stats)
      TxnTable.append(spark, root,
        mixedDf.filter(col("k") < 100).repartition(2), stats)
    }
    assert(footer == scan)
    // sanity: the comparison is not vacuous — stats and nulls present
    val withStats = footer.filter(_.rows > 0)
    assert(withStats.nonEmpty)
    assert(withStats.forall(f => f.stats.contains("k") &&
      f.stats.contains("d") && f.stats.contains("ts")))
    assert(withStats.forall(_.nulls.exists(_.get("gone").exists(_ > 0))))
    assert(withStats.forall(!_.stats.contains("gone")),
      "all-null column must carry a null count but NO min/max box")
  }

  test("sparse flat write (rows in few of many partitions) matches on " +
      "both paths; zero-row entries, when present, carry no stats/nulls") {
    // Spark 4's FileFormatWriter skips empty tasks, so no 0-row files
    // are produced here — the footer path's rows==0 branch mirrors the
    // scan path's `case None` defensively for any producer that does
    // emit them; this fixture pins the sparse-write parity itself.
    val (footer, scan) = bothPaths { root =>
      TxnTable.create(spark, root,
        spark.range(0, 3).select(col("id").as("k")).repartition(12),
        Seq("k"))
    }
    assert(footer == scan)
    assert(footer.nonEmpty && footer.forall(_.rows <= 1L))
    assert(footer.filter(_.rows == 0L).forall(f =>
      f.stats.isEmpty && f.nulls.isEmpty))
  }

  test("single-key bucketed layout keeps its name-derived bucket ids " +
      "through the footer path") {
    val (footer, scan) = bothPaths { root =>
      TxnTable.create(spark, root,
        spark.range(0, 200).select((col("id") % 40).as("k"),
          col("id").as("v")),
        Seq("k", "v"), bucketBy = Some(TxnTable.BucketSpec("k", 4)))
    }
    assert(footer == scan)
    assert(footer.filter(_.rows > 0).forall(_.bucket.isDefined))
  }

  test("ineligible layouts fall back to the scan pass and stay " +
      "correct: double stats column, partitioned layout") {
    // double stats col: footer path must decline (NaN semantics) —
    // both runs take the scan pass, manifests still identical, and a
    // NaN-bearing file drops its stats box exactly as before
    val (f1, s1) = bothPaths { root =>
      TxnTable.create(spark, root,
        spark.range(0, 100).select(col("id").as("k"),
          when(col("id") === 50, lit(Double.NaN))
            .otherwise(col("id").cast("double") / 7).as("x"))
          .repartition(2),
        Seq("x"))
    }
    assert(f1 == s1)
    assert(f1.exists(f => f.rows > 0 && !f.stats.contains("x")),
      "the NaN file's x stats must be dropped (scan-pass semantics)")
    // partitioned layout (pv recovered from data): footer path must
    // decline; entries carry pv either way
    val (f2, s2) = bothPaths { root =>
      TxnTable.create(spark, root,
        spark.range(0, 90).select(col("id").as("k"),
          expr("substr('ABC', CAST(id % 3 AS INT) + 1, 1)").as("st")),
        Seq("k"),
        partitionBy = Some(TxnTable.PartitionSpec("st")))
    }
    assert(f2 == s2)
    assert(f2.filter(_.rows > 0).forall(_.pv.isDefined))
  }

  test("the maintained-table probe answers identically with footer " +
      "stats on (pruning consumes footer-derived boxes)") {
    spark.conf.set("spark.graft.write.footerStats", "true")
    val root = freshRoot()
    val df = spark.range(0, 4000).select(col("id").as("c_custkey"),
      (col("id") % 5).cast("int").as("seg"))
    TxnTable.create(spark, root,
      df.filter(col("c_custkey") % 4 === 0).repartition(4),
      Seq("c_custkey"))
    (1 to 3).foreach(r => TxnTable.append(spark, root,
      df.filter(col("c_custkey") % 4 === r).repartition(4),
      Seq("c_custkey")))
    val got = TxnTable.snapshotWhere(spark, root,
        col("c_custkey").between(100L, 600L))
      .agg(count(lit(1)), sum(col("c_custkey"))).head()
    assert(got.getLong(0) == 501L)
    assert(got.getLong(1) == (100L to 600L).sum)
  }
}
