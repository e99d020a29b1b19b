package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.table.TxnTable

/** CHANGE-DATA-FEED streaming read (`readChangeFeed=true`): the stream
  * rides THROUGH rewrites via write-time-materialized change rows
  * ([[TxnTable.enableCdf]]), compaction emits nothing, and rewrites
  * without change data fail loudly.
  */
class TableCdfStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val Fmt = "graft.table.GraftTableProvider"

  private def freshRoot(): String =
    Files.createTempDirectory("graft_cdftbl").toString

  private def kv(rows: (Long, Double)*): DataFrame =
    rows.toDF("k", "score")

  private def drainCdf(root: String, ckpt: String, out: String,
      startingVersion: Option[Long] = None): Unit = {
    val rd = spark.readStream.format(Fmt)
      .option("readChangeFeed", "true")
    val q = startingVersion.fold(rd)(v =>
        rd.option("startingVersion", v.toString))
      .load(root)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(out); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
  }

  private def rows(out: String): Seq[(Long, Double, String, Long)] =
    spark.read.parquet(out)
      .select("k", "score", "_change_type", "_commit_version")
      .as[(Long, Double, String, Long)].collect().toSeq
      .sortBy(r => (r._4, r._3, r._1))

  /** v0 create (1,2) → CDF on → v1 append (3) → v2 mergeFull
    * (update 2, insert 4, delete-by-absence 1) → v3 compact →
    * v4 append (5).
    */
  private def builtHistory(): String = {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)))
    TxnTable.enableCdf(spark, root, Seq("k"))
    TxnTable.append(spark, root, kv((3L, 3.0)))
    TxnTable.mergeFull(spark, root, kv((2L, 20.0), (4L, 4.0)),
      Seq("k"), deleteWhen = org.apache.spark.sql.functions.col("k") === 1L)
    TxnTable.compact(spark, root)
    TxnTable.append(spark, root, kv((5L, 5.0)))
    root
  }

  test("the CDF stream crosses a mergeFull: exact change images per " +
      "commit, and the compact commit emits NOTHING") {
    val root = builtHistory()
    val ckpt = Files.createTempDirectory("graft_cdf_ck").toString
    val out = Files.createTempDirectory("graft_cdf_out").toString
    drainCdf(root, ckpt, out)
    assert(rows(out) == Seq(
      (1L, 1.0, "insert", 0L),
      (2L, 2.0, "insert", 0L),
      (3L, 3.0, "insert", 1L),
      (1L, 1.0, "delete", 2L),
      (4L, 4.0, "insert", 2L),
      (2L, 20.0, "update_postimage", 2L),
      (2L, 2.0, "update_preimage", 2L),
      (5L, 5.0, "insert", 4L))) // no v3 rows: compact has no logical change
    // the merge version's stream rows hash-match the batch CDF replay
    val streamed = rows(out).filter(_._4 == 2L).map(r => (r._1, r._2, r._3))
    val batch = TxnTable.cdf(spark, root, 1L, 2L, Seq("k"))
      .as[(Long, Double, String)].collect().toSeq.sortBy(r => (r._3, r._1))
    assert(streamed.sortBy(r => (r._3, r._1)) == batch)
  }

  test("exactly-once across a restart: a drain checkpointed BEFORE a " +
      "rewrite picks up exactly the rewrite's change rows after it") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)))
    TxnTable.enableCdf(spark, root, Seq("k"))
    val ckpt = Files.createTempDirectory("graft_cdf_ck").toString
    val out = Files.createTempDirectory("graft_cdf_out").toString
    drainCdf(root, ckpt, out)
    assert(rows(out).map(_._3) == Seq("insert", "insert"))
    TxnTable.delete(spark, root, Seq(Tuple1(1L)).toDF("k"), Seq("k"))
    drainCdf(root, ckpt, out) // same checkpoint: only v1's changes
    assert(rows(out) == Seq(
      (1L, 1.0, "insert", 0L),
      (2L, 2.0, "insert", 0L),
      (1L, 1.0, "delete", 1L)))
  }

  test("a rewrite committed without change data fails the CDF stream " +
      "loudly instead of silently skipping") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)))
    TxnTable.overwrite(spark, root, kv((1L, 10.0))) // CDF not enabled
    val ckpt = Files.createTempDirectory("graft_cdf_ck").toString
    val out = Files.createTempDirectory("graft_cdf_out").toString
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainCdf(root, ckpt, out)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("no change data")))
  }

  test("startingVersion is inclusive in CDF mode too: changes from N " +
      "on, no earlier history replayed") {
    val root = builtHistory()
    val ckpt = Files.createTempDirectory("graft_cdf_ck").toString
    val out = Files.createTempDirectory("graft_cdf_out").toString
    drainCdf(root, ckpt, out, startingVersion = Some(2L))
    assert(rows(out).map(r => (r._1, r._3, r._4)) == Seq(
      (1L, "delete", 2L), (4L, "insert", 2L),
      (2L, "update_postimage", 2L), (2L, "update_preimage", 2L),
      (5L, "insert", 4L)))
  }

  test("RESTORE: snapshot equals the target version, history keeps all " +
      "commits, governance does not regress, and under CDF the restore " +
      "streams its deletes/updates as change rows") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)))
    TxnTable.enableCdf(spark, root, Seq("k"))
    TxnTable.append(spark, root, kv((3L, 3.0)))   // v1
    TxnTable.merge(spark, root, kv((1L, 10.0)), Seq("k")) // v2: update
    val v3 = TxnTable.restore(spark, root, 1L)     // v3: back to {1,2,3}
    assert(v3 == 3L)
    assert(TxnTable.snapshot(spark, root)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq ==
      Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    // all four commits remain; the restore is a new history entry
    assert(TxnTable.history(spark, root)
      .select("op").as[String].collect().toSeq ==
      Seq("create", "append", "merge", "restore"))
    // time travel to the in-between rewrite still works
    assert(TxnTable.snapshotAt(spark, root, 2L)
      .filter($"k" === 1L).select("score").as[Double].head() == 10.0)
    intercept[IllegalArgumentException] {
      TxnTable.restore(spark, root, 9L) // not earlier than current
    }
    // CDF: the restore emitted the 10.0 -> 1.0 update images
    val ckpt = Files.createTempDirectory("graft_cdf_ck").toString
    val out = Files.createTempDirectory("graft_cdf_out").toString
    drainCdf(root, ckpt, out, startingVersion = Some(3L))
    assert(rows(out).map(r => (r._1, r._2, r._3)) == Seq(
      (1L, 1.0, "update_postimage"), (1L, 10.0, "update_preimage")))
  }

  test("the CDF stream rides through a SQL UPDATE (row-level COW " +
      "commit materializes change rows), and vacuum reclaims only " +
      "aged-out change data") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)))
    TxnTable.enableCdf(spark, root, Seq("k"))
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set("spark.sql.catalog.gcat_cdf", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcat_cdf.warehouse",
      p.getParent.toString)
    spark.sql(s"UPDATE gcat_cdf.`${p.getName}` SET score = 99.0 WHERE k = 2")
    val ckpt = Files.createTempDirectory("graft_cdf_ck").toString
    val out = Files.createTempDirectory("graft_cdf_out").toString
    drainCdf(root, ckpt, out, startingVersion = Some(1L))
    assert(rows(out).map(r => (r._1, r._2, r._3)) == Seq(
      (2L, 99.0, "update_postimage"), (2L, 2.0, "update_preimage")))
    // v1's cdfDir is inside the retention window → vacuum keeps it;
    // after two more commits push it out, its files are reclaimed
    assert(TxnTable.vacuum(spark, root, retainLast = 2, graceMs = 0L)
      .forall(!_.startsWith("_cdf/")))
    TxnTable.append(spark, root, kv((3L, 3.0)))
    TxnTable.append(spark, root, kv((4L, 4.0)))
    val reclaimed = TxnTable.vacuum(spark, root, retainLast = 2, graceMs = 0L)
    assert(reclaimed.exists(_.startsWith("_cdf/")),
      s"aged-out change data not reclaimed: $reclaimed")
    // the live snapshot is untouched by the vacuum
    assert(TxnTable.snapshot(spark, root)
      .select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("enableCdf guards: idempotent for same keys, refuses a key " +
      "change, and a schema-changing rewrite under CDF is refused at " +
      "write time") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0)))
    TxnTable.enableCdf(spark, root, Seq("k"))
    TxnTable.enableCdf(spark, root, Seq("k")) // idempotent
    intercept[IllegalArgumentException] {
      TxnTable.enableCdf(spark, root, Seq("score"))
    }
    val e = intercept[IllegalArgumentException] {
      TxnTable.overwrite(spark, root,
        Seq((1L, 1.0, "x")).toDF("k", "score", "extra"))
    }
    assert(e.getMessage.contains("schema-changing"))
    // batch read with readChangeFeed is rejected (streaming-only option)
    intercept[Exception] {
      spark.read.format(Fmt).option("readChangeFeed", "true")
        .load(root).collect()
    }
  }
}
