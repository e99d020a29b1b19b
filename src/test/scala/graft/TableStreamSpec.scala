package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.table.{GraftMicroBatchStream, GraftStreamOffset, GraftTableProvider, TxnTable}

/** Streaming READ of the transactional table (DSv2 MICRO_BATCH_READ)
  * and wall-clock time travel: version offsets, O(new-files) batch
  * planning, exactly-once restart from the checkpoint, loud failure on
  * rewrites in range, timestampAsOf resolution.
  */
class TableStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val Fmt = "graft.table.GraftTableProvider"

  private def freshRoot(): String =
    Files.createTempDirectory("graft_stbl").toString

  private def kv(rows: (Long, Double)*): DataFrame =
    rows.toDF("k", "score")

  private def drain(root: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format(Fmt).load(root)
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

  test("stream drain delivers the full snapshot; restart picks up only " +
      "the mid-stream append (exactly once)") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)))
    TxnTable.append(spark, root, kv((3L, 3.0)))
    val ckpt = Files.createTempDirectory("graft_stbl_ck").toString
    val out = Files.createTempDirectory("graft_stbl_out").toString
    drain(root, ckpt, out)
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L))
    // mid-stream append, then a second drain from the SAME checkpoint:
    // only the new rows may arrive — a re-delivered old file breaks
    // exactly-once, a missed commit breaks completeness
    TxnTable.append(spark, root, kv((4L, 4.0), (5L, 5.0)))
    drain(root, ckpt, out)
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("batch planning is the manifest file diff: O(new files), not a " +
      "re-scan of the table") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0)))
    val m0 = GraftTableProvider.manifestFor(new Configuration(), root,
      Some(0L))
    TxnTable.append(spark, root, kv((2L, 2.0)))
    val m1 = GraftTableProvider.manifestFor(new Configuration(), root,
      Some(1L))
    val stream = new GraftMicroBatchStream(root,
      TxnTable.snapshot(spark, root).schema, -1L)
    // (0, 1]: exactly the files v1 added — the v0 files never replan
    val parts = stream.planInputPartitions(
      GraftStreamOffset(0L), GraftStreamOffset(1L))
    val newFiles = m1.files.map(_.path).toSet -- m0.files.map(_.path).toSet
    assert(parts.length == newFiles.size && newFiles.nonEmpty)
    // (-1, 1]: nothing consumed yet → the full v1 snapshot
    assert(stream.planInputPartitions(
      GraftStreamOffset(-1L), GraftStreamOffset(1L)).length ==
      m1.files.size)
    // empty range plans nothing
    assert(stream.planInputPartitions(
      GraftStreamOffset(1L), GraftStreamOffset(1L)).isEmpty)
  }

  test("a rewrite inside the planned range fails loudly") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)))
    TxnTable.append(spark, root, kv((3L, 3.0)))
    TxnTable.compact(spark, root) // v2: rewrites the file set
    val stream = new GraftMicroBatchStream(root,
      TxnTable.snapshot(spark, root).schema, -1L)
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(
        GraftStreamOffset(0L), GraftStreamOffset(2L))
    }
    assert(e.getMessage.contains("non-append"))
    // ...but a range that stops before the rewrite still plans fine
    assert(stream.planInputPartitions(
      GraftStreamOffset(0L), GraftStreamOffset(1L)).nonEmpty)
  }

  test("timestampAsOf: at-commit and between-commit timestamps resolve " +
      "to the preceding version; before-first throws; both options " +
      "together rejected") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0)))
    Thread.sleep(5)
    TxnTable.append(spark, root, kv((2L, 2.0)))
    Thread.sleep(5)
    TxnTable.append(spark, root, kv((3L, 3.0)))
    val t0 = TxnTable.readManifest(spark, root, 0L).timestampMs
    val t1 = TxnTable.readManifest(spark, root, 1L).timestampMs
    val t2 = TxnTable.readManifest(spark, root, 2L).timestampMs
    assert(TxnTable.versionAtTimestamp(spark, root, t1) == 1L)
    assert(TxnTable.versionAtTimestamp(spark, root, t2 - 1) == 1L)
    assert(TxnTable.versionAtTimestamp(spark, root, t2 + 60000) == 2L)
    assert(TxnTable.snapshotAsOfTimestamp(spark, root, t1)
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      TxnTable.versionAtTimestamp(spark, root, t0 - 1)
    }
    // connector path: option resolution matches, incl. epoch-millis
    assert(spark.read.format(Fmt).option("timestampAsOf", t1).load(root)
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    intercept[IllegalArgumentException] {
      spark.read.format(Fmt)
        .option("timestampAsOf", t1).option("versionAsOf", 0)
        .load(root).collect()
    }
    intercept[IllegalArgumentException] {
      spark.read.format(Fmt).option("timestampAsOf", "not-a-time")
        .load(root).collect()
    }
  }

  test("cdc/cdf sentinel never clobbers a user column named _graft_ex") {
    val root = freshRoot()
    val pre = Seq((1L, true), (2L, true)).toDF("k", "_graft_ex")
    TxnTable.create(spark, root, pre)
    TxnTable.overwrite(spark, root,
      Seq((1L, false), (2L, true), (3L, true)).toDF("k", "_graft_ex"))
    val changes = TxnTable.cdc(spark, root, 0L, 1L, Seq("k"))
      .select("k", "_change_type", "_graft_ex")
      .as[(Long, String, Boolean)].collect().sortBy(_._1).toSeq
    // k=1 flipped its _graft_ex value → an update carrying the REAL
    // post-image value (false), not a sentinel-corrupted true
    assert(changes == Seq((1L, "update", false), (3L, "insert", true)))
  }

  test("a table with a rewrite in its history can still START a " +
      "stream: the initial snapshot is the end manifest, valid " +
      "regardless of operation history") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)))
    TxnTable.append(spark, root, kv((3L, 3.0)))
    TxnTable.compact(spark, root) // v2: a rewrite
    TxnTable.append(spark, root, kv((4L, 4.0)))
    val ckpt = Files.createTempDirectory("graft_stbl_ck").toString
    val out = Files.createTempDirectory("graft_stbl_out").toString
    drain(root, ckpt, out) // initial snapshot across the compact: fine
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 3L, 4L))
    // incremental ranges still enforce append-only: a post-checkpoint
    // rewrite fails the NEXT drain loudly
    TxnTable.compact(spark, root)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(root, ckpt, out)
    }
    assert(e.getCause.getMessage.contains("non-append"))
  }

  test("startingVersion is INCLUSIVE (the Delta contract): changes " +
      "from version N on, no initial snapshot") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0))) // v0
    TxnTable.append(spark, root, kv((2L, 2.0))) // v1
    TxnTable.append(spark, root, kv((3L, 3.0))) // v2
    val ckpt = Files.createTempDirectory("graft_stbl_ck").toString
    val out = Files.createTempDirectory("graft_stbl_out").toString
    val q = spark.readStream.format(Fmt)
      .option("startingVersion", "1").load(root)
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
    // v1's rows INCLUDED, v0's snapshot not re-delivered
    assert(spark.read.parquet(out).select("k").as[Long].collect().sorted
      .toSeq == Seq(2L, 3L))
  }

  test("time-travel options are rejected on readStream instead of " +
      "silently streaming latest; empty offset ranges error " +
      "descriptively") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0)))
    val e = intercept[Exception] {
      spark.readStream.format(Fmt).option("versionAsOf", "0").load(root)
        .writeStream.format("noop")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("batch-read options")))
    // fabricated offsets beyond the log: descriptive, not empty.max
    val stream = new GraftMicroBatchStream(root,
      TxnTable.snapshot(spark, root).schema, -1L)
    val e2 = intercept[IllegalStateException] {
      stream.planInputPartitions(
        GraftStreamOffset(5L), GraftStreamOffset(9L))
    }
    assert(e2.getMessage.contains("no committed versions"))
  }
}
