package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import scala.jdk.CollectionConverters._
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

  test("admission control: an N-file backlog drains in ceil(N/k) " +
      "micro-batches under maxFilesPerTrigger=k, exactly once") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((0L, 0.0)).coalesce(1))
    (1L to 5L).foreach(i =>
      TxnTable.append(spark, root, kv((i, i.toDouble)).coalesce(1)))
    // 6 versions × 1 file = a 6-file backlog; k=2 → exactly 3 batches
    val ckpt = Files.createTempDirectory("graft_adm_ck").toString
    val out = Files.createTempDirectory("graft_adm_out").toString
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drainLimited(): Unit = {
      val q = spark.readStream.format(Fmt)
        .option("maxFilesPerTrigger", "2").load(root)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, _: Long) =>
          batchSizes.synchronized { batchSizes += b.count() }
          b.write.mode("append").parquet(out); ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
    }
    drainLimited()
    assert(batchSizes.size == 3,
      s"expected ceil(6/2)=3 micro-batches, got $batchSizes")
    assert(spark.read.parquet(out).select("k").as[Long].collect()
      .sorted.toSeq == (0L to 5L))
    // mid-stream backlog growth + restart from the same checkpoint:
    // 3 more single-file commits drain in 2 more batches, no re-delivery
    batchSizes.clear()
    (6L to 8L).foreach(i =>
      TxnTable.append(spark, root, kv((i, i.toDouble)).coalesce(1)))
    drainLimited()
    assert(batchSizes.size == 2,
      s"expected ceil(3/2)=2 micro-batches, got $batchSizes")
    assert(spark.read.parquet(out).select("k").as[Long].collect()
      .sorted.toSeq == (0L to 8L))
  }

  test("admission offsets: within-version split, json round-trip, and " +
      "budget-independent unit identity (restart mid-backlog is " +
      "exactly-once by construction)") {
    val root = freshRoot()
    // ONE commit with 4 files — only the offset index can split it
    TxnTable.create(spark, root,
      (0L until 40L).map(i => (i, i.toDouble)).toDF("k", "score")
        .repartition(4))
    val schema = TxnTable.snapshot(spark, root).schema
    val stream = new GraftMicroBatchStream(root, schema, -1L)
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val s0 = GraftStreamOffset(-1L)
    val e1 = stream.latestOffset(s0, ReadLimit.maxFiles(3))
      .asInstanceOf[GraftStreamOffset]
    assert(e1 == GraftStreamOffset(0L, 3L, snapshot = true),
      s"partial snapshot offset expected, got $e1")
    // offsets survive their own json (checkpoint round-trip)
    assert(stream.deserializeOffset(e1.json()) == e1)
    // pre-r12 checkpoint format still parses as the complete form
    assert(stream.deserializeOffset("""{"version":3}""") ==
      GraftStreamOffset(3L))
    val b1 = stream.planInputPartitions(s0, e1)
    val e2 = stream.latestOffset(e1, ReadLimit.maxFiles(3))
      .asInstanceOf[GraftStreamOffset]
    assert(e2 == GraftStreamOffset(0L), s"drained offset: $e2")
    val b2 = stream.planInputPartitions(e1, e2)
    assert(b1.length == 3 && b2.length == 1)
    // the two budget-bounded windows tile the unlimited plan exactly —
    // the determinism that makes a mid-backlog restart exactly-once
    val full = stream.planInputPartitions(s0, e2)
    def paths(ps: Array[org.apache.spark.sql.connector.read.InputPartition]) =
      ps.map(_.asInstanceOf[graft.table.GraftInputPartition].relPath).toSeq
    assert(paths(b1) ++ paths(b2) == paths(full))
    // nothing pending: offset stays put
    assert(stream.latestOffset(e2, ReadLimit.maxFiles(3)) == e2)
    // bytes-based admission makes progress one file at a time even
    // when a single file exceeds the budget
    val eb = stream.latestOffset(s0, ReadLimit.maxBytes(1L))
      .asInstanceOf[GraftStreamOffset]
    assert(eb == GraftStreamOffset(0L, 1L, snapshot = true))
  }

  test("CDF stream honors maxFilesPerTrigger across mixed " +
      "append/rewrite history") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((1L, 1.0), (2L, 2.0)).coalesce(1),
      Seq("k"))
    TxnTable.enableCdf(spark, root, Seq("k"))
    TxnTable.append(spark, root, kv((3L, 3.0)).coalesce(1))
    TxnTable.deleteWhere(spark, root, col("k") === 1L)
    TxnTable.append(spark, root, kv((4L, 4.0)).coalesce(1))
    val ckpt = Files.createTempDirectory("graft_cdfadm_ck").toString
    val out = Files.createTempDirectory("graft_cdfadm_out").toString
    var batches = 0
    val q = spark.readStream.format(Fmt)
      .option("readChangeFeed", "true")
      .option("maxFilesPerTrigger", "1").load(root)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        this.synchronized { batches += 1 }
        b.write.mode("append").parquet(out); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination()
    finally q.stop()
    // units: v0 1 insert file, v1 1 insert file, v2 ≥1 change file,
    // v3 1 insert file → one per batch
    assert(batches >= 4, s"expected ≥4 single-file batches, got $batches")
    val got = spark.read.parquet(out)
    assert(got.filter(col("_change_type") === "insert")
      .select("k").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got.filter(col("_change_type") === "delete")
      .select("k").as[Long].collect().toSeq == Seq(1L))
  }

  test("native streaming SINK: writeStream.format(graft) lands each " +
      "micro-batch as a fenced stream-append commit, and a restart " +
      "from the same checkpoint appends only the new data") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((0L, 0.0)).coalesce(1), Seq("k"))
    val ckpt = Files.createTempDirectory("graft_sink_ck").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)](spark)
    def run(): Unit = {
      val q = mem.toDF().toDF("k", "score")
        .writeStream.format(Fmt)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(root)
      try q.awaitTermination()
      finally q.stop()
    }
    mem.addData((1L, 1.0), (2L, 2.0))
    run()
    val m1 = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    assert(m1.op == "stream-append" && m1.streamHwm.contains(0L),
      s"epoch 0 must be fenced in the manifest, got $m1")
    assert(TxnTable.snapshot(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == Seq(0L, 1L, 2L))
    // restart from the SAME checkpoint with new data: only it lands
    mem.addData((3L, 3.0))
    run()
    assert(TxnTable.snapshot(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // stats plumbing: the sink's files carry the table's opted-in
    // stats ({k}), so manifest pruning keeps working under streaming
    val latest = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    val streamed = latest.files.filter(_.path.contains("stream-e"))
    assert(streamed.nonEmpty &&
      streamed.forall(f => f.stats.keySet == Set("k")),
      s"sink files must carry exactly the opted-in stats, " +
        s"got ${streamed.map(_.stats)}")
  }

  test("native streaming SINK schema evolution: a restarted stream " +
      "whose df grew a column widens the table WITH mergeSchema, is " +
      "refused without it, and stays exactly-once") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((0L, 0.0)).coalesce(1), Seq("k"))
    val ckpt = Files.createTempDirectory("graft_sink_ck_ev").toString
    // ONE source throughout: its offsets drive every restart, so the
    // refused run genuinely attempts an epoch instead of finding the
    // checkpoint already drained
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double, String)](spark)
    def run(df: DataFrame, merge: Boolean): Unit = {
      val w = df.writeStream.format(Fmt)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
      val q = (if (merge) w.option("mergeSchema", "true") else w)
        .start(root)
      try q.awaitTermination()
      finally q.stop()
    }
    def narrow = mem.toDF().toDF("k", "score", "lang")
      .select("k", "score")
    def wide = mem.toDF().toDF("k", "score", "lang")
    mem.addData((1L, 1.0, "x"), (2L, 2.0, "y"))
    run(narrow, merge = false)
    assert(TxnTable.snapshot(spark, root).count() == 3)
    // widened df WITHOUT the option: loud refusal, nothing committed
    mem.addData((3L, 3.0, "en"))
    val vBefore = TxnTable.versions(spark, root).max
    intercept[Exception] { run(wide, merge = false) }
    assert(TxnTable.versions(spark, root).max == vBefore,
      "a refused epoch must not commit")
    // WITH mergeSchema: the replayed epoch widens the schema
    // atomically with its data
    run(wide, merge = true)
    val snap = TxnTable.snapshot(spark, root)
    assert(snap.columns.toSeq == Seq("k", "score", "lang"))
    assert(snap.count() == 4)
    assert(snap.filter(col("k") === 3L).head().getString(2) == "en")
    // pre-evolution rows back-fill NULL
    assert(snap.filter(col("lang").isNull).count() == 3)
    // exactly-once across the evolution: restart with more data,
    // nothing replays
    mem.addData((4L, 4.0, "de"))
    run(wide, merge = true)
    assert(TxnTable.snapshot(spark, root).count() == 5)
    assert(TxnTable.snapshot(spark, root)
      .groupBy().agg(sum(col("k"))).head().getLong(0) == 10L)
  }

  test("native streaming SINK through the CATALOG: " +
      "writeStream.toTable(cat.t) lands fenced epochs on the managed " +
      "identifier (the day-one Delta-user route)") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((0L, 0.0)).coalesce(1), Seq("k"))
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set("spark.sql.catalog.gsink", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsink.warehouse",
      p.getParent.toString)
    val ckpt = Files.createTempDirectory("graft_sink_ck3").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)](spark)
    mem.addData((1L, 1.0), (2L, 2.0))
    val q = mem.toDF().toDF("k", "score")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .toTable(s"gsink.`${p.getName}`")
    try q.processAllAvailable()
    finally q.stop()
    val m = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    assert(m.op == "stream-append" && m.streamHwm.contains(0L))
    assert(TxnTable.snapshot(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == Seq(0L, 1L, 2L))
    // and the SYMMETRIC catalog route: readStream.table drains the
    // same managed identifier through GraftMicroBatchStream
    val out = Files.createTempDirectory("graft_sink_out3").toString
    val ck2 = Files.createTempDirectory("graft_sink_ck3b").toString
    val q2 = spark.readStream.table(s"gsink.`${p.getName}`")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ck2)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(out); ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q2.awaitTermination()
    finally q2.stop()
    assert(spark.read.parquet(out).select("k").as[Long]
      .collect().sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("native streaming SINK is exactly-once across an epoch REPLAY: " +
      "re-running a committed epoch (crash between sink commit and " +
      "checkpoint commit) is a fenced no-op with no duplicate rows " +
      "and no orphaned files") {
    val root = freshRoot()
    TxnTable.create(spark, root, kv((0L, 0.0)).coalesce(1), Seq("k"))
    val ckpt = Files.createTempDirectory("graft_sink_ck2").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Double)](spark)
    def run(): Unit = {
      val q = mem.toDF().toDF("k", "score")
        .writeStream.format(Fmt)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(root)
      try q.awaitTermination()
      finally q.stop()
    }
    mem.addData((1L, 1.0), (2L, 2.0))
    run()
    val vAfter = TxnTable.versions(spark, root).max
    // simulate the crash window: the sink committed epoch 0 but the
    // checkpoint's commit record is gone → restart re-runs epoch 0
    val commit0 = new java.io.File(s"$ckpt/commits/0")
    assert(commit0.exists, "harness assumption: commit log at commits/0")
    assert(commit0.delete())
    // the local ChecksumFs leaves a .crc sidecar that would block the
    // replay's own commit write — not part of the crash being simulated
    new java.io.File(s"$ckpt/commits/.0.crc").delete()
    run()
    // the replay was fenced: same rows, no new stream-append version
    assert(TxnTable.snapshot(spark, root).select("k").as[Long]
      .collect().sorted.toSeq == Seq(0L, 1L, 2L))
    val vs = TxnTable.versions(spark, root)
    assert(vs.max == vAfter,
      s"a replayed epoch must not commit a new version: $vs")
    // and the replay's orphaned files were deleted by the sink
    val referenced = TxnTable.readManifest(spark, root, vs.max)
      .files.map(_.path).toSet
    val dataDir = java.nio.file.Paths.get(root, "data")
    val onDisk = java.nio.file.Files.walk(dataDir).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .map(p => "data/" + dataDir.relativize(p).toString)
      .filterNot(_.split("/").last.startsWith(".")) // checksum sidecars
      .filter(_.endsWith(".parquet")).toSet
    assert(onDisk == referenced,
      s"replay must clean its files: disk=$onDisk manifest=$referenced")
  }
}
