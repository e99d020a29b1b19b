package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The BUCKETED table layout ([[TxnTable.BucketSpec]]) and its payoff:
  * storage-partitioned joins (two tables co-bucketed on the join key
  * plan with NO shuffle on either side) and equality-probe bucket
  * pruning. Also pins the write/read hash agreement — the manifest's
  * per-file bucket ids must be exactly what [[TxnTable.bucketOf]] (and
  * therefore the catalog's V2 `bucket` function) computes per key.
  */
class BucketJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private val N = 4

  private def freshRoot(): String =
    Files.createTempDirectory("graft_bucket").toString

  private def cat(root: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set(s"spark.sql.catalog.$name", "graft.table.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse",
      p.getParent.toString)
    s"$name.`${p.getName}`"
  }

  private def dim(root: String): Unit =
    TxnTable.create(spark, root,
      spark.range(0, 40).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("nm")),
      statsCols = Seq("k"), bucketBy = Some(TxnTable.BucketSpec("k", N)))

  private def fact(root: String): Unit =
    TxnTable.create(spark, root,
      spark.range(0, 400).select((col("id") % 40).as("k"),
        (col("id") * 3 % 17).cast("double").as("v")),
      statsCols = Seq("k"), bucketBy = Some(TxnTable.BucketSpec("k", N)))

  private def withSpj[T](body: => T): T = {
    val prevB = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      prevB.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      prevT.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // materialize so AQE finalizes the physical plan
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          count(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          count(q.plan)
        case _ => 0
      }
      self + inner + p.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  test("bucketed create: every manifest file carries a bucket id and " +
      "the ids agree with TxnTable.bucketOf per key") {
    val root = freshRoot()
    fact(root)
    val m = TxnTable.readManifest(spark, root, 0L)
    assert(m.files.nonEmpty)
    assert(m.files.forall(f => f.bucket.exists(b => b >= 0 && b < N)))
    assert(TxnTable.bucketSpec(
      spark.sparkContext.hadoopConfiguration, root)
      .exists(s => s.col == "k" && s.n == N && s.sorted.contains(true)))
    // read each file back: all rows' keys must hash to the file's id
    m.files.filter(_.rows > 0).foreach { f =>
      val keys = spark.read.parquet(s"$root/${f.path}")
        .select("k").collect().map(_.getLong(0))
      assert(keys.nonEmpty)
      keys.foreach { k =>
        assert(TxnTable.bucketOf(k, N).contains(f.bucket.get),
          s"key $k in file ${f.path} bucket ${f.bucket.get}")
      }
    }
  }

  test("co-bucketed join is storage-partitioned: ZERO shuffles, " +
      "result identical to the shuffled plan") {
    val dRoot = freshRoot(); val fRoot = freshRoot()
    dim(dRoot); fact(fRoot)
    val d = cat(dRoot, "gbd"); val f = cat(fRoot, "gbf")
    val q = s"""SELECT d.nm, f.v FROM $d d JOIN $f f ON d.k = f.k"""
    val expected = withSpj {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.sql(q).collect().map(_.toString).sorted
    }
    withSpj {
      val df = spark.sql(q)
      val got = df.collect().map(_.toString).sorted
      assert(got.length == 400)
      assert(got.sameElements(expected))
      assert(shuffles(df) == 0,
        s"expected a shuffle-free storage-partitioned join:\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("COMPOSITE-KEY co-bucketed join is storage-partitioned: zero " +
      "shuffles on a two-column key; ids agree with bucketOfCompound; " +
      "full-key equality probes prune") {
    val dRoot = freshRoot(); val fRoot = freshRoot()
    val spec = TxnTable.BucketSpec("k", N, cols = Some(Seq("k", "g")))
    TxnTable.create(spark, dRoot,
      spark.range(0, 40).select(col("id").as("k"),
        (col("id") % 4).cast("string").as("g"),
        concat(lit("d_"), col("id")).as("nm")),
      statsCols = Seq("k"), bucketBy = Some(spec))
    TxnTable.create(spark, fRoot,
      spark.range(0, 400).select((col("id") % 40).as("k"),
        ((col("id") % 40) % 4).cast("string").as("g"),
        (col("id") * 3 % 17).cast("double").as("v")),
      statsCols = Seq("k"), bucketBy = Some(spec))
    // write/read hash agreement on the per-column composite id
    val m = TxnTable.readManifest(spark, fRoot, 0L)
    assert(m.files.forall(_.bucket.isDefined))
    m.files.filter(_.rows > 0).foreach { f =>
      spark.read.parquet(s"$fRoot/${f.path}")
        .select("k", "g").collect().foreach { r =>
          val ids = TxnTable.bucketIdsOf(
            Seq(r.getLong(0), r.getString(1)), N).get
          assert(TxnTable.compositeIdx(ids, N) == f.bucket.get,
            s"(k=${r.getLong(0)}, g=${r.getString(1)}) ids $ids in " +
              s"bucket ${f.bucket.get}")
        }
    }
    val d = cat(dRoot, "gbcd"); val f = cat(fRoot, "gbcf")
    val q = s"""SELECT d.nm, f.v FROM $d d
      JOIN $f f ON d.k = f.k AND d.g = f.g"""
    val expected = withSpj {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      spark.sql(q).collect().map(_.toString).sorted
    }
    withSpj {
      val df = spark.sql(q)
      val got = df.collect().map(_.toString).sorted
      assert(got.length == 400)
      assert(got.sameElements(expected))
      assert(shuffles(df) == 0,
        s"expected a shuffle-free composite-key SPJ:\n" +
          df.queryExecution.executedPlan)
    }
    // full-key equality probe pins every digit: exactly one composite
    // bucket's files survive
    val b0 = TxnTable.compositeIdx(
      TxnTable.bucketIdsOf(Seq(7L, "3"), N).get, N)
    val bucketFiles = m.files.count(_.bucket.contains(b0))
    assert(bucketFiles < m.files.size)
    val probe = spark.read.format("graft.table.GraftTableProvider")
      .load(fRoot).filter(col("k") === 7L && col("g") === "3")
    assert(probe.count() == 10)
    assert(probe.rdd.getNumPartitions <= bucketFiles)
    // a HALF-key probe prunes ITS digit (the per-column dividend the
    // chained-hash design could never give): ~1/n of the files
    val d0 = TxnTable.bucketOf(7L, N).get
    val halfFiles = m.files.count(_.bucket.exists(idx =>
      TxnTable.decomposeIdx(idx, N, 2).head == d0))
    assert(halfFiles < m.files.size)
    val half = spark.read.format("graft.table.GraftTableProvider")
      .load(fRoot).filter(col("k") === 7L)
    assert(half.count() == 10)
    assert(half.rdd.getNumPartitions <= halfFiles)
  }

  test("append to a bucketed table re-buckets the incoming rows — " +
      "the layout (and the shuffle-free join) survives ingest") {
    val dRoot = freshRoot(); val fRoot = freshRoot()
    dim(dRoot); fact(fRoot)
    TxnTable.append(spark, fRoot,
      spark.range(400, 500).select((col("id") % 40).as("k"),
        lit(99.0).as("v")), Seq("k"))
    val m = TxnTable.readManifest(spark, fRoot,
      TxnTable.versions(spark, fRoot).max)
    assert(m.files.forall(_.bucket.isDefined))
    val d = cat(dRoot, "gbd2"); val f = cat(fRoot, "gbf2")
    withSpj {
      val df = spark.sql(
        s"SELECT d.nm, f.v FROM $d d JOIN $f f ON d.k = f.k")
      assert(df.count() == 500)
      assert(shuffles(df) == 0,
        s"post-append join should stay shuffle-free:\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("equality probe on the bucket column prunes to one bucket's " +
      "files; a rewrite that drops bucket ids degrades gracefully") {
    val fRoot = freshRoot()
    fact(fRoot)
    val m = TxnTable.readManifest(spark, fRoot, 0L)
    val probeKey = 7L
    val probeBucket = TxnTable.bucketOf(probeKey, N).get
    val bucketFiles = m.files.count(_.bucket.contains(probeBucket))
    assert(bucketFiles < m.files.size)
    val df = spark.read.format("graft.table.GraftTableProvider")
      .load(fRoot).filter(col("k") === probeKey)
    assert(df.count() == 10) // 400 rows, k = id % 40
    assert(df.rdd.getNumPartitions <= bucketFiles,
      s"probe planned ${df.rdd.getNumPartitions} partitions, " +
        s"bucket $probeBucket has $bucketFiles files")
    // compact() PRESERVES the layout: ingest fragments a bucketed
    // table into one small file per bucket per append, and compaction
    // bin-packs them back to one file per bucket — still all bucketed
    TxnTable.compact(spark, fRoot, targetBytes = 1L << 30,
      statsCols = Seq("k"))
    val m2 = TxnTable.readManifest(spark, fRoot,
      TxnTable.versions(spark, fRoot).max)
    assert(m2.files.forall(_.bucket.isDefined))
    assert(m2.files.size <= N)
    // cluster() is an EXPLICIT re-layout (sorted ranges instead of
    // hash buckets): ids drop, and reads fall back, exactly correct
    TxnTable.cluster(spark, fRoot, Seq("k"), 2, Seq("k"))
    val m3 = TxnTable.readManifest(spark, fRoot,
      TxnTable.versions(spark, fRoot).max)
    assert(m3.files.exists(_.bucket.isEmpty))
    val post = spark.read.format("graft.table.GraftTableProvider")
      .load(fRoot).filter(col("k") === probeKey)
    assert(post.count() == 10)
  }

  test("sorted buckets: the SPJ sort-merge runs with NO SortExec and " +
      "NO shuffle — a pure merge over pre-sorted one-file buckets") {
    val dRoot = freshRoot(); val fRoot = freshRoot()
    dim(dRoot); fact(fRoot)
    // sanity: layout qualifies (sorted flag + one non-empty file/bucket)
    Seq(dRoot, fRoot).foreach { r =>
      assert(TxnTable.bucketSpec(
        spark.sparkContext.hadoopConfiguration, r)
        .exists(_.sorted.contains(true)))
      val m = TxnTable.readManifest(spark, r, 0L)
      assert(m.files.filter(_.rows > 0).groupBy(_.bucket)
        .forall(_._2.size == 1))
      // files really are sorted inside
      m.files.filter(_.rows > 0).foreach { f =>
        val ks = spark.read.parquet(s"$r/${f.path}")
          .select("k").collect().map(_.getLong(0))
        assert(ks.sameElements(ks.sorted), s"unsorted bucket ${f.path}")
      }
    }
    val d = cat(dRoot, "gbd3"); val f = cat(fRoot, "gbf3")
    withSpj {
      val df = spark.sql(
        s"SELECT d.nm, f.v FROM $d d JOIN $f f ON d.k = f.k")
      assert(df.count() == 400)
      def sorts(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val self = p match {
          case _: org.apache.spark.sql.execution.SortExec => 1
          case _ => 0
        }
        val inner = p match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => sorts(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => sorts(q.plan)
          case _ => 0
        }
        self + inner + p.children.map(sorts).sum
      }
      assert(shuffles(df) == 0)
      assert(sorts(df.queryExecution.executedPlan) == 0,
        s"expected a sort-free merge join over the reported ordering:\n" +
          df.queryExecution.executedPlan)
    }
  }

  test("layout guards: failed create leaves no orphan sidecar; " +
      "unbucketable types and bucket-column rename/drop are refused") {
    val root = freshRoot()
    // constraint violation aborts BEFORE any sidecar/manifest exists
    intercept[Exception] {
      TxnTable.create(spark, root,
        spark.range(0, 10).selectExpr("id AS k", "CAST(-1 AS DOUBLE) AS v"),
        constraints = Map("pos" -> "v > 0"),
        bucketBy = Some(TxnTable.BucketSpec("k", 4)))
    }
    assert(TxnTable.bucketSpec(
      spark.sparkContext.hadoopConfiguration, root).isEmpty,
      "failed create must not leave an orphan _bucket.json")
    // retry WITHOUT the layout: no stale spec haunts it
    TxnTable.create(spark, root,
      spark.range(0, 10).selectExpr("id AS k", "CAST(1 AS DOUBLE) AS v"))
    assert(TxnTable.bucketSpec(
      spark.sparkContext.hadoopConfiguration, root).isEmpty)
    // unbucketable type refused at create, loudly
    val root2 = freshRoot()
    val e = intercept[Exception] {
      TxnTable.create(spark, root2,
        spark.range(0, 10).selectExpr("CAST(id AS DOUBLE) AS k"),
        bucketBy = Some(TxnTable.BucketSpec("k", 4)))
    }
    assert(e.getMessage.contains("not bucketable"))
    // bucket column rename/drop refused — the sidecar would rot
    val root3 = freshRoot()
    TxnTable.create(spark, root3,
      spark.range(0, 10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
      bucketBy = Some(TxnTable.BucketSpec("k", 4)))
    assert(intercept[Exception] {
      TxnTable.renameColumn(spark, root3, "k", "kk")
    }.getMessage.contains("bucket column"))
    assert(intercept[Exception] {
      TxnTable.dropColumn(spark, root3, "k")
    }.getMessage.contains("bucket column"))
    // non-bucket columns still evolve freely
    TxnTable.renameColumn(spark, root3, "v", "vv")
  }

  test("the catalog's V2 bucket function binds for supported key " +
      "types and matches the layout hash") {
    val bound = GraftBucketFunction.bind(new org.apache.spark.sql.types
      .StructType()
      .add("n", org.apache.spark.sql.types.IntegerType)
      .add("k", org.apache.spark.sql.types.LongType))
      .asInstanceOf[GraftBucketBound]
    Seq(0L, 1L, 7L, 39L, -5L, Long.MaxValue).foreach { k =>
      val viaFn = bound.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(N, k))
      assert(TxnTable.bucketOf(k, N).contains(viaFn.intValue()))
    }
    intercept[UnsupportedOperationException] {
      GraftBucketFunction.bind(new org.apache.spark.sql.types.StructType()
        .add("n", org.apache.spark.sql.types.IntegerType)
        .add("k", org.apache.spark.sql.types.DoubleType))
    }
  }
}
