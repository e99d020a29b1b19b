package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{sources, types}
import org.scalatest.funsuite.AnyFunSuite

/** COMPOSED partition × bucket layout (r15 VERDICT ask #8):
  * `PARTITIONED BY (status, bucket(n, key))` in ONE table. Every data
  * file holds exactly one (partition tuple, bucket id) pair, so the
  * manifest indexes the same file set two ways: partition probes prune
  * at planInputPartitions time, and the surviving files still carry
  * bucket ids, so the scan keeps reporting KeyGroupedPartitioning and
  * a co-bucketed join plans storage-partitioned — pruning AND
  * zero-exchange in one plan, the canonical 100-TB fact layout.
  */
class PartBucketSpec extends AnyFunSuite {

  lazy val spark: SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private val N = 4

  private def freshRoot(): String =
    Files.createTempDirectory("graft_pb").toString

  /** 120 rows, key k = id % 40 (all N buckets in every partition),
    * partition st ∈ {A, B, C}. */
  private def factDf(from: Int = 0, to: Int = 120) =
    spark.range(from, to).select(
      (col("id") % 40).as("k"),
      concat(lit(""), expr("substr('ABC', CAST(id % 3 AS INT) + 1, 1)"))
        .as("st"),
      (col("id") * 3 % 17).cast("double").as("v"))

  private def composedFact(root: String): Unit =
    TxnTable.create(spark, root, factDf(), Seq("k"),
      bucketBy = Some(TxnTable.BucketSpec("k", N)),
      partitionBy = Some(TxnTable.PartitionSpec("st")))

  private def bucketedDim(root: String): Unit =
    TxnTable.create(spark, root,
      spark.range(0, 40).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("nm")),
      Seq("k"), bucketBy = Some(TxnTable.BucketSpec("k", N)))

  private def withSpj[T](body: => T): T = {
    val prevB =
      spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevT =
      spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      prevB.fold(
        spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      prevT.fold(
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeExec => 1
        case _ => 0
      }
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => count(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          count(q.plan)
        case _ => 0
      }
      self + inner + p.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  private def planned(root: String,
      fs: Array[sources.Filter]): Seq[org.apache.spark.sql.connector
        .read.InputPartition] = {
    val m = TxnTable.readManifest(spark, root,
      TxnTable.latestVersion(spark, root).get)
    val b = new GraftScanBuilder(root,
      types.StructType.fromDDL(m.schemaDdl))
    b.pushFilters(fs)
    b.build().asInstanceOf[GraftScan].planInputPartitions().toSeq
  }

  test("composed create stamps BOTH roles on every file: single-valued " +
      "pv and a bucket id that agrees with TxnTable.bucketOf per key") {
    val root = freshRoot()
    composedFact(root)
    val m = TxnTable.readManifest(spark, root, 0L)
    assert(m.files.nonEmpty)
    assert(m.files.forall(f =>
      f.pv.isDefined && f.bucket.exists(b => b >= 0 && b < N)),
      "every composed-layout file must carry pv AND bucket")
    // one (pv, bucket) pair per file, checked against the data itself
    m.files.filter(_.rows > 0).foreach { f =>
      val rows = spark.read.parquet(s"$root/${f.path}")
        .select("k", "st").collect()
      assert(rows.nonEmpty)
      assert(rows.map(_.getString(1)).distinct.toSeq == Seq(f.pv.get),
        s"file ${f.path} must hold exactly partition ${f.pv.get}")
      rows.map(_.getLong(0)).foreach(k =>
        assert(TxnTable.bucketOf(k, N).contains(f.bucket.get),
          s"key $k in file ${f.path} bucket ${f.bucket.get}"))
    }
    // all three partitions and all four buckets are represented
    assert(m.files.flatMap(_.pv).toSet == Set("A", "B", "C"))
    assert(m.files.flatMap(_.bucket).toSet == (0 until N).toSet)
  }

  test("partition probes prune the planned file set AND the survivors " +
      "keep their bucket partition keys") {
    val root = freshRoot()
    composedFact(root)
    val m = TxnTable.readManifest(spark, root, 0L)
    val all = planned(root, Array.empty)
    val eq = planned(root, Array(sources.EqualTo("st", "A")))
    assert(all.size > eq.size, "the probe must prune files")
    val aFiles = m.files.filter(_.pv.contains("A")).map(_.path).toSet
    val eqPaths = eq.map(
      _.asInstanceOf[GraftBucketPartition].relPath).toSet
    assert(eqPaths == aFiles,
      s"expected exactly partition A's files, got $eqPaths")
    // every planned partition still carries its SPJ key
    eq.foreach(p => assert(
      p.asInstanceOf[GraftBucketPartition].key.nonEmpty))
  }

  /** Register the table root under a per-root catalog (the SPJ plan
    * needs the catalog's V2 `bucket` function to resolve — a raw
    * path read can't report KeyGroupedPartitioning). */
  private def cat(root: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set(s"spark.sql.catalog.$name", "graft.table.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse",
      p.getParent.toString)
    s"$name.`${p.getName}`"
  }

  test("ONE plan composes both dividends: partition-pruned fact scan " +
      "joins the co-bucketed dim with ZERO shuffles, result exact") {
    val root = freshRoot(); val droot = freshRoot()
    composedFact(root); bucketedDim(droot)
    val f = cat(root, "gpbf"); val d = cat(droot, "gpbd")
    val q = s"""SELECT nm, COUNT(*) AS n, SUM(v) AS sv
         FROM $f fact JOIN $d dim ON fact.k = dim.k
         WHERE st = 'A' GROUP BY nm ORDER BY nm"""
    withSpj {
      // join itself shuffle-free: count exchanges on a bare join
      val bare = spark.sql(
        s"SELECT nm, v FROM $f fact JOIN $d dim ON fact.k = dim.k " +
          "WHERE st = 'A'")
      assert(shuffles(bare) == 0,
        s"bare composed join must move zero bytes:\n" +
          bare.queryExecution.executedPlan)
      val df = spark.sql(q)
      assert(shuffles(df) <= 2, // the groupBy/sort exchanges at most
        "join must be storage-partitioned (no join exchanges):\n" +
          df.queryExecution.executedPlan)
      // correctness under pruning + SPJ
      val got = df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      val want = factDf().filter(col("st") === "A")
        .join(spark.range(0, 40).select(col("id").as("k"),
          concat(lit("name_"), col("id")).as("nm")), "k")
        .groupBy("nm").agg(count(lit(1)).as("n"),
          sum(col("v")).as("sv"))
        .orderBy("nm").collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == want)
    }
  }

  test("SQL surface: CREATE TABLE … PARTITIONED BY (st, bucket(n, k)) " +
      "+ INSERT INTO lands the composed layout") {
    val root = freshRoot()
    val p = new org.apache.hadoop.fs.Path(root)
    spark.conf.set("spark.sql.catalog.gpb", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpb.warehouse", root)
    spark.sql(
      s"""CREATE TABLE gpb.fact (k BIGINT, st STRING, v DOUBLE)
          PARTITIONED BY (st, bucket($N, k))
          TBLPROPERTIES ('statsCols'='k')""")
    factDf().createOrReplaceTempView("pb_src")
    spark.sql("INSERT INTO gpb.fact SELECT k, st, v FROM pb_src")
    val conf = spark.sparkContext.hadoopConfiguration
    val troot = s"$root/fact"
    assert(TxnTable.bucketSpec(conf, troot)
      .exists(b => b.col == "k" && b.n == N))
    assert(TxnTable.partitionSpec(conf, troot)
      .exists(s => s.col == "st" && s.transform == "identity"))
    val m = TxnTable.readManifest(spark, troot,
      TxnTable.latestVersion(spark, troot).get)
    assert(m.files.nonEmpty && m.files.forall(f =>
      f.pv.isDefined && f.bucket.isDefined),
      "SQL-inserted files must carry both layout stamps")
    assert(spark.sql("SELECT COUNT(*) FROM gpb.fact")
      .head().getLong(0) == 120L)
    spark.sql("DROP TABLE gpb.fact")
  }

  test("O(metadata) partition drop keeps working on a composed table " +
      "and the SPJ layout survives it") {
    val root = freshRoot(); val droot = freshRoot()
    composedFact(root); bucketedDim(droot)
    val v = TxnTable.dropPartitions(spark, root, Seq("B"))
    val m = TxnTable.readManifest(spark, root, v)
    assert(m.op == "drop-partition",
      s"expected an O(metadata) drop, got '${m.op}'")
    assert(m.files.nonEmpty && m.files.forall(_.bucket.isDefined),
      "surviving files must keep their bucket ids")
    assert(TxnTable.snapshot(spark, root).count() ==
      factDf().filter(col("st") =!= "B").count())
    val f = cat(root, "gpbf2"); val d = cat(droot, "gpbd2")
    withSpj {
      val bare = spark.sql(
        s"SELECT nm, v FROM $f fact JOIN $d dim ON fact.k = dim.k")
      assert(shuffles(bare) == 0,
        "post-drop composed join must stay storage-partitioned:\n" +
          bare.queryExecution.executedPlan)
    }
  }

  test("EVOLUTION onto a bucketed table composes: ALTER SET " +
      "PARTITIONED BY adds the partition half, new writes stamp both " +
      "roles, the SPJ survives, drops scope by era") {
    val root = freshRoot(); val droot = freshRoot()
    // plain-bucketed era 0
    TxnTable.create(spark, root, factDf(0, 60), Seq("k"),
      bucketBy = Some(TxnTable.BucketSpec("k", N)))
    bucketedDim(droot)
    val gen = TxnTable.evolvePartitionSpec(spark, root,
      TxnTable.PartitionSpec("st"))
    assert(gen == 1)
    // evolving onto a bucket column stays refused
    intercept[IllegalArgumentException] {
      TxnTable.evolvePartitionSpec(spark, root,
        TxnTable.PartitionSpec("k"))
    }
    // era-1 append: files carry pv (gen-stamped) AND bucket id
    TxnTable.append(spark, root, factDf(60, 120), Seq("k"))
    val m = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    val era1 = m.files.filter(_.pvg.contains(1))
    assert(era1.nonEmpty && era1.forall(f =>
      f.pv.isDefined && f.bucket.isDefined),
      s"post-evolution writes must stamp both roles: ${m.files}")
    assert(m.files.forall(_.bucket.isDefined),
      "era-0 files keep their bucket ids")
    // the SPJ layout survives the evolution + append
    val f = cat(root, "gpbe"); val d = cat(droot, "gpbe2")
    withSpj {
      val bare = spark.sql(
        s"SELECT nm, v FROM $f fact JOIN $d dim ON fact.k = dim.k")
      assert(shuffles(bare) == 0,
        "post-evolution composed join must stay storage-partitioned:\n" +
          bare.queryExecution.executedPlan)
    }
    // a drop on the evolved partition column: era-1 leaves as
    // metadata, era-0 (no pv) rewrites scoped — rows exact
    TxnTable.dropPartitionsWhere(spark, root, _ == "B",
      rowCond = pv => pv === "B")
    assert(TxnTable.snapshot(spark, root).count() ==
      factDf(0, 120).filter(col("st") =!= "B").count())
  }

  test("the immutable-manifest cache serves repeat reads without " +
      "re-parsing, and a DROP + re-CREATE at the same root is never " +
      "served stale (mtime/length key)") {
    val root = freshRoot()
    TxnTable.create(spark, root, factDf(0, 30), Seq("k"))
    val p0 = TxnTable.manifestParseCount
    val a = TxnTable.readManifest(spark, root, 0L)
    val afterFirst = TxnTable.manifestParseCount
    val b = TxnTable.readManifest(spark, root, 0L)
    val c = TxnTable.readManifest(spark, root, 0L)
    assert(TxnTable.manifestParseCount == afterFirst,
      "repeat reads of a committed version must be cache hits")
    assert((afterFirst - p0) <= 1)
    assert(a.files == b.files && b.files == c.files)
    // drop + re-create at the SAME root: new v0, different content —
    // the (mtime, length) key must miss, never serve the old manifest
    val hp = new org.apache.hadoop.fs.Path(root)
    val hf = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hf.delete(hp, true)
    Thread.sleep(5) // distinct mtime granularity on local fs
    TxnTable.create(spark, root, factDf(0, 90), Seq("k"))
    val d = TxnTable.readManifest(spark, root, 0L)
    assert(d.files.map(_.rows).sum == 90L,
      s"stale cache: got ${d.files.map(_.rows).sum} rows' manifest " +
        "for the re-created table")
  }

  test("a column cannot anchor both layout roles") {
    val root = freshRoot()
    val e = intercept[IllegalArgumentException] {
      TxnTable.create(spark, root, factDf(), Seq("k"),
        bucketBy = Some(TxnTable.BucketSpec("k", N)),
        partitionBy = Some(TxnTable.PartitionSpec("k")))
    }
    assert(e.getMessage.contains("BOTH"))
  }
}
