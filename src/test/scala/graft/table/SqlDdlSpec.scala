package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL DDL through [[GraftCatalog]]: CREATE TABLE (with the bucketed
  * layout via `PARTITIONED BY (bucket(n, col))` and stats/bloom table
  * properties), CTAS, INSERT INTO, and DROP TABLE — the surface that
  * makes the format usable from pure SQL end to end.
  */
class SqlDdlSpec extends AnyFunSuite {

  lazy val spark: SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def warehouse(): String =
    Files.createTempDirectory("graft_sqlddl").toString

  private def cat(wh: String, name: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", "graft.table.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  test("CREATE TABLE with bucket(n, col) partitioning and statsCols " +
      "property: the layout and the stats opt-in govern every INSERT") {
    val wh = warehouse(); cat(wh, "gd1")
    spark.sql("CREATE TABLE gd1.t (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('statsCols'='k')")
    assert(TxnTable.bucketSpec(
      spark.sparkContext.hadoopConfiguration, s"$wh/t")
      .exists(s => s.col == "k" && s.n == 4))
    spark.range(0, 100).selectExpr("id AS k", "CAST(id % 7 AS DOUBLE) AS v")
      .createOrReplaceTempView("src1")
    spark.sql("INSERT INTO gd1.t SELECT * FROM src1")
    val m = TxnTable.readManifest(spark, s"$wh/t",
      TxnTable.versions(spark, s"$wh/t").max)
    val live = m.files.filter(_.rows > 0)
    assert(live.nonEmpty)
    assert(live.forall(_.bucket.isDefined), "inserted files carry buckets")
    assert(live.forall(_.stats.contains("k")), "statsCols opt-in applies")
    assert(spark.sql("SELECT COUNT(*) FROM gd1.t").head().getLong(0) == 100)
  }

  test("CTAS stores the query result; repeated CREATE fails with " +
      "TableAlreadyExists; DROP TABLE removes it") {
    val wh = warehouse(); cat(wh, "gd2")
    spark.range(0, 50).selectExpr("id % 5 AS g", "id AS x")
      .createOrReplaceTempView("src2")
    spark.sql("CREATE TABLE gd2.agg AS " +
      "SELECT g, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx " +
      "FROM src2 GROUP BY g")
    val got = spark.sql("SELECT * FROM gd2.agg ORDER BY g").collect()
    assert(got.length == 5 && got.forall(_.getLong(1) == 10))
    intercept[Exception] {
      spark.sql("CREATE TABLE gd2.agg (a INT)")
    }
    spark.sql("DROP TABLE gd2.agg")
    assert(spark.sql("SHOW TABLES IN gd2").collect()
      .forall(_.getString(1) != "agg"))
    assert(!new java.io.File(s"$wh/agg").exists())
  }

  test("unsupported partition transforms are refused loudly — the " +
      "format records no layout it cannot enforce") {
    val wh = warehouse(); cat(wh, "gd3")
    // identity (single or composite, PARTITIONED BY (d[, s])) and
    // days(d) ARE layouts now (IdentityPartitionSpec); hours/years
    // and bucket-mixed-with-identity are not
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gd3.t (k BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (hours(ts))")
    }
    assert(e.getMessage.contains("bucket") ||
      e.getMessage.contains("transform"))
    // nothing half-created
    assert(!new java.io.File(s"$wh/t").exists())
    // bucket mixed with identity/days is the COMPOSED layout now
    // (r16, PartBucketSpec) — both sidecars land; a SECOND bucket
    // transform stays refused
    spark.sql("CREATE TABLE gd3.tc (k BIGINT, d DATE, s STRING) " +
      "PARTITIONED BY (bucket(4, k), s)")
    val conf = spark.sparkContext.hadoopConfiguration
    assert(TxnTable.bucketSpec(conf, s"$wh/tc")
      .exists(b => b.col == "k" && b.n == 4))
    assert(TxnTable.partitionSpec(conf, s"$wh/tc")
      .exists(_.col == "s"))
    spark.sql("DROP TABLE gd3.tc")
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gd3.t (k BIGINT, d DATE, s STRING) " +
        "PARTITIONED BY (bucket(4, k), bucket(4, s))")
    }
    assert(e2.getMessage.contains("bucket") ||
      e2.getMessage.contains("transform"))
    assert(!new java.io.File(s"$wh/t").exists())
    // composite identity/days specs ARE a layout now: the sidecar
    // records every component (multi-column tests live in
    // IdentityPartitionSpec; this pins only the DDL acceptance)
    spark.sql("CREATE TABLE gd3.t2 (k BIGINT, d DATE, s STRING) " +
      "PARTITIONED BY (d, s)")
    assert(TxnTable.partitionSpec(
      spark.sparkContext.hadoopConfiguration, s"$wh/t2")
      .map(TxnTable.partCompsOf(_).map(_.col))
      .contains(Seq("d", "s")))
    // DSv2 partitioning() report: DESCRIBE gains a Partition
    // Information section listing both components, in spec order
    val desc = spark.sql("DESCRIBE TABLE EXTENDED gd3.t2").collect()
      .map(r => r.getString(0))
    val pi = desc.indexOf("# Partition Information")
    assert(pi >= 0, s"DESCRIBE must report the layout, got " +
      desc.mkString("; "))
    val after = desc.drop(pi)
    assert(after.indexOf("d") > 0 && after.indexOf("s") > after.indexOf("d"),
      s"partition columns must list after the header, got " +
        after.mkString("; "))
  }

  test("an EMPTY bucketed table scans and joins without claiming the " +
      "layout (no zero-partition KeyGroupedPartitioning)") {
    val wh = warehouse(); cat(wh, "gd8")
    spark.sql("CREATE TABLE gd8.a (k BIGINT, x DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE gd8.b (k BIGINT, y DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      assert(spark.sql("SELECT COUNT(*) FROM gd8.a").head().getLong(0) == 0)
      // empty ⋈ empty and empty ⋈ nonempty both plan and answer
      assert(spark.sql(
        "SELECT * FROM gd8.a a JOIN gd8.b b ON a.k = b.k").count() == 0)
      spark.range(0, 10).selectExpr("id AS k", "CAST(id AS DOUBLE) AS y")
        .createOrReplaceTempView("s8")
      spark.sql("INSERT INTO gd8.b SELECT * FROM s8")
      assert(spark.sql(
        "SELECT * FROM gd8.a a JOIN gd8.b b ON a.k = b.k").count() == 0)
    } finally prev.fold(
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
  }

  test("CREATE OR REPLACE TABLE: the non-atomic drop+create path " +
      "replaces schema and content") {
    val wh = warehouse(); cat(wh, "gd7")
    spark.range(0, 10).selectExpr("id AS k").createOrReplaceTempView("s7")
    spark.sql("CREATE TABLE gd7.t AS SELECT k FROM s7")
    assert(spark.sql("SELECT COUNT(*) FROM gd7.t").head().getLong(0) == 10)
    spark.sql("CREATE OR REPLACE TABLE gd7.t AS " +
      "SELECT k, CAST(k * 2 AS DOUBLE) AS v FROM s7 WHERE k < 5")
    val got = spark.sql("SELECT COUNT(*), CAST(SUM(v) AS BIGINT) " +
      "FROM gd7.t").head()
    assert(got.getLong(0) == 5 && got.getLong(1) == 20)
  }

  test("TRUNCATE TABLE is an empty-overwrite commit: content clears, " +
      "history time-travels across it, inserts work after") {
    val wh = warehouse(); cat(wh, "gd6")
    spark.range(0, 30).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("src6")
    spark.sql("CREATE TABLE gd6.t (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gd6.t SELECT * FROM src6")
    spark.sql("TRUNCATE TABLE gd6.t")
    assert(spark.sql("SELECT COUNT(*) FROM gd6.t").head().getLong(0) == 0)
    // pre-truncate version still reads the rows
    assert(spark.sql("SELECT COUNT(*) FROM gd6.t VERSION AS OF 1")
      .head().getLong(0) == 30)
    spark.sql("INSERT INTO gd6.t SELECT k + 100, v FROM src6")
    val after = spark.sql("SELECT MIN(k), COUNT(*) FROM gd6.t").head()
    assert(after.getLong(0) == 100 && after.getLong(1) == 30)
  }

  test("SHOW TBLPROPERTIES surfaces the layout and index opt-ins") {
    val wh = warehouse(); cat(wh, "gd5")
    spark.sql("CREATE TABLE gd5.t (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('statsCols'='k', 'bloomCols'='k')")
    val props = spark.sql("SHOW TBLPROPERTIES gd5.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("bucketColumn").contains("k"))
    assert(props.get("numBuckets").contains("4"))
    assert(props.get("statsCols").contains("k"))
    assert(props.get("bloomCols").contains("k"))
    assert(props.get("version").contains("0"))
  }

  test("INSERT INTO a CREATE'd bucketed table joins shuffle-free " +
      "against a co-bucketed sibling (the SQL-only SPJ path)") {
    val wh = warehouse(); cat(wh, "gd4")
    spark.sql("CREATE TABLE gd4.a (k BIGINT, x DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE gd4.b (k BIGINT, y DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.range(0, 80).selectExpr("id % 20 AS k", "CAST(id AS DOUBLE) AS x")
      .createOrReplaceTempView("src4a")
    spark.range(0, 20).selectExpr("id AS k", "CAST(id * 2 AS DOUBLE) AS y")
      .createOrReplaceTempView("src4b")
    spark.sql("INSERT INTO gd4.a SELECT * FROM src4a")
    spark.sql("INSERT INTO gd4.b SELECT * FROM src4b")
    val prevB = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevT = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = spark.sql(
        "SELECT a.k, a.x, b.y FROM gd4.a a JOIN gd4.b b ON a.k = b.k")
      assert(df.count() == 80)
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val self = p match {
          case _: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeExec => 1
          case _ => 0
        }
        val inner = p match {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => shuffles(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => shuffles(q.plan)
          case _ => 0
        }
        self + inner + p.children.map(shuffles).sum
      }
      assert(shuffles(df.queryExecution.executedPlan) == 0,
        s"SQL-created co-bucketed join should be storage-partitioned:\n" +
          df.queryExecution.executedPlan)
    } finally {
      prevB.fold(spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      prevT.fold(spark.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }
}
