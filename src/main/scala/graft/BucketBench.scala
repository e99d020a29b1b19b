package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-partitioned-join and dynamic-file-pruning evidence: on a
  * co-bucketed customer⋈orders pair, time the SAME join with the
  * bucketed layout honored (zero exchanges) vs forced through the
  * shuffle plan, and report how many manifest files a runtime
  * dim-key IN-set leaves after stats/bloom pruning vs the full scan.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
  *         sbt "runMain graft.BucketBench"`
  * Emits one JSON line:
  * `{"orders_rows":N,"buckets":32,"spj_s":…,"shuffle_s":…,
  *   "spj_exchanges":0,"shuffle_exchanges":k,
  *   "dyn_files_full":…,"dyn_files_pruned":…}`
  */
object BucketBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reps = sys.env.getOrElse("SPARK_GRAFT_BKT_REPS", "20").toInt
    val buckets = 32
    val wh = java.nio.file.Files
      .createTempDirectory("graft_bktbench").toString
    // replicate orders so the join is work-bound, not floor-bound;
    // keys stay in the customer domain so every row joins
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"), col("o_totalprice"))
      .crossJoin(spark.range(0, reps).select(col("id").as("rep")))
      .select(col("o_custkey"), (col("o_totalprice") + col("rep"))
        .as("o_totalprice"))
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    graft.table.TxnTable.create(spark, s"$wh/orders", o,
      Seq("o_custkey"),
      bucketBy = Some(graft.table.TxnTable.BucketSpec("o_custkey", buckets)))
    graft.table.TxnTable.create(spark, s"$wh/customer", c,
      Seq("c_custkey"),
      bucketBy = Some(graft.table.TxnTable.BucketSpec("c_custkey", buckets)))
    val oRows = graft.table.TxnTable.rowCount(spark, s"$wh/orders")

    spark.conf.set("spark.sql.catalog.gbkt", "graft.table.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbkt.warehouse", wh)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val q =
      """SELECT c_mktsegment, COUNT(*) AS n, SUM(o_totalprice) AS s
        FROM gbkt.customer JOIN gbkt.orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment"""

    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => 1
        case _ => 0
      }
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => shuffles(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => shuffles(s.plan)
        case _ => 0
      }
      self + inner + p.children.map(shuffles).sum
    }
    // join-side exchanges only: subtract the aggregation's own
    // exchange by counting on the join subplan
    def run(spj: Boolean): (Double, Int) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled",
        spj.toString)
      val joined = spark.sql(
        """SELECT c_mktsegment, o_totalprice
          FROM gbkt.customer JOIN gbkt.orders ON c_custkey = o_custkey""")
      joined.queryExecution.executedPlan // force planning
      val agg = spark.sql(q)
      val t0 = System.nanoTime()
      agg.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      joined.collect()
      (dt, shuffles(joined.queryExecution.executedPlan))
    }
    run(spj = true) // warm: codegen + catalog
    val (spjS, spjEx) = run(spj = true)
    val (shS, shEx) = run(spj = false)

    // dynamic pruning: a 3-key dim IN-set against the bucketed orders
    // table — bucket ids alone keep ≤ 3 of 32 buckets
    val m = graft.table.TxnTable.readManifest(spark, s"$wh/orders",
      graft.table.TxnTable.versions(spark, s"$wh/orders").max)
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL(m.schemaDdl)
    import org.apache.spark.sql.connector.expressions.{Expression, Expressions}
    def planned(probe: Option[Seq[Long]]): Int = {
      val scan = new graft.table.GraftScanBuilder(s"$wh/orders", schema)
        .build().asInstanceOf[graft.table.GraftScan]
      probe.foreach { vals =>
        scan.filter(Array(
          new org.apache.spark.sql.connector.expressions.filter.Predicate(
            "IN", (Expressions.column("o_custkey") +:
              vals.map(v =>
                Expressions.literal[java.lang.Long](v): Expression)).toArray)))
      }
      scan.planInputPartitions().length
    }
    val full = planned(None)
    val pruned = planned(Some(Seq(3L, 17L, 101L)))

    spark.stop()
    println(String.format(java.util.Locale.ROOT,
      """{"orders_rows":%d,"buckets":%d,"spj_s":%.3f,"shuffle_s":%.3f,""" +
        """"spj_exchanges":%d,"shuffle_exchanges":%d,""" +
        """"dyn_files_full":%d,"dyn_files_pruned":%d}""",
      Long.box(oRows), Int.box(buckets), Double.box(spjS),
      Double.box(shS), Int.box(spjEx), Int.box(shEx),
      Int.box(full), Int.box(pruned)))
  }
}
