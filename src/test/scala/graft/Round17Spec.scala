package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.WindowExecBase
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 specs: the ambient-normalized streaming floor fence
  * (r16 VERDICT ask #5) and the de-single-partitioned
  * q_roc_auc / q_weighted_median / q_ngram_coverage / q_skew_audit
  * plans (asks #3/#4).
  */
class Round17Spec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .filterNot(_.conf.getOption("spark.sql.extensions")
        .contains("graft.GraftExtensions"))
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private val sf = "/root/testdata/sf0.001"

  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case s: InMemoryTableScanExec =>
        (s: SparkPlan) +: allNodes(s.relation.cachedPlan)
      case a: AdaptiveSparkPlanExec => (a: SparkPlan) +: allNodes(a.inputPlan)
      case n => Seq(n)
    }

  test("floor fence normalized by the ambient calibration probe: silent " +
      "on a uniformly CPU-throttled run of unchanged code, loud on a " +
      "structural regression at calm ambient (r16 VERDICT ask #5)") {
    // A throttled host slows every gate AND the calibration probe by
    // the same ambient factor. Simulate a 1.6×-contended session: all
    // measured sec/batch at 1.6× their recorded floor... times the
    // pre-existing in-band margin (floors are measured at ~1×, gates
    // drift to ~1.4× within a healthy band — r16's false breaches were
    // 1.4×-band gates pushed past 2.0 by ambient alone).
    val throttled = Bench.recordedFloors.toSeq.map { case (g, f) =>
      g -> (4L, f * 4 * 1.4 * 1.6) // in-band 1.4× floor, throttled 1.6×
    }
    // un-normalized fence (the r16 behavior): cries wolf
    assert(Bench.floorBreaches(throttled).nonEmpty,
      "sanity: 2.24× the floor breaches the raw 2.0× fence")
    // ambient-normalized fence: probe/baseline = 1.6 stretches the
    // factor to 3.2 and the same measurements stay silent
    val scaled = Bench.FloorFenceFactor * 1.6
    assert(Bench.floorBreaches(throttled, factor = scaled).isEmpty,
      "uniform ambient slowdown must not breach the normalized fence")
    // a STRUCTURAL regression (one gate at 2.4× its floor, calm
    // ambient = scale 1.0) still fires, and only for that gate
    val structural = Seq(
      "events_stream_tumbling" -> (2L, 1.00 * 2 * 2.4),
      "events_stream_dedup" -> (2L, 0.975 * 2 * 1.3))
    val fired = Bench.floorBreaches(structural,
      factor = Bench.FloorFenceFactor * 1.0)
    assert(fired.map(_._1) == Seq("events_stream_tumbling"),
      s"structural 2.4× must fire alone at calm ambient: $fired")
    // ...and even under mild contention (1.1×) a hard structural
    // regression (4×) still fires through the stretched fence
    assert(Bench.floorBreaches(
      Seq("events_stream_tumbling" -> (2L, 1.00 * 2 * 4.0)),
      factor = Bench.FloorFenceFactor * 1.1).nonEmpty)
  }

  test("calibration probe is positive, finite and repeatable within a " +
      "same-JVM session") {
    val a = Bench.calibrationProbeSec(reps = 3)
    val b = Bench.calibrationProbeSec(reps = 3)
    assert(a > 0 && b > 0 && a.isFinite && b.isFinite)
    // same JVM, seconds apart: the two medians must agree within the
    // ambient band (generous 3× — this is a smoke bound, not a bench)
    assert(math.max(a, b) / math.min(a, b) < 3.0,
      s"calibration probe unstable: $a vs $b")
  }

  test("q_roc_auc / q_weighted_median / q_skew_audit run their domain " +
      "windows PARTITIONED (bucketed prefix-sum recipe, r16 VERDICT " +
      "asks #3/#4); q_ngram_coverage bounds its window with a top-k") {
    for (q <- Seq("q_roc_auc", "q_weighted_median", "q_skew_audit")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan
      val wins = allNodes(plan).collect { case w: WindowExecBase => w }
      assert(wins.exists(_.partitionSpec.nonEmpty),
        s"$q must keep a bucket-PARTITIONED domain window")
      // the only unpartitioned windows left are the bounded carry
      // chains over the bucket aggregate (the Round16Spec audit pins
      // the boundedness rule mechanically for every gate)
    }
    val ng = SparkEntry.queries("q_ngram_coverage")(spark, sf)
      .queryExecution.sparkPlan
    assert(allNodes(ng).exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "q_ngram_coverage must bound its rank window with a parallel " +
        "top-k (TakeOrderedAndProject), not a vocab-sized global sort")
  }

  test("fanout self-disables when the optimizer's size estimate implies " +
      "at least parallelism scan splits (r16 VERDICT 'what's wrong' #4)") {
    def roundRobins(q: String): Int = {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan
      allNodes(plan).count(_.toString.contains("RoundRobinPartitioning"))
    }
    // default 128 MB maxPartitionBytes: the tiny fixture estimates a
    // single split, fanout fires its repartition-to-parallelism
    assert(roundRobins("q_bootstrap_ci") >= 1,
      "small-estimate input must fire the fanout repartition")
    // a split estimate >= parallelism (the 100 TB shape, simulated by
    // shrinking maxPartitionBytes below fixtureBytes/parallelism)
    // makes fanout a no-op — no RoundRobin exchange in the plan
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1024")
      assert(roundRobins("q_bootstrap_ci") == 0,
        "large-estimate input must leave the plan repartition-free")
    } finally spark.conf.set(key, prev)
  }
}
