package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.window.WindowExecBase
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, TakeOrderedAndProjectExec}
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 specs: the mechanical single-partition-window audit over the
  * WHOLE gate surface (VERDICT r15 ask #3) and the de-single-partitioned
  * q_pareto / q_heaps_law plans (ask #2).
  */
class Round16Spec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // The gate queries include SQL-surface gates that need the injected
    // parser; extensions apply only at session construction, so rebuild
    // if an earlier suite built the shared session without them.
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

  /** Every physical node in `p`, looking through the AQE wrapper and
    * into cached-relation plans (a window hidden inside a persisted
    * subtree is still a window at scale).
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case s: InMemoryTableScanExec =>
        (s: SparkPlan) +: allNodes(s.relation.cachedPlan)
      case a: AdaptiveSparkPlanExec => (a: SparkPlan) +: allNodes(a.inputPlan)
      case n => Seq(n)
    }

  /** The documented-bound rule: a single-partition window is acceptable
    * ONLY when its input is provably small — its child subtree contains
    * an aggregate (vocab/bucket/day-keyed state, never the corpus) or an
    * explicit limit/top-k head. This is the "caches are aggregates"
    * audit (Round11Spec) applied to windows.
    */
  private def boundedBelow(p: SparkPlan): Boolean =
    allNodes(p).exists {
      case _: BaseAggregateExec        => true
      case _: GlobalLimitExec          => true
      case _: CollectLimitExec         => true
      case _: TakeOrderedAndProjectExec => true
      case _ => false
    }

  test("no gate query plans a single-partition window over an unbounded " +
      "(non-aggregate, non-limited) input") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    // sparkPlan (pre-AQE) is where window partitioning is decided; AQE
    // never re-partitions a window, so this is the authoritative shape.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.sparkPlan
        catch {
          case e: Throwable =>
            fail(s"$name failed to plan at $sf: ${e.getMessage}")
        }
      allNodes(plan).foreach {
        case w: WindowExecBase if w.partitionSpec.isEmpty =>
          if (!boundedBelow(w.child))
            offenders += s"$name: ${w.nodeName} over ${w.child.nodeName}"
        case _ => ()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    assert(offenders.isEmpty,
      s"single-partition windows over unbounded inputs:\n  " +
        offenders.mkString("\n  "))
  }

  test("q_pareto plans NO window at all; q_heaps_law's only " +
      "unpartitioned window reads the buckets-sized aggregate") {
    val pareto = SparkEntry.queries("q_pareto")(spark, sf)
      .queryExecution.sparkPlan
    assert(allNodes(pareto).collect { case w: WindowExecBase => w }.isEmpty,
      "q_pareto regained a WindowExec — the head prefix sums must stay " +
        "higher-order-function folds over the 25-row head")

    val heaps = SparkEntry.queries("q_heaps_law")(spark, sf)
      .queryExecution.sparkPlan
    val wins = allNodes(heaps).collect { case w: WindowExecBase => w }
    assert(wins.nonEmpty, "q_heaps_law lost its windows entirely?")
    val unpart = wins.filter(_.partitionSpec.isEmpty)
    // the carry window (q_concurrency recipe) is the ONLY unpartitioned
    // one and it must read the per-bucket net aggregate, not the docs
    assert(unpart.nonEmpty && unpart.forall(w => boundedBelow(w.child)),
      "q_heaps_law's unpartitioned carry window must sit on the bucket " +
        "aggregate")
    val partd = wins.filter(_.partitionSpec.nonEmpty)
    assert(partd.nonEmpty,
      "q_heaps_law's doc-level running sums must be bucket-PARTITIONED")
  }

  test("streaming floor fence fires on an injected slowdown and stays " +
      "silent on the recorded band (r15 VERDICT ask #7)") {
    // silent: every recorded gate measured exactly AT its floor
    val atFloor = Bench.recordedFloors.toSeq
      .map { case (g, f) => g -> (4L, f * 4) }
    assert(Bench.floorBreaches(atFloor).isEmpty,
      "measuring at the recorded floor must never breach")
    // silent just under the fence (1.99× the floor)
    assert(Bench.floorBreaches(
      Seq("events_stream_tumbling" -> (2L, 1.00 * 2 * 1.99))).isEmpty)
    // FIRES on injected slowdowns; a gate with no recorded floor never
    // fires (new gates get a floor at the next re-band, not a red run)
    val breaches = Bench.floorBreaches(Seq(
      "events_stream_tumbling" -> (2L, 1.00 * 2 * 2.2),
      "docs_stream_kmv" -> (3L, 1.685 * 3 * 5.0),
      "q_gate_without_recorded_floor" -> (3L, 99.0)))
    assert(breaches.map(_._1).toSet ==
      Set("events_stream_tumbling", "docs_stream_kmv"))
    val t = breaches.find(_._1 == "events_stream_tumbling").get
    assert(math.abs(t._2 - 2.2) < 1e-9 && t._3 == 1.00,
      s"breach must carry (measured sec/batch, recorded floor): $t")
    // a zero-batch drain must never divide (or fire)
    assert(Bench.floorBreaches(
      Seq("events_stream_dedup" -> (0L, 9.9))).isEmpty)
  }
}
