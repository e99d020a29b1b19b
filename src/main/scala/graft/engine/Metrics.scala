package graft.engine

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.util.LongAccumulator

/** O13 — metrics (reference: inception/metrics.py:3-32, Prometheus
  * counters/histograms REQUEST_COUNT, PROCESSING_TIME, ERROR_COUNT,
  * CHUNK_COUNT, MODEL_LOAD_TIME).
  *
  * Spark-native equivalent: named `LongAccumulator`s — they aggregate
  * across executors exactly like the reference's per-process counters
  * aggregate across Gunicorn workers, and tests can read them on the
  * driver. Timings are in millis. The two reference histograms keep
  * their bucket semantics: [[processingTimeHistogram]] /
  * [[modelLoadHistogram]] expose cumulative `le` buckets at the
  * reference's exact boundaries plus sum and count — the latency
  * ENVELOPE (how many requests landed under 0.5 s?) that a sum-only
  * accumulator cannot answer.
  *
  * SEMANTICS — at-least-once, like every Spark accumulator updated
  * inside a transformation: counters incremented in UDFs/mapPartitions
  * (error_count, chunk_count) re-fire if a Dataset is acted on twice
  * without caching, or on task retry/speculation; request_count
  * increments when the plan is BUILT, not when it runs. This mirrors
  * Prometheus counter practice (monotonic, rate()-read, approximate
  * under retries) — treat them as operational telemetry, not as an
  * exactly-once ledger. Exact per-action numbers are available through
  * the Observation API (see EngineSpec's observation test).
  */
class Metrics(sc: SparkContext) extends Serializable {
  private val acc = new ConcurrentHashMap[String, LongAccumulator]()

  private def get(name: String): LongAccumulator =
    acc.computeIfAbsent(name, n => sc.longAccumulator(s"graft.$n"))

  def requestCount(endpoint: String): LongAccumulator =
    get(s"request_count.$endpoint")
  def errorCount(endpoint: String, errorType: String): LongAccumulator =
    get(s"error_count.$endpoint.$errorType")
  def chunkCount(endpoint: String): LongAccumulator =
    get(s"chunk_count.$endpoint")
  def processingTimeMs(endpoint: String): LongAccumulator =
    get(s"processing_time_ms.$endpoint")
  def modelLoadTimeMs: LongAccumulator =
    get("model_load_time_ms")

  /** PROCESSING_TIME bucket bounds — the reference's request-latency
    * envelope, seconds → ms (inception/metrics.py:9-14).
    */
  val ProcessingTimeBuckets: Seq[(Long, String)] = Seq(
    100L -> "0.1", 500L -> "0.5", 1000L -> "1.0", 2000L -> "2.0",
    5000L -> "5.0", 10000L -> "10.0")

  /** MODEL_LOAD_TIME bucket bounds (inception/metrics.py:28-32). */
  val ModelLoadBuckets: Seq[(Long, String)] = Seq(
    1000L -> "1.0", 5000L -> "5.0", 10000L -> "10.0", 30000L -> "30.0",
    60000L -> "60.0")

  private def histogram(
      prefix: String, bounds: Seq[(Long, String)],
      sum: LongAccumulator): Metrics.Histogram =
    new Metrics.Histogram(
      sum,
      get(s"$prefix.count"),
      bounds.map { case (ms, label) =>
        ms -> get(s"$prefix.bucket.le_$label")
      },
      get(s"$prefix.bucket.le_inf"))

  /** The reference's PROCESSING_TIME histogram per endpoint; the plain
    * [[processingTimeMs]] accumulator doubles as its `_sum` (in ms).
    */
  def processingTimeHistogram(endpoint: String): Metrics.Histogram =
    histogram(s"processing_time.$endpoint", ProcessingTimeBuckets,
      processingTimeMs(endpoint))

  /** The reference's MODEL_LOAD_TIME histogram (no endpoint label). */
  def modelLoadHistogram: Metrics.Histogram =
    histogram("model_load_time", ModelLoadBuckets, modelLoadTimeMs)

  /** Snapshot for `/metrics`-style inspection (monitoring.py:30-35). */
  def snapshot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    acc.asScala.map { case (k, v) => k -> v.value.toLong }.toMap
  }

  /** Prometheus TEXT-EXPOSITION render of [[snapshot]] — the body the
    * reference serves from `GET /metrics`
    * (inception/routes/monitoring.py:30-35 → generate_latest()). Counter
    * families carry `endpoint`/`error_type` labels; the two histograms
    * emit cumulative `le` buckets at the reference's exact bounds
    * (seconds, metrics.py:9-14,28-32) plus `_sum` (ms → seconds) and
    * `_count`. Families with no observations are omitted, label sets are
    * sorted — the output is a deterministic function of the snapshot, so
    * EngineSpec golden-asserts it. The enabled/disabled (404) semantics
    * live on the ENGINE: `InceptionEngine.metricsExposition` returns
    * None when `enable_metrics` is off (config.py:33).
    */
  def exposition: String = {
    val snap = snapshot
    val sb = new StringBuilder
    def secs(ms: Long): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(ms / 1000.0))
    def family(tpe: String, name: String)(rows: => Seq[String]): Unit = {
      val rs = rows
      if (rs.nonEmpty) {
        sb.append(s"# TYPE $name $tpe\n")
        rs.foreach(r => sb.append(r).append('\n'))
      }
    }
    def stripped(prefix: String): Seq[(String, Long)] =
      snap.toSeq.collect {
        case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v
      }.sortBy(_._1)
    family("counter", "graft_request_count")(
      stripped("request_count.").map { case (ep, v) =>
        s"""graft_request_count{endpoint="$ep"} $v"""
      })
    val errRe = "^(.+)\\.([^.]+)$".r
    family("counter", "graft_error_count")(
      stripped("error_count.").collect { case (errRe(ep, et), v) =>
        s"""graft_error_count{endpoint="$ep",error_type="$et"} $v"""
      })
    family("counter", "graft_chunk_count")(
      stripped("chunk_count.").map { case (ep, v) =>
        s"""graft_chunk_count{endpoint="$ep"} $v"""
      })
    def histo(
        name: String, keyPrefix: String, sumKey: String,
        bounds: Seq[(Long, String)], label: Option[String]): Seq[String] =
      if (!snap.contains(s"$keyPrefix.count")) Seq.empty
      else {
        val lbl = label.map(l => s"""$l,le=""").getOrElse("le=")
        def at(le: String) =
          snap.getOrElse(s"$keyPrefix.bucket.le_$le", 0L)
        bounds.map { case (_, le) =>
          s"""${name}_bucket{$lbl"$le"} ${at(le)}"""
        } ++ Seq(
          s"""${name}_bucket{$lbl"+Inf"} ${at("inf")}""",
          s"""${name}_sum${label.map(l => s"{$l}").getOrElse("")} ${secs(
              snap.getOrElse(sumKey, 0L))}""",
          s"""${name}_count${label.map(l => s"{$l}").getOrElse("")} ${snap(
              s"$keyPrefix.count")}""")
      }
    val ptEndpoints = snap.keys.collect {
      case k if k.startsWith("processing_time.") && k.endsWith(".count") =>
        k.stripPrefix("processing_time.").stripSuffix(".count")
    }.toSeq.sorted
    family("histogram", "graft_processing_time_seconds")(
      ptEndpoints.flatMap { ep =>
        histo("graft_processing_time_seconds", s"processing_time.$ep",
          s"processing_time_ms.$ep", ProcessingTimeBuckets,
          Some(s"""endpoint="$ep""""))
      })
    family("histogram", "graft_model_load_time_seconds")(
      histo("graft_model_load_time_seconds", "model_load_time",
        "model_load_time_ms", ModelLoadBuckets, None))
    sb.result()
  }
}

object Metrics {
  /** Executor-serializable Prometheus-style histogram handle: CUMULATIVE
    * `le` buckets plus sum and count, all LongAccumulators. `observe`
    * touches EVERY bucket (adding 0 where the value is over the bound) so
    * the full bucket vector is registered and present in [[Metrics.snapshot]]
    * from the first observation, like a Prometheus exposition.
    *
    * Deliberately a TOP-LEVEL class holding only accumulators: as an inner
    * class of [[Metrics]] a retained `$outer` pointer could drag the
    * non-serializable SparkContext into task closures the moment any inner
    * code touched an outer member — this shape makes that regression
    * impossible by construction.
    */
  final class Histogram private[engine] (
      sum: LongAccumulator,
      count: LongAccumulator,
      buckets: Seq[(Long, LongAccumulator)],
      inf: LongAccumulator) extends Serializable {
    def observe(ms: Long): Unit = {
      sum.add(ms)
      count.add(1L)
      buckets.foreach { case (boundMs, a) =>
        a.add(if (ms <= boundMs) 1L else 0L)
      }
      inf.add(1L)
    }
  }
}
