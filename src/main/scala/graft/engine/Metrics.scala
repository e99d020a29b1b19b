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
  * driver. Timings are recorded driver-side in millis (the reference's
  * histograms collapse to sum+count here; bucket boundaries are a
  * serving-layer concern).
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

  /** Snapshot for `/metrics`-style inspection (monitoring.py:30-35). */
  def snapshot: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    acc.asScala.map { case (k, v) => k -> v.value.toLong }.toMap
  }
}
