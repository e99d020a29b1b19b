package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heavy hitters at scale: per-partition SpaceSaving sketches propose a
  * CANDIDATE superset, then one exact aggregation over only the
  * candidate rows produces the final counts — the standard two-phase
  * pattern (Metwally et al., "Efficient Computation of Frequent and
  * Top-k Elements in Data Streams", ICDT 2005) for top-k over skewed
  * key spaces where a full groupBy would shuffle the whole vocabulary.
  *
  * Guarantee used: a SpaceSaving sketch of capacity c over a partition
  * never under-counts by more than N_part/c, so any key with global
  * frequency > Σ_p N_p/c survives in at least one partition's sketch —
  * the union of per-partition candidates is a superset of every key
  * with count > N/c (asserted in OpsSpec under adversarial
  * partitioning). The final counts are EXACT (phase 2 recounts), so
  * the result is deterministic and oracle-checkable even though sketch
  * internals are merge-order-dependent.
  *
  * Scale shape: phase 1 is one narrow scan emitting ≤ c candidates per
  * partition (collected: c × partitions small strings, guarded by a
  * hard cap so a cluster-scale partition count cannot flood the
  * driver); phase 2 is one scan filtered by a broadcast LEFT SEMI join
  * on the candidate set — a BroadcastHashJoin that stays inside
  * whole-stage codegen, unlike a Scala UDF membership test — plus a
  * candidate-only aggregate: shuffle volume O(candidates ×
  * partitions), never O(distinct keys).
  */
object HeavyHitters {

  /** Classic SpaceSaving: capacity-bounded counter table; on overflow
    * the minimum counter is evicted and inherited (over-count bounded
    * by the evicted minimum).
    */
  private[ops] final class SpaceSaving(capacity: Int) {
    private val counts = new java.util.HashMap[String, Long](capacity * 2)
    def add(key: String): Unit = {
      val cur = counts.get(key)
      if (cur != 0L || counts.containsKey(key)) counts.put(key, cur + 1L)
      else if (counts.size < capacity) counts.put(key, 1L)
      else {
        var minK: String = null
        var minV = Long.MaxValue
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue < minV) { minV = e.getValue; minK = e.getKey }
        }
        counts.remove(minK)
        counts.put(key, minV + 1L)
      }
    }
    def keys: Iterator[String] = {
      import scala.jdk.CollectionConverters._
      counts.keySet().iterator().asScala
    }
  }

  /** Exact top-k of `keyCol` (a string column; pre-explode upstream)
    * via sketch-candidates + exact recount. `capacity` trades phase-1
    * memory for the guarantee threshold N_partition/capacity.
    */
  def topK(
      df: DataFrame, keyCol: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string")).as[String]
    // Driver-side bound: the collect is ≤ capacity × partitions rows.
    // The partition count is read off the physical plan (no RDD
    // conversion / plan materialization), and instead of failing on
    // high-partition-count inputs the sketch pass is coalesced
    // (narrow, shuffle-free) to the largest count that keeps the
    // candidate set ≤ 2^26. Coalescing only widens each partition's
    // guarantee threshold N_partition/capacity — phase 2 recounts
    // exactly, so correctness is unaffected.
    // outputPartitioning reports UnknownPartitioning(0) for plain file
    // scans (most inputs) — fall back to the RDD's actual partition
    // count there so the clamp engages for exactly the common case.
    val planPart =
      keys.queryExecution.executedPlan.outputPartitioning.numPartitions
    val nPart = math.max(1,
      if (planPart > 0) planPart else keys.rdd.getNumPartitions)
    val maxPart = math.max(1, ((1L << 26) / capacity).toInt)
    val sketchIn = if (nPart > maxPart) keys.coalesce(maxPart) else keys
    val candidates = sketchIn.mapPartitions { it =>
      val ss = new SpaceSaving(capacity)
      it.foreach(ss.add)
      ss.keys
    }.distinct().collect()
    require(candidates.nonEmpty || df.isEmpty, "no candidates proposed")
    // Broadcast left-semi join (not a UDF set-membership filter): the
    // exact-recount scan stays inside whole-stage codegen and the
    // candidate set ships once per executor, not per task closure.
    val candDf = spark.createDataset(candidates.toSeq).toDF(keyCol)
    keys.toDF(keyCol)
      .join(broadcast(candDf), Seq(keyCol), "left_semi")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
  }

  def sketchCandidates(
      df: DataFrame, keyCol: String, capacity: Int): Set[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string")).as[String]
      .mapPartitions { it =>
        val ss = new SpaceSaving(capacity)
        it.foreach(ss.add)
        ss.keys
      }.distinct().collect().toSet
  }
}
