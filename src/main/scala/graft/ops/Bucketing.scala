package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage layout for co-located joins — the zero-shuffle join
  * path at 100 TB.
  *
  * A fact⋈fact equi-join (e.g. lineitem⋈orders on orderkey) normally
  * shuffles BOTH sides on the key every time it runs. Writing both tables
  * bucketed by the join key (same bucket count) stores rows pre-hashed
  * into aligned files; Spark's FileSourceScan then reports the bucket
  * `HashPartitioning` as its output partitioning and the join planner
  * skips both exchanges — the dominant cost of repeated big joins is paid
  * ONCE at write time and amortized over every subsequent join.
  *
  * The reference has no table storage at all (HTTP request/response, see
  * SURVEY.md §2.3 scans/sources/sinks); this module is part of the
  * engine's extension surface for pipeline-scale layouts.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (Parquet). Sorting within
    * buckets additionally lets sort-merge joins skip the per-task sort.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int,
      sorted: Boolean = true
  ): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. With both sides
    * bucketed into the same count, the plan contains NO Exchange
    * (asserted mechanically in PlanSpec).
    */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String
  ): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
