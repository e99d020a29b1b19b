package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * Scale shape: both samplers are one narrow pass + (for the per-group
  * variant) one window over the group key — WindowGroupLimit keeps
  * per-task state at k rows, so a group never funnels its full
  * membership through one reducer's memory. No RNG state anywhere: the
  * "randomness" is a hash of the row's unique id, so the sample is
  * reproducible across runs, partitionings and engines (the DuckDB
  * oracle replays it exactly).
  */
object Sampling {

  /** Uniform-in-[0,1) driven by md5 of the row id — the same
    * hash-as-randomness idiom as the q_sample_hash gate, widened from a
    * digit test to a full 32-bit uniform: first 8 hex digits → integer →
    * `(v + 0.5) / 2^32` (the +0.5 keeps u strictly positive so ln(u) is
    * finite).
    */
  def hashUniform(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("double")
      + lit(0.5)) / lit(4294967296.0)

  /** Weighted sampling WITHOUT replacement, k rows per group
    * (Efraimidis–Spirakis A-ES priority sampling): rank rows by
    * `ln(u) / w` descending — the monotone equivalent of the textbook
    * `u^(1/w)` key, better conditioned for large weights — and keep the
    * top k per group. Inclusion probability is proportional to weight,
    * exactly the "sample documents proportional to token count within
    * each source/domain" step of corpus mixing.
    *
    * The ranking key is ROUNDED (×1000, 6 dp) with the id as tiebreak,
    * the repo-wide determinism contract for cross-engine rank stability
    * (see Similarity's round(cosine,4) surfaces). Weights must be > 0;
    * non-positive weights would rank NaN/positive keys first, so they
    * are filtered out rather than silently favored.
    */
  def weightedSamplePerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      k: Int
  ): DataFrame = {
    val key = round(
      log(hashUniform(col(idCol))) * lit(1000.0) / col(weightCol), 6)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("sample_key").desc, col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("sample_key", key)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }
}
