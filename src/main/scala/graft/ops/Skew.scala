package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers.
  *
  * AQE handles skewed SHUFFLE JOINS at runtime; skewed AGGREGATION keys
  * (a handful of groups holding most rows — ubiquitous in web/event data)
  * still serialize onto single reducers. [[saltedAgg]] is the classic
  * two-phase fix: phase 1 aggregates on (key, salt) spreading each hot key
  * over `salts` reducers; phase 2 merges the per-salt partials. Correct
  * for any algebraic aggregate (sum/count/min/max — supplied as partial +
  * merge expression pairs).
  */
object Skew {

  /** @param df       input
    * @param keyCols  skewed grouping keys
    * @param salts    fan-out per key (≈ number of reducers a hot key
    *                 should occupy)
    * @param spreadCol deterministic salt source (any column with spread;
    *                 row-random salting would also be correct for
    *                 algebraic aggs but breaks re-run determinism)
    * @param partials aggregate columns for phase 1, by output name
    * @param merges   phase-2 merge over the phase-1 outputs, by final name
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      salts: Int,
      spreadCol: String,
      partials: Map[String, Column],
      merges: Map[String, Column]
  ): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(spreadCol)), lit(salts)))
    val phase1 = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(merges.head._2.as(merges.head._1),
        merges.tail.map { case (n, c) => c.as(n) }.toSeq: _*)
  }

  /** Salted equi-join for a skewed BIG side. Each big-side row is salted
    * deterministically into one of `salts` sub-keys; the small side is
    * replicated once per salt value, so a hot key's rows spread over
    * `salts` reducers instead of serializing onto one. Result is
    * identical to the plain equi-join (spec-checked); cost is a `salts`×
    * replication of the SMALL side only. Complements AQE's skew-join
    * splitting (which only kicks in for sort-merge shuffle joins it can
    * re-plan at runtime).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salts: Int,
      spreadCol: String
  ): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(col(spreadCol)), lit(salts)))
    val replicated = small.withColumn("__rsalt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(replicated,
        saltedBig(bigKey) === replicated(smallKey) &&
          saltedBig("__salt") === replicated("__rsalt"))
      .drop("__salt", "__rsalt")
  }

  /** Salted sum+count convenience (the common case). */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: Column,
      salts: Int,
      spreadCol: String
  ): DataFrame =
    saltedAgg(df, keyCols, salts, spreadCol,
      partials = Map(
        "__psum" -> sum(valueCol),
        "__pcnt" -> count(lit(1))),
      merges = Map(
        "sum_value" -> sum(col("__psum")),
        "n" -> sum(col("__pcnt"))))
}
