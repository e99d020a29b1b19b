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

  /** Measured skew diagnosis: top-key share of the dataset, from ONE
    * aggregation over a deterministic hash sample (no full-key-cardinality
    * shuffle at 100 TB — the sample bounds reducer input, and a key hot
    * enough to matter is hot in any few-percent sample).
    *
    * Returns (hotKeyShare ∈ [0,1], sampledRows). Share is measured within
    * the sample; hash sampling is content-deterministic, so re-runs agree.
    */
  def skewStats(df: DataFrame, keyCols: Seq[String],
      sampleOneIn: Int = 16): (Double, Long) = {
    // sample by ROW hash (all columns), never by key hash — key-hash
    // sampling keeps or drops each key wholesale, so a hot key could be
    // missed entirely; a row sample preserves per-key shares
    val keyed = df
      .filter(pmod(hash(df.columns.map(col): _*), lit(sampleOneIn)) === 0)
      .select(keyCols.map(col): _*)
    val counts = keyed.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val row = counts.agg(max(col("__n")).as("mx"),
      sum(col("__n")).as("tot")).head()
    if (row.isNullAt(1) || row.getLong(1) == 0L) (0.0, 0L)
    else (row.getLong(0).toDouble / row.getLong(1), row.getLong(1))
  }

  /** Measure-then-mitigate aggregation: picks the salt factor from the
    * observed hot-key share (share × target reducers, capped), falling
    * back to a PLAIN aggregation when the keys are balanced — salting has
    * a real merge-phase cost, so it should be applied only when measured
    * skew warrants it.
    */
  def autoSaltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: Column,
      spreadCol: String,
      targetReducers: Int = 32,
      hotShareThreshold: Double = 0.2
  ): DataFrame = {
    val (share, _) = skewStats(df, keyCols)
    if (share < hotShareThreshold)
      df.groupBy(keyCols.map(col): _*)
        .agg(sum(valueCol).as("sum_value"), count(lit(1)).as("n"))
    else {
      val salts = math.max(2, math.min(targetReducers,
        math.ceil(share * targetReducers).toInt))
      saltedSumCount(df, keyCols, valueCol, salts, spreadCol)
    }
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
