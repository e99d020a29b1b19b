package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left-side event, the most recent right-side row
  * with the same key and timestamp <= the left timestamp.
  *
  * Spark has no native as-of join; rather than a custom physical operator
  * we compose it from a union + one keyed window pass:
  *
  *   1. tag both sides, union them (schema-aligned),
  *   2. sort within each key by (ts, side) — right rows before left rows
  *      at equal timestamps so "at or before" includes ties,
  *   3. `last(right_payload, ignoreNulls)` over an unbounded-preceding
  *      running frame carries the latest right row forward,
  *   4. keep only left rows.
  *
  * ONE shuffle on the key — the same cost as the sort-merge join a native
  * implementation would do, with no range-condition blowup. At 100 TB
  * both sides shuffle once on the key and stream through a single sort;
  * skew mitigation is the usual key salting (the window frame is
  * running, so salting requires per-salt boundary stitching — documented
  * tradeoff).
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     reference rows (looked up as-of)
    * @param keyCols   equality key shared by both sides
    * @param leftTs    left timestamp column name (numeric or timestamp)
    * @param rightTs   right timestamp column name
    * @param rightVals right payload columns carried onto left rows
    *                  (emitted as `asof_<name>`, null when no prior row)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns
    // 0 = right side first at timestamp ties → inclusive "at or before"
    val taggedRight = right.select(
      (keyCols.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")) ++
        rightVals.map(c => col(c).as(s"__rv_$c")) ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(leftTs).cast(
        right.schema(rightTs).dataType).as("__ts") :+ lit(1).as("__side")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__rv_$c")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) =>
        df.withColumn(s"asof_$c", last(col(s"__rv_$c"), ignoreNulls = true)
          .over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.toSeq.map(col) ++
        rightVals.map(c => col(s"asof_$c")): _*)
  }
}
