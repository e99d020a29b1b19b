package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the storage-layout lever for
  * multi-dimensional pruning at 100 TB. A table sorted on one column
  * prunes scans on that column only; a table written in z-value order
  * keeps EVERY interleaved dimension locally dense, so parquet
  * row-group/file min-max footers prune box predicates on any of them.
  *
  * Everything is pure Column arithmetic (codegen'd; one global min/max
  * aggregation per call brings 2·k doubles to the driver, never data):
  * each column is scaled to a `bits`-wide integer rank, ranks are bit-
  * interleaved into one long, and the write is range-partitioned +
  * sorted by that z-value — the standard OPTIMIZE ZORDER BY shape,
  * expressed with stock Spark operators.
  */
object ZOrder {

  /** Bit-interleaved z-value from pre-scaled integer ranks (rank i
    * contributes its bit b at position b·k + i).
    */
  private[ops] def interleave(ranks: Seq[Column], bits: Int): Column = {
    val k = ranks.length
    val terms = for {
      b <- 0 until bits
      i <- 0 until k
    } yield shiftleft(
      shiftright(ranks(i), b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Adds `z_value`: global min/max per column (one aggregation),
    * linear scale to [0, 2^bits), interleave. Ties/NULLs rank 0.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    require(cols.nonEmpty && cols.length * bits <= 63,
      s"${cols.length} cols × $bits bits exceeds a long")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("double")).as(s"${c}__mn"),
        max(col(c).cast("double")).as(s"${c}__mx")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val maxRank = (1L << bits) - 1
    val ranks = cols.map { c =>
      val mn = row.getAs[Double](s"${c}__mn")
      val mx = row.getAs[Double](s"${c}__mx")
      val scaled =
        if (mx == mn) lit(0L)
        else least(lit(maxRank),
          floor((col(c).cast("double") - lit(mn)) / lit(mx - mn) *
            lit(maxRank + 1.0)).cast("long"))
      coalesce(scaled, lit(0L))
    }
    df.withColumn("z_value", interleave(ranks, bits))
  }

  /** Range-partition by z-value into ~`numFiles` sorted files. Files
    * then carry tight min-max footers in ALL interleaved dimensions.
    */
  def writeZOrdered(df: DataFrame, cols: Seq[String], path: String,
      numFiles: Int, bits: Int = 16): Unit =
    withZValue(df, cols, bits)
      .repartitionByRange(numFiles, col("z_value"))
      .sortWithinPartitions("z_value")
      .drop("z_value")
      .write.mode("overwrite").parquet(path)
}
