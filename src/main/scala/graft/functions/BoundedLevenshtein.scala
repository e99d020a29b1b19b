package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `graft_lev_bounded(s1, s2, k)` —
  * thresholded Levenshtein: the exact distance when ≤ k, else k + 1
  * ([[graft.util.StringAlgos.boundedLev]]).
  *
  * Spark's builtin `levenshtein` runs the FULL O(n·m) DP on every
  * pair, but a fuzzy-dedup probe only asks "within k?" — the banded
  * early-abandon kernel is O(min(n,m)·(2k+1)) and bails the moment a
  * whole band row exceeds k, which on far pairs (the overwhelming
  * majority of any blocked candidate set) is after a handful of rows.
  * Codegen emits one static call into the shared kernel, so the probe
  * stays inside whole-stage codegen (no UDF encoder round-trip, no
  * codegen fence). OpsSpec pins codegen == interpreted ==
  * min(builtin levenshtein, k+1).
  */
case class BoundedLevenshtein(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, IntegerType)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_lev_bounded"

  override protected def nullSafeEval(s1: Any, s2: Any, k: Any): Any =
    graft.util.StringAlgos.boundedLev(
      s1.asInstanceOf[UTF8String].toString,
      s2.asInstanceOf[UTF8String].toString,
      k.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, kk) =>
      s"${ev.value} = graft.util.StringAlgos.boundedLev(" +
        s"$a.toString(), $b.toString(), $kk);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BoundedLevenshtein =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BoundedLevenshtein {

  val name = "graft_lev_bounded"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BoundedLevenshtein].getCanonicalName, null, name,
    "_FUNC_(s1, s2, k) - Levenshtein distance if <= k, else k + 1 " +
      "(banded DP with early abandon).",
    "", "", "", "", "", "", "scala_udf")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"$name takes exactly 3 arguments")
    BoundedLevenshtein(exprs(0), exprs(1), exprs(2))
  }

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Column API over the registered function. */
  def levBounded(s1: Column, s2: Column, k: Column): Column =
    call_function(name, s1, s2, k)
}
