package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen-callable kernel for the FNV-1a fold over a UTF8String's
  * bytes. A top-level object WITHOUT a companion class, so scalac emits
  * static forwarders (`graft.functions.FnvKernel.cont(...)`) that the
  * generated Java can call directly — no per-row `UTF8String.toString`
  * allocation, no MODULE$ plumbing in the template. Delegates to the
  * single Scala source of truth ([[graft.util.Hashing.fnvContUtf8]]);
  * OpsSpec pins codegen == interpreted == Hashing.fnv.
  */
object FnvKernel {
  def cont(state: Long, s: UTF8String): Long =
    graft.util.Hashing.fnvContUtf8(state, s)
}

/** `graft_fnv64_cont(state, s)` — CONTINUE the FNV-1a 64-bit fold from
  * a prior state. FNV-1a is a strict left fold over UTF-16 code units,
  * so `graft_fnv64_cont(graft_fnv64(p), s) = graft_fnv64(concat(p, s))`
  * bit for bit. The hot-loop consumers (bootstrap resampling, the
  * Count-Min bucket hash) use it to hoist the per-row string build out
  * of the exploded stage: hash the row-varying prefix ONCE before the
  * explode (or constant-fold it at plan time), then continue the fold
  * over the short suffix per exploded row — same hash values, so the
  * DuckDB oracles (which replay the full concat in HUGEINT) are
  * untouched.
  */
case class FnvHash64Cont(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_fnv64_cont"

  override protected def nullSafeEval(state: Any, s: Any): Any =
    graft.util.Hashing.fnvContUtf8(
      state.asInstanceOf[Long], s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (state, s) =>
      s"${ev.value} = graft.functions.FnvKernel.cont($state, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FnvHash64Cont =
    copy(left = newLeft, right = newRight)
}

object FnvHash64Cont {

  val name = "graft_fnv64_cont"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[FnvHash64Cont].getCanonicalName, null, name,
    "_FUNC_(state, s) - continue the FNV-1a 64-bit fold from state over s's UTF-16 code units.",
    "", "", "", "", "", "", "scala_udf")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$name takes exactly 2 arguments")
    FnvHash64Cont(exprs.head, exprs(1))
  }

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Column API over the registered function. */
  def fnv64Cont(state: Column, s: Column): Column =
    call_function(name, state, s)
}
