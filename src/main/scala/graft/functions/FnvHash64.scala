package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the library's FNV-1a 64-bit string
  * hash ([[graft.util.Hashing.fnv]] — UTF-16 code units), with
  * whole-stage codegen.
  *
  * The KMV sketch build ([[graft.ops.Sketch]]) hashes every DISTINCT
  * (group, token) pair; as a Scala UDF that is an encoder round-trip
  * per row and a codegen fence in the middle of the sketch's only
  * corpus-sized stage. This expression keeps the hash inside the
  * generated plan.
  *
  * The FNV constants appear once in Scala ([[graft.util.Hashing]],
  * which the interpreted path delegates to) and once in the generated
  * Java template below; OpsSpec pins codegen == interpreted ==
  * Hashing.fnv so the copies cannot drift silently. The DuckDB oracles
  * replicate the same fold in HUGEINT arithmetic (Duck.fnv).
  */
case class FnvHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_fnv64"

  override protected def nullSafeEval(s: Any): Any =
    graft.util.Hashing.fnvUtf8(s.asInstanceOf[UTF8String])

  // r16: hash the UTF8String's bytes in place (decode UTF-8 → UTF-16
  // code units inside the fold) instead of `toString()` — the per-row
  // String alloc + transcode was the dominant per-row cost for the
  // KMV/bootstrap consumers. Kernel shared with the interpreted path
  // via the FnvKernel static forwarder; OpsSpec still pins
  // codegen == interpreted == Hashing.fnv(String).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FnvKernel.cont(0xcbf29ce484222325L, $c);")

  override protected def withNewChildInternal(
      newChild: Expression): FnvHash64 =
    copy(child = newChild)
}

object FnvHash64 {

  val name = "graft_fnv64"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[FnvHash64].getCanonicalName, null, name,
    "_FUNC_(s) - FNV-1a 64-bit hash of s over UTF-16 code units.",
    "", "", "", "", "", "", "scala_udf")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"$name takes exactly 1 argument")
    FnvHash64(exprs.head)
  }

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Column API over the registered function. */
  def fnv64(s: Column): Column = call_function(name, s)
}
