package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.functions.{call_function, lit, regexp_replace}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode normalization (NFC / NFD /
  * NFKC / NFKD) of a string column, with whole-stage codegen.
  *
  * Spark ships no normalizer builtin, and the usual fallback (a Scala
  * UDF over `Normalizer.normalize`) breaks whole-stage codegen and adds
  * an encoder round-trip per row. This expression stays inside the
  * generated plan: one static `java.text.Normalizer.normalize` call on
  * the row's UTF8String. Text-curation pipelines normalize EVERY
  * document exactly once, so the per-row cost is the scan cost.
  *
  * The normalization form is a plan-time parameter (a foldable string
  * literal in the SQL surface), never a per-row value — the generated
  * code references the enum constant directly.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(s.asInstanceOf[UTF8String].toString, form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.${form.name()}));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  val name = "graft_normalize"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[UnicodeNormalize].getCanonicalName, null, name,
    "_FUNC_(s, form) - Unicode-normalize s to NFC/NFD/NFKC/NFKD.",
    "", "", "", "", "", "", "scala_udf")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$name takes exactly 2 arguments")
    val form = exprs(1) match {
      case Literal(s: UTF8String, StringType) =>
        Normalizer.Form.valueOf(s.toString.toUpperCase(java.util.Locale.ROOT))
      case other => throw new IllegalArgumentException(
        s"$name form must be a string literal, got $other")
    }
    UnicodeNormalize(exprs.head, form)
  }

  /** Register in the session's function registry (idempotent); use via
    * `call_function` or SQL `graft_normalize(s, 'NFC')`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Column API over the registered function. */
  def normalize(s: Column, form: String): Column =
    call_function(name, s, lit(form.toUpperCase(java.util.Locale.ROOT)))

  /** Accent stripping as NFD decomposition + combining-mark removal —
    * the utf8proc `strip_accents` recipe, composed from the native
    * normalizer and Spark's codegen'd regexp (no UDF). The result of
    * mark removal over Latin text is ASCII, so no re-composition pass
    * is needed.
    */
  def stripAccents(s: Column): Column =
    regexp_replace(normalize(s, "NFD"), "\\p{M}", "")
}
