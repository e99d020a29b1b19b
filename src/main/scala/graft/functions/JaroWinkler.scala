package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Jaro-Winkler similarity with whole-stage codegen —
  * the record-linkage scorer (name/title matching after blocking).
  *
  * Spark has `levenshtein` but no Jaro-Winkler; a Scala UDF would put
  * an encoder round-trip and a codegen fence inside the block-join's
  * only wide stage, exactly where the pair volume peaks. This
  * expression keeps the scorer inside the generated plan (the
  * generated code calls the shared static kernel — one algorithm
  * definition for interpreted, codegen, and spec paths).
  *
  * Semantics are pinned to DuckDB 1.0 `jaro_winkler_similarity`
  * (empirically verified, OpsSpec carries the vectors):
  *   - either side empty → 0.0 (even when both are empty);
  *   - match window `max(0, max(len)/2 - 1)` (so "ab" vs "ba" → 0.0);
  *   - Winkler prefix boost (scale 0.1, prefix capped at 4) applied
  *     only when the Jaro score exceeds 0.7.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def dataType: DataType = DoubleType

  override def prettyName: String = JaroWinkler.name

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.similarity(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) =>
      s"""${ev.value} = graft.functions.JaroWinklerAlgo.similarity(
         |  $c1.toString(), $c2.toString());""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** The scoring kernel. A plain top-level object (no companion class)
  * so scalac emits a true static `similarity` the generated Java can
  * call directly.
  */
object JaroWinklerAlgo {

  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(i + md, l2 - 1)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md2 = m.toDouble
    val jaro = (md2 / l1 + md2 / l2 + (md2 - trans / 2.0) / md2) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val pMax = math.min(4, math.min(l1, l2))
    while (p < pMax && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + 0.1 * p * (1.0 - jaro)
  }
}

object JaroWinkler {

  val name = "graft_jaro_winkler"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[JaroWinkler].getCanonicalName, null, name,
    "_FUNC_(a, b) - Jaro-Winkler similarity in [0,1] " +
      "(DuckDB-compatible: 0.7 boost threshold, prefix scale 0.1).",
    "", "", "", "", "", "", "scala_udf")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$name takes exactly 2 arguments")
    JaroWinkler(exprs.head, exprs(1))
  }

  /** Register in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Column API over the registered function. */
  def jaroWinkler(a: Column, b: Column): Column = call_function(name, a, b)
}
