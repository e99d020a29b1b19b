package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity of two INT8-QUANTIZED
  * vectors (ARRAY<TINYINT>, see ops/Quantize) — the quantized sibling of
  * [[CosineSimilarity]].
  *
  * Per-vector scales cancel out of the cosine, so the kernel is pure
  * integer multiply-accumulate until the final division: long arithmetic
  * (exact — |sum| ≤ dim·127² never overflows), one byte load per element,
  * 4× less memory traffic than the float kernel. The higher-order
  * `zip_with`+`aggregate` formulation (Quantize.cosineQ) is kept as the
  * built-ins-only baseline; this fused loop removes its per-row array
  * allocation and lambda dispatch on the 100 TB scan path.
  */
case class CosineSimilarityQ(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine_q"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0L else x.getByte(i).toLong
      val yi = if (y.isNullAt(i)) 0L else y.getByte(i).toLong
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0L || nb == 0L) 0.0
    else dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L; long $na = 0L; long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = $a.isNullAt($i) ? 0L : (long) $a.getByte($i);
         |  long $yi = $b.isNullAt($i) ? 0L : (long) $b.getByte($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ($na == 0L || $nb == 0L) ? 0.0 :
         |  $dot / (java.lang.Math.sqrt((double) $na) *
         |          java.lang.Math.sqrt((double) $nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityQ =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityQ {

  val name = "graft_cosine_q"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarityQ].getCanonicalName, null, name,
    "_FUNC_(qa, qb) - cosine similarity of two int8-quantized vectors.",
    "", "", "", "", "", "", "scala_udf")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$name takes exactly 2 arguments")
    CosineSimilarityQ(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  def cosineQ(a: Column, b: Column): Column = call_function(name, a, b)
}
