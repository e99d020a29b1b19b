package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, Literal, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}

/** Native Catalyst GENERATOR: word w-shingle FNV-1a hashes of a text
  * column as (pos, shingle_hash) rows — the table-function role
  * (`LATERAL VIEW graft_shingles(text, 3)`), completing the custom
  * Catalyst surface matrix (scalar expression, typed UDAF, LogicalPlan
  * + Strategy + Exec, optimizer rules, DSv2 connector — and now a
  * Generator).
  *
  * Versus the UDF-returning-array + explode composition the dedup
  * kernels use, a generator streams rows out without materializing the
  * per-document hash array — on multi-megabyte documents that
  * intermediate is real memory. Tokenization is the library-canonical
  * `lower → split [^a-z0-9_]+ → drop empties`; the hash is
  * [[graft.util.Hashing.fnv]] over the space-joined shingle, so DuckDB
  * oracles replay it with the standard HUGEINT fold.
  *
  * The shingle width is a plan-time literal (like the normalizer's
  * form); per-row widths would defeat the generator's static schema.
  */
case class WordShingles(child: Expression, width: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(width >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingles needs a STRING input, got ${child.dataType}")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle_hash", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    // Locale.ROOT: default-locale toLowerCase folds 'I' to dotless-i
    // under tr_TR, changing word boundaries vs Spark/DuckDB lower()
    val words = raw.toString.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9_]+").filter(_.nonEmpty)
    if (words.length < width) Nil
    else new Iterator[InternalRow] {
      private var i = 0
      private val last = words.length - width
      override def hasNext: Boolean = i <= last
      override def next(): InternalRow = {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < width) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        val row = InternalRow(i, graft.util.Hashing.fnv(sb))
        i += 1
        row
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}

object WordShingles {

  val name = "graft_shingles"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordShingles].getCanonicalName, null, name,
    "_FUNC_(text, w) - rows of (pos, fnv64 hash) for each word w-shingle.",
    "", "", "", "", "", "", "scala_udf")

  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"$name takes exactly 2 arguments")
    val w = exprs(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name width must be an integer literal, got $other")
    }
    WordShingles(exprs.head, w)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
