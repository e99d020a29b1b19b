package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-exposed V2 `bucket` FUNCTION behind the bucketed table
  * layout ([[TxnTable.BucketSpec]]). Spark's storage-partitioned join
  * resolves a scan-reported `bucket(n, col)` transform by loading this
  * function from the table's catalog ([[GraftCatalog.loadFunction]])
  * and binding it to (numBuckets: INT, col) — the bound function's
  * `canonicalName` is what both join sides must agree on for the
  * shuffle-free plan, and `produceResult` is what Spark evaluates when
  * it chooses to SHUFFLE the unbucketed side into the layout
  * (`spark.sql.sources.v2.bucketing.shuffle.enabled`), so it must
  * compute the EXACT assignment the writer used: Murmur3(seed 42) of
  * the value, pmod n — Spark's own `repartition(n, col)` rule, shared
  * with the read-side pruner via [[TxnTable.bucketOf]].
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col): the graft bucketed-layout hash — " +
      "pmod(murmur3_42(col), numBuckets)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket(numBuckets, col) takes 2 arguments, got " +
        s"${inputType.fields.length}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket: numBuckets must be INT, got ${inputType.fields(0).dataType}")
    val colType = inputType.fields(1).dataType
    colType match {
      case IntegerType | LongType | StringType | DateType =>
        new GraftBucketBound(colType)
      case other => throw new UnsupportedOperationException(
        s"graft bucket layout supports INT/BIGINT/STRING/DATE bucket " +
          s"columns, got $other")
    }
  }
}

class GraftBucketBound(colType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, colType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  // one canonical identity per column type: two graft scans reporting
  // bucket(n, col) over the same-typed key compare equal, which is the
  // compatibility check SPJ performs before dropping the shuffle
  override def canonicalName(): String = s"graft.bucket($colType)"
  override def isResultNullable: Boolean = false

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    // NULL hashes to the seed under Spark's HashPartitioning — mirror
    // that so a shuffled-side NULL lands where the writer put it
    val h: Int =
      if (input.isNullAt(1)) 42
      else colType match {
        case IntegerType | DateType =>
          org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashInt(input.getInt(1), 42)
        case LongType =>
          org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashLong(input.getLong(1), 42)
        case StringType =>
          val u = input.getUTF8String(1)
          org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42)
        case other => throw new IllegalStateException(
          s"unreachable: unbound type $other")
      }
    ((h % n) + n) % n
  }
}
