package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators over embedding columns (the UDAF surface of the
  * engine — SURVEY.md §2.3 "UDF/UDAF/UDTF").
  *
  * Centroid: element-wise mean of ARRAY<FLOAT> vectors. Buffer is
  * (running FIXED-POINT sums, count) — associative and commutative, so
  * Spark performs partial aggregation map-side and merges buffers on the
  * reduce side: shuffle volume is O(groups × dim), not O(rows × dim).
  *
  * DETERMINISM: components are accumulated as 2^-24-grid fixed-point
  * longs (`rint(v * 2^24)`; the scale is a power of two, so the product
  * is an exact double and the rounding is reproducible), NOT as floating
  * doubles — integer addition is order-free, so the centroid is
  * BIT-IDENTICAL across partitionings, retries, and cluster layouts.
  * A double-sum centroid changes in the last ulp with partition order,
  * which makes an IVF index build non-reproducible (same corpus, two
  * builds, different list assignments) and un-oracle-able. The grid
  * quantization error is ≤ 2^-25 per element per row — 5 decimal places
  * below the 4-dp rounding every consumer applies. Overflow bound:
  * |v| ≤ V ⇒ safe up to 2^39/V rows per group.
  */
object VectorAggregates {

  /** Fixed-point scale: 2^24 (exact as a double multiplier). */
  val CentroidScale = 16777216.0

  final case class CentroidBuf(sums: Array[Long], n: Long)

  /** Element-wise mean aggregator; empty input → empty vector. Vectors of
    * differing lengths contribute up to their own length (missing tail
    * treated as absent, count tracked globally — inputs are expected
    * fixed-width).
    */
  class Centroid(dim: Int)
      extends Aggregator[Array[Float], CentroidBuf, Array[Float]] {

    override def zero: CentroidBuf = CentroidBuf(new Array[Long](dim), 0L)

    override def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf = {
      if (v != null) {
        val n = math.min(dim, v.length)
        var i = 0
        while (i < n) {
          b.sums(i) += math.rint(v(i) * CentroidScale).toLong
          i += 1
        }
        CentroidBuf(b.sums, b.n + 1)
      } else b
    }

    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      CentroidBuf(a.sums, a.n + b.n)
    }

    override def finish(b: CentroidBuf): Array[Float] =
      if (b.n == 0) Array.empty
      else {
        val out = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          // (sum / n) / 2^24 — keep this exact operation order: the
          // oracle replicates it fp-step for fp-step
          out(i) = ((b.sums(i).toDouble / b.n) / CentroidScale).toFloat
          i += 1
        }
        out
      }

    override def bufferEncoder: Encoder[CentroidBuf] =
      Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Array[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
  }

  def centroid(dim: Int): TypedColumn[Array[Float], Array[Float]] =
    new Centroid(dim).toColumn
}
