package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators over embedding columns (the UDAF surface of the
  * engine — SURVEY.md §2.3 "UDF/UDAF/UDTF").
  *
  * Centroid: element-wise mean of ARRAY<FLOAT> vectors. Buffer is
  * (running double sums, count) — associative and commutative, so Spark
  * performs partial aggregation map-side and merges buffers on the
  * reduce side: shuffle volume is O(groups × dim), not O(rows × dim).
  */
object VectorAggregates {

  final case class CentroidBuf(sums: Array[Double], n: Long)

  /** Element-wise mean aggregator; empty input → empty vector. Vectors of
    * differing lengths contribute up to their own length (missing tail
    * treated as absent, count tracked globally — inputs are expected
    * fixed-width).
    */
  class Centroid(dim: Int)
      extends Aggregator[Array[Float], CentroidBuf, Array[Float]] {

    override def zero: CentroidBuf = CentroidBuf(new Array[Double](dim), 0L)

    override def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf = {
      if (v != null) {
        val n = math.min(dim, v.length)
        var i = 0
        while (i < n) { b.sums(i) += v(i); i += 1 }
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
        while (i < dim) { out(i) = (b.sums(i) / b.n).toFloat; i += 1 }
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
