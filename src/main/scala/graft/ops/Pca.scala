package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening over an embedding column — the
  * dimensionality-reduction stage of a vector-corpus pipeline (IVF
  * coarse quantizers, OPQ-style preprocessing, and embedding-drift
  * monitoring all start from exactly this decomposition).
  *
  * Scale design: the ONLY thing that crosses the cluster is a single
  * `Aggregator` pass accumulating (n, Σv, upper triangle of Σvvᵀ) —
  * O(d²) doubles per partition, combined map-side, one row to the
  * driver. The eigendecomposition runs on the driver over the d×d
  * covariance (d=64 → microseconds; the standard RowMatrix
  * /computePrincipalComponents shape, re-derived here DataFrame-native
  * so the moment pass rides whole-stage codegen's partial aggregation
  * instead of an RDD treeAggregate). Projection is a per-partition
  * k·d-flop loop over a broadcast-small basis — narrow, no shuffle.
  *
  * No step collects data rows: at 100 TB the moment pass is one scan,
  * the model is 64×64 doubles, and projection is embarrassingly
  * parallel.
  */
object Pca {

  /** One-pass raw moments: count, per-dim sum, and the upper triangle
    * of the second-moment matrix Σ v vᵀ, flattened row-major
    * (i ≤ j → index i*d - i*(i-1)/2 + (j-i)).
    */
  final case class Moments(
      n: Long, sum: Array[Double], upper: Array[Double])

  private final class MomentsAgg(d: Int)
      extends Aggregator[Array[Float], Moments, Moments] {
    private val tri = d * (d + 1) / 2
    override def zero: Moments =
      Moments(0L, new Array[Double](d), new Array[Double](tri))
    override def reduce(m: Moments, v: Array[Float]): Moments = {
      require(v.length == d, s"expected dim $d, got ${v.length}")
      var i = 0
      var t = 0
      while (i < d) {
        val vi = v(i).toDouble
        m.sum(i) += vi
        var j = i
        while (j < d) { m.upper(t) += vi * v(j).toDouble; t += 1; j += 1 }
        i += 1
      }
      Moments(m.n + 1, m.sum, m.upper)
    }
    override def merge(a: Moments, b: Moments): Moments = {
      var i = 0
      while (i < d) { a.sum(i) += b.sum(i); i += 1 }
      var t = 0
      while (t < tri) { a.upper(t) += b.upper(t); t += 1 }
      Moments(a.n + b.n, a.sum, a.upper)
    }
    override def finish(m: Moments): Moments = m
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Fitted model: `components(c)` is the c-th principal axis (rows of
    * Vᵀ), eigenvalues descending. Sign convention: each axis's
    * largest-|entry| coordinate is positive, so the basis is a pure
    * function of the data (eigensolvers are sign-ambiguous per vector).
    */
  final case class Model(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def k: Int = components.length
    def d: Int = mean.length
  }

  /** One distributed pass + driver-side d×d eigendecomposition. */
  def fit(df: DataFrame, vecCol: String, d: Int, k: Int): Model = {
    require(k >= 1 && k <= d, s"k=$k out of range [1,$d]")
    val spark = df.sparkSession
    import spark.implicits._
    val m = df.select(col(vecCol)).as[Array[Float]]
      .select(new MomentsAgg(d).toColumn).head()
    require(m.n > 1, "PCA needs at least 2 rows")
    val n = m.n.toDouble
    val mean = m.sum.map(_ / n)
    // Covariance (biased, /n — matches the population variance the
    // per-dimension stats queries report).
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = m.upper(t) / n - mean(i) * mean(j)
        cov(i, j) = c
        cov(j, i) = c
        t += 1
        j += 1
      }
      i += 1
    }
    val es = breeze.linalg.eigSym(cov) // eigenvalues ascending
    val order = (0 until d).sortBy(c => -es.eigenvalues(c)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(d)(r => es.eigenvectors(r, c))
      var mi = 0
      var r = 1
      while (r < d) { if (math.abs(v(r)) > math.abs(v(mi))) mi = r; r += 1 }
      if (v(mi) < 0) v.map(-_) else v
    }.toArray
    Model(mean, comps, order.map(c => math.max(0.0, es.eigenvalues(c))).toArray)
  }

  /** Projection onto the fitted basis: `(id, proj, pnorm2)` where
    * `proj(c) = (v - mean)·components(c)` and `pnorm2 = |proj|²`.
    * Per-partition tight loop over the broadcast model — narrow plan,
    * zero shuffle.
    */
  def project(
      df: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val mdl = bc.value
        val d = mdl.d
        val kk = mdl.k
        it.map { case (id, v) =>
          val centered = new Array[Double](d)
          var i = 0
          while (i < d) { centered(i) = v(i).toDouble - mdl.mean(i); i += 1 }
          val proj = new Array[Double](kk)
          var c = 0
          var n2 = 0.0
          while (c < kk) {
            val axis = mdl.components(c)
            var s = 0.0
            var j = 0
            while (j < d) { s += centered(j) * axis(j); j += 1 }
            proj(c) = s
            n2 += s * s
            c += 1
          }
          (id, proj, n2)
        }
      }
      .toDF(idCol, "proj", "pnorm2")
  }
}
