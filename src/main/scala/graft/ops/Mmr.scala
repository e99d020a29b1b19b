package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MAXIMAL MARGINAL RELEVANCE re-ranking: greedily pick `select` items
  * from a relevance-ranked candidate pool, each step maximizing
  * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s) — the diversity-aware
  * retrieval head every RAG / training-example-selection stack wants
  * on top of plain top-k.
  *
  * Scale split: the candidate POOL is produced by the distributed
  * exact top-k kernel ([[Similarity.bruteForceTopK]] — at cluster
  * scale, swap in the IVF/LSH variants); the greedy loop then runs
  * driver-side over the collected poolSize×poolSize cosine matrix,
  * which is BOUNDED BY CONSTRUCTION (poolSize², independent of corpus
  * size) — the same bounded-collect contract as the IVF centroid
  * tables. Determinism: relevances and pairwise sims are rounded to
  * 4 dp (HALF_UP, Spark's round semantics), MMR scores to 6 dp, and
  * every argmax tie-breaks on the id — replayable as unrolled SQL.
  */
object Mmr {

  private def r(x: Double, scale: Int): Double =
    new JBigDecimal(x).setScale(scale, RoundingMode.HALF_UP).doubleValue()

  /** (rank, vec_id, relevance) for the `select` MMR picks. */
  def rerank(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      poolSize: Int,
      select: Int,
      lambda: Double): DataFrame = {
    require(select >= 1 && select <= poolSize, "need 1 <= select <= pool")
    val spark = df.sparkSession
    val pool = Similarity
      .bruteForceTopK(df, idCol, vecCol, query, poolSize)
      .select(col("vec_id"), round(col("cosine"), 4).as("rel"))
      .collect()
      .map(row => row.getLong(0) -> row.getDouble(1))
    require(pool.length >= select,
      s"MMR: pool has ${pool.length} candidates, need >= $select")
    val ids = pool.map(_._1)
    val vecs: Map[Long, Array[Double]] = df
      .filter(col(idCol).cast("long").isin(ids: _*))
      .select(col(idCol).cast("long"),
        col(vecCol).cast("array<double>"))
      .collect()
      .map(row => row.getLong(0) ->
        row.getSeq[Double](1).toArray)
      .toMap
    // pairwise cosines: plain left-to-right double folds — the same
    // accumulation order as the SQL engines' list_dot_product loops
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0d; var na = 0.0d; var nb = 0.0d; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      r(dot / (math.sqrt(na) * math.sqrt(nb)), 4)
    }
    val sim: Map[(Long, Long), Double] = (for {
      x <- ids; y <- ids if x != y
    } yield (x, y) -> cos(vecs(x), vecs(y))).toMap
    val rel = pool.toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    // seed: highest relevance (pool is already (rel desc, id) ordered)
    selected += pool.head._1
    while (selected.size < select) {
      val best = ids.filterNot(selected.contains)
        .map { d =>
          val ms = selected.map(sm => sim((d, sm))).max
          (d, r(lambda * rel(d) - (1.0 - lambda) * ms, 6))
        }
        .minBy { case (d, score) => (-score, d) }
      selected += best._1
    }
    val rows = selected.zipWithIndex.map { case (id, i) =>
      Row(i + 1L, id, rel(id))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("relevance", DoubleType, nullable = false))))
  }
}
