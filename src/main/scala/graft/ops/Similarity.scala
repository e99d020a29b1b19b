package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor similarity search over an embedding column
  * (`ARRAY<FLOAT>`).
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k as pure Column expressions
  *     (`zip_with` dot product + `aggregate` fold), fully codegen'd, no
  *     UDF. Scan-shaped: at 100 TB this is one narrow pass + a global
  *     top-k (Spark's TakeOrderedAndProject — no full sort, no wide
  *     shuffle). The baseline every ANN variant is measured against.
  *   - [[lshTopK]] — random-hyperplane LSH bucket pruning: probe only
  *     buckets within `probeHamming` bits of the query's bucket. Cuts the
  *     scanned fraction to ~sum(C(planes,i))/2^planes (e.g. 16 planes,
  *     probe<=2: ~0.2%) at some recall cost; recall is measured in
  *     SimilaritySpec against the brute-force truth.
  */
object Similarity {

  /** Cosine similarity of an ARRAY<FLOAT> column against a constant query
    * vector, as a codegen-friendly Column expression (no UDF): dot product
    * via zip_with + aggregate; norms likewise. Kept as the
    * built-ins-only formulation; the hot paths below use the fused native
    * expression (graft.functions.CosineSimilarity), which computes the
    * same value without the per-row intermediate array.
    */
  def cosineCol(vec: Column, query: Array[Float]): Column = {
    val q = array(query.map(v => lit(v.toDouble)): _*)
    val dot = aggregate(
      zip_with(vec, q, (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)
    val nv = sqrt(aggregate(
      zip_with(vec, vec, (a, b) => a * b), lit(0.0d), (acc, x) => acc + x))
    val nq = math.sqrt(query.map(v => v.toDouble * v).sum)
    when(nv === 0.0 || lit(nq) === 0.0, 0.0)
      .otherwise(dot / (nv * lit(nq)))
  }

  /** Native-expression cosine against a literal query vector. */
  private def cosineNative(df: DataFrame, vec: Column, query: Array[Float]): Column = {
    graft.functions.CosineSimilarity.register(df.sparkSession)
    graft.functions.CosineSimilarity.cosine(
      vec, array(query.map(lit(_)): _*))
  }

  /** Exact cosine top-k: narrow scan + TakeOrderedAndProject. */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int
  ): DataFrame =
    df.select(
        col(idCol).cast("long").as("vec_id"),
        cosineNative(df, col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)

  /** LSH-pruned approximate top-k. Deterministic hyperplanes shared with
    * Dedup.embeddingNearDup. At scale, persist the bucketed table
    * (partitioned by bucket) and this becomes a partition-pruned scan.
    */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      numPlanes: Int = 16,
      probeHamming: Int = 2,
      dim: Int = 768
  ): DataFrame = {
    val planes = Dedup.hyperplanes(numPlanes, dim)
    val qBucket = Dedup.hyperplaneBucket(query, planes)
    val bucketU = udf((v: Array[Float]) => Dedup.hyperplaneBucket(v, planes))
    df.select(
        col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("v"))
      .withColumn("bucket", bucketU(col("v")))
      .filter(bit_count(col("bucket").bitwiseXOR(lit(qBucket))) <= probeHamming)
      .select(col("vec_id"), cosineNative(df, col("v"), query).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** All-pairs exact top-k join for a (small, broadcastable) query set:
    * each query row gets its k nearest from the corpus. Broadcast the
    * queries, never the corpus.
    */
  def topKJoin(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      k: Int
  ): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val joined = corpus
      .select(col(corpusId).cast("long").as("corpus_id"),
        col(corpusVec).as("cv"))
      .crossJoin(broadcast(queries.select(
        col(queryId).cast("long").as("query_id"), col(queryVec).as("qv"))))
      .withColumn("cosine",
        graft.functions.CosineSimilarity.cosine(col("cv"), col("qv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }
}
