package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string self-join with EXACT-RECALL blocking — the scalable
  * "find records whose key differs by a typo" primitive (entity
  * resolution, near-identical identifiers, OCR noise).
  *
  * Blocking is the symmetric-delete (SymSpell/FastSS) scheme: for edit
  * distance ≤ 1, two strings must share an element of their delete-1
  * neighborhoods (the string itself plus every single-character
  * deletion), so bucketing on neighborhood hashes has recall 1.0 by
  * construction — unlike length/prefix blocking, no true pair can be
  * missed. Candidates are verified with Spark's banded
  * `levenshtein(l, r, threshold)` (O(k·n) early-exit, codegen'd).
  *
  * Scale shape: identical to [[Dedup.minHashPairs]] — explode to
  * (id, variant-hash), ONE shuffle on the hash, capped buckets, pair
  * dedup before the verify join. A string of length n produces n+1
  * variants, so the exploded table is O(total chars), not O(pairs).
  */
object FuzzyJoin {

  /** Distinct FNV hashes of s and each of its single-char deletions. */
  private[ops] def deleteVariants(s: String): Array[Long] = {
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    import graft.util.Hashing.fnv
    out.add(fnv(s))
    var i = 0
    while (i < s.length) {
      out.add(fnv(new StringBuilder(s).deleteCharAt(i)))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }

  private val variantsUdf =
    udf((s: String) => deleteVariants(Option(s).getOrElse("")))

  private val bucketPairsUdf =
    udf((ids: Seq[Long]) => graft.util.Hashing.bucketPairs(ids))

  /** All pairs with levenshtein(str_a, str_b) ≤ 1, as
    * (id_a, id_b, lev). Exact (recall 1.0) up to `maxBucketSize`
    * truncation on pathological buckets.
    */
  def pairsWithin1(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxBucketSize: Int = 1024
  ): DataFrame = {
    val strs = df.select(col(idCol).cast("long").as("fid"),
      col(strCol).as("fstr"))
    val banded = strs.select(col("fid"),
      explode(variantsUdf(col("fstr"))).as("bucket"))
    val candidates = banded
      .groupBy("bucket")
      .agg(slice(sort_array(collect_list(col("fid"))), 1, maxBucketSize)
        .as("ids"))
      .filter(size(col("ids")) >= 2)
      .select(explode(bucketPairsUdf(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()
    candidates
      .join(strs.select(col("fid").as("id_a"), col("fstr").as("str_a")), Seq("id_a"))
      .join(strs.select(col("fid").as("id_b"), col("fstr").as("str_b")), Seq("id_b"))
      .withColumn("lev", levenshtein(col("str_a"), col("str_b"), 1))
      .filter(col("lev") >= 0) // banded levenshtein returns -1 beyond k
      .select("id_a", "id_b", "lev")
  }
}
