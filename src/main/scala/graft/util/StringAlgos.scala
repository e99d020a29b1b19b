package graft.util

/** String kernels called from GENERATED code (whole-stage codegen
  * emits a static call into this object — the same pattern Spark's own
  * `levenshtein` uses via UTF8String), so the object must stay
  * top-level public with JVM static forwarders.
  */
object StringAlgos {

  /** BANDED Levenshtein with EARLY ABANDON: the exact distance when it
    * is ≤ k, else k + 1. The DP visits only the |i − j| ≤ k diagonal
    * band — O(min(n,m)·(2k+1)) instead of O(n·m) — and returns the
    * moment an entire band row exceeds k (no suffix can repair it).
    * This is the thresholded-dedup workhorse: a fuzzy-join probe asks
    * "within k?" and never needs the exact distance of far pairs, so
    * paying full quadratic DP (Spark's builtin `levenshtein`) on
    * every candidate is wasted work that grows with document length.
    */
  def boundedLev(a: String, b: String, k: Int): Int = {
    if (k < 0) return 0
    val n = a.length
    val m = b.length
    if (math.abs(n - m) > k) return k + 1
    val inf = k + 1
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      var best = inf
      if (i <= k) { cur(0) = i; best = i }
      var jj = math.max(1, i - k)
      val hi = math.min(m, i + k)
      while (jj <= hi) {
        val cost = if (a.charAt(i - 1) == b.charAt(jj - 1)) 0 else 1
        var v = prev(jj - 1) + cost
        val del = prev(jj) + 1
        val ins = cur(jj - 1) + 1
        if (del < v) v = del
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(jj) = v
        if (v < best) best = v
        jj += 1
      }
      if (best >= inf) return inf // whole band > k: abandon
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    math.min(prev(m), inf)
  }
}
