package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.SimpleTokenizer

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All but the
  * fingerprint/BPE counters are pure Column expressions (codegen'd,
  * oracle-replicable in SQL).
  */
object TextAnalysis {

  import graft.util.Hashing.fnv

  /** Tiny function-word lists per language — enough signal for a
    * stopword-ratio heuristic language ID. Deliberately SQL-expressible
    * (array_contains over a literal list) so the oracle can replicate it.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "de", "que", "en", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "dans", "pour", "une")
  )

  /** Count of words belonging to `lang`'s stopword list.
    *
    * Implemented as `\b(w1|w2|...)\b` occurrence counting rather than
    * split-then-filter: Java's `\b` is defined against `\w` =
    * `[a-zA-Z0-9_]` — exactly the word class the oracle's
    * `regexp_split_to_array(..., '[^a-zA-Z0-9_]+')` uses — so the counts
    * are identical, but the expression codegens to a tiny compiled-Pattern
    * loop instead of a higher-order-function fallback (which cost seconds
    * of Janino compile per plan and interpreted per-row eval).
    */
  def stopwordHits(text: Column, lang: String): Column = {
    val pat = "\\b(" + stopwords(lang).mkString("|") + ")\\b"
    size(regexp_extract_all(lower(text), lit(pat), lit(0)))
  }

  /** Heuristic language ID: argmax of stopword hits with deterministic
    * tie-break on language code order (en < de < es < fr alphabetical by
    * code: de, en, es, fr). Emits the code, or "und" when nothing hits.
    */
  def langId(text: Column): Column = {
    val codes = stopwords.keys.toSeq.sorted // de, en, es, fr
    val scored = codes.map(c => struct(stopwordHits(text, c).as("hits"),
      lit(c).as("code")))
    // array_max on struct compares fields in order: hits then code; ties
    // break toward the LAST code alphabetically — mirror this exactly in
    // the oracle SQL.
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("code")).otherwise("und")
  }

  /** Composite quality score in [0,1]: mean of
    *   - length score: min(1, n_chars/500)
    *   - word-shape score: min(1, n_words/80)
    *   - alpha ratio: alphabetic chars / chars
    * Pure integer/ratio arithmetic → oracle-exact after round(…, 6).
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text)
    val nWords = size(split(trim(text), "[ \\t\\n]+"))
    val alpha = length(regexp_replace(text, "[^a-zA-Z]", ""))
    val lenScore = least(lit(1.0), nChars.cast("double") / 500.0)
    val wordScore = least(lit(1.0), nWords.cast("double") / 80.0)
    val alphaRatio = when(nChars === 0, 0.0)
      .otherwise(alpha.cast("double") / nChars.cast("double"))
    round((lenScore + wordScore + alphaRatio) / 3.0, 6)
  }

  /** Whitespace token count (SQL-expressible). */
  def tokenCountWs(text: Column): Column =
    size(split(trim(text), "[ \\t\\n]+"))

  /** Gopher-style rule filter (Rae et al. 2021, arXiv:2112.11446 §A1.1 —
    * the rule family behind the C4/Gopher web-scrape cleaners), the
    * SQL-expressible subset: word-count bounds [50, 100000], mean word
    * length in [3, 10], symbol-to-word ratio ('#' chars + '...' runs)
    * ≤ 0.1, and ≥ 2 English function-word hits. Emits per-rule flags +
    * the measured statistics + the conjunction `keep`, so a pipeline can
    * both filter and AUDIT which rule fired — dropping documents with no
    * recorded reason is how curation bugs hide.
    *
    * Everything is flat Column arithmetic (no higher-order functions):
    * total word chars = chars minus whitespace, so mean word length
    * needs no per-word iteration — it stays inside whole-stage codegen
    * and the oracle replays it with the same integer algebra.
    */
  def gopherRules(text: Column): Column = {
    val t = trim(text)
    val nw = size(split(t, "[ \\t\\n]+"))
    val wordChars = length(regexp_replace(t, "[ \\t\\n]", ""))
    // count ratios land ON .5 ties at 4dp (e.g. 39 chars / 8 words =
    // 4.875·10⁴ = …5): deterministic floor-form rounding — floor of a
    // double is exact on every engine, where round(double)'s tie rule
    // is engine/version-specific (mirrored as floor(x*1e4+0.5)/1e4 in
    // the oracle; see BASELINE.md "rounding determinism")
    def rnd4(c: Column): Column = floor(c * lit(1e4) + lit(0.5d)) / lit(1e4)
    val meanLen = rnd4(wordChars.cast("double") / nw.cast("double"))
    val nHash = length(t) - length(regexp_replace(t, "#", ""))
    val nEll = size(regexp_extract_all(t, lit("\\.\\.\\."), lit(0)))
    val symRatio = rnd4((nHash + nEll).cast("double") / nw.cast("double"))
    val stops = stopwordHits(text, "en")
    val wcOk = nw.between(50, 100000)
    val mlOk = meanLen.between(3.0, 10.0)
    val srOk = symRatio <= 0.1
    val swOk = stops >= 2
    struct(nw.as("n_words"), meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"), stops.as("stop_hits"),
      wcOk.as("word_count_ok"), mlOk.as("mean_word_len_ok"),
      srOk.as("symbol_ratio_ok"), swOk.as("stopword_ok"),
      (wcOk && mlOk && srOk && swOk).as("keep"))
  }

  /** BPE-ish token count via the engine tokenizer (UDF; the number the
    * chunker budgets against).
    */
  val tokenCountBpeish =
    udf((t: String) => SimpleTokenizer.countTokens(Option(t).getOrElse("")))

  /** Rolling-hash winnowing fingerprint (Schleimer et al., SIGMOD'03
    * style): k-gram rolling hashes, keep the min in each window of w —
    * a compact, shift-robust document signature for near-dup screening.
    *
    * Locale.ROOT lowercasing: the default-locale toLowerCase drifts from
    * the DuckDB oracle's locale-independent lower() under e.g. tr_TR
    * (dotless i). Iteration is by UTF-16 unit, matching the oracle's
    * slicing only for BMP text — the testdata corpus is BMP-only and the
    * oracle documents that assumption.
    */
  def winnowingFingerprint(text: String, k: Int = 8, w: Int = 16): Array[Long] = {
    val s = text.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
    if (s.length < k) return if (s.isEmpty) Array.empty else Array(fnv(s))
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      hashes(i) = graft.util.Hashing.fnvRange(s, i, i + k); i += 1
    }
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var start = 0
    while (start + w <= n) {
      var m = Long.MaxValue
      var j = start
      while (j < start + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
      out += m
      start += w
    }
    if (out.isEmpty) out += hashes.min
    out.toArray
  }

  val fingerprintUdf =
    udf((t: String) => winnowingFingerprint(Option(t).getOrElse("")))

  /** Full per-document profile. */
  def profile(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("lang_pred", langId(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("n_tokens_ws", tokenCountWs(col(textCol)))
      .withColumn("n_tokens_bpeish", tokenCountBpeish(col(textCol)))
      .withColumn("fingerprint", fingerprintUdf(col(textCol)))
}
