package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.EngineConfig
import graft.engine.InceptionEngine

/** Classical statistical tests, time-series decomposition, corpus statistics, graph/geo/vector batteries (round-9/10 batches 1–11).
  *
  * Split out of SparkEntry.scala (round 16): members mix into
  * [[SparkEntry]] and resolve against its full surface via the
  * self-type; mixin order in SparkEntry preserves the original
  * declaration (and so val-initialization) order.
  */
private[graft] trait SparkEntryStatTests { this: SparkEntry.type =>

  // ---- round-9 batch 1: classical statistical tests -----------------

  /** Shared Spark/DuckDB formula text for Welch's t: both engines embed
    * the SAME string, so IEEE operation order is identical by
    * construction (the qLinreg closed-form contract). Inputs are the
    * per-side exact DECIMAL moments (n, Σx, Σx²) suffixed a/b.
    */
  private[graft] val (welchTSql, welchDfSql) = {
    def mean(p: String) = s"(CAST(sx$p AS DOUBLE) / CAST(n$p AS DOUBLE))"
    def v(p: String) =
      s"""((CAST(sxx$p AS DOUBLE)
            - CAST(sx$p AS DOUBLE) * CAST(sx$p AS DOUBLE)
              / CAST(n$p AS DOUBLE))
           / (CAST(n$p AS DOUBLE) - 1.0))"""
    def se2(p: String) = s"(${v(p)} / CAST(n$p AS DOUBLE))"
    val t =
      s"((${mean("a")} - ${mean("b")}) / sqrt(${se2("a")} + ${se2("b")}))"
    val df =
      s"""((${se2("a")} + ${se2("b")}) * (${se2("a")} + ${se2("b")})
          / (${se2("a")} * ${se2("a")} / (CAST(na AS DOUBLE) - 1.0)
            + ${se2("b")} * ${se2("b")} / (CAST(nb AS DOUBLE) - 1.0)))"""
    (t, df)
  }

  /** WELCH's t-test (unequal variances) between every pair of event
    * types on `value`: one map-side-combinable aggregate computes the
    * exact DECIMAL moments per group, then the t statistic and
    * Welch–Satterthwaite df are O(groups²) double math over the tiny
    * moment table (self-joined on type order). The moments are
    * partition-order-proof and the double formulas are the SAME string
    * on both engines.
    */
  def qWelchTtest(s: SparkSession, dir: String): DataFrame = {
    val m = tbl(s, dir, "events")
      .select(col("event_type"), col("value").cast("decimal(18,6)").as("x"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val a = m.select(col("event_type").as("type_a"), col("n").as("na"),
      col("sx").as("sxa"), col("sxx").as("sxxa"))
    val b = m.select(col("event_type").as("type_b"), col("n").as("nb"),
      col("sx").as("sxb"), col("sxx").as("sxxb"))
    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        round(expr(welchTSql), 6).as("t_stat"),
        round(expr(welchDfSql), 6).as("df"))
      .orderBy("type_a", "type_b")
  }

  /** One-way ANOVA F across event types on `value`, fully closed-form:
    * SSB/SSW from per-group exact DECIMAL moments; the one
    * order-sensitive reduction (Σ_g sx_g²/n_g over groups) is made
    * engine-portable by rounding each group's term to 9 dp and summing
    * as exact DECIMAL — the repo's round-then-decimal-sum recipe.
    * Single-row output; the group moment table is groups-sized.
    */
  def qAnova(s: SparkSession, dir: String): DataFrame = {
    val ssb = """(CAST(sgg AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"""
    val ssw = "(CAST(sxx AS DOUBLE) - CAST(sgg AS DOUBLE))"
    val f = s"""(($ssb / (CAST(k AS DOUBLE) - 1.0))
        / ($ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))"""
    tbl(s, dir, "events")
      .select(col("event_type"), col("value").cast("decimal(18,6)").as("x"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("gn"), sum(col("x")).as("gsx"),
        sum(col("x") * col("x")).as("gsxx"))
      .agg(count(lit(1)).as("k"), sum(col("gn")).as("n"),
        sum(col("gsx")).as("sx"), sum(col("gsxx")).as("sxx"),
        sum(expr(
          """CAST(round(CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)
               / CAST(gn AS DOUBLE), 9) AS DECIMAL(28,9))""")).as("sgg"))
      .select(col("k"), col("n"),
        round(expr(ssb), 6).as("ss_between"),
        round(expr(ssw), 6).as("ss_within"),
        round(expr(f), 6).as("f_stat"))
  }

  /** Entropy term shared by the information-gain framings: p·ln p at
    * 12 dp, accumulated as exact DECIMAL (negated at the end). */
  def entTerm(num: String, den: String): String =
    s"""CAST(round(CAST($num AS DOUBLE) / CAST(nn AS DOUBLE)
         * ln(CAST($num AS DOUBLE) / CAST($den AS DOUBLE)), 12)
       AS DECIMAL(28,12))"""

  /** INFORMATION GAIN of two candidate features (source; a 200-char
    * length band) against the `lang` label — the feature-ranking
    * primitive behind every decision-tree split and
    * mutual-information-based data-selection heuristic. H(lang) and
    * H(lang|feature) from count tables only; ln terms ride the
    * round-12-then-DECIMAL-sum recipe so group order cannot perturb
    * them. Each framing is counts-sized; the corpus is scanned twice
    * (once per feature), never joined row-to-row.
    */
  def qInfoGain(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
    def ig(fv: Column, name: String): DataFrame = {
      val dd = d.select(fv.cast("string").as("fv"), col("lang"))
      val tot = dd.agg(count(lit(1)).as("nn"))
      val hl = dd.groupBy("lang").agg(count(lit(1)).as("cl"))
        .crossJoin(broadcast(tot))
        .agg(sum(expr(entTerm("cl", "nn"))).as("hl"))
      val cells = dd.groupBy("fv", "lang").agg(count(lit(1)).as("c"))
      val perF = cells.groupBy("fv").agg(sum(col("c")).as("cf"))
      val hc = cells.join(perF, "fv").crossJoin(broadcast(tot))
        .agg(sum(expr(entTerm("c", "cf"))).as("hc"))
      broadcast(hl).crossJoin(hc)
        .select(lit(name).as("feature"),
          round(expr("0.0 - CAST(hl AS DOUBLE)"), 6).as("h_label"),
          round(expr("0.0 - CAST(hc AS DOUBLE)"), 6).as("h_cond"),
          round(expr("CAST(hc AS DOUBLE) - CAST(hl AS DOUBLE)"), 6)
            .as("info_gain"))
    }
    ig(col("source"), "source")
      .unionByName(ig(expr("CAST(n_chars AS BIGINT) DIV 200"), "len_band"))
      .orderBy("feature")
  }

  /** Per-event-type MODAL ISO weekday with deterministic tie-break
    * (count desc, weekday asc) and its share — the categorical
    * "typical value" profile. Counts-sized after one keyed aggregate;
    * the mode pick is a per-group window over ≤7 rows.
    */
  def qMode(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = tbl(s, dir, "events")
      .select(col("event_type"),
        expr("CAST(weekday(ts) + 1 AS BIGINT)").as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("n").desc, col("dow"))
    val tot = d.groupBy("event_type").agg(sum(col("n")).as("tot"))
    d.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(tot, "event_type")
      .select(col("event_type"), col("dow").as("modal_dow"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("share"))
      .orderBy("event_type")
  }

  /** DECISION STUMP: the best single threshold on n_chars for
    * predicting lang='en', by weighted Gini impurity — argmin over the
    * cumulative (pos, n) prefix sums of the 100-char bucket histogram.
    * The running window scans DISTINCT buckets only (bounded
    * vocabulary, the qRocAuc shape — never the corpus); the winning
    * row is picked on the ROUNDED impurity with bucket tie-break.
    */
  def qDecisionStump(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gini = """((CAST(cn AS DOUBLE) / CAST(nn AS DOUBLE))
        * (1.0 - (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
               * (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
             - ((CAST(cn AS DOUBLE) - CAST(cp AS DOUBLE))
                 / CAST(cn AS DOUBLE))
               * ((CAST(cn AS DOUBLE) - CAST(cp AS DOUBLE))
                 / CAST(cn AS DOUBLE)))
      + ((CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)) / CAST(nn AS DOUBLE))
        * (1.0 - ((CAST(pp AS DOUBLE) - CAST(cp AS DOUBLE))
               / (CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)))
               * ((CAST(pp AS DOUBLE) - CAST(cp AS DOUBLE))
               / (CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)))
             - ((CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)
                 - CAST(pp AS DOUBLE) + CAST(cp AS DOUBLE))
               / (CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)))
               * ((CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)
                 - CAST(pp AS DOUBLE) + CAST(cp AS DOUBLE))
               / (CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)))))"""
    val h = tbl(s, dir, "documents")
      .select(expr("CAST(n_chars AS BIGINT) DIV 100").as("bkt"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("bkt").agg(count(lit(1)).as("c"), sum(col("pos")).as("p"))
    val wRun = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = h.agg(sum(col("c")).as("nn"), sum(col("p")).as("pp"))
    val scored = h
      .withColumn("cn", sum(col("c")).over(wRun))
      .withColumn("cp", sum(col("p")).over(wRun))
      .crossJoin(broadcast(tot))
      .filter(col("cn") < col("nn"))
      .select(col("bkt"), col("cn").as("n_left"),
        (col("nn") - col("cn")).as("n_right"),
        round(expr(gini), 6).as("gini"))
    val wPick = Window.orderBy(col("gini"), col("bkt"))
    scored.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select((col("bkt") * 100L + 100L).as("threshold_chars"),
        col("n_left"), col("n_right"), col("gini"))
  }

  // ---- round-9 batch 2: time-series decomposition & growth -----------

  /** Exact DECIMAL literals of 0.7^k for k = 0..9 (7^k/10^k terminates
    * at 9 dp), keyed on a column named `k` — the SAME string runs on
    * both engines, so the EWMA weights carry zero float noise. */
  val pow7Sql =
    """CAST(CASE k WHEN 0 THEN '1.000000000' WHEN 1 THEN '0.700000000'
         WHEN 2 THEN '0.490000000' WHEN 3 THEN '0.343000000'
         WHEN 4 THEN '0.240100000' WHEN 5 THEN '0.168070000'
         WHEN 6 THEN '0.117649000' WHEN 7 THEN '0.082354300'
         WHEN 8 THEN '0.057648010' WHEN 9 THEN '0.040353607'
       END AS DECIMAL(18,9))"""

  /** Trailing EXPONENTIALLY WEIGHTED moving average (α = 0.3, i.e.
    * decay 0.7) of the per-day mean event value, over the last 10
    * observed days — the smoothed-metric primitive under every ops
    * dashboard. The weights are exact DECIMAL literals (0.7^k
    * terminates), the weighted sum is an exact DECIMAL product-sum,
    * and the only float op is the final division — gap-aware by
    * construction (weights renormalize over the days present). The
    * self-join is day-banded (≤10 partners per row) on the tiny daily
    * aggregate, never on raw events.
    */
  def qEwma(s: SparkSession, dir: String): DataFrame = {
    val daily = tbl(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("value").cast("decimal(18,6)").as("x"))
      .groupBy("event_type", "day")
      .agg(expr("CAST(round(CAST(sum(x) AS DOUBLE) / CAST(count(1) AS DOUBLE), 6) AS DECIMAL(18,6))").as("xbar"))
    val a = daily.select(col("event_type"), col("day"))
    val b = daily.select(col("event_type").as("event_type_b"),
      col("day").as("day_b"), col("xbar"))
    a.join(b, col("event_type") === col("event_type_b")
        && datediff(col("day"), col("day_b")).between(0, 9))
      .withColumn("k", datediff(col("day"), col("day_b")))
      .select(col("event_type"), col("day"),
        (col("xbar") * expr(pow7Sql)).as("term"),
        expr(pow7Sql).as("w"))
      .groupBy("event_type", "day")
      .agg(round(expr("CAST(sum(term) AS DOUBLE) / CAST(sum(w) AS DOUBLE)"),
        6).as("ewma"))
      .orderBy("event_type", "day")
  }

  /** Cumulative DISTINCT users per day (growth curve): the
    * first-occurrence flag (row_number per user over day, event_id)
    * makes running COUNT(DISTINCT) a plain running SUM over the
    * days-sized daily-new table. The unpartitioned window is bounded
    * by the calendar, not the corpus — the qRocAuc contract.
    */
  def qCumDistinct(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wU = Window.partitionBy("user_id").orderBy("day", "event_id")
    val wRun = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"), col("event_id"))
      .withColumn("rn", row_number().over(wU))
      .filter(col("rn") === 1)
      .groupBy("day").agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(wRun))
      .orderBy("day")
  }

  /** Classical SEASONAL DECOMPOSITION of daily order revenue:
    * 7-observation centered moving average as trend (exact DECIMAL
    * window sum — only full windows emit), multiplicative ratio, and
    * a per-ISO-weekday seasonal index averaged over the rounded
    * ratios (round-then-DECIMAL-sum, so day order is immaterial).
    * Output: day, revenue, trend, seasonal index, deseasonalized
    * revenue. Calendar-bounded windows throughout.
    */
  def qSeasonalDecompose(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
    val w7 = Window.orderBy("day").rowsBetween(-3, 3)
    val ratios = daily
      .withColumn("cnt7", count(lit(1)).over(w7))
      .withColumn("sum7", sum(col("rv")).over(w7))
      .filter(col("cnt7") === 7)
      .select(col("day"),
        expr("CAST(weekday(day) + 1 AS BIGINT)").as("dow"), col("rv"),
        round(expr("CAST(sum7 AS DOUBLE) / 7.0"), 6).as("trend"),
        expr("""CAST(round(CAST(rv AS DOUBLE)
            / (CAST(sum7 AS DOUBLE) / 7.0), 6) AS DECIMAL(18,6))""")
          .as("ratio"))
    val si = ratios.groupBy("dow")
      .agg(round(expr(
        "CAST(sum(ratio) AS DOUBLE) / CAST(count(1) AS DOUBLE)"), 6)
        .as("seasonal_idx"))
    ratios.join(si, "dow")
      .select(col("day"), col("dow"),
        round(col("rv").cast("double"), 2).as("revenue"),
        col("trend"), col("ratio").cast("double").as("ratio"),
        col("seasonal_idx"),
        // decimal/6dp-index ratio lands ON .5 ties at 6dp: rndDet
        rndDet(expr("CAST(rv AS DOUBLE) / seasonal_idx"), 6)
          .as("deseasonalized"))
      .orderBy("day")
  }

  /** THEIL–SEN robust trend per event type: the lower-median
    * (percentile_disc contract) of all pairwise slopes of the daily
    * mean-value series. Slopes are exact-DECIMAL differences divided
    * by integer day gaps, rounded to 9 dp; the pair join is per-group
    * over the calendar-bounded daily table (d² pairs of ~30-row
    * series), never over raw events.
    */
  def qTheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = tbl(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("value").cast("decimal(18,6)").as("x"))
      .groupBy("event_type", "day")
      .agg(expr("""CAST(round(CAST(sum(x) AS DOUBLE)
          / CAST(count(1) AS DOUBLE), 6) AS DECIMAL(18,6))""").as("y"))
    val a = daily.select(col("event_type"), col("day").as("day_a"),
      col("y").as("ya"))
    val b = daily.select(col("event_type").as("et_b"),
      col("day").as("day_b"), col("y").as("yb"))
    val slopes = a.join(b, col("event_type") === col("et_b")
        && col("day_a") < col("day_b"))
      .select(col("event_type"), expr(
        // 6dp-decimal diff / int day gap lands ON .5 ties at 9dp:
        // floor-form quantization (tie determinism)
        """CAST(floor(CAST(yb - ya AS DOUBLE)
             / CAST(datediff(day_b, day_a) AS DOUBLE) * 1e9 + 0.5)
           / 1e9 AS DECIMAL(18,9))""").as("slope"))
    slopes.createOrReplaceTempView("theil_sen_slopes_v")
    s.sql(
      """SELECT event_type, COUNT(*) AS n_pairs,
           round(CAST(percentile_disc(0.5)
             WITHIN GROUP (ORDER BY slope) AS DOUBLE), 9) AS sen_slope
         FROM theil_sen_slopes_v GROUP BY event_type ORDER BY event_type""")
  }

  // ---- round-9 batch 3: corpus-statistics & privacy operators --------

  /** Add-1-smoothed KL term shared by q_unigram_kl's two engines:
    * p·ln(p/q) at 12 dp → exact DECIMAL accumulation. Columns in scope
    * on both sides: csw (source-word count), ns (source tokens), c
    * (corpus word count), nn (corpus tokens), v (vocab size).
    */
  val klTermSql =
    """CAST(round((CAST(csw + 1 AS DOUBLE) / CAST(ns + v AS DOUBLE))
         * ln((CAST(csw + 1 AS DOUBLE) / CAST(ns + v AS DOUBLE))
             / (CAST(c + 1 AS DOUBLE) / CAST(nn + v AS DOUBLE))), 12)
       AS DECIMAL(28,12))"""

  /** Per-source KL DIVERGENCE of the unigram distribution against the
    * corpus distribution (add-1 smoothing over the corpus vocab on
    * both sides) — the domain-shift detector behind mixture rebalance
    * decisions: a source whose KL spikes is off-distribution. The
    * expansion is vocab × sources (both bounded; never corpus-sized
    * row pairs), counts come from ONE corpus explode, and the ln terms
    * ride the round-12-DECIMAL-sum recipe.
    */
  def qUnigramKl(s: SparkSession, dir: String): DataFrame = {
    // Cache the (source, word, count) AGGREGATE — vocab × sources-sized
    // — never the raw exploded token stream (corpus-sized at 100 TB).
    // Every other profile derives from it: corpus counts are the
    // source-sum, source totals the word-sum (r10 VERDICT ask #1).
    val cs = tbl(s, dir, "documents")
      .select(col("source"), explode(expr(tokensSql)).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("csw"))
      .persist()
    val cw = cs.groupBy("w").agg(sum(col("csw")).as("c"))
    val ns = cs.groupBy("source").agg(sum(col("csw")).as("ns"))
    val tot = cw.agg(count(lit(1)).as("v"), sum(col("c")).as("nn"))
    cw.crossJoin(broadcast(ns))
      .join(cs, Seq("source", "w"), "left")
      .withColumn("csw", coalesce(col("csw"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("ns"), expr(klTermSql).as("term"))
      .groupBy("source")
      .agg(min(col("ns")).as("n_tokens"),
        round(expr("CAST(sum(term) AS DOUBLE)"), 6).as("kl"))
      .orderBy("source")
  }

  /** TOKENIZER FERTILITY per language: chars-per-token and
    * bytes-per-token of the canonical word tokenizer — the metric that
    * decides whether a tokenizer is fair to a language (high
    * bytes/token = the language pays more sequence length per
    * character). Pure per-row lengths into one keyed aggregate; the
    * zero-token guard is an explicit CASE so scripts the tokenizer
    * cannot segment report NULL, not Infinity.
    */
  def qTokenizerFertility(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("lang"),
        length(col("text")).cast("long").as("nc"),
        expr("CAST(octet_length(text) AS BIGINT)").as("nb"),
        expr(s"CAST(size($tokensSql) AS BIGINT)").as("nt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("chars"),
        sum(col("nb")).as("bytes"), sum(col("nt")).as("tokens"))
      .select(col("lang"), col("n_docs"), col("chars"), col("bytes"),
        col("tokens"),
        expr("""CASE WHEN tokens = 0 THEN NULL ELSE
            round(CAST(chars AS DOUBLE) / CAST(tokens AS DOUBLE), 6)
          END""").as("chars_per_token"),
        expr("""CASE WHEN tokens = 0 THEN NULL ELSE
            round(CAST(bytes AS DOUBLE) / CAST(tokens AS DOUBLE), 6)
          END""").as("bytes_per_token"))
      .orderBy("lang")

  /** Shared NB log-prob term: ln of the Laplace-smoothed class-
    * conditional, rounded to 9 dp (DECIMAL-summed downstream). */
  val nbTermSql =
    """CAST(round(ln((CAST(clw + 1 AS DOUBLE))
         / (CAST(tokl + v AS DOUBLE))), 9) AS DECIMAL(18,9))"""

  /** MULTINOMIAL NAIVE BAYES language classifier, trained and scored
    * inside the engine: docs with doc_id % 5 = 0 are the test fold,
    * the rest train per-language Laplace-smoothed token log-probs.
    * The model is kept at O(observed (lang, w) pairs) — NEVER the
    * dense langs × vocab grid (at web-corpus vocabularies that grid
    * is 10⁹ rows the data doesn't support). Unseen-in-class vocab
    * tokens all share one per-language constant ln(1/(tokl+v)), so
    * their contribution folds in analytically:
    *   score = prior + Σ_observed cnt·lp
    *                 + (inVocabTokens − matchedTokens) · default(lang).
    * DECIMAL arithmetic is exact, so grouping the identical unseen
    * terms into one multiply is bit-identical to summing them — the
    * oracle (which materializes the dense grid in DuckDB) still
    * hash-matches. Output: the confusion matrix; the (test doc ×
    * langs) grid (langs bounded, broadcast) guarantees a prediction
    * even for docs with zero in-vocab tokens (prior-only fallback).
    */
  def qNaiveBayes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fanout (r16): tokenize + per-token explode otherwise runs on the
    // one scan task the single-row-group file allows
    val d = fanout(tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text")))
      .select(col("doc_id"), col("lang"), expr(tokensSql).as("ws"))
    val train = d.filter(col("doc_id") % 5 =!= 0)
    val test = d.filter(col("doc_id") % 5 === 0)
    // Cache the (lang, word, count) AGGREGATE — vocab × langs-sized —
    // never the raw exploded training tokens (corpus-sized at 100 TB);
    // per-class totals and the vocab both derive from it (r10 VERDICT
    // ask #1). sum(clw) per lang ≡ the raw token count per lang.
    val clw = train
      .select(col("lang"), explode(col("ws")).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("clw"))
      .persist()
    val langTok = clw.groupBy("lang").agg(sum(col("clw")).as("tokl"))
    val vocab = clw.select("w").distinct()
    val v1 = vocab.agg(count(lit(1)).as("v"))
    val priors = train.groupBy("lang").agg(count(lit(1)).as("dl"))
    val nTrain = train.agg(count(lit(1)).as("dn"))
    // observed-pairs model only: (lang, w, lp) for clw > 0
    val model = clw.join(broadcast(langTok), Seq("lang"))
      .crossJoin(broadcast(v1))
      .select(col("lang"), col("w"), expr(nbTermSql).as("lp"))
    // per-language unseen-token default: clw = 0 in the same formula
    val langDefault = langTok.crossJoin(broadcast(v1))
      .select(col("lang"), expr(
        """CAST(round(ln(1.0d / (CAST(tokl + v AS DOUBLE))), 9)
           AS DECIMAL(18,9))""").as("dt"))
    // (doc_id, word, count) TYPE counts — already the minimal state the
    // two consumers (in-vocab totals + model join) can run on: scoring
    // needs per-doc word multiplicities, and the type-count grid is
    // strictly smaller than the raw token stream it replaces.
    val testTok = test
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
      // out-of-vocab tokens contribute to no language — drop them once
      .join(vocab, Seq("w"), "left_semi")
      .persist()
    val inVocab = testTok.groupBy("doc_id")
      .agg(sum(col("cnt")).as("iv"))
    val tokScore = testTok.join(model, Seq("w"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("cnt") * col("lp")).as("ts"),
        sum(col("cnt")).as("matched"))
    val priorTerm = priors.crossJoin(broadcast(nTrain))
      .select(col("lang"), expr(
        """CAST(round(ln(CAST(dl AS DOUBLE) / CAST(dn AS DOUBLE)), 9)
           AS DECIMAL(18,9))""").as("pt"))
    val grid = test.select(col("doc_id"), col("lang").as("actual"))
      .crossJoin(broadcast(priorTerm.join(langDefault, Seq("lang"))))
      .join(tokScore, Seq("doc_id", "lang"), "left")
      .join(inVocab, Seq("doc_id"), "left")
      .withColumn("score",
        col("pt")
          + coalesce(col("ts"), lit(0).cast("decimal(18,9)"))
          + (coalesce(col("iv"), lit(0L))
            - coalesce(col("matched"), lit(0L))) * col("dt"))
    val wPick = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("lang"))
    grid.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .groupBy(col("actual"), col("lang").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("actual", "predicted")
  }

  /** T-CLOSENESS audit (the distributional sibling of q_k_anonymity /
    * q_l_diversity): per quasi-identifier group (order year ×
    * priority), the total-variation distance between the group's
    * sensitive-attribute (order status) distribution and the global
    * one — groups above ~0.3 leak attribute information. The grid is
    * groups × statuses (both bounded); |p − q| terms are rounded to
    * 9 dp and DECIMAL-summed so status order is immaterial. Top-20 by
    * TVD with full key tie-break.
    */
  def qTCloseness(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
      .select(expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
        col("o_orderpriority").as("prio"),
        col("o_orderstatus").as("st"))
    val cells = o.groupBy("yr", "prio", "st").agg(count(lit(1)).as("c"))
    val grp = cells.groupBy("yr", "prio").agg(sum(col("c")).as("ng"))
    val glob = o.groupBy("st").agg(count(lit(1)).as("cg"))
    val tot = o.agg(count(lit(1)).as("nn"))
    grp.crossJoin(broadcast(glob))
      .join(cells, Seq("yr", "prio", "st"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("yr"), col("prio"), col("ng"), expr(
        """CAST(round(abs(CAST(c AS DOUBLE) / CAST(ng AS DOUBLE)
             - CAST(cg AS DOUBLE) / CAST(nn AS DOUBLE)), 9)
           AS DECIMAL(18,9))""").as("term"))
      .groupBy("yr", "prio")
      .agg(min(col("ng")).as("n"),
        round(expr("0.5 * CAST(sum(term) AS DOUBLE)"), 6).as("tvd"))
      .orderBy(col("tvd").desc, col("yr"), col("prio"))
      .limit(20)
  }

  // ---- round-9 batch 4: graph communities, geo-NN, vector profile ----

  /** LABEL PROPAGATION communities over the co-supplier graph
    * ([[graft.ops.LabelPropagation]] — synchronous, min-label
    * tie-break, 3 iterations; the DuckDB twin unrolls the same
    * iterations). Output: top-20 community sizes. Same blocked edge
    * construction as q_degree_stats — never all-pairs over suppliers,
    * only within shared parts.
    */
  def qLabelPropagation(s: SparkSession, dir: String): DataFrame = {
    val e = writtenEdgesTable(s, dir)
    graft.ops.LabelPropagation.labels(e, "src", "dst", iters = 3)
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("community"))
      .limit(20)
  }

  /** Deterministic synthetic geo-coordinates from an id — integer
    * modular arithmetic only, identical text on both engines. */
  def geoSql(key: String): (String, String) = (
    s"(CAST(($key * 7919) % 17000 AS DOUBLE) / 100.0 - 85.0)",
    s"(CAST(($key * 104729) % 36000 AS DOUBLE) / 100.0 - 180.0)")

  /** HAVERSINE NEAREST-NEIGHBOR join: each customer's closest
    * same-nation supplier by great-circle distance over synthetic
    * (deterministically derived) coordinates — the geo primitive
    * under store-assignment / logistics queries. The join is
    * nation-blocked with the supplier side a broadcast dim, never
    * all-pairs; the argmin ranks on the ROUNDED distance with
    * supplier tie-break so sub-ulp libm noise cannot flip picks.
    */
  def qHaversineNn(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (clat, clon) = geoSql("c_custkey")
    val (slat, slon) = geoSql("s_suppkey")
    val c = tbl(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("nation"),
        expr(clat).as("lat_c"), expr(clon).as("lon_c"))
    val sup = tbl(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").as("nation"),
        expr(slat).as("lat_s"), expr(slon).as("lon_s"))
    // floor-form 3dp readout (tie determinism — synthetic grid coords
    // put distances exactly ON .5·10⁻³ boundaries; see BASELINE.md)
    val hav =
      """floor(2.0 * 6371.0 * asin(sqrt(
           sin(radians(lat_s - lat_c) / 2.0)
             * sin(radians(lat_s - lat_c) / 2.0)
           + cos(radians(lat_c)) * cos(radians(lat_s))
             * sin(radians(lon_s - lon_c) / 2.0)
             * sin(radians(lon_s - lon_c) / 2.0))) * 1e3 + 0.5) / 1e3"""
    val w = Window.partitionBy("c_custkey")
      .orderBy(col("dist_km"), col("s_suppkey"))
    c.join(broadcast(sup), "nation")
      .withColumn("dist_km", expr(hav))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("nation"), col("s_suppkey"),
        col("dist_km"))
      .orderBy("c_custkey")
      .limit(100)
  }

  /** Pairwise-COSINE HISTOGRAM of a bounded embedding sample (vec_id
    * ≡ 0 mod 4, capped below 4000 — fixed-size at ANY scale factor,
    * the documented scale lever): the distribution every
    * embedding-space health check draws (collapsed space → mass near
    * 1.0; healthy space → spread). Arrays are cast to double BEFORE
    * the fold on both engines, and both fold left-to-right, so the
    * 4dp-rounded cosines are bit-identical; buckets are floor(10·cos).
    */
  def qCosineHistogram(s: SparkSession, dir: String): DataFrame = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (a, b) => a * b),
        lit(0.0d), (acc, t) => acc + t)
    // r16 optimization: each vector's norm is a pure per-row quantity —
    // computing sqrt(dot(v,v)) inside the pair loop re-folded each
    // 64-element array once per PAIR (2 of the 3 folds per pair were
    // redundant). Hoisted to one fold per VECTOR before the self-join;
    // the per-pair expression sqrt(na)*sqrt(nb) is the same IEEE double
    // sequence as before, so the 4-dp cosines are bit-identical.
    // fanout (r16): the self-join below amplifies ~n rows into n²/2
    // folded pairs — a single-row-group scan would otherwise stream the
    // whole nested-loop join through one task
    val sample = fanout(tbl(s, dir, "embeddings")
      .filter(col("vec_id") % 4 === 0 && col("vec_id") < 4000)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    val a = sample.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("nv").as("na"))
    val b = sample.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("nv").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(round(dot(col("va"), col("vb"))
        / (col("na") * col("nb")), 4).as("cosine"))
      .select(floor(col("cosine") * 10.0).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
      .orderBy("bucket")
  }

  // ---- round-9 batch 5: retrieval diversity, graph metrics, audits ---

  /** Shared DuckDB CTE prefix replaying 3 deterministic LPA iterations
    * over the co-supplier graph — used by the q_label_propagation and
    * q_modularity oracles (the l3 table is the final labeling).
    */
  val lpaCteSql: String = {
    def iter(k: Int): String =
      s"""c$k AS (SELECT e.src AS node, l${k - 1}.label AS label,
           COUNT(*) AS c
         FROM e JOIN l${k - 1} ON l${k - 1}.node = e.dst GROUP BY 1, 2),
       l$k AS (SELECT node, label FROM (SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
             ORDER BY c DESC, label) AS rn FROM c$k) WHERE rn = 1)"""
    s"""ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
         WHERE l_quantity <= 2),
       e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
         FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
           AND a.l_suppkey <> b.l_suppkey),
       l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       ${iter(1)},
       ${iter(2)},
       ${iter(3)}"""
  }

  /** MMR-diversified retrieval ([[graft.ops.Mmr]]): 5 picks from the
    * exact-top-20 pool at λ=0.7 against the vec_id=0 query — the
    * diversity-aware head over ann_bruteforce. The greedy loop is
    * driver-side over the bounded pool matrix; the oracle replays all
    * five selections as unrolled argmax CTEs.
    */
  def qMmrDiversify(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    graft.ops.Mmr.rerank(e.filter(col("vec_id") =!= 0),
      "vec_id", "embedding", q, poolSize = 20, select = 5, lambda = 0.7)
  }

  /** Newman MODULARITY of the 3-iteration label-propagation
    * communities — the standard "did the clustering find real
    * structure" score (Q ≈ 0 random, Q > 0.3 strong). Pure count
    * algebra over the labeled edge list: per-community intra-edge and
    * degree totals, terms rounded at 9 dp and DECIMAL-summed. One
    * labels join per edge side; everything after is communities-sized.
    */
  def qModularity(s: SparkSession, dir: String): DataFrame = {
    val e = writtenEdgesTable(s, dir)
      .persist() // feeds LPA iterations AND the modularity count algebra
    val lbl = graft.ops.LabelPropagation.labels(e, "src", "dst", iters = 3)
    val labeled = e
      .join(lbl.withColumnRenamed("node", "src")
        .withColumnRenamed("label", "lsrc"), "src")
      .join(lbl.withColumnRenamed("node", "dst")
        .withColumnRenamed("label", "ldst"), "dst")
    val perC = labeled.groupBy(col("lsrc").as("community"))
      .agg(count(lit(1)).as("deg"),
        sum(when(col("lsrc") === col("ldst"), 1L).otherwise(0L))
          .as("intra"))
    val m = e.agg(count(lit(1)).as("ne"))
    perC.crossJoin(broadcast(m))
      .select(expr(
        """CAST(round(CAST(intra AS DOUBLE) / CAST(ne AS DOUBLE)
             - (CAST(deg AS DOUBLE) / CAST(ne AS DOUBLE))
               * (CAST(deg AS DOUBLE) / CAST(ne AS DOUBLE)), 9)
           AS DECIMAL(18,9))""").as("term"))
      .agg(count(lit(1)).as("n_communities"),
        round(expr("CAST(sum(term) AS DOUBLE)"), 6).as("modularity"))
  }

  /** DEGREE ASSORTATIVITY of the co-supplier graph: Pearson
    * correlation of endpoint degrees over the symmetric edge list
    * (positive = hubs link hubs). Exact BIGINT moment sums (degree
    * products stay far below 2⁶³) through the qLinreg closed form —
    * one degree aggregate, one edge join, one 1-row reduce.
    */
  def qAssortativity(s: SparkSession, dir: String): DataFrame = {
    val e = writtenEdgesTable(s, dir)
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    e.join(deg, "src")
      .withColumnRenamed("d", "dx")
      .join(deg.withColumnRenamed("src", "dst")
        .withColumnRenamed("d", "dy"), "dst")
      .agg(count(lit(1)).as("n"),
        sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
        sum(col("dx") * col("dy")).as("sxy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dy") * col("dy")).as("syy"))
      .select(col("n").as("n_edges"),
        round(expr(
          """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""), 6)
          .as("assortativity"))
  }

  /** CLUSTERING COEFFICIENT of the co-supplier graph — global
    * (3·triangles / wedges) and mean local (2·T_u / d_u(d_u−1) over
    * deg ≥ 2 nodes). Triangle corners come from the q_triangle_count
    * machinery over the oriented view of the edge artifact; wedges are
    * Σ d(d−1)/2 from one degree aggregate — every count stays exact
    * BIGINT until the two final divisions, and the local terms are
    * 9-dp-rounded DECIMALs so summation order is immaterial.
    */
  def qClusteringCoeff(s: SparkSession, dir: String): DataFrame = {
    val ed = writtenEdgesTable(s, dir)
    val und = ed.filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    val wedges = und.as("x").join(und.as("y"), col("x.v") === col("y.u"))
      .select(col("x.u").as("u"), col("x.v").as("v"), col("y.v").as("w"))
    val tri = wedges.join(
      und.select(col("u").as("tu"), col("v").as("tw")),
      col("u") === col("tu") && col("w") === col("tw"))
      .select("u", "v", "w")
    val tpn = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("t"))
    val deg = ed.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
    deg.filter(col("d") >= 2)
      .join(tpn, Seq("node"), "left")
      .withColumn("t", coalesce(col("t"), lit(0L)))
      .agg(
        count(lit(1)).as("n_nodes"),
        expr("CAST(sum(t) DIV 3 AS BIGINT)").as("n_triangles"),
        expr("""round(2.0d * CAST(sum(t) AS DOUBLE)
                / CAST(sum(d * (d - 1)) AS DOUBLE), 6)""").as("global_cc"),
        expr("""round(CAST(sum(CAST(round(2.0d * t
                  / (CAST(d AS DOUBLE) * CAST(d - 1 AS DOUBLE)), 9)
                AS DECIMAL(18,9))) AS DOUBLE)
                / CAST(count(1) AS DOUBLE), 6)""").as("avg_local_cc"))
  }

  /** K-CORE PEELING (k=3, three bounded rounds): iteratively drop
    * nodes of degree < 3 and the edges touching them, reporting the
    * shrinking graph per round — the standard coreness preprocessing
    * before community/centrality work. Each round is one degree
    * aggregate + two semi-join-shaped filters over the current edge
    * set, localCheckpointed so the plan (and its lineage) stays
    * O(1) per round — the PageRank iteration recipe. The DuckDB twin
    * unrolls the same three rounds as CTEs.
    */
  def qKcore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // lazy checkpoints + fused per-round readout (r16): the one
    // countDistinct/count aggregate materializes the round's checkpoint
    // as a side effect — 1 job per round instead of 3 (eager
    // materialization + two separate counts); values are identical
    // (countDistinct(src) ≡ distinct().count(), count ≡ count).
    var ed = writtenEdgesTable(s, dir).localCheckpoint(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (it <- 1 to 3) {
      val keep = ed.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= 3).select(col("src").as("node"))
      val prev = ed
      ed = ed
        .join(keep.withColumnRenamed("node", "src"), Seq("src"))
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"))
        .select("src", "dst")
        .localCheckpoint(false)
      val r = ed.agg(countDistinct(col("src")), count(lit(1))).head()
      prev.unpersist()
      out += ((it, r.getLong(0), r.getLong(1) / 2))
    }
    out.toSeq.toDF("iter", "n_nodes", "n_edges")
  }

  /** V-SHAPE pattern detection over daily revenue — now expressed on
    * the GENERIC sequence-pattern matcher ([[graft.ops.PatternMatch]]:
    * Down, Down, Up = a ≥2-day slide ending in a recovery), which
    * compiles the pattern to the same single-window lag algebra the
    * hand-written version used. Exact DECIMAL comparisons; the global
    * window is calendar-bounded.
    */
  def qPatternVshape(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.PatternMatch
    PatternMatch.matches(dailyRevenue(s, dir), Seq.empty, "day", "rev",
        Seq(PatternMatch.Down, PatternMatch.Down, PatternMatch.Up))
      .select(col("day"),
        round(col("v_0").cast("double"), 2).as("rev_m3"),
        round(col("v_1").cast("double"), 2).as("rev_m2"),
        round(col("v_2").cast("double"), 2).as("rev_m1"),
        round(col("v_3").cast("double"), 2).as("rev"))
      .orderBy("day")
  }

  /** DOUBLE-TOP pattern (Up, Down, Up, Down — two peaks around a dip)
    * over the same daily-revenue series: the second gate proving the
    * pattern matcher is parameterized, not a renamed V-shape. Output:
    * the matched 5-day windows, exact-DECIMAL-compared, rounded for
    * display only.
    */
  def qPatternDoubletop(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.PatternMatch
    PatternMatch.matches(dailyRevenue(s, dir), Seq.empty, "day", "rev",
        Seq(PatternMatch.Up, PatternMatch.Down,
          PatternMatch.Up, PatternMatch.Down))
      .select(col("day"),
        round(col("v_0").cast("double"), 2).as("rev_m4"),
        round(col("v_1").cast("double"), 2).as("rev_m3"),
        round(col("v_2").cast("double"), 2).as("rev_m2"),
        round(col("v_3").cast("double"), 2).as("rev_m1"),
        round(col("v_4").cast("double"), 2).as("rev"))
      .orderBy("day")
  }

  /** MANN–KENDALL TREND TEST over daily revenue: S = Σ_{i<j}
    * sign(x_j − x_i) and Kendall's tau — the nonparametric "is there a
    * monotone trend" answer. The pairwise join is days × days —
    * CALENDAR-BOUNDED (the qRocAuc contract: ~73k days even at a
    * 200-year horizon), never corpus-sized; signs are exact DECIMAL
    * comparisons summed as BIGINT.
    */
  def qMannKendall(s: SparkSession, dir: String): DataFrame = {
    val d = dailyRevenue(s, dir)
    val n1 = d.agg(count(lit(1)).as("n"))
    d.as("a").join(d.as("b"), col("a.day") < col("b.day"))
      .select(when(col("b.rev") > col("a.rev"), 1L)
        .when(col("b.rev") < col("a.rev"), -1L)
        .otherwise(0L).as("sgn"))
      .agg(sum(col("sgn")).as("s_stat"))
      .crossJoin(broadcast(n1))
      .select(col("n").as("n_days"), col("s_stat"),
        // + 0.0: a tiny negative tau can round to -0.0 and the engines
        // disagree on the zero's sign (the r8 lesson) — normalize
        expr("""round(CAST(s_stat AS DOUBLE)
          / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0d), 6)
          + 0.0d""").as("tau"),
        expr("""CASE WHEN s_stat > 0 THEN 'increasing'
                WHEN s_stat < 0 THEN 'decreasing'
                ELSE 'no_trend' END""").as("trend"))
  }

  /** Daily revenue re-quantized to DECIMAL(18,2) so squared terms stay
    * inside both engines' exact-DECIMAL multiply precision (Spark
    * (18,2)² → (37,4); DuckDB (18,2)² → (36,4) — a (38,2)² would
    * overflow DuckDB's 38-digit cap). */
  def dailyRev18(s: SparkSession, dir: String): DataFrame =
    dailyRevenue(s, dir)
      .select(col("day"), col("rev").cast("decimal(18,2)").as("rev"))

  /** BOLLINGER BANDS over daily revenue: 7-day rolling mean ± 2σ from
    * EXACT DECIMAL window sums (count/sum/sum-of-squares — population
    * σ), bands materialized in double with one fixed evaluation order
    * so both engines agree bit-for-bit; output is the breakout days.
    * Global window over a calendar-bounded series (qRocAuc contract).
    */
  def qBollinger(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    dailyRev18(s, dir)
      .select(col("day"), col("rev"),
        count(lit(1)).over(w).as("cnt"),
        sum(col("rev")).over(w).as("sm"),
        sum(col("rev") * col("rev")).over(w).as("s2"))
      .filter(col("cnt") === 7)
      .withColumn("mean", expr("CAST(sm AS DOUBLE) / 7.0d"))
      .withColumn("sd", expr(
        """sqrt(greatest((CAST(s2 AS DOUBLE)
             - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / 7.0d) / 7.0d,
           0.0d))"""))
      .filter(col("rev").cast("double") > col("mean") + lit(2.0) * col("sd")
        || col("rev").cast("double") < col("mean") - lit(2.0) * col("sd"))
      .select(col("day"),
        round(col("rev").cast("double"), 2).as("rev"),
        round(col("mean"), 2).as("mid"),
        round(col("mean") + lit(2.0) * col("sd"), 2).as("upper"),
        round(col("mean") - lit(2.0) * col("sd"), 2).as("lower"))
      .orderBy("day")
  }

  /** RSI(14) overbought/oversold signals over daily revenue: day-over-
    * day gains/losses as exact DECIMAL lags, 14-day rolling sums, and
    * RSI = 100·ΣG/(ΣG+ΣL) (algebraically 100 − 100/(1+RS), without the
    * divide-by-zero at all-loss windows; an all-flat window is guarded
    * to NULL identically in both engines). Signal days only.
    */
  def qRsi(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.orderBy("day")
    val w14 = Window.orderBy("day").rowsBetween(-13, 0)
    dailyRev18(s, dir)
      .withColumn("prev", lag(col("rev"), 1).over(w1))
      .filter(col("prev").isNotNull)
      .withColumn("gain",
        when(col("rev") > col("prev"), col("rev") - col("prev"))
          .otherwise(lit(0).cast("decimal(19,2)")))
      .withColumn("loss",
        when(col("rev") < col("prev"), col("prev") - col("rev"))
          .otherwise(lit(0).cast("decimal(19,2)")))
      .select(col("day"),
        count(lit(1)).over(w14).as("cnt"),
        sum(col("gain")).over(w14).as("sg"),
        sum(col("loss")).over(w14).as("sl"))
      .filter(col("cnt") === 14)
      .withColumn("rsi", expr(
        """CASE WHEN sg + sl = 0 THEN NULL
           ELSE round(100.0d * CAST(sg AS DOUBLE)
             / (CAST(sg AS DOUBLE) + CAST(sl AS DOUBLE)), 4) END"""))
      .filter(col("rsi") > 70.0 || col("rsi") < 30.0)
      .select(col("day"), col("rsi"),
        expr("CASE WHEN rsi > 70.0d THEN 'overbought' ELSE 'oversold' END")
          .as("signal"))
      .orderBy("day")
  }

  /** SAX SYMBOLIZATION of daily revenue: z-normalize against global
    * exact-DECIMAL moments, bin into 4 symbols at the standard
    * gaussian quartile breakpoints (±0.6744897501960817, 0), and
    * report the symbol-transition (bigram) counts — the discretized
    * shape profile sequence miners start from. One moment pass + one
    * lag; everything downstream is 16-cell-sized.
    */
  def qSax(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = dailyRev18(s, dir)
    val mom = d.agg(count(lit(1)).as("n"), sum(col("rev")).as("sm"),
      sum(col("rev") * col("rev")).as("s2"))
    val q = 0.6744897501960817d
    val sym = d.crossJoin(broadcast(mom))
      .withColumn("mean", expr("CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("sd", expr(
        """sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)), 0.0d))"""))
      .withColumn("z",
        (col("rev").cast("double") - col("mean")) / col("sd"))
      .withColumn("sym",
        when(col("z") < -q, "a").when(col("z") < 0.0, "b")
          .when(col("z") < q, "c").otherwise("d"))
    sym.withColumn("sym_from",
        lag(col("sym"), 1).over(Window.orderBy("day")))
      .filter(col("sym_from").isNotNull)
      .groupBy(col("sym_from"), col("sym").as("sym_to"))
      .agg(count(lit(1)).as("n_trans"))
      .orderBy("sym_from", "sym_to")
  }

  /** SIMPSON'S-PARADOX AUDIT: return-rate difference between high-
    * discount (>= 0.05) and low-discount lineitems, per ship-year
    * stratum AND pooled — a stratum whose rate-difference sign
    * disagrees with the pooled sign is the aggregation trap every
    * metrics review must flag. Counts are exact BIGINT;
    * rates/differences are one fixed double evaluation order,
    * `+ 0.0`-normalized so a −0.0 diff can't split the engines; the
    * flip flag compares ROUNDED signs. Everything is strata-sized
    * after one scan.
    */
  def qSimpson(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
      .select(expr("CAST(year(l_shipdate) AS BIGINT)").as("yr"),
        when(col("l_discount") >= 0.05, "hi").otherwise("lo").as("grp"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
    val grpAggs = Seq(
      sum(when(col("grp") === "hi", 1L).otherwise(0L)).as("n_hi"),
      sum(when(col("grp") === "hi", col("ret")).otherwise(0L))
        .as("r_hi"),
      sum(when(col("grp") === "lo", 1L).otherwise(0L)).as("n_lo"),
      sum(when(col("grp") === "lo", col("ret")).otherwise(0L))
        .as("r_lo"))
    val rateCols = Seq(
      expr("""CASE WHEN n_hi = 0 THEN NULL ELSE
          round(CAST(r_hi AS DOUBLE) / CAST(n_hi AS DOUBLE), 6)
        END""").as("rate_hi"),
      expr("""CASE WHEN n_lo = 0 THEN NULL ELSE
          round(CAST(r_lo AS DOUBLE) / CAST(n_lo AS DOUBLE), 6)
        END""").as("rate_lo"),
      expr("""CASE WHEN n_hi = 0 OR n_lo = 0 THEN NULL ELSE
          round(CAST(r_hi AS DOUBLE) / CAST(n_hi AS DOUBLE)
            - CAST(r_lo AS DOUBLE) / CAST(n_lo AS DOUBLE), 6)
            + 0.0d
        END""").as("diff"))
    val strata = li.groupBy("yr").agg(grpAggs.head, grpAggs.tail: _*)
      .select(Seq(col("yr").cast("string").as("stratum"), col("n_hi"),
        col("r_hi"), col("n_lo"), col("r_lo")) ++ rateCols: _*)
    val pooled = li.groupBy().agg(grpAggs.head, grpAggs.tail: _*)
      .select(Seq(lit("pooled").as("stratum"), col("n_hi"),
        col("r_hi"), col("n_lo"), col("r_lo")) ++ rateCols: _*)
    val pd = pooled.select(col("diff").as("pdiff"))
    strata.crossJoin(broadcast(pd))
      .unionByName(pooled.withColumn("pdiff", col("diff")))
      .withColumn("flips", expr(
        """CASE WHEN diff IS NULL OR pdiff IS NULL THEN NULL
           WHEN (diff > 0.0d) <> (pdiff > 0.0d) THEN 1 ELSE 0 END"""))
      .select("stratum", "n_hi", "rate_hi", "n_lo", "rate_lo",
        "diff", "flips")
      .orderBy("stratum")
  }

  /** BURSTINESS PROFILE of the event stream: per event type, the Fano
    * factor (var/mean of daily counts) and the Goh–Barabási
    * burstiness coefficient (σ−μ)/(σ+μ) — Poisson-like arrivals sit
    * near Fano 1 / B < 0, bursty types above. One daily aggregate,
    * then exact BIGINT moments over the calendar-bounded day axis.
    */
  def qBurstiness(s: SparkSession, dir: String): DataFrame = {
    val sdSql =
      """sqrt(greatest((CAST(scc AS DOUBLE)
           - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
             / CAST(n_days AS DOUBLE)) / CAST(n_days AS DOUBLE), 0.0d))"""
    val muSql = "(CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))"
    tbl(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("scc"))
      .select(col("event_type"), col("n_days"),
        round(expr(muSql), 6).as("mean_daily"),
        round(expr(s"$sdSql * $sdSql / $muSql"), 6).as("fano"),
        expr(s"round(($sdSql - $muSql) / ($sdSql + $muSql), 6) + 0.0d")
          .as("burstiness"))
      .orderBy("event_type")
  }

  /** PRICE ELASTICITY per part brand: the ln–ln regression slope of
    * quantity on unit price, via the qLinreg closed form over
    * 9-dp-rounded ln terms DECIMAL-summed (the libm determinism
    * recipe; `+ 0.0` so a −0.0 log term can't split the engines).
    * One keyed lineitem→part join, then brand-sized moments.
    */
  def qPriceElasticity(s: SparkSession, dir: String): DataFrame = {
    // fanout (r16): two ln+round's and four decimal-moment terms per
    // row — parallelize past the single-row-group scan task
    val li = fanout(tbl(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice")))
    val p = tbl(s, dir, "part").select(col("p_partkey"), col("p_brand"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("""CAST(round(ln(CAST(l_extendedprice AS DOUBLE)
            / CAST(l_quantity AS DOUBLE)), 9) + 0.0d
          AS DECIMAL(18,9))""").as("x"),
        expr("""CAST(round(ln(CAST(l_quantity AS DOUBLE)), 9) + 0.0d
          AS DECIMAL(18,9))""").as("y"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("p_brand"), col("n"),
        expr("""round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0.0d""")
          .as("elasticity"))
      .orderBy("p_brand")
  }

  /** CUPED VARIANCE REDUCTION for the A/B surface (q_ab_lift's
    * hash-assigned arms): pre-period views are the covariate, post-
    * period purchases the metric, θ = cov(X,Y)/var(X) fitted POOLED
    * from exact BIGINT moment sums, and the adjusted lift subtracts
    * θ·(mean_Xa − mean_Xb) (the global-mean term cancels in the
    * difference). var_reduction is the pooled ρ² CUPED removes. The
    * pre/post boundary is the exact µs midpoint of the event-time
    * range — integer arithmetic, replayed with epoch_us in DuckDB.
    * One user-level aggregate, then a 1-row closed form.
    */
  def qCuped(s: SparkSession, dir: String): DataFrame = {
    val ev = withTsUs(tbl(s, dir, "events"))
      .select(col("user_id"), col("event_type"), col("ts_us"))
    val bounds = ev.agg(min(col("ts_us")).as("lo"), max(col("ts_us")).as("hi"))
    val perUser = ev.crossJoin(broadcast(bounds))
      .withColumn("mid", expr("lo + CAST((hi - lo) DIV 2 AS BIGINT)"))
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "view" && col("ts_us") < col("mid"),
          1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase"
          && col("ts_us") >= col("mid"), 1L).otherwise(0L)).as("y"))
    val assigned = graft.ops.Sampling
      .splitAssign(perUser, "user_id", seed = 11L,
        trainFrac = 0.5, valFrac = 0.25)
      .withColumn("in_a", col("split_u") < 0.5)
    val m = assigned.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(when(col("in_a"), 1L).otherwise(0L)).as("na"),
      sum(when(col("in_a"), col("x")).otherwise(0L)).as("sxa"),
      sum(when(col("in_a"), col("y")).otherwise(0L)).as("sya"),
      sum(when(!col("in_a"), 1L).otherwise(0L)).as("nb"),
      sum(when(!col("in_a"), col("x")).otherwise(0L)).as("sxb"),
      sum(when(!col("in_a"), col("y")).otherwise(0L)).as("syb"))
    val thetaSql =
      """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"""
    val rawSql =
      """(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
         - CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE))"""
    val dxSql =
      """(CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)
         - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE))"""
    m.select(col("na"), col("nb"),
      expr(s"round($thetaSql, 6) + 0.0d").as("theta"),
      expr(s"round($rawSql, 6) + 0.0d").as("raw_lift"),
      expr(s"round($rawSql - $thetaSql * $dxSql, 6) + 0.0d")
        .as("cuped_lift"),
      expr("""round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)""")
        .as("var_reduction"))
  }

  /** SPRT SEQUENTIAL TEST over the daily purchase rate (H0 p=0.04 vs
    * H1 p=0.06, α=β=0.05): per-day log-likelihood-ratio increments
    * k·ln(p1/p0) + (n−k)·ln((1−p1)/(1−p0)) as 9-dp DECIMAL terms,
    * EXACT cumulative sums over the calendar-bounded day axis, and the
    * first boundary crossing (±ln 19) reported with the decision — the
    * always-valid early-stopping monitor a metrics pipeline runs daily.
    */
  def qSprt(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "events")
      .select(to_date(col("ts")).as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum(col("p")).as("k"))
    val cum = daily
      .withColumn("term", expr(
        """CAST(round(ln(0.06d / 0.04d), 9) AS DECIMAL(18,9)) * k
           + CAST(round(ln(0.94d / 0.96d), 9) AS DECIMAL(18,9)) * (n - k)"""))
      .withColumn("cum",
        sum(col("term")).over(Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("crossed", expr(
        """CAST(cum AS DOUBLE) > ln(19.0d)
           OR CAST(cum AS DOUBLE) < -ln(19.0d)"""))
    // all three summaries are ungrouped aggregates, so each is exactly
    // one row even when no day ever crosses (NULL day/decision then)
    val firstCross = cum.filter(col("crossed"))
      .agg(min(col("day")).as("first_cross_day"),
        expr("min_by(CAST(cum AS DOUBLE), day)").as("cum_at_cross"))
      .select(col("first_cross_day"), expr(
        """CASE WHEN cum_at_cross IS NULL THEN NULL
           WHEN cum_at_cross > 0.0d THEN 'accept_h1'
           ELSE 'accept_h0' END""").as("decision"))
    val finalRow = cum.agg(
      round(expr("max_by(CAST(cum AS DOUBLE), day)"), 6).as("final_llr"))
    daily.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(firstCross))
      .crossJoin(broadcast(finalRow))
  }

  /** CENTROID-DISTANCE OUTLIERS over the embedding corpus: the global
    * per-dim centroid from exact DECIMAL(28,12) sums (the
    * q_embed_dim_stats recipe), quantized at 9 dp, then each vector's
    * squared distance as 9-dp-rounded DECIMAL terms — top-20 farthest.
    * Two corpus passes (moment, then distance), centroid broadcast as
    * 64 rows; no vector ever shuffles whole and nothing is doc × doc.
    */
  def qVecOutlier(s: SparkSession, dir: String): DataFrame = {
    def ex = tbl(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "ef")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("ef").cast("double").as("e"))
    val cen = ex.groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("e").cast("decimal(28,12)")).as("s"))
      .select(col("dim"), expr(
        """CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 9)
           AS DECIMAL(18,9))""").as("cd"))
    ex.join(broadcast(cen), Seq("dim"))
      .select(col("vec_id"), expr(
        """CAST(round((e - CAST(cd AS DOUBLE))
             * (e - CAST(cd AS DOUBLE)), 9) AS DECIMAL(18,9))""")
        .as("term"))
      .groupBy("vec_id").agg(sum(col("term")).as("d2"))
      .select(col("vec_id"),
        round(col("d2").cast("double"), 6).as("dist2"))
      .orderBy(col("dist2").desc, col("vec_id"))
      .limit(20)
  }

  /** LEVENE'S TEST (mean-centered) for variance homogeneity across
    * event types — the q_anova companion answering "are the VARIANCES
    * equal": z = |x − group mean| with the group means quantized at
    * 9 dp, then the one-way-ANOVA F statistic ON the z values, all
    * from exact DECIMAL moment sums (two scans: group means, then z
    * moments; everything downstream is groups-sized).
    */
  def qLevene(s: SparkSession, dir: String): DataFrame = {
    val x = tbl(s, dir, "events")
      .select(col("event_type"),
        col("value").cast("decimal(18,6)").as("x"))
    val gm = x.groupBy("event_type")
      .agg(count(lit(1)).as("gn"), sum(col("x")).as("gsx"))
      .select(col("event_type"), expr(
        """CAST(round(CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE), 9)
           AS DECIMAL(18,9))""").as("gmean"))
    val z = x.join(broadcast(gm), Seq("event_type"))
      .select(col("event_type"), expr(
        """CAST(round(abs(CAST(x AS DOUBLE) - CAST(gmean AS DOUBLE)), 9)
           AS DECIMAL(18,9))""").as("z"))
    val g = z.groupBy("event_type")
      .agg(count(lit(1)).as("gn"), sum(col("z")).as("gsz"),
        sum(col("z") * col("z")).as("gszz"))
    g.agg(count(lit(1)).as("k"),
        sum(col("gn")).as("n"),
        sum(col("gsz")).as("sz"),
        sum(col("gszz")).as("szz"),
        sum(expr("""CAST(round(CAST(gsz AS DOUBLE) * CAST(gsz AS DOUBLE)
            / CAST(gn AS DOUBLE), 9) AS DECIMAL(28,9))""")).as("sgg"))
      .select(col("k"), col("n"),
        round(expr(
          """((CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
               / (CAST(k AS DOUBLE) - 1.0d))
             * (CAST(sgg AS DOUBLE)
               - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                 / CAST(n AS DOUBLE))
             / (CAST(szz AS DOUBLE) - CAST(sgg AS DOUBLE))"""), 6)
          .as("levene_w"))
  }

  /** READABILITY PROFILE per language: Flesch reading ease from exact
    * integer counts — words / sentence-enders / vowel-group syllable
    * approximations, each a regexp_extract_all length (the same
    * regex-twin contract as the tokenizer oracles) — aggregated to
    * per-language totals before the one closed-form score. One scan;
    * groups-sized after it.
    */
  def qReadability(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("lang"),
        expr("""CAST(size(regexp_extract_all(text,
          '[a-zA-Z0-9_]+', 0)) AS BIGINT)""").as("w"),
        expr("""CAST(size(regexp_extract_all(text,
          '[.!?]+', 0)) AS BIGINT)""").as("snt"),
        expr("""CAST(size(regexp_extract_all(lower(text),
          '[aeiouy]+', 0)) AS BIGINT)""").as("syl"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("words"),
        sum(col("snt")).as("sentences"), sum(col("syl")).as("syllables"))
      .select(col("lang"), col("n_docs"), col("words"),
        col("sentences"), col("syllables"),
        expr("""CASE WHEN sentences = 0 OR words = 0 THEN NULL ELSE
            round(206.835d
              - 1.015d * (CAST(words AS DOUBLE)
                / CAST(sentences AS DOUBLE))
              - 84.6d * (CAST(syllables AS DOUBLE)
                / CAST(words AS DOUBLE)), 4)
          END""").as("flesch"))
      .orderBy("lang")

  /** BM25 QUERY-TIME SCORING (the retrieval twin of q_bm25's per-doc
    * term profile): score every document against a fixed 4-term query
    * by touching ONLY the query terms' posting lists — the tf filter
    * comes first, so the word-keyed work is O(postings of 4 terms),
    * not O(corpus). Per-term scores are 6-dp-rounded DECIMALs summed
    * per doc (order-free), top-20 docs with id tie-break. Corpus stats
    * (df for the query words, doc lengths, avgdl, N) ride the same
    * written TF table / broadcasts as q_bm25.
    */
  def qBm25Query(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Seq("hash", "join", "scan", "filter")
    val tf = writtenTfTable(s, dir)
    val qtf = tf.filter(col("word").isin(terms: _*))
    val dfreq = qtf.groupBy("word").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val ndocs = tbl(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val avgdl = dl.agg((sum(col("dl")).cast("double") /
      count(lit(1))).as("avgdl"))
    qtf.join(broadcast(dfreq), "word")
      .join(broadcast(dl), "doc_id")
      .crossJoin(broadcast(ndocs))
      .crossJoin(broadcast(avgdl))
      .withColumn("term_score", expr(
        """CAST(round(
             ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5d)
               / (CAST(df AS DOUBLE) + 0.5d) + 1.0d)
             * (CAST(tf AS DOUBLE) * (1.2d + 1.0d))
             / (CAST(tf AS DOUBLE) + 1.2d * (0.25d
               + 0.75d * CAST(dl AS DOUBLE) / avgdl)), 6)
           AS DECIMAL(18,6))"""))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_matched"),
        sum(col("term_score")).as("sc"))
      .select(col("doc_id"), col("n_terms_matched"),
        round(col("sc").cast("double"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  /** PARTIAL CORRELATION of quantity and extended price CONTROLLING
    * for discount — "is the qty↔price relation real or
    * discount-mediated", the three-variable step past q_corr_matrix.
    * All three pairwise r's come from ONE exact-DECIMAL moment
    * aggregate; the partial is the textbook closed form, every rounded
    * output `+ 0.0`-normalized (rxz/ryz hover near 0).
    */
  def qPartialCorr(s: SparkSession, dir: String): DataFrame = {
    def r(a: String, b: String) =
      s"""((CAST(n AS DOUBLE) * CAST(s$a$b AS DOUBLE)
           - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(s$a$a AS DOUBLE)
             - CAST(s$a AS DOUBLE) * CAST(s$a AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(s$b$b AS DOUBLE)
             - CAST(s$b AS DOUBLE) * CAST(s$b AS DOUBLE))))"""
    val rxy = r("x", "y"); val rxz = r("x", "z"); val ryz = r("y", "z")
    tbl(s, dir, "lineitem")
      .select(col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_extendedprice").cast("decimal(14,2)").as("y"),
        col("l_discount").cast("decimal(8,3)").as("z"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("z")).as("sz"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("z")).as("sxz"),
        sum(col("y") * col("z")).as("syz"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("z") * col("z")).as("szz"))
      .select(col("n"),
        expr(s"round($rxy, 6) + 0.0d").as("r_xy"),
        expr(s"round($rxz, 6) + 0.0d").as("r_xz"),
        expr(s"round($ryz, 6) + 0.0d").as("r_yz"),
        expr(s"""round(($rxy - $rxz * $ryz)
            / sqrt((1.0d - $rxz * $rxz) * (1.0d - $ryz * $ryz)), 6)
          + 0.0d""").as("partial_corr"))
  }

  /** VALUE AT RISK / CVaR (95%) of daily log revenue returns: returns
    * as 9-dp-rounded DECIMAL ln ratios, the k = ⌈0.05·n⌉ worst picked
    * by RANK (value + day tie-break — deterministic under ties), VaR =
    * the k-th worst, CVaR = the exact DECIMAL mean of those k. The
    * sort is over the calendar-bounded day axis (qRocAuc contract).
    */
  def qVarCvar(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rets = dailyRev18(s, dir)
      .withColumn("prev", lag(col("rev"), 1).over(Window.orderBy("day")))
      .filter(col("prev").isNotNull)
      .select(col("day"), expr(
        """CAST(round(ln(CAST(rev AS DOUBLE) / CAST(prev AS DOUBLE)), 9)
           + 0.0d AS DECIMAL(18,9))""").as("r"))
    val n1 = rets.agg(count(lit(1)).as("n"))
    rets
      .withColumn("rk",
        row_number().over(Window.orderBy(col("r"), col("day"))))
      .crossJoin(broadcast(n1))
      .filter(col("rk") <= ceil(col("n") * lit(0.05d)))
      .agg(max(col("n")).as("n_rets"),
        expr("round(CAST(max(r) AS DOUBLE), 6) + 0.0d").as("var_95"),
        expr("""round(CAST(sum(r) AS DOUBLE)
          / CAST(count(1) AS DOUBLE), 6) + 0.0d""").as("cvar_95"))
  }

  /** Shared 1-row exact moments of the daily revenue series (n, Σy,
    * Σy²) — the q_sax pass, reused by the normality/outlier tests. */
  def dailyRevMoments(s: SparkSession, dir: String): DataFrame =
    dailyRev18(s, dir).agg(count(lit(1)).as("n"),
      sum(col("rev")).as("sm"), sum(col("rev") * col("rev")).as("s2"))

  val revMeanSql = "(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))"
  val revSdSql =
    """sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)), 0.0d))"""

  /** GRUBBS OUTLIER TEST over daily revenue: G = max|y − ȳ|/σ with the
    * offending day — mean/σ from the exact-moment pass, the argmax by
    * (deviation desc, day) rank so ties are deterministic. One moment
    * pass + one deviation pass over the calendar-bounded series.
    */
  def qGrubbs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mom = dailyRevMoments(s, dir)
    dailyRev18(s, dir).crossJoin(broadcast(mom))
      .withColumn("d",
        expr(s"abs(CAST(rev AS DOUBLE) - $revMeanSql)"))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("d").desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col("n").as("n_days"), col("day"),
        round(col("rev").cast("double"), 2).as("rev"),
        round(expr(s"d / $revSdSql"), 6).as("g_stat"))
  }

  /** DURBIN–WATSON AUTOCORRELATION TEST on the residuals of the daily
    * revenue linear trend: slope/intercept from the exact-moment
    * closed form (t = day index), residuals 6-dp-quantized DECIMALs,
    * DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² from exact DECIMAL sums — ≈2 means "no
    * serial correlation", the regression-hygiene check q_linreg's
    * consumers need. Two passes over the days axis.
    */
  def qDurbinWatson(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d0 = dailyRev18(s, dir)
    val lo = d0.agg(min(col("day")).as("d0"))
    val td = d0.crossJoin(broadcast(lo))
      .select(col("day"),
        datediff(col("day"), col("d0")).cast("long").as("t"), col("rev"))
    val m = td.agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
      sum(col("rev")).as("sy"),
      sum(col("t") * col("rev")).as("sty"),
      sum(col("t") * col("t")).as("stt"))
    val bSql =
      """((CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
           - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
           - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)))"""
    val aSql =
      s"""((CAST(sy AS DOUBLE) - $bSql * CAST(st AS DOUBLE))
         / CAST(n AS DOUBLE))"""
    val resid = td.crossJoin(broadcast(m))
      .select(col("day"), expr(
        s"""CAST(round(CAST(rev AS DOUBLE)
             - ($aSql + $bSql * CAST(t AS DOUBLE)), 6) + 0.0d
           AS DECIMAL(18,6))""").as("e"))
      .withColumn("ep", lag(col("e"), 1).over(Window.orderBy("day")))
    resid.agg(count(lit(1)).as("n_days"),
        sum(when(col("ep").isNotNull,
          (col("e") - col("ep")) * (col("e") - col("ep")))
          .otherwise(lit(0).cast("decimal(19,6)"))).as("num"),
        sum(col("e") * col("e")).as("den"))
      .select(col("n_days"),
        round(expr("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)"), 6)
          .as("dw"))
  }

  /** JARQUE–BERA NORMALITY TEST of daily revenue: skewness/kurtosis
    * from exact DECIMAL power sums of the 6-dp-quantized z-scores
    * (z ≤ ~10, so z⁴ stays far inside both engines' 38-digit DECIMAL
    * cap), JB = n/6·(S² + (K−3)²/4). One moment pass + one z pass.
    */
  def qJarqueBera(s: SparkSession, dir: String): DataFrame = {
    val mom = dailyRevMoments(s, dir)
    val z = dailyRev18(s, dir).crossJoin(broadcast(mom))
      .select(col("n"), expr(
        s"""CAST(round((CAST(rev AS DOUBLE) - $revMeanSql) / $revSdSql,
             6) + 0.0d AS DECIMAL(9,6))""").as("z"))
      .withColumn("z2", col("z") * col("z"))
    z.agg(max(col("n")).as("n_days"),
        sum(col("z2") * col("z")).as("sz3"),
        sum(col("z2") * col("z2")).as("sz4"))
      .select(col("n_days"),
        expr("""round(CAST(sz3 AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
          + 0.0d""").as("skewness"),
        round(expr("CAST(sz4 AS DOUBLE) / CAST(n_days AS DOUBLE)"), 6)
          .as("kurtosis"),
        round(expr(
          """(CAST(n_days AS DOUBLE) / 6.0d)
             * ((CAST(sz3 AS DOUBLE) / CAST(n_days AS DOUBLE))
               * (CAST(sz3 AS DOUBLE) / CAST(n_days AS DOUBLE))
             + (CAST(sz4 AS DOUBLE) / CAST(n_days AS DOUBLE) - 3.0d)
               * (CAST(sz4 AS DOUBLE) / CAST(n_days AS DOUBLE) - 3.0d)
               / 4.0d)"""), 6).as("jarque_bera"))
  }

  /** PERCEPTUAL-HASH IMAGE DEDUP over the synthetic media fixture:
    * encode → decode → 8×8 resize → 56-bit dHash
    * ([[graft.ops.Multimodal.dHash56]]) → hash-groupBy — the image
    * twin of exact text dedup, where the shuffle key is 8 bytes per
    * image and pixels never leave the scan stage. The fixture
    * synthesizes each image from doc_id % 100, so every base yields an
    * identical-image group (the known answer the oracle replays
    * pixel-for-pixel through the resize + hash formula). Top-20 groups.
    */
  def qMultimodalPhash(s: SparkSession, dir: String): DataFrame = {
    val mm = graft.ops.Multimodal
    val media = tbl(s, dir, "documents")
      .filter(col("doc_id") < 500 && col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), synthPngUdf(col("doc_id") % 100).as("media"))
    mm.perceptualHash(mm.resizeMedia(media, "media", 8, 8), "media")
      .groupBy("dhash")
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("n_dups").desc, col("dhash"))
      .limit(20)
  }

  /** SPEARMAN RANK CORRELATION of quantity vs extended price: Pearson
    * over MIDRANKS, the ranks built from cumulative counts over the
    * DISTINCT value domains (the q_mann_whitney/qRocAuc bounded-
    * vocabulary contract — never a corpus-sized row sort), quantized
    * at one decimal (midranks are .5-steps) and joined back for exact
    * DECIMAL moment sums.
    */
  def qSpearman(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r16: the l_extendedprice value domain is CORPUS-sized (583k of
    // 600k rows distinct at sf0.1), so the old global
    // Window.orderBy("v") prefix-count funneled the whole domain
    // through ONE task — the q_heaps_law/q_pareto single-partition
    // class (guide §2.5). Rebuilt on the q_concurrency recipe: a
    // monotone-in-v value-range bucketing (scale-adaptive count, from
    // the 1-row (lo,hi) broadcast), per-bucket running sums in
    // parallel, and a buckets-sized carry window whose input is
    // BOUNDED by construction. `before` (and so every midrank) is
    // bit-identical: carry(bk) + within-bucket prefix == global prefix
    // because the bucket id is monotone non-decreasing in v.
    // NULL caveat (r16 ADVICE): a null v would get a null bucket id and
    // drop out of the carry equi-join, where the old global window
    // ranked nulls first — midranks is only reusable on NON-NULLABLE
    // ranked columns (l_quantity / l_extendedprice here are NOT NULL by
    // the fixture schema). Callers ranking nullable input must filter
    // or bucket nulls explicitly first.
    def midranks(d: DataFrame, c: String): DataFrame = {
      val nBk = d.sparkSession.sparkContext.defaultParallelism * 32
      val perV = d.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      val mm = perV.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      val bucketed = perV.crossJoin(broadcast(mm))
        .withColumn("bk", when(col("hi") <= col("lo"), lit(0))
          .otherwise(least(floor(
            (col("v").cast("double") - col("lo").cast("double"))
              * lit(nBk.toDouble)
              / (col("hi").cast("double") - col("lo").cast("double")))
            .cast("int"), lit(nBk - 1))))
        .select(col("v"), col("cnt"), col("bk"))
      val carry = bucketed.groupBy("bk").agg(sum(col("cnt")).as("bc"))
        .withColumn("carry", coalesce(sum(col("bc")).over(Window
          .orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select(col("bk"), col("carry"))
      val wIn = Window.partitionBy("bk").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      bucketed.join(broadcast(carry), "bk")
        .withColumn("before",
          col("carry") + coalesce(sum(col("cnt")).over(wIn), lit(0L)))
        .select(col("v"), expr(
          """CAST(round(CAST(before AS DOUBLE)
               + (CAST(cnt AS DOUBLE) + 1.0d) / 2.0d, 1)
             AS DECIMAL(18,1))""").as("rk"))
    }
    // (r16: a fanout here was tried and REVERTED — 1.2× slower; the
    // repartition broke the scan-exchange reuse between the two midrank
    // builds and the join pass)
    val li = tbl(s, dir, "lineitem")
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    val m = li
      .join(broadcast(midranks(li, "x"))
        .withColumnRenamed("v", "x").withColumnRenamed("rk", "rx"), Seq("x"))
      .join(midranks(li, "y")
        .withColumnRenamed("v", "y").withColumnRenamed("rk", "ry"), Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("ry")).as("sxy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"))
    m.select(col("n"),
      expr("""round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0.0d""")
        .as("spearman_rho"))
  }

  /** CRONBACH'S ALPHA over the 64 embedding dimensions as "items":
    * α = k/(k−1)·(1 − Σvarᵢ / var_total) — per-dim variances from the
    * exact DECIMAL(28,12) moment pass (9-dp-rounded terms summed), the
    * per-vector total scores as exact DECIMAL sums re-quantized at
    * 9 dp before squaring (keeps DuckDB's multiply on the hugeint
    * path). Two corpus passes, everything downstream 1-row.
    */
  def qCronbach(s: SparkSession, dir: String): DataFrame = {
    def ex = tbl(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "ef")))
      .select(col("vec_id"), col("dim"), col("ef").cast("double").as("e"))
    val itemVar = ex.groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("e").cast("decimal(28,12)")).as("s"),
        sum((col("e") * col("e")).cast("decimal(28,12)")).as("s2"))
      .select(expr(
        """CAST(round(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 9)
           AS DECIMAL(18,9))""").as("vi"))
      .agg(count(lit(1)).as("k"), sum(col("vi")).as("svi"))
    val totals = ex.groupBy("vec_id")
      .agg(expr(
        """CAST(round(CAST(sum(CAST(e AS DECIMAL(28,12))) AS DOUBLE), 9)
           AS DECIMAL(18,9))""").as("t"))
    val totVar = totals.agg(count(lit(1)).as("nv"),
        sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"))
      .select(col("nv"), expr(
        """(CAST(stt AS DOUBLE) / CAST(nv AS DOUBLE)
           - (CAST(st AS DOUBLE) / CAST(nv AS DOUBLE))
             * (CAST(st AS DOUBLE) / CAST(nv AS DOUBLE)))""").as("vt"))
    itemVar.crossJoin(broadcast(totVar))
      .select(col("k"), col("nv").as("n_vectors"),
        round(expr(
          """(CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0d))
             * (1.0d - CAST(svi AS DOUBLE) / vt)"""), 6)
          .as("cronbach_alpha"))
  }

  /** RÉNYI ENTROPY SPECTRUM of each language's word distribution:
    * α=2 (collision entropy, −ln Σp²) exactly from Σc²/ (Σc)², and
    * α=½ (2·ln Σ√p) from 9-dp-rounded root terms DECIMAL-summed —
    * with Shannon (from the q_entropy machinery) they bracket the
    * distribution's diversity profile. One corpus explode; everything
    * downstream is vocabulary-sized counts.
    */
  def qRenyi(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("lang"), explode(expr(tokensSql)).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(sum(col("c")).as("nt"), count(lit(1)).as("vocab"),
        sum(col("c").cast("decimal(19,0)")
          * col("c").cast("decimal(19,0)")).as("sc2"),
        sum(expr("""CAST(round(sqrt(CAST(c AS DOUBLE)), 9)
          AS DECIMAL(18,9))""")).as("src"))
      .select(col("lang"), col("nt").as("n_tokens"), col("vocab"),
        round(expr(
          """-ln(CAST(sc2 AS DOUBLE)
             / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)))"""), 6)
          .as("renyi_2"),
        round(expr(
          """2.0d * ln(CAST(src AS DOUBLE) / sqrt(CAST(nt AS DOUBLE)))"""),
          6).as("renyi_05"))
      .orderBy("lang")

  /** VOCABULARY COVERAGE CURVE: the token share covered by the top-k
    * most frequent words (k = 5/10/20) — the tokenizer-design metric
    * behind "how big must the vocab be". Rank + cumulative sum over
    * the COUNTS table (bounded vocabulary, the qRocAuc contract),
    * never the corpus.
    */
  def qNgramCoverage(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = tbl(s, dir, "documents")
      .select(explode(expr(tokensSql)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tot = c.agg(sum(col("c")).as("nt"))
    // r17 (guide §2.5): only ranks ≤ 20 survive the filter, so the
    // rank + running sum never needed the whole vocabulary — a
    // parallel TakeOrderedAndProject bounds the window's input to 20
    // rows ((c DESC, w) is a TOTAL order, so the global top-20 IS
    // ranks 1..20 with identical cumulative sums), where the old
    // unpartitioned Window.orderBy funneled the full vocab domain
    // through ONE task.
    val wOrd = Window.orderBy(col("c").desc, col("w"))
    c.orderBy(col("c").desc, col("w")).limit(20)
      .withColumn("rk", row_number().over(wOrd))
      .withColumn("cum", sum(col("c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("rk").isin(5, 10, 20))
      .crossJoin(broadcast(tot))
      .select(col("rk").as("top_k"), col("cum").as("cum_tokens"),
        round(expr("CAST(cum AS DOUBLE) / CAST(nt AS DOUBLE)"), 6)
          .as("coverage"))
      .orderBy("top_k")
  }

  /** FIGHTIN'-WORDS LOG-ODDS (Monroe et al. shape, Haldane +0.5
    * prior): which words distinguish English documents from the rest
    * of the corpus — per-word log-odds ratio with its z-score from
    * exact counts, ln terms computed in one fixed double order. The
    * whole computation is vocabulary-sized after one corpus explode.
    */
  def qOddsRatio(s: SparkSession, dir: String): DataFrame = {
    val w = tbl(s, dir, "documents")
      .select((col("lang") === "en").as("grp"),
        explode(expr(tokensSql)).as("w"))
    val cnt = w.groupBy("w").agg(
      sum(when(col("grp"), 1L).otherwise(0L)).as("c1"),
      sum(when(!col("grp"), 1L).otherwise(0L)).as("c2"))
    val tot = w.agg(
      sum(when(col("grp"), 1L).otherwise(0L)).as("n1"),
      sum(when(!col("grp"), 1L).otherwise(0L)).as("n2"))
    val lorSql =
      """(ln((CAST(c1 AS DOUBLE) + 0.5d)
           / (CAST(n1 AS DOUBLE) - CAST(c1 AS DOUBLE) + 0.5d))
         - ln((CAST(c2 AS DOUBLE) + 0.5d)
           / (CAST(n2 AS DOUBLE) - CAST(c2 AS DOUBLE) + 0.5d)))"""
    val seSql =
      """sqrt(1.0d / (CAST(c1 AS DOUBLE) + 0.5d)
         + 1.0d / (CAST(n1 AS DOUBLE) - CAST(c1 AS DOUBLE) + 0.5d)
         + 1.0d / (CAST(c2 AS DOUBLE) + 0.5d)
         + 1.0d / (CAST(n2 AS DOUBLE) - CAST(c2 AS DOUBLE) + 0.5d))"""
    cnt.crossJoin(broadcast(tot))
      .select(col("w"), col("c1"), col("c2"),
        expr(s"round($lorSql, 6) + 0.0d").as("log_odds"),
        expr(s"round($lorSql / $seSql, 6) + 0.0d").as("z"))
      .orderBy(col("z").desc, col("w"))
      .limit(20)
  }

  /** SOURCE-LEVEL REPETITION PROFILE: per source, total vs distinct
    * 3-word shingles (through the native
    * [[graft.functions.WordShingles]] generator) and the implied
    * duplication rate — the template/boilerplate detector run before
    * trusting a crawl source. Streaming generator + one aggregate;
    * the shuffle keys on (source, 8-byte hash).
    */
  def qSourceRepetition(s: SparkSession, dir: String): DataFrame = {
    graft.functions.WordShingles.register(s)
    tbl(s, dir, "documents").createOrReplaceTempView("docs_srcrep_v")
    s.sql(
      """SELECT source, COUNT(*) AS n_shingles,
           COUNT(DISTINCT shingle_hash) AS n_distinct,
           round(1.0d - CAST(COUNT(DISTINCT shingle_hash) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
         FROM docs_srcrep_v
         LATERAL VIEW graft_shingles(text, 3) t AS pos, shingle_hash
         GROUP BY source ORDER BY source""")
  }

  /** KEY-SKEW AUDIT of a join key (l_partkey) — the pre-flight check
    * before any 100 TB keyed shuffle: per-key count distribution
    * summarized as max/percentile counts, max-key share, and the
    * coefficient of variation. Percentiles come from a cumulative
    * window over the COUNT-OF-COUNTS table (distinct count values —
    * bounded vocabulary, the qRocAuc contract), never a global sort
    * of per-key rows; moments are exact BIGINT sums.
    */
  def qSkewAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnts = tbl(s, dir, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("c"))
    val cc = cnts.groupBy("c").agg(count(lit(1)).as("k"))
    // r17 (guide §2.5): the running count over the distinct-count
    // domain ran as ONE unpartitioned window task — the q_spearman
    // class. Same bucketed prefix-sum recipe: value-range buckets on c
    // (monotone bucket id; min rides the existing moment aggregate),
    // parallel per-bucket running sums, a bounded nBk-row carry
    // window. cum is the same exact BIGINT prefix, so the percentile
    // threshold scan is bit-identical. c is non-null (a count).
    val mom = cnts.agg(count(lit(1)).as("nk"), sum(col("c")).as("sc"),
      sum(col("c") * col("c")).as("scc"), max(col("c")).as("mx"),
      min(col("c")).as("mn"))
    val nBk = s.sparkContext.defaultParallelism * 32
    val bucketed = cc.crossJoin(broadcast(mom))
      .withColumn("bk", when(col("mx") <= col("mn"), lit(0))
        .otherwise(least(floor(
          (col("c").cast("double") - col("mn").cast("double"))
            * lit(nBk.toDouble)
            / (col("mx").cast("double") - col("mn").cast("double")))
          .cast("int"), lit(nBk - 1))))
    val carry = bucketed.groupBy("bk").agg(sum(col("k")).as("bc"))
      .withColumn("carry", coalesce(sum(col("bc")).over(Window
        .orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("bk"), col("carry"))
    val wIn = Window.partitionBy("bk").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed.join(broadcast(carry), "bk")
      .withColumn("cum", col("carry") + sum(col("k")).over(wIn))
    val pct = cum
      .agg(
        min(when(col("cum") >= ceil(col("nk") * 0.5), col("c")))
          .as("p50_cnt"),
        min(when(col("cum") >= ceil(col("nk") * 0.99), col("c")))
          .as("p99_cnt"))
    mom.crossJoin(broadcast(pct))
      .select(col("nk").as("n_keys"), col("sc").as("n_rows"),
        col("mx").as("max_cnt"), col("p50_cnt"), col("p99_cnt"),
        round(expr("CAST(mx AS DOUBLE) / CAST(sc AS DOUBLE)"), 6)
          .as("max_share"),
        round(expr(
          """sqrt(CAST(nk AS DOUBLE) * CAST(scc AS DOUBLE)
               - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
             / CAST(sc AS DOUBLE)"""), 6).as("cv"))
  }

  // ---- round-9 batch 6: sparse similarity, diversity, drawdown -------

  /** SPARSE TF-IDF COSINE top pairs — the lexical document-similarity
    * twin of the embedding cosine family, in the term-partitioned
    * shape that scales: the pair dot-product joins postings only on
    * RARE terms (2 ≤ df ≤ 20 — the candidate-generation blocking
    * every sparse-retrieval engine uses; stopword-grade terms would
    * make the per-term join quadratic for ~zero cosine mass), while
    * the norms use the FULL weight vector. Weights are 6dp-rounded
    * DECIMAL (tf·ln(N/df)); dots are exact DECIMAL sums.
    */
  def qTfidfCosinePairs(s: SparkSession, dir: String): DataFrame = {
    val tf = tbl(s, dir, "documents")
      .select(col("doc_id"), explode(expr(tokensSql)).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .persist() // feeds df-counts, norms, and the pair join once
    val dfc = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val n1 = tf.select("doc_id").distinct().agg(count(lit(1)).as("nn"))
    val wgt = tf.join(dfc, "w").crossJoin(broadcast(n1))
      .select(col("doc_id"), col("w"), col("df"), expr(
        """CAST(round(CAST(tf AS DOUBLE)
             * ln(CAST(nn AS DOUBLE) / CAST(df AS DOUBLE)), 6)
           AS DECIMAL(18,6))""").as("wt"))
    val norms = wgt.groupBy("doc_id")
      .agg(sum(col("wt") * col("wt")).as("n2"))
    val rare = wgt.filter(col("df").between(2, 20))
    val dots = rare.select(col("doc_id").as("doc_a"), col("w"),
        col("wt").as("wa"))
      .join(rare.select(col("doc_id").as("doc_b"), col("w"),
        col("wt").as("wb")), "w")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("wa") * col("wb")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("na")),
        "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(expr("""CAST(dot AS DOUBLE)
          / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))"""), 6)
          .as("cosine"))
      .orderBy(col("cosine").desc, col("doc_a"), col("doc_b"))
      .limit(20)
  }

  /** DIVERSITY INDICES per source over the language mix: Simpson
    * (1 − Σp²) and Shannon (−Σ p·ln p) — the two numbers every corpus
    * datasheet quotes for balance. Terms are rounded then
    * DECIMAL-summed (group order immaterial); everything is
    * cells-sized after one count.
    */
  def qDiversityIndex(s: SparkSession, dir: String): DataFrame = {
    val cells = tbl(s, dir, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val totals = cells.groupBy("source")
      .agg(sum(col("c")).as("nn"), count(lit(1)).as("n_langs"))
    cells.join(totals, "source")
      .select(col("source"), col("nn"), col("n_langs"),
        expr("""CAST(round((CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
            * (CAST(c AS DOUBLE) / CAST(nn AS DOUBLE)), 12)
          AS DECIMAL(28,12))""").as("p2"),
        expr(entTerm("c", "nn")).as("plp"))
      .groupBy("source")
      .agg(min(col("nn")).as("n_docs"), min(col("n_langs")).as("n_langs"),
        round(expr("1.0 - CAST(sum(p2) AS DOUBLE)"), 6).as("simpson"),
        round(expr("0.0 - CAST(sum(plp) AS DOUBLE)"), 6).as("shannon"))
      .orderBy("source")
  }

  /** MAX DRAWDOWN of daily revenue: running peak (exact DECIMAL max —
    * calendar-bounded window) and relative drop from it; top-10
    * drawdown days. The finance-style risk profile of any daily
    * metric.
    */
  def qDrawdown(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRun = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rv"))
      .withColumn("peak", max(col("rv")).over(wRun))
      .select(col("day"),
        round(col("rv").cast("double"), 2).as("revenue"),
        round(col("peak").cast("double"), 2).as("peak"),
        round(expr("""(CAST(peak AS DOUBLE) - CAST(rv AS DOUBLE))
          / CAST(peak AS DOUBLE)"""), 6).as("drawdown"))
      .orderBy(col("drawdown").desc, col("day"))
      .limit(10)
  }

  // ---- round-10 batch 7: concentration, agreement, sketch, causal ----

  /** Herfindahl–Hirschman concentration index of supplier revenue per
    * nation — the market-concentration audit (and, for a corpus, the
    * "is one source dominating this slice" screen). Revenue sums are
    * exact DECIMAL; each squared-share term is rounded at 9 dp and
    * DECIMAL-summed so group order can't perturb the total; everything
    * after the one keyed aggregate is suppliers-per-nation-sized.
    */
  def qHhi(s: SparkSession, dir: String): DataFrame = {
    val rev = tbl(s, dir, "lineitem")
      .join(tbl(s, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
        "l_suppkey")
      .groupBy("s_nationkey", "l_suppkey")
      .agg(sum(expr(
        """CAST(l_extendedprice AS DECIMAL(14,2))
           * (CAST(1.00 AS DECIMAL(4,2))
             - CAST(l_discount AS DECIMAL(4,2)))""")).as("rv"))
    val tot = rev.groupBy("s_nationkey")
      .agg(sum(col("rv")).as("tv"), count(lit(1)).as("n_suppliers"))
    rev.join(tot, "s_nationkey")
      .select(col("s_nationkey"), col("n_suppliers"), expr(
        """CAST(round(
             (CAST(rv AS DOUBLE) / CAST(tv AS DOUBLE))
             * (CAST(rv AS DOUBLE) / CAST(tv AS DOUBLE))
             * 10000.0, 9) AS DECIMAL(18,9))""").as("term"))
      .groupBy("s_nationkey")
      .agg(min(col("n_suppliers")).as("n_suppliers"),
        round(sum(col("term")).cast("double"), 6).as("hhi"))
      .join(tbl(s, dir, "nation")
        .select(col("n_nationkey").as("s_nationkey"), col("n_name")),
        "s_nationkey")
      .select(col("n_name"), col("n_suppliers"), col("hhi"))
      .orderBy("n_name")
  }

  /** Cohen's kappa between two deterministic document-quality raters —
    * the inter-annotator-agreement statistic every labeling pipeline
    * reports, here over two cheap heuristics (chars ≥ corpus mean vs
    * spaces ≥ corpus mean) so the contingency table is exactly
    * replayable. Both thresholds are integer-sum means riding one
    * broadcast row; every cell is an exact count; kappa's divisions
    * happen once, on the final four-cell row.
    */
  def qCohenKappa(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
      .select(col("n_chars"),
        (length(col("text"))
          - length(regexp_replace(col("text"), " ", ""))).cast("long")
          .as("n_spaces"))
    val thr = d.agg(
      (sum(col("n_chars")).cast("double")
        / count(lit(1)).cast("double")).as("avg_chars"),
      (sum(col("n_spaces")).cast("double")
        / count(lit(1)).cast("double")).as("avg_spaces"))
    d.crossJoin(broadcast(thr))
      .select(
        (col("n_chars").cast("double") >= col("avg_chars")).as("a_hi"),
        (col("n_spaces").cast("double") >= col("avg_spaces")).as("b_hi"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("a_hi") && col("b_hi"), 1).otherwise(0))
          .cast("long").as("n11"),
        sum(when(!col("a_hi") && !col("b_hi"), 1).otherwise(0))
          .cast("long").as("n00"),
        sum(when(col("a_hi") && !col("b_hi"), 1).otherwise(0))
          .cast("long").as("n10"),
        sum(when(!col("a_hi") && col("b_hi"), 1).otherwise(0))
          .cast("long").as("n01"))
      .select(col("n"), col("n11"), col("n00"), col("n10"), col("n01"),
        round(expr("CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)"), 6)
          .as("po"),
        round(expr(
          """(CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
             + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"""), 6).as("pe"),
        round(expr(
          """(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
               + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             / (1.0
             - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
               + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))"""), 6)
          .as("kappa"))
  }

  /** Count-Min sketch (d=4 rows × w=256 buckets) over the l_partkey
    * frequency stream, probed at the 8 exact-heaviest keys — the
    * mergeable fixed-memory frequency sketch every streaming
    * heavy-hitter stack runs, with its one-sided error made VISIBLE
    * (estimate − exact ≥ 0 by construction). Hashes are the native
    * codegen'd [[graft.functions.FnvHash64]] over "j:key" — the md5
    * string fold it replaces allocated an md5 digest per exploded row
    * and fenced the sketch's only corpus-sized stage out of
    * whole-stage codegen (r10 VERDICT ask #6); the DuckDB oracle
    * replays the identical FNV fold (Duck.fnv, the q_kmv_overlap
    * precedent). The corpus is scanned once into a 4×-exploded
    * map-side-combined aggregate that collapses to 1024 rows
    * regardless of scale — the sketch property itself.
    */
  def qCountMin(s: SparkSession, dir: String): DataFrame = {
    graft.functions.FnvHash64.register(s)
    graft.functions.FnvHash64Cont.register(s)
    // prefix-state fold (r16): fnv("j:" ++ key) == fnvCont(fnv("j:"), key)
    // and j has exactly 4 values, so the 4 prefix states are computed
    // HERE (plan-time literals, same single source of truth the oracle
    // replays) and the key→string cast is hoisted above the ×4 explode —
    // one cast per corpus row instead of four, no concat, no per-row
    // String alloc in the hash. Same bucket values bit for bit.
    val jst = (0 to 3).map(j => graft.util.Hashing.fnv(s"$j:"))
    val jArr = (0 to 3).map(j => s"named_struct('j', $j, 'st', ${jst(j)}L)")
      .mkString("array(", ", ", ")")
    val bucket = "pmod(graft_fnv64_cont(js.st, ks), 256)"
    val li = tbl(s, dir, "lineitem").select(col("l_partkey"))
    val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("exact_cnt"))
    val top = exact
      .orderBy(col("exact_cnt").desc, col("l_partkey")).limit(8)
    val cms = li
      .select(col("l_partkey"),
        expr("CAST(l_partkey AS STRING)").as("ks"),
        explode(expr(jArr)).as("js"))
      .select(col("l_partkey"), col("js.j").as("j"), expr(bucket).as("b"))
      .groupBy("j", "b").agg(count(lit(1)).as("cnt"))
    top
      .select(col("l_partkey"), col("exact_cnt"),
        expr("CAST(l_partkey AS STRING)").as("ks"),
        explode(expr(jArr)).as("js"))
      .select(col("l_partkey"), col("exact_cnt"),
        col("js.j").as("j"), expr(bucket).as("b"))
      .join(cms, Seq("j", "b"))
      .groupBy("l_partkey", "exact_cnt")
      .agg(min(col("cnt")).as("cms_est"))
      .select(col("l_partkey"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
      .orderBy(col("exact_cnt").desc, col("l_partkey"))
  }

  /** Propensity-matched treatment effect (ATT) — the observational
    * answer when randomization isn't available: each md5-arm "treated"
    * customer is matched to the nearest control at-or-below it on the
    * account-balance covariate WITHIN its market segment, via one
    * window that carries the last-seen control (backward nearest —
    * deterministic, no caliper float edges), and ATT averages the
    * exact-DECIMAL outcome differences over matched pairs. One keyed
    * aggregate + one partitioned window — no pairwise matching join
    * anywhere, which is what makes this shape hold at 100 TB.
    */
  def qPsmAtt(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val outc = tbl(s, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("outcome"))
    val c = tbl(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .join(outc, "c_custkey")
      .withColumn("treated", expr(
        """(CAST(conv(substring(md5(concat('17:',
             CAST(c_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT)
           + 0.5) / 4294967296.0 < 0.5"""))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("treated").cast("int"),
        col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = c
      .withColumn("ctrl_out", when(!col("treated"), col("outcome")))
      .withColumn("ctrl_bal", when(!col("treated"), col("c_acctbal")))
      .withColumn("matched", last(col("ctrl_out"), true).over(w))
      .withColumn("matched_bal", last(col("ctrl_bal"), true).over(w))
    m.agg(
        sum(when(col("treated"), 1).otherwise(0)).cast("long")
          .as("n_treated"),
        sum(when(!col("treated"), 1).otherwise(0)).cast("long")
          .as("n_control"),
        sum(when(col("treated") && col("matched").isNotNull, 1)
          .otherwise(0)).cast("long").as("n_matched"),
        sum(when(col("treated") && col("matched").isNotNull,
          col("outcome") - col("matched"))).as("sdiff"),
        sum(when(col("treated") && col("matched").isNotNull,
          col("c_acctbal") - col("matched_bal"))).as("sgap"),
        sum(when(col("treated"), col("outcome"))).as("st"),
        sum(when(!col("treated"), col("outcome"))).as("sc"))
      .select(col("n_treated"), col("n_control"), col("n_matched"),
        round(expr("CAST(sdiff AS DOUBLE) / CAST(n_matched AS DOUBLE)"),
          6).as("att"),
        round(expr("CAST(sgap AS DOUBLE) / CAST(n_matched AS DOUBLE)"),
          6).as("avg_bal_gap"),
        round(expr(
          """CAST(st AS DOUBLE) / CAST(n_treated AS DOUBLE)
             - CAST(sc AS DOUBLE) / CAST(n_control AS DOUBLE)"""), 6)
          .as("naive_diff"))
  }

  // ---- round-10 batch 8: econometrics over the daily series ----

  /** (Augmented-less) DICKEY–FULLER unit-root test of daily revenue:
    * Δrevₜ = α + β·revₜ₋₁ + ε, ADF t = β̂/se(β̂). Slope and intercept
    * come closed-form from one exact-DECIMAL moment pass over the
    * days-sized aggregate (the q_linreg contract); RSS rides the same
    * moments (Syy − β̂·Sxy — no residual pass), and only the bounded
    * statistics (β, se, t) are rounded for output. β near 0 ⇒ random
    * walk; strongly negative t ⇒ mean-reverting.
    */
  def qAdfTest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lagd = dailyRev18(s, dir)
      .withColumn("xp", lag(col("rev"), 1).over(Window.orderBy("day")))
      .filter(col("xp").isNotNull)
      .select((col("rev") - col("xp")).as("y"), col("xp").as("x"))
    lagd.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").as("n_obs"), expr(
        s"""round($adfBetaSql, 9) + 0.0d""").as("beta"), expr(
        s"""round($adfSeSql, 9) + 0.0d""").as("se_beta"), expr(
        s"""round($adfBetaSql / $adfSeSql, 6) + 0.0d""").as("adf_t"))
  }

  val adfSxxC =
    """(CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"""
  val adfSxyC =
    """(CAST(sxy AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"""
  val adfSyyC =
    """(CAST(syy AS DOUBLE)
       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"""
  val adfBetaSql = s"($adfSxyC / $adfSxxC)"
  val adfSeSql =
    s"""sqrt(greatest(($adfSyyC - $adfBetaSql * $adfSxyC)
         / (CAST(n AS DOUBLE) - 2.0d) / $adfSxxC, 0.0d))"""

  /** GRANGER CAUSALITY (one lag) — does yesterday's ORDER COUNT
    * improve today's revenue forecast beyond yesterday's revenue? The
    * restricted (revₜ₋₁) and unrestricted (revₜ₋₁ + cntₜ₋₁) OLS fits
    * both come closed-form from ONE exact-DECIMAL moment pass (2×2
    * normal equations — no residual pass, no iteration), and the
    * readout is the bounded trio R²_r, R²_u, F. The moment-pass shape
    * is what scales: adding a lag regressor at 100 TB adds a column,
    * not a pass.
    */
  def qGranger(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"),
        count(lit(1)).cast("decimal(18,2)").as("cnt"))
    val w = Window.orderBy("day")
    val lagd = d
      .withColumn("u", lag(col("rev"), 1).over(w))
      .withColumn("v", lag(col("cnt"), 1).over(w))
      .filter(col("u").isNotNull)
      .select(col("rev").as("y"), col("u"), col("v"))
    lagd.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("u")).as("su"), sum(col("v")).as("sv"),
        sum(col("u") * col("y")).as("suy"),
        sum(col("v") * col("y")).as("svy"),
        sum(col("u") * col("u")).as("suu"),
        sum(col("v") * col("v")).as("svv"),
        sum(col("u") * col("v")).as("suv"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").as("n_obs"),
        expr(s"round($grB1Sql, 9) + 0.0d").as("b_lag_rev"),
        expr(s"round($grB2Sql, 9) + 0.0d").as("b_lag_cnt"),
        expr(s"""round(1.0d - $grRssRSql / $grCyy, 6) + 0.0d""")
          .as("r2_r"),
        expr(s"""round(1.0d - $grRssUSql / $grCyy, 6) + 0.0d""")
          .as("r2_u"),
        expr(s"""round(($grRssRSql - $grRssUSql)
            / ($grRssUSql / (CAST(n AS DOUBLE) - 3.0d)), 6) + 0.0d""")
          .as("f_stat"))
  }

  def grC(ab: String, a: String, b: String) =
    s"""(CAST(s$ab AS DOUBLE)
       - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE) / CAST(n AS DOUBLE))"""
  val grCuu = grC("uu", "u", "u")
  val grCvv = grC("vv", "v", "v")
  val grCuv = grC("uv", "u", "v")
  val grCuy = grC("uy", "u", "y")
  val grCvy = grC("vy", "v", "y")
  val grCyy = grC("yy", "y", "y")
  val grDet = s"($grCuu * $grCvv - $grCuv * $grCuv)"
  val grB1Sql = s"(($grCvv * $grCuy - $grCuv * $grCvy) / $grDet)"
  val grB2Sql = s"(($grCuu * $grCvy - $grCuv * $grCuy) / $grDet)"
  val grRssUSql =
    s"($grCyy - $grB1Sql * $grCuy - $grB2Sql * $grCvy)"
  val grRssRSql = s"($grCyy - $grCuy * $grCuy / $grCuu)"

  /** LJUNG–BOX PORTMANTEAU at lags 1..7 over daily revenue: the
    * demeaned series is 6-dp-quantized once (broadcast moment row, the
    * qJarqueBera contract), each lag-k autocovariance is an exact
    * DECIMAL sum over a rank-offset self-join of the days-sized
    * series, ρ is rounded BEFORE squaring so both engines accumulate
    * identical Q, and q_cum is the running n(n+2)·Σρ²/(n−k) — the
    * is-this-series-white-noise gate, per lag.
    */
  def qLjungBox(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mom = dailyRevMoments(s, dir)
    val d = dailyRev18(s, dir).crossJoin(broadcast(mom))
      .select(col("n"),
        row_number().over(Window.orderBy("day")).as("rn"), expr(
        s"""CAST(round(CAST(rev AS DOUBLE) - $revMeanSql, 6) + 0.0d
           AS DECIMAL(18,6))""").as("dd"))
    val den = d.agg(max(col("n")).as("n_days"),
      sum(col("dd") * col("dd")).as("den"))
    val pairs = d.select(col("rn"), col("dd"))
      .crossJoin(spark_range_lags(s))
      .join(d.select(col("rn").as("rn2"), col("dd").as("dd2")),
        col("rn2") === col("rn") - col("lag_k"))
      .groupBy("lag_k")
      .agg(sum(col("dd") * col("dd2")).as("num"))
    pairs.crossJoin(broadcast(den))
      .select(col("lag_k"), col("n_days"), expr(
        """round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0.0d""")
        .as("rho"))
      .withColumn("q_cum", round(sum(expr(
        """CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 2.0d)
           * rho * rho / (CAST(n_days AS DOUBLE)
             - CAST(lag_k AS DOUBLE))"""))
        .over(Window.orderBy("lag_k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        6))
      .select(col("lag_k"), col("rho"), col("q_cum"))
      .orderBy("lag_k")
  }

  def spark_range_lags(s: SparkSession): DataFrame =
    s.range(1, 8).select(col("id").as("lag_k"))

  /** HURST EXPONENT by rescaled-range (R/S) analysis of daily revenue:
    * full blocks of m ∈ {8,16,32,64} days, per block the range of the
    * cumulative 6-dp deviation track over the population σ (both from
    * exact DECIMAL block sums), per-m mean of the rounded R/S values,
    * and H = the slope of round(log2(R/S),9) against k = log2(m) —
    * integer x-axis, so the only libm call is one log2 per block size
    * (9-dp-rounded, the repo's ln contract). H≈0.5 random walk,
    * H>0.5 trending, H<0.5 mean-reverting. Every window is
    * partition-local to a ≤64-row block.
    */
  def qHurst(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rn = dailyRev18(s, dir)
      .select(row_number().over(Window.orderBy("day")).as("rn"),
        col("rev"))
    val sizes = s.range(3, 7)
      .select(col("id").cast("int").as("k"),
        expr("CAST(shiftleft(1, CAST(id AS INT)) AS BIGINT)").as("m"))
    val blk = rn.crossJoin(broadcast(sizes))
      .withColumn("b", expr("CAST(floor((rn - 1) / m) AS BIGINT)"))
    val bm = blk.groupBy("k", "m", "b")
      .agg(count(lit(1)).as("cnt"), sum(col("rev")).as("bs"),
        sum(col("rev") * col("rev")).as("bs2"))
      .filter(col("cnt") === col("m"))
    val dev = blk.join(bm.select(col("k"), col("b"), col("bs")),
        Seq("k", "b"))
      .withColumn("e", expr(
        """CAST(round(CAST(rev AS DOUBLE)
             - CAST(bs AS DOUBLE) / CAST(m AS DOUBLE), 6) + 0.0d
           AS DECIMAL(18,6))"""))
      .withColumn("cum", sum(col("e")).over(Window
        .partitionBy("k", "b").orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("k", "b")
      .agg((max(col("cum")) - min(col("cum"))).as("r"))
    val rs = dev.join(bm, Seq("k", "b"))
      .select(col("k"), col("m"), expr(
        """CAST(round(CAST(r AS DOUBLE) / sqrt(greatest(
             CAST(bs2 AS DOUBLE) / CAST(m AS DOUBLE)
             - (CAST(bs AS DOUBLE) / CAST(m AS DOUBLE))
               * (CAST(bs AS DOUBLE) / CAST(m AS DOUBLE)), 1e-12d)),
             6) + 0.0d AS DECIMAL(18,6))""").as("rs"))
      .groupBy("k", "m")
      .agg(count(lit(1)).as("n_blocks"), expr(
        """round(CAST(SUM(rs) AS DOUBLE) / COUNT(1), 6) + 0.0d""")
        .as("rs_mean"))
      .withColumn("lg", expr(
        "CAST(round(log2(rs_mean), 9) + 0.0d AS DECIMAL(18,9))"))
    val slope = rs.agg(count(lit(1)).as("np"),
        sum(col("k")).as("sk"), sum(col("lg")).as("sl"),
        sum(col("k") * col("lg")).as("skl"),
        sum(col("k") * col("k")).as("skk"))
      .select(expr(
        """round((CAST(np AS DOUBLE) * CAST(skl AS DOUBLE)
             - CAST(sk AS DOUBLE) * CAST(sl AS DOUBLE))
           / (CAST(np AS DOUBLE) * CAST(skk AS DOUBLE)
             - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)), 6) + 0.0d""")
        .as("hurst"))
    rs.crossJoin(broadcast(slope))
      .select(col("m"), col("n_blocks"), col("rs_mean"), col("hurst"))
      .orderBy("m")
  }

  // ---- round-10 batch 9: probabilistic structures + multiple testing ----

  /** BLOOM-FILTER SEMI-JOIN with its false-positive rate made VISIBLE:
    * a 4096-bit / 4-hash filter built over the BUILDING-segment
    * customer keys (md5-fold bit positions — the repo's deterministic-
    * randomness contract, so the oracle rebuilds the identical bit
    * set), probed by every customer. The filter is ≤4096 rows no
    * matter the corpus (the Bloom property), rides a broadcast join,
    * and the readout proves no-false-negatives and measures the FPR —
    * exactly what a 100 TB pre-shuffle row filter needs to certify.
    */
  def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
    def bitSql(keyCol: String) =
      s"""CAST(conv(substring(md5(concat(CAST(j AS STRING), ':',
           CAST($keyCol AS STRING))), 1, 8), 16, 10) AS BIGINT) % 4096"""
    val cust = tbl(s, dir, "customer")
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").as("mem"))
    val bits = cust.filter(col("mem"))
      .select(col("c_custkey"), explode(expr("array(0,1,2,3)")).as("j"))
      .select(expr(bitSql("c_custkey")).as("bit"))
      .distinct()
      .withColumn("present", lit(1))
    val probe = cust
      .select(col("c_custkey"), col("mem"),
        explode(expr("array(0,1,2,3)")).as("j"))
      .withColumn("bit", expr(bitSql("c_custkey")))
      .join(broadcast(bits), Seq("bit"), "left")
      .groupBy("c_custkey", "mem")
      .agg((sum(coalesce(col("present"), lit(0))) === 4).as("passed"))
    probe.agg(
        sum(when(col("mem"), 1).otherwise(0)).cast("long").as("n_build"),
        count(lit(1)).as("n_probe"),
        sum(when(col("passed"), 1).otherwise(0)).cast("long")
          .as("n_pass"),
        sum(when(col("passed") && !col("mem"), 1).otherwise(0))
          .cast("long").as("n_fp"),
        sum(when(!col("passed") && col("mem"), 1).otherwise(0))
          .cast("long").as("n_fn"))
      .withColumn("fpr", round(expr(
        """CAST(n_fp AS DOUBLE)
           / CAST(n_probe - n_build AS DOUBLE)"""), 6))
  }

  /** AMS SKETCH of the second frequency moment (F2 = Σ cnt²) of the
    * l_partkey stream: 16 ±1-signed estimators (md5-parity signs),
    * Z_e = Σ sign·cnt, estimate = median of 4 means of 4 Z² each —
    * fixed 16-row state from one map-side-combined pass, pure integer
    * arithmetic until the final division, with the exact F2 alongside
    * so the sketch's relative error is part of the answer (the
    * q_countmin visible-error contract for the join-size/self-join
    * cardinality estimator).
    */
  def qAmsF2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = tbl(s, dir, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    val exact = freq.agg(sum(col("cnt") * col("cnt")).as("exact_f2"))
    val z = freq
      .select(col("l_partkey"), col("cnt"), explode(expr(
        "sequence(0, 15)")).as("e"))
      .withColumn("sign", expr(
        """CASE WHEN CAST(conv(substring(md5(concat(CAST(e AS STRING),
             ':', CAST(l_partkey AS STRING))), 1, 8), 16, 10) AS BIGINT)
             % 2 = 0 THEN 1 ELSE -1 END"""))
      .groupBy("e").agg(sum(col("sign") * col("cnt")).as("zz"))
    val grp = z.groupBy(expr("CAST(e DIV 4 AS INT)").as("g"))
      .agg(sum(col("zz") * col("zz")).as("s4"))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("s4"), col("g"))))
    grp.filter(col("rk") === 2 || col("rk") === 3)
      .agg((sum(col("s4")).cast("double") / lit(8.0d)).as("ams_est"))
      .crossJoin(broadcast(exact))
      .select(col("exact_f2").cast("long").as("exact_f2"),
        round(col("ams_est"), 2).as("ams_est"),
        round((col("ams_est") - col("exact_f2").cast("double"))
          / col("exact_f2").cast("double"), 6).as("rel_err"))
  }

  /** BENJAMINI–HOCHBERG FDR (α=0.05) over 25 simultaneous per-nation
    * proportion tests (is this nation's F-status order share different
    * from global?): z from exact counts, two-sided p via the
    * Abramowitz–Stegun 26.2.17 normal-tail polynomial evaluated on the
    * 6-dp-quantized |z| (identical input doubles in both engines) and
    * 9-dp-rounded, then the step-up rule as one rank window + one max
    * window over the 25-row test table — the multiple-testing gate
    * every metrics platform needs when it scans hundreds of segments.
    */
  def qBhFdr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = tbl(s, dir, "orders")
      .join(tbl(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        "o_custkey")
    val glob = o.agg(count(lit(1)).as("n"),
      sum(when(col("o_orderstatus") === "F", 1).otherwise(0))
        .cast("long").as("f"))
    val per = o.groupBy("c_nationkey")
      .agg(count(lit(1)).as("ni"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0))
          .cast("long").as("fi"))
      .crossJoin(broadcast(glob))
      .withColumn("z", expr(
        """round((CAST(fi AS DOUBLE) / CAST(ni AS DOUBLE)
             - CAST(f AS DOUBLE) / CAST(n AS DOUBLE))
           / sqrt((CAST(f AS DOUBLE) / CAST(n AS DOUBLE))
             * (1.0d - CAST(f AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(ni AS DOUBLE)), 6) + 0.0d"""))
      .withColumn("p", expr(s"round(least($asTailSql * 2.0d, 1.0d), 9) + 0.0d"))
    val ranked = per
      .join(tbl(s, dir, "nation")
        .select(col("n_nationkey").as("c_nationkey"), col("n_name")),
        "c_nationkey")
      .withColumn("rk",
        row_number().over(Window.orderBy(col("p"), col("n_name"))))
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
      .withColumn("sat", col("p") <= expr(
        "CAST(rk AS DOUBLE) * 0.05d / CAST(m AS DOUBLE)"))
    ranked
      .withColumn("kmax", max(when(col("sat"), col("rk"))
        .otherwise(lit(0))).over(Window.partitionBy()))
      .select(col("n_name"), col("ni").as("n_orders"), col("z"),
        col("p"), col("rk").cast("long").as("p_rank"),
        (col("rk") <= col("kmax")).as("rejected"))
      .orderBy("p_rank")
  }

  /** A&S 26.2.17 upper-tail Φ̄(|z|) on a pre-rounded z column. */
  val asTailSql: String =
    """(exp(-abs(z) * abs(z) / 2.0d) / 2.5066282746310002d
       * ((1.0d / (1.0d + 0.2316419d * abs(z)))
         * (0.319381530d + (1.0d / (1.0d + 0.2316419d * abs(z)))
           * (-0.356563782d + (1.0d / (1.0d + 0.2316419d * abs(z)))
             * (1.781477937d + (1.0d / (1.0d + 0.2316419d * abs(z)))
               * (-1.821255978d + (1.0d / (1.0d + 0.2316419d * abs(z)))
                 * 1.330274429d))))))"""

  /** POWER ANALYSIS / MINIMAL DETECTABLE EFFECT for the md5-arm A/B
    * harness: pooled σ from exact DECIMAL moments of per-customer
    * spend, MDE = (z_{α/2}+z_β)·σ·√(1/n_a+1/n_b) at 80% power /
    * 5% α (literal z constants — no inverse-CDF dependency), absolute
    * and as % of the control mean. One keyed aggregate + one
    * conditional-moment row — the "how long must this experiment run"
    * planner, closed-form at any scale.
    */
  def qPowerMde(s: SparkSession, dir: String): DataFrame = {
    val spend = tbl(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("y"))
      .withColumn("arm", expr(
        """CAST(conv(substring(md5(concat('23:',
             CAST(o_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT)
           % 2"""))
    spend.agg(
        sum(when(col("arm") === 0, 1).otherwise(0)).cast("long")
          .as("n_a"),
        sum(when(col("arm") === 1, 1).otherwise(0)).cast("long")
          .as("n_b"),
        sum(when(col("arm") === 0, col("y"))).as("sa"),
        sum(when(col("arm") === 1, col("y"))).as("sb"),
        sum(when(col("arm") === 0, col("y") * col("y"))).as("qa"),
        sum(when(col("arm") === 1, col("y") * col("y"))).as("qb"))
      .withColumn("sd_pooled", expr(
        """sqrt(greatest(((CAST(qa AS DOUBLE)
             - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
               / CAST(n_a AS DOUBLE))
           + (CAST(qb AS DOUBLE)
             - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
               / CAST(n_b AS DOUBLE)))
           / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0d),
           0.0d))"""))
      .withColumn("mde_abs", expr(
        """(1.959964d + 0.841621d) * sd_pooled
           * sqrt(1.0d / CAST(n_a AS DOUBLE)
             + 1.0d / CAST(n_b AS DOUBLE))"""))
      .select(col("n_a"), col("n_b"),
        round(col("sd_pooled"), 6).as("sd_pooled"),
        round(col("mde_abs"), 6).as("mde_abs"),
        round(expr(
          """mde_abs / (CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE))
             * 100.0d"""), 6).as("mde_pct"))
  }

  // ---- round-10 batch 10: nonparametric tests + inequality ----

  /** KRUSKAL–WALLIS H across the three return-flag groups on quantity:
    * midranks from cumulative counts over the ≤50-value quantity
    * DOMAIN (the qMannWhitney bounded-vocabulary contract — never a
    * corpus sort), rank sums as exact DECIMAL, and the tie correction
    * Σ(t³−t)/(N³−N) in pure BIGINT. Outputs both the raw and
    * tie-corrected H.
    */
  def qKruskalWallis(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = tbl(s, dir, "lineitem")
      .select(expr("CAST(l_quantity AS INT)").as("qty"),
        col("l_returnflag"))
    val dom = li.groupBy("qty").agg(count(lit(1)).as("t"))
      .withColumn("cb", coalesce(sum(col("t")).over(Window
        .orderBy("qty").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("mr", expr(
        """CAST(CAST(cb AS DOUBLE) + (CAST(t AS DOUBLE) + 1.0d) / 2.0d
           AS DECIMAL(12,1))"""))
    val ties = dom.agg(sum(col("t")).as("n"),
      sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    // Pivot to the three fixed flag groups so the Σ R²/n accumulation
    // is ONE fixed-order scalar expression, not an unordered double
    // sum — the cross-engine determinism contract for tiny group sets.
    val ranks = li.join(broadcast(dom.select(col("qty"), col("mr"))),
        "qty")
      .agg(
        sum(when(col("l_returnflag") === "A", 1).otherwise(0))
          .cast("long").as("na"),
        sum(when(col("l_returnflag") === "A", col("mr"))).as("ra"),
        sum(when(col("l_returnflag") === "N", 1).otherwise(0))
          .cast("long").as("nn"),
        sum(when(col("l_returnflag") === "N", col("mr"))).as("rn"),
        sum(when(col("l_returnflag") === "R", 1).otherwise(0))
          .cast("long").as("nr"),
        sum(when(col("l_returnflag") === "R", col("mr"))).as("rr"))
    ranks.crossJoin(broadcast(ties))
      .select(lit(3L).as("n_groups"), col("n").as("n_total"), expr(
        """(CAST(ra AS DOUBLE) * CAST(ra AS DOUBLE)
             / CAST(na AS DOUBLE)
           + CAST(rn AS DOUBLE) * CAST(rn AS DOUBLE)
             / CAST(nn AS DOUBLE)
           + CAST(rr AS DOUBLE) * CAST(rr AS DOUBLE)
             / CAST(nr AS DOUBLE))""").as("rr"),
        col("tsum").as("ts"))
      .select(col("n_groups"), col("n_total"),
        round(expr(hKwSql), 6).as("h"),
        round(expr(
          s"""$hKwSql / (1.0d - CAST(ts AS DOUBLE)
             / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
               * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE)))"""),
          6).as("h_tied"))
  }

  val hKwSql =
    """(12.0d / (CAST(n_total AS DOUBLE)
         * (CAST(n_total AS DOUBLE) + 1.0d)) * rr
       - 3.0d * (CAST(n_total AS DOUBLE) + 1.0d))"""

  /** McNEMAR'S TEST on the two paired document raters from
    * [[qCohenKappa]] (chars-above-mean vs spaces-above-mean): the
    * marginal-homogeneity question answered by the DISCORDANT cells
    * alone, with the continuity-corrected (|b−c|−1)²/(b+c). Exact
    * integer cells from one conditional-count pass.
    */
  def qMcnemar(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
      .select(col("n_chars"),
        (length(col("text"))
          - length(regexp_replace(col("text"), " ", ""))).cast("long")
          .as("n_spaces"))
    val thr = d.agg(
      (sum(col("n_chars")).cast("double")
        / count(lit(1)).cast("double")).as("avg_chars"),
      (sum(col("n_spaces")).cast("double")
        / count(lit(1)).cast("double")).as("avg_spaces"))
    d.crossJoin(broadcast(thr))
      .select(
        (col("n_chars").cast("double") >= col("avg_chars")).as("a_hi"),
        (col("n_spaces").cast("double") >= col("avg_spaces")).as("b_hi"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("a_hi") && !col("b_hi"), 1).otherwise(0))
          .cast("long").as("n10"),
        sum(when(!col("a_hi") && col("b_hi"), 1).otherwise(0))
          .cast("long").as("n01"))
      .select(col("n"), col("n10"), col("n01"),
        // count-derived readout: rndDet, not round (tie determinism)
        rndDet(expr(
          """(abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0d)
             * (abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0d)
             / (CAST(n10 AS DOUBLE) + CAST(n01 AS DOUBLE))"""), 6)
          .as("mcnemar"))
  }

  /** KENDALL'S τ-b between monthly revenue and monthly order count:
    * concordant/discordant/tie counts in PURE INTEGER arithmetic over
    * the ~84-month calendar-bounded pair grid (qRocAuc contract — the
    * all-pairs stays months², never rows²), one sqrt at the end.
    * The rank-robust answer to "do these two series move together".
    */
  def qKendallTau(s: SparkSession, dir: String): DataFrame = {
    val m = tbl(s, dir, "orders")
      .select(date_trunc("month", col("o_orderdate")).as("mon"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("mon")
      .agg(sum(col("p")).as("x"), count(lit(1)).as("y"))
    val pairs = m.alias("a")
      .join(m.alias("b"), col("a.mon") < col("b.mon"))
      .select(
        signum(col("a.x") - col("b.x")).cast("int").as("sx"),
        signum(col("a.y") - col("b.y")).cast("int").as("sy"))
    pairs.agg(count(lit(1)).as("n0"),
        sum(when(col("sx") * col("sy") > 0, 1).otherwise(0))
          .cast("long").as("nc"),
        sum(when(col("sx") * col("sy") < 0, 1).otherwise(0))
          .cast("long").as("nd"),
        sum(when(col("sx") === 0, 1).otherwise(0)).cast("long")
          .as("tx"),
        sum(when(col("sy") === 0, 1).otherwise(0)).cast("long")
          .as("ty"))
      .select(col("n0").as("n_pairs"), col("nc"), col("nd"),
        round(expr(
          """(CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE))
             / sqrt((CAST(n0 AS DOUBLE) - CAST(tx AS DOUBLE))
               * (CAST(n0 AS DOUBLE) - CAST(ty AS DOUBLE)))"""), 6)
          .as("tau_b"))
  }

  /** THEIL T INEQUALITY of per-customer spend, decomposed into
    * BETWEEN-nation and WITHIN-nation components: every ln rides the
    * round-at-9-then-DECIMAL-sum contract (term sums are order-proof),
    * the between term is 25 rows, and the within term weights each
    * nation's own Theil by its revenue share — the "is inequality
    * driven by geography or within-market" decomposition, exactly the
    * corpus-concentration question at 100 TB (swap nation for source).
    */
  def qTheilIndex(s: SparkSession, dir: String): DataFrame = {
    val spend = tbl(s, dir, "orders")
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
      .join(tbl(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")), "c_custkey")
    val nat = spend.groupBy("c_nationkey")
      .agg(count(lit(1)).as("nj"), sum(col("x")).as("sj"))
    val tot = nat.agg(sum(col("nj")).as("n"), sum(col("sj")).as("st"))
    val mu = "(CAST(st AS DOUBLE) / CAST(n AS DOUBLE))"
    val muj = "(CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE))"
    val terms = spend.join(broadcast(nat), "c_nationkey")
      .crossJoin(broadcast(tot))
      .select(col("c_nationkey"), col("nj"), col("sj"), col("n"),
        col("st"),
        expr(s"""CAST(round(CAST(x AS DOUBLE) / $mu
            * ln(CAST(x AS DOUBLE) / $mu), 9) + 0.0d
          AS DECIMAL(18,9))""").as("tg"),
        expr(s"""CAST(round(CAST(x AS DOUBLE) / $muj
            * ln(CAST(x AS DOUBLE) / $muj), 9) + 0.0d
          AS DECIMAL(18,9))""").as("tw"))
    val within = terms.groupBy("c_nationkey")
      .agg(max(col("nj")).as("nj"), max(col("sj")).as("sj"),
        max(col("n")).as("n"), max(col("st")).as("st"),
        sum(col("tg")).as("stg"), sum(col("tw")).as("stw"))
    within.agg(max(col("n")).as("n_customers"),
        sum(col("stg")).as("g"),
        sum(expr("""CAST(round(CAST(sj AS DOUBLE) / CAST(st AS DOUBLE)
            * CAST(stw AS DOUBLE) / CAST(nj AS DOUBLE), 9) + 0.0d
          AS DECIMAL(18,9))""")).as("w"),
        sum(expr(s"""CAST(round(CAST(nj AS DOUBLE) / CAST(n AS DOUBLE)
            * $muj / $mu * ln($muj / $mu), 9) + 0.0d
          AS DECIMAL(18,9))""")).as("b"),
        max(col("n")).as("nn"))
      .select(col("n_customers"),
        round(expr("CAST(g AS DOUBLE) / CAST(nn AS DOUBLE)"), 6)
          .as("theil_total"),
        round(col("b").cast("double"), 6).as("theil_between"),
        round(col("w").cast("double"), 6).as("theil_within"))
  }

  // ---- round-10 batch 11: corpus distance + shape-constrained fits ----

  /** PAIRWISE JENSEN–SHANNON DIVERGENCE between the language unigram
    * distributions (add-1 smoothing over the shared corpus vocab):
    * the symmetric, bounded [0, ln 2] companion to [[qUnigramKl]] that
    * mixture planners use as an actual METRIC (√JSD obeys the
    * triangle inequality). Expansion is vocab × lang-pairs — both
    * bounded — and every ln rides the round-at-12-then-DECIMAL-sum
    * contract.
    */
  def qJsd(s: SparkSession, dir: String): DataFrame = {
    // Cache the (lang, word, count) AGGREGATE — vocab × langs-sized —
    // never the raw exploded tokens; the shared-vocab word list, the
    // per-language totals, and the vocab size all derive from it
    // (r10 VERDICT ask #1).
    val cl = tbl(s, dir, "documents")
      .select(col("lang"), explode(expr(tokensSql)).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("clw"))
      .persist()
    val cw = cl.groupBy("w").agg(sum(col("clw")).as("c"))
    val nl = cl.groupBy("lang").agg(sum(col("clw")).as("ntok"))
    val tot = cw.agg(count(lit(1)).as("v"))
    val pairs = nl.select(col("lang").as("lang_a"),
        col("ntok").as("na"))
      .crossJoin(nl.select(col("lang").as("lang_b"),
        col("ntok").as("nb")))
      .filter(col("lang_a") < col("lang_b"))
    val grid = cw.select(col("w")).crossJoin(broadcast(pairs))
      .join(cl.select(col("lang").as("lang_a"), col("w"),
        col("clw").as("ca")), Seq("lang_a", "w"), "left")
      .join(cl.select(col("lang").as("lang_b"), col("w"),
        col("clw").as("cb")), Seq("lang_b", "w"), "left")
      .crossJoin(broadcast(tot))
      .select(col("lang_a"), col("lang_b"),
        expr("""CAST(coalesce(ca, 0) + 1 AS DOUBLE)
          / CAST(na + v AS DOUBLE)""").as("p"),
        expr("""CAST(coalesce(cb, 0) + 1 AS DOUBLE)
          / CAST(nb + v AS DOUBLE)""").as("q"))
      .select(col("lang_a"), col("lang_b"), expr(
        """CAST(round(0.5d * p * ln(2.0d * p / (p + q))
             + 0.5d * q * ln(2.0d * q / (p + q)), 12)
           AS DECIMAL(28,12))""").as("term"))
    grid.groupBy("lang_a", "lang_b")
      .agg(round(expr("CAST(sum(term) AS DOUBLE)"), 6).as("jsd"))
      .withColumn("jsd_norm",
        round(expr("jsd / 0.6931471805599453d"), 6))
      .orderBy("lang_a", "lang_b")
  }

  /** BURROWS' DELTA stylometric distance between sources: the 30 most
    * frequent corpus words (ties by word), per-source relative
    * frequencies z-scored ACROSS sources (population σ over the fixed
    * 20-source panel), Δ(a,b) = mean |z_a − z_b| — the classic
    * authorship-attribution measure, here the "which sources write
    * alike" screen. The whole computation lives on a 30 × 20 grid;
    * the 15 closest pairs come out.
    */
  def qBurrowsDelta(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Cache the (source, word, count) AGGREGATE — vocab × sources-sized
    // — never the raw exploded tokens; top-words, per-source totals,
    // and the top-word frequencies all derive from it (r10 VERDICT
    // ask #1).
    val sw = fanout(tbl(s, dir, "documents")
        .select(col("source"), col("text")))
      .select(col("source"), explode(expr(tokensSql)).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("csw"))
      .persist()
    val top = sw.groupBy("w").agg(sum(col("csw")).as("c"))
      .orderBy(col("c").desc, col("w")).limit(30)
    val ns = sw.groupBy("source").agg(sum(col("csw")).as("ntok"))
    val f = sw.join(broadcast(top.select("w")), "w")
      .join(broadcast(ns), "source")
      .select(col("source"), col("w"),
        expr("CAST(csw AS DOUBLE) / CAST(ntok AS DOUBLE)").as("f"))
    // complete the grid: absent (source, word) cells are f = 0
    val grid = top.select("w")
      .crossJoin(broadcast(ns.select("source")))
      .join(f, Seq("source", "w"), "left")
      .withColumn("f", coalesce(col("f"), lit(0.0d)))
    val wstat = grid.groupBy("w")
      .agg(count(lit(1)).as("k"), expr(
        """CAST(SUM(CAST(round(f * 1e9d, 0) AS DECIMAL(18,0)))
          AS DECIMAL(38,0))""").as("sf"),
        expr("""CAST(SUM(CAST(round(f * 1e9d, 0) AS DECIMAL(18,0))
            * CAST(round(f * 1e9d, 0) AS DECIMAL(18,0)))
          AS DECIMAL(38,0))""").as("sf2"))
    val z = grid.join(broadcast(wstat), "w")
      .select(col("source"), col("w"), expr(
        """round((round(f * 1e9d, 0)
             - CAST(sf AS DOUBLE) / CAST(k AS DOUBLE))
           / sqrt(greatest(CAST(sf2 AS DOUBLE) / CAST(k AS DOUBLE)
             - (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE))
               * (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE)), 1e-6d)),
           6) + 0.0d""").as("z"))
    val za = z.select(col("source").as("src_a"), col("w"),
      col("z").as("za"))
    val zb = z.select(col("source").as("src_b"), col("w"),
      col("z").as("zb"))
    za.join(zb, Seq("w")).filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), expr(
        """CAST(round(abs(za - zb), 6) AS DECIMAL(18,6))""").as("d"))
      .groupBy("src_a", "src_b")
      .agg(round(expr("CAST(SUM(d) AS DOUBLE) / COUNT(1)"), 6)
        .as("delta"))
      .orderBy(col("delta"), col("src_a"), col("src_b"))
      .limit(15)
  }

  /** LEAD–LAG CROSS-CORRELATION between daily revenue and daily order
    * count at lags −7..+7: both series demeaned and 6-dp-quantized off
    * one broadcast moment row, lag-k cross-products as exact DECIMAL
    * sums over a rank-offset self-join, CCF-normalized by the full-
    * series √(Σdx²·Σdy²) — the "which series LEADS" diagnostic that
    * pairs with [[qGranger]]. All work happens on the days-sized
    * aggregate.
    */
  def qXcorr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"),
        count(lit(1)).as("cnt"))
    val mom = daily.agg(count(lit(1)).as("n"), sum(col("rev")).as("sx"),
      sum(col("cnt")).as("sy"))
    val d = daily.crossJoin(broadcast(mom))
      .select(row_number().over(Window.orderBy("day")).as("rn"), expr(
        """CAST(round(CAST(rev AS DOUBLE)
             - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0d
           AS DECIMAL(18,6))""").as("dx"), expr(
        """CAST(round(CAST(cnt AS DOUBLE)
             - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0d
           AS DECIMAL(18,6))""").as("dy"))
    val den = d.agg(sum(col("dx") * col("dx")).as("dxx"),
      sum(col("dy") * col("dy")).as("dyy"))
    val lags = s.range(-7, 8).select(col("id").as("lag_k"))
    d.crossJoin(lags)
      .join(d.select(col("rn").as("rn2"), col("dy").as("dy2")),
        col("rn2") === col("rn") + col("lag_k"))
      .groupBy("lag_k")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("dx") * col("dy2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag_k"), col("n_pairs"),
        round(expr("""CAST(num AS DOUBLE)
          / sqrt(CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE))"""), 6)
          .as("r"))
      .orderBy("lag_k")
  }

  /** ISOTONIC (PAV) REGRESSION of monthly mean order value against
    * time, via the Barlow minimax characterization fit(k) =
    * max_{s≤k} min_{t≥k} mean(y[s..t]): interval means come exact
    * from prefix DECIMAL sums (6-dp-quantized so min/max are engine-
    * identical), the inner min is ONE suffix-min window per start
    * month, the outer max ONE keyed aggregate — no iterative
    * pool-adjacent loop, so the fit is a closed two-window plan over
    * the months² grid (~84² rows at any SF: calendar-bounded). The
    * monotone fit every calibration stack needs.
    */
  def qIsotonic(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = tbl(s, dir, "orders")
      .select(to_date(date_trunc("month", col("o_orderdate"))).as("mon"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("mon")
      .agg(sum(col("p")).as("sp"), count(lit(1)).as("cnt"))
      .select(col("mon"),
        expr("CAST(round(CAST(sp AS DOUBLE) / CAST(cnt AS DOUBLE), 6)"
          + " + 0.0d AS DECIMAL(18,6))").as("y"))
      .withColumn("i", row_number().over(Window.orderBy("mon")))
    val pre = m.withColumn("pp", sum(col("y")).over(Window.orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val a = pre.select(col("i").as("si"), col("pp").as("ps"),
        (col("pp") - col("y")).as("ps0"))
      .join(pre.select(col("i").as("ti"), col("pp").as("pt")),
        col("ti") >= col("si"))
      .select(col("si"), col("ti"), expr(
        // block averages (int/int) land ON .5 ties at 6dp: floor-form
        """CAST(floor(CAST(pt - ps0 AS DOUBLE)
             / CAST(ti - si + 1 AS DOUBLE) * 1e6 + 0.5) / 1e6 + 0.0d
           AS DECIMAL(18,6))""").as("avg_st"))
    val inner = a.withColumn("msuf", min(col("avg_st")).over(Window
      .partitionBy("si").orderBy("ti")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    val fit = inner.filter(col("ti") >= col("si"))
      .groupBy(col("ti").as("i"))
      .agg(max(when(col("si") <= col("ti"), col("msuf"))).as("fit0"))
    // fit at k needs rows (s, k) for every s ≤ k: those are exactly
    // the (si, ti=k) grid rows, so the groupBy above reads them all.
    m.join(fit, "i")
      .select(col("mon"), col("y").cast("double").as("y"),
        col("fit0").cast("double").as("fit"))
      .orderBy("mon")
  }

}
