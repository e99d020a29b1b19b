package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.EngineConfig
import graft.engine.InceptionEngine

/** Eval/agreement/lexical/embedding-QA batteries and drift monitors, concentration and link-score queries.
  *
  * Split out of SparkEntry.scala (round 16): members mix into
  * [[SparkEntry]] and resolve against its full surface via the
  * self-type; mixin order in SparkEntry preserves the original
  * declaration (and so val-initialization) order.
  */
private[graft] trait SparkEntryEvalDrift { this: SparkEntry.type =>

  // ---- round-13 batch: eval/agreement/lexical/embedding-QA ----

  /** MRR@10 — the reciprocal-rank twin of q_ndcg_eval on the same
    * 8-query harness: the full-dimension rank-1 neighbor is the truth
    * item; the truncated-16-dim ranking is scored by 1/rank of that
    * item within its top 10 (0 if missed). Same 4dp cosine contract
    * as the ANN battery; 1/rank at 6dp sits far from any rounding
    * boundary for ranks 1..10. Broadcast 8 queries — one corpus scan.
    */
  def qMrrEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (a, b) => a * b),
        lit(0.0d), (acc, t) => acc + t)
    def cos(a: Column, b: Column): Column =
      round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 4)
    val emb = tbl(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = emb.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cos(col("v"), col("qv")).as("cf"),
        cos(slice(col("v"), 1, 16), slice(col("qv"), 1, 16)).as("cp"))
    val wF = Window.partitionBy("qid").orderBy(col("cf").desc, col("vec_id"))
    val wP = Window.partitionBy("qid").orderBy(col("cp").desc, col("vec_id"))
    scored
      .withColumn("rf", row_number().over(wF))
      .withColumn("rp", row_number().over(wP))
      .filter(col("rf") === 1)
      .select(col("qid"), col("rp").cast("long").as("truth_rank"),
        when(col("rp") <= 10,
          round(lit(1.0) / col("rp").cast("double"), 6))
          .otherwise(lit(0.0)).as("rr"))
      .orderBy("qid")
  }

  /** EIGENVECTOR CENTRALITY (power-iteration estimate) over the
    * co-supplier graph, INTEGER-EXACT: A^4·1 counts length-4 walks, so
    * four unnormalized iterations are pure BIGINT-in-DECIMAL sums —
    * no float normalization for an oracle to disagree about — and the
    * score is each node's walk count over the max in PARTS PER
    * MILLION, computed entirely in the integer domain:
    * (walks4 · 10⁶) div max. The walks4 READOUT is BIGINT, not
    * DECIMAL(38,0): two driver-red rounds traced to the compare
    * layer, not the math — DuckDB's pandas conversion renders final
    * DECIMAL columns as float64 while Spark's parquet decimal reads
    * back exact (see qEmbNormStats, the only other query that
    * emitted a DECIMAL column and the only other red row). Walk
    * counts fit BIGINT at gate scale with ample headroom; the
    * internal accumulation stays DECIMAL(38,0).
    * Spectral importance beside q_pagerank's teleport walk and
    * q_katz's damped paths; 4 keyed joins against the edges
    * artifact, state = one row per node.
    */
  def qEigenCentrality(s: SparkSession, dir: String): DataFrame = {
    val e = writtenEdgesTable(s, dir)
    val w1 = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("w"))
    val w4 = (1 to 3).foldLeft(w1) { (w, _) =>
      e.join(w, e("dst") === w("node"))
        .groupBy(e("src").as("node"))
        .agg(sum(col("w")).cast("decimal(38,0)").as("w"))
    }
    val mx = w4.agg(max(col("w")).as("m"))
    w4.crossJoin(broadcast(mx))
      .select(col("node").as("suppkey"),
        col("w").cast("long").as("walks4"),
        expr("(w * CAST(1000000 AS DECIMAL(38,0))) div m")
          .as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("suppkey"))
      .limit(20)
  }

  /** DIAGNOSTIC stage decompositions for the two historically
    * driver-red rows (r12–r14): each slices one pipeline stage into a
    * pure-integer BIGINT emission, so if a headline row ever diverges
    * again the CORRECTNESS file localizes the stage (edge set → w1 →
    * w4; raw floats → squares → 1e9 readout) instead of leaving the
    * whole pipeline opaque. All readouts are BIGINT by the compare-
    * layer rule above (final DECIMAL columns render as float64 on the
    * oracle side). Each is a one-scan aggregate — O(1) output rows.
    */
  def qEigDbgEdges(s: SparkSession, dir: String): DataFrame =
    writtenEdgesTable(s, dir).agg(
      count(lit(1)).as("n_edges"),
      sum(col("src")).cast("long").as("sum_src"),
      sum(col("dst")).cast("long").as("sum_dst"),
      sum((col("src") * lit(1048573L) + col("dst")) % lit(1000003L))
        .cast("long").as("edge_checksum"))

  def eigWalks(s: SparkSession, dir: String, steps: Int)
      : DataFrame = {
    val e = writtenEdgesTable(s, dir)
    val w1 = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("w"))
    (1 to steps).foldLeft(w1) { (w, _) =>
      e.join(w, e("dst") === w("node"))
        .groupBy(e("src").as("node"))
        .agg(sum(col("w")).cast("decimal(38,0)").as("w"))
    }
  }

  def qEigDbgW(steps: Int)(s: SparkSession, dir: String)
      : DataFrame =
    eigWalks(s, dir, steps).agg(
      count(lit(1)).as("n_nodes"),
      sum(col("w")).cast("long").as("sum_w"),
      min(col("w")).cast("long").as("min_w"),
      max(col("w")).cast("long").as("max_w"))

  def qEmbDbg(squared: Boolean)(s: SparkSession, dir: String)
      : DataFrame = {
    val ef = col("ef").cast("double")
    val v = if (squared) ef * ef else ef
    tbl(s, dir, "embeddings")
      .select(col("label"), explode(col("embedding")).as("ef"))
      .select(col("label"),
        floor(v * lit(1.0e3d)).cast("decimal(38,0)").as("q"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_elems"),
        sum(col("q")).cast("long").as("sum_q_e3"),
        min(col("q")).cast("long").as("min_q_e3"),
        max(col("q")).cast("long").as("max_q_e3"))
      .orderBy("label")
  }

  /** THETA-STYLE one-step forecast on monthly revenue per priority:
    * the average of the drift-line extrapolation (x_n + slope) and
    * the α=.5 SES level — the two "theta lines" of the classic
    * method, with the SES recursion folded in the SAME operation
    * order as the DuckDB recursive CTE (the q_holt_winters
    * bit-matching contract). Months-sized state.
    */
  def qThetaForecast(s: SparkSession, dir: String): DataFrame = {
    val monthly = tbl(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("pri"),
        date_trunc("month", col("o_orderdate")).as("m"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)")
        .as("x"))
    monthly.groupBy("pri")
      .agg(array_sort(collect_list(struct(col("m"), col("x")))).as("ser"))
      .select(col("pri"), expr("transform(ser, e -> e.x)").as("xs"))
      .select(col("pri"), size(col("xs")).cast("long").as("n_periods"),
        expr("""aggregate(slice(xs, 2, size(xs) - 1),
            element_at(xs, 1),
            (acc, x) -> 0.5 * x + 0.5 * acc)""").as("ses"),
        expr("""(element_at(xs, size(xs)) - element_at(xs, 1))
            / CAST(size(xs) - 1 AS DOUBLE)""").as("drift"),
        col("xs"))
      .select(col("pri"), col("n_periods"),
        round(col("ses"), 6).as("ses_level"),
        round(col("drift"), 6).as("drift"),
        round(expr("""0.5 * (element_at(xs, size(xs)) + (element_at(xs,
            size(xs)) - element_at(xs, 1)) / CAST(size(xs) - 1 AS DOUBLE))
            + 0.5 * ses"""), 6).as("forecast"))
      .orderBy("pri")
  }

  /** MASE of the SEASONAL-NAIVE forecaster (12-month season) on the
    * last 6 months per priority — the scale-free forecast-accuracy
    * metric (MASE < 1 beats the in-sample seasonal naive). Numerator
    * and denominator MAEs accumulate as 9dp DECIMALs so partition
    * order cannot perturb them; one matched double division at the
    * end. One lag window over a months-sized series.
    */
  def qMaseEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = tbl(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("pri"),
        date_trunc("month", col("o_orderdate")).as("m"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)")
        .as("x"))
    val w = Window.partitionBy("pri").orderBy("m")
    val wn = Window.partitionBy("pri")
    monthly
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("x12", lag(col("x"), 12).over(w))
      .filter(col("x12").isNotNull)
      .select(col("pri"), col("n"),
        when(col("i") > col("n") - 6, expr(
          "CAST(round(abs(x - x12), 9) AS DECIMAL(28,9))"))
          .as("test_ae"),
        when(col("i") <= col("n") - 6, expr(
          "CAST(round(abs(x - x12), 9) AS DECIMAL(28,9))"))
          .as("train_ae"))
      .groupBy("pri")
      .agg(min(col("n")).as("n_periods"),
        count(col("test_ae")).as("n_test"),
        count(col("train_ae")).as("n_train"),
        sum(col("test_ae")).as("tsum"), sum(col("train_ae")).as("rsum"))
      .select(col("pri"), col("n_periods"), col("n_test"), col("n_train"),
        round(expr("""(CAST(tsum AS DOUBLE) / CAST(n_test AS DOUBLE))
            / (CAST(rsum AS DOUBLE) / CAST(n_train AS DOUBLE))"""), 6)
          .as("mase"))
      .orderBy("pri")
  }

  /** KENDALL'S W (coefficient of concordance) across the 3-rater
    * fixture, TIE-FREE and INTEGER-EXACT: each rater ranks a lang's
    * docs by an md5-perturbed n_chars (row_number, doc_id tiebreak),
    * and W = Σ(2Rᵢ − m(n+1))² / (m²(n³−n)/3) is computed with an
    * integer numerator — the only float is the final division. The
    * many-rater ordinal complement of q_fleiss_kappa (nominal) and
    * q_kendall_tau (two rankings).
    */
  def qKendallW(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = tbl(s, dir, "documents")
      .filter(col("n_chars").isNotNull)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        explode(expr("array(1,2,3)")).as("r"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat('kw:', CAST(r AS STRING), " +
          "':', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 5"))
      .withColumn("score", col("n_chars") + col("h"))
    val w = Window.partitionBy("lang", "r")
      .orderBy(col("score"), col("doc_id"))
    val wn = Window.partitionBy("lang")
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .groupBy("lang", "doc_id")
      .agg(sum(col("rank")).as("ri"))
      .withColumn("n", count(lit(1)).over(wn))
      // S4 = Σ(2Rᵢ − m(n+1))² with m = 3: 4·Σ(Rᵢ − mean)², integer
      .select(col("lang"), col("n"), expr(
        "(2*ri - 3*(n + 1)) * (2*ri - 3*(n + 1))").as("sq"))
      .groupBy("lang")
      .agg(min(col("n")).as("n_docs"), sum(col("sq")).as("s4"))
      .select(col("lang"), col("n_docs"),
        round(expr("""CAST(s4 AS DOUBLE)
            / (3.0 * (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)
              * CAST(n_docs AS DOUBLE) - CAST(n_docs AS DOUBLE)))"""), 6)
          .as("w"))
      .orderBy("lang")
  }

  /** V-MEASURE (homogeneity / completeness / V) of `source` as a
    * clustering of `lang` — the entropy-based clustering-quality
    * triple beside q_mutual_info's raw MI. Every entropy term is a
    * 9dp DECIMAL over the cells-sized (lang, source) contingency (one
    * corpus aggregate), and the h/c/V arithmetic is one matched
    * double expression per output cell. Degenerate entropies (a
    * single class or cluster) report NULL, never a division blowup.
    */
  def qVMeasure(s: SparkSession, dir: String): DataFrame = {
    val cell = tbl(s, dir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("ncs"))
    val nc = cell.groupBy("lang").agg(sum(col("ncs")).as("nc"))
    val nk = cell.groupBy("source").agg(sum(col("ncs")).as("nk"))
    val tot = cell.agg(sum(col("ncs")).as("n"))
    def tsum(df: DataFrame, num: String, den: String): DataFrame =
      df.crossJoin(broadcast(tot)).select(expr(
        s"""CAST(round((CAST($num AS DOUBLE) / CAST(n AS DOUBLE))
            * ln(CAST($num AS DOUBLE) / CAST($den AS DOUBLE)), 9)
          AS DECIMAL(28,9))""").as("t"))
        .agg(sum(col("t")).as("s"))
    val sck = tsum(cell.join(broadcast(nk), "source"), "ncs", "nk")
      .select(col("s").as("sck"))
    val skc = tsum(cell.join(broadcast(nc), "lang"), "ncs", "nc")
      .select(col("s").as("skc"))
    val sc = tsum(nc.crossJoin(broadcast(tot)).select(col("nc"),
        tot("n").as("den")), "nc", "den")
      .select(col("s").as("sc"))
    val sk = tsum(nk.crossJoin(broadcast(tot)).select(col("nk"),
        tot("n").as("den")), "nk", "den")
      .select(col("s").as("sk"))
    tot.crossJoin(sck).crossJoin(skc).crossJoin(sc).crossJoin(sk)
      .select(col("n").cast("long").as("n_docs"),
        round(expr("""CASE WHEN CAST(sc AS DOUBLE) = 0.0 THEN NULL
            ELSE 1.0 - CAST(sck AS DOUBLE) / CAST(sc AS DOUBLE)
          END"""), 6).as("homogeneity"),
        round(expr("""CASE WHEN CAST(sk AS DOUBLE) = 0.0 THEN NULL
            ELSE 1.0 - CAST(skc AS DOUBLE) / CAST(sk AS DOUBLE)
          END"""), 6).as("completeness"),
        round(expr(
          """CASE WHEN CAST(sc AS DOUBLE) = 0.0
                 OR CAST(sk AS DOUBLE) = 0.0
                 OR (1.0 - CAST(sck AS DOUBLE) / CAST(sc AS DOUBLE))
                   + (1.0 - CAST(skc AS DOUBLE) / CAST(sk AS DOUBLE))
                   = 0.0 THEN NULL
             ELSE 2.0 * (1.0 - CAST(sck AS DOUBLE) / CAST(sc AS DOUBLE))
               * (1.0 - CAST(skc AS DOUBLE) / CAST(sk AS DOUBLE))
               / ((1.0 - CAST(sck AS DOUBLE) / CAST(sc AS DOUBLE))
                 + (1.0 - CAST(skc AS DOUBLE) / CAST(sk AS DOUBLE)))
           END"""), 6).as("v_measure"))
  }

  /** GWET'S AC1 per lang over the 3-rater nominal fixture (fresh
    * `ga:` md5 fold, 4 categories) — the chance-corrected agreement
    * coefficient that stays stable when category prevalence is skewed
    * (the kappa paradox q_cohen_kappa/q_fleiss_kappa inherit). Pa is
    * an integer ratio (Σ n_c(n_c−1) over m(m−1)N); Pe(γ1) =
    * Σ_c π_c(1−π_c)/(q−1) from integer category totals — one matched
    * double expression each.
    */
  def qGwetAc1(s: SparkSession, dir: String): DataFrame = {
    val labels = tbl(s, dir, "documents")
      .filter(col("n_chars").isNotNull)
      .select(col("lang"), col("doc_id"),
        expr("LEAST(n_chars DIV 400, 2)").as("b"))
      .select(col("lang"), col("doc_id"), col("b"),
        explode(expr("array(1,2,3)")).as("r"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat('ga:', CAST(r AS STRING), " +
          "':', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 7"))
      .withColumn("label", expr(
        "(b + CASE WHEN h = 0 THEN 1 + r ELSE 0 END) % 4"))
    val cellDoc = labels.groupBy("lang", "doc_id", "label")
      .agg(count(lit(1)).as("ndc"))
    val pa = cellDoc.groupBy("lang", "doc_id")
      .agg(sum(expr("ndc * (ndc - 1)")).as("agree"))
      .groupBy("lang")
      .agg(count(lit(1)).as("nd"), sum(col("agree")).as("asum"))
    // π_c = T_c/(3·N_d); Pe(γ1) = Σ_c π_c(1−π_c)/(q−1), q = 4 fixed
    // (absent categories contribute 0); terms 9dp-DECIMAL exact
    val pe = cellDoc.groupBy("lang", "label")
      .agg(sum(col("ndc")).as("t"))
      .join(broadcast(pa.select(col("lang"), col("nd"))), "lang")
      .select(col("lang"), expr(
        """CAST(round((CAST(t AS DOUBLE) / (3.0 * CAST(nd AS DOUBLE)))
            * (1.0 - CAST(t AS DOUBLE) / (3.0 * CAST(nd AS DOUBLE)))
            / 3.0, 9) AS DECIMAL(18,9))""").as("peterm"))
      .groupBy("lang").agg(sum(col("peterm")).as("pesum"))
    pa.join(pe, "lang")
      .select(col("lang"), col("nd").as("n_docs"),
        round(expr("CAST(asum AS DOUBLE) / (6.0 * CAST(nd AS DOUBLE))"), 6)
          .as("pa"),
        round(col("pesum").cast("double"), 6).as("pe"),
        round(expr(
          """(CAST(asum AS DOUBLE) / (6.0 * CAST(nd AS DOUBLE))
              - CAST(pesum AS DOUBLE)) / (1.0 - CAST(pesum AS DOUBLE))"""),
          6).as("ac1"))
      .orderBy("lang")
  }

  /** MAP@10 (mean-average-precision shape, reported per query): the
    * graded cousin of q_mrr_eval on the same truncation study —
    * relevant = the FULL-dim top-3 neighbors, ranking = the truncated
    * 16-dim order; AP@10 = Σ precision@hit / 3. Same 8-query broadcast
    * panel, two rank windows per query, DECIMAL(18,9)-exact precision
    * sums so partition order cannot perturb the 6dp report.
    */
  def qMapEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (a, b) => a * b),
        lit(0.0d), (acc, t) => acc + t)
    def cos(a: Column, b: Column): Column =
      round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 4)
    val emb = tbl(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = emb.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cos(col("v"), col("qv")).as("cf"),
        cos(slice(col("v"), 1, 16), slice(col("qv"), 1, 16)).as("cp"))
    val wF = Window.partitionBy("qid").orderBy(col("cf").desc, col("vec_id"))
    val wP = Window.partitionBy("qid").orderBy(col("cp").desc, col("vec_id"))
    val ranked = scored
      .withColumn("rf", row_number().over(wF))
      .withColumn("rp", row_number().over(wP))
    val wHit = Window.partitionBy("qid").orderBy("rp")
    val hits = ranked.filter(col("rf") <= 3 && col("rp") <= 10)
      .withColumn("k", row_number().over(wHit))
      .select(col("qid"), expr(
        """CAST(round(CAST(k AS DOUBLE) / CAST(rp AS DOUBLE), 9)
             AS DECIMAL(18,9))""").as("prec"))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_hits"), sum(col("prec")).as("psum"))
    qs.select(col("qid")).join(hits, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        // 9dp-decimal/3 readout lands ON .5 ties at 6dp: rndDet
        rndDet(coalesce(col("psum").cast("double"), lit(0.0)) / 3.0, 6)
          .as("ap10"))
      .orderBy("qid")
  }

  /** ANDERSON–DARLING uniformity statistic per source, on a
    * deterministic integer-arithmetic unit value (doc_id scrambled by
    * a fixed odd multiplier mod a prime — exactly reproducible in any
    * engine, unlike float hashing). The tail-weighted EDF test that
    * catches what q_ks_test's sup-norm misses. One ranked window per
    * source; the Σ(2i−1)(ln uᵢ + ln(1−u₍ₙ₊₁₋ᵢ₎)) sum is regrouped per
    * ROW (coefficients 2i−1 and 2(n−i)+1 on the same row), so a single
    * pass computes it; terms are 9dp DECIMAL(28,9) so the sum is exact
    * under any partitioning. A² = −n − S/n.
    */
  def qAdTest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = tbl(s, dir, "documents")
      .select(col("source"), col("doc_id"), expr(
        "CAST((doc_id * 2654435761) % 1000003 + 1 AS DOUBLE) / 1000005.0")
        .as("u"))
    val w = Window.partitionBy("source").orderBy(col("u"), col("doc_id"))
    val wn = Window.partitionBy("source")
    u.withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .select(col("source"), col("n"), expr(
        """CAST(round((2*i - 1) * ln(u) + (2*(n - i) + 1) * ln(1.0 - u),
             9) AS DECIMAL(28,9))""").as("t"))
      .groupBy("source")
      .agg(min(col("n")).as("n_docs"), sum(col("t")).as("ssum"))
      .select(col("source"), col("n_docs"),
        round(expr("""-CAST(n_docs AS DOUBLE)
            - CAST(ssum AS DOUBLE) / CAST(n_docs AS DOUBLE)"""), 6)
          .as("a2"))
      .orderBy("source")
  }

  /** GOOD–TURING frequency re-estimation over the corpus unigram
    * frequency-of-frequencies: r* = (r+1)·N_{r+1}/N_r for r ≤ 5 — the
    * smoothing every count-based LM pipeline reports, and the N₁/N
    * mass estimate for unseen types. Two integer hash-aggregates
    * (corpus → word counts → count-of-counts); the lead window runs
    * over the FREQUENCY TABLE (hundreds of rows at any corpus size),
    * never the corpus.
    */
  def qGoodTuring(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ff = tbl(s, dir, "documents")
      .select(explode(expr(tokensSql)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("r"))
      .groupBy("r").agg(count(lit(1)).as("n_r"))
    // bounded input: distinct frequencies, not words (the qPareto rule)
    val w = Window.orderBy("r")
    ff.withColumn("n_next", lead(col("n_r"), 1).over(w))
      .withColumn("r_next", lead(col("r"), 1).over(w))
      .filter(col("r") <= 5)
      .select(col("r"), col("n_r"),
        when(col("r_next") === col("r") + 1,
          round(col("r_next").cast("double") * col("n_next").cast("double")
            / col("n_r").cast("double"), 6)).as("r_star"))
      .orderBy("r")
  }

  /** CHAO1 species-richness estimate of each source's vocabulary:
    * D + f₁(f₁−1)/(2(f₂+1)) from distinct types, singletons, and
    * doubletons — "how many word types does this source REALLY have,
    * given what sampling hid". One counts-sized aggregate over the
    * (source, word, count) cache shape; integer inputs, one final
    * double expression.
    */
  def qChao1(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("source"), explode(expr(tokensSql)).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("csw"))
      .groupBy("source")
      .agg(count(lit(1)).as("d"),
        sum(when(col("csw") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("csw") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("d"), col("f1"), col("f2"),
        round(expr("""CAST(d AS DOUBLE)
            + CAST(f1 * (f1 - 1) AS DOUBLE)
              / (2.0 * CAST(f2 + 1 AS DOUBLE))"""), 6).as("chao1"))
      .orderBy("source")

  /** HELLINGER DISTANCE between each source's unigram distribution and
    * the corpus distribution — the bounded [0,1] drift metric that,
    * unlike q_unigram_kl, is symmetric and finite on disjoint support.
    * Same counts-sized aggregate cache shape as the KL query; the
    * Bhattacharyya sum Σ√(pq) is 9dp-DECIMAL exact, H = √(1−BC) with a
    * GREATEST(0,·) guard against rounding pushing BC past 1.
    */
  def qHellinger(s: SparkSession, dir: String): DataFrame = {
    val cs = tbl(s, dir, "documents")
      .select(col("source"), explode(expr(tokensSql)).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("csw"))
    val cw = cs.groupBy("w").agg(sum(col("csw")).as("c"))
    val ns = cs.groupBy("source").agg(sum(col("csw")).as("ns"))
    val tot = cw.agg(sum(col("c")).as("nn"))
    // inner join is exact: a word absent from a source contributes
    // √(0·q) = 0 to the Bhattacharyya sum
    cs.join(cw, "w").join(broadcast(ns), "source")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("ns"), expr(
        """CAST(round(sqrt((CAST(csw AS DOUBLE) / CAST(ns AS DOUBLE))
             * (CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))), 9)
           AS DECIMAL(28,9))""").as("t"))
      .groupBy("source")
      .agg(min(col("ns")).as("n_tokens"), sum(col("t")).as("bc"))
      .select(col("source"), col("n_tokens"),
        round(col("bc").cast("double"), 6).as("bhattacharyya"),
        round(expr(
          "sqrt(GREATEST(0.0, 1.0 - CAST(bc AS DOUBLE)))"), 6)
          .as("hellinger"))
      .orderBy("source")
  }

  /** HOLT'S LINEAR TREND (double exponential smoothing, α=.5 β=.3)
    * over monthly revenue per order priority: level/trend recursion
    * folded with `aggregate()` over the month-sorted array — a
    * months-sized plan (the series, never the orders, sits in one
    * array), with the recursion's double arithmetic written in the
    * SAME operation order as the DuckDB recursive-CTE oracle so the
    * fold is bit-identical. Forecast = level + trend.
    */
  def qHoltWinters(s: SparkSession, dir: String): DataFrame = {
    val monthly = tbl(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("pri"),
        date_trunc("month", col("o_orderdate")).as("m"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)")
        .as("x"))
    monthly.groupBy("pri")
      .agg(array_sort(collect_list(struct(col("m"), col("x")))).as("ser"))
      .select(col("pri"), expr("transform(ser, e -> e.x)").as("xs"))
      .select(col("pri"), size(col("xs")).cast("long").as("n_periods"),
        expr("""aggregate(
            slice(xs, 3, size(xs) - 2),
            named_struct(
              'l', element_at(xs, 2),
              'b', element_at(xs, 2) - element_at(xs, 1)),
            (acc, x) -> named_struct(
              'l', 0.5 * x + 0.5 * (acc.l + acc.b),
              'b', 0.3 * ((0.5 * x + 0.5 * (acc.l + acc.b)) - acc.l)
                   + 0.7 * acc.b),
            acc -> acc)""").as("hw"))
      .select(col("pri"), col("n_periods"),
        round(col("hw.l"), 6).as("level"),
        round(col("hw.b"), 6).as("trend"),
        round(expr("hw.l + hw.b"), 6).as("forecast"))
      .orderBy("pri")
  }

  /** KRIPPENDORFF'S ALPHA (nominal) — the agreement coefficient that,
    * unlike q_fleiss_kappa's, generalizes across missing raters and
    * metrics; here the 3-rater fixture (fresh `ka:` md5 fold, 4
    * categories) exercises the nominal form. INTEGER-EXACT: observed
    * disagreeing ordered pairs O = Σ_docs (9 − Σ_c n_c²); pooled
    * expected from category margins; α = 1 − O(3n−1)/(2(9n²−Σc²)) —
    * one final double division, everything before it BIGINT.
    */
  def qKrippendorff(s: SparkSession, dir: String): DataFrame = {
    val labels = tbl(s, dir, "documents")
      .filter(col("n_chars").isNotNull)
      .select(col("lang"), col("doc_id"),
        expr("LEAST(n_chars DIV 400, 2)").as("b"))
      .select(col("lang"), col("doc_id"), col("b"),
        explode(expr("array(1,2,3)")).as("r"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat('ka:', CAST(r AS STRING), " +
          "':', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 7"))
      .withColumn("label", expr(
        "(b + CASE WHEN h = 0 THEN 1 + r ELSE 0 END) % 4"))
    val cell = labels.groupBy("lang", "doc_id", "label")
      .agg(count(lit(1)).as("nij"))
    val obs = cell.groupBy("lang", "doc_id")
      .agg((lit(9L) - sum(col("nij") * col("nij"))).as("o"))
      .groupBy("lang")
      .agg(count(lit(1)).as("nd"), sum(col("o")).as("osum"))
    val marg = cell.groupBy("lang", "label")
      .agg(sum(col("nij")).as("cj"))
      .groupBy("lang")
      .agg(sum(col("cj") * col("cj")).as("c2"))
    obs.join(marg, "lang")
      .select(col("lang"), col("nd").as("n_docs"),
        round(lit(1.0) -
          (col("osum") * (lit(3L) * col("nd") - lit(1L))).cast("double")
          / (lit(2L) * (lit(9L) * col("nd") * col("nd") - col("c2")))
            .cast("double"), 6).as("alpha"))
      .orderBy("lang")
  }

  /** YULE'S K lexical-richness characteristic per language — the
    * repetition-rate constant (10⁴·(Σ_m m²V_m − N)/N², V_m = words
    * with frequency m): corpus-size-invariant where TTR (q_ttr) is
    * not, so it's the cross-slice comparable vocabulary-health
    * monitor. One corpus explode on the canonical tokenizer; the
    * frequency second moment Σc² is an exact BIGINT; one scale-free
    * double ratio at the end.
    */
  def qYuleK(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("lang"), explode(expr(tokensSql)).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(col("c") * col("c")).as("m2"))
      .select(col("lang"), col("n_tokens"), col("vocab"),
        round(lit(10000.0) *
          (col("m2") - col("n_tokens")).cast("double")
          / (col("n_tokens").cast("double")
            * col("n_tokens").cast("double")), 6).as("yule_k"))
      .orderBy("lang")

  /** EMBEDDING ISOTROPY per label — ‖Σv‖²/(n·Σ‖v‖²), the
    * mean-direction concentration score (≈0 for an isotropic cloud,
    * →1 when vectors collapse onto one direction): the anisotropy/
    * collapsed-encoder monitor beside q_emb_norm_stats' norm health.
    * Exact-decimal discipline end to end: elements and squares
    * 9dp-quantized into DECIMAL before every sum; the per-dimension
    * sums square in DECIMAL(18,9)² = (37,18) (inside Spark's 38-cap;
    * the DuckDB twin forces hugeint via (19,9) factors — the house
    * product contract), so no double ever rounds mid-pipeline.
    */
  def qEmbIsotropy(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
      .select(col("label"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("d", "ef")))
      .select(col("label"), col("vec_id"), col("d"),
        col("ef").cast("double").as("ef"))
    val e2 = e.groupBy("label")
      .agg(countDistinct(col("vec_id")).as("n"),
        sum(expr(
          "CAST(round(ef * ef, 9) AS DECIMAL(28,12))")).as("ee"))
    val s2 = e.groupBy("label", "d")
      .agg(sum(expr("CAST(round(ef, 9) AS DECIMAL(28,12))")).as("sd"))
      .select(col("label"),
        (col("sd").cast("decimal(18,9)")
          * col("sd").cast("decimal(18,9)")).as("t"))
      .groupBy("label").agg(sum(col("t")).as("ss"))
    e2.join(s2, "label")
      .select(col("label"), col("n"),
        round(col("ss").cast("double")
          / (col("n").cast("double") * col("ee").cast("double")), 6)
          .as("isotropy"))
      .orderBy("label")
  }

  /** MUTUAL INFORMATION I(lang; source) — the corpus-audit scalar for
    * "how confounded are language and source" (a high MI means
    * per-source models silently become per-language models; the
    * domain-mixing ops assume it is low). Integer-exact: each cell
    * contributes n_ls·round(ln(N·n_ls/(n_l·n_s)), 9) as exact DECIMAL
    * (the libm recipe), one final /N double division. Plan is
    * cells-sized — langs×sources, never rows.
    */
  def qMutualInfo(s: SparkSession, dir: String): DataFrame = {
    val cells = tbl(s, dir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("nls"))
    val nl = cells.groupBy("lang").agg(sum(col("nls")).as("nl"))
    val ns = cells.groupBy("source").agg(sum(col("nls")).as("ns"))
    val n = cells.agg(sum(col("nls")).as("n"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    cells.join(nl, "lang").join(ns, "source").crossJoin(broadcast(n))
      .select(col("n"), col("n_langs"), col("n_sources"),
        (expr("""CAST(round(ln(CAST(n * nls AS DOUBLE)
              / CAST(nl * ns AS DOUBLE)), 9) AS DECIMAL(18,9))""")
          * col("nls").cast("decimal(12,0)")).as("t"))
      .groupBy("n", "n_langs", "n_sources")
      .agg(sum(col("t")).as("misum"))
      .select(col("n").as("n_docs"), col("n_langs"), col("n_sources"),
        round(col("misum").cast("double") / col("n").cast("double"), 6)
          .as("mi_nats"))
  }

  /** RANK-BIASED OVERLAP @10 (p = 0.9) between the full-dimension and
    * truncated-16-dim rankings of the 8-query ANN harness — the
    * top-weighted ranking-similarity score that, unlike
    * q_mrr_eval/q_ndcg_eval's truth-anchored metrics, compares the two
    * LISTS directly (the cheap-path-fidelity dial an embedding-serving
    * tier tunes). Depth overlaps X_d = |top_d ∩ top_d| are exact
    * integers (X_d = #{max(rf,rp) ≤ d}); the weights (1−p)p^{d−1}/d
    * are 9dp-quantized DECIMALs, so the weighted sum is exact and the
    * single 6dp rounding happens on the final score.
    */
  def qRboEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (a, b) => a * b),
        lit(0.0d), (acc, t) => acc + t)
    def cos(a: Column, b: Column): Column =
      round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 4)
    val emb = tbl(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = emb.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cos(col("v"), col("qv")).as("cf"),
        cos(slice(col("v"), 1, 16), slice(col("qv"), 1, 16)).as("cp"))
    val wF = Window.partitionBy("qid").orderBy(col("cf").desc, col("vec_id"))
    val wP = Window.partitionBy("qid").orderBy(col("cp").desc, col("vec_id"))
    val both = scored
      .withColumn("rf", row_number().over(wF))
      .withColumn("rp", row_number().over(wP))
      .filter(col("rf") <= 10 && col("rp") <= 10)
      .select(col("qid"), greatest(col("rf"), col("rp")).as("dmin"))
    val depths = s.range(1, 11).select(col("id").as("d"),
      expr("""CAST(round(0.1 * power(0.9, CAST(id - 1 AS DOUBLE))
          / CAST(id AS DOUBLE), 9) AS DECIMAL(18,9))""").as("wgt"))
    both.join(broadcast(depths), col("dmin") <= col("d"))
      .groupBy("qid", "d", "wgt")
      .agg(count(lit(1)).as("xd"))
      .select(col("qid"),
        (col("wgt") * col("xd").cast("decimal(12,0)")).as("t"))
      .groupBy("qid")
      .agg(round(sum(col("t")).cast("double"), 6).as("rbo"))
      .orderBy("qid")
  }

  /** DISTINCT-N generation-diversity per source (the Self-BLEU-adjacent
    * repetition audit): distinct unigrams/total and distinct bigrams/
    * total — collapsed distinct-2 is the first symptom of templated or
    * machine-generated text flooding a source. One corpus explode per
    * n; exact BIGINT counts, two final scale-free ratios.
    */
  def qDistinctNgrams(s: SparkSession, dir: String): DataFrame = {
    val toks = tbl(s, dir, "documents")
      .select(col("source"), expr(tokensSql).as("ws"))
    val uni = toks.select(col("source"), explode(col("ws")).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("n1"), countDistinct(col("g")).as("d1"))
    val bi = toks.filter(size(col("ws")) >= 2)
      .select(col("source"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
             i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"""))
        .as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("n2"), countDistinct(col("g")).as("d2"))
    uni.join(bi, "source")
      .select(col("source"), col("n1").as("n_tokens"),
        round(col("d1").cast("double") / col("n1").cast("double"), 6)
          .as("distinct1"),
        round(col("d2").cast("double") / col("n2").cast("double"), 6)
          .as("distinct2"))
      .orderBy("source")
  }

  /** DUPLICATE-CLUSTER SIZE HISTOGRAM from exact text dedup — the
    * dedup-accounting view (how much of the corpus sits in 2-copy vs
    * 1000-copy clusters decides whether exact dedup suffices or
    * near-dup must run): normalized-text groups → cluster sizes →
    * size histogram with doc mass. Two hash-aggregations, integers
    * only — at 100 TB the first groupBy is the same shuffle
    * dedup_exact already pays.
    */
  def qDupSizeHist(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(lower(trim(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .groupBy("c")
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("c").as("cluster_size"), col("n_clusters"),
        (col("c") * col("n_clusters")).as("n_docs"))
      .orderBy("cluster_size")

  // ---- round-12 batch: drift monitors, concentration, link scores ----

  /** CUSUM drift monitor on daily event counts, INTEGER-EXACT: with
    * per-type deviations dev_d = days·c_d − total (sums to zero, no
    * division anywhere), the classic reset recursion
    * C_d = max(0, C_{d−1} + dev_d) equals prefixSum − runningMin of
    * prefixSum — two day-ordered windows over the DAYS-sized daily
    * table (the qRocAuc bounded-window contract; raw events are
    * touched once, in the daily aggregate). Reported: the max CUSUM
    * excursion and the number of alarm days above h = total (one
    * mean-day's worth of cumulative excess), all BIGINT.
    */
  def qCusumDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("c"))
    val totals = daily.groupBy("event_type")
      .agg(sum(col("c")).as("total"), count(lit(1)).as("days"))
    val wRun = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(totals), "event_type")
      .withColumn("dev", col("days") * col("c") - col("total"))
      .withColumn("run", sum(col("dev")).over(wRun))
      .withColumn("floor", min(col("run")).over(wRun))
      .withColumn("cusum", col("run") - least(col("floor"), lit(0L)))
      .groupBy("event_type")
      .agg(max(col("days")).as("n_days"),
        max(col("cusum")).as("max_cusum"),
        sum(when(col("cusum") > col("total"), 1L).otherwise(0L))
          .as("alarm_days"))
      .orderBy("event_type")
  }

  /** PAGE–HINKLEY drift statistic on the same daily series: U_d =
    * S_d − Σ_{j≤d} round(S_j/j, 9) (cumulative deviation from the
    * EXPANDING mean, δ = 0), alarm stat PH_d = U_d − min_{j≤d} U_j.
    * Each mean term is rounded to 9 dp and summed as exact DECIMAL
    * (the libm/quantize recipe — with j ≤ #days the 9-dp round has no
    * structural ties), so the two engines walk identical series.
    * Reported per type: max PH (6 dp) and alarms above λ = 100.
    */
  def qPageHinkley(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("c"))
    val wRun = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("s_j", sum(col("c")).over(wRun))
      .withColumn("j", count(lit(1)).over(wRun))
      .withColumn("mean_j", expr(
        "CAST(round(CAST(s_j AS DOUBLE) / CAST(j AS DOUBLE), 9) " +
          "AS DECIMAL(28,9))"))
      .withColumn("u", col("s_j").cast("decimal(28,9)")
        - sum(col("mean_j")).over(wRun))
      .withColumn("ph", col("u") - min(col("u")).over(wRun))
      .groupBy("event_type")
      .agg(round(max(col("ph")).cast("double"), 6).as("max_ph"),
        sum(when(col("ph") > lit(BigDecimal(100)), 1L).otherwise(0L))
          .as("alarm_days"))
      .orderBy("event_type")
  }

  /** GINI CONCENTRATION of document length per source (the corpus-
    * balance monitor a mixture pipeline watches): with lengths ranked
    * ascending (doc_id tiebreak), G = (2·Σ i·x_i − (n+1)·Σx)/(n·Σx) —
    * every aggregate an exact BIGINT, one double division of identical
    * integers at the end (IEEE-deterministic across engines). The
    * rank window partitions by source — bounded fan-in per key, and
    * the ranks feed ONE sum, never a per-pair join.
    */
  def qGiniSources(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    tbl(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      // NULL lengths out BEFORE ranking: Spark sorts NULLs first,
      // DuckDB last — the rank column must see one ordering
      .filter(col("n_chars").isNotNull)
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"),
        sum(col("i") * col("n_chars")).as("six"))
      .select(col("source"), col("n"),
        round((lit(2L) * col("six") - (col("n") + 1L) * col("sx"))
          .cast("double")
          / (col("n") * col("sx")).cast("double"), 6).as("gini"))
      .orderBy("source")
  }

  /** HERFINDAHL–HIRSCHMAN concentration of sources within each
    * language (is one source dominating a language's training mix?):
    * HHI = Σ share² emitted as an EXACT ppm integer,
    * (10⁶·Σ cnt²) div (Σ cnt)² — pure BIGINT arithmetic, zero float.
    */
  def qHerfindahl(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sources"),
        sum(col("cnt") * col("cnt")).as("sumsq"),
        sum(col("cnt")).as("total"))
      .select(col("lang"), col("n_sources"),
        expr("(1000000 * sumsq) DIV (total * total)").as("hhi_ppm"))
      .orderBy("lang")

  /** JACCARD LINK PREDICTION over the co-supplier artifact (the
    * neighborhood-overlap sibling of [[qAdamicAdar]]):
    * J(u,w) = |N(u)∩N(w)| / |N(u)∪N(w)| for non-adjacent pairs,
    * emitted as an exact ppm integer — common-neighbor and degree
    * counts are BIGINTs, the union is inclusion–exclusion, and the
    * one division is integer DIV. Same two-hop join + adjacency
    * anti-join shape as the rest of the battery: no pair enumeration
    * beyond actual 2-paths.
    */
  def qJaccardLinkpred(s: SparkSession, dir: String): DataFrame = {
    val e = writtenEdgesTable(s, dir)
    val deg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("deg"))
    val cn = e.as("a").join(e.as("b"), col("a.dst") === col("b.src"))
      .filter(col("a.src") < col("b.dst"))
      .select(col("a.src").as("u"), col("b.dst").as("w"))
      .join(e.select(col("src").as("u"), col("dst").as("w")),
        Seq("u", "w"), "left_anti")
      .groupBy("u", "w")
      .agg(count(lit(1)).as("cn"))
    cn.join(deg.select(col("v").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("v").as("w"), col("deg").as("dw")), "w")
      .select(col("u"), col("w"),
        expr("(1000000 * cn) DIV (du + dw - cn)").as("jaccard_ppm"))
      .orderBy(col("jaccard_ppm").desc, col("u"), col("w"))
      .limit(20)
  }

  /** FLEISS' KAPPA inter-annotator agreement per language — the
    * labeling-QA primitive of any annotation pipeline (Cohen's kappa
    * [[q_cohen_kappa]] generalized to 3 raters). Raters are
    * DETERMINISTIC pseudo-annotators (the repo's md5-fold randomness
    * contract): each labels the doc's length bucket, flipping to a
    * rater-specific wrong category on a hash-selected 20% of docs.
    * With S = Σ_docs Σ_cat n_ij² and C = Σ_cat (Σ_docs n_ij)²,
    * κ = (3N(S−3N) − 2C) / (18N² − 2C) — every aggregate an exact
    * BIGINT, ONE double division at the end.
    */
  def qFleissKappa(s: SparkSession, dir: String): DataFrame = {
    val labels = tbl(s, dir, "documents")
      .filter(col("n_chars").isNotNull)
      .select(col("lang"), col("doc_id"),
        expr("LEAST(n_chars DIV 400, 2)").as("b"))
      .select(col("lang"), col("doc_id"), col("b"),
        explode(expr("array(1,2,3)")).as("r"))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat('fk:', CAST(r AS STRING), " +
          "':', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 5"))
      .withColumn("label", expr(
        "(b + CASE WHEN h = 0 THEN 1 + r ELSE 0 END) % 3"))
    val cell = labels.groupBy("lang", "doc_id", "label")
      .agg(count(lit(1)).as("nij"))
    val perLang = cell.groupBy("lang", "doc_id")
      .agg(sum(col("nij") * col("nij")).as("sq"))
      .groupBy("lang")
      .agg(count(lit(1)).as("nd"), sum(col("sq")).as("ssum"))
    val csum = cell.groupBy("lang", "label")
      .agg(sum(col("nij")).as("cj"))
      .groupBy("lang")
      .agg(sum(col("cj") * col("cj")).as("c2"))
    perLang.join(csum, "lang")
      .select(col("lang"), col("nd").as("n_docs"),
        round((lit(3L) * col("nd") * (col("ssum") - lit(3L) * col("nd"))
            - lit(2L) * col("c2")).cast("double")
          / (lit(18L) * col("nd") * col("nd") - lit(2L) * col("c2"))
            .cast("double"), 6).as("kappa"))
      .orderBy("lang")
  }

  /** BRADLEY–TERRY preference-strength fitting — the pairwise-
    * comparison model under RLHF reward data and ranking evaluation.
    * Duels: within each doc_id%64 bucket, source i beats j when its
    * total chars are larger (ties void) — a dimension-sized win
    * matrix. Three minorization sweeps p_i ← W_i / Σ_j n_ij/(p_i+p_j)
    * from p=1, every per-pair term and every update ROUND-9-QUANTIZED
    * into exact DECIMAL before summing (the iterative-fixpoint recipe
    * of q_pagerank), so both engines walk the identical sequence. All
    * iteration state is O(#sources²).
    */
  def qBradleyTerry(s: SparkSession, dir: String): DataFrame = {
    val bySrc = tbl(s, dir, "documents")
      .groupBy((col("doc_id") % 64).as("g"), col("source"))
      .agg(sum(coalesce(col("n_chars"), lit(0L))).as("sc"))
    val duels = bySrc.select(col("g"), col("source").as("i"),
        col("sc").as("si"))
      .join(bySrc.select(col("g"), col("source").as("j"),
        col("sc").as("sj")), "g")
      .filter(col("i") < col("j") && col("si") =!= col("sj"))
    // wins/nij/wt are consumed by every minorization sweep below; lazy
    // checkpoints compute each ONCE instead of re-deriving the duels
    // self-join per sweep (state is O(#sources²) — bounded)
    val wins = duels.select(
        when(col("si") > col("sj"), col("i")).otherwise(col("j"))
          .as("win"),
        when(col("si") > col("sj"), col("j")).otherwise(col("i"))
          .as("lose"))
      .groupBy("win", "lose").agg(count(lit(1)).as("w"))
      .localCheckpoint(false)
    val nij = wins.select(col("win").as("u"), col("lose").as("v"),
        col("w"))
      .unionByName(wins.select(col("lose").as("u"), col("win").as("v"),
        col("w")))
      .groupBy("u", "v").agg(sum(col("w")).as("n"))
      .localCheckpoint(false)
    val wt = wins.groupBy(col("win").as("u")).agg(sum(col("w")).as("wtot"))
      .localCheckpoint(false)
    var p = nij.select(col("u")).distinct()
      .withColumn("p", expr("CAST(1.0 AS DECIMAL(18,9))"))
    // Each sweep references p TWICE (own strength + opponent's), so an
    // unfenced loop doubles the plan per sweep — 8 copies of the duels
    // subtree by sweep 3, each re-executed. A LAZY localCheckpoint per
    // sweep truncates the plan and dedups the double reference to one
    // computation (r16 optimization; values unchanged — same sweeps,
    // same 9-dp quantization).
    for (_ <- 1 to 3) {
      val pc = p.localCheckpoint(false)
      val pv = pc.select(col("u").as("v"), col("p").as("pvv"))
      p = nij.join(pc, "u").join(pv, "v")
        .select(col("u"), expr(
          "CAST(round(CAST(n AS DOUBLE) / (CAST(p AS DOUBLE) " +
            "+ CAST(pvv AS DOUBLE)), 9) AS DECIMAL(18,9))").as("t"))
        .groupBy("u").agg(sum(col("t")).as("den"))
        .join(wt, Seq("u"), "left")
        .select(col("u"), expr(
          "CAST(round(CAST(coalesce(wtot, 0) AS DOUBLE) " +
            "/ CAST(den AS DOUBLE), 9) AS DECIMAL(18,9))").as("p"))
    }
    p.select(col("u").as("source"),
        round(col("p").cast("double"), 6).as("strength"))
      .orderBy(col("strength").desc, col("source"))
  }

  /** EMBEDDING NORM DISTRIBUTION per label — the vector-QA monitor
    * (collapsed or exploding norms are the first symptom of a bad
    * encoder batch). Per-element e² is TRUNCATED, not rounded, into
    * the integer domain: floor(e²·1e9), summed exactly in
    * DECIMAL(38,0). floor of a double is exact on every engine — no
    * rounding mode exists to disagree — and the float→double square
    * plus one ·1e9 multiply are identical IEEE ops on both; integer
    * sums are then order- and partitioning-independent. The READOUT
    * is BIGINT, not DECIMAL: three driver-red rounds (r12–r14, each
    * with a different rounding theory) traced to the COMPARE layer,
    * not the math — DuckDB's pandas conversion renders DECIMAL
    * results as float64 ("123.0", lossy past 2^53) while Spark's
    * parquet decimal reads back exact, so any final DECIMAL column
    * hash-mismatches even when the values are identical. The two red
    * queries were precisely the only two emitting final DECIMAL
    * columns. Magnitudes fit BIGINT with 3 decades of headroom
    * (sum ≈ 1e15 at sf0.1 vs 9.2e18). Explode is a narrow 64× fan-out
    * collapsed by map-side partial aggregation before the one shuffle.
    */
  def qEmbNormStats(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "embeddings")
      .select(col("label"), col("vec_id"),
        explode(col("embedding")).as("ef"))
      .select(col("label"), col("vec_id"),
        floor(col("ef").cast("double") * col("ef").cast("double")
            * lit(1.0e9d))
          .cast("decimal(38,0)").as("e2"))
      .groupBy("label", "vec_id")
      .agg(sum(col("e2")).as("norm2"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        min(col("norm2")).cast("long").as("min_norm2_e9"),
        max(col("norm2")).cast("long").as("max_norm2_e9"),
        sum(col("norm2")).cast("long").as("sum_norm2_e9"))
      .orderBy("label")

  /** NDCG@10 RANKING EVALUATION — the graded metric beside
    * q_knn_eval's recall: for 8 query vectors, a truncated-dimension
    * (16 of 64, the matryoshka cheap path) cosine ranking is scored
    * against the full-dimension truth with graded relevance 10..1.
    * Per-position terms rel/log2(pos+1) are 9dp-quantized DECIMALs
    * (the libm recipe); cosines round at 4dp like the ANN battery so
    * both engines rank identically. The per-query window partitions
    * are #queries-bounded — an EVAL harness shape, not a serving path.
    */
  def qNdcgEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (a, b) => a * b),
        lit(0.0d), (acc, t) => acc + t)
    def cos(a: Column, b: Column): Column =
      round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 4)
    val emb = tbl(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qs = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = emb.crossJoin(broadcast(qs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cos(col("v"), col("qv")).as("cf"),
        cos(slice(col("v"), 1, 16), slice(col("qv"), 1, 16)).as("cp"))
    val wF = Window.partitionBy("qid").orderBy(col("cf").desc, col("vec_id"))
    val wP = Window.partitionBy("qid").orderBy(col("cp").desc, col("vec_id"))
    val ranked = scored
      .withColumn("rf", row_number().over(wF))
      .withColumn("rp", row_number().over(wP))
      .filter(col("rf") <= 10 || col("rp") <= 10)
    val truth = ranked.filter(col("rf") <= 10)
      .select(col("qid"), col("vec_id"), (lit(11) - col("rf")).as("rel"))
    val dcg = ranked.filter(col("rp") <= 10)
      .select(col("qid"), col("vec_id"), col("rp"))
      .join(truth, Seq("qid", "vec_id"), "left")
      .select(col("qid"), expr(
        "CAST(round(CAST(coalesce(rel, 0) AS DOUBLE) " +
          "/ (ln(CAST(rp + 1 AS DOUBLE)) / ln(2.0)), 9) " +
          "AS DECIMAL(18,9))").as("t"))
      .groupBy("qid").agg(sum(col("t")).as("dcg"))
    val idcg = s.range(1, 11).select(expr(
        "CAST(round(CAST(11 - id AS DOUBLE) " +
          "/ (ln(CAST(id + 1 AS DOUBLE)) / ln(2.0)), 9) " +
          "AS DECIMAL(18,9))").as("t"))
      .agg(sum(col("t")).as("idcg"))
    dcg.crossJoin(broadcast(idcg))
      .select(col("qid"),
        round(col("dcg").cast("double") / col("idcg").cast("double"), 6)
          .as("ndcg"))
      .orderBy("qid")
  }

  /** HILL TAIL-INDEX estimator of the document-length distribution per
    * source (is the length tail power-law heavy? — the long-document
    * budget question): H = (1/k)Σ ln(x_(i)/x_(k+1)) over the top
    * k = 50 order statistics, α = 1/H. Log-ratio terms of exact
    * integers are 9dp-quantized DECIMALs; the per-source window is
    * top-51-bounded. Sources with ≤ 51 documents are skipped (no
    * (k+1)-th order statistic).
    */
  def qHillTail(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val ranked = tbl(s, dir, "documents")
      .filter(col("n_chars").isNotNull && col("n_chars") > 0)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") <= 51)
    val xk = ranked.filter(col("r") === 51)
      .select(col("source"), col("n_chars").as("xk"))
    ranked.filter(col("r") <= 50).join(xk, "source")
      .select(col("source"), expr(
        "CAST(round(ln(CAST(n_chars AS DOUBLE) / CAST(xk AS DOUBLE)), 9) " +
          "AS DECIMAL(18,9))").as("t"))
      .groupBy("source")
      .agg(count(lit(1)).as("k"), sum(col("t")).as("h"))
      .select(col("source"), col("k"),
        round(col("h").cast("double") / 50.0, 6).as("hill"),
        round(lit(50.0) / col("h").cast("double"), 6).as("alpha"))
      .orderBy("source")
  }

  /** MAINTENANCE fixture on customer: ten arrival-ordered appends of
    * interleaved c_custkey slices (many small files with overlapping
    * stats — the state any streamed-into table degrades to), then the
    * three chores a log-structured table needs to stay fast at 100 TB:
    * compact (bin-pack the small files), cluster on c_custkey (make
    * per-file stats disjoint so manifest pruning works again), vacuum
    * retaining only the clustered version (reclaim every superseded
    * file — on an object store, the dominant storage cost of a
    * frequently-rewritten table).
    */
  def writtenMaintTable(s: SparkSession, dir: String): String =
    scratchBuildOnce(s, "mainttbl", "customer", dir) { root =>
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true) // partial build: start over
      val c = tbl(s, dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val stats = Seq("c_custkey")
      graft.table.TxnTable.create(s, root,
        c.filter(col("c_custkey") % 10 === 0), stats)
      (1 to 9).foreach { r =>
        graft.table.TxnTable.append(s, root,
          c.filter(col("c_custkey") % 10 === r), stats)
      }
      graft.table.TxnTable.compact(s, root,
        targetBytes = 1L << 20, statsCols = stats)
      graft.table.TxnTable.cluster(s, root, Seq("c_custkey"), 4, stats)
      graft.table.TxnTable.vacuum(s, root, retainLast = 1, graceMs = 0L)
      ()
    }

  /** The maintained table must still answer EXACTLY: a predicate-pruned
    * probe over the post-vacuum clustered snapshot (the manifest's
    * disjoint c_custkey ranges let the probe read ~1 of the 4 files),
    * grouped by segment. A row lost in compact's rewrite, duplicated
    * across cluster's range boundaries, or orphan-deleted by vacuum all
    * break the counts/sums vs the raw-parquet oracle.
    */
  def qTableMaintenance(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.snapshotWhere(s, writtenMaintTable(s, dir),
        col("c_custkey").between(100L, 600L))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")

  /** SQL MAINTENANCE surface ([[graft.table.GraftSqlParser]] via
    * [[graft.GraftExtensions]]): the same compact → cluster → vacuum
    * pipeline as q_table_maintenance, driven from PURE SQL —
    * `OPTIMIZE`, `OPTIMIZE … CLUSTER BY (c_custkey) INTO 4 FILES`,
    * `VACUUM … RETAIN 1 VERSIONS` — against a catalog identifier
    * (warehouse-rooted, traversal-guarded). The statements execute as
    * commands (never at analysis — EXPLAIN can't compact a table),
    * OPTIMIZE auto-preserves the opted-in stats columns, and the
    * maintained table must still answer the pruned probe exactly.
    */
  def qTableSqlMaintenance(s: SparkSession, dir: String): DataFrame = {
    val root = scratchTempDir(s, "graft_sqlmaint_tbl")
    val c = tbl(s, dir, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val stats = Seq("c_custkey")
    graft.table.TxnTable.create(s, root,
      c.filter(col("c_custkey") % 4 === 0), stats)
    (1 to 3).foreach { r =>
      graft.table.TxnTable.append(s, root,
        c.filter(col("c_custkey") % 4 === r), stats)
    }
    val p = new org.apache.hadoop.fs.Path(root)
    s.conf.set("spark.sql.catalog.gmaintq", "graft.table.GraftCatalog")
    s.conf.set("spark.sql.catalog.gmaintq.warehouse", p.getParent.toString)
    val t = s"gmaintq.`${p.getName}`"
    s.sql(s"OPTIMIZE $t").collect()
    s.sql(s"OPTIMIZE $t CLUSTER BY (c_custkey) INTO 4 FILES").collect()
    s.sql(s"VACUUM $t RETAIN 1 VERSIONS").collect()
    graft.table.TxnTable.snapshotWhere(s, root,
        col("c_custkey").between(100L, 600L))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  /** MERGE SCHEMA EVOLUTION ([[graft.table.TxnTable.merge]] with
    * `evolveSchema = true` — the `WITH SCHEMA EVOLUTION` semantics):
    * the table starts narrow (k, price); the merge source carries a
    * NEW `status` column. One commit both upserts the %3==0 slice
    * (price doubled) and widens the schema — stored rows back-fill
    * NULL status, no separate DDL, time travel still serves the
    * narrow pre-merge generation (TableEvolveSpec pins those). The
    * grouped aggregate over coalesce(status,'none') replays the whole
    * evolution in DuckDB.
    */
  def qTableMergeEvolve(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
    val root = scratchTempDir(s, "graft_merge_evolve")
    graft.table.TxnTable.create(s, root,
      o.select(col("o_orderkey").as("k"),
        col("o_totalprice").as("price")), Seq("k"))
    val src = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("k"),
        (col("o_totalprice") * 2).as("price"),
        col("o_orderstatus").as("status"))
    graft.table.TxnTable.merge(s, root, src, Seq("k"), Seq("k"),
      evolveSchema = true)
    graft.table.TxnTable.snapshot(s, root)
      .groupBy(coalesce(col("status"), lit("none")).as("status"))
      .agg(count(lit(1)).as("n"), dsum(col("price")).as("sum_price"))
      .orderBy("status")
  }

  /** SQL CHECK CONSTRAINTS (Spark 4 DSv2 constraint surface →
    * [[graft.table.GraftCatalog.alterTable]] →
    * [[graft.table.TxnTable.addConstraint]]): `ALTER TABLE … ADD
    * CONSTRAINT … CHECK (…)` validates EXISTING rows (Spark's own
    * analyzer scan + the TxnTable seam), commits O(metadata), and is
    * enforced by every subsequent write path. The gate seeds half the
    * orders, adds the constraint from pure SQL, appends the
    * conforming other half, and replays the union — a silently-
    * unenforced or wrongly-refusing constraint breaks the counts.
    */
  def qTableSqlConstraint(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val root = scratchTempDir(s, "graft_sql_constraint")
    graft.table.TxnTable.create(s, root,
      o.filter(col("o_orderkey") % 2 === 0), Seq("o_orderkey"))
    val p = new org.apache.hadoop.fs.Path(root)
    s.conf.set("spark.sql.catalog.gconsq", "graft.table.GraftCatalog")
    s.conf.set("spark.sql.catalog.gconsq.warehouse", p.getParent.toString)
    s.sql(s"ALTER TABLE gconsq.`${p.getName}` ADD CONSTRAINT " +
      "price_pos CHECK (o_totalprice > 0)")
    graft.table.TxnTable.append(s, root,
      o.filter(col("o_orderkey") % 2 === 1), Seq("o_orderkey"))
    graft.table.TxnTable.snapshot(s, root)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  /** SQL `OPTIMIZE … ZORDER BY` on the transactional table
    * ([[graft.table.TxnTable.clusterZ]] via [[graft.table
    * .GraftSqlParser]]): the Morton-order rewrite gives every
    * interleaved dimension a tight per-file stats BOX in the manifest,
    * so the two-dimensional probe below prunes on BOTH l_orderkey and
    * l_partkey — q_zorder proved the layout on raw parquet footers;
    * this gate proves it as a committed, stats-carried table op
    * driven from pure SQL. Same aggregate contract as q_zorder.
    */
  def qTableSqlZorder(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_returnflag", "l_quantity")
    val root = scratchTempDir(s, "graft_sql_zorder")
    graft.table.TxnTable.create(s, root, li.repartition(8))
    val p = new org.apache.hadoop.fs.Path(root)
    s.conf.set("spark.sql.catalog.gzq", "graft.table.GraftCatalog")
    s.conf.set("spark.sql.catalog.gzq.warehouse", p.getParent.toString)
    s.sql(s"OPTIMIZE gzq.`${p.getName}` ZORDER BY " +
      "(l_orderkey, l_partkey) INTO 8 FILES").collect()
    graft.table.TxnTable.snapshotWhere(s, root,
        col("l_orderkey") <= 2000L && col("l_partkey") <= 150L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_orderkey")).as("min_okey"),
        max(col("l_partkey")).as("max_pkey"))
      .orderBy("l_returnflag")
  }

  /** `graft_files(...)` TABLE FUNCTION (the DESCRIBE-DETAIL surface —
    * [[graft.table.GraftFilesFunction]], completing the SQL admin trio
    * with graft_history and the OPTIMIZE/VACUUM statements): the
    * maintained fixture's post-cluster manifest lists exactly 4 data
    * files whose row counts sum to the full table and which each carry
    * the one opted-in stats column — all read from pure SQL, zero data
    * IO.
    */
  def qTableSqlFiles(s: SparkSession, dir: String): DataFrame = {
    val root = writtenMaintTable(s, dir)
    s.sql(s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_files,
        CAST(SUM(n_rows) AS BIGINT) AS sum_rows,
        CAST(MIN(n_stats_cols) AS INT) AS min_stats
      FROM graft_files('$root')""")
  }

  /** IDENTITY-PARTITIONED table lifecycle ([[graft.table.TxnTable
    * .PartitionSpec]] — the daily/tenant-partitioned-ingest layout):
    * orders land partitioned by `o_orderstatus` across create + two
    * appends (every file single-valued, its partition value in the
    * manifest), then partition 'F' is dropped as an O(METADATA)
    * manifest operation — [[graft.table.TxnTable.dropPartitions]]
    * removes the partition's files without reading a byte, the
    * retention/GDPR shape a 100 TB table needs where a COW DELETE
    * would rewrite everything (IdentityPartitionSpec pins the
    * verbatim-carry and the pruned planned-file sets mechanically).
    */
  def writtenIdentityPartTable(
      s: SparkSession, dir: String): String =
    scratchBuildOnce(s, "idparttbl", "orders", dir) { root =>
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true) // partial build: start over
      val o = tbl(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val stats = Seq("o_orderkey")
      graft.table.TxnTable.create(s, root,
        o.filter(col("o_orderkey") % 3 === 0), stats,
        partitionBy =
          Some(graft.table.TxnTable.PartitionSpec("o_orderstatus")))
      (1 to 2).foreach { r =>
        graft.table.TxnTable.append(s, root,
          o.filter(col("o_orderkey") % 3 === r), stats)
      }
      graft.table.TxnTable.dropPartitions(s, root, Seq("F"))
      ()
    }

  /** PARTITION LIFECYCLE from pure SQL: orders land identity-
    * partitioned by priority across create + two appends (per-
    * partition ingest debris by construction), `OPTIMIZE … WHERE`
    * bin-packs ONE partition O(that partition), and `DELETE WHERE
    * <partition> = …` drops another as an O(metadata) manifest
    * operation — the full retention loop a daily-partitioned 100 TB
    * table runs, never touching the untouched partitions' files
    * (SqlMaintenanceSpec + IdentityPartitionSpec pin the verbatim-
    * carry and scoping mechanically; this row pins the answer).
    */
  def writtenPartLifecycleTable(
      s: SparkSession, dir: String): String =
    scratchBuildOnce(s, "partlifecycle", "orders", dir) { root =>
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val o = tbl(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      val stats = Seq("o_orderkey")
      graft.table.TxnTable.create(s, root,
        o.filter(col("o_orderkey") % 3 === 0), stats,
        partitionBy = Some(
          graft.table.TxnTable.PartitionSpec("o_orderpriority")))
      (1 to 2).foreach { r =>
        graft.table.TxnTable.append(s, root,
          o.filter(col("o_orderkey") % 3 === r), stats)
      }
      s.sql(s"OPTIMIZE '$root' WHERE o_orderpriority = '1-URGENT'")
      graft.table.TxnTable.dropPartitions(s, root, Seq("5-LOW"))
      ()
    }

  def qTablePartitionLifecycle(
      s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.table.GraftTableProvider")
      .load(writtenPartLifecycleTable(s, dir))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")

  /** `SHOW PARTITIONS` over the lifecycle fixture — the manifest-only
    * partition listing (zero data IO): per-partition row counts must
    * equal the raw table's group counts minus the dropped partition,
    * which pins both the listing and the lifecycle's row accounting
    * from PURE SQL (n_files/bytes are layout-dependent and spec-gated
    * in SqlMaintenanceSpec instead).
    */
  def qTableShowPartitions(
      s: SparkSession, dir: String): DataFrame = {
    val root = writtenPartLifecycleTable(s, dir)
    s.sql(s"SHOW PARTITIONS '$root'")
      .select(col("partition_value").as("o_orderpriority"),
        col("n_rows").as("n"))
      .orderBy("o_orderpriority")
  }

  def qTableIdentityPartition(
      s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.table.GraftTableProvider")
      .load(writtenIdentityPartTable(s, dir))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")

  /** RANGE RETENTION end-to-end from SQL — the daily job a 100 TB
    * date-partitioned table actually runs: orders land identity-
    * partitioned by order YEAR across create + two appends, then
    * `DELETE FROM t WHERE o_year < 1996` commits as an O(metadata)
    * manifest drop (typed INT comparison — lexical pv ordering would
    * drop the wrong years). The build REFUSES to certify a rewrite:
    * if the commit is not `drop-partition`, the fast path regressed
    * and this row errors rather than passing on identical rows.
    * Survivors must equal the raw table filtered at the oracle.
    */
  def qTablePartitionRetention(
      s: SparkSession, dir: String): DataFrame = {
    val root = scratchBuildOnce(s, "partretention", "orders", dir) { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val o = tbl(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("int").as("o_year"),
          col("o_totalprice"))
      val stats = Seq("o_orderkey")
      graft.table.TxnTable.create(s, r,
        o.filter(col("o_orderkey") % 3 === 0), stats,
        partitionBy = Some(graft.table.TxnTable.PartitionSpec("o_year")))
      (1 to 2).foreach { rr =>
        graft.table.TxnTable.append(s, r,
          o.filter(col("o_orderkey") % 3 === rr), stats)
      }
      s.conf.set("spark.sql.catalog.gretn", "graft.table.GraftCatalog")
      s.conf.set("spark.sql.catalog.gretn.warehouse", p.getParent.toString)
      s.sql(s"DELETE FROM gretn.`${p.getName}` WHERE o_year < 1996")
      val m = graft.table.GraftTableProvider.latestManifest(
        s.sparkContext.hadoopConfiguration, r)
      if (m.op != "drop-partition")
        sys.error(s"range retention regressed to '${m.op}' — " +
          "expected an O(metadata) drop-partition commit")
      ()
    }
    graft.table.TxnTable.snapshot(s, root)
      .groupBy("o_year")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_year")
  }

  /** MULTI-COLUMN partition layout end-to-end — the `(date, tenant)`
    * shape real lakehouses run, here `(o_orderstatus, o_orderpriority)`
    * across create + two appends (tuple pv per file). Two O(metadata)
    * drops exercise both tuple-predicate shapes: a FULL-tuple DELETE
    * (both components named) and a SUBSET DELETE (one component names
    * whole partition slices, the other unconstrained). Both must
    * commit as `drop-partition` — the build refuses a rewrite — and
    * the survivors must equal the raw table under the same predicate.
    */
  def writtenMulticolPartTable(
      s: SparkSession, dir: String): String =
    scratchBuildOnce(s, "multicolpart", "orders", dir) { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val o = tbl(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority",
          "o_totalprice")
      val stats = Seq("o_orderkey")
      graft.table.TxnTable.create(s, r,
        o.filter(col("o_orderkey") % 3 === 0), stats,
        partitionBy = Some(graft.table.TxnTable.PartitionSpec(
          "o_orderstatus", "identity",
          Some(Seq("o_orderstatus", "o_orderpriority")),
          Some(Seq("identity", "identity")))))
      (1 to 2).foreach { rr =>
        graft.table.TxnTable.append(s, r,
          o.filter(col("o_orderkey") % 3 === rr), stats)
      }
      s.conf.set("spark.sql.catalog.gmcp", "graft.table.GraftCatalog")
      s.conf.set("spark.sql.catalog.gmcp.warehouse", p.getParent.toString)
      def mustDrop(sql: String): Unit = {
        s.sql(sql)
        val m = graft.table.GraftTableProvider.latestManifest(
          s.sparkContext.hadoopConfiguration, r)
        if (m.op != "drop-partition")
          sys.error(s"multi-column partition DELETE regressed to " +
            s"'${m.op}' — expected an O(metadata) drop for: $sql")
      }
      mustDrop(s"DELETE FROM gmcp.`${p.getName}` " +
        "WHERE o_orderstatus = 'F' AND o_orderpriority = '5-LOW'")
      mustDrop(s"DELETE FROM gmcp.`${p.getName}` " +
        "WHERE o_orderpriority = '1-URGENT'")
      ()
    }

  def qTableMulticolPartition(
      s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.snapshot(s, writtenMulticolPartTable(s, dir))
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus", "o_orderpriority")

  /** DYNAMIC PARTITION OVERWRITE end-to-end — the daily BACKFILL:
    * orders land identity-partitioned by priority across create + two
    * appends, then a corrected '3-MEDIUM' slice (even orderkeys,
    * re-priced ×2) replaces EXACTLY that partition via the public
    * write surface (`mode("overwrite")` +
    * `partitionOverwriteMode=dynamic` — Delta's option, Iceberg's
    * replacePartitions). The build refuses any commit that is not
    * `overwrite-partitions`; the oracle replays untouched partitions
    * verbatim plus the corrected slice.
    */
  def qTableDynOverwrite(
      s: SparkSession, dir: String): DataFrame = {
    val root = scratchBuildOnce(s, "dynoverwrite", "orders", dir) { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val o = tbl(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      val stats = Seq("o_orderkey")
      graft.table.TxnTable.create(s, r,
        o.filter(col("o_orderkey") % 3 === 0), stats,
        partitionBy = Some(
          graft.table.TxnTable.PartitionSpec("o_orderpriority")))
      (1 to 2).foreach { rr =>
        graft.table.TxnTable.append(s, r,
          o.filter(col("o_orderkey") % 3 === rr), stats)
      }
      o.filter(col("o_orderpriority") === "3-MEDIUM" &&
          col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .write.format("graft.table.GraftTableProvider")
        .mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .option("statsCols", "o_orderkey").save(r)
      val m = graft.table.GraftTableProvider.latestManifest(
        s.sparkContext.hadoopConfiguration, r)
      if (m.op != "overwrite-partitions")
        sys.error(s"dynamic overwrite committed '${m.op}' — expected " +
          "overwrite-partitions")
      ()
    }
    graft.table.TxnTable.snapshot(s, root)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** `SHOW PARTITIONS` over the multi-column fixture — the TUPLE
    * listing (manifest-only): one row per (status, priority) pair as
    * `status/priority`, row counts replayed by the oracle's GROUP BY
    * over the raw table minus the two dropped slices.
    */
  def qTableShowPartitions2(
      s: SparkSession, dir: String): DataFrame = {
    val root = writtenMulticolPartTable(s, dir)
    s.sql(s"SHOW PARTITIONS '$root'")
      .select(col("partition_value"), col("n_rows").as("n"))
      .orderBy("partition_value")
  }

  /** PARTITION-SPEC EVOLUTION end-to-end — re-partitioning a live
    * table with zero data IO ([[graft.table.TxnTable
    * .evolvePartitionSpec]], the Iceberg spec-id pattern): orders land
    * under identity(o_orderstatus), `ALTER TABLE … SET PARTITIONED BY
    * (o_orderpriority)` flips the layout atomically, a second era
    * lands under the new spec, and a DELETE on the NEW partition
    * column must stay exact ACROSS eras — the new era leaves as
    * metadata, the old era (whose 'F'/'O'/'P' stamps must never be
    * misread in priority space) rewrites scoped. The build refuses a
    * non-`drop-partition` commit. Survivors replay at the oracle.
    */
  def qTablePartitionEvolve(
      s: SparkSession, dir: String): DataFrame = {
    val root = scratchBuildOnce(s, "partevolve", "orders", dir) { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val o = tbl(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority",
          "o_totalprice")
      val stats = Seq("o_orderkey")
      graft.table.TxnTable.create(s, r,
        o.filter(col("o_orderkey") % 2 === 0), stats,
        partitionBy =
          Some(graft.table.TxnTable.PartitionSpec("o_orderstatus")))
      s.conf.set("spark.sql.catalog.gevo", "graft.table.GraftCatalog")
      s.conf.set("spark.sql.catalog.gevo.warehouse", p.getParent.toString)
      s.sql(s"ALTER TABLE gevo.`${p.getName}` " +
        "SET PARTITIONED BY (o_orderpriority)")
      graft.table.TxnTable.append(s, r,
        o.filter(col("o_orderkey") % 2 === 1), stats)
      s.sql(s"DELETE FROM gevo.`${p.getName}` " +
        "WHERE o_orderpriority = '2-HIGH'")
      val m = graft.table.GraftTableProvider.latestManifest(
        s.sparkContext.hadoopConfiguration, r)
      if (m.op != "drop-partition")
        sys.error(s"cross-era partition DELETE regressed to '${m.op}'" +
          " — expected metadata drop (new era) + scoped rewrite (old)")
      ()
    }
    graft.table.TxnTable.snapshot(s, root)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus", "o_orderpriority")
  }

  /** Land `df` as ONE parquet file named `<name>.parquet` directly in
    * `destDir` (FileStreamSource wants flat files; a per-batch write
    * dir is flattened by moving its single part file out).
    */
  def stageSingleFile(
      s: SparkSession, df: DataFrame, destDir: String, name: String): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = s"$destDir/_tmp_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = new Path(tmp)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.startsWith("part-"))
      .getOrElse(sys.error(s"no part file under $tmp"))
    fs.rename(part, new Path(s"$destDir/$name.parquet"))
    fs.delete(new Path(tmp), true)
  }

  /** STREAMING CDC APPLY: a change stream (insert + re-price batches,
    * one file per micro-batch via maxFilesPerTrigger=1) is upserted
    * into the transactional table by a real streaming query —
    * foreachBatch → [[graft.table.TxnTable.merge]] keyed on
    * o_orderkey. The staged batches touch disjoint key sets, so the
    * final state is micro-batch-order-independent, and the snapshot
    * must equal the oracle's one-shot CASE over raw orders. (Merge
    * commits carry no batch-id fence — the appendBatch-style
    * exactly-once extension for rewrites is documented table-format
    * roadmap; a clean run, as here, applies each change exactly once.)
    */
  def qOrdersStreamMerge(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
    val work = scratchTempDir(s, "graft_stream_merge")
    val root = s"$work/table"
    val src = s"$work/changes"
    val stats = Seq("o_orderkey")
    graft.table.TxnTable.create(s, root,
      o.filter(col("o_orderkey") % 3 === 0), stats)
    stageSingleFile(s,
      o.filter(col("o_orderkey") % 3 === 1)
        .unionByName(o.filter(col("o_orderkey") % 9 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2)),
      src, "b1")
    stageSingleFile(s,
      o.filter(col("o_orderkey") % 3 === 2)
        .unionByName(o.filter(col("o_orderkey") % 9 === 3)
          .withColumn("o_totalprice", -col("o_totalprice"))),
      src, "b2")
    val stream = s.readStream.schema(o.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    runStream(s) {
      stream.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          graft.table.TxnTable.merge(s, root, batch,
            Seq("o_orderkey"), stats); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    graft.table.TxnTable.snapshot(s, root)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** The transactional table read through its DataSource V2 connector
    * ([[graft.table.GraftTableProvider]]): `spark.read.format(...)`
    * with a key-range predicate that prunes manifest files at PLANNING
    * time (TableSpec asserts the partition count) — proof the table
    * format is a first-class Spark source, not just a library API.
    * Same maintained fixture as q_table_maintenance, different probe
    * range.
    */
  def qTableDsv2(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.table.GraftTableProvider")
      .load(writtenMaintTable(s, dir))
      .filter(col("c_custkey").between(150L, 700L))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")

  /** Per-flag simple linear regression (price ~ quantity) solved in
    * closed form from exact decimal moment sums — never an iterative
    * fit. The 100 TB shape: ONE map-side-combinable aggregate computes
    * (n, Σx, Σy, Σxy, Σx², Σy²) per group; slope/intercept/R² are then
    * O(groups) double math. The moments are exact DECIMAL so partition
    * order cannot perturb them, and the final double formulas are
    * written identically in the DuckDB oracle (same casts, same
    * operation order → bit-identical IEEE results), rounded at 6 dp.
    */
  def qLinreg(s: SparkSession, dir: String): DataFrame = {
    val m = tbl(s, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_extendedprice").cast("decimal(14,2)").as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    m.select(col("l_returnflag"), col("n"),
        round(expr(
          """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""), 6)
          .as("slope"),
        round(expr(
          """(CAST(sy AS DOUBLE)
               - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE)"""), 6).as("intercept"),
        // decimal-moment ratio lands ON .5 ties at 6dp: rndDet
        rndDet(expr(
          """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""), 6)
          .as("r2"))
      .orderBy("l_returnflag")
  }

  /** ROC AUC of a ranking signal (n_chars) against a binary label
    * (lang = 'en') via the tie-aware Mann-Whitney midrank identity:
    * AUC = (Σ_pos midrank − nPos(nPos+1)/2) / (nPos·nNeg). r17: the
    * cumulative count over the distinct-score domain no longer runs as
    * ONE unpartitioned window task (the q_spearman single-partition
    * class, guide §2.5) — the score domain is value-range-bucketed
    * (bucket id monotone in score), per-bucket running sums run in
    * parallel, and a buckets-sized carry window (input BOUNDED at nBk
    * rows by construction) stitches the global prefix back together:
    * carry(bk) + within-bucket prefix == global prefix exactly.
    * Midranks are integer-and-half values, so the Σ pos·midrank double
    * sum is exact under any partitioning below 2⁵². One corpus scan,
    * vocab-sized parallel windows, a 1-row result.
    */
  def qRocAuc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = tbl(s, dir, "documents")
      .select(col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("score")
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("p"))
    // score (n_chars) is non-nullable in the fixture schema; a null
    // score would land in a null bucket and drop out of the carry
    // join (the midranks NULL caveat) — guarded here for reuse safety
    val nBk = s.sparkContext.defaultParallelism * 32
    val mm = perScore.agg(min(col("score")).as("lo"),
      max(col("score")).as("hi"))
    val bucketed = perScore.crossJoin(broadcast(mm))
      .withColumn("bk", when(col("hi") <= col("lo"), lit(0))
        .otherwise(least(floor(
          (col("score").cast("double") - col("lo").cast("double"))
            * lit(nBk.toDouble)
            / (col("hi").cast("double") - col("lo").cast("double")))
          .cast("int"), lit(nBk - 1))))
      .select(col("score"), col("cnt"), col("p"), col("bk"))
    val carry = bucketed.groupBy("bk").agg(sum(col("cnt")).as("bc"))
      .withColumn("carry", coalesce(sum(col("bc")).over(Window
        .orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("bk"), col("carry"))
    val wIn = Window.partitionBy("bk").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(carry), "bk")
      .withColumn("cum", col("carry") + sum(col("cnt")).over(wIn))
      .withColumn("midrank",
        (col("cum") - col("cnt")).cast("double")
          + (col("cnt").cast("double") + 1.0) / 2.0)
      .agg(sum(col("p")).as("np"),
        sum(col("cnt") - col("p")).as("nn"),
        sum(col("p").cast("double") * col("midrank")).as("rsum"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        round((col("rsum")
            - col("np").cast("double") * (col("np").cast("double") + 1.0)
              / 2.0)
          / (col("np").cast("double") * col("nn").cast("double")), 6)
          .as("auc"))
  }

  /** Threshold-classifier confusion matrix + precision/recall/F1 in a
    * single conditional-sum scan (predict "English" when n_chars ≥ 500).
    * The eval every quality-filter deployment needs before flipping a
    * corpus gate; all ratios derive from the four exact counts, so the
    * rounded doubles are engine-independent.
    */
  def qConfusion(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select((col("n_chars") >= 500L).as("pred"),
        (col("lang") === "en").as("actual"))
      .agg(
        sum(when(col("pred") && col("actual"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("pred") && !col("actual"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("pred") && col("actual"), 1L).otherwise(0L)).as("fn"),
        sum(when(!col("pred") && !col("actual"), 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        round(col("tp").cast("double")
          / (col("tp") + col("fp")).cast("double"), 6).as("precision"),
        round(col("tp").cast("double")
          / (col("tp") + col("fn")).cast("double"), 6).as("recall"),
        round(lit(2.0) * col("tp").cast("double")
          / (lit(2.0) * col("tp").cast("double")
            + col("fp").cast("double") + col("fn").cast("double")), 6)
          .as("f1"))

  /** Calibration curve: bucket a [0,1] confidence score into 10 fixed
    * bins and compare mean predicted score vs observed positive rate per
    * bin. Score and bin are pure integer arithmetic (least(n_chars,1000)
    * and integer DIV 100), so the per-bin sums are exact BIGINTs and the
    * two rates are single engine-independent divisions — no ntile (whose
    * global sort would be a single-reducer shape) and no float binning
    * (whose boundary ulps differ across engines).
    */
  def qCalibration(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(expr("least(CAST(n_chars AS BIGINT) DIV 100, 9)").as("bin"),
        expr("least(CAST(n_chars AS BIGINT), 1000)").as("sc"),
        when(col("lang") === "en", 1L).otherwise(0L).as("hit"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("sc")).as("ssum"),
        sum(col("hit")).as("hits"))
      .select(col("bin"), col("n"),
        round(col("ssum").cast("double")
          / (col("n").cast("double") * 1000.0), 6).as("mean_score"),
        round(col("hits").cast("double") / col("n").cast("double"), 6)
          .as("obs_rate"))
      .orderBy("bin")

  /** Record-linkage scoring with the native Jaro-Winkler expression
    * ([[graft.functions.JaroWinkler]]): block part names on
    * (brand, size) — an equi-join, never all-pairs — then score every
    * in-block pair inside whole-stage codegen and keep near-matches.
    * The 100 TB shape: pair volume is Σ_block |b|², controlled by the
    * blocking key's selectivity exactly like the LSH bucket caps in
    * [[graft.ops.Dedup]]; the scorer adds zero shuffles. Inclusion is
    * decided on the 6 dp-ROUNDED score so the Spark and DuckDB
    * (jaro_winkler_similarity — semantics pinned, see the expression
    * Scaladoc) threshold tests agree.
    */
  def qJaroDedup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.JaroWinkler.register(s)
    val p = tbl(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_size"))
    val a = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("id_a"), col("p_name").as("name_a"))
    val b = p.select(col("p_brand"), col("p_size"),
      col("p_partkey").as("id_b"), col("p_name").as("name_b"))
    a.join(b, Seq("p_brand", "p_size"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw", round(graft.functions.JaroWinkler
        .jaroWinkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= 0.85)
      .select(col("id_a"), col("id_b"), col("jw"))
      .orderBy(col("jw").desc, col("id_a"), col("id_b"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: P(next event type | current) from a partitioned LEAD
    * window (per-user state never leaves its partition) and one keyed
    * count — the session-model everybody fits before building funnels.
    * The normalizing window partitions by prev_type (a handful of
    * groups), and all probabilities are single divisions of exact
    * counts, rounded at 6 dp.
    */
  def qMarkov(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = tbl(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("prev_type"))
      .withColumn("next_type", lead(col("prev_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
    trans
      .withColumn("p", round(col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy("prev_type"))
          .cast("double"), 6))
      .orderBy("prev_type", "next_type")
  }

  /** Market-basket co-occurrence with lift: distinct (order, brand)
    * pairs self-joined per order (pair volume bounded by
    * brands-per-order², never all-pairs over the catalog), brand
    * priors joined back by BROADCAST (the brand dimension is tiny by
    * definition), order total rides a broadcast 1-row aggregate. The
    * recommender-bootstrap query; top-30 by rounded lift with full
    * tie-break so the limit is deterministic.
    */
  def qItemCooccur(s: SparkSession, dir: String): DataFrame = {
    // (r16: same fence-tried-and-reverted note as qBasketRules)
    val ob = tbl(s, dir, "lineitem")
      .join(tbl(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey")
      .select(col("l_orderkey"), col("p_brand")).distinct()
    val pairs = ob.as("a").join(ob.as("b"), "l_orderkey")
      .filter(col("a.p_brand") < col("b.p_brand"))
      .select(col("a.p_brand").as("brand_a"), col("b.p_brand").as("brand_b"))
      .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("n_ab"))
    val brandCnt = ob.groupBy("p_brand").agg(count(lit(1)).as("c"))
    val tot = ob.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    pairs
      .join(broadcast(brandCnt.select(col("p_brand").as("brand_a"),
        col("c").as("c_a"))), "brand_a")
      .join(broadcast(brandCnt.select(col("p_brand").as("brand_b"),
        col("c").as("c_b"))), "brand_b")
      .crossJoin(broadcast(tot))
      .select(col("brand_a"), col("brand_b"), col("n_ab"),
        round(col("n_ab").cast("double") * col("n_orders").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double")), 6)
          .as("lift"))
      .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
      .limit(30)
  }

  /** Bounded-hop BFS shortest paths over the co-supplier graph (the
    * q_pagerank edge construction) from the minimum-id source node.
    * Each of the 4 synchronous frontier expansions is one keyed join +
    * one min-aggregate, localCheckpointed so the loop's plan stays O(1)
    * in depth (the PageRank/BpeTrainer lineage contract) and the
    * predecessor's blocks are released; edges are persisted for the
    * loop's lifetime and unpersisted on return. The DuckDB twin is a
    * recursive CTE with UNION dedup — (node, depth) state stays
    * bounded at nodes × hops in both engines.
    */
  def qShortestPath(s: SparkSession, dir: String): DataFrame = {
    val edges = writtenEdgesTable(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val source = edges.agg(min(col("src"))).head().getLong(0)
      // EAGER per hop (r16: a lazy-intermediates variant was tried and
      // REVERTED — 1.14× slower; eager checkpoints keep size stats so
      // the frontier⋈edges join broadcasts the frontier side)
      var dist = s.range(1)
        .select(lit(source).as("node"), lit(0).as("d"))
        .localCheckpoint(true)
      var h = 1
      while (h <= 4) {
        val frontier = dist.filter(col("d") === h - 1)
          .join(edges, col("node") === col("src"))
          .select(col("dst").as("node"), lit(h).as("d"))
        val prev = dist
        dist = dist.union(frontier).groupBy("node")
          .agg(min(col("d")).as("d"))
          .localCheckpoint(true)
        prev.unpersist(blocking = false)
        h += 1
      }
      dist.select(col("node"), col("d").as("dist")).orderBy("node")
    } finally edges.unpersist(blocking = false)
  }

  /** Benford first-digit audit of a monetary column — the data-quality
    * screen for fabricated or truncated numeric feeds. The first digit
    * comes from exact integer cents (round-to-cents then string head),
    * never from float log-bucketing; observed frequencies are divisions
    * of exact counts over a 9-row window, and the Benford expectation
    * log10(1 + 1/d) is rounded at 6 dp on both engines.
    */
  def qBenford(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    tbl(s, dir, "lineitem")
      .select(expr(
        """CAST(substring(CAST(CAST(round(l_extendedprice * 100, 0)
             AS BIGINT) AS STRING), 1, 1) AS INT)""").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .withColumn("obs_freq", round(col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy()).cast("double"), 6))
      .withColumn("exp_freq", round(
        log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6))
      .orderBy("digit")
  }

  /** Shannon entropy of the token distribution per language slice —
    * the corpus-diversity monitor (a collapsing corpus shows falling
    * entropy before any eyeball catches it). Uses the identity
    * H = ln N − (Σ c·ln c)/N so the corpus is scanned ONCE into a
    * vocab-sized aggregate; determinism is the q_perplexity contract
    * (per-type ln rounded to 9 dp, accumulated exactly as DECIMAL, so
    * partition order cannot perturb the sum).
    */
  def qEntropy(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("lang"), explode(expr(tokensSql)).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c"))
      .groupBy("lang")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(expr(
          """CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9))
             * CAST(c AS DECIMAL(12,0))""")).as("sum_clnc"))
      .select(col("lang"), col("n_tokens"), col("vocab"),
        round(expr("ln(CAST(n_tokens AS DOUBLE))")
          - col("sum_clnc").cast("double")
            / col("n_tokens").cast("double"), 6).as("entropy"))
      .orderBy("lang")

  /** RFM segmentation (recency/frequency/monetary) with rule-based
    * integer scoring — deliberately NOT ntile, whose global sort is a
    * single-reducer shape and whose quartile boundaries differ between
    * engines on ties. Recency is exact integer-µs day math against a
    * broadcast global max; monetary sums are exact DECIMAL; every score
    * is pure integer arithmetic, so the segment rollup hash-matches by
    * construction. One keyed aggregate + one 16-ish-row rollup.
    */
  def qRfm(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
      .select(col("o_custkey"),
        expr("unix_micros(o_orderdate)").as("us"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    val gmax = o.agg(max(col("us")).as("gmax"))
    val per = o.groupBy("o_custkey")
      .agg(max(col("us")).as("cmax"), count(lit(1)).as("freq"),
        sum(col("price")).as("mon"))
      .crossJoin(broadcast(gmax))
      .select(
        expr("4 - least(3, ((gmax - cmax) DIV 86400000000) DIV 60)")
          .as("r_score"),
        expr("least(4, freq)").as("f_score"),
        expr("least(4, 1 + CAST(floor(mon) AS BIGINT) DIV 200000)")
          .as("m_score"),
        col("mon"))
    per.groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("mon")).cast("double").as("total_monetary"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** DAU/MAU stickiness: per-day and per-month exact distinct users
    * joined on the month — the engagement ratio every events pipeline
    * reports. Two keyed distinct aggregates (each a standard two-level
    * partial/final shape that scales with the key space, not the event
    * volume) and a month-keyed join where the MAU side is months-sized
    * — broadcast by AQE at any realistic scale.
    */
  def qDauMau(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "events")
      .select(to_date(col("ts")).as("day"),
        date_trunc("month", col("ts")).cast("date").as("month"),
        col("user_id"))
    val dau = e.groupBy("day", "month")
      .agg(countDistinct(col("user_id")).as("dau"))
    val mau = e.groupBy("month")
      .agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, "month")
      .select(col("day"), col("dau"), col("mau"),
        round(col("dau").cast("double") / col("mau").cast("double"), 6)
          .as("stickiness"))
      .orderBy("day")
  }

  /** Type-token ratio per document (lexical diversity): distinct-token
    * over token count from one corpus explode into a doc-keyed
    * aggregate — the cheap gibberish/boilerplate screen (low TTR =
    * repeated phrases, high TTR on long docs = word-soup OCR noise).
    * Top-50 by the ROUNDED ratio with doc_id tie-break so the limit is
    * deterministic.
    */
  def qTtr(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"), explode(expr(tokensSql)).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("w")).as("n_types"))
      .filter(col("n_tok") >= 20)
      .select(col("doc_id"), col("n_tok"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tok").cast("double"),
          6).as("ttr"))
      .orderBy(col("ttr").desc, col("doc_id"))
      .limit(50)

  /** Add-1-smoothed BIGRAM language-model scoring — the second-order
    * sibling of q_perplexity's unigram LM (bigram surprisal separates
    * scrambled-word soup that unigram stats cannot see). The per-doc
    * bigram TYPE-count table feeds the count model (bc → cx → v) AND
    * the scoring join, so it is persisted for the query's lifetime
    * (the qPerplexity contract: the lazy return leaves no unpersist
    * point) — without it the corpus explode re-runs once per derived
    * table. All joins are keyed on bigram vocab; the vocabulary size
    * rides a broadcast 1-row side. Determinism is the repo LM
    * contract: per-bigram ln terms rounded to 9 dp, weighted by their
    * exact type counts, and accumulated as exact DECIMAL.
    */
  def qBigramLm(s: SparkSession, dir: String): DataFrame = {
    // Cache the per-doc bigram TYPE counts (doc, x, y, k) — the state
    // floor for per-doc scoring — never the raw bigram instance
    // stream (corpus-sized at 100 TB); the count model derives from
    // it and the scoring sum weights each type term by k, which is
    // exactly the instance sum in exact DECIMAL (r11 persist audit).
    // fanout (r16): tokenize+bigram-explode amplifies the single-row-
    // group scan ~50× before the first shuffle — parallelize the pass
    val db = fanout(tbl(s, dir, "documents")
        .select(col("doc_id"), col("text")))
      .select(col("doc_id"), expr(tokensSql).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
             i -> named_struct('x', element_at(ws, i),
                               'y', element_at(ws, i + 1)))""")).as("b"))
      .select(col("doc_id"), col("b.x").as("x"), col("b.y").as("y"))
      .groupBy("doc_id", "x", "y").agg(count(lit(1)).as("k"))
      .persist()
    val bc = db.groupBy("x", "y").agg(sum(col("k")).as("c")).persist()
    val cx = bc.groupBy("x").agg(sum(col("c")).as("cx"))
    val v = bc.agg(countDistinct(col("y")).as("v"))
    db
      .join(bc, Seq("x", "y"))
      .join(cx, Seq("x"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("k"), expr(
        """CAST(round(ln((CAST(c AS DOUBLE) + 1.0)
             / (CAST(cx AS DOUBLE) + CAST(v AS DOUBLE))), 9)
           AS DECIMAL(18,9))""").as("term"))
      .groupBy("doc_id")
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("term") * col("k")).as("st"))
      .select(col("doc_id"), col("n_bigrams"),
        round(lit(0.0) - col("st").cast("double")
          / col("n_bigrams").cast("double"), 6).as("mean_nll"))
      .orderBy("doc_id")
  }

  /** INTERPOLATED KNESER–NEY bigram probabilities (d = 0.75) — the
    * smoothing real LM tooling ships (q_bigram_lm is add-one):
    * P(y|x) = (c(x,y) − d)/c(x) + d·N₁₊(x·)/c(x) · N₁₊(·y)/T, where
    * the continuation counts N₁₊ ask "how many distinct contexts",
    * the insight that makes KN beat frequency smoothing. Every input
    * is an integer count off ONE bigram-type aggregate (vocab²-bounded
    * state, never the corpus token stream — the §8.x audit rule);
    * c ≥ 1 makes the max(c−d, 0) clamp vacuous. Top-20 bigrams by
    * count with the probability rounded once at 9 dp.
    */
  def qKneserNey(s: SparkSession, dir: String): DataFrame = {
    val bc = fanout(tbl(s, dir, "documents").select(col("text")))
      .select(expr(tokensSql).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(ws) - 1),
             i -> named_struct('x', element_at(ws, i),
                               'y', element_at(ws, i + 1)))""")).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
    val cx = bc.groupBy("x").agg(sum(col("c")).as("cx"),
      count(lit(1)).as("n1x"))
    val cy = bc.groupBy("y").agg(count(lit(1)).as("n1y"))
    val t = bc.agg(count(lit(1)).as("t"))
    bc.join(cx, "x").join(cy, "y").crossJoin(broadcast(t))
      .select(col("x"), col("y"), col("c"),
        round(expr(
          """(CAST(c AS DOUBLE) - 0.75) / CAST(cx AS DOUBLE)
             + (0.75 * CAST(n1x AS DOUBLE) / CAST(cx AS DOUBLE))
             * (CAST(n1y AS DOUBLE) / CAST(t AS DOUBLE))"""), 9)
          .as("p_kn"))
      .orderBy(col("c").desc, col("x"), col("y"))
      .limit(20)
  }

  /** NELSON–AALEN cumulative hazard over first-order "survival" times
    * (the estimator the survival battery's log-rank test compares
    * against): H(t) = Σ_{tᵢ≤t} dᵢ/rᵢ with dᵢ the day's events and rᵢ
    * the at-risk count. Day-keyed aggregate → calendar-bounded running
    * windows (the qRocAuc contract); each hazard increment is an
    * integer ratio rounded to 9 dp into exact DECIMAL, so the running
    * sum is order-stable. First 30 event times.
    */
  def qNelsonAalen(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val first = tbl(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("fd"))
    val lo = first.agg(min(col("fd")).as("d0"))
    val ev = first.crossJoin(broadcast(lo))
      .select(datediff(col("fd"), col("d0")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("d"))
    val wPrev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.crossJoin(broadcast(ev.agg(sum(col("d")).as("n"))))
      .withColumn("r", col("n") - coalesce(sum(col("d")).over(wPrev),
        lit(0L)))
      .withColumn("term", expr(
        """CAST(round(CAST(d AS DOUBLE) / CAST(r AS DOUBLE), 9)
          AS DECIMAL(18,9))"""))
      .withColumn("ch", sum(col("term")).over(wRun))
      .select(col("t"), col("d"), col("r"),
        round(col("ch").cast("double"), 6).as("cum_hazard"))
      .orderBy("t")
      .limit(30)
  }

  /** Shingle CONTAINMENT (asymmetric Jaccard, |A∩B|/min-side focus) —
    * the sub-document-duplication detector: a doc wholly embedded in a
    * larger one scores ~1.0 where symmetric Jaccard stays low. Pure
    * Column trigram-set algebra (no UDF), pairs generated only within
    * (source, length-band) blocks — the FuzzyJoin blocking contract,
    * never all-pairs — and the top-20 is ordered on the ROUNDED score
    * with full id tie-break. Blocks are CAPPED at 32 docs by id order
    * (the LSH maxBucketSize discipline, mirrored in the oracle): under
    * a FIXED blocking key, block population grows linearly with the
    * corpus and in-block pairs quadratically — the r8 stress study
    * measured exactly that (52× at 10× data) before this cap; at true
    * scale the candidate source swaps to the minhash index anyway.
    */
  def qContainment(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wBlk = Window.partitionBy("source", "blk").orderBy("doc_id")
    val t = tbl(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        expr("CAST(n_chars AS BIGINT) DIV 100").as("blk"),
        expr(tokensSql).as("ws"))
      .filter(size(col("ws")) >= 3)
      .withColumn("rn", row_number().over(wBlk))
      .filter(col("rn") <= 32)
      .select(col("doc_id"), col("source"), col("blk"),
        array_distinct(expr(
          """transform(sequence(1, size(ws) - 2),
               i -> concat_ws(' ', element_at(ws, i),
                 element_at(ws, i + 1), element_at(ws, i + 2)))"""))
          .as("sh"))
    val a = t.select(col("source"), col("blk"),
      col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = t.select(col("source"), col("blk"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("source", "blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
          .as("inter"),
        size(col("sh_a")).cast("long").as("la"),
        size(col("sh_b")).cast("long").as("lb"))
      .withColumn("containment", round(greatest(
        col("inter").cast("double") / col("la").cast("double"),
        col("inter").cast("double") / col("lb").cast("double")), 6))
      .orderBy(col("containment").desc, col("id_a"), col("id_b"))
      .limit(20)
  }

  /** SEQUENTIAL PATTERN SUPPORT (the GSP/PrefixSpan 2-step core,
    * complementing q_basket_rules' unordered co-occurrence and
    * q_markov_attribution's adjacent transitions): for every ordered
    * event-type pair a→b, the fraction of users with SOME a occurring
    * before SOME b — exists(a before b) ⟺ min_ts(a) < max_ts(b), so
    * one per-(user, type) min/max aggregate replaces any scan of raw
    * event pairs, and the join is users × typePairs (dimension-bounded
    * per user), never event × event.
    */
  def qSeqPatterns(s: SparkSession, dir: String): DataFrame = {
    val ut = withTsUs(tbl(s, dir, "events"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts_us")).as("mn"), max(col("ts_us")).as("mx"))
    val total = ut.select(col("user_id")).distinct().count()
    val a = ut.select(col("user_id"), col("event_type").as("a"),
      col("mn"))
    val b = ut.select(col("user_id").as("u2"),
      col("event_type").as("b"), col("mx"))
    a.join(b, col("user_id") === col("u2"))
      .filter(col("a") =!= col("b") && col("mn") < col("mx"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_users"))
      .select(col("a"), col("b"), col("n_users"),
        round(col("n_users").cast("double") / lit(total.toDouble), 6)
          .as("support"))
      .orderBy(col("support").desc, col("a"), col("b"))
  }

  /** THRESHOLDED edit-distance dedup probe on the native
    * [[graft.functions.BoundedLevenshtein]] expression: within
    * (source, length-block) capped blocks (the FuzzyJoin contract —
    * never all-pairs), the 20 closest document pairs by
    * graft_lev_bounded(text, text, 40). The kernel is banded
    * O(len·(2k+1)) with early abandon and runs as ONE static call
    * inside whole-stage codegen — Spark's builtin `levenshtein` pays
    * full O(n·m) DP per pair for an answer the probe immediately
    * clamps anyway. The DuckDB twin clamps its full levenshtein with
    * least(·, k+1): identical results, so the gate proves the banded
    * kernel exact on every ≤k pair and correctly saturated above.
    */
  def qLevBlockDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.BoundedLevenshtein.register(s)
    val wBlk = Window.partitionBy("source", "blk").orderBy("doc_id")
    val t = tbl(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        expr("CAST(n_chars AS BIGINT) DIV 100").as("blk"))
      .withColumn("rn", row_number().over(wBlk))
      .filter(col("rn") <= 16)
    val a = t.select(col("source"), col("blk"),
      col("doc_id").as("id_a"), col("text").as("t_a"))
    val b = t.select(col("source"), col("blk"),
      col("doc_id").as("id_b"), col("text").as("t_b"))
    a.join(b, Seq("source", "blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("graft_lev_bounded(t_a, t_b, 40)").as("dist"))
      .orderBy(col("dist"), col("id_a"), col("id_b"))
      .limit(20)
  }

  /** Winsorized robust statistics per event type: clip at the exact
    * per-group p05/p95 (percentile_disc — an actual element, the
    * engine-agnostic discrete percentile the q_percentile_disc gate
    * already pins) and aggregate the clipped values as exact DECIMAL.
    * The outlier-robust mean every metrics pipeline wants before a
    * spiky `value` column poisons a dashboard; the cutoff side is
    * groups-sized and broadcast by AQE.
    */
  def qWinsorize(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "events").createOrReplaceTempView("events_wz_v")
    s.sql(
      """WITH cut AS (SELECT event_type,
             percentile_disc(0.05) WITHIN GROUP (ORDER BY value) AS p05,
             percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95
           FROM events_wz_v GROUP BY event_type)
         SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN e.value < c.p05 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_low,
           CAST(SUM(CASE WHEN e.value > c.p95 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_high,
           round(CAST(SUM(CAST(greatest(c.p05, least(c.p95, e.value))
             AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             AS winsorized_mean
         FROM events_wz_v e JOIN cut c ON e.event_type = c.event_type
         GROUP BY e.event_type ORDER BY e.event_type""")
  }

  /** Survivorship / golden-record construction — the step AFTER dedup
    * clustering: per entity group (source × length band here), elect a
    * canonical survivor by an explicit deterministic rule (longest
    * text, id tie-break via a PARTITIONED row_number — never max_by,
    * whose tie choice is engine-arbitrary) and merge the group's
    * attributes (member count, char mass, sorted distinct languages).
    * One partitioned window + one keyed aggregate, both on the entity
    * key — no global sort anywhere.
    */
  def qGoldenRecord(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = tbl(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        expr("CAST(n_chars AS BIGINT) DIV 200").as("bucket"))
    val w = Window.partitionBy("source", "bucket")
      .orderBy(col("n_chars").desc, col("doc_id"))
    // r17 (guide §2.4 "window functions partitioned by the same key as
    // a preceding aggregation do not need a second shuffle", VERDICT
    // item 8): the group attributes used to come from a SECOND scan +
    // aggregate + join back to the survivor row — but the survivor
    // window already holds the whole entity group in one partition, so
    // count/sum/collect_set ride the SAME window pass (whole-partition
    // frame) and the join disappears. One scan, one exchange, values
    // identical (count/sum/set over the same groups).
    val wAll = Window.partitionBy("source", "bucket")
    d.withColumn("rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(wAll))
      .withColumn("total_chars", sum(col("n_chars")).over(wAll))
      .withColumn("langs",
        concat_ws(",", array_sort(collect_set(col("lang")).over(wAll))))
      .filter(col("rn") === 1)
      .select(col("source"), col("bucket"),
        col("doc_id").as("keep_id"), col("n_chars").as("keep_chars"),
        col("n_members"), col("total_chars"), col("langs"))
      .orderBy("source", "bucket")
  }

  /** HITS hubs/authorities over the DIRECTED supplier→part bipartite
    * graph (part ids offset into their own key space) — the original
    * Kleinberg use-case shape, where the co-supplier graph would
    * degenerate to degrees. Three [[graft.ops.Hits]] iterations with
    * DECIMAL(28,12) max-normalized state (the PageRank determinism
    * recipe applied to the two-sided fixpoint); the DuckDB twin replays
    * the same three iterations as unrolled CTEs. Top-20 authorities by
    * rounded score.
    */
  def qHits(s: SparkSession, dir: String): DataFrame = {
    // Edge set (incl. the data-derived node-space offset max-scan)
    // comes off the write-once artifact — the offset scan rides the
    // one-time build, not every q_hits run.
    val e = writtenHitsEdges(s, dir)
    graft.ops.Hits.scores(e, "src", "dst", iters = 3)
      .select(col("node"),
        round(col("auth").cast("double"), 8).as("auth"),
        round(col("hub").cast("double"), 8).as("hub"))
      .orderBy(col("auth").desc, col("node"))
      .limit(20)
  }

  /** Degree distribution of the co-supplier graph — the first graph
    * profile anyone draws (power-law check, max-degree hotspot scan
    * before launching iterative algorithms). One keyed count + one
    * degree-keyed count.
    */
  def qDegreeStats(s: SparkSession, dir: String): DataFrame = {
    writtenEdgesTable(s, dir)
      .groupBy("src").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
      .orderBy("degree")
  }

  /** Link prediction by neighbor Jaccard: candidate pairs come from a
    * WEDGE join (two-hop paths through a shared neighbor — the triangle
    * machinery, volume Σ_w deg(w)², never all-pairs), existing edges
    * are anti-joined away, and the score is |N∩|/|N∪| from exact
    * degree/common counts. Top-20 by the ROUNDED score with full id
    * tie-break.
    */
  def qLinkPredict(s: SparkSession, dir: String): DataFrame = {
    val und = writtenEdgesTable(s, dir).toDF("u", "v")
    val deg = und.groupBy("u").agg(count(lit(1)).as("du"))
    val cn = und.toDF("u", "w").join(und.toDF("v", "w"), "w")
      .filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("cn"))
      .join(und.toDF("u", "v"), Seq("u", "v"), "left_anti")
    cn.join(deg, "u")
      .join(deg.toDF("v", "dv"), "v")
      .select(col("u"), col("v"), col("cn"),
        round(col("cn").cast("double")
          / (col("du") + col("dv") - col("cn")).cast("double"), 6)
          .as("jacc"))
      .orderBy(col("jacc").desc, col("u"), col("v"))
      .limit(20)
  }

  /** Chi-square test of independence (lang × source) + Cramér's V —
    * the categorical-association screen (is my language mix uniform
    * across crawl sources, or does one source skew the corpus?). Cell
    * terms are rounded to 9 dp and summed as exact DECIMAL (the
    * repo-wide order-independence contract; a raw double Σ over 100
    * cells would be partition-order-dependent). Cells with zero
    * observed count are absent on both engines by the same
    * construction.
    */
  def qChiSquare(s: SparkSession, dir: String): DataFrame = {
    val cells = tbl(s, dir, "documents").groupBy("lang", "source")
      .agg(count(lit(1)).as("o"))
    val rowT = cells.groupBy("lang").agg(sum(col("o")).as("rt"))
    val colT = cells.groupBy("source").agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("lang")).as("r"),
      countDistinct(col("source")).as("c"))
    cells.join(rowT, "lang").join(colT, "source")
      .crossJoin(broadcast(tot))
      .select(expr(
        """CAST(round(
             (CAST(o AS DOUBLE)
               - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                 / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE)
               - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                 / CAST(n AS DOUBLE))
             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
               / CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9))""").as("cell"),
        col("n"), col("r"), col("c"))
      .groupBy("n", "r", "c")
      .agg(sum(col("cell")).as("chi2d"))
      .select(col("n"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        round(col("chi2d").cast("double"), 6).as("chi2"),
        round(sqrt(col("chi2d").cast("double")
          / (col("n").cast("double")
            * least(col("r") - 1, col("c") - 1).cast("double"))), 6)
          .as("cramers_v"))
  }

  /** Smoothed target encoding (the feature-engineering mean-encode):
    * per-brand revenue statistics shrunk toward the global prior with
    * pseudo-count m=50 — enc = (Σy + m·prior)/(n + m). All sums are
    * exact DECIMAL (revenue = price × (1−discount) in decimal), the
    * prior rides a broadcast 1-row aggregate, and the final divisions
    * are textually identical in the oracle.
    */
  def qTargetEncoding(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
      .join(tbl(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey")
      .select(col("p_brand"), expr(
        """CAST(l_extendedprice AS DECIMAL(14,2))
           * (CAST(1.00 AS DECIMAL(4,2))
             - CAST(l_discount AS DECIMAL(4,2)))""").as("rev"))
    val per = li.groupBy("p_brand")
      .agg(count(lit(1)).as("n"), sum(col("rev")).as("s"))
    val g = li.agg(count(lit(1)).as("gn"), sum(col("rev")).as("gs"))
    per.crossJoin(broadcast(g))
      .select(col("p_brand"), col("n"),
        round(col("s").cast("double") / col("n").cast("double"), 6)
          .as("raw_mean"),
        round((col("s").cast("double")
            + lit(50.0) * (col("gs").cast("double")
              / col("gn").cast("double")))
          / (col("n").cast("double") + 50.0), 6).as("encoded"))
      .orderBy("p_brand")
  }

  /** The daily order-revenue series every time-series query in this
    * family shares: one keyed aggregate to days-sized data (the corpus
    * never reaches a window), revenue as exact DECIMAL.
    */
  def dailyRevenue(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"))

  /** Weekday seasonality decomposition: detrend the daily series with a
    * CENTERED 7-day moving sum (complete windows only) and average the
    * detrended residual per ISO weekday — the additive
    * seasonal-index readout (which weekdays structurally over/under
    * index). Every window runs over the DAYS-SIZED aggregate, never
    * order rows; trend and residual stay DECIMAL-exact until one
    * rounded division each (engine-identical).
    */
  def qSeasonality(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    dailyRevenue(s, dir)
      .withColumn("n7", count(lit(1)).over(w))
      .withColumn("sum7", sum(col("rev")).over(w))
      .filter(col("n7") === 7)
      .select((weekday(col("day")) + 1).cast("long").as("dow"),
        (col("rev") - expr(
          """CAST(round(CAST(sum7 AS DOUBLE) / 7.0, 6)
             AS DECIMAL(18,6))""")).as("detr"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("detr")).cast("double")
          / count(lit(1)).cast("double"), 6).as("seasonal"))
      .orderBy("dow")
  }

  /** Lag-7 autocorrelation of daily revenue — the "is there a weekly
    * cycle" scalar before fitting anything. Pairs come from a LAG
    * window over the days-sized series; Pearson r is the q_linreg
    * closed form over exact DECIMAL moment sums, one rounded double
    * formula at the end.
    */
  def qAutocorr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day")
    dailyRevenue(s, dir)
      .withColumn("lag7", lag(col("rev"), 7).over(w))
      .filter(col("lag7").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(col("rev")).as("sx"), sum(col("lag7")).as("sy"),
        sum(col("rev") * col("lag7")).as("sxy"),
        sum(col("rev") * col("rev")).as("sxx"),
        sum(col("lag7") * col("lag7")).as("syy"))
      .select(col("n"),
        round(expr(
          """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""), 6)
          .as("acf7"))
  }

  /** CUSUM change-point scan: running sum of (x − global mean) over the
    * daily series, top-5 days by |cusum| — where the cumulative
    * deviation peaks is the level-shift candidate. The mean is rounded
    * once to a DECIMAL(18,6) constant (broadcast), so the running sum
    * is an exact DECIMAL fold — order-independent and engine-identical;
    * the window input is days-sized by construction.
    */
  def qChangepoint(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = dailyRevenue(s, dir)
    val m = d.agg(expr(
      """CAST(round(CAST(sum(rev) AS DOUBLE) / count(1), 6)
         AS DECIMAL(18,6))""").as("mu"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.crossJoin(broadcast(m))
      .withColumn("cusum", sum(col("rev") - col("mu")).over(w))
      .select(col("day"), round(col("cusum").cast("double"), 6).as("cusum"),
        round(abs(col("cusum")).cast("double"), 6).as("abs_cusum"))
      .orderBy(col("abs_cusum").desc, col("day"))
      .limit(5)
  }

  /** Cohort LTV triangle: customers grouped by first-order month, value
    * accumulated by months-since-cohort — the lifetime-value readout
    * behind every retention deck. Month arithmetic is pure integer
    * (year·12+month), cohorts come from one keyed MIN aggregate joined
    * back on the customer key, and revenue sums are exact DECIMAL —
    * two keyed shuffles total, triangle-sized output.
    */
  def qCohortLtv(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("ym"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    val first = o.groupBy("o_custkey").agg(min(col("ym")).as("cohort_ym"))
    o.join(first, "o_custkey")
      .groupBy(col("cohort_ym"),
        (col("ym") - col("cohort_ym")).as("age_months"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(col("price")).cast("double").as("revenue"))
      .orderBy("cohort_ym", "age_months")
  }

  /** Inter-order gap distribution: per-customer LAG over order dates
    * (deterministic tie-break on the order key), exact integer day
    * gaps, then global discrete percentiles + mean — the
    * purchase-cadence profile that sizes retention windows. The gap
    * table is orders-sized; the percentile aggregate is the
    * q_percentile_disc contract.
    */
  def qOrderGaps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    tbl(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate"),
        expr("unix_micros(o_orderdate)").as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .select(expr("(us - prev_us) DIV 86400000000").as("gap_days"))
      .createOrReplaceTempView("order_gaps_v")
    s.sql(
      """SELECT COUNT(*) AS n_gaps,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)
             AS BIGINT) AS med_gap_days,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_days)
             AS BIGINT) AS p90_gap_days,
           round(CAST(SUM(gap_days) AS DOUBLE) / COUNT(*), 6)
             AS mean_gap_days
         FROM order_gaps_v""")
  }

  /** CHANGE DATA FEED read ([[graft.table.TxnTable.cdf]]): updates emit
    * both images as separate rows — the Delta-CDF row shape that makes
    * downstream aggregates incrementally maintainable. Same v1→v3 probe
    * as q_table_cdc; the oracle reconstructs the four image classes
    * from the version CTEs.
    */
  def qTableCdf(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.cdf(s, writtenTxnOrdersTable(s, dir), 1L, 3L,
        Seq("o_orderkey"))
      .select(col("o_orderkey"), col("_change_type"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_orderkey", "_change_type")

  /** INCREMENTAL MATERIALIZED-VIEW MAINTENANCE: a per-priority
    * (count, revenue) aggregate materialized at v1 is brought to v3 by
    * applying the CDF delta — inserts/update_postimages add,
    * deletes/update_preimages subtract — WITHOUT re-aggregating the
    * base table. The oracle aggregates v3 from scratch, so the hash
    * match IS the incremental == full-recompute equivalence proof
    * (exact DECIMAL sums make the algebra associativity-safe). At
    * 100 TB this is the difference between touching the CDC delta and
    * rescanning the table.
    */
  def qMvIncremental(s: SparkSession, dir: String): DataFrame = {
    val root = writtenTxnOrdersTable(s, dir)
    val mv = graft.table.TxnTable.snapshotAt(s, root, 1L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n0"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("s0"))
    val delta = graft.table.TxnTable
      .cdf(s, root, 1L, 3L, Seq("o_orderkey"))
      .select(col("o_orderpriority"),
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .otherwise(-1L).as("sign"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("o_orderpriority")
      .agg(sum(col("sign")).as("dn"),
        sum(when(col("sign") === 1L, col("p")).otherwise(-col("p")))
          .as("ds"))
    mv.join(delta, Seq("o_orderpriority"), "full_outer")
      .select(col("o_orderpriority"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("s0"), lit(0).cast("decimal(18,2)"))
          + coalesce(col("ds"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("sum_price"))
      .filter(col("n_orders") > 0)
      .orderBy("o_orderpriority")
  }

  /** Johnson-Lindenstrauss random projection 64→4 dims with a SEEDLESS
    * deterministic ±1 matrix — sign(j,i) is the low bit of
    * splitmix64(j·64+i), so the "random" matrix is a pure function both
    * engines regenerate independently (no stored artifact, no RNG
    * state; the q_epoch_shuffle hash-randomness contract). Per-row
    * narrow map, zero shuffles; the fold is dim-order sequential on
    * both engines (Duck.foldDot discipline) so the double sums are
    * bit-identical. The 100 TB use: cheap sketch vectors for pre-filter
    * distance bounds before exact rescoring.
    */
  def qRandomProjection(s: SparkSession, dir: String): DataFrame = {
    val projUdf = udf((v: Seq[Float]) => {
      Array.tabulate(4) { j =>
        var acc = 0.0
        var i = 1
        while (i <= 64) {
          val sign =
            if ((graft.util.Hashing.mix64(j * 64L + i) & 1L) == 0L) 1.0
            else -1.0
          acc += v(i - 1).toDouble * sign
          i += 1
        }
        acc
      }
    })
    tbl(s, dir, "embeddings")
      .select(col("vec_id"), projUdf(col("embedding")).as("p"))
      .select(col("vec_id"),
        round(col("p").getItem(0), 6).as("p0"),
        round(col("p").getItem(1), 6).as("p1"),
        round(col("p").getItem(2), 6).as("p2"),
        round(col("p").getItem(3), 6).as("p3"))
      .orderBy("vec_id")
  }

  /** l-diversity audit — the release gate k-anonymity alone misses: a
    * quasi-identifier group can be large (k-anonymous) yet expose its
    * members if the SENSITIVE attribute is uniform inside it. Per
    * (segment, nation) group: size, count of distinct sensitive bands,
    * and the violation flag at l < 3. One keyed distinct aggregate;
    * bands are floor-integer so both engines bucket identically.
    */
  def qLDiversity(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey").cast("long")
        .as("nation"),
        expr("CAST(floor(c_acctbal / 2000.0) AS BIGINT)").as("band"))
      .groupBy("c_mktsegment", "nation")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("band")).as("l_div"))
      .withColumn("violates", col("l_div") < 3)
      .orderBy("c_mktsegment", "nation")

  /** Referential-integrity audit: orphan counts for each lineitem
    * foreign key via LEFT ANTI joins (the broadcast-able key-only dim
    * side at any scale) — the load-time contract check every warehouse
    * runs. One row per FK with rows-checked and orphan counts; zeros
    * are the assertion, not a trivial result.
    */
  def qFkViolations(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
    def audit(fk: String, dim: DataFrame, pk: String): DataFrame = {
      val orphans = li.select(col(fk))
        .join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti")
      orphans.agg(count(lit(1)).as("n_orphans"),
        countDistinct(col(fk)).as("n_orphan_keys"))
        .select(lit(fk).as("fk"), col("n_orphans"), col("n_orphan_keys"))
    }
    audit("l_orderkey", tbl(s, dir, "orders"), "o_orderkey")
      .unionAll(audit("l_partkey", tbl(s, dir, "part"), "p_partkey"))
      .unionAll(audit("l_suppkey", tbl(s, dir, "supplier"), "s_suppkey"))
      .orderBy("fk")
  }

  /** Peak concurrency per day by DISTRIBUTED sweep-line: each event
    * opens a 30-min interval (+1 at start, −1 at end), the within-day
    * running sum is a DAY-PARTITIONED window (RANGE frame, so
    * same-instant deltas aggregate together — deterministic under any
    * tie order), and cross-midnight carry-in comes from a days-sized
    * prefix over per-day nets — the two-level prefix that keeps the
    * sweep scalable where a single global ordering would be a
    * one-reducer sort over the event volume.
    */
  def qConcurrency(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = withTsUs(tbl(s, dir, "events"))
      .select(col("ts_us").as("us0"))
      .select(explode(array(
        struct(col("us0").as("us"), lit(1L).as("d")),
        struct((col("us0") + 1800000000L).as("us"), lit(-1L).as("d"))))
        .as("e"))
      .select(col("e.us").as("us"), col("e.d").as("d"))
      .withColumn("day", expr("us DIV 86400000000"))
    val wIn = Window.partitionBy("day").orderBy("us")
    val run = p.withColumn("rin", sum(col("d")).over(wIn))
    val dayNet = p.groupBy("day").agg(sum(col("d")).as("net"))
    val wDay = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = dayNet.withColumn("carry",
      coalesce(sum(col("net")).over(wDay), lit(0L)))
    run.join(carry.select("day", "carry"), "day")
      .groupBy("day")
      .agg(max(col("rin") + col("carry")).as("max_concurrency"))
      .orderBy("day")
  }

  /** Component-size distribution of the co-supplier graph — the graph
    * health profile downstream of [[graft.ops.ConnectedComponents]]
    * (pointer-jumping min-label, O(log diameter) rounds): one giant
    * component means banding/blocking parameters have collapsed, many
    * small ones mean healthy clusters. The DuckDB twin derives
    * components from the recursive reachability fixpoint (UNION dedup)
    * — exact, if quadratic per component, which is why it stays a
    * gate-scale oracle while the Spark side is the cluster algorithm.
    */
  /** GRAPH ROBUSTNESS under targeted attack: component structure
    * before vs after removing the top-5 degree hubs — the percolation
    * question (does connectivity depend on a few hubs?) asked with the
    * machinery already proven at scale: one degree aggregate, a
    * broadcast anti-join to drop hub-incident edges, and two
    * pointer-jumping CC runs ([[graft.ops.ConnectedComponents]]).
    * Single summary row; isolated-by-removal nodes count as size-1
    * components (nodes_after counts survivors, connected or not).
    */
  def qGraphRobustness(s: SparkSession, dir: String): DataFrame = {
    val e0 = writtenEdgesTable(s, dir)
    val hubs = e0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("src")).limit(5)
      .select(col("src").as("hub"))
    val e1 = e0
      .join(broadcast(hubs), e0("src") === col("hub"), "left_anti")
    val e2 = e1
      .join(broadcast(hubs), e1("dst") === col("hub"), "left_anti")
    def summary(ed: DataFrame, tag: String): DataFrame = {
      val und = ed.filter(col("src") < col("dst"))
        .select(col("src").as("u"), col("dst").as("v"))
      graft.ops.ConnectedComponents.components(und, "u", "v")
        .groupBy(col("comp")).agg(count(lit(1)).as("csize"))
        .agg(sum(col("csize")).as(s"nodes_$tag"),
          max(col("csize")).as(s"largest_$tag"),
          count(lit(1)).as(s"ncomp_$tag"))
    }
    summary(e0, "before").crossJoin(summary(e2, "after"))
  }

  def qComponentSizes(s: SparkSession, dir: String): DataFrame = {
    val edges = writtenEdgesTable(s, dir)
      .filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    graft.ops.ConnectedComponents.components(edges, "u", "v")
      .groupBy("comp").agg(count(lit(1)).as("csize"))
      .groupBy("csize").agg(count(lit(1)).as("n_components"))
      .orderBy("csize")
  }

  /** Hourly OHLC bars over purchase values — the canonical
    * first/last-in-window aggregation. Open/close come from
    * partitioned row_numbers with full (ts, id) tie-breaks — never
    * first()/min_by, whose tie choice is engine- and partition-
    * arbitrary; high/low/count are plain aggregates. Values pass
    * through untouched (no float arithmetic to drift).
    */
  def qOhlc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = withTsUs(tbl(s, dir, "events"))
      .filter(col("event_type") === "purchase")
      .select(expr("ts_us DIV 3600000000").as("hour"),
        col("ts_us"), col("event_id"), col("value"))
    val wAsc = Window.partitionBy("hour")
      .orderBy(col("ts_us"), col("event_id"))
    val wDesc = Window.partitionBy("hour")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    e.withColumn("rna", row_number().over(wAsc))
      .withColumn("rnd", row_number().over(wDesc))
      .groupBy("hour")
      .agg(count(lit(1)).as("n"),
        max(when(col("rna") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rnd") === 1, col("value"))).as("close"))
      .orderBy("hour")
  }

  /** STREAMING OHLC — q_ohlc's event-time twin as a real Structured
    * Streaming query: watermarked hourly windows where open/close are
    * min/max over (ts, id, value) STRUCTS — a total lexicographic
    * order (ids unique), so the result is deterministic under any
    * micro-batch arrival order, unlike first()/last(), which are
    * arrival-order-dependent and therefore unusable in a replayed
    * stream. Update-mode upsert log keyed on the window start (the
    * events_stream_tumbling fence).
    */
  def qEventsStreamOhlc(s: SparkSession, dir: String): DataFrame = {
    val schema = tbl(s, dir, "events").schema
    val stream = withTsEvent(
      s.readStream.schema(schema).parquet(eventsStreamDir(dir).toString))
      .filter(col("event_type") === "purchase")
      .withWatermark("ts_event", "1 hour")
      .groupBy(window(col("ts_event"), "1 hour"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("ts_event"), col("event_id"), col("value")))
          .as("o"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts_event"), col("event_id"), col("value")))
          .as("c"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n"), col("o.value").as("open"), col("high"), col("low"),
        col("c.value").as("close"))
    val log = streamToDeltaLog(s, stream, "update")
    readDeltaLogUpsert(s, log, stream.schema, Seq("window_start_us"))
      .orderBy("window_start_us")
  }

  /** Two-sample Kolmogorov-Smirnov test (purchase vs view values):
    * D = max |ECDF_A − ECDF_B| computed over DISTINCT cent-quantized
    * values (a bounded domain, so the running window never touches the
    * event volume — the q_roc_auc discipline), with the max taken over
    * the EXACT integer cross-products |ca·nb − cb·na| and divided once
    * at the end — no float comparison inside the scan. Emits the 5%
    * critical value and the reject flag.
    */
  def qKsTest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perV = tbl(s, dir, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select(expr("CAST(round(value * 100, 0) AS BIGINT)").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("isA"))
      .groupBy("v")
      .agg(sum(col("isA")).as("ca"), sum(lit(1L) - col("isA")).as("cb"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perV.withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
    val tot = cum.agg(max(col("cuma")).as("na"), max(col("cumb")).as("nb"))
    cum.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        abs(col("cuma") * col("nb") - col("cumb") * col("na")).as("num"))
      .groupBy("na", "nb")
      .agg(max(col("num")).as("dnum"))
      .select(col("na"), col("nb"),
        round(col("dnum").cast("double")
          / (col("na").cast("double") * col("nb").cast("double")), 6)
          .as("ks_d"),
        round(lit(1.358) * sqrt((col("na") + col("nb")).cast("double")
          / (col("na").cast("double") * col("nb").cast("double"))), 6)
          .as("crit_05"))
      .withColumn("reject_05", col("ks_d") > col("crit_05"))
  }

  /** Mann-Whitney U (purchase vs view values): the nonparametric
    * location test, from the same distinct-value midrank machinery as
    * q_roc_auc — Σ 2·midrank stays an exact integer (2·cum_less +
    * cnt + 1), so the rank sum is partition-order-proof; U and the
    * normal-approximation z (no tie correction, stated) are two double
    * formulas at the end.
    */
  def qMannWhitney(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perV = tbl(s, dir, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select(expr("CAST(round(value * 100, 0) AS BIGINT)").as("v"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("isA"))
      .groupBy("v")
      .agg(sum(col("isA")).as("ca"),
        sum(lit(1L) - col("isA")).as("cb"))
      .withColumn("cnt", col("ca") + col("cb"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perV.withColumn("cum", sum(col("cnt")).over(w))
      .select(col("ca"), col("cb"),
        (col("ca") * (lit(2L) * (col("cum") - col("cnt"))
          + col("cnt") + 1L)).as("mr2a"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        sum(col("mr2a")).as("sum2"))
      .select(col("na"), col("nb"),
        round(expr(
          """CAST(sum2 AS DOUBLE) / 2.0
             - CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0) / 2.0"""),
          6).as("u_stat"),
        round(expr(
          """(CAST(sum2 AS DOUBLE) / 2.0
              - CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0) / 2.0
              - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
             / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
               * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0)
               / 12.0)"""), 6).as("z_stat"))
  }

  /** Difference-in-differences: the experiment readout when arms exist
    * BEFORE the treatment moment — (post−pre) lift in A minus the same
    * in B cancels shared time trends. Arms are the reproducible
    * md5-hash assignment (the q_ab_lift contract via
    * [[graft.ops.Sampling.splitAssign]]), the treatment moment is the
    * integer-µs midpoint riding a broadcast, and all four cell sums
    * are exact DECIMAL.
    */
  def qDid(s: SparkSession, dir: String): DataFrame = {
    val ev = withTsUs(tbl(s, dir, "events"))
    val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) DIV 2").as("mid"))
    val assigned = graft.ops.Sampling
      .splitAssign(ev.select("user_id").distinct(), "user_id",
        seed = 11L, trainFrac = 0.5, valFrac = 0.25)
      .withColumn("in_a", col("split_u") < 0.5)
      .select("user_id", "in_a")
    val cells = ev.select(col("user_id"), col("ts_us"),
        col("value").cast("decimal(18,6)").as("v"))
      .join(assigned, "user_id")
      .crossJoin(broadcast(mid))
      .select(col("in_a"), (col("ts_us") >= col("mid")).as("post"),
        col("v"))
    cells.agg(
        sum(when(col("in_a") && col("post"), 1L).otherwise(0L))
          .as("n_ap"),
        sum(when(col("in_a") && !col("post"), 1L).otherwise(0L))
          .as("n_a0"),
        sum(when(!col("in_a") && col("post"), 1L).otherwise(0L))
          .as("n_bp"),
        sum(when(!col("in_a") && !col("post"), 1L).otherwise(0L))
          .as("n_b0"),
        sum(when(col("in_a") && col("post"), col("v"))).as("s_ap"),
        sum(when(col("in_a") && !col("post"), col("v"))).as("s_a0"),
        sum(when(!col("in_a") && col("post"), col("v"))).as("s_bp"),
        sum(when(!col("in_a") && !col("post"), col("v"))).as("s_b0"))
      .select(col("n_ap"), col("n_a0"), col("n_bp"), col("n_b0"),
        round(expr(
          """(CAST(s_ap AS DOUBLE) / n_ap - CAST(s_a0 AS DOUBLE) / n_a0)
             - (CAST(s_bp AS DOUBLE) / n_bp
               - CAST(s_b0 AS DOUBLE) / n_b0)"""), 6).as("did"))
  }

  /** Kaplan-Meier survival over time-to-first-purchase with RIGHT
    * CENSORING (users who signed up but never purchased are censored
    * at the observation horizon — dropping them would bias survival
    * down, the classic mistake). The KM product is carried in LOG
    * space: per-event-time factors ln((n−d)/n) rounded to 9 dp and
    * summed as exact DECIMAL (the repo LM contract), so no exp() libm
    * call ever enters the comparison — the emitted statistic is
    * log-survival. Distinct duration days bound every window; the
    * population total rides a broadcast.
    */
  def qSurvival(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = withTsUs(tbl(s, dir, "events"))
    val horizon = ev.agg(max(col("ts_us")).as("maxus"))
    val perUser = ev
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("ts_us")))
        .as("su"),
        min(when(col("event_type") === "purchase", col("ts_us")))
        .as("fp"))
      .filter(col("su").isNotNull)
      .crossJoin(broadcast(horizon))
      .select(
        when(col("fp").isNotNull && col("fp") >= col("su"), lit(1L))
          .otherwise(lit(0L)).as("is_event"),
        when(col("fp").isNotNull && col("fp") >= col("su"),
          expr("(fp - su) DIV 86400000000"))
          .otherwise(expr("(maxus - su) DIV 86400000000")).as("dur"))
    val perT = perUser.groupBy("dur")
      .agg(sum(col("is_event")).as("d"),
        sum(lit(1L) - col("is_event")).as("c"))
    val total = perT.agg(sum(col("d") + col("c")).as("tot"))
    val wPrev = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perT.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("tot") - coalesce(sum(col("d") + col("c")).over(wPrev),
          lit(0L)))
      .withColumn("term", expr(
        """CASE WHEN d > 0 AND d < n_risk THEN
             CAST(round(ln((CAST(n_risk AS DOUBLE) - CAST(d AS DOUBLE))
               / CAST(n_risk AS DOUBLE)), 9) AS DECIMAL(18,9))
           ELSE CAST(0.000000000 AS DECIMAL(18,9)) END"""))
      .withColumn("log_s",
        round(sum(col("term")).over(wCum).cast("double"), 6))
      .filter(col("d") > 0)
      .select(col("dur"), col("n_risk"), col("d").as("d_events"),
        col("c").as("c_censored"), col("log_s"))
      .orderBy("dur")
  }

  /** Banded Lorenz curve of revenue concentration: per-customer
    * revenue bucketed into FIXED bands (never ntile — no global sort),
    * cumulative population/revenue shares over the bands-sized window.
    * All cumulative sums are exact (BIGINT counts, DECIMAL revenue);
    * the two share divisions round once per band.
    */
  def qLorenz(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = tbl(s, dir, "orders")
      .select(col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("o_custkey").agg(sum(col("p")).as("rev"))
      .select(expr("CAST(floor(rev / 100000) AS BIGINT)").as("band"),
        col("rev"))
    val perBand = per.groupBy("band")
      .agg(count(lit(1)).as("n_cust"), sum(col("rev")).as("brev"))
    val tot = perBand.agg(sum(col("n_cust")).as("tn"),
      sum(col("brev")).as("tr"))
    val w = Window.orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBand.crossJoin(broadcast(tot))
      .withColumn("cum_n", sum(col("n_cust")).over(w))
      .withColumn("cum_r", sum(col("brev")).over(w))
      .select(col("band"), col("n_cust"),
        round(col("cum_n").cast("double") / col("tn").cast("double"), 6)
          .as("cum_pop_share"),
        round(col("cum_r").cast("double") / col("tr").cast("double"), 6)
          .as("cum_rev_share"))
      .orderBy("band")
  }

  /** Top user journeys (clickstream path mining): 30-min-gap
    * sessionization (the events_sessions kernel), each session's
    * event-type sequence assembled DETERMINISTICALLY — collect_list of
    * (ts, id, type) structs sorted by their total lexicographic order,
    * never a bare ordered-window collect whose arrival order leaks in —
    * then the top-20 paths by frequency. The path table is
    * sessions-sized; nothing global until the final bounded top-k.
    */
  def qSessionPath(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = withTsUs(tbl(s, dir, "events"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    sess.groupBy("user_id", "session_id")
      .agg(concat_ws(">", expr(
        """transform(
             array_sort(collect_list(struct(ts_us, event_id,
               event_type))),
             x -> x.event_type)""")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  /** Weighted median price per return flag (weight = quantity), found
    * WITHOUT any division: the median is the smallest value whose
    * doubled cumulative weight reaches the total — exact DECIMAL
    * comparisons end to end, over distinct cent values per group
    * (bounded domain, partitioned window). The robust price statistic
    * when line sizes vary by orders of magnitude.
    */
  def qWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    // r17 (VERDICT #4): the per-flag cumulative-weight window ran
    // 3-way parallel only (one task per l_returnflag) over the
    // distinct-cents domain — the q_spearman single-partition class
    // (guide §2.5). Rebuilt on the bucketed prefix-sum recipe, with
    // the r16 failure mode fixed: the per-flag TOTAL rides the same
    // (lo, hi) broadcast aggregate instead of a separate third
    // consumer of the (flag, v) subtree, so the carry chain adds only
    // the bounded (3 × nBk)-row carry window to the original plan.
    // cw is an exact DECIMAL sum either way (carry + within-bucket
    // prefix == global prefix; bucket id monotone in v), so the
    // doubled-cumulative-weight comparison is bit-identical. v is
    // non-null by construction (round() of a non-nullable column).
    val perV = tbl(s, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("v"),
        col("l_quantity").cast("decimal(12,2)").as("q"))
      .groupBy("l_returnflag", "v").agg(sum(col("q")).as("w"))
    val nBk = s.sparkContext.defaultParallelism * 32
    val mm = perV.groupBy("l_returnflag")
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        sum(col("w")).as("tw"))
    val bucketed = perV.join(broadcast(mm), "l_returnflag")
      .withColumn("bk", when(col("hi") <= col("lo"), lit(0))
        .otherwise(least(floor(
          (col("v").cast("double") - col("lo").cast("double"))
            * lit(nBk.toDouble)
            / (col("hi").cast("double") - col("lo").cast("double")))
          .cast("int"), lit(nBk - 1))))
      .select(col("l_returnflag"), col("v"), col("w"), col("tw"),
        col("bk"))
    val carry = bucketed.groupBy("l_returnflag", "bk")
      .agg(sum(col("w")).as("bc"))
      .withColumn("carry", sum(col("bc")).over(Window
        .partitionBy("l_returnflag").orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("l_returnflag"), col("bk"), col("carry"))
    val wIn = Window.partitionBy("l_returnflag", "bk").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(carry), Seq("l_returnflag", "bk"))
      .withColumn("cw",
        coalesce(col("carry"), lit(0)) + sum(col("w")).over(wIn))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy("l_returnflag")
      .agg(min(col("v")).as("med_cents"))
      .select(col("l_returnflag"),
        round(col("med_cents").cast("double") / 100.0, 2)
          .as("weighted_median_price"))
      .orderBy("l_returnflag")
  }

  /** Laspeyres price index by ship year (base 1995): the base year's
    * quantities price each year's basket, so the index isolates price
    * movement from volume shifts. Per-part average prices are rounded
    * ONCE to DECIMAL(18,6) (the only division before the end), basket
    * products and sums stay exact DECIMAL, and the part-keyed join is
    * the only shuffle beyond the two keyed aggregates.
    */
  def qPriceIndex(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
      .select(year(col("l_shipdate")).cast("long").as("yr"),
        col("l_partkey"),
        col("l_extendedprice").cast("decimal(18,2)").as("ep"),
        col("l_quantity").cast("decimal(12,2)").as("q"))
    def perPart(df: DataFrame) = df.groupBy("yr", "l_partkey")
      .agg(expr(
        """CAST(round(CAST(sum(ep) AS DOUBLE) / CAST(sum(q) AS DOUBLE),
             6) AS DECIMAL(18,6))""").as("avgp"),
        sum(col("q")).as("qty"))
    // r17 (guide §2.4/§5, VERDICT item 8): the base-year (1995) prices
    // used to come from a FILTERED COPY of the same aggregate joined
    // back on l_partkey — and because the yr=1995 filter pushes below
    // the copy's aggregate, the two subtrees differ and exchange reuse
    // never fires: the plan scanned and aggregated lineitem TWICE
    // (plans/r17/q_price_index_before.txt, ops (1)-(6) vs (8)-(13)).
    // An eager localCheckpoint of the (yr, part) aggregate fences the
    // common subtree so both consumers read the materialized rows (one
    // lineitem scan + one aggregate total), and its accurate size
    // stats keep the base side broadcasting (the r16 eager-vs-lazy
    // rule: state feeding a join that should broadcast stays eager).
    // (A window-over-l_partkey variant that also removes the join was
    // measured SLOWER at sf0.1 — |parts| tiny window partitions cost
    // more than the broadcast join.)
    val all = perPart(li).localCheckpoint(true)
    val base = all.filter(col("yr") === 1995L)
      .select(col("l_partkey"), col("avgp").as("pb"),
        col("qty").as("qb"))
    all.join(base, "l_partkey")
      .groupBy("yr")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("avgp") * col("qb")).as("num"),
        sum(col("pb") * col("qb")).as("den"))
      .select(col("yr"), col("n_parts"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("laspeyres_index"))
      .orderBy("yr")
  }

  /** Per-group (sliced) ROC AUC — the fairness/segment readout a single
    * global AUC hides: the q_roc_auc midrank machinery with every
    * window PARTITIONED by the slice key, so unlike the global variant
    * nothing runs unpartitioned at all. Slices where either class is
    * empty are excluded on both engines (their AUC is undefined).
    */
  def qGroupAuc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = tbl(s, dir, "documents")
      .select(col("source"), col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("source", "score")
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("p"))
    val w = Window.partitionBy("source").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perScore.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("midrank", (col("cum") - col("cnt")).cast("double")
        + (col("cnt").cast("double") + 1.0) / 2.0)
      .groupBy("source")
      .agg(sum(col("p")).as("np"),
        sum(col("cnt") - col("p")).as("nn"),
        sum(col("p").cast("double") * col("midrank")).as("rsum"))
      .filter(col("np") > 0 && col("nn") > 0)
      .select(col("source"), col("np").as("n_pos"),
        col("nn").as("n_neg"),
        round((col("rsum") - col("np").cast("double")
            * (col("np").cast("double") + 1.0) / 2.0)
          / (col("np").cast("double") * col("nn").cast("double")), 6)
          .as("auc"))
      .orderBy("source")
  }

  /** Gains table / decile lift: score bands ranked high→low with
    * cumulative capture rate and lift vs the global positive rate —
    * how every ranking-model deployment is judged before a threshold
    * is picked. Fixed integer score bands (never ntile), exact integer
    * cumulative counts over the bands-sized window, two divisions per
    * row at the end.
    */
  def qGainsTable(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perBand = tbl(s, dir, "documents")
      .select(expr("least(CAST(n_chars AS BIGINT) DIV 200, 9)")
        .as("band"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
    val tot = perBand.agg(sum(col("n")).as("tn"), sum(col("p")).as("tp"))
    val w = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBand
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_p", sum(col("p")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("band"), col("n"), col("p"), col("cum_n"),
        col("cum_p"),
        round(col("cum_p").cast("double") / col("tp").cast("double"), 6)
          .as("capture"),
        round((col("cum_p").cast("double") / col("cum_n").cast("double"))
          / (col("tp").cast("double") / col("tn").cast("double")), 6)
          .as("lift"))
      .orderBy(col("band").desc)
  }

  /** Pairwise Pearson correlation matrix over the four numeric
    * lineitem measures from ONE exact-DECIMAL moment aggregate (the
    * q_linreg recipe at matrix width): a single map-combinable pass
    * computes every Σx, Σx², Σxy; the six correlations are rounded
    * double formulas over those exact sums — the EDA screen before
    * any feature goes into a model.
    */
  def qCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val m = tbl(s, dir, "lineitem")
      .select(col("l_quantity").cast("decimal(12,2)").as("a"),
        col("l_extendedprice").cast("decimal(18,2)").as("b"),
        col("l_discount").cast("decimal(4,2)").as("c"),
        col("l_tax").cast("decimal(4,2)").as("d"))
      .agg(count(lit(1)).as("n"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("c")).as("sc"), sum(col("d")).as("sd"),
        sum(col("a") * col("a")).as("saa"),
        sum(col("b") * col("b")).as("sbb"),
        sum(col("c") * col("c")).as("scc"),
        sum(col("d") * col("d")).as("sdd"),
        sum(col("a") * col("b")).as("sab"),
        sum(col("a") * col("c")).as("sac"),
        sum(col("a") * col("d")).as("sad"),
        sum(col("b") * col("c")).as("sbc"),
        sum(col("b") * col("d")).as("sbd"),
        sum(col("c") * col("d")).as("scd"))
    def corr(x: String, y: String, sx: String, sy: String,
        sxx: String, syy: String, sxy: String) =
      round(expr(
        s"""(CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE)
              - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)
                - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST($syy AS DOUBLE)
                - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE)))"""), 6)
        .as(s"corr_${x}_$y")
    m.select(col("n"),
      corr("qty", "price", "sa", "sb", "saa", "sbb", "sab"),
      corr("qty", "discount", "sa", "sc", "saa", "scc", "sac"),
      corr("qty", "tax", "sa", "sd", "saa", "sdd", "sad"),
      corr("price", "discount", "sb", "sc", "sbb", "scc", "sbc"),
      corr("price", "tax", "sb", "sd", "sbb", "sdd", "sbd"),
      corr("discount", "tax", "sc", "sd", "scc", "sdd", "scd"))
  }

  /** Association rules (directed a→b) with support, confidence, and
    * lift — the q_item_cooccur pair table read as RULES: both
    * directions of every pair, a support floor, confidence = n_ab/c_a
    * against the broadcast antecedent prior. Top-25 by rounded
    * confidence with full tie-break.
    */
  def qBasketRules(s: SparkSession, dir: String): DataFrame = {
    // (r16: fencing ob — lazy checkpoint AND persist variants — was
    // tried and REVERTED; AQE exchange reuse already dedups the distinct
    // across the four consumers and both fences measured 1.2–1.5×
    // slower)
    val ob = tbl(s, dir, "lineitem")
      .join(tbl(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey")
      .select(col("l_orderkey"), col("p_brand")).distinct()
    val pairs = ob.as("a").join(ob.as("b"), "l_orderkey")
      .filter(col("a.p_brand") =!= col("b.p_brand"))
      .select(col("a.p_brand").as("antecedent"),
        col("b.p_brand").as("consequent"))
      .groupBy("antecedent", "consequent").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 20)
    val brandCnt = ob.groupBy("p_brand").agg(count(lit(1)).as("c"))
    val tot = ob.agg(countDistinct(col("l_orderkey")).as("n_orders"))
    pairs
      .join(broadcast(brandCnt.select(col("p_brand").as("antecedent"),
        col("c").as("c_a"))), "antecedent")
      .join(broadcast(brandCnt.select(col("p_brand").as("consequent"),
        col("c").as("c_b"))), "consequent")
      .crossJoin(broadcast(tot))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        round(col("n_ab").cast("double") / col("c_a").cast("double"), 6)
          .as("confidence"),
        round(col("n_ab").cast("double") * col("n_orders").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double")), 6)
          .as("lift"))
      .orderBy(col("confidence").desc, col("antecedent"),
        col("consequent"))
      .limit(25)
  }

  /** Per-group linear TREND of daily event-type share: is each event
    * type's traffic share rising or falling? Daily shares are rounded
    * once to 9 dp DECIMAL (so the moment sums stay exact), then the
    * q_linreg closed form runs per group over (day-index, share) —
    * grouped trend detection without a single unpartitioned operation.
    */
  def qTrendByGroup(s: SparkSession, dir: String): DataFrame = {
    val daily = withTsUs(tbl(s, dir, "events"))
      .select(expr("ts_us DIV 86400000000").as("day"), col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("n"))
    val dayTot = daily.groupBy("day").agg(sum(col("n")).as("dn"))
    val shares = daily.join(dayTot, "day")
      .select(col("event_type"),
        col("day").cast("decimal(12,0)").as("x"),
        expr("""CAST(round(CAST(n AS DOUBLE) / CAST(dn AS DOUBLE), 9)
           AS DECIMAL(12,9))""").as("y"))
    shares.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_days"),
        round(expr(
          """CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE)"""), 6)
          .as("mean_share"),
        round(expr(
          """(CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""), 9)
          .as("share_slope_per_day"))
      .orderBy("event_type")
  }

  /** Bootstrap confidence interval for the mean by DETERMINISTIC
    * hash-subsampling: replicate b includes a row iff
    * fnv(id:b) % 2 = 0 (the native codegen'd hash, replayed in HUGEINT
    * by the oracle) — 200 half-samples whose means bracket the point
    * estimate; the CI is the 2.5/97.5 discrete percentile of replicate
    * means. No RNG state anywhere: the resampling is a pure function
    * of the data, so a re-run — or another engine — lands on the SAME
    * interval bit for bit. The 200× explode feeds a 200-group
    * map-side-combinable aggregate: shuffle volume is groups×
    * partitions, not rows×200.
    */
  def qBootstrapCi(s: SparkSession, dir: String): DataFrame = {
    graft.functions.FnvHash64.register(s)
    graft.functions.FnvHash64Cont.register(s)
    val base = tbl(s, dir, "events")
      .select(col("event_id"), col("value").cast("decimal(18,6)").as("v"))
    // fanout (r16): the ×200 explode+hash below amplifies a single-row-
    // group scan into 20M hashed rows on ONE task without it
    //
    // prefix-state fold (r16): fnv("id:" ++ b) == fnvCont(fnv("id:"), b)
    // by the FNV-1a left-fold algebra, so hash the per-event "id:"
    // prefix ONCE before the ×200 explode and continue the fold over
    // the 1–3-char replicate label per exploded row — the
    // per-exploded-row work drops from (long→string cast + concat +
    // ~10-char hash + String alloc) to a ≤3-code-unit in-place fold.
    // Same hash values bit for bit; the oracle's HUGEINT replay is
    // untouched.
    //
    // r17 (VERDICT #7): the remaining per-exploded-row int→string CAST
    // is gone too — posexplode a TRUE literal array of the 200
    // replicate labels (typedlit builds a foldable ArrayType Literal;
    // the r16 transform(sequence(...)) attempt was slower only because
    // lambda functions are not foldable and the array was rebuilt per
    // event row). pos IS the replicate id, so grouping is unchanged.
    fanout(base)
      .withColumn("hp", expr(
        "graft_fnv64(concat(CAST(event_id AS STRING), ':'))"))
      .select(col("v"), col("hp"),
        posexplode(typedlit((0 until 200).map(_.toString)))
          .as(Seq("b", "bl")))
      .filter(expr("graft_fnv64_cont(hp, bl) % 2 = 0"))
      .groupBy("b")
      .agg((sum(col("v")).cast("double") / count(lit(1))).as("mean_b"))
      .createOrReplaceTempView("boot_means_v")
    base.agg((sum(col("v")).cast("double") / count(lit(1)))
        .as("point_mean"))
      .createOrReplaceTempView("boot_point_v")
    s.sql(
      """SELECT COUNT(*) AS n_reps, round(point_mean, 6) AS point_mean,
           round(CAST(percentile_disc(0.025)
             WITHIN GROUP (ORDER BY mean_b) AS DOUBLE), 6) AS ci_lo,
           round(CAST(percentile_disc(0.975)
             WITHIN GROUP (ORDER BY mean_b) AS DOUBLE), 6) AS ci_hi
         FROM boot_means_v CROSS JOIN boot_point_v
         GROUP BY point_mean""")
  }

  /** Language-ID confusion matrix: the existing n-gram-heuristic
    * classifier ([[graft.ops.TextAnalysis.langId]]) scored against the
    * fixture's ground-truth labels — (actual, predicted, n) cells.
    * Closes the loop on the lang-id operator: not just "runs", but
    * "how wrong, where" (zh has no stopword list, so its row shows the
    * classifier's und/misfire behavior honestly).
    */
  def qLangConfusion(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("lang").as("actual_lang"),
        graft.ops.TextAnalysis.langId(col("text")).as("pred_lang"))
      .groupBy("actual_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("actual_lang", "pred_lang")

  /** Corpus-driven stopword discovery + mass profile: the global
    * top-20 tokens (a deterministic tie-broken top-k) are the corpus's
    * own stopwords; per source the fraction of token mass they carry is
    * the boilerplate/formulaic-text signal. Exact integer token sums
    * per source (never avg-of-ratios), top-20 rides a broadcast
    * left-semi flag.
    */
  def qStopwordDiscovery(s: SparkSession, dir: String): DataFrame = {
    val toks = tbl(s, dir, "documents")
      .select(col("source"), explode(expr(tokensSql)).as("w"))
    val top20 = toks.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(20)
      .select(col("w"), lit(1L).as("is_stop"))
    toks.join(broadcast(top20), Seq("w"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("is_stop"), lit(0L))).as("n_stop"))
      .select(col("source"), col("n_tokens"), col("n_stop"),
        round(col("n_stop").cast("double")
          / col("n_tokens").cast("double"), 6).as("stop_mass"))
      .orderBy("source")
  }

  /** Zipf's-law fit over the token frequency distribution: slope of
    * ln(freq) on ln(rank) — a natural corpus sits near −1; a pile of
    * boilerplate or template spam bends the curve. Rank is a
    * deterministic row_number over the VOCAB-sized frequency table
    * (tie-broken by token); both logs are rounded to 9 dp DECIMAL
    * before the exact moment sums (the repo libm contract), and the
    * closed-form slope/R² are the q_linreg formulas.
    */
  def qZipfFit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = tbl(s, dir, "documents")
      .select(explode(expr(tokensSql)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val pts = freq
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("w"))))
      .select(
        expr("""CAST(round(ln(CAST(rank AS DOUBLE)), 9)
           AS DECIMAL(18,9))""").as("x"),
        expr("""CAST(round(ln(CAST(n AS DOUBLE)), 9)
           AS DECIMAL(18,9))""").as("y"))
    pts.agg(count(lit(1)).as("vocab"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("vocab"),
        round(expr(
          """(CAST(vocab AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(vocab AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""), 6)
          .as("zipf_slope"),
        round(expr(
          """((CAST(vocab AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(vocab AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(vocab AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(vocab AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""), 6)
          .as("r2"))
  }

  /** Heaps'-law fit: vocabulary growth V(N) ≈ K·N^β along the doc-id
    * order — the dedup/diversity health curve (β collapsing toward 0
    * means new data stopped bringing new types). New-type counts come
    * from each token's FIRST document (a keyed MIN, no quadratic
    * rescan). The cumulative (N, V) pairs use the SAME two-level
    * distributed prefix sum as q_concurrency (r15 weak-item fix): the
    * doc-keyed running sums are a BUCKET-partitioned window (doc_id DIV
    * 256 — order-preserving across buckets since doc ids are the
    * ordering key), and the cross-bucket carry-in is a prefix over the
    * per-bucket nets — a buckets-sized aggregate (docs/256 rows), never
    * the docs table, so nothing corpus-sized funnels through one
    * reducer at 100×. β is the same 9dp-ln DECIMAL moment recipe.
    */
  def qHeapsLaw(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r16 optimization: perDoc and newTypes each re-ran the tokenize+
    // explode subtree (the corpus-sized pass) — both derive from the
    // (doc_id, w, k) TYPE-count aggregate, which is strictly smaller
    // than the token stream. One tokenize pass, fenced; n_tok = Σk per
    // doc is exactly the old per-doc token count, and min(doc_id) per w
    // over types equals min over instances. Values identical.
    val types = fanout(tbl(s, dir, "documents")
        .select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(expr(tokensSql)).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("k"))
      .localCheckpoint(false)
    val perDoc = types.groupBy("doc_id").agg(sum(col("k")).as("n_tok"))
    val newTypes = types.groupBy("w").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("new_types"))
    val joined = perDoc
      .join(newTypes, Seq("doc_id"), "left")
      .withColumn("nt", coalesce(col("new_types"), lit(0L)))
      .withColumn("bkt", expr("doc_id DIV 256"))
    val wIn = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bktNet = joined.groupBy("bkt")
      .agg(sum(col("n_tok")).as("netN"), sum(col("nt")).as("netV"))
    // carry window input is the buckets-sized AGGREGATE (bounded per
    // the window-audit rule), not the docs table
    val wB = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bktNet
      .withColumn("cn", coalesce(sum(col("netN")).over(wB), lit(0L)))
      .withColumn("cv", coalesce(sum(col("netV")).over(wB), lit(0L)))
      .select("bkt", "cn", "cv")
    val pts = joined
      .withColumn("rn", sum(col("n_tok")).over(wIn))
      .withColumn("rv", sum(col("nt")).over(wIn))
      .join(carry, "bkt")
      .withColumn("bigN", col("rn") + col("cn"))
      .withColumn("v", col("rv") + col("cv"))
      .select(
        expr("""CAST(round(ln(CAST(bigN AS DOUBLE)), 9)
           AS DECIMAL(18,9))""").as("x"),
        expr("""CAST(round(ln(CAST(v AS DOUBLE)), 9)
           AS DECIMAL(18,9))""").as("y"))
    pts.agg(count(lit(1)).as("n_docs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n_docs"),
        round(expr(
          """(CAST(n_docs AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""), 6)
          .as("heaps_beta"))
  }

  /** Dedup ATTRIBUTION: which source pairs share near-duplicate
    * content — the curation readout that turns a pair list into a
    * "stop crawling X, it mirrors Y" decision. Same banded-LSH
    * candidates + exact-Jaccard verify contract as dedup_minhash
    * (est ≥ 0.35 candidates, exact ≥ 0.5 kept), with sources joined
    * back on the id keys and pair counts per unordered source pair.
    */
  def qDedupAttribution(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val pairs = graft.ops.Dedup
      .minHashPairs(docs.select(col("doc_id"), col("text")),
        "doc_id", "text", threshold = 0.35)
      .filter(col("jaccard") >= 0.5)
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.toDF("doc_a", "source_a"), "doc_a")
      .join(src.toDF("doc_b", "source_b"), "doc_b")
      .select(least(col("source_a"), col("source_b")).as("src_x"),
        greatest(col("source_a"), col("source_b")).as("src_y"))
      .groupBy("src_x", "src_y").agg(count(lit(1)).as("n_pairs"))
      .orderBy("src_x", "src_y")
  }

  /** Near-time duplicate events (same user + type within 5 s of the
    * predecessor) — the client-retry/double-fire telemetry audit that
    * exact-key dedup misses because the event ids differ. One
    * partitioned LAG per (user, type); per-type duplicate rates from
    * exact counts.
    */
  def qEventNearDup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_us"), col("event_id"))
    withTsUs(tbl(s, dir, "events"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .select(col("event_type"),
        when(col("prev_us").isNotNull &&
          col("ts_us") - col("prev_us") <= 5000000L, 1L).otherwise(0L)
          .as("is_dup"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("is_dup")).as("n_dups"))
      .select(col("event_type"), col("n"), col("n_dups"),
        // count-ratio readout: rndDet, not round (tie determinism)
        rndDet(col("n_dups").cast("double") / col("n").cast("double"), 6)
          .as("dup_rate"))
      .orderBy("event_type")
  }

  /** Session-level conversion by day: 30-min-gap sessions (the
    * events_sessions kernel) rolled up to per-day session counts,
    * view→purchase conversion rate, and mean session length — the
    * product-health daily all in one sessions-sized pass.
    */
  def qSessionConversion(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = withTsUs(tbl(s, dir, "events"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts_us")).as("start_us"),
        count(lit(1)).as("n_events"),
        max(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("has_view"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("has_purchase"))
    sess
      .select(expr("start_us DIV 86400000000").as("day"),
        col("n_events"), col("has_view"), col("has_purchase"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("has_view") * col("has_purchase")).as("n_converted"),
        // count-ratio readouts: rndDet, not round (tie determinism)
        rndDet(sum(col("n_events")).cast("double")
          / count(lit(1)).cast("double"), 6).as("mean_events"),
        rndDet(sum(col("has_view") * col("has_purchase")).cast("double")
          / count(lit(1)).cast("double"), 6).as("conversion_rate"))
      .orderBy("day")
  }

  /** MAU growth accounting: every month's active users decomposed into
    * new / retained / resurrected, plus the users churned out of the
    * previous month — the four numbers that explain WHY a MAU curve
    * moved. One distinct (user, month) table, one partitioned
    * LAG/LEAD pass per user (integer month arithmetic), a broadcast
    * horizon so nobody "churns" past the end of data, and a month-keyed
    * rollup. Identity checked by construction:
    * active = new + retained + resurrected.
    */
  def qGrowthAccounting(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val am = tbl(s, dir, "events")
      .select(col("user_id"),
        (year(col("ts")) * 12 + month(col("ts"))).cast("long").as("m"))
      .distinct()
    val horizon = am.agg(max(col("m")).as("max_m"))
    val w = Window.partitionBy("user_id").orderBy("m")
    val labeled = am
      .withColumn("prev_m", lag(col("m"), 1).over(w))
      .withColumn("next_m", lead(col("m"), 1).over(w))
      .crossJoin(broadcast(horizon))
      .select(col("m"),
        when(col("prev_m").isNull, 1L).otherwise(0L).as("is_new"),
        when(col("prev_m") === col("m") - 1, 1L).otherwise(0L)
          .as("is_retained"),
        when(col("prev_m").isNotNull && col("prev_m") < col("m") - 1,
          1L).otherwise(0L).as("is_resurrected"),
        // churns OUT OF month m (counted against month m+1)
        when((col("next_m").isNull && col("m") < col("max_m")) ||
          col("next_m") > col("m") + 1, 1L).otherwise(0L)
          .as("churns_after"))
    val active = labeled.groupBy("m")
      .agg(count(lit(1)).as("n_active"),
        sum(col("is_new")).as("n_new"),
        sum(col("is_retained")).as("n_retained"),
        sum(col("is_resurrected")).as("n_resurrected"))
    val churn = labeled.groupBy((col("m") + 1).as("m"))
      .agg(sum(col("churns_after")).as("n_churned"))
    active.join(churn, Seq("m"), "left")
      .select(col("m"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy("m")
  }

  /** Dataset card: the one-row datasheet a corpus release ships with —
    * document/source/language counts, char and token mass, vocabulary,
    * and the exact-duplicate rate — composed from three independent
    * corpus aggregates joined as broadcast 1-row sides. Every number
    * is an exact integer except the two rounded means.
    */
  def qDatasetCard(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
    val basic = d.agg(count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("n_chars")).as("total_chars"))
    val toks = d.select(explode(expr(tokensSql)).as("w"))
      .agg(count(lit(1)).as("total_tokens"),
        countDistinct(col("w")).as("vocab"))
    val dups = d.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1).as("n_dup_docs"))
    basic.crossJoin(broadcast(toks)).crossJoin(broadcast(dups))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("total_chars"),
        round(col("total_chars").cast("double")
          / col("n_docs").cast("double"), 6).as("mean_chars"),
        col("total_tokens"), col("vocab"),
        round(col("total_tokens").cast("double")
          / col("n_docs").cast("double"), 6).as("mean_tokens"),
        col("n_dup_docs"))
  }

  /** Tukey IQR fences per event type — the third member of the robust
    * outlier trio next to q_zscore and q_mad_outliers: exact discrete
    * quartiles (the engine-agnostic percentile_disc contract), 1.5×IQR
    * fences, and the count outside each fence. One scan + a groups-
    * sized cutoff side the planner broadcasts.
    */
  def qIqrFence(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "events").createOrReplaceTempView("events_iqr_v")
    s.sql(
      """WITH cut AS (SELECT event_type,
             percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS q1,
             percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS q3
           FROM events_iqr_v GROUP BY event_type)
         SELECT e.event_type, COUNT(*) AS n, c.q1, c.q3,
           round(c.q1 - 1.5 * (c.q3 - c.q1), 6) AS fence_lo,
           round(c.q3 + 1.5 * (c.q3 - c.q1), 6) AS fence_hi,
           CAST(SUM(CASE WHEN e.value < c.q1 - 1.5 * (c.q3 - c.q1)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN e.value > c.q3 + 1.5 * (c.q3 - c.q1)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_high
         FROM events_iqr_v e JOIN cut c ON e.event_type = c.event_type
         GROUP BY e.event_type, c.q1, c.q3
         ORDER BY e.event_type""")
  }

  /** Effective sample size of a weighted corpus slice:
    * ESS = (Σw)²/Σw² — how many "real" examples a weighted mixture is
    * worth (ESS/n collapsing toward 0 means a few heavy documents
    * dominate the mixture). Exact DECIMAL weight moments per source,
    * two rounded divisions.
    */
  def qEss(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("source"),
        col("n_chars").cast("decimal(12,0)").as("w"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"),
        sum(col("w") * col("w")).as("sww"))
      .select(col("source"), col("n"),
        round(expr(
          """(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
             / CAST(sww AS DOUBLE)"""), 6).as("ess"),
        round(expr(
          """(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
             / CAST(sww AS DOUBLE) / CAST(n AS DOUBLE)"""), 6)
          .as("ess_ratio"))
      .orderBy("source")

  /** The MinHash-LSH S-curve as an executable table:
    * P(candidate | jaccard) = 1 − (1 − j^r)^b for the engine's
    * b=16 × r=4 banding — the design artifact behind every dedup
    * threshold in [[graft.ops.Dedup]], materialized so a curation run
    * can READ its own recall guarantees instead of trusting a comment.
    * Pure math (generated rows, no input scan).
    */
  def qLshCurve(s: SparkSession, dir: String): DataFrame =
    s.range(1, 10)
      .select((col("id").cast("double") / 10.0).as("j"))
      .select(round(col("j"), 1).as("j"),
        round(lit(1.0)
          - pow(lit(1.0) - pow(col("j"), lit(4.0)), lit(16.0)), 6)
          .as("p_candidate"))
      .orderBy("j")

  /** 30-day ROLLING correlation between daily view and purchase
    * volumes — does engagement still track conversion, per day? Every
    * moment in the window is an INTEGER sum (counts and count
    * products), so the rolling moments are exact under any
    * partitioning and the correlation is one rounded formula per day;
    * windows run over the days-sized series.
    */
  def qRollingCorr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = withTsUs(tbl(s, dir, "events"))
      .select(expr("ts_us DIV 86400000000").as("day"),
        col("event_type"))
      .groupBy("day")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("vc"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pc"))
    val w = Window.orderBy("day").rowsBetween(-29, 0)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("vc")).over(w))
      .withColumn("sy", sum(col("pc")).over(w))
      .withColumn("sxy", sum(col("vc") * col("pc")).over(w))
      .withColumn("sxx", sum(col("vc") * col("vc")).over(w))
      .withColumn("syy", sum(col("pc") * col("pc")).over(w))
      .filter(col("n") === 30)
      .select(col("day"), round(expr(
        """(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"""), 6)
        .as("corr30"))
      .orderBy("day")
  }

  /** Leakage-safe POINT-IN-TIME feature snapshot: for every purchase,
    * the user's feature vector computed STRICTLY BEFORE the event —
    * prior view count, prior spend, last-view recency — via
    * partitioned windows whose frame ends at 1 PRECEDING (the frame
    * bound IS the leakage guard; an at-current-row frame would leak
    * the label event into its own features). The feature-store
    * training-snapshot shape, all per-user partitioned.
    */
  def qPitFeatures(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withTsUs(tbl(s, dir, "events"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us"),
        col("value").cast("decimal(18,6)").as("v"))
      .withColumn("prior_views",
        coalesce(sum(when(col("event_type") === "view", 1L)
          .otherwise(0L)).over(w), lit(0L)))
      .withColumn("prior_spend",
        coalesce(sum(when(col("event_type") === "purchase", col("v")))
          .over(w), lit(0).cast("decimal(18,6)")))
      .withColumn("last_view_us",
        max(when(col("event_type") === "view", col("ts_us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("prior_views"),
        col("prior_spend").cast("double").as("prior_spend"),
        expr("(ts_us - last_view_us) DIV 1000000")
          .as("view_recency_s"))
      .orderBy("event_id")
  }

  /** Horizon LABEL generation: for every non-purchase event, does the
    * user purchase within the next 7 days? The supervised-training
    * label every churn/propensity model needs, built leakage-free from
    * a REVERSED cumulative min (next purchase time at each event) —
    * one partitioned window, no self-join, no per-row subquery.
    * Rolled up per event type so the gate output is the label-rate
    * profile.
    */
  def qHorizonLabel(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wDesc = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    withTsUs(tbl(s, dir, "events"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us"))
      .withColumn("next_purchase_us",
        min(when(col("event_type") === "purchase", col("ts_us")))
          .over(wDesc))
      .filter(col("event_type") =!= "purchase")
      .select(col("event_type"),
        when(col("next_purchase_us").isNotNull &&
          col("next_purchase_us") - col("ts_us") <= 604800000000L, 1L)
          .otherwise(0L).as("label"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("label")).as("n_pos"))
      .select(col("event_type"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"))
      .orderBy("event_type")
  }

  /** Differential-privacy-style noisy counts via the inverse-CDF
    * Laplace mechanism over the REPRODUCIBLE hash-uniform (the
    * splitAssign contract — no RNG state, so the "noise" is a pure
    * function of the key and replayable by the oracle; a production
    * deployment would swap the hash for a sealed RNG, keeping this
    * exact plumbing). Clamped ln argument so a u rounded to exactly 0
    * cannot produce −∞; per-group counts stay exact, the noise is one
    * rounded formula.
    */
  def qDpCounts(s: SparkSession, dir: String): DataFrame = {
    val counts = tbl(s, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"))
    graft.ops.Sampling.splitAssign(counts, "source", seed = 7L,
        trainFrac = 0.5, valFrac = 0.25)
      .select(col("source"), col("n"),
        round(expr(
          """-1.0 * sign(split_u - 0.5)
             * ln(greatest(0.000001,
                 1.0 - 2.0 * abs(split_u - 0.5)))"""), 6).as("noise"))
      .select(col("source"), col("n"), col("noise"),
        round(col("n").cast("double") + col("noise"), 6).as("noisy_n"))
      .orderBy("source")
  }

  /** Sample-ratio-mismatch check — the first A/B sanity gate: a 1-dof
    * chi-square of the two arm counts against the designed 50/50
    * split, with the 5% alarm threshold. Arms are the q_ab_lift hash
    * assignment; everything is exact integers until the single rounded
    * statistic.
    */
  def qAbSrm(s: SparkSession, dir: String): DataFrame = {
    val perUser = tbl(s, dir, "events").select("user_id").distinct()
    graft.ops.Sampling.splitAssign(perUser, "user_id", seed = 11L,
        trainFrac = 0.5, valFrac = 0.25)
      .withColumn("in_a", col("split_u") < 0.5)
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        round(expr(
          """(CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
             * (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
             / (CAST(n_a + n_b AS DOUBLE) / 2.0)
           + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
             * (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
             / (CAST(n_a + n_b AS DOUBLE) / 2.0)"""), 6)
          .as("srm_chi2"))
      .withColumn("srm_alarm", col("srm_chi2") > 3.841)
  }

  /** Month-over-month revenue DECOMPOSITION: ΔR split into the volume
    * term ΔN·AOV₀, the value term N₀·ΔAOV, and the interaction
    * ΔN·ΔAOV — the metric-tree arithmetic that turns "revenue moved"
    * into "because orders moved / basket moved". Months-sized LAG
    * series; AOV is the single rounded division, every term a rounded
    * double formula over exact sums, and the three terms sum back to
    * ΔR by construction.
    */
  def qRevenueDecomposition(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = tbl(s, dir, "orders")
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("m"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("m")
      .agg(count(lit(1)).as("n"), sum(col("p")).as("rev"))
    val w = Window.orderBy("m")
    monthly
      .withColumn("n0", lag(col("n"), 1).over(w))
      .withColumn("rev0", lag(col("rev"), 1).over(w))
      .filter(col("n0").isNotNull)
      .select(col("m"), col("n"), col("n0"),
        expr("round(CAST(rev AS DOUBLE) / CAST(n AS DOUBLE), 6)")
          .as("aov"),
        expr("round(CAST(rev0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6)")
          .as("aov0"),
        round(expr("CAST(rev AS DOUBLE) - CAST(rev0 AS DOUBLE)"), 2)
          .as("delta_rev"))
      .select(col("m"), col("delta_rev"),
        // + 0.0 normalizes IEEE negative zero (round can emit -0.0 and
        // the engines disagree on which; adding +0.0 maps both to 0.0)
        (round((col("n") - col("n0")).cast("double") * col("aov0"), 6)
          + lit(0.0)).as("volume_term"),
        (round(col("n0").cast("double") * (col("aov") - col("aov0")), 6)
          + lit(0.0)).as("value_term"),
        (round((col("n") - col("n0")).cast("double")
          * (col("aov") - col("aov0")), 6) + lit(0.0))
          .as("interaction_term"))
      .orderBy("m")
  }

  /** Wald-Wolfowitz RUNS TEST on the daily revenue direction sequence
    * — is the up/down pattern random, trending, or oscillating? Signs
    * come from exact DECIMAL day-over-day differences (zero-change
    * days dropped, stated), runs from a LAG sign-change sum over the
    * days-sized series, and the normal-approximation z is one rounded
    * formula over exact counts.
    */
  def qRunsTest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day")
    val signs = dailyRevenue(s, dir)
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .filter(col("prev").isNotNull && col("rev") =!= col("prev"))
      .select(col("day"),
        when(col("rev") > col("prev"), 1L).otherwise(-1L).as("sgn"))
    val runs = signs
      .withColumn("prev_sgn", lag(col("sgn"), 1).over(w))
      .select(col("sgn"),
        when(col("prev_sgn").isNull ||
          col("sgn") =!= col("prev_sgn"), 1L).otherwise(0L)
          .as("new_run"))
      .agg(sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("sgn") === -1L, 1L).otherwise(0L)).as("n_down"),
        sum(col("new_run")).as("n_runs"))
    runs.select(col("n_up"), col("n_down"), col("n_runs"),
      round(expr(
        """(CAST(n_runs AS DOUBLE)
             - (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
               / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)) + 1.0))
           / sqrt(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
             * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
               - CAST(n_up AS DOUBLE) - CAST(n_down AS DOUBLE))
             / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
               * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
               * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)
                 - 1.0)))"""), 6).as("z_stat"))
  }

  /** Novelty rate: per month, the fraction of (customer, brand)
    * purchases that are the customer's FIRST of that brand — the
    * explore-vs-repeat behavioral split. First-month per (customer,
    * brand) is one keyed MIN joined back on its own key; monthly rates
    * are exact-count divisions. A falling novelty curve is assortment
    * fatigue; an all-1.0 curve means no repeat behavior to model.
    */
  def qNoveltyRate(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
      .join(tbl(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("m")), "l_orderkey")
      .join(tbl(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey")
      .select(col("o_custkey"), col("p_brand"), col("m"))
    // r16 optimization: first_m = MIN(m) per (customer, brand) was a
    // second aggregate over cb joined back onto cb — one extra pass and
    // a join. The same value is an unbounded-frame window MIN over the
    // key cb is already shuffled on: one exchange, one pass, no join.
    val wFirst = Window.partitionBy("o_custkey", "p_brand")
    val cb = li.groupBy("o_custkey", "p_brand", "m")
      .agg(count(lit(1)).as("n_lines"))
    cb.withColumn("first_m", min(col("m")).over(wFirst))
      .select(col("m"),
        when(col("m") === col("first_m"), 1L).otherwise(0L)
          .as("is_novel"))
      .groupBy("m")
      .agg(count(lit(1)).as("n_cust_brand"),
        sum(col("is_novel")).as("n_novel"))
      .select(col("m"), col("n_cust_brand"), col("n_novel"),
        // count-ratio readout: rndDet, not round (tie determinism)
        rndDet(col("n_novel").cast("double")
          / col("n_cust_brand").cast("double"), 6).as("novelty_rate"))
      .orderBy("m")
  }

  /** Rolling anomaly detection: days whose revenue sits more than 2σ
    * from the TRAILING-30-day baseline — the frame excludes the
    * current row (1 PRECEDING), so a spike cannot inflate its own
    * baseline, the classic self-masking mistake. Window moments are
    * exact DECIMAL sums over the days-sized series; mean/std/z are
    * rounded double formulas. Emits only the anomalous days.
    */
  def qRollingAnomaly(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day").rowsBetween(-30, -1)
    dailyRevenue(s, dir)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("rev")).over(w))
      .withColumn("sxx", sum(col("rev") * col("rev")).over(w))
      .filter(col("n") === 30)
      .select(col("day"),
        round(col("rev").cast("double"), 2).as("rev"),
        round(expr(
          """(CAST(rev AS DOUBLE) - CAST(sx AS DOUBLE) / 30.0)
             / sqrt((30.0 * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / (30.0 * 29.0))"""), 6).as("z"))
      .filter(abs(col("z")) > 2.0)
      .orderBy("day")
  }

  /** Forecast-baseline evaluation: MASE and MAPE of the seasonal-naive
    * forecast rev(d−7) over the daily series — the floor every real
    * forecasting model must beat, and the first number a forecast
    * review asks for. Absolute errors stay exact DECIMAL; the MAPE
    * terms are per-day ratios rounded to 9 dp and summed as DECIMAL
    * (the repo order-independence contract); MASE is the ratio of two
    * exact error sums, scaled by the naive lag-1 denominator.
    */
  def qForecastBaseline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day")
    dailyRevenue(s, dir)
      .withColumn("lag7", lag(col("rev"), 7).over(w))
      .withColumn("lag1", lag(col("rev"), 1).over(w))
      .filter(col("lag7").isNotNull && col("lag1").isNotNull)
      .select(abs(col("rev") - col("lag7")).as("ae7"),
        abs(col("rev") - col("lag1")).as("ae1"),
        expr(
          """CAST(round(CAST(abs(rev - lag7) AS DOUBLE)
               / CAST(rev AS DOUBLE), 9) AS DECIMAL(18,9))""")
          .as("ape"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("ae7")).as("sae7"), sum(col("ae1")).as("sae1"),
        sum(col("ape")).as("sape"))
      .select(col("n_days"),
        round(expr("CAST(sae7 AS DOUBLE) / CAST(sae1 AS DOUBLE)"), 6)
          .as("mase"),
        round(expr("CAST(sape AS DOUBLE) / CAST(n_days AS DOUBLE)"), 6)
          .as("mape"))
  }

  /** MARKOV REMOVAL-EFFECT ATTRIBUTION — the data-driven upgrade of
    * q_attribution's first/last-touch: user journeys (events ordered
    * by ts, truncated at the first purchase) become a first-order
    * Markov chain over START/touch-types/CONV/DROP; a channel's credit
    * is how much the START→CONV absorption probability falls when
    * every transition into that channel is redirected to DROP. The
    * chain state is exact DECIMAL (probabilities rounded once to 12 dp,
    * then pure decimal algebra through 8 value-iteration steps), so
    * the DuckDB twin's 40 unrolled CTEs reproduce it bit-for-bit.
    * Scale: journeys → transition counts is one keyed shuffle;
    * everything after runs on the ≤(states²) transition table —
    * collected to the driver as a DOCUMENTED BOUNDED COLLECT (≤49
    * rows, state-space-sized, never data-sized — the centroid/MMR-pool
    * contract) and folded in BigDecimal with the same HALF_UP scale-12
    * quantization the SQL twin's decimal casts apply.
    */
  def qMarkovAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = withTsUs(tbl(s, dir, "events"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    // r17 (guide §2.4, VERDICT item 8): the first-purchase position
    // used to be a separate aggregate joined back onto the journey
    // rows, and the terminal rows re-derived it through a distinct +
    // two more joins. The journey window already holds each user's
    // whole partition, so prn rides the SAME exchange as rn (a
    // whole-partition MIN frame), truncation becomes a plain filter,
    // and the terminal rows fall out of one keyed aggregate — three
    // joins and a distinct removed, zero new shuffles (every node
    // stays partitioned by user_id).
    val wAll = Window.partitionBy("user_id")
    val rn = ev.withColumn("rn", row_number().over(w))
      .withColumn("prn", min(when(col("event_type") === "purchase",
        col("rn"))).over(wAll))
    val tou = rn.filter(col("prn").isNull || col("rn") < col("prn"))
    val wt = Window.partitionBy("user_id").orderBy("rn")
    val edges = tou
      .withColumn("f",
        coalesce(lag(col("event_type"), 1).over(wt), lit("START")))
      .select(col("f"), col("event_type").as("t"))
    // terminal row per user: last pre-purchase touch (max_by ignores
    // null keys, so users whose first event IS the purchase yield null
    // → START), CONV iff a purchase exists anywhere in the journey
    val term = rn.groupBy("user_id")
      .agg(expr("""max_by(CASE WHEN prn IS NULL OR rn < prn
               THEN event_type END,
             CASE WHEN prn IS NULL OR rn < prn THEN rn END)""").as("lt"),
        max(col("prn")).as("prn"))
      .select(coalesce(col("lt"), lit("START")).as("f"),
        when(col("prn").isNotNull, lit("CONV")).otherwise(lit("DROP"))
          .as("t"))
    val trans = edges.unionByName(term).groupBy("f", "t")
      .agg(count(lit(1)).as("cnt"))
    val tot = trans.groupBy("f").agg(sum(col("cnt")).as("tot"))
    val probs = trans.join(tot, "f")
      .select(col("f"), col("t"),
        expr("""CAST(round(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE), 12)
          AS DECIMAL(14,12))""").as("p"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        BigDecimal(r.getDecimal(2)))
      .toMap
    val transientStates = Seq("START", "view", "click", "signup", "error")
    val channels = Seq("click", "error", "signup", "view")
    def absorption(removed: Option[String]): BigDecimal = {
      // redirect transitions INTO the removed channel to DROP; merged
      // probabilities stay scale-12 exact (sum of scale-12 values)
      val pAdj = probs.toSeq
        .map { case ((f, t), p) =>
          ((f, if (removed.contains(t)) "DROP" else t), p)
        }
        .groupMapReduce(_._1)(_._2)(_ + _)
      var v = (transientStates.map(_ -> BigDecimal(0)) ++
        Seq("CONV" -> BigDecimal(1), "DROP" -> BigDecimal(0))).toMap
      for (_ <- 1 to 8) {
        val next = transientStates.map { s0 =>
          val sum = v.keys.toSeq.sorted
            .map(t => pAdj.getOrElse((s0, t), BigDecimal(0)) * v(t))
            .sum // exact decimal products/sum — order irrelevant
          s0 -> sum.setScale(12, BigDecimal.RoundingMode.HALF_UP)
        }.toMap
        v = next ++ Map("CONV" -> BigDecimal(1), "DROP" -> BigDecimal(0))
      }
      v("START")
    }
    val base = absorption(None)
    val rows = channels.map { ch =>
      val vc = absorption(Some(ch))
      (ch, vc, base - vc)
    }
    val teff = rows.map(_._3).sum
    import s.implicits._
    rows.map { case (ch, vc, eff) =>
      (ch, vc.toDouble, eff.toDouble, eff.toDouble / teff.toDouble)
    }.toDF("channel", "removal_conv", "removal_effect", "share_raw")
      .select(col("channel"), col("removal_conv"), col("removal_effect"),
        round(col("share_raw"), 6).as("share"))
      .orderBy("channel")
  }

  /** DATA-MIXTURE RAKING (iterative proportional fitting): rebalance
    * the lang × source document grid to TARGET marginals (uniform per
    * lang and per source — the "stop the corpus being 45% English"
    * knob every pretraining mixture needs) by alternately scaling rows
    * and columns, 4 full sweeps. The grid is dimension-sized
    * (langs × sources), so after ONE distributed count the fold is a
    * documented bounded collect (the markov/centroid contract); each
    * cell is re-quantized to 6 dp per half-sweep exactly as the DuckDB
    * twin's round+cast does. Output: per cell, the raked weight and
    * the per-document sampling factor weight/count.
    */
  def qMixtureRaking(s: SparkSession, dir: String): DataFrame = {
    val counts = tbl(s, dir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val langs = counts.keys.map(_._1).toSeq.distinct.sorted
    val sources = counts.keys.map(_._2).toSeq.distinct.sorted
    val n = counts.values.sum
    val tRow = n.toDouble / langs.size.toDouble
    val tCol = n.toDouble / sources.size.toDouble
    // DuckDB's round(DOUBLE, 6) rounds the SCALED double (x·10⁶, half
    // away from zero) — not the shortest decimal repr Spark's round()
    // uses; the iterated state must quantize the twin's way, and the
    // result is held as the EXACT decimal k·10⁻⁶ for the marginal sums
    def q6(d: Double): BigDecimal =
      BigDecimal(math.floor(d * 1e6 + 0.5).toLong, 6)
    var w: Map[(String, String), BigDecimal] =
      counts.map { case (k, c) => k -> BigDecimal(c).setScale(6) }
    for (_ <- 1 to 4) {
      val rs = w.toSeq.groupMapReduce(_._1._1)(_._2)(_ + _) // exact sums
      w = w.map { case ((l, src), v) =>
        ((l, src), q6(v.toDouble * (tRow / rs(l).toDouble)))
      }
      val cs = w.toSeq.groupMapReduce(_._1._2)(_._2)(_ + _)
      w = w.map { case ((l, src), v) =>
        ((l, src), q6(v.toDouble * (tCol / cs(src).toDouble)))
      }
    }
    import s.implicits._
    w.toSeq.sortBy(_._1)
      .map { case ((l, src), v) =>
        // per-doc sampling factor in EXACT integer ppm: round(k/cnt)
        // with half-up = (2k + cnt) // (2·cnt) — a 6dp-decimal ÷ small
        // integer lands on structural .5 ties where double round()
        // disagrees between engines; integers cannot
        val k = (v * 1000000).toLongExact
        val cnt = counts((l, src))
        (l, src, v.toDouble, (2 * k + cnt) / (2 * cnt))
      }
      .toDF("lang", "source", "weight_raw", "sample_ppm")
      .select(col("lang"), col("source"),
        round(col("weight_raw"), 6).as("weight"),
        col("sample_ppm"))
      .orderBy("lang", "source")
  }

  /** NEAREST-direction AS-OF join (the third direction after
    * q_asof_join's backward and the native exec's tolerance): each
    * purchase matches the view with the SMALLEST |Δt| within ±1 h for
    * the same user, ties broken toward the EARLIER view — one keyed
    * equi-join with a bounded range predicate (the q_interval_join
    * shape; candidates per probe are time-bounded, never a user's full
    * history), then one min_by per probe.
    */
  def qAsofNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = withTsUs(tbl(s, dir, "events"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts_us").as("vts"))
    val h = 3600L * 1000000L
    p.join(v, p("user_id") === col("vu") &&
        col("vts") >= col("ts_us") - h && col("vts") <= col("ts_us") + h,
        "left_outer")
      .groupBy(col("event_id"), col("user_id"), col("ts_us"))
      // scalar composite key (DuckDB's min_by takes no struct keys):
      // 2·|Δ| + after-flag prefers the earlier view on equidistant ties
      .agg(expr("min_by(vts, abs(vts - ts_us) * 2 + " +
        "CASE WHEN vts > ts_us THEN 1 ELSE 0 END)")
        .as("nearest_view_ts"),
        count(col("vts")).as("n_candidates"))
      .select(col("event_id"),
        col("n_candidates"),
        (col("nearest_view_ts") - col("ts_us")).as("delta_us"))
      .orderBy("event_id")
  }

  /** Repeat-purchase ladder: for k = 1..10, how many customers placed
    * at least k orders, and the k-th-order conversion r_k =
    * N≥k / N≥(k−1) — the retention-economics curve (flat r_k beyond
    * k≈3 is the classic "habit formed" signature). One per-customer
    * count, one 10-row generate joined by an inequality that is
    * k-bounded, never customer×customer.
    */
  def qRepeatLadder(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = tbl(s, dir, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    val ladder = per
      .select(explode(expr(
        "sequence(1, CAST(least(n_orders, 10) AS INT))")).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_ge_k"))
    val w = Window.orderBy("k")
    ladder
      .withColumn("n_prev", lag(col("n_ge_k"), 1).over(w))
      .select(col("k").cast("long").as("k"), col("n_ge_k"),
        round(when(col("n_prev").isNotNull,
          col("n_ge_k").cast("double") / col("n_prev").cast("double"))
          .otherwise(lit(1.0)), 6).as("r_k"))
      .orderBy("k")
  }

  /** Catalog coverage: the fraction of each brand's parts that have
    * EVER been ordered — the dead-stock audit. One distinct ordered-
    * part set left-joined to the catalog as a flag; exact counts per
    * brand.
    */
  def qCatalogCoverage(s: SparkSession, dir: String): DataFrame = {
    val ordered = tbl(s, dir, "lineitem")
      .select(col("l_partkey").as("p_partkey")).distinct()
      .withColumn("is_ordered", lit(1L))
    tbl(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
      .join(ordered, Seq("p_partkey"), "left")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(coalesce(col("is_ordered"), lit(0L))).as("n_ordered"))
      .select(col("p_brand"), col("n_parts"), col("n_ordered"),
        round(col("n_ordered").cast("double")
          / col("n_parts").cast("double"), 6).as("coverage"))
      .orderBy("p_brand")
  }

}
