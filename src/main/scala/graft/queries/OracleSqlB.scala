package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.EngineConfig
import graft.engine.InceptionEngine

/** Oracle-SQL slice B of the DuckDB twin map.
  *
  * Split out of SparkEntry.scala (round 16); entries are verbatim
  * from the original single Map literal.
  */
private[graft] trait SparkEntryOracleB { this: SparkEntry.type =>

  /** Oracle-SQL map slice — concatenated into
    * [[SparkEntry.oracleSql]]; keys are globally unique.
    */
  private[graft] lazy val oracleSqlPartB: Map[String, String] = Map(
    // Wilcoxon signed-rank on paired YoY daily revenue, midrank
    // domain + BIGINT tie correction
    "q_wilcoxon_signed" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         d95 AS (SELECT month(day) AS m, dayofmonth(day) AS d,
             rev AS r95 FROM daily WHERE year(day) = 1995),
         d96 AS (SELECT month(day) AS m, dayofmonth(day) AS d,
             rev AS r96 FROM daily WHERE year(day) = 1996),
         diffs AS (SELECT CAST(r96 AS DECIMAL(19,2))
               - CAST(r95 AS DECIMAL(19,2)) AS diff,
             abs(CAST(r96 AS DECIMAL(19,2))
               - CAST(r95 AS DECIMAL(19,2))) AS ad
           FROM d95 JOIN d96 USING (m, d)
           WHERE r96 <> r95),
         dom AS (SELECT ad, COUNT(*) AS t FROM diffs GROUP BY 1),
         cum AS (SELECT ad, t,
             COALESCE(SUM(t) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb
           FROM dom),
         mr AS (SELECT ad,
             CAST(CAST(cb AS DOUBLE) + (CAST(t AS DOUBLE) + 1.0) / 2.0
               AS DECIMAL(12,1)) AS mr
           FROM cum),
         ties AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tsum FROM dom),
         wp AS (SELECT SUM(CASE WHEN diff > 0 THEN mr
             ELSE CAST(0 AS DECIMAL(12,1)) END) AS wp
           FROM diffs JOIN mr USING (ad))
         SELECT n AS n_pairs, CAST(wp AS DOUBLE) AS w_plus,
           round((CAST(wp AS DOUBLE)
             - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0)
             / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
               * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
               - CAST(tsum AS DOUBLE) / 48.0), 6) AS z
         FROM wp CROSS JOIN ties""",
    // RAKE replay: positional tokens via generate_subscripts/unnest
    // zip, boundary-count phrase ids, 6-dp word-score quantization
    "q_rake_keywords" ->
      s"""WITH d AS (SELECT doc_id, regexp_split_to_array(lower(text),
             '[^a-z0-9]+') AS arr
           FROM documents),
         toks AS (SELECT doc_id, generate_subscripts(arr, 1) AS pos,
             unnest(arr) AS w
           FROM d),
         fl AS (SELECT doc_id, pos, w,
             (w = '' OR w IN ($rakeStopsSqlList)) AS b
           FROM toks),
         pid AS (SELECT doc_id, pos, w, b,
             SUM(CASE WHEN b THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS pid
           FROM fl),
         members AS (SELECT doc_id, pid, pos, w FROM pid WHERE NOT b),
         phrases AS (SELECT doc_id, pid,
             string_agg(w, ' ' ORDER BY pos) AS phrase,
             COUNT(*) AS len
           FROM members GROUP BY 1, 2 HAVING COUNT(*) <= 4),
         wordrows AS (SELECT m.doc_id, m.pid, m.w, p.len
           FROM members m JOIN phrases p USING (doc_id, pid)),
         ws AS (SELECT w,
             CAST(round(CAST(SUM(len) AS DOUBLE) / COUNT(*), 6)
               AS DECIMAL(18,6)) AS score_w
           FROM wordrows GROUP BY 1),
         psc AS (SELECT doc_id, pid, SUM(score_w) AS psc
           FROM wordrows JOIN ws USING (w) GROUP BY 1, 2),
         ag AS (SELECT phrase, COUNT(*) AS n_occur,
             CAST(MIN(psc) AS DOUBLE) AS score
           FROM phrases JOIN psc USING (doc_id, pid) GROUP BY 1)
         SELECT phrase, n_occur, score FROM ag
         ORDER BY score DESC, phrase LIMIT 15""",
    // TextRank: lead-window co-occurrence edges over the top-100
    // vocab, 5 unrolled damped iterations, 12-dp DECIMAL per term
    // and per score (the q_pagerank oracle recipe)
    "q_textrank" -> {
      def iter(prev: String, cn: String, gn: String, sn: String) =
        s"""$cn AS (SELECT e.b AS tgt,
             CAST(round(CAST(e.wt AS DOUBLE) / CAST(o.ow AS DOUBLE)
               * CAST(s.sc AS DOUBLE), 12) AS DECIMAL(28,12)) AS t
           FROM und e JOIN outw o USING (a) JOIN $prev s USING (a)),
         $gn AS (SELECT tgt, SUM(t) AS st FROM $cn GROUP BY 1),
         $sn AS (SELECT n.a,
             CAST(round(0.15 + 0.85 * CAST(COALESCE(st, 0) AS DOUBLE),
               12) AS DECIMAL(28,12)) AS sc
           FROM nodes n LEFT JOIN $gn ON tgt = n.a)"""
      s"""WITH d AS (SELECT doc_id, regexp_split_to_array(lower(text),
             '[^a-z0-9]+') AS arr
           FROM documents),
         toks0 AS (SELECT doc_id, generate_subscripts(arr, 1) AS pos,
             unnest(arr) AS w
           FROM d),
         toks AS (SELECT * FROM toks0
           WHERE w <> '' AND w NOT IN ($rakeStopsSqlList)),
         vocab AS (SELECT w FROM (SELECT w, COUNT(*) AS c FROM toks
           GROUP BY 1 ORDER BY c DESC, w LIMIT 100)),
         nbr AS (SELECT w,
             lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
             lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
           FROM toks),
         rawp AS (SELECT w AS a, w1 AS b FROM nbr
           UNION ALL SELECT w AS a, w2 AS b FROM nbr),
         flt AS (SELECT least(a, b) AS a, greatest(a, b) AS b
           FROM rawp WHERE b IS NOT NULL AND a <> b
             AND a IN (SELECT w FROM vocab)
             AND b IN (SELECT w FROM vocab)),
         rawe AS (SELECT a, b, COUNT(*) AS wt FROM flt GROUP BY 1, 2),
         und AS (SELECT a, b, wt FROM rawe
           UNION ALL SELECT b AS a, a AS b, wt FROM rawe),
         outw AS (SELECT a, CAST(SUM(wt) AS BIGINT) AS ow
           FROM und GROUP BY 1),
         nodes AS (SELECT DISTINCT a FROM und),
         s0 AS (SELECT a, CAST(1.0 AS DECIMAL(28,12)) AS sc
           FROM nodes),
         ${iter("s0", "c1", "g1", "s1")},
         ${iter("s1", "c2", "g2", "s2")},
         ${iter("s2", "c3", "g3", "s3")},
         ${iter("s3", "c4", "g4", "s4")},
         ${iter("s4", "c5", "g5", "s5")}
         SELECT a AS word, round(CAST(sc AS DOUBLE), 6) AS score
         FROM s5 ORDER BY score DESC, word LIMIT 15"""
    },
    // simplified silhouette: 9-dp centroid means, 9-dp term sums
    "q_silhouette" ->
      """WITH e AS (SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS dim,
             unnest(CAST(embedding AS DOUBLE[])) AS v
           FROM embeddings),
         cent AS (SELECT label AS clabel, dim,
             round(CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE)
               / COUNT(*), 9) + 0.0 AS m
           FROM e GROUP BY 1, 2),
         dist AS (SELECT vec_id, label, clabel,
             sqrt(CAST(SUM(CAST(round((v - m) * (v - m), 9)
               AS DECIMAL(18,9))) AS DOUBLE)) AS d
           FROM e JOIN cent USING (dim) GROUP BY 1, 2, 3),
         ab AS (SELECT vec_id, label,
             MAX(CASE WHEN label = clabel THEN d END) AS a,
             MIN(CASE WHEN label <> clabel THEN d END) AS b
           FROM dist GROUP BY 1, 2),
         ss AS (SELECT vec_id, label, a, b,
             CAST(round((b - a) / greatest(a, b, 1e-12), 6) + 0.0
               AS DECIMAL(18,6)) AS sil
           FROM ab)
         SELECT label, COUNT(*) AS n_vecs,
           round(CAST(SUM(sil) AS DOUBLE) / COUNT(*), 6)
             AS mean_silhouette,
           round(CAST(SUM(CAST(round(a, 6) AS DECIMAL(18,6)))
             AS DOUBLE) / COUNT(*), 6) AS mean_a,
           round(CAST(SUM(CAST(round(b, 6) AS DECIMAL(18,6)))
             AS DOUBLE) / COUNT(*), 6) AS mean_b
         FROM ss GROUP BY 1 ORDER BY label""",
    // k=4 truss: three unrolled support-peel rounds over the
    // co-supplier edge set
    "q_ktruss" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
           FROM lineitem WHERE l_quantity <= 2),
         ed0 AS (SELECT DISTINCT a.l_suppkey AS src,
             b.l_suppkey AS dst
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
             AND a.l_suppkey <> b.l_suppkey),
         e0 AS (SELECT src AS u, dst AS v FROM ed0 WHERE src < dst),
         a0 AS (SELECT u AS a, v AS b FROM e0
           UNION ALL SELECT v, u FROM e0),
         t0 AS (SELECT e.u, e.v, COUNT(*) AS s FROM e0 e
           JOIN a0 x ON x.a = e.u JOIN a0 y ON y.a = e.v
             AND y.b = x.b
           GROUP BY 1, 2),
         e1 AS (SELECT e.u, e.v FROM e0 e
           JOIN t0 t ON t.u = e.u AND t.v = e.v AND t.s >= 2),
         a1 AS (SELECT u AS a, v AS b FROM e1
           UNION ALL SELECT v, u FROM e1),
         t1 AS (SELECT e.u, e.v, COUNT(*) AS s FROM e1 e
           JOIN a1 x ON x.a = e.u JOIN a1 y ON y.a = e.v
             AND y.b = x.b
           GROUP BY 1, 2),
         e2 AS (SELECT e.u, e.v FROM e1 e
           JOIN t1 t ON t.u = e.u AND t.v = e.v AND t.s >= 2),
         a2 AS (SELECT u AS a, v AS b FROM e2
           UNION ALL SELECT v, u FROM e2),
         t2 AS (SELECT e.u, e.v, COUNT(*) AS s FROM e2 e
           JOIN a2 x ON x.a = e.u JOIN a2 y ON y.a = e.v
             AND y.b = x.b
           GROUP BY 1, 2),
         e3 AS (SELECT e.u, e.v FROM e2 e
           JOIN t2 t ON t.u = e.u AND t.v = e.v AND t.s >= 2)
         SELECT CAST(1 AS INTEGER) AS iter,
           (SELECT COUNT(*) FROM (SELECT u AS n FROM e1
             UNION SELECT v FROM e1)) AS n_nodes,
           (SELECT COUNT(*) FROM e1) AS n_edges
         UNION ALL SELECT CAST(2 AS INTEGER),
           (SELECT COUNT(*) FROM (SELECT u AS n FROM e2
             UNION SELECT v FROM e2)),
           (SELECT COUNT(*) FROM e2)
         UNION ALL SELECT CAST(3 AS INTEGER),
           (SELECT COUNT(*) FROM (SELECT u AS n FROM e3
             UNION SELECT v FROM e3)),
           (SELECT COUNT(*) FROM e3)
         ORDER BY iter""",
    // Sortino: 9-dp daily returns, DECIMAL downside moments, sqrt(252)
    // as a literal
    "q_sortino" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         lagd AS (SELECT rev,
             lag(rev, 1) OVER (ORDER BY day) AS prev
           FROM daily),
         rets AS (SELECT CAST(round(CAST(rev - prev AS DOUBLE)
               / CAST(prev AS DOUBLE), 9) + 0.0 AS DECIMAL(18,9)) AS r
           FROM lagd WHERE prev IS NOT NULL),
         ag AS (SELECT COUNT(*) AS n_days, SUM(r) AS sr,
             SUM(CAST(round(CAST(least(r, CAST(0 AS DECIMAL(18,9)))
               AS DOUBLE) * CAST(least(r, CAST(0 AS DECIMAL(18,9)))
               AS DOUBLE), 9) AS DECIMAL(18,9))) AS sd2
           FROM rets)
         SELECT n_days,
           round(CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
             AS mean_daily_ret,
           round(sqrt(CAST(sd2 AS DOUBLE) / CAST(n_days AS DOUBLE)), 6)
             AS downside_dev,
           round(CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE)
             / sqrt(CAST(sd2 AS DOUBLE) / CAST(n_days AS DOUBLE))
             * 15.874507866387544, 6) AS sortino_annual
         FROM ag""",
    // Fisher exact: cumulative 9-dp log-factorials, DECIMAL log-pmf
    // table scan, 12-dp exp-sum tail
    "q_fisher_exact" ->
      """WITH med AS (SELECT percentile_disc(0.5)
             WITHIN GROUP (ORDER BY n_chars) AS med FROM documents),
         cells AS (SELECT
             CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= med
               THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN lang = 'en' AND n_chars < med
               THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN lang <> 'en' AND n_chars >= med
               THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN lang <> 'en' AND n_chars < med
               THEN 1 ELSE 0 END) AS BIGINT) AS d
           FROM documents CROSS JOIN med),
         c2 AS (SELECT a, b, c, d, a + b + c + d AS n, a + b AS r1,
             a + c AS c1
           FROM cells),
         seq AS (SELECT CAST(row_number() OVER () - 1 AS BIGINT) AS i
           FROM documents
           UNION ALL
           SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
         lf AS (SELECT i,
             SUM(CASE WHEN i = 0 THEN CAST(0 AS DECIMAL(18,9))
               ELSE CAST(round(ln(CAST(i AS DOUBLE)), 9)
                 AS DECIMAL(18,9)) END)
               OVER (ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lf
           FROM seq),
         ts AS (SELECT c2.*, seq.i AS t FROM c2 JOIN seq
           ON seq.i BETWEEN greatest(0, r1 + c1 - n)
             AND least(r1, c1)),
         lnp AS (SELECT ts.*,
             l1.lf + l2.lf + l3.lf + l4.lf - l5.lf
               - l6.lf - l7.lf - l8.lf - l9.lf AS lnpmf
           FROM ts
           JOIN lf l1 ON l1.i = ts.r1
           JOIN lf l2 ON l2.i = ts.n - ts.r1
           JOIN lf l3 ON l3.i = ts.c1
           JOIN lf l4 ON l4.i = ts.n - ts.c1
           JOIN lf l5 ON l5.i = ts.n
           JOIN lf l6 ON l6.i = ts.t
           JOIN lf l7 ON l7.i = ts.r1 - ts.t
           JOIN lf l8 ON l8.i = ts.c1 - ts.t
           JOIN lf l9 ON l9.i = ts.n - ts.r1 - ts.c1 + ts.t),
         obs AS (SELECT lnpmf AS lnobs FROM lnp WHERE t = a),
         sel AS (SELECT * FROM lnp CROSS JOIN obs
           WHERE lnpmf <= lnobs + CAST(0.0000001 AS DECIMAL(18,9)))
         SELECT MAX(a) AS a, MAX(b) AS b, MAX(c) AS c, MAX(d) AS d,
           round(least(CAST(SUM(CAST(round(exp(CAST(lnpmf AS DOUBLE)),
             12) AS DECIMAL(18,12))) AS DOUBLE), 1.0), 9)
             AS p_two_sided,
           round(CAST(MAX(a) AS DOUBLE) * CAST(MAX(d) AS DOUBLE)
             / (CAST(MAX(b) AS DOUBLE) * CAST(MAX(c) AS DOUBLE)), 6)
             AS odds_ratio
         FROM sel""",
    // Gumbel MoM on monthly maxima; sqrt6/pi and Euler gamma literals
    "q_gumbel_maxima" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         bm AS (SELECT date_trunc('month', day) AS mon,
             MAX(rev) AS mx
           FROM daily GROUP BY 1),
         m AS (SELECT COUNT(*) AS n_blocks, SUM(mx) AS sm,
             SUM(CAST(mx AS DECIMAL(19,2))
               * CAST(mx AS DECIMAL(19,2))) AS s2
           FROM bm),
         f AS (SELECT n_blocks,
             sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n_blocks AS DOUBLE)
               - (CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE))
                 * (CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)),
               0.0)) * 0.7796968012336761 AS beta,
             CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE) AS mean_mx
           FROM m),
         g AS (SELECT n_blocks, beta,
             mean_mx - 0.5772156649015329 * beta AS mu
           FROM f)
         SELECT n_blocks, round(beta, 4) AS beta, round(mu, 4) AS mu,
           round(mu - beta * ln(-ln(1.0 - 1.0 / 12.0)), 4)
             AS ret_level_12mo
         FROM g""",
    // Poisson dispersion on daily event counts
    "q_dispersion" -> {
      val idx =
        """((CAST(s2 AS DOUBLE)
             - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
               / CAST(n_days AS DOUBLE))
           / CAST(n_days - 1 AS DOUBLE)
           / (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)))"""
      s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c
           FROM events GROUP BY 1),
         m AS (SELECT COUNT(*) AS n_days, CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(c * c) AS BIGINT) AS s2
           FROM daily)
         SELECT n_days,
           round(CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
             AS mean_rate,
           round($idx, 6) AS dispersion_index,
           round(CAST(n_days - 1 AS DOUBLE) * $idx, 6) AS chi2_stat
         FROM m"""
    },
    // Hodges–Lehmann: Walsh-average median over the calendar pair grid
    "q_hodges_lehmann" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         d95 AS (SELECT month(day) AS m, dayofmonth(day) AS d,
             rev AS r95 FROM daily WHERE year(day) = 1995),
         d96 AS (SELECT month(day) AS m, dayofmonth(day) AS d,
             rev AS r96 FROM daily WHERE year(day) = 1996),
         diffs AS (SELECT CAST(r96 AS DECIMAL(19,2))
               - CAST(r95 AS DECIMAL(19,2)) AS diff,
             row_number() OVER (ORDER BY CAST(r96 AS DECIMAL(19,2))
               - CAST(r95 AS DECIMAL(19,2)), m, d) AS i
           FROM d95 JOIN d96 USING (m, d)),
         walsh AS (SELECT a.diff + b.diff AS ws
           FROM diffs a JOIN diffs b ON a.i <= b.i)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_walsh,
           round(CAST(percentile_disc(0.5)
             WITHIN GROUP (ORDER BY ws) AS DOUBLE) / 2.0, 4)
             AS hl_estimate
         FROM walsh""",
    // Cohen's d / Hedges' g from the exact conditional moments
    "q_cohens_d" -> {
      val fold =
        """list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef',
               (md5('23:' || CAST(o_custkey AS VARCHAR)))[i:i]) - 1
               AS BIGINT)), (a, d) -> a * 16 + d)"""
      s"""WITH spend AS (SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
           FROM orders GROUP BY 1),
         arm AS (SELECT CAST(y AS DECIMAL(19,2)) AS y, $fold % 2 AS arm
           FROM spend),
         m AS (SELECT
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_b,
             SUM(CASE WHEN arm = 0 THEN y END) AS sa,
             SUM(CASE WHEN arm = 1 THEN y END) AS sb,
             SUM(CASE WHEN arm = 0 THEN y * y END) AS qa,
             SUM(CASE WHEN arm = 1 THEN y * y END) AS qb
           FROM arm),
         c AS (SELECT *, sqrt(greatest(((CAST(qa AS DOUBLE)
               - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                 / CAST(n_a AS DOUBLE))
             + (CAST(qb AS DOUBLE)
               - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                 / CAST(n_b AS DOUBLE)))
             / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 2.0),
             0.0)) AS sd_pooled,
             CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
               - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS md
           FROM m)
         SELECT n_a, n_b, round(md, 4) AS mean_diff,
           round(md / sd_pooled, 6) AS cohens_d,
           round(md / sd_pooled * (1.0 - 3.0
             / (4.0 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
               - 2.0) - 1.0)), 6) AS hedges_g
         FROM c"""
    },
    // Cramér's V over the completed lang × source grid
    "q_cramers_v" ->
      """WITH ct AS (SELECT lang, source, COUNT(*) AS o
           FROM documents GROUP BY 1, 2),
         rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rl
           FROM ct GROUP BY 1),
         st AS (SELECT source, CAST(SUM(o) AS BIGINT) AS cs
           FROM ct GROUP BY 1),
         tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
             COUNT(DISTINCT lang) AS nr,
             COUNT(DISTINCT source) AS nc
           FROM ct),
         grid AS (SELECT rt.lang, st.source, rl, cs,
             COALESCE(ct.o, 0) AS o
           FROM rt CROSS JOIN st
             LEFT JOIN ct ON ct.lang = rt.lang
               AND ct.source = st.source),
         terms AS (SELECT rl, cs, o, n, nr, nc,
             CAST(round((CAST(o AS DOUBLE)
               - CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE)
                 / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE)
                 - CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE)
                   / CAST(n AS DOUBLE))
               / (CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE)
                 / CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS term
           FROM grid CROSS JOIN tot),
         ag AS (SELECT MAX(n) AS n_docs, MAX(nr) AS nr, MAX(nc) AS nc,
             SUM(term) AS chi2d
           FROM terms)
         SELECT n_docs, (nr - 1) * (nc - 1) AS df,
           round(CAST(chi2d AS DOUBLE), 6) AS chi2,
           round(sqrt(CAST(chi2d AS DOUBLE) / (CAST(n_docs AS DOUBLE)
             * CAST(least(nr, nc) - 1 AS DOUBLE))), 6) AS cramers_v
         FROM ag""",
    // permutation test: 200 md5-relabelings, 6-dp diff comparison
    "q_permutation_test" -> {
      val foldObs =
        """list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef',
               (md5('23:' || CAST(o_custkey AS VARCHAR)))[i:i]) - 1
               AS BIGINT)), (a, d) -> a * 16 + d)"""
      val foldRep =
        """list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef',
               (md5('p31:' || CAST(rep AS VARCHAR) || ':'
                 || CAST(o_custkey AS VARCHAR)))[i:i]) - 1
               AS BIGINT)), (a, d) -> a * 16 + d)"""
      s"""WITH spend AS (SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
           FROM orders GROUP BY 1),
         obs AS (SELECT CAST(round(
             CAST(SUM(CASE WHEN $foldObs % 2 = 0 THEN y END)
               AS DOUBLE)
               / SUM(CASE WHEN $foldObs % 2 = 0 THEN 1 ELSE 0 END)
             - CAST(SUM(CASE WHEN $foldObs % 2 = 1 THEN y END)
               AS DOUBLE)
               / SUM(CASE WHEN $foldObs % 2 = 1 THEN 1 ELSE 0 END),
             6) + 0.0 AS DECIMAL(18,6)) AS obs_diff
           FROM spend),
         reps AS (SELECT o_custkey, y, CAST(range AS INT) AS rep
           FROM spend CROSS JOIN range(0, 200)),
         pd AS (SELECT rep, CAST(round(
             CAST(SUM(CASE WHEN $foldRep % 2 = 0 THEN y END)
               AS DOUBLE)
               / SUM(CASE WHEN $foldRep % 2 = 0 THEN 1 ELSE 0 END)
             - CAST(SUM(CASE WHEN $foldRep % 2 = 1 THEN y END)
               AS DOUBLE)
               / SUM(CASE WHEN $foldRep % 2 = 1 THEN 1 ELSE 0 END),
             6) + 0.0 AS DECIMAL(18,6)) AS pd
           FROM reps GROUP BY 1),
         ag AS (SELECT COUNT(*) AS n_reps,
             CAST(MAX(obs_diff) AS DOUBLE) AS obs_diff,
             CAST(SUM(CASE WHEN abs(pd) >= abs(obs_diff)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed
           FROM pd CROSS JOIN obs)
         SELECT n_reps, obs_diff, n_exceed,
           round((1.0 + CAST(n_exceed AS DOUBLE))
             / (CAST(n_reps AS DOUBLE) + 1.0), 6) AS p_perm
         FROM ag"""
    },
    // two-regressor OLS / ridge / VIF: identical centered-moment
    // double algebra on both sides (the qLinreg determinism contract)
    "q_ols_multi" ->
      s"""WITH m AS (SELECT COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(19,2))) AS sx,
             SUM(CAST(l_discount AS DECIMAL(19,2))) AS sz,
             SUM(CAST(l_extendedprice AS DECIMAL(19,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_quantity AS DECIMAL(19,2))) AS sxx,
             SUM(CAST(l_discount AS DECIMAL(19,2))
               * CAST(l_discount AS DECIMAL(19,2))) AS szz,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_discount AS DECIMAL(19,2))) AS sxz,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_extendedprice AS DECIMAL(19,2))) AS sxy,
             SUM(CAST(l_discount AS DECIMAL(19,2))
               * CAST(l_extendedprice AS DECIMAL(19,2))) AS szy,
             SUM(CAST(l_extendedprice AS DECIMAL(19,2))
               * CAST(l_extendedprice AS DECIMAL(19,2))) AS syy
           FROM lineitem),
         d AS (SELECT n, sx, sz, sy,
             $cmSxx * $cmSzz - $cmSxz * $cmSxz AS det,
             ($cmSzz * $cmSxy - $cmSxz * $cmSzy)
               / ($cmSxx * $cmSzz - $cmSxz * $cmSxz) AS b1,
             ($cmSxx * $cmSzy - $cmSxz * $cmSxy)
               / ($cmSxx * $cmSzz - $cmSxz * $cmSxz) AS b2,
             $cmSxy AS csxy, $cmSzy AS cszy, $cmSyy AS csyy
           FROM m)
         SELECT CAST(n AS BIGINT) AS n,
           round(b1, 6) AS b_qty, round(b2, 6) AS b_disc,
           round((CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE)
             - b2 * CAST(sz AS DOUBLE)) / CAST(n AS DOUBLE), 6)
             AS intercept,
           round((b1 * csxy + b2 * cszy) / csyy, 6) AS r2,
           round(1.0 - (1.0 - (b1 * csxy + b2 * cszy) / csyy)
             * (CAST(n AS DOUBLE) - 1.0)
             / (CAST(n AS DOUBLE) - 3.0), 6) AS r2_adj
         FROM d""",
    "q_ridge_path" ->
      s"""WITH m AS (SELECT COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(19,2))) AS sx,
             SUM(CAST(l_discount AS DECIMAL(19,2))) AS sz,
             SUM(CAST(l_extendedprice AS DECIMAL(19,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_quantity AS DECIMAL(19,2))) AS sxx,
             SUM(CAST(l_discount AS DECIMAL(19,2))
               * CAST(l_discount AS DECIMAL(19,2))) AS szz,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_discount AS DECIMAL(19,2))) AS sxz,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_extendedprice AS DECIMAL(19,2))) AS sxy,
             SUM(CAST(l_discount AS DECIMAL(19,2))
               * CAST(l_extendedprice AS DECIMAL(19,2))) AS szy,
             SUM(CAST(l_extendedprice AS DECIMAL(19,2))
               * CAST(l_extendedprice AS DECIMAL(19,2))) AS syy
           FROM lineitem),
         l AS (SELECT CASE WHEN range = 0 THEN 0.0
             WHEN range = 1 THEN 1.0e4 ELSE 1.0e7 END AS lambda
           FROM range(0, 3)),
         d AS (SELECT lambda,
             ($cmSxx + lambda) * ($cmSzz + lambda)
               - $cmSxz * $cmSxz AS det,
             $cmSxx AS csxx, $cmSzz AS cszz, $cmSxz AS csxz,
             $cmSxy AS csxy, $cmSzy AS cszy
           FROM m CROSS JOIN l)
         SELECT lambda,
           round(((cszz + lambda) * csxy - csxz * cszy) / det, 6)
             AS b_qty,
           round(((csxx + lambda) * cszy - csxz * csxy) / det, 6)
             AS b_disc
         FROM d ORDER BY lambda""",
    "q_vif" ->
      s"""WITH m AS (SELECT l_returnflag, COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(19,2))) AS sx,
             SUM(CAST(l_discount AS DECIMAL(19,2))) AS sz,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_quantity AS DECIMAL(19,2))) AS sxx,
             SUM(CAST(l_discount AS DECIMAL(19,2))
               * CAST(l_discount AS DECIMAL(19,2))) AS szz,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_discount AS DECIMAL(19,2))) AS sxz
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round($cmSxz / sqrt($cmSxx * $cmSzz), 6) AS corr_xz,
           round(1.0 / (1.0 - ($cmSxz * $cmSxz)
             / ($cmSxx * $cmSzz)), 6) AS vif
         FROM m ORDER BY l_returnflag""",
    // Mahalanobis top-10: identical closed-form 2x2 inverse algebra
    "q_mahalanobis" ->
      s"""WITH feats AS (SELECT o_custkey,
             CAST(COUNT(*) AS DECIMAL(12,0)) AS x,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS z
           FROM orders GROUP BY 1),
         m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(z) AS sz,
             SUM(x * x) AS sxx,
             SUM(CAST(z AS DECIMAL(19,2))
               * CAST(z AS DECIMAL(19,2))) AS szz,
             SUM(CAST(x AS DECIMAL(12,0))
               * CAST(z AS DECIMAL(19,2))) AS sxz
           FROM feats),
         d AS (SELECT o_custkey, x, z,
             CAST(x AS DOUBLE) - CAST(sx AS DOUBLE)
               / CAST(n AS DOUBLE) AS dx,
             CAST(z AS DOUBLE) - CAST(sz AS DOUBLE)
               / CAST(n AS DOUBLE) AS dz,
             $cmSxx / CAST(n AS DOUBLE) AS vxx,
             $cmSzz / CAST(n AS DOUBLE) AS vzz,
             $cmSxz / CAST(n AS DOUBLE) AS vxz
           FROM feats CROSS JOIN m)
         SELECT o_custkey, CAST(x AS BIGINT) AS n_orders,
           CAST(z AS DOUBLE) AS spend,
           round((vzz * dx * dx - 2.0 * vxz * dx * dz
             + vxx * dz * dz) / (vxx * vzz - vxz * vxz), 6) AS d2
         FROM d ORDER BY d2 DESC, o_custkey LIMIT 10""",
    // permutation entropy: tie-robust 3-bit ordinal codes, ln at 9 dp
    "q_perm_entropy" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         lagd AS (SELECT rev,
             lag(rev, 2) OVER (ORDER BY day) AS r1,
             lag(rev, 1) OVER (ORDER BY day) AS r2
           FROM daily),
         pats AS (SELECT
             (CASE WHEN r1 >= r2 THEN '1' ELSE '0' END)
             || (CASE WHEN r2 >= rev THEN '1' ELSE '0' END)
             || (CASE WHEN r1 >= rev THEN '1' ELSE '0' END) AS pat
           FROM lagd WHERE r1 IS NOT NULL),
         pc AS (SELECT pat, COUNT(*) AS c FROM pats GROUP BY 1),
         t AS (SELECT SUM(c) AS nt FROM pc),
         terms AS (SELECT CAST(c AS DECIMAL(18,0))
             * CAST(round(ln(CAST(c AS DOUBLE) / CAST(nt AS DOUBLE)),
               9) AS DECIMAL(12,9)) AS term, nt
           FROM pc CROSS JOIN t)
         SELECT CAST(MAX(nt) AS BIGINT) AS n_windows,
           CAST(COUNT(*) AS BIGINT) AS n_patterns,
           round(-CAST(SUM(term) AS DOUBLE)
             / CAST(MAX(nt) AS DOUBLE), 6) AS perm_entropy,
           round(-CAST(SUM(term) AS DOUBLE) / CAST(MAX(nt) AS DOUBLE)
             / ln(6.0), 6) AS normalized
         FROM terms""",
    // sample entropy: exact DECIMAL tolerance comparisons, one ln
    "q_sample_entropy" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders
           WHERE year(CAST(o_orderdate AS DATE)) = 1995 GROUP BY 1),
         sd AS (SELECT CAST(round(0.2 * sqrt(
             (CAST(SUM(CAST(rev AS DECIMAL(19,2))
                 * CAST(rev AS DECIMAL(19,2))) AS DOUBLE)
               - CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE))
             / CAST(COUNT(*) AS DOUBLE)), 2) AS DECIMAL(18,2)) AS r
           FROM daily),
         tpl AS (SELECT row_number() OVER (ORDER BY day) AS i,
             rev AS v0,
             lead(rev, 1) OVER (ORDER BY day) AS v1,
             lead(rev, 2) OVER (ORDER BY day) AS v2
           FROM daily),
         t2 AS (SELECT * FROM tpl WHERE v2 IS NOT NULL),
         p AS (SELECT
             greatest(abs(a.v0 - b.v0), abs(a.v1 - b.v1)) <= r AS mb,
             greatest(abs(a.v0 - b.v0), abs(a.v1 - b.v1),
               abs(a.v2 - b.v2)) <= r AS ma, r
           FROM t2 a JOIN t2 b ON a.i < b.i CROSS JOIN sd)
         SELECT CAST(MAX(r) AS DOUBLE) AS tolerance,
           CAST(SUM(CASE WHEN mb THEN 1 ELSE 0 END) AS BIGINT)
             AS b_count,
           CAST(SUM(CASE WHEN ma THEN 1 ELSE 0 END) AS BIGINT)
             AS a_count,
           round(-ln(CAST(SUM(CASE WHEN ma THEN 1 ELSE 0 END)
               AS DOUBLE)
             / CAST(SUM(CASE WHEN mb THEN 1 ELSE 0 END) AS DOUBLE)),
             6) AS sampen
         FROM p""",
    // periodogram: bounded-phase 9-dp trig quantization, exact sums
    "q_periodogram" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         mn AS (SELECT CAST(round(CAST(SUM(rev) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 2) AS DECIMAL(18,2)) AS mu,
             COUNT(*) AS nd
           FROM daily),
         ts AS (SELECT row_number() OVER (ORDER BY day) - 1 AS t,
             nd, CAST(rev - mu AS DECIMAL(19,2)) AS dev
           FROM daily CROSS JOIN mn),
         pr AS (SELECT CASE WHEN range = 0 THEN 7
             WHEN range = 1 THEN 30 WHEN range = 2 THEN 91
             WHEN range = 3 THEN 182 ELSE 365 END AS period
           FROM range(0, 5)),
         g AS (SELECT period, nd,
             dev * CAST(round(cos(6.283185307179586
               * CAST(t % period AS DOUBLE)
               / CAST(period AS DOUBLE)), 9) AS DECIMAL(12,9)) AS tc,
             dev * CAST(round(sin(6.283185307179586
               * CAST(t % period AS DOUBLE)
               / CAST(period AS DOUBLE)), 9) AS DECIMAL(12,9)) AS tsn
           FROM ts CROSS JOIN pr),
         ag AS (SELECT period, CAST(MAX(nd) AS BIGINT) AS n_days,
             SUM(tc) AS sc, SUM(tsn) AS ss
           FROM g GROUP BY 1)
         SELECT period, n_days,
           round((CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
             + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
             / CAST(n_days AS DOUBLE), 2) AS power
         FROM ag ORDER BY period""",
    // Chow test: per-segment raw moments add; identical SSR algebra
    "q_chow_test" -> {
      def ssr(pre: String): String =
        s"""((CAST(${pre}syy AS DOUBLE) - CAST(${pre}sy AS DOUBLE)
               * CAST(${pre}sy AS DOUBLE) / CAST(${pre}n AS DOUBLE))
             - (CAST(${pre}sxy AS DOUBLE) - CAST(${pre}sx AS DOUBLE)
                 * CAST(${pre}sy AS DOUBLE) / CAST(${pre}n AS DOUBLE))
               * (CAST(${pre}sxy AS DOUBLE) - CAST(${pre}sx AS DOUBLE)
                 * CAST(${pre}sy AS DOUBLE) / CAST(${pre}n AS DOUBLE))
               / (CAST(${pre}sxx AS DOUBLE) - CAST(${pre}sx AS DOUBLE)
                 * CAST(${pre}sx AS DOUBLE)
                 / CAST(${pre}n AS DOUBLE)))"""
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS DECIMAL(12,0)) AS x,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(19,2)) AS y
           FROM orders GROUP BY 1),
         seg AS (SELECT CASE WHEN day < DATE '1996-01-01' THEN 1
             ELSE 2 END AS seg, x, y
           FROM daily),
         m AS (SELECT seg, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
           FROM seg GROUP BY 1),
         pv AS (SELECT
             SUM(CASE WHEN seg = 1 THEN n END) AS an,
             SUM(CASE WHEN seg = 1 THEN sx END) AS asx,
             SUM(CASE WHEN seg = 1 THEN sy END) AS asy,
             SUM(CASE WHEN seg = 1 THEN sxx END) AS asxx,
             SUM(CASE WHEN seg = 1 THEN sxy END) AS asxy,
             SUM(CASE WHEN seg = 1 THEN syy END) AS asyy,
             SUM(CASE WHEN seg = 2 THEN n END) AS bn,
             SUM(CASE WHEN seg = 2 THEN sx END) AS bsx,
             SUM(CASE WHEN seg = 2 THEN sy END) AS bsy,
             SUM(CASE WHEN seg = 2 THEN sxx END) AS bsxx,
             SUM(CASE WHEN seg = 2 THEN sxy END) AS bsxy,
             SUM(CASE WHEN seg = 2 THEN syy END) AS bsyy,
             SUM(n) AS pn, SUM(sx) AS psx, SUM(sy) AS psy,
             SUM(sxx) AS psxx, SUM(sxy) AS psxy, SUM(syy) AS psyy
           FROM m),
         d AS (SELECT an, bn, asx, asy, asxx, asxy, bsx, bsy, bsxx,
             bsxy, ${ssr("a")} AS ssr1, ${ssr("b")} AS ssr2,
             ${ssr("p")} AS ssrp
           FROM pv)
         SELECT CAST(an AS BIGINT) AS n_pre,
           CAST(bn AS BIGINT) AS n_post,
           round((CAST(asxy AS DOUBLE) - CAST(asx AS DOUBLE)
               * CAST(asy AS DOUBLE) / CAST(an AS DOUBLE))
             / (CAST(asxx AS DOUBLE) - CAST(asx AS DOUBLE)
               * CAST(asx AS DOUBLE) / CAST(an AS DOUBLE)), 6)
             AS slope_pre,
           round((CAST(bsxy AS DOUBLE) - CAST(bsx AS DOUBLE)
               * CAST(bsy AS DOUBLE) / CAST(bn AS DOUBLE))
             / (CAST(bsxx AS DOUBLE) - CAST(bsx AS DOUBLE)
               * CAST(bsx AS DOUBLE) / CAST(bn AS DOUBLE)), 6)
             AS slope_post,
           round(ssrp / (ssr1 + ssr2), 6) AS ssr_ratio,
           round(((ssrp - (ssr1 + ssr2)) / 2.0)
             / ((ssr1 + ssr2) / (CAST(an AS DOUBLE)
               + CAST(bn AS DOUBLE) - 4.0)), 6) AS f_stat
         FROM d"""
    },
    // Friedman: join-counted midranks (no rank window), exact grid
    "q_friedman" ->
      """WITH cells0 AS (SELECT
             month(CAST(o_orderdate AS DATE)) AS m,
             o_orderpriority AS trt,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
           FROM orders
           WHERE year(CAST(o_orderdate AS DATE)) = 1995
           GROUP BY 1, 2),
         kall AS (SELECT COUNT(DISTINCT trt) AS kk FROM cells0),
         complete AS (SELECT m FROM cells0 CROSS JOIN kall
           GROUP BY m, kk HAVING COUNT(*) = MAX(kk)),
         cells AS (SELECT c.* FROM cells0 c
           JOIN complete USING (m)),
         rk AS (SELECT a.m AS m, a.trt AS trt,
             CAST(SUM(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
               AS DOUBLE)
             + (CAST(SUM(CASE WHEN b.v = a.v THEN 1 ELSE 0 END)
               AS DOUBLE) + 1.0) / 2.0 AS r
           FROM cells a JOIN cells b ON a.m = b.m
           GROUP BY 1, 2),
         rj AS (SELECT trt, SUM(r) AS rsum, COUNT(*) AS nb
           FROM rk GROUP BY 1),
         ag AS (SELECT CAST(MAX(nb) AS BIGINT) AS n_blocks,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(rsum * rsum) AS sr2
           FROM rj)
         SELECT n_blocks, k,
           round(12.0 * CAST(sr2 AS DOUBLE)
             / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
               * (CAST(k AS DOUBLE) + 1.0))
             - 3.0 * CAST(n_blocks AS DOUBLE)
               * (CAST(k AS DOUBLE) + 1.0), 6) AS chi2_f,
           CAST(k - 1 AS BIGINT) AS df
         FROM ag""",
    // Wasserstein-1: exact integer CDF cross-products times exact dv
    "q_wasserstein" ->
      """WITH daily AS (SELECT year(CAST(o_orderdate AS DATE)) AS yr,
             CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders
           WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
           GROUP BY 1, 2),
         bv AS (SELECT rev,
             SUM(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS c2
           FROM daily GROUP BY 1),
         tot AS (SELECT
             SUM(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS n2
           FROM daily),
         cdf AS (SELECT rev,
             SUM(c1) OVER (ORDER BY rev
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS f1,
             SUM(c2) OVER (ORDER BY rev
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS f2,
             lead(rev, 1) OVER (ORDER BY rev) AS nxt
           FROM bv),
         terms AS (SELECT n1, n2,
             CAST(abs(f1 * n2 - f2 * n1) AS DECIMAL(18,0))
               * CAST(nxt - rev AS DECIMAL(19,2)) AS term
           FROM cdf CROSS JOIN tot WHERE nxt IS NOT NULL)
         SELECT CAST(MAX(n1) AS BIGINT) AS n_1995,
           CAST(MAX(n2) AS BIGINT) AS n_1996,
           round(CAST(SUM(term) AS DOUBLE)
             / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE)),
             4) AS w1_distance
         FROM terms""",
    // Cramer-von Mises: closed-form grouped order-statistic sums
    "q_cvm_uniform" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         cents AS (SELECT CAST(rev * 100 AS BIGINT) % 100 AS c,
             COUNT(*) AS cnt
           FROM daily GROUP BY 1),
         tot AS (SELECT SUM(cnt) AS n FROM cents),
         pos AS (SELECT c, cnt,
             SUM(cnt) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS hi
           FROM cents),
         k AS (SELECT cnt, hi, hi - cnt AS lo,
             -200 - 2 * n * (2 * c + 1) AS d, n
           FROM pos CROSS JOIN tot),
         k6 AS (SELECT n,
             160000 * (hi * (hi + 1) * (2 * hi + 1)
               - lo * (lo + 1) * (2 * lo + 1))
             + 2400 * d * (hi * (hi + 1) - lo * (lo + 1))
             + 6 * cnt * d * d AS k6
           FROM k)
         SELECT CAST(MAX(n) AS BIGINT) AS n_days,
           round(1.0 / (12.0 * CAST(MAX(n) AS DOUBLE))
             + CAST(SUM(k6) AS DOUBLE)
               / (960000.0 * CAST(MAX(n) AS DOUBLE)
                 * CAST(MAX(n) AS DOUBLE)), 6) AS t_stat
         FROM k6""",
    // Cochran's Q: pure BIGINT identity over two aggregates
    "q_cochran_q" ->
      """WITH flags AS (SELECT o_custkey,
             MAX(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
               THEN 1 ELSE 0 END) AS i95,
             MAX(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
               THEN 1 ELSE 0 END) AS i96,
             MAX(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
               THEN 1 ELSE 0 END) AS i97
           FROM orders
           WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996, 1997)
           GROUP BY 1),
         ag AS (SELECT COUNT(*) AS n_cust,
             SUM(i95) AS c95, SUM(i96) AS c96, SUM(i97) AS c97,
             SUM(i95 + i96 + i97) AS t,
             SUM((i95 + i96 + i97) * (i95 + i96 + i97)) AS sr2
           FROM flags)
         SELECT CAST(n_cust AS BIGINT) AS n_cust,
           CAST(c95 AS BIGINT) AS c95, CAST(c96 AS BIGINT) AS c96,
           CAST(c97 AS BIGINT) AS c97,
           round(2.0 * (3.0 * (CAST(c95 AS DOUBLE) * CAST(c95 AS DOUBLE)
               + CAST(c96 AS DOUBLE) * CAST(c96 AS DOUBLE)
               + CAST(c97 AS DOUBLE) * CAST(c97 AS DOUBLE))
             - CAST(t AS DOUBLE) * CAST(t AS DOUBLE))
             / (3.0 * CAST(t AS DOUBLE) - CAST(sr2 AS DOUBLE)), 6)
             AS q_stat,
           CAST(2 AS BIGINT) AS df
         FROM ag""",
    // truncated Katz: unrolled-CTE replay of the DECIMAL(28,12) state
    "q_katz" -> {
      def kiter(k: Int): String =
        s"""kc$k AS (SELECT e.dst,
               SUM(CAST(round(0.005 * CAST(xp.x AS DOUBLE), 12)
                 AS DECIMAL(28,12))) AS s
             FROM e JOIN x${k - 1} xp ON xp.node = e.src
             GROUP BY e.dst),
           x$k AS (SELECT node,
               CAST(round(1.0 + CAST(coalesce(s, 0) AS DOUBLE), 12)
                 AS DECIMAL(28,12)) AS x
             FROM nodes LEFT JOIN kc$k ON node = dst)"""
      s"""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
             FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
               AND a.l_suppkey <> b.l_suppkey),
         nodes AS (SELECT DISTINCT src AS node FROM e),
         x0 AS (SELECT node, CAST(1.0 AS DECIMAL(28,12)) AS x
             FROM nodes),
         ${kiter(1)},
         ${kiter(2)},
         ${kiter(3)},
         ${kiter(4)}
         SELECT node AS suppkey,
           floor(CAST(x AS DOUBLE) * 1e8 + 0.5) / 1e8 AS katz
         FROM x4 ORDER BY katz DESC, suppkey LIMIT 10"""
    },
    // stationary distribution: 9-dp transition matrix, 4 power steps
    "q_markov_stationary" -> {
      def piter(k: Int): String =
        s"""s$k AS (SELECT p.next_type AS state,
               SUM(CAST(round(CAST(pp.pi AS DOUBLE)
                 * CAST(p.p AS DOUBLE), 12) AS DECIMAL(28,12))) AS ps
             FROM p JOIN pi${k - 1} pp ON pp.state = p.prev_type
             GROUP BY 1),
           pi$k AS (SELECT st.state,
               CAST(round(CAST(coalesce(ps, 0) AS DOUBLE), 12)
                 AS DECIMAL(28,12)) AS pi
             FROM states st LEFT JOIN s$k ON st.state = s$k.state)"""
      s"""WITH tr AS (SELECT event_type AS prev_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         cnt AS (SELECT prev_type, next_type, COUNT(*) AS n
           FROM tr WHERE next_type IS NOT NULL GROUP BY 1, 2),
         p AS (SELECT prev_type, next_type,
             CAST(round(CAST(n AS DOUBLE) / CAST(SUM(n) OVER
               (PARTITION BY prev_type) AS DOUBLE), 9)
               AS DECIMAL(12,9)) AS p
           FROM cnt),
         states AS (SELECT DISTINCT prev_type AS state FROM p),
         kk AS (SELECT COUNT(*) AS k FROM states),
         pi0 AS (SELECT state,
             CAST(round(1.0 / k, 12) AS DECIMAL(28,12)) AS pi
           FROM states CROSS JOIN kk),
         ${piter(1)},
         ${piter(2)},
         ${piter(3)},
         ${piter(4)}
         SELECT state, round(CAST(pi AS DOUBLE), 6) AS pi4
         FROM pi4 ORDER BY state"""
    },
    // Jonckheere-Terpstra: group x bucket count grid, pair join
    "q_jonckheere" ->
      """WITH grid AS (SELECT o_orderpriority AS g,
             CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS b,
             COUNT(*) AS c
           FROM orders GROUP BY 1, 2),
         jt AS (SELECT
             SUM(CASE WHEN a.b < b.b THEN CAST(a.c AS DECIMAL(19,0))
               * CAST(b.c AS DECIMAL(19,0)) ELSE 0 END) AS w,
             SUM(CASE WHEN a.b = b.b THEN CAST(a.c AS DECIMAL(19,0))
               * CAST(b.c AS DECIMAL(19,0)) ELSE 0 END) AS ties
           FROM grid a JOIN grid b ON a.g < b.g),
         sizes AS (SELECT SUM(ng) AS n, SUM(ng * ng) AS sn2,
             SUM(ng * ng * (2 * ng + 3)) AS sn23
           FROM (SELECT g, SUM(c) AS ng FROM grid GROUP BY 1)),
         d AS (SELECT
             CAST(w AS DOUBLE) + CAST(ties AS DOUBLE) / 2.0 AS jt_stat,
             CAST(n AS BIGINT) AS n,
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               - CAST(sn2 AS DOUBLE)) / 4.0 AS e_jt,
             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               * (2.0 * CAST(n AS DOUBLE) + 3.0)
               - CAST(sn23 AS DOUBLE)) / 72.0 AS v_jt
           FROM jt CROSS JOIN sizes)
         SELECT n, round(jt_stat, 1) AS jt_stat,
           round(e_jt, 1) AS e_jt,
           round((jt_stat - e_jt) / sqrt(v_jt), 6) AS z
         FROM d""",
    // Page's L: Friedman midrank machinery with a-priori weights
    "q_page_trend" ->
      """WITH cells0 AS (SELECT
             month(CAST(o_orderdate AS DATE)) AS m,
             o_orderpriority AS trt,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
           FROM orders
           WHERE year(CAST(o_orderdate AS DATE)) = 1995
           GROUP BY 1, 2),
         kall AS (SELECT COUNT(DISTINCT trt) AS kk FROM cells0),
         complete AS (SELECT m FROM cells0 CROSS JOIN kall
           GROUP BY m, kk HAVING COUNT(*) = MAX(kk)),
         cells AS (SELECT c.* FROM cells0 c JOIN complete USING (m)),
         rk AS (SELECT a.m AS m, a.trt AS trt,
             CAST(SUM(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
               AS DOUBLE)
             + (CAST(SUM(CASE WHEN b.v = a.v THEN 1 ELSE 0 END)
               AS DOUBLE) + 1.0) / 2.0 AS r
           FROM cells a JOIN cells b ON a.m = b.m
           GROUP BY 1, 2),
         rj AS (SELECT trt, SUM(r) AS rsum, COUNT(*) AS nb,
             CAST(substring(trt, 1, 1) AS DOUBLE) AS j
           FROM rk GROUP BY 1),
         ag AS (SELECT CAST(MAX(nb) AS BIGINT) AS n_blocks,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(j * rsum) AS l_stat
           FROM rj)
         SELECT n_blocks, k, round(l_stat, 1) AS l_stat,
           round((l_stat - CAST(n_blocks AS DOUBLE)
               * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)
               * (CAST(k AS DOUBLE) + 1.0) / 4.0)
             / sqrt(CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
               * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)
               * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)
               / 144.0), 6) AS z
         FROM ag""",
    // Bartlett: 9-dp quantized ln terms over exact group moments
    "q_bartlett" ->
      """WITH m AS (SELECT l_returnflag AS g, COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
             SUM(CAST(l_quantity AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))) AS sxx
           FROM lineitem GROUP BY 1),
         t AS (SELECT n,
             CAST(round(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
               * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS DECIMAL(28,6)) AS ss
           FROM m),
         t2 AS (SELECT n, ss,
             CAST(round(ln(CAST(ss AS DOUBLE)
               / (CAST(n AS DOUBLE) - 1.0)), 9)
               AS DECIMAL(18,9)) AS lnsi,
             CAST(round(1.0 / (CAST(n AS DOUBLE) - 1.0), 12)
               AS DECIMAL(18,12)) AS inv
           FROM t),
         ag AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(*) AS BIGINT) AS k, SUM(ss) AS ssp,
             SUM(CAST(n - 1 AS DECIMAL(18,0)) * lnsi) AS slns,
             SUM(inv) AS sinv
           FROM t2),
         f AS (SELECT nn, k, ssp, slns, sinv,
             CAST(round(ln(CAST(ssp AS DOUBLE)
               / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))), 9)
               AS DECIMAL(18,9)) AS lnsp
           FROM ag)
         SELECT nn AS n, k,
           round(((CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))
               * CAST(lnsp AS DOUBLE) - CAST(slns AS DOUBLE))
             / (1.0 + (CAST(sinv AS DOUBLE)
               - 1.0 / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
               / (3.0 * (CAST(k AS DOUBLE) - 1.0))), 6) AS chi2,
           CAST(k - 1 AS BIGINT) AS df
         FROM f""",
    // Breusch-Pagan: frozen 6-dp line, 2-dp requantized residuals
    "q_breusch_pagan" ->
      """WITH m AS (SELECT COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_quantity AS DECIMAL(19,2))) AS sxx,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_extendedprice AS DECIMAL(19,2))) AS sxy
           FROM lineitem),
         c AS (SELECT
             CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
               AS DECIMAL(18,6)) AS b,
             CAST(round((CAST(sy AS DOUBLE)
                 - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
               AS DECIMAL(18,6)) AS a
           FROM m),
         r AS (SELECT CAST(l_quantity AS DECIMAL(12,2)) AS x,
             CAST(round(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                 - (a + b * CAST(l_quantity AS DECIMAL(12,2)))
                 AS DOUBLE)
               * CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                 - (a + b * CAST(l_quantity AS DECIMAL(12,2)))
                 AS DOUBLE), 2) AS DECIMAL(19,2)) AS e2
           FROM lineitem CROSS JOIN c),
         ag AS (SELECT COUNT(*) AS n, SUM(x) AS sx,
             SUM(CAST(x AS DECIMAL(19,2))
               * CAST(x AS DECIMAL(19,2))) AS sxx,
             SUM(e2) AS se,
             SUM(CAST(x AS DECIMAL(19,2)) * e2) AS sxe,
             SUM(CAST(e2 AS DECIMAL(19,2))
               * CAST(e2 AS DECIMAL(19,2))) AS see
           FROM r)
         SELECT CAST(n AS BIGINT) AS n,
           round(CAST(n AS DOUBLE)
             * ((CAST(sxe AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(se AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sxe AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(se AS DOUBLE) / CAST(n AS DOUBLE)))
             / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(see AS DOUBLE) - CAST(se AS DOUBLE)
                 * CAST(se AS DOUBLE) / CAST(n AS DOUBLE))), 6)
             AS lm_stat,
           CAST(1 AS BIGINT) AS df
         FROM ag""",
    // Cook's distance: per-row doubles off broadcast exact moments
    "q_cooks_distance" ->
      """WITH m AS (SELECT COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_quantity AS DECIMAL(19,2))) AS sxx,
             SUM(CAST(l_quantity AS DECIMAL(19,2))
               * CAST(l_extendedprice AS DECIMAL(19,2))) AS sxy
           FROM lineitem),
         c AS (SELECT n, sx, sxx,
             CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
               AS DECIMAL(18,6)) AS b,
             CAST(round((CAST(sy AS DOUBLE)
                 - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
               AS DECIMAL(18,6)) AS a
           FROM m),
         r AS (SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DECIMAL(12,2)) AS x,
             CAST(round(CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                 - (a + b * CAST(l_quantity AS DECIMAL(12,2)))
                 AS DOUBLE)
               * CAST(CAST(l_extendedprice AS DECIMAL(14,2))
                 - (a + b * CAST(l_quantity AS DECIMAL(12,2)))
                 AS DOUBLE), 2) AS DECIMAL(19,2)) AS e2,
             n, sx, sxx
           FROM lineitem CROSS JOIN c),
         s AS (SELECT MAX(CAST(n AS DOUBLE)) AS nd,
             MAX(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS xbar,
             MAX(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
               * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS csxx,
             CAST(SUM(e2) AS DOUBLE)
               / (MAX(CAST(n AS DOUBLE)) - 2.0) AS s2
           FROM r),
         d AS (SELECT l_orderkey, l_linenumber,
             CAST(x AS DOUBLE) AS quantity,
             1.0 / nd + (CAST(x AS DOUBLE) - xbar)
               * (CAST(x AS DOUBLE) - xbar) / csxx AS h, e2, s2
           FROM r CROSS JOIN s)
         SELECT l_orderkey, l_linenumber, quantity,
           round(CAST(e2 AS DOUBLE) * h
             / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 9) AS d_cook,
           round(h, 9) AS leverage
         FROM d
         ORDER BY d_cook DESC, l_orderkey, l_linenumber LIMIT 10""",
    // ICC(1,1): quantized per-group pieces, scale-free readouts only
    "q_icc" ->
      """WITH g AS (SELECT o_orderpriority AS g, COUNT(*) AS ng,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(o_totalprice AS DECIMAL(19,2))
               * CAST(o_totalprice AS DECIMAL(19,2))) AS syy
           FROM orders GROUP BY 1),
         t AS (SELECT ng, sy, syy,
             CAST(round(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
               / CAST(ng AS DOUBLE), 4) AS DECIMAL(28,4)) AS bg
           FROM g),
         ag AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(ng * ng) AS sn2, SUM(sy) AS sy, SUM(syy) AS syy,
             SUM(bg) AS sbg
           FROM t),
         d AS (SELECT n, k,
             (CAST(sbg AS DOUBLE) - CAST(sy AS DOUBLE)
               * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(k AS DOUBLE) - 1.0) AS msb,
             (CAST(syy AS DOUBLE) - CAST(sbg AS DOUBLE))
               / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) AS msw,
             (CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE)
               / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0) AS k0
           FROM ag)
         SELECT n, k, round(msb / msw, 6) AS f_ratio,
           round((msb - msw) / (msb + (k0 - 1.0) * msw), 6) AS icc
         FROM d""",
    // variance ratio: exact moment sums of both difference series
    "q_variance_ratio" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         d2 AS (SELECT
             CAST(rev - lag(rev, 1) OVER (ORDER BY day)
               AS DECIMAL(18,2)) AS x,
             CAST(rev - lag(rev, 5) OVER (ORDER BY day)
               AS DECIMAL(18,2)) AS y
           FROM daily),
         ag AS (SELECT
             SUM(CASE WHEN x IS NOT NULL THEN 1 END) AS nx,
             SUM(x) AS sx,
             SUM(CAST(x AS DECIMAL(19,2))
               * CAST(x AS DECIMAL(19,2))) AS sx2,
             SUM(CASE WHEN y IS NOT NULL THEN 1 END) AS ny,
             SUM(y) AS sy,
             SUM(CAST(y AS DECIMAL(19,2))
               * CAST(y AS DECIMAL(19,2))) AS sy2
           FROM d2)
         SELECT CAST(nx AS BIGINT) AS n_1d,
           CAST(ny AS BIGINT) AS n_5d,
           round(((CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE)
               * CAST(sy AS DOUBLE) / CAST(ny AS DOUBLE))
               / CAST(ny AS DOUBLE))
             / (5.0 * ((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)
               * CAST(sx AS DOUBLE) / CAST(nx AS DOUBLE))
               / CAST(nx AS DOUBLE))), 6) AS variance_ratio
         FROM ag""",
    // spectral entropy: quantized trig powers, 9-dp p ln p terms
    "q_spectral_entropy" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         mn AS (SELECT CAST(round(CAST(SUM(rev) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 2) AS DECIMAL(18,2)) AS mu
           FROM daily),
         ts AS (SELECT row_number() OVER (ORDER BY day) - 1 AS t,
             CAST(rev - mu AS DECIMAL(19,2)) AS dev
           FROM daily CROSS JOIN mn),
         pr AS (SELECT CAST(range AS BIGINT) AS period
           FROM range(2, 31)),
         g AS (SELECT period,
             dev * CAST(round(cos(6.283185307179586
               * CAST(t % period AS DOUBLE)
               / CAST(period AS DOUBLE)), 9) AS DECIMAL(12,9)) AS tc,
             dev * CAST(round(sin(6.283185307179586
               * CAST(t % period AS DOUBLE)
               / CAST(period AS DOUBLE)), 9) AS DECIMAL(12,9)) AS tsn
           FROM ts CROSS JOIN pr),
         pwt AS (SELECT period,
             CAST(SUM(tc) AS DOUBLE) * CAST(SUM(tc) AS DOUBLE)
             + CAST(SUM(tsn) AS DOUBLE) * CAST(SUM(tsn) AS DOUBLE)
               AS pw
           FROM g GROUP BY 1),
         tot AS (SELECT SUM(CAST(round(pw, 2) AS DECIMAL(38,2)))
             AS ptot
           FROM pwt),
         terms AS (SELECT CAST(round(pw / CAST(ptot AS DOUBLE)
               * ln(pw / CAST(ptot AS DOUBLE)), 9)
               AS DECIMAL(18,9)) AS term
           FROM pwt CROSS JOIN tot)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_freqs,
           round(-CAST(SUM(term) AS DOUBLE), 6) AS entropy,
           round(-CAST(SUM(term) AS DOUBLE)
             / ln(CAST(COUNT(*) AS DOUBLE)), 6) AS normalized
         FROM terms""",
    // turning points: integer peak/trough counting
    "q_turning_points" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         lagd AS (SELECT rev,
             lag(rev, 1) OVER (ORDER BY day) AS prv,
             lead(rev, 1) OVER (ORDER BY day) AS nxt
           FROM daily),
         t AS (SELECT * FROM lagd
           WHERE prv IS NOT NULL AND nxt IS NOT NULL),
         ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_interior,
             CAST(SUM(CASE WHEN (rev > prv AND rev > nxt)
               OR (rev < prv AND rev < nxt) THEN 1 ELSE 0 END)
               AS BIGINT) AS turning_points
           FROM t)
         SELECT n_interior, turning_points,
           round((CAST(turning_points AS DOUBLE)
             - 2.0 * CAST(n_interior AS DOUBLE) / 3.0)
             / sqrt((16.0 * (CAST(n_interior AS DOUBLE) + 2.0)
               - 29.0) / 90.0), 6) AS z
         FROM ag""",
    // Mantel-Haenszel: 9-dp quantized stratum terms, exact counts
    "q_mantel_haenszel" ->
      """WITH cells AS (SELECT c_nationkey AS strat,
             SUM(CASE WHEN c_mktsegment = 'BUILDING'
               AND c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN c_mktsegment = 'BUILDING'
               AND NOT (c_acctbal > 5000.0) THEN 1 ELSE 0 END) AS b,
             SUM(CASE WHEN c_mktsegment <> 'BUILDING'
               AND c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS c,
             SUM(CASE WHEN c_mktsegment <> 'BUILDING'
               AND NOT (c_acctbal > 5000.0) THEN 1 ELSE 0 END) AS d
           FROM customer GROUP BY 1),
         t AS (SELECT a, b, c, d, a + b + c + d AS n FROM cells),
         q AS (SELECT a,
             CAST(round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
               / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9)) AS tad,
             CAST(round(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
               / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9)) AS tbc
           FROM t)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(a) AS BIGINT) AS n_exposed_hi,
           round(CAST(SUM(tad) AS DOUBLE)
             / CAST(SUM(tbc) AS DOUBLE), 6) AS or_mh
         FROM q""",
    // Atkinson(1): log-space geometric mean, 9-dp ln terms
    "q_atkinson" ->
      """WITH spend AS (SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
           FROM orders GROUP BY 1),
         ag AS (SELECT COUNT(*) AS n, SUM(y) AS sy,
             SUM(CAST(round(ln(CAST(y AS DOUBLE)), 9)
               AS DECIMAL(18,9))) AS slny
           FROM spend)
         SELECT CAST(n AS BIGINT) AS n_cust,
           round(1.0 - exp(CAST(slny AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6)
             AS atkinson_1
         FROM ag""",
    // rich club: degree-thresholded edge counts over the edge set
    "q_rich_club" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
             FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
               AND a.l_suppkey <> b.l_suppkey),
         deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
         ks AS (SELECT CAST(CASE WHEN range = 0 THEN 2
             WHEN range = 1 THEN 5 ELSE 10 END AS BIGINT) AS k
           FROM range(0, 3)),
         nk0 AS (SELECT k, COUNT(*) AS cnt
           FROM deg CROSS JOIN ks WHERE deg > k GROUP BY 1),
         nk AS (SELECT ks.k, CAST(coalesce(cnt, 0) AS BIGINT) AS n_k
           FROM ks LEFT JOIN nk0 ON ks.k = nk0.k),
         ek AS (SELECT k, COUNT(*) AS e_k
           FROM e JOIN deg ds ON e.src = ds.src
             JOIN deg dd ON e.dst = dd.src
             CROSS JOIN ks
           WHERE ds.deg > k AND dd.deg > k GROUP BY 1)
         SELECT k, n_k,
           CAST(coalesce(e_k, 0) AS BIGINT) AS e_k,
           round(CASE WHEN n_k > 1 THEN CAST(coalesce(e_k, 0) AS DOUBLE)
             / (CAST(n_k AS DOUBLE) * (CAST(n_k AS DOUBLE) - 1.0))
             ELSE 0.0 END, 6) AS phi
         FROM nk LEFT JOIN ek USING (k) ORDER BY k""",
    // Brier/ECE/MCE: integer score algebra over the 10-bin grid
    "q_brier_ece" ->
      """WITH sc AS (SELECT
             LEAST(CAST(n_chars AS BIGINT) // 100, 9) AS bin,
             LEAST(CAST(n_chars AS BIGINT), 1000) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS hit
           FROM documents),
         bins AS (SELECT bin, COUNT(*) AS nb, SUM(s) AS ssum,
             SUM(hit) AS hits,
             SUM((s - 1000 * hit) * (s - 1000 * hit)) AS sqsum
           FROM sc GROUP BY 1),
         ag AS (SELECT SUM(nb) AS n_docs, SUM(sqsum) AS sq,
             SUM(abs(ssum - 1000 * hits)) AS gaps,
             MAX(abs(CAST(ssum - 1000 * hits AS DOUBLE))
               / (1000.0 * CAST(nb AS DOUBLE))) AS mce0
           FROM bins)
         SELECT CAST(n_docs AS BIGINT) AS n_docs,
           round(CAST(sq AS DOUBLE)
             / (1000000.0 * CAST(n_docs AS DOUBLE)), 6) AS brier,
           round(CAST(gaps AS DOUBLE)
             / (1000.0 * CAST(n_docs AS DOUBLE)), 6) AS ece,
           round(mce0, 6) AS mce
         FROM ag""",
    // MCC trio: four exact counts, identical-text double formulas
    "q_mcc" ->
      """WITH ag AS (SELECT
             CAST(SUM(CASE WHEN n_chars >= 500 AND lang = 'en'
               THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN n_chars >= 500 AND lang <> 'en'
               THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN n_chars < 500 AND lang = 'en'
               THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN n_chars < 500 AND lang <> 'en'
               THEN 1 ELSE 0 END) AS BIGINT) AS tn
           FROM documents)
         SELECT tp, fp, fn, tn,
           round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
             - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
             / sqrt((CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE))
               * (CAST(tp AS DOUBLE) + CAST(fn AS DOUBLE))
               * (CAST(tn AS DOUBLE) + CAST(fp AS DOUBLE))
               * (CAST(tn AS DOUBLE) + CAST(fn AS DOUBLE))), 6)
             AS mcc,
           round(CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE)
               + CAST(fn AS DOUBLE))
             + CAST(tn AS DOUBLE) / (CAST(tn AS DOUBLE)
               + CAST(fp AS DOUBLE)) - 1.0, 6) AS youden_j,
           round((CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE)
               + CAST(fn AS DOUBLE))
             + CAST(tn AS DOUBLE) / (CAST(tn AS DOUBLE)
               + CAST(fp AS DOUBLE))) / 2.0, 6) AS balanced_acc
         FROM ag""",
    // Siegel repeated medians: nested exact percentile_disc
    "q_siegel_slopes" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(round(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS DECIMAL(18,6)) AS y
           FROM events GROUP BY 1, 2),
         slopes AS (SELECT a.event_type, a.day AS day_a,
             CAST(round(CAST(b.y - a.y AS DOUBLE)
               / CAST(date_diff('day', a.day, b.day) AS DOUBLE), 9)
               AS DECIMAL(18,9)) AS slope
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day <> b.day),
         perpoint AS (SELECT event_type, day_a,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY slope) AS ms
           FROM slopes GROUP BY 1, 2)
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           round(CAST(percentile_disc(0.5)
             WITHIN GROUP (ORDER BY ms) AS DOUBLE), 9)
             AS siegel_slope
         FROM perpoint GROUP BY 1 ORDER BY event_type""",
    // Qn robust scale: exact quartile of pairwise absolute diffs
    "q_qn_scale" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders
           WHERE year(CAST(o_orderdate AS DATE)) = 1995 GROUP BY 1),
         idx AS (SELECT row_number() OVER (ORDER BY day) AS i, rev
           FROM daily),
         pairs AS (SELECT abs(a.rev - b.rev) AS d
           FROM idx a JOIN idx b ON a.i < b.i),
         ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             round(CAST(percentile_disc(0.25)
               WITHIN GROUP (ORDER BY d) AS DOUBLE), 2) AS qn_raw
           FROM pairs)
         SELECT n_pairs, qn_raw,
           round(2.21914 * qn_raw, 2) AS qn_scaled
         FROM ag""",
    // Paasche + Fisher: once-rounded prices, exact basket products
    "q_fisher_index" ->
      """WITH li AS (SELECT year(CAST(l_shipdate AS DATE)) AS yr,
             l_partkey,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS ep,
             CAST(l_quantity AS DECIMAL(12,2)) AS q
           FROM lineitem),
         pp AS (SELECT yr, l_partkey,
             CAST(round(CAST(SUM(ep) AS DOUBLE)
               / CAST(SUM(q) AS DOUBLE), 6) AS DECIMAL(18,6)) AS avgp,
             CAST(SUM(q) AS DECIMAL(19,2)) AS qty
           FROM li GROUP BY 1, 2),
         base AS (SELECT l_partkey, avgp AS pb, qty AS qb
           FROM pp WHERE yr = 1995),
         j AS (SELECT pp.yr, COUNT(*) AS n_parts,
             SUM(pp.avgp * base.qb) AS lnum,
             SUM(base.pb * base.qb) AS lden,
             SUM(pp.avgp * pp.qty) AS pnum,
             SUM(base.pb * pp.qty) AS pden
           FROM pp JOIN base USING (l_partkey) GROUP BY 1)
         SELECT CAST(yr AS BIGINT) AS yr,
           CAST(n_parts AS BIGINT) AS n_parts,
           round(CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE), 6)
             AS laspeyres,
           round(CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE), 6)
             AS paasche,
           round(sqrt(CAST(lnum AS DOUBLE) / CAST(lden AS DOUBLE)
             * (CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE))), 6)
             AS fisher
         FROM j ORDER BY yr""",
    // PACF: Durbin-Levinson over exact centered lag cross-sums
    "q_pacf" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         mn AS (SELECT CAST(round(CAST(SUM(rev) AS DOUBLE)
             / COUNT(*), 6) AS DECIMAL(18,6)) AS mu
           FROM daily),
         dev AS (SELECT day,
             CAST(rev - mu AS DECIMAL(18,6)) AS e
           FROM daily CROSS JOIN mn),
         lagd AS (SELECT e,
             lag(e, 1) OVER (ORDER BY day) AS e1,
             lag(e, 2) OVER (ORDER BY day) AS e2,
             lag(e, 3) OVER (ORDER BY day) AS e3
           FROM dev),
         cs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(e AS DECIMAL(19,6))
               * CAST(e AS DECIMAL(19,6))) AS c0,
             SUM(CAST(e AS DECIMAL(19,6))
               * CAST(e1 AS DECIMAL(19,6))) AS c1,
             SUM(CAST(e AS DECIMAL(19,6))
               * CAST(e2 AS DECIMAL(19,6))) AS c2,
             SUM(CAST(e AS DECIMAL(19,6))
               * CAST(e3 AS DECIMAL(19,6))) AS c3
           FROM lagd),
         r AS (SELECT n,
             CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r1,
             CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r2,
             CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE) AS r3
           FROM cs),
         p AS (SELECT n, r1, r2, r3,
             (r2 - r1 * r1) / (1.0 - r1 * r1) AS p2
           FROM r),
         q AS (SELECT n, r1, r2, r3, p2,
             r1 * (1.0 - p2) AS a21
           FROM p)
         SELECT n, round(r1, 6) AS acf1, round(r2, 6) AS acf2,
           round(r3, 6) AS acf3, round(r1, 6) AS pacf1,
           round(p2, 6) AS pacf2,
           round((r3 - a21 * r2 - p2 * r1)
             / (1.0 - a21 * r1 - p2 * r2), 6) AS pacf3
         FROM q""",
    // seasonal strength: exact 7x-scaled detrend, rounded profile
    "q_seasonal_strength" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(19,2)) AS rev
           FROM orders GROUP BY 1),
         win AS (SELECT day, rev,
             SUM(rev) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ms,
             COUNT(*) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt
           FROM daily),
         det AS (SELECT day,
             CAST(rev * 7 - ms AS DECIMAL(19,2)) AS d7,
             dayofweek(day) AS wd
           FROM win WHERE cnt = 7),
         prof AS (SELECT wd,
             CAST(round(CAST(SUM(d7) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 2) AS DECIMAL(18,2)) AS s7
           FROM det GROUP BY 1),
         j AS (SELECT d7, CAST(d7 - s7 AS DECIMAL(19,2)) AS r7
           FROM det JOIN prof USING (wd)),
         ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(d7) AS sd, SUM(r7) AS sr,
             SUM(CAST(d7 AS DECIMAL(19,2))
               * CAST(d7 AS DECIMAL(19,2))) AS sdd,
             SUM(CAST(r7 AS DECIMAL(19,2))
               * CAST(r7 AS DECIMAL(19,2))) AS srr
           FROM j)
         SELECT n_days,
           round(greatest(0.0, 1.0
             - (CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE)
                 * CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE))
               / (CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE)
                 * CAST(sd AS DOUBLE) / CAST(n_days AS DOUBLE))), 6)
             AS seasonal_strength
         FROM ag""",
    // Mood's median: exact global median element, k x 2 chi-square
    "q_moods_median" ->
      """WITH o AS (SELECT o_orderpriority AS g,
             CAST(o_totalprice AS DECIMAL(18,2)) AS y
           FROM orders),
         med AS (SELECT percentile_disc(0.5)
             WITHIN GROUP (ORDER BY y) AS med
           FROM o),
         cells AS (SELECT g,
             SUM(CASE WHEN y > med THEN 1 ELSE 0 END) AS ab,
             SUM(CASE WHEN y <= med THEN 1 ELSE 0 END) AS be
           FROM o CROSS JOIN med GROUP BY 1),
         tot AS (SELECT SUM(ab) AS ta, SUM(be) AS tb FROM cells),
         terms AS (SELECT
             CAST(round(
               (CAST(ab AS DOUBLE) - CAST(ab + be AS DOUBLE)
                 * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE))
               * (CAST(ab AS DOUBLE) - CAST(ab + be AS DOUBLE)
                 * CAST(ta AS DOUBLE) / CAST(ta + tb AS DOUBLE))
               / (CAST(ab + be AS DOUBLE) * CAST(ta AS DOUBLE)
                 / CAST(ta + tb AS DOUBLE))
             + (CAST(be AS DOUBLE) - CAST(ab + be AS DOUBLE)
                 * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE))
               * (CAST(be AS DOUBLE) - CAST(ab + be AS DOUBLE)
                 * CAST(tb AS DOUBLE) / CAST(ta + tb AS DOUBLE))
               / (CAST(ab + be AS DOUBLE) * CAST(tb AS DOUBLE)
                 / CAST(ta + tb AS DOUBLE)), 9) AS DECIMAL(18,9))
               AS term, ta, tb
           FROM cells CROSS JOIN tot)
         SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(MAX(ta + tb) AS BIGINT) AS n,
           round(CAST(SUM(term) AS DOUBLE), 6) AS chi2,
           CAST(COUNT(*) - 1 AS BIGINT) AS df
         FROM terms""",
    // entropy rate: stationary-weighted row entropies, 12-dp terms
    "q_entropy_rate" -> {
      def piter(k: Int): String =
        s"""s$k AS (SELECT p.next_type AS state,
               SUM(CAST(round(CAST(pp.pi AS DOUBLE)
                 * CAST(p.p AS DOUBLE), 12) AS DECIMAL(28,12))) AS ps
             FROM p JOIN pi${k - 1} pp ON pp.state = p.prev_type
             GROUP BY 1),
           pi$k AS (SELECT st.state,
               CAST(round(CAST(coalesce(ps, 0) AS DOUBLE), 12)
                 AS DECIMAL(28,12)) AS pi
             FROM states st LEFT JOIN s$k ON st.state = s$k.state)"""
      s"""WITH tr AS (SELECT event_type AS prev_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         cnt AS (SELECT prev_type, next_type, COUNT(*) AS n
           FROM tr WHERE next_type IS NOT NULL GROUP BY 1, 2),
         p AS (SELECT prev_type, next_type,
             CAST(round(CAST(n AS DOUBLE) / CAST(SUM(n) OVER
               (PARTITION BY prev_type) AS DOUBLE), 9)
               AS DECIMAL(12,9)) AS p
           FROM cnt),
         states AS (SELECT DISTINCT prev_type AS state FROM p),
         kk AS (SELECT COUNT(*) AS k FROM states),
         pi0 AS (SELECT state,
             CAST(round(1.0 / k, 12) AS DECIMAL(28,12)) AS pi
           FROM states CROSS JOIN kk),
         ${piter(1)},
         ${piter(2)},
         ${piter(3)},
         ${piter(4)},
         terms AS (SELECT CAST(round(CAST(pi AS DOUBLE)
               * CAST(p.p AS DOUBLE) * ln(CAST(p.p AS DOUBLE)), 12)
               AS DECIMAL(18,12)) AS term
           FROM p JOIN pi4 ON pi4.state = p.prev_type)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           round(-CAST(SUM(term) AS DOUBLE), 6) AS entropy_rate
         FROM terms"""
    },
    // ABC classes: exact integer cross-multiplied boundaries
    "q_abc_analysis" ->
      """WITH pp AS (SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
           FROM lineitem GROUP BY 1),
         tot AS (SELECT SUM(rev) AS trev FROM pp),
         c AS (SELECT rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
           FROM pp),
         cl AS (SELECT rev, trev,
             CASE WHEN CAST(cum AS DECIMAL(19,2)) * 5
                 <= CAST(trev AS DECIMAL(19,2)) * 4 THEN 'A'
               WHEN CAST(cum AS DECIMAL(19,2)) * 20
                 <= CAST(trev AS DECIMAL(19,2)) * 19 THEN 'B'
               ELSE 'C' END AS cls
           FROM c CROSS JOIN tot)
         SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
           round(CAST(SUM(rev) AS DOUBLE)
             / CAST(MAX(trev) AS DOUBLE), 6) AS revenue_share
         FROM cl GROUP BY 1 ORDER BY cls""",
    // Engle-Granger: frozen line, quantized residuals, DF t-stat
    "q_cointegration" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CASE WHEN c.c_mktsegment = 'BUILDING'
               THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS y1,
             SUM(CASE WHEN c.c_mktsegment = 'MACHINERY'
               THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS y2
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
           GROUP BY 1),
         d2 AS (SELECT * FROM daily
           WHERE y1 IS NOT NULL AND y2 IS NOT NULL),
         m AS (SELECT COUNT(*) AS n, SUM(y1) AS sx, SUM(y2) AS sy,
             SUM(CAST(y1 AS DECIMAL(19,2))
               * CAST(y1 AS DECIMAL(19,2))) AS sxx,
             SUM(CAST(y1 AS DECIMAL(19,2))
               * CAST(y2 AS DECIMAL(19,2))) AS sxy
           FROM d2),
         ln0 AS (SELECT
             CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
               AS DECIMAL(18,6)) AS b,
             CAST(round((CAST(sy AS DOUBLE)
                 - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
               AS DECIMAL(18,6)) AS a
           FROM m),
         zz AS (SELECT day,
             CAST(round(CAST(y2 AS DOUBLE) - (CAST(a AS DOUBLE)
               + CAST(b AS DOUBLE) * CAST(y1 AS DOUBLE)), 4)
               AS DECIMAL(18,4)) AS z
           FROM d2 CROSS JOIN ln0),
         lz AS (SELECT
             lag(z, 1) OVER (ORDER BY day) AS zl, z
           FROM zz),
         l2 AS (SELECT zl, CAST(z - zl AS DECIMAL(18,4)) AS dz
           FROM lz WHERE zl IS NOT NULL),
         ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(CAST(zl AS DECIMAL(19,4))
               * CAST(zl AS DECIMAL(19,4))) AS szz,
             SUM(CAST(zl AS DECIMAL(19,4))
               * CAST(dz AS DECIMAL(19,4))) AS szd,
             SUM(CAST(dz AS DECIMAL(19,4))
               * CAST(dz AS DECIMAL(19,4))) AS sdd
           FROM l2),
         d AS (SELECT n_days,
             CAST(szd AS DOUBLE) / CAST(szz AS DOUBLE) AS phi,
             szz, szd, sdd
           FROM ag),
         e AS (SELECT n_days, phi, szz,
             (CAST(sdd AS DOUBLE) - phi * CAST(szd AS DOUBLE))
               / (CAST(n_days AS DOUBLE) - 2.0) AS s2
           FROM d)
         SELECT n_days, round(phi, 6) AS phi,
           round(phi * sqrt(CAST(szz AS DOUBLE)) / sqrt(s2), 6)
             AS df_stat
         FROM e""",
    // POT tail: exact p90 element, exceedance moments, MoM GPD
    "q_pot_tail" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         u AS (SELECT percentile_disc(0.9)
               WITHIN GROUP (ORDER BY rev) AS u,
             COUNT(*) AS n
           FROM daily),
         exc AS (SELECT CAST(rev - u AS DECIMAL(18,2)) AS e, u, n
           FROM daily CROSS JOIN u WHERE rev > u),
         ag AS (SELECT CAST(MAX(u) AS DOUBLE) AS threshold,
             CAST(MAX(n) AS BIGINT) AS n_days,
             CAST(COUNT(*) AS BIGINT) AS n_exc,
             SUM(e) AS se,
             SUM(CAST(e AS DECIMAL(19,2))
               * CAST(e AS DECIMAL(19,2))) AS see
           FROM exc),
         d AS (SELECT threshold, n_days, n_exc,
             CAST(se AS DOUBLE) / CAST(n_exc AS DOUBLE) AS m,
             (CAST(see AS DOUBLE) - CAST(se AS DOUBLE)
               * CAST(se AS DOUBLE) / CAST(n_exc AS DOUBLE))
               / CAST(n_exc AS DOUBLE) AS v
           FROM ag),
         f AS (SELECT threshold, n_days, n_exc,
             0.5 * (1.0 - m * m / v) AS xi,
             0.5 * m * (1.0 + m * m / v) AS beta
           FROM d)
         SELECT n_exc, threshold, round(xi, 6) AS xi,
           round(beta, 2) AS beta,
           round(threshold + beta / xi
             * (pow(365.0 * CAST(n_exc AS DOUBLE)
               / CAST(n_days AS DOUBLE), xi) - 1.0), 2)
             AS ret_level_365d
         FROM f""",
    // Pettitt: running midrank sums in day order, argmax |K|
    "q_pettitt" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         pv AS (SELECT rev, COUNT(*) AS cnt FROM daily GROUP BY 1),
         rk AS (SELECT rev,
             CAST(SUM(cnt) OVER (ORDER BY rev
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cnt AS DOUBLE)
             + (CAST(cnt AS DOUBLE) + 1.0) / 2.0 AS r
           FROM pv),
         n1 AS (SELECT COUNT(*) AS n FROM daily),
         st AS (SELECT day,
             row_number() OVER (ORDER BY day) AS t,
             SUM(r) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS st
           FROM daily JOIN rk USING (rev)),
         k AS (SELECT day, n,
             2.0 * st - CAST(t AS DOUBLE)
               * (CAST(n AS DOUBLE) + 1.0) AS k
           FROM st CROSS JOIN n1)
         SELECT day AS change_day, CAST(n AS BIGINT) AS n_days,
           round(abs(k), 1) AS k_abs,
           round(2.0 * exp(-6.0 * k * k
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               * CAST(n AS DOUBLE)
               + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
             AS p_approx
         FROM k ORDER BY k_abs DESC, change_day LIMIT 1""",
    // Cliff's delta: integer cross-products over the value grid
    "q_cliffs_delta" ->
      """WITH ps AS (SELECT n_chars AS v,
             SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS p,
             SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS q
           FROM documents GROUP BY 1),
         c AS (SELECT p, q,
             SUM(q) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - q AS cq,
             SUM(p) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - p AS cp
           FROM ps),
         ag AS (SELECT CAST(SUM(p) AS BIGINT) AS n_en,
             CAST(SUM(q) AS BIGINT) AS n_rest,
             SUM(p * cq) AS gt, SUM(q * cp) AS lt
           FROM c)
         SELECT n_en, n_rest,
           round((CAST(gt AS DOUBLE) - CAST(lt AS DOUBLE))
             / (CAST(n_en AS DOUBLE) * CAST(n_rest AS DOUBLE)), 6)
             AS cliffs_delta
         FROM ag""",
    // median polish: exact median elements, exact DECIMAL sweeps
    "q_median_polish" ->
      """WITH grid AS (SELECT month(CAST(o_orderdate AS DATE)) AS m,
             o_orderpriority AS trt,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
           FROM orders
           WHERE year(CAST(o_orderdate AS DATE)) = 1995
           GROUP BY 1, 2),
         r1 AS (SELECT m, percentile_disc(0.5)
             WITHIN GROUP (ORDER BY v) AS re
           FROM grid GROUP BY m),
         g1 AS (SELECT g.m, g.trt, g.v - r1.re AS v
           FROM grid g JOIN r1 ON g.m = r1.m),
         c1 AS (SELECT trt, percentile_disc(0.5)
             WITHIN GROUP (ORDER BY v) AS ce
           FROM g1 GROUP BY trt),
         g2 AS (SELECT g1.m, g1.trt, g1.v - c1.ce AS v
           FROM g1 JOIN c1 ON g1.trt = c1.trt),
         r2 AS (SELECT m, percentile_disc(0.5)
             WITHIN GROUP (ORDER BY v) AS re
           FROM g2 GROUP BY m),
         g3 AS (SELECT g2.m, g2.trt, g2.v - r2.re AS v
           FROM g2 JOIN r2 ON g2.m = r2.m),
         c2 AS (SELECT trt, percentile_disc(0.5)
             WITHIN GROUP (ORDER BY v) AS ce
           FROM g3 GROUP BY trt),
         g4 AS (SELECT g3.m, g3.trt, g3.v - c2.ce AS v
           FROM g3 JOIN c2 ON g3.trt = c2.trt),
         mx AS (SELECT CAST(MAX(abs(v)) AS DOUBLE) AS max_resid
           FROM g4)
         SELECT c1.trt AS trt,
           round(CAST(c1.ce + c2.ce AS DOUBLE), 2) AS col_effect,
           round(max_resid, 2) AS max_abs_resid
         FROM c1 JOIN c2 ON c1.trt = c2.trt CROSS JOIN mx
         ORDER BY 1""",
    // seasonal MK: within-weekday pairs, exact variance terms
    "q_seasonal_mk" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         dd AS (SELECT day, rev, dayofweek(day) AS wd FROM daily),
         s AS (SELECT SUM(CASE WHEN b.rev > a.rev THEN 1
               WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS s_stat
           FROM dd a JOIN dd b
             ON a.wd = b.wd AND a.day < b.day),
         vr AS (SELECT CAST(SUM(nw) AS BIGINT) AS n_days,
             SUM(nw * (nw - 1) * (2 * nw + 5)) AS var18
           FROM (SELECT wd, COUNT(*) AS nw FROM dd GROUP BY 1))
         SELECT n_days, CAST(s_stat AS BIGINT) AS s_stat,
           round(CAST(s_stat AS DOUBLE)
             / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6) AS z
         FROM s CROSS JOIN vr""",
    // Hoover index: integer-scaled exact deviation sums
    "q_hoover" ->
      """WITH spend AS (SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(19,2)) AS y
           FROM orders GROUP BY 1),
         tot AS (SELECT COUNT(*) AS n,
             CAST(SUM(y) AS DECIMAL(19,2)) AS t
           FROM spend),
         dev AS (SELECT abs(y * CAST(n AS DECIMAL(10,0)) - t) AS dev,
             n, t
           FROM spend CROSS JOIN tot)
         SELECT CAST(MAX(n) AS BIGINT) AS n_cust,
           round(CAST(SUM(dev) AS DOUBLE)
             / (2.0 * CAST(MAX(n) AS DOUBLE)
               * CAST(MAX(t) AS DOUBLE)), 6) AS hoover_index
         FROM dev""",
    // Palma ratio: exact integer rank thresholds over the dimension
    "q_palma" ->
      """WITH spend AS (SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
           FROM orders GROUP BY 1),
         n1 AS (SELECT COUNT(*) AS n FROM spend),
         rk AS (SELECT y,
             row_number() OVER (ORDER BY y, o_custkey) AS rk
           FROM spend),
         ag AS (SELECT CAST(MAX(n) AS BIGINT) AS n_cust,
             SUM(CASE WHEN rk * 10 > n * 9 THEN y END) AS top10,
             SUM(CASE WHEN rk * 10 <= n * 4 THEN y END) AS bot40
           FROM rk CROSS JOIN n1)
         SELECT n_cust,
           round(CAST(top10 AS DOUBLE) / CAST(bot40 AS DOUBLE), 6)
             AS palma_ratio
         FROM ag""",
    // cross-slice brute-force near-dup truth (the Spark side is banded
    // LSH + exact verify — same pair set, never all-pairs)
    "q_contamination_fuzzy" ->
      """WITH w AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), x -> x <> '') AS ws
           FROM documents),
         t AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(ws)-1, 2)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS tg
           FROM w),
         p AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             round(CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE) /
               (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg))), 6)
               AS jaccard
           FROM t a JOIN t b ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE) /
             (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg))) >= 0.5),
         sel AS (
           SELECT CASE WHEN doc_a % 50 = 0 THEN doc_a ELSE doc_b END
               AS bench_id,
             CASE WHEN doc_a % 50 = 0 THEN doc_b ELSE doc_a END
               AS train_id,
             jaccard
           FROM p)
         SELECT bench_id, train_id, jaccard FROM sel
         WHERE bench_id % 50 = 0 AND NOT (train_id % 50 = 0)
         ORDER BY bench_id, train_id""",
    // the full curriculum schedule replayed: quantile_cont boundaries,
    // bucket-by-comparison (no rank), md5-fold keep at decile/10
    "q_curriculum_mix" ->
      """WITH b AS (SELECT quantile_cont(n_chars,
             [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
           FROM documents),
         d AS (SELECT doc_id,
             CAST(1 + len(list_filter(b.bs, x -> n_chars > x)) AS INTEGER)
               AS decile
           FROM documents, b),
         u AS (SELECT doc_id, decile,
             md5('7:' || CAST(doc_id AS VARCHAR)) AS h FROM d),
         v AS (SELECT doc_id, decile, list_reduce(list_transform(
             range(1, 9),
             i -> CAST(strpos('0123456789abcdef', h[i:i]) - 1 AS BIGINT)),
             (a, dd) -> a * 16 + dd) AS hv
           FROM u),
         s AS (SELECT doc_id, decile,
             round((CAST(hv AS DOUBLE) + 0.5) / 4294967296.0, 6) AS split_u
           FROM v)
         SELECT decile, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN split_u < decile / 10.0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_kept
         FROM s GROUP BY decile ORDER BY decile""",
    // both matryoshka stages replayed: 16-dim slice cosine, rounded-rank
    // candidate cut at 50, full-dim rerank to 10
    "q_domain_cap" ->
      """WITH r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS rnk
           FROM documents)
         SELECT source, COUNT(*) AS n_kept, MAX(doc_id) AS max_kept_id
         FROM r WHERE rnk <= 50
         GROUP BY source ORDER BY source""",
    "q_triangle_count" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
           FROM lineitem WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
             AND a.l_suppkey < b.l_suppkey),
         wed AS (SELECT x.u AS wu, x.v AS wv, y.v AS ww
           FROM e x JOIN e y ON x.v = y.u),
         tri AS (SELECT wu, wv, ww
           FROM wed JOIN e cl ON wed.wu = cl.u AND wed.ww = cl.v),
         corners AS (SELECT wu AS node FROM tri
           UNION ALL SELECT wv FROM tri
           UNION ALL SELECT ww FROM tri)
         SELECT node, COUNT(*) AS n_triangles
         FROM corners GROUP BY node
         ORDER BY n_triangles DESC, node LIMIT 10""",
    "q_clustering_coeff" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
           FROM lineitem WHERE l_quantity <= 2),
         ed AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
             AND a.l_suppkey <> b.l_suppkey),
         e AS (SELECT src AS u, dst AS v FROM ed WHERE src < dst),
         wed AS (SELECT x.u AS wu, x.v AS wv, y.v AS ww
           FROM e x JOIN e y ON x.v = y.u),
         tri AS (SELECT wu, wv, ww
           FROM wed JOIN e cl ON wed.wu = cl.u AND wed.ww = cl.v),
         corners AS (SELECT wu AS node FROM tri
           UNION ALL SELECT wv FROM tri
           UNION ALL SELECT ww FROM tri),
         tpn AS (SELECT node, COUNT(*) AS t FROM corners GROUP BY node),
         deg AS (SELECT src AS node, COUNT(*) AS d FROM ed GROUP BY src),
         n2 AS (SELECT deg.node, d, COALESCE(t, 0) AS t
           FROM deg LEFT JOIN tpn ON deg.node = tpn.node WHERE d >= 2)
         SELECT COUNT(*) AS n_nodes,
           CAST(SUM(t) // 3 AS BIGINT) AS n_triangles,
           round(2.0 * CAST(SUM(t) AS DOUBLE)
             / CAST(SUM(d * (d - 1)) AS DOUBLE), 6) AS global_cc,
           round(CAST(SUM(CAST(round(2.0 * t
               / (CAST(d AS DOUBLE) * CAST(d - 1 AS DOUBLE)), 9)
             AS DECIMAL(18,9))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_local_cc
         FROM n2""",
    "q_kcore" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
           FROM lineitem WHERE l_quantity <= 2),
         ed0 AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
             AND a.l_suppkey <> b.l_suppkey),
         k1 AS (SELECT src FROM ed0 GROUP BY src HAVING COUNT(*) >= 3),
         ed1 AS (SELECT e.src, e.dst FROM ed0 e
           JOIN k1 a ON e.src = a.src JOIN k1 b ON e.dst = b.src),
         k2 AS (SELECT src FROM ed1 GROUP BY src HAVING COUNT(*) >= 3),
         ed2 AS (SELECT e.src, e.dst FROM ed1 e
           JOIN k2 a ON e.src = a.src JOIN k2 b ON e.dst = b.src),
         k3 AS (SELECT src FROM ed2 GROUP BY src HAVING COUNT(*) >= 3),
         ed3 AS (SELECT e.src, e.dst FROM ed2 e
           JOIN k3 a ON e.src = a.src JOIN k3 b ON e.dst = b.src)
         SELECT CAST(1 AS INTEGER) AS iter,
           (SELECT COUNT(DISTINCT src) FROM ed1) AS n_nodes,
           (SELECT CAST(COUNT(*) // 2 AS BIGINT) FROM ed1) AS n_edges
         UNION ALL SELECT CAST(2 AS INTEGER),
           (SELECT COUNT(DISTINCT src) FROM ed2),
           (SELECT CAST(COUNT(*) // 2 AS BIGINT) FROM ed2)
         UNION ALL SELECT CAST(3 AS INTEGER),
           (SELECT COUNT(DISTINCT src) FROM ed3),
           (SELECT CAST(COUNT(*) // 2 AS BIGINT) FROM ed3)
         ORDER BY iter""",
    "q_mann_kendall" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         p AS (SELECT CASE WHEN b.rev > a.rev THEN 1
               WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
           FROM daily a JOIN daily b ON a.day < b.day),
         n1 AS (SELECT COUNT(*) AS n FROM daily)
         SELECT n AS n_days, CAST(SUM(sgn) AS BIGINT) AS s_stat,
           round(CAST(SUM(sgn) AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0), 6)
             + 0.0 AS tau,
           CASE WHEN SUM(sgn) > 0 THEN 'increasing'
             WHEN SUM(sgn) < 0 THEN 'decreasing'
             ELSE 'no_trend' END AS trend
         FROM p CROSS JOIN n1 GROUP BY n""",
    "q_bollinger" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         win AS (SELECT day, rev,
             COUNT(*) OVER w AS cnt,
             SUM(rev) OVER w AS sm,
             SUM(rev * rev) OVER w AS s2
           FROM daily
           WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
             AND CURRENT ROW)),
         b AS (SELECT day, rev,
             CAST(sm AS DOUBLE) / 7.0 AS mean,
             sqrt(greatest((CAST(s2 AS DOUBLE)
               - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / 7.0) / 7.0,
               0.0)) AS sd
           FROM win WHERE cnt = 7)
         SELECT day, round(CAST(rev AS DOUBLE), 2) AS rev,
           round(mean, 2) AS mid,
           round(mean + 2.0 * sd, 2) AS upper,
           round(mean - 2.0 * sd, 2) AS lower
         FROM b
         WHERE CAST(rev AS DOUBLE) > mean + 2.0 * sd
           OR CAST(rev AS DOUBLE) < mean - 2.0 * sd
         ORDER BY day""",
    "q_rsi" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         lagged AS (SELECT day, rev,
             lag(rev, 1) OVER (ORDER BY day) AS prev
           FROM daily),
         gl AS (SELECT day,
             CASE WHEN rev > prev THEN rev - prev
               ELSE CAST(0 AS DECIMAL(19,2)) END AS gain,
             CASE WHEN rev < prev THEN prev - rev
               ELSE CAST(0 AS DECIMAL(19,2)) END AS loss
           FROM lagged WHERE prev IS NOT NULL),
         win AS (SELECT day,
             COUNT(*) OVER w AS cnt,
             SUM(gain) OVER w AS sg,
             SUM(loss) OVER w AS sl
           FROM gl
           WINDOW w AS (ORDER BY day ROWS BETWEEN 13 PRECEDING
             AND CURRENT ROW)),
         r AS (SELECT day,
             CASE WHEN sg + sl = 0 THEN NULL
               ELSE round(100.0 * CAST(sg AS DOUBLE)
                 / (CAST(sg AS DOUBLE) + CAST(sl AS DOUBLE)), 4)
               END AS rsi
           FROM win WHERE cnt = 14)
         SELECT day, rsi,
           CASE WHEN rsi > 70.0 THEN 'overbought'
             ELSE 'oversold' END AS signal
         FROM r WHERE rsi > 70.0 OR rsi < 30.0
         ORDER BY day""",
    "q_sax" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         mom AS (SELECT COUNT(*) AS n, SUM(rev) AS sm,
             SUM(rev * rev) AS s2
           FROM daily),
         z AS (SELECT day,
             (CAST(rev AS DOUBLE) - CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
               / sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))
               AS z
           FROM daily CROSS JOIN mom),
         syms AS (SELECT day,
             CASE WHEN z < -0.6744897501960817 THEN 'a'
               WHEN z < 0.0 THEN 'b'
               WHEN z < 0.6744897501960817 THEN 'c'
               ELSE 'd' END AS sym
           FROM z),
         tr AS (SELECT lag(sym, 1) OVER (ORDER BY day) AS sym_from,
             sym AS sym_to
           FROM syms)
         SELECT sym_from, sym_to, COUNT(*) AS n_trans
         FROM tr WHERE sym_from IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_simpson" ->
      """WITH li AS (SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
             CASE WHEN l_discount >= 0.05 THEN 'hi' ELSE 'lo' END AS grp,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
           FROM lineitem),
         st AS (SELECT CAST(yr AS VARCHAR) AS stratum,
             CAST(SUM(CASE WHEN grp = 'hi' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hi,
             CAST(SUM(CASE WHEN grp = 'hi' THEN ret ELSE 0 END)
               AS BIGINT) AS r_hi,
             CAST(SUM(CASE WHEN grp = 'lo' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_lo,
             CAST(SUM(CASE WHEN grp = 'lo' THEN ret ELSE 0 END)
               AS BIGINT) AS r_lo
           FROM li GROUP BY 1),
         pl AS (SELECT 'pooled' AS stratum,
             CAST(SUM(CASE WHEN grp = 'hi' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hi,
             CAST(SUM(CASE WHEN grp = 'hi' THEN ret ELSE 0 END)
               AS BIGINT) AS r_hi,
             CAST(SUM(CASE WHEN grp = 'lo' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_lo,
             CAST(SUM(CASE WHEN grp = 'lo' THEN ret ELSE 0 END)
               AS BIGINT) AS r_lo
           FROM li),
         allr AS (SELECT * FROM st UNION ALL SELECT * FROM pl),
         rt AS (SELECT stratum, n_hi, r_hi, n_lo, r_lo,
             CASE WHEN n_hi = 0 THEN NULL ELSE
               round(CAST(r_hi AS DOUBLE) / CAST(n_hi AS DOUBLE), 6)
             END AS rate_hi,
             CASE WHEN n_lo = 0 THEN NULL ELSE
               round(CAST(r_lo AS DOUBLE) / CAST(n_lo AS DOUBLE), 6)
             END AS rate_lo,
             CASE WHEN n_hi = 0 OR n_lo = 0 THEN NULL ELSE
               round(CAST(r_hi AS DOUBLE) / CAST(n_hi AS DOUBLE)
                 - CAST(r_lo AS DOUBLE) / CAST(n_lo AS DOUBLE), 6)
                 + 0.0
             END AS diff
           FROM allr),
         pd AS (SELECT diff AS pdiff FROM rt WHERE stratum = 'pooled')
         SELECT stratum, n_hi, rate_hi, n_lo, rate_lo, diff,
           CASE WHEN diff IS NULL OR pdiff IS NULL THEN NULL
             WHEN (diff > 0.0) <> (pdiff > 0.0) THEN 1 ELSE 0
           END AS flips
         FROM rt CROSS JOIN pd ORDER BY stratum""",
    "q_burstiness" -> {
      val sd = """sqrt(greatest((CAST(scc AS DOUBLE)
           - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
             / CAST(n_days AS DOUBLE)) / CAST(n_days AS DOUBLE), 0.0))"""
      val mu = "(CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE))"
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS c
           FROM events GROUP BY 1, 2),
         m AS (SELECT event_type, COUNT(*) AS n_days,
             CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(c * c) AS BIGINT) AS scc
           FROM daily GROUP BY 1)
         SELECT event_type, n_days,
           round($mu, 6) AS mean_daily,
           round($sd * $sd / $mu, 6) AS fano,
           round(($sd - $mu) / ($sd + $mu), 6) + 0.0 AS burstiness
         FROM m ORDER BY event_type"""
    },
    "q_price_elasticity" ->
      """WITH t AS (SELECT p_brand,
             CAST(round(ln(CAST(l_extendedprice AS DOUBLE)
                 / CAST(l_quantity AS DOUBLE)), 9) + 0.0
               AS DECIMAL(18,9)) AS x,
             CAST(round(ln(CAST(l_quantity AS DOUBLE)), 9) + 0.0
               AS DECIMAL(18,9)) AS y
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         m AS (SELECT p_brand, COUNT(*) AS n, SUM(x) AS sx,
             SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
           FROM t GROUP BY 1)
         SELECT p_brand, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0.0
             AS elasticity
         FROM m ORDER BY p_brand""",
    "q_cuped" -> {
      val theta =
        """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"""
      val raw =
        """(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
           - CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE))"""
      val dx =
        """(CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)
           - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE))"""
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
         b AS (SELECT MIN(ts_us) AS lo, MAX(ts_us) AS hi FROM ev),
         pu AS (SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'view'
                 AND ts_us < lo + (hi - lo) // 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                 AND ts_us >= lo + (hi - lo) // 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS y
           FROM ev CROSS JOIN b GROUP BY user_id),
         h AS (SELECT x, y,
             md5('11:' || CAST(user_id AS VARCHAR)) AS hh FROM pu),
         v AS (SELECT x, y, list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef', hh[i:i]) - 1 AS BIGINT)),
             (a, d) -> a * 16 + d) AS hv FROM h),
         u AS (SELECT x, y,
             round((CAST(hv AS DOUBLE) + 0.5) / 4294967296.0, 6) < 0.5
               AS in_a
           FROM v),
         m AS (SELECT COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN in_a THEN x ELSE 0 END) AS BIGINT) AS sxa,
             CAST(SUM(CASE WHEN in_a THEN y ELSE 0 END) AS BIGINT) AS sya,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE x END) AS BIGINT) AS sxb,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE y END) AS BIGINT) AS syb
           FROM u)
         SELECT na, nb,
           round($theta, 6) + 0.0 AS theta,
           round($raw, 6) + 0.0 AS raw_lift,
           round($raw - $theta * $dx, 6) + 0.0 AS cuped_lift,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS var_reduction
         FROM m"""
    },
    "q_sprt" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS k
           FROM events GROUP BY 1),
         t AS (SELECT day,
             CAST(round(ln(0.06 / 0.04), 9) AS DECIMAL(18,9)) * k
               + CAST(round(ln(0.94 / 0.96), 9) AS DECIMAL(18,9))
                 * (n - k) AS term
           FROM daily),
         c AS (SELECT day, SUM(term) OVER (ORDER BY day ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t),
         cr AS (SELECT day, cum,
             CAST(cum AS DOUBLE) > ln(19.0)
               OR CAST(cum AS DOUBLE) < -ln(19.0) AS crossed
           FROM c),
         fc AS (SELECT MIN(day) AS first_cross_day,
             min_by(CAST(cum AS DOUBLE), day) AS cum_at_cross
           FROM cr WHERE crossed),
         fr AS (SELECT round(max_by(CAST(cum AS DOUBLE), day), 6)
             AS final_llr FROM cr),
         nd AS (SELECT COUNT(*) AS n_days FROM daily)
         SELECT n_days, first_cross_day,
           CASE WHEN cum_at_cross IS NULL THEN NULL
             WHEN cum_at_cross > 0.0 THEN 'accept_h1'
             ELSE 'accept_h0' END AS decision,
           final_llr
         FROM nd CROSS JOIN fc CROSS JOIN fr""",
    "q_vec_outlier" ->
      """WITH dims AS (SELECT CAST(i AS BIGINT) AS i
             FROM generate_series(1, 64) t(i)),
         x AS (SELECT vec_id, i - 1 AS dim,
             CAST(embedding[i] AS DOUBLE) AS e
           FROM embeddings CROSS JOIN dims),
         cen AS (SELECT dim,
             CAST(round(CAST(SUM(CAST(e AS DECIMAL(28,12))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE), 9) AS DECIMAL(18,9)) AS cd
           FROM x GROUP BY dim),
         d AS (SELECT vec_id,
             SUM(CAST(round((e - CAST(cd AS DOUBLE))
               * (e - CAST(cd AS DOUBLE)), 9) AS DECIMAL(18,9))) AS d2
           FROM x JOIN cen USING (dim) GROUP BY vec_id)
         SELECT vec_id, round(CAST(d2 AS DOUBLE), 6) AS dist2
         FROM d ORDER BY dist2 DESC, vec_id LIMIT 20""",
    "q_levene" ->
      """WITH x AS (SELECT event_type,
             CAST(value AS DECIMAL(18,6)) AS x
           FROM events),
         gm AS (SELECT event_type,
             CAST(round(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
               9) AS DECIMAL(18,9)) AS gmean
           FROM x GROUP BY 1),
         z AS (SELECT x.event_type,
             CAST(round(abs(CAST(x AS DOUBLE) - CAST(gmean AS DOUBLE)),
               9) AS DECIMAL(18,9)) AS z
           FROM x JOIN gm ON x.event_type = gm.event_type),
         g AS (SELECT event_type, COUNT(*) AS gn, SUM(z) AS gsz,
             SUM(z * z) AS gszz
           FROM z GROUP BY 1),
         t AS (SELECT COUNT(*) AS k, CAST(SUM(gn) AS BIGINT) AS n,
             SUM(gsz) AS sz, SUM(gszz) AS szz,
             SUM(CAST(round(CAST(gsz AS DOUBLE) * CAST(gsz AS DOUBLE)
               / CAST(gn AS DOUBLE), 9) AS DECIMAL(28,9))) AS sgg
           FROM g)
         SELECT k, n,
           round(((CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
               / (CAST(k AS DOUBLE) - 1.0))
             * (CAST(sgg AS DOUBLE)
               - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                 / CAST(n AS DOUBLE))
             / (CAST(szz AS DOUBLE) - CAST(sgg AS DOUBLE)), 6)
             AS levene_w
         FROM t""",
    "q_readability" ->
      """WITH c AS (SELECT lang,
             CAST(len(regexp_extract_all(text, '[a-zA-Z0-9_]+'))
               AS BIGINT) AS w,
             CAST(len(regexp_extract_all(text, '[.!?]+'))
               AS BIGINT) AS snt,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
               AS BIGINT) AS syl
           FROM documents),
         g AS (SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(w) AS BIGINT) AS words,
             CAST(SUM(snt) AS BIGINT) AS sentences,
             CAST(SUM(syl) AS BIGINT) AS syllables
           FROM c GROUP BY 1)
         SELECT lang, n_docs, words, sentences, syllables,
           CASE WHEN sentences = 0 OR words = 0 THEN NULL ELSE
             round(206.835
               - 1.015 * (CAST(words AS DOUBLE)
                 / CAST(sentences AS DOUBLE))
               - 84.6 * (CAST(syllables AS DOUBLE)
                 / CAST(words AS DOUBLE)), 4)
           END AS flesch
         FROM g ORDER BY lang""",
    "q_bm25_query" ->
      """WITH w AS (SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-zA-Z0-9_]+'),
             x -> x <> '')) AS word
           FROM documents),
         tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w
                GROUP BY doc_id, word),
         qtf AS (SELECT * FROM tf
           WHERE word IN ('hash', 'join', 'scan', 'filter')),
         df AS (SELECT word, COUNT(*) AS df FROM qtf GROUP BY word),
         dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf
                GROUP BY doc_id),
         nd AS (SELECT COUNT(*) AS n_docs FROM documents),
         ad AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
                FROM dl),
         sc AS (SELECT qtf.doc_id,
             CAST(round(
               ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                 / (CAST(df AS DOUBLE) + 0.5) + 1.0)
               * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
               / (CAST(tf AS DOUBLE) + 1.2 * (0.25
                 + 0.75 * CAST(dl AS DOUBLE) / avgdl)), 6)
             AS DECIMAL(18,6)) AS term_score
           FROM qtf JOIN df USING (word) JOIN dl USING (doc_id), nd, ad),
         agg AS (SELECT doc_id, COUNT(*) AS n_terms_matched,
             SUM(term_score) AS sc
           FROM sc GROUP BY doc_id)
         SELECT doc_id, n_terms_matched,
           round(CAST(sc AS DOUBLE), 6) AS bm25
         FROM agg ORDER BY bm25 DESC, doc_id LIMIT 20""",
    "q_partial_corr" -> {
      def r(a: String, b: String) =
        s"""((CAST(n AS DOUBLE) * CAST(s$a$b AS DOUBLE)
             - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(s$a$a AS DOUBLE)
               - CAST(s$a AS DOUBLE) * CAST(s$a AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(s$b$b AS DOUBLE)
               - CAST(s$b AS DOUBLE) * CAST(s$b AS DOUBLE))))"""
      val rxy = r("x", "y"); val rxz = r("x", "z"); val ryz = r("y", "z")
      s"""WITH t AS (SELECT CAST(l_quantity AS DECIMAL(12,2)) AS x,
             CAST(l_extendedprice AS DECIMAL(14,2)) AS y,
             CAST(l_discount AS DECIMAL(8,3)) AS z
           FROM lineitem),
         m AS (SELECT COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
             SUM(x * y) AS sxy, SUM(x * z) AS sxz, SUM(y * z) AS syz,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(z * z) AS szz
           FROM t)
         SELECT n,
           round($rxy, 6) + 0.0 AS r_xy,
           round($rxz, 6) + 0.0 AS r_xz,
           round($ryz, 6) + 0.0 AS r_yz,
           round(($rxy - $rxz * $ryz)
               / sqrt((1.0 - $rxz * $rxz) * (1.0 - $ryz * $ryz)), 6)
             + 0.0 AS partial_corr
         FROM m"""
    },
    "q_var_cvar" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         lagged AS (SELECT day, rev,
             lag(rev, 1) OVER (ORDER BY day) AS prev
           FROM daily),
         rets AS (SELECT day,
             CAST(round(ln(CAST(rev AS DOUBLE) / CAST(prev AS DOUBLE)),
               9) + 0.0 AS DECIMAL(18,9)) AS r
           FROM lagged WHERE prev IS NOT NULL),
         n1 AS (SELECT COUNT(*) AS n FROM rets),
         rk AS (SELECT r, row_number() OVER (ORDER BY r, day) AS rk
           FROM rets),
         tail AS (SELECT r, n FROM rk CROSS JOIN n1
           WHERE rk <= ceil(n * 0.05))
         SELECT MAX(n) AS n_rets,
           round(CAST(MAX(r) AS DOUBLE), 6) + 0.0 AS var_95,
           round(CAST(SUM(r) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             + 0.0 AS cvar_95
         FROM tail""",
    "q_grubbs" -> {
      val mean = "(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))"
      val sd =
        """sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))"""
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         mom AS (SELECT COUNT(*) AS n, SUM(rev) AS sm,
             SUM(rev * rev) AS s2 FROM daily),
         dv AS (SELECT day, rev, n, sm, s2,
             abs(CAST(rev AS DOUBLE) - $mean) AS d,
             row_number() OVER (ORDER BY
               abs(CAST(rev AS DOUBLE) - $mean) DESC, day) AS rk
           FROM daily CROSS JOIN mom)
         SELECT n AS n_days, day, round(CAST(rev AS DOUBLE), 2) AS rev,
           round(d / $sd, 6) AS g_stat
         FROM dv WHERE rk = 1"""
    },
    "q_durbin_watson" -> {
      val b =
        """((CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
             - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
             - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)))"""
      val a =
        s"""((CAST(sy AS DOUBLE) - $b * CAST(st AS DOUBLE))
           / CAST(n AS DOUBLE))"""
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         lo AS (SELECT MIN(day) AS d0 FROM daily),
         td AS (SELECT day,
             CAST(datediff('day', d0, day) AS BIGINT) AS t, rev
           FROM daily CROSS JOIN lo),
         m AS (SELECT COUNT(*) AS n, CAST(SUM(t) AS BIGINT) AS st,
             SUM(rev) AS sy, SUM(t * rev) AS sty,
             CAST(SUM(t * t) AS BIGINT) AS stt
           FROM td),
         resid AS (SELECT day,
             CAST(round(CAST(rev AS DOUBLE)
               - ($a + $b * CAST(t AS DOUBLE)), 6) + 0.0
               AS DECIMAL(18,6)) AS e
           FROM td CROSS JOIN m),
         lg AS (SELECT e, lag(e, 1) OVER (ORDER BY day) AS ep
           FROM resid)
         SELECT COUNT(*) AS n_days,
           round(CAST(SUM(CASE WHEN ep IS NOT NULL
               THEN CAST(e - ep AS DECIMAL(19,6))
                 * CAST(e - ep AS DECIMAL(19,6))
               ELSE CAST(0 AS DECIMAL(38,12)) END) AS DOUBLE)
             / CAST(SUM(CAST(e AS DECIMAL(19,6))
               * CAST(e AS DECIMAL(19,6))) AS DOUBLE), 6) AS dw
         FROM lg"""
    },
    "q_jarque_bera" -> {
      val mean = "(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))"
      val sd =
        """sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))"""
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         mom AS (SELECT COUNT(*) AS n, SUM(rev) AS sm,
             SUM(rev * rev) AS s2 FROM daily),
         z AS (SELECT n,
             CAST(round((CAST(rev AS DOUBLE) - $mean) / $sd, 6) + 0.0
               AS DECIMAL(9,6)) AS z
           FROM daily CROSS JOIN mom),
         z2 AS (SELECT n, z, z * z AS z2 FROM z),
         agg AS (SELECT MAX(n) AS n_days, SUM(z2 * z) AS sz3,
             SUM(z2 * z2) AS sz4
           FROM z2)
         SELECT n_days,
           round(CAST(sz3 AS DOUBLE) / CAST(n_days AS DOUBLE), 6) + 0.0
             AS skewness,
           round(CAST(sz4 AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
             AS kurtosis,
           round((CAST(n_days AS DOUBLE) / 6.0)
             * ((CAST(sz3 AS DOUBLE) / CAST(n_days AS DOUBLE))
               * (CAST(sz3 AS DOUBLE) / CAST(n_days AS DOUBLE))
             + (CAST(sz4 AS DOUBLE) / CAST(n_days AS DOUBLE) - 3.0)
               * (CAST(sz4 AS DOUBLE) / CAST(n_days AS DOUBLE) - 3.0)
               / 4.0), 6) AS jarque_bera
         FROM agg"""
    },
    "multimodal_phash" ->
      """WITH p AS (SELECT doc_id, doc_id % 100 AS base,
             8 + (doc_id % 100) % 24 AS w,
             8 + ((doc_id % 100) * 7) % 24 AS h
           FROM documents
           WHERE doc_id < 500 AND doc_id % 5 <> 0),
         bits AS (SELECT p.doc_id,
             CAST(SUM(CASE WHEN
                 ((((x.x + 1) * p.w) // 8) * ((y.y * p.h) // 8) + p.base)
                   % 256
                 > (((x.x * p.w) // 8) * ((y.y * p.h) // 8) + p.base)
                   % 256
               THEN CAST(1 AS BIGINT) << (y.y * 7 + x.x)
               ELSE 0 END) AS BIGINT) AS dhash
           FROM p, range(0, 7) x(x), range(0, 8) y(y)
           GROUP BY p.doc_id),
         g AS (SELECT dhash, COUNT(*) AS n_dups,
             MIN(doc_id) AS keep_id
           FROM bits GROUP BY dhash)
         SELECT dhash, n_dups, keep_id FROM g
         ORDER BY n_dups DESC, dhash LIMIT 20""",
    "q_spearman" -> {
      def mr(src: String) =
        s"""(SELECT v, CAST(round(CAST(COALESCE(SUM(cnt) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS DOUBLE) + (CAST(cnt AS DOUBLE) + 1.0) / 2.0, 1)
           AS DECIMAL(18,1)) AS rk FROM $src)"""
      s"""WITH li AS (SELECT l_quantity AS x, l_extendedprice AS y
           FROM lineitem),
         cx AS (SELECT x AS v, COUNT(*) AS cnt FROM li GROUP BY 1),
         cy AS (SELECT y AS v, COUNT(*) AS cnt FROM li GROUP BY 1),
         rx AS ${mr("cx")},
         ry AS ${mr("cy")},
         j AS (SELECT rx.rk AS rx, ry.rk AS ry
           FROM li JOIN rx ON li.x = rx.v JOIN ry ON li.y = ry.v),
         m AS (SELECT COUNT(*) AS n,
             SUM(rx) AS sx, SUM(ry) AS sy,
             SUM(CAST(rx AS DECIMAL(19,1)) * CAST(ry AS DECIMAL(19,1)))
               AS sxy,
             SUM(CAST(rx AS DECIMAL(19,1)) * CAST(rx AS DECIMAL(19,1)))
               AS sxx,
             SUM(CAST(ry AS DECIMAL(19,1)) * CAST(ry AS DECIMAL(19,1)))
               AS syy
           FROM j)
         SELECT n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0.0
             AS spearman_rho
         FROM m"""
    },
    "q_cronbach" ->
      """WITH dims AS (SELECT CAST(i AS BIGINT) AS i
             FROM generate_series(1, 64) t(i)),
         x AS (SELECT vec_id, i - 1 AS dim,
             CAST(embedding[i] AS DOUBLE) AS e
           FROM embeddings CROSS JOIN dims),
         iv AS (SELECT dim, COUNT(*) AS n,
             SUM(CAST(e AS DECIMAL(28,12))) AS s,
             SUM(CAST(e * e AS DECIMAL(28,12))) AS s2
           FROM x GROUP BY dim),
         ivq AS (SELECT CAST(round(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             AS DECIMAL(18,9)) AS vi FROM iv),
         k1 AS (SELECT COUNT(*) AS k, SUM(vi) AS svi FROM ivq),
         tot AS (SELECT vec_id,
             CAST(round(CAST(SUM(CAST(e AS DECIMAL(28,12))) AS DOUBLE), 9)
               AS DECIMAL(18,9)) AS t
           FROM x GROUP BY vec_id),
         tv AS (SELECT COUNT(*) AS nv, SUM(t) AS st,
             SUM(CAST(t AS DECIMAL(19,9)) * CAST(t AS DECIMAL(19,9)))
               AS stt
           FROM tot),
         tv2 AS (SELECT nv,
             (CAST(stt AS DOUBLE) / CAST(nv AS DOUBLE)
               - (CAST(st AS DOUBLE) / CAST(nv AS DOUBLE))
                 * (CAST(st AS DOUBLE) / CAST(nv AS DOUBLE))) AS vt
           FROM tv)
         SELECT k, nv AS n_vectors,
           round((CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
             * (1.0 - CAST(svi AS DOUBLE) / vt), 6) AS cronbach_alpha
         FROM k1 CROSS JOIN tv2""",
    "q_renyi" ->
      """WITH w AS (SELECT lang,
             unnest(regexp_split_to_array(lower(text), '[^a-zA-Z0-9_]+'))
               AS w
           FROM documents),
         c AS (SELECT lang, w, COUNT(*) AS c FROM w WHERE w <> ''
           GROUP BY 1, 2),
         a AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS nt,
             COUNT(*) AS vocab,
             SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
               AS sc2,
             SUM(CAST(round(sqrt(CAST(c AS DOUBLE)), 9)
               AS DECIMAL(18,9))) AS src
           FROM c GROUP BY 1)
         SELECT lang, nt AS n_tokens, vocab,
           round(-ln(CAST(sc2 AS DOUBLE)
             / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE))), 6) AS renyi_2,
           round(2.0 * ln(CAST(src AS DOUBLE)
             / sqrt(CAST(nt AS DOUBLE))), 6) AS renyi_05
         FROM a ORDER BY lang""",
    "q_ngram_coverage" ->
      """WITH w AS (SELECT unnest(regexp_split_to_array(lower(text),
             '[^a-zA-Z0-9_]+')) AS w
           FROM documents),
         c AS (SELECT w, COUNT(*) AS c FROM w WHERE w <> ''
           GROUP BY 1),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM c),
         r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk,
             CAST(SUM(c) OVER (ORDER BY c DESC, w ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           FROM c)
         SELECT CAST(rk AS INTEGER) AS top_k, cum AS cum_tokens,
           round(CAST(cum AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS coverage
         FROM r CROSS JOIN tot WHERE rk IN (5, 10, 20)
         ORDER BY top_k""",
    "q_odds_ratio" -> {
      val lor =
        """(ln((CAST(c1 AS DOUBLE) + 0.5)
             / (CAST(n1 AS DOUBLE) - CAST(c1 AS DOUBLE) + 0.5))
           - ln((CAST(c2 AS DOUBLE) + 0.5)
             / (CAST(n2 AS DOUBLE) - CAST(c2 AS DOUBLE) + 0.5)))"""
      val se =
        """sqrt(1.0 / (CAST(c1 AS DOUBLE) + 0.5)
           + 1.0 / (CAST(n1 AS DOUBLE) - CAST(c1 AS DOUBLE) + 0.5)
           + 1.0 / (CAST(c2 AS DOUBLE) + 0.5)
           + 1.0 / (CAST(n2 AS DOUBLE) - CAST(c2 AS DOUBLE) + 0.5))"""
      s"""WITH w AS (SELECT lang = 'en' AS grp,
             unnest(regexp_split_to_array(lower(text), '[^a-zA-Z0-9_]+'))
               AS w
           FROM documents),
         wf AS (SELECT grp, w FROM w WHERE w <> ''),
         cnt AS (SELECT w,
             CAST(SUM(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN grp THEN 0 ELSE 1 END) AS BIGINT) AS c2
           FROM wf GROUP BY 1),
         tot AS (SELECT
             CAST(SUM(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN grp THEN 0 ELSE 1 END) AS BIGINT) AS n2
           FROM wf)
         SELECT w, c1, c2,
           round($lor, 6) + 0.0 AS log_odds,
           round($lor / $se, 6) + 0.0 AS z
         FROM cnt CROSS JOIN tot
         ORDER BY z DESC, w LIMIT 20"""
    },
    "q_k_anonymity" ->
      """SELECT lang, source, COUNT(*) AS n
         FROM documents GROUP BY lang, source
         HAVING COUNT(*) < 10 ORDER BY lang, source""",
    "q_data_profile" ->
      """SELECT 'o_custkey' AS column_name,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_null,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS DOUBLE) AS min_v,
           CAST(MAX(o_custkey) AS DOUBLE) AS max_v
         FROM orders
         UNION ALL
         SELECT 'o_orderkey',
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderkey),
           CAST(MIN(o_orderkey) AS DOUBLE), CAST(MAX(o_orderkey) AS DOUBLE)
         FROM orders
         UNION ALL
         SELECT 'o_orderstatus',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_orderstatus),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
         FROM orders
         UNION ALL
         SELECT 'o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT o_totalprice),
           CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
         FROM orders
         ORDER BY column_name""",
    "q_expectations" ->
      """WITH a AS (SELECT COUNT(*) AS n_rows,
           SUM(CASE WHEN NOT COALESCE(o_orderkey > 0, FALSE)
               THEN 1 ELSE 0 END) AS v_orderkey_positive0,
           SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('O','F','P'), FALSE)
               THEN 1 ELSE 0 END) AS v_status_in_domain0,
           SUM(CASE WHEN NOT COALESCE(o_totalprice >= 0, FALSE)
               THEN 1 ELSE 0 END) AS v_price_nonnegative0,
           SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
               AS v_custkey_not_null0
         FROM orders),
         b AS (SELECT n_rows,
           CAST(v_orderkey_positive0 AS BIGINT) AS v_orderkey_positive,
           CAST(v_status_in_domain0 AS BIGINT) AS v_status_in_domain,
           CAST(v_price_nonnegative0 AS BIGINT) AS v_price_nonnegative,
           CAST(v_custkey_not_null0 AS BIGINT) AS v_custkey_not_null
         FROM a)
         SELECT 'custkey_not_null' AS rule, n_rows,
           v_custkey_not_null AS n_violations,
           v_custkey_not_null = 0 AS pass FROM b
         UNION ALL
         SELECT 'orderkey_positive', n_rows, v_orderkey_positive,
           v_orderkey_positive = 0 FROM b
         UNION ALL
         SELECT 'price_nonnegative', n_rows, v_price_nonnegative,
           v_price_nonnegative = 0 FROM b
         UNION ALL
         SELECT 'status_in_domain', n_rows, v_status_in_domain,
           v_status_in_domain = 0 FROM b
         ORDER BY rule""",
    "q_null_safe_join" ->
      """WITH a AS (SELECT nullif(o_orderstatus, 'P') AS k,
             COUNT(*) AS n_orders
           FROM orders GROUP BY 1),
         b AS (SELECT nullif(o_orderstatus, 'P') AS kb,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_price
           FROM orders GROUP BY 1)
         SELECT a.k, a.n_orders, b.sum_price
         FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.kb
         ORDER BY a.k NULLS FIRST""",
    "q_rel_division" ->
      """SELECT o_custkey AS c_custkey,
           COUNT(DISTINCT o_orderpriority) AS n_prio
         FROM orders
         GROUP BY o_custkey
         HAVING COUNT(DISTINCT o_orderpriority) =
           (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
         ORDER BY c_custkey""",
    "ann_filtered" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id = 0)
         SELECT vec_id,
           round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                 CAST(embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(qv, qv))), 4) AS cosine
         FROM embeddings, q
         WHERE label = 3
         ORDER BY round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                 CAST(embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(qv, qv))), 4) DESC, vec_id
         LIMIT 10""",
    "ann_matryoshka" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id = 0),
         c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             round(list_dot_product(CAST(embedding AS DOUBLE[])[1:16],
                 qv[1:16])
               / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[])[1:16],
                   CAST(embedding AS DOUBLE[])[1:16])) *
                  sqrt(list_dot_product(qv[1:16], qv[1:16]))), 4)
               AS cosine_coarse
           FROM embeddings, q
           ORDER BY cosine_coarse DESC, vec_id
           LIMIT 50)
         SELECT vec_id, cosine_coarse,
           round(list_dot_product(v, qv)
             / (sqrt(list_dot_product(v, v)) *
                sqrt(list_dot_product(qv, qv))), 4) AS cosine
         FROM c, q
         ORDER BY cosine DESC, vec_id
         LIMIT 10""",
    "q_domain_mix" ->
      """WITH c AS (SELECT source, COUNT(*) AS n_docs
           FROM documents GROUP BY source),
         t AS (SELECT SUM(n_docs) AS total_docs,
             SUM(POWER(n_docs, 0.3)) AS total_pow FROM c)
         SELECT source, n_docs,
           round(n_docs / total_docs, 6) AS p_raw,
           round(POWER(n_docs, 0.3) / total_pow, 6) AS p_mix,
           round(POWER(n_docs, 0.3) / total_pow
             / (n_docs / total_docs), 6) AS boost
         FROM c CROSS JOIN t ORDER BY source""",
    "q_epoch_shuffle" -> epochShuffleOracleSql,
    "q_bpe_train" -> bpeTrainOracleSql,
    "q_bpe_encode" -> bpeEncodeOracleSql,
    "q_bpe_doc_tokens" -> bpeDocTokensOracleSql,
    "q_dsir_score" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '')) AS w
           FROM documents),
         tgt AS (SELECT w, COUNT(*) AS cnt_t FROM toks
                 WHERE doc_id < 50 GROUP BY w),
         rawc AS (SELECT w, COUNT(*) AS cnt_r FROM toks
                  WHERE doc_id >= 50 GROUP BY w),
         vocab AS (SELECT COALESCE(t.w, r.w) AS w,
             COALESCE(cnt_t, 0) AS cnt_t, COALESCE(cnt_r, 0) AS cnt_r
           FROM tgt t FULL OUTER JOIN rawc r ON t.w = r.w),
         stats AS (SELECT CAST(SUM(cnt_t) AS BIGINT) AS tt,
             CAST(SUM(cnt_r) AS BIGINT) AS tr, COUNT(*) AS v
           FROM vocab),
         wterm AS (SELECT w,
             CAST(round(ln(CAST(cnt_t + 1 AS DOUBLE)) -
                        ln(CAST(cnt_r + 1 AS DOUBLE)), 9)
               AS DECIMAL(28,9)) AS llr
           FROM vocab),
         per AS (SELECT doc_id, COUNT(*) AS n_tok, SUM(llr) AS sum_llr
           FROM toks JOIN wterm USING (w)
           WHERE doc_id >= 50 GROUP BY doc_id)
         SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           ROUND(CAST(sum_llr AS DOUBLE) +
             n_tok * (ln(CAST(tr + v AS DOUBLE)) -
                      ln(CAST(tt + v AS DOUBLE))), 6) AS dsir_score
         FROM per CROSS JOIN stats ORDER BY doc_id""",
    "q_salted_join" ->
      """SELECT s_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_qty
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey ORDER BY s_nationkey""",
    "q_compaction" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS total_price,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_zorder" ->
      """SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_qty,
           MIN(l_orderkey) AS min_okey, MAX(l_partkey) AS max_pkey
         FROM lineitem
         WHERE l_orderkey <= 2000 AND l_partkey <= 150
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_corrupt_json" ->
      """SELECT (o_orderkey % 13 = 0) AS planted_corrupt,
           COUNT(*) AS n,
           COUNT(CASE WHEN o_orderkey % 13 <> 0 THEN 1 END) AS n_parsed,
           CAST(COALESCE(SUM(CASE WHEN o_orderkey % 13 <> 0
             THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0)
             AS BIGINT) AS sum_cents
         FROM orders GROUP BY 1 ORDER BY planted_corrupt""",
    // planted-duplicate construction: components and keepers are fully
    // determined (see qSemDedup scaladoc and the neardup_embedding gate)
    "q_semdedup" ->
      """WITH a AS (SELECT vec_id FROM embeddings
           UNION ALL SELECT vec_id + 100000 FROM embeddings
           WHERE vec_id % 3 = 0)
         SELECT vec_id,
           CASE WHEN vec_id >= 100000 THEN vec_id - 100000
                ELSE vec_id END AS component,
           vec_id < 100000 AS is_canonical
         FROM a ORDER BY vec_id""",
    // flat integer algebra: word chars = chars minus whitespace, symbol
    // count = '#' chars + non-overlapping '...' runs, stopword hits via
    // the split+list_contains twin of the \b-count (see lang_id oracle)
    // word-boundary blocklist: keep rate is a count ratio (floor-form)
    "q_blocklist_filter" ->
      """WITH f AS (SELECT source,
             CASE WHEN regexp_matches(text,
               '\b(customer|vector|stream)\b') THEN 1 ELSE 0 END
               AS flagged
           FROM documents),
         a AS (SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(flagged) AS BIGINT) AS n_flagged
           FROM f GROUP BY 1)
         SELECT source, n_docs, n_flagged,
           floor(CAST(n_docs - n_flagged AS DOUBLE)
             / CAST(n_docs AS DOUBLE) * 1e6 + 0.5) / 1e6 AS keep_rate
         FROM a ORDER BY 1""",
    "q_gopher_rules" ->
      """WITH t0 AS (SELECT doc_id, trim(text) AS t FROM documents),
         m AS (SELECT doc_id,
             len(regexp_split_to_array(t, '[ \t\n]+')) AS nw,
             length(regexp_replace(t, '[ \t\n]', '', 'g')) AS wc,
             length(t) - length(replace(t, '#', '')) AS nhash,
             len(regexp_extract_all(t, '\.\.\.')) AS nell,
             len(list_filter(regexp_split_to_array(lower(t),
               '[^a-zA-Z0-9_]+'), w -> list_contains(
               ['the','and','of','to','in','is','that','for','with','a'],
               w))) AS stops
           FROM t0),
         r AS (SELECT doc_id, nw,
             floor(CAST(wc AS DOUBLE) / nw * 1e4 + 0.5) / 1e4
               AS mean_word_len,
             floor(CAST(nhash + nell AS DOUBLE) / nw * 1e4 + 0.5) / 1e4
               AS symbol_ratio,
             stops
           FROM m)
         SELECT doc_id, CAST(nw AS INTEGER) AS n_words, mean_word_len,
           symbol_ratio, CAST(stops AS INTEGER) AS stop_hits,
           nw BETWEEN 50 AND 100000 AS word_count_ok,
           mean_word_len BETWEEN 3.0 AND 10.0 AS mean_word_len_ok,
           symbol_ratio <= 0.1 AS symbol_ratio_ok,
           stops >= 2 AS stopword_ok,
           (nw BETWEEN 50 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND symbol_ratio <= 0.1 AND stops >= 2 AS keep
         FROM r ORDER BY doc_id""",
    "q_hard_negatives" ->
      """WITH p AS (SELECT vec_id AS probe_id, label AS own_label,
             CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS nbr_id, label AS nbr_label,
             CAST(embedding AS DOUBLE[]) AS nv
           FROM embeddings WHERE vec_id >= 20),
         sc AS (SELECT probe_id, nbr_id,
             round(list_dot_product(nv, qv) /
               (sqrt(list_dot_product(nv, nv)) *
                sqrt(list_dot_product(qv, qv))), 4) AS cos4
           FROM c CROSS JOIN p WHERE nbr_label <> own_label),
         r AS (SELECT *, CAST(row_number() OVER (
             PARTITION BY probe_id ORDER BY cos4 DESC, nbr_id)
             AS INTEGER) AS rnk
           FROM sc)
         SELECT probe_id, rnk, nbr_id, cos4 FROM r
         WHERE rnk <= 5 ORDER BY probe_id, rnk""",
    // batch twin of the streaming curation gate: split + keep per doc
    // (the split CTE mirrors q_split_assign, keep mirrors q_gopher_rules)
    "docs_stream_curation" ->
      """WITH u AS (SELECT doc_id,
             md5('42:' || CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         v AS (SELECT doc_id, list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef', h[i:i]) - 1 AS BIGINT)),
             (a, d) -> a * 16 + d) AS hv
           FROM u),
         sp AS (SELECT doc_id,
             round((CAST(hv AS DOUBLE) + 0.5) / 4294967296.0, 6) AS su
           FROM v),
         t0 AS (SELECT doc_id, trim(text) AS t FROM documents),
         m AS (SELECT doc_id,
             len(regexp_split_to_array(t, '[ \t\n]+')) AS nw,
             length(regexp_replace(t, '[ \t\n]', '', 'g')) AS wc,
             length(t) - length(replace(t, '#', '')) AS nhash,
             len(regexp_extract_all(t, '\.\.\.')) AS nell,
             len(list_filter(regexp_split_to_array(lower(t),
               '[^a-zA-Z0-9_]+'), w -> list_contains(
               ['the','and','of','to','in','is','that','for','with','a'],
               w))) AS stops
           FROM t0),
         k AS (SELECT doc_id,
             (nw BETWEEN 50 AND 100000)
               AND (round(CAST(wc AS DOUBLE) / nw, 4) BETWEEN 3.0 AND 10.0)
               AND round(CAST(nhash + nell AS DOUBLE) / nw, 4) <= 0.1
               AND stops >= 2 AS keep
           FROM m)
         SELECT sp.doc_id,
           CASE WHEN su < 0.9 THEN 'train'
                WHEN su < 0.95 THEN 'val'
                ELSE 'test' END AS split,
           keep
         FROM sp JOIN k ON sp.doc_id = k.doc_id
         ORDER BY sp.doc_id""",
    // C4-style duplicate-span removal: cut into non-overlapping 3-word
    // spans, rank each span text globally by (doc_id, pos), keep rank 1,
    // reassemble with an ordered string_agg (COALESCE for the
    // all-spans-removed document, where Spark's concat_ws yields '')
    "q_span_dedup" ->
      """WITH d AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '') AS ws
           FROM documents),
         sp AS (SELECT doc_id, g AS pos,
             array_to_string(ws[g*3+1:g*3+3], ' ') AS span
           FROM d, unnest(range(0, (len(ws) - 1) // 3 + 1)) t(g)
           WHERE len(ws) > 0),
         r AS (SELECT doc_id, pos, span,
             row_number() OVER (PARTITION BY span
               ORDER BY doc_id, pos) AS rn
           FROM sp)
         SELECT doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_removed,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN span END, ' '
             ORDER BY pos), '') AS text_deduped
         FROM r GROUP BY doc_id ORDER BY doc_id""",
    // Unicode normalization replay: the accented corpus is rebuilt with
    // chr() codepoints (224/233/238/246/252 = precomposed a..u accents,
    // 769 = the combining acute the NFC pass must fuse); nfc_normalize
    // and strip_accents are DuckDB's utf8proc twins of the engine's
    // java.text.Normalizer expression
    "q_unicode_norm" ->
      """WITH d AS (SELECT doc_id, substr(text, 1, 40) AS base,
             translate(substr(text, 1, 40), 'aeiou',
               chr(224)||chr(233)||chr(238)||chr(246)||chr(252))
             || ' e' || chr(769) || 'clat' AS raw
           FROM documents)
         SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS n_raw,
           CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc,
           nfc_normalize(raw) AS text_nfc,
           strip_accents(raw) AS text_stripped,
           strip_accents(raw) = (base || ' eclat') AS strip_inverts
         FROM d ORDER BY doc_id""",
    "q_incr_stats" -> incrStatsOracleSql,
    // same one-shot recompute: the STREAMED maintenance path must land
    // the identical state
    "docs_stream_incr_stats" -> incrStatsOracleSql,
    // Hybrid retrieval replay: the vector list is the q_knn_eval cosine
    // replay, the lexical list is distinct-word Jaccard over the TF
    // table's tokenizer, RRF = sum of 1/(60+rank) over both lists; every
    // ranking rounded + id-tiebroken so row_number replays exactly
    "q_hybrid_rrf" ->
      """WITH w AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-zA-Z0-9_]+'),
             x -> x <> '')) AS word
           FROM documents),
         tf AS (SELECT DISTINCT doc_id, word FROM w),
         nw AS (SELECT doc_id, COUNT(*) AS nw FROM tf GROUP BY 1),
         pv AS (SELECT vec_id AS probe_id,
             CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 5),
         cv AS (SELECT vec_id AS nbr_id,
             CAST(embedding AS DOUBLE[]) AS nv
           FROM embeddings WHERE vec_id >= 5),
         vs AS (SELECT probe_id, nbr_id,
             round(list_dot_product(nv, qv) /
               (sqrt(list_dot_product(nv, nv)) *
                sqrt(list_dot_product(qv, qv))), 4) AS cos4
           FROM cv CROSS JOIN pv),
         vr AS (SELECT probe_id, nbr_id, vrank FROM (
             SELECT probe_id, nbr_id, row_number() OVER (
               PARTITION BY probe_id ORDER BY cos4 DESC, nbr_id) AS vrank
             FROM vs) WHERE vrank <= 20),
         iw AS (SELECT p.doc_id AS probe_id, c.doc_id AS nbr_id,
             COUNT(*) AS inter
           FROM tf c JOIN tf p USING (word)
           WHERE p.doc_id < 5 AND c.doc_id >= 5
           GROUP BY 1, 2),
         ls AS (SELECT probe_id, nbr_id,
             round(CAST(inter AS DOUBLE) /
               (np.nw + nd.nw - inter), 6) AS jac
           FROM iw
           JOIN nw np ON np.doc_id = iw.probe_id
           JOIN nw nd ON nd.doc_id = iw.nbr_id),
         lr AS (SELECT probe_id, nbr_id, lrank FROM (
             SELECT probe_id, nbr_id, row_number() OVER (
               PARTITION BY probe_id ORDER BY jac DESC, nbr_id) AS lrank
             FROM ls) WHERE lrank <= 20),
         f AS (SELECT COALESCE(vr.probe_id, lr.probe_id) AS probe_id,
             COALESCE(vr.nbr_id, lr.nbr_id) AS nbr_id,
             vr.vrank, lr.lrank
           FROM vr FULL JOIN lr
             ON vr.probe_id = lr.probe_id AND vr.nbr_id = lr.nbr_id),
         r AS (SELECT probe_id, nbr_id, vrank, lrank,
             round(COALESCE(1.0 / (60 + vrank), 0) +
                   COALESCE(1.0 / (60 + lrank), 0), 6) AS rrf6
           FROM f)
         SELECT probe_id, rnk, nbr_id, vrank, lrank, rrf6 FROM (
           SELECT *, row_number() OVER (
             PARTITION BY probe_id ORDER BY rrf6 DESC, nbr_id) AS rnk
           FROM r)
         WHERE rnk <= 10 ORDER BY probe_id, rnk""",
    // BPE pair counting replay: word frequencies, then in-word adjacent
    // 2-grams weighted by frequency; LIMIT ties broken by pair text so
    // the 30-row set is unique
    "q_bpe_pairs" ->
      """WITH w AS (SELECT unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '')) AS word
           FROM documents),
         wf AS (SELECT word, count(*) AS freq FROM w GROUP BY 1),
         p AS (SELECT substr(word, g, 2) AS pair, freq
           FROM wf, unnest(range(1, length(word))) t(g)
           WHERE length(word) >= 2)
         SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
         FROM p GROUP BY pair
         ORDER BY cnt DESC, pair LIMIT 30""",
    // Transactional-table oracles: each version of the writtenTxnOrdersTable
    // the bloom index changes WHICH FILES are read, never the answer —
    // the oracle is the plain point filter on raw orders
    "q_table_bloom" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         FROM orders WHERE o_orderkey = 7 ORDER BY o_orderkey""",
    // all three merge clauses replayed: matched ×3 re-price, unmatched
    // insert, not-matched-by-source delete only where status = 'F'
    "q_table_merge_full" ->
      """WITH t0 AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
             o_totalprice
           FROM orders WHERE o_orderkey % 3 = 0),
         src AS (SELECT o_orderkey, o_orderstatus, o_orderpriority,
             o_totalprice * 3 AS o_totalprice
           FROM orders WHERE o_orderkey % 6 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
           FROM orders WHERE o_orderkey % 3 = 1),
         kept AS (SELECT * FROM t0
           WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
             AND NOT COALESCE(o_orderstatus = 'F', FALSE)),
         res AS (SELECT * FROM kept UNION ALL SELECT * FROM src)
         SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM res GROUP BY 1 ORDER BY 1""",
    // dv algebra: (%3=0 minus %15) ∪ (%15 re-insert) minus %21 == %3=0 minus %21
    "q_table_mor_delete" ->
      """WITH res AS (SELECT o_orderkey, o_orderpriority, o_totalprice
           FROM orders
           WHERE o_orderkey % 3 = 0 AND NOT (o_orderkey % 21 = 0))
         SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM res GROUP BY 1 ORDER BY 1""",
    // the clone must answer exactly like the source's latest version
    "q_table_clone" ->
      s"""$txnTableCtes
         SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM v3 GROUP BY 1 ORDER BY 1""",
    // the connector's pinned-version read must equal the v1 replay
    "q_table_dsv2_timetravel" ->
      s"""$txnTableCtes
         SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM v1 GROUP BY 1 ORDER BY 1""",
    "q_group_by_all" ->
      """SELECT lang, source, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY ALL ORDER BY lang, source""",
    // the DSv2-pushed aggregation must equal the v3 data replay too
    "q_table_agg_pushdown" ->
      s"""$txnTableCtes
         SELECT COUNT(*) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
         FROM v3""",
    // LIMIT row-count contract: min(10, |v3|) rows come back; which
    // rows is engine-nondeterministic, so the count IS the invariant
    "q_table_limit" ->
      s"""$txnTableCtes
         SELECT CAST(LEAST(10, (SELECT COUNT(*) FROM v3)) AS BIGINT)
           AS n""",
    // metadata-served COUNT/min/max must equal the v3 data replay
    "q_table_fast_stats" ->
      s"""$txnTableCtes
         SELECT COUNT(*) AS n_rows,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
         FROM v3""",
  )
}
