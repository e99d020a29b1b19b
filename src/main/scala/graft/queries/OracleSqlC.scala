package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.EngineConfig
import graft.engine.InceptionEngine

/** Oracle-SQL slice C of the DuckDB twin map.
  *
  * Split out of SparkEntry.scala (round 16); entries are verbatim
  * from the original single Map literal.
  */
private[graft] trait SparkEntryOracleC { this: SparkEntry.type =>

  /** Oracle-SQL map slice — concatenated into
    * [[SparkEntry.oracleSql]]; keys are globally unique.
    */
  private[graft] lazy val oracleSqlPartC: Map[String, String] = Map(
    // commit history (create/append/merge/delete/cluster) replayed as CTEs
    // over the base orders table. v4 (cluster) is data-identical to v3.
    "q_table_snapshot" ->
      s"""$txnTableCtes
         SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM v3 GROUP BY 1 ORDER BY 1""",
    "q_table_timetravel" ->
      s"""$txnTableCtes
         SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM v1 GROUP BY 1 ORDER BY 1""",
    "q_repeat_ladder" ->
      """WITH per AS (SELECT o_custkey, COUNT(*) AS n_orders
           FROM orders GROUP BY 1),
         l AS (SELECT k, COUNT(*) AS n_ge_k
           FROM per, range(1, 11) t(k)
           WHERE k <= least(n_orders, 10) GROUP BY 1),
         r AS (SELECT CAST(k AS BIGINT) AS k, n_ge_k,
             LAG(n_ge_k) OVER (ORDER BY k) AS n_prev
           FROM l)
         SELECT k, n_ge_k,
           round(CASE WHEN n_prev IS NOT NULL
             THEN CAST(n_ge_k AS DOUBLE) / CAST(n_prev AS DOUBLE)
             ELSE 1.0 END, 6) AS r_k
         FROM r ORDER BY k""",
    "q_catalog_coverage" ->
      """WITH o AS (SELECT DISTINCT l_partkey AS p_partkey
           FROM lineitem)
         SELECT p_brand, COUNT(*) AS n_parts,
           CAST(SUM(CASE WHEN o.p_partkey IS NOT NULL THEN 1 ELSE 0
             END) AS BIGINT) AS n_ordered,
           round(CAST(CAST(SUM(CASE WHEN o.p_partkey IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
         FROM part p LEFT JOIN o ON o.p_partkey = p.p_partkey
         GROUP BY 1 ORDER BY p_brand""",
    "q_forecast_baseline" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         l AS (SELECT rev,
             LAG(rev, 7) OVER (ORDER BY day) AS lag7,
             LAG(rev, 1) OVER (ORDER BY day) AS lag1
           FROM daily),
         e AS (SELECT abs(rev - lag7) AS ae7, abs(rev - lag1) AS ae1,
             CAST(round(CAST(abs(rev - lag7) AS DOUBLE)
               / CAST(rev AS DOUBLE), 9) AS DECIMAL(18,9)) AS ape
           FROM l WHERE lag7 IS NOT NULL AND lag1 IS NOT NULL),
         m AS (SELECT COUNT(*) AS n_days, SUM(ae7) AS sae7,
             SUM(ae1) AS sae1, SUM(ape) AS sape
           FROM e)
         SELECT n_days,
           round(CAST(sae7 AS DOUBLE) / CAST(sae1 AS DOUBLE), 6)
             AS mase,
           round(CAST(sape AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
             AS mape
         FROM m""",
    "q_rolling_anomaly" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         r AS (SELECT day, rev,
             COUNT(*) OVER w AS n,
             SUM(rev) OVER w AS sx,
             SUM(rev * rev) OVER w AS sxx
           FROM daily
           WINDOW w AS (ORDER BY day
             ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING)),
         z AS (SELECT day, round(CAST(rev AS DOUBLE), 2) AS rev,
             round((CAST(rev AS DOUBLE) - CAST(sx AS DOUBLE) / 30.0)
               / sqrt((30.0 * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / (30.0 * 29.0)), 6) AS z
           FROM r WHERE n = 30)
         SELECT day, rev, z FROM z WHERE abs(z) > 2.0 ORDER BY day""",
    "q_novelty_rate" ->
      """WITH li AS (SELECT o_custkey, p_brand,
             CAST(year(o_orderdate) * 12 + month(o_orderdate)
               AS BIGINT) AS m
           FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN part ON l_partkey = p_partkey),
         cb AS (SELECT o_custkey, p_brand, m, COUNT(*) AS n_lines
           FROM li GROUP BY 1, 2, 3),
         f AS (SELECT o_custkey, p_brand, MIN(m) AS first_m FROM cb
           GROUP BY 1, 2),
         lab AS (SELECT cb.m,
             CASE WHEN cb.m = f.first_m THEN 1 ELSE 0 END AS is_novel
           FROM cb JOIN f ON f.o_custkey = cb.o_custkey
             AND f.p_brand = cb.p_brand)
         SELECT m, COUNT(*) AS n_cust_brand,
           CAST(SUM(is_novel) AS BIGINT) AS n_novel,
           floor(CAST(CAST(SUM(is_novel) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
             AS novelty_rate
         FROM lab GROUP BY 1 ORDER BY m""",
    "q_revenue_decomposition" ->
      """WITH monthly AS (SELECT
             CAST(year(o_orderdate) * 12 + month(o_orderdate)
               AS BIGINT) AS m,
             COUNT(*) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         l AS (SELECT m, n, rev,
             LAG(n) OVER (ORDER BY m) AS n0,
             LAG(rev) OVER (ORDER BY m) AS rev0
           FROM monthly),
         d AS (SELECT m, n, n0,
             round(CAST(rev AS DOUBLE) / CAST(n AS DOUBLE), 6) AS aov,
             round(CAST(rev0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6)
               AS aov0,
             round(CAST(rev AS DOUBLE) - CAST(rev0 AS DOUBLE), 2)
               AS delta_rev
           FROM l WHERE n0 IS NOT NULL)
         SELECT m, delta_rev,
           round(CAST(n - n0 AS DOUBLE) * aov0, 6) + 0.0
             AS volume_term,
           round(CAST(n0 AS DOUBLE) * (aov - aov0), 6) + 0.0
             AS value_term,
           round(CAST(n - n0 AS DOUBLE) * (aov - aov0), 6) + 0.0
             AS interaction_term
         FROM d ORDER BY m""",
    "q_runs_test" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         sg AS (SELECT day,
             CASE WHEN rev > prev THEN 1 ELSE -1 END AS sgn
           FROM (SELECT day, rev,
               LAG(rev) OVER (ORDER BY day) AS prev FROM daily) t
           WHERE prev IS NOT NULL AND rev <> prev),
         r AS (SELECT sgn,
             CASE WHEN LAG(sgn) OVER (ORDER BY day) IS NULL
               OR sgn <> LAG(sgn) OVER (ORDER BY day) THEN 1 ELSE 0 END
               AS new_run
           FROM sg),
         agg AS (SELECT
             CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_up,
             CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_down,
             CAST(SUM(new_run) AS BIGINT) AS n_runs
           FROM r)
         SELECT n_up, n_down, n_runs,
           round((CAST(n_runs AS DOUBLE)
               - (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                 / (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                 + 1.0))
             / sqrt(2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
               * (2.0 * CAST(n_up AS DOUBLE) * CAST(n_down AS DOUBLE)
                 - CAST(n_up AS DOUBLE) - CAST(n_down AS DOUBLE))
               / ((CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                 * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE))
                 * (CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE)
                   - 1.0))), 6) AS z_stat
         FROM agg""",
    "q_dp_counts" ->
      """WITH c AS (SELECT source, COUNT(*) AS n FROM documents
           GROUP BY 1),
         h AS (SELECT source, n, md5('7:' || source) AS hh FROM c),
         v AS (SELECT source, n, list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef', hh[i:i]) - 1
               AS BIGINT)),
             (a, d) -> a * 16 + d) AS hv
           FROM h),
         u AS (SELECT source, n,
             round((CAST(hv AS DOUBLE) + 0.5) / 4294967296.0, 6) AS su
           FROM v),
         nz AS (SELECT source, n,
             round(-1.0 * sign(su - 0.5)
               * ln(greatest(0.000001, 1.0 - 2.0 * abs(su - 0.5))), 6)
               AS noise
           FROM u)
         SELECT source, n, noise,
           round(CAST(n AS DOUBLE) + noise, 6) AS noisy_n
         FROM nz ORDER BY source""",
    "q_ab_srm" ->
      """WITH users AS (SELECT DISTINCT user_id FROM events),
         h AS (SELECT user_id,
             md5('11:' || CAST(user_id AS VARCHAR)) AS hh FROM users),
         v AS (SELECT list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef', hh[i:i]) - 1
               AS BIGINT)),
             (a, d) -> a * 16 + d) AS hv
           FROM h),
         u AS (SELECT
             round((CAST(hv AS DOUBLE) + 0.5) / 4294967296.0, 6) < 0.5
               AS in_a
           FROM v),
         agg AS (SELECT
             CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)
               AS n_a,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT)
               AS n_b
           FROM u)
         SELECT n_a, n_b,
           round((CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
               * (CAST(n_a AS DOUBLE)
                 - CAST(n_a + n_b AS DOUBLE) / 2.0)
               / (CAST(n_a + n_b AS DOUBLE) / 2.0)
             + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
               * (CAST(n_b AS DOUBLE)
                 - CAST(n_a + n_b AS DOUBLE) / 2.0)
               / (CAST(n_a + n_b AS DOUBLE) / 2.0), 6) AS srm_chi2,
           round((CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
               * (CAST(n_a AS DOUBLE)
                 - CAST(n_a + n_b AS DOUBLE) / 2.0)
               / (CAST(n_a + n_b AS DOUBLE) / 2.0)
             + (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0)
               * (CAST(n_b AS DOUBLE)
                 - CAST(n_a + n_b AS DOUBLE) / 2.0)
               / (CAST(n_a + n_b AS DOUBLE) / 2.0), 6) > 3.841
             AS srm_alarm
         FROM agg""",
    "q_pit_features" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(ts) AS ts_us, CAST(value AS DECIMAL(18,6)) AS v
           FROM events),
         f AS (SELECT *,
             COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1
               ELSE 0 END) OVER w, 0) AS prior_views,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN v
               END) OVER w, CAST(0 AS DECIMAL(18,6))) AS prior_spend,
             MAX(CASE WHEN event_type = 'view' THEN ts_us END) OVER w
               AS last_view_us
           FROM e
           WINDOW w AS (PARTITION BY user_id
             ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT event_id, user_id,
           CAST(prior_views AS BIGINT) AS prior_views,
           CAST(prior_spend AS DOUBLE) AS prior_spend,
           (ts_us - last_view_us) // 1000000 AS view_recency_s
         FROM f WHERE event_type = 'purchase' ORDER BY event_id""",
    "q_horizon_label" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(ts) AS ts_us
           FROM events),
         f AS (SELECT *,
             MIN(CASE WHEN event_type = 'purchase' THEN ts_us END)
               OVER (PARTITION BY user_id
                 ORDER BY ts_us DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS next_purchase_us
           FROM e),
         l AS (SELECT event_type,
             CASE WHEN next_purchase_us IS NOT NULL
               AND next_purchase_us - ts_us <= 604800000000
               THEN 1 ELSE 0 END AS label
           FROM f WHERE event_type <> 'purchase')
         SELECT event_type, COUNT(*) AS n,
           CAST(SUM(label) AS BIGINT) AS n_pos,
           round(CAST(CAST(SUM(label) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS pos_rate
         FROM l GROUP BY 1 ORDER BY event_type""",
    "q_lsh_curve" ->
      """SELECT round(i / 10.0, 1) AS j,
           round(1.0 - power(1.0 - power(i / 10.0, 4.0), 16.0), 6)
             AS p_candidate
         FROM range(1, 10) t(i) ORDER BY j""",
    "q_rolling_corr" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS BIGINT) AS vc,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS pc
           FROM events GROUP BY 1),
         r AS (SELECT day,
             COUNT(*) OVER w AS n,
             CAST(SUM(vc) OVER w AS BIGINT) AS sx,
             CAST(SUM(pc) OVER w AS BIGINT) AS sy,
             CAST(SUM(vc * pc) OVER w AS BIGINT) AS sxy,
             CAST(SUM(vc * vc) OVER w AS BIGINT) AS sxx,
             CAST(SUM(pc * pc) OVER w AS BIGINT) AS syy
           FROM daily
           WINDOW w AS (ORDER BY day
             ROWS BETWEEN 29 PRECEDING AND CURRENT ROW))
         SELECT day,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS corr30
         FROM r WHERE n = 30 ORDER BY day""",
    "q_iqr_fence" ->
      """WITH cut AS (SELECT event_type,
             percentile_disc(0.25) WITHIN GROUP (ORDER BY value) AS q1,
             percentile_disc(0.75) WITHIN GROUP (ORDER BY value) AS q3
           FROM events GROUP BY event_type)
         SELECT e.event_type, COUNT(*) AS n, c.q1, c.q3,
           round(c.q1 - 1.5 * (c.q3 - c.q1), 6) AS fence_lo,
           round(c.q3 + 1.5 * (c.q3 - c.q1), 6) AS fence_hi,
           CAST(SUM(CASE WHEN e.value < c.q1 - 1.5 * (c.q3 - c.q1)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN e.value > c.q3 + 1.5 * (c.q3 - c.q1)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_high
         FROM events e JOIN cut c ON e.event_type = c.event_type
         GROUP BY e.event_type, c.q1, c.q3
         ORDER BY e.event_type""",
    "q_ess" ->
      """WITH m AS (SELECT source, COUNT(*) AS n,
             SUM(CAST(n_chars AS DECIMAL(12,0))) AS sw,
             SUM(CAST(n_chars AS DECIMAL(12,0))
               * CAST(n_chars AS DECIMAL(12,0))) AS sww
           FROM documents GROUP BY 1)
         SELECT source, n,
           round((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
             / CAST(sww AS DOUBLE), 6) AS ess,
           round((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))
             / CAST(sww AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ess_ratio
         FROM m ORDER BY source""",
    "q_dataset_card" ->
      """WITH basic AS (SELECT COUNT(*) AS n_docs,
             COUNT(DISTINCT source) AS n_sources,
             COUNT(DISTINCT lang) AS n_langs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
           FROM documents),
         tk AS (SELECT COUNT(*) AS total_tokens,
             COUNT(DISTINCT w) AS vocab
           FROM (SELECT unnest(regexp_split_to_array(lower(text),
               '[^a-z0-9_]+')) AS w
             FROM documents) t
           WHERE w <> ''),
         dups AS (SELECT CAST(SUM(c - 1) AS BIGINT) AS n_dup_docs
           FROM (SELECT md5(text) AS h, COUNT(*) AS c FROM documents
             GROUP BY 1) g)
         SELECT n_docs, n_sources, n_langs, total_chars,
           round(CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE),
             6) AS mean_chars,
           total_tokens, vocab,
           round(CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE),
             6) AS mean_tokens,
           n_dup_docs
         FROM basic CROSS JOIN tk CROSS JOIN dups""",
    "q_growth_accounting" ->
      """WITH am AS (SELECT DISTINCT user_id,
             CAST(year(ts) * 12 + month(ts) AS BIGINT) AS m
           FROM events),
         h AS (SELECT MAX(m) AS max_m FROM am),
         l AS (SELECT m,
             LAG(m) OVER (PARTITION BY user_id ORDER BY m) AS prev_m,
             LEAD(m) OVER (PARTITION BY user_id ORDER BY m) AS next_m
           FROM am),
         lab AS (SELECT m,
             CASE WHEN prev_m IS NULL THEN 1 ELSE 0 END AS is_new,
             CASE WHEN prev_m = m - 1 THEN 1 ELSE 0 END AS is_retained,
             CASE WHEN prev_m IS NOT NULL AND prev_m < m - 1 THEN 1
               ELSE 0 END AS is_resurrected,
             CASE WHEN (next_m IS NULL AND m < max_m)
               OR next_m > m + 1 THEN 1 ELSE 0 END AS churns_after
           FROM l CROSS JOIN h),
         act AS (SELECT m, COUNT(*) AS n_active,
             CAST(SUM(is_new) AS BIGINT) AS n_new,
             CAST(SUM(is_retained) AS BIGINT) AS n_retained,
             CAST(SUM(is_resurrected) AS BIGINT) AS n_resurrected
           FROM lab GROUP BY 1),
         ch AS (SELECT m + 1 AS m,
             CAST(SUM(churns_after) AS BIGINT) AS n_churned
           FROM lab GROUP BY 1)
         SELECT act.m, n_active, n_new, n_retained, n_resurrected,
           COALESCE(n_churned, 0) AS n_churned
         FROM act LEFT JOIN ch ON ch.m = act.m
         ORDER BY act.m""",
    "q_event_near_dup" ->
      """WITH l AS (SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
               PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts), event_id) AS gap_us
           FROM events)
         SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CASE WHEN gap_us IS NOT NULL AND gap_us <= 5000000
             THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
           floor(CAST(CAST(SUM(CASE WHEN gap_us IS NOT NULL
               AND gap_us <= 5000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS dup_rate
         FROM l GROUP BY 1 ORDER BY event_type""",
    "q_session_conversion" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(ts) AS us
           FROM events),
         l AS (SELECT *, LAG(us) OVER (PARTITION BY user_id
             ORDER BY us, event_id) AS prev_us FROM e),
         f AS (SELECT *, CASE WHEN prev_us IS NULL
             OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM l),
         sid AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
             ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
           FROM f),
         se AS (SELECT user_id, session_id, MIN(us) AS start_us,
             COUNT(*) AS n_events,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS has_view,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS has_purchase
           FROM sid GROUP BY 1, 2)
         SELECT start_us // 86400000000 AS day,
           COUNT(*) AS n_sessions,
           CAST(SUM(has_view * has_purchase) AS BIGINT) AS n_converted,
           floor(CAST(CAST(SUM(n_events) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
             AS mean_events,
           floor(CAST(CAST(SUM(has_view * has_purchase) AS BIGINT)
               AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6
             AS conversion_rate
         FROM se GROUP BY 1 ORDER BY day""",
    "q_dedup_attribution" ->
      """WITH w AS (
           SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), x -> x <> '') AS ws
           FROM documents),
         t AS (
           SELECT doc_id, source,
             list_distinct(list_transform(range(1, greatest(len(ws)-1, 2)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS tg
           FROM w),
         p AS (SELECT least(a.source, b.source) AS src_x,
             greatest(a.source, b.source) AS src_y
           FROM t a JOIN t b ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE) /
             (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg)))
             >= 0.5)
         SELECT src_x, src_y, COUNT(*) AS n_pairs FROM p
         GROUP BY 1, 2 ORDER BY src_x, src_y""",
    "q_zipf_fit" ->
      """WITH f AS (SELECT w, COUNT(*) AS n FROM (
             SELECT unnest(regexp_split_to_array(lower(text),
               '[^a-z0-9_]+')) AS w
             FROM documents) t
           WHERE w <> '' GROUP BY 1),
         r AS (SELECT n,
             ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank
           FROM f),
         p AS (SELECT
             CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9))
               AS x,
             CAST(round(ln(CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9))
               AS y
           FROM r),
         m AS (SELECT COUNT(*) AS vocab, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
           FROM p)
         SELECT vocab,
           round((CAST(vocab AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(vocab AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS zipf_slope,
           round(((CAST(vocab AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(vocab AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(vocab AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(vocab AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
         FROM m""",
    "q_heaps_law" ->
      """WITH toks AS (SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
               AS w
           FROM documents),
         tk AS (SELECT doc_id, w FROM toks WHERE w <> ''),
         pd AS (SELECT doc_id, COUNT(*) AS n_tok FROM tk GROUP BY 1),
         nt AS (SELECT doc_id, COUNT(*) AS new_types FROM (
             SELECT w, MIN(doc_id) AS doc_id FROM tk GROUP BY 1) f
           GROUP BY 1),
         c AS (SELECT pd.doc_id,
             CAST(SUM(n_tok) OVER (ORDER BY pd.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS bigN,
             CAST(SUM(COALESCE(new_types, 0)) OVER (ORDER BY pd.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS v
           FROM pd LEFT JOIN nt ON nt.doc_id = pd.doc_id),
         p AS (SELECT
             CAST(round(ln(CAST(bigN AS DOUBLE)), 9) AS DECIMAL(18,9))
               AS x,
             CAST(round(ln(CAST(v AS DOUBLE)), 9) AS DECIMAL(18,9))
               AS y
           FROM c),
         m AS (SELECT COUNT(*) AS n_docs, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
           FROM p)
         SELECT n_docs,
           round((CAST(n_docs AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS heaps_beta
         FROM m""",
    "q_lang_confusion" ->
      s"""WITH pred AS ($langIdOracleSql)
         SELECT d.lang AS actual_lang, p.lang_pred AS pred_lang,
           COUNT(*) AS n
         FROM documents d JOIN pred p ON d.doc_id = p.doc_id
         GROUP BY 1, 2 ORDER BY actual_lang, pred_lang""",
    "q_stopword_discovery" ->
      """WITH toks AS (SELECT source,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9_]+'))
               AS w
           FROM documents),
         tk AS (SELECT source, w FROM toks WHERE w <> ''),
         top20 AS (SELECT w FROM (SELECT w, COUNT(*) AS n FROM tk
             GROUP BY 1 ORDER BY n DESC, w LIMIT 20)),
         f AS (SELECT source,
             CASE WHEN w IN (SELECT w FROM top20) THEN 1 ELSE 0 END
               AS is_stop
           FROM tk)
         SELECT source, COUNT(*) AS n_tokens,
           CAST(SUM(is_stop) AS BIGINT) AS n_stop,
           round(CAST(CAST(SUM(is_stop) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS stop_mass
         FROM f GROUP BY 1 ORDER BY source""",
    "q_basket_rules" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         pairs AS (SELECT a.p_brand AS antecedent,
             b.p_brand AS consequent, COUNT(*) AS n_ab
           FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
             AND a.p_brand <> b.p_brand
           GROUP BY 1, 2 HAVING COUNT(*) >= 20),
         bc AS (SELECT p_brand, COUNT(*) AS c FROM ob GROUP BY 1),
         tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob)
         SELECT antecedent, consequent, n_ab,
           round(CAST(n_ab AS DOUBLE) / CAST(ca.c AS DOUBLE), 6)
             AS confidence,
           round(CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE)
             / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 6) AS lift
         FROM pairs
           JOIN bc ca ON ca.p_brand = antecedent
           JOIN bc cb ON cb.p_brand = consequent
           CROSS JOIN tot
         ORDER BY confidence DESC, antecedent, consequent LIMIT 25""",
    "q_trend_by_group" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             event_type, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         dt AS (SELECT day, CAST(SUM(n) AS BIGINT) AS dn FROM daily
           GROUP BY 1),
         sh AS (SELECT event_type,
             CAST(day AS DECIMAL(12,0)) AS x,
             CAST(round(CAST(n AS DOUBLE) / CAST(dn AS DOUBLE), 9)
               AS DECIMAL(12,9)) AS y
           FROM daily JOIN dt USING (day)),
         m AS (SELECT event_type, COUNT(*) AS n_days,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx
           FROM sh GROUP BY 1)
         SELECT event_type, n_days,
           round(CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
             AS mean_share,
           round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9)
             AS share_slope_per_day
         FROM m ORDER BY event_type""",
    "q_bootstrap_ci" -> {
      val incl = Duck.fnv(
        "(CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR))")
      s"""WITH base AS (SELECT event_id,
             CAST(value AS DECIMAL(18,6)) AS v
           FROM events),
         ex AS (SELECT event_id, v, b FROM base, range(0, 200) t(b)),
         inc AS (SELECT b, v FROM ex WHERE ($incl) % 2 = 0),
         means AS (SELECT b, CAST(SUM(v) AS DOUBLE) / COUNT(*)
             AS mean_b
           FROM inc GROUP BY b),
         pm AS (SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) AS point_mean
           FROM base)
         SELECT COUNT(*) AS n_reps, round(point_mean, 6) AS point_mean,
           round(CAST(percentile_disc(0.025)
             WITHIN GROUP (ORDER BY mean_b) AS DOUBLE), 6) AS ci_lo,
           round(CAST(percentile_disc(0.975)
             WITHIN GROUP (ORDER BY mean_b) AS DOUBLE), 6) AS ci_hi
         FROM means CROSS JOIN pm
         GROUP BY point_mean"""
    },
    "q_group_auc" ->
      """WITH s AS (SELECT source, n_chars AS score, COUNT(*) AS cnt,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
               AS BIGINT) AS p
           FROM documents GROUP BY 1, 2),
         r AS (SELECT source, p, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cnt AS DOUBLE)
               + (CAST(cnt AS DOUBLE) + 1.0) / 2.0 AS midrank
           FROM s),
         a AS (SELECT source, CAST(SUM(p) AS BIGINT) AS np,
             CAST(SUM(cnt - p) AS BIGINT) AS nn,
             SUM(CAST(p AS DOUBLE) * midrank) AS rsum
           FROM r GROUP BY 1)
         SELECT source, np AS n_pos, nn AS n_neg,
           round((rsum - CAST(np AS DOUBLE)
               * (CAST(np AS DOUBLE) + 1.0) / 2.0)
             / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS auc
         FROM a WHERE np > 0 AND nn > 0 ORDER BY source""",
    "q_gains_table" ->
      """WITH pb AS (SELECT LEAST(CAST(n_chars AS BIGINT) // 200, 9)
             AS band,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
               AS BIGINT) AS p
           FROM documents GROUP BY 1),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
             CAST(SUM(p) AS BIGINT) AS tp FROM pb),
         c AS (SELECT band, n, p,
             CAST(SUM(n) OVER (ORDER BY band DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_n,
             CAST(SUM(p) OVER (ORDER BY band DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_p
           FROM pb)
         SELECT band, n, p, cum_n, cum_p,
           round(CAST(cum_p AS DOUBLE) / CAST(tp AS DOUBLE), 6)
             AS capture,
           round((CAST(cum_p AS DOUBLE) / CAST(cum_n AS DOUBLE))
             / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) AS lift
         FROM c CROSS JOIN t ORDER BY band DESC""",
    "q_corr_matrix" -> {
      def corr(x: String, y: String, sx: String, sy: String,
          sxx: String, syy: String, sxy: String): String =
        s"""round((CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE)
              - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE))
            / sqrt((CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)
                - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST($syy AS DOUBLE)
                - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE))), 6)
           AS corr_${x}_$y"""
      s"""WITH m AS (SELECT COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sa,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sb,
             SUM(CAST(l_discount AS DECIMAL(4,2))) AS sc,
             SUM(CAST(l_tax AS DECIMAL(4,2))) AS sd,
             SUM(CAST(l_quantity AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))) AS saa,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS sbb,
             SUM(CAST(l_discount AS DECIMAL(4,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS scc,
             SUM(CAST(l_tax AS DECIMAL(4,2))
               * CAST(l_tax AS DECIMAL(4,2))) AS sdd,
             SUM(CAST(l_quantity AS DECIMAL(12,2))
               * CAST(l_extendedprice AS DECIMAL(18,2))) AS sab,
             SUM(CAST(l_quantity AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS sac,
             SUM(CAST(l_quantity AS DECIMAL(12,2))
               * CAST(l_tax AS DECIMAL(4,2))) AS sad,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(4,2))) AS sbc,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_tax AS DECIMAL(4,2))) AS sbd,
             SUM(CAST(l_discount AS DECIMAL(4,2))
               * CAST(l_tax AS DECIMAL(4,2))) AS scd
           FROM lineitem)
         SELECT n,
           ${corr("qty", "price", "sa", "sb", "saa", "sbb", "sab")},
           ${corr("qty", "discount", "sa", "sc", "saa", "scc", "sac")},
           ${corr("qty", "tax", "sa", "sd", "saa", "sdd", "sad")},
           ${corr("price", "discount", "sb", "sc", "sbb", "scc", "sbc")},
           ${corr("price", "tax", "sb", "sd", "sbb", "sdd", "sbd")},
           ${corr("discount", "tax", "sc", "sd", "scc", "sdd", "scd")}
         FROM m"""
    },
    "q_weighted_median" ->
      """WITH pv AS (SELECT l_returnflag,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS v,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS w
           FROM lineitem GROUP BY 1, 2),
         c AS (SELECT l_returnflag, v, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
           FROM pv),
         t AS (SELECT l_returnflag, SUM(w) AS tw FROM pv GROUP BY 1),
         m AS (SELECT c.l_returnflag, MIN(v) AS med_cents
           FROM c JOIN t ON t.l_returnflag = c.l_returnflag
           WHERE cw * 2 >= tw GROUP BY 1)
         SELECT l_returnflag,
           round(CAST(med_cents AS DOUBLE) / 100.0, 2)
             AS weighted_median_price
         FROM m ORDER BY l_returnflag""",
    "q_price_index" ->
      """WITH li AS (SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
             l_partkey,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS ep,
             CAST(l_quantity AS DECIMAL(12,2)) AS q
           FROM lineitem),
         pp AS (SELECT yr, l_partkey,
             CAST(round(CAST(SUM(ep) AS DOUBLE)
               / CAST(SUM(q) AS DOUBLE), 6) AS DECIMAL(18,6)) AS avgp,
             SUM(q) AS qty
           FROM li GROUP BY 1, 2),
         base AS (SELECT l_partkey, avgp AS pb, qty AS qb FROM pp
           WHERE yr = 1995)
         SELECT yr, COUNT(*) AS n_parts,
           round(CAST(SUM(avgp * qb) AS DOUBLE)
             / CAST(SUM(pb * qb) AS DOUBLE), 6) AS laspeyres_index
         FROM pp JOIN base USING (l_partkey)
         GROUP BY 1 ORDER BY yr""",
    "q_session_path" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(ts) AS us
           FROM events),
         l AS (SELECT *, LAG(us) OVER (PARTITION BY user_id
             ORDER BY us, event_id) AS prev_us FROM e),
         f AS (SELECT *, CASE WHEN prev_us IS NULL
             OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
           FROM l),
         sid AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
             ORDER BY us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
           FROM f),
         p AS (SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY us, event_id) AS path
           FROM sid GROUP BY 1, 2)
         SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY 1
         ORDER BY n_sessions DESC, path LIMIT 20""",
    "q_survival" ->
      """WITH h AS (SELECT MAX(epoch_us(ts)) AS maxus FROM events),
         pu AS (SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
               AS su,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts)
               END) AS fp
           FROM events GROUP BY user_id),
         d AS (SELECT
             CASE WHEN fp IS NOT NULL AND fp >= su THEN 1 ELSE 0 END
               AS is_event,
             CASE WHEN fp IS NOT NULL AND fp >= su
               THEN (fp - su) // 86400000000
               ELSE (maxus - su) // 86400000000 END AS dur
           FROM pu CROSS JOIN h WHERE su IS NOT NULL),
         pt AS (SELECT dur, CAST(SUM(is_event) AS BIGINT) AS d,
             CAST(SUM(1 - is_event) AS BIGINT) AS c
           FROM d GROUP BY 1),
         t AS (SELECT CAST(SUM(d + c) AS BIGINT) AS tot FROM pt),
         r AS (SELECT dur, d, c,
             tot - CAST(COALESCE(SUM(d + c) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
           FROM pt CROSS JOIN t),
         s AS (SELECT dur, d, c, n_risk,
             round(CAST(SUM(CASE WHEN d > 0 AND d < n_risk THEN
                 CAST(round(ln((CAST(n_risk AS DOUBLE)
                   - CAST(d AS DOUBLE))
                   / CAST(n_risk AS DOUBLE)), 9) AS DECIMAL(18,9))
               ELSE CAST(0.000000000 AS DECIMAL(18,9)) END)
               OVER (ORDER BY dur
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE), 6) AS log_s
           FROM r)
         SELECT dur, n_risk, d AS d_events, c AS c_censored, log_s
         FROM s WHERE d > 0 ORDER BY dur""",
    "q_lorenz" ->
      """WITH per AS (SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         b AS (SELECT CAST(floor(rev / 100000) AS BIGINT) AS band, rev
           FROM per),
         pb AS (SELECT band, COUNT(*) AS n_cust, SUM(rev) AS brev
           FROM b GROUP BY 1),
         t AS (SELECT CAST(SUM(n_cust) AS BIGINT) AS tn, SUM(brev) AS tr
           FROM pb),
         c AS (SELECT band, n_cust,
             CAST(SUM(n_cust) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_n,
             SUM(brev) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_r
           FROM pb)
         SELECT band, n_cust,
           round(CAST(cum_n AS DOUBLE) / CAST(tn AS DOUBLE), 6)
             AS cum_pop_share,
           round(CAST(cum_r AS DOUBLE) / CAST(tr AS DOUBLE), 6)
             AS cum_rev_share
         FROM c CROSS JOIN t ORDER BY band""",
    "q_ks_test" ->
      """WITH pv AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1
               END) AS BIGINT) AS cb
           FROM events WHERE event_type IN ('purchase', 'view')
           GROUP BY 1),
         c AS (SELECT
             CAST(SUM(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cuma,
             CAST(SUM(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumb
           FROM pv),
         t AS (SELECT MAX(cuma) AS na, MAX(cumb) AS nb FROM c),
         d AS (SELECT na, nb,
             MAX(abs(cuma * nb - cumb * na)) AS dnum
           FROM c CROSS JOIN t GROUP BY na, nb)
         SELECT na, nb,
           round(CAST(dnum AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS ks_d,
           round(1.358 * sqrt(CAST(na + nb AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 6) AS crit_05,
           round(CAST(dnum AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
             > round(1.358 * sqrt(CAST(na + nb AS DOUBLE)
               / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 6)
             AS reject_05
         FROM d""",
    "q_mann_whitney" ->
      """WITH pv AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1
               END) AS BIGINT) AS cb
           FROM events WHERE event_type IN ('purchase', 'view')
           GROUP BY 1),
         c AS (SELECT ca, cb, ca + cb AS cnt,
             CAST(SUM(ca + cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM pv),
         a AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(cb) AS BIGINT) AS nb,
             CAST(SUM(ca * (2 * (cum - cnt) + cnt + 1)) AS BIGINT)
               AS sum2
           FROM c)
         SELECT na, nb,
           round(CAST(sum2 AS DOUBLE) / 2.0
             - CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0) / 2.0, 6)
             AS u_stat,
           round((CAST(sum2 AS DOUBLE) / 2.0
               - CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0) / 2.0
               - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
             / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
               * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0)
               / 12.0), 6) AS z_stat
         FROM a""",
    "q_did" ->
      """WITH users AS (SELECT DISTINCT user_id FROM events),
         h AS (SELECT user_id,
             md5('11:' || CAST(user_id AS VARCHAR)) AS hh FROM users),
         hv AS (SELECT user_id, list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef', hh[i:i]) - 1
               AS BIGINT)),
             (a, d) -> a * 16 + d) AS hv
           FROM h),
         u AS (SELECT user_id,
             round((CAST(hv AS DOUBLE) + 0.5) / 4294967296.0, 6) < 0.5
               AS in_a
           FROM hv),
         m AS (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
             AS mid FROM events),
         cl AS (SELECT in_a, epoch_us(ts) >= mid AS post,
             CAST(value AS DECIMAL(18,6)) AS v
           FROM events JOIN u USING (user_id) CROSS JOIN m),
         agg AS (SELECT
             CAST(SUM(CASE WHEN in_a AND post THEN 1 ELSE 0 END)
               AS BIGINT) AS n_ap,
             CAST(SUM(CASE WHEN in_a AND NOT post THEN 1 ELSE 0 END)
               AS BIGINT) AS n_a0,
             CAST(SUM(CASE WHEN NOT in_a AND post THEN 1 ELSE 0 END)
               AS BIGINT) AS n_bp,
             CAST(SUM(CASE WHEN NOT in_a AND NOT post THEN 1 ELSE 0 END)
               AS BIGINT) AS n_b0,
             SUM(CASE WHEN in_a AND post THEN v END) AS s_ap,
             SUM(CASE WHEN in_a AND NOT post THEN v END) AS s_a0,
             SUM(CASE WHEN NOT in_a AND post THEN v END) AS s_bp,
             SUM(CASE WHEN NOT in_a AND NOT post THEN v END) AS s_b0
           FROM cl)
         SELECT n_ap, n_a0, n_bp, n_b0,
           round((CAST(s_ap AS DOUBLE) / n_ap
               - CAST(s_a0 AS DOUBLE) / n_a0)
             - (CAST(s_bp AS DOUBLE) / n_bp
               - CAST(s_b0 AS DOUBLE) / n_b0), 6) AS did
         FROM agg""",
    "events_stream_ohlc" ->
      """WITH e AS (SELECT epoch_us(date_trunc('hour', ts))
             AS window_start_us,
             epoch_us(ts) AS us, event_id, value
           FROM events WHERE event_type = 'purchase'),
         r AS (SELECT window_start_us, value,
             ROW_NUMBER() OVER (PARTITION BY window_start_us
               ORDER BY us, event_id) AS rna,
             ROW_NUMBER() OVER (PARTITION BY window_start_us
               ORDER BY us DESC, event_id DESC) AS rnd
           FROM e)
         SELECT window_start_us, COUNT(*) AS n,
           MAX(CASE WHEN rna = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rnd = 1 THEN value END) AS close
         FROM r GROUP BY 1 ORDER BY window_start_us""",
    "q_component_sizes" ->
      """WITH RECURSIVE ps AS (SELECT DISTINCT l_partkey, l_suppkey
           FROM lineitem WHERE l_quantity <= 2),
         p AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
             AND a.l_suppkey < b.l_suppkey),
         e AS (SELECT u AS src, v AS dst FROM p
               UNION ALL SELECT v, u FROM p),
         reach(id, r) AS (
           SELECT src, src FROM e
           UNION
           SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst),
         comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
         cs AS (SELECT comp, COUNT(*) AS csize FROM comp GROUP BY 1)
         SELECT csize, COUNT(*) AS n_components FROM cs GROUP BY 1
         ORDER BY csize""",
    "q_ohlc" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour,
             epoch_us(ts) AS us, event_id, value
           FROM events WHERE event_type = 'purchase'),
         r AS (SELECT hour, value,
             ROW_NUMBER() OVER (PARTITION BY hour
               ORDER BY us, event_id) AS rna,
             ROW_NUMBER() OVER (PARTITION BY hour
               ORDER BY us DESC, event_id DESC) AS rnd
           FROM e)
         SELECT hour, COUNT(*) AS n,
           MAX(CASE WHEN rna = 1 THEN value END) AS open,
           MAX(value) AS high, MIN(value) AS low,
           MAX(CASE WHEN rnd = 1 THEN value END) AS close
         FROM r GROUP BY 1 ORDER BY hour""",
    "q_l_diversity" ->
      """SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nation,
           COUNT(*) AS n,
           COUNT(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT))
             AS l_div,
           COUNT(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) < 3
             AS violates
         FROM customer GROUP BY 1, 2 ORDER BY c_mktsegment, nation""",
    "q_fk_violations" ->
      """WITH a AS (SELECT 'l_orderkey' AS fk,
             CAST(COUNT(*) AS BIGINT) AS n_orphans,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orphan_keys
           FROM lineitem WHERE l_orderkey NOT IN
             (SELECT o_orderkey FROM orders)),
         b AS (SELECT 'l_partkey',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
           FROM lineitem WHERE l_partkey NOT IN
             (SELECT p_partkey FROM part)),
         c AS (SELECT 'l_suppkey',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
           FROM lineitem WHERE l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier))
         SELECT * FROM a UNION ALL SELECT * FROM b
         UNION ALL SELECT * FROM c ORDER BY fk""",
    "q_concurrency" ->
      """WITH p AS (
           SELECT epoch_us(ts) AS us, CAST(1 AS BIGINT) AS d FROM events
           UNION ALL
           SELECT epoch_us(ts) + 1800000000, CAST(-1 AS BIGINT)
           FROM events),
         p2 AS (SELECT us, d, us // 86400000000 AS day FROM p),
         run AS (SELECT day,
             CAST(SUM(d) OVER (PARTITION BY day ORDER BY us) AS BIGINT)
               AS rin
           FROM p2),
         net AS (SELECT day, CAST(SUM(d) AS BIGINT) AS net FROM p2
           GROUP BY 1),
         carry AS (SELECT day,
             CAST(COALESCE(SUM(net) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS carry
           FROM net)
         SELECT r.day, CAST(MAX(r.rin + c.carry) AS BIGINT)
           AS max_concurrency
         FROM run r JOIN carry c ON c.day = r.day
         GROUP BY r.day ORDER BY r.day""",
    "q_random_projection" -> {
      // the ±1 matrix regenerates from splitmix64(j*64+i) parity in
      // HUGEINT mod-2^64 arithmetic; fold order matches the kernel's
      // while loop exactly (dim-order sequential)
      def proj(j: Int): String =
        s"round(list_reduce(list_transform(range(1, 65), " +
          s"i -> CAST(embedding[i] AS DOUBLE) * " +
          s"(CASE WHEN (${Duck.mix64(s"(${j * 64} + i)")}) % 2 = 0 " +
          s"THEN 1.0 ELSE -1.0 END)), (x, y) -> x + y), 6) AS p$j"
      s"""SELECT vec_id, ${proj(0)}, ${proj(1)}, ${proj(2)}, ${proj(3)}
         FROM embeddings ORDER BY vec_id"""
    },
    "q_table_cdf" ->
      s"""$txnTableCtes,
         j AS (SELECT a.o_orderkey AS pk, b.o_orderkey AS qk,
             a.o_totalprice AS pre_price, b.o_totalprice AS post_price,
             ((a.o_custkey IS DISTINCT FROM b.o_custkey)
               OR (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
               OR (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
               OR (a.o_orderdate IS DISTINCT FROM b.o_orderdate)
               OR (a.o_orderpriority IS DISTINCT FROM b.o_orderpriority))
               AS differs
           FROM v1 a FULL OUTER JOIN v3 b ON a.o_orderkey = b.o_orderkey),
         ev AS (
           SELECT qk AS o_orderkey, 'insert' AS _change_type,
             post_price AS p
           FROM j WHERE pk IS NULL
           UNION ALL
           SELECT pk, 'delete', pre_price FROM j WHERE qk IS NULL
           UNION ALL
           SELECT pk, 'update_preimage', pre_price FROM j
           WHERE pk IS NOT NULL AND qk IS NOT NULL AND differs
           UNION ALL
           SELECT qk, 'update_postimage', post_price FROM j
           WHERE pk IS NOT NULL AND qk IS NOT NULL AND differs)
         SELECT o_orderkey, _change_type, round(p, 2) AS o_totalprice
         FROM ev ORDER BY o_orderkey, _change_type""",
    "q_mv_incremental" ->
      s"""$txnTableCtes
         SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
         FROM v3 GROUP BY 1 ORDER BY o_orderpriority""",
    "q_table_cdc" ->
      s"""$txnTableCtes,
         j AS (SELECT coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey,
             CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                  WHEN b.o_orderkey IS NULL THEN 'delete'
                  WHEN (a.o_custkey IS DISTINCT FROM b.o_custkey)
                    OR (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
                    OR (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
                    OR (a.o_orderdate IS DISTINCT FROM b.o_orderdate)
                    OR (a.o_orderpriority IS DISTINCT FROM b.o_orderpriority)
                  THEN 'update' END AS change_type,
             round(CASE WHEN b.o_orderkey IS NULL THEN a.o_totalprice
                        ELSE b.o_totalprice END, 2) AS o_totalprice
           FROM v1 a FULL OUTER JOIN v3 b ON a.o_orderkey = b.o_orderkey)
         SELECT o_orderkey, change_type, o_totalprice FROM j
         WHERE change_type IS NOT NULL ORDER BY o_orderkey""",
    "q_table_history" ->
      s"""$txnTableCtes
         SELECT * FROM (
           SELECT CAST(0 AS BIGINT) AS version, 'create' AS op,
             (SELECT COUNT(*) FROM base) AS n_rows
           UNION ALL SELECT 1, 'append', (SELECT COUNT(*) FROM v1)
           UNION ALL SELECT 2, 'merge', (SELECT COUNT(*) FROM v2)
           UNION ALL SELECT 3, 'delete', (SELECT COUNT(*) FROM v3)
           UNION ALL SELECT 4, 'cluster', (SELECT COUNT(*) FROM v3)
         ) ORDER BY version""",
    "q_table_prune" ->
      s"""$txnTableCtes
         SELECT COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM v3 WHERE o_orderkey BETWEEN 1000 AND 5000""",
    "q_table_schema_evo" ->
      """WITH v0 AS (SELECT doc_id, lang, n_chars,
             CAST(NULL AS BIGINT) AS quality
           FROM documents WHERE doc_id % 2 = 0),
         v1 AS (SELECT doc_id, lang, n_chars, n_chars // 5 AS quality
           FROM documents WHERE doc_id % 2 = 1),
         t AS (SELECT * FROM v0 UNION ALL SELECT * FROM v1)
         SELECT lang, COUNT(*) AS n, COUNT(quality) AS n_q,
           CAST(SUM(quality) AS BIGINT) AS sum_q
         FROM t GROUP BY 1 ORDER BY 1""",
    "docs_stream_table" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_table_stream_read" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    // change-feed replay of the fixture history: v0/v1/v4 appends as
    // inserts, v2 merge as insert + update pre/post images + deletes,
    // v3 compact absent (no logical change)
    "q_table_cdf_stream" ->
      """WITH chg AS (
           SELECT 0 AS v, 'insert' AS ct, doc_id, n_chars
             FROM documents WHERE doc_id % 4 = 0
           UNION ALL SELECT 1, 'insert', doc_id, n_chars
             FROM documents WHERE doc_id % 4 = 1
           UNION ALL SELECT 2, 'insert', doc_id, n_chars
             FROM documents WHERE doc_id % 4 = 2
           UNION ALL SELECT 2, 'update_preimage', doc_id, n_chars
             FROM documents WHERE doc_id % 8 = 1
           UNION ALL SELECT 2, 'update_postimage', doc_id,
               COALESCE(n_chars, 0) + 1000
             FROM documents WHERE doc_id % 8 = 1
           UNION ALL SELECT 2, 'delete', doc_id, n_chars
             FROM documents WHERE doc_id % 8 = 4
           UNION ALL SELECT 4, 'insert', doc_id, n_chars
             FROM documents WHERE doc_id % 4 = 3)
         SELECT CAST(v AS BIGINT) AS commit_version, ct AS change_type,
           COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_id,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM chg GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_table_stream_agg" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_table_timetravel_ts" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE doc_id % 4 IN (0, 1)
         GROUP BY 1 ORDER BY 1""",
    // SQL VERSION AS OF 1 through the catalog = the same v1 slice
    "q_table_sql_timetravel" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE doc_id % 4 IN (0, 1)
         GROUP BY 1 ORDER BY 1""",
    // rename+drop evolution: all three append generations serve under
    // the renamed column; the dropped one is simply gone
    "q_table_rename_drop" ->
      """SELECT doc_id % 3 AS bucket, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    // ADD COLUMN: even slice predates the column (note NULL → 'none'),
    // odd slice appended after the DDL carries 'fresh'
    "q_table_sql_addcol" ->
      """SELECT CASE WHEN doc_id % 2 = 1 THEN 'fresh' ELSE 'none' END
             AS note,
           COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    // file-group COW: +7 on the matched doc_id range only
    "q_table_cow_pruned" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(CASE WHEN doc_id BETWEEN 100 AND 199
             THEN n_chars + 7 ELSE n_chars END) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    // graft_history TVF: the fixture is create(%4=0) then three
    // appends — cumulative bucket counts replay the history rows
    "q_table_sql_history" ->
      """WITH c AS (SELECT doc_id % 4 AS b, COUNT(*) AS n
             FROM documents GROUP BY 1)
         SELECT b AS version,
           CASE WHEN b = 0 THEN 'create' ELSE 'append' END AS op,
           CAST(SUM(n) OVER (ORDER BY b) AS BIGINT) AS n_rows
         FROM c ORDER BY 1""",
    // paced drain: bounded micro-batches, same rows — the replay truth
    "q_table_stream_paced" ->
      """SELECT doc_id % 4 AS bucket, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    // native sink: seed slice + three streamed epochs == all documents
    "q_table_stream_sink" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    // the schema-widening stream: pre-evolution rows (the doc_id%4=0
    // create) have no lang and bucket under '_pre'
    "q_table_stream_evolve" ->
      """SELECT CASE WHEN doc_id % 4 = 0 THEN '_pre' ELSE lang END
           AS lang_bucket,
           COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    // integer-exact CUSUM: dev = days*c - total, reset recursion =
    // prefix sum minus its running min
    "q_cusum_drift" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS c FROM events GROUP BY 1, 2),
         tot AS (SELECT event_type, SUM(c) AS total, COUNT(*) AS days
             FROM daily GROUP BY 1),
         runs AS (SELECT d.event_type, d.day, t.days, t.total,
             SUM(t.days * d.c - t.total) OVER
               (PARTITION BY d.event_type ORDER BY d.day) AS run
           FROM daily d JOIN tot t USING (event_type)),
         st AS (SELECT event_type, days, total,
             run - LEAST(MIN(run) OVER
               (PARTITION BY event_type ORDER BY day), 0) AS cusum
           FROM runs)
         SELECT event_type, MAX(days) AS n_days,
           CAST(MAX(cusum) AS BIGINT) AS max_cusum,
           CAST(SUM(CASE WHEN cusum > total THEN 1 ELSE 0 END)
             AS BIGINT) AS alarm_days
         FROM st GROUP BY 1 ORDER BY 1""",
    // expanding-mean deviation, each mean term quantized to DECIMAL
    // before the cumulative sum (engine-identical series)
    "q_page_hinkley" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS c FROM events GROUP BY 1, 2),
         runs AS (SELECT event_type, day,
             SUM(c) OVER w AS s_j, COUNT(*) OVER w AS j
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         m AS (SELECT event_type, day, s_j,
             CAST(round(CAST(s_j AS DOUBLE) / CAST(j AS DOUBLE), 9)
               AS DECIMAL(28,9)) AS mean_j
           FROM runs),
         u AS (SELECT event_type, day,
             CAST(s_j AS DECIMAL(28,9)) - SUM(mean_j) OVER
               (PARTITION BY event_type ORDER BY day) AS u
           FROM m),
         ph AS (SELECT event_type,
             u - MIN(u) OVER (PARTITION BY event_type ORDER BY day) AS ph
           FROM u)
         SELECT event_type, round(CAST(MAX(ph) AS DOUBLE), 6) AS max_ph,
           CAST(SUM(CASE WHEN ph > 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS alarm_days
         FROM ph GROUP BY 1 ORDER BY 1""",
    // rank-formula Gini from exact integer aggregates; one final
    // double division of identical integers
    "q_gini_sources" ->
      """WITH r AS (SELECT source, n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY n_chars, doc_id) AS BIGINT) AS i
           FROM documents WHERE n_chars IS NOT NULL)
         SELECT source, COUNT(*) AS n,
           round(CAST(2 * SUM(i * n_chars)
               - (COUNT(*) + 1) * SUM(n_chars) AS DOUBLE)
             / CAST(COUNT(*) * SUM(n_chars) AS DOUBLE), 6) AS gini
         FROM r GROUP BY 1 ORDER BY 1""",
    // HHI as an exact ppm integer — zero float anywhere
    "q_herfindahl" ->
      """WITH cs AS (SELECT lang, source, COUNT(*) AS cnt
             FROM documents GROUP BY 1, 2)
         SELECT lang, COUNT(*) AS n_sources,
           CAST((1000000 * SUM(cnt * cnt)) // (SUM(cnt) * SUM(cnt))
             AS BIGINT) AS hhi_ppm
         FROM cs GROUP BY 1 ORDER BY 1""",
    // neighborhood-overlap Jaccard on the q_adamic_adar edge artifact,
    // exact ppm integers
    "q_jaccard_linkpred" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
             FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
               AND a.l_suppkey <> b.l_suppkey),
         deg AS (SELECT src AS v, COUNT(*) AS deg FROM e GROUP BY 1),
         cn AS (SELECT a.src AS u, b.dst AS w, COUNT(*) AS c
             FROM e a JOIN e b ON a.dst = b.src
             WHERE a.src < b.dst
               AND NOT EXISTS (SELECT 1 FROM e
                 WHERE e.src = a.src AND e.dst = b.dst)
             GROUP BY 1, 2)
         SELECT u, w,
           CAST((1000000 * c) // (du.deg + dw.deg - c) AS BIGINT)
             AS jaccard_ppm
         FROM cn JOIN deg du ON du.v = cn.u
           JOIN deg dw ON dw.v = cn.w
         ORDER BY jaccard_ppm DESC, u, w LIMIT 20""",
    // 3 deterministic pseudo-raters; kappa from exact integer moments
    "q_fleiss_kappa" -> {
      val fold = """list_reduce(list_transform(range(1, 9),
           i -> CAST(strpos('0123456789abcdef',
             (md5('fk:' || CAST(r AS VARCHAR) || ':'
               || CAST(doc_id AS VARCHAR)))[i:i]) - 1
             AS BIGINT)), (a, d) -> a * 16 + d)"""
      s"""WITH lab AS (SELECT lang, doc_id,
             (LEAST(n_chars // 400, 2)
               + CASE WHEN $fold % 5 = 0 THEN 1 + r ELSE 0 END) % 3
               AS label
           FROM documents, (SELECT UNNEST([1, 2, 3]) AS r)
           WHERE n_chars IS NOT NULL),
         cell AS (SELECT lang, doc_id, label, COUNT(*) AS nij
           FROM lab GROUP BY 1, 2, 3),
         pl AS (SELECT lang, COUNT(*) AS nd, SUM(sq) AS ssum FROM
           (SELECT lang, doc_id, SUM(nij * nij) AS sq
             FROM cell GROUP BY 1, 2) GROUP BY 1),
         cs AS (SELECT lang, SUM(cj * cj) AS c2 FROM
           (SELECT lang, label, SUM(nij) AS cj
             FROM cell GROUP BY 1, 2) GROUP BY 1)
         SELECT pl.lang, nd AS n_docs,
           round(CAST(3 * nd * (ssum - 3 * nd) - 2 * c2 AS DOUBLE)
             / CAST(18 * nd * nd - 2 * c2 AS DOUBLE), 6) AS kappa
         FROM pl JOIN cs ON pl.lang = cs.lang ORDER BY 1"""
    },
    // three quantized minorization sweeps, unrolled (the fixpoint
    // recipe of the PageRank oracle)
    "q_bradley_terry" -> {
      def sweep(k: Int) =
        s"""d$k AS (SELECT n.u,
             SUM(CAST(round(CAST(n.n AS DOUBLE)
               / (CAST(pu.p AS DOUBLE) + CAST(pv.p AS DOUBLE)), 9)
               AS DECIMAL(18,9))) AS den
           FROM nij n JOIN p${k - 1} pu ON pu.u = n.u
             JOIN p${k - 1} pv ON pv.u = n.v GROUP BY 1),
         p$k AS (SELECT d$k.u,
             CAST(round(CAST(COALESCE(wt.wtot, 0) AS DOUBLE)
               / CAST(d$k.den AS DOUBLE), 9) AS DECIMAL(18,9)) AS p
           FROM d$k LEFT JOIN wt ON wt.u = d$k.u)"""
      s"""WITH bysrc AS (SELECT doc_id % 64 AS g, source,
             SUM(COALESCE(n_chars, 0)) AS sc
           FROM documents GROUP BY 1, 2),
         wins AS (SELECT CASE WHEN a.sc > b.sc THEN a.source
               ELSE b.source END AS win,
             CASE WHEN a.sc > b.sc THEN b.source
               ELSE a.source END AS lose,
             COUNT(*) AS w
           FROM bysrc a JOIN bysrc b ON a.g = b.g
             AND a.source < b.source
           WHERE a.sc <> b.sc GROUP BY 1, 2),
         nij AS (SELECT u, v, SUM(w) AS n FROM (
             SELECT win AS u, lose AS v, w FROM wins
             UNION ALL SELECT lose AS u, win AS v, w FROM wins)
           GROUP BY 1, 2),
         wt AS (SELECT win AS u, SUM(w) AS wtot FROM wins GROUP BY 1),
         p0 AS (SELECT DISTINCT u, CAST(1.0 AS DECIMAL(18,9)) AS p
           FROM nij),
         ${sweep(1)},
         ${sweep(2)},
         ${sweep(3)}
         SELECT u AS source, round(CAST(p AS DOUBLE), 6) AS strength
         FROM p3 ORDER BY strength DESC, source"""
    },
    // truncated-dim candidate ranking scored against full-dim truth;
    // 4dp cosines (the ANN battery's rounding), 9dp-quantized
    // per-position DCG terms
    "q_ndcg_eval" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
         qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 8),
         scored AS (SELECT qid, vec_id,
             round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v))
                 * sqrt(list_dot_product(qv, qv))), 4) AS cf,
             round(list_dot_product(v[1:16], qv[1:16])
               / (sqrt(list_dot_product(v[1:16], v[1:16]))
                 * sqrt(list_dot_product(qv[1:16], qv[1:16]))), 4) AS cp
           FROM emb, qs WHERE vec_id <> qid),
         ranked AS (SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cf DESC, vec_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cp DESC, vec_id) AS rp
           FROM scored),
         truth AS (SELECT qid, vec_id, 11 - rf AS rel
           FROM ranked WHERE rf <= 10),
         dcg AS (SELECT r.qid,
             SUM(CAST(round(CAST(COALESCE(t.rel, 0) AS DOUBLE)
               / (ln(CAST(r.rp + 1 AS DOUBLE)) / ln(2.0)), 9)
               AS DECIMAL(18,9))) AS dcg
           FROM ranked r LEFT JOIN truth t
             ON t.qid = r.qid AND t.vec_id = r.vec_id
           WHERE r.rp <= 10 GROUP BY 1),
         idcg AS (SELECT SUM(CAST(round(CAST(11 - i AS DOUBLE)
               / (ln(CAST(i + 1 AS DOUBLE)) / ln(2.0)), 9)
               AS DECIMAL(18,9))) AS idcg
           FROM (SELECT CAST(range AS BIGINT) AS i FROM range(1, 11)))
         SELECT qid, round(CAST(dcg AS DOUBLE)
             / CAST(idcg AS DOUBLE), 6) AS ndcg
         FROM dcg, idcg ORDER BY qid""",
    // top-50 order statistics per source, 9dp-quantized log ratios
    "q_hill_tail" ->
      """WITH ranked AS (SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS r
           FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
         xk AS (SELECT source, n_chars AS xk FROM ranked WHERE r = 51),
         t AS (SELECT ranked.source,
             CAST(round(ln(CAST(n_chars AS DOUBLE) / CAST(xk AS DOUBLE)),
               9) AS DECIMAL(18,9)) AS t
           FROM ranked JOIN xk ON ranked.source = xk.source
           WHERE r <= 50)
         SELECT source, COUNT(*) AS k,
           round(CAST(SUM(t) AS DOUBLE) / 50.0, 6) AS hill,
           round(50.0 / CAST(SUM(t) AS DOUBLE), 6) AS alpha
         FROM t GROUP BY 1 ORDER BY 1""",
    // reciprocal rank of the full-dim top-1 within the truncated top-10
    "q_mrr_eval" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
         qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 8),
         scored AS (SELECT qid, vec_id,
             round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v))
                 * sqrt(list_dot_product(qv, qv))), 4) AS cf,
             round(list_dot_product(v[1:16], qv[1:16])
               / (sqrt(list_dot_product(v[1:16], v[1:16]))
                 * sqrt(list_dot_product(qv[1:16], qv[1:16]))), 4) AS cp
           FROM emb, qs WHERE vec_id <> qid),
         ranked AS (SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cf DESC, vec_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cp DESC, vec_id) AS rp
           FROM scored)
         SELECT qid, CAST(rp AS BIGINT) AS truth_rank,
           CASE WHEN rp <= 10 THEN round(1.0 / rp, 6)
                ELSE 0.0 END AS rr
         FROM ranked WHERE rf = 1 ORDER BY qid""",
    // V-measure of source-as-clustering-of-lang, 9dp-exact entropies
    "q_v_measure" ->
      """WITH cell AS (SELECT lang, source, COUNT(*) AS ncs
           FROM documents GROUP BY 1, 2),
         nc AS (SELECT lang, SUM(ncs) AS nc FROM cell GROUP BY 1),
         nk AS (SELECT source, SUM(ncs) AS nk FROM cell GROUP BY 1),
         tot AS (SELECT SUM(ncs) AS n FROM cell),
         sckt AS (SELECT SUM(CAST(round(
             (CAST(ncs AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(ncs AS DOUBLE) / CAST(nk AS DOUBLE)), 9)
             AS DECIMAL(28,9))) AS sck
           FROM cell JOIN nk USING (source), tot),
         skct AS (SELECT SUM(CAST(round(
             (CAST(ncs AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(ncs AS DOUBLE) / CAST(nc AS DOUBLE)), 9)
             AS DECIMAL(28,9))) AS skc
           FROM cell JOIN nc USING (lang), tot),
         sct AS (SELECT SUM(CAST(round(
             (CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(nc AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             AS DECIMAL(28,9))) AS sc FROM nc, tot),
         skt AS (SELECT SUM(CAST(round(
             (CAST(nk AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(nk AS DOUBLE) / CAST(n AS DOUBLE)), 9)
             AS DECIMAL(28,9))) AS sk FROM nk, tot)
         SELECT CAST(n AS BIGINT) AS n_docs,
           round(CASE WHEN CAST(sc AS DOUBLE) = 0.0 THEN NULL
             ELSE 1.0 - CAST(sck AS DOUBLE) / CAST(sc AS DOUBLE)
             END, 6) AS homogeneity,
           round(CASE WHEN CAST(sk AS DOUBLE) = 0.0 THEN NULL
             ELSE 1.0 - CAST(skc AS DOUBLE) / CAST(sk AS DOUBLE)
             END, 6) AS completeness,
           round(CASE WHEN CAST(sc AS DOUBLE) = 0.0
                 OR CAST(sk AS DOUBLE) = 0.0
                 OR (1.0 - CAST(sck AS DOUBLE) / CAST(sc AS DOUBLE))
                   + (1.0 - CAST(skc AS DOUBLE) / CAST(sk AS DOUBLE))
                   = 0.0 THEN NULL
             ELSE 2.0 * (1.0 - CAST(sck AS DOUBLE) / CAST(sc AS DOUBLE))
               * (1.0 - CAST(skc AS DOUBLE) / CAST(sk AS DOUBLE))
               / ((1.0 - CAST(sck AS DOUBLE) / CAST(sc AS DOUBLE))
                 + (1.0 - CAST(skc AS DOUBLE) / CAST(sk AS DOUBLE)))
             END, 6) AS v_measure
         FROM tot, sckt, skct, sct, skt""",
    // Gwet's AC1: integer Pa ratio, 9dp-exact Pe(gamma1), q = 4
    "q_gwet_ac1" -> {
      val fold = """list_reduce(list_transform(range(1, 9),
           i -> CAST(strpos('0123456789abcdef',
             (md5('ga:' || CAST(r AS VARCHAR) || ':'
               || CAST(doc_id AS VARCHAR)))[i:i]) - 1
             AS BIGINT)), (a, d) -> a * 16 + d)"""
      s"""WITH lab AS (SELECT lang, doc_id,
             (LEAST(n_chars // 400, 2)
               + CASE WHEN $fold % 7 = 0 THEN 1 + r ELSE 0 END) % 4
               AS label
           FROM documents, (SELECT UNNEST([1, 2, 3]) AS r)
           WHERE n_chars IS NOT NULL),
         cd AS (SELECT lang, doc_id, label, COUNT(*) AS ndc
           FROM lab GROUP BY 1, 2, 3),
         pa AS (SELECT lang, COUNT(*) AS nd, SUM(agree) AS asum FROM (
             SELECT lang, doc_id, SUM(ndc * (ndc - 1)) AS agree
             FROM cd GROUP BY 1, 2)
           GROUP BY 1),
         pe AS (SELECT tc.lang, SUM(CAST(round(
             (CAST(tc.t AS DOUBLE) / (3.0 * CAST(pa.nd AS DOUBLE)))
               * (1.0 - CAST(tc.t AS DOUBLE)
                 / (3.0 * CAST(pa.nd AS DOUBLE))) / 3.0, 9)
             AS DECIMAL(18,9))) AS pesum
           FROM (SELECT lang, label, SUM(ndc) AS t
             FROM cd GROUP BY 1, 2) tc
           JOIN pa ON tc.lang = pa.lang GROUP BY tc.lang)
         SELECT pa.lang, CAST(nd AS BIGINT) AS n_docs,
           round(CAST(asum AS DOUBLE) / (6.0 * CAST(nd AS DOUBLE)), 6)
             AS pa,
           round(CAST(pesum AS DOUBLE), 6) AS pe,
           round((CAST(asum AS DOUBLE) / (6.0 * CAST(nd AS DOUBLE))
               - CAST(pesum AS DOUBLE)) / (1.0 - CAST(pesum AS DOUBLE)),
             6) AS ac1
         FROM pa JOIN pe ON pa.lang = pe.lang ORDER BY pa.lang"""
    },
    // eigenvector centrality estimate: integer-exact length-4 walks
    "q_eigencentrality" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
           WHERE a.l_suppkey <> b.l_suppkey),
         w1 AS (SELECT src AS node, CAST(COUNT(*) AS DECIMAL(38,0)) AS w
           FROM e GROUP BY src),
         w2 AS (SELECT e.src AS node, CAST(SUM(w1.w) AS DECIMAL(38,0)) AS w
           FROM e JOIN w1 ON e.dst = w1.node GROUP BY e.src),
         w3 AS (SELECT e.src AS node, CAST(SUM(w2.w) AS DECIMAL(38,0)) AS w
           FROM e JOIN w2 ON e.dst = w2.node GROUP BY e.src),
         w4 AS (SELECT e.src AS node, CAST(SUM(w3.w) AS DECIMAL(38,0)) AS w
           FROM e JOIN w3 ON e.dst = w3.node GROUP BY e.src),
         mx AS (SELECT MAX(w) AS m FROM w4)
         SELECT node AS suppkey, CAST(w AS BIGINT) AS walks4,
           CAST((CAST(w AS HUGEINT) * 1000000) // CAST(m AS HUGEINT)
             AS BIGINT) AS score_ppm
         FROM w4, mx ORDER BY score_ppm DESC, suppkey LIMIT 20""",
    // stage diagnostics for the historically driver-red rows: pure
    // integer BIGINT emissions per pipeline slice (edges -> w1 -> w4)
    "q_eig_dbg_edges" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
           WHERE a.l_suppkey <> b.l_suppkey)
         SELECT COUNT(*) AS n_edges,
           CAST(SUM(src) AS BIGINT) AS sum_src,
           CAST(SUM(dst) AS BIGINT) AS sum_dst,
           CAST(SUM((src * 1048573 + dst) % 1000003) AS BIGINT)
             AS edge_checksum
         FROM e""",
    "q_eig_dbg_w1" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
           WHERE a.l_suppkey <> b.l_suppkey),
         w1 AS (SELECT src AS node, CAST(COUNT(*) AS DECIMAL(38,0)) AS w
           FROM e GROUP BY src)
         SELECT COUNT(*) AS n_nodes, CAST(SUM(w) AS BIGINT) AS sum_w,
           CAST(MIN(w) AS BIGINT) AS min_w,
           CAST(MAX(w) AS BIGINT) AS max_w
         FROM w1""",
    "q_eig_dbg_w4" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
           WHERE a.l_suppkey <> b.l_suppkey),
         w1 AS (SELECT src AS node, CAST(COUNT(*) AS DECIMAL(38,0)) AS w
           FROM e GROUP BY src),
         w2 AS (SELECT e.src AS node, CAST(SUM(w1.w) AS DECIMAL(38,0)) AS w
           FROM e JOIN w1 ON e.dst = w1.node GROUP BY e.src),
         w3 AS (SELECT e.src AS node, CAST(SUM(w2.w) AS DECIMAL(38,0)) AS w
           FROM e JOIN w2 ON e.dst = w2.node GROUP BY e.src),
         w4 AS (SELECT e.src AS node, CAST(SUM(w3.w) AS DECIMAL(38,0)) AS w
           FROM e JOIN w3 ON e.dst = w3.node GROUP BY e.src)
         SELECT COUNT(*) AS n_nodes, CAST(SUM(w) AS BIGINT) AS sum_w,
           CAST(MIN(w) AS BIGINT) AS min_w,
           CAST(MAX(w) AS BIGINT) AS max_w
         FROM w4""",
    // raw-float and squared truncations at 1e3 (coarse slices of the
    // q_emb_norm_stats pipeline; floor is exact on both engines)
    "q_emb_dbg_raw" ->
      """WITH q AS (SELECT label,
             CAST(floor(t.e * 1e3) AS DECIMAL(38,0)) AS q
           FROM embeddings,
             UNNEST(CAST(embedding AS DOUBLE[])) AS t(e))
         SELECT label, COUNT(*) AS n_elems,
           CAST(SUM(q) AS BIGINT) AS sum_q_e3,
           CAST(MIN(q) AS BIGINT) AS min_q_e3,
           CAST(MAX(q) AS BIGINT) AS max_q_e3
         FROM q GROUP BY 1 ORDER BY 1""",
    "q_emb_dbg_sq" ->
      """WITH q AS (SELECT label,
             CAST(floor(t.e * t.e * 1e3) AS DECIMAL(38,0)) AS q
           FROM embeddings,
             UNNEST(CAST(embedding AS DOUBLE[])) AS t(e))
         SELECT label, COUNT(*) AS n_elems,
           CAST(SUM(q) AS BIGINT) AS sum_q_e3,
           CAST(MIN(q) AS BIGINT) AS min_q_e3,
           CAST(MAX(q) AS BIGINT) AS max_q_e3
         FROM q GROUP BY 1 ORDER BY 1""",
    // theta-style forecast: avg of drift extrapolation and SES(.5)
    "q_theta_forecast" ->
      """WITH RECURSIVE m AS (SELECT o_orderpriority AS pri,
             date_trunc('month', o_orderdate) AS mo,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS x
           FROM orders GROUP BY 1, 2),
         idx AS (SELECT pri, x,
             ROW_NUMBER() OVER (PARTITION BY pri ORDER BY mo) AS i,
             COUNT(*) OVER (PARTITION BY pri) AS n FROM m),
         ses AS (
           SELECT pri, CAST(1 AS BIGINT) AS i, n, x AS s
             FROM idx WHERE i = 1
           UNION ALL
           SELECT ses.pri, ses.i + 1, ses.n, 0.5 * nx.x + 0.5 * ses.s
             FROM ses JOIN idx nx
               ON nx.pri = ses.pri AND nx.i = ses.i + 1),
         fin AS (SELECT pri, s FROM ses WHERE i = n),
         ends AS (SELECT pri, MIN(n) AS n,
             MAX(CASE WHEN i = 1 THEN x END) AS x1,
             MAX(CASE WHEN i = n THEN x END) AS xn
           FROM idx GROUP BY pri)
         SELECT e.pri, CAST(e.n AS BIGINT) AS n_periods,
           round(f.s, 6) AS ses_level,
           round((e.xn - e.x1) / CAST(e.n - 1 AS DOUBLE), 6) AS drift,
           round(0.5 * (e.xn + (e.xn - e.x1) / CAST(e.n - 1 AS DOUBLE))
             + 0.5 * f.s, 6) AS forecast
         FROM ends e JOIN fin f ON e.pri = f.pri ORDER BY e.pri""",
    // MASE of the 12-month seasonal-naive over the last 6 months
    "q_mase_eval" ->
      """WITH m AS (SELECT o_orderpriority AS pri,
             date_trunc('month', o_orderdate) AS mo,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS x
           FROM orders GROUP BY 1, 2),
         idx AS (SELECT pri, x,
             ROW_NUMBER() OVER (PARTITION BY pri ORDER BY mo) AS i,
             COUNT(*) OVER (PARTITION BY pri) AS n FROM m),
         lagd AS (SELECT pri, n, i, x,
             LAG(x, 12) OVER (PARTITION BY pri ORDER BY i) AS x12
           FROM idx),
         ae AS (SELECT pri, n,
             CASE WHEN i > n - 6 THEN
               CAST(round(abs(x - x12), 9) AS DECIMAL(28,9)) END AS test_ae,
             CASE WHEN i <= n - 6 THEN
               CAST(round(abs(x - x12), 9) AS DECIMAL(28,9)) END AS train_ae
           FROM lagd WHERE x12 IS NOT NULL)
         SELECT pri, CAST(MIN(n) AS BIGINT) AS n_periods,
           COUNT(test_ae) AS n_test, COUNT(train_ae) AS n_train,
           round((CAST(SUM(test_ae) AS DOUBLE)
               / CAST(COUNT(test_ae) AS DOUBLE))
             / (CAST(SUM(train_ae) AS DOUBLE)
               / CAST(COUNT(train_ae) AS DOUBLE)), 6) AS mase
         FROM ae GROUP BY pri ORDER BY pri""",
    // Kendall's W: integer numerator, one double division
    "q_kendall_w" -> {
      val fold = """list_reduce(list_transform(range(1, 9),
           i -> CAST(strpos('0123456789abcdef',
             (md5('kw:' || CAST(r AS VARCHAR) || ':'
               || CAST(doc_id AS VARCHAR)))[i:i]) - 1
             AS BIGINT)), (a, d) -> a * 16 + d)"""
      s"""WITH lab AS (SELECT lang, doc_id,
             n_chars + ($fold % 5) AS score, r
           FROM documents, (SELECT UNNEST([1, 2, 3]) AS r)
           WHERE n_chars IS NOT NULL),
         rk AS (SELECT lang, doc_id, ROW_NUMBER() OVER (
             PARTITION BY lang, r ORDER BY score, doc_id) AS rank
           FROM lab),
         ri AS (SELECT lang, doc_id, SUM(rank) AS ri
           FROM rk GROUP BY 1, 2),
         wn AS (SELECT lang, ri,
             COUNT(*) OVER (PARTITION BY lang) AS n FROM ri)
         SELECT lang, CAST(MIN(n) AS BIGINT) AS n_docs,
           round(CAST(SUM((2*ri - 3*(n + 1)) * (2*ri - 3*(n + 1)))
               AS DOUBLE)
             / (3.0 * (CAST(MIN(n) AS DOUBLE) * CAST(MIN(n) AS DOUBLE)
               * CAST(MIN(n) AS DOUBLE) - CAST(MIN(n) AS DOUBLE))), 6)
             AS w
         FROM wn GROUP BY lang ORDER BY lang"""
    },
    // MAP@10: relevant = full-dim top-3, ranking = truncated top-10
    "q_map_eval" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
         qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 8),
         scored AS (SELECT qid, vec_id,
             round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v))
                 * sqrt(list_dot_product(qv, qv))), 4) AS cf,
             round(list_dot_product(v[1:16], qv[1:16])
               / (sqrt(list_dot_product(v[1:16], v[1:16]))
                 * sqrt(list_dot_product(qv[1:16], qv[1:16]))), 4) AS cp
           FROM emb, qs WHERE vec_id <> qid),
         ranked AS (SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cf DESC, vec_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cp DESC, vec_id) AS rp
           FROM scored),
         hits AS (SELECT qid, COUNT(*) AS n_hits,
             SUM(CAST(round(CAST(k AS DOUBLE) / CAST(rp AS DOUBLE), 9)
               AS DECIMAL(18,9))) AS psum
           FROM (SELECT qid, rp, ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY rp) AS k
               FROM ranked WHERE rf <= 3 AND rp <= 10)
           GROUP BY qid)
         SELECT q.qid, COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
           floor(COALESCE(CAST(h.psum AS DOUBLE), 0.0) / 3.0 * 1e6
             + 0.5) / 1e6 AS ap10
         FROM qs q LEFT JOIN hits h ON q.qid = h.qid ORDER BY q.qid""",
    // Anderson-Darling on a deterministic integer-scrambled unit value
    "q_ad_test" ->
      """WITH u AS (SELECT source, doc_id,
             CAST((doc_id * 2654435761) % 1000003 + 1 AS DOUBLE)
               / 1000005.0 AS u
           FROM documents),
         r AS (SELECT source, u,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY u, doc_id) AS i,
             COUNT(*) OVER (PARTITION BY source) AS n FROM u)
         SELECT source, MIN(n) AS n_docs,
           round(-CAST(MIN(n) AS DOUBLE)
             - CAST(SUM(CAST(round((2*i - 1) * ln(u)
                 + (2*(n - i) + 1) * ln(1.0 - u), 9)
               AS DECIMAL(28,9))) AS DOUBLE) / CAST(MIN(n) AS DOUBLE), 6)
             AS a2
         FROM r GROUP BY source ORDER BY source""",
    // Good-Turing r* = (r+1) N_{r+1} / N_r over the corpus unigrams
    "q_good_turing" ->
      """WITH f AS (SELECT w, COUNT(*) AS r FROM (
             SELECT UNNEST(list_filter(regexp_split_to_array(lower(text),
               '[^a-z0-9_]+'), x -> x <> '')) AS w FROM documents)
           GROUP BY w),
         ff AS (SELECT r, COUNT(*) AS n_r FROM f GROUP BY r),
         led AS (SELECT r, n_r,
             LEAD(n_r) OVER (ORDER BY r) AS n_next,
             LEAD(r) OVER (ORDER BY r) AS r_next FROM ff)
         SELECT r, n_r,
           CASE WHEN r_next = r + 1 THEN
             round(CAST(r_next AS DOUBLE) * CAST(n_next AS DOUBLE)
               / CAST(n_r AS DOUBLE), 6) END AS r_star
         FROM led WHERE r <= 5 ORDER BY r""",
    // Chao1 vocabulary-richness estimate per source
    "q_chao1" ->
      """WITH cs AS (SELECT source, w, COUNT(*) AS csw FROM (
             SELECT source, UNNEST(list_filter(regexp_split_to_array(
               lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS w
             FROM documents)
           GROUP BY source, w)
         SELECT source, COUNT(*) AS d,
           CAST(SUM(CASE WHEN csw = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN csw = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           round(CAST(COUNT(*) AS DOUBLE)
             + CAST(SUM(CASE WHEN csw = 1 THEN 1 ELSE 0 END)
                 * (SUM(CASE WHEN csw = 1 THEN 1 ELSE 0 END) - 1)
               AS DOUBLE)
               / (2.0 * CAST(SUM(CASE WHEN csw = 2 THEN 1 ELSE 0 END) + 1
                 AS DOUBLE)), 6) AS chao1
         FROM cs GROUP BY source ORDER BY source""",
    // Hellinger distance source-vs-corpus unigram distributions
    "q_hellinger" ->
      """WITH cs AS (SELECT source, w, COUNT(*) AS csw FROM (
             SELECT source, UNNEST(list_filter(regexp_split_to_array(
               lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS w
             FROM documents)
           GROUP BY source, w),
         cw AS (SELECT w, SUM(csw) AS c FROM cs GROUP BY w),
         ns AS (SELECT source, SUM(csw) AS ns FROM cs GROUP BY source),
         tot AS (SELECT SUM(c) AS nn FROM cw),
         terms AS (SELECT cs.source, ns.ns,
             CAST(round(sqrt((CAST(csw AS DOUBLE) / CAST(ns AS DOUBLE))
               * (CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))), 9)
             AS DECIMAL(28,9)) AS t
           FROM cs JOIN cw ON cs.w = cw.w
             JOIN ns ON cs.source = ns.source, tot)
         SELECT source, CAST(MIN(ns) AS BIGINT) AS n_tokens,
           round(CAST(SUM(t) AS DOUBLE), 6) AS bhattacharyya,
           round(sqrt(GREATEST(0.0, 1.0 - CAST(SUM(t) AS DOUBLE))), 6)
             AS hellinger
         FROM terms GROUP BY source ORDER BY source""",
    // Holt's linear trend, alpha=.5 beta=.3, recursion in matched order
    "q_holt_winters" ->
      """WITH RECURSIVE m AS (SELECT o_orderpriority AS pri,
             date_trunc('month', o_orderdate) AS m,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS x
           FROM orders GROUP BY 1, 2),
         idx AS (SELECT pri, x,
             ROW_NUMBER() OVER (PARTITION BY pri ORDER BY m) AS i,
             COUNT(*) OVER (PARTITION BY pri) AS n FROM m),
         hw AS (
           SELECT i2.pri, CAST(2 AS BIGINT) AS i, i2.n,
               i2.x AS l, i2.x - i1.x AS b
             FROM idx i2 JOIN idx i1
               ON i1.pri = i2.pri AND i1.i = 1
             WHERE i2.i = 2
           UNION ALL
           SELECT hw.pri, hw.i + 1, hw.n,
               0.5 * nx.x + 0.5 * (hw.l + hw.b),
               0.3 * ((0.5 * nx.x + 0.5 * (hw.l + hw.b)) - hw.l)
                 + 0.7 * hw.b
             FROM hw JOIN idx nx
               ON nx.pri = hw.pri AND nx.i = hw.i + 1)
         SELECT pri, n AS n_periods, round(l, 6) AS level,
           round(b, 6) AS trend, round(l + b, 6) AS forecast
         FROM hw WHERE i = n ORDER BY pri""",
    // integer-exact nominal alpha: O(3n-1) / (2(9n^2 - sum c^2))
    "q_krippendorff" -> {
      val fold = """list_reduce(list_transform(range(1, 9),
           i -> CAST(strpos('0123456789abcdef',
             (md5('ka:' || CAST(r AS VARCHAR) || ':'
               || CAST(doc_id AS VARCHAR)))[i:i]) - 1
             AS BIGINT)), (a, d) -> a * 16 + d)"""
      s"""WITH lab AS (SELECT lang, doc_id,
             (LEAST(n_chars // 400, 2)
               + CASE WHEN $fold % 7 = 0 THEN 1 + r ELSE 0 END) % 4
               AS label
           FROM documents, (SELECT UNNEST([1, 2, 3]) AS r)
           WHERE n_chars IS NOT NULL),
         cell AS (SELECT lang, doc_id, label, COUNT(*) AS nij
           FROM lab GROUP BY 1, 2, 3),
         obs AS (SELECT lang, COUNT(*) AS nd, SUM(o) AS osum FROM
           (SELECT lang, doc_id, 9 - SUM(nij * nij) AS o
             FROM cell GROUP BY 1, 2) GROUP BY 1),
         marg AS (SELECT lang, SUM(cj * cj) AS c2 FROM
           (SELECT lang, label, SUM(nij) AS cj
             FROM cell GROUP BY 1, 2) GROUP BY 1)
         SELECT obs.lang, nd AS n_docs,
           round(1.0 - CAST(osum * (3 * nd - 1) AS DOUBLE)
             / CAST(2 * (9 * nd * nd - c2) AS DOUBLE), 6) AS alpha
         FROM obs JOIN marg ON obs.lang = marg.lang ORDER BY 1"""
    },
    // frequency-spectrum second moment, scale-free final ratio
    "q_yule_k" ->
      """WITH toks AS (SELECT lang,
             unnest(regexp_split_to_array(lower(text), '[^a-zA-Z0-9_]+'))
               AS w
           FROM documents),
         freq AS (SELECT lang, w, COUNT(*) AS c
           FROM toks WHERE w <> '' GROUP BY 1, 2)
         SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS vocab,
           round(10000.0 * CAST(SUM(c * c) - SUM(c) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)), 6)
             AS yule_k
         FROM freq GROUP BY 1 ORDER BY 1""",
    // mean-direction concentration from exact-decimal moment sums
    "q_emb_isotropy" ->
      """WITH dims AS (SELECT CAST(i AS BIGINT) AS d
             FROM generate_series(1, 64) t(i)),
         e AS (SELECT label, vec_id, d,
             CAST(embedding[d] AS DOUBLE) AS ef
           FROM embeddings, dims),
         e2 AS (SELECT label, COUNT(DISTINCT vec_id) AS n,
             SUM(CAST(round(ef * ef, 9) AS DECIMAL(28,12))) AS ee
           FROM e GROUP BY 1),
         sd AS (SELECT label, d,
             SUM(CAST(round(ef, 9) AS DECIMAL(28,12))) AS sd
           FROM e GROUP BY 1, 2),
         s2 AS (SELECT label,
             SUM(CAST(sd AS DECIMAL(19,9))
               * CAST(sd AS DECIMAL(19,9))) AS ss
           FROM sd GROUP BY 1)
         SELECT e2.label, n,
           round(CAST(ss AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(ee AS DOUBLE)), 6) AS isotropy
         FROM e2 JOIN s2 ON e2.label = s2.label ORDER BY 1""",
    // cells-sized integer-exact MI, one final /N division
    "q_mutual_info" ->
      """WITH cells AS (SELECT lang, source, COUNT(*) AS nls
             FROM documents GROUP BY 1, 2),
         nl AS (SELECT lang, SUM(nls) AS nl FROM cells GROUP BY 1),
         ns AS (SELECT source, SUM(nls) AS ns FROM cells GROUP BY 1),
         tot AS (SELECT SUM(nls) AS n, COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT source) AS n_sources FROM cells),
         agg AS (SELECT n, n_langs, n_sources,
             SUM(CAST(round(ln(CAST(n * nls AS DOUBLE)
               / CAST(nl.nl * ns.ns AS DOUBLE)), 9) AS DECIMAL(18,9))
               * CAST(nls AS DECIMAL(12,0))) AS misum
           FROM cells JOIN nl USING (lang) JOIN ns USING (source), tot
           GROUP BY 1, 2, 3)
         SELECT CAST(n AS BIGINT) AS n_docs, n_langs, n_sources,
           round(CAST(misum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mi_nats
         FROM agg""",
    // depth overlaps are exact integers; weights 9dp decimals
    "q_rbo_eval" ->
      """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
         qs AS (SELECT vec_id AS qid, v AS qv FROM emb WHERE vec_id < 8),
         scored AS (SELECT qid, vec_id,
             round(list_dot_product(v, qv)
               / (sqrt(list_dot_product(v, v))
                 * sqrt(list_dot_product(qv, qv))), 4) AS cf,
             round(list_dot_product(v[1:16], qv[1:16])
               / (sqrt(list_dot_product(v[1:16], v[1:16]))
                 * sqrt(list_dot_product(qv[1:16], qv[1:16]))), 4) AS cp
           FROM emb, qs WHERE vec_id <> qid),
         ranked AS (SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cf DESC, vec_id) AS rf,
             ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY cp DESC, vec_id) AS rp
           FROM scored),
         hits AS (SELECT qid, GREATEST(rf, rp) AS dmin
           FROM ranked WHERE rf <= 10 AND rp <= 10),
         depths AS (SELECT CAST(i AS BIGINT) AS d,
             CAST(round(0.1 * power(0.9, CAST(i - 1 AS DOUBLE))
               / CAST(i AS DOUBLE), 9) AS DECIMAL(18,9)) AS wgt
           FROM generate_series(1, 10) t(i)),
         xd AS (SELECT qid, d, wgt, COUNT(*) AS xd
           FROM hits JOIN depths ON dmin <= d GROUP BY 1, 2, 3)
         SELECT qid,
           round(CAST(SUM(wgt * CAST(xd AS DECIMAL(12,0))) AS DOUBLE), 6)
             AS rbo
         FROM xd GROUP BY 1 ORDER BY 1""",
    // distinct-n diversity: exact counts, scale-free final ratios
    "q_distinct_ngrams" ->
      """WITH toks AS (SELECT source, list_filter(
             regexp_split_to_array(lower(text), '[^a-zA-Z0-9_]+'),
             w -> w <> '') AS ws
           FROM documents),
         uni AS (SELECT source, COUNT(*) AS n1,
             COUNT(DISTINCT g) AS d1 FROM
           (SELECT source, unnest(ws) AS g FROM toks) GROUP BY 1),
         bi AS (SELECT source, COUNT(*) AS n2,
             COUNT(DISTINCT g) AS d2 FROM
           (SELECT source, unnest(list_transform(range(1, len(ws)),
               i -> ws[i] || ' ' || ws[i+1])) AS g
             FROM toks WHERE len(ws) >= 2) GROUP BY 1)
         SELECT source, n1 AS n_tokens,
           round(CAST(d1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS distinct1,
           round(CAST(d2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS distinct2
         FROM uni JOIN bi USING (source) ORDER BY 1""",
    // two integer hash-aggregations: cluster sizes then their histogram
    "q_dup_size_hist" ->
      """WITH g AS (SELECT lower(trim(text)) AS t, COUNT(*) AS c
             FROM documents GROUP BY 1)
         SELECT c AS cluster_size, COUNT(*) AS n_clusters,
           c * COUNT(*) AS n_docs
         FROM g GROUP BY 1 ORDER BY 1""",
    // truncated-integer norm moments: floor(e^2*1e9) is exact on both
    // engines (no rounding mode exists to disagree about floor)
    "q_emb_norm_stats" ->
      """WITH e2 AS (SELECT label, vec_id,
             CAST(floor(t.e * t.e * 1e9) AS DECIMAL(38,0)) AS e2
           FROM embeddings,
             UNNEST(CAST(embedding AS DOUBLE[])) AS t(e)),
         nr AS (SELECT label, vec_id, SUM(e2) AS norm2
           FROM e2 GROUP BY 1, 2)
         SELECT label, COUNT(*) AS n,
           CAST(MIN(norm2) AS BIGINT) AS min_norm2_e9,
           CAST(MAX(norm2) AS BIGINT) AS max_norm2_e9,
           CAST(SUM(norm2) AS BIGINT) AS sum_norm2_e9
         FROM nr GROUP BY 1 ORDER BY 1""",
    "q_table_merge_scoped" ->
      """WITH t AS (SELECT o_orderstatus,
             CASE WHEN o_custkey < 100 THEN -o_totalprice
                  ELSE o_totalprice END AS price
           FROM orders)
         SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
         FROM t GROUP BY 1 ORDER BY 1""",
    "q_table_maintenance" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
         FROM customer WHERE c_custkey BETWEEN 100 AND 600
         GROUP BY 1 ORDER BY 1""",
    // merge-with-evolution: upsert + schema widen in one commit
    "q_table_merge_evolve" ->
      """WITH t AS (SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS price,
             CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus
                  ELSE 'none' END AS status
           FROM orders)
         SELECT status, COUNT(*) AS n,
           CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
         FROM t GROUP BY 1 ORDER BY 1""",
    // the post-cluster manifest: 4 files, full row mass, 1 stats col
    "q_table_sql_files" ->
      """SELECT CAST(4 AS BIGINT) AS n_files,
           COUNT(*) AS sum_rows, CAST(1 AS INT) AS min_stats
         FROM customer""",
    // identity-partitioned lifecycle: create+appends, then partition
    // 'F' leaves via an O(metadata) manifest drop — the survivors must
    // equal the raw table minus that partition, exactly
    "q_table_identity_partition" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM orders WHERE o_orderstatus <> 'F'
         GROUP BY 1 ORDER BY 1""",
    // multi-column (status, priority) layout: a full-tuple drop and a
    // one-component subset drop, both O(metadata) — survivors replay
    "q_table_multicol_partition" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM orders
         WHERE NOT (o_orderstatus = 'F' AND o_orderpriority = '5-LOW')
           AND o_orderpriority <> '1-URGENT'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // tuple SHOW PARTITIONS: the manifest listing replayed as a raw
    // GROUP BY over both partition columns minus the dropped slices
    "q_table_show_partitions2" ->
      """SELECT o_orderstatus || '/' || o_orderpriority
             AS partition_value,
           COUNT(*) AS n
         FROM orders
         WHERE NOT (o_orderstatus = 'F' AND o_orderpriority = '5-LOW')
           AND o_orderpriority <> '1-URGENT'
         GROUP BY 1 ORDER BY 1""",
    // dynamic partition overwrite: untouched partitions verbatim plus
    // the corrected backfill slice, replayed as a raw UNION ALL
    "q_table_dyn_overwrite" ->
      """WITH t AS (
           SELECT o_orderpriority, o_totalprice FROM orders
             WHERE o_orderpriority <> '3-MEDIUM'
           UNION ALL
           SELECT o_orderpriority, o_totalprice * 2 FROM orders
             WHERE o_orderpriority = '3-MEDIUM' AND o_orderkey % 2 = 0)
         SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM t GROUP BY 1 ORDER BY 1""",
    // partition-spec evolution: status-era + priority-era, DELETE on
    // the NEW column exact across both (metadata + scoped rewrite)
    "q_table_partition_evolve" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM orders WHERE o_orderpriority <> '2-HIGH'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // range retention (DELETE WHERE year < bound, O(metadata) drop):
    // survivors equal the raw table filtered at the same bound
    "q_table_partition_retention" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM orders WHERE year(o_orderdate) >= 1996
         GROUP BY 1 ORDER BY 1""",
    // manifest-only SHOW PARTITIONS row accounting = raw group counts
    "q_table_show_partitions" ->
      """SELECT o_orderpriority, COUNT(*) AS n
         FROM orders WHERE o_orderpriority <> '5-LOW'
         GROUP BY 1 ORDER BY 1""",
    // partition lifecycle: after OPTIMIZE-one + DROP-one, the rows
    // equal the raw table minus the dropped partition, exactly
    "q_table_partition_lifecycle" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM orders WHERE o_orderpriority <> '5-LOW'
         GROUP BY 1 ORDER BY 1""",
    // z-ordered table serves the same box probe as raw z-order parquet
    "q_table_sql_zorder" ->
      """SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_qty,
           MIN(l_orderkey) AS min_okey, MAX(l_partkey) AS max_pkey
         FROM lineitem
         WHERE l_orderkey <= 2000 AND l_partkey <= 150
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    // constraint added from SQL, both halves land, union replays exactly
    "q_table_sql_constraint" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM orders GROUP BY 1 ORDER BY 1""",
    // pure-SQL OPTIMIZE/CLUSTER/VACUUM must preserve the data exactly
    "q_table_sql_maintenance" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
         FROM customer WHERE c_custkey BETWEEN 100 AND 600
         GROUP BY 1 ORDER BY 1""",
    "q_embed_dim_stats" ->
      """WITH dims AS (SELECT CAST(i AS BIGINT) AS i
             FROM generate_series(1, 64) t(i)),
         x AS (SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS e
             FROM embeddings CROSS JOIN dims),
         a AS (SELECT dim, COUNT(*) AS n,
             SUM(CAST(e AS DECIMAL(28,12))) AS s,
             SUM(CAST(e*e AS DECIMAL(28,12))) AS s2,
             MIN(e) AS mn, MAX(e) AS mx
           FROM x GROUP BY dim)
         SELECT dim, n,
           round(CAST(s AS DOUBLE)/n, 6) AS mean,
           round((CAST(s2 AS DOUBLE)
                  - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)/n, 6)
             AS variance,
           round(mn, 6) AS min_v, round(mx, 6) AS max_v
         FROM a ORDER BY dim""",
    "q_pca_project" ->
      """WITH dims AS (SELECT CAST(i AS BIGINT) AS i
             FROM generate_series(1, 64) t(i)),
         x AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS e
             FROM embeddings CROSS JOIN dims),
         m AS (SELECT i,
             CAST(SUM(CAST(e AS DECIMAL(28,12))) AS DOUBLE)/COUNT(*) AS mu
           FROM x GROUP BY i),
         c AS (SELECT vec_id, x.e - m.mu AS ce FROM x JOIN m USING (i))
         SELECT vec_id, round(SUM(ce*ce), 4) AS pnorm2
         FROM c GROUP BY vec_id ORDER BY vec_id""",
    "q_collocations" ->
      """WITH ws AS (SELECT list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             w -> w <> '') AS ws
           FROM documents),
         bi AS (SELECT unnest(list_transform(range(1, len(ws)),
             i -> ws[i] || ' ' || ws[i+1])) AS bigram
           FROM ws WHERE len(ws) >= 2),
         bc AS (SELECT split_part(bigram, ' ', 1) AS x,
             split_part(bigram, ' ', 2) AS y, COUNT(*) AS c
           FROM bi GROUP BY 1, 2),
         lc AS (SELECT x, SUM(c) AS cx FROM bc GROUP BY x),
         rc AS (SELECT y, SUM(c) AS cy FROM bc GROUP BY y),
         tot AS (SELECT SUM(c) AS nn FROM bc)
         SELECT x || ' ' || y AS bigram, c AS n,
           round(ln(CAST(c AS DOUBLE) * CAST(nn AS DOUBLE)
             / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 6) AS pmi
         FROM bc JOIN lc USING (x) JOIN rc USING (y) CROSS JOIN tot
         WHERE c >= 5
         ORDER BY pmi DESC, bigram LIMIT 30""",
    "q_pagerank" -> {
      def iter(k: Int): String =
        s"""c$k AS (SELECT e.dst,
               SUM(CAST(round(CAST(rp.r AS DOUBLE) / deg.outdeg, 12)
                 AS DECIMAL(28,12))) AS s
             FROM e JOIN deg USING (src) JOIN r${k - 1} rp ON rp.node = e.src
             GROUP BY e.dst),
           r$k AS (SELECT node,
               CAST(round((1.0 - 0.85) / nn + 0.85 *
                 CAST(coalesce(s, 0) AS DOUBLE), 12) AS DECIMAL(28,12)) AS r
             FROM nodes LEFT JOIN c$k ON node = dst CROSS JOIN nctr)"""
      s"""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
             FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
               AND a.l_suppkey <> b.l_suppkey),
         nodes AS (SELECT DISTINCT src AS node FROM e),
         deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
         nctr AS (SELECT COUNT(*) AS nn FROM nodes),
         r0 AS (SELECT node, CAST(round(1.0 / nn, 12) AS DECIMAL(28,12)) AS r
             FROM nodes CROSS JOIN nctr),
         ${iter(1)},
         ${iter(2)},
         ${iter(3)},
         ${iter(4)},
         ${iter(5)}
         SELECT node AS suppkey, round(CAST(r AS DOUBLE), 8) AS pr
         FROM r5 ORDER BY pr DESC, suppkey LIMIT 20"""
    },
    "q_markov_attribution" -> markovAttributionOracleSql,
    "q_mixture_raking" -> mixtureRakingOracleSql,
    "q20_excess" ->
      """WITH rp AS (SELECT p_partkey FROM part WHERE p_name LIKE '%red%'),
         vol AS (SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
                 AND l_shipdate < TIMESTAMP '1999-01-01'
               THEN l_quantity ELSE 0.0 END AS DECIMAL(18,6)))
               AS DOUBLE) AS qty98,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               AS qty_all
           FROM lineitem JOIN rp ON l_partkey = p_partkey
           GROUP BY 1, 2),
         ex AS (SELECT DISTINCT l_suppkey FROM vol
           WHERE qty98 > 0.5 * qty_all)
         SELECT s_suppkey, s_name
         FROM supplier
         WHERE s_nationkey < 10
           AND s_suppkey IN (SELECT l_suppkey FROM ex)
         ORDER BY s_suppkey""",
    "q12_priority" ->
      """SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
           AND l_shipdate >= TIMESTAMP '1998-01-01'
           AND l_shipdate < TIMESTAMP '1999-01-01'
         GROUP BY 1 ORDER BY 1""",
    "q21_waiting" ->
      """WITH ls AS (SELECT l_orderkey, l_suppkey,
             MAX(l_shipdate) AS smax
           FROM lineitem GROUP BY 1, 2),
         w AS (SELECT l_orderkey, l_suppkey, smax,
             MAX(smax) OVER (PARTITION BY l_orderkey) AS omax,
             MIN(smax) OVER (PARTITION BY l_orderkey) AS omin,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS nsupp
           FROM ls)
         SELECT s_suppkey, s_name, COUNT(*) AS numwait
         FROM w JOIN supplier ON l_suppkey = s_suppkey
         WHERE nsupp >= 2 AND smax = omax AND omin < omax
         GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey LIMIT 10""",
    "q_graph_robustness" ->
      """WITH RECURSIVE ps AS (SELECT DISTINCT l_partkey, l_suppkey
           FROM lineitem WHERE l_quantity <= 2),
         p AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
             AND a.l_suppkey < b.l_suppkey),
         e AS (SELECT u AS src, v AS dst FROM p
               UNION ALL SELECT v, u FROM p),
         deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
         hubs AS (SELECT src AS hub FROM deg
           ORDER BY deg DESC, src LIMIT 5),
         p2 AS (SELECT u, v FROM p
           WHERE u NOT IN (SELECT hub FROM hubs)
             AND v NOT IN (SELECT hub FROM hubs)),
         e2 AS (SELECT u AS src, v AS dst FROM p2
                UNION ALL SELECT v, u FROM p2),
         reachb(id, r) AS (
           SELECT src, src FROM e
           UNION
           SELECT e.src, reachb.r FROM e JOIN reachb ON reachb.id = e.dst),
         compb AS (SELECT id, MIN(r) AS comp FROM reachb GROUP BY id),
         csb AS (SELECT comp, COUNT(*) AS csize FROM compb GROUP BY 1),
         sb AS (SELECT CAST(SUM(csize) AS BIGINT) AS nodes_before,
             CAST(MAX(csize) AS BIGINT) AS largest_before,
             COUNT(*) AS ncomp_before FROM csb),
         reacha(id, r) AS (
           SELECT src, src FROM e2
           UNION
           SELECT e2.src, reacha.r FROM e2
             JOIN reacha ON reacha.id = e2.dst),
         compa AS (SELECT id, MIN(r) AS comp FROM reacha GROUP BY id),
         csa AS (SELECT comp, COUNT(*) AS csize FROM compa GROUP BY 1),
         sa AS (SELECT CAST(SUM(csize) AS BIGINT) AS nodes_after,
             CAST(MAX(csize) AS BIGINT) AS largest_after,
             COUNT(*) AS ncomp_after FROM csa)
         SELECT * FROM sb, sa""",
    // banded early-abandon kernel ≡ clamped full levenshtein
    "q_lev_block_dedup" ->
      """WITH t AS (SELECT doc_id, source, text,
             CAST(n_chars AS BIGINT) // 100 AS blk,
             ROW_NUMBER() OVER (PARTITION BY source,
               CAST(n_chars AS BIGINT) // 100 ORDER BY doc_id) AS rn
           FROM documents),
         c AS (SELECT * FROM t WHERE rn <= 16)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(least(levenshtein(a.text, b.text), 41) AS INTEGER)
             AS dist
         FROM c a JOIN c b ON a.source = b.source AND a.blk = b.blk
           AND a.doc_id < b.doc_id
         ORDER BY dist, id_a, id_b LIMIT 20""",
    "q_seq_patterns" ->
      """WITH ut AS (SELECT user_id, event_type,
             MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
           FROM events GROUP BY 1, 2),
         tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n
           FROM ut)
         SELECT a.event_type AS a, b.event_type AS b,
           COUNT(*) AS n_users,
           round(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(tot.n), 6)
             AS support
         FROM ut a JOIN ut b ON a.user_id = b.user_id
           AND a.event_type <> b.event_type AND a.mn < b.mx
           CROSS JOIN tot
         GROUP BY 1, 2
         ORDER BY support DESC, a, b""",
    "q_kneser_ney" ->
      """WITH ws AS (SELECT list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             w -> w <> '') AS ws
           FROM documents),
         bi AS (SELECT unnest(list_transform(range(1, len(ws)),
             i -> ws[i] || ' ' || ws[i+1])) AS bigram
           FROM ws WHERE len(ws) >= 2),
         bg AS (SELECT split_part(bigram, ' ', 1) AS x,
             split_part(bigram, ' ', 2) AS y FROM bi),
         bc AS (SELECT x, y, COUNT(*) AS c FROM bg GROUP BY 1, 2),
         cx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx,
             COUNT(*) AS n1x FROM bc GROUP BY 1),
         cy AS (SELECT y, COUNT(*) AS n1y FROM bc GROUP BY 1),
         tt AS (SELECT COUNT(*) AS t FROM bc)
         SELECT x, y, c,
           round((CAST(c AS DOUBLE) - 0.75) / CAST(cx AS DOUBLE)
             + (0.75 * CAST(n1x AS DOUBLE) / CAST(cx AS DOUBLE))
             * (CAST(n1y AS DOUBLE) / CAST(t AS DOUBLE)), 9) AS p_kn
         FROM bc JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN tt
         ORDER BY c DESC, x, y LIMIT 20""",
    "q_nelson_aalen" ->
      """WITH first AS (SELECT o_custkey,
             MIN(CAST(o_orderdate AS DATE)) AS fd
           FROM orders GROUP BY 1),
         lo AS (SELECT MIN(fd) AS d0 FROM first),
         ev AS (SELECT CAST(datediff('day', d0, fd) AS BIGINT) AS t,
             COUNT(*) AS d
           FROM first, lo GROUP BY 1),
         nt AS (SELECT CAST(SUM(d) AS BIGINT) AS n FROM ev),
         rk AS (SELECT t, d,
             n - COALESCE(SUM(d) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r
           FROM ev, nt),
         terms AS (SELECT t, d, r,
             CAST(round(CAST(d AS DOUBLE) / CAST(r AS DOUBLE), 9)
               AS DECIMAL(18,9)) AS term
           FROM rk)
         SELECT t, d, CAST(r AS BIGINT) AS r,
           round(CAST(SUM(term) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE), 6) AS cum_hazard
         FROM terms ORDER BY t LIMIT 30""",
    "q_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
             epoch_us(ts) AS ts_us FROM events),
         p AS (SELECT event_id, user_id, ts_us FROM e
           WHERE event_type = 'purchase'),
         v AS (SELECT user_id AS vu, ts_us AS vts FROM e
           WHERE event_type = 'view')
         SELECT p.event_id,
           COUNT(v.vts) AS n_candidates,
           min_by(v.vts, abs(v.vts - p.ts_us) * 2 +
             CASE WHEN v.vts > p.ts_us THEN 1 ELSE 0 END) - p.ts_us
             AS delta_us
         FROM p LEFT OUTER JOIN v ON p.user_id = v.vu
           AND v.vts >= p.ts_us - 3600000000
           AND v.vts <= p.ts_us + 3600000000
         GROUP BY p.event_id, p.ts_us
         ORDER BY p.event_id""",
    // SQL DELETE keeps rows failing the predicate (NULLs kept)
    "q_table_sql_delete" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE NOT (lang = 'de' OR n_chars < 200)
         GROUP BY 1 ORDER BY 1""",
    // COW UPDATE: +1000 on the 'de' rows only, all rows survive
    "q_table_sql_update" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(CASE WHEN lang = 'de' THEN n_chars + 1000
             ELSE n_chars END) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    // COW MERGE: table = %2==0 slice; source = %4<=1 slice (+5000);
    // matched (%4==0) take the source image, unmatched source (%4==1
    // odd ids) insert, the rest of the table carries
    "q_table_sql_merge" ->
      """WITH final AS (
           SELECT lang, COALESCE(n_chars, 0) + 5000 AS n_chars
             FROM documents WHERE doc_id % 4 <= 1
           UNION ALL
           SELECT lang, n_chars FROM documents
             WHERE doc_id % 2 = 0 AND doc_id % 4 > 1)
         SELECT lang, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM final GROUP BY 1 ORDER BY 1""",
    // storage-partitioned join over co-bucketed tables = the plain join
    "q_table_bucket_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // composed partition+bucket fact layout = the raw join truth
    // under the same partition predicate
    "q_table_part_bucket" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'F'
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // composite-key SPJ pair = the raw two-key rollup join
    "q_table_bucket_join2" ->
      """WITH q AS (SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS qty
           FROM lineitem GROUP BY 1, 2),
         r AS (SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM lineitem GROUP BY 1, 2)
         SELECT CAST(q.l_partkey % 10 AS BIGINT) AS pk_mod,
           COUNT(*) AS n_pairs,
           CAST(SUM(qty) AS DOUBLE) AS sum_qty,
           CAST(SUM(rev) AS DOUBLE) AS sum_rev
         FROM q JOIN r
           ON q.l_partkey = r.l_partkey AND q.l_suppkey = r.l_suppkey
         GROUP BY 1 ORDER BY 1""",
    // bucket-pruned point lookup = the plain filtered aggregate
    "q_table_bucket_prune" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM orders WHERE o_custkey = 3
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    // CREATE + two INSERT halves = the full documents projection
    "q_table_sql_insert" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    // CTAS stores the filtered aggregate itself
    "q_table_sql_ctas" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE n_chars >= 100
         GROUP BY lang ORDER BY lang""",
    // graft_changes(0,2): slice-1 survivors insert, short slice-0 delete
    "q_table_sql_changes" ->
      """SELECT _change_type, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM (
           SELECT 'delete' AS _change_type, n_chars FROM documents
             WHERE doc_id % 3 = 0 AND n_chars < 300
           UNION ALL
           SELECT 'insert' AS _change_type, n_chars FROM documents
             WHERE doc_id % 3 = 1
               AND (n_chars >= 300 OR n_chars IS NULL))
         GROUP BY _change_type ORDER BY _change_type""",
    // SQL restore to v1 = the first two doc_id % 4 slices
    "q_table_sql_restore" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE doc_id % 4 IN (0, 1)
         GROUP BY lang ORDER BY lang""",
    // truncate wipes the first slice; the second INSERT is the content
    "q_table_sql_truncate" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE doc_id % 2 = 1
         GROUP BY lang ORDER BY lang""",
    // selective compaction reorganizes bytes, never rows
    "q_table_compact_small" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_bal
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // compaction is physical only: the per-partition rollup equals the
    // raw table's at every policy step (the no-op fence is asserted in
    // the fixture build itself)
    "q_table_compact_policy" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",
    // metadata-answered counts: rows and non-null n_chars
    "q_table_null_agg" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(n_chars) AS BIGINT) AS n_chars_nn
         FROM documents""",
    // IS NOT NULL pruning changes the files read, never the answer
    "q_table_null_prune" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE n_chars IS NOT NULL
         GROUP BY lang ORDER BY lang""",
    // dynamic file pruning changes the files read, never the answer
    "q_table_dyn_prune" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_bal
         FROM customer JOIN (
           SELECT DISTINCT o_custkey FROM orders
           WHERE o_totalprice > 400000) d
           ON c_custkey = o_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // restore to v1 = the first two doc_id % 3 slices
    "q_table_restore" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE doc_id % 3 IN (0, 1)
         GROUP BY 1 ORDER BY 1""",
    "q_ppr" -> {
      def iter(k: Int): String =
        s"""c$k AS (SELECT e.dst,
               SUM(CAST(round(CAST(rp.r AS DOUBLE) / deg.outdeg, 12)
                 AS DECIMAL(28,12))) AS s
             FROM e JOIN deg USING (src) JOIN r${k - 1} rp ON rp.node = e.src
             GROUP BY e.dst),
           r$k AS (SELECT node,
               CAST(round(CASE WHEN node % 10 = 0
                   THEN (1.0 - 0.85) / ns ELSE 0.0 END
                 + 0.85 * CAST(coalesce(s, 0) AS DOUBLE), 12)
                 AS DECIMAL(28,12)) AS r
             FROM nodes LEFT JOIN c$k ON node = dst CROSS JOIN sctr)"""
      s"""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
             FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
               AND a.l_suppkey <> b.l_suppkey),
         nodes AS (SELECT DISTINCT src AS node FROM e),
         deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
         sctr AS (SELECT COUNT(*) AS ns FROM nodes WHERE node % 10 = 0),
         r0 AS (SELECT node, CAST(round(CASE WHEN node % 10 = 0
               THEN 1.0 / ns ELSE 0.0 END, 12) AS DECIMAL(28,12)) AS r
             FROM nodes CROSS JOIN sctr),
         ${iter(1)},
         ${iter(2)},
         ${iter(3)},
         ${iter(4)}
         SELECT node AS suppkey, round(CAST(r AS DOUBLE), 8) AS ppr
         FROM r4 ORDER BY ppr DESC, suppkey LIMIT 20"""
    },
    "q_harmonic_centrality" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
             FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
               AND a.l_suppkey <> b.l_suppkey),
         n1 AS (SELECT src, COUNT(*) AS n1 FROM e GROUP BY 1),
         two AS (SELECT DISTINCT a.src AS u, b.dst AS w
             FROM e a JOIN e b ON a.dst = b.src
             WHERE a.src <> b.dst
               AND NOT EXISTS (SELECT 1 FROM e
                 WHERE e.src = a.src AND e.dst = b.dst)),
         n2 AS (SELECT u, COUNT(*) AS n2 FROM two GROUP BY 1)
         SELECT src AS suppkey, n1, COALESCE(n2, 0) AS n2,
           CAST(n1 AS DOUBLE) + CAST(COALESCE(n2, 0) AS DOUBLE) * 0.5
             AS harmonic
         FROM n1 LEFT JOIN n2 ON src = u
         ORDER BY harmonic DESC, suppkey LIMIT 20""",
    "q_adamic_adar" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
             WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
             FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
               AND a.l_suppkey <> b.l_suppkey),
         deg AS (SELECT src AS v, COUNT(*) AS deg FROM e GROUP BY 1),
         pairs AS (SELECT a.src AS u, a.dst AS v, b.dst AS w
             FROM e a JOIN e b ON a.dst = b.src
             WHERE a.src < b.dst
               AND NOT EXISTS (SELECT 1 FROM e
                 WHERE e.src = a.src AND e.dst = b.dst))
         SELECT u, w,
           round(CAST(SUM(CAST(round(1.0 / ln(CAST(deg AS DOUBLE)), 9)
             AS DECIMAL(18,9))) AS DOUBLE), 6) AS aa_score
         FROM pairs JOIN deg USING (v)
         WHERE deg >= 2
         GROUP BY 1, 2
         ORDER BY aa_score DESC, u, w LIMIT 20""",
    // stateful streaming twin of q_cdf_incremental_agg: same live-rows
    // truth, maintained through an update-mode state store + mergeFull
    "q_cdf_stream_agg" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(CASE WHEN doc_id % 8 = 1
             THEN COALESCE(n_chars, 0) + 1000
             ELSE n_chars END) AS BIGINT) AS sum_chars
         FROM documents WHERE doc_id % 8 <> 4
         GROUP BY 1 ORDER BY 1""",
    // signed delta application ≡ final snapshot: live rows are every
    // slice except the %8==4 deletes, with %8==1 carrying the merge's
    // +1000 post-image
    "q_cdf_incremental_agg" ->
      """SELECT lang, COUNT(*) AS n,
           CAST(SUM(CASE WHEN doc_id % 8 = 1
             THEN COALESCE(n_chars, 0) + 1000
             ELSE n_chars END) AS BIGINT) AS sum_chars
         FROM documents WHERE doc_id % 8 <> 4
         GROUP BY 1 ORDER BY 1""",
    "q_sentence_dedup" ->
      """WITH s0 AS (SELECT source, doc_id,
             generate_subscripts(string_split(lower(text), '. '), 1)
               AS pos,
             unnest(string_split(lower(text), '. ')) AS sent
           FROM documents),
         s1 AS (SELECT source, doc_id, pos, trim(sent) AS sent
           FROM s0 WHERE length(trim(sent)) > 0),
         f AS (SELECT sent, MIN(doc_id * 1000 + pos) AS fk
           FROM s1 GROUP BY 1)
         SELECT source, COUNT(*) AS n_sentences,
           CAST(SUM(CASE WHEN s1.doc_id * 1000 + s1.pos = f.fk
             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           floor((1.0 - CAST(SUM(CASE WHEN s1.doc_id * 1000 + s1.pos
                 = f.fk THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS dup_rate
         FROM s1 JOIN f USING (sent)
         GROUP BY 1 ORDER BY 1""",
    "q_quality_classifier" -> qualityClassifierOracleSql,
    "q_corpus_drift" ->
      """WITH t AS (SELECT doc_id % 2 = 0 AS in_p, u.w AS w
           FROM documents, unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '')) u(w)),
         cnt AS (SELECT w,
             SUM(CASE WHEN in_p THEN 1 ELSE 0 END) AS cp,
             SUM(CASE WHEN in_p THEN 0 ELSE 1 END) AS cq
           FROM t GROUP BY w),
         tot AS (SELECT SUM(cp) AS tp, SUM(cq) AS tq, COUNT(*) AS v
           FROM cnt)
         SELECT w, CAST(cp AS BIGINT) AS cp, CAST(cq AS BIGINT) AS cq,
           round(((CAST(cp AS DOUBLE) + 1.0)
               / (CAST(tp AS DOUBLE) + CAST(v AS DOUBLE)))
             * ln(((CAST(cp AS DOUBLE) + 1.0)
                 / (CAST(tp AS DOUBLE) + CAST(v AS DOUBLE)))
               / ((CAST(cq AS DOUBLE) + 1.0)
                 / (CAST(tq AS DOUBLE) + CAST(v AS DOUBLE)))), 9)
             AS kl_term
         FROM cnt CROSS JOIN tot
         ORDER BY kl_term DESC, w LIMIT 15""",
    "q_vec_pq" -> vecPqOracleSql,
    "q_ann_pq" -> annPqOracleSql,
    "ann_ivf_pq" -> annIvfPqOracleSql,
    "q_mad_outliers" ->
      """WITH med AS (SELECT source, quantile_cont(n_chars, 0.5) AS med
           FROM documents GROUP BY source),
         dev AS (SELECT d.source, d.doc_id, d.n_chars, m.med,
             abs(d.n_chars - m.med) AS adev
           FROM documents d JOIN med m USING (source)),
         mad AS (SELECT source, quantile_cont(adev, 0.5) AS mad
           FROM dev GROUP BY source)
         SELECT dev.source, dev.doc_id, dev.n_chars,
           round((dev.n_chars - dev.med) / mad.mad, 6) AS robust_z
         FROM dev JOIN mad USING (source)
         WHERE mad.mad > 0
           AND abs(round((dev.n_chars - dev.med) / mad.mad, 6)) > 2.5
         ORDER BY dev.source, dev.doc_id""",
    "q_min_cost_supplier" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS cost
           FROM lineitem GROUP BY l_partkey, l_suppkey)
         SELECT p.p_partkey, s.s_name, round(ps.cost, 4) AS cost
         FROM ps JOIN part p ON ps.l_partkey = p.p_partkey
           JOIN supplier s ON ps.l_suppkey = s.s_suppkey
         WHERE p.p_size = 10
           AND ps.cost = (SELECT MIN(ps2.cost) FROM ps ps2
                          WHERE ps2.l_partkey = ps.l_partkey)
         ORDER BY p.p_partkey, s.s_name""",
    "q_revenue_view" ->
      """WITH revenue AS (SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,6))) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
         FROM supplier s
         JOIN revenue r ON s.s_suppkey = r.supplier_no
         WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
         ORDER BY s.s_suppkey""",
    "q_small_order_revenue" ->
      """SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS lost_revenue,
           COUNT(*) AS n_lines
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                               FROM lineitem l2
                               WHERE l2.l_partkey = l.l_partkey)
         GROUP BY p.p_brand
         ORDER BY p.p_brand""",
    "orders_stream_merge" ->
      """WITH t AS (SELECT o_orderpriority,
             CASE WHEN o_orderkey % 9 = 0 THEN o_totalprice * 2
                  WHEN o_orderkey % 9 = 3 THEN -o_totalprice
                  ELSE o_totalprice END AS price
           FROM orders)
         SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
         FROM t GROUP BY 1 ORDER BY 1""",
    "q_islands" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
           FROM events),
         g AS (SELECT user_id, day,
             datediff('day', DATE '1970-01-01', day)
               - ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY day) AS grp
           FROM d),
         runs AS (SELECT user_id, MIN(day) AS run_start,
             MAX(day) AS run_end, COUNT(*) AS run_len
           FROM g GROUP BY user_id, grp)
         SELECT user_id, run_start, run_end, run_len
         FROM runs WHERE run_len >= 5
         ORDER BY user_id, run_start""",
    "q_heavy_hitters" ->
      """WITH t AS (SELECT u.w AS w
           FROM documents, unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '')) u(w))
         SELECT w, COUNT(*) AS n FROM t
         GROUP BY w ORDER BY n DESC, w LIMIT 15""",
    "q_table_dsv2" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
         FROM customer WHERE c_custkey BETWEEN 150 AND 700
         GROUP BY 1 ORDER BY 1""",
    "q_welch_ttest" ->
      s"""WITH m AS (SELECT event_type, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS sx,
             SUM(CAST(value AS DECIMAL(18,6))
               * CAST(value AS DECIMAL(18,6))) AS sxx
           FROM events GROUP BY 1)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.na AS na, b.nb AS nb,
           round($welchTSql, 6) AS t_stat,
           round($welchDfSql, 6) AS df
         FROM (SELECT event_type, n AS na, sx AS sxa, sxx AS sxxa
                 FROM m) a
           JOIN (SELECT event_type, n AS nb, sx AS sxb, sxx AS sxxb
                 FROM m) b
             ON a.event_type < b.event_type
         ORDER BY type_a, type_b""",
    "q_anova" ->
      """WITH g AS (SELECT event_type, COUNT(*) AS gn,
             SUM(CAST(value AS DECIMAL(18,6))) AS gsx,
             SUM(CAST(value AS DECIMAL(18,6))
               * CAST(value AS DECIMAL(18,6))) AS gsxx
           FROM events GROUP BY 1),
         t AS (SELECT COUNT(*) AS k, CAST(SUM(gn) AS BIGINT) AS n,
             SUM(gsx) AS sx, SUM(gsxx) AS sxx,
             SUM(CAST(round(CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)
               / CAST(gn AS DOUBLE), 9) AS DECIMAL(28,9))) AS sgg
           FROM g)
         SELECT k, n,
           round((CAST(sgg AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
               / CAST(n AS DOUBLE)), 6) AS ss_between,
           round((CAST(sxx AS DOUBLE) - CAST(sgg AS DOUBLE)), 6)
             AS ss_within,
           round(((CAST(sgg AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                 / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0))
             / ((CAST(sxx AS DOUBLE) - CAST(sgg AS DOUBLE))
               / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat
         FROM t""",
    "q_info_gain" -> {
      def one(fv: String, name: String) =
        s"""SELECT '$name' AS feature,
             round(0.0 - CAST(hl AS DOUBLE), 6) AS h_label,
             round(0.0 - CAST(hc AS DOUBLE), 6) AS h_cond,
             round(CAST(hc AS DOUBLE) - CAST(hl AS DOUBLE), 6)
               AS info_gain
           FROM
             (SELECT SUM(${entTerm("cl", "nn")}) AS hl
               FROM (SELECT lang, COUNT(*) AS cl FROM documents
                     GROUP BY 1) l
                 CROSS JOIN (SELECT COUNT(*) AS nn FROM documents) t0) x
             CROSS JOIN
             (SELECT SUM(${entTerm("c", "cf")}) AS hc
               FROM (SELECT $fv AS fv, lang, COUNT(*) AS c
                     FROM documents GROUP BY 1, 2) cells
                 JOIN (SELECT $fv AS fv, COUNT(*) AS cf
                       FROM documents GROUP BY 1) f USING (fv)
                 CROSS JOIN (SELECT COUNT(*) AS nn FROM documents) t1) y"""
      s"""${one("CAST(source AS VARCHAR)", "source")}
         UNION ALL
         ${one("CAST(n_chars // 200 AS VARCHAR)", "len_band")}
         ORDER BY feature"""
    },
    "q_mode" ->
      """WITH d AS (SELECT event_type, isodow(ts) AS dow, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS tot FROM d
           GROUP BY 1),
         r AS (SELECT event_type, dow, n, ROW_NUMBER() OVER (
             PARTITION BY event_type ORDER BY n DESC, dow) AS rn
           FROM d)
         SELECT r.event_type, r.dow AS modal_dow, r.n,
           round(CAST(r.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
         FROM r JOIN t ON r.event_type = t.event_type
         WHERE r.rn = 1 ORDER BY r.event_type""",
    "q_decision_stump" ->
      """WITH h AS (SELECT n_chars // 100 AS bkt, COUNT(*) AS c,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
               AS BIGINT) AS p
           FROM documents GROUP BY 1),
         cum AS (SELECT bkt,
             CAST(SUM(c) OVER (ORDER BY bkt ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
             CAST(SUM(p) OVER (ORDER BY bkt ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cp
           FROM h),
         t AS (SELECT CAST(SUM(c) AS BIGINT) AS nn,
             CAST(SUM(p) AS BIGINT) AS pp FROM h),
         scored AS (SELECT bkt, cn AS n_left, nn - cn AS n_right,
             round(((CAST(cn AS DOUBLE) / CAST(nn AS DOUBLE))
               * (1.0 - (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
                      * (CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
                    - ((CAST(cn AS DOUBLE) - CAST(cp AS DOUBLE))
                        / CAST(cn AS DOUBLE))
                      * ((CAST(cn AS DOUBLE) - CAST(cp AS DOUBLE))
                        / CAST(cn AS DOUBLE)))
             + ((CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE))
                 / CAST(nn AS DOUBLE))
               * (1.0 - ((CAST(pp AS DOUBLE) - CAST(cp AS DOUBLE))
                      / (CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)))
                      * ((CAST(pp AS DOUBLE) - CAST(cp AS DOUBLE))
                      / (CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)))
                    - ((CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)
                        - CAST(pp AS DOUBLE) + CAST(cp AS DOUBLE))
                      / (CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)))
                      * ((CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE)
                        - CAST(pp AS DOUBLE) + CAST(cp AS DOUBLE))
                      / (CAST(nn AS DOUBLE) - CAST(cn AS DOUBLE))))),
               6) AS gini
           FROM cum CROSS JOIN t WHERE cn < nn)
         SELECT bkt * 100 + 100 AS threshold_chars, n_left, n_right, gini
         FROM scored ORDER BY gini, bkt LIMIT 1""",
    "q_ewma" -> {
      val w7 = """CAST(CASE k WHEN 0 THEN '1.000000000'
           WHEN 1 THEN '0.700000000' WHEN 2 THEN '0.490000000'
           WHEN 3 THEN '0.343000000' WHEN 4 THEN '0.240100000'
           WHEN 5 THEN '0.168070000' WHEN 6 THEN '0.117649000'
           WHEN 7 THEN '0.082354300' WHEN 8 THEN '0.057648010'
           WHEN 9 THEN '0.040353607' END AS DECIMAL(18,9))"""
      s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(round(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS DECIMAL(18,6)) AS xbar
           FROM events GROUP BY 1, 2),
         pairs AS (SELECT a.event_type, a.day,
             datediff('day', b.day, a.day) AS k, b.xbar
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type
             AND datediff('day', b.day, a.day) BETWEEN 0 AND 9)
         SELECT event_type, day,
           round(CAST(SUM(xbar * $w7) AS DOUBLE)
             / CAST(SUM($w7) AS DOUBLE), 6) AS ewma
         FROM pairs GROUP BY event_type, day
         ORDER BY event_type, day"""
    },
    "q_cum_distinct" ->
      """WITH f AS (SELECT CAST(ts AS DATE) AS day, user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS DATE), event_id) AS rn
           FROM events),
         d AS (SELECT day, COUNT(*) AS new_users FROM f WHERE rn = 1
           GROUP BY 1)
         SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
         FROM d ORDER BY day""",
    "q_seasonal_decompose" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rv
           FROM orders GROUP BY 1),
         w AS (SELECT day, rv,
             COUNT(*) OVER w7 AS cnt7, SUM(rv) OVER w7 AS sum7
           FROM daily WINDOW w7 AS (ORDER BY day ROWS BETWEEN
             3 PRECEDING AND 3 FOLLOWING)),
         ratios AS (SELECT day, isodow(day) AS dow, rv,
             round(CAST(sum7 AS DOUBLE) / 7.0, 6) AS trend,
             CAST(round(CAST(rv AS DOUBLE)
               / (CAST(sum7 AS DOUBLE) / 7.0), 6) AS DECIMAL(18,6))
               AS ratio
           FROM w WHERE cnt7 = 7),
         si AS (SELECT dow, round(CAST(SUM(ratio) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS seasonal_idx
           FROM ratios GROUP BY 1)
         SELECT r.day, r.dow, round(CAST(r.rv AS DOUBLE), 2) AS revenue,
           r.trend, CAST(r.ratio AS DOUBLE) AS ratio, si.seasonal_idx,
           floor(CAST(r.rv AS DOUBLE) / si.seasonal_idx * 1e6 + 0.5)
             / 1e6 AS deseasonalized
         FROM ratios r JOIN si ON r.dow = si.dow ORDER BY r.day""",
    "q_theil_sen" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(round(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS DECIMAL(18,6)) AS y
           FROM events GROUP BY 1, 2),
         slopes AS (SELECT a.event_type,
             CAST(floor(CAST(b.y - a.y AS DOUBLE)
               / CAST(datediff('day', a.day, b.day) AS DOUBLE)
               * 1e9 + 0.5) / 1e9 AS DECIMAL(18,9)) AS slope
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day)
         SELECT event_type, COUNT(*) AS n_pairs,
           round(CAST(percentile_disc(0.5)
             WITHIN GROUP (ORDER BY slope) AS DOUBLE), 9) AS sen_slope
         FROM slopes GROUP BY event_type ORDER BY event_type""",
    "q_unigram_kl" ->
      s"""WITH words AS (SELECT source, u.w AS w FROM documents,
             unnest(list_filter(regexp_split_to_array(lower(text),
               '[^a-z0-9_]+'), x -> x <> '')) u(w)),
         cw AS (SELECT w, COUNT(*) AS c FROM words GROUP BY 1),
         cs AS (SELECT source, w, COUNT(*) AS csw FROM words
           GROUP BY 1, 2),
         nsrc AS (SELECT source, COUNT(*) AS ns FROM words GROUP BY 1),
         tot AS (SELECT COUNT(*) AS v, CAST(SUM(c) AS BIGINT) AS nn
           FROM cw),
         g AS (SELECT nsrc.source, nsrc.ns, cw.c,
             coalesce(cs.csw, 0) AS csw
           FROM cw CROSS JOIN nsrc
             LEFT JOIN cs ON cs.source = nsrc.source AND cs.w = cw.w),
         terms AS (SELECT source, ns, $klTermSql AS term
           FROM g CROSS JOIN tot)
         SELECT source, CAST(MIN(ns) AS BIGINT) AS n_tokens,
           round(CAST(SUM(term) AS DOUBLE), 6) AS kl
         FROM terms GROUP BY source ORDER BY source""",
    "q_tokenizer_fertility" ->
      """WITH t AS (SELECT lang, CAST(length(text) AS BIGINT) AS nc,
             CAST(strlen(text) AS BIGINT) AS nb,
             CAST(len(list_filter(regexp_split_to_array(lower(text),
               '[^a-z0-9_]+'), x -> x <> '')) AS BIGINT) AS nt
           FROM documents),
         a AS (SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(nc) AS BIGINT) AS chars,
             CAST(SUM(nb) AS BIGINT) AS bytes,
             CAST(SUM(nt) AS BIGINT) AS tokens
           FROM t GROUP BY 1)
         SELECT lang, n_docs, chars, bytes, tokens,
           CASE WHEN tokens = 0 THEN NULL ELSE
             round(CAST(chars AS DOUBLE) / CAST(tokens AS DOUBLE), 6)
           END AS chars_per_token,
           CASE WHEN tokens = 0 THEN NULL ELSE
             round(CAST(bytes AS DOUBLE) / CAST(tokens AS DOUBLE), 6)
           END AS bytes_per_token
         FROM a ORDER BY lang""",
    "q_naive_bayes" ->
      s"""WITH d AS (SELECT doc_id, lang,
             list_filter(regexp_split_to_array(lower(text),
               '[^a-z0-9_]+'), x -> x <> '') AS ws
           FROM documents),
         train AS (SELECT * FROM d WHERE doc_id % 5 <> 0),
         test AS (SELECT * FROM d WHERE doc_id % 5 = 0),
         trainw AS (SELECT lang, u.w AS w FROM train, unnest(ws) u(w)),
         cnts AS (SELECT lang, w, COUNT(*) AS clw FROM trainw
           GROUP BY 1, 2),
         langtok AS (SELECT lang, COUNT(*) AS tokl FROM trainw
           GROUP BY 1),
         vocab AS (SELECT DISTINCT w FROM trainw),
         v1 AS (SELECT COUNT(*) AS v FROM vocab),
         priors AS (SELECT lang, COUNT(*) AS dl FROM train GROUP BY 1),
         ntrain AS (SELECT COUNT(*) AS dn FROM train),
         mbase AS (SELECT langtok.lang AS lang, vocab.w AS w,
             coalesce(cnts.clw, 0) AS clw, langtok.tokl AS tokl, v1.v AS v
           FROM vocab CROSS JOIN langtok
             LEFT JOIN cnts ON cnts.lang = langtok.lang
               AND cnts.w = vocab.w
             CROSS JOIN v1),
         model AS (SELECT lang, w, $nbTermSql AS lp FROM mbase),
         testtok AS (SELECT doc_id, u.w AS w, COUNT(*) AS cnt
           FROM test, unnest(ws) u(w) GROUP BY 1, 2),
         tokscore AS (SELECT t.doc_id, m.lang, SUM(t.cnt * m.lp) AS ts
           FROM testtok t JOIN model m ON t.w = m.w GROUP BY 1, 2),
         priorterm AS (SELECT lang,
             CAST(round(ln(CAST(dl AS DOUBLE) / CAST(dn AS DOUBLE)), 9)
               AS DECIMAL(18,9)) AS pt
           FROM priors CROSS JOIN ntrain),
         grid AS (SELECT test.doc_id, test.lang AS actual,
             p.lang AS lang,
             p.pt + coalesce(ts.ts, CAST(0 AS DECIMAL(18,9))) AS score
           FROM test CROSS JOIN priorterm p
             LEFT JOIN tokscore ts ON ts.doc_id = test.doc_id
               AND ts.lang = p.lang),
         pick AS (SELECT doc_id, actual, lang, ROW_NUMBER() OVER (
             PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
           FROM grid)
         SELECT actual, lang AS predicted, COUNT(*) AS n
         FROM pick WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_t_closeness" ->
      """WITH o AS (SELECT year(o_orderdate) AS yr,
             o_orderpriority AS prio, o_orderstatus AS st FROM orders),
         cells AS (SELECT yr, prio, st, COUNT(*) AS c FROM o
           GROUP BY 1, 2, 3),
         grp AS (SELECT yr, prio, CAST(SUM(c) AS BIGINT) AS ng
           FROM cells GROUP BY 1, 2),
         gdist AS (SELECT st, COUNT(*) AS cg FROM o GROUP BY 1),
         tot AS (SELECT COUNT(*) AS nn FROM o),
         g AS (SELECT grp.yr, grp.prio, grp.ng, gdist.cg,
             coalesce(cells.c, 0) AS c
           FROM grp CROSS JOIN gdist
             LEFT JOIN cells ON cells.yr = grp.yr
               AND cells.prio = grp.prio AND cells.st = gdist.st),
         terms AS (SELECT yr, prio, ng,
             CAST(round(abs(CAST(c AS DOUBLE) / CAST(ng AS DOUBLE)
               - CAST(cg AS DOUBLE) / CAST(nn AS DOUBLE)), 9)
               AS DECIMAL(18,9)) AS term
           FROM g CROSS JOIN tot)
         SELECT yr, prio, CAST(MIN(ng) AS BIGINT) AS n,
           round(0.5 * CAST(SUM(term) AS DOUBLE), 6) AS tvd
         FROM terms GROUP BY 1, 2 ORDER BY tvd DESC, yr, prio LIMIT 20""",
    "q_label_propagation" ->
      s"""WITH $lpaCteSql
         SELECT label AS community, COUNT(*) AS size FROM l3
         GROUP BY 1 ORDER BY size DESC, community LIMIT 20""",
    "q_modularity" ->
      s"""WITH $lpaCteSql,
         labeled AS (SELECT e.src, e.dst, ls.label AS lsrc,
             ld.label AS ldst
           FROM e JOIN l3 ls ON ls.node = e.src
             JOIN l3 ld ON ld.node = e.dst),
         perc AS (SELECT lsrc AS community, COUNT(*) AS deg,
             CAST(SUM(CASE WHEN lsrc = ldst THEN 1 ELSE 0 END)
               AS BIGINT) AS intra
           FROM labeled GROUP BY 1),
         m AS (SELECT COUNT(*) AS ne FROM e),
         terms AS (SELECT
             CAST(round(CAST(intra AS DOUBLE) / CAST(ne AS DOUBLE)
               - (CAST(deg AS DOUBLE) / CAST(ne AS DOUBLE))
                 * (CAST(deg AS DOUBLE) / CAST(ne AS DOUBLE)), 9)
               AS DECIMAL(18,9)) AS term
           FROM perc CROSS JOIN m)
         SELECT COUNT(*) AS n_communities,
           round(CAST(SUM(term) AS DOUBLE), 6) AS modularity
         FROM terms""",
    "q_assortativity" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
           WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
             AND a.l_suppkey <> b.l_suppkey),
         deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
         j AS (SELECT dx.d AS dx, dy.d AS dy FROM e
           JOIN deg dx ON dx.src = e.src
           JOIN deg dy ON dy.src = e.dst),
         mom AS (SELECT COUNT(*) AS n,
             CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
             CAST(SUM(dx * dy) AS BIGINT) AS sxy,
             CAST(SUM(dx * dx) AS BIGINT) AS sxx,
             CAST(SUM(dy * dy) AS BIGINT) AS syy
           FROM j)
         SELECT n AS n_edges,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS assortativity
         FROM mom""",
    "q_pattern_vshape" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rv
           FROM orders GROUP BY 1),
         lagged AS (SELECT day, rv,
             lag(rv, 1) OVER (ORDER BY day) AS r1,
             lag(rv, 2) OVER (ORDER BY day) AS r2,
             lag(rv, 3) OVER (ORDER BY day) AS r3
           FROM daily)
         SELECT day, round(CAST(r3 AS DOUBLE), 2) AS rev_m3,
           round(CAST(r2 AS DOUBLE), 2) AS rev_m2,
           round(CAST(r1 AS DOUBLE), 2) AS rev_m1,
           round(CAST(rv AS DOUBLE), 2) AS rev
         FROM lagged
         WHERE r3 > r2 AND r2 > r1 AND rv > r1 ORDER BY day""",
    "q_pattern_doubletop" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rv
           FROM orders GROUP BY 1),
         lagged AS (SELECT day, rv,
             lag(rv, 1) OVER (ORDER BY day) AS r1,
             lag(rv, 2) OVER (ORDER BY day) AS r2,
             lag(rv, 3) OVER (ORDER BY day) AS r3,
             lag(rv, 4) OVER (ORDER BY day) AS r4
           FROM daily)
         SELECT day, round(CAST(r4 AS DOUBLE), 2) AS rev_m4,
           round(CAST(r3 AS DOUBLE), 2) AS rev_m3,
           round(CAST(r2 AS DOUBLE), 2) AS rev_m2,
           round(CAST(r1 AS DOUBLE), 2) AS rev_m1,
           round(CAST(rv AS DOUBLE), 2) AS rev
         FROM lagged
         WHERE r4 < r3 AND r3 > r2 AND r2 < r1 AND r1 > rv
         ORDER BY day""",
    "q_skew_audit" ->
      """WITH cnts AS (SELECT l_partkey, COUNT(*) AS c FROM lineitem
           GROUP BY 1),
         cc AS (SELECT c, COUNT(*) AS k FROM cnts GROUP BY 1),
         cum AS (SELECT c, CAST(SUM(k) OVER (ORDER BY c ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
           FROM cc),
         mom AS (SELECT COUNT(*) AS nk, CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(c * c) AS BIGINT) AS scc, MAX(c) AS mx FROM cnts),
         pct AS (SELECT
             MIN(CASE WHEN cum >= ceil(nk * 0.5) THEN c END) AS p50_cnt,
             MIN(CASE WHEN cum >= ceil(nk * 0.99) THEN c END) AS p99_cnt
           FROM cum CROSS JOIN mom)
         SELECT nk AS n_keys, sc AS n_rows, mx AS max_cnt,
           p50_cnt, p99_cnt,
           round(CAST(mx AS DOUBLE) / CAST(sc AS DOUBLE), 6)
             AS max_share,
           round(sqrt(CAST(nk AS DOUBLE) * CAST(scc AS DOUBLE)
               - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
             / CAST(sc AS DOUBLE), 6) AS cv
         FROM mom CROSS JOIN pct""",
    "q_mmr_diversify" -> {
      def step(k: Int): String = {
        val sel = (1 until k).map(i => s"SELECT vec_id FROM s$i")
          .mkString(" UNION ALL ")
        s"""s$k AS (SELECT vec_id, rel FROM (
             SELECT c.vec_id, c.rel,
               round(0.7 * c.rel - (1.0 - 0.7) * MAX(sims.s), 6) AS sc
             FROM cand c JOIN sims ON sims.ia = c.vec_id
             WHERE sims.ib IN ($sel) AND c.vec_id NOT IN ($sel)
             GROUP BY c.vec_id, c.rel)
           ORDER BY sc DESC, vec_id LIMIT 1)"""
      }
      val picks = (1 to 5).map(k =>
        s"SELECT CAST($k AS BIGINT) AS rank, vec_id, rel AS relevance " +
          s"FROM s$k").mkString(" UNION ALL ")
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id = 0),
         cand AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
               / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                   CAST(embedding AS DOUBLE[])))
                 * sqrt(list_dot_product(qv, qv))), 4) AS rel
           FROM embeddings, q WHERE vec_id <> 0
           ORDER BY rel DESC, vec_id LIMIT 20),
         sims AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
             round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 4) AS s
           FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         s1 AS (SELECT vec_id, rel FROM cand
           ORDER BY rel DESC, vec_id LIMIT 1),
         ${step(2)},
         ${step(3)},
         ${step(4)},
         ${step(5)}
         SELECT * FROM ($picks) ORDER BY rank"""
    },
    "q_tfidf_cosine_pairs" ->
      """WITH tf AS (SELECT doc_id, u.w AS w, COUNT(*) AS tf
           FROM documents, unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '')) u(w)
           GROUP BY 1, 2),
         dfc AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
         n1 AS (SELECT COUNT(DISTINCT doc_id) AS nn FROM tf),
         wgt AS (SELECT doc_id, w, df,
             CAST(round(CAST(tf AS DOUBLE)
               * ln(CAST(nn AS DOUBLE) / CAST(df AS DOUBLE)), 6)
               AS DECIMAL(18,6)) AS wt
           FROM tf JOIN dfc USING (w) CROSS JOIN n1),
         norms AS (SELECT doc_id, SUM(wt * wt) AS n2 FROM wgt
           GROUP BY 1),
         rare AS (SELECT * FROM wgt WHERE df BETWEEN 2 AND 20),
         dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             SUM(a.wt * b.wt) AS dot
           FROM rare a JOIN rare b ON a.w = b.w
             AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.n2 AS DOUBLE))
               * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cosine
         FROM dots JOIN norms na ON na.doc_id = dots.doc_a
           JOIN norms nb ON nb.doc_id = dots.doc_b
         ORDER BY cosine DESC, doc_a, doc_b LIMIT 20""",
    "q_diversity_index" -> {
      s"""WITH cells AS (SELECT source, lang, COUNT(*) AS c
           FROM documents GROUP BY 1, 2),
         totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nn,
             COUNT(*) AS n_langs
           FROM cells GROUP BY 1),
         terms AS (SELECT cells.source, totals.nn, totals.n_langs,
             CAST(round((CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
               * (CAST(c AS DOUBLE) / CAST(nn AS DOUBLE)), 12)
               AS DECIMAL(28,12)) AS p2,
             ${entTerm("c", "nn")} AS plp
           FROM cells JOIN totals USING (source))
         SELECT source, CAST(MIN(nn) AS BIGINT) AS n_docs,
           CAST(MIN(n_langs) AS BIGINT) AS n_langs,
           round(1.0 - CAST(SUM(p2) AS DOUBLE), 6) AS simpson,
           round(0.0 - CAST(SUM(plp) AS DOUBLE), 6) AS shannon
         FROM terms GROUP BY source ORDER BY source"""
    },
    "q_drawdown" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rv
           FROM orders GROUP BY 1),
         p AS (SELECT day, rv, MAX(rv) OVER (ORDER BY day ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
           FROM daily)
         SELECT day, round(CAST(rv AS DOUBLE), 2) AS revenue,
           round(CAST(peak AS DOUBLE), 2) AS peak,
           round((CAST(peak AS DOUBLE) - CAST(rv AS DOUBLE))
             / CAST(peak AS DOUBLE), 6) AS drawdown
         FROM p ORDER BY drawdown DESC, day LIMIT 10""",
    "q_haversine_nn" -> {
      val (clat, clon) = geoSql("c_custkey")
      val (slat, slon) = geoSql("s_suppkey")
      s"""WITH c AS (SELECT c_custkey, c_nationkey AS nation,
             $clat AS lat_c, $clon AS lon_c FROM customer),
         s AS (SELECT s_suppkey, s_nationkey AS nation,
             $slat AS lat_s, $slon AS lon_s FROM supplier),
         j AS (SELECT c.c_custkey, c.nation, s.s_suppkey,
             floor(2.0 * 6371.0 * asin(sqrt(
               sin(radians(lat_s - lat_c) / 2.0)
                 * sin(radians(lat_s - lat_c) / 2.0)
               + cos(radians(lat_c)) * cos(radians(lat_s))
                 * sin(radians(lon_s - lon_c) / 2.0)
                 * sin(radians(lon_s - lon_c) / 2.0))) * 1e3 + 0.5)
               / 1e3 AS dist_km
           FROM c JOIN s ON c.nation = s.nation),
         r AS (SELECT c_custkey, nation, s_suppkey, dist_km,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
               ORDER BY dist_km, s_suppkey) AS rn FROM j)
         SELECT c_custkey, nation, s_suppkey, dist_km FROM r
         WHERE rn = 1 ORDER BY c_custkey LIMIT 100"""
    },
    "q_cosine_histogram" ->
      """WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id % 4 = 0 AND vec_id < 4000),
         p AS (SELECT round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
           FROM s a JOIN s b ON a.vec_id < b.vec_id)
         SELECT CAST(floor(cosine * 10.0) AS BIGINT) AS bucket,
           COUNT(*) AS n_pairs
         FROM p GROUP BY 1 ORDER BY 1"""
  )
}
