package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.EngineConfig
import graft.engine.InceptionEngine

/** Shared DuckDB oracle helper fragments (hash twins, packing CTEs, BPE stage builders) referenced by the oracleSql parts.
  *
  * Split out of SparkEntry.scala (round 16): members mix into
  * [[SparkEntry]] and resolve against its full surface via the
  * self-type; mixin order in SparkEntry preserves the original
  * declaration (and so val-initialization) order.
  */
private[graft] trait SparkEntryOracleCore { this: SparkEntry.type =>

  /** DuckDB SQL fragments replicating the repo's hashing primitives
    * (graft.util.Hashing) in HUGEINT mod-2^64 arithmetic — the machinery
    * behind the generated signature oracles (fingerprint_stats pioneered
    * the pattern; dedup_simhash and ann_lsh build on it). Signed BIGINT
    * is the canonical value domain; HUGEINT is the escape hatch for
    * unsigned wrap-around.
    */
  /** lang_id heuristic replay, shared by the lang_id gate and the
    * q_lang_confusion matrix oracle. */
  lazy val langIdOracleSql: String =
    """WITH h AS (
           SELECT doc_id,
             len(list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), w -> list_contains(
               ['der','die','das','und','ist','nicht','von','mit','ein','zu'], w))) AS de_h,
             len(list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), w -> list_contains(
               ['the','and','of','to','in','is','that','for','with','a'], w))) AS en_h,
             len(list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), w -> list_contains(
               ['el','la','los','las','es','y','de','que','en','por'], w))) AS es_h,
             len(list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), w -> list_contains(
               ['le','la','les','et','est','que','des','dans','pour','une'], w))) AS fr_h
           FROM documents)
         SELECT doc_id,
           CASE WHEN greatest(de_h, en_h, es_h, fr_h) = 0 THEN 'und'
                WHEN fr_h >= es_h AND fr_h >= en_h AND fr_h >= de_h THEN 'fr'
                WHEN es_h >= en_h AND es_h >= de_h THEN 'es'
                WHEN en_h >= de_h THEN 'en'
                ELSE 'de' END AS lang_pred
         FROM h ORDER BY doc_id"""

  object Duck {
    val M = "18446744073709551616" // 2^64
    val H = "9223372036854775808" // 2^63
    val K0 = "11400714819323198485" // 0x9e3779b97f4a7c15
    val C2 = "13787848793156543929" // 0xbf58476d1ce4e5b9
    val C3 = "10723151780598845931" // 0x94d049bb133111eb

    /** signed BIGINT expr -> HUGEINT in [0, 2^64) */
    def toU(x: String): String =
      s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $M" +
        s" ELSE CAST(($x) AS HUGEINT) END)"

    /** HUGEINT in [0, 2^64) -> signed BIGINT */
    def toS(u: String): String =
      s"(CAST(CASE WHEN ($u) >= $H THEN ($u) - $M ELSE ($u) END AS BIGINT))"

    /** (a * b) mod 2^64 without HUGEINT overflow: split a at 2^32
      * (a,b < 2^64 would give a 2^128 product, past HUGEINT's 2^127-1).
      */
    def mulmod(a: String, b: String): String =
      s"((((($a) % 4294967296) * $b) + " +
        s"((((($a) // 4294967296) * ($b % 4294967296)) % 4294967296)" +
        s" * 4294967296)) % $M)"

    /** java.lang.Math.rint over a DOUBLE expr (half-to-even — DuckDB's
      * round() is half-away-from-zero, so ties must be hand-expanded).
      */
    def rint(x: String): String =
      s"(CASE WHEN ($x) - floor($x) > 0.5 THEN floor($x) + 1" +
        s" WHEN ($x) - floor($x) < 0.5 THEN floor($x)" +
        s" WHEN CAST(floor($x) AS BIGINT) % 2 = 0 THEN floor($x)" +
        s" ELSE floor($x) + 1 END)"

    /** Dim-order sequential double fold of an elementwise product — the
      * bit-exact twin of the kernels' `while` accumulation loops.
      */
    def foldDot(a: String, b: String, dim: Int): String =
      s"list_reduce(list_transform(range(1, $dim + 1), " +
        s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), " +
        "(x, y) -> x + y)"

    /** splitmix64 finalizer (Hashing.mix64) over a signed BIGINT expr —
      * textual expansion, so keep the input expression small.
      */
    def mix64(x: String): String = {
      val x1 = s"((${toU(x)} + $K0) % $M)"
      val x2 = mulmod(s"xor($x1, $x1 // 1073741824)", C2)
      val x3 = mulmod(s"xor($x2, $x2 // 134217728)", C3)
      toS(s"xor($x3, $x3 // 2147483648)")
    }

    /** FNV-1a 64 over a word (Hashing.fnv) — same list_reduce pattern as
      * the fingerprint_stats oracle (signed BIGINT result).
      */
    def fnv(w: String): String =
      s"list_reduce(list_prepend(CAST(-3750763034362895579 AS BIGINT), " +
        s"list_transform(range(1, len($w) + 1), j -> unicode($w[j:j]))), " +
        s"(acc, c) -> CAST(CASE WHEN (((CAST(xor(acc, c) AS HUGEINT)" +
        s" * 1099511628211) % $M + $M) % $M) >= $H " +
        s"THEN (((CAST(xor(acc, c) AS HUGEINT) * 1099511628211)" +
        s" % $M + $M) % $M) - $M " +
        s"ELSE (((CAST(xor(acc, c) AS HUGEINT) * 1099511628211)" +
        s" % $M + $M) % $M) END AS BIGINT))"
  }

  /** DuckDB twin of [[qDocsStreamNeardup]] — the full ingest-dedup
    * pipeline replayed bit-for-bit: word trigram shingles as the
    * rolling mix64(xor(h, fnv(word))) chain (Dedup.shingles), per-seed
    * MinHash mins with the Long-wrapped 0x5851f42d4c957f2d·(s+1) seed
    * constants inlined as literals, raw-signature band keys, min/count
    * per bucket. Documents with <3 words hash their joined words once;
    * empty documents carry Long.MaxValue signatures — both Scala
    * branches replicated. The STREAMING result must equal this batch
    * computation for any micro-batch split (update-mode min/count is
    * order-independent).
    */
  lazy val docsStreamNeardupOracleSql: String = {
    import Duck.{fnv, mix64}
    val seedVals = Seq(
      "6364136223846793005", "-5718471626015965606",
      "645664597830827399", "7009800821677620404",
      "-5072807028185138207", "1291329195661654798",
      "7655465419508447803", "-4427142430354310808")
      .zipWithIndex
      .map { case (v, s) => s"($s, CAST($v AS BIGINT))" }
      .mkString(", ")
    s"""WITH w AS (SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text),
             '[^a-zA-Z0-9_]+'), x -> x <> '') AS ws
         FROM documents),
       tri AS (SELECT doc_id, UNNEST(range(1, len(ws) - 1)) AS i, ws
         FROM w WHERE len(ws) >= 3),
       f AS (SELECT doc_id, i, ${fnv("ws[i]")} AS f1,
           ${fnv("ws[i+1]")} AS f2, ${fnv("ws[i+2]")} AS f3 FROM tri),
       g1 AS (SELECT doc_id, i, f2, f3,
           ${mix64("xor(CAST(-3750763034362895579 AS BIGINT), f1)")} AS h
         FROM f),
       g2 AS (SELECT doc_id, i, f3, ${mix64("xor(h, f2)")} AS h FROM g1),
       g3 AS (SELECT doc_id, ${mix64("xor(h, f3)")} AS h FROM g2),
       short AS (SELECT doc_id, ${fnv("array_to_string(ws, ' ')")} AS h
         FROM w WHERE len(ws) >= 1 AND len(ws) < 3),
       sh AS (SELECT doc_id, h FROM g3
         UNION ALL SELECT doc_id, h FROM short),
       seedc AS (SELECT * FROM (VALUES $seedVals) AS t(s, seed)),
       sigs AS (SELECT doc_id, s, MIN(${mix64("xor(h, seed)")}) AS m
         FROM sh CROSS JOIN seedc GROUP BY 1, 2),
       sig2 AS (SELECT w.doc_id, sc.s,
           COALESCE(sigs.m, CAST(9223372036854775807 AS BIGINT)) AS m
         FROM w CROSS JOIN seedc sc
         LEFT JOIN sigs ON w.doc_id = sigs.doc_id AND sc.s = sigs.s),
       bandk AS (SELECT doc_id, bb.b AS band,
           MAX(CASE WHEN s = 2 * bb.b THEN m END) AS s1,
           MAX(CASE WHEN s = 2 * bb.b + 1 THEN m END) AS s2
         FROM sig2 CROSS JOIN (SELECT UNNEST(range(0, 4)) AS b) bb
         GROUP BY 1, 2),
       buckets AS (SELECT band, s1, s2, MIN(doc_id) AS keeper,
           COUNT(*) AS n FROM bandk GROUP BY 1, 2, 3)
       SELECT band, COUNT(*) AS n_buckets,
         CAST(SUM(n) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_multi_buckets,
         CAST(SUM(keeper % 1000003) AS BIGINT) AS keeper_checksum
       FROM buckets GROUP BY 1 ORDER BY 1"""
  }

  /** DuckDB twin of [[qCountMin]] — the identical FNV-1a "j:key" folds
    * (Duck.fnv, signed BIGINT; positive-mod wrap matches Spark's pmod)
    * rebuild the same 4×256 sketch; probes are the exact-heaviest 8
    * keys.
    */
  lazy val countminOracleSql: String = {
    import Duck.fnv
    s"""WITH li AS (SELECT l_partkey FROM lineitem),
         ex AS (SELECT l_partkey, COUNT(*) AS exact_cnt
           FROM li GROUP BY 1),
         tp AS (SELECT * FROM ex
           ORDER BY exact_cnt DESC, l_partkey LIMIT 8),
         js AS (SELECT UNNEST(range(0, 4)) AS j),
         hs AS (SELECT l_partkey, j,
             CAST(j AS VARCHAR) || ':' || CAST(l_partkey AS VARCHAR) AS s
           FROM li CROSS JOIN js),
         bk AS (SELECT l_partkey, j,
             ((${fnv("s")} % 256) + 256) % 256 AS b FROM hs),
         cms AS (SELECT j, b, COUNT(*) AS cnt FROM bk GROUP BY 1, 2),
         ps AS (SELECT tp.l_partkey, tp.exact_cnt, j,
             CAST(j AS VARCHAR) || ':'
               || CAST(tp.l_partkey AS VARCHAR) AS s
           FROM tp CROSS JOIN js),
         pb AS (SELECT l_partkey, exact_cnt, j,
             ((${fnv("s")} % 256) + 256) % 256 AS b FROM ps),
         est AS (SELECT l_partkey, exact_cnt, MIN(cnt) AS cms_est
           FROM pb JOIN cms USING (j, b) GROUP BY 1, 2)
         SELECT l_partkey, exact_cnt, cms_est,
           cms_est - exact_cnt AS overcount
         FROM est ORDER BY exact_cnt DESC, l_partkey"""
  }

  /** DuckDB replica of [[graft.ops.Dedup.simHash]] + brute-force 64-bit
    * hamming — generated (not hand-written) SQL because the splitmix64
    * finalizer must be expanded twice in HUGEINT mod-2^64 arithmetic.
    * The banding in simHashPairs has PERFECT recall at maxHamming=3 by
    * pigeonhole (3 differing bits touch at most 3 of the 4 16-bit bands),
    * so brute-force all-pairs is the exact oracle, not an approximation
    * (modulo the 256-per-bucket cap, which sf0.01's corpus never hits).
    * BMP-only like the fingerprint_stats oracle (unicode() per UTF-16
    * unit).
    */
  lazy val simhashOracleSql: String = {
    import Duck.{M, H, K0, C2, C3, toU, toS, mulmod, fnv}
    s"""WITH RECURSIVE pw(b, p) AS (
           SELECT 0, CAST(1 AS HUGEINT)
           UNION ALL SELECT b + 1, p * 2 FROM pw WHERE b < 63),
         d AS (SELECT doc_id, list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
               x -> x <> '') AS ws
             FROM documents),
         w AS (SELECT doc_id, u.i AS i, ws[u.i] AS w,
               CASE WHEN u.i > 1 THEN ws[u.i - 1] ELSE NULL END AS prev
             FROM d, unnest(list_transform(range(1, len(ws) + 1),
               i -> {'i': i})) AS t(u)),
         f0 AS (SELECT doc_id, i, ${fnv("w")} AS uh,
               CASE WHEN prev IS NULL THEN NULL
                    ELSE ${fnv("prev")} END AS up
             FROM w),
         m1 AS (SELECT doc_id, i, uh, up,
               (${toU("uh")} + $K0) % $M AS a FROM f0),
         m2 AS (SELECT doc_id, i, uh, up,
               ${mulmod("xor(a, a // 1073741824)", C2)} AS b2 FROM m1),
         m3 AS (SELECT doc_id, i, uh, up,
               ${mulmod("xor(b2, b2 // 134217728)", C3)} AS c2 FROM m2),
         m4 AS (SELECT doc_id, i, up,
               xor(c2, c2 // 2147483648) AS mu FROM m3),
         g1 AS (SELECT doc_id, i,
               (${toU(s"xor(${toS("mu")}, up)")} + $K0) % $M AS a
             FROM m4 WHERE up IS NOT NULL),
         g2 AS (SELECT doc_id, i,
               ${mulmod("xor(a, a // 1073741824)", C2)} AS b2 FROM g1),
         g3 AS (SELECT doc_id, i,
               ${mulmod("xor(b2, b2 // 134217728)", C3)} AS c2 FROM g2),
         g4 AS (SELECT doc_id, i,
               xor(c2, c2 // 2147483648) AS mu FROM g3),
         feats AS (SELECT doc_id, mu FROM m4
           UNION ALL SELECT doc_id, mu FROM g4),
         votes AS (SELECT doc_id, pw.b, pw.p,
               SUM(CASE WHEN (mu // pw.p) % 2 = 1 THEN 1 ELSE -1 END) AS acc
             FROM feats, pw GROUP BY doc_id, pw.b, pw.p),
         sims0 AS (SELECT doc_id,
               SUM(CASE WHEN acc > 0 THEN p
                        ELSE CAST(0 AS HUGEINT) END) AS simu
             FROM votes GROUP BY doc_id),
         sims AS (SELECT d.doc_id, ${toS("COALESCE(s.simu, 0)")} AS sim
             FROM d LEFT JOIN sims0 s USING (doc_id))
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
       FROM sims a JOIN sims b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.sim, b.sim)) <= 3
       ORDER BY doc_a, doc_b"""
  }

  /** DuckDB replica of [[graft.ops.Sketch.kmvOverlap]] over the lang
    * slices: FNV-1a per distinct (lang, token) (Duck.fnv — the same
    * HUGEINT mod-2^64 fold as fingerprint_stats), unsigned order via the
    * same sign-bit-flip xor, per-group k=128 row_number sketch, then the
    * pairwise union-sketch membership counts and the (k-1)/U_k
    * estimates in the identical DOUBLE algebra (2^64 spelled as the same
    * float literal so both engines divide by the same double).
    */
  lazy val kmvOverlapOracleSql: String = {
    import Duck.fnv
    s"""WITH w AS (SELECT DISTINCT grp, v FROM (
             SELECT lang AS grp, unnest(list_filter(
                 regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                 x -> x <> '')) AS v
             FROM documents) t),
         h0 AS (SELECT grp, ${fnv("v")} AS h FROM w),
         hd AS (SELECT DISTINCT grp, h FROM h0),
         fx AS (SELECT grp, h,
             xor(h, CAST(-9223372036854775807 - 1 AS BIGINT)) AS f
           FROM hd),
         sk AS (SELECT grp, h, f,
             row_number() OVER (PARTITION BY grp ORDER BY f) AS rnk
           FROM fx QUALIFY rnk <= 128),
         g AS (SELECT DISTINCT grp FROM sk),
         p AS (SELECT a.grp AS grp_a, b.grp AS grp_b
           FROM g a JOIN g b ON a.grp < b.grp),
         u AS (SELECT p.grp_a, p.grp_b, s.h AS h, s.f AS f,
             max(CASE WHEN s.grp = p.grp_a THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN s.grp = p.grp_b THEN 1 ELSE 0 END) AS in_b
           FROM p JOIN sk s ON s.grp = p.grp_a OR s.grp = p.grp_b
           GROUP BY p.grp_a, p.grp_b, s.h, s.f),
         r AS (SELECT grp_a, grp_b, f, in_a, in_b,
             row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY f)
               AS rnk
           FROM u),
         agg AS (SELECT grp_a, grp_b,
             COUNT(*) AS k_union,
             SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
               AS n_both,
             CAST(max(f) AS DOUBLE) / 1.8446744073709552e19 + 0.5 AS u_k
           FROM r WHERE rnk <= 128 GROUP BY grp_a, grp_b)
       SELECT grp_a, grp_b,
         CAST(k_union AS INTEGER) AS k_union,
         CAST(n_both AS INTEGER) AS n_both,
         round(CAST(n_both AS DOUBLE) / k_union, 6) AS jaccard_est,
         CASE WHEN k_union < 128 THEN CAST(k_union AS DOUBLE)
              ELSE round(CAST(k_union - 1 AS DOUBLE) / u_k, 4)
              END AS union_est,
         round((CAST(n_both AS DOUBLE) / k_union) *
           (CASE WHEN k_union < 128 THEN CAST(k_union AS DOUBLE)
                 ELSE round(CAST(k_union - 1 AS DOUBLE) / u_k, 4) END), 4)
           AS intersection_est
       FROM agg ORDER BY grp_a, grp_b"""
  }

  /** Word-trigram generator replay: the same space-joined shingle
    * strings hashed with Duck.fnv; docs with < 3 words contribute no
    * rows (inner-generator semantics).
    */
  /** Source-level twin of [[shingleGenOracleSql]]: same fnv shingle
    * replay, aggregated per source with the duplication rate. */
  lazy val sourceRepetitionOracleSql: String = {
    import Duck.fnv
    s"""WITH w AS (SELECT source, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '') AS ws
           FROM documents),
         sh AS (SELECT source, unnest(list_transform(
             range(1, greatest(len(ws) - 1, 1)),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
           FROM w),
         g AS (SELECT source, ${fnv("s")} AS h FROM sh)
       SELECT source, COUNT(*) AS n_shingles,
         COUNT(DISTINCT h) AS n_distinct,
         round(1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
       FROM g GROUP BY source ORDER BY source"""
  }

  lazy val shingleGenOracleSql: String = {
    import Duck.fnv
    s"""WITH w AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '') AS ws
           FROM documents),
         sh AS (SELECT doc_id, unnest(list_transform(
             range(1, greatest(len(ws) - 1, 1)),
             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
           FROM w),
         g AS (SELECT doc_id, ${fnv("s")} AS h FROM sh)
       SELECT doc_id, COUNT(*) AS n_shingles,
         COUNT(DISTINCT h) AS n_distinct
       FROM g GROUP BY doc_id ORDER BY doc_id"""
  }

  /** Per-lang KMV distinct estimates — the one-shot batch truth the
    * STREAMED sketch state (docs_stream_kmv) must land on exactly.
    */
  lazy val kmvDistinctOracleSql: String = {
    import Duck.fnv
    s"""WITH w AS (SELECT DISTINCT grp, v FROM (
             SELECT lang AS grp, unnest(list_filter(
                 regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                 x -> x <> '')) AS v
             FROM documents) t),
         h0 AS (SELECT grp, ${fnv("v")} AS h FROM w),
         hd AS (SELECT DISTINCT grp, h FROM h0),
         fx AS (SELECT grp, h,
             xor(h, CAST(-9223372036854775807 - 1 AS BIGINT)) AS f
           FROM hd),
         sk AS (SELECT grp, f,
             row_number() OVER (PARTITION BY grp ORDER BY f) AS rnk
           FROM fx QUALIFY rnk <= 128),
         agg AS (SELECT grp, COUNT(*) AS n_kept,
             CAST(max(f) AS DOUBLE) / 1.8446744073709552e19 + 0.5 AS u_k
           FROM sk GROUP BY grp)
       SELECT grp, CAST(n_kept AS INTEGER) AS n_kept,
         CASE WHEN n_kept < 128 THEN CAST(n_kept AS DOUBLE)
              ELSE round(CAST(n_kept - 1 AS DOUBLE) / u_k, 4)
              END AS distinct_est
       FROM agg ORDER BY grp"""
  }

  /** DuckDB replica of the hyperplane-LSH ANN probe
    * ([[graft.ops.Dedup.hyperplanes]]/hyperplaneBucket +
    * [[graft.ops.Similarity.lshTopK]]) — the probe is APPROXIMATE but
    * fully DETERMINISTIC, so it is oracle-checkable end to end:
    *   - the plane matrix is a splitmix64 chain from a fixed seed,
    *     regenerated here by a recursive CTE (one mix64 per (plane, dim)
    *     step; the float conversion `(h >>> 11)/2^53 - 0.5` then
    *     CAST AS REAL reproduces the kernel's Float32 values exactly);
    *   - per-vector dots fold IN DIMENSION ORDER via list_reduce,
    *     matching the kernel's sequential double accumulation
    *     bit-for-bit, so every bucket bit agrees;
    *   - candidates (hamming <= probe bits) are ranked by the same
    *     round(cosine,4)+id key as the ann_bruteforce oracle.
    * One oracle shape covers ann_lsh, ann_lsh_indexed and
    * ann_incremental: the indexed layout and the append path change
    * WHERE rows live, never the probe's result set.
    */
  lazy val annLshOracleSql: String = annLshOracleSqlBase(None)

  /** The ann_lsh replay over the corpus MINUS the deleted id — the twin
    * of the post-delete checked probe (ann_post_delete): after the
    * source-bound refresh, the index must behave exactly as if the
    * deleted vector had never been written.
    */
  lazy val annPostDeleteOracleSql: String = annLshOracleSqlBase(Some(0L))

  private def annLshOracleSqlBase(excludeId: Option[Long]): String = {
    import Duck.{toU, mix64}
    val (numPlanes, dim, probeHamming, k) = (8, 64, 3, 10)
    val excl = excludeId.map(i => s"AND e.vec_id <> $i").getOrElse("")
    s"""WITH RECURSIVE chain(p, i, h) AS (
           SELECT p, 0, ${mix64("19088743 + p")}
           FROM range(0, $numPlanes) t(p)
           UNION ALL
           SELECT p, i + 1, ${mix64("h")} FROM chain WHERE i < $dim),
         planes AS (SELECT p, i - 1 AS dim,
               CAST(CAST((${toU("h")} // 2048) AS DOUBLE)
                 / 9007199254740992.0 - 0.5 AS REAL) AS pv
             FROM chain WHERE i >= 1),
         pl AS (SELECT p, list(pv ORDER BY dim) AS v FROM planes GROUP BY p),
         buckets AS (SELECT e.vec_id,
               CAST(SUM(CASE WHEN list_reduce(
                     list_transform(range(1, $dim + 1),
                       i -> CAST(e.embedding[i] AS DOUBLE)
                            * CAST(pl.v[i] AS DOUBLE)),
                     (a, b) -> a + b) >= 0
                   THEN 1 << p ELSE 0 END) AS INTEGER) AS bucket
             FROM embeddings e, pl GROUP BY e.vec_id),
         qb AS (SELECT bucket AS qbucket FROM buckets WHERE vec_id = 0),
         q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id = 0),
         cand AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
             FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id, qb
             WHERE bit_count(xor(b.bucket, qb.qbucket)) <= $probeHamming
               $excl)
       SELECT vec_id,
           round(list_dot_product(v, qv) /
             (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             4) AS cosine
       FROM cand, q
       ORDER BY round(list_dot_product(v, qv) /
             (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             4) DESC, vec_id
       LIMIT $k"""
  }

  /** DuckDB replica of [[qMarkovAttribution]]: journey → transition →
    * probability construction mirrored with window functions, then the
    * five scenarios (base + four removals) × eight value-iteration
    * steps unrolled as CTEs over the same exact scale-12 decimal
    * algebra (probabilities rounded once at 12 dp; products and sums
    * exact; each step re-quantized by a decimal cast = the driver
    * fold's setScale(12, HALF_UP)).
    */
  lazy val markovAttributionOracleSql: String = {
    val channels = Seq("click", "error", "signup", "view")
    def scen(tag: String, removed: Option[String]): String = {
      val retarget = removed
        .map(c => s"CASE WHEN t = '$c' THEN 'DROP' ELSE t END")
        .getOrElse("t")
      val head =
        s"""p_$tag AS (SELECT f, $retarget AS t2,
              CAST(SUM(p) AS DECIMAL(14,12)) AS p
            FROM probs GROUP BY 1, 2),
           v_${tag}_0 AS (SELECT s,
              CAST(CASE WHEN s = 'CONV' THEN 1 ELSE 0 END
                AS DECIMAL(16,12)) AS v FROM states)"""
      val steps = (1 to 8).map { k =>
        // round() BEFORE the cast: DuckDB's decimal downcast TRUNCATES
        // toward zero, while the driver fold setScale()s HALF_UP —
        // explicit round(x, 12) makes both quantizations half-up
        s"""v_${tag}_$k AS (SELECT st.s,
              CASE WHEN st.s = 'CONV' THEN CAST(1 AS DECIMAL(16,12))
                   WHEN st.s = 'DROP' THEN CAST(0 AS DECIMAL(16,12))
                   ELSE CAST(round(COALESCE(SUM(pp.p * vv.v), 0), 12)
                     AS DECIMAL(16,12)) END AS v
            FROM states st
            LEFT JOIN p_$tag pp ON pp.f = st.s
            LEFT JOIN v_${tag}_${k - 1} vv ON vv.s = pp.t2
            GROUP BY st.s)"""
      }
      (head +: steps).mkString(",\n")
    }
    val scenarios = (scen("base", None) +:
      channels.map(c => scen(c, Some(c)))).mkString(",\n")
    val effRows = channels.map(c =>
      s"SELECT '$c' AS channel, (SELECT v FROM v_${c}_8 " +
        "WHERE s = 'START') AS vc").mkString("\n  UNION ALL ")
    s"""WITH ev AS (SELECT user_id, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS rn
         FROM events),
       fp AS (SELECT user_id, MIN(rn) AS prn FROM ev
         WHERE event_type = 'purchase' GROUP BY 1),
       tou AS (SELECT e.user_id, e.event_type, e.rn
         FROM ev e LEFT JOIN fp USING (user_id)
         WHERE fp.prn IS NULL OR e.rn < fp.prn),
       tedges AS (SELECT COALESCE(LAG(event_type) OVER
           (PARTITION BY user_id ORDER BY rn), 'START') AS f,
         event_type AS t FROM tou),
       lastt AS (SELECT user_id, max_by(event_type, rn) AS lt
         FROM tou GROUP BY 1),
       usr AS (SELECT DISTINCT user_id FROM ev),
       term AS (SELECT COALESCE(l.lt, 'START') AS f,
           CASE WHEN fp.prn IS NOT NULL THEN 'CONV' ELSE 'DROP' END AS t
         FROM usr u LEFT JOIN lastt l USING (user_id)
           LEFT JOIN fp USING (user_id)),
       trans AS (SELECT f, t, COUNT(*) AS cnt FROM
         (SELECT f, t FROM tedges UNION ALL SELECT f, t FROM term) u2
         GROUP BY 1, 2),
       tots AS (SELECT f, SUM(cnt) AS tot FROM trans GROUP BY 1),
       probs AS (SELECT f, t,
           CAST(round(CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE), 12)
             AS DECIMAL(14,12)) AS p
         FROM trans JOIN tots USING (f)),
       states AS (SELECT * FROM (VALUES ('START'), ('view'), ('click'),
         ('signup'), ('error'), ('CONV'), ('DROP')) s(s)),
       $scenarios,
       effs AS ($effRows),
       b AS (SELECT v AS bv FROM v_base_8 WHERE s = 'START'),
       te AS (SELECT SUM(bv - vc) AS te FROM effs, b)
       SELECT channel, CAST(vc AS DOUBLE) AS removal_conv,
         CAST(bv - vc AS DOUBLE) AS removal_effect,
         round(CAST(bv - vc AS DOUBLE) / CAST(te.te AS DOUBLE), 6)
           AS share
       FROM effs, b, te ORDER BY channel"""
  }

  /** DuckDB replica of [[qMixtureRaking]]: the 4 IPF sweeps unrolled
    * as row/column half-step CTEs — marginal sums are exact DECIMAL
    * window sums, scaling factors and products run in the same double
    * expression shape, and each half-step re-quantizes at 6 dp via
    * round-then-cast (DuckDB's bare decimal downcast truncates).
    */
  lazy val mixtureRakingOracleSql: String = {
    val steps = (1 to 4).flatMap { k =>
      val prev = if (k == 1) "w0" else s"wc${k - 1}"
      Seq(
        s"""wr$k AS (SELECT lang, source,
              CAST(round(CAST(w AS DOUBLE)
                * ((n / nl) / CAST(rs AS DOUBLE)), 6)
                AS DECIMAL(18,6)) AS w
            FROM (SELECT lang, source, w,
                SUM(w) OVER (PARTITION BY lang) AS rs FROM $prev), nt)""",
        s"""wc$k AS (SELECT lang, source,
              CAST(round(CAST(w AS DOUBLE)
                * ((n / ns) / CAST(cs AS DOUBLE)), 6)
                AS DECIMAL(18,6)) AS w
            FROM (SELECT lang, source, w,
                SUM(w) OVER (PARTITION BY source) AS cs FROM wr$k), nt)""")
    }.mkString(",\n")
    s"""WITH cnts AS (SELECT lang, source, COUNT(*) AS cnt
           FROM documents GROUP BY 1, 2),
       nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(COUNT(DISTINCT lang) AS DOUBLE) AS nl,
           CAST(COUNT(DISTINCT source) AS DOUBLE) AS ns
         FROM documents),
       w0 AS (SELECT lang, source, CAST(cnt AS DECIMAL(18,6)) AS w
         FROM cnts),
       $steps
       SELECT lang, source, round(CAST(w AS DOUBLE), 6) AS weight,
         (2 * CAST(w * 1000000 AS BIGINT) + cnt) // (2 * cnt)
           AS sample_ppm
       FROM wc4 JOIN cnts USING (lang, source)
       ORDER BY 1, 2"""
  }

  /** DuckDB replica of [[qAnnLshMultiprobe]]: hyperplanes, buckets and
    * the query margins |q·plane| are replayed with the identical
    * left-to-right double folds; the probe set is the (score, mask)-
    * ordered ≤2-bit perturbation list, LIMIT nProbes — bit-for-bit the
    * driver-side choice in
    * [[graft.ops.Similarity.lshTopKMultiProbe]].
    */
  lazy val annLshMultiprobeOracleSql: String = {
    import Duck.{toU, mix64}
    val (numPlanes, dim, nProbes, k) = (8, 64, 8, 10)
    s"""WITH RECURSIVE chain(p, i, h) AS (
           SELECT p, 0, ${mix64("19088743 + p")}
           FROM range(0, $numPlanes) t(p)
           UNION ALL
           SELECT p, i + 1, ${mix64("h")} FROM chain WHERE i < $dim),
         planes AS (SELECT p, i - 1 AS dim,
               CAST(CAST((${toU("h")} // 2048) AS DOUBLE)
                 / 9007199254740992.0 - 0.5 AS REAL) AS pv
             FROM chain WHERE i >= 1),
         pl AS (SELECT p, list(pv ORDER BY dim) AS v FROM planes GROUP BY p),
         buckets AS (SELECT e.vec_id,
               CAST(SUM(CASE WHEN list_reduce(
                     list_transform(range(1, $dim + 1),
                       i -> CAST(e.embedding[i] AS DOUBLE)
                            * CAST(pl.v[i] AS DOUBLE)),
                     (a, b) -> a + b) >= 0
                   THEN 1 << p ELSE 0 END) AS INTEGER) AS bucket
             FROM embeddings e, pl GROUP BY e.vec_id),
         qb AS (SELECT bucket AS qbucket FROM buckets WHERE vec_id = 0),
         q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id = 0),
         margins AS (SELECT pl.p, abs(list_reduce(
               list_transform(range(1, $dim + 1),
                 i -> CAST(qe.embedding[i] AS DOUBLE)
                      * CAST(pl.v[i] AS DOUBLE)),
               (a, b) -> a + b)) AS m
             FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) qe,
               pl),
         cands AS (
           SELECT CAST(0 AS INTEGER) AS mask, CAST(0.0 AS DOUBLE) AS score
           UNION ALL
           SELECT CAST((1 << p) AS INTEGER), m FROM margins
           UNION ALL
           SELECT CAST(((1 << a.p) | (1 << b.p)) AS INTEGER), a.m + b.m
             FROM margins a JOIN margins b ON a.p < b.p),
         probes AS (SELECT CAST(xor(CAST(qb.qbucket AS BIGINT),
               CAST(mask AS BIGINT)) AS INTEGER) AS pb
             FROM cands, qb ORDER BY score, mask LIMIT $nProbes),
         cand AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
             FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
             WHERE b.bucket IN (SELECT pb FROM probes))
       SELECT vec_id,
           round(list_dot_product(v, qv) /
             (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             4) AS cosine
       FROM cand, q
       ORDER BY round(list_dot_product(v, qv) /
             (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             4) DESC, vec_id
       LIMIT $k"""
  }

  /** DuckDB replica of the incremental MinHash probe
    * ([[graft.ops.Dedup.writeMinhashIndex]] + probeMinhashIndex): corpus =
    * docs up to the 90th-percentile id cut (the gate's split), batch = the
    * rest; signatures are replayed bit-for-bit — word trigram hashes as a
    * 3-step chained `mix64(h ^ fnv(word))` fold off the FNV-1a offset
    * basis, then 64 seeded min-hashes `min over shingles of
    * mix64(sh ^ (K*(s+1)))` in HUGEINT mod-2^64 arithmetic — and every
    * batch×corpus pair is scored brute-force: est = equal components / 64
    * (exact k/64 binary fractions, so the 0.5 threshold and round(…,6)
    * are engine-independent). A pair additionally requires ≥1 fully-equal
    * 4-component band — the LSH banding's exact recall condition (the
    * probe can only see a pair through a shared band bucket); the 64-doc
    * bucket cap cannot evict on this corpus (no 65 near-identical docs
    * share a band slice). RESIDUAL ASSUMPTION, stated plainly: the
    * engine's probe admits candidates through Murmur BUCKET collisions of
    * unequal band slices, and est >= 0.5 (32 of 64 equal components) does
    * NOT imply any fully-equal band — a collision pair passing the est
    * filter would be emitted by Spark and omitted by this oracle's
    * `hasband = 1` requirement. The est filter re-tests similarity, not
    * band equality, so this is a probabilistic argument, not an
    * equivalence: it holds unless a ≥0.5-similar pair with NO equal band
    * ALSO Murmur-collides on some bucket (P ≈ 2⁻³² per band pair, and no
    * such pair exists in this corpus). Replicating the band-bucket hash
    * in the oracle would close even that; recorded as accepted residual.
    */
  lazy val dedupIncrementalOracleSql: String =
    dedupIncrementalOracleSqlBase("")

  /** The incremental replay minus the deleted corpus slice — the twin
    * of dedup_post_delete's source-bound refresh: after the tombstone
    * fence, the index must behave exactly as if the deleted docs had
    * never been written.
    */
  lazy val dedupPostDeleteOracleSql: String =
    dedupIncrementalOracleSqlBase("AND (o.doc_id % 10) <> 5")

  private def dedupIncrementalOracleSqlBase(corpusExcl: String): String = {
    import Duck.{M, toS, mix64, fnv}
    s"""WITH cut AS (SELECT (MAX(doc_id) * 9) // 10 AS c FROM documents),
         w AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
               '[^a-zA-Z0-9_]+'), x -> x <> '') AS ws
             FROM documents),
         tri AS (SELECT doc_id, u.i AS i,
               ws[u.i] AS w1, ws[u.i + 1] AS w2, ws[u.i + 2] AS w3
             FROM w, unnest(list_transform(range(1, len(ws) - 1),
               i -> {'i': i})) t(u)
             WHERE len(ws) >= 3),
         f AS (SELECT doc_id, i, ${fnv("w1")} AS f1, ${fnv("w2")} AS f2,
               ${fnv("w3")} AS f3 FROM tri),
         t1 AS (SELECT doc_id, i, f2, f3,
               ${mix64("xor(CAST(-3750763034362895579 AS BIGINT), f1)")} AS h
             FROM f),
         t2 AS (SELECT doc_id, i, f3, ${mix64("xor(h, f2)")} AS h FROM t1),
         t3 AS (SELECT doc_id, i, ${mix64("xor(h, f3)")} AS h FROM t2),
         small AS (SELECT doc_id,
               ${fnv("array_to_string(ws, ' ')")} AS h
             FROM w WHERE len(ws) >= 1 AND len(ws) < 3),
         shg AS (SELECT DISTINCT doc_id, h FROM t3
           UNION SELECT DISTINCT doc_id, h FROM small),
         seeds AS (SELECT CAST(s AS INT) AS s,
               ${toS(s"(CAST(6364136223846793005 AS HUGEINT) * (s + 1)) % $M")}
                 AS sd
             FROM range(0, 64) r(s)),
         sv AS (SELECT doc_id, s, ${mix64("xor(h, sd)")} AS v
             FROM shg, seeds),
         sig AS (SELECT doc_id, s, MIN(v) AS m FROM sv GROUP BY doc_id, s),
         perband AS (SELECT o.doc_id AS old_id, n.doc_id AS new_id,
               o.s // 4 AS band,
               SUM(CASE WHEN o.m = n.m THEN 1 ELSE 0 END) AS beq
             FROM sig o JOIN sig n ON o.s = n.s CROSS JOIN cut
             WHERE o.doc_id <= cut.c AND n.doc_id > cut.c $corpusExcl
             GROUP BY old_id, new_id, band),
         agg AS (SELECT old_id, new_id, SUM(beq) AS eq,
               MAX(CASE WHEN beq = 4 THEN 1 ELSE 0 END) AS hasband
             FROM perband GROUP BY old_id, new_id)
       SELECT old_id, new_id,
           round(CAST(eq AS DOUBLE) / 64, 6) AS est_jaccard
       FROM agg
       WHERE CAST(eq AS DOUBLE) / 64 >= 0.5 AND hasband = 1
       ORDER BY old_id, new_id"""
  }

  /** DuckDB replica of the IVF ANN probe ([[graft.ops.Similarity.ivfTopK]]
    * / ivfTopKIndexed) — approximate but fully DETERMINISTIC by
    * construction (the builder's own contract: fixed-point Centroid
    * accumulation + list-id-sorted iteration, Similarity.scala), so the
    * whole build+probe replays in SQL:
    *   - init assignment: the 3-plane splitmix64 hyperplane chain (the
    *     ann_lsh oracle's recursive CTE) with dim-order double folds;
    *   - centroids: per-(list, dim) sums of `rint(v * 2^24)` — rint is
    *     HALF-EVEN, hand-expanded below since DuckDB round() is
    *     half-away-from-zero — then `(sum / n) / 2^24` cast to Float32,
    *     the Centroid aggregator's exact finish order;
    *   - refinement assignment + probe-list ranking: Embedder.cosine's
    *     `dot / sqrt(na * nb)` (NOT sqrt(na)*sqrt(nb) — that is the
    *     scoring expression's formulation, used only in the final rank),
    *     argmax keeping the LOWEST list id on ties like the first-seen
    *     `>` scan;
    *   - final: scan the 3 probe lists, rank by round(cosine,4)+id.
    * One oracle covers ann_ivf and ann_ivf_indexed: the persisted layout
    * changes where rows live, never the result set.
    */
  lazy val annIvfOracleSql: String = {
    import Duck.{toU, mix64, rint}
    val (numPlanes, dim, nProbe, k) = (3, 64, 3, 10)
    def fold(a: String, b: String): String = Duck.foldDot(a, b, dim)
    s"""WITH RECURSIVE chain(p, i, h) AS (
           SELECT p, 0, ${mix64("19088743 + p")}
           FROM range(0, $numPlanes) t(p)
           UNION ALL
           SELECT p, i + 1, ${mix64("h")} FROM chain WHERE i < $dim),
         planes AS (SELECT p, i - 1 AS dim,
               CAST(CAST((${toU("h")} // 2048) AS DOUBLE)
                 / 9007199254740992.0 - 0.5 AS REAL) AS pv
             FROM chain WHERE i >= 1),
         pl AS (SELECT p, list(pv ORDER BY dim) AS v FROM planes GROUP BY p),
         init AS (SELECT e.vec_id,
               CAST(SUM(CASE WHEN ${fold("e.embedding", "pl.v")} >= 0
                   THEN 1 << p ELSE 0 END) AS INTEGER) AS list0
             FROM embeddings e, pl GROUP BY e.vec_id),
         rsum AS (SELECT b.list0 AS list_id, d.i AS dim,
               SUM(CAST(${rint(s"CAST(e.embedding[d.i] AS DOUBLE) * 16777216.0")}
                 AS BIGINT)) AS s,
               COUNT(*) AS n
             FROM embeddings e
             JOIN init b USING (vec_id),
             range(1, $dim + 1) d(i)
             GROUP BY b.list0, d.i),
         cl AS (SELECT list_id,
               list(CAST((CAST(s AS DOUBLE) / n) / 16777216.0 AS REAL)
                 ORDER BY dim) AS c
             FROM rsum GROUP BY list_id),
         scores AS (SELECT e.vec_id, cl.list_id,
               CASE WHEN ${fold("e.embedding", "e.embedding")} = 0
                      OR ${fold("cl.c", "cl.c")} = 0 THEN 0.0
                    ELSE ${fold("e.embedding", "cl.c")}
                      / sqrt(${fold("e.embedding", "e.embedding")}
                        * ${fold("cl.c", "cl.c")}) END AS cos
             FROM embeddings e, cl),
         assign AS (SELECT vec_id, list_id FROM (
             SELECT vec_id, list_id,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, list_id) AS rn
             FROM scores) WHERE rn = 1),
         qlists AS (SELECT list_id FROM scores WHERE vec_id = 0
           ORDER BY cos DESC, list_id LIMIT $nProbe),
         q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE vec_id = 0),
         cand AS (SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
             FROM embeddings e
             JOIN assign a USING (vec_id)
             JOIN qlists ql ON a.list_id = ql.list_id)
       SELECT vec_id,
           round(list_dot_product(v, qv) /
             (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             4) AS cosine
       FROM cand, q
       ORDER BY round(list_dot_product(v, qv) /
             (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             4) DESC, vec_id
       LIMIT $k"""
  }

  /** DuckDB replay of the FULL k-means Lloyd loop
    * ([[graft.ops.Clustering.kMeans]], k=8, 2 iterations): the IVF
    * oracle's building blocks — hyperplane init chain, half-even
    * fixed-point centroid means, first-seen cosine argmax — generated
    * once PER ITERATION by a Scala loop, so the oracle unrolls exactly
    * the rounds the gate runs. Output: per-cluster size + exact Float32
    * centroid components.
    */
  lazy val kmeansOracleSql: String = {
    import Duck.{toU, mix64, rint}
    val (numPlanes, dim, k, iters) = (3, 64, 8, 2)
    def fold(a: String, b: String): String = Duck.foldDot(a, b, dim)
    def lloydRound(i: Int, prevAssign: String): String =
      s"""r$i AS (SELECT b.list_id AS list_id, d.i AS dim,
               SUM(CAST(${rint("CAST(e.embedding[d.i] AS DOUBLE) * 16777216.0")}
                 AS BIGINT)) AS s,
               COUNT(*) AS n
             FROM embeddings e
             JOIN $prevAssign b USING (vec_id),
             range(1, $dim + 1) d(i)
             GROUP BY b.list_id, d.i),
         c$i AS (SELECT list_id,
               list(CAST((CAST(s AS DOUBLE) / n) / 16777216.0 AS REAL)
                 ORDER BY dim) AS c
             FROM r$i GROUP BY list_id),
         s$i AS (SELECT e.vec_id, c$i.list_id,
               CASE WHEN ${fold("e.embedding", "e.embedding")} = 0
                      OR ${fold(s"c$i.c", s"c$i.c")} = 0 THEN 0.0
                    ELSE ${fold("e.embedding", s"c$i.c")}
                      / sqrt(${fold("e.embedding", "e.embedding")}
                        * ${fold(s"c$i.c", s"c$i.c")}) END AS cos
             FROM embeddings e, c$i),
         a$i AS (SELECT vec_id, list_id FROM (
             SELECT vec_id, list_id,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, list_id) AS rn
             FROM s$i) WHERE rn = 1)"""
    val rounds = (1 to iters)
      .map(i => lloydRound(i, if (i == 1) "a0" else s"a${i - 1}"))
      .mkString(",\n         ")
    s"""WITH RECURSIVE chain(p, i, h) AS (
           SELECT p, 0, ${mix64("19088743 + p")}
           FROM range(0, $numPlanes) t(p)
           UNION ALL
           SELECT p, i + 1, ${mix64("h")} FROM chain WHERE i < $dim),
         planes AS (SELECT p, i - 1 AS dim,
               CAST(CAST((${toU("h")} // 2048) AS DOUBLE)
                 / 9007199254740992.0 - 0.5 AS REAL) AS pv
             FROM chain WHERE i >= 1),
         pl AS (SELECT p, list(pv ORDER BY dim) AS v FROM planes GROUP BY p),
         a0 AS (SELECT e.vec_id,
               CAST(SUM(CASE WHEN ${fold("e.embedding", "pl.v")} >= 0
                   THEN 1 << p ELSE 0 END) AS INTEGER) % $k AS list_id
             FROM embeddings e, pl GROUP BY e.vec_id),
         $rounds
       SELECT c.list_id AS cluster, n.n,
         CAST(c.c[1] AS DOUBLE) AS c0, CAST(c.c[2] AS DOUBLE) AS c1
       FROM c$iters c
       JOIN (SELECT list_id, COUNT(*) AS n FROM a$iters GROUP BY list_id) n
         USING (list_id)
       ORDER BY cluster"""
  }

  /** DuckDB replica of the full [[graft.embed.Embedder]] kernel for the
    * fixed gate query — tokenize (word runs sliced to 4-char subwords,
    * single non-word chars; whitespace skipped), FNV-1a each piece,
    * 3 chained splitmix64 features per unigram AND per order-sensitive
    * bigram seed mix64(prev)^h, signed ±1 votes into 768 dims
    * (d = h mod 768 unsigned, sign = bit 62), Float32 L2-normalize.
    * Every step is integer or exactly-representable float math, so the
    * 768 components hash-match bit-for-bit. (doc_embeddings stays
    * rows-only: its input chunks come from the BreakIterator sentence
    * splitter, which has no SQL expression.)
    */
  lazy val queryEmbeddingOracleSql: String = {
    import Duck.{toU, mix64, fnv}
    val query = "search_query: judicial opinion concerning equal protection"
    s"""WITH toks AS (
           SELECT u.i AS i, u.piece AS w FROM (
             SELECT list_transform(range(1, len(ps) + 1),
                 i -> {'i': i, 'piece': ps[i]}) AS l
             FROM (SELECT flatten(list_transform(
                 regexp_extract_all('$query',
                   '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'),
                 r -> CASE WHEN regexp_matches(r[1:1], '[A-Za-z0-9_]')
                      THEN list_transform(
                        range(0, CAST(ceil(len(r) / 4.0) AS INT)),
                        k -> r[k*4+1 : least((k+1)*4, len(r))])
                      ELSE [r] END)) AS ps)
           ) t, unnest(t.l) AS s(u)),
         th AS (SELECT i, ${fnv("w")} AS h FROM toks),
         seeds AS (
           SELECT h AS seed FROM th
           UNION ALL
           SELECT xor(${mix64("p.h")}, c.h) AS seed
           FROM th c JOIN th p ON p.i = c.i - 1),
         f1 AS (SELECT ${mix64("seed")} AS f FROM seeds),
         f2 AS (SELECT ${mix64("f")} AS f FROM f1),
         f3 AS (SELECT ${mix64("f")} AS f FROM f2),
         feats AS (SELECT f FROM f1 UNION ALL SELECT f FROM f2
           UNION ALL SELECT f FROM f3),
         contrib AS (SELECT CAST(${toU("f")} % 768 AS INT) AS d,
             CASE WHEN (${toU("f")} // 4611686018427387904) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
           FROM feats),
         counts AS (SELECT r.pos, COALESCE(c.cnt, 0) AS cnt
           FROM range(0, 768) r(pos)
           LEFT JOIN (SELECT d, SUM(sgn) AS cnt FROM contrib GROUP BY d) c
             ON c.d = r.pos),
         norm AS (SELECT CAST(1.0 / sqrt(
               SUM(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))) AS REAL) AS inv
           FROM counts)
       SELECT CAST(pos AS INT) AS pos,
           CAST(CAST(CAST(cnt AS REAL) * inv AS REAL) AS DOUBLE) AS value
       FROM counts, norm
       ORDER BY pos"""
  }

  /** DuckDB fragment: SimpleTokenizer.encode piece list (whitespace-free
    * pieces — word runs sliced into 4-char subwords, single non-word
    * chars) of a text expression. Shared by every chunker/embedding
    * oracle; identical to the inline extraction the query_embedding
    * oracle pioneered.
    */
  def duckPieces(t: String): String =
    s"""flatten(list_transform(
         regexp_extract_all($t, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'),
         r -> CASE WHEN regexp_matches(r[1:1], '[A-Za-z0-9_]')
              THEN list_transform(range(0, CAST(ceil(len(r) / 4.0) AS INT)),
                k -> r[k*4+1 : least((k+1)*4, len(r))])
              ELSE [r] END))"""

  /** The sentence-split/chunker oracles below rely on a PROPERTY OF THE
    * CORPUS, verified mechanically against all three SF dirs: document
    * text is strictly lowercase words and single spaces ([a-z ]+, no
    * leading/trailing/double spaces, no empties, max 158 BPE-ish tokens).
    * Under UAX#29 (java.text.BreakIterator, which suppresses a sentence
    * break when the character run after a terminator starts lowercase —
    * and with no [.!?] present at all) every document is EXACTLY ONE
    * sentence, and with leadLen(7) + 158 well under maxTokens=512 the
    * chunker's single-sentence fold emits EXACTLY ONE untruncated chunk
    * `'search_document: ' || text`. The packing/overlap/flush branches are
    * oracle-exercised separately on constructed multi-sentence text by
    * chunk_packing.
    */
  lazy val sentenceStatsOracleSql: String =
    """SELECT doc_id,
         CAST(len(list_filter(regexp_extract_all(text, '[^.!?]+[.!?]*'),
           s -> trim(s) <> '')) AS INTEGER) AS n_sentences
       FROM documents ORDER BY doc_id"""

  lazy val sentenceChunksOracleSql: String =
    """SELECT doc_id, CAST(1 AS INTEGER) AS chunk_number,
         'search_document: ' || trim(text) AS chunk
       FROM documents WHERE trim(text) <> ''
       ORDER BY doc_id, chunk_number"""

  lazy val chunkCountsOracleSql: String =
    """SELECT doc_id, CAST(1 AS BIGINT) AS n_chunks
       FROM documents WHERE trim(text) <> ''
       ORDER BY doc_id"""

  /** DuckDB replica of the FLAGSHIP end-to-end path (validate → sentence
    * split → chunk → [[graft.embed.Embedder]] per chunk): the kernel
    * replay is the query_embedding oracle's, applied per document to the
    * single chunk `'search_document: ' || text` (see the corpus-property
    * note above), with the per-doc Float32 L2 norm over all 768 dims and
    * the first four components emitted bit-for-bit.
    */
  lazy val docEmbeddingsOracleSql: String = {
    import Duck.{toU, mix64, fnv}
    s"""WITH d AS (
           SELECT doc_id, 'search_document: ' || trim(text) AS c
           FROM documents WHERE trim(text) <> ''),
         toks AS (SELECT doc_id, u.i AS i, u.piece AS w FROM (
             SELECT doc_id, list_transform(range(1, len(ps) + 1),
                 i -> {'i': i, 'piece': ps[i]}) AS l
             FROM (SELECT doc_id, ${duckPieces("c")} AS ps FROM d)
           ) t, unnest(t.l) AS s(u)),
         th AS (SELECT doc_id, i, ${fnv("w")} AS h FROM toks),
         seeds AS (
           SELECT doc_id, h AS seed FROM th
           UNION ALL
           SELECT c.doc_id, xor(${mix64("p.h")}, c.h) AS seed
           FROM th c JOIN th p ON p.doc_id = c.doc_id AND p.i = c.i - 1),
         f1 AS (SELECT doc_id, ${mix64("seed")} AS f FROM seeds),
         f2 AS (SELECT doc_id, ${mix64("f")} AS f FROM f1),
         f3 AS (SELECT doc_id, ${mix64("f")} AS f FROM f2),
         feats AS (SELECT doc_id, f FROM f1
           UNION ALL SELECT doc_id, f FROM f2
           UNION ALL SELECT doc_id, f FROM f3),
         contrib AS (SELECT doc_id, CAST(${toU("f")} % 768 AS INT) AS dd,
             CASE WHEN (${toU("f")} // 4611686018427387904) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
           FROM feats),
         sums AS (SELECT doc_id, dd, SUM(sgn) AS cnt
           FROM contrib GROUP BY doc_id, dd),
         norm AS (SELECT doc_id, CAST(1.0 / sqrt(
               SUM(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))) AS REAL) AS inv
           FROM sums GROUP BY doc_id),
         vals AS (SELECT d.doc_id, r.pos,
             CAST(CAST(CAST(COALESCE(s.cnt, 0) AS REAL) * n.inv AS REAL)
               AS DOUBLE) AS v
           FROM d
           JOIN norm n USING (doc_id)
           CROSS JOIN range(0, 4) r(pos)
           LEFT JOIN sums s ON s.doc_id = d.doc_id AND s.dd = r.pos)
       SELECT doc_id, CAST(1 AS INTEGER) AS chunk_number,
         MAX(CASE WHEN pos = 0 THEN v END) AS e0,
         MAX(CASE WHEN pos = 1 THEN v END) AS e1,
         MAX(CASE WHEN pos = 2 THEN v END) AS e2,
         MAX(CASE WHEN pos = 3 THEN v END) AS e3
       FROM vals GROUP BY doc_id
       ORDER BY doc_id, chunk_number"""
  }

  /** DuckDB replica of [[graft.text.Chunker.splitSentences]] — the greedy
    * packing fold (reference embedding_service.py:116-149) as a recursive
    * CTE over per-sentence token costs, against the same constructed
    * multi-sentence text as [[qChunkPacking]]. State per (doc, step):
    * current chunk's sentences + their costs (parallel lists), the
    * running budget, and the emitted chunks. The overlap re-encode
    * (reference lines 124-126) is the cost sum — SimpleTokenizer counts
    * are additive over single-space joins by construction. Token costs
    * come from the SAME piece extraction as the embedding oracles, so a
    * cost-model drift would break both, loudly.
    */
  /** Shared recursive-CTE body for the packing fold — CTEs `d` through
    * `fin(doc_id, chunks)`. Used verbatim by [[chunkPackingOracleSql]]
    * (chunk text readout) and composed with the embedding-kernel replay
    * by [[docReassemblyOracleSql]] (O10 gate) so a packing-model drift
    * breaks both gates identically.
    */
  lazy val packingCteBody: String = {
    val (maxTokens, overlap, leadLen) = (48, 2, 7)
    // takeRight(overlap) over the parallel sentence/cost lists
    def tail(l: String) =
      s"$l[greatest(len($l) - ${overlap - 1}, 1):len($l)]"
    val ocost = s"COALESCE(list_sum(${tail("r.curc")}), 0)"
    s"""d AS (
           SELECT doc_id, list_filter(string_split(text, ' '),
             w -> w <> '') AS ws
           FROM documents),
         d2 AS (SELECT doc_id, ws FROM d WHERE len(ws) >= 1),
         sent AS (
           SELECT doc_id, g + 1 AS i,
             upper(j[1:1]) || j[2:] || ' end.' AS s
           FROM (SELECT doc_id, g,
               array_to_string(ws[g*8+1:g*8+8], ' ') AS j
             FROM d2, unnest(range(0, (len(ws) - 1) // 8 + 1)) t(g))),
         sc AS (SELECT doc_id, i, s,
             CAST(CASE WHEN len(${duckPieces("s")}) > $maxTokens - $leadLen
               THEN error('chunk_packing precondition violated: sentence ' ||
                 'cost > maxTokens - leadLen; the CTE does not model ' ||
                 'the truncation branch')
               ELSE len(${duckPieces("s")}) END AS INT) AS c
           FROM sent),
         nsent AS (SELECT doc_id, MAX(i) AS n FROM sc GROUP BY doc_id),
         rec(doc_id, i, curs, curc, cnt, chunks) AS (
           SELECT doc_id, 0, CAST([] AS TEXT[]), CAST([] AS INT[]),
             $leadLen, CAST([] AS TEXT[])
           FROM nsent
           UNION ALL
           SELECT r.doc_id, r.i + 1,
             CASE WHEN r.cnt + s.c <= $maxTokens
                    THEN list_append(r.curs, s.s)
                  WHEN $leadLen + $ocost + s.c <= $maxTokens
                    THEN list_append(${tail("r.curs")}, s.s)
                  ELSE [s.s] END,
             CASE WHEN r.cnt + s.c <= $maxTokens
                    THEN list_append(r.curc, s.c)
                  WHEN $leadLen + $ocost + s.c <= $maxTokens
                    THEN list_append(${tail("r.curc")}, s.c)
                  ELSE [s.c] END,
             CASE WHEN r.cnt + s.c <= $maxTokens THEN r.cnt + s.c
                  WHEN $leadLen + $ocost + s.c <= $maxTokens
                    THEN $leadLen + $ocost + s.c
                  ELSE $leadLen + s.c END,
             CASE WHEN r.cnt + s.c <= $maxTokens THEN r.chunks
                  ELSE list_append(r.chunks,
                    array_to_string(r.curs, ' ')) END
           FROM rec r JOIN sc s
             ON s.doc_id = r.doc_id AND s.i = r.i + 1),
         fin AS (
           SELECT r.doc_id,
             CASE WHEN len(r.curs) > 0
                  THEN list_append(r.chunks, array_to_string(r.curs, ' '))
                  ELSE r.chunks END AS chunks
           FROM rec r JOIN nsent n
             ON n.doc_id = r.doc_id AND r.i = n.n)"""
  }

  lazy val chunkPackingOracleSql: String =
    s"""WITH RECURSIVE $packingCteBody
       SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_number,
         'search_document: ' || chunks[u.i] AS chunk
       FROM fin, unnest(list_transform(range(1, len(chunks) + 1),
         i -> {'i': i})) t(u)
       ORDER BY doc_id, chunk_number"""

  /** O10 per-document reassembly gate (VERDICT r15 ask #1) — the DuckDB
    * twin of [[qDocReassembly]]: the SAME packing CTEs as chunk_packing
    * (multi-chunk corpus, so array order genuinely matters), each chunk
    * re-embedded by the SAME splitmix64/FNV kernel replay as
    * doc_embeddings, keyed by a composite k = doc_id·1000 + chunk_number
    * (chunk counts are ≤ 6 « 1000 under the constructed 8-word-sentence
    * corpus, enforced by the packing precondition). `pos_matches` is the
    * reassembly-order contract: Spark emits pos+1 = chunk_number computed
    * from the ACTUAL array position (posexplode), the oracle emits TRUE —
    * any ordering defect in embedDocuments' in-place assembly
    * (reference embedding_service.py:220-257, 1-based numbering,
    * prefix-stripped chunk text) hash-mismatches loudly.
    */
  lazy val docReassemblyOracleSql: String = {
    import Duck.{toU, mix64, fnv}
    s"""WITH RECURSIVE $packingCteBody,
         ch AS (
           SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_number,
             chunks[u.i] AS chunk,
             doc_id * 1000 + u.i AS k,
             'search_document: ' || chunks[u.i] AS c
           FROM fin, unnest(list_transform(range(1, len(chunks) + 1),
             i -> {'i': i})) t(u)),
         toks AS (SELECT k, u.i AS i, u.piece AS w FROM (
             SELECT k, list_transform(range(1, len(ps) + 1),
                 i -> {'i': i, 'piece': ps[i]}) AS l
             FROM (SELECT k, ${duckPieces("c")} AS ps FROM ch)
           ) t, unnest(t.l) AS s(u)),
         th AS (SELECT k, i, ${fnv("w")} AS h FROM toks),
         seeds AS (
           SELECT k, h AS seed FROM th
           UNION ALL
           SELECT c.k, xor(${mix64("p.h")}, c.h) AS seed
           FROM th c JOIN th p ON p.k = c.k AND p.i = c.i - 1),
         f1 AS (SELECT k, ${mix64("seed")} AS f FROM seeds),
         f2 AS (SELECT k, ${mix64("f")} AS f FROM f1),
         f3 AS (SELECT k, ${mix64("f")} AS f FROM f2),
         feats AS (SELECT k, f FROM f1
           UNION ALL SELECT k, f FROM f2
           UNION ALL SELECT k, f FROM f3),
         contrib AS (SELECT k, CAST(${toU("f")} % 768 AS INT) AS dd,
             CASE WHEN (${toU("f")} // 4611686018427387904) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
           FROM feats),
         sums AS (SELECT k, dd, SUM(sgn) AS cnt
           FROM contrib GROUP BY k, dd),
         norm AS (SELECT k, CAST(1.0 / sqrt(
               SUM(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE))) AS REAL) AS inv
           FROM sums GROUP BY k),
         vals AS (SELECT ch.k, r.pos,
             CAST(CAST(CAST(COALESCE(s.cnt, 0) AS REAL) * n.inv AS REAL)
               AS DOUBLE) AS v
           FROM ch
           JOIN norm n USING (k)
           CROSS JOIN range(0, 8) r(pos)
           LEFT JOIN sums s ON s.k = ch.k AND s.dd = r.pos)
       SELECT ch.doc_id, ch.chunk_number, TRUE AS pos_matches, ch.chunk,
         MAX(CASE WHEN pos = 0 THEN v END) AS e0,
         MAX(CASE WHEN pos = 1 THEN v END) AS e1,
         MAX(CASE WHEN pos = 2 THEN v END) AS e2,
         MAX(CASE WHEN pos = 3 THEN v END) AS e3,
         MAX(CASE WHEN pos = 4 THEN v END) AS e4,
         MAX(CASE WHEN pos = 5 THEN v END) AS e5,
         MAX(CASE WHEN pos = 6 THEN v END) AS e6,
         MAX(CASE WHEN pos = 7 THEN v END) AS e7
       FROM ch JOIN vals ON vals.k = ch.k
       GROUP BY ch.doc_id, ch.chunk_number, ch.chunk
       ORDER BY doc_id, chunk_number"""
  }

  /** DuckDB replicas of the multimodal gates — possible because the gate
    * MEDIA IS SYNTHESIZED from closed-form integer formulas (see
    * synthPngUdf / synthFramesUdf / synthWavUdf), then round-tripped
    * through the REAL codecs (PNG/BMP header parse + javax.imageio pixel
    * decode, GFRM frame index, WAV RIFF + PCM16LE). The oracles recompute
    * the expected DECODED values from the same formulas: any header-parse,
    * pixel-traversal, resize-lattice or sample-decode defect breaks the
    * hash. Image stats are integer-exact (no FP); frame f0 and audio RMS
    * use only exact binary fractions + one correctly-rounded IEEE op.
    */
  lazy val multimodalImagesOracleSql: String =
    """WITH p AS (SELECT doc_id, 8 + doc_id % 24 AS w,
           8 + (doc_id * 7) % 24 AS h, doc_id % 5 = 0 AS jp
         FROM documents WHERE doc_id < 500),
       s AS (SELECT p.doc_id,
           CAST(SUM((x.x * y.y + p.doc_id) % 256) AS BIGINT) AS sum_r
         FROM p, range(0, 32) x(x), range(0, 32) y(y)
         WHERE x.x < p.w AND y.y < p.h
         GROUP BY p.doc_id),
       r AS (SELECT p.doc_id,
           CAST(SUM((((x.x * p.w) // 16) * ((y.y * p.h) // 16) + p.doc_id)
             % 256) AS BIGINT) AS rsum_r
         FROM p, range(0, 16) x(x), range(0, 16) y(y)
         GROUP BY p.doc_id)
       SELECT p.doc_id,
         CASE WHEN jp THEN 'jpeg' ELSE 'png' END AS format,
         CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
         TRUE AS decoded,
         CASE WHEN jp THEN NULL ELSE s.sum_r END AS sum_r,
         CASE WHEN jp THEN NULL ELSE r.rsum_r END AS rsum_r
       FROM p JOIN s USING (doc_id) JOIN r USING (doc_id)
       ORDER BY doc_id"""

  lazy val multimodalFramesOracleSql: String =
    """WITH p AS (SELECT doc_id, 2 + doc_id % 5 AS nf
         FROM documents WHERE doc_id < 500),
       f AS (SELECT doc_id, t.j + 1 AS frame_number,
           (doc_id + 37 * ((t.j * nf) // 4)) % 256 AS r
         FROM p, range(0, 4) t(j))
       SELECT doc_id AS media_id, CAST(frame_number AS INTEGER) AS frame_number,
         CAST(CAST(CAST(r AS DOUBLE) / 255.0 AS REAL) AS DOUBLE) AS f0
       FROM f ORDER BY media_id, frame_number"""

  lazy val multimodalAudioOracleSql: String =
    """WITH p AS (SELECT doc_id, 200 + (doc_id % 8) * 100 AS n
         FROM documents WHERE doc_id < 100),
       s AS (SELECT doc_id, i.i AS i,
           ((doc_id * 131 + i.i * 29) % 65536) - 32768 AS v
         FROM p, range(0, 900) i(i)
         WHERE i.i < p.n),
       w AS (SELECT doc_id, CAST(i // 128 + 1 AS INTEGER) AS window_no,
           sqrt(SUM((CAST(v AS DOUBLE) / 32768.0)
             * (CAST(v AS DOUBLE) / 32768.0)) / COUNT(*)) AS rms
         FROM s GROUP BY doc_id, i // 128)
       SELECT doc_id AS media_id, window_no, rms
       FROM w ORDER BY media_id, window_no"""

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose kernels are not
    * SQL-expressible (sentence split / chunker / embedder) → driver
    * records a weaker rows-only check.
    */
  /** Shared CTE replay of [[writtenTxnOrdersTable]]'s commit history —
    * one version per CTE, spliced into every table-gate oracle.
    */
  val txnTableCtes: String =
    """WITH base AS (SELECT * FROM orders WHERE o_orderkey % 3 = 0),
         v1 AS (SELECT * FROM base
                UNION ALL SELECT * FROM orders WHERE o_orderkey % 3 = 1),
         upd AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                   o_totalprice * 2 AS o_totalprice, o_orderdate,
                   o_orderpriority
                 FROM orders WHERE o_orderkey % 6 = 0
                 UNION ALL
                 SELECT * FROM orders WHERE o_orderkey % 3 = 2),
         v2 AS (SELECT * FROM v1 WHERE o_orderkey NOT IN
                  (SELECT o_orderkey FROM upd)
                UNION ALL SELECT * FROM upd),
         v3 AS (SELECT * FROM v2 WHERE o_orderkey % 5 <> 0)"""



  /** DuckDB replay of [[graft.ops.Sampling.epochShard]] (seed 7, 8
    * shards): the splitmix64 finalizer expanded in HUGEINT mod-2^64
    * arithmetic, then floor-mod shard + per-shard hash rank.
    */
  lazy val epochShuffleOracleSql: String = {
    val hk = Duck.mix64("xor(doc_id, 7)")
    s"""WITH h AS (SELECT doc_id, $hk AS hk FROM documents),
        s AS (SELECT doc_id, hk,
            CAST(((hk % 8) + 8) % 8 AS INTEGER) AS shard FROM h)
        SELECT doc_id, shard,
          CAST(row_number() OVER (PARTITION BY shard
            ORDER BY hk, doc_id) AS INTEGER) AS pos
        FROM s ORDER BY shard, pos"""
  }

  /** Shared WITH-prefix of the [[graft.ops.BpeTrainer]] oracle replays,
    * generated as chained CTE stages: p_i = weighted adjacent pair
    * counts of stage i-1's sequences, b_i = the (n DESC, lhs, rhs)
    * arg-max, s_i = the brace-wrapped greedy replace (word rides
    * through, so the last stage IS the corpus encoding). DuckDB's
    * `replace` is non-overlapping left-to-right exactly like Spark's,
    * and brace-wrapped patterns share no boundary characters between
    * adjacent matches, so both engines realize the same greedy merge.
    */
  def bpeStagesSql(k: Int): String = {
    val stages = (1 to k).map { i =>
      s"""p$i AS (SELECT l[i] AS lhs, l[i + 1] AS rhs,
             CAST(SUM(freq) AS BIGINT) AS n
           FROM (SELECT string_split(trim(seq, '{}'), '}{') AS l, freq
                 FROM s${i - 1}),
                unnest(range(1, len(l))) t(i)
           GROUP BY 1, 2),
         b$i AS (SELECT lhs, rhs, n FROM p$i
           ORDER BY n DESC, lhs, rhs LIMIT 1),
         s$i AS (SELECT word,
             replace(seq, '{' || b.lhs || '}{' || b.rhs || '}',
               '{' || b.lhs || b.rhs || '}') AS seq, freq
           FROM s${i - 1} CROSS JOIN b$i b)"""
    }.mkString(",\n         ")
    s"""WITH w AS (SELECT unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '')) AS word
           FROM documents),
         wf AS (SELECT word, count(*) AS freq FROM w GROUP BY 1),
         s0 AS (SELECT word, '{' || array_to_string(
             regexp_split_to_array(word, ''), '}{') || '}{</w>}' AS seq,
             freq FROM wf),
         $stages"""
  }

  lazy val bpeTrainOracleSql: String = {
    val k = 8
    val union = (1 to k)
      .map(i => s"SELECT $i AS step, lhs, rhs, n FROM b$i")
      .mkString(" UNION ALL ")
    s"""${bpeStagesSql(k)}
         SELECT step, lhs, rhs, n FROM ($union) ORDER BY step"""
  }

  lazy val bpeEncodeOracleSql: String = {
    val k = 8
    s"""${bpeStagesSql(k)}
         SELECT word,
           CAST(len(string_split(trim(seq, '{}'), '}{')) AS INTEGER)
             AS n_tokens,
           seq
         FROM s$k ORDER BY word"""
  }

  lazy val bpeDocTokensOracleSql: String = {
    val k = 8
    s"""${bpeStagesSql(k)},
         enc AS (SELECT word,
             CAST(len(string_split(trim(seq, '{}'), '}{')) AS BIGINT)
               AS n_tokens
           FROM s$k),
         dw AS (SELECT doc_id, word, COUNT(*) AS n_occ
           FROM (SELECT doc_id, unnest(list_filter(
                   regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
                   x -> x <> '')) AS word
                 FROM documents)
           GROUP BY 1, 2)
         SELECT doc_id,
           CAST(SUM(n_occ * n_tokens) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_occ) AS BIGINT) AS n_words
         FROM dw JOIN enc USING (word)
         GROUP BY doc_id ORDER BY doc_id"""
  }
}
