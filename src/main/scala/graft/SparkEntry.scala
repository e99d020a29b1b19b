package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.EngineConfig
import graft.engine.InceptionEngine

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (parity pipeline
  * over `documents`) or a relational/extension operator over the TPC-H-ish
  * tables. Every SQL-expressible query has a DuckDB twin in `oracleSql`
  * with IDENTICAL output column names and ordering.
  *
  * Determinism rules used throughout (so t2 hash-compare is stable):
  *   - double aggregates accumulate via exact DECIMAL then cast to double
  *     (associativity-proof — Spark partial aggregation order differs from
  *     DuckDB's);
  *   - timestamps are emitted as epoch microseconds (bigint) — parquet
  *     nanos (DuckDB) vs micros (Spark) would otherwise hash-differ;
  *   - every query ends in a total ORDER BY on a unique key.
  */
object SparkEntry {

  private val engine = new InceptionEngine(EngineConfig.default)

  /** Session-scoped metrics-wired engine (O13): one Metrics per live
    * SparkSession so accumulators register against the right context.
    * Endpoint-shaped queries run through this engine, so REQUEST_COUNT /
    * CHUNK_COUNT / ERROR_COUNT / PROCESSING_TIME accumulate during the
    * verify and bench runs exactly as the reference's Prometheus counters
    * accumulate in serving.
    */
  // WEAK keys: a strong SparkSession-keyed cache would retain every
  // stopped session (and its accumulator-registered Metrics) for the JVM
  // lifetime in multi-session processes (test suites, services)
  private val enginesWithMetrics =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, InceptionEngine]())
  private def engineFor(s: SparkSession): InceptionEngine =
    enginesWithMetrics.synchronized {
      enginesWithMetrics.computeIfAbsent(
        s,
        k => new InceptionEngine(
          EngineConfig.default,
          Some(new graft.engine.Metrics(k.sparkContext))))
    }

  /** Metrics snapshot for the session's endpoint engine (monitoring.py
    * surface; asserted in EngineSpec). */
  def metricsSnapshot(s: SparkSession): Map[String, Long] =
    Option(enginesWithMetrics.get(s))
      .flatMap(_.metrics).map(_.snapshot).getOrElse(Map.empty)

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal sum of a double column, emitted as double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** Canonical word tokenization shared by the text-corpus queries and
    * mirrored verbatim in their DuckDB oracles: lowercase, split on
    * non-[a-z0-9_] runs, drop empties. One definition — a tokenization
    * change must touch exactly here plus the oracle strings.
    */
  private val tokensSql =
    "filter(split(lower(text), '[^a-z0-9_]+'), w -> w <> '')"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full embed pipeline: validate → chunk → embed → per-doc reassembly —
    * zero-shuffle narrow plan (see InceptionEngine.embedDocuments).
    */
  def entry(spark: SparkSession): DataFrame =
    engine
      .embedDocuments(tbl(spark, "/root/testdata/sf0.001", "documents"))
      .toDF()

  // ------------------------------------------------------------------
  // Parity pipeline over `documents` (SURVEY.md §2.1)
  // ------------------------------------------------------------------

  /** O2 clean_text_for_json (utils.py:38-70). */
  private def qCleanText(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"), engine.cleanText(col("text")).as("cleaned"))
      .orderBy("doc_id")

  /** O3 /api/v1/validate/text (routes/embedding.py:129-150). */
  private def qValidateText(s: SparkSession, dir: String): DataFrame =
    engineFor(s)
      .validateText(tbl(s, dir, "documents"))
      .select(col("doc_id"), col("processed_text"), col("is_valid"), col("error"))
      .orderBy("doc_id")

  /** O1 validate_text_length (utils.py:84-116) with maxTextLength=300 so
    * both branches fire on the synthetic docs (n_chars 1..~1000). Emits
    * both the error label and the per-document message (the "Document N:"
    * prefix on the too-short branch, utils.py:97-103).
    */
  private def qValidateLength(s: SparkSession, dir: String): DataFrame = {
    val strict = new InceptionEngine(
      EngineConfig.default.copy(maxTextLength = 300))
    strict.withValidation(tbl(s, dir, "documents"))
      .select(col("doc_id"), col("error_type"), col("error"))
      .orderBy("doc_id")
  }

  /** decode_error path (routes/embedding.py:74-76 → utils.py:124-131):
    * documents re-encoded as UTF-8 bytes, with a planted invalid byte
    * sequence on every 7th doc — the engine decodes/validates the binary
    * column; truth is known by construction for the oracle.
    */
  private def qDecodeUtf8(s: SparkSession, dir: String): DataFrame = {
    val withBin = tbl(s, dir, "documents").select(
      col("doc_id"),
      when(col("doc_id") % 7 === 0, unhex(lit("FFFEFD")))
        .otherwise(encode(col("text"), "UTF-8")).as("raw"))
    engineFor(s).decodeUtf8(withBin, "raw")
      .select(col("doc_id"), col("text").as("decoded"),
        col("error_type"), col("error"))
      .orderBy("doc_id")
  }

  /** O4 sentence split stats (embedding_service.py:64-78). */
  private def qSentenceStats(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(
        col("doc_id"),
        size(engine.sentencesUdf(col("text"))).as("n_sentences"))
      .orderBy("doc_id")

  /** O6 chunker, exploded (embedding_service.py:80-150). */
  private def qSentenceChunks(s: SparkSession, dir: String): DataFrame =
    engine
      .chunkDocuments(tbl(s, dir, "documents"))
      .orderBy("doc_id", "chunk_number")

  /** O9 per-doc chunk counts (embedding_service.py:199). */
  private def qChunkCounts(s: SparkSession, dir: String): DataFrame =
    engine
      .chunkDocuments(tbl(s, dir, "documents"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"))
      .orderBy("doc_id")

  /** O4+O6 with the GREEDY PACKING + OVERLAP branches actually firing.
    *
    * The synthetic corpus is lowercase words + single spaces with no
    * sentence terminators, so on the raw `documents` table every doc is
    * one sentence and the chunker's packing loop degenerates to a single
    * chunk (see [[qSentenceChunks]]). This query CONSTRUCTS multi-sentence
    * prose from the same corpus with expressions that exist verbatim in
    * both engines — 8-word groups, first word capitalized, a fixed
    * non-abbreviation terminator word before the period, so
    * BreakIterator's UAX#29 rules (break only at terminator + space +
    * uppercase) and the punkt-style merge pass (the last token "end" is
    * multi-letter and not in the abbreviation inventory) recover EXACTLY
    * the constructed sentence list — then runs the REAL engine chunker at
    * maxTokens=48 / 2 overlap sentences (out-of-range ratio on purpose;
    * the reference's own tests chunk at max_tokens=15,
    * tests/test_embedding_service.py:330-345). ~3-4 sentences per chunk,
    * 3-6 chunks per doc: the overlap-carry, overlap-overflow-reset and
    * flush branches (reference embedding_service.py:116-149) all execute,
    * and the DuckDB oracle replays the whole fold as a recursive CTE over
    * the per-sentence token costs.
    */
  private def qChunkPacking(s: SparkSession, dir: String): DataFrame = {
    val eng = new InceptionEngine(
      EngineConfig.default.copy(maxTokens = 48, overlapRatio = 0.05))
    val docs = tbl(s, dir, "documents")
      .withColumn("ws", expr("filter(split(text, ' '), w -> w <> '')"))
      .filter(size(col("ws")) >= 1)
      .withColumn("text2", expr(
        """concat_ws(' ', transform(sequence(0, (size(ws) - 1) div 8),
             g -> concat(
               upper(substring(array_join(slice(ws, g * 8 + 1, 8), ' '), 1, 1)),
               substring(array_join(slice(ws, g * 8 + 1, 8), ' '), 2),
               ' end.')))"""))
    // PRECONDITION, checked loudly in BOTH engines (the oracle CTE
    // carries the twin check via error()): the recursive CTE models
    // every fold branch EXCEPT single-oversized-sentence truncation
    // (leadLen + sentence cost > maxTokens), which this constructed
    // corpus cannot reach (8-word groups). A corpus that could reach it
    // must fail the gate as a named precondition violation, not as an
    // inscrutable hash mismatch.
    val maxSentCostU = udf((t: String) =>
      graft.text.SentenceSplitter.split(Option(t).getOrElse(""))
        .map(graft.text.SimpleTokenizer.countTokens(_))
        .foldLeft(0)(math.max))
    val checked = docs.filter(
      assert_true(maxSentCostU(col("text2")) <= lit(48 - 7),
        lit("chunk_packing precondition violated: sentence cost > " +
          "maxTokens - leadLen; the oracle does not model truncation"))
        .isNull)
    eng.chunkDocuments(checked, "doc_id", "text2")
      .orderBy("doc_id", "chunk_number")
  }

  /** O8+O10 embeddings, long format; first 4 components EXACT (the kernel
    * is bit-deterministic — splitmix64 feature hashing + Float32
    * normalize — so the DuckDB oracle replays it bit-for-bit per document;
    * rounding would only mask a kernel drift, never fix a real one).
    */
  private def qDocEmbeddings(s: SparkSession, dir: String): DataFrame =
    engineFor(s)
      .embedDocumentsExploded(tbl(s, dir, "documents"))
      .toDF()
      .select(
        col("doc_id"),
        col("chunk_number"),
        col("embedding")(0).cast("double").as("e0"),
        col("embedding")(1).cast("double").as("e1"),
        col("embedding")(2).cast("double").as("e2"),
        col("embedding")(3).cast("double").as("e3"))
      .orderBy("doc_id", "chunk_number")

  /** O7 query embedding (embedding_service.py:152-165), one row per dim. */
  private def qQueryEmbedding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vec = engine.embedQuery("judicial opinion concerning equal protection")
    vec.toSeq.zipWithIndex
      .map { case (v, i) => (i, v.toDouble) }
      .toDF("pos", "value")
      .orderBy("pos")
  }

  // ------------------------------------------------------------------
  // Relational surface over the TPC-H-ish tables (SURVEY.md §2.3 —
  // supplied by Spark, exposed as first-class engine queries)
  // ------------------------------------------------------------------

  /** TPC-H Q1-style scan+agg: the partial-aggregation workhorse. */
  private def qQ1Agg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1999-06-30").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q6-style selective filter → pushed predicates, single agg row. */
  private def qQ6Filter(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** TPC-H Q3-style join + top-k (tie-broken total sort). customer and
    * orders scale with SF, so neither carries a broadcast hint — AQE
    * broadcasts at runtime when a side is genuinely small, and falls back
    * to a shuffle join at scale (a forced hint would OOM at 100 TB).
    */
  private def qQ3TopK(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = tbl(s, dir, "orders")
    val l = tbl(s, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .select(
        col("l_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)

  }

  /** TPC-H Q5-style multi-join rollup to nation. Only the fixed-size dims
    * (nation: 25 rows, region: 5 rows — SF-invariant) carry broadcast
    * hints; orders/customer scale with SF, so their join strategy is left
    * to AQE (broadcast when small at runtime, shuffle join at 100 TB).
    */
  private def qQ5Join(s: SparkSession, dir: String): DataFrame = {
    val n = tbl(s, dir, "nation")
    val r = tbl(s, dir, "region")
    val c = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders")
    val l = tbl(s, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
      .orderBy("r_name", "n_name")
  }

  /** Exact interpolated percentiles per group (Spark `percentile` and
    * DuckDB `quantile_cont` share the linear-interpolation definition).
    */
  private def qPercentiles(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("med_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("med_price"))
      .orderBy("l_returnflag")

  /** GROUPING SETS through the engine's SQL surface (spark.sql over a
    * registered view) — the explicit-sets sibling of rollup/cube.
    */
  private def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem_v
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), ())
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
  }

  /** HLL approximate distinct per group. The raw sketch estimate is
    * implementation-specific (never hash-matches another engine), so the
    * gated output carries the exact count plus a BOOLEAN within-5%-bound
    * check of the estimate: the oracle replays the exact side and asserts
    * the bound as literal TRUE — if Spark's HLL ever drifts past 5%, the
    * row hash-mismatches and the gate catches it. The numeric estimate
    * itself is still exercised (the boolean derives from it) and its
    * bound is additionally asserted in OpsSpec.
    */
  private def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double") <=
          col("exact_parts").cast("double") * 0.05).as("within_5pct"))
      .orderBy("l_returnflag")

  /** Window functions: per-customer order numbering + exact running total
    * in cents (bigint — immune to FP association).
    */
  private def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(
        col("o_custkey"),
        col("o_orderkey"),
        row_number().over(w).as("rn"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_cents"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** ROLLUP grouping sets. */
  private def qRollup(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Left-semi join (EXISTS). */
  private def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders").filter(col("o_totalprice") > 100000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS). */
  private def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Set op: INTERSECT of key sets, planned as distinct + left-semi (same
    * semantics on non-null keys; partial aggregation collapses the
    * fact-side scan before its shuffle, and both sides share the partkey
    * partitioning, so the semi join reuses it). part scales with SF —
    * no broadcast hint; AQE broadcasts when the filtered side is small.
    */
  private def qSetOp(s: SparkSession, dir: String): DataFrame = {
    val lk = tbl(s, dir, "lineitem")
      .select(col("l_partkey").as("partkey")).distinct()
    val pk = tbl(s, dir, "part")
      .filter(col("p_size") > 25)
      .select(col("p_partkey").as("partkey")).distinct()
    lk.join(pk, Seq("partkey"), "left_semi").orderBy("partkey")
  }

  /** Generator/UDTF shape: explode the word array, aggregate, global
    * top-k with deterministic tie-break — the classic token-frequency
    * pattern over the corpus.
    */
  private def qWordTopK(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-zA-Z0-9_]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  /** Set op: EXCEPT — lineitem part keys that are NOT in the filtered
    * part set (distinct + anti-join plan, mirrors qSetOp's INTERSECT).
    */
  private def qExcept(s: SparkSession, dir: String): DataFrame = {
    val lk = tbl(s, dir, "lineitem")
      .select(col("l_partkey").as("partkey")).distinct()
    val pk = tbl(s, dir, "part")
      .filter(col("p_size") > 25)
      .select(col("p_partkey").as("partkey")).distinct()
    lk.join(pk, Seq("partkey"), "left_anti").orderBy("partkey")
  }

  /** LEFT OUTER join + aggregation: every customer with their order count
    * and spend, zeros included (the outer-join sibling of q_antijoin).
    */
  private def qLeftOuter(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey").as("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** Event time as integer epoch MICROSECONDS, resolved by the input's
    * actual schema. The fixtures have shipped `events.ts` both as
    * TIMESTAMP(NANOS) — which Spark surfaces as LongType nanos under
    * spark.sql.legacy.parquet.nanosAsLong — and as a plain `timestamp`
    * column (what every production parquet lake has), so the engine
    * accepts both: LongType → integer DIV, TimestampType → unix_micros
    * (NTZ first reinterpreted in the session zone, UTC everywhere here).
    * Downstream math stays integer-µs, so the DuckDB `epoch_us(ts)`
    * oracles compare bit-exactly under either encoding.
    */
  private def eventTsUs(df: DataFrame): Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts DIV 1000")
      case org.apache.spark.sql.types.TimestampType => unix_micros(col("ts"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case t => throw new IllegalArgumentException(
        s"events.ts: unsupported event-time type $t " +
          "(expected TIMESTAMP, TIMESTAMP_NTZ, or LongType nanos)")
    }

  /** `ts_us` (integer epoch-µs event time) appended, schema-adaptively. */
  private def withTsUs(df: DataFrame): DataFrame =
    df.withColumn("ts_us", eventTsUs(df))

  /** `ts_event` (TimestampType event time, µs precision) appended —
    * the watermark/window input column. A native TimestampType `ts`
    * passes through untouched (no round-trip through integers).
    */
  private def withTsEvent(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampType =>
        df.withColumn("ts_event", col("ts"))
      case _ => df.withColumn("ts_event", timestamp_micros(eventTsUs(df)))
    }

  /** Shared streaming-gate orchestration: size the state-store
    * parallelism (shuffle partitions) to the stateful aggregate's key
    * cardinality, run one AvailableNow drain, stop the query, restore
    * the session's relational default. The distinctive logic (source,
    * fold, sink) stays at each call site; this save/run/await/stop/
    * restore choreography exists ONCE for all streaming gates.
    */
  private def runStream(s: SparkSession, parts: String = "8")(
      start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val oldParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      val q = start
      try q.awaitTermination()
      finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", oldParts)
  }

  /** Streaming-gate choreography over the PUBLIC delta-log surface
    * ([[graft.streaming.DeltaLog]] — promoted from this harness so the
    * pattern the gates prove is reusable): run one AvailableNow drain
    * appending each micro-batch's delta to a fresh log directory, return
    * the directory. All log IO inside DeltaLog goes through the Hadoop
    * FileSystem, so the same code targets a shared cluster URI; the gate
    * just picks a local temp dir.
    */
  private def streamToDeltaLog(
      s: SparkSession,
      stream: DataFrame,
      mode: String,
      prepare: DataFrame => DataFrame = identity): String = {
    val dir = scratchTempDir(s, "graft_gate_log")
    val sink = graft.streaming.DeltaLog.appendSink(s, dir, prepare)
    runStream(s) {
      stream.writeStream
        .outputMode(mode)
        .foreachBatch(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    dir
  }

  private def readDeltaLog(
      s: SparkSession,
      dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    graft.streaming.DeltaLog.readLog(s, dir, schema)

  private def readDeltaLogUpsert(
      s: SparkSession,
      dir: String,
      schema: org.apache.spark.sql.types.StructType,
      keyCols: Seq[String]): DataFrame =
    graft.streaming.DeltaLog.readLogUpsert(s, dir, schema, keyCols)

  /** Event-time tumbling window (1h) — batch twin of the streaming agg. */
  private def qEventsTumbling(s: SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events")
    val tsUs = eventTsUs(ev)
    ev
      .groupBy(
        (tsUs - pmod(tsUs, lit(3600000000L)))
          .as("window_start_us"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("sum_value"))
      .orderBy("window_start_us", "event_type")
  }

  /** Native TIMESTAMP event surface END TO END: group directly on
    * date_trunc('hour', ts) with no integer conversion anywhere — the
    * engine is first-class on real timestamp columns (what every
    * production parquet lake ships), not merely tolerant of them via
    * [[eventTsUs]]. Output hour is TIMESTAMP_NTZ so the parquet value
    * domain (naive µs) matches DuckDB's timestamp exactly. Plan: a
    * straight two-exchange agg+sort (asserted in PlanSpec).
    */
  private def qTsNative(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("hour_ts").cast("timestamp_ntz").as("hour_ts"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour_ts", "event_type")

  /** Sessionization: 30-min-gap sessions via lag + running flag-sum —
    * the classic event-stream window chain.
    */
  private def qEventsSessions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    withTsUs(tbl(s, dir, "events"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn(
        "new_sess",
        when(
          col("prev_us").isNull ||
            col("ts_us") - col("prev_us") > 1800L * 1000000L,
          1L).otherwise(0L))
      .withColumn(
        "session_id",
        sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .orderBy("user_id", "session_id")
  }

  /** Correlated scalar subquery shape: each order with its customer's max
    * order price (planned as window over the customer key — the
    * decorrelated form Spark and DuckDB both reach).
    */
  private def qScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
    tbl(s, dir, "orders")
      .withColumn("cust_max_cents",
        max(round(col("o_totalprice") * 100).cast("long")).over(w))
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        col("cust_max_cents"))
      .orderBy("o_orderkey")
  }

  /** UNION (distinct) vs UNION ALL semantics over key sets. */
  private def qUnionDistinct(s: SparkSession, dir: String): DataFrame = {
    val a = tbl(s, dir, "orders").select(col("o_custkey").as("custkey"))
    val b = tbl(s, dir, "customer")
      .filter(col("c_acctbal") > 0).select(col("c_custkey").as("custkey"))
    a.union(b).distinct().orderBy("custkey")
  }

  /** O1 query-endpoint validation (utils.py:105-116 query branch):
    * maxQueryLength=300 so `query_too_long` fires on the longer docs;
    * includes the O3 empty-after-cleaning branch queries go through.
    */
  private def qValidateQuery(s: SparkSession, dir: String): DataFrame = {
    val strict = new InceptionEngine(
      EngineConfig.default.copy(maxQueryLength = 300))
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        strict.queryErrorType(col("text")).as("error_type"))
      .orderBy("doc_id")
  }

  /** Skew-salted aggregation over the 3-value l_returnflag key (each key
    * a hot key): two-phase (key, salt) → key merge. The oracle is the
    * PLAIN aggregate — salting must be result-invariant; sums stay exact
    * under regrouping because they accumulate in DECIMAL.
    */
  private def qSaltedAgg(s: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedSumCount(
        tbl(s, dir, "lineitem"),
        keyCols = Seq("l_returnflag"),
        valueCol = col("l_quantity").cast("decimal(18,6)"),
        salts = 16,
        spreadCol = "l_orderkey")
      .select(col("l_returnflag"),
        col("sum_value").cast("double").as("sum_qty"), col("n"))
      .orderBy("l_returnflag")

  /** Post-aggregation HAVING filter + join back to the dimension.
    * customer scales with SF — no broadcast hint (AQE decides).
    */
  private def qHaving(s: SparkSession, dir: String): DataFrame = {
    val big = tbl(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_spent"))
      .filter(col("n_orders") >= 15)
    big.join(tbl(s, dir, "customer"),
        big("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("n_orders"),
        col("total_spent"))
      .orderBy("c_custkey")
  }

  /** Conditional (pivot-style) aggregation: per-returnflag revenue split
    * by line status via sum(CASE WHEN ...).
    */
  private def qConditionalAgg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        dsum(when(col("l_linestatus") === "F", col("l_extendedprice"))
          .otherwise(0.0)).as("rev_f"),
        dsum(when(col("l_linestatus") === "O", col("l_extendedprice"))
          .otherwise(0.0)).as("rev_o"),
        count(when(col("l_linestatus") === "F", 1)).as("n_f"),
        count(when(col("l_linestatus") === "O", 1)).as("n_o"))
      .orderBy("l_returnflag")

  /** Explicit PIVOT (RelationalGroupedDataset.pivot with a fixed value
    * list — fixed so the plan needs no discovery pass; open-ended pivot
    * would scan once for distinct values first).
    */
  private def qPivot(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_extendedprice")))
      .select(col("l_returnflag"), col("F").as("rev_f"), col("O").as("rev_o"))
      .orderBy("l_returnflag")

  /** CUBE grouping sets (all four grouping combinations). */
  private def qCube(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(
        col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Distinct aggregation: exact count-distinct per group (the expensive
    * two-shuffle shape Spark plans via expand).
    */
  private def qDistinctAgg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Top-k per group: rank-filter window (each customer's 3 priciest
    * orders).
    */
  private def qTopKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    tbl(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      .orderBy("o_custkey", "rk")
  }

  /** Scalar-function surface: string/date/math built-ins in one pass. */
  private def qScalarFuncs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_type")).as("type_len"),
        (col("p_size") % 7).as("size_mod"),
        round(sqrt(col("p_retailprice")), 6).as("price_sqrt"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** Hopping (sliding) event-time windows: 1h length, 30min hop — each
    * event lands in 2 windows via explode, the batch twin of streaming
    * `window(ts, "1 hour", "30 minutes")`.
    */
  private def qEventsHopping(s: SparkSession, dir: String): DataFrame =
    withTsUs(tbl(s, dir, "events"))
      .select(col("ts_us"), col("event_type"),
        explode(expr("sequence(0, 1)")).as("hop"))
      // window_start = 30min-floor(ts) - hop*30min covers both 1h windows
      // containing ts
      .select(
        ((col("ts_us") - pmod(col("ts_us"), lit(1800000000L))) -
          col("hop") * 1800000000L).as("window_start_us"),
        col("event_type"))
      .groupBy("window_start_us", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("window_start_us", "event_type")

  /** One reusable FileStreamSource directory per testdata dir: the
    * source rejects a bare file path (verified — its listing wants a
    * directory/glob), and the fixture table is a single file, so it is
    * symlinked into a directory once, not per invocation. This is INPUT
    * fixture plumbing, deliberately NOT routed through
    * `spark.graft.scratch`: symlinks need a local FS, and on a cluster
    * the stream source simply points at the real table directory URI —
    * no produced gate data ever lives here.
    */
  private val streamDirCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()
  private def eventsStreamDir(dir: String): java.nio.file.Path =
    streamDirCache.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files.createTempDirectory("graft_stream_events")
      java.nio.file.Files.createSymbolicLink(
        p.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$d/events.parquet"))
      p
    })

  private val docsStreamDirCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  private def docsStreamDir(dir: String): java.nio.file.Path =
    docsStreamDirCache.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files.createTempDirectory("graft_stream_docs")
      java.nio.file.Files.createSymbolicLink(
        p.resolve("documents.parquet"),
        java.nio.file.Paths.get(s"$d/documents.parquet"))
      p
    })

  /** The curation stages run BY A REAL STREAMING QUERY — documents
    * arrive through a file-stream source and flow through splitAssign +
    * gopherRules unchanged (both are stateless narrow projections, so
    * streaming is the batch plan under a different source; StreamingSpec
    * additionally proves batch/stream equality across out-of-order
    * micro-batches). Append-mode foreachBatch into the distributed
    * delta log; the oracle computes the same split + keep per document
    * in pure SQL — the streaming path must land byte-identical rows.
    */
  private def qDocsStreamCuration(s: SparkSession, dir: String): DataFrame = {
    val schema = tbl(s, dir, "documents").schema
    val stream = s.readStream.schema(schema)
      .parquet(docsStreamDir(dir).toString)
    val curated = graft.ops.Sampling
      .splitAssign(stream, "doc_id", seed = 42L,
        trainFrac = 0.9, valFrac = 0.05)
      .select(col("doc_id"), col("split"),
        graft.ops.TextAnalysis.gopherRules(col("text"))
          .getField("keep").as("keep"))
    val log = streamToDeltaLog(s, curated, "append")
    readDeltaLog(s, log, curated.schema)
      .select("doc_id", "split", "keep")
      .orderBy("doc_id")
  }

  /** Streamed incremental-stats maintenance with EXACTLY-ONCE batch
    * admission: micro-batches of the documents file-stream merge into
    * the bucket-partitioned [[graft.ops.IncrementalAgg]] state behind
    * the file-backed committed-batch high-water mark
    * (StreamingEmbed.fileHighWaterMark) — a replayed micro-batch is a
    * no-op, closing the crash-mid-swap double-count window
    * IncrementalAgg documents for replayable sources (StreamingSpec
    * proves the replay no-op across out-of-order batches). The final
    * state must hash-match the one-shot full aggregation oracle.
    */
  private def qDocsStreamIncrStats(s: SparkSession, dir: String): DataFrame = {
    val schema = tbl(s, dir, "documents").schema
    val work = scratchTempDir(s, "graft_incr_stream")
    val stateDir = s"$work/state"
    val sink = graft.streaming.StreamingEmbed.idempotentSink(
      (batch: DataFrame, _: Long) => graft.ops.IncrementalAgg.update(
        batch, "source", "n_chars", stateDir, nBuckets = 8),
      graft.streaming.StreamingEmbed.hadoopHighWaterMark(
        s.sparkContext.hadoopConfiguration, s"$work/hwm"))
    val stream = s.readStream.schema(schema)
      .parquet(docsStreamDir(dir).toString)
    runStream(s) {
      stream.writeStream
        .outputMode("append")
        .foreachBatch(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    graft.ops.IncrementalAgg.read(s, stateDir).orderBy("key")
  }

  /** Event-time tumbling counts computed BY A REAL STREAMING QUERY:
    * file-stream source over the same parquet, event-time watermark (1h —
    * bounds window state at scale), Trigger.AvailableNow, UPDATE-mode
    * foreachBatch. Each micro-batch delivers only the groups whose counts
    * changed — the standard keyed-store sink shape — unlike complete
    * mode, which re-materializes the entire aggregate on the driver every
    * trigger. Deltas land in a distributed parquet log
    * ([[streamToDeltaLog]]) and the gate result is the keyed upsert of
    * that log — no result row touches the driver. Hash-matches the same
    * DuckDB SQL as the batch twin, proving the streaming plan computes
    * identical results (SURVEY.md §2.3 "streaming").
    */
  private def qEventsStreamTumbling(s: SparkSession, dir: String): DataFrame = {
    val schema = tbl(s, dir, "events").schema
    val stream = withTsEvent(
      s.readStream.schema(schema).parquet(eventsStreamDir(dir).toString))
      .withWatermark("ts_event", "1 hour")
      .groupBy(window(col("ts_event"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"))
    val log = streamToDeltaLog(s, stream, "update")
    readDeltaLogUpsert(s, log, stream.schema,
      Seq("window_start_us", "event_type"))
      .orderBy("window_start_us", "event_type")
  }

  /** As-of join: each purchase event enriched with the user's latest view
    * at-or-before it (ops/AsOfJoin.scala — union + keyed window, one
    * shuffle, no native operator needed). Oracle uses DuckDB's built-in
    * ASOF JOIN.
    */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = withTsUs(tbl(s, dir, "events"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("view_ts_us"),
        col("event_id").as("view_event_id"))
    graft.ops.AsOfJoin
      .asOf(purchases, views, Seq("user_id"), "ts_us", "view_ts_us",
        Seq("view_ts_us", "view_event_id"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_view_ts_us"), col("asof_view_event_id"))
      .orderBy("event_id")
  }

  /** AS-OF JOIN WITH TOLERANCE (pandas merge_asof's `tolerance` / the
    * feature-store max-staleness contract): a backward match older than
    * 30 minutes is WITHDRAWN (nulled), because serving a stale feature
    * is worse than serving none. Composes the existing as-of kernel
    * with one narrow staleness projection — no new shuffle; the oracle
    * applies the same CASE over DuckDB's ASOF JOIN.
    */
  private def qAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = withTsUs(tbl(s, dir, "events"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("view_ts_us"),
        col("event_id").as("view_event_id"))
    val tolUs = 1800000000L // 30 min
    val joined = graft.ops.AsOfJoin
      .asOf(purchases, views, Seq("user_id"), "ts_us", "view_ts_us",
        Seq("view_ts_us", "view_event_id"))
    val fresh = col("asof_view_ts_us").isNotNull &&
      col("ts_us") - col("asof_view_ts_us") <= tolUs
    joined
      .select(col("event_id"), col("user_id"), col("ts_us"),
        when(fresh, col("asof_view_ts_us")).as("asof_view_ts_us"),
        when(fresh, col("asof_view_event_id")).as("asof_view_event_id"),
        fresh.as("within_tolerance"))
      .orderBy("event_id")
  }

  /** A/B LIFT analysis: users hash-assigned 50/50 (the splitAssign
    * md5-uniform, so assignment is reproducible across engines and
    * reruns — the property an experiment readout must have), per-arm
    * conversion rates and the two-proportion z statistic in one row.
    * The deterministic end of the experimentation pipeline; the oracle
    * replays the hash fold, the rates, and the pooled-variance z.
    */
  private def qAbLift(s: SparkSession, dir: String): DataFrame = {
    val perUser = withTsUs(tbl(s, dir, "events"))
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
        .as("purchased"))
    val assigned = graft.ops.Sampling
      .splitAssign(perUser, "user_id", seed = 11L,
        trainFrac = 0.5, valFrac = 0.25)
      .withColumn("in_a", col("split_u") < 0.5)
    val agg = assigned.agg(
      sum(when(col("in_a"), 1).otherwise(0)).cast("long").as("n_a"),
      sum(when(!col("in_a"), 1).otherwise(0)).cast("long").as("n_b"),
      sum(when(col("in_a"), col("purchased")).otherwise(0)).cast("long")
        .as("conv_a"),
      sum(when(!col("in_a"), col("purchased")).otherwise(0)).cast("long")
        .as("conv_b"))
    // try_divide, not `/`: under ANSI + whole-stage codegen the fused
    // stage evaluates this projection speculatively against PARTIAL
    // aggregate rows too (observed: a 4-task stage throwing
    // DIVIDE_BY_ZERO on a partition whose partial n_a is 0); the final
    // row's divisors are non-zero, so null-on-zero changes nothing in
    // the result and the oracle hash-checks that
    agg.selectExpr("n_a", "n_b", "conv_a", "conv_b",
      "round(try_divide(cast(conv_a AS DOUBLE), n_a), 6) AS rate_a",
      "round(try_divide(cast(conv_b AS DOUBLE), n_b), 6) AS rate_b",
      """round(try_divide(
           try_divide(cast(conv_a AS DOUBLE), n_a)
             - try_divide(cast(conv_b AS DOUBLE), n_b),
           sqrt(try_divide(cast(conv_a + conv_b AS DOUBLE), n_a + n_b)
             * (1.0 - try_divide(cast(conv_a + conv_b AS DOUBLE),
                 n_a + n_b))
             * (try_divide(1.0, n_a) + try_divide(1.0, n_b)))), 6)
         AS z_stat""")
  }

  /** CONVERSION LAG: per user, the time from FIRST view to FIRST
    * purchase (users who purchased before any view, or never did both,
    * are excluded) — the time-to-convert metric product analytics pairs
    * with the funnel. One keyed aggregate (two conditional MINs), no
    * window, no join.
    */
  private def qConversionLag(s: SparkSession, dir: String): DataFrame =
    withTsUs(tbl(s, dir, "events"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts_us")))
          .as("first_view_us"),
        min(when(col("event_type") === "purchase", col("ts_us")))
          .as("first_purchase_us"))
      .filter(col("first_view_us").isNotNull &&
        col("first_purchase_us").isNotNull &&
        col("first_purchase_us") >= col("first_view_us"))
      .select(col("user_id"),
        // integer DIV, not `/`+cast: Spark's double-divide-then-cast
        // truncates but DuckDB's BIGINT cast rounds — div matches `//`
        expr("(first_purchase_us - first_view_us) div 60000000")
          .as("lag_minutes"))
      .orderBy("user_id")

  /** SKYLINE (Pareto-optimal frontier): (price, size) pairs no other
    * part strictly dominates (≤ price AND ≥ size, better in one) — the
    * multi-objective shortlist query. TWO-PHASE sort-based algorithm:
    * a hash-bucketed LOCAL skyline pass first (a point dominated within
    * any subset is dominated globally, so local losers are safe to
    * drop), then the global pass runs its one unpartitioned window over
    * the few survivors — never over the full distinct-pair set. Both
    * phases are the same running-max-of-size-over-cheaper-rows prune;
    * the ORACLE is the brute-force NOT EXISTS dominance scan, so the
    * window algebra is cross-checked against the definition itself.
    */
  private def qSkyline(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "part")
      .select(col("p_retailprice").as("price"), col("p_size").as("size"))
      .groupBy("price", "size").agg(count(lit(1)).as("n_parts"))
      .withColumn("b", pmod(xxhash64(col("price"), col("size")), lit(16)))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("b").orderBy(col("price").asc, col("size").desc)
      .rowsBetween(Long.MinValue, -1)
    val local = d
      .withColumn("mp", max(col("size")).over(wLocal))
      .filter(col("mp").isNull || col("mp") < col("size"))
    val wGlobal = org.apache.spark.sql.expressions.Window
      .orderBy(col("price").asc, col("size").desc)
      .rowsBetween(Long.MinValue, -1)
    local
      .withColumn("mg", max(col("size")).over(wGlobal))
      .filter(col("mg").isNull || col("mg") < col("size"))
      .select("price", "size", "n_parts")
      .orderBy("price", "size")
  }

  /** PARETO / cumulative-share analysis: sources ranked by revenue with
    * each one's share and RUNNING share — "which head of the
    * distribution covers 80%?". Head-bounded: the top-25 rows are taken
    * FIRST with a distributed top-k (TakeOrderedAndProject — per-
    * partition heaps, no global sort), and only then does the
    * unpartitioned running-sum window run, over exactly 25 rows. This
    * is sound because a running sum ordered by (rev DESC, user_id) at
    * rank k only ever reads rows 1..k — the head's cumulative shares
    * are a pure function of the head itself plus the broadcast total.
    * At 100 TB (~10⁹ users) the single-reducer input is 25 rows, not
    * the whole per-user aggregate.
    */
  private def qPareto(s: SparkSession, dir: String): DataFrame = {
    val per = withTsUs(tbl(s, dir, "events"))
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,6)")).as("rev"))
    val tot = per.agg(sum(col("rev")).as("t"))
    val head = per.orderBy(col("rev").desc, col("user_id")).limit(25)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rev").desc, col("user_id"))
      .rowsBetween(Long.MinValue, 0)
    head.crossJoin(broadcast(tot))
      .withColumn("cum", sum(col("rev")).over(w))
      .select(col("user_id"),
        col("rev").cast("double").as("revenue"),
        round(col("rev").cast("double") / col("t").cast("double"), 6)
          .as("share"),
        round(col("cum").cast("double") / col("t").cast("double"), 6)
          .as("cum_share"))
      .orderBy(col("revenue").desc, col("user_id"))
  }

  /** TIME-WEIGHTED AVERAGE (TWAP): each observation weighted by how
    * long it was current (lead(ts) − ts within the user's timeline;
    * the final open-ended observation is excluded) — the correct mean
    * for irregularly sampled series, where the row-mean over-weights
    * bursts. One user-keyed window + one aggregate; DECIMAL weighted
    * sums so partitioning cannot move the result.
    */
  private def qTwap(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    withTsUs(tbl(s, dir, "events"))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      .withColumn("dt_us", lead(col("ts_us"), 1).over(w) - col("ts_us"))
      .filter(col("dt_us").isNotNull)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_obs"),
        // divide as DOUBLE of the exact decimal sums: decimal-division
        // scale rules differ between engines; double division of
        // identical operands does not
        (sum((col("value") * col("dt_us")).cast("decimal(28,6)"))
          .cast("double") /
          sum(col("dt_us").cast("decimal(28,6)")).cast("double"))
          .as("twap0"))
      .select(col("user_id"), col("n_obs"),
        round(col("twap0"), 6).as("twap"))
      .orderBy("user_id")
  }

  /** ROLLING MEDIAN over a trailing 7-row frame per user — the robust
    * rolling statistic Spark has no native window function for:
    * composed as sort_array(collect_list) over the ROWS frame with the
    * interpolated-median formula (odd → middle; even → mean of the two
    * middles, exactly quantile_cont(0.5)). The frame is bounded (7
    * values), so the per-row array is O(frame), never O(partition).
    */
  private def qRollingMedian(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-6, 0)
    withTsUs(tbl(s, dir, "events"))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      .withColumn("arr", sort_array(collect_list(col("value")).over(w)))
      .withColumn("n", size(col("arr")))
      .withColumn("rolling_median", round(
        when(col("n") % 2 === 1,
          expr("element_at(arr, cast((n + 1) div 2 AS INT))"))
          .otherwise((expr("element_at(arr, cast(n div 2 AS INT))") +
            expr("element_at(arr, cast(n div 2 + 1 AS INT))")) / 2.0), 6))
      .select("event_id", "user_id", "ts_us", "rolling_median")
      .orderBy("event_id")
  }

  /** Same as-of semantics through the NATIVE custom operator
    * (plans/AsOfJoinNative: resolved LogicalPlan -> planner Strategy ->
    * sort-merge AsOfJoinExec; one exchange per side, single merge pass).
    * Hash-checked against the SAME DuckDB ASOF JOIN oracle shape as
    * `q_asof_join` — two independent implementations, one truth.
    */
  private def qAsofJoinNative(s: SparkSession, dir: String): DataFrame = {
    val ev = withTsUs(tbl(s, dir, "events"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("view_ts"),
        col("event_id").as("view_event_id"))
    graft.plans.AsOfJoinNative
      .asOf(purchases, views, Seq("user_id"), "ts_us", "view_ts")
      .select(purchases("event_id"), purchases("user_id"), col("ts_us"),
        col("view_ts").as("asof_view_ts_us"),
        col("view_event_id").as("asof_view_event_id"))
      .orderBy("event_id")
  }

  /** Per-label embedding centroid via the typed Aggregator UDAF
    * (functions/VectorAggregates.scala) — partial aggregation map-side,
    * O(groups × dim) shuffle. First 4 dims exposed for the oracle.
    */
  private def qCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = tbl(s, dir, "embeddings")
      .select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
    ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(graft.functions.VectorAggregates.centroid(64).name("c"))
      .select(col("key").as("label"),
        round(col("c")(0).cast("double"), 4).as("c0"),
        round(col("c")(1).cast("double"), 4).as("c1"),
        round(col("c")(2).cast("double"), 4).as("c2"),
        round(col("c")(3).cast("double"), 4).as("c3"))
      .orderBy("label")
  }

  /** PER-DIMENSION embedding statistics (mean/variance/min/max for each
    * of the 64 dims) — the profiling pass every whitening/normalization
    * stage needs before touching a vector corpus. Scale shape:
    * `posexplode` is a narrow 64× fan-out, then map-side partial
    * aggregation collapses each partition to ≤64 rows BEFORE the one
    * hash exchange — at 100 TB the shuffle carries O(dims × partitions)
    * rows, never O(rows × dims). Sums are accumulated as exact DECIMAL
    * (float→double is exact, the decimal quantization is fixed), so the
    * result is partitioning- and order-independent and the DuckDB twin
    * hash-matches bit-for-bit; only the final mean/variance arithmetic
    * runs in double, identically on both engines.
    */
  private def qEmbedDimStats(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim", "ef")))
      .select(col("dim").cast("long").as("dim"),
        col("ef").cast("double").as("e"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        sum(col("e").cast("decimal(28,12)")).as("s"),
        sum((col("e") * col("e")).cast("decimal(28,12)")).as("s2"),
        min(col("e")).as("mn"),
        max(col("e")).as("mx"))
      .select(col("dim"), col("n"),
        round(col("s").cast("double") / col("n"), 6).as("mean"),
        round((col("s2").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n")) /
          col("n"), 6).as("variance"),
        round(col("mn"), 6).as("min_v"),
        round(col("mx"), 6).as("max_v"))
      .orderBy("dim")

  /** One fitted PCA basis per testdata dir (the moment pass runs once;
    * every probe reuses the 64×64 model — a fitted model is an
    * artifact, not a per-query cost).
    */
  private val pcaModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.ops.Pca.Model]()

  /** PCA end to end as an ORACLE-CHECKABLE query: fit the full-rank
    * (k=d=64) eigenbasis over the embeddings, project every vector,
    * report the projected squared norm. A complete orthonormal basis is
    * a rotation, so |proj|² must equal the CENTERED squared norm of the
    * raw vector — which DuckDB computes with no eigensolver. A skewed
    * mean, a non-orthogonal basis, or a dropped axis all break the
    * equality; eigenvalue ordering and the projected-variance ==
    * eigenvalue identity are asserted in OpsSpec (not SQL-expressible).
    */
  private def qPcaProject(s: SparkSession, dir: String): DataFrame = {
    val model = pcaModelCache.computeIfAbsent(dir, { d =>
      graft.ops.Pca.fit(tbl(s, d, "embeddings"), "embedding", 64, 64)
    })
    graft.ops.Pca.project(
        tbl(s, dir, "embeddings"), "vec_id", "embedding", model)
      .select(col("vec_id"), round(col("pnorm2"), 4).as("pnorm2"))
      .orderBy("vec_id")
  }

  /** One trained PQ codebook set per testdata dir (8 subspaces × 16
    * codes × 8 dims — a persisted-index-grade artifact, fitted once).
    */
  private val pqModelCache =
    new java.util.concurrent.ConcurrentHashMap[String, graft.ops.Pq.Model]()

  /** PRODUCT QUANTIZATION end to end: fit 8 per-subspace 16-centroid
    * codebooks (2 deterministic Lloyd iterations each), encode every
    * vector to its 8 codes, and report the 9-dp-quantized
    * reconstruction error. The DuckDB twin re-runs the ENTIRE fit —
    * hyperplane init, fixed-point centroid refinement, L2 argmin — as
    * generated CTEs per subspace and must hash-match codes and errors
    * exactly (the q_kmeans replay contract, times eight subspaces).
    */
  private def qVecPq(s: SparkSession, dir: String): DataFrame = {
    val model = pqModelCache.computeIfAbsent(dir, { d =>
      graft.ops.Pq.fit(tbl(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, m = 8, k = 16, iters = 2)
    })
    graft.ops.Pq.encode(tbl(s, dir, "embeddings"), "vec_id", "embedding",
        model)
      .select(col("vec_id"), col("codes"),
        round(col("err2"), 6).as("err2"))
      .orderBy("vec_id")
  }

  /** PQ-ADC approximate nearest neighbors for the vec_id=0 query (the
    * ann_bruteforce convention): rank by sums of per-subspace LUT
    * entries addressed by stored codes — the scan reads the code table,
    * never the vectors. Exact-ANN agreement is OpsSpec's recall check;
    * the oracle twin recomputes the same ADC ranking from its own
    * codebook replay.
    */
  private def qAnnPq(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val model = pqModelCache.computeIfAbsent(dir, { d =>
      graft.ops.Pq.fit(tbl(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, m = 8, k = 16, iters = 2)
    })
    val q = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    val enc = graft.ops.Pq.encode(e, "vec_id", "embedding", model)
    graft.ops.Pq.adcTopK(enc, "vec_id", model, q, 10)
      .select(col("vec_id"),
        round(col("adc").cast("double"), 6).as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
  }

  /** IVF-PQ composed ANN (coarse hyperplane/centroid pruning to 3 of 8
    * lists, then ADC over survivors' codes) — the full billion-scale
    * layout as one oracle-checked gate.
    */
  private def qAnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val model = pqModelCache.computeIfAbsent(dir, { d =>
      graft.ops.Pq.fit(tbl(s, d, "embeddings"), "vec_id", "embedding",
        dim = 64, m = 8, k = 16, iters = 2)
    })
    val q = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    graft.ops.Pq.ivfAdcTopK(e, "vec_id", "embedding", model,
        numPlanes = 3, nProbe = 3, q, 10)
      .select(col("vec_id"),
        round(col("adc").cast("double"), 6).as("adc_dist"))
      .orderBy(col("adc_dist"), col("vec_id"))
  }

  /** The generated DuckDB replay of [[qVecPq]]: shared hyperplane
    * chain, then per subspace s (element offset 8·s) the init-bucket,
    * two (sums → centroids → distances → argmin) rounds, and a final
    * 8-way join emitting codes + the decimal-summed distortion.
    */
  private lazy val pqOracles: (String, String, String) = {
    import Duck.{mix64, rint, toU}
    val (numPlanes, subDim, m, k) = (4, 8, 8, 16)
    def foldOff(a: String, off: Int, b: String): String =
      s"list_reduce(list_transform(range(1, $subDim + 1), " +
        s"i -> CAST($a[i + $off] AS DOUBLE) * CAST($b[i] AS DOUBLE)), " +
        "(x, y) -> x + y)"
    def foldSelfOff(a: String, off: Int): String =
      s"list_reduce(list_transform(range(1, $subDim + 1), " +
        s"i -> CAST($a[i + $off] AS DOUBLE) * CAST($a[i + $off] AS DOUBLE)), " +
        "(x, y) -> x + y)"
    def foldSelf(a: String): String =
      s"list_reduce(list_transform(range(1, $subDim + 1), " +
        s"i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), " +
        "(x, y) -> x + y)"
    def sub(s: Int): String = {
      val o = s * subDim
      def round_(i: Int, prev: String): String =
        s"""r${i}_$s AS (SELECT b.list_id AS list_id, d.i AS dim,
               SUM(CAST(${rint(s"CAST(e.embedding[d.i + $o] AS DOUBLE) * 16777216.0")}
                 AS BIGINT)) AS sm,
               COUNT(*) AS n
             FROM embeddings e
             JOIN $prev b USING (vec_id),
             range(1, $subDim + 1) d(i)
             GROUP BY b.list_id, d.i),
         c${i}_$s AS (SELECT list_id,
               list(CAST((CAST(sm AS DOUBLE) / n) / 16777216.0 AS REAL)
                 ORDER BY dim) AS c
             FROM r${i}_$s GROUP BY list_id),
         s${i}_$s AS (SELECT e.vec_id, c.list_id,
               ${foldSelfOff("e.embedding", o)}
                 - 2.0 * ${foldOff("e.embedding", o, "c.c")}
                 + ${foldSelf("c.c")} AS d2
             FROM embeddings e, c${i}_$s c),
         a${i}_$s AS (SELECT vec_id, list_id, d2 FROM (
             SELECT vec_id, list_id, d2,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY d2, list_id) AS rn
             FROM s${i}_$s) WHERE rn = 1)"""
      s"""a0_$s AS (SELECT e.vec_id,
               CAST(SUM(CASE WHEN ${foldOff("e.embedding", o, "pl.v")} >= 0
                   THEN 1 << p ELSE 0 END) AS INTEGER) % $k AS list_id
             FROM embeddings e, pl GROUP BY e.vec_id),
         ${round_(1, s"a0_$s")},
         ${round_(2, s"a1_$s")}"""
    }
    val subs = (0 until m).map(sub).mkString(",\n         ")
    val codes = (0 until m)
      .map(s => s"CAST(a2_$s.list_id AS VARCHAR)")
      .mkString(" || '-' || ")
    val err = (0 until m)
      .map(s => s"CAST(round(a2_$s.d2, 9) AS DECIMAL(28,9))")
      .mkString(" + ")
    val joins = (1 until m)
      .map(s => s"JOIN a2_$s ON a2_0.vec_id = a2_$s.vec_id")
      .mkString(" ")
    val prefix =
      s"""WITH RECURSIVE chain(p, i, h) AS (
           SELECT p, 0, ${mix64("19088743 + p")}
           FROM range(0, $numPlanes) t(p)
           UNION ALL
           SELECT p, i + 1, ${mix64("h")} FROM chain WHERE i < $subDim),
         planes AS (SELECT p, i - 1 AS dim,
               CAST(CAST((${toU("h")} // 2048) AS DOUBLE)
                 / 9007199254740992.0 - 0.5 AS REAL) AS pv
             FROM chain WHERE i >= 1),
         pl AS (SELECT p, list(pv ORDER BY dim) AS v FROM planes GROUP BY p),
         $subs"""
    val main =
      s"""$prefix
       SELECT a2_0.vec_id, $codes AS codes,
         round(CAST(($err) AS DOUBLE), 6) AS err2
       FROM a2_0 $joins ORDER BY a2_0.vec_id"""
    // ADC twin: per-subspace LUT of query-to-centroid distances over
    // the SAME replayed codebooks, summed via the stored assignments.
    def qFoldOff(off: Int, b: String): String =
      s"list_reduce(list_transform(range(1, $subDim + 1), " +
        s"i -> CAST(q.qv[i + $off] AS DOUBLE) * CAST($b[i] AS DOUBLE)), " +
        "(x, y) -> x + y)"
    def qFoldSelfOff(off: Int): String =
      s"list_reduce(list_transform(range(1, $subDim + 1), " +
        s"i -> CAST(q.qv[i + $off] AS DOUBLE) * CAST(q.qv[i + $off] AS DOUBLE)), " +
        "(x, y) -> x + y)"
    val luts = (0 until m).map { s =>
      val o = s * subDim
      s"""l_$s AS (SELECT c.list_id,
             ${qFoldSelfOff(o)} - 2.0 * ${qFoldOff(o, "c.c")}
               + ${foldSelf("c.c")} AS d
           FROM c2_$s c CROSS JOIN q)"""
    }.mkString(",\n         ")
    val lutJoins = (0 until m)
      .map(s => s"JOIN l_$s ON a2_$s.list_id = l_$s.list_id")
      .mkString(" ")
    val adcSum = (0 until m)
      .map(s => s"CAST(round(l_$s.d, 9) AS DECIMAL(28,9))")
      .mkString(" + ")
    val adc =
      s"""$prefix,
         q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         $luts
       SELECT a2_0.vec_id,
         round(CAST(($adcSum) AS DOUBLE), 6) AS adc_dist
       FROM a2_0 $joins $lutJoins
       ORDER BY adc_dist, a2_0.vec_id LIMIT 10"""
    // IVF-PQ twin: the composed billion-scale layout — an IVF coarse
    // layer (the ann_ivf replay, CTEs renamed i_*) prunes candidates to
    // the query's nProbe lists, then the SAME ADC ranking runs over the
    // survivors only.
    val ivfPq = {
      val (ivfPlanes, ivfProbe) = (3, 3)
      def fullFold(a: String, b: String): String = Duck.foldDot(a, b, 64)
      s"""$prefix,
         q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         $luts,
         i_chain(p, i, h) AS (
           SELECT p, 0, ${mix64("19088743 + p")}
           FROM range(0, $ivfPlanes) t(p)
           UNION ALL
           SELECT p, i + 1, ${mix64("h")} FROM i_chain WHERE i < 64),
         i_planes AS (SELECT p, i - 1 AS dim,
               CAST(CAST((${toU("h")} // 2048) AS DOUBLE)
                 / 9007199254740992.0 - 0.5 AS REAL) AS pv
             FROM i_chain WHERE i >= 1),
         i_pl AS (SELECT p, list(pv ORDER BY dim) AS v
             FROM i_planes GROUP BY p),
         i_init AS (SELECT e.vec_id,
               CAST(SUM(CASE WHEN ${fullFold("e.embedding", "i_pl.v")} >= 0
                   THEN 1 << p ELSE 0 END) AS INTEGER) AS list0
             FROM embeddings e, i_pl GROUP BY e.vec_id),
         i_rsum AS (SELECT b.list0 AS list_id, d.i AS dim,
               SUM(CAST(${rint("CAST(e.embedding[d.i] AS DOUBLE) * 16777216.0")}
                 AS BIGINT)) AS s,
               COUNT(*) AS n
             FROM embeddings e
             JOIN i_init b USING (vec_id),
             range(1, 65) d(i)
             GROUP BY b.list0, d.i),
         i_cl AS (SELECT list_id,
               list(CAST((CAST(s AS DOUBLE) / n) / 16777216.0 AS REAL)
                 ORDER BY dim) AS c
             FROM i_rsum GROUP BY list_id),
         i_scores AS (SELECT e.vec_id, i_cl.list_id,
               CASE WHEN ${fullFold("e.embedding", "e.embedding")} = 0
                      OR ${fullFold("i_cl.c", "i_cl.c")} = 0 THEN 0.0
                    ELSE ${fullFold("e.embedding", "i_cl.c")}
                      / sqrt(${fullFold("e.embedding", "e.embedding")}
                        * ${fullFold("i_cl.c", "i_cl.c")}) END AS cos
             FROM embeddings e, i_cl),
         i_assign AS (SELECT vec_id, list_id FROM (
             SELECT vec_id, list_id,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, list_id) AS rn
             FROM i_scores) WHERE rn = 1),
         i_qlists AS (SELECT list_id FROM i_scores WHERE vec_id = 0
           ORDER BY cos DESC, list_id LIMIT $ivfProbe)
       SELECT a2_0.vec_id,
         round(CAST(($adcSum) AS DOUBLE), 6) AS adc_dist
       FROM a2_0 $joins $lutJoins
       JOIN i_assign ON a2_0.vec_id = i_assign.vec_id
       JOIN i_qlists ON i_assign.list_id = i_qlists.list_id
       ORDER BY adc_dist, a2_0.vec_id LIMIT 10"""
    }
    (main, adc, ivfPq)
  }
  private def vecPqOracleSql: String = pqOracles._1
  private def annPqOracleSql: String = pqOracles._2
  private def annIvfPqOracleSql: String = pqOracles._3

  // ------------------------------------------------------------------
  // Text analysis extensions (training-data pipeline ops)
  // ------------------------------------------------------------------

  /** Per-doc text statistics (token counts, punctuation, word length). */
  private def qTextStats(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(split(trim(col("text")), "[ \\t\\n]+")).as("n_tokens_ws"),
        length(regexp_replace(col("text"), "[^.!?,;:]", "")).as("n_punct"),
        round(
          length(regexp_replace(col("text"), "[ \\t\\n]", "")).cast("double") /
            size(split(trim(col("text")), "[ \\t\\n]+")),
          6).as("avg_word_len"))
      .orderBy("doc_id")

  /** Exact-dup fingerprint: md5 over text, group stats (dedup base). */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy("content_hash")

  // ------------------------------------------------------------------
  // Dedup / similarity / profiling / multimodal extensions
  // ------------------------------------------------------------------

  /** Marker words appended to build deterministic near-duplicates for the
    * dedup_ngram oracle (each doc compared against itself + this suffix).
    */
  private val NearDupSuffix = " zulu yankee qoph"

  /** MinHash+LSH near-dup detection on the REAL documents (the synthetic
    * corpus plants ~24 near-dup pairs at trigram-Jaccard 0.9-0.99; the
    * next-densest pair sits below 0.2). LSH proposes candidates (est
    * threshold 0.35 — recall for j>=0.9 is 1-1e-15), exact shingle
    * Jaccard >= 0.5 confirms — which the oracle replicates by brute-force
    * all-pairs trigram Jaccard (feasible at oracle scale only; the Spark
    * side never goes all-pairs).
    */
  private def qDedupMinhash(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup
      .minHashPairs(
        tbl(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", threshold = 0.35)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  /** SimHash near-dup pairs on the real documents. Hamming<=3 over a
    * 64-bit word-feature fingerprint is not SQL-expressible → rows-only
    * check here; recall/precision asserted in DedupSpec.
    */
  private def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup
      .simHashPairs(
        tbl(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", maxHamming = 3)
      .orderBy("doc_a", "doc_b")

  /** Exact word-trigram Jaccard: each doc vs itself + appended marker
    * words — nonzero, per-doc-varying values the DuckDB oracle replicates
    * with list algebra.
    */
  private def qDedupNgram(s: SparkSession, dir: String): DataFrame = {
    val sh = udf((t: String) => graft.ops.Dedup.shingles(t, 3))
    val jac = udf((a: Array[Long], b: Array[Long]) =>
      graft.ops.Dedup.jaccard(a, b))
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        round(jac(sh(col("text")),
          sh(concat(col("text"), lit(NearDupSuffix)))), 6).as("jaccard"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-dup via hyperplane LSH over planted vector
    * copies (embeddings table is 64-dim; max off-diagonal cosine in the
    * synthetic data ≈0.46, so threshold 0.95 isolates the planted pairs).
    */
  private def qNearDupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val planted = e.unionAll(e.select((col("vec_id") + 100000).as("vec_id"),
      col("embedding")))
    graft.ops.Dedup
      .embeddingNearDup(planted, "vec_id", "embedding",
        threshold = 0.95, dim = 64)
      .select("doc_a", "doc_b")
      .orderBy("doc_a", "doc_b")
  }

  /** Near-dup CLUSTERING: the step downstream of pair generation every
    * dedup pipeline needs — minhash pairs → distributed connected
    * components (ops/ConnectedComponents: min-label propagation,
    * converges in O(diameter) rounds) → one canonical keeper per
    * component across ALL documents (singletons keep themselves). The
    * oracle replays the components with a recursive-CTE transitive
    * closure over the same brute-force pair set.
    */
  private def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
    val pairs = graft.ops.Dedup
      .minHashPairs(docs, "doc_id", "text", threshold = 0.35)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
    graft.ops.ConnectedComponents
      .canonicalize(docs, "doc_id", pairs, "doc_a", "doc_b")
      .orderBy("doc_id")
  }

  /** The END-TO-END training-data prep pipeline in one plan — what a
    * user actually runs over a crawl: near-dup clustering keeps one
    * canonical doc per component, then language + quality gates, then
    * the token count the chunker budgets against. Composes
    * Dedup.minHashPairs → ConnectedComponents.canonicalize →
    * TextAnalysis.{langId, qualityScore, tokenCountBpeish}; the oracle
    * replays every stage in DuckDB (recursive-CTE closure + list
    * algebra).
    */
  private def qPipelineE2e(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
    val pairs = graft.ops.Dedup
      .minHashPairs(docs, "doc_id", "text", threshold = 0.35)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
    val canon = graft.ops.ConnectedComponents
      .canonicalize(docs, "doc_id", pairs, "doc_a", "doc_b")
    docs.join(canon, "doc_id")
      .filter(col("is_canonical"))
      .withColumn("lang_pred", graft.ops.TextAnalysis.langId(col("text")))
      .withColumn("quality", graft.ops.TextAnalysis.qualityScore(col("text")))
      .filter(col("lang_pred") === "en" && col("quality") >= 0.5)
      .select(col("doc_id"), col("quality"),
        graft.ops.TextAnalysis.tokenCountBpeish(col("text"))
          .as("n_tokens_bpeish"))
      .orderBy("doc_id")
  }

  /** Fuzzy self-join: customers whose names differ by at most one edit
    * (ops/FuzzyJoin — exact-recall symmetric-delete blocking + banded
    * levenshtein verify). The oracle brute-forces all pairs; the Spark
    * side never does.
    */
  private def qDedupFuzzy(s: SparkSession, dir: String): DataFrame =
    graft.ops.FuzzyJoin
      .pairsWithin1(
        tbl(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name")
      .orderBy("id_a", "id_b")

  /** Brute-force cosine top-10 against the vec_id=0 vector (exact ANN
    * baseline; pure Column math, no UDF).
    */
  private def qAnnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    graft.ops.Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 10)
      .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** LSH-bucket-pruned approximate top-10 (recall measured in
    * SimilaritySpec; not SQL-expressible → rows-only check).
    */
  private def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    graft.ops.Similarity
      .lshTopK(e, "vec_id", "embedding", q, 10,
        numPlanes = 8, probeHamming = 3, dim = 64)
      .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** Matryoshka two-stage ANN (ops/Similarity.matryoshkaTopK): coarse
    * rank on the first 16 of 64 dims (implicitly renormalized by the
    * cosine), candidate cut at 50, full-dim rerank to top-10 — the
    * adaptive-retrieval recipe. Both cuts rank on the 4dp-rounded score
    * with the id tiebreak, so the ORACLE replays both stages, slicing
    * the DOUBLE-cast list to 16 elements for the coarse cosine.
    */
  private def qAnnMatryoshka(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    graft.ops.Similarity.matryoshkaTopK(
      e, "vec_id", "embedding", q, k = 10, coarseDim = 16, candidates = 50)
  }

  /** Root for gate-built persisted fixtures (indexes, streamed state,
    * delta logs): `spark.graft.scratch` — a shared-FS/object-store URI on
    * a real cluster; java.io.tmpdir covers local mode. All IO against it
    * goes through the Hadoop FileSystem of the URI, never java.io.File,
    * so the same gate code runs unchanged against hdfs://... or s3a://...
    */
  private def scratchRoot(s: SparkSession): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      s.conf.getOption("spark.graft.scratch")
        .getOrElse(sys.props("java.io.tmpdir")))

  /** Fresh unique directory under the scratch root (Hadoop FS mkdirs) —
    * the scratch-URI replacement for Files.createTempDirectory in gate
    * data paths.
    */
  private def scratchTempDir(s: SparkSession, prefix: String): String = {
    val p = new org.apache.hadoop.fs.Path(scratchRoot(s),
      s"${prefix}_${java.util.UUID.randomUUID.toString.take(12)}")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).mkdirs(p)
    p.toString
  }

  /** WRITE-ONCE build of a persisted gate fixture under the scratch URI —
    * the same pattern as [[writtenTfTable]]: the path is keyed by the
    * build signature + the source table's file manifest (regenerated
    * input ⇒ fresh key ⇒ fresh build), the build runs only when the
    * completion marker is absent, and an interrupted build (no marker)
    * is retried, never trusted.
    */
  private def scratchBuildOnce(
      s: SparkSession, sig: String, srcTable: String, dir: String)(
      build: String => Unit): String = {
    import org.apache.hadoop.fs.Path
    val hconf = s.sparkContext.hadoopConfiguration
    val src = new Path(s"$dir/$srcTable.parquet")
    val manifest = src.getFileSystem(hconf).listStatus(src)
      .sortBy(_.getPath.getName)
      .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .mkString("|")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sig|$dir|$manifest"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    val p = new Path(scratchRoot(s), s"graft_${sig}_$key")
    val fs = p.getFileSystem(hconf)
    val marker = new Path(p, "_GRAFT_COMPLETE")
    if (!fs.exists(marker)) {
      build(p.toString)
      fs.create(marker, true).close()
    }
    p.toString
  }

  /** One LSH-bucketed parquet layout per testdata dir (written once,
    * probed by every invocation — mirrors a persisted 100 TB index).
    */
  private val lshIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Partition-pruned ANN probe over the PERSISTED LSH layout
    * (Similarity.writeLshIndex / lshTopKIndexed): the hamming predicate
    * binds to the bucket partition column, so the scan reads only the
    * probed directories — the true at-scale path, vs ann_lsh's
    * filter-over-full-scan. Pruning is asserted mechanically in OpsSpec.
    */
  private def qAnnLshIndexed(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val idx = lshIndexCache.computeIfAbsent(dir, { d =>
      scratchBuildOnce(s, "lsh_index_p8", "embeddings", d) { p =>
        graft.ops.Similarity.writeLshIndex(
          tbl(s, d, "embeddings"), "vec_id", "embedding", p,
          numPlanes = 8, dim = 64)
      }
    })
    val q = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    graft.ops.Similarity
      .lshTopKIndexed(s, idx, q, 10, numPlanes = 8, probeHamming = 3)
      .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
  }

  private val annIncrCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Incremental ANN ingest (ops/Similarity.appendToLshIndex): the index
    * is built once over vec_id >= 20, then the "new batch" (vec_id < 20)
    * is APPENDED — O(batch), nothing rewritten; the probe for vector 0
    * must find the appended self-match through the same partition-pruned
    * scan. Rows-only driver check; append/prune invariants in OpsSpec.
    */
  private def qAnnIncremental(s: SparkSession, dir: String): DataFrame = {
    val idx = annIncrCache.computeIfAbsent(dir, { d =>
      scratchBuildOnce(s, "lsh_incr_p8", "embeddings", d) { p =>
        val e0 = tbl(s, d, "embeddings")
        graft.ops.Similarity.writeLshIndex(
          e0.filter(col("vec_id") >= 20), "vec_id", "embedding", p,
          numPlanes = 8, dim = 64)
        graft.ops.Similarity.appendToLshIndex(
          e0.filter(col("vec_id") < 20), "vec_id", "embedding", p,
          numPlanes = 8, dim = 64)
      }
    })
    val q = tbl(s, dir, "embeddings").filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    graft.ops.Similarity
      .lshTopKIndexed(s, idx, q, 10, numPlanes = 8, probeHamming = 3)
      .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** IVF-pruned approximate top-10 (coarse quantizer + nProbe lists;
    * recall vs brute force measured in OpsSpec → rows-only check).
    */
  private def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    graft.ops.Similarity
      .ivfTopK(e, "vec_id", "embedding", q, 10,
        nLists = 8, nProbe = 3, dim = 64)
      .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** One persisted IVF layout (centroids live WITH the index) per
    * testdata dir. */
  private val ivfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Partition-pruned ANN probe over the PERSISTED IVF layout
    * (Similarity.writeIvfIndex / ivfTopKIndexed): the probe list ids bind
    * to the list_id partition column, so only nProbe/nLists of the
    * corpus directories are read — the IVF sibling of ann_lsh_indexed.
    */
  private def qAnnIvfIndexed(s: SparkSession, dir: String): DataFrame = {
    val idx = ivfIndexCache.computeIfAbsent(dir, { d =>
      scratchBuildOnce(s, "ivf_index_l8", "embeddings", d) { p =>
        graft.ops.Similarity.writeIvfIndex(
          tbl(s, d, "embeddings"), "vec_id", "embedding", p,
          nLists = 8, dim = 64)
      }
    })
    val q = tbl(s, dir, "embeddings").filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    graft.ops.Similarity
      .ivfTopKIndexed(s, idx, q, 10, nProbe = 3)
      .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** Distributed k-means (full Lloyd loop — ops/Clustering): k=8, two
    * iterations, 64-dim embeddings. Deterministic end to end (hyperplane
    * init, fixed-point centroid means, first-seen argmax), so the DuckDB
    * oracle replays BOTH Lloyd rounds and hash-matches cluster sizes and
    * exact Float32 centroid components.
    */
  private def qKmeans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (assigned, centroids) = graft.ops.Clustering.kMeans(
      tbl(s, dir, "embeddings"), "vec_id", "embedding",
      k = 8, maxIters = 2, tol = 0.0, dim = 64)
    val counts = assigned.groupBy("list_id").agg(count(lit(1)).as("n"))
    val cents = centroids.toSeq
      .map { case (id, c) => (id, c(0).toDouble, c(1).toDouble) }
      .toDF("list_id", "c0", "c1")
    counts.join(cents, Seq("list_id"))
      .select(col("list_id").cast("int").as("cluster"),
        col("n"), col("c0"), col("c1"))
      .orderBy("cluster")
  }

  /** Inverted index build — the retrieval artifact downstream of the TF
    * pipeline: per term, document frequency + a CAPPED sorted posting
    * list. The cap is applied BEFORE any aggregation buffer exists:
    * `row_number() OVER (PARTITION BY w ORDER BY doc_id) <= 10` runs as
    * WindowGroupLimit (per-partition bounded heaps below the exchange —
    * the same two-phase shape as q_weighted_sample), so a stopword's
    * postings are at most 10 rows per task and 10 rows per word after the
    * shuffle — never the full corpus in one collect_list buffer. df is a
    * separate count aggregate over the uncapped pairs (map-side partial
    * combine, O(1) state per word), joined back on the word key.
    * PlanSpec asserts the WindowGroupLimit shape stays in the plan.
    */
  private def qInvertedIndex(s: SparkSession, dir: String): DataFrame = {
    val pairs = tbl(s, dir, "documents")
      .select(col("doc_id"), explode(expr(tokensSql)).as("w"))
      .distinct()
    val capped = pairs
      .withColumn("rn",
        row_number().over(Window.partitionBy("w").orderBy("doc_id")))
      .filter(col("rn") <= 10)
      .groupBy("w")
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id"))))
        .as("postings"))
    val dfreq = pairs.groupBy("w").agg(count(lit(1)).as("df"))
    dfreq.join(capped, Seq("w"))
      .select(col("w"), col("df"), col("postings"))
      .orderBy("w")
  }

  /** Weighted per-source sampling (ops/Sampling — Efraimidis–Spirakis
    * A-ES): 5 docs per source, inclusion proportional to n_chars — the
    * corpus-mixing "sample proportional to token budget within each
    * domain" step, deterministic via hash-uniforms so the oracle replays
    * the exact sample.
    */
  private def qWeightedSample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling
      .weightedSamplePerGroup(
        tbl(s, dir, "documents"), "source", "doc_id", "n_chars", 5)
      .select(col("source"), col("doc_id"),
        col("sample_key"), col("sample_rank"))
      .orderBy("source", "sample_rank")

  /** Deterministic train/val/test split (ops/Sampling.splitAssign):
    * membership is a pure function of (seed, doc_id) — held-out sets
    * never migrate between runs or engines. 90/5/5 at seed 42; the
    * oracle recomputes the same md5-uniform thresholding.
    */
  private def qSplitAssign(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling
      .splitAssign(tbl(s, dir, "documents"), "doc_id", seed = 42L,
        trainFrac = 0.9, valFrac = 0.05)
      .select(col("doc_id"), col("split_u"), col("split"))
      .orderBy("doc_id")

  /** LEAKAGE-SAFE train/val/test split: near-duplicates must not
    * straddle the train/eval boundary (a near-copy of a training doc in
    * the test set is contamination the doc-id split can't see). Pairs →
    * connected components (the dedup_clusters construction, whose LSH
    * pair set provably equals the brute-force trigram-Jaccard truth on
    * this corpus) → split assigned by hashing the COMPONENT id, so every
    * member of a component lands in the same split. The oracle composes
    * the recursive-CTE closure with the md5-fold split hash on the
    * component.
    */
  private def qLeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
    val pairs = graft.ops.Dedup
      .minHashPairs(docs, "doc_id", "text", threshold = 0.35)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
    val comp = graft.ops.ConnectedComponents
      .canonicalize(docs, "doc_id", pairs, "doc_a", "doc_b")
    graft.ops.Sampling
      .splitAssign(comp.select(col("doc_id"), col("component")),
        "component", seed = 42L, trainFrac = 0.9, valFrac = 0.05)
      .select(col("doc_id"), col("component"), col("split"))
      .orderBy("doc_id")
  }

  /** KMV vocabulary-overlap sketches between language slices
    * (ops/Sketch): one corpus scan builds a k=128 k-minimum-values
    * sketch of each lang's distinct token set; every pairwise
    * Jaccard/union/intersection estimate then runs on #langs × 128 rows.
    * Fully deterministic (FNV-1a + unsigned-order top-k), so the oracle
    * replays the sketches AND the estimates exactly — the estimator is
    * graded on reproducibility here; its accuracy bound is spec'd in
    * OpsSpec against exact distinct counts.
    */
  private def qKmvOverlap(s: SparkSession, dir: String): DataFrame = {
    val toks = tbl(s, dir, "documents")
      .select(col("lang"), explode(expr(tokensSql)).as("w"))
    graft.ops.Sketch.kmvOverlap(toks, "lang", "w", k = 128)
      .orderBy("grp_a", "grp_b")
  }

  /** STREAMED KMV sketch maintenance: the per-lang vocabulary sketches
    * of [[qKmvOverlap]] kept current by a real streaming query — each
    * micro-batch's sketch merges into a TxnTable-stored state
    * (Sketch.mergeSketches; KMV merge is associative/commutative/
    * idempotent, so arrival order cannot change the result) behind the
    * file-backed committed-batch high-water mark (exactly-once under
    * replay). Per batch the work is O(batch tokens) + O(groups × k);
    * the corpus is never rescanned. The final state's distinct
    * estimates must equal the one-shot batch sketch — the oracle
    * replays that directly.
    */
  private def qDocsStreamKmv(s: SparkSession, dir: String): DataFrame = {
    val schema = tbl(s, dir, "documents").schema
    val work = scratchTempDir(s, "graft_kmv_stream")
    val tblRoot = s"$work/sketch_tbl"
    val sink = graft.streaming.StreamingEmbed.idempotentSink(
      (batch: DataFrame, _: Long) => {
        val toks = batch.select(col("lang"), explode(expr(tokensSql)).as("w"))
        val newSk = graft.ops.Sketch.kmvSketch(toks, "lang", "w", 128)
        if (graft.table.TxnTable.latestVersion(s, tblRoot).isEmpty) {
          graft.table.TxnTable.create(s, tblRoot, newSk)
        } else {
          val cur = graft.table.TxnTable.snapshot(s, tblRoot)
          graft.table.TxnTable.overwrite(s, tblRoot,
            graft.ops.Sketch.mergeSketches(cur, newSk, 128))
        }
        ()
      },
      graft.streaming.StreamingEmbed.hadoopHighWaterMark(
        s.sparkContext.hadoopConfiguration, s"$work/hwm"))
    val stream = s.readStream.schema(schema)
      .parquet(docsStreamDir(dir).toString)
    runStream(s) {
      stream.writeStream
        .outputMode("append")
        .foreachBatch(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    graft.ops.Sketch
      .distinctEstOf(graft.table.TxnTable.snapshot(s, tblRoot), 128)
      .orderBy("grp")
  }

  /** FUZZY benchmark decontamination: q_contamination's 8-gram overlap
    * misses paraphrased/lightly-edited leaks — this pass finds
    * NEAR-duplicate (trigram Jaccard ≥ 0.5) pairs straddling the
    * held-out slice (doc_id % 50 = 0) and the train slice, via the same
    * banded MinHash LSH + exact-verify plan as dedup_clusters (never
    * all-pairs). Output: each contaminated (bench, train) pair with its
    * exact Jaccard; the oracle brute-forces the cross-slice pairs.
    */
  private def qContaminationFuzzy(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
    graft.ops.Dedup
      .minHashPairs(docs, "doc_id", "text", threshold = 0.35)
      .filter(col("jaccard") >= 0.5)
      .select(
        when(col("doc_a") % 50 === 0, col("doc_a"))
          .otherwise(col("doc_b")).as("bench_id"),
        when(col("doc_a") % 50 === 0, col("doc_b"))
          .otherwise(col("doc_a")).as("train_id"),
        round(col("jaccard"), 6).as("jaccard"))
      .filter(col("bench_id") % 50 === 0 && !(col("train_id") % 50 === 0))
      .orderBy("bench_id", "train_id")
  }

  /** CURRICULUM data mixing: bucket the corpus into length deciles and
    * keep each doc with probability decile/10 (longer docs sampled more
    * — the ramped-difficulty curriculum recipe; any per-bucket rate
    * schedule slots in). Scale shape: decile BOUNDARIES come from one
    * exact-percentile aggregate broadcast back — assignment is a
    * comparison against 9 broadcast values, NOT a global ntile window
    * (a SinglePartition rank over 100 TB). Keeps are the deterministic
    * splitAssign hash-uniform, so the oracle replays the whole
    * schedule: quantile_cont boundaries, bucket-by-comparison, md5-fold
    * keep decision.
    */
  private def qCurriculumMix(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("n_chars"))
    val bounds = docs.agg(expr(
      "percentile(n_chars, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
      .as("bs"))
    val bucketed = docs.crossJoin(broadcast(bounds))
      .withColumn("decile",
        (lit(1) + expr("size(filter(bs, b -> n_chars > b))")).cast("int"))
    graft.ops.Sampling
      .splitAssign(bucketed, "doc_id", seed = 7L,
        trainFrac = 0.5, valFrac = 0.25)
      .withColumn("keep", col("split_u") < col("decile") / lit(10.0))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1).otherwise(0)).as("n_kept"))
      .orderBy("decile")
  }

  /** Temperature-scaled source mixing (ops/Sampling.temperatureMix,
    * alpha = 0.3 — the standard "upsample the tail domain" setting):
    * one corpus scan → #sources rows with raw share, temperature share,
    * and sampler boost. The oracle replays the power-law algebra.
    */
  private def qDomainMix(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling
      .temperatureMix(tbl(s, dir, "documents"), "source", alpha = 0.3)
      .orderBy("source")

  /** Deterministic epoch shuffle + shard assignment
    * (ops/Sampling.epochShard): `mix64(doc_id XOR seed)` hashes each doc
    * to one of 8 shards, position = hash rank within the shard — a
    * global permutation without a global sort (one uniform shard-keyed
    * shuffle + per-shard sort). The oracle replays the splitmix64
    * finalizer in HUGEINT arithmetic.
    */
  private def qEpochShuffle(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling
      .epochShard(tbl(s, dir, "documents"), "doc_id", seed = 7L,
        nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")

  /** Semantic dedup with retention (ops/Dedup.semanticDedup — the
    * SemDeDup recipe): embedding-LSH near-dup pairs → connected
    * components → keep the minimum id per component. Every third vector
    * is planted as an exact duplicate (id + 100000), the same corpus
    * construction the neardup_embedding gate proves finds exactly the
    * planted pairs and nothing else at threshold 0.95 — so components
    * and keepers are fully determined and the oracle states them.
    */
  private def qSemDedup(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val planted = e.unionAll(
      e.filter(col("vec_id") % 3 === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
    graft.ops.Dedup
      .semanticDedup(planted, "vec_id", "embedding",
        threshold = 0.95, dim = 64)
      .orderBy("vec_id")
  }

  /** Gopher-rule quality filter (ops/TextAnalysis.gopherRules): per-rule
    * audit flags + statistics + the conjunction, one narrow codegen'd
    * projection. The oracle replays the flat integer algebra.
    */
  private def qGopherRules(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        graft.ops.TextAnalysis.gopherRules(col("text")).as("g"))
      .select(col("doc_id"), col("g.*"))
      .orderBy("doc_id")

  /** Hard-negative mining for retrieval training (the contrastive-pair
    * step downstream of embedding: per query, the top-k most similar
    * corpus vectors with a DIFFERENT label — near-misses the loss
    * learns the most from). Broadcast probe set × one corpus scan,
    * WindowGroupLimit top-k on the rounded cosine + id (the repo-wide
    * deterministic-ranking contract); at 100 TB the probe side stays
    * the broadcast-sized set by construction.
    */
  private def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.CosineSimilarity.register(s)
    val e = tbl(s, dir, "embeddings")
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("label").as("own_label"),
        col("embedding").as("qv"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("nbr_id"), col("label").as("nbr_label"),
        col("embedding").as("nv"))
    val scored = corpus.crossJoin(broadcast(probes))
      .filter(col("nbr_label") =!= col("own_label"))
      .select(col("probe_id"), col("nbr_id"),
        round(graft.functions.CosineSimilarity
          .cosine(col("nv"), col("qv")), 4).as("cos4"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos4").desc, col("nbr_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("probe_id", "rnk", "nbr_id", "cos4")
      .orderBy("probe_id", "rnk")
  }

  /** C4-style duplicate-span removal (ops/Dedup.spanDedup): every
    * 3-word span keeps only its globally first occurrence, documents are
    * reassembled from the survivors. Two keyed shuffles (span text, then
    * doc id); the first-occurrence flag is a streaming row_number. The
    * oracle replays tokenize → span cut → window rank → ordered
    * string_agg in pure SQL.
    */
  private def qSpanDedup(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.spanDedup(
      tbl(s, dir, "documents"), "doc_id", "text", spanWords = 3)
      .orderBy("doc_id")

  /** Stopword-ratio language ID (SQL-expressible heuristic). */
  private def qLangId(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        graft.ops.TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  /** Composite quality score. */
  private def qQualityScore(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        graft.ops.TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Tokenizer + fingerprint profile (engine kernels → rows-only check). */
  private def qTextProfile(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        graft.ops.TextAnalysis.tokenCountBpeish(col("text"))
          .as("n_tokens_bpeish"))
      .orderBy("doc_id")

  /** Winnowing fingerprint surface (Schleimer et al. rolling-hash
    * kernel). Oracle-checked: the FNV-1a fold is replicated in DuckDB
    * with HUGEINT mod-2^64 arithmetic (signed xor is bit-identical to
    * Java's), the per-window minima in list algebra — every distinct-min
    * count hash-matches.
    */
  private def qFingerprintStats(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        size(graft.ops.TextAnalysis.fingerprintUdf(col("text")))
          .as("n_fingerprint"))
      .orderBy("doc_id")

  /** REAL PNG per document — the fixture formulas live here AND in the
    * DuckDB oracles, so the decode kernels are checked against ground
    * truth known by construction: gradient red channel (pixel traversal
    * matters), constant green/blue, dimensions a function of doc_id.
    */
  private val synthPngUdf = udf { id: Long =>
    val w = 8 + (id % 24).toInt
    val h = 8 + ((id * 7) % 24).toInt
    graft.ops.Multimodal.encodePng(w, h, (x, y) =>
      (((x.toLong * y + id) % 256).toInt,
        ((id * 3) % 256).toInt, ((id * 7) % 256).toInt))
  }

  /** Real JPEG bytes (JVM-shipped writer), same dimension formula as the
    * PNG fixture. Lossy: the gate checks header metadata + decode
    * success for these rows, never decoded sums.
    */
  private val synthJpegUdf = udf { id: Long =>
    val w = 8 + (id % 24).toInt
    val h = 8 + ((id * 7) % 24).toInt
    graft.ops.Multimodal.encodeJpeg(w, h, (x, y) =>
      (((x.toLong * y + id) % 256).toInt,
        ((id * 3) % 256).toInt, ((id * 7) % 256).toInt))
  }

  /** `GFRM` container of real solid-color PNG frames (2..6 per doc). */
  private val synthFramesUdf = udf { id: Long =>
    val nf = 2 + (id % 5).toInt
    graft.ops.Multimodal.encodeFrameContainer((0 until nf).map { k =>
      graft.ops.Multimodal.encodePng(8, 8, (_, _) =>
        (((id + 37L * k) % 256).toInt, ((id * 5 + k) % 256).toInt,
          ((k * 11) % 256).toInt))
    })
  }

  /** Real mono PCM16LE WAV: samples from an integer lattice formula. */
  private val synthWavUdf = udf { id: Long =>
    val n = 200 + (id % 8).toInt * 100
    val rate = if (id % 2 == 0) 16000 else 44100
    graft.ops.Multimodal.encodeWav(rate, Array.tabulate(n)(i =>
      (((id * 131 + i * 29) % 65536) - 32768).toShort))
  }

  /** Multimodal images, ORACLE-CHECKED end to end: synthesize real media
    * per doc — PNG for most ids, JPEG (every 5th id, via the JVM-shipped
    * writer) so the lake's dominant format exercises the same decode
    * path — then decode it all back. Hash-checked values: header
    * metadata (format/width/height — for JPEG from the SOF marker walk),
    * decode success for EVERY row (`decoded` proves the ImageIO JPEG
    * read ran), and for the lossless rows the integer channel sum over
    * the decoded pixels plus the sum AFTER a real nearest-neighbor
    * resize to 16×16 (decode → sample on the integer lattice → PNG
    * re-encode → decode). JPEG sums are NULL by construction: the codec
    * is lossy, so decoded values are codec-dependent — no DuckDB oracle
    * can replay them (the pixel round-trip is spec-checked with a
    * tolerance in OpsSpec instead).
    */
  private def qMultimodalImages(s: SparkSession, dir: String): DataFrame = {
    val mm = graft.ops.Multimodal
    // fixture-synthesis cost is bounded like the audio gate's: decode
    // correctness needs a fixed id range, not SF-scaling media volume
    val isJpegRow = col("doc_id") % 5 === 0
    val media = tbl(s, dir, "documents")
      .filter(col("doc_id") < 500)
      .select(col("doc_id"),
        when(isJpegRow, synthJpegUdf(col("doc_id")))
          .otherwise(synthPngUdf(col("doc_id"))).as("media"))
    val base = mm.imageStats(media, "media")
      .select(col("doc_id"),
        col("istats.format").as("format"),
        col("istats.width").as("width"),
        col("istats.height").as("height"),
        col("istats.valid").as("decoded"),
        when(isJpegRow, lit(null).cast("long"))
          .otherwise(col("istats.sum_r")).as("sum_r"))
    val resized = mm.imageStats(mm.resizeMedia(media, "media", 16, 16), "media")
      .select(col("doc_id"),
        when(isJpegRow, lit(null).cast("long"))
          .otherwise(col("istats.sum_r")).as("rsum_r"))
    base.join(resized, Seq("doc_id")).orderBy("doc_id")
  }

  /** Multimodal frame sampling, ORACLE-CHECKED: real PNG frames in the
    * GFRM container, evenly-spaced sampling (j*count/n lattice), per-frame
    * grid-pooled features from the DECODED pixels. f0 = cell(0,0) red
    * mean / 255 — for a solid frame that is exactly `r/255` as Float32,
    * which the oracle reproduces with the same cast chain.
    */
  private def qMultimodalFrames(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal
      .sampleVideoFrames(
        tbl(s, dir, "documents")
          .filter(col("doc_id") < 500) // bounded fixtures, like the audio gate
          .select(col("doc_id"), synthFramesUdf(col("doc_id")).as("media")),
        "doc_id", "media", framesPerVideo = 4)
      .select(col("media_id"), col("frame_number"),
        col("frame_features")(0).cast("double").as("f0"))
      .orderBy("media_id", "frame_number")

  /** Multimodal audio, ORACLE-CHECKED: real WAV (RIFF header + PCM16LE),
    * decoded by the chunk-walker, windowed RMS over the decoded samples.
    * Window membership proves the data-chunk length decode; RMS values
    * prove the sample decode — `s/32768` and its square are EXACT binary
    * fractions, the window sum stays exact (≤ 37 bits), so the final
    * division + sqrt are single correctly-rounded IEEE ops both engines
    * agree on bit-for-bit; no rounding needed.
    */
  private def qMultimodalAudio(s: SparkSession, dir: String): DataFrame =
    graft.ops.Multimodal
      .audioEnergy(
        tbl(s, dir, "documents")
          .filter(col("doc_id") < 100)
          .select(col("doc_id"), synthWavUdf(col("doc_id")).as("media")),
        "doc_id", "media", windowSize = 128)
      .select(col("media_id"), col("window_no"), col("rms"))
      .orderBy("media_id", "window_no")

  // ------------------------------------------------------------------
  // Wider relational surface: window frames, range joins, statistical
  // aggregates, date/string/array/JSON scalar breadth — all oracle-checked
  // ------------------------------------------------------------------

  /** Full window-frame surface in one pass: lag/lead offsets, an explicit
    * ROWS frame for first_value and a 3-row moving sum, ntile bucketing
    * and percent_rank — all over the same per-customer ordering (unique
    * tie-break ⇒ deterministic). Money in integer cents so frame sums are
    * FP-association-proof.
    */
  private def qWindowFrames(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    tbl(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        lag(cents, 1).over(w).as("prev_cents"),
        lead(cents, 1).over(w).as("next_cents"),
        first(cents)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_cents"),
        sum(cents).over(w.rowsBetween(-2, 0)).as("moving_cents"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** The tie-sensitive window ranks: rank/dense_rank/cume_dist computed
    * over the DATE ordering (ties collapse identically in any engine —
    * their values depend only on sort-key values, not tie order) and
    * nth_value over the unique tie-broken ordering.
    */
  private def qWindowRanks(s: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val byDate = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    val unique = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl(s, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(byDate).cast("long").as("rk"),
        dense_rank().over(byDate).cast("long").as("drk"),
        round(cume_dist().over(byDate), 6).as("cd"),
        nth_value(cents, 2).over(unique).as("second_cents"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** RANGE frame over a numeric ordering: per customer, orders placed in
    * the trailing 30 days (value-based frame — peers by day, not rows;
    * the time-decay aggregation shape).
    */
  private def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-30, 0)
    tbl(s, dir, "orders")
      .withColumn("day",
        datediff(col("o_orderdate").cast("date"),
          lit("1990-01-01").cast("date")))
      .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        count(lit(1)).over(w).as("n_30d"),
        sum(col("cents")).over(w).as("cents_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Range (band/interval) join: parts bucketed into price bands via an
    * inequality join against a tiny inline dimension — broadcast
    * nested-loop, the scale-correct plan for band joins (the band table is
    * O(1) regardless of SF).
    */
  private def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      (0, 0.0, 1000.0), (1, 1000.0, 1300.0),
      (2, 1300.0, 1600.0), (3, 1600.0, 5000.0))
      .toDF("band_id", "lo", "hi")
    tbl(s, dir, "part")
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("sum_price"))
      .orderBy("band_id")
  }

  /** Statistical aggregate surface: Pearson correlation, sample
    * stddev/variance/covariance per group (single-pass co-moment
    * aggregates with map-side partials; normalized outputs rounded so the
    * partial-merge association order can't flip a digit).
    */
  private def qStatsAgg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("corr_qty_price"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6)
          .as("cov_qty_disc"))
      .orderBy("l_returnflag")

  /** Date/time scalar surface: component extraction, month truncation,
    * day arithmetic, end-of-month — timestamps emitted as epoch micros
    * (bigint) per the determinism rules.
    */
  private def qDateFuncs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("qtr"),
        unix_micros(date_trunc("MONTH", col("o_orderdate").cast("timestamp")))
          .as("month_start_us"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).as("days_since_95"),
        unix_micros(last_day(col("o_orderdate")).cast("timestamp"))
          .as("eom_us"))
      .orderBy("o_orderkey")

  /** Fuzzy/string scalar surface: edit distance (the fuzzy-dedup
    * primitive), reverse/pad/split/regex-extract/position.
    */
  private def qStringFuzzy(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "part")
      .select(
        col("p_partkey"),
        levenshtein(substring(col("p_name"), 1, 10), col("p_brand"))
          .as("lev_dist"),
        reverse(col("p_brand")).as("brand_rev"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        element_at(split(col("p_type"), " "), 1).as("type_first"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("name_last_word"),
        instr(col("p_name"), "al").as("al_pos"))
      .orderBy("p_partkey")

  /** Higher-order array functions over the embedding column — the
    * codegen'd no-UDF path for vector math (aggregate/transform/filter/
    * slice): L2 norm, positive-component count, head-slice mean.
    */
  private def qArrayFuncs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "embeddings")
      .select(
        col("vec_id"),
        round(sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))), 5)
          .as("l2_norm"),
        size(filter(col("embedding"), x => x > lit(0.0f))).as("n_pos"),
        round(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
          (acc, x) => acc + x.cast("double")) / 8.0, 6).as("head_mean"))
      .orderBy("vec_id")

  /** Subquery surface through the SQL front-end: uncorrelated IN plus
    * correlated EXISTS (planned as semi joins after decorrelation).
    */
  private def qExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "customer").createOrReplaceTempView("customer_v")
    tbl(s, dir, "nation").createOrReplaceTempView("nation_v")
    tbl(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, c_name FROM customer_v
         WHERE c_nationkey IN (SELECT n_nationkey FROM nation_v
                               WHERE n_regionkey = 1)
           AND EXISTS (SELECT 1 FROM orders_v
                       WHERE o_custkey = c_custkey
                         AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""")
  }

  /** PER-DOMAIN document cap — the crawl-curation rule "keep at most N
    * documents per source" (boilerplate-heavy domains must not dominate
    * the corpus). Deterministic keep order (doc_id within source), rank
    * ≤ N planned as Partial+Final WindowGroupLimit — each map task
    * forwards at most N rows per source to the exchange, so a
    * 100-million-doc domain costs its cap, not its size.
    */
  private def qDomainCap(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    tbl(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 50)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), max(col("doc_id")).as("max_kept_id"))
      .orderBy("source")
  }

  /** TRIANGLE COUNTING over the co-supplier graph (suppliers sharing a
    * part; the q_pagerank edge construction) — the standard graph
    * cohesion metric. Edges oriented low→high id, so each triangle is
    * counted ONCE by joining oriented wedges against the oriented edge
    * set; never enumerates unordered pairs twice. Per-node counts
    * aggregate the triangle corners.
    */
  private def qTriangleCount(s: SparkSession, dir: String): DataFrame = {
    // oriented edge set u < v — each undirected edge appears once
    // (narrow filter over the directed artifact; already distinct)
    val und = writtenEdgesTable(s, dir)
      .filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    // wedges u<v<w closed against the oriented edges: each triangle
    // found exactly once. (Id orientation suffices at this degree
    // profile; at adversarial-skew scale, orient by degree so the
    // wedge fan-out is bounded by the SMALLER endpoint's degree.)
    val wedges = und.as("x").join(und.as("y"), col("x.v") === col("y.u"))
      .select(col("x.u").as("u"), col("x.v").as("v"), col("y.v").as("w"))
    val tri = wedges.join(
      und.select(col("u").as("tu"), col("v").as("tw")),
      col("u") === col("tu") && col("w") === col("tw"))
      .select("u", "v", "w")
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("node"))
      .limit(10)
  }

  /** K-ANONYMITY audit: quasi-identifier groups with fewer than k
    * members are re-identification risks the release gate must flag.
    * One grouped count + HAVING — the privacy checklist's first query.
    */
  private def qKAnonymity(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < 10)
      .orderBy("lang", "source")

  /** ONE-PASS data profiling: per-column null count, exact distinct
    * count, and numeric min/max for a column set, computed in a SINGLE
    * aggregation over one scan (the multiple COUNT(DISTINCT)s plan as
    * one Expand — never a scan per column, which is how naive profilers
    * price a 100 TB health check), then stacked to long format. The
    * profile every ingest pipeline runs before trusting a new drop.
    */
  private def qDataProfile(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
    val numeric = Set("o_orderkey", "o_custkey", "o_totalprice")
    val cols = Seq("o_orderkey", "o_custkey", "o_totalprice",
      "o_orderstatus")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long")
          .as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c"),
        (if (numeric(c)) min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"min_$c"),
        (if (numeric(c)) max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"max_$c"))
    }
    val stackArgs = cols.map(c =>
      s"'$c', null_$c, dist_$c, min_$c, max_$c").mkString(", ")
    o.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_null, n_distinct, min_v, max_v)"))
      .select(col("column_name"), col("n_null").cast("long").as("n_null"),
        col("n_distinct").cast("long").as("n_distinct"),
        col("min_v"), col("max_v"))
      .orderBy("column_name")
  }

  /** ONE-PASS expectation checking (the dbt-test / Great-Expectations
    * shape): named rule predicates evaluated as conditional sums in a
    * single aggregation — N rules cost one scan, not N. NULL rule
    * results count as violations (an unknown is not a pass).
    */
  private def qExpectations(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
    val rules: Seq[(String, Column)] = Seq(
      ("orderkey_positive", col("o_orderkey") > 0),
      ("status_in_domain", col("o_orderstatus").isin("O", "F", "P")),
      ("price_nonnegative", col("o_totalprice") >= 0),
      ("custkey_not_null", col("o_custkey").isNotNull))
    val aggs = count(lit(1)).as("n_rows") +: rules.map { case (n, c) =>
      sum(when(!coalesce(c, lit(false)), 1).otherwise(0)).cast("long")
        .as(s"viol_$n")
    }
    val stackArgs = rules.map { case (n, _) =>
      s"'$n', viol_$n, viol_$n = 0L" }.mkString(", ")
    o.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"),
        expr(s"stack(${rules.size}, $stackArgs) AS " +
          "(rule, n_violations, pass)"))
      .select(col("rule"), col("n_rows"),
        col("n_violations").cast("long").as("n_violations"), col("pass"))
      .orderBy("rule")
  }

  /** NULL-SAFE join (`<=>` / IS NOT DISTINCT FROM): two per-status
    * summaries joined on a NULLable key (NULLIF folds 'P' to NULL) —
    * ordinary equality would silently drop the NULL group; the
    * null-safe operator matches it. The dimension-conformance join
    * every warehouse with optional keys needs.
    */
  private def qNullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
    val a = o.groupBy(expr("nullif(o_orderstatus, 'P')").as("k"))
      .agg(count(lit(1)).as("n_orders"))
    val b = o.groupBy(expr("nullif(o_orderstatus, 'P')").as("kb"))
      .agg(dsum(col("o_totalprice")).as("sum_price"))
    a.join(b, col("k") <=> col("kb"))
      .select(col("k"), col("n_orders"), col("sum_price"))
      .orderBy(col("k").asc_nulls_first)
  }

  /** RELATIONAL DIVISION ("for all"): customers with orders in EVERY
    * order priority — the classic universal-quantifier SQL shape,
    * planned as two distinct-count aggregates and a scalar-subquery
    * comparison (no nested anti-join double-negation needed).
    */
  private def qRelDivision(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_custkey AS c_custkey,
           COUNT(DISTINCT o_orderpriority) AS n_prio
         FROM orders_v
         GROUP BY o_custkey
         HAVING COUNT(DISTINCT o_orderpriority) =
           (SELECT COUNT(DISTINCT o_orderpriority) FROM orders_v)
         ORDER BY c_custkey""")
  }

  /** FILTERED vector search: exact top-k among vectors passing a
    * metadata predicate (label = 3) — the "filtered ANN" shape every
    * production vector store needs. The label predicate is pushed to
    * the parquet scan (PlanSpec asserts PushedFilters), so the distance
    * kernel prices only survivors; at 100 TB with a label-partitioned
    * or bloom-indexed layout the filter prunes files before any vector
    * byte is read.
    */
  private def qAnnFiltered(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
    val q = e.filter(col("vec_id") === 0)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
    graft.ops.Similarity.bruteForceTopK(
      e.filter(col("label") === 3), "vec_id", "embedding", q, 10)
      .select(col("vec_id"), round(col("cosine"), 4).as("cosine"))
  }

  /** HEAVY HITTERS (two-phase): per-partition SpaceSaving sketches
    * propose a candidate superset, one exact recount over only the
    * candidate rows finalizes — top-k over skewed key spaces WITHOUT
    * shuffling the whole vocabulary. Counts are exact, so the oracle is
    * the plain exact top-k; the sketch-superset guarantee is OpsSpec's
    * job (adversarial skew + partitioning).
    */
  private def qHeavyHitters(s: SparkSession, dir: String): DataFrame =
    graft.ops.HeavyHitters.topK(
      tbl(s, dir, "documents").select(explode(expr(tokensSql)).as("w")),
      "w", 15, capacity = 1024)

  /** GAPS-AND-ISLANDS: maximal runs of CONSECUTIVE ACTIVE DAYS per user
    * (activity streaks) — the classic "islands" shape, via the
    * epoch-day-minus-row_number grouping key over the distinct
    * (user, day) set. One user-keyed window + one (user, island)
    * aggregate; both partitionings are user-scale, never global.
    */
  private def qIslands(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "events").createOrReplaceTempView("events_gi_v")
    s.sql(
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
           FROM events_gi_v),
         g AS (SELECT user_id, day,
             datediff(day, DATE '1970-01-01')
               - ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY day) AS grp
           FROM d),
         runs AS (SELECT user_id, MIN(day) AS run_start,
             MAX(day) AS run_end, COUNT(*) AS run_len
           FROM g GROUP BY user_id, grp)
         SELECT user_id, run_start, run_end, run_len
         FROM runs WHERE run_len >= 5
         ORDER BY user_id, run_start""")
  }

  /** TPC-H Q2-shaped MIN-COST SUPPLIER: per part (p_size = 10 slice),
    * the supplier(s) whose best observed unit price equals the part's
    * minimum — a CORRELATED scalar subquery over a derived aggregate,
    * the canonical "argmin within group via subquery" relational shape.
    * Catalyst decorrelates the subquery into a min-per-part aggregate +
    * join; cost is a double MIN (identical value both engines, so the
    * equality predicate is engine-safe), rounded only for display.
    */
  private def qMinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "lineitem").createOrReplaceTempView("lineitem_mc_v")
    tbl(s, dir, "part").createOrReplaceTempView("part_mc_v")
    tbl(s, dir, "supplier").createOrReplaceTempView("supplier_mc_v")
    s.sql(
      """WITH ps AS (SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS cost
           FROM lineitem_mc_v GROUP BY l_partkey, l_suppkey)
         SELECT p.p_partkey, s.s_name, round(ps.cost, 4) AS cost
         FROM ps JOIN part_mc_v p ON ps.l_partkey = p.p_partkey
           JOIN supplier_mc_v s ON ps.l_suppkey = s.s_suppkey
         WHERE p.p_size = 10
           AND ps.cost = (SELECT MIN(ps2.cost) FROM ps ps2
                          WHERE ps2.l_partkey = ps.l_partkey)
         ORDER BY p.p_partkey, s.s_name""")
  }

  /** TPC-H Q15-shaped TOP-REVENUE SUPPLIER: a revenue "view" (decimal-
    * exact sum over a shipdate window) probed by an uncorrelated MAX
    * subquery — the view + scalar-subquery-on-aggregate shape. Exact
    * DECIMAL revenue makes the MAX equality engine-safe.
    */
  private def qRevenueView(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "lineitem").createOrReplaceTempView("lineitem_rv_v")
    tbl(s, dir, "supplier").createOrReplaceTempView("supplier_rv_v")
    s.sql(
      """WITH revenue AS (SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(18,6))) AS total_revenue
           FROM lineitem_rv_v
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
         FROM supplier_rv_v s
         JOIN revenue r ON s.s_suppkey = r.supplier_no
         WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
         ORDER BY s.s_suppkey""")
  }

  /** TPC-H Q17-shaped SMALL-ORDER REVENUE: average yearly revenue lost
    * if small orders (quantity below 20%% of the part's average) were
    * dropped — the correlated-AVG filter shape. Per-brand output keeps
    * more than one row under the oracle's hash. The inner AVG is a
    * double over identical inputs (engine-identical), 0.2× is exact,
    * and the revenue sum is decimal-exact.
    */
  private def qSmallOrderRevenue(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "lineitem").createOrReplaceTempView("lineitem_so_v")
    tbl(s, dir, "part").createOrReplaceTempView("part_so_v")
    s.sql(
      """SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             AS lost_revenue,
           COUNT(*) AS n_lines
         FROM lineitem_so_v l JOIN part_so_v p ON l.l_partkey = p.p_partkey
         WHERE l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                               FROM lineitem_so_v l2
                               WHERE l2.l_partkey = l.l_partkey)
         GROUP BY p.p_brand
         ORDER BY p.p_brand""")
  }

  /** FULL OUTER join: negative-balance customers vs per-customer order
    * counts — nulls surface on both sides.
    */
  private def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer").filter(col("c_acctbal") < 0)
      .select(col("c_custkey"), col("c_acctbal"))
    val oa = tbl(s, dir, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    c.join(oa, c("c_custkey") === oa("o_custkey"), "full_outer")
      .select(coalesce(c("c_custkey"), oa("o_custkey")).as("custkey"),
        col("c_acctbal"), col("n_orders"))
      .orderBy("custkey")
  }

  /** Hopping windows computed BY A REAL STREAMING QUERY — together with
    * the tumbling and session twins, all three event-window types run
    * under Structured Streaming against the same batch oracles. Same
    * update-mode foreachBatch upsert shape as the tumbling twin; each
    * event lands in 2 overlapping 1h windows (30min hop).
    */
  private def qEventsStreamHopping(s: SparkSession, dir: String): DataFrame = {
    val schema = tbl(s, dir, "events").schema
    val stream = withTsEvent(
      s.readStream.schema(schema).parquet(eventsStreamDir(dir).toString))
      .withWatermark("ts_event", "1 hour")
      .groupBy(window(col("ts_event"), "1 hour", "30 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"))
    val log = streamToDeltaLog(s, stream, "update")
    readDeltaLogUpsert(s, log, stream.schema,
      Seq("window_start_us", "event_type"))
      .orderBy("window_start_us", "event_type")
  }

  /** STREAM-STREAM interval join as a gate query — the fourth real
    * streaming query (after tumbling/hopping/sessions): purchases and
    * views arrive as two independent streams, joined on user within the
    * trailing hour (watermark-bounded state on both sides, see
    * streaming/StreamingEmbed.intervalJoinStreams). Emits the raw match
    * pairs — append mode, no post-join aggregation — and hash-matches
    * the batch inequality-join oracle.
    */
  private def qEventsStreamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = tbl(s, dir, "events").schema
    def src = withTsEvent(
      s.readStream.schema(schema).parquet(eventsStreamDir(dir).toString))
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_event"))
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts_event"))
    val joined = graft.streaming.StreamingEmbed
      .intervalJoinStreams(purchases, views, "user_id", "ts_event",
        lookback = "1 hour", watermark = "2 hours")
      .select(col("event_id"),
        col("r_event_id").as("view_event_id"),
        unix_micros(col("r_ts_event")).as("view_ts_us"))
    // append mode: every match is emitted exactly once, so the gate
    // result is simply the delta log's rows (no keyed upsert needed)
    val log = streamToDeltaLog(s, joined, "append")
    readDeltaLog(s, log, joined.schema)
      .select("event_id", "view_event_id", "view_ts_us")
      .orderBy("event_id", "view_event_id")
  }

  /** The deterministic watermark-complete cut shared by the outer-join
    * and chained-stateful gates: min of the purchase/view streams' max
    * event times minus the 2h watermark delay, computed in ONE scan.
    * The 7200000000 (2h in µs) here and the `watermark = "2 hours"`
    * passed to intervalJoinStreams must stay in lockstep.
    *
    * Boundary assumption (deliberate): consumers keep windows with
    * `window_end_us <= wmCut`, relying on Spark finalizing a window
    * exactly when watermark >= window end, with no extra hold-back as
    * the watermark propagates through the upstream interval join. This
    * matches Spark 4.x's multi-stateful watermark simulation; a fixture
    * timestamp landing EXACTLY on a window/watermark boundary, or a
    * future Spark change to propagation slack, would surface here first
    * — if such a gate flips, loosen the cut to strict `<` before
    * suspecting the operators.
    */
  private def purchaseViewWmCutUs(s: SparkSession, dir: String): Long = {
    val r = withTsUs(tbl(s, dir, "events"))
      .agg(
        max(when(col("event_type") === "purchase", col("ts_us"))).as("p"),
        max(when(col("event_type") === "view", col("ts_us"))).as("v"))
      .head()
    math.min(r.getLong(0), r.getLong(1)) - 7200000000L
  }

  /** STREAM-STREAM LEFT OUTER interval join — the join type the inner
    * gate can't prove: an unmatched purchase must STILL emit (views
    * NULL) once the watermark passes its one-hour lookback window, and
    * must NOT emit before (a future view could still match). The
    * watermark-complete region is deterministic — min of the two sides'
    * max event times minus the 2h delay — so the gate filters both its
    * own output and the oracle's LEFT JOIN to purchases strictly below
    * that cut: every such purchase has either matched or been
    * null-emitted by the final no-data flush batch AvailableNow runs.
    */
  private def qEventsStreamLeftJoin(s: SparkSession, dir: String): DataFrame = {
    val schema = tbl(s, dir, "events").schema
    def src = withTsEvent(
      s.readStream.schema(schema).parquet(eventsStreamDir(dir).toString))
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_event"))
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts_event"))
    val joined = graft.streaming.StreamingEmbed
      .intervalJoinStreams(purchases, views, "user_id", "ts_event",
        lookback = "1 hour", watermark = "2 hours",
        joinType = "left_outer")
      .select(col("event_id"), unix_micros(col("ts_event")).as("ts_us"),
        col("r_event_id").as("view_event_id"),
        unix_micros(col("r_ts_event")).as("view_ts_us"))
    val log = streamToDeltaLog(s, joined, "append")
    val wmCut = purchaseViewWmCutUs(s, dir)
    readDeltaLog(s, log, joined.schema)
      .filter(col("ts_us") < wmCut)
      .select("event_id", "ts_us", "view_event_id", "view_ts_us")
      .orderBy("event_id", "view_event_id")
  }

  /** CHAINED STATEFUL OPERATORS: a stream-stream interval join feeding
    * a downstream event-time window aggregation in ONE streaming query
    * — two stateful exec nodes sharing one watermark timeline (the
    * multi-stateful-operator support added to Structured Streaming in
    * Spark 3.5+). Append mode, so the window agg emits a window only
    * once the propagated watermark finalizes it; the gate keeps the
    * deterministic finalized region (window end ≤ the final
    * watermark) and the oracle replays join + hourly count over it.
    */
  private def qEventsStreamJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val schema = tbl(s, dir, "events").schema
    def src = withTsEvent(
      s.readStream.schema(schema).parquet(eventsStreamDir(dir).toString))
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_event"))
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts_event"))
    val joined = graft.streaming.StreamingEmbed
      .intervalJoinStreams(purchases, views, "user_id", "ts_event",
        lookback = "1 hour", watermark = "2 hours")
    val agg = joined
      .groupBy(window(col("ts_event"), "1 hour"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        unix_micros(col("window.end")).as("window_end_us"),
        col("n_pairs"))
    val log = streamToDeltaLog(s, agg, "append")
    val wmCut = purchaseViewWmCutUs(s, dir)
    readDeltaLog(s, log, agg.schema)
      .filter(col("window_end_us") <= wmCut)
      .select("window_start_us", "n_pairs")
      .orderBy("window_start_us")
  }

  /** NON-FILE streaming source gate: Spark's deterministic
    * `rate-micro-batch` source replaces the file stream — the canonical
    * stand-in for a Kafka-shaped unbounded feed (same micro-batch
    * planner path; only the source offsets differ), proving the
    * streaming gates' logical-plan-identity claim holds beyond file
    * listings. Exactly 5 batches × 1000 rows; every event column is
    * derived deterministically from `value`, so the DuckDB oracle
    * replays the entire feed with generate_series. The windowed-count
    * transform is the events_stream_tumbling shape: watermark + 1h
    * tumbling window, update-mode deltas into the distributed delta
    * log, gate result = keyed upsert of the log.
    */
  private def qRateStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val nBatches = 5L
    val stream = s.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "1000")
      .option("numPartitions", "4")
      .load()
      .select(col("value"),
        concat(lit("t"), (col("value") % 5).cast("string"))
          .as("event_type"),
        timestamp_micros(lit(1704067200000000L) + col("value") * 61000000L)
          .as("ts_event"))
      .withWatermark("ts_event", "1 hour")
      .groupBy(window(col("ts_event"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"))
    val log = scratchTempDir(s, "graft_rate_log")
    val sink = graft.streaming.DeltaLog.appendSink(s, log, identity)
    // The source is unbounded (that is the point), so the drain is
    // count-bounded, not AvailableNow: commit exactly nBatches batches,
    // then a latch hands control back to the driver thread, which stops
    // the query OUTSIDE foreachBatch (an in-sink stop() can deadlock
    // the micro-batch thread against itself).
    val done = new java.util.concurrent.CountDownLatch(1)
    val oldParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val finished = try {
      val q = stream.writeStream
        .outputMode("update")
        .foreachBatch { (df: DataFrame, id: Long) =>
          if (id < nBatches) sink(df, id) else done.countDown()
        }
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try done.await(180, java.util.concurrent.TimeUnit.SECONDS)
      finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", oldParts)
    if (!finished)
      throw new IllegalStateException(
        s"rate stream did not commit $nBatches batches within 180 s")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("window_start_us",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType)))
    readDeltaLogUpsert(s, log, schema, Seq("window_start_us", "event_type"))
      .orderBy("window_start_us", "event_type")
  }

  /** NULL-semantics surface: aggregation null-skipping (count(col) vs
    * count(*)), null-safe equality, NULLIF/COALESCE, and null grouping
    * keys — exercised through the outer join's generated nulls.
    */
  private def qNullSemantics(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("o_orderkey")).as("n_orders_nonnull"),
        count(when(col("o_orderkey").isNull, 1)).as("n_null"),
        count(when(col("o_orderstatus") <=> lit("F"), 1)).as("n_f_nullsafe"),
        count(nullif(col("o_orderpriority"), lit("1-URGENT")))
          .as("n_not_urgent"),
        min(coalesce(col("o_orderstatus"), lit("~none~"))).as("min_status"))
      .orderBy("c_mktsegment")
  }

  /** Sessionization computed BY A REAL STREAMING QUERY with CUSTOM STATE
    * (streaming/StreamingEmbed.sessionizeStream — flatMapGroupsWithState,
    * O(1) state per user): the streaming twin of `events_sessions`,
    * hash-matched against the SAME DuckDB oracle. Update-mode deltas keyed
    * by (user_id, session_id) land in the distributed delta log; the gate
    * result is its keyed upsert.
    */
  private def qEventsStreamSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = tbl(s, dir, "events").schema
    val src0 = s.readStream.schema(schema)
      .parquet(eventsStreamDir(dir).toString)
    val stream = src0
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        eventTsUs(src0).cast("long"))
      .as[(Long, Long, Long)]
    val sessions = graft.streaming.StreamingEmbed.sessionizeStream(stream).toDF()
    val log = streamToDeltaLog(s, sessions, "update")
    readDeltaLogUpsert(s, log, sessions.schema,
      Seq("user_id", "session_id"))
      .orderBy("user_id", "session_id")
  }

  /** Deterministic content-hash sampling — the reproducible train/test
    * split primitive for training-data pipelines: membership depends only
    * on the key (md5 first hex char ⇒ a fixed 1/16 slice), never on
    * partitioning, run order, or cluster layout, so the split is stable
    * across reruns and engines — which is exactly why it is
    * oracle-checkable while rand()-based sampling is not.
    */
  private def qSampleHash(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy("o_orderkey")

  /** MERGE/upsert over immutable storage (ops/Merge.upsert): base
    * snapshot ∪ change set, highest version wins per key — one max_by
    * hash aggregation, no window sort, no self-join. Every 10th order
    * gets a priced-up v2 row; the oracle replays the merge with
    * union + QUALIFY row_number.
    */
  private def qMergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = tbl(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"),
        lit(1L).as("version"))
    val updates = base.filter(col("o_orderkey") % 10 === 0)
      .withColumn("price_cents", col("price_cents") + 500L)
      .withColumn("version", lit(2L))
    graft.ops.Merge.upsert(base, updates, Seq("o_orderkey"), "version")
      .orderBy("o_orderkey")
  }

  /** TF-IDF top-3 terms per document — explode → tf/df aggregations →
    * scalar doc count (broadcast) → rank window. Ordering uses the
    * ROUNDED score so FP last-ulp differences can't flip ranks between
    * engines. The TF table is WRITTEN TO PARQUET and read back: df
    * derives from it, but column pruning specializes the df branch's
    * partial aggregate (dropping the tf count), which defeats AQE
    * exchange reuse and would re-explode the whole corpus. A written
    * table (the materialization every IR stack keeps at 100 TB anyway)
    * pins the expensive explode+aggregate to exactly one execution
    * WITHOUT tying the query's latency to executor storage pressure the
    * way a session-lifetime persist() does — the r3/r4 driver runs saw
    * this query 5-12× its isolated cost purely from accumulated cache.
    * n_docs stays a count-star over the raw table: deriving it from tf
    * would silently drop zero-token documents, and a count-star scan
    * reads only parquet footers.
    */
  private def qTfidf(s: SparkSession, dir: String): DataFrame = {
    val tf = writtenTfTable(s, dir)
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val ndocs = tbl(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("word"))
    tf.join(dfreq, "word")
      .crossJoin(broadcast(ndocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("word"), col("tfidf"))
      .orderBy("doc_id", "rk")
  }

  /** The (doc_id, word, tf) term-frequency table, MATERIALIZED to parquet
    * and read back — the shared input of qTfidf/qBm25. Each consumer
    * reads it several times (tf/df/doclen branches), and column pruning
    * specializes each branch's partial aggregate, so exchange reuse alone
    * would re-explode the corpus once per branch. A written table (what a
    * 100 TB deployment keeps anyway — the IR-stack materialization) pins
    * the explode+aggregate to one execution WITHOUT session-lifetime
    * executor storage: an in-session persist() here made the query's
    * timing degrade 5-12× under whole-suite cache pressure in the r3/r4
    * driver runs.
    *
    * WRITE-ONCE, not write-per-call: the path is keyed by the tokenizer
    * params AND the source table's file manifest (name/length/mtime via
    * the Hadoop FileSystem — the same O(files) listing the planner does),
    * and the write is skipped when that path's `_SUCCESS` marker exists.
    * Regenerated input data changes the manifest → a fresh key → a fresh
    * build; an interrupted write never leaves `_SUCCESS` behind, so it is
    * retried, never trusted. All paths go through the Hadoop FileSystem
    * of a configurable scratch URI (`spark.graft.scratch` — a shared-FS/
    * object-store URI on a real cluster; java.io.tmpdir covers local
    * mode), NOT java.io.File: a driver-local path is the silent-loss
    * failure mode the delta log (streaming/DeltaLog.scala) documents.
    */
  private def writtenTfTable(s: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val hconf = s.sparkContext.hadoopConfiguration
    val docs = new Path(s"$dir/documents.parquet")
    val manifest = docs.getFileSystem(hconf).listStatus(docs)
      .sortBy(_.getPath.getName)
      .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .mkString("|")
    val sig = s"tf-v2|split:[^a-zA-Z0-9_]+|lower|$dir|$manifest"
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    val scratch = new Path(s.conf.getOption("spark.graft.scratch")
      .getOrElse(sys.props("java.io.tmpdir")))
    val tfPath = new Path(scratch, s"graft_tf_$key")
    val fs = tfPath.getFileSystem(hconf)
    if (!fs.exists(new Path(tfPath, "_SUCCESS")))
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-zA-Z0-9_]+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
        .write.mode("overwrite").parquet(tfPath.toString)
    s.read.parquet(tfPath.toString)
  }

  /** Shared WRITE-ONCE artifact plumbing — the [[writtenTfTable]]
    * contract factored for reuse: the path is keyed by the build
    * signature + the source table's file manifest (name/length/mtime),
    * the build runs only when the `_SUCCESS` marker is absent, and all
    * paths go through the Hadoop FileSystem of `spark.graft.scratch`
    * (shared FS / object store on a real cluster; java.io.tmpdir in
    * local mode). Regenerated input → fresh manifest → fresh key →
    * fresh build; an interrupted write never leaves `_SUCCESS`, so it
    * is retried, never trusted.
    */
  private def writtenArtifact(
      s: SparkSession, dir: String, srcTable: String, sig0: String)(
      build: => DataFrame): DataFrame = {
    import org.apache.hadoop.fs.Path
    val hconf = s.sparkContext.hadoopConfiguration
    val src = new Path(s"$dir/$srcTable.parquet")
    val manifest = src.getFileSystem(hconf).listStatus(src)
      .sortBy(_.getPath.getName)
      .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .mkString("|")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$sig0|$dir|$manifest"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    val scratch = new Path(s.conf.getOption("spark.graft.scratch")
      .getOrElse(sys.props("java.io.tmpdir")))
    val p = new Path(scratch, s"graft_art_$key")
    val fs = p.getFileSystem(hconf)
    if (!fs.exists(new Path(p, "_SUCCESS")))
      build.write.mode("overwrite").parquet(p.toString)
    s.read.parquet(p.toString)
  }

  /** WRITE-ONCE co-supplier edge artifact: the DIRECTED symmetric
    * edge set (src, dst), src != dst, deduplicated — suppliers joined
    * through shared low-quantity parts (never supplier × supplier).
    * Ten graph queries (PageRank, shortest path, degree stats, link
    * prediction, triangles, components, label propagation, modularity,
    * assortativity) consume this ONE build as a parquet read instead
    * of each paying the distinct + self-join + distinct — at 100×
    * data the repeated build would dominate every graph query's cost.
    * Oriented (u < v) consumers derive their view with a narrow
    * filter; no distinct needed downstream (the directed set is
    * already exact).
    */
  private def writtenEdgesTable(s: SparkSession, dir: String): DataFrame =
    writtenArtifact(s, dir, "lineitem", "edges-v1|qty<=2|sym-distinct") {
      val ps = tbl(s, dir, "lineitem")
        .filter(col("l_quantity") <= 2)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      ps.as("a").join(ps.as("b"), "l_partkey")
        .filter(col("a.l_suppkey") =!= col("b.l_suppkey"))
        .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
        .distinct()
    }

  /** WRITE-ONCE supplier→part bipartite edge artifact for HITS: part
    * ids offset into their own key space by max(l_suppkey) + 1. The
    * offset's full-table max-scan rides THIS build (once per dataset),
    * not each q_hits run — the r9 VERDICT's second-scan finding.
    */
  private def writtenHitsEdges(s: SparkSession, dir: String): DataFrame =
    writtenArtifact(s, dir, "lineitem", "hitsedges-v1|qty<=2|off=maxsupp+1") {
      val li = tbl(s, dir, "lineitem")
      val off = broadcast(li.agg(max(col("l_suppkey")).cast("long").as("off")))
      li.filter(col("l_quantity") <= 2)
        .crossJoin(off)
        .select(col("l_suppkey").as("src"),
          (col("l_partkey") + col("off") + 1L).as("dst"))
        .distinct()
    }

  /** Batch interval join — the batch twin of the stream-stream interval
    * join (streaming/StreamingEmbed.intervalJoinStreams): each purchase
    * counts the same user's views in the trailing hour. Equi-join on
    * user_id (one keyed shuffle) with the time range as a post-join
    * predicate — the scale-correct plan for bounded-range enrichment.
    */
  private def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = withTsUs(tbl(s, dir, "events"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts_us").as("view_ts_us"))
    p.join(v,
        p("user_id") === col("v_user_id") &&
          col("view_ts_us") >= col("ts_us") - 3600L * 1000000L &&
          col("view_ts_us") <= col("ts_us"),
        "left_outer")
      .groupBy(col("event_id"), col("user_id"), col("ts_us"))
      .agg(count(col("view_ts_us")).as("n_views_1h"))
      .orderBy("event_id")
  }

  /** Int8 vector quantization surface (ops/Quantize): per-vector scale +
    * first four quantized components + the quantized self-cosine (≡ 1
    * within quantization error; emitted so the oracle exercises the
    * integer dot-product path too).
    */
  private def qVecQuantize(s: SparkSession, dir: String): DataFrame = {
    val q = graft.ops.Quantize.quantize(tbl(s, dir, "embeddings"), "embedding")
    q.select(
        col("vec_id"),
        round(col("scale"), 6).as("scale_r"),
        col("qvec")(0).cast("int").as("q0"),
        col("qvec")(1).cast("int").as("q1"),
        col("qvec")(2).cast("int").as("q2"),
        col("qvec")(3).cast("int").as("q3"))
      .orderBy("vec_id")
  }

  /** Ordered string aggregation (listagg WITHIN GROUP — deterministic by
    * construction, unlike bare listagg whose concat order is
    * partitioning-dependent).
    */
  private def qStringAgg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        expr("listagg(DISTINCT o_orderstatus, ',') " +
          "WITHIN GROUP (ORDER BY o_orderstatus)").as("statuses"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Stratified deterministic sampling: per-stratum rates (4/16 for 'A',
    * 8/16 for 'N', 2/16 for 'R') decided by a content-hash digit of the
    * unique row key — reproducible across engines/partitionings, counted
    * against stratum totals in one pass (no second scan).
    */
  private def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    val digit = substring(md5(concat(col("l_orderkey").cast("string"),
      lit("#"), col("l_linenumber").cast("string"))), 1, 1)
    val cutoff = when(col("l_returnflag") === "A", lit("3"))
      .when(col("l_returnflag") === "N", lit("7"))
      .otherwise(lit("1"))
    tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(when(digit <= cutoff, 1)).as("n_sampled"),
        count(lit(1)).as("n_total"))
      .orderBy("l_returnflag")
  }

  /** JSON scalar surface: construct a JSON document per row, extract
    * typed fields back out (get_json_object path expressions).
    */
  private def qJsonFuncs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "part")
      .withColumn("j",
        concat(lit("{\"size\":"), col("p_size").cast("string"),
          lit(",\"brand\":\""), col("p_brand"), lit("\"}")))
      .select(
        col("p_partkey"),
        get_json_object(col("j"), "$.size").cast("int").as("jsize"),
        get_json_object(col("j"), "$.brand").as("jbrand"))
      .orderBy("p_partkey")

  // ------------------------------------------------------------------
  // Round-3 breadth: melt/cross/set-ALL/grouping flags/lateral surface,
  // feature-prep (normalization, z-score, histogram, gap-fill), text
  // retrieval (bigrams, BM25), PII redaction, streaming dedup gate
  // ------------------------------------------------------------------

  /** UNPIVOT (melt): wide measure columns → long (measure, val) — the
    * standard reshape before per-feature statistics. One narrow Expand,
    * aggregated by (flag, measure) in a single shuffle.
    */
  private def qUnpivot(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")
      .groupBy("l_returnflag", "measure")
      .agg(dsum(col("val")).as("total"), count(lit(1)).as("n"))
      .orderBy("l_returnflag", "measure")

  /** CROSS JOIN surface: the full dim lattice (region × nation, both
    * O(1)-size and broadcastable; a cartesian over SF-scaling tables
    * would be a plan bug, not a feature).
    */
  private def qCrossJoin(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "region")
      .crossJoin(broadcast(tbl(s, dir, "nation")))
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")

  /** ROLLUP with GROUPING flags — distinguishes "NULL because subtotal"
    * from "NULL in the data", which plain rollup output cannot.
    */
  private def qGroupingFlags(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))
      .orderBy(
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Multiset set ops: INTERSECT ALL ∪ EXCEPT ALL of two lineitem
    * partkey projections, tagged and re-counted — duplicate-preserving
    * semantics the distinct-based q_setop/q_except cannot express.
    */
  private def qSetopAll(s: SparkSession, dir: String): DataFrame = {
    val a = tbl(s, dir, "lineitem").filter(col("l_quantity") < 25)
      .select(col("l_partkey").as("partkey"))
    val b = tbl(s, dir, "lineitem").filter(col("l_discount") > 0.03)
      .select(col("l_partkey").as("partkey"))
    a.intersectAll(b).withColumn("op", lit("intersect_all"))
      .unionAll(a.exceptAll(b).withColumn("op", lit("except_all")))
      .groupBy("op", "partkey")
      .agg(count(lit(1)).as("n"))
      .orderBy("op", "partkey")
  }

  /** LATERAL correlated subquery with LIMIT through the SQL front-end:
    * top-2 orders per priority class — the decorrelated plan is a
    * ranked window + filter, not a per-row re-scan.
    */
  private def qLateralTopk(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
         FROM (SELECT DISTINCT o_orderpriority FROM orders_v) p,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders_v o
                  WHERE o.o_orderpriority = p.o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         ORDER BY p.o_orderpriority, t.o_orderkey""")
  }

  /** Window frame breadth: forward-fill (LAST_VALUE IGNORE NULLS over a
    * trailing frame) + per-partition first value — the canonical
    * sparse-to-dense feature repair. Prices are nulled deterministically
    * (orderkey % 3) so both engines fill the same holes.
    */
  private def qFirstLast(s: SparkSession, dir: String): DataFrame = {
    val priceN = when(col("o_orderkey") % 3 === 0, lit(null))
      .otherwise(col("o_totalprice"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    tbl(s, dir, "orders")
      .withColumn("price_n", priceN)
      .select(
        col("o_custkey"), col("o_orderkey"),
        last(col("price_n"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("price_filled"),
        first(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing))
          .as("first_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Fixed-width histogram (the distributed sibling of width_bucket):
    * integer bucket arithmetic, one hash aggregation, no sort until the
    * final O(#buckets) output.
    */
  private def qHistogram(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .groupBy(least(floor(col("o_totalprice") / 25000.0), lit(19.0))
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("bucket")

  /** Min-max feature normalization per segment via window min/max — no
    * second scan, no driver round-trip.
    */
  private def qMinmaxNorm(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
    val mn = min(col("c_acctbal")).over(w)
    val mx = max(col("c_acctbal")).over(w)
    tbl(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        when(mx === mn, lit(0.5))
          .otherwise(round((col("c_acctbal") - mn) / (mx - mn), 6))
          .as("acctbal_mm"))
      .orderBy("c_custkey")
  }

  /** Z-score standardization + outlier flag. Moments are accumulated as
    * exact decimal sums (associativity-proof) in ONE pass, broadcast back
    * — identical arithmetic in the oracle, so no FP-boundary flakiness,
    * unlike engine-native stddev (Welford vs sum-of-squares differ in
    * ulps between engines).
    */
  private def qZscore(s: SparkSession, dir: String): DataFrame = {
    val stats = tbl(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(dsum(col("l_quantity")).as("s1"),
        dsum(col("l_quantity") * col("l_quantity")).as("s2"),
        count(lit(1)).cast("double").as("cnt"))
    val mean = col("s1") / col("cnt")
    val sd = sqrt(col("s2") / col("cnt") - mean * mean)
    tbl(s, dir, "lineitem")
      .join(broadcast(stats), "l_returnflag")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        round((col("l_quantity") - mean) / sd, 6).as("z"))
      .withColumn("is_outlier", abs(col("z")) > 2.0)
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Word-bigram top-k over the corpus (n-gram surface: element_at is
    * 1-indexed in both engines, so the oracle is index-for-index
    * identical). Single explode → one aggregation → TakeOrdered.
    */
  private def qNgramBigrams(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(expr(tokensSql).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(ws) - 1),
             i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"""))
        .as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  /** PMI-scored COLLOCATIONS (statistically-bound word pairs — the
    * classic phrase-mining signal for tokenizer vocab curation and
    * boilerplate detection). Probabilities all come from the bigram
    * stream: PMI(x,y) = ln(c_xy·N / (c_x·· c_·y)). Scale shape: ONE
    * corpus explode into the (x,y) count exchange; the left/right
    * marginals and the total re-aggregate that same subplan, so
    * exchange reuse prices the corpus scan once and everything
    * downstream is vocab-sized, never corpus-sized. All counts are
    * integers, the PMI arithmetic is a fixed double expression over
    * them, and rows order by the ROUNDED score — partitioning cannot
    * flip the result.
    */
  private def qCollocations(s: SparkSession, dir: String): DataFrame = {
    val bc = tbl(s, dir, "documents")
      .select(expr(tokensSql).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(ws) - 1),
             i -> named_struct('x', element_at(ws, i),
                               'y', element_at(ws, i + 1)))"""))
        .as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
      // one corpus explode; 3 vocab-sized re-aggregations. Cache is
      // bigram-vocab-sized (never corpus-sized) and session-lifetime:
      // the lazy return leaves no unpersist point (qPerplexity contract)
      .persist()
    val lc = bc.groupBy("x").agg(sum("c").as("cx"))
    val rc = bc.groupBy("y").agg(sum("c").as("cy"))
    val tot = bc.agg(sum("c").as("nn"))
    bc.join(lc, "x").join(rc, "y").crossJoin(broadcast(tot))
      .filter(col("c") >= 5)
      .select(concat_ws(" ", col("x"), col("y")).as("bigram"),
        col("c").as("n"),
        round(log(col("c").cast("double") * col("nn").cast("double") /
          (col("cx").cast("double") * col("cy").cast("double"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(30)
  }

  /** Feature SQL for the trainable quality classifier — one string,
    * valid and IDENTICAL in both dialects (every literal is CAST to
    * DOUBLE so neither engine routes through its own decimal-promotion
    * rules; all features are integer-derived ratios, so both engines
    * compute identical doubles).
    */
  private val qcFeatures: Seq[(String, String)] =
    Seq(
      "f0" -> "CAST(1.0 AS DOUBLE)",
      "f1" -> "CAST(n_chars AS DOUBLE) / CAST(100.0 AS DOUBLE)",
      "f2" -> ("CAST(10.0 AS DOUBLE) * CAST(length(text) - " +
        "length(replace(text, 'data', '')) AS DOUBLE) / CAST(4.0 AS DOUBLE)" +
        " / CAST(n_chars AS DOUBLE)"),
      "f3" -> ("CAST(10.0 AS DOUBLE) * CAST(length(text) - " +
        "length(replace(text, 'spark', '')) AS DOUBLE) / CAST(5.0 AS DOUBLE)" +
        " / CAST(n_chars AS DOUBLE)"),
      "f4" -> ("CAST(10.0 AS DOUBLE) * CAST(length(text) - " +
        "length(replace(text, ' ', '')) AS DOUBLE) / CAST(n_chars AS DOUBLE)"),
      "f5" -> ("CAST(100.0 AS DOUBLE) * CAST(length(text) - " +
        "length(replace(text, ' the ', '')) AS DOUBLE) / CAST(5.0 AS DOUBLE)" +
        " / CAST(n_chars AS DOUBLE)"))

  private val qcLabelSql =
    "CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE) " +
      "ELSE CAST(0.0 AS DOUBLE) END"

  /** TRAINABLE QUALITY CLASSIFIER (the model-based curation filter —
    * fastText-shaped: cheap surface features, linear model): 3 batch-GD
    * iterations of [[graft.ops.LogReg]] predicting `lang = 'en'` from
    * six integer-derived text ratios on the doc_id %% 5 ≠ 0 slice. The
    * training TRAJECTORY is deterministic (9-dp decimal-quantized
    * gradients and weights), so the fitted weights themselves are the
    * gate output and the DuckDB twin re-trains the same model as three
    * unrolled gradient/weight CTE pairs and must hash-match. Loss
    * decrease and holdout sanity are OpsSpec's job.
    */
  private def qQualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = qcFeatures
    val df = tbl(s, dir, "documents").filter("doc_id % 5 <> 0")
      .select(expr(qcLabelSql).as("y") +:
        feats.map { case (n, e) => expr(e).as(n) }: _*)
    val w = graft.ops.LogReg.train(
      df, "y", feats.map(_._1), iters = 3, lr = 0.5)
    s.createDataset(feats.map(_._1).zip(w)).toDF("feature", "weight")
      .select(col("feature"), round(col("weight"), 6).as("weight"))
      .orderBy("feature")
  }

  /** The DuckDB re-training of [[qQualityClassifier]]: the same three
    * GD iterations unrolled as (gradient, weight) CTE pairs over the
    * same features — byte-identical arithmetic, zero shared state.
    */
  private lazy val qualityClassifierOracleSql: String = {
    val feats = qcFeatures
    val names = feats.map(_._1)
    def margin(w: Int => String) =
      names.zipWithIndex.map { case (n, j) => s"(${w(j)} * $n)" }
        .mkString(" + ")
    def gCte(k: Int): String = {
      val wref: Int => String =
        if (k == 1) _ => "0.0" else j => s"CAST(w$j AS DOUBLE)"
      val sums = names.zipWithIndex.map { case (n, j) =>
        s"SUM(CAST(round(((1.0 / (1.0 + exp(-(${margin(wref)})))) - y) " +
          s"* $n, 9) AS DECIMAL(28,9))) AS g$j"
      }.mkString(", ")
      s"g$k AS (SELECT $sums FROM f" +
        (if (k == 1) "" else s" CROSS JOIN w${k - 1}") + ")"
    }
    def wCte(k: Int): String = {
      val prev: Int => String =
        if (k == 1) _ => "0.0" else j => s"CAST(w$j AS DOUBLE)"
      val cols = names.indices.map { j =>
        s"CAST(round(${prev(j)} - 0.5 * CAST(g$j AS DOUBLE) / c, 9) " +
          s"AS DECIMAL(28,9)) AS w$j"
      }.mkString(", ")
      s"w$k AS (SELECT $cols FROM g$k CROSS JOIN nctr" +
        (if (k == 1) "" else s" CROSS JOIN w${k - 1}") + ")"
    }
    val featSel = feats.map { case (n, e) => s"$e AS $n" }.mkString(", ")
    val finalRows = names.zipWithIndex.map { case (n, j) =>
      s"SELECT '$n' AS feature, round(CAST(w$j AS DOUBLE), 6) AS weight " +
        s"FROM w3"
    }.mkString(" UNION ALL ")
    s"""WITH f AS (SELECT $qcLabelSql AS y, $featSel
           FROM documents WHERE doc_id % 5 <> 0),
       nctr AS (SELECT COUNT(*) AS c FROM f),
       ${gCte(1)}, ${wCte(1)},
       ${gCte(2)}, ${wCte(2)},
       ${gCte(3)}, ${wCte(3)}
       SELECT * FROM ($finalRows) ORDER BY feature"""
  }

  /** CORPUS DRIFT MONITOR: add-1-smoothed unigram KL(P‖Q) between the
    * even- and odd-doc_id halves of the corpus (stand-ins for two crawl
    * snapshots), reported as the top tokens by divergence contribution
    * p(w)·ln(p(w)/q(w)) — the distribution-shift alarm a pipeline runs
    * between ingestion batches before retraining decisions. Shape: one
    * corpus explode → one (token, side) count aggregate → vocab-sized
    * math; totals ride a broadcast 1-row side. Contributions are
    * integer-count-derived doubles rounded at 9 dp (the repo-wide
    * cross-engine determinism contract), ordered by the rounded score.
    */
  private def qCorpusDrift(s: SparkSession, dir: String): DataFrame = {
    val cnt = tbl(s, dir, "documents")
      .select((col("doc_id") % 2 === 0).as("in_p"),
        explode(expr(tokensSql)).as("w"))
      .groupBy("w")
      .agg(sum(when(col("in_p"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("in_p"), 0L).otherwise(1L)).as("cq"))
      // one corpus explode; totals + scores reuse it. Vocab-sized,
      // session-lifetime cache (qPerplexity contract: no unpersist point)
      .persist()
    val tot = cnt.agg(sum("cp").as("tp"), sum("cq").as("tq"),
      count(lit(1)).as("v"))
    cnt.crossJoin(broadcast(tot))
      .select(col("w"), col("cp"), col("cq"),
        round(expr(
          """((CAST(cp AS DOUBLE) + 1.0) / (CAST(tp AS DOUBLE) + CAST(v AS DOUBLE)))
             * ln(((CAST(cp AS DOUBLE) + 1.0) / (CAST(tp AS DOUBLE) + CAST(v AS DOUBLE)))
               / ((CAST(cq AS DOUBLE) + 1.0) / (CAST(tq AS DOUBLE) + CAST(v AS DOUBLE))))"""),
          9).as("kl_term"))
      .orderBy(col("kl_term").desc, col("w"))
      .limit(15)
  }

  /** Native GENERATOR surface: `LATERAL VIEW graft_shingles(text, 3)`
    * streams word-trigram FNV hashes as rows (functions/WordShingles) —
    * no per-document hash array is ever materialized. Per-doc shingle
    * totals and distinct counts; docs with fewer than 3 words emit no
    * rows (inner generator semantics), which the oracle mirrors.
    */
  private def qShingleGen(s: SparkSession, dir: String): DataFrame = {
    graft.functions.WordShingles.register(s)
    tbl(s, dir, "documents").createOrReplaceTempView("docs_shingle_v")
    s.sql(
      """SELECT doc_id, COUNT(*) AS n_shingles,
           COUNT(DISTINCT shingle_hash) AS n_distinct
         FROM docs_shingle_v
         LATERAL VIEW graft_shingles(text, 3) t AS pos, shingle_hash
         GROUP BY doc_id ORDER BY doc_id""")
  }

  /** POPULATION STABILITY INDEX between two corpus slices over length
    * bins — the standard "did the distribution move?" monitor (PSI >
    * 0.2 conventionally blocks a release). Fixed-width bins (100 chars,
    * capped at 10), add-0.5 smoothing so empty bins stay finite,
    * per-bin contribution (pa−pb)·ln(pa/pb) rounded 9dp like the KL
    * monitor. One scan, #bins-row everything after.
    */
  private def qPsiDrift(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
      .select((col("doc_id") % 2 === 0).as("in_a"),
        least(floor(col("n_chars") / 100.0), lit(9.0)).cast("int")
          .as("bin"))
    val cnt = d.groupBy("bin")
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("cb"))
    val tot = cnt.agg(sum("ca").as("ta"), sum("cb").as("tb"),
      count(lit(1)).as("nb"))
    cnt.crossJoin(broadcast(tot))
      .select(col("bin"), col("ca"), col("cb"),
        round(expr(
          """((CAST(ca AS DOUBLE)+0.5)/(CAST(ta AS DOUBLE)+0.5*CAST(nb AS DOUBLE))
              - (CAST(cb AS DOUBLE)+0.5)/(CAST(tb AS DOUBLE)+0.5*CAST(nb AS DOUBLE)))
             * ln(((CAST(ca AS DOUBLE)+0.5)/(CAST(ta AS DOUBLE)+0.5*CAST(nb AS DOUBLE)))
               / ((CAST(cb AS DOUBLE)+0.5)/(CAST(tb AS DOUBLE)+0.5*CAST(nb AS DOUBLE))))"""),
          9).as("psi_term"))
      .orderBy("bin")
  }

  /** EMBEDDING-CENTROID DRIFT per label between two corpus slices: the
    * cosine between each label's slice-A and slice-B centroids — the
    * representation-space sibling of [[qPsiDrift]] (a cosine well below
    * 1 means the label's embedding distribution moved). Per-dim means
    * accumulate as exact DECIMAL (the q_embed_dim_stats contract), so
    * the 64-value centroid pairs are engine-identical before the final
    * rounded cosine.
    */
  private def qEmbedDrift(s: SparkSession, dir: String): DataFrame = {
    val x = tbl(s, dir, "embeddings")
      .select(col("label"), (col("vec_id") % 2 === 0).as("in_a"),
        posexplode(col("embedding")).as(Seq("dim", "ef")))
      .select(col("label"), col("in_a"), col("dim"),
        col("ef").cast("double").as("e"))
    val m = x.groupBy("label", "dim")
      .agg(
        (sum(when(col("in_a"), col("e").cast("decimal(28,12)")))
          .cast("double") /
          sum(when(col("in_a"), 1L).otherwise(0L))).as("ma"),
        (sum(when(!col("in_a"), col("e").cast("decimal(28,12)")))
          .cast("double") /
          sum(when(!col("in_a"), 1L).otherwise(0L))).as("mb"))
    m.groupBy("label")
      .agg(
        sum((col("ma") * col("mb")).cast("decimal(28,12)")).as("dot"),
        sum((col("ma") * col("ma")).cast("decimal(28,12)")).as("na"),
        sum((col("mb") * col("mb")).cast("decimal(28,12)")).as("nb"))
      .select(col("label"),
        round(col("dot").cast("double") /
          (sqrt(col("na").cast("double")) *
            sqrt(col("nb").cast("double"))), 6).as("centroid_cosine"))
      .orderBy("label")
  }

  /** ROBUST OUTLIER FLAGGING (median absolute deviation): per-source
    * document-length outliers by robust z = (x − median)/MAD — the
    * curation filter that survives the heavy-tailed length
    * distributions that break mean/stddev z-scores. Two grouped exact
    * percentile passes (median, then MAD over |x − median|) + a join
    * back; group count is source-sized, so everything after the first
    * aggregate is tiny. Exact interpolated percentiles over integers
    * are engine-identical (the q_percentiles contract), so the DuckDB
    * twin hash-matches.
    */
  private def qMadOutliers(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
    val med = d.groupBy("source")
      .agg(expr("percentile(n_chars, 0.5)").as("med"))
    val dev = d.join(med, "source")
      .select(col("source"), col("doc_id"), col("n_chars"), col("med"),
        abs(col("n_chars") - col("med")).as("adev"))
    val mad = dev.groupBy("source")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(mad, "source")
      .filter(col("mad") > 0)
      .select(col("source"), col("doc_id"), col("n_chars"),
        round((col("n_chars") - col("med")) / col("mad"), 6).as("robust_z"))
      .filter(abs(col("robust_z")) > lit(2.5))
      .orderBy("source", "doc_id")
  }

  /** PAGERANK over the co-supplier graph (suppliers connected when they
    * supply the same part — distinct pairs, so the per-part fan-out is
    * bounded by suppliers-per-part, a small constant in this schema; a
    * co-occurrence graph with unbounded key cardinality would cap per
    * key first). Five synchronous iterations of
    * [[graft.ops.PageRank.ranks]], whose DECIMAL(28,12) state encoding
    * makes every iteration's ranks byte-identical under any
    * partitioning — the DuckDB twin replays the same five iterations
    * as unrolled CTEs and must hash-match exactly. Top-20 by rounded
    * rank. Depth 5 (up from 3) makes the per-iteration checkpoint's
    * lineage-truncation cost visible in the bench row.
    */
  private def qPageRank(s: SparkSession, dir: String): DataFrame = {
    // The unrestricted co-supplier graph is COMPLETE at these SFs
    // (uniform ranks — a vacuous fixture); the low-quantity slice is
    // sparse and irregular (degrees vary ~4×), so ranks genuinely
    // separate and the oracle check has teeth.
    val edges = writtenEdgesTable(s, dir)
    graft.ops.PageRank.ranks(edges, "src", "dst", iters = 5)
      .select(col("node").as("suppkey"),
        round(col("r").cast("double"), 8).as("pr"))
      .orderBy(col("pr").desc, col("suppkey"))
      .limit(20)
  }

  /** BM25 (k1=1.2, b=0.75) top-3 terms per document — the retrieval-
    * grade sibling of q_tfidf. tf/df/doclen/avgdl all derive from the
    * WRITTEN tf table ([[writtenTfTable]] — column pruning specializes
    * each consumer's partial aggregate, so exchange reuse alone would
    * re-explode the corpus once per consumer; the written table pins the
    * explode+aggregate to one execution without session-lifetime cache
    * pressure). Ranks order by the ROUNDED score so libm ulp differences
    * cannot flip rows.
    */
  private def qBm25(s: SparkSession, dir: String): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val tf = writtenTfTable(s, dir)
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val ndocs = tbl(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val avgdl = dl.agg((sum(col("dl")).cast("double") /
      count(lit(1))).as("avgdl"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    // literal structure mirrors the oracle exactly: (1.2 + 1.0) and
    // (0.25 + 0.75·dl/avgdl) fold to the same IEEE doubles in both engines
    val score = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("bm25").desc, col("word"))
    // dl (one 16-byte row per doc), ndocs and avgdl (1 row each) are the
    // small derived sides — broadcast all three so the word-keyed dfreq
    // join is the ONLY shuffle in the plan (at corpus scales where the
    // doc-length table outgrows broadcast, bucket tf by doc_id instead)
    tf.join(dfreq, "word")
      .join(broadcast(dl), "doc_id")
      .crossJoin(broadcast(ndocs))
      .crossJoin(broadcast(avgdl))
      .withColumn("bm25", round(score, 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("word"), col("bm25"))
      .orderBy("doc_id", "rk")
  }

  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\+[0-9][0-9-]{7,}"

  /** PII redaction (training-data hygiene): detect + mask emails/phones
    * with pure codegen'd regexp expressions. Deterministic synthetic PII
    * is injected per doc so the oracle sees identical inputs.
    */
  private def qPiiRedact(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .withColumn("t",
        concat(lit("contact user"), col("doc_id"), lit("@example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" "),
          col("text")))
      .select(
        col("doc_id"),
        regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(PhoneRe)).cast("long").as("n_phones"),
        length(regexp_replace(regexp_replace(col("t"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>")).as("redacted_len"))
      .orderBy("doc_id")

  /** Unicode normalization gate (functions/UnicodeNorm — the native
    * codegen'd normalizer): accent the ASCII corpus deterministically
    * (vowels → precomposed accented forms, plus an appended DECOMPOSED
    * e + U+0301 pair), then NFC-compose and accent-strip. NFC must
    * shrink the decomposed pair to one codepoint and stripping must
    * invert the accenting exactly — both emitted as checked columns so
    * a divergence from DuckDB's utf8proc semantics fails the hash gate
    * loudly. Narrow whole-stage-codegen projection; the scan is the
    * plan.
    */
  private def qUnicodeNorm(s: SparkSession, dir: String): DataFrame = {
    graft.functions.UnicodeNormalize.register(s)
    import graft.functions.UnicodeNormalize.{normalize, stripAccents}
    tbl(s, dir, "documents")
      .withColumn("base", substring(col("text"), 1, 40))
      .withColumn("raw", concat(
        // vowels -> precomposed a-grave e-acute i-circ o-uml u-uml;
        // the suffix is a DECOMPOSED e + U+0301 that NFC must fuse
        translate(col("base"), "aeiou",
          "\u00e0\u00e9\u00ee\u00f6\u00fc"),
        lit(" e\u0301clat")))
      .select(
        col("doc_id"),
        length(col("raw")).cast("long").as("n_raw"),
        length(normalize(col("raw"), "NFC")).cast("long").as("n_nfc"),
        normalize(col("raw"), "NFC").as("text_nfc"),
        stripAccents(col("raw")).as("text_stripped"),
        (stripAccents(col("raw")) === concat(col("base"), lit(" eclat")))
          .as("strip_inverts"))
      .orderBy("doc_id")
  }

  /** Incremental state vs one-shot recompute: three O(batch) merges must
    * land exactly where a single full aggregation does (count and sum
    * are associative, min/max idempotent-mergeable); sum cast from
    * DuckDB's HUGEINT back to the engine's LONG accumulator type.
    * Shared by the batch (`q_incr_stats`) and streamed
    * (`docs_stream_incr_stats`) maintenance gates.
    */
  private val incrStatsOracleSql =
    """SELECT source AS key,
         count(*) AS n_rows,
         CAST(sum(n_chars) AS BIGINT) AS sum_val,
         min(n_chars) AS min_val,
         max(n_chars) AS max_val
       FROM documents GROUP BY source ORDER BY key"""

  /** Incremental aggregate maintenance gate (ops/IncrementalAgg): the
    * corpus arrives as three disjoint batches, each merged into a
    * bucket-partitioned per-source stats state in O(batch) work; the
    * final state must equal the oracle's one-shot full aggregation.
    * The state dir is manifest-keyed under `spark.graft.scratch` (the
    * writtenTfTable pattern) and rebuilt per invocation — the gate
    * times the maintenance path itself, not a cache hit.
    */
  private def qIncrStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val hconf = s.sparkContext.hadoopConfiguration
    val docs = new Path(s"$dir/documents.parquet")
    val manifest = docs.getFileSystem(hconf).listStatus(docs)
      .sortBy(_.getPath.getName)
      .map(f => s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}")
      .mkString("|")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"incrstats-v1|$dir|$manifest"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    val scratch = new Path(s.conf.getOption("spark.graft.scratch")
      .getOrElse(sys.props("java.io.tmpdir")))
    val path = new Path(scratch, s"graft_incrstats_$key")
    path.getFileSystem(hconf).delete(path, true)
    val d = tbl(s, dir, "documents")
    (0 until 3).foreach { b =>
      graft.ops.IncrementalAgg.update(
        d.filter(pmod(col("doc_id"), lit(3)) === b),
        "source", "n_chars", path.toString, nBuckets = 8)
    }
    graft.ops.IncrementalAgg.read(s, path.toString).orderBy("key")
  }

  /** Event-time gap fill: dense hourly (event_type × hour) grid with
    * zero counts for silent hours — integer µs bucket arithmetic end to
    * end, so rows are exact. The grid is built distributed
    * (sequence+explode over the broadcast bounds), never on the driver.
    */
  private def qGapfill(s: SparkSession, dir: String): DataFrame = {
    val ev0 = tbl(s, dir, "events")
    val tsUs = eventTsUs(ev0)
    val hourUs = (tsUs - pmod(tsUs, lit(3600000000L))).as("hour_us")
    val ev = ev0.select(col("event_type"), hourUs)
    val counts = ev.groupBy("event_type", "hour_us")
      .agg(count(lit(1)).as("n_raw"))
    // gaps-and-islands dense fill: each observed hour emits its own span
    // up to the next observed hour (the first row also covers back to
    // the global lo) — no grid⟕counts join, ONE raw scan. Global lo/hi
    // arrive as a broadcast 1-row join, not an unpartitioned window, so
    // no stage funnels all rows through a single task. The always-true
    // filter on the aggregated count blocks Catalyst's agg-collapse
    // rewrite (min/max of a grouping key would otherwise be pushed to a
    // second raw scan), pinning bounds to the counts subtree so the
    // physical planner reuses its exchange instead of re-reading events.
    val wType = Window.partitionBy("event_type").orderBy("hour_us")
    val bounds = counts.filter(col("n_raw") > 0)
      .agg(min(col("hour_us")).as("lo"), max(col("hour_us")).as("hi"))
    counts
      .crossJoin(broadcast(bounds))
      .withColumn("nxt", lead(col("hour_us"), 1).over(wType))
      .withColumn("prv", lag(col("hour_us"), 1).over(wType))
      .select(col("event_type"), col("hour_us"), col("n_raw"),
        explode(expr(
          """sequence(
               CASE WHEN prv IS NULL THEN lo ELSE hour_us END,
               CASE WHEN nxt IS NULL THEN hi ELSE nxt - 3600000000 END,
               3600000000)""")).as("h"))
      .select(col("event_type"), col("h").as("hour_us"),
        when(col("h") === col("hour_us"), col("n_raw")).otherwise(lit(0L))
          .as("n"))
      .orderBy("event_type", "hour_us")
  }

  /** Ordered funnel (signup → view → click → purchase): each stage's
    * first timestamp must follow the previous stage's. Four keyed
    * aggregations on the SAME user_id partitioning (AQE reuses the
    * exchange) — never a per-user driver loop.
    */
  private def qFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev0 = tbl(s, dir, "events")
    val ev = ev0
      .select(col("user_id"), col("event_type"), eventTsUs(ev0).as("ts_us"))
    val t1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts_us")).as("t1"))
    def nextStage(prev: DataFrame, prevCol: String, etype: String,
        outCol: String): DataFrame =
      ev.filter(col("event_type") === etype)
        .join(prev, "user_id")
        .filter(col("ts_us") > col(prevCol))
        .groupBy("user_id").agg(min(col("ts_us")).as(outCol))
    val t2 = nextStage(t1, "t1", "view", "t2")
    val t3 = nextStage(t2, "t2", "click", "t3")
    val t4 = nextStage(t3, "t3", "purchase", "t4")
    Seq(("1_signup", t1), ("2_view", t2), ("3_click", t3), ("4_purchase", t4))
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_users")).withColumn("step", lit(name))
      }
      .reduce(_.unionAll(_))
      .select(col("step"), col("n_users"))
      .orderBy("step")
  }

  /** Cohort retention: users grouped by first-seen day, counted per
    * day-offset in which they were active — pure integer day math, two
    * aggregations, one join on user_id.
    */
  private def qRetention(s: SparkSession, dir: String): DataFrame = {
    // integer DIV end to end — double division then cast could mis-round
    // at day boundaries
    val ev = withTsUs(tbl(s, dir, "events"))
      .select(col("user_id"),
        expr("ts_us DIV 86400000000").as("day"))
    // cohort_day via a window over the distinct (user, day) set — min
    // over distinct days == min over raw events, and unlike a self-join
    // the plan is a single linear pipeline: ONE scan, no dual-consumed
    // subtree to rely on runtime exchange reuse for
    val wUser = Window.partitionBy("user_id")
    ev.distinct()
      .withColumn("cohort_day", min(col("day")).over(wUser))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_day", "offset_days")
  }

  /** Dedup keep-BEST (argmax), not keep-first: normalize content
    * (lowercase, letters only), group by the normalized key, keep the
    * highest-quality doc per group via a ranked window — the shape every
    * corpus dedup uses when replicas differ in quality.
    */
  private def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val normKey = md5(regexp_replace(lower(col("text")), "[^a-z]", ""))
    val w = Window.partitionBy(col("norm_key"))
      .orderBy(col("quality").desc, col("doc_id"))
    tbl(s, dir, "documents")
      .select(col("doc_id"), normKey.as("norm_key"),
        graft.ops.TextAnalysis.qualityScore(col("text")).as("quality"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_dups", count(lit(1)).over(Window.partitionBy(col("norm_key"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("norm_key"), col("n_dups"), col("quality"))
      .orderBy("doc_id")
  }

  /** NOT IN with NULL semantics — the null-aware anti-join: one NULL in
    * the subquery list makes every non-match UNKNOWN (filtered), so
    * n_with_null is 0 while n_no_null counts order-less customers.
    */
  private def qNotInNull(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "customer").createOrReplaceTempView("customer_v")
    tbl(s, dir, "orders").createOrReplaceTempView("orders_nn_v")
    s.sql(
      """SELECT
           (SELECT COUNT(*) FROM customer_v
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders_nn_v))
             AS n_no_null,
           (SELECT COUNT(*) FROM customer_v
            WHERE c_custkey NOT IN
              (SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL
                           ELSE o_custkey END FROM orders_nn_v))
             AS n_with_null""")
  }

  /** Discrete percentiles (PERCENTILE_DISC WITHIN GROUP): returns actual
    * data values, so the hash compare is exact — no interpolation.
    */
  private def qPercentileDisc(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "lineitem").createOrReplaceTempView("lineitem_pd_v")
    s.sql(
      """SELECT l_returnflag,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)
             AS med_qty_disc,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)
             AS p90_price_disc
         FROM lineitem_pd_v GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  /** Native SESSION WINDOWS (session_window built-in) — the third
    * independent implementation of 30-min-gap sessionization next to the
    * batch lag+flag-sum (`events_sessions`) and the custom-state
    * streaming fold (`events_stream_sessions`), all checked against the
    * same DuckDB truth shape. Session end = last event + gap by
    * definition of session_window.
    */
  private def qSessionWindow(s: SparkSession, dir: String): DataFrame =
    withTsEvent(tbl(s, dir, "events"))
      .groupBy(col("user_id"), session_window(col("ts_event"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        unix_micros(col("session_window.end")).as("end_us"),
        col("n_events"))
      .orderBy("user_id", "start_us")

  /** supplier ⋈ nation ⋈ region rollup — exercises the last otherwise
    * untouched base table; every dim is O(1)-size and broadcast.
    */
  private def qSupplierStats(s: SparkSession, dir: String): DataFrame = {
    val sup = tbl(s, dir, "supplier")
    val n = tbl(s, dir, "nation")
    val r = tbl(s, dir, "region")
    sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        dsum(col("s_acctbal")).as("total_acctbal"),
        min(col("s_name")).as("first_supplier"))
      .orderBy("r_name")
  }

  /** JSON payload column on the events stream table: extract the typed
    * field from `props` and aggregate — the semi-structured ingestion
    * shape (get_json_object is codegen'd; no UDF).
    */
  private def qPropsJson(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Sequence packing (training-batch prep): assign each doc to the
    * fixed-budget (2048-token) pack where its concatenation offset
    * starts — the concatenate-then-chunk packing LLM pipelines use.
    * Packing is per shard (doc_id mod 16), so the cumulative-offset
    * window parallelizes across shards; integer div/mod math end to end
    * keeps both engines exact.
    */
  private def qSeqPacking(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 16).as("shard"),
        expr("(length(text) + 3) div 4").cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("pack_id", expr("(cum - tok) div 2048").cast("long"))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("toks"))
      .orderBy("shard", "pack_id")
  }

  /** Token-budget sampling (corpus mixing): per domain shard, admit docs
    * in a deterministic priority order (shortest first, id tiebreak)
    * until the running token total crosses a 20k budget — the "fill each
    * mixture bucket to its token share" curation op. One keyed window
    * per domain, fully parallel across domains.
    */
  private def qTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("domain").orderBy("tok", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tbl(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 8).as("domain"),
        expr("(length(text) + 3) div 4").cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .filter(col("cum") <= 20000)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), max(col("cum")).as("used_tokens"),
        max(col("tok")).as("max_doc_tokens"))
      .orderBy("domain")
  }

  /** Schema-evolution union (unionByName + allowMissingColumns): two
    * ingest generations with different column sets — the old batch
    * lacks `value`, the new batch lacks `props` — align by NAME with
    * nulls for absent columns, never by position.
    */
  private def qUnionByName(s: SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events")
    val oldGen = ev.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("event_type"), col("props"))
    val newGen = ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("event_type"), col("value"))
    oldGen.unionByName(newGen, allowMissingColumns = true)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("props")).as("n_props"),
        count(col("value")).as("n_value"),
        sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("sum_value"))
      .orderBy("event_type")
  }

  /** VARIANT column (Spark 4 semi-structured type): parse the JSON
    * payload ONCE into the binary variant encoding, then do all field
    * access via variant_get — the open-schema ingestion shape (vs
    * q_props_json's per-path string re-parsing). Missing paths surface
    * as NULLs, counted per type.
    */
  private def qVariant(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'long')").as("k"),
        expr("variant_get(v, '$.missing', 'long')").as("m"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        count(col("m")).as("n_missing"))
      .orderBy("event_type")

  /** WITH RECURSIVE (Spark 4 recursive CTE): a 5-hop chain walk over
    * nation keys (k → k+5) — the data-driven transitive-closure shape
    * that dedup clustering uses, through the SQL front-end on both
    * engines.
    */
  private def qRecursiveCte(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "nation").createOrReplaceTempView("nation_rc_v")
    s.sql(
      """WITH RECURSIVE anc(k, root, depth) AS (
           SELECT n_nationkey, n_nationkey, 0 FROM nation_rc_v
           WHERE n_nationkey < 5
           UNION ALL
           SELECT n.n_nationkey, a.root, a.depth + 1
           FROM nation_rc_v n JOIN anc a ON n.n_nationkey = a.k + 5)
         SELECT root, COUNT(*) AS chain_len, MAX(depth) AS max_depth
         FROM anc GROUP BY root ORDER BY root""")
  }

  /** Aggregate FILTER clauses — per-branch conditional aggregation
    * without CASE scaffolding, one pass.
    */
  private def qFilterAgg(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "lineitem").createOrReplaceTempView("lineitem_fa_v")
    s.sql(
      """SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_quantity < 10) AS n_small,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
             FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_discounted,
           MAX(l_quantity) FILTER (WHERE l_linestatus = 'F') AS max_qty_f
         FROM lineitem_fa_v GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  /** MAP column surface: build per-customer priority→spend maps
    * (map_from_entries over a pre-aggregated, hence key-unique, set),
    * probe with element_at, then explode back to rows — the oracle
    * states the same truth map-free, proving the map round-trip is
    * lossless.
    */
  private def qMapFuncs(s: SparkSession, dir: String): DataFrame = {
    val per = tbl(s, dir, "orders")
      .groupBy("o_custkey", "o_orderpriority")
      .agg(dsum(col("o_totalprice")).as("v"))
    per.groupBy("o_custkey")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("o_orderpriority").as("k"), col("v"))))).as("m"))
      .select(col("o_custkey"),
        size(col("m")).as("n_prios"),
        element_at(col("m"), "1-URGENT").as("urgent_total"),
        explode(col("m")).as(Seq("prio", "total")))
      .select(col("o_custkey"), col("n_prios"), col("urgent_total"),
        col("prio"), col("total"))
      .orderBy("o_custkey", "prio")
  }

  /** Streaming exact dedup AS A GATE QUERY: two file-stream sources over
    * the same parquet are unioned (every event arrives twice — the
    * at-least-once replay shape), then dropDuplicatesWithinWatermark
    * evicts its key state past the watermark (bounded state — a plain
    * dropDuplicates would hold every key forever). Each batch's per-type
    * PARTIAL counts land in the delta log (map-side combine: the log
    * holds types×batches rows, never events); dedup guarantees each
    * event contributes exactly once across batches, so the log's summed
    * partials equal the batch DISTINCT truth the oracle computes.
    */
  private def qEventsStreamDedup(s: SparkSession, dir: String): DataFrame = {
    val schema = tbl(s, dir, "events").schema
    def src = withTsEvent(
      s.readStream.schema(schema).parquet(eventsStreamDir(dir).toString))
    val deduped = src.unionAll(src)
      .withWatermark("ts_event", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
    val log = streamToDeltaLog(s, deduped, "append",
      prepare = _.groupBy("event_type").agg(count(lit(1)).as("n")))
    val logSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType)))
    readDeltaLog(s, log, logSchema)
      .groupBy("event_type")
      .agg(sum(col("n")).as("n"))
      .orderBy("event_type")
  }

  /** Within-document repetition (Gopher-style quality rule): fraction of
    * word trigrams that are repeats of an earlier trigram in the same
    * doc. High rep_frac = boilerplate/spam → filter before training.
    * Per-doc aggregation only — embarrassingly parallel, no cross-doc
    * state.
    */
  private def qRepetition(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        expr(tokensSql)
          .as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 2),
             i -> concat_ws(' ', slice(ws, i, 3)))""")).as("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"),
        countDistinct(col("g")).as("n_uniq"))
      .select(col("doc_id"), col("n_tri"), col("n_uniq"),
        round(lit(1.0) - col("n_uniq") / col("n_tri"), 6).as("rep_frac"))
      .orderBy("doc_id")

  /** One persisted MinHash band index per testdata dir: written once
    * over the oldest 90% of docs; every invocation probes the newest 10%
    * as the "incoming ingest batch".
    */
  private val minhashIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** Incremental dedup against the persisted index
    * (ops/Dedup.writeMinhashIndex / probeMinhashIndex): the probe ships
    * only the batch's banded keys (broadcast); the corpus-side index is
    * hash-probed in place — O(batch) per ingest, never O(corpus).
    * Rows-only driver check; probe == one-shot-pair-search parity is
    * asserted oracle-grade in OpsSpec.
    */
  private def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val (path, cut) = minhashIndexCache.computeIfAbsent(dir, { d =>
      val docs0 = tbl(s, d, "documents").select(col("doc_id"), col("text"))
      val maxId = docs0.agg(max(col("doc_id"))).head().getLong(0)
      val c = maxId * 9 / 10
      val built = scratchBuildOnce(s, "mh_index", "documents", d) { p =>
        graft.ops.Dedup.writeMinhashIndex(
          docs0.filter(col("doc_id") <= c), "doc_id", "text", p)
      }
      (built, c)
    })
    val batch = tbl(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") > cut)
    graft.ops.Dedup
      .probeMinhashIndex(s, path, batch, "doc_id", "text", threshold = 0.5)
      .select(col("old_id"), col("new_id"),
        round(col("est_jaccard"), 6).as("est_jaccard"))
      .orderBy("old_id", "new_id")
  }

  /** Benchmark decontamination (training-data hygiene): flag training
    * docs sharing any word 8-gram with the benchmark slice (doc_id<50
    * stands in for a held-out eval set). One tokenize+explode subtree
    * feeds both sides; the benchmark gram set is bounded by the eval
    * suite's size — constant w.r.t. corpus scale — so it broadcasts, and
    * the training side never shuffles on the gram key. The contamination
    * ratio is per-doc distinct-gram overlap.
    */
  private def qContamination(s: SparkSession, dir: String): DataFrame = {
    val toks = tbl(s, dir, "documents")
      .select(col("doc_id"),
        expr(tokensSql)
          .as("ws"))
      .filter(size(col("ws")) >= 8)
    val grams = toks.select(col("doc_id"),
      explode(expr(
        """transform(sequence(1, size(ws) - 7),
             i -> concat_ws(' ', slice(ws, i, 8)))""")).as("g"))
      .distinct()
    val bench = grams.filter(col("doc_id") < 50).select("g").distinct()
    val train = grams.filter(col("doc_id") >= 50)
    val tot = train.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val hit = train.join(broadcast(bench), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    // hit rows all have n_shared >= 1, so "contaminated docs only" is a
    // plain inner join against the per-doc totals
    tot.join(hit, Seq("doc_id"))
      .select(col("doc_id"), col("n_shared"), col("n_grams"),
        round(col("n_shared") / col("n_grams"), 6).as("ratio"))
      .orderBy("doc_id")
  }

  /** Stream-static join AS A GATE QUERY: the events file-stream joins the
    * static customer dimension (re-resolved per micro-batch — the Spark
    * enrichment-join shape; the planner broadcasts it when it fits, and at
    * 100 TB an SF-scaling dim falls back to a per-batch shuffle join
    * without any code change). The stateless join feeds a keyed stateful
    * aggregate over segment×type (bounded state: key cardinality, not
    * event count), update-mode deltas into the distributed delta log,
    * gate result = keyed upsert of the log. Hash-matches the batch
    * join+agg oracle. (The parquet log also carries a NULL total_value
    * group natively — the old driver map needed explicit boxing.)
    */
  private def qEventsStreamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    val schema = tbl(s, dir, "events").schema
    val dim = tbl(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val joined = s.readStream.schema(schema)
      .parquet(eventsStreamDir(dir).toString)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total_dec"))
      .select(col("c_mktsegment"), col("event_type"), col("n"),
        col("total_dec").cast("double").as("total_value"))
    val log = streamToDeltaLog(s, joined, "update")
    readDeltaLogUpsert(s, log, joined.schema,
      Seq("c_mktsegment", "event_type"))
      .orderBy("c_mktsegment", "event_type")
  }

  /** Unigram language-model quality score (perplexity proxy): build the
    * corpus word-frequency table, score every document by its mean
    * negative log-probability, -ln(cnt/total) = ln total - ln cnt. High
    * mean_nll = rare-word soup (OCR junk, gibberish) → filter before
    * training. Exactly TWO corpus scans — the inherent minimum for
    * corpus-LM scoring (one builds the frequency table, one scores). The
    * global token total comes from the doc-sized per-doc aggregate, which
    * is persisted: column pruning would otherwise specialize the total
    * branch's partial aggregate (dropping sum_lncnt), defeat AQE exchange
    * reuse, and rescan the corpus a third time. The cache is #docs-sized
    * stats, not corpus-sized, and the CacheManager dedups it across
    * invocations — storage is bounded at ONE entry per session, held
    * until session stop (the lazy-DataFrame contract leaves no natural
    * unpersist point). Determinism across engines: per-token ln cnt is rounded
    * to 9dp and accumulated as DECIMAL(28,9), so the sum is exact and
    * order-independent (double summation order differs between Spark
    * partitions and the oracle).
    */
  private def qPerplexity(s: SparkSession, dir: String): DataFrame = {
    val toks = tbl(s, dir, "documents")
      .select(col("doc_id"), explode(
        expr(tokensSql))
        .as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    val perDoc = toks.join(vocab, "w")
      .select(col("doc_id"),
        expr("CAST(round(ln(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(28,9))")
          .as("lncnt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("lncnt")).as("sum_lncnt"))
      .persist()
    val totalDf = perDoc.agg(sum(col("n_tok")).as("total"))
    perDoc.crossJoin(broadcast(totalDf))
      .select(col("doc_id"), col("n_tok"),
        round(expr("ln(CAST(total AS DOUBLE))") -
          col("sum_lncnt").cast("double") / col("n_tok"), 6)
          .as("mean_nll"))
      .orderBy("doc_id")
  }

  /** DSIR-style importance scoring (Data Selection via Importance
    * Resampling, arXiv:2302.03169, reduced to its unigram
    * log-likelihood-ratio core): score each raw document by how
    * target-like its word distribution is — Σ_w n_occ · [ln(cnt_t(w)+1)
    * − ln(cnt_r(w)+1)] + n_tok · [ln(R+V) − ln(T+V)], i.e. the add-1
    * smoothed ln p_target/p_raw of the document. doc_id < 50 is the
    * target slice (the q_contamination convention). Determinism is the
    * q_perplexity recipe: per-word ln ratios rounded to 9 dp and summed
    * as exact DECIMAL (associativity-proof under any partitioning);
    * the per-token constant applies once per doc at the end, rounded
    * to 6 dp. Shape: two word-keyed aggregates + one word-keyed join
    * back + a broadcast 1-row totals side — no all-pairs, no driver
    * state. The curation use: rank raw docs by dsir_score and keep the
    * top slice to shift a corpus toward a target domain.
    */
  private def qDsirScore(s: SparkSession, dir: String): DataFrame = {
    val toks = tbl(s, dir, "documents")
      .select(col("doc_id"), explode(expr(tokensSql)).as("w"))
    val tgtCnt = toks.filter(col("doc_id") < 50)
      .groupBy("w").agg(count(lit(1)).as("cnt_t"))
    val raw = toks.filter(col("doc_id") >= 50)
    val rawCnt = raw.groupBy("w").agg(count(lit(1)).as("cnt_r"))
    val vocab = tgtCnt.join(rawCnt, Seq("w"), "full_outer")
      .select(col("w"),
        coalesce(col("cnt_t"), lit(0L)).as("cnt_t"),
        coalesce(col("cnt_r"), lit(0L)).as("cnt_r"))
    val stats = vocab.agg(
      sum(col("cnt_t")).as("tt"), sum(col("cnt_r")).as("tr"),
      count(lit(1)).as("v"))
    val wTerm = vocab.select(col("w"),
      expr("""CAST(round(ln(CAST(cnt_t + 1 AS DOUBLE)) -
                         ln(CAST(cnt_r + 1 AS DOUBLE)), 9)
              AS DECIMAL(28,9))""").as("llr"))
    raw.join(wTerm, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("llr")).as("sum_llr"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("n_tok"),
        round(col("sum_llr").cast("double") +
          col("n_tok") * (expr("ln(CAST(tr + v AS DOUBLE))") -
            expr("ln(CAST(tt + v AS DOUBLE))")), 6)
          .as("dsir_score"))
      .orderBy("doc_id")
  }

  /** Corpus-frequency boilerplate detection: the fraction of a document's
    * distinct word trigrams that occur in >= 50 documents (including
    * this one — document frequency, not "other documents"). The
    * cross-doc sibling of q_repetition (within-doc) and q_contamination
    * (vs a held-out set): high common_frac = templated/boilerplate text.
    * Gram document-frequency agg and the join back both shuffle on the
    * gram key, so the exchange is reused; no driver-side state.
    */
  private def qBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val grams = tbl(s, dir, "documents")
      .select(col("doc_id"),
        expr(tokensSql)
          .as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 2),
             i -> concat_ws(' ', slice(ws, i, 3)))""")).as("g"))
      .distinct()
    val gramDf = grams.groupBy("g").agg(count(lit(1)).as("df"))
    grams.join(gramDf, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 50, 1L).otherwise(0L)).as("n_common"))
      .select(col("doc_id"), col("n_grams"), col("n_common"),
        round(col("n_common") / col("n_grams"), 6).as("common_frac"))
      .orderBy("doc_id")
  }

  /** SCD2 / change-data-capture compression: collapse each user's event
    * stream into validity intervals over the event_type dimension — a row
    * survives only where the type CHANGES (lag), and its interval closes
    * at the next change (lead); the open interval (valid_to_us NULL) is
    * the current state. Both windows share one partitioning+sort, so the
    * plan is a single keyed shuffle. Integer epoch-us math end to end.
    */
  private def qScd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // order by the RAW ts column (unique per user in this corpus, at
    // any precision the fixture ships), not a coarser truncation — and
    // the oracle's lag/lead order by the same raw ts; µs only in the
    // OUTPUT columns
    val w = Window.partitionBy("user_id").orderBy("ts")
    val ev0 = tbl(s, dir, "events")
    ev0
      .select(col("user_id"), col("event_type"), col("ts"),
        eventTsUs(ev0).as("ts_us"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull ||
        col("prev_type") =!= col("event_type"))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .select(col("user_id"), col("event_type"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"))
      .orderBy("user_id", "valid_from_us")
  }

  /** First/last-touch attribution via min_by/max_by keyed on the event
    * time — the argmin/argmax AGGREGATE surface (no window, no
    * self-join): one keyed shuffle per user. ts is unique per user in
    * this corpus, so the argmax is total-order deterministic.
    */
  private def qAttribution(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy("user_id")
      .agg(expr("min_by(event_type, ts)").as("first_type"),
        expr("max_by(event_type, ts)").as("last_type"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .orderBy("user_id")

  /** Boolean + bitwise aggregate surface: bool_and/bool_or (SQL
    * every/any), count_if, and bit_and/bit_or/bit_xor over the customer
    * key — all codegen'd built-ins, one keyed shuffle.
    */
  private def qBoolBitAgg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer")
      .groupBy("c_nationkey")
      .agg(expr("bool_and(c_acctbal > 0)").as("all_positive"),
        expr("bool_or(c_acctbal < 0)").as("any_negative"),
        expr("count_if(c_acctbal < 0)").as("n_negative"),
        expr("bit_and(c_custkey)").as("key_and"),
        expr("bit_or(c_custkey)").as("key_or"),
        expr("bit_xor(c_custkey)").as("key_xor"))
      .orderBy("c_nationkey")

  /** Deterministic pagination: global sort on a unique composite key,
    * then OFFSET + LIMIT (Spark pushes both into a single
    * TakeOrderedAndProject — no full global sort is materialized).
    */
  private def qOrderOffset(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(100)
      .limit(20)

  /** Ordinal generator surface: posexplode gives each exploded word its
    * 1-based position; the per-doc positional checksum is an
    * order-independent integer sum. Narrow plan: explode + one keyed agg.
    */
  private def qPosexplode(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"),
        posexplode(expr(tokensSql)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        // long math before the multiply: the int product would overflow
        // (and throw under ANSI mode) on huge documents; the oracle
        // computes in BIGINT
        sum((col("pos") + 1).cast("long") * length(col("col")))
          .as("checksum"))
      .orderBy("doc_id")

  /** Retrieval-quality evaluation: kNN classification over the labeled
    * embeddings table. The probe set (vec_id < 20 — an eval suite, O(1)
    * w.r.t. corpus scale) broadcasts; the corpus is scanned once; the
    * per-probe top-10 runs as a rank window that Spark executes with
    * WindowGroupLimit pushdown (per-partition heaps, no global sort).
    * Rank is over the 4dp-ROUNDED cosine with the neighbor id as
    * tiebreak, so ordering is identical in both engines (the raw-double
    * rank could differ in the last ulp). n_same = top-10 neighbors
    * sharing the probe's label; top1_label = nearest neighbor's label.
    */
  private def qKnnEval(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.CosineSimilarity.register(s)
    val e = tbl(s, dir, "embeddings")
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("label").as("own_label"),
        col("embedding").as("qv"))
    val corpus = e.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("nbr_id"), col("label").as("nbr_label"),
        col("embedding").as("nv"))
    val scored = corpus.crossJoin(broadcast(probes))
      .select(col("probe_id"), col("own_label"), col("nbr_id"),
        col("nbr_label"),
        round(graft.functions.CosineSimilarity
          .cosine(col("nv"), col("qv")), 4).as("cos4"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos4").desc, col("nbr_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .groupBy("probe_id", "own_label")
      .agg(sum(when(col("nbr_label") === col("own_label"), 1L)
          .otherwise(0L)).as("n_same"),
        expr("min_by(nbr_label, rnk)").as("top1_label"))
      .orderBy("probe_id")
  }

  /** BPE merge-candidate counting — the inner step of byte-pair-encoding
    * vocab induction (Sennrich et al. 2016, arXiv:1508.07909) run at
    * corpus scale: count adjacent symbol pairs WEIGHTED BY WORD
    * FREQUENCY, emit the top candidates. The corpus collapses to the
    * word-frequency table first (one keyed shuffle, map-side combined),
    * so pair explosion runs over DISTINCT words — O(vocab × word-length)
    * rows, not O(corpus tokens). Global top-k is TakeOrderedAndProject
    * (per-partition heads, never a single-partition sort); ties at the
    * cut are broken by the pair text, so the row set is deterministic.
    * Iterating the full BPE loop reapplies this with a merged symbol
    * table — the counting shape is identical each round.
    */
  private def qBpePairs(s: SparkSession, dir: String): DataFrame = {
    val wf = tbl(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z0-9_]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    wf.filter(length(col("word")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), g -> substring(word, g, 2))"))
        .as("pair"), col("freq"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(30)
  }

  /** PERMISSIVE corrupt-record ingest AS A GATE QUERY: JSON payloads
    * built from orders with every 13th row truncated mid-object; the
    * engine must parse the good rows exactly and surface the corrupt
    * ones as NULLs (never fail the query — the quarantine posture
    * SourcesSpec checks file-level). Truth is known by construction,
    * so the oracle aggregates the source table directly, including the
    * parsed-value sum that proves good-row values round-trip through
    * JSON bit-exactly.
    */
  private def qCorruptJson(s: SparkSession, dir: String): DataFrame = {
    val raw = tbl(s, dir, "orders").select(
      col("o_orderkey"),
      when(col("o_orderkey") % 13 === 0,
        concat(lit("{\"k\":"), col("o_orderkey"), lit(",\"p\":")))
        .otherwise(to_json(struct(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100).cast("long").as("p"))))
        .as("js"))
    raw
      .select(col("o_orderkey"),
        from_json(col("js"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, p BIGINT"))
          .as("r"))
      .groupBy((col("o_orderkey") % 13 === 0).as("planted_corrupt"))
      .agg(count(lit(1)).as("n"),
        count(col("r.k")).as("n_parsed"),
        coalesce(sum(col("r.p")), lit(0L)).as("sum_cents"))
      .orderBy("planted_corrupt")
  }

  /** Salted equi-join gate (ops/Skew.saltedJoin): the hot-key spread
    * join — big side salted on the join key, small side replicated
    * once per salt — must be RESULT-identical to the plain equi-join,
    * which is exactly what the DuckDB oracle computes. Aggregated to a
    * bounded per-nation rollup so the gate output is stable.
    */
  private def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val big = tbl(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"))
    val small = tbl(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    graft.ops.Skew
      .saltedJoin(big, small, "l_suppkey", "s_suppkey",
        salts = 8, spreadCol = "l_suppkey")
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("s_nationkey")
  }

  /** Small-file compaction gate (ops/Compaction.compactSorted): orders
    * rewritten once into ~4 sort-ordered files under the scratch URI,
    * then read back and aggregated — the rewrite must be perfectly
    * content-preserving (the oracle aggregates the ORIGINAL table), and
    * the sorted layout's footer-pruning value is spec-checked
    * separately. Write-once keyed by the source manifest, like every
    * persisted gate fixture.
    */
  private def qCompaction(s: SparkSession, dir: String): DataFrame = {
    val compacted = scratchBuildOnce(s, "compact_orders", "orders", dir) {
      p =>
        graft.ops.Compaction.compactSorted(
          s, s"$dir/orders.parquet", p, Seq("o_orderkey"),
          targetBytes = 256L << 10)
        ()
    }
    s.read.parquet(compacted)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("total_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus")
  }

  /** Z-order layout gate (ops/ZOrder.writeZOrdered): lineitem rewritten
    * once into a Morton-clustered layout on (l_orderkey, l_partkey),
    * then probed with a 2-D box predicate — content must equal the same
    * box filter on the raw table (the oracle); the multi-dimension
    * file-skipping the layout buys is spec-checked mechanically in
    * OpsSpec. The box spans both dimensions so a single-column sort
    * could not satisfy it from one file range.
    */
  private def qZorder(s: SparkSession, dir: String): DataFrame = {
    val zpath = scratchBuildOnce(s, "zorder_lineitem", "lineitem", dir) {
      p =>
        graft.ops.ZOrder.writeZOrdered(
          tbl(s, dir, "lineitem"), Seq("l_orderkey", "l_partkey"), p,
          numFiles = 8)
    }
    s.read.parquet(zpath)
      .filter(col("l_orderkey") <= 2000 && col("l_partkey") <= 150)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_orderkey")).as("min_okey"),
        max(col("l_partkey")).as("max_pkey"))
      .orderBy("l_returnflag")
  }

  /** Distributed BPE tokenizer TRAINING (ops/BpeTrainer): 8 full merge
    * iterations over the corpus word-frequency table — pair-count
    * shuffle + 1-row arg-max collect + narrow merge per iteration, the
    * vocabulary-learning loop a training-data pipeline runs where the
    * reference only SERVES a pretrained tokenizer (q_bpe_pairs counts
    * one round's candidates; this learns the actual merge sequence).
    * Output: the learned merge table (step, lhs, rhs, n). The DuckDB
    * oracle replays all 8 stages as chained CTEs with the identical
    * brace-wrapped greedy replace — see [[bpeTrainOracleSql]].
    */
  private def qBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (merges, _) = graft.ops.BpeTrainer
      .train(corpusWordFreq(s, dir), "word", "freq", numMerges = 8)
    merges.map(m => (m.step, m.lhs, m.rhs, m.n))
      .toDF("step", "lhs", "rhs", "n")
      .orderBy("step")
  }

  /** One learned merge list per testdata dir: training is the
    * vocabulary-BUILD step (a persisted artifact in production, like
    * the LSH/IVF index layouts), so the encode gate trains once and
    * every later invocation measures the encode path alone.
    */
  private val bpeMergesCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[graft.ops.BpeTrainer.Merge]]()

  private def corpusWordFreq(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z0-9_]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Tokenizer ENCODE path (ops/BpeTrainer.encode): the 8 learned
    * merges applied in training order to the word table — a chained
    * narrow replace projection, zero shuffles beyond the output sort.
    * Output is each word's final segmentation + token count; the
    * oracle replays training AND encoding (its last CTE stage IS the
    * encoding, since the word column rides through every stage).
    */
  private def qBpeEncode(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeMergesCache.computeIfAbsent(dir, { d =>
      graft.ops.BpeTrainer
        .train(corpusWordFreq(s, d), "word", "freq", numMerges = 8)._1
    })
    graft.ops.BpeTrainer.encode(corpusWordFreq(s, dir), "word", "freq", merges)
      .select(col("word"), col("n_tokens"), col("seq"))
      .orderBy("word")
  }

  /** Corpus token accounting under the LEARNED tokenizer: per-document
    * token count = Σ over words of occurrences × n_tokens(word) — the
    * statistic every token-budgeted mixing/packing step consumes
    * (q_token_budget / q_seq_packing price in fixed whitespace tokens;
    * this prices in the trained vocabulary). The distinct-word encode
    * table is O(vocab) — the planner broadcasts it here; at
    * beyond-broadcast vocabularies the word-keyed join shuffles, with
    * no code change. Oracle: the training replay's final stage feeds
    * the same join+sum.
    */
  private def qBpeDocTokens(s: SparkSession, dir: String): DataFrame = {
    val merges = bpeMergesCache.computeIfAbsent(dir, { d =>
      graft.ops.BpeTrainer
        .train(corpusWordFreq(s, d), "word", "freq", numMerges = 8)._1
    })
    val enc = graft.ops.BpeTrainer
      .encode(corpusWordFreq(s, dir), "word", "freq", merges)
      .select(col("word"), col("n_tokens"))
    val docWords = tbl(s, dir, "documents")
      .select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z0-9_]+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n_occ"))
    docWords.join(enc, "word")
      .groupBy("doc_id")
      .agg(sum(col("n_occ") * col("n_tokens")).as("n_bpe_tokens"),
        sum(col("n_occ")).as("n_words"))
      .orderBy("doc_id")
  }

  /** Hybrid retrieval with reciprocal-rank fusion (k=60) — the
    * semantic-search composition the reference's embedding service
    * exists to power: a VECTOR ranked list (brute-force cosine of the
    * probe embeddings, the q_knn_eval shape: broadcast probes ×
    * one corpus scan, rounded-cosine WindowGroupLimit top-20) fused
    * with a LEXICAL ranked list (distinct-word Jaccard computed from
    * the shared write-once TF table: probe words broadcast onto one
    * word-keyed join, never a corpus×corpus comparison), then
    * `rrf = Σ 1/(60+rank)` over both lists, top-10 per probe.
    * Doc-count sides are broadcast like qBm25's dl (same caveat: at
    * corpus scales beyond broadcast, key the nd join by doc id).
    * Every ranking is rounded + id-tiebroken, so the DuckDB replay is
    * exact.
    */
  private def qHybridRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.CosineSimilarity.register(s)
    val e = tbl(s, dir, "embeddings")
    val pv = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("qv"))
    val cv = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("nbr_id"), col("embedding").as("nv"))
    val wV = Window.partitionBy("probe_id")
      .orderBy(col("cos4").desc, col("nbr_id"))
    val vr = cv.crossJoin(broadcast(pv))
      .select(col("probe_id"), col("nbr_id"),
        round(graft.functions.CosineSimilarity
          .cosine(col("nv"), col("qv")), 4).as("cos4"))
      .withColumn("vrank", row_number().over(wV))
      .filter(col("vrank") <= 20)
      .select(col("probe_id"), col("nbr_id"),
        col("vrank").cast("long").as("vrank"))

    val tf = writtenTfTable(s, dir) // (doc_id, word, tf): one row per pair
    val nw = tf.groupBy("doc_id").agg(count(lit(1)).as("nw"))
    val pw = tf.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("word"))
    val inter = tf.filter(col("doc_id") >= 5)
      .select(col("doc_id").as("nbr_id"), col("word"))
      .join(broadcast(pw), "word")
      .groupBy("probe_id", "nbr_id").agg(count(lit(1)).as("inter"))
    val wL = Window.partitionBy("probe_id")
      .orderBy(col("jac").desc, col("nbr_id"))
    val lr = inter
      .join(broadcast(nw.select(col("doc_id").as("probe_id"),
        col("nw").as("np"))), "probe_id")
      .join(broadcast(nw.select(col("doc_id").as("nbr_id"),
        col("nw").as("nd"))), "nbr_id")
      .withColumn("jac", round(col("inter").cast("double") /
        (col("np") + col("nd") - col("inter")).cast("double"), 6))
      .withColumn("lrank", row_number().over(wL))
      .filter(col("lrank") <= 20)
      .select(col("probe_id"), col("nbr_id"),
        col("lrank").cast("long").as("lrank"))

    val wF = Window.partitionBy("probe_id")
      .orderBy(col("rrf6").desc, col("nbr_id"))
    vr.join(lr, Seq("probe_id", "nbr_id"), "full_outer")
      .withColumn("rrf6", round(
        coalesce(lit(1.0) / (lit(60L) + col("vrank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60L) + col("lrank")), lit(0.0)), 6))
      .withColumn("rnk", row_number().over(wF).cast("long"))
      .filter(col("rnk") <= 10)
      .select(col("probe_id"), col("rnk"), col("nbr_id"),
        col("vrank"), col("lrank"), col("rrf6"))
      .orderBy("probe_id", "rnk")
  }

  /** Point-in-time snapshot (feature-store read): the per-user state
    * valid at a fixed instant, read from the SCD2 intervals — the row
    * whose [valid_from, valid_to) contains T — then aggregated. Same
    * single keyed shuffle as q_scd2; the interval filter is a narrow
    * post-window predicate.
    */
  private def qSnapshot(s: SparkSession, dir: String): DataFrame = {
    val tUs = 1704240000000000L // 2024-01-03 00:00:00 UTC, mid-corpus
    qScd2(s, dir)
      .filter(col("valid_from_us") <= tUs &&
        (col("valid_to_us").isNull || col("valid_to_us") > tUs))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("event_type")
  }

  /** OUTER generator semantics: explode_outer keeps a row (with NULL)
    * for documents whose filtered token list is empty — the LEFT JOIN
    * of generators. Inner explode silently drops such parents; for
    * per-doc accounting (every doc must appear in the output) the outer
    * variant is the correct tool. n_rows counts the padded row, n_words
    * only real tokens.
    */
  private def qExplodeOuter(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        explode_outer(expr(
          s"filter($tokensSql, x -> x LIKE 'q%')")).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_rows"), count(col("w")).as("n_words"))
      .orderBy("doc_id")

  /** Error-safe ingestion math under ANSI mode (the Spark 4 default,
    * where a bad cast or overflow THROWS): try_cast/try_divide/try_add
    * return NULL instead — the production pattern for dirty data. The
    * oracle mirrors with TRY_CAST and NULLIF-guarded division.
    */
  private def qTryFuncs(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "part")
      .select(col("p_partkey"),
        expr("try_cast(split_part(p_type, ' ', 1) AS INT)").as("bad_cast"),
        expr("try_cast(CAST(p_size AS STRING) AS INT)").as("good_cast"),
        expr("try_divide(p_retailprice, p_size - p_size)").as("div_zero"),
        round(expr("try_divide(p_retailprice, p_size)"), 6).as("div_ok"),
        expr("try_add(9223372036854775807L, p_partkey)").as("overflow"))
      .orderBy("p_partkey")

  /** WRITE-ONCE transactional-table fixture ([[graft.table.TxnTable]])
    * over orders — a five-commit history the table gates read back:
    *
    *   v0 create   orders with o_orderkey % 3 = 0
    *   v1 append   orders with o_orderkey % 3 = 1
    *   v2 merge    % 6 = 0 re-priced ×2 (updates) ∪ % 3 = 2 (inserts)
    *   v3 delete   tombstones o_orderkey % 5 = 0
    *   v4 cluster  range-clustered on o_orderkey into 8 files
    *
    * Every commit is replayable as pure SQL over the base orders table,
    * so each gate's oracle rebuilds its version as CTEs. Built under the
    * scratch URI keyed by the source manifest (the writtenTfTable
    * pattern); an interrupted build is wiped and redone, never trusted.
    */
  private def writtenTxnOrdersTable(s: SparkSession, dir: String): String =
    scratchBuildOnce(s, "txntbl", "orders", dir) { root =>
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true) // partial build: start over
      val o = tbl(s, dir, "orders")
      val stats = Seq("o_orderkey")
      graft.table.TxnTable.create(s, root,
        o.filter(col("o_orderkey") % 3 === 0), stats)
      graft.table.TxnTable.append(s, root,
        o.filter(col("o_orderkey") % 3 === 1), stats)
      graft.table.TxnTable.merge(s, root,
        o.filter(col("o_orderkey") % 6 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
          .unionByName(o.filter(col("o_orderkey") % 3 === 2)),
        Seq("o_orderkey"), stats)
      graft.table.TxnTable.delete(s, root,
        o.filter(col("o_orderkey") % 5 === 0).select("o_orderkey"),
        Seq("o_orderkey"), stats)
      graft.table.TxnTable.cluster(s, root, Seq("o_orderkey"), 8, stats)
    }

  /** Schema-evolution twin on documents: v1 appends a `quality` column
    * (n_chars DIV 5) absent from v0, so half the table's files predate
    * the column and must read as nulls.
    */
  private def writtenTxnDocsTable(s: SparkSession, dir: String): String =
    scratchBuildOnce(s, "evotbl", "documents", dir) { root =>
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val d = tbl(s, dir, "documents").select("doc_id", "lang", "n_chars")
      graft.table.TxnTable.create(s, root, d.filter(col("doc_id") % 2 === 0))
      graft.table.TxnTable.append(s, root,
        d.filter(col("doc_id") % 2 === 1)
          .withColumn("quality", expr("n_chars DIV 5")))
    }

  /** WRITE-ONCE bloom-indexed table fixture: orders round-robined into
    * 8 interleaved files — every file's o_orderkey [min,max] spans the
    * whole key domain, so min/max stats can never prune a point probe —
    * with the bloom-index table property on o_orderkey.
    */
  private def writtenTxnBloomTable(s: SparkSession, dir: String): String =
    scratchBuildOnce(s, "bloomtbl", "orders", dir) { root =>
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      graft.table.TxnTable.create(s, root,
        tbl(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice")
          .repartition(8),
        statsCols = Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
    }

  /** Bloom point lookup through the manifest index: `o_orderkey = 7`
    * against the interleaved layout reads only bloom-positive files
    * (file-count drop asserted in TableSpec; the correctness gate
    * checks the returned row against the raw-orders oracle).
    */
  private def qTableBloom(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable
      .snapshotPointEq(s, writtenTxnBloomTable(s, dir), "o_orderkey", 7L)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")

  /** WRITE-ONCE full-merge fixture: create with o_orderkey % 3 = 0,
    * then ONE atomic three-clause merge — % 6 = 0 re-priced ×3
    * (matched update), % 3 = 1 (unmatched insert), and unmatched
    * targets with status 'F' deleted (not-matched-by-source clause).
    */
  private def writtenTxnMergeFullTable(s: SparkSession, dir: String): String =
    scratchBuildOnce(s, "mftbl", "orders", dir) { root =>
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val o = tbl(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority",
          "o_totalprice")
      graft.table.TxnTable.create(s, root,
        o.filter(col("o_orderkey") % 3 === 0), Seq("o_orderkey"))
      val source = o.filter(col("o_orderkey") % 6 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 3)
        .unionByName(o.filter(col("o_orderkey") % 3 === 1))
      graft.table.TxnTable.mergeFull(s, root, source, Seq("o_orderkey"),
        deleteWhen = col("o_orderstatus") === "F")
    }

  /** Post-merge-full rollup: the oracle replays all three clauses over
    * raw orders (NOT IN + conditional delete + union).
    */
  private def qTableMergeFull(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable
      .snapshot(s, writtenTxnMergeFullTable(s, dir))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")

  /** WRITE-ONCE merge-on-read fixture: create with o_orderkey % 3 = 0,
    * then TWO deletion-vector generations around a re-insert —
    *   v1 deleteMor  % 15 = 0            (dv on the create files)
    *   v2 append     % 15 = 0 re-inserted (new file, NO dv — visible)
    *   v3 deleteMor  % 21 = 0            (dv on ALL current files)
    * Final contents = (% 3 = 0) minus (% 21 = 0): the re-insert proves
    * dvs are file-scoped (not a key blacklist), the second generation
    * proves dvs stack across commits.
    */
  private def writtenTxnMorTable(s: SparkSession, dir: String): String =
    scratchBuildOnce(s, "mortbl", "orders", dir) { root =>
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val o = tbl(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      graft.table.TxnTable.create(s, root,
        o.filter(col("o_orderkey") % 3 === 0), Seq("o_orderkey"))
      graft.table.TxnTable.deleteMor(s, root,
        o.filter(col("o_orderkey") % 15 === 0).select("o_orderkey"),
        Seq("o_orderkey"))
      graft.table.TxnTable.append(s, root,
        o.filter(col("o_orderkey") % 15 === 0), Seq("o_orderkey"))
      graft.table.TxnTable.deleteMor(s, root,
        o.filter(col("o_orderkey") % 21 === 0).select("o_orderkey"),
        Seq("o_orderkey"))
    }

  /** Merge-on-read snapshot rollup: deletes applied at READ time from
    * the stacked deletion vectors, zero data rewritten (TableSpec pins
    * identical file paths across the delete commits).
    */
  private def qTableMorDelete(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.snapshot(s, writtenTxnMorTable(s, dir))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")

  /** Zero-copy shallow clone of the 5-commit fixture (write-once): the
    * clone's rollup must equal the source's v3/v4 replay — same oracle
    * as q_table_snapshot, through a manifest that references the
    * source's files absolutely and owns no data of its own.
    */
  private def qTableClone(s: SparkSession, dir: String): DataFrame = {
    val src = writtenTxnOrdersTable(s, dir)
    val root = scratchBuildOnce(s, "clonetbl", "orders", dir) { dst =>
      val p = new org.apache.hadoop.fs.Path(dst)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      graft.table.TxnTable.cloneTable(s, src, dst)
    }
    graft.table.TxnTable.snapshot(s, root)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** Manifest-only aggregates over the 5-commit fixture: COUNT(*) and
    * the o_orderkey [min,max] answered WITHOUT opening a data file
    * (TxnTable.rowCount/statsRange — the O(#files) metadata fold that
    * replaces a 100 TB scan). The oracle recomputes both from the v3
    * replay, so the metadata must agree with the data to the row.
    */
  private def qTableFastStats(s: SparkSession, dir: String): DataFrame = {
    val root = writtenTxnOrdersTable(s, dir)
    val n = graft.table.TxnTable.rowCount(s, root)
    val r = graft.table.TxnTable.statsRange(s, root, "o_orderkey")
      .getOrElse(sys.error("o_orderkey stats missing from the manifest"))
    // stats are double-space: exactness of the long conversion requires
    // |v| <= 2^53 (holds for every TPC-H key; guarded, not assumed)
    require(math.abs(r.min) <= 9007199254740992.0 &&
      math.abs(r.max) <= 9007199254740992.0,
      "o_orderkey stats outside the double-exact integer range")
    import s.implicits._
    Seq((n, r.min.toLong, r.max.toLong))
      .toDF("n_rows", "min_key", "max_key")
  }

  /** DSv2 TIME TRAVEL gate: `.option("versionAsOf", 1)` pins the
    * connector read to the pre-merge v1 manifest — same truth as
    * q_table_timetravel, proven through the planner-integrated path
    * (schema AND file set both resolve from the pinned version).
    */
  private def qTableDsv2Timetravel(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.table.GraftTableProvider")
      .option("versionAsOf", "1")
      .load(writtenTxnOrdersTable(s, dir))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")

  /** GROUP BY ALL (Spark 4 SQL sugar — every non-aggregate select item
    * becomes a grouping key; both engines support it verbatim).
    */
  private def qGroupByAll(s: SparkSession, dir: String): DataFrame = {
    tbl(s, dir, "documents").createOrReplaceTempView("docs_gba_v")
    s.sql(
      """SELECT lang, source, COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM docs_gba_v GROUP BY ALL ORDER BY lang, source""")
  }

  /** DSv2 AGGREGATE PUSHDOWN gate: COUNT(*)/MIN/MAX through the
    * connector are answered from the manifest at planning time
    * (GraftAggScan — zero data files opened; TableSpec pins the plan
    * shape and the decline paths). Must equal the v3 data replay.
    */
  private def qTableAggPushdown(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.table.GraftTableProvider")
      .load(writtenTxnOrdersTable(s, dir))
      .selectExpr("count(*) AS n_rows", "min(o_orderkey) AS min_key",
        "max(o_orderkey) AS max_key")

  /** DSv2 LIMIT PUSHDOWN gate: a LIMIT-only read through the connector
    * plans only the file prefix whose cumulative manifest row counts
    * cover the limit (TableSpec pins the fewer-files plan shape); the
    * gate result is the count over the limited read — exactly
    * min(limit, |table|) — because WHICH rows a LIMIT returns is
    * engine-nondeterministic by SQL semantics, but HOW MANY is not.
    */
  private def qTableLimit(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.table.GraftTableProvider")
      .load(writtenTxnOrdersTable(s, dir))
      .limit(10)
      .agg(count(lit(1)).as("n"))

  /** Latest table snapshot (v4, the clustered rewrite of v3): priority
    * rollup proving create→append→merge→delete→cluster composed right.
    */
  private def qTableSnapshot(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.snapshot(s, writtenTxnOrdersTable(s, dir))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")

  /** TIME TRAVEL to v1: the same rollup over the pre-merge snapshot —
    * later rewrites must not bleed into an older manifest's file set.
    */
  private def qTableTimetravel(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.snapshotAt(s, writtenTxnOrdersTable(s, dir), 1L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")

  /** Row-level CDC v1→v3: the merge's re-pricings surface as updates,
    * its new keys as inserts, the tombstoned keys as deletes (post-image
    * values except deletes, which carry the pre-image).
    */
  private def qTableCdc(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.cdc(s, writtenTxnOrdersTable(s, dir), 1L, 3L,
        Seq("o_orderkey"))
      .select(col("o_orderkey"), col("_change_type").as("change_type"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_orderkey")

  /** Commit history from the manifests alone (no data files touched):
    * op sequence + exact row count per version.
    */
  private def qTableHistory(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.history(s, writtenTxnOrdersTable(s, dir))
      .select("version", "op", "n_rows")
      .orderBy("version")

  /** Stats-pruned read over the clustered table: the manifest's disjoint
    * per-file o_orderkey ranges let the probe skip most files BEFORE the
    * scan (file skipping at the metadata layer — the mechanism that
    * turns a 100 TB table probe into a few-file read). Same answer as
    * the unpruned scan, asserted by the oracle.
    */
  private def qTablePrune(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.snapshotWhere(s, writtenTxnOrdersTable(s, dir),
        col("o_orderkey").between(1000L, 5000L))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))

  /** Schema evolution end to end: files written before the `quality`
    * column existed serve typed nulls for it under the evolved read
    * schema — no rewrite, no footer-merge pass.
    */
  private def qTableSchemaEvo(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.snapshot(s, writtenTxnDocsTable(s, dir))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), count(col("quality")).as("n_q"),
        sum(col("quality")).as("sum_q"))
      .orderBy("lang")

  /** Scope-bounded-merge fixture: orders range-clustered on o_custkey
    * (8 files with tight custkey stats), then a
    * [[graft.table.TxnTable.mergeScoped]] re-pricing the o_custkey<100
    * slice — only the lowest custkey-range file(s) are rewritten; the
    * rest of the table is carried into the new manifest with zero IO.
    */
  private def writtenScopedTable(s: SparkSession, dir: String): String =
    scratchBuildOnce(s, "scopedtbl", "orders", dir) { root =>
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true)
      val o = tbl(s, dir, "orders")
      val stats = Seq("o_custkey", "o_orderkey")
      graft.table.TxnTable.create(s, root,
        o.repartitionByRange(8, col("o_custkey")), stats)
      graft.table.TxnTable.mergeScoped(s, root,
        o.filter(col("o_custkey") < 100)
          .withColumn("o_totalprice", -col("o_totalprice")),
        Seq("o_orderkey"), "o_custkey", stats)
    }

  /** Snapshot after the scoped merge: the carried-verbatim files and the
    * rewritten slice must compose to exactly "negate prices where
    * o_custkey < 100" — a missed update OR a key duplicated across the
    * scope boundary both break the sums.
    */
  private def qTableMergeScoped(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.snapshot(s, writtenScopedTable(s, dir))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderstatus")

  /** STREAMING INGEST INTO THE TRANSACTIONAL TABLE: a real file-stream
    * query lands each micro-batch as a [[graft.table.TxnTable.appendBatch]]
    * commit — the batch-id fence and the data files become visible in
    * ONE atomic manifest rename, so a crash-replayed batch can never
    * double-append (the exactly-once shape DeltaLog's separate
    * high-water-mark file approximates; TableSpec proves the replay
    * no-op directly). The gate result reads the table back and must
    * equal the plain batch aggregate over the same documents.
    */
  private def qDocsStreamTable(s: SparkSession, dir: String): DataFrame = {
    val schema = tbl(s, dir, "documents").schema
    val root = scratchTempDir(s, "graft_stream_tbl")
    val stream = s.readStream.schema(schema)
      .parquet(docsStreamDir(dir).toString)
    runStream(s) {
      stream.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, id: Long) =>
          graft.table.TxnTable.appendBatch(s, root, batch, id); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    graft.table.TxnTable.snapshot(s, root)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
  }

  /** Stream-source / wall-clock-travel fixture: documents (doc_id,
    * lang, n_chars) landed as create + 3 appends (the doc_id % 4
    * slices), with a short sleep between commits so manifest
    * timestamps strictly increase — wall-clock travel then resolves
    * versions deterministically.
    */
  private def writtenStreamSrcTable(s: SparkSession, dir: String): String =
    scratchBuildOnce(s, "streamsrc", "documents", dir) { root =>
      val p = new org.apache.hadoop.fs.Path(root)
      val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (f.exists(p)) f.delete(p, true) // partial build: start over
      val d = tbl(s, dir, "documents").select("doc_id", "lang", "n_chars")
      graft.table.TxnTable.create(s, root,
        d.filter(col("doc_id") % 4 === 0), Seq("doc_id"))
      (1 to 3).foreach { r =>
        Thread.sleep(5) // strictly increasing manifest timestamps
        graft.table.TxnTable.append(s, root,
          d.filter(col("doc_id") % 4 === r), Seq("doc_id"))
      }
    }

  /** STREAMING READ OF THE TRANSACTIONAL TABLE (the Delta-source twin
    * of docs_stream_table's sink side): a real readStream over the
    * DSv2 connector drains the table's commit history as micro-batches
    * — offsets are manifest versions, each batch is the file-set diff
    * between two manifests (O(new files), never a re-scan;
    * [[graft.table.GraftMicroBatchStream]]). The drained rows must
    * aggregate to exactly the batch snapshot — a dropped commit, a
    * double-delivered file, or a mis-diffed manifest all break the
    * sums. TableStreamSpec additionally proves a mid-stream append is
    * picked up incrementally and a rewrite in range fails loudly.
    */
  private def qTableStreamRead(s: SparkSession, dir: String): DataFrame = {
    val root = writtenStreamSrcTable(s, dir)
    val out = scratchTempDir(s, "graft_stream_read_out")
    val stream = s.readStream
      .format("graft.table.GraftTableProvider")
      .load(root)
    runStream(s) {
      stream.writeStream
        .outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    s.read.parquet(out)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
  }

  /** STREAM → AGGREGATE → MERGE-BACK LOOP: the transactional table as
    * BOTH ends of a streaming pipeline — a readStream over the DSv2
    * source feeds a stateful per-language aggregation whose update-
    * mode batches MERGE into a second TxnTable (create on first batch,
    * keyed mergeFull after), so the downstream table always holds the
    * latest running totals. The final snapshot must equal the plain
    * batch aggregate — dropped update rows, double-applied merges, or
    * a missed source commit all break the counts.
    */
  private def qTableStreamAgg(s: SparkSession, dir: String): DataFrame = {
    val src = writtenStreamSrcTable(s, dir)
    val outTbl = scratchTempDir(s, "graft_stream_agg_tbl")
    val stream = s.readStream
      .format("graft.table.GraftTableProvider")
      .load(src)
    runStream(s) {
      stream.groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .writeStream
        .outputMode("update")
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) {
            if (graft.table.TxnTable.latestVersion(s, outTbl).isEmpty)
              graft.table.TxnTable.create(s, outTbl, b)
            else
              graft.table.TxnTable.mergeFull(s, outTbl, b, Seq("lang"),
                deleteWhen = lit(false))
          }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    graft.table.TxnTable.snapshot(s, outTbl).orderBy("lang")
  }

  /** Wall-clock TIME TRAVEL (`timestampAsOf`) — the missing half of
    * the travel pair (q_table_dsv2_timetravel pins by version): the
    * commit timestamp of v1 must resolve to exactly v1's snapshot
    * (create slice + first append), via the DSv2 option so the
    * resolution path under test is the connector's.
    */
  private def qTableTimetravelTs(s: SparkSession, dir: String): DataFrame = {
    val root = writtenStreamSrcTable(s, dir)
    val ts = graft.table.TxnTable.readManifest(s, root, 1L).timestampMs
    s.read
      .format("graft.table.GraftTableProvider")
      .option("timestampAsOf", ts)
      .load(root)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
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
  private def writtenMaintTable(s: SparkSession, dir: String): String =
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
      graft.table.TxnTable.vacuum(s, root, retainLast = 1)
      ()
    }

  /** The maintained table must still answer EXACTLY: a predicate-pruned
    * probe over the post-vacuum clustered snapshot (the manifest's
    * disjoint c_custkey ranges let the probe read ~1 of the 4 files),
    * grouped by segment. A row lost in compact's rewrite, duplicated
    * across cluster's range boundaries, or orphan-deleted by vacuum all
    * break the counts/sums vs the raw-parquet oracle.
    */
  private def qTableMaintenance(s: SparkSession, dir: String): DataFrame =
    graft.table.TxnTable.snapshotWhere(s, writtenMaintTable(s, dir),
        col("c_custkey").between(100L, 600L))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")

  /** Land `df` as ONE parquet file named `<name>.parquet` directly in
    * `destDir` (FileStreamSource wants flat files; a per-batch write
    * dir is flattened by moving its single part file out).
    */
  private def stageSingleFile(
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
  private def qOrdersStreamMerge(s: SparkSession, dir: String): DataFrame = {
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
  private def qTableDsv2(s: SparkSession, dir: String): DataFrame =
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
  private def qLinreg(s: SparkSession, dir: String): DataFrame = {
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
        round(expr(
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
    * AUC = (Σ_pos midrank − nPos(nPos+1)/2) / (nPos·nNeg). The
    * unpartitioned running window runs over DISTINCT score values only
    * (a bounded vocabulary, never the corpus — the qPareto head-bound
    * lesson); midranks are integer-and-half values, so the Σ pos·midrank
    * double sum is exact under any partitioning below 2⁵². One corpus
    * scan, one vocab-sized window, a 1-row result.
    */
  private def qRocAuc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perScore = tbl(s, dir, "documents")
      .select(col("n_chars").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .groupBy("score")
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("p"))
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perScore
      .withColumn("cum", sum(col("cnt")).over(w))
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
  private def qConfusion(s: SparkSession, dir: String): DataFrame =
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
  private def qCalibration(s: SparkSession, dir: String): DataFrame =
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
  private def qJaroDedup(s: SparkSession, dir: String): DataFrame = {
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
  private def qMarkov(s: SparkSession, dir: String): DataFrame = {
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
  private def qItemCooccur(s: SparkSession, dir: String): DataFrame = {
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
  private def qShortestPath(s: SparkSession, dir: String): DataFrame = {
    val edges = writtenEdgesTable(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val source = edges.agg(min(col("src"))).head().getLong(0)
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
  private def qBenford(s: SparkSession, dir: String): DataFrame = {
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
  private def qEntropy(s: SparkSession, dir: String): DataFrame =
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
  private def qRfm(s: SparkSession, dir: String): DataFrame = {
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
  private def qDauMau(s: SparkSession, dir: String): DataFrame = {
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
  private def qTtr(s: SparkSession, dir: String): DataFrame =
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
    * scrambled-word soup that unigram stats cannot see). The exploded
    * bigram table feeds the count model (bc → cx → v) AND the scoring
    * join, so it is persisted for the query's lifetime (the
    * qPerplexity contract: the lazy return leaves no unpersist point) —
    * without it the corpus explode re-runs once per derived table. All
    * joins are keyed on bigram vocab; the vocabulary size rides a
    * broadcast 1-row side. Determinism is the repo LM contract:
    * per-bigram ln terms rounded to 9 dp and accumulated as exact
    * DECIMAL.
    */
  private def qBigramLm(s: SparkSession, dir: String): DataFrame = {
    val bigrams = tbl(s, dir, "documents")
      .select(col("doc_id"), expr(tokensSql).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 1),
             i -> named_struct('x', element_at(ws, i),
                               'y', element_at(ws, i + 1)))""")).as("b"))
      .select(col("doc_id"), col("b.x").as("x"), col("b.y").as("y"))
      .persist()
    val bc = bigrams.groupBy("x", "y").agg(count(lit(1)).as("c")).persist()
    val cx = bc.groupBy("x").agg(sum(col("c")).as("cx"))
    val v = bc.agg(countDistinct(col("y")).as("v"))
    bigrams
      .join(bc, Seq("x", "y"))
      .join(cx, Seq("x"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), expr(
        """CAST(round(ln((CAST(c AS DOUBLE) + 1.0)
             / (CAST(cx AS DOUBLE) + CAST(v AS DOUBLE))), 9)
           AS DECIMAL(18,9))""").as("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("term")).as("st"))
      .select(col("doc_id"), col("n_bigrams"),
        round(lit(0.0) - col("st").cast("double")
          / col("n_bigrams").cast("double"), 6).as("mean_nll"))
      .orderBy("doc_id")
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
  private def qContainment(s: SparkSession, dir: String): DataFrame = {
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

  /** Winsorized robust statistics per event type: clip at the exact
    * per-group p05/p95 (percentile_disc — an actual element, the
    * engine-agnostic discrete percentile the q_percentile_disc gate
    * already pins) and aggregate the clipped values as exact DECIMAL.
    * The outlier-robust mean every metrics pipeline wants before a
    * spiky `value` column poisons a dashboard; the cutoff side is
    * groups-sized and broadcast by AQE.
    */
  private def qWinsorize(s: SparkSession, dir: String): DataFrame = {
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
  private def qGoldenRecord(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = tbl(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        expr("CAST(n_chars AS BIGINT) DIV 200").as("bucket"))
    val w = Window.partitionBy("source", "bucket")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val agg = d.groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("total_chars"),
        concat_ws(",", array_sort(collect_set(col("lang")))).as("langs"))
    d.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("bucket"),
        col("doc_id").as("keep_id"), col("n_chars").as("keep_chars"))
      .join(agg, Seq("source", "bucket"))
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
  private def qHits(s: SparkSession, dir: String): DataFrame = {
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
  private def qDegreeStats(s: SparkSession, dir: String): DataFrame = {
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
  private def qLinkPredict(s: SparkSession, dir: String): DataFrame = {
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
  private def qChiSquare(s: SparkSession, dir: String): DataFrame = {
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
  private def qTargetEncoding(s: SparkSession, dir: String): DataFrame = {
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
  private def dailyRevenue(s: SparkSession, dir: String): DataFrame =
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
  private def qSeasonality(s: SparkSession, dir: String): DataFrame = {
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
  private def qAutocorr(s: SparkSession, dir: String): DataFrame = {
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
  private def qChangepoint(s: SparkSession, dir: String): DataFrame = {
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
  private def qCohortLtv(s: SparkSession, dir: String): DataFrame = {
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
  private def qOrderGaps(s: SparkSession, dir: String): DataFrame = {
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
  private def qTableCdf(s: SparkSession, dir: String): DataFrame =
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
  private def qMvIncremental(s: SparkSession, dir: String): DataFrame = {
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
  private def qRandomProjection(s: SparkSession, dir: String): DataFrame = {
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
  private def qLDiversity(s: SparkSession, dir: String): DataFrame =
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
  private def qFkViolations(s: SparkSession, dir: String): DataFrame = {
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
  private def qConcurrency(s: SparkSession, dir: String): DataFrame = {
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
  private def qComponentSizes(s: SparkSession, dir: String): DataFrame = {
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
  private def qOhlc(s: SparkSession, dir: String): DataFrame = {
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
  private def qEventsStreamOhlc(s: SparkSession, dir: String): DataFrame = {
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
  private def qKsTest(s: SparkSession, dir: String): DataFrame = {
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
  private def qMannWhitney(s: SparkSession, dir: String): DataFrame = {
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
  private def qDid(s: SparkSession, dir: String): DataFrame = {
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
  private def qSurvival(s: SparkSession, dir: String): DataFrame = {
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
  private def qLorenz(s: SparkSession, dir: String): DataFrame = {
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
  private def qSessionPath(s: SparkSession, dir: String): DataFrame = {
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
  private def qWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val perV = tbl(s, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("v"),
        col("l_quantity").cast("decimal(12,2)").as("q"))
      .groupBy("l_returnflag", "v").agg(sum(col("q")).as("w"))
    val wc = Window.partitionBy("l_returnflag").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = perV.groupBy("l_returnflag").agg(sum(col("w")).as("tw"))
    perV.withColumn("cw", sum(col("w")).over(wc))
      .join(tot, "l_returnflag")
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
  private def qPriceIndex(s: SparkSession, dir: String): DataFrame = {
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
    val all = perPart(li)
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
  private def qGroupAuc(s: SparkSession, dir: String): DataFrame = {
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
  private def qGainsTable(s: SparkSession, dir: String): DataFrame = {
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
  private def qCorrMatrix(s: SparkSession, dir: String): DataFrame = {
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
  private def qBasketRules(s: SparkSession, dir: String): DataFrame = {
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
  private def qTrendByGroup(s: SparkSession, dir: String): DataFrame = {
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
  private def qBootstrapCi(s: SparkSession, dir: String): DataFrame = {
    graft.functions.FnvHash64.register(s)
    val base = tbl(s, dir, "events")
      .select(col("event_id"), col("value").cast("decimal(18,6)").as("v"))
    base.select(col("event_id"), col("v"),
        explode(expr("sequence(0, 199)")).as("b"))
      .filter(expr(
        """graft_fnv64(concat(CAST(event_id AS STRING), ':',
           CAST(b AS STRING))) % 2 = 0"""))
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
  private def qLangConfusion(s: SparkSession, dir: String): DataFrame =
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
  private def qStopwordDiscovery(s: SparkSession, dir: String): DataFrame = {
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
  private def qZipfFit(s: SparkSession, dir: String): DataFrame = {
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
    * rescan); the cumulative (N, V) pairs run over the DOCS-sized
    * table; β is the same 9dp-ln DECIMAL moment recipe.
    */
  private def qHeapsLaw(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tbl(s, dir, "documents")
      .select(col("doc_id"), explode(expr(tokensSql)).as("w"))
    val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
    val newTypes = toks.groupBy("w").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = perDoc
      .join(newTypes, Seq("doc_id"), "left")
      .withColumn("nt", coalesce(col("new_types"), lit(0L)))
      .withColumn("bigN", sum(col("n_tok")).over(w))
      .withColumn("v", sum(col("nt")).over(w))
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
  private def qDedupAttribution(s: SparkSession, dir: String): DataFrame = {
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
  private def qEventNearDup(s: SparkSession, dir: String): DataFrame = {
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
        round(col("n_dups").cast("double") / col("n").cast("double"), 6)
          .as("dup_rate"))
      .orderBy("event_type")
  }

  /** Session-level conversion by day: 30-min-gap sessions (the
    * events_sessions kernel) rolled up to per-day session counts,
    * view→purchase conversion rate, and mean session length — the
    * product-health daily all in one sessions-sized pass.
    */
  private def qSessionConversion(s: SparkSession, dir: String): DataFrame = {
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
        round(sum(col("n_events")).cast("double")
          / count(lit(1)).cast("double"), 6).as("mean_events"),
        round(sum(col("has_view") * col("has_purchase")).cast("double")
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
  private def qGrowthAccounting(s: SparkSession, dir: String): DataFrame = {
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
  private def qDatasetCard(s: SparkSession, dir: String): DataFrame = {
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
  private def qIqrFence(s: SparkSession, dir: String): DataFrame = {
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
  private def qEss(s: SparkSession, dir: String): DataFrame =
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
  private def qLshCurve(s: SparkSession, dir: String): DataFrame =
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
  private def qRollingCorr(s: SparkSession, dir: String): DataFrame = {
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
  private def qPitFeatures(s: SparkSession, dir: String): DataFrame = {
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
  private def qHorizonLabel(s: SparkSession, dir: String): DataFrame = {
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
  private def qDpCounts(s: SparkSession, dir: String): DataFrame = {
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
  private def qAbSrm(s: SparkSession, dir: String): DataFrame = {
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
  private def qRevenueDecomposition(s: SparkSession, dir: String): DataFrame = {
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
  private def qRunsTest(s: SparkSession, dir: String): DataFrame = {
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
  private def qNoveltyRate(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
      .join(tbl(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("m")), "l_orderkey")
      .join(tbl(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey")
      .select(col("o_custkey"), col("p_brand"), col("m"))
    val cb = li.groupBy("o_custkey", "p_brand", "m")
      .agg(count(lit(1)).as("n_lines"))
    val first = cb.groupBy("o_custkey", "p_brand")
      .agg(min(col("m")).as("first_m"))
    cb.join(first, Seq("o_custkey", "p_brand"))
      .select(col("m"),
        when(col("m") === col("first_m"), 1L).otherwise(0L)
          .as("is_novel"))
      .groupBy("m")
      .agg(count(lit(1)).as("n_cust_brand"),
        sum(col("is_novel")).as("n_novel"))
      .select(col("m"), col("n_cust_brand"), col("n_novel"),
        round(col("n_novel").cast("double")
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
  private def qRollingAnomaly(s: SparkSession, dir: String): DataFrame = {
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
  private def qForecastBaseline(s: SparkSession, dir: String): DataFrame = {
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

  /** Repeat-purchase ladder: for k = 1..10, how many customers placed
    * at least k orders, and the k-th-order conversion r_k =
    * N≥k / N≥(k−1) — the retention-economics curve (flat r_k beyond
    * k≈3 is the classic "habit formed" signature). One per-customer
    * count, one 10-row generate joined by an inequality that is
    * k-bounded, never customer×customer.
    */
  private def qRepeatLadder(s: SparkSession, dir: String): DataFrame = {
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
  private def qCatalogCoverage(s: SparkSession, dir: String): DataFrame = {
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
  private def qWelchTtest(s: SparkSession, dir: String): DataFrame = {
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
  private def qAnova(s: SparkSession, dir: String): DataFrame = {
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
  private def entTerm(num: String, den: String): String =
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
  private def qInfoGain(s: SparkSession, dir: String): DataFrame = {
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
  private def qMode(s: SparkSession, dir: String): DataFrame = {
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
  private def qDecisionStump(s: SparkSession, dir: String): DataFrame = {
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
  private val pow7Sql =
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
  private def qEwma(s: SparkSession, dir: String): DataFrame = {
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
  private def qCumDistinct(s: SparkSession, dir: String): DataFrame = {
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
  private def qSeasonalDecompose(s: SparkSession, dir: String): DataFrame = {
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
        round(expr("CAST(rv AS DOUBLE) / seasonal_idx"), 6)
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
  private def qTheilSen(s: SparkSession, dir: String): DataFrame = {
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
        """CAST(round(CAST(yb - ya AS DOUBLE)
             / CAST(datediff(day_b, day_a) AS DOUBLE), 9)
           AS DECIMAL(18,9))""").as("slope"))
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
  private val klTermSql =
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
  private def qUnigramKl(s: SparkSession, dir: String): DataFrame = {
    val words = tbl(s, dir, "documents")
      .select(col("source"), explode(expr(tokensSql)).as("w"))
      .persist() // feeds corpus counts, source counts, and totals once
    val cw = words.groupBy("w").agg(count(lit(1)).as("c"))
    val cs = words.groupBy("source", "w").agg(count(lit(1)).as("csw"))
    val ns = words.groupBy("source").agg(count(lit(1)).as("ns"))
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
  private def qTokenizerFertility(s: SparkSession, dir: String): DataFrame =
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
  private val nbTermSql =
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
  private def qNaiveBayes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"), expr(tokensSql).as("ws"))
    val train = d.filter(col("doc_id") % 5 =!= 0)
    val test = d.filter(col("doc_id") % 5 === 0)
    val trainW = train
      .select(col("lang"), explode(col("ws")).as("w"))
      .persist() // model build scans: per-class counts, totals, vocab
    val clw = trainW.groupBy("lang", "w").agg(count(lit(1)).as("clw"))
    val langTok = trainW.groupBy("lang").agg(count(lit(1)).as("tokl"))
    val vocab = trainW.select("w").distinct()
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
  private def qTCloseness(s: SparkSession, dir: String): DataFrame = {
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
  private def qLabelPropagation(s: SparkSession, dir: String): DataFrame = {
    val e = writtenEdgesTable(s, dir)
    graft.ops.LabelPropagation.labels(e, "src", "dst", iters = 3)
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("community"))
      .limit(20)
  }

  /** Deterministic synthetic geo-coordinates from an id — integer
    * modular arithmetic only, identical text on both engines. */
  private def geoSql(key: String): (String, String) = (
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
  private def qHaversineNn(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (clat, clon) = geoSql("c_custkey")
    val (slat, slon) = geoSql("s_suppkey")
    val c = tbl(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").as("nation"),
        expr(clat).as("lat_c"), expr(clon).as("lon_c"))
    val sup = tbl(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey").as("nation"),
        expr(slat).as("lat_s"), expr(slon).as("lon_s"))
    val hav =
      """round(2.0 * 6371.0 * asin(sqrt(
           sin(radians(lat_s - lat_c) / 2.0)
             * sin(radians(lat_s - lat_c) / 2.0)
           + cos(radians(lat_c)) * cos(radians(lat_s))
             * sin(radians(lon_s - lon_c) / 2.0)
             * sin(radians(lon_s - lon_c) / 2.0))), 3)"""
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
  private def qCosineHistogram(s: SparkSession, dir: String): DataFrame = {
    val sample = tbl(s, dir, "embeddings")
      .filter(col("vec_id") % 4 === 0 && col("vec_id") < 4000)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (a, b) => a * b),
        lit(0.0d), (acc, t) => acc + t)
    val a = sample.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = sample.select(col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(round(dot(col("va"), col("vb"))
        / (sqrt(dot(col("va"), col("va")))
          * sqrt(dot(col("vb"), col("vb")))), 4).as("cosine"))
      .select(floor(col("cosine") * 10.0).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
      .orderBy("bucket")
  }

  // ---- round-9 batch 5: retrieval diversity, graph metrics, audits ---

  /** Shared DuckDB CTE prefix replaying 3 deterministic LPA iterations
    * over the co-supplier graph — used by the q_label_propagation and
    * q_modularity oracles (the l3 table is the final labeling).
    */
  private val lpaCteSql: String = {
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
  private def qMmrDiversify(s: SparkSession, dir: String): DataFrame = {
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
  private def qModularity(s: SparkSession, dir: String): DataFrame = {
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
  private def qAssortativity(s: SparkSession, dir: String): DataFrame = {
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
  private def qClusteringCoeff(s: SparkSession, dir: String): DataFrame = {
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
  private def qKcore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    var ed = writtenEdgesTable(s, dir).localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (it <- 1 to 3) {
      val keep = ed.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= 3).select(col("src").as("node"))
      val prev = ed
      ed = ed
        .join(keep.withColumnRenamed("node", "src"), Seq("src"))
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"))
        .select("src", "dst")
        .localCheckpoint(true)
      prev.unpersist()
      out += ((it, ed.select("src").distinct().count(), ed.count() / 2))
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
  private def qPatternVshape(s: SparkSession, dir: String): DataFrame = {
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
  private def qPatternDoubletop(s: SparkSession, dir: String): DataFrame = {
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
  private def qMannKendall(s: SparkSession, dir: String): DataFrame = {
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
  private def dailyRev18(s: SparkSession, dir: String): DataFrame =
    dailyRevenue(s, dir)
      .select(col("day"), col("rev").cast("decimal(18,2)").as("rev"))

  /** BOLLINGER BANDS over daily revenue: 7-day rolling mean ± 2σ from
    * EXACT DECIMAL window sums (count/sum/sum-of-squares — population
    * σ), bands materialized in double with one fixed evaluation order
    * so both engines agree bit-for-bit; output is the breakout days.
    * Global window over a calendar-bounded series (qRocAuc contract).
    */
  private def qBollinger(s: SparkSession, dir: String): DataFrame = {
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
  private def qRsi(s: SparkSession, dir: String): DataFrame = {
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
  private def qSax(s: SparkSession, dir: String): DataFrame = {
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
  private def qSimpson(s: SparkSession, dir: String): DataFrame = {
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
  private def qBurstiness(s: SparkSession, dir: String): DataFrame = {
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
  private def qPriceElasticity(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
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
  private def qCuped(s: SparkSession, dir: String): DataFrame = {
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
  private def qSprt(s: SparkSession, dir: String): DataFrame = {
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
  private def qVecOutlier(s: SparkSession, dir: String): DataFrame = {
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
  private def qLevene(s: SparkSession, dir: String): DataFrame = {
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
  private def qReadability(s: SparkSession, dir: String): DataFrame =
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
  private def qBm25Query(s: SparkSession, dir: String): DataFrame = {
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
  private def qPartialCorr(s: SparkSession, dir: String): DataFrame = {
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
  private def qVarCvar(s: SparkSession, dir: String): DataFrame = {
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
  private def dailyRevMoments(s: SparkSession, dir: String): DataFrame =
    dailyRev18(s, dir).agg(count(lit(1)).as("n"),
      sum(col("rev")).as("sm"), sum(col("rev") * col("rev")).as("s2"))

  private val revMeanSql = "(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))"
  private val revSdSql =
    """sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
         - (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)), 0.0d))"""

  /** GRUBBS OUTLIER TEST over daily revenue: G = max|y − ȳ|/σ with the
    * offending day — mean/σ from the exact-moment pass, the argmax by
    * (deviation desc, day) rank so ties are deterministic. One moment
    * pass + one deviation pass over the calendar-bounded series.
    */
  private def qGrubbs(s: SparkSession, dir: String): DataFrame = {
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
  private def qDurbinWatson(s: SparkSession, dir: String): DataFrame = {
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
  private def qJarqueBera(s: SparkSession, dir: String): DataFrame = {
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
  private def qMultimodalPhash(s: SparkSession, dir: String): DataFrame = {
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
  private def qSpearman(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def midranks(d: DataFrame, c: String): DataFrame = {
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      d.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .withColumn("before", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .select(col("v"), expr(
          """CAST(round(CAST(before AS DOUBLE)
               + (CAST(cnt AS DOUBLE) + 1.0d) / 2.0d, 1)
             AS DECIMAL(18,1))""").as("rk"))
    }
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
  private def qCronbach(s: SparkSession, dir: String): DataFrame = {
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
  private def qRenyi(s: SparkSession, dir: String): DataFrame =
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
  private def qNgramCoverage(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = tbl(s, dir, "documents")
      .select(explode(expr(tokensSql)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tot = c.agg(sum(col("c")).as("nt"))
    val wOrd = Window.orderBy(col("c").desc, col("w"))
    c.withColumn("rk", row_number().over(wOrd))
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
  private def qOddsRatio(s: SparkSession, dir: String): DataFrame = {
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
  private def qSourceRepetition(s: SparkSession, dir: String): DataFrame = {
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
  private def qSkewAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnts = tbl(s, dir, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("c"))
    val cc = cnts.groupBy("c").agg(count(lit(1)).as("k"))
    val wRun = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cc.withColumn("cum", sum(col("k")).over(wRun))
    val mom = cnts.agg(count(lit(1)).as("nk"), sum(col("c")).as("sc"),
      sum(col("c") * col("c")).as("scc"), max(col("c")).as("mx"))
    val pct = cum.crossJoin(broadcast(mom))
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
  private def qTfidfCosinePairs(s: SparkSession, dir: String): DataFrame = {
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
  private def qDiversityIndex(s: SparkSession, dir: String): DataFrame = {
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
  private def qDrawdown(s: SparkSession, dir: String): DataFrame = {
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
  private def qHhi(s: SparkSession, dir: String): DataFrame = {
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
  private def qCohenKappa(s: SparkSession, dir: String): DataFrame = {
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
    * (estimate − exact ≥ 0 by construction). Hashes are md5 folds of
    * "j:key" (the repo's deterministic-randomness contract), so the
    * oracle rebuilds the identical 1024-cell sketch; the corpus is
    * scanned once into a 4×-exploded map-side-combined aggregate that
    * collapses to 1024 rows regardless of scale — the sketch property
    * itself.
    */
  private def qCountMin(s: SparkSession, dir: String): DataFrame = {
    val bucket =
      """CAST(conv(substring(md5(concat(CAST(j AS STRING), ':',
           CAST(l_partkey AS STRING))), 1, 8), 16, 10) AS BIGINT) % 256"""
    val li = tbl(s, dir, "lineitem").select(col("l_partkey"))
    val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("exact_cnt"))
    val top = exact
      .orderBy(col("exact_cnt").desc, col("l_partkey")).limit(8)
    val cms = li
      .select(col("l_partkey"), explode(expr("array(0,1,2,3)")).as("j"))
      .withColumn("b", expr(bucket))
      .groupBy("j", "b").agg(count(lit(1)).as("cnt"))
    top
      .select(col("l_partkey"), col("exact_cnt"),
        explode(expr("array(0,1,2,3)")).as("j"))
      .withColumn("b", expr(bucket))
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
  private def qPsmAtt(s: SparkSession, dir: String): DataFrame = {
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
  private def qAdfTest(s: SparkSession, dir: String): DataFrame = {
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

  private val adfSxxC =
    """(CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"""
  private val adfSxyC =
    """(CAST(sxy AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"""
  private val adfSyyC =
    """(CAST(syy AS DOUBLE)
       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"""
  private val adfBetaSql = s"($adfSxyC / $adfSxxC)"
  private val adfSeSql =
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
  private def qGranger(s: SparkSession, dir: String): DataFrame = {
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

  private def grC(ab: String, a: String, b: String) =
    s"""(CAST(s$ab AS DOUBLE)
       - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE) / CAST(n AS DOUBLE))"""
  private val grCuu = grC("uu", "u", "u")
  private val grCvv = grC("vv", "v", "v")
  private val grCuv = grC("uv", "u", "v")
  private val grCuy = grC("uy", "u", "y")
  private val grCvy = grC("vy", "v", "y")
  private val grCyy = grC("yy", "y", "y")
  private val grDet = s"($grCuu * $grCvv - $grCuv * $grCuv)"
  private val grB1Sql = s"(($grCvv * $grCuy - $grCuv * $grCvy) / $grDet)"
  private val grB2Sql = s"(($grCuu * $grCvy - $grCuv * $grCuy) / $grDet)"
  private val grRssUSql =
    s"($grCyy - $grB1Sql * $grCuy - $grB2Sql * $grCvy)"
  private val grRssRSql = s"($grCyy - $grCuy * $grCuy / $grCuu)"

  /** LJUNG–BOX PORTMANTEAU at lags 1..7 over daily revenue: the
    * demeaned series is 6-dp-quantized once (broadcast moment row, the
    * qJarqueBera contract), each lag-k autocovariance is an exact
    * DECIMAL sum over a rank-offset self-join of the days-sized
    * series, ρ is rounded BEFORE squaring so both engines accumulate
    * identical Q, and q_cum is the running n(n+2)·Σρ²/(n−k) — the
    * is-this-series-white-noise gate, per lag.
    */
  private def qLjungBox(s: SparkSession, dir: String): DataFrame = {
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

  private def spark_range_lags(s: SparkSession): DataFrame =
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
  private def qHurst(s: SparkSession, dir: String): DataFrame = {
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
  private def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
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
  private def qAmsF2(s: SparkSession, dir: String): DataFrame = {
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
  private def qBhFdr(s: SparkSession, dir: String): DataFrame = {
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
  private val asTailSql: String =
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
  private def qPowerMde(s: SparkSession, dir: String): DataFrame = {
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
  private def qKruskalWallis(s: SparkSession, dir: String): DataFrame = {
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

  private val hKwSql =
    """(12.0d / (CAST(n_total AS DOUBLE)
         * (CAST(n_total AS DOUBLE) + 1.0d)) * rr
       - 3.0d * (CAST(n_total AS DOUBLE) + 1.0d))"""

  /** McNEMAR'S TEST on the two paired document raters from
    * [[qCohenKappa]] (chars-above-mean vs spaces-above-mean): the
    * marginal-homogeneity question answered by the DISCORDANT cells
    * alone, with the continuity-corrected (|b−c|−1)²/(b+c). Exact
    * integer cells from one conditional-count pass.
    */
  private def qMcnemar(s: SparkSession, dir: String): DataFrame = {
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
        round(expr(
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
  private def qKendallTau(s: SparkSession, dir: String): DataFrame = {
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
  private def qTheilIndex(s: SparkSession, dir: String): DataFrame = {
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
  private def qJsd(s: SparkSession, dir: String): DataFrame = {
    val words = tbl(s, dir, "documents")
      .select(col("lang"), explode(expr(tokensSql)).as("w"))
      .persist()
    val cw = words.groupBy("w").agg(count(lit(1)).as("c"))
    val cl = words.groupBy("lang", "w").agg(count(lit(1)).as("clw"))
    val nl = words.groupBy("lang").agg(count(lit(1)).as("ntok"))
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
  private def qBurrowsDelta(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = tbl(s, dir, "documents")
      .select(col("source"), explode(expr(tokensSql)).as("w"))
      .persist()
    val top = words.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(30)
    val ns = words.groupBy("source").agg(count(lit(1)).as("ntok"))
    val f = words.join(broadcast(top.select("w")), "w")
      .groupBy("source", "w").agg(count(lit(1)).as("csw"))
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
  private def qXcorr(s: SparkSession, dir: String): DataFrame = {
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
  private def qIsotonic(s: SparkSession, dir: String): DataFrame = {
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
        """CAST(round(CAST(pt - ps0 AS DOUBLE)
             / CAST(ti - si + 1 AS DOUBLE), 6) + 0.0d
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

  // ---- round-10 batch 12: quantile sketch + survival + signed rank ----

  /** FIXED-MEMORY QUANTILE SKETCH vs exact: a 256-bucket equi-width
    * histogram of order totals (the mergeable constant-state shape a
    * streaming percentile monitor carries), read out at p50/p90/p99 by
    * in-bucket linear interpolation, NEXT TO the exact percentile_disc
    * answers — the sketch's error is part of the result (q_countmin /
    * q_ams_f2 contract). The sketch pass is one map-side-combined
    * aggregate to ≤256 rows at any scale.
    */
  private def qQuantileSketch(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = tbl(s, dir, "orders").select(col("o_totalprice").as("x"))
    val mm = o.agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
      count(lit(1)).as("n"))
    val hist = o.crossJoin(broadcast(mm))
      .select(expr(
        """least(CAST(floor((x - mn) / (mx - mn) * 256.0d) AS INT),
           255)""").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .withColumn("cb", coalesce(sum(col("cnt")).over(Window
        .orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val qs = s.range(0, 3).select(
      expr("element_at(array(0.5d, 0.9d, 0.99d), CAST(id + 1 AS INT))")
        .as("q"))
    val est = qs.crossJoin(broadcast(mm))
      .withColumn("target", col("q") * col("n").cast("double"))
      .join(hist, col("cb").cast("double") + col("cnt").cast("double")
        >= col("target"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q")
          .orderBy("bucket")))
      .filter(col("rn") === 1)
      .select(col("q"), expr(
        """mn + (CAST(bucket AS DOUBLE)
             + (target - CAST(cb AS DOUBLE)) / CAST(cnt AS DOUBLE))
           * (mx - mn) / 256.0d""").as("est"))
    o.createOrReplaceTempView("qsk_orders_v")
    val exact = s.sql(
      """SELECT
           percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS e50,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY x) AS e90,
           percentile_disc(0.99) WITHIN GROUP (ORDER BY x) AS e99
         FROM qsk_orders_v""")
    est.crossJoin(broadcast(exact))
      .withColumn("exact", expr(
        """CASE WHEN q = 0.5d THEN e50 WHEN q = 0.9d THEN e90
           ELSE e99 END"""))
      .select(col("q"), col("exact"), round(col("est"), 4).as("est"),
        round(expr("abs(est - exact) / exact"), 6).as("rel_err"))
      .orderBy("q")
  }

  /** LOG-RANK TEST between the two md5-arm customer cohorts on
    * time-to-first-order (days since corpus start, no censoring): at
    * each distinct event day the observed-minus-expected and
    * hypergeometric variance come from pure-integer at-risk counts
    * (suffix counts off one cumulative window over the days-sized
    * event table), each term 9-dp-rounded into the exact DECIMAL sum,
    * χ² = (ΣO−E)²/ΣV — the survival-curve-difference gate, all state
    * calendar-bounded.
    */
  private def qLogRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val first = tbl(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("fd"))
    val lo = first.agg(min(col("fd")).as("d0"))
    val ev = first.crossJoin(broadcast(lo))
      .select(datediff(col("fd"), col("d0")).cast("long").as("t"), expr(
        """CAST(conv(substring(md5(concat('29:',
             CAST(o_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT)
           % 2""").as("arm"))
      .groupBy("t")
      .agg(sum(when(col("arm") === 0, 1).otherwise(0)).cast("long")
          .as("d1"),
        sum(when(col("arm") === 1, 1).otherwise(0)).cast("long")
          .as("d2"))
    val tot = ev.agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"))
    val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val risk = ev.crossJoin(broadcast(tot))
      .withColumn("c1", coalesce(sum(col("d1")).over(w), lit(0L)))
      .withColumn("c2", coalesce(sum(col("d2")).over(w), lit(0L)))
      .select(col("n1"), col("n2"),
        col("d1"), col("d2"),
        (col("n1") - col("c1")).as("r1"),
        (col("n2") - col("c2")).as("r2"))
      .withColumn("oe", expr(
        """CAST(round(CAST(d1 AS DOUBLE)
             - CAST(d1 + d2 AS DOUBLE) * CAST(r1 AS DOUBLE)
               / CAST(r1 + r2 AS DOUBLE), 9) + 0.0d
           AS DECIMAL(18,9))"""))
      .withColumn("v", expr(
        """CAST(round(CASE WHEN r1 + r2 > 1 THEN
             CAST(d1 + d2 AS DOUBLE)
             * (CAST(r1 AS DOUBLE) / CAST(r1 + r2 AS DOUBLE))
             * (CAST(r2 AS DOUBLE) / CAST(r1 + r2 AS DOUBLE))
             * (CAST(r1 + r2 - d1 - d2 AS DOUBLE)
               / CAST(r1 + r2 - 1 AS DOUBLE))
           ELSE 0.0d END, 9) + 0.0d AS DECIMAL(18,9))"""))
    risk.agg(max(col("n1")).as("n_a"), max(col("n2")).as("n_b"),
        sum(col("d1")).as("o_a"), sum(col("oe")).as("soe"),
        sum(col("v")).as("sv"))
      .select(col("n_a"), col("n_b"), col("o_a"),
        round(expr("CAST(o_a AS DOUBLE) - CAST(soe AS DOUBLE)"), 6)
          .as("e_a"),
        round(expr(
          """CAST(soe AS DOUBLE) * CAST(soe AS DOUBLE)
             / CAST(sv AS DOUBLE)"""), 6).as("chi2_logrank"))
  }

  /** WILCOXON SIGNED-RANK of the year-over-year daily revenue change
    * (1996 vs 1995, paired on month+day): midranks of |diff| from
    * cumulative counts over the DISTINCT |diff| domain (qSpearman
    * contract), W⁺ as an exact DECIMAL rank sum, tie-corrected normal
    * approximation — the paired, outlier-robust "did this year really
    * move" answer.
    */
  private def qWilcoxonSigned(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"))
    val d95 = daily.filter(year(col("day")) === 1995)
      .select(month(col("day")).as("m"), dayofmonth(col("day")).as("d"),
        col("rev").as("r95"))
    val d96 = daily.filter(year(col("day")) === 1996)
      .select(month(col("day")).as("m"), dayofmonth(col("day")).as("d"),
        col("rev").as("r96"))
    val diffs = d95.join(d96, Seq("m", "d"))
      .select((col("r96") - col("r95")).as("diff"))
      .filter(col("diff") =!= 0)
      .select(col("diff"), abs(col("diff")).as("ad"))
    val dom = diffs.groupBy("ad").agg(count(lit(1)).as("t"))
      .withColumn("cb", coalesce(sum(col("t")).over(Window
        .orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("mr", expr(
        """CAST(CAST(cb AS DOUBLE) + (CAST(t AS DOUBLE) + 1.0d) / 2.0d
           AS DECIMAL(12,1))"""))
    val ties = dom.agg(sum(col("t")).as("n"),
      sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    diffs.join(dom.select(col("ad"), col("mr")), "ad")
      .agg(sum(when(col("diff") > 0, col("mr"))
        .otherwise(lit(0).cast("decimal(12,1)"))).as("wp"))
      .crossJoin(broadcast(ties))
      .select(col("n").as("n_pairs"),
        col("wp").cast("double").as("w_plus"),
        round(expr(
          """(CAST(wp AS DOUBLE)
             - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0d) / 4.0d)
             / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0d)
               * (2.0d * CAST(n AS DOUBLE) + 1.0d) / 24.0d
               - CAST(tsum AS DOUBLE) / 48.0d)"""), 6).as("z"))
  }

  // ---- round-10 batch 13: keyword extraction ----

  private val rakeStopsSeq = Seq("the", "and", "of", "to", "in", "is",
    "that", "for", "with", "a", "as", "on", "at", "by", "an", "be",
    "or", "it", "this", "are", "was", "from", "not", "but", "have",
    "has", "had", "they", "he", "she", "we", "you", "i")
  private val rakeStopsSqlList =
    rakeStopsSeq.map(w => s"'$w'").mkString(", ")

  /** RAKE KEYWORD EXTRACTION over the corpus: phrases are maximal
    * stopword/punctuation-free word runs (positions from ONE
    * posexplode, phrase ids from a per-doc boundary-count window —
    * never a per-phrase regex pass), word score = degree/frequency
    * over kept (≤4-word) phrases, phrase score = Σ word scores with
    * each term 6-dp-quantized so the DECIMAL sum is order-proof.
    * Top 15 phrases by score — the classic unsupervised keyword
    * harvest, one corpus explode + counts-sized joins.
    */
  private def qRakeKeywords(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tbl(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "[^a-z0-9]+"))
          .as(Seq("pos", "w")))
      .withColumn("b",
        col("w") === "" || expr(s"w IN ($rakeStopsSqlList)"))
      .withColumn("pid", sum(col("b").cast("int")).over(Window
        .partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val members = toks.filter(!col("b"))
      .select(col("doc_id"), col("pid"), col("pos"), col("w"))
      .persist()
    val phrases = members.groupBy("doc_id", "pid")
      .agg(concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(pos, w))), x -> x.w)"))
        .as("phrase"), count(lit(1)).as("len"))
      .filter(col("len") <= 4)
    val wordRows = members
      .join(phrases.select("doc_id", "pid", "len"), Seq("doc_id", "pid"))
    val wstat = wordRows.groupBy("w")
      .agg(count(lit(1)).as("freq"), sum(col("len")).as("deg"))
      .withColumn("score_w", expr(
        """CAST(round(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE), 6)
           AS DECIMAL(18,6))"""))
    val psc = wordRows.join(broadcast(wstat.select("w", "score_w")), "w")
      .groupBy("doc_id", "pid")
      .agg(sum(col("score_w")).as("psc"))
    phrases.join(psc, Seq("doc_id", "pid"))
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_occur"),
        min(col("psc")).cast("double").as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(15)
  }

  /** TEXTRANK KEYWORDS: the ±2-position co-occurrence graph over the
    * top-100 content words (edges from two lead() windows — no
    * corpus self-join), then 5 damped degree-normalized PageRank
    * iterations with per-term AND per-score 12-dp DECIMAL
    * re-quantization (the ops/PageRank determinism recipe, here over
    * a ≤100-node graph so the loop is driver-trivial at any corpus
    * size — the graph, not the corpus, is the state). Top 15 words.
    */
  private def qTextrank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tbl(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "[^a-z0-9]+"))
          .as(Seq("pos", "w")))
      .filter(col("w") =!= "" && !expr(s"w IN ($rakeStopsSqlList)"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(100)
      .select(col("w"))
    val wdoc = Window.partitionBy("doc_id").orderBy("pos")
    val nbr = toks
      .withColumn("w1", lead(col("w"), 1).over(wdoc))
      .withColumn("w2", lead(col("w"), 2).over(wdoc))
    val raw = nbr.select(col("w").as("a"), col("w1").as("b"))
      .union(nbr.select(col("w").as("a"), col("w2").as("b")))
      .filter(col("b").isNotNull && col("a") =!= col("b"))
      .join(broadcast(vocab.select(col("w").as("a"))), "a")
      .join(broadcast(vocab.select(col("w").as("b"))), "b")
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("wt"))
    val und = raw.select(col("a"), col("b"), col("wt"))
      .union(raw.select(col("b").as("a"), col("a").as("b"), col("wt")))
      .persist()
    val outw = und.groupBy("a").agg(sum(col("wt")).as("ow"))
    val nodes = und.select(col("a")).distinct()
    var sc = nodes.withColumn("sc",
      lit(BigDecimal(1.0)).cast("decimal(28,12)"))
    for (_ <- 1 to 5) {
      val contribs = und
        .join(outw, "a").join(sc, "a")
        .select(col("b").as("tgt"), expr(
          """CAST(round(CAST(wt AS DOUBLE) / CAST(ow AS DOUBLE)
               * CAST(sc AS DOUBLE), 12) AS DECIMAL(28,12))""")
          .as("t"))
        .groupBy("tgt").agg(sum(col("t")).as("st"))
      sc = nodes.join(contribs.withColumnRenamed("tgt", "a"),
          Seq("a"), "left")
        .select(col("a"), expr(
          """CAST(round(0.15d + 0.85d
               * CAST(coalesce(st, CAST(0 AS DECIMAL(38,12)))
                 AS DOUBLE), 12) AS DECIMAL(28,12))""").as("sc"))
        .localCheckpoint(eager = true)
    }
    sc.select(col("a").as("word"),
        round(col("sc").cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("word"))
      .limit(15)
  }

  // ---- round-10 batch 14: cluster quality + trusses + downside risk ----

  /** SIMPLIFIED SILHOUETTE of the labeled embedding clusters: a(i) =
    * distance to the own-label centroid, b(i) = min distance to any
    * other centroid, s = (b−a)/max(a,b), averaged per label.
    * Centroids come from the qEmbedDimStats exact-DECIMAL dim sums
    * (9-dp-quantized means), every squared-difference term is
    * 9-dp-quantized before its 64-dim DECIMAL sum, so the whole
    * readout is order-proof. Shape: rows × dims × k — k is bounded,
    * so this is one narrow fan-out + two keyed aggregates at any
    * corpus size (never vectors × vectors).
    */
  private def qSilhouette(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "ef")))
      .select(col("vec_id"), col("label"), col("dim"),
        col("ef").cast("double").as("v"))
    val cent = e.groupBy(col("label").as("clabel"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(28,12)")).as("sv"))
      .select(col("clabel"), col("dim"), expr(
        """round(CAST(sv AS DOUBLE) / CAST(n AS DOUBLE), 9) + 0.0d""")
        .as("m"))
    val dist = e.join(broadcast(cent), Seq("dim"))
      .select(col("vec_id"), col("label"), col("clabel"), expr(
        """CAST(round((v - m) * (v - m), 9) AS DECIMAL(18,9))""")
        .as("t"))
      .groupBy("vec_id", "label", "clabel")
      .agg(expr("sqrt(CAST(sum(t) AS DOUBLE))").as("d"))
    val ab = dist.groupBy("vec_id", "label")
      .agg(max(when(col("label") === col("clabel"), col("d"))).as("a"),
        min(when(col("label") =!= col("clabel"), col("d"))).as("b"))
      .select(col("vec_id"), col("label"), col("a"), col("b"), expr(
        """CAST(round((b - a) / greatest(a, b, 1e-12d), 6) + 0.0d
           AS DECIMAL(18,6))""").as("sil"))
    ab.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(expr("CAST(sum(sil) AS DOUBLE) / COUNT(1)"), 6)
          .as("mean_silhouette"),
        round(expr("""CAST(sum(CAST(round(a, 6) AS DECIMAL(18,6)))
          AS DOUBLE) / COUNT(1)"""), 6).as("mean_a"),
        round(expr("""CAST(sum(CAST(round(b, 6) AS DECIMAL(18,6)))
          AS DOUBLE) / COUNT(1)"""), 6).as("mean_b"))
      .orderBy("label")
  }

  /** K-TRUSS PEELING (k=4: every surviving edge sits in ≥2 triangles
    * among surviving edges; 3 bounded rounds): per round one wedge
    * join computes each edge's support and under-supported edges
    * leave, localCheckpointed per round (qKcore recipe). The
    * edge-level cohesion filter that strips tree-like fringe before
    * community mining — and the DuckDB twin unrolls the same three
    * rounds.
    */
  private def qKtruss(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    var und = writtenEdgesTable(s, dir)
      .filter(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    for (it <- 1 to 3) {
      val adj = und.select(col("u").as("a"), col("v").as("b"))
        .union(und.select(col("v").as("a"), col("u").as("b")))
      val sup = und
        .join(adj.select(col("a").as("u"), col("b").as("w1")), Seq("u"))
        .join(adj.select(col("a").as("v"), col("b").as("w2")), Seq("v"))
        .filter(col("w1") === col("w2"))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
      val prev = und
      und = und.join(sup.filter(col("support") >= 2), Seq("u", "v"),
          "left_semi")
        .localCheckpoint(true)
      prev.unpersist()
      val nn = und.select(explode(array(col("u"), col("v"))).as("n"))
        .distinct().count()
      out += ((it, nn, und.count()))
    }
    out.toSeq.toDF("iter", "n_nodes", "n_edges")
  }

  /** SORTINO RATIO of the daily revenue series: day-over-day returns
    * 9-dp-quantized, mean return and DOWNSIDE deviation (√ of the
    * mean squared negative return) from exact DECIMAL sums,
    * annualized ×√252 — the risk metric that, unlike Sharpe, only
    * charges for harmful volatility. Pairs with [[qDrawdown]] /
    * [[qVarCvar]] on the same series.
    */
  private def qSortino(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rets = dailyRev18(s, dir)
      .withColumn("prev", lag(col("rev"), 1).over(Window.orderBy("day")))
      .filter(col("prev").isNotNull)
      .select(expr(
        """CAST(round(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE),
           9) + 0.0d AS DECIMAL(18,9))""").as("r"))
    rets.agg(count(lit(1)).as("n_days"), sum(col("r")).as("sr"),
        sum(expr("""CAST(round(CAST(least(r,
            CAST(0 AS DECIMAL(18,9))) AS DOUBLE)
            * CAST(least(r, CAST(0 AS DECIMAL(18,9))) AS DOUBLE), 9)
          AS DECIMAL(18,9))""")).as("sd2"))
      .select(col("n_days"),
        round(expr("CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE)"), 6)
          .as("mean_daily_ret"),
        round(expr(
          "sqrt(CAST(sd2 AS DOUBLE) / CAST(n_days AS DOUBLE))"), 6)
          .as("downside_dev"),
        round(expr(
          """CAST(sr AS DOUBLE) / CAST(n_days AS DOUBLE)
             / sqrt(CAST(sd2 AS DOUBLE) / CAST(n_days AS DOUBLE))
             * 15.874507866387544d"""), 6).as("sortino_annual"))
  }

  // ---- round-10 batch 15: exact test + extremes + dispersion ----

  /** FISHER'S EXACT TEST (two-sided) of English vs above-median
    * length over the documents 2×2: log-factorials as a CUMULATIVE
    * 9-dp-rounded-ln DECIMAL prefix over 0..n (one corpus-count-sized
    * window — the libm contract), every candidate table's log-pmf as
    * pure DECIMAL lookups, the two-sided tail by the standard
    * pmf ≤ pmf_obs·(1+ε) rule with ε applied on the EXACT DECIMAL
    * log scale, and the p-value as a 12-dp-quantized exp sum. The
    * small-cell answer where the χ² approximation lies.
    */
  private def qFisherExact(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    tbl(s, dir, "documents").select(col("lang"), col("n_chars"))
      .createOrReplaceTempView("fe_docs_v")
    val cells = s.sql(
      """WITH med AS (SELECT percentile_disc(0.5)
             WITHIN GROUP (ORDER BY n_chars) AS med FROM fe_docs_v)
         SELECT
           CAST(SUM(CASE WHEN lang = 'en' AND n_chars >= med
             THEN 1 ELSE 0 END) AS BIGINT) AS a,
           CAST(SUM(CASE WHEN lang = 'en' AND n_chars < med
             THEN 1 ELSE 0 END) AS BIGINT) AS b,
           CAST(SUM(CASE WHEN lang <> 'en' AND n_chars >= med
             THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN lang <> 'en' AND n_chars < med
             THEN 1 ELSE 0 END) AS BIGINT) AS d
         FROM fe_docs_v CROSS JOIN med""")
      .withColumn("n", expr("a + b + c + d"))
      .withColumn("r1", expr("a + b"))
      .withColumn("c1", expr("a + c"))
    val lf = cells.select(explode(expr("sequence(0, n)")).as("i"))
      .withColumn("lnp", expr(
        """CASE WHEN i = 0 THEN CAST(0 AS DECIMAL(18,9))
           ELSE CAST(round(ln(CAST(i AS DOUBLE)), 9)
             AS DECIMAL(18,9)) END"""))
      .withColumn("lf", sum(col("lnp")).over(Window.orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("i"), col("lf"))
    def lfAt(k: String, as: String) = lf
      .select(col("i").as(k), col("lf").as(as))
    val ts = cells
      .select(col("a"), col("b"), col("c"), col("d"), col("n"),
        col("r1"), col("c1"),
        explode(expr(
          "sequence(greatest(0L, r1 + c1 - n), least(r1, c1))"))
          .as("t"))
      .join(lfAt("r1", "lf_r1"), "r1")
      .join(lfAt("c1", "lf_c1"), "c1")
      .join(lfAt("n", "lf_n"), "n")
      .withColumn("r2", expr("n - r1"))
      .withColumn("c2", expr("n - c1"))
      .join(lfAt("r2", "lf_r2"), "r2")
      .join(lfAt("c2", "lf_c2"), "c2")
      .join(lfAt("t", "lf_t"), "t")
      .withColumn("t2", expr("r1 - t"))
      .join(lfAt("t2", "lf_t2"), "t2")
      .withColumn("t3", expr("c1 - t"))
      .join(lfAt("t3", "lf_t3"), "t3")
      .withColumn("t4", expr("n - r1 - c1 + t"))
      .join(lfAt("t4", "lf_t4"), "t4")
      .withColumn("lnpmf", expr(
        """lf_r1 + lf_r2 + lf_c1 + lf_c2 - lf_n
           - lf_t - lf_t2 - lf_t3 - lf_t4"""))
    val obs = ts.filter(col("t") === col("a"))
      .select(col("lnpmf").as("lnobs"))
    ts.crossJoin(broadcast(obs))
      .filter(col("lnpmf") <= col("lnobs")
        + lit(BigDecimal("0.0000001")).cast("decimal(18,9)"))
      .agg(max(col("a")).as("a"), max(col("b")).as("b"),
        max(col("c")).as("c"), max(col("d")).as("d"),
        sum(expr(
          """CAST(round(exp(CAST(lnpmf AS DOUBLE)), 12)
           AS DECIMAL(18,12))""")).as("psum"))
      .select(col("a"), col("b"), col("c"), col("d"),
        round(expr("least(CAST(psum AS DOUBLE), 1.0d)"), 9)
          .as("p_two_sided"),
        round(expr(
          """CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
             / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"""), 6)
          .as("odds_ratio"))
  }

  /** GUMBEL EXTREME-VALUE FIT on monthly block maxima of daily
    * revenue: method-of-moments (β = σ√6/π, μ = mean − γβ with γ, π
    * as literals), plus the 12-month return level μ − β·ln(−ln(1−1/12))
    * — "how big a day should we provision for each year". Maxima and
    * moments from exact DECIMAL block aggregates; one ln pair at the
    * end on constants.
    */
  private def qGumbelMaxima(s: SparkSession, dir: String): DataFrame = {
    val bm = dailyRev18(s, dir)
      .groupBy(date_trunc("month", col("day")).as("mon"))
      .agg(max(col("rev")).as("mx"))
    bm.agg(count(lit(1)).as("n_blocks"), sum(col("mx")).as("sm"),
        sum(col("mx") * col("mx")).as("s2"))
      .withColumn("sd", expr(
        """sqrt(greatest(CAST(s2 AS DOUBLE) / CAST(n_blocks AS DOUBLE)
           - (CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE))
             * (CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)),
           0.0d))"""))
      .withColumn("beta", expr("sd * 0.7796968012336761d"))
      .withColumn("mu", expr(
        """CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)
           - 0.5772156649015329d * beta"""))
      .select(col("n_blocks"), round(col("beta"), 4).as("beta"),
        round(col("mu"), 4).as("mu"),
        round(expr(
          "mu - beta * ln(-ln(1.0d - 1.0d / 12.0d))"), 4)
          .as("ret_level_12mo"))
  }

  /** POISSON OVERDISPERSION of daily event counts: the index of
    * dispersion var/mean and its χ² form (n−1)·s²/x̄ from one exact
    * integer moment pass — the is-this-really-Poisson gate before
    * anyone fits a rate model to arrival counts.
    */
  private def qDispersion(s: SparkSession, dir: String): DataFrame = {
    val daily = withTsEvent(tbl(s, dir, "events"))
      .groupBy(to_date(col("ts_event")).as("day"))
      .agg(count(lit(1)).as("c"))
    daily.agg(count(lit(1)).as("n_days"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("s2"))
      .select(col("n_days"),
        round(expr("CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)"), 6)
          .as("mean_rate"),
        round(expr(dispIdxSql), 6).as("dispersion_index"),
        round(expr(
          s"CAST(n_days - 1 AS DOUBLE) * $dispIdxSql"), 6)
          .as("chi2_stat"))
  }

  private val dispIdxSql =
    """((CAST(s2 AS DOUBLE)
         - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
           / CAST(n_days AS DOUBLE))
       / CAST(n_days - 1 AS DOUBLE)
       / (CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE)))"""

  // ---- round-10 batch 16: effect sizes + permutation inference ----

  /** HODGES–LEHMANN pseudo-median of the YoY daily revenue change:
    * the median of all Walsh averages (dᵢ+dⱼ)/2 over the paired-day
    * panel — the robust location estimate that goes with
    * [[qWilcoxonSigned]]. The pair grid is calendar-bounded (≤365²/2
    * at ANY corpus size), sums stay exact DECIMAL and the median
    * is percentile_disc over the exact sums (monotone ÷2 after).
    */
  private def qHodgesLehmann(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"))
    val d95 = daily.filter(year(col("day")) === 1995)
      .select(month(col("day")).as("m"), dayofmonth(col("day")).as("d"),
        col("rev").as("r95"))
    val d96 = daily.filter(year(col("day")) === 1996)
      .select(month(col("day")).as("m"), dayofmonth(col("day")).as("d"),
        col("rev").as("r96"))
    val diffs = d95.join(d96, Seq("m", "d"))
      .select((col("r96") - col("r95")).as("diff"), col("m"), col("d"))
      .withColumn("i", row_number().over(
        Window.orderBy(col("diff"), col("m"), col("d"))))
      .select(col("i"), col("diff"))
    val walsh = diffs.alias("a")
      .join(diffs.alias("b"), col("a.i") <= col("b.i"))
      .select((col("a.diff") + col("b.diff")).as("ws"))
    walsh.createOrReplaceTempView("hl_walsh_v")
    s.sql(
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_walsh,
           round(CAST(percentile_disc(0.5)
             WITHIN GROUP (ORDER BY ws) AS DOUBLE) / 2.0d, 4)
             AS hl_estimate
         FROM hl_walsh_v""")
  }

  /** COHEN'S d AND HEDGES' g for the md5-arm spend difference — the
    * standardized effect sizes that turn [[qPowerMde]]'s machinery
    * into an interpretable "how big is the gap" number, with the
    * small-sample correction as a literal formula. One conditional-
    * moment pass, everything exact until the final division.
    */
  private def qCohensD(s: SparkSession, dir: String): DataFrame = {
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
      .withColumn("md", expr(
        """CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
           - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE)"""))
      .select(col("n_a"), col("n_b"),
        round(col("md"), 4).as("mean_diff"),
        round(expr("md / sd_pooled"), 6).as("cohens_d"),
        round(expr(
          """md / sd_pooled * (1.0d - 3.0d
             / (4.0d * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
               - 2.0d) - 1.0d))"""), 6).as("hedges_g"))
  }

  /** CRAMÉR'S V for the lang × source association: χ² over the
    * bounded contingency grid with each (o−e)²/e term 9-dp-quantized
    * into the exact DECIMAL sum, then V = √(χ²/(n·(min(r,c)−1))) —
    * the scale-free "are these two categoricals entangled" readout
    * a mixture auditor wants beside the raw χ².
    */
  private def qCramersV(s: SparkSession, dir: String): DataFrame = {
    val ct = tbl(s, dir, "documents")
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val rt = ct.groupBy("lang").agg(sum(col("o")).as("rl"))
    val st = ct.groupBy("source").agg(sum(col("o")).as("cs"))
    val tot = ct.agg(sum(col("o")).as("n"),
      countDistinct(col("lang")).as("nr"),
      countDistinct(col("source")).as("nc"))
    // complete grid (absent cells are o = 0)
    val grid = rt.crossJoin(st)
      .join(ct, Seq("lang", "source"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("term", expr(
        """CAST(round((CAST(o AS DOUBLE)
             - CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE)
               / CAST(n AS DOUBLE))
           * (CAST(o AS DOUBLE)
             - CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE)
               / CAST(n AS DOUBLE))
           / (CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE)
             / CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9))"""))
    grid.agg(max(col("n")).as("n_docs"), max(col("nr")).as("nr"),
        max(col("nc")).as("nc"), sum(col("term")).as("chi2d"))
      .select(col("n_docs"),
        ((col("nr") - 1) * (col("nc") - 1)).as("df"),
        round(col("chi2d").cast("double"), 6).as("chi2"),
        round(expr(
          """sqrt(CAST(chi2d AS DOUBLE) / (CAST(n_docs AS DOUBLE)
             * CAST(least(nr, nc) - 1 AS DOUBLE)))"""), 6)
          .as("cramers_v"))
  }

  /** PERMUTATION TEST of the arm spend difference: 200 deterministic
    * md5-keyed relabelings (the q_bootstrap_ci replayable-randomness
    * contract), each rep's mean difference from exact conditional
    * DECIMAL sums, p = (1 + #{|Δ_perm| ≥ |Δ_obs|})/(R+1) with the
    * comparison on 6-dp-rounded DECIMALs so both engines count the
    * same exceedances. The 200× explode is map-side-combined to 200
    * rows — the same scale shape as the bootstrap.
    */
  private def qPermutationTest(s: SparkSession, dir: String): DataFrame = {
    val spend = tbl(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("y"))
    val obs = spend
      .withColumn("arm", expr(
        """CAST(conv(substring(md5(concat('23:',
             CAST(o_custkey AS STRING))), 1, 8), 16, 10) AS BIGINT)
           % 2"""))
      .agg(expr("""CAST(round(
          CAST(SUM(CASE WHEN arm = 0 THEN y END) AS DOUBLE)
            / SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
          - CAST(SUM(CASE WHEN arm = 1 THEN y END) AS DOUBLE)
            / SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END), 6) + 0.0d
        AS DECIMAL(18,6))""").as("obs_diff"))
    val reps = spend
      .select(col("o_custkey"), col("y"),
        explode(expr("sequence(0, 199)")).as("rep"))
      .withColumn("parm", expr(
        """CAST(conv(substring(md5(concat('p31:', CAST(rep AS STRING),
             ':', CAST(o_custkey AS STRING))), 1, 8), 16, 10)
           AS BIGINT) % 2"""))
      .groupBy("rep")
      .agg(expr("""CAST(round(
          CAST(SUM(CASE WHEN parm = 0 THEN y END) AS DOUBLE)
            / SUM(CASE WHEN parm = 0 THEN 1 ELSE 0 END)
          - CAST(SUM(CASE WHEN parm = 1 THEN y END) AS DOUBLE)
            / SUM(CASE WHEN parm = 1 THEN 1 ELSE 0 END), 6) + 0.0d
        AS DECIMAL(18,6))""").as("pd"))
    reps.crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("n_reps"),
        max(col("obs_diff")).cast("double").as("obs_diff"),
        sum(when(abs(col("pd")) >= abs(col("obs_diff")), 1)
          .otherwise(0)).cast("long").as("n_exceed"))
      .select(col("n_reps"), col("obs_diff"), col("n_exceed"),
        round(expr(
          """(1.0d + CAST(n_exceed AS DOUBLE))
             / (CAST(n_reps AS DOUBLE) + 1.0d)"""), 6).as("p_perm"))
  }

  // ---- round-10 batch 17: multiple regression battery ----

  /** The shared (price ~ quantity + discount) moment pass: ONE
    * map-side-combinable aggregate over lineitem computing the ten
    * exact DECIMAL raw moments a 2-regressor normal-equation solve
    * needs. Every downstream statistic (OLS, ridge path, VIF) is
    * O(1) double math over this single row — the qLinreg contract
    * widened to two regressors.
    */
  private def olsMoments(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .select(col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_discount").cast("decimal(12,2)").as("z"),
        col("l_extendedprice").cast("decimal(14,2)").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("z")).as("sz"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("x") * col("z")).as("sxz"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("z") * col("y")).as("szy"),
        sum(col("y") * col("y")).as("syy"))

  /** Centered-moment SQL fragments shared by the OLS / ridge / VIF
    * trio — written ONCE so the Spark select and the DuckDB twin use
    * byte-identical double expressions (same casts, same operation
    * order → bit-identical IEEE results, the qLinreg determinism
    * contract).
    */
  private val cmSxx =
    """(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
         / CAST(n AS DOUBLE))"""
  private val cmSzz =
    """(CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
         / CAST(n AS DOUBLE))"""
  private val cmSxz =
    """(CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE)
         / CAST(n AS DOUBLE))"""
  private val cmSxy =
    """(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
         / CAST(n AS DOUBLE))"""
  private val cmSzy =
    """(CAST(szy AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE)
         / CAST(n AS DOUBLE))"""
  private val cmSyy =
    """(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
         / CAST(n AS DOUBLE))"""

  /** TWO-REGRESSOR OLS (price ~ quantity + discount) solved in closed
    * form from the 2×2 normal equations over exact centered moments —
    * never an iterative fit. b₁, b₂ come from the explicit 2×2
    * inverse, the intercept from the mean identity, R² from the
    * explained-sum identity b₁Sxy + b₂Szy over Syy, and adjusted R²
    * from the n−3 df correction. The 100 TB shape: one aggregate to a
    * single row, then O(1) arithmetic.
    */
  private def qOlsMulti(s: SparkSession, dir: String): DataFrame =
    olsMoments(s, dir)
      .withColumn("det", expr(s"$cmSxx * $cmSzz - $cmSxz * $cmSxz"))
      .withColumn("b1", expr(
        s"($cmSzz * $cmSxy - $cmSxz * $cmSzy) / det"))
      .withColumn("b2", expr(
        s"($cmSxx * $cmSzy - $cmSxz * $cmSxy) / det"))
      .withColumn("r2", expr(
        s"(b1 * $cmSxy + b2 * $cmSzy) / $cmSyy"))
      .select(col("n").cast("long").as("n"),
        round(col("b1"), 6).as("b_qty"),
        round(col("b2"), 6).as("b_disc"),
        round(expr(
          """(CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE)
               - b2 * CAST(sz AS DOUBLE)) / CAST(n AS DOUBLE)"""), 6)
          .as("intercept"),
        round(col("r2"), 6).as("r2"),
        round(expr(
          """1.0d - (1.0d - r2) * (CAST(n AS DOUBLE) - 1.0d)
             / (CAST(n AS DOUBLE) - 3.0d)"""), 6).as("r2_adj"))

  /** RIDGE REGRESSION PATH: the same centered normal equations with a
    * per-λ diagonal bump, solved by the explicit 2×2 inverse at three
    * penalties (0 / 10⁴ / 10⁷) via a 3-row lambda explode — the
    * shrinkage trace that shows both coefficients contracting toward
    * zero as λ grows. λ = 0 must reproduce [[qOlsMulti]] exactly
    * (asserted in spec); the whole path costs one moment pass plus a
    * 3-row crossJoin.
    */
  private def qRidgePath(s: SparkSession, dir: String): DataFrame = {
    val lambdas = s.range(0, 3)
      .select(when(col("id") === 0, 0.0d)
        .when(col("id") === 1, 1.0e4d)
        .otherwise(1.0e7d).as("lambda"))
    olsMoments(s, dir).crossJoin(broadcast(lambdas))
      .withColumn("det", expr(
        s"($cmSxx + lambda) * ($cmSzz + lambda) - $cmSxz * $cmSxz"))
      .select(col("lambda"),
        round(expr(
          s"(($cmSzz + lambda) * $cmSxy - $cmSxz * $cmSzy) / det"), 6)
          .as("b_qty"),
        round(expr(
          s"(($cmSxx + lambda) * $cmSzy - $cmSxz * $cmSxy) / det"), 6)
          .as("b_disc"))
      .orderBy("lambda")
  }

  /** VARIANCE INFLATION FACTOR of the (quantity, discount) design,
    * per return flag: VIF = 1/(1−r²ₓᵤ) where r²ₓᵤ = Sxz²/(SxxSzz) —
    * the collinearity audit that says whether [[qOlsMulti]]'s
    * coefficients are individually trustworthy. Grouped moments, one
    * row per flag, everything exact until the final divisions.
    */
  private def qVif(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_discount").cast("decimal(12,2)").as("z"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("z")).as("sz"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("x") * col("z")).as("sxz"))
      .withColumn("r2xz", expr(
        s"($cmSxz * $cmSxz) / ($cmSxx * $cmSzz)"))
      .select(col("l_returnflag"), col("n").cast("long").as("n"),
        round(expr(s"$cmSxz / sqrt($cmSxx * $cmSzz)"), 6)
          .as("corr_xz"),
        round(expr("1.0d / (1.0d - r2xz)"), 6).as("vif"))
      .orderBy("l_returnflag")

  // ---- round-10 batch 18: multivariate outliers + complexity ----

  /** MAHALANOBIS OUTLIERS over the per-customer (order count, total
    * spend) plane: the 2×2 covariance comes from ONE exact moment
    * pass, its closed-form inverse turns each customer's deviation
    * into d² = (vzz·dx² − 2vxz·dx·dz + vxx·dz²)/det, and the top-10
    * ride a TakeOrdered head — never a global sort materialized. The
    * correlation-aware upgrade of [[qVecOutlier]]'s centroid
    * distance: a customer can be normal on each axis and still be a
    * joint outlier.
    */
  private def qMahalanobis(s: SparkSession, dir: String): DataFrame = {
    val feats = tbl(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).cast("decimal(12,0)").as("x"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("z"))
    val mom = feats.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("z")).as("sz"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("z").cast("decimal(19,2)")
        * col("z").cast("decimal(19,2)")).as("szz"),
      sum(col("x").cast("decimal(12,0)")
        * col("z").cast("decimal(19,2)")).as("sxz"))
    feats.crossJoin(broadcast(mom))
      .withColumn("dx", expr(
        "CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("dz", expr(
        "CAST(z AS DOUBLE) - CAST(sz AS DOUBLE) / CAST(n AS DOUBLE)"))
      .withColumn("vxx", expr(s"$cmSxx / CAST(n AS DOUBLE)"))
      .withColumn("vzz", expr(s"$cmSzz / CAST(n AS DOUBLE)"))
      .withColumn("vxz", expr(s"$cmSxz / CAST(n AS DOUBLE)"))
      .withColumn("d2", round(expr(
        """(vzz * dx * dx - 2.0d * vxz * dx * dz + vxx * dz * dz)
           / (vxx * vzz - vxz * vxz)"""), 6))
      .select(col("o_custkey"), col("x").cast("long").as("n_orders"),
        col("z").cast("double").as("spend"), col("d2"))
      .orderBy(col("d2").desc, col("o_custkey"))
      .limit(10)
  }

  /** PERMUTATION ENTROPY (order 3) of the daily-revenue series: each
    * day is classified by the ordinal pattern of (lag2, lag1, self)
    * — encoded as the three ≥-comparison bits, a tie-robust,
    * engine-identical code — and the Shannon entropy of the pattern
    * histogram is the series-complexity readout (low = trending /
    * predictable, ln 6 = white noise). ln rides the repo's
    * round-to-9dp-then-DECIMAL-sum contract; windows run over the
    * DAYS-sized aggregate only.
    */
  private def qPermEntropy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"))
    val w = Window.orderBy("day")
    val pats = daily
      .withColumn("r1", lag(col("rev"), 2).over(w))
      .withColumn("r2", lag(col("rev"), 1).over(w))
      .filter(col("r1").isNotNull)
      .select(concat(
        when(col("r1") >= col("r2"), lit("1")).otherwise(lit("0")),
        when(col("r2") >= col("rev"), lit("1")).otherwise(lit("0")),
        when(col("r1") >= col("rev"), lit("1")).otherwise(lit("0")))
        .as("pat"))
      .groupBy("pat").agg(count(lit(1)).as("c"))
    val tot = pats.agg(sum(col("c")).as("nt"))
    pats.crossJoin(broadcast(tot))
      .select(col("pat"), col("c"),
        (col("c").cast("decimal(18,0)")
          * expr("CAST(round(ln(CAST(c AS DOUBLE)"
            + " / CAST(nt AS DOUBLE)), 9) AS DECIMAL(12,9))"))
          .as("term"), col("nt"))
      .groupBy()
      .agg(max(col("nt")).cast("long").as("n_windows"),
        count(lit(1)).cast("long").as("n_patterns"),
        sum(col("term")).as("tsum"))
      .select(col("n_windows"), col("n_patterns"),
        round(expr(
          """-CAST(tsum AS DOUBLE) / CAST(n_windows AS DOUBLE)"""), 6)
          .as("perm_entropy"),
        round(expr(
          """-CAST(tsum AS DOUBLE) / CAST(n_windows AS DOUBLE)
             / ln(6.0d)"""), 6).as("normalized"))
  }

  /** SAMPLE ENTROPY (m = 2, r = 0.2σ) of one year of daily revenue:
    * B counts template pairs whose 2-windows stay within Chebyshev
    * tolerance r, A the same for 3-windows; SampEn = −ln(A/B). The
    * pair grid is CALENDAR-BOUNDED (≤365²/2 at any corpus size — the
    * qHodgesLehmann contract), the tolerance is one rounded-DECIMAL
    * constant so the ≤ comparisons are exact on both engines, and
    * the counts are plain integers: the only libm call is the final
    * ln on an integer ratio.
    */
  private def qSampleEntropy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "orders")
      .filter(year(to_date(col("o_orderdate"))) === 1995)
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"))
    val sd = daily.agg(count(lit(1)).as("n"),
      sum(col("rev")).as("sy"),
      sum(col("rev").cast("decimal(19,2)")
        * col("rev").cast("decimal(19,2)")).as("syy"))
      .select(expr(
        """CAST(round(0.2d * sqrt((CAST(syy AS DOUBLE)
             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
               / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 2)
           AS DECIMAL(18,2))""").as("r"))
    val w = Window.orderBy("day")
    val tpl = daily
      .withColumn("i", row_number().over(w))
      .withColumn("v1", lead(col("rev"), 1).over(w))
      .withColumn("v2", lead(col("rev"), 2).over(w))
      .filter(col("v2").isNotNull)
      .select(col("i"), col("rev").as("v0"), col("v1"), col("v2"))
    val pairs = tpl.alias("a")
      .join(tpl.alias("b"), col("a.i") < col("b.i"))
      .crossJoin(broadcast(sd))
      .select(
        (greatest(abs(col("a.v0") - col("b.v0")),
          abs(col("a.v1") - col("b.v1"))) <= col("r")).as("mb"),
        (greatest(abs(col("a.v0") - col("b.v0")),
          abs(col("a.v1") - col("b.v1")),
          abs(col("a.v2") - col("b.v2"))) <= col("r")).as("ma"),
        col("r"))
    pairs.agg(max(col("r")).cast("double").as("tolerance"),
        sum(when(col("mb"), 1L).otherwise(0L)).as("b_count"),
        sum(when(col("ma"), 1L).otherwise(0L)).as("a_count"))
      .select(col("tolerance"), col("b_count"), col("a_count"),
        round(expr(
          """-ln(CAST(a_count AS DOUBLE) / CAST(b_count AS DOUBLE))"""),
          6).as("sampen"))
  }

  // ---- round-10 batch 19: spectral + structural-break + blocks ----

  /** PERIODOGRAM of the daily-revenue series at five candidate
    * periods (7/30/91/182/365 days): power(p) = (Σ ŷ·cos)² + (Σ ŷ·sin)²
    * over the mean-centered series — the weekly spike should dominate.
    * Determinism: the phase is 2π·(t mod p)/p (bounded argument, no
    * libm range reduction), cos/sin are 9-dp-quantized into DECIMAL
    * before the exact product-sum (the round-ln contract), and the
    * deviations are exact DECIMALs off a once-rounded mean. Five
    * periods × days-sized series — the grid stays calendar-bounded.
    */
  private def qPeriodogram(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"))
    val mean = daily.agg(expr(
      """CAST(round(CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
           2) AS DECIMAL(18,2))""").as("mu"),
      count(lit(1)).as("nd"))
    val ts = daily
      .withColumn("t", row_number().over(Window.orderBy("day")) - 1)
      .crossJoin(broadcast(mean))
      .select(col("t"), col("nd"),
        (col("rev") - col("mu")).cast("decimal(19,2)").as("dev"))
    val periods = s.range(0, 5).select(
      when(col("id") === 0, 7).when(col("id") === 1, 30)
        .when(col("id") === 2, 91).when(col("id") === 3, 182)
        .otherwise(365).as("period"))
    ts.crossJoin(broadcast(periods))
      .withColumn("ang", expr(
        """6.283185307179586d * CAST(t % period AS DOUBLE)
           / CAST(period AS DOUBLE)"""))
      .select(col("period"), col("nd"),
        (col("dev") * expr(
          "CAST(round(cos(ang), 9) AS DECIMAL(12,9))")).as("tc"),
        (col("dev") * expr(
          "CAST(round(sin(ang), 9) AS DECIMAL(12,9))")).as("tsn"))
      .groupBy("period")
      .agg(max(col("nd")).cast("long").as("n_days"),
        sum(col("tc")).as("sc"), sum(col("tsn")).as("ss"))
      .select(col("period"), col("n_days"),
        round(expr(
          """(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
             + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
             / CAST(n_days AS DOUBLE)"""), 2).as("power"))
      .orderBy("period")
  }

  /** CHOW TEST for a structural break in the (daily revenue ~ daily
    * order count) regression at 1996-01-01: closed-form SSRs from
    * exact per-segment moment sums (the qLinreg contract — raw
    * moments ADD, so the pooled fit reuses the same two rows),
    * F = ((SSRp − SSR₁ − SSR₂)/2) / ((SSR₁+SSR₂)/(n−4)). One grouped
    * aggregate to two rows, one conditional pivot, O(1) double math.
    */
  private def qChowTest(s: SparkSession, dir: String): DataFrame = {
    val daily = tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day")
      .agg(count(lit(1)).cast("decimal(12,0)").as("x"),
        sum(col("p")).cast("decimal(19,2)").as("y"))
      .withColumn("seg",
        when(col("day") < lit("1996-01-01").cast("date"), 1)
          .otherwise(2))
    val m = daily.groupBy("seg")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
    def ssr(pre: String): String =
      s"""((CAST(${pre}syy AS DOUBLE) - CAST(${pre}sy AS DOUBLE)
             * CAST(${pre}sy AS DOUBLE) / CAST(${pre}n AS DOUBLE))
           - (CAST(${pre}sxy AS DOUBLE) - CAST(${pre}sx AS DOUBLE)
               * CAST(${pre}sy AS DOUBLE) / CAST(${pre}n AS DOUBLE))
             * (CAST(${pre}sxy AS DOUBLE) - CAST(${pre}sx AS DOUBLE)
               * CAST(${pre}sy AS DOUBLE) / CAST(${pre}n AS DOUBLE))
             / (CAST(${pre}sxx AS DOUBLE) - CAST(${pre}sx AS DOUBLE)
               * CAST(${pre}sx AS DOUBLE) / CAST(${pre}n AS DOUBLE)))"""
    m.agg(
        sum(when(col("seg") === 1, col("n"))).as("an"),
        sum(when(col("seg") === 1, col("sx"))).as("asx"),
        sum(when(col("seg") === 1, col("sy"))).as("asy"),
        sum(when(col("seg") === 1, col("sxx"))).as("asxx"),
        sum(when(col("seg") === 1, col("sxy"))).as("asxy"),
        sum(when(col("seg") === 1, col("syy"))).as("asyy"),
        sum(when(col("seg") === 2, col("n"))).as("bn"),
        sum(when(col("seg") === 2, col("sx"))).as("bsx"),
        sum(when(col("seg") === 2, col("sy"))).as("bsy"),
        sum(when(col("seg") === 2, col("sxx"))).as("bsxx"),
        sum(when(col("seg") === 2, col("sxy"))).as("bsxy"),
        sum(when(col("seg") === 2, col("syy"))).as("bsyy"),
        sum(col("n")).as("pn"), sum(col("sx")).as("psx"),
        sum(col("sy")).as("psy"), sum(col("sxx")).as("psxx"),
        sum(col("sxy")).as("psxy"), sum(col("syy")).as("psyy"))
      .withColumn("ssr1", expr(ssr("a")))
      .withColumn("ssr2", expr(ssr("b")))
      .withColumn("ssrp", expr(ssr("p")))
      // raw SSRs are ~1e14-magnitude doubles whose fixed-dp rounding
      // is not engine-stable; emit only O(1) scale-free readouts
      // (slopes, SSR ratio, F) — all safe at 6 dp
      .select(col("an").cast("long").as("n_pre"),
        col("bn").cast("long").as("n_post"),
        round(expr(
          """(CAST(asxy AS DOUBLE) - CAST(asx AS DOUBLE)
               * CAST(asy AS DOUBLE) / CAST(an AS DOUBLE))
             / (CAST(asxx AS DOUBLE) - CAST(asx AS DOUBLE)
               * CAST(asx AS DOUBLE) / CAST(an AS DOUBLE))"""), 6)
          .as("slope_pre"),
        round(expr(
          """(CAST(bsxy AS DOUBLE) - CAST(bsx AS DOUBLE)
               * CAST(bsy AS DOUBLE) / CAST(bn AS DOUBLE))
             / (CAST(bsxx AS DOUBLE) - CAST(bsx AS DOUBLE)
               * CAST(bsx AS DOUBLE) / CAST(bn AS DOUBLE))"""), 6)
          .as("slope_post"),
        round(expr("ssrp / (ssr1 + ssr2)"), 6).as("ssr_ratio"),
        round(expr(
          """((ssrp - (ssr1 + ssr2)) / 2.0d)
             / ((ssr1 + ssr2) / (CAST(an AS DOUBLE)
               + CAST(bn AS DOUBLE) - 4.0d))"""), 6).as("f_stat"))
  }

  /** FRIEDMAN TEST over the month × order-priority revenue grid
    * (1995): within-block midranks from exact DECIMAL comparisons
    * (count-less + half-count-equal — no window-function rank, so
    * ties are handled identically on both engines), then
    * χ²_F = 12/(nk(k+1))·ΣR²ⱼ − 3n(k+1). The grid is 12×5 at ANY
    * corpus size — the blocked nonparametric twin of [[qAnova]].
    */
  private def qFriedman(s: SparkSession, dir: String): DataFrame = {
    val cells0 = tbl(s, dir, "orders")
      .filter(year(to_date(col("o_orderdate"))) === 1995)
      .groupBy(month(to_date(col("o_orderdate"))).as("m"),
        col("o_orderpriority").as("trt"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("v"))
    // Friedman requires COMPLETE blocks: keep only months where every
    // treatment level is observed (at tiny SFs sparse months would
    // otherwise make the uncorrected statistic negative)
    val kAll = cells0.select(countDistinct(col("trt")).as("kk"))
    val complete = cells0.groupBy("m")
      .agg(count(lit(1)).as("nm"))
      .crossJoin(broadcast(kAll))
      .filter(col("nm") === col("kk"))
      .select("m")
    val cells = cells0.join(broadcast(complete), "m")
    val ranks = cells.alias("a")
      .join(cells.alias("b"), col("a.m") === col("b.m"))
      .groupBy(col("a.m").as("m"), col("a.trt").as("trt"))
      .agg(sum(when(col("b.v") < col("a.v"), 1L).otherwise(0L))
          .as("cl"),
        sum(when(col("b.v") === col("a.v"), 1L).otherwise(0L))
          .as("ce"))
      .select(col("m"), col("trt"), expr(
        "CAST(cl AS DOUBLE) + (CAST(ce AS DOUBLE) + 1.0d) / 2.0d")
        .as("r"))
    val rj = ranks.groupBy("trt")
      .agg(sum(col("r")).as("rsum"), count(lit(1)).as("nb"))
    rj.agg(max(col("nb")).cast("long").as("n_blocks"),
        count(lit(1)).cast("long").as("k"),
        sum(col("rsum") * col("rsum")).as("sr2"))
      .select(col("n_blocks"), col("k"),
        round(expr(
          """12.0d * CAST(sr2 AS DOUBLE)
             / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
               * (CAST(k AS DOUBLE) + 1.0d))
             - 3.0d * CAST(n_blocks AS DOUBLE)
               * (CAST(k AS DOUBLE) + 1.0d)"""), 6).as("chi2_f"),
        (col("k") - 1).cast("long").as("df"))
  }

  // ---- round-10 batch 20: distribution distance + blocked tests ----

  /** 1-WASSERSTEIN (earth mover's) DISTANCE between the 1995 and 1996
    * daily-revenue distributions, via the merged-support CDF
    * integral: W₁ = Σ |F₁(v)−F₂(v)|·Δv over consecutive distinct
    * values. The integrand is kept EXACT as |c₁·n₂ − c₂·n₁|·Δv
    * (integer cross-products, the qKsTest contract) with one final
    * division by n₁n₂ — no floating CDFs, no quantile interpolation,
    * and the merged support is calendar-bounded (≤731 values at any
    * corpus size).
    */
  private def qWasserstein(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "orders")
      .select(year(to_date(col("o_orderdate"))).as("yr"),
        to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .filter(col("yr").isin(1995, 1996))
      .groupBy("yr", "day").agg(sum(col("p")).as("rev"))
    val byVal = daily.groupBy("rev")
      .agg(sum(when(col("yr") === 1995, 1L).otherwise(0L)).as("c1"),
        sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("c2"))
    val tot = daily.agg(
      sum(when(col("yr") === 1995, 1L).otherwise(0L)).as("n1"),
      sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("n2"))
    val w = Window.orderBy("rev")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byVal
      .withColumn("f1", sum(col("c1")).over(w))
      .withColumn("f2", sum(col("c2")).over(w))
      .withColumn("nxt", lead(col("rev"), 1).over(Window.orderBy("rev")))
      .filter(col("nxt").isNotNull)
      .crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        (abs(col("f1") * col("n2") - col("f2") * col("n1"))
          .cast("decimal(18,0)")
          * (col("nxt") - col("rev")).cast("decimal(19,2)"))
          .as("term"))
      .groupBy()
      .agg(max(col("n1")).cast("long").as("n_1995"),
        max(col("n2")).cast("long").as("n_1996"),
        sum(col("term")).as("tsum"))
      .select(col("n_1995"), col("n_1996"),
        round(expr(
          """CAST(tsum AS DOUBLE) / (CAST(n_1995 AS DOUBLE)
             * CAST(n_1996 AS DOUBLE))"""), 4).as("w1_distance"))
  }

  /** CRAMÉR–VON MISES uniformity test of the daily-revenue CENTS
    * distribution (the continuous-tail complement of [[qBenford]]'s
    * leading-digit audit): T = 1/(12n) + Σᵢ(u₍ᵢ₎ − (2i−1)/(2n))².
    * The order statistics are grouped over the 100 distinct cent
    * values and the inner sum is expanded in CLOSED FORM via ΣK with
    * K = 400i − 200 − 2n(2c+1): 6·ΣK² = 160000·P₂ + 2400·D·P₁ +
    * 6·cnt·D² with P₂/P₁ the cube/square prefix-sum identities —
    * pure BIGINT arithmetic over a calendar-bounded series (the
    * Fisher log-factorial prefix-sum discipline), one double
    * division at the end.
    */
  private def qCvmUniform(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"))
      .select((expr("CAST(rev * 100 AS BIGINT)") % 100).as("c"))
      .groupBy("c").agg(count(lit(1)).as("cnt"))
    val tot = cents.agg(sum(col("cnt")).as("n"))
    val w = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cents
      .withColumn("hi", sum(col("cnt")).over(w))
      .withColumn("lo", col("hi") - col("cnt"))
      .crossJoin(broadcast(tot))
      .withColumn("d", expr("-200L - 2L * n * (2L * c + 1L)"))
      .withColumn("p2", expr(
        """hi * (hi + 1L) * (2L * hi + 1L)
           - lo * (lo + 1L) * (2L * lo + 1L)"""))
      .withColumn("p1", expr(
        "hi * (hi + 1L) - lo * (lo + 1L)"))
      .withColumn("k6", expr(
        """160000L * p2 + 2400L * d * p1 + 6L * cnt * d * d"""))
      .groupBy()
      .agg(max(col("n")).cast("long").as("n_days"),
        sum(col("k6")).as("k6sum"))
      .select(col("n_days"),
        round(expr(
          """1.0d / (12.0d * CAST(n_days AS DOUBLE))
             + CAST(k6sum AS DOUBLE)
               / (960000.0d * CAST(n_days AS DOUBLE)
                 * CAST(n_days AS DOUBLE))"""), 6).as("t_stat"))
  }

  /** COCHRAN'S Q over the customer × year (1995/96/97) purchase
    * indicator matrix: did the propensity to order change across
    * years, blocked per customer? Q = (k−1)(kΣC²ⱼ − T²)/(kT − ΣR²ᵢ)
    * — every term an exact BIGINT from two aggregates (one per-
    * customer, one global), so the statistic is engine-identical
    * with zero floating intermediates. The k=3 matched-binary
    * extension of [[qMcnemar]].
    */
  private def qCochranQ(s: SparkSession, dir: String): DataFrame = {
    val flags = tbl(s, dir, "orders")
      .select(col("o_custkey"),
        year(to_date(col("o_orderdate"))).as("yr"))
      .filter(col("yr").isin(1995, 1996, 1997))
      .groupBy("o_custkey")
      .agg(max(when(col("yr") === 1995, 1L).otherwise(0L)).as("i95"),
        max(when(col("yr") === 1996, 1L).otherwise(0L)).as("i96"),
        max(when(col("yr") === 1997, 1L).otherwise(0L)).as("i97"))
    flags.agg(count(lit(1)).as("n_cust"),
        sum(col("i95")).as("c95"), sum(col("i96")).as("c96"),
        sum(col("i97")).as("c97"),
        sum(col("i95") + col("i96") + col("i97")).as("t"),
        sum((col("i95") + col("i96") + col("i97"))
          * (col("i95") + col("i96") + col("i97"))).as("sr2"))
      .select(col("n_cust").cast("long").as("n_cust"),
        col("c95").cast("long").as("c95"),
        col("c96").cast("long").as("c96"),
        col("c97").cast("long").as("c97"),
        round(expr(
          """2.0d * (3.0d * (CAST(c95 AS DOUBLE) * CAST(c95 AS DOUBLE)
               + CAST(c96 AS DOUBLE) * CAST(c96 AS DOUBLE)
               + CAST(c97 AS DOUBLE) * CAST(c97 AS DOUBLE))
             - CAST(t AS DOUBLE) * CAST(t AS DOUBLE))
             / (3.0d * CAST(t AS DOUBLE) - CAST(sr2 AS DOUBLE))"""), 6)
          .as("q_stat"),
        lit(2L).as("df"))
  }

  // ---- round-10 batch 21: graph centrality + chain fixpoints ----

  /** Truncated KATZ CENTRALITY (α = 0.005, 4 steps) over the shared
    * co-supplier edge artifact — walk-volume centrality that rewards
    * raw connectivity where [[qPageRank]] normalizes it away. Rides
    * [[graft.ops.Katz]]'s DECIMAL(28,12) requantized state (byte-
    * identical under any partitioning, unrolled-CTE replayable) and
    * the write-once edge build, so the marginal cost is four
    * join+agg rounds over a parquet read. Top-10 by rounded score.
    */
  private def qKatz(s: SparkSession, dir: String): DataFrame = {
    val edges = writtenEdgesTable(s, dir)
    graft.ops.Katz.scores(edges, "src", "dst", iters = 4)
      .select(col("node").as("suppkey"),
        round(col("x").cast("double"), 8).as("katz"))
      .orderBy(col("katz").desc, col("suppkey"))
      .limit(10)
  }

  /** STATIONARY DISTRIBUTION of the event-type Markov chain: the
    * [[qMarkov]] transition matrix (probabilities 9-dp-quantized so
    * both engines iterate the SAME matrix), powered four steps from
    * the uniform start with 12-dp requantized state — the
    * steady-state page-mix readout. The state space is the event-type
    * vocabulary (a handful), so after the one corpus-sized transition
    * count every iteration is a constant-size join.
    */
  private def qMarkovStationary(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = tbl(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("prev_type"))
      .withColumn("next_type", lead(col("prev_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n"))
    val p = trans
      .withColumn("p", expr(
        """CAST(round(CAST(n AS DOUBLE) / CAST(SUM(n) OVER
             (PARTITION BY prev_type) AS DOUBLE), 9)
           AS DECIMAL(12,9))"""))
      .select(col("prev_type"), col("next_type"), col("p"))
      .persist()
    val states = p.select(col("prev_type").as("state")).distinct()
    val k = states.count()
    var pi = states.select(col("state"),
      expr(s"CAST(round(1.0 / $k, 12) AS DECIMAL(28,12))").as("pi"))
    for (_ <- 1 to 4) {
      val stepped = p
        .join(pi.withColumnRenamed("state", "prev_type"), "prev_type")
        .select(col("next_type").as("state"),
          expr("CAST(round(CAST(pi AS DOUBLE) * CAST(p AS DOUBLE), 12) " +
            "AS DECIMAL(28,12))").as("m"))
        .groupBy("state").agg(sum(col("m")).as("pisum"))
      pi = states.join(stepped, Seq("state"), "left")
        .select(col("state"),
          expr("CAST(round(CAST(coalesce(pisum, 0) AS DOUBLE), 12) " +
            "AS DECIMAL(28,12))").as("pi"))
        .localCheckpoint(true)
    }
    val out = pi.select(col("state"),
        round(col("pi").cast("double"), 6).as("pi4"))
      .orderBy("state")
    p.unpersist(blocking = false)
    out
  }

  // ---- round-10 batch 22: ordered alternatives + homogeneity ----

  /** JONCKHEERE–TERPSTRA ordered-alternative test: does order value
    * rise monotonically across the five priority levels? JT sums the
    * Mann–Whitney "lower group beats higher group" counts over every
    * ordered group pair, computed from a (group × price-bucket) COUNT
    * GRID — the qRocAuc distinct-values contract, so the pair join is
    * grid², bounded at any corpus size, never row². Ties (same
    * bucket) count half; mean/variance use the standard no-tie
    * normal approximation (documented) from exact group sizes.
    */
  private def qJonckheere(s: SparkSession, dir: String): DataFrame = {
    val grid = tbl(s, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        floor(col("o_totalprice") / 1000.0d).cast("long").as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("c"))
      .persist()
    val jt = grid.alias("a")
      .join(grid.alias("b"), col("a.g") < col("b.g"))
      .agg(sum(when(col("a.b") < col("b.b"),
          col("a.c").cast("decimal(19,0)")
            * col("b.c").cast("decimal(19,0)")).otherwise(lit(0L)))
          .as("w"),
        sum(when(col("a.b") === col("b.b"),
          col("a.c").cast("decimal(19,0)")
            * col("b.c").cast("decimal(19,0)")).otherwise(lit(0L)))
          .as("ties"))
    val sizes = grid.groupBy("g").agg(sum(col("c")).as("ng"))
      .agg(sum(col("ng")).as("n"),
        sum(col("ng") * col("ng")).as("sn2"),
        sum(col("ng") * col("ng")
          * (lit(2L) * col("ng") + lit(3L))).as("sn23"))
    val out = jt.crossJoin(broadcast(sizes))
      .select(
        (col("w").cast("double") + col("ties").cast("double") / 2.0d)
          .as("jt_stat"),
        col("n").cast("long").as("n"),
        expr("""(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
            - CAST(sn2 AS DOUBLE)) / 4.0d""").as("e_jt"),
        expr("""(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
            * (2.0d * CAST(n AS DOUBLE) + 3.0d)
            - CAST(sn23 AS DOUBLE)) / 72.0d""").as("v_jt"))
      .select(col("n"), round(col("jt_stat"), 1).as("jt_stat"),
        round(col("e_jt"), 1).as("e_jt"),
        round(expr("(jt_stat - e_jt) / sqrt(v_jt)"), 6).as("z"))
    grid.unpersist(blocking = false)
    out
  }

  /** PAGE'S L TREND TEST over the (complete-block) month × priority
    * rank grid: L = Σ j·Rⱼ with j the a-priori priority order — the
    * directional sharpening of [[qFriedman]], sharing its join-counted
    * midranks. Standardization uses the exact no-tie moments
    * E(L) = nk(k+1)²/4, Var(L) = n k²(k+1)(k²−1)/144.
    */
  private def qPageTrend(s: SparkSession, dir: String): DataFrame = {
    val cells0 = tbl(s, dir, "orders")
      .filter(year(to_date(col("o_orderdate"))) === 1995)
      .groupBy(month(to_date(col("o_orderdate"))).as("m"),
        col("o_orderpriority").as("trt"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("v"))
    val kAll = cells0.select(countDistinct(col("trt")).as("kk"))
    val complete = cells0.groupBy("m")
      .agg(count(lit(1)).as("nm"))
      .crossJoin(broadcast(kAll))
      .filter(col("nm") === col("kk"))
      .select("m")
    val cells = cells0.join(broadcast(complete), "m")
    val ranks = cells.alias("a")
      .join(cells.alias("b"), col("a.m") === col("b.m"))
      .groupBy(col("a.m").as("m"), col("a.trt").as("trt"))
      .agg(sum(when(col("b.v") < col("a.v"), 1L).otherwise(0L))
          .as("cl"),
        sum(when(col("b.v") === col("a.v"), 1L).otherwise(0L))
          .as("ce"))
      .select(col("m"), col("trt"), expr(
        "CAST(cl AS DOUBLE) + (CAST(ce AS DOUBLE) + 1.0d) / 2.0d")
        .as("r"))
    val rj = ranks.groupBy("trt")
      .agg(sum(col("r")).as("rsum"), count(lit(1)).as("nb"))
      .withColumn("j", expr("CAST(substring(trt, 1, 1) AS DOUBLE)"))
    rj.agg(max(col("nb")).cast("long").as("n_blocks"),
        count(lit(1)).cast("long").as("k"),
        sum(col("j") * col("rsum")).as("l_stat"))
      .select(col("n_blocks"), col("k"),
        round(col("l_stat"), 1).as("l_stat"),
        round(expr(
          """(l_stat - CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
               * (CAST(k AS DOUBLE) + 1.0d)
               * (CAST(k AS DOUBLE) + 1.0d) / 4.0d)
             / sqrt(CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
               * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0d)
               * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0d)
               / 144.0d)"""), 6).as("z"))
  }

  /** BARTLETT'S TEST for variance homogeneity of quantity across
    * return flags: χ² = [(N−k)·ln s²ₚ − Σ(nᵢ−1)·ln s²ᵢ]/C from exact
    * per-group moment sums. Every ln is 9-dp-quantized before the
    * k-term combination (the repo libm contract) so the statistic is
    * engine-identical; one grouped aggregate, k-row downstream.
    */
  private def qBartlett(s: SparkSession, dir: String): DataFrame = {
    val m = tbl(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("decimal(12,2)").as("x"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      // per-group terms are QUANTIZED to DECIMAL before the k-term
      // sum so cross-group aggregation order can never perturb them
      .withColumn("ss", expr(
        """CAST(round(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
           * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6)
           AS DECIMAL(28,6))"""))
      .withColumn("lnsi", expr(
        """CAST(round(ln(CAST(ss AS DOUBLE)
           / (CAST(n AS DOUBLE) - 1.0d)), 9) AS DECIMAL(18,9))"""))
      .withColumn("inv", expr(
        """CAST(round(1.0d / (CAST(n AS DOUBLE) - 1.0d), 12)
           AS DECIMAL(18,12))"""))
    m.agg(sum(col("n")).cast("long").as("nn"),
        count(lit(1)).cast("long").as("k"),
        sum(col("ss")).as("ssp"),
        sum((col("n") - 1).cast("decimal(18,0)") * col("lnsi"))
          .as("slns"),
        sum(col("inv")).as("sinv"))
      .withColumn("lnsp", expr(
        """CAST(round(ln(CAST(ssp AS DOUBLE) / (CAST(nn AS DOUBLE)
           - CAST(k AS DOUBLE))), 9) AS DECIMAL(18,9))"""))
      .select(col("nn").as("n"), col("k"),
        round(expr(
          """((CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))
               * CAST(lnsp AS DOUBLE) - CAST(slns AS DOUBLE))
             / (1.0d + (CAST(sinv AS DOUBLE)
               - 1.0d / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))
               / (3.0d * (CAST(k AS DOUBLE) - 1.0d)))"""), 6)
          .as("chi2"),
        (col("k") - 1).cast("long").as("df"))
  }

  // ---- round-10 batch 23: regression diagnostics ----

  /** Once-rounded OLS constants for the (price ~ quantity) fit —
    * slope and intercept quantized to DECIMAL(18,6) so every
    * residual-based diagnostic downstream works off the SAME frozen
    * line on both engines (the qPerplexity rounded-constant
    * contract). One moment pass, 1-row broadcast.
    */
  private def olsLineConsts(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .select(col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_extendedprice").cast("decimal(14,2)").as("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n"), col("sx"), col("sxx"),
        expr("""CAST(round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
          AS DECIMAL(18,6))""").as("b"),
        expr("""CAST(round((CAST(sy AS DOUBLE)
            - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
          AS DECIMAL(18,6))""").as("a"))

  /** BREUSCH–PAGAN (Koenker) heteroskedasticity test: regress the
    * squared residuals of the frozen [[olsLineConsts]] line on x and
    * report LM = n·R²_aux. Residuals are exact DECIMALs off the
    * rounded line, squared residuals are 2-dp-requantized before the
    * moment pass (every sum exact, engine-identical), and the aux R²
    * is closed form — two corpus passes, zero iterative fitting.
    */
  private def qBreuschPagan(s: SparkSession, dir: String): DataFrame = {
    val consts = olsLineConsts(s, dir)
    val res = tbl(s, dir, "lineitem")
      .select(col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_extendedprice").cast("decimal(14,2)").as("y"))
      .crossJoin(broadcast(consts.select(col("a"), col("b"))))
      .withColumn("e2", expr(
        """CAST(round(CAST(y - (a + b * x) AS DOUBLE)
           * CAST(y - (a + b * x) AS DOUBLE), 2) AS DECIMAL(19,2))"""))
    res.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("e2")).as("se"),
        sum(col("x") * col("e2")).as("sxe"),
        // (18,2)x(18,2) -> (37,4): stays exact under Spark's 38-digit
        // cap (the DuckDB twin uses (19,2) for its hugeint path; the
        // VALUES are identical either way)
        sum(col("e2").cast("decimal(18,2)")
          * col("e2").cast("decimal(18,2)")).as("see"))
      .select(col("n").cast("long").as("n"),
        round(expr(
          """CAST(n AS DOUBLE)
             * ((CAST(sxe AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(se AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sxe AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(se AS DOUBLE) / CAST(n AS DOUBLE)))
             / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(see AS DOUBLE) - CAST(se AS DOUBLE)
                 * CAST(se AS DOUBLE) / CAST(n AS DOUBLE)))"""), 6)
          .as("lm_stat"),
        lit(1L).as("df"))
  }

  /** COOK'S DISTANCE top-10 for the frozen (price ~ quantity) line:
    * leverage hᵢ = 1/n + (xᵢ−x̄)²/Sxx, Dᵢ = eᵢ²·hᵢ/(2s²(1−hᵢ)²) —
    * the single-pass influence audit. All per-row terms are doubles
    * off broadcast exact moments and the once-rounded line; the
    * top-10 rides a TakeOrdered head with full key tie-break.
    */
  private def qCooksDistance(s: SparkSession, dir: String): DataFrame = {
    val consts = olsLineConsts(s, dir)
    val res = tbl(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(12,2)").as("x"),
        col("l_extendedprice").cast("decimal(14,2)").as("y"))
      .crossJoin(broadcast(consts))
      .withColumn("e2", expr(
        """CAST(round(CAST(y - (a + b * x) AS DOUBLE)
           * CAST(y - (a + b * x) AS DOUBLE), 2) AS DECIMAL(19,2))"""))
    val ssr = res.agg(max(col("n")).as("n"), max(col("sx")).as("sx"),
      max(col("sxx")).as("sxx"), sum(col("e2")).as("sse"))
    res.crossJoin(broadcast(ssr.select(
        expr("CAST(n AS DOUBLE)").as("nd"),
        expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)").as("xbar"),
        expr("""CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
          * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)""").as("csxx"),
        expr("""CAST(sse AS DOUBLE)
          / (CAST(n AS DOUBLE) - 2.0d)""").as("s2"))))
      .withColumn("h", expr(
        """1.0d / nd + (CAST(x AS DOUBLE) - xbar)
           * (CAST(x AS DOUBLE) - xbar) / csxx"""))
      .withColumn("d_cook", round(expr(
        """CAST(e2 AS DOUBLE) * h
           / (2.0d * s2 * (1.0d - h) * (1.0d - h))"""), 9))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("x").cast("double").as("quantity"),
        col("d_cook"), round(col("h"), 9).as("leverage"))
      .orderBy(col("d_cook").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(10)
  }

  /** INTRACLASS CORRELATION ICC(1,1) of order value within priority
    * groups (one-way random effects, unequal group sizes via the k₀
    * correction): ICC = (MSB − MSW)/(MSB + (k₀−1)·MSW). Raw-moment
    * algebra over one grouped pass; only scale-free readouts (ICC
    * and the F ratio) are emitted — never raw mean squares (the
    * qChowTest magnitude lesson).
    */
  private def qIcc(s: SparkSession, dir: String): DataFrame = {
    val g = tbl(s, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        col("o_totalprice").cast("decimal(18,2)").as("y"))
      .groupBy("g")
      .agg(count(lit(1)).as("ng"), sum(col("y")).as("sy"),
        sum(col("y").cast("decimal(18,2)")
          * col("y").cast("decimal(18,2)")).as("syy"))
      // per-group between/within pieces quantized before the k-term
      // sum (the qBartlett ordering contract)
      .withColumn("bg", expr(
        """CAST(round(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
           / CAST(ng AS DOUBLE), 4) AS DECIMAL(28,4))"""))
    g.agg(sum(col("ng")).cast("long").as("n"),
        count(lit(1)).cast("long").as("k"),
        sum(col("ng") * col("ng")).as("sn2"),
        sum(col("sy")).as("sy"), sum(col("syy")).as("syy"),
        sum(col("bg")).as("sbg"))
      .withColumn("ssb", expr(
        """CAST(sbg AS DOUBLE) - CAST(sy AS DOUBLE)
           * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"""))
      .withColumn("ssw", expr(
        "CAST(syy AS DOUBLE) - CAST(sbg AS DOUBLE)"))
      .withColumn("msb", expr("ssb / (CAST(k AS DOUBLE) - 1.0d)"))
      .withColumn("msw", expr(
        "ssw / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))"))
      .withColumn("k0", expr(
        """(CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE)
           / CAST(n AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0d)"""))
      .select(col("n"), col("k"),
        round(expr("msb / msw"), 6).as("f_ratio"),
        round(expr(
          "(msb - msw) / (msb + (k0 - 1.0d) * msw)"), 6).as("icc"))
  }

  // ---- round-10 batch 24: time-series structure tests ----

  /** VARIANCE RATIO TEST (Lo–MacKinlay shape, q = 5) on daily revenue
    * CHANGES: VR = Var(5-day change)/(5·Var(1-day change)) — the
    * random-walk diagnostic (VR ≈ 1 under iid increments, < 1 under
    * mean reversion). Both difference series are exact DECIMALs from
    * calendar-bounded lag windows; variances come from exact moment
    * sums (one (18,2)² pass each), so the ratio is engine-identical
    * at 6 dp. Complements [[qAdfTest]]/[[qHurst]] with the
    * variance-scaling view.
    */
  private def qVarianceRatio(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"))
    val w = Window.orderBy("day")
    val diffs = daily
      .withColumn("x", (col("rev") - lag(col("rev"), 1).over(w))
        .cast("decimal(18,2)"))
      .withColumn("y", (col("rev") - lag(col("rev"), 5).over(w))
        .cast("decimal(18,2)"))
    def varOf(c: String): Column = expr(
      s"""(CAST(s${c}2 AS DOUBLE) - CAST(s$c AS DOUBLE)
            * CAST(s$c AS DOUBLE) / CAST(n$c AS DOUBLE))
          / CAST(n$c AS DOUBLE)""")
    diffs.agg(
        sum(when(col("x").isNotNull, 1L)).as("nx"),
        sum(col("x")).as("sx"),
        sum(col("x").cast("decimal(18,2)")
          * col("x").cast("decimal(18,2)")).as("sx2"),
        sum(when(col("y").isNotNull, 1L)).as("ny"),
        sum(col("y")).as("sy"),
        sum(col("y").cast("decimal(18,2)")
          * col("y").cast("decimal(18,2)")).as("sy2"))
      .select(col("nx").cast("long").as("n_1d"),
        col("ny").cast("long").as("n_5d"),
        round(varOf("y") / (lit(5.0d) * varOf("x")), 6)
          .as("variance_ratio"))
  }

  /** SPECTRAL ENTROPY of the daily-revenue series: normalized Shannon
    * entropy of the [[qPeriodogram]] power distribution over periods
    * 2..30 — low when one cycle dominates (structured series), near 1
    * for white noise. Powers reuse the bounded-phase 9-dp trig
    * quantization (identical doubles on both engines); each p·ln p
    * term is 9-dp-requantized before the 29-term sum (the qBartlett
    * ordering contract).
    */
  private def qSpectralEntropy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"))
    val mean = daily.agg(expr(
      """CAST(round(CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
           2) AS DECIMAL(18,2))""").as("mu"))
    val ts = daily
      .withColumn("t", row_number().over(Window.orderBy("day")) - 1)
      .crossJoin(broadcast(mean))
      .select(col("t"),
        (col("rev") - col("mu")).cast("decimal(19,2)").as("dev"))
    val periods = s.range(2, 31).select(col("id").as("period"))
    val pw = ts.crossJoin(broadcast(periods))
      .withColumn("ang", expr(
        """6.283185307179586d * CAST(t % period AS DOUBLE)
           / CAST(period AS DOUBLE)"""))
      .select(col("period"),
        (col("dev") * expr(
          "CAST(round(cos(ang), 9) AS DECIMAL(12,9))")).as("tc"),
        (col("dev") * expr(
          "CAST(round(sin(ang), 9) AS DECIMAL(12,9))")).as("tsn"))
      .groupBy("period")
      .agg(sum(col("tc")).as("sc"), sum(col("tsn")).as("ss"))
      .select(col("period"), expr(
        """CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
           + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE)""").as("pw"))
    val tot = pw.agg(sum(expr(
      "CAST(round(pw, 2) AS DECIMAL(38,2))")).as("ptot"))
    pw.crossJoin(broadcast(tot))
      .select(expr(
        """CAST(round(pw / CAST(ptot AS DOUBLE)
             * ln(pw / CAST(ptot AS DOUBLE)), 9)
           AS DECIMAL(18,9))""").as("term"))
      .groupBy()
      .agg(count(lit(1)).cast("long").as("n_freqs"),
        sum(col("term")).as("tsum"))
      .select(col("n_freqs"),
        round(expr("-CAST(tsum AS DOUBLE)"), 6).as("entropy"),
        round(expr(
          """-CAST(tsum AS DOUBLE)
             / ln(CAST(n_freqs AS DOUBLE))"""), 6).as("normalized"))
  }

  /** TURNING-POINTS RANDOMNESS TEST on daily revenue: count local
    * peaks and troughs; under iid the count is asymptotically normal
    * with E = 2(n−2)/3, Var = (16n−29)/90 — the order-pattern
    * complement of [[qRunsTest]] (which sees only signs, not shape).
    * Pure integer counting over calendar-bounded lag windows.
    */
  private def qTurningPoints(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day")
    val daily = tbl(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg(sum(col("p")).as("rev"))
      .withColumn("prv", lag(col("rev"), 1).over(w))
      .withColumn("nxt", lead(col("rev"), 1).over(w))
      .filter(col("prv").isNotNull && col("nxt").isNotNull)
    daily.agg(count(lit(1)).cast("long").as("n_interior"),
        sum(when((col("rev") > col("prv") && col("rev") > col("nxt"))
          || (col("rev") < col("prv") && col("rev") < col("nxt")),
          1L).otherwise(0L)).cast("long").as("turning_points"))
      .select(col("n_interior"), col("turning_points"),
        round(expr(
          """(CAST(turning_points AS DOUBLE)
             - 2.0d * CAST(n_interior AS DOUBLE) / 3.0d)
             / sqrt((16.0d * (CAST(n_interior AS DOUBLE) + 2.0d)
               - 29.0d) / 90.0d)"""), 6).as("z"))
  }

  // ---- round-10 batch 25: stratified association + inequality ----

  /** MANTEL–HAENSZEL common odds ratio across nation strata: does the
    * BUILDING-segment → high-balance association hold after
    * controlling for nation? Per-stratum 2×2 cells are exact integer
    * counts; each a·d/n and b·c/n term is 9-dp-quantized before the
    * stratum sum (the qBartlett ordering contract), so
    * OR_MH = Σaᵢdᵢ/nᵢ / Σbᵢcᵢ/nᵢ is engine-identical. The
    * confounder-adjusted upgrade of [[qOddsRatio]].
    */
  private def qMantelHaenszel(s: SparkSession, dir: String): DataFrame = {
    val cells = tbl(s, dir, "customer")
      .select(col("c_nationkey").as("strat"),
        (col("c_mktsegment") === "BUILDING").as("expo"),
        (col("c_acctbal") > 5000.0d).as("hi"))
      .groupBy("strat")
      .agg(sum(when(col("expo") && col("hi"), 1L).otherwise(0L))
          .as("a"),
        sum(when(col("expo") && !col("hi"), 1L).otherwise(0L))
          .as("b"),
        sum(when(!col("expo") && col("hi"), 1L).otherwise(0L))
          .as("c"),
        sum(when(!col("expo") && !col("hi"), 1L).otherwise(0L))
          .as("d"))
      .withColumn("n", expr("a + b + c + d"))
      .withColumn("tad", expr(
        """CAST(round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
           / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9))"""))
      .withColumn("tbc", expr(
        """CAST(round(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
           / CAST(n AS DOUBLE), 9) AS DECIMAL(28,9))"""))
    cells.agg(count(lit(1)).cast("long").as("n_strata"),
        sum(col("a")).cast("long").as("n_exposed_hi"),
        sum(col("tad")).as("sad"), sum(col("tbc")).as("sbc"))
      .select(col("n_strata"), col("n_exposed_hi"),
        round(expr(
          "CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE)"), 6)
          .as("or_mh"))
  }

  /** ATKINSON INEQUALITY INDEX (ε = 1) of per-customer spend:
    * A = 1 − geomean/mean, with the geometric mean carried in LOG
    * space via the round-ln-to-9dp exact-DECIMAL-sum contract — the
    * welfare-weighted complement of [[qLorenz]]'s Gini readout.
    */
  private def qAtkinson(s: SparkSession, dir: String): DataFrame = {
    val spend = tbl(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("y"))
    spend.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(expr(
          """CAST(round(ln(CAST(y AS DOUBLE)), 9)
             AS DECIMAL(18,9))""")).as("slny"))
      .select(col("n").cast("long").as("n_cust"),
        round(expr(
          """1.0d - exp(CAST(slny AS DOUBLE) / CAST(n AS DOUBLE))
             / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"""), 6)
          .as("atkinson_1"))
  }

  /** RICH-CLUB COEFFICIENT over the co-supplier graph at degree
    * thresholds 2/5/10: φ(k) = E_k / (n_k(n_k−1)) on the symmetric
    * edge set — do high-degree suppliers preferentially interconnect?
    * Degrees come off the shared write-once edge artifact; each
    * threshold is one broadcast-semijoin count, so the whole curve is
    * three counts over one parquet read (never a recomputation of
    * the edge build).
    */
  private def qRichClub(s: SparkSession, dir: String): DataFrame = {
    val e = writtenEdgesTable(s, dir)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ks = s.range(0, 3).select(
      when(col("id") === 0, 2L).when(col("id") === 1, 5L)
        .otherwise(10L).as("k"))
    val nk = ks.join(
      deg.crossJoin(broadcast(ks))
        .filter(col("deg") > col("k"))
        .groupBy("k").agg(count(lit(1)).as("cnt")),
      Seq("k"), "left")
      .select(col("k"), coalesce(col("cnt"), lit(0L)).as("n_k"))
    val ek = e
      .join(broadcast(deg.withColumnRenamed("src", "s2")
          .withColumnRenamed("deg", "dsrc")),
        col("src") === col("s2"))
      .join(broadcast(deg.withColumnRenamed("src", "d2")
          .withColumnRenamed("deg", "ddst")),
        col("dst") === col("d2"))
      .crossJoin(broadcast(ks.withColumnRenamed("k", "kk")))
      .filter(col("dsrc") > col("kk") && col("ddst") > col("kk"))
      .groupBy(col("kk").as("k")).agg(count(lit(1)).as("e_k"))
    nk.join(ek, Seq("k"), "left")
      .select(col("k"), col("n_k").cast("long").as("n_k"),
        coalesce(col("e_k"), lit(0L)).cast("long").as("e_k"),
        round(expr(
          """CASE WHEN n_k > 1 THEN CAST(coalesce(e_k, 0) AS DOUBLE)
             / (CAST(n_k AS DOUBLE) * (CAST(n_k AS DOUBLE) - 1.0d))
             ELSE 0.0d END"""), 6).as("phi"))
      .orderBy("k")
  }

  // ------------------------------------------------------------------

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "clean_text" -> qCleanText,
    "validate_text" -> qValidateText,
    "validate_length" -> qValidateLength,
    "decode_utf8" -> qDecodeUtf8,
    "sentence_stats" -> qSentenceStats,
    "sentence_chunks" -> qSentenceChunks,
    "chunk_counts" -> qChunkCounts,
    "chunk_packing" -> qChunkPacking,
    "doc_embeddings" -> qDocEmbeddings,
    "query_embedding" -> qQueryEmbedding,
    "q1_agg" -> qQ1Agg,
    "q6_filter" -> qQ6Filter,
    "q3_topk" -> qQ3TopK,
    "q5_join" -> qQ5Join,
    "q_window_running" -> qWindowRunning,
    "q_percentiles" -> qPercentiles,
    "q_grouping_sets" -> qGroupingSets,
    "q_approx_distinct" -> qApproxDistinct,
    "q_rollup" -> qRollup,
    "q_semijoin" -> qSemiJoin,
    "q_antijoin" -> qAntiJoin,
    "q_setop" -> qSetOp,
    "q_except" -> qExcept,
    "q_left_outer" -> qLeftOuter,
    "q_word_topk" -> qWordTopK,
    "events_tumbling" -> qEventsTumbling,
    "q_ts_native" -> qTsNative,
    "events_sessions" -> qEventsSessions,
    "events_hopping" -> qEventsHopping,
    "q_asof_join" -> qAsofJoin,
    "q_asof_tolerance" -> qAsofTolerance,
    "q_rolling_median" -> qRollingMedian,
    "q_pareto" -> qPareto,
    "q_skyline" -> qSkyline,
    "q_conversion_lag" -> qConversionLag,
    "q_ab_lift" -> qAbLift,
    "q_linreg" -> qLinreg,
    "q_roc_auc" -> qRocAuc,
    "q_confusion" -> qConfusion,
    "q_calibration" -> qCalibration,
    "q_jaro_dedup" -> qJaroDedup,
    "q_repeat_ladder" -> qRepeatLadder,
    "q_catalog_coverage" -> qCatalogCoverage,
    "q_forecast_baseline" -> qForecastBaseline,
    "q_rolling_anomaly" -> qRollingAnomaly,
    "q_novelty_rate" -> qNoveltyRate,
    "q_revenue_decomposition" -> qRevenueDecomposition,
    "q_runs_test" -> qRunsTest,
    "q_dp_counts" -> qDpCounts,
    "q_ab_srm" -> qAbSrm,
    "q_pit_features" -> qPitFeatures,
    "q_horizon_label" -> qHorizonLabel,
    "q_lsh_curve" -> qLshCurve,
    "q_rolling_corr" -> qRollingCorr,
    "q_iqr_fence" -> qIqrFence,
    "q_ess" -> qEss,
    "q_dataset_card" -> qDatasetCard,
    "q_growth_accounting" -> qGrowthAccounting,
    "q_event_near_dup" -> qEventNearDup,
    "q_session_conversion" -> qSessionConversion,
    "q_dedup_attribution" -> qDedupAttribution,
    "q_zipf_fit" -> qZipfFit,
    "q_heaps_law" -> qHeapsLaw,
    "q_lang_confusion" -> qLangConfusion,
    "q_stopword_discovery" -> qStopwordDiscovery,
    "q_basket_rules" -> qBasketRules,
    "q_trend_by_group" -> qTrendByGroup,
    "q_bootstrap_ci" -> qBootstrapCi,
    "q_group_auc" -> qGroupAuc,
    "q_gains_table" -> qGainsTable,
    "q_corr_matrix" -> qCorrMatrix,
    "q_weighted_median" -> qWeightedMedian,
    "q_price_index" -> qPriceIndex,
    "q_session_path" -> qSessionPath,
    "q_survival" -> qSurvival,
    "q_lorenz" -> qLorenz,
    "q_ks_test" -> qKsTest,
    "q_mann_whitney" -> qMannWhitney,
    "q_did" -> qDid,
    "events_stream_ohlc" -> qEventsStreamOhlc,
    "q_component_sizes" -> qComponentSizes,
    "q_ohlc" -> qOhlc,
    "q_l_diversity" -> qLDiversity,
    "q_fk_violations" -> qFkViolations,
    "q_concurrency" -> qConcurrency,
    "q_random_projection" -> qRandomProjection,
    "q_table_cdf" -> qTableCdf,
    "q_mv_incremental" -> qMvIncremental,
    "q_cohort_ltv" -> qCohortLtv,
    "q_order_gaps" -> qOrderGaps,
    "q_seasonality" -> qSeasonality,
    "q_autocorr" -> qAutocorr,
    "q_changepoint" -> qChangepoint,
    "q_hits" -> qHits,
    "q_degree_stats" -> qDegreeStats,
    "q_link_predict" -> qLinkPredict,
    "q_chi_square" -> qChiSquare,
    "q_target_encoding" -> qTargetEncoding,
    "q_bigram_lm" -> qBigramLm,
    "q_containment" -> qContainment,
    "q_winsorize" -> qWinsorize,
    "q_golden_record" -> qGoldenRecord,
    "q_entropy" -> qEntropy,
    "q_rfm" -> qRfm,
    "q_dau_mau" -> qDauMau,
    "q_ttr" -> qTtr,
    "q_markov" -> qMarkov,
    "q_item_cooccur" -> qItemCooccur,
    "q_shortest_path" -> qShortestPath,
    "q_benford" -> qBenford,
    "q_twap" -> qTwap,
    "q_asof_join_native" -> qAsofJoinNative,
    "q_centroids" -> qCentroids,
    "events_stream_tumbling" -> qEventsStreamTumbling,
    "q_having" -> qHaving,
    "q_conditional_agg" -> qConditionalAgg,
    "q_pivot" -> qPivot,
    "q_salted_agg" -> qSaltedAgg,
    "q_scalar_subquery" -> qScalarSubquery,
    "q_union_distinct" -> qUnionDistinct,
    "validate_query" -> qValidateQuery,
    "q_cube" -> qCube,
    "q_distinct_agg" -> qDistinctAgg,
    "q_topk_per_group" -> qTopKPerGroup,
    "q_scalar_funcs" -> qScalarFuncs,
    "text_stats" -> qTextStats,
    "dedup_exact" -> qDedupExact,
    "dedup_minhash" -> qDedupMinhash,
    "dedup_simhash" -> qDedupSimhash,
    "dedup_ngram" -> qDedupNgram,
    "neardup_embedding" -> qNearDupEmbedding,
    "ann_bruteforce" -> qAnnBruteForce,
    "ann_lsh" -> qAnnLsh,
    "ann_lsh_indexed" -> qAnnLshIndexed,
    "ann_ivf" -> qAnnIvf,
    "ann_ivf_indexed" -> qAnnIvfIndexed,
    "lang_id" -> qLangId,
    "quality_score" -> qQualityScore,
    "text_profile" -> qTextProfile,
    "fingerprint_stats" -> qFingerprintStats,
    "multimodal_images" -> qMultimodalImages,
    "multimodal_frames" -> qMultimodalFrames,
    "q_window_frames" -> qWindowFrames,
    "q_window_ranks" -> qWindowRanks,
    "q_window_range" -> qWindowRange,
    "q_range_join" -> qRangeJoin,
    "q_stats_agg" -> qStatsAgg,
    "q_date_funcs" -> qDateFuncs,
    "q_string_fuzzy" -> qStringFuzzy,
    "q_array_funcs" -> qArrayFuncs,
    "q_exists_subquery" -> qExistsSubquery,
    "q_full_outer" -> qFullOuter,
    "q_json_funcs" -> qJsonFuncs,
    "events_stream_sessions" -> qEventsStreamSessions,
    "q_sample_hash" -> qSampleHash,
    "q_merge_upsert" -> qMergeUpsert,
    "q_tfidf" -> qTfidf,
    "dedup_clusters" -> qDedupClusters,
    "q_interval_join" -> qIntervalJoin,
    "q_vec_quantize" -> qVecQuantize,
    "pipeline_e2e" -> qPipelineE2e,
    "dedup_fuzzy" -> qDedupFuzzy,
    "q_string_agg" -> qStringAgg,
    "q_sample_stratified" -> qSampleStratified,
    "events_stream_hopping" -> qEventsStreamHopping,
    "events_stream_interval_join" -> qEventsStreamIntervalJoin,
    "events_stream_left_join" -> qEventsStreamLeftJoin,
    "events_stream_join_agg" -> qEventsStreamJoinAgg,
    "q_psi_drift" -> qPsiDrift,
    "q_embed_drift" -> qEmbedDrift,
    "q_shingle_gen" -> qShingleGen,
    "q_null_semantics" -> qNullSemantics,
    "q_unpivot" -> qUnpivot,
    "q_crossjoin" -> qCrossJoin,
    "q_grouping_flags" -> qGroupingFlags,
    "q_setop_all" -> qSetopAll,
    "q_lateral_topk" -> qLateralTopk,
    "q_first_last" -> qFirstLast,
    "q_histogram" -> qHistogram,
    "q_minmax_norm" -> qMinmaxNorm,
    "q_zscore" -> qZscore,
    "q_ngram_bigrams" -> qNgramBigrams,
    "q_bm25" -> qBm25,
    "q_pii_redact" -> qPiiRedact,
    "q_gapfill" -> qGapfill,
    "events_stream_dedup" -> qEventsStreamDedup,
    "q_funnel" -> qFunnel,
    "q_retention" -> qRetention,
    "dedup_keep_best" -> qDedupKeepBest,
    "q_not_in_null" -> qNotInNull,
    "q_percentile_disc" -> qPercentileDisc,
    "q_map_funcs" -> qMapFuncs,
    "q_session_window" -> qSessionWindow,
    "q_supplier_stats" -> qSupplierStats,
    "q_props_json" -> qPropsJson,
    "q_recursive_cte" -> qRecursiveCte,
    "q_filter_agg" -> qFilterAgg,
    "events_stream_static_join" -> qEventsStreamStaticJoin,
    "q_rate_stream" -> qRateStream,
    "q_contamination" -> qContamination,
    "q_variant" -> qVariant,
    "q_seq_packing" -> qSeqPacking,
    "q_token_budget" -> qTokenBudget,
    "q_union_by_name" -> qUnionByName,
    "q_repetition" -> qRepetition,
    "dedup_incremental" -> qDedupIncremental,
    "q_perplexity" -> qPerplexity,
    "q_boilerplate" -> qBoilerplate,
    "q_scd2" -> qScd2,
    "q_attribution" -> qAttribution,
    "q_bool_bit_agg" -> qBoolBitAgg,
    "q_order_offset" -> qOrderOffset,
    "q_posexplode" -> qPosexplode,
    "multimodal_audio" -> qMultimodalAudio,
    "q_knn_eval" -> qKnnEval,
    "q_kmeans" -> qKmeans,
    "q_weighted_sample" -> qWeightedSample,
    "q_inverted_index" -> qInvertedIndex,
    "q_snapshot" -> qSnapshot,
    "ann_incremental" -> qAnnIncremental,
    "q_explode_outer" -> qExplodeOuter,
    "q_try_funcs" -> qTryFuncs,
    "q_split_assign" -> qSplitAssign,
    "q_leakage_safe_split" -> qLeakageSafeSplit,
    "q_kmv_overlap" -> qKmvOverlap,
    "ann_matryoshka" -> qAnnMatryoshka,
    "q_curriculum_mix" -> qCurriculumMix,
    "docs_stream_kmv" -> qDocsStreamKmv,
    "q_contamination_fuzzy" -> qContaminationFuzzy,
    "q_domain_mix" -> qDomainMix,
    "q_epoch_shuffle" -> qEpochShuffle,
    "q_semdedup" -> qSemDedup,
    "q_gopher_rules" -> qGopherRules,
    "q_hard_negatives" -> qHardNegatives,
    "docs_stream_curation" -> qDocsStreamCuration,
    "q_span_dedup" -> qSpanDedup,
    "q_unicode_norm" -> qUnicodeNorm,
    "q_incr_stats" -> qIncrStats,
    "q_hybrid_rrf" -> qHybridRrf,
    "docs_stream_incr_stats" -> qDocsStreamIncrStats,
    "q_bpe_pairs" -> qBpePairs,
    "q_bpe_train" -> qBpeTrain,
    "q_bpe_encode" -> qBpeEncode,
    "q_salted_join" -> qSaltedJoin,
    "q_compaction" -> qCompaction,
    "q_zorder" -> qZorder,
    "q_corrupt_json" -> qCorruptJson,
    "q_bpe_doc_tokens" -> qBpeDocTokens,
    "q_dsir_score" -> qDsirScore,
    "q_table_snapshot" -> qTableSnapshot,
    "q_table_bloom" -> qTableBloom,
    "q_table_merge_full" -> qTableMergeFull,
    "q_table_fast_stats" -> qTableFastStats,
    "q_table_agg_pushdown" -> qTableAggPushdown,
    "q_table_limit" -> qTableLimit,
    "q_table_dsv2_timetravel" -> qTableDsv2Timetravel,
    "q_group_by_all" -> qGroupByAll,
    "q_table_mor_delete" -> qTableMorDelete,
    "q_table_clone" -> qTableClone,
    "q_table_timetravel" -> qTableTimetravel,
    "q_table_cdc" -> qTableCdc,
    "q_table_history" -> qTableHistory,
    "q_table_prune" -> qTablePrune,
    "q_table_schema_evo" -> qTableSchemaEvo,
    "q_table_merge_scoped" -> qTableMergeScoped,
    "docs_stream_table" -> qDocsStreamTable,
    "q_table_stream_read" -> qTableStreamRead,
    "q_table_stream_agg" -> qTableStreamAgg,
    "q_table_timetravel_ts" -> qTableTimetravelTs,
    "q_table_maintenance" -> qTableMaintenance,
    "q_embed_dim_stats" -> qEmbedDimStats,
    "q_pca_project" -> qPcaProject,
    "q_collocations" -> qCollocations,
    "q_pagerank" -> qPageRank,
    "q_quality_classifier" -> qQualityClassifier,
    "q_corpus_drift" -> qCorpusDrift,
    "q_vec_pq" -> qVecPq,
    "q_ann_pq" -> qAnnPq,
    "ann_ivf_pq" -> qAnnIvfPq,
    "q_mad_outliers" -> qMadOutliers,
    "q_min_cost_supplier" -> qMinCostSupplier,
    "q_revenue_view" -> qRevenueView,
    "q_small_order_revenue" -> qSmallOrderRevenue,
    "orders_stream_merge" -> qOrdersStreamMerge,
    "q_islands" -> qIslands,
    "q_heavy_hitters" -> qHeavyHitters,
    "q_rel_division" -> qRelDivision,
    "q_null_safe_join" -> qNullSafeJoin,
    "ann_filtered" -> qAnnFiltered,
    "q_data_profile" -> qDataProfile,
    "q_expectations" -> qExpectations,
    "q_domain_cap" -> qDomainCap,
    "q_triangle_count" -> qTriangleCount,
    "q_k_anonymity" -> qKAnonymity,
    "q_table_dsv2" -> qTableDsv2,
    "q_welch_ttest" -> qWelchTtest,
    "q_anova" -> qAnova,
    "q_info_gain" -> qInfoGain,
    "q_mode" -> qMode,
    "q_decision_stump" -> qDecisionStump,
    "q_ewma" -> qEwma,
    "q_cum_distinct" -> qCumDistinct,
    "q_seasonal_decompose" -> qSeasonalDecompose,
    "q_theil_sen" -> qTheilSen,
    "q_unigram_kl" -> qUnigramKl,
    "q_tokenizer_fertility" -> qTokenizerFertility,
    "q_naive_bayes" -> qNaiveBayes,
    "q_t_closeness" -> qTCloseness,
    "q_label_propagation" -> qLabelPropagation,
    "q_haversine_nn" -> qHaversineNn,
    "q_cosine_histogram" -> qCosineHistogram,
    "q_mmr_diversify" -> qMmrDiversify,
    "q_modularity" -> qModularity,
    "q_assortativity" -> qAssortativity,
    "q_pattern_vshape" -> qPatternVshape,
    "q_pattern_doubletop" -> qPatternDoubletop,
    "q_clustering_coeff" -> qClusteringCoeff,
    "q_kcore" -> qKcore,
    "q_mann_kendall" -> qMannKendall,
    "q_bollinger" -> qBollinger,
    "q_rsi" -> qRsi,
    "q_sax" -> qSax,
    "q_simpson" -> qSimpson,
    "q_burstiness" -> qBurstiness,
    "q_price_elasticity" -> qPriceElasticity,
    "q_cuped" -> qCuped,
    "q_sprt" -> qSprt,
    "q_vec_outlier" -> qVecOutlier,
    "q_levene" -> qLevene,
    "q_readability" -> qReadability,
    "q_bm25_query" -> qBm25Query,
    "q_partial_corr" -> qPartialCorr,
    "q_var_cvar" -> qVarCvar,
    "q_grubbs" -> qGrubbs,
    "q_durbin_watson" -> qDurbinWatson,
    "q_jarque_bera" -> qJarqueBera,
    "multimodal_phash" -> qMultimodalPhash,
    "q_spearman" -> qSpearman,
    "q_cronbach" -> qCronbach,
    "q_renyi" -> qRenyi,
    "q_ngram_coverage" -> qNgramCoverage,
    "q_odds_ratio" -> qOddsRatio,
    "q_source_repetition" -> qSourceRepetition,
    "q_hhi" -> qHhi,
    "q_cohen_kappa" -> qCohenKappa,
    "q_countmin" -> qCountMin,
    "q_psm_att" -> qPsmAtt,
    "q_adf_test" -> qAdfTest,
    "q_granger" -> qGranger,
    "q_ljung_box" -> qLjungBox,
    "q_hurst" -> qHurst,
    "q_bloom_join" -> qBloomJoin,
    "q_ams_f2" -> qAmsF2,
    "q_bh_fdr" -> qBhFdr,
    "q_power_mde" -> qPowerMde,
    "q_kruskal_wallis" -> qKruskalWallis,
    "q_mcnemar" -> qMcnemar,
    "q_kendall_tau" -> qKendallTau,
    "q_theil_index" -> qTheilIndex,
    "q_jsd" -> qJsd,
    "q_burrows_delta" -> qBurrowsDelta,
    "q_xcorr" -> qXcorr,
    "q_isotonic" -> qIsotonic,
    "q_quantile_sketch" -> qQuantileSketch,
    "q_log_rank" -> qLogRank,
    "q_wilcoxon_signed" -> qWilcoxonSigned,
    "q_rake_keywords" -> qRakeKeywords,
    "q_textrank" -> qTextrank,
    "q_silhouette" -> qSilhouette,
    "q_ktruss" -> qKtruss,
    "q_sortino" -> qSortino,
    "q_fisher_exact" -> qFisherExact,
    "q_gumbel_maxima" -> qGumbelMaxima,
    "q_dispersion" -> qDispersion,
    "q_hodges_lehmann" -> qHodgesLehmann,
    "q_cohens_d" -> qCohensD,
    "q_cramers_v" -> qCramersV,
    "q_permutation_test" -> qPermutationTest,
    "q_ols_multi" -> qOlsMulti,
    "q_ridge_path" -> qRidgePath,
    "q_vif" -> qVif,
    "q_mahalanobis" -> qMahalanobis,
    "q_perm_entropy" -> qPermEntropy,
    "q_sample_entropy" -> qSampleEntropy,
    "q_periodogram" -> qPeriodogram,
    "q_chow_test" -> qChowTest,
    "q_friedman" -> qFriedman,
    "q_wasserstein" -> qWasserstein,
    "q_cvm_uniform" -> qCvmUniform,
    "q_cochran_q" -> qCochranQ,
    "q_katz" -> qKatz,
    "q_markov_stationary" -> qMarkovStationary,
    "q_jonckheere" -> qJonckheere,
    "q_page_trend" -> qPageTrend,
    "q_bartlett" -> qBartlett,
    "q_breusch_pagan" -> qBreuschPagan,
    "q_cooks_distance" -> qCooksDistance,
    "q_icc" -> qIcc,
    "q_variance_ratio" -> qVarianceRatio,
    "q_spectral_entropy" -> qSpectralEntropy,
    "q_turning_points" -> qTurningPoints,
    "q_mantel_haenszel" -> qMantelHaenszel,
    "q_atkinson" -> qAtkinson,
    "q_rich_club" -> qRichClub,
    "q_skew_audit" -> qSkewAudit,
    "q_tfidf_cosine_pairs" -> qTfidfCosinePairs,
    "q_diversity_index" -> qDiversityIndex,
    "q_drawdown" -> qDrawdown
  )

  /** DuckDB SQL fragments replicating the repo's hashing primitives
    * (graft.util.Hashing) in HUGEINT mod-2^64 arithmetic — the machinery
    * behind the generated signature oracles (fingerprint_stats pioneered
    * the pattern; dedup_simhash and ann_lsh build on it). Signed BIGINT
    * is the canonical value domain; HUGEINT is the escape hatch for
    * unsigned wrap-around.
    */
  /** lang_id heuristic replay, shared by the lang_id gate and the
    * q_lang_confusion matrix oracle. */
  private lazy val langIdOracleSql: String =
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

  private object Duck {
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
  private lazy val simhashOracleSql: String = {
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
  private lazy val kmvOverlapOracleSql: String = {
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
  private lazy val sourceRepetitionOracleSql: String = {
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

  private lazy val shingleGenOracleSql: String = {
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
  private lazy val kmvDistinctOracleSql: String = {
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
  private lazy val annLshOracleSql: String = {
    import Duck.{toU, mix64}
    val (numPlanes, dim, probeHamming, k) = (8, 64, 3, 10)
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
             WHERE bit_count(xor(b.bucket, qb.qbucket)) <= $probeHamming)
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
  private lazy val dedupIncrementalOracleSql: String = {
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
             WHERE o.doc_id <= cut.c AND n.doc_id > cut.c
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
  private lazy val annIvfOracleSql: String = {
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
  private lazy val kmeansOracleSql: String = {
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
  private lazy val queryEmbeddingOracleSql: String = {
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
  private def duckPieces(t: String): String =
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
  private lazy val sentenceStatsOracleSql: String =
    """SELECT doc_id,
         CAST(len(list_filter(regexp_extract_all(text, '[^.!?]+[.!?]*'),
           s -> trim(s) <> '')) AS INTEGER) AS n_sentences
       FROM documents ORDER BY doc_id"""

  private lazy val sentenceChunksOracleSql: String =
    """SELECT doc_id, CAST(1 AS INTEGER) AS chunk_number,
         'search_document: ' || trim(text) AS chunk
       FROM documents WHERE trim(text) <> ''
       ORDER BY doc_id, chunk_number"""

  private lazy val chunkCountsOracleSql: String =
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
  private lazy val docEmbeddingsOracleSql: String = {
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
  private lazy val chunkPackingOracleSql: String = {
    val (maxTokens, overlap, leadLen) = (48, 2, 7)
    // takeRight(overlap) over the parallel sentence/cost lists
    def tail(l: String) =
      s"$l[greatest(len($l) - ${overlap - 1}, 1):len($l)]"
    val ocost = s"COALESCE(list_sum(${tail("r.curc")}), 0)"
    s"""WITH RECURSIVE d AS (
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
             ON n.doc_id = r.doc_id AND r.i = n.n)
       SELECT doc_id, CAST(u.i AS INTEGER) AS chunk_number,
         'search_document: ' || chunks[u.i] AS chunk
       FROM fin, unnest(list_transform(range(1, len(chunks) + 1),
         i -> {'i': i})) t(u)
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
  private lazy val multimodalImagesOracleSql: String =
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

  private lazy val multimodalFramesOracleSql: String =
    """WITH p AS (SELECT doc_id, 2 + doc_id % 5 AS nf
         FROM documents WHERE doc_id < 500),
       f AS (SELECT doc_id, t.j + 1 AS frame_number,
           (doc_id + 37 * ((t.j * nf) // 4)) % 256 AS r
         FROM p, range(0, 4) t(j))
       SELECT doc_id AS media_id, CAST(frame_number AS INTEGER) AS frame_number,
         CAST(CAST(CAST(r AS DOUBLE) / 255.0 AS REAL) AS DOUBLE) AS f0
       FROM f ORDER BY media_id, frame_number"""

  private lazy val multimodalAudioOracleSql: String =
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
  private val txnTableCtes: String =
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

  def oracleSql: Map[String, String] = Map(
    "sentence_stats" -> sentenceStatsOracleSql,
    "sentence_chunks" -> sentenceChunksOracleSql,
    "chunk_counts" -> chunkCountsOracleSql,
    "chunk_packing" -> chunkPackingOracleSql,
    "doc_embeddings" -> docEmbeddingsOracleSql,
    "dedup_simhash" -> simhashOracleSql,
    "ann_lsh" -> annLshOracleSql,
    "ann_lsh_indexed" -> annLshOracleSql,
    "ann_incremental" -> annLshOracleSql,
    "ann_ivf" -> annIvfOracleSql,
    "ann_ivf_indexed" -> annIvfOracleSql,
    "dedup_incremental" -> dedupIncrementalOracleSql,
    "q_kmeans" -> kmeansOracleSql,
    // A-ES weighted sampling: hash-uniform u from md5 hex (fold of the
    // first 8 digits), key = ln(u)*1000/weight rounded to 6dp + id
    // tiebreak (the repo-wide cross-engine rank-stability contract)
    "q_weighted_sample" ->
      """WITH u AS (SELECT source, doc_id, n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents WHERE n_chars > 0),
         v AS (SELECT source, doc_id, n_chars,
             list_reduce(list_transform(range(1, 9),
               i -> CAST(strpos('0123456789abcdef', h[i:i]) - 1 AS BIGINT)),
               (a, d) -> a * 16 + d) AS hv
           FROM u),
         ks AS (SELECT source, doc_id,
             round(ln((CAST(hv AS DOUBLE) + 0.5) / 4294967296.0)
               * 1000.0 / n_chars, 6) AS sample_key
           FROM v),
         r AS (SELECT source, doc_id, sample_key,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY sample_key DESC, doc_id) AS INTEGER) AS sample_rank
           FROM ks)
       SELECT source, doc_id, sample_key, sample_rank FROM r
       WHERE sample_rank <= 5 ORDER BY source, sample_rank""",
    "q_inverted_index" ->
      """WITH t AS (SELECT DISTINCT doc_id, u.w AS w
           FROM documents, unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             x -> x <> '')) u(w))
         SELECT w, COUNT(*) AS df,
           array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings
         FROM t GROUP BY w ORDER BY w""",
    "multimodal_images" -> multimodalImagesOracleSql,
    "multimodal_frames" -> multimodalFramesOracleSql,
    "multimodal_audio" -> multimodalAudioOracleSql,
    "query_embedding" -> queryEmbeddingOracleSql,
    "q_approx_distinct" ->
      """SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_5pct
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "clean_text" ->
      """SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(text, '[^\n\t\x20-\x7E]', '', 'g'),
           '\t', ' ', 'g'),
           '(?m)^ +| +$', '', 'g'),
           '\n{3,}', chr(10)||chr(10), 'g'),
           '^[\n ]+|[\n ]+$', '', 'g') AS cleaned
         FROM documents ORDER BY doc_id""",
    "validate_text" ->
      """WITH c AS (SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(text, '[^\n\t\x20-\x7E]', '', 'g'),
             '\t', ' ', 'g'),
             '(?m)^ +| +$', '', 'g'),
             '\n{3,}', chr(10)||chr(10), 'g'),
             '^[\n ]+|[\n ]+$', '', 'g') AS processed_text
         FROM documents)
         SELECT doc_id, processed_text,
           length(processed_text) > 0 AS is_valid,
           CASE WHEN length(processed_text) > 0 THEN NULL
                ELSE 'Text is empty after cleaning.' END AS error
         FROM c ORDER BY doc_id""",
    "validate_length" ->
      """WITH c AS (SELECT doc_id,
           length(regexp_replace(text,'^[\s\p{Z}\x{85}]+|[\s\p{Z}\x{85}]+$','','g')) AS slen
         FROM documents)
         SELECT doc_id,
           CASE WHEN slen < 1 THEN 'text_too_short'
                WHEN slen > 300 THEN 'text_too_long'
                ELSE NULL END AS error_type,
           CASE WHEN slen < 1 THEN 'Document ' || doc_id ||
                  ': Text length (' || slen || ') below minimum (1)'
                WHEN slen > 300 THEN 'Text length (' || slen ||
                  ') exceeds maximum (300)'
                ELSE NULL END AS error
         FROM c ORDER BY doc_id""",
    "decode_utf8" ->
      """SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN NULL ELSE text END AS decoded,
           CASE WHEN doc_id % 7 = 0 THEN 'decode_error'
                ELSE NULL END AS error_type,
           CASE WHEN doc_id % 7 = 0 THEN 'Invalid UTF-8 encoding in text'
                ELSE NULL END AS error
         FROM documents ORDER BY doc_id""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1999-06-30'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q6_filter" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1998-01-01'
           AND l_shipdate < TIMESTAMP '1999-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    "q3_topk" ->
      """SELECT l_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q5_join" ->
      """SELECT r_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS running_cents
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q_percentiles" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS med_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS med_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), ())
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000)
         ORDER BY c_custkey""",
    "q_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_setop" ->
      """SELECT l_partkey AS partkey FROM lineitem
         INTERSECT
         SELECT p_partkey AS partkey FROM part WHERE p_size > 25
         ORDER BY partkey""",
    "q_except" ->
      """SELECT l_partkey AS partkey FROM lineitem
         EXCEPT
         SELECT p_partkey AS partkey FROM part WHERE p_size > 25
         ORDER BY partkey""",
    "q_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           coalesce(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
             AS DOUBLE), 0.0) AS total_spent
         FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_word_topk" ->
      """WITH w AS (
           SELECT unnest(regexp_split_to_array(lower(text),
             '[^a-zA-Z0-9_]+')) AS word
           FROM documents)
         SELECT word, COUNT(*) AS n FROM w WHERE word <> ''
         GROUP BY word ORDER BY n DESC, word LIMIT 20""",
    "events_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY 1, 2 ORDER BY window_start_us, event_type""",
    "q_ts_native" ->
      """SELECT date_trunc('hour', ts) AS hour_ts,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY 1, 2 ORDER BY hour_ts, event_type""",
    "q_rate_stream" ->
      """WITH v AS (SELECT range AS value FROM range(0, 5000)),
         e AS (SELECT 't' || CAST(value % 5 AS VARCHAR) AS event_type,
                 1704067200000000 + value * 61000000 AS ts_us
               FROM v)
         SELECT ts_us - ts_us % 3600000000 AS window_start_us, event_type,
           COUNT(*) AS n
         FROM e GROUP BY 1, 2 ORDER BY window_start_us, event_type""",
    "events_sessions" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         f AS (
           SELECT *, CASE WHEN prev_us IS NULL
                          OR ts_us - prev_us > 1800 * 1000000
                          THEN 1 ELSE 0 END AS new_sess
           FROM e),
         g AS (
           SELECT *, CAST(SUM(new_sess) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS session_id
           FROM f)
         SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
         FROM g GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "events_hopping" ->
      """WITH e AS (
           SELECT epoch_us(ts) AS ts_us, event_type,
             unnest([0, 1]) AS hop
           FROM events)
         SELECT (ts_us - (ts_us % 1800000000) - hop * 1800000000)
             AS window_start_us,
           event_type, COUNT(*) AS n
         FROM e GROUP BY 1, 2 ORDER BY window_start_us, event_type""",
    "events_stream_tumbling" ->
      """SELECT (epoch_us(ts) - (epoch_us(ts) % 3600000000))
             AS window_start_us,
           event_type, COUNT(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""",
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
           (SELECT MAX(CAST(round(o2.o_totalprice * 100) AS BIGINT))
            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
             AS cust_max_cents
         FROM orders o ORDER BY o_orderkey""",
    "q_union_distinct" ->
      """SELECT o_custkey AS custkey FROM orders
         UNION
         SELECT c_custkey FROM customer WHERE c_acctbal > 0
         ORDER BY custkey""",
    "validate_query" ->
      """WITH c AS (SELECT doc_id, text,
           length(regexp_replace(text,'^[\s\p{Z}\x{85}]+|[\s\p{Z}\x{85}]+$','','g')) AS slen,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(text, '[^\n\t\x20-\x7E]', '', 'g'),
             '\t', ' ', 'g'),
             '(?m)^ +| +$', '', 'g'),
             '\n{3,}', chr(10)||chr(10), 'g'),
             '^[\n ]+|[\n ]+$', '', 'g') AS cleaned
         FROM documents)
         SELECT doc_id,
           CASE WHEN slen < 1 THEN 'text_too_short'
                WHEN slen > 300 THEN 'query_too_long'
                WHEN length(cleaned) = 0 THEN 'validation_error'
                ELSE NULL END AS error_type
         FROM c ORDER BY doc_id""",
    "q_salted_agg" ->
      """SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_having" ->
      """SELECT c_custkey, c_name, n_orders, total_spent FROM (
           SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
               AS total_spent
           FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15) t
         JOIN customer ON o_custkey = c_custkey
         ORDER BY c_custkey""",
    "q_conditional_agg" ->
      """SELECT l_returnflag,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_extendedprice
             ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS rev_f,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_extendedprice
             ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS rev_o,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_f,
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_o
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_pivot" ->
      """SELECT l_returnflag,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_extendedprice
             END AS DECIMAL(18,6))) AS DOUBLE) AS rev_f,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_extendedprice
             END AS DECIMAL(18,6))) AS DOUBLE) AS rev_o
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_ab_lift" ->
      """WITH pu AS (SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS purchased
           FROM events GROUP BY user_id),
         h AS (SELECT user_id, purchased,
             md5('11:' || CAST(user_id AS VARCHAR)) AS hh FROM pu),
         v AS (SELECT purchased, list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef', hh[i:i]) - 1 AS BIGINT)),
             (a, d) -> a * 16 + d) AS hv
           FROM h),
         u AS (SELECT purchased,
             round((CAST(hv AS DOUBLE) + 0.5) / 4294967296.0, 6) < 0.5
               AS in_a
           FROM v),
         agg AS (SELECT
             CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN in_a THEN purchased ELSE 0 END) AS BIGINT)
               AS conv_a,
             CAST(SUM(CASE WHEN in_a THEN 0 ELSE purchased END) AS BIGINT)
               AS conv_b
           FROM u)
         SELECT n_a, n_b, conv_a, conv_b,
           round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           round((CAST(conv_a AS DOUBLE) / n_a
                  - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
               * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
               * (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat
         FROM agg""",
    "q_linreg" ->
      """WITH m AS (SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(12,2))
               * CAST(l_extendedprice AS DECIMAL(14,2))) AS sxy,
             SUM(CAST(l_quantity AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(14,2))
               * CAST(l_extendedprice AS DECIMAL(14,2))) AS syy
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           round((CAST(sy AS DOUBLE)
               - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept,
           round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
         FROM m ORDER BY l_returnflag""",
    "q_roc_auc" ->
      """WITH s AS (SELECT n_chars AS score, COUNT(*) AS cnt,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS p
           FROM documents GROUP BY 1),
         r AS (SELECT p, cnt,
             CAST(SUM(cnt) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cnt AS DOUBLE)
               + (CAST(cnt AS DOUBLE) + 1.0) / 2.0 AS midrank
           FROM s),
         a AS (SELECT CAST(SUM(p) AS BIGINT) AS np,
             CAST(SUM(cnt - p) AS BIGINT) AS nn,
             SUM(CAST(p AS DOUBLE) * midrank) AS rsum
           FROM r)
         SELECT np AS n_pos, nn AS n_neg,
           round((rsum - CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) + 1.0)
               / 2.0)
             / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS auc
         FROM a""",
    "q_confusion" ->
      """WITH c AS (SELECT
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
           round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
             AS precision,
           round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6)
             AS recall,
           round(2.0 * CAST(tp AS DOUBLE)
             / (2.0 * CAST(tp AS DOUBLE) + CAST(fp AS DOUBLE)
               + CAST(fn AS DOUBLE)), 6) AS f1
         FROM c""",
    "q_calibration" ->
      """SELECT LEAST(CAST(n_chars AS BIGINT) // 100, 9) AS bin,
           COUNT(*) AS n,
           round(CAST(CAST(SUM(LEAST(CAST(n_chars AS BIGINT), 1000))
               AS BIGINT) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1000.0), 6) AS mean_score,
           round(CAST(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
               AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS obs_rate
         FROM documents GROUP BY 1 ORDER BY bin""",
    "q_jaro_dedup" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
         FROM part a JOIN part b
           ON a.p_brand = b.p_brand AND a.p_size = b.p_size
           AND a.p_partkey < b.p_partkey
         WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 6)
           >= 0.85
         ORDER BY jw DESC, id_a, id_b""",
    "q_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
               AS ym,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
           FROM orders),
         f AS (SELECT o_custkey, MIN(ym) AS cohort_ym FROM o GROUP BY 1)
         SELECT cohort_ym, ym - cohort_ym AS age_months,
           COUNT(DISTINCT o.o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS revenue
         FROM o JOIN f ON o.o_custkey = f.o_custkey
         GROUP BY 1, 2 ORDER BY cohort_ym, age_months""",
    "q_order_gaps" ->
      """WITH g AS (SELECT
             (epoch_us(o_orderdate)
               - LAG(epoch_us(o_orderdate), 1) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)) // 86400000000
               AS gap_days
           FROM orders)
         SELECT COUNT(*) AS n_gaps,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)
             AS BIGINT) AS med_gap_days,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_days)
             AS BIGINT) AS p90_gap_days,
           round(CAST(SUM(gap_days) AS DOUBLE) / COUNT(*), 6)
             AS mean_gap_days
         FROM g WHERE gap_days IS NOT NULL""",
    "q_seasonality" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         t AS (SELECT day, rev,
             COUNT(*) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7,
             SUM(rev) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sum7
           FROM d),
         r AS (SELECT isodow(day) AS dow,
             rev - CAST(round(CAST(sum7 AS DOUBLE) / 7.0, 6)
               AS DECIMAL(18,6)) AS detr
           FROM t WHERE n7 = 7)
         SELECT dow, COUNT(*) AS n_days,
           round(CAST(SUM(detr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
             AS seasonal
         FROM r GROUP BY 1 ORDER BY dow""",
    "q_autocorr" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         p AS (SELECT rev,
             LAG(rev, 7) OVER (ORDER BY day) AS lag7
           FROM d),
         m AS (SELECT COUNT(*) AS n,
             SUM(rev) AS sx, SUM(lag7) AS sy,
             SUM(rev * lag7) AS sxy, SUM(rev * rev) AS sxx,
             SUM(lag7 * lag7) AS syy
           FROM p WHERE lag7 IS NOT NULL)
         SELECT n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS acf7
         FROM m""",
    "q_changepoint" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           FROM orders GROUP BY 1),
         m AS (SELECT CAST(round(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 6)
             AS DECIMAL(18,6)) AS mu
           FROM d),
         c AS (SELECT day,
             SUM(rev - mu) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
           FROM d CROSS JOIN m)
         SELECT day, round(CAST(cusum AS DOUBLE), 6) AS cusum,
           round(CAST(abs(cusum) AS DOUBLE), 6) AS abs_cusum
         FROM c ORDER BY abs_cusum DESC, day LIMIT 5""",
    "q_hits" -> {
      def iter(k: Int): String =
        s"""ar$k AS (SELECT dst, SUM(h) AS s
             FROM e JOIN h${k - 1} ON node = src GROUP BY dst),
           am$k AS (SELECT MAX(s) AS m FROM ar$k),
           a$k AS (SELECT node,
               CAST(round(CAST(coalesce(s, 0) AS DOUBLE)
                 / CAST(m AS DOUBLE), 12) AS DECIMAL(28,12)) AS a
             FROM nodes LEFT JOIN ar$k ON node = dst CROSS JOIN am$k),
           hr$k AS (SELECT src, SUM(a) AS s
             FROM e JOIN a$k ON node = dst GROUP BY src),
           hm$k AS (SELECT MAX(s) AS m FROM hr$k),
           h$k AS (SELECT node,
               CAST(round(CAST(coalesce(s, 0) AS DOUBLE)
                 / CAST(m AS DOUBLE), 12) AS DECIMAL(28,12)) AS h
             FROM nodes LEFT JOIN hr$k ON node = src CROSS JOIN hm$k)"""
      s"""WITH e AS (SELECT DISTINCT l_suppkey AS src,
             l_partkey + (SELECT max(l_suppkey) + 1 FROM lineitem) AS dst
           FROM lineitem WHERE l_quantity <= 2),
         nodes AS (SELECT src AS node FROM e
           UNION SELECT dst FROM e),
         h0 AS (SELECT node, CAST(1.000000000000 AS DECIMAL(28,12)) AS h
           FROM nodes),
         ${iter(1)},
         ${iter(2)},
         ${iter(3)}
         SELECT node, round(CAST(a AS DOUBLE), 8) AS auth,
           round(CAST(h AS DOUBLE), 8) AS hub
         FROM a3 JOIN h3 USING (node)
         ORDER BY auth DESC, node LIMIT 20"""
    },
    "q_degree_stats" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
           WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
             AND a.l_suppkey <> b.l_suppkey),
         d AS (SELECT src, COUNT(*) AS degree FROM e GROUP BY 1)
         SELECT degree, COUNT(*) AS n_nodes FROM d GROUP BY 1
         ORDER BY degree""",
    "q_link_predict" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
           WHERE l_quantity <= 2),
         und AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
             AND a.l_suppkey <> b.l_suppkey),
         deg AS (SELECT u, COUNT(*) AS du FROM und GROUP BY 1),
         cn AS (SELECT x.u AS u, y.u AS v, COUNT(*) AS cn
           FROM und x JOIN und y ON x.v = y.v AND x.u < y.u
           GROUP BY 1, 2),
         nc AS (SELECT cn.u, cn.v, cn.cn FROM cn
           WHERE NOT EXISTS (SELECT 1 FROM und
             WHERE und.u = cn.u AND und.v = cn.v))
         SELECT nc.u AS u, nc.v AS v, nc.cn AS cn,
           round(CAST(nc.cn AS DOUBLE)
             / CAST(d1.du + d2.dv - nc.cn AS DOUBLE), 6) AS jacc
         FROM nc JOIN deg d1 ON d1.u = nc.u
           JOIN (SELECT u AS vv, du AS dv FROM deg) d2 ON d2.vv = nc.v
         ORDER BY jacc DESC, u, v LIMIT 20""",
    "q_chi_square" ->
      """WITH cells AS (SELECT lang, source, COUNT(*) AS o
           FROM documents GROUP BY 1, 2),
         rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rt FROM cells
           GROUP BY 1),
         ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ct FROM cells
           GROUP BY 1),
         tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
             COUNT(DISTINCT lang) AS r, COUNT(DISTINCT source) AS c
           FROM cells),
         terms AS (SELECT CAST(round(
             (CAST(o AS DOUBLE)
               - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                 / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE)
               - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
                 / CAST(n AS DOUBLE))
             / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
               / CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS cell,
             n, r, c
           FROM cells JOIN rt USING (lang) JOIN ct USING (source)
             CROSS JOIN tot)
         SELECT n, (r - 1) * (c - 1) AS dof,
           round(CAST(SUM(cell) AS DOUBLE), 6) AS chi2,
           round(sqrt(CAST(SUM(cell) AS DOUBLE)
             / (CAST(n AS DOUBLE)
               * CAST(least(r - 1, c - 1) AS DOUBLE))), 6) AS cramers_v
         FROM terms GROUP BY n, r, c""",
    "q_target_encoding" ->
      """WITH li AS (SELECT p_brand,
             CAST(l_extendedprice AS DECIMAL(14,2))
               * (CAST(1.00 AS DECIMAL(4,2))
                 - CAST(l_discount AS DECIMAL(4,2))) AS rev
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         per AS (SELECT p_brand, COUNT(*) AS n, SUM(rev) AS s
           FROM li GROUP BY 1),
         g AS (SELECT COUNT(*) AS gn, SUM(rev) AS gs FROM li)
         SELECT p_brand, n,
           round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_mean,
           round((CAST(s AS DOUBLE)
               + 50.0 * (CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)))
             / (CAST(n AS DOUBLE) + 50.0), 6) AS encoded
         FROM per CROSS JOIN g ORDER BY p_brand""",
    "q_bigram_lm" ->
      """WITH ws AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             w -> w <> '') AS ws
           FROM documents),
         bi AS (SELECT doc_id,
             unnest(list_transform(range(1, len(ws)),
               i -> ws[i] || ' ' || ws[i+1])) AS bigram
           FROM ws WHERE len(ws) >= 2),
         bg AS (SELECT doc_id, split_part(bigram, ' ', 1) AS x,
             split_part(bigram, ' ', 2) AS y
           FROM bi),
         bc AS (SELECT x, y, COUNT(*) AS c FROM bg GROUP BY 1, 2),
         cx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM bc
           GROUP BY 1),
         v AS (SELECT COUNT(DISTINCT y) AS v FROM bc),
         terms AS (SELECT doc_id,
             CAST(round(ln((CAST(c AS DOUBLE) + 1.0)
               / (CAST(cx AS DOUBLE) + CAST(v AS DOUBLE))), 9)
               AS DECIMAL(18,9)) AS term
           FROM bg JOIN bc USING (x, y) JOIN cx USING (x) CROSS JOIN v)
         SELECT doc_id, COUNT(*) AS n_bigrams,
           round(0.0 - CAST(SUM(term) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_nll
         FROM terms GROUP BY doc_id ORDER BY doc_id""",
    "q_containment" ->
      """WITH w AS (SELECT doc_id, source,
             CAST(n_chars AS BIGINT) // 100 AS blk,
             list_filter(regexp_split_to_array(lower(text),
               '[^a-z0-9_]+'), x -> x <> '') AS ws
           FROM documents),
         capped AS (SELECT doc_id, source, blk, ws,
             ROW_NUMBER() OVER (PARTITION BY source, blk
               ORDER BY doc_id) AS rn
           FROM w WHERE len(ws) >= 3),
         t AS (SELECT doc_id, source, blk,
             list_distinct(list_transform(range(1, len(ws) - 1),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
           FROM capped WHERE rn <= 32),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
             CAST(len(a.sh) AS BIGINT) AS la,
             CAST(len(b.sh) AS BIGINT) AS lb
           FROM t a JOIN t b ON a.source = b.source AND a.blk = b.blk
             AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, inter, la, lb,
           round(greatest(CAST(inter AS DOUBLE) / CAST(la AS DOUBLE),
             CAST(inter AS DOUBLE) / CAST(lb AS DOUBLE)), 6)
             AS containment
         FROM p ORDER BY containment DESC, id_a, id_b LIMIT 20""",
    "q_winsorize" ->
      """WITH cut AS (SELECT event_type,
             percentile_disc(0.05) WITHIN GROUP (ORDER BY value) AS p05,
             percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95
           FROM events GROUP BY event_type)
         SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN e.value < c.p05 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_low,
           CAST(SUM(CASE WHEN e.value > c.p95 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clip_high,
           round(CAST(SUM(CAST(greatest(c.p05, least(c.p95, e.value))
             AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
             AS winsorized_mean
         FROM events e JOIN cut c ON e.event_type = c.event_type
         GROUP BY e.event_type ORDER BY e.event_type""",
    "q_golden_record" ->
      """WITH d AS (SELECT doc_id, source, lang, n_chars,
             CAST(n_chars AS BIGINT) // 200 AS bucket
           FROM documents),
         r AS (SELECT source, bucket, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source, bucket
               ORDER BY n_chars DESC, doc_id) AS rn
           FROM d),
         a AS (SELECT source, bucket, COUNT(*) AS n_members,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
           FROM d GROUP BY 1, 2),
         l AS (SELECT source, bucket,
             string_agg(lang, ',' ORDER BY lang) AS langs
           FROM (SELECT DISTINCT source, bucket, lang FROM d)
           GROUP BY 1, 2)
         SELECT r.source, r.bucket, r.doc_id AS keep_id,
           r.n_chars AS keep_chars, a.n_members, a.total_chars, l.langs
         FROM r
           JOIN a ON a.source = r.source AND a.bucket = r.bucket
           JOIN l ON l.source = r.source AND l.bucket = r.bucket
         WHERE r.rn = 1 ORDER BY r.source, r.bucket""",
    "q_entropy" ->
      """WITH w AS (SELECT lang,
             unnest(regexp_split_to_array(lower(text), '[^a-zA-Z0-9_]+'))
               AS w
           FROM documents),
         c AS (SELECT lang, w, COUNT(*) AS c FROM w WHERE w <> ''
           GROUP BY 1, 2),
         a AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens,
             COUNT(*) AS vocab,
             SUM(CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9))
               * CAST(c AS DECIMAL(12,0))) AS sum_clnc
           FROM c GROUP BY 1)
         SELECT lang, n_tokens, vocab,
           round(ln(CAST(n_tokens AS DOUBLE))
             - CAST(sum_clnc AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
             AS entropy
         FROM a ORDER BY lang""",
    "q_rfm" ->
      """WITH o AS (SELECT o_custkey, epoch_us(o_orderdate) AS us,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
           FROM orders),
         g AS (SELECT MAX(us) AS gmax FROM o),
         per AS (SELECT o_custkey, MAX(us) AS cmax, COUNT(*) AS freq,
             SUM(price) AS mon
           FROM o GROUP BY 1),
         sc AS (SELECT
             4 - least(3, ((gmax - cmax) // 86400000000) // 60)
               AS r_score,
             least(4, freq) AS f_score,
             least(4, 1 + CAST(floor(mon) AS BIGINT) // 200000)
               AS m_score,
             mon
           FROM per CROSS JOIN g)
         SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
           CAST(SUM(mon) AS DOUBLE) AS total_monetary
         FROM sc GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""",
    "q_dau_mau" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day,
             CAST(date_trunc('month', ts) AS DATE) AS month, user_id
           FROM events),
         dau AS (SELECT day, month, COUNT(DISTINCT user_id) AS dau
           FROM e GROUP BY 1, 2),
         mau AS (SELECT month, COUNT(DISTINCT user_id) AS mau
           FROM e GROUP BY 1)
         SELECT day, dau.dau, mau.mau,
           round(CAST(dau.dau AS DOUBLE) / CAST(mau.mau AS DOUBLE), 6)
             AS stickiness
         FROM dau JOIN mau USING (month) ORDER BY day""",
    "q_ttr" ->
      """WITH w AS (SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '[^a-zA-Z0-9_]+'))
               AS w
           FROM documents),
         a AS (SELECT doc_id, COUNT(*) AS n_tok,
             COUNT(DISTINCT w) AS n_types
           FROM w WHERE w <> '' GROUP BY 1)
         SELECT doc_id, n_tok, n_types,
           round(CAST(n_types AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
             AS ttr
         FROM a WHERE n_tok >= 20
         ORDER BY ttr DESC, doc_id LIMIT 50""",
    "q_markov" ->
      """WITH t AS (SELECT event_type AS prev_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         c AS (SELECT prev_type, next_type, COUNT(*) AS n
           FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2)
         SELECT prev_type, next_type, n,
           round(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
             AS p
         FROM c ORDER BY prev_type, next_type""",
    "q_item_cooccur" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey, p_brand
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         pairs AS (SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             COUNT(*) AS n_ab
           FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
             AND a.p_brand < b.p_brand
           GROUP BY 1, 2),
         bc AS (SELECT p_brand, COUNT(*) AS c FROM ob GROUP BY 1),
         tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM ob)
         SELECT brand_a, brand_b, n_ab,
           round(CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE)
             / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 6) AS lift
         FROM pairs
           JOIN bc ca ON ca.p_brand = brand_a
           JOIN bc cb ON cb.p_brand = brand_b
           CROSS JOIN tot
         ORDER BY lift DESC, brand_a, brand_b LIMIT 30""",
    "q_shortest_path" ->
      """WITH RECURSIVE ps AS (SELECT DISTINCT l_partkey, l_suppkey
           FROM lineitem WHERE l_quantity <= 2),
         e AS (SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
           FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey
             AND a.l_suppkey <> b.l_suppkey),
         so AS (SELECT MIN(src) AS sn FROM e),
         bfs(node, d) AS (
           SELECT sn, 0 FROM so
           UNION
           SELECT e.dst, bfs.d + 1 FROM bfs JOIN e ON e.src = bfs.node
           WHERE bfs.d < 4)
         SELECT node, MIN(d) AS dist FROM bfs GROUP BY node
         ORDER BY node""",
    "q_benford" ->
      """WITH d AS (SELECT CAST(substring(CAST(CAST(
             round(l_extendedprice * 100, 0) AS BIGINT) AS VARCHAR),
             1, 1) AS INT) AS digit
           FROM lineitem),
         c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1)
         SELECT digit, n,
           round(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6)
             AS obs_freq,
           round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS exp_freq
         FROM c ORDER BY digit""",
    "q_conversion_lag" ->
      """WITH a AS (SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               AS fv,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS fp
           FROM events GROUP BY user_id)
         SELECT user_id, (fp - fv) // 60000000 AS lag_minutes
         FROM a
         WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv
         ORDER BY user_id""",
    "q_skyline" ->
      """WITH d AS (SELECT p_retailprice AS price, p_size AS size,
             COUNT(*) AS n_parts
           FROM part GROUP BY 1, 2)
         SELECT price, size, n_parts FROM d p
         WHERE NOT EXISTS (SELECT 1 FROM d q
           WHERE q.price <= p.price AND q.size >= p.size
             AND (q.price < p.price OR q.size > p.size))
         ORDER BY price, size""",
    "q_pareto" ->
      """WITH per AS (SELECT user_id,
             SUM(CAST(value AS DECIMAL(18,6))) AS rev
           FROM events WHERE event_type = 'purchase'
           GROUP BY user_id),
         tot AS (SELECT SUM(rev) AS t FROM per),
         c AS (SELECT user_id, rev,
             SUM(rev) OVER (ORDER BY rev DESC, user_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM per)
         SELECT c.user_id, CAST(c.rev AS DOUBLE) AS revenue,
           round(CAST(c.rev AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS share,
           round(CAST(c.cum AS DOUBLE) / CAST(t.t AS DOUBLE), 6)
             AS cum_share
         FROM c CROSS JOIN tot t
         ORDER BY revenue DESC, c.user_id LIMIT 25""",
    "q_twap" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
           FROM events WHERE event_type = 'purchase'),
         d AS (SELECT user_id, value,
             lead(ts_us) OVER (PARTITION BY user_id
               ORDER BY ts_us, event_id) - ts_us AS dt_us
           FROM e)
         SELECT user_id, COUNT(*) AS n_obs,
           round(CAST(SUM(CAST(value * dt_us AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(SUM(CAST(dt_us AS DECIMAL(28,6))) AS DOUBLE), 6)
             AS twap
         FROM d WHERE dt_us IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",
    "q_rolling_median" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           round(median(value) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
             AS rolling_median
         FROM events WHERE event_type = 'purchase'
         ORDER BY event_id""",
    "q_asof_tolerance" ->
      """WITH j AS (
           SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
             epoch_us(v.ts) AS m_ts, v.event_id AS m_id
           FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
             ON p.user_id = v.user_id
               AND epoch_us(p.ts) >= epoch_us(v.ts))
         SELECT event_id, user_id, ts_us,
           CASE WHEN m_ts IS NOT NULL AND ts_us - m_ts <= 1800000000
                THEN m_ts END AS asof_view_ts_us,
           CASE WHEN m_ts IS NOT NULL AND ts_us - m_ts <= 1800000000
                THEN m_id END AS asof_view_event_id,
           coalesce(m_ts IS NOT NULL AND ts_us - m_ts <= 1800000000,
             FALSE) AS within_tolerance
         FROM j ORDER BY event_id""",
    "q_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
           epoch_us(v.ts) AS asof_view_ts_us,
           v.event_id AS asof_view_event_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON p.user_id = v.user_id
             AND epoch_us(p.ts) >= epoch_us(v.ts)
         ORDER BY p.event_id""",
    "q_asof_join_native" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
           epoch_us(v.ts) AS asof_view_ts_us,
           v.event_id AS asof_view_event_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON p.user_id = v.user_id
             AND epoch_us(p.ts) >= epoch_us(v.ts)
         ORDER BY p.event_id""",
    "q_centroids" ->
      """SELECT label,
           round(AVG(CAST(embedding[1] AS DOUBLE)), 4) AS c0,
           round(AVG(CAST(embedding[2] AS DOUBLE)), 4) AS c1,
           round(AVG(CAST(embedding[3] AS DOUBLE)), 4) AS c2,
           round(AVG(CAST(embedding[4] AS DOUBLE)), 4) AS c3
         FROM embeddings GROUP BY label ORDER BY label""",
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_distinct_agg" ->
      """SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_topk_per_group" ->
      """SELECT o_custkey, rk, o_orderkey, price_cents FROM (
           SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rk,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
           FROM orders) t
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "q_scalar_funcs" ->
      """SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substr(p_name, 1, 8) AS name_prefix,
           length(p_type) AS type_len,
           p_size % 7 AS size_mod,
           round(sqrt(p_retailprice), 6) AS price_sqrt,
           concat_ws('|', p_brand, p_type) AS brand_type
         FROM part ORDER BY p_partkey""",
    "text_stats" ->
      """SELECT doc_id, length(text) AS n_chars,
           len(regexp_split_to_array(trim(text), '[ \t\n]+')) AS n_tokens_ws,
           length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
           round(CAST(length(regexp_replace(text, '[ \t\n]', '', 'g')) AS DOUBLE)
             / len(regexp_split_to_array(trim(text), '[ \t\n]+')), 6) AS avg_word_len
         FROM documents ORDER BY doc_id""",
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, COUNT(*) AS n_copies,
           MIN(doc_id) AS keep_doc_id
         FROM documents GROUP BY md5(text) ORDER BY content_hash""",
    // oracle goes brute-force all-pairs (fine at oracle scale); the Spark
    // side uses LSH banding — results must agree because LSH recall at
    // the 0.9+ Jaccard of the planted near-dups is ~1-1e-15
    "dedup_minhash" ->
      """WITH w AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), x -> x <> '') AS ws
           FROM documents),
         t AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(ws)-1, 2)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS tg
           FROM w)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE) /
             (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg))), 6)
             AS jaccard
         FROM t a JOIN t b ON a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE) /
             (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg))) >= 0.5
         ORDER BY doc_a, doc_b""",
    "dedup_ngram" ->
      """WITH w AS (
           SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), x -> x <> '') AS ws,
             list_filter(regexp_split_to_array(lower(trim(text
               || ' zulu yankee qoph')), '[^a-zA-Z0-9_]+'),
               x -> x <> '') AS wm
           FROM documents),
         t AS (
           SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(ws)-1, 2)),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS ta,
             list_distinct(list_transform(range(1, greatest(len(wm)-1, 2)),
               i -> wm[i] || ' ' || wm[i+1] || ' ' || wm[i+2])) AS tb
           FROM w)
         SELECT doc_id,
           round(CAST(len(list_intersect(ta, tb)) AS DOUBLE) /
             (len(ta) + len(tb) - len(list_intersect(ta, tb))), 6) AS jaccard
         FROM t ORDER BY doc_id""",
    "neardup_embedding" ->
      """SELECT vec_id AS doc_a, vec_id + 100000 AS doc_b FROM embeddings
         ORDER BY doc_a, doc_b""",
    "ann_bruteforce" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id = 0)
         SELECT vec_id,
           round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                 CAST(embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(qv, qv))), 4) AS cosine
         FROM embeddings, q
         ORDER BY round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                 CAST(embedding AS DOUBLE[]))) *
                sqrt(list_dot_product(qv, qv))), 4) DESC, vec_id
         LIMIT 10""",
    "lang_id" -> langIdOracleSql,
    "quality_score" ->
      """SELECT doc_id,
           round((least(1.0, CAST(length(text) AS DOUBLE) / 500.0)
             + least(1.0, CAST(len(regexp_split_to_array(trim(text),
                 '[ \t\n]+')) AS DOUBLE) / 80.0)
             + CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                      AS DOUBLE) / CAST(length(text) AS DOUBLE) END) / 3.0,
             6) AS quality
         FROM documents ORDER BY doc_id""",
    // BPE-ish cost model (SimpleTokenizer): ceil(len/4) per [A-Za-z0-9_]+
    // run, +1 per non-word non-whitespace char; whitespace free
    "text_profile" ->
      """SELECT doc_id,
           CAST(coalesce(list_sum(list_transform(
               regexp_extract_all(text, '[A-Za-z0-9_]+'),
               r -> CAST(ceil(length(r) / 4.0) AS BIGINT))), 0)
             + length(regexp_replace(text, '[A-Za-z0-9_ \t\n\r\f\x0B]',
                 '', 'g'))
             AS INTEGER) AS n_tokens_bpeish
         FROM documents ORDER BY doc_id""",
    "q_window_frames" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
         SELECT o_custkey, o_orderkey,
           lag(cents) OVER w AS prev_cents,
           lead(cents) OVER w AS next_cents,
           first_value(cents) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS first_cents,
           CAST(SUM(cents) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS moving_cents,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank
         FROM o
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q_window_ranks" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
         SELECT o_custkey, o_orderkey,
           CAST(rank() OVER d AS BIGINT) AS rk,
           CAST(dense_rank() OVER d AS BIGINT) AS drk,
           round(cume_dist() OVER d, 6) AS cd,
           nth_value(cents, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS second_cents
         FROM o
         WINDOW d AS (PARTITION BY o_custkey ORDER BY o_orderdate)
         ORDER BY o_custkey, o_orderkey""",
    "q_window_range" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
           CAST(date_diff('day', DATE '1990-01-01',
             CAST(o_orderdate AS DATE)) AS INTEGER) AS day,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
         SELECT o_custkey, o_orderkey, day,
           COUNT(*) OVER w AS n_30d,
           CAST(SUM(cents) OVER w AS BIGINT) AS cents_30d
         FROM o
         WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",
    "q_range_join" ->
      """SELECT band_id, COUNT(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_price
         FROM part
         JOIN (VALUES (0, 0.0, 1000.0), (1, 1000.0, 1300.0),
                      (2, 1300.0, 1600.0), (3, 1600.0, 5000.0))
              b(band_id, lo, hi)
           ON p_retailprice >= lo AND p_retailprice < hi
         GROUP BY band_id ORDER BY band_id""",
    "q_stats_agg" ->
      """SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_date_funcs" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           epoch_us(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)))
             AS month_start_us,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
             AS INTEGER) AS days_since_95,
           epoch_us(CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP))
             AS eom_us
         FROM orders ORDER BY o_orderkey""",
    "q_string_fuzzy" ->
      """SELECT p_partkey,
           CAST(levenshtein(substring(p_name, 1, 10), p_brand) AS INTEGER)
             AS lev_dist,
           reverse(p_brand) AS brand_rev,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           split_part(p_type, ' ', 1) AS type_first,
           regexp_extract(p_name, '([a-z]+)$', 1) AS name_last_word,
           CAST(instr(p_name, 'al') AS INTEGER) AS al_pos
         FROM part ORDER BY p_partkey""",
    "q_array_funcs" ->
      """SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 5) AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_sum(list_transform(embedding[1:8],
             x -> CAST(x AS DOUBLE))) / 8.0, 6) AS head_mean
         FROM embeddings ORDER BY vec_id""",
    "q_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                               WHERE n_regionkey = 1)
           AND EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey
                         AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q_full_outer" ->
      """WITH c AS (SELECT c_custkey, c_acctbal FROM customer
                    WHERE c_acctbal < 0),
           oa AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders
                  GROUP BY o_custkey)
         SELECT coalesce(c_custkey, o_custkey) AS custkey, c_acctbal, n_orders
         FROM c FULL OUTER JOIN oa ON c_custkey = o_custkey
         ORDER BY custkey""",
    "q_json_funcs" ->
      """WITH p AS (SELECT p_partkey,
           '{"size":' || p_size || ',"brand":"' || p_brand || '"}' AS j
         FROM part)
         SELECT p_partkey,
           CAST(json_extract(j, '$.size') AS INTEGER) AS jsize,
           json_extract_string(j, '$.brand') AS jbrand
         FROM p ORDER BY p_partkey""",
    // same truth as the batch events_sessions — the streaming query with
    // custom state must reproduce the batch fold exactly
    "events_stream_sessions" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         f AS (
           SELECT *, CASE WHEN prev_us IS NULL
                          OR ts_us - prev_us > 1800 * 1000000
                          THEN 1 ELSE 0 END AS new_sess
           FROM e),
         g AS (
           SELECT *, CAST(SUM(new_sess) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS session_id
           FROM f)
         SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
         FROM g GROUP BY user_id, session_id
         ORDER BY user_id, session_id""",
    "q_sample_hash" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
         ORDER BY o_orderkey""",
    "q_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             CAST(1 AS BIGINT) AS version
           FROM orders),
         upd AS (SELECT o_orderkey, o_custkey, price_cents + 500,
             CAST(2 AS BIGINT)
           FROM base WHERE o_orderkey % 10 = 0),
         a AS (SELECT * FROM base UNION ALL SELECT * FROM upd)
         SELECT o_orderkey, o_custkey, price_cents, version FROM a
         QUALIFY row_number() OVER
           (PARTITION BY o_orderkey ORDER BY version DESC) = 1
         ORDER BY o_orderkey""",
    "q_tfidf" ->
      """WITH w AS (
           SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-zA-Z0-9_]+'),
             x -> x <> '')) AS word
           FROM documents),
         tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
         df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
         n AS (SELECT COUNT(*) AS n_docs FROM documents),
         x AS (SELECT tf.doc_id, tf.word,
             round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
           FROM tf JOIN df USING (word) CROSS JOIN n)
         SELECT doc_id, CAST(rk AS INTEGER) AS rk, word, tfidf FROM (
           SELECT *, row_number() OVER
             (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rk
           FROM x)
         WHERE rk <= 3 ORDER BY doc_id, rk""",
    // transitive closure over the same brute-force pair set the
    // dedup_minhash oracle derives; UNION (not UNION ALL) in the
    // recursive term makes the closure terminate on cycles
    "dedup_clusters" ->
      """WITH RECURSIVE w AS (
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
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM t a JOIN t b ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE) /
             (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg))) >= 0.5),
         e AS (SELECT doc_a AS src, doc_b AS dst FROM p
               UNION ALL SELECT doc_b, doc_a FROM p),
         reach(id, r) AS (
           SELECT src, src FROM e
           UNION
           SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst),
         comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
         SELECT d.doc_id,
           coalesce(c.component, d.doc_id) AS component,
           coalesce(c.component, d.doc_id) = d.doc_id AS is_canonical
         FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
         ORDER BY d.doc_id""",
    "q_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
             epoch_us(ts) AS ts_us FROM events),
         p AS (SELECT event_id, user_id, ts_us FROM e
               WHERE event_type = 'purchase'),
         v AS (SELECT user_id AS v_user_id, ts_us AS view_ts_us FROM e
               WHERE event_type = 'view')
         SELECT p.event_id, p.user_id, p.ts_us,
           COUNT(v.view_ts_us) AS n_views_1h
         FROM p LEFT OUTER JOIN v ON p.user_id = v.v_user_id
           AND v.view_ts_us >= p.ts_us - 3600000000
           AND v.view_ts_us <= p.ts_us
         GROUP BY p.event_id, p.user_id, p.ts_us
         ORDER BY p.event_id""",
    "q_vec_quantize" ->
      """WITH q AS (SELECT vec_id, embedding,
           CASE WHEN list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) = 0 THEN 1.0
                ELSE list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) / 127.0 END AS scale
         FROM embeddings)
         SELECT vec_id, round(scale, 6) AS scale_r,
           CAST(greatest(-127, least(127,
             round(CAST(embedding[1] AS DOUBLE) / scale))) AS INTEGER) AS q0,
           CAST(greatest(-127, least(127,
             round(CAST(embedding[2] AS DOUBLE) / scale))) AS INTEGER) AS q1,
           CAST(greatest(-127, least(127,
             round(CAST(embedding[3] AS DOUBLE) / scale))) AS INTEGER) AS q2,
           CAST(greatest(-127, least(127,
             round(CAST(embedding[4] AS DOUBLE) / scale))) AS INTEGER) AS q3
         FROM q ORDER BY vec_id""",
    // every stage of the e2e prep pipeline replayed: brute-force pair set
    // → recursive-closure components → canonical keep → stopword lang ID
    // → quality ratio → BPE-ish token count
    "pipeline_e2e" ->
      """WITH RECURSIVE w AS (
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
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM t a JOIN t b ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE) /
             (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg))) >= 0.5),
         e AS (SELECT doc_a AS src, doc_b AS dst FROM p
               UNION ALL SELECT doc_b, doc_a FROM p),
         reach(id, r) AS (
           SELECT src, src FROM e
           UNION
           SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst),
         comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         keep AS (
           SELECT d.doc_id, d.text FROM documents d
           LEFT JOIN comp c ON d.doc_id = c.id
           WHERE coalesce(c.component, d.doc_id) = d.doc_id),
         h AS (
           SELECT doc_id, text,
             len(list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), x -> list_contains(
               ['der','die','das','und','ist','nicht','von','mit','ein','zu'], x))) AS de_h,
             len(list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), x -> list_contains(
               ['the','and','of','to','in','is','that','for','with','a'], x))) AS en_h,
             len(list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), x -> list_contains(
               ['el','la','los','las','es','y','de','que','en','por'], x))) AS es_h,
             len(list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-zA-Z0-9_]+'), x -> list_contains(
               ['le','la','les','et','est','que','des','dans','pour','une'], x))) AS fr_h
           FROM keep),
         lq AS (
           SELECT doc_id, text,
             CASE WHEN greatest(de_h, en_h, es_h, fr_h) = 0 THEN 'und'
                  WHEN fr_h >= es_h AND fr_h >= en_h AND fr_h >= de_h THEN 'fr'
                  WHEN es_h >= en_h AND es_h >= de_h THEN 'es'
                  WHEN en_h >= de_h THEN 'en'
                  ELSE 'de' END AS lang_pred,
             round((least(1.0, CAST(length(text) AS DOUBLE) / 500.0)
               + least(1.0, CAST(len(regexp_split_to_array(trim(text),
                   '[ \t\n]+')) AS DOUBLE) / 80.0)
               + CASE WHEN length(text) = 0 THEN 0.0
                      ELSE CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                        AS DOUBLE) / CAST(length(text) AS DOUBLE) END) / 3.0,
               6) AS quality
           FROM h)
         SELECT doc_id, quality,
           CAST(coalesce(list_sum(list_transform(
               regexp_extract_all(text, '[A-Za-z0-9_]+'),
               r -> CAST(ceil(length(r) / 4.0) AS BIGINT))), 0)
             + length(regexp_replace(text, '[A-Za-z0-9_ \t\n\r\f\x0B]',
                 '', 'g'))
             AS INTEGER) AS n_tokens_bpeish
         FROM lq WHERE lang_pred = 'en' AND quality >= 0.5
         ORDER BY doc_id""",
    // brute-force all-pairs — feasible at oracle scale only; the Spark
    // side blocks on delete-1 neighborhoods (recall 1.0 by construction)
    "dedup_fuzzy" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS lev
         FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= 1
         ORDER BY id_a, id_b""",
    "q_string_agg" ->
      """SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses,
           COUNT(*) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_sample_stratified" ->
      """SELECT l_returnflag,
           COUNT(CASE WHEN substring(md5(CAST(l_orderkey AS VARCHAR) || '#'
               || CAST(l_linenumber AS VARCHAR)), 1, 1) <=
               CASE l_returnflag WHEN 'A' THEN '3' WHEN 'N' THEN '7'
                    ELSE '1' END
             THEN 1 END) AS n_sampled,
           COUNT(*) AS n_total
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // same truth as the batch events_hopping — the third streaming window
    // type checked against its batch oracle
    "events_stream_hopping" ->
      """WITH e AS (
           SELECT epoch_us(ts) AS ts_us, event_type,
             unnest([0, 1]) AS hop
           FROM events)
         SELECT (ts_us - (ts_us % 1800000000) - hop * 1800000000)
             AS window_start_us,
           event_type, COUNT(*) AS n
         FROM e GROUP BY 1, 2 ORDER BY window_start_us, event_type""",
    // batch replay of the stream-stream join: same truth, no state store
    "q_psi_drift" ->
      """WITH d AS (SELECT doc_id % 2 = 0 AS in_a,
             CAST(least(floor(n_chars / 100.0), 9.0) AS INTEGER) AS bin
           FROM documents),
         cnt AS (SELECT bin,
             SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN in_a THEN 0 ELSE 1 END) AS cb
           FROM d GROUP BY bin),
         tot AS (SELECT SUM(ca) AS ta, SUM(cb) AS tb, COUNT(*) AS nb
           FROM cnt)
         SELECT bin, CAST(ca AS BIGINT) AS ca, CAST(cb AS BIGINT) AS cb,
           round(((CAST(ca AS DOUBLE)+0.5)/(CAST(ta AS DOUBLE)+0.5*CAST(nb AS DOUBLE))
               - (CAST(cb AS DOUBLE)+0.5)/(CAST(tb AS DOUBLE)+0.5*CAST(nb AS DOUBLE)))
             * ln(((CAST(ca AS DOUBLE)+0.5)/(CAST(ta AS DOUBLE)+0.5*CAST(nb AS DOUBLE)))
               / ((CAST(cb AS DOUBLE)+0.5)/(CAST(tb AS DOUBLE)+0.5*CAST(nb AS DOUBLE)))),
             9) AS psi_term
         FROM cnt CROSS JOIN tot ORDER BY bin""",
    "q_embed_drift" ->
      """WITH dims AS (SELECT CAST(i AS BIGINT) AS i
             FROM generate_series(1, 64) t(i)),
         x AS (SELECT label, vec_id % 2 = 0 AS in_a, i - 1 AS dim,
             CAST(embedding[i] AS DOUBLE) AS e
           FROM embeddings CROSS JOIN dims),
         m AS (SELECT label, dim,
             CAST(SUM(CASE WHEN in_a
                 THEN CAST(e AS DECIMAL(28,12)) END) AS DOUBLE)
               / SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS ma,
             CAST(SUM(CASE WHEN NOT in_a
                 THEN CAST(e AS DECIMAL(28,12)) END) AS DOUBLE)
               / SUM(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS mb
           FROM x GROUP BY label, dim),
         agg AS (SELECT label,
             SUM(CAST(ma*mb AS DECIMAL(28,12))) AS dot,
             SUM(CAST(ma*ma AS DECIMAL(28,12))) AS na,
             SUM(CAST(mb*mb AS DECIMAL(28,12))) AS nb
           FROM m GROUP BY label)
         SELECT label,
           round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6)
             AS centroid_cosine
         FROM agg ORDER BY label""",
    // join + hourly pair count over the finalized-window region (window
    // end <= final watermark) — the chained-stateful-operator truth
    "events_stream_join_agg" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
             epoch_us(ts) AS ts_us FROM events),
         p AS (SELECT event_id, user_id, ts_us FROM e
               WHERE event_type = 'purchase'),
         v AS (SELECT user_id AS v_user_id, ts_us AS view_ts_us FROM e
               WHERE event_type = 'view'),
         j AS (SELECT p.event_id, p.ts_us
           FROM p JOIN v ON p.user_id = v.v_user_id
             AND v.view_ts_us >= p.ts_us - 3600000000
             AND v.view_ts_us <= p.ts_us),
         w AS (SELECT ts_us - (ts_us % 3600000000) AS window_start_us
           FROM j)
         SELECT window_start_us, COUNT(*) AS n_pairs
         FROM w
         WHERE window_start_us + 3600000000 <=
           (SELECT LEAST(
              MAX(CASE WHEN event_type = 'purchase' THEN ts_us END),
              MAX(CASE WHEN event_type = 'view' THEN ts_us END))
              - 7200000000 FROM e)
         GROUP BY window_start_us
         ORDER BY window_start_us""",
    // the emittable (watermark-complete) region of the streaming LEFT
    // OUTER join: purchases strictly below min(side maxima) - 2h have
    // either matched or null-emitted; younger rows are filtered on BOTH
    // sides, so the equality is exact
    "events_stream_left_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
             epoch_us(ts) AS ts_us FROM events),
         p AS (SELECT event_id, user_id, ts_us FROM e
               WHERE event_type = 'purchase'),
         v AS (SELECT user_id AS v_user_id, event_id AS view_event_id,
               ts_us AS view_ts_us FROM e WHERE event_type = 'view')
         SELECT p.event_id, p.ts_us, v.view_event_id, v.view_ts_us
         FROM p LEFT OUTER JOIN v ON p.user_id = v.v_user_id
           AND v.view_ts_us >= p.ts_us - 3600000000
           AND v.view_ts_us <= p.ts_us
         WHERE p.ts_us <
           (SELECT LEAST(
              MAX(CASE WHEN event_type = 'purchase' THEN ts_us END),
              MAX(CASE WHEN event_type = 'view' THEN ts_us END))
              - 7200000000 FROM e)
         ORDER BY p.event_id, v.view_event_id""",
    "events_stream_interval_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
             epoch_us(ts) AS ts_us FROM events),
         p AS (SELECT event_id, user_id, ts_us FROM e
               WHERE event_type = 'purchase'),
         v AS (SELECT event_id AS view_event_id, user_id,
               ts_us AS view_ts_us FROM e WHERE event_type = 'view')
         SELECT p.event_id, v.view_event_id, v.view_ts_us
         FROM p JOIN v ON p.user_id = v.user_id
           AND v.view_ts_us >= p.ts_us - 3600000000
           AND v.view_ts_us <= p.ts_us
         ORDER BY event_id, view_event_id""",
    "q_null_semantics" ->
      """SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           COUNT(o_orderkey) AS n_orders_nonnull,
           COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_null,
           COUNT(CASE WHEN o_orderstatus IS NOT DISTINCT FROM 'F' THEN 1 END)
             AS n_f_nullsafe,
           COUNT(NULLIF(o_orderpriority, '1-URGENT')) AS n_not_urgent,
           MIN(COALESCE(o_orderstatus, '~none~')) AS min_status
         FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_unpivot" ->
      """WITH m AS (
           SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val
           FROM lineitem
           UNION ALL
           SELECT l_returnflag, 'l_extendedprice', l_extendedprice
           FROM lineitem
           UNION ALL
           SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
         SELECT l_returnflag, measure,
           CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) AS total,
           COUNT(*) AS n
         FROM m GROUP BY l_returnflag, measure
         ORDER BY l_returnflag, measure""",
    "q_crossjoin" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",
    "q_grouping_flags" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_setop_all" ->
      """WITH a AS (SELECT l_partkey AS partkey FROM lineitem
                    WHERE l_quantity < 25),
              b AS (SELECT l_partkey AS partkey FROM lineitem
                    WHERE l_discount > 0.03),
              u AS (
           SELECT 'intersect_all' AS op, partkey FROM
             (SELECT partkey FROM a INTERSECT ALL SELECT partkey FROM b)
           UNION ALL
           SELECT 'except_all' AS op, partkey FROM
             (SELECT partkey FROM a EXCEPT ALL SELECT partkey FROM b))
         SELECT op, partkey, COUNT(*) AS n FROM u
         GROUP BY op, partkey ORDER BY op, partkey""",
    "q_lateral_topk" ->
      """SELECT p.o_orderpriority, t.o_orderkey, t.o_totalprice
         FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                  WHERE o.o_orderpriority = p.o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         ORDER BY p.o_orderpriority, t.o_orderkey""",
    "q_first_last" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END
             AS price_n
         FROM orders)
         SELECT o_custkey, o_orderkey,
           last_value(price_n IGNORE NULLS) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS price_filled,
           first_value(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS first_price
         FROM o ORDER BY o_custkey, o_orderkey""",
    "q_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 25000.0), 19.0) AS BIGINT)
             AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
         FROM orders GROUP BY bucket ORDER BY bucket""",
    "q_minmax_norm" ->
      """SELECT c_custkey, c_mktsegment,
           CASE WHEN mx = mn THEN 0.5
                ELSE round((c_acctbal - mn) / (mx - mn), 6) END AS acctbal_mm
         FROM (SELECT c_custkey, c_mktsegment, c_acctbal,
             min(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mn,
             max(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mx
           FROM customer)
         ORDER BY c_custkey""",
    "q_zscore" ->
      """WITH st AS (SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6)))
             AS DOUBLE) AS s2,
           CAST(COUNT(*) AS DOUBLE) AS cnt
         FROM lineitem GROUP BY l_returnflag)
         SELECT l_orderkey, l_linenumber, l.l_returnflag AS l_returnflag,
           round((l_quantity - s1/cnt)
             / sqrt(s2/cnt - (s1/cnt)*(s1/cnt)), 6) AS z,
           abs(round((l_quantity - s1/cnt)
             / sqrt(s2/cnt - (s1/cnt)*(s1/cnt)), 6)) > 2.0 AS is_outlier
         FROM lineitem l JOIN st ON l.l_returnflag = st.l_returnflag
         ORDER BY l_orderkey, l_linenumber""",
    "q_ngram_bigrams" ->
      """WITH ws AS (SELECT list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             w -> w <> '') AS ws
           FROM documents),
         bi AS (SELECT unnest(list_transform(range(1, len(ws)),
             i -> ws[i] || ' ' || ws[i+1])) AS bigram
           FROM ws WHERE len(ws) >= 2)
         SELECT bigram, COUNT(*) AS n FROM bi
         GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""",
    "q_bm25" ->
      """WITH w AS (SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-zA-Z0-9_]+'),
             x -> x <> '')) AS word
           FROM documents),
         tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w
                GROUP BY doc_id, word),
         df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
         dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf
                GROUP BY doc_id),
         nd AS (SELECT COUNT(*) AS n_docs FROM documents),
         ad AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
         sc AS (SELECT tf.doc_id, tf.word,
             round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * (1.2 + 1.0))
               / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS bm25
           FROM tf JOIN df USING (word) JOIN dl USING (doc_id), nd, ad),
         rk AS (SELECT doc_id, word, bm25,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY bm25 DESC, word) AS rk
           FROM sc)
         SELECT doc_id, rk, word, bm25 FROM rk WHERE rk <= 3
         ORDER BY doc_id, rk""",
    "q_pii_redact" ->
      """WITH t AS (SELECT doc_id,
           'contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-'
             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text
             AS t
         FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '\+[0-9][0-9-]{7,}')) AS BIGINT)
             AS n_phones,
           length(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+[0-9][0-9-]{7,}', '<PHONE>', 'g')) AS redacted_len
         FROM t ORDER BY doc_id""",
    "q_gapfill" ->
      """WITH e AS (SELECT event_type,
             epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us
           FROM events),
         c AS (SELECT event_type, hour_us, COUNT(*) AS n_raw FROM e
               GROUP BY event_type, hour_us),
         b AS (SELECT min(hour_us) AS lo, max(hour_us) AS hi FROM e),
         g AS (SELECT event_type,
             unnest(range(lo, hi + 1, 3600000000)) AS hour_us
           FROM (SELECT DISTINCT event_type FROM e), b)
         SELECT g.event_type AS event_type, g.hour_us AS hour_us,
           COALESCE(n_raw, 0) AS n
         FROM g LEFT JOIN c
           ON g.event_type = c.event_type AND g.hour_us = c.hour_us
         ORDER BY event_type, hour_us""",
    // batch DISTINCT truth for the doubled-and-deduped stream
    "events_stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT event_id) AS n FROM events
         GROUP BY event_type ORDER BY event_type""",
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
           FROM events),
         t1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
                WHERE event_type = 'signup' GROUP BY user_id),
         t2 AS (SELECT user_id, min(ts_us) AS t2 FROM e JOIN t1
                USING (user_id)
                WHERE event_type = 'view' AND ts_us > t1 GROUP BY user_id),
         t3 AS (SELECT user_id, min(ts_us) AS t3 FROM e JOIN t2
                USING (user_id)
                WHERE event_type = 'click' AND ts_us > t2 GROUP BY user_id),
         t4 AS (SELECT user_id, min(ts_us) AS t4 FROM e JOIN t3
                USING (user_id)
                WHERE event_type = 'purchase' AND ts_us > t3
                GROUP BY user_id)
         SELECT step, n_users FROM (
           SELECT '1_signup' AS step, COUNT(*) AS n_users FROM t1
           UNION ALL SELECT '2_view', COUNT(*) FROM t2
           UNION ALL SELECT '3_click', COUNT(*) FROM t3
           UNION ALL SELECT '4_purchase', COUNT(*) FROM t4)
         ORDER BY step""",
    "q_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
           FROM events),
         c AS (SELECT user_id, min(day) AS cohort_day FROM e
               GROUP BY user_id),
         a AS (SELECT DISTINCT user_id, day FROM e)
         SELECT cohort_day, day - cohort_day AS offset_days,
           COUNT(DISTINCT user_id) AS n_active
         FROM a JOIN c USING (user_id)
         GROUP BY cohort_day, offset_days
         ORDER BY cohort_day, offset_days""",
    "dedup_keep_best" ->
      """WITH q AS (SELECT doc_id,
           md5(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS norm_key,
           round((least(1.0, CAST(length(text) AS DOUBLE) / 500.0)
             + least(1.0, CAST(len(regexp_split_to_array(trim(text),
                 '[ \t\n]+')) AS DOUBLE) / 80.0)
             + CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST(length(regexp_replace(text, '[^a-zA-Z]', '',
                      'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) END)
             / 3.0, 6) AS quality
           FROM documents),
         r AS (SELECT doc_id, norm_key, quality,
             row_number() OVER (PARTITION BY norm_key
               ORDER BY quality DESC, doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY norm_key) AS n_dups
           FROM q)
         SELECT doc_id, norm_key, n_dups, quality FROM r WHERE rk = 1
         ORDER BY doc_id""",
    "q_not_in_null" ->
      """SELECT
           (SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
             AS n_no_null,
           (SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN
              (SELECT CASE WHEN o_orderkey % 2 = 0 THEN NULL
                           ELSE o_custkey END FROM orders))
             AS n_with_null""",
    "q_percentile_disc" ->
      """SELECT l_returnflag,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)
             AS med_qty_disc,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)
             AS p90_price_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // the same truth stated map-free: the Spark side's map build/probe/
    // explode round-trip must be lossless against it
    "q_map_funcs" ->
      """WITH per AS (SELECT o_custkey, o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS v
           FROM orders GROUP BY o_custkey, o_orderpriority),
         n AS (SELECT o_custkey, COUNT(*) AS n_prios FROM per
               GROUP BY o_custkey),
         u AS (SELECT o_custkey, v AS urgent_total FROM per
               WHERE o_orderpriority = '1-URGENT')
         SELECT per.o_custkey AS o_custkey, n.n_prios, u.urgent_total,
           per.o_orderpriority AS prio, per.v AS total
         FROM per JOIN n USING (o_custkey) LEFT JOIN u USING (o_custkey)
         ORDER BY o_custkey, prio""",
    // same gap-sessionization truth as events_sessions, reshaped to the
    // session_window contract (end = last event + gap)
    "q_session_window" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         f AS (
           SELECT *, CASE WHEN prev_us IS NULL
                          OR ts_us - prev_us > 1800 * 1000000
                          THEN 1 ELSE 0 END AS new_sess
           FROM e),
         g AS (
           SELECT *, CAST(SUM(new_sess) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS session_id
           FROM f)
         SELECT user_id, MIN(ts_us) AS start_us,
           MAX(ts_us) + 1800 * 1000000 AS end_us,
           COUNT(*) AS n_events
         FROM g GROUP BY user_id, session_id
         ORDER BY user_id, start_us""",
    "q_supplier_stats" ->
      """SELECT r_name, COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             AS total_acctbal,
           MIN(s_name) AS first_supplier
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q_props_json" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_recursive_cte" ->
      """WITH RECURSIVE anc(k, root, depth) AS (
           SELECT n_nationkey, n_nationkey, 0 FROM nation
           WHERE n_nationkey < 5
           UNION ALL
           SELECT n.n_nationkey, a.root, a.depth + 1
           FROM nation n JOIN anc a ON n.n_nationkey = a.k + 5)
         SELECT root, COUNT(*) AS chain_len,
           CAST(MAX(depth) AS INTEGER) AS max_depth
         FROM anc GROUP BY root ORDER BY root""",
    "q_filter_agg" ->
      """SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_quantity < 10) AS n_small,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
             FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS rev_discounted,
           MAX(l_quantity) FILTER (WHERE l_linestatus = 'F') AS max_qty_f
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "events_stream_static_join" ->
      """SELECT c_mktsegment, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY c_mktsegment, event_type
         ORDER BY c_mktsegment, event_type""",
    "q_contamination" ->
      """WITH toks AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             w -> w <> '') AS ws
           FROM documents),
         graw AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 6),
             i -> array_to_string(ws[i:i+7], ' '))) AS g
           FROM toks WHERE len(ws) >= 8),
         grams AS (SELECT DISTINCT doc_id, g FROM graw),
         bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 50),
         train AS (SELECT doc_id, g FROM grams WHERE doc_id >= 50),
         tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM train
                 GROUP BY doc_id),
         hit AS (SELECT t.doc_id, COUNT(*) AS n_shared
                 FROM train t JOIN bench b USING (g) GROUP BY t.doc_id)
         SELECT t.doc_id, h.n_shared, t.n_grams,
           ROUND(h.n_shared / t.n_grams, 6) AS ratio
         FROM tot t JOIN hit h ON t.doc_id = h.doc_id
         WHERE h.n_shared > 0
         ORDER BY t.doc_id""",
    "q_variant" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           COUNT(json_extract(props, '$.missing')) AS n_missing
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_seq_packing" ->
      """WITH d AS (SELECT doc_id, doc_id % 16 AS shard,
             (length(text) + 3) // 4 AS tok
           FROM documents),
         c AS (SELECT shard, doc_id, tok,
             CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM d)
         SELECT shard, CAST((cum - tok) // 2048 AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS toks
         FROM c GROUP BY shard, pack_id ORDER BY shard, pack_id""",
    "q_token_budget" ->
      """WITH d AS (SELECT doc_id, doc_id % 8 AS domain,
             (length(text) + 3) // 4 AS tok
           FROM documents),
         c AS (SELECT domain, doc_id, tok,
             CAST(SUM(tok) OVER (PARTITION BY domain ORDER BY tok, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM d)
         SELECT domain, COUNT(*) AS n_docs,
           CAST(MAX(cum) AS BIGINT) AS used_tokens,
           CAST(MAX(tok) AS BIGINT) AS max_doc_tokens
         FROM c WHERE cum <= 20000
         GROUP BY domain ORDER BY domain""",
    "q_union_by_name" ->
      """WITH u AS (
           SELECT event_id, event_type, props, NULL::DOUBLE AS value
           FROM events WHERE event_id % 2 = 0
           UNION ALL
           SELECT event_id, event_type, NULL AS props, value
           FROM events WHERE event_id % 2 = 1)
         SELECT event_type, COUNT(*) AS n,
           COUNT(props) AS n_props, COUNT(value) AS n_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM u GROUP BY event_type ORDER BY event_type""",
    "q_repetition" ->
      """WITH toks AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             w -> w <> '') AS ws
           FROM documents),
         g AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
             i -> array_to_string(ws[i:i+2], ' '))) AS g
           FROM toks WHERE len(ws) >= 3)
         SELECT doc_id, COUNT(*) AS n_tri, COUNT(DISTINCT g) AS n_uniq,
           ROUND(1.0 - COUNT(DISTINCT g) / COUNT(*), 6) AS rep_frac
         FROM g GROUP BY doc_id ORDER BY doc_id""",
    "q_perplexity" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             w -> w <> '')) AS w
           FROM documents),
         v AS (SELECT w, COUNT(*) AS cnt FROM toks GROUP BY w),
         pd AS (SELECT doc_id, COUNT(*) AS n_tok,
             SUM(CAST(round(ln(CAST(cnt AS DOUBLE)), 9)
               AS DECIMAL(28,9))) AS sum_lncnt
           FROM toks JOIN v USING (w) GROUP BY doc_id),
         t AS (SELECT CAST(SUM(n_tok) AS DOUBLE) AS total FROM pd)
         SELECT doc_id, n_tok,
           ROUND(ln(total) - CAST(sum_lncnt AS DOUBLE) / n_tok, 6)
             AS mean_nll
         FROM pd CROSS JOIN t ORDER BY doc_id""",
    "q_boilerplate" ->
      """WITH toks AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             w -> w <> '') AS ws
           FROM documents),
         g AS (SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(ws) - 1),
               i -> array_to_string(ws[i:i+2], ' '))) AS g
           FROM toks WHERE len(ws) >= 3),
         df AS (SELECT g, COUNT(*) AS df FROM g GROUP BY g)
         SELECT doc_id, COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN df >= 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_common,
           ROUND(SUM(CASE WHEN df >= 50 THEN 1 ELSE 0 END) / COUNT(*), 6)
             AS common_frac
         FROM g JOIN df USING (g)
         GROUP BY doc_id ORDER BY doc_id""",
    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_type, ts, epoch_us(ts) AS ts_us
           FROM events),
         m AS (SELECT user_id, event_type, ts, ts_us,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts)
               AS prev_type
           FROM e),
         s AS (SELECT user_id, event_type, ts, ts_us FROM m
           WHERE prev_type IS NULL OR prev_type <> event_type)
         SELECT user_id, event_type, ts_us AS valid_from_us,
           lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts)
             AS valid_to_us
         FROM s ORDER BY user_id, valid_from_us""",
    "q_attribution" ->
      """SELECT user_id,
           arg_min(event_type, ts) AS first_type,
           arg_max(event_type, ts) AS last_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             AS total_value
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_bool_bit_agg" ->
      """SELECT c_nationkey,
           bool_and(c_acctbal > 0) AS all_positive,
           bool_or(c_acctbal < 0) AS any_negative,
           CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_negative,
           CAST(bit_and(c_custkey) AS BIGINT) AS key_and,
           CAST(bit_or(c_custkey) AS BIGINT) AS key_or,
           CAST(bit_xor(c_custkey) AS BIGINT) AS key_xor
         FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q_order_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 20 OFFSET 100""",
    "q_posexplode" ->
      """WITH toks AS (SELECT doc_id, list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             w -> w <> '') AS ws
           FROM documents WHERE doc_id < 100),
         e AS (SELECT doc_id, unnest(list_transform(
             range(1, len(ws) + 1),
             i -> struct_pack(i := i, w := ws[i]))) AS u
           FROM toks)
         SELECT doc_id, COUNT(*) AS n_words,
           CAST(SUM(u.i * length(u.w)) AS BIGINT) AS checksum
         FROM e GROUP BY doc_id ORDER BY doc_id""",
    "fingerprint_stats" ->
      """WITH s AS (SELECT doc_id,
             regexp_replace(lower(text), '\s+', ' ', 'g') AS t
           FROM documents),
         g AS (SELECT doc_id, t, len(t) AS L, len(t) - 7 AS n FROM s),
         h AS (SELECT doc_id, L, n,
             CASE WHEN L < 8 THEN CAST([] AS BIGINT[])
             ELSE list_transform(range(1, n + 1), i ->
               list_reduce(
                 list_prepend(CAST(-3750763034362895579 AS BIGINT),
                   list_transform(range(0, 8), j -> unicode(t[i+j:i+j]))),
                 (acc, c) -> CAST(CASE WHEN (((CAST(xor(acc, c) AS HUGEINT)
                     * 1099511628211) % 18446744073709551616
                     + 18446744073709551616) % 18446744073709551616)
                     >= 9223372036854775808
                   THEN (((CAST(xor(acc, c) AS HUGEINT) * 1099511628211)
                     % 18446744073709551616 + 18446744073709551616)
                     % 18446744073709551616) - 18446744073709551616
                   ELSE (((CAST(xor(acc, c) AS HUGEINT) * 1099511628211)
                     % 18446744073709551616 + 18446744073709551616)
                     % 18446744073709551616)
                   END AS BIGINT)))
             END AS hashes
           FROM g)
         SELECT doc_id,
           CAST(CASE WHEN L = 0 THEN 0 WHEN L < 8 THEN 1
                WHEN n < 16 THEN 1
                ELSE len(list_distinct(list_transform(range(0, n // 16),
                  s -> list_min(hashes[s*16+1 : s*16+16]))))
           END AS INTEGER) AS n_fingerprint
         FROM h ORDER BY doc_id""",
    "q_knn_eval" ->
      """WITH p AS (SELECT vec_id AS probe_id, label AS own_label,
             CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id AS nbr_id, label AS nbr_label,
             CAST(embedding AS DOUBLE[]) AS nv
           FROM embeddings WHERE vec_id >= 20),
         sc AS (SELECT probe_id, own_label, nbr_id, nbr_label,
             round(list_dot_product(nv, qv) /
               (sqrt(list_dot_product(nv, nv)) *
                sqrt(list_dot_product(qv, qv))), 4) AS cos4
           FROM c CROSS JOIN p),
         r AS (SELECT *, row_number() OVER (
             PARTITION BY probe_id ORDER BY cos4 DESC, nbr_id) AS rnk
           FROM sc)
         SELECT probe_id, own_label,
           CAST(SUM(CASE WHEN nbr_label = own_label THEN 1 ELSE 0 END)
             AS BIGINT) AS n_same,
           arg_min(nbr_label, rnk) AS top1_label
         FROM r WHERE rnk <= 10
         GROUP BY probe_id, own_label ORDER BY probe_id""",
    "q_explode_outer" ->
      """WITH t AS (SELECT doc_id, list_filter(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9_]+'),
             w -> w <> ''), x -> x LIKE 'q%') AS qs
           FROM documents),
         e AS (SELECT doc_id, unnest(CASE WHEN qs IS NULL OR len(qs) = 0
             THEN [NULL]::VARCHAR[] ELSE qs END) AS w
           FROM t)
         SELECT doc_id, COUNT(*) AS n_rows, COUNT(w) AS n_words
         FROM e GROUP BY doc_id ORDER BY doc_id""",
    "q_try_funcs" ->
      """SELECT p_partkey,
           TRY_CAST(split_part(p_type, ' ', 1) AS INT) AS bad_cast,
           TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS good_cast,
           p_retailprice / NULLIF(p_size - p_size, 0) AS div_zero,
           ROUND(p_retailprice / NULLIF(p_size, 0), 6) AS div_ok,
           CAST(CASE WHEN p_partkey = 0 THEN 9223372036854775807
                ELSE NULL END AS BIGINT) AS overflow
         FROM part ORDER BY p_partkey""",
    "q_snapshot" ->
      """WITH e AS (SELECT user_id, event_type, ts, epoch_us(ts) AS ts_us
           FROM events),
         m AS (SELECT user_id, event_type, ts, ts_us,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts)
               AS prev_type
           FROM e),
         s AS (SELECT user_id, event_type, ts, ts_us FROM m
           WHERE prev_type IS NULL OR prev_type <> event_type),
         iv AS (SELECT user_id, event_type, ts_us AS valid_from_us,
             lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts)
               AS valid_to_us
           FROM s)
         SELECT event_type, COUNT(*) AS n_users
         FROM iv
         WHERE valid_from_us <= 1704240000000000
           AND (valid_to_us IS NULL OR valid_to_us > 1704240000000000)
         GROUP BY event_type ORDER BY event_type""",
    // md5("42:" || id)-uniform thresholding, the splitAssign replay:
    // same first-8-hex-digits -> 32-bit uniform as q_weighted_sample
    "q_split_assign" ->
      """WITH u AS (SELECT doc_id,
             md5('42:' || CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         v AS (SELECT doc_id, list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef', h[i:i]) - 1 AS BIGINT)),
             (a, d) -> a * 16 + d) AS hv
           FROM u),
         s AS (SELECT doc_id,
             round((CAST(hv AS DOUBLE) + 0.5) / 4294967296.0, 6) AS split_u
           FROM v)
         SELECT doc_id, split_u,
           CASE WHEN split_u < 0.9 THEN 'train'
                WHEN split_u < 0.95 THEN 'val'
                ELSE 'test' END AS split
         FROM s ORDER BY doc_id""",
    // dedup_clusters' closure composed with q_split_assign's md5 fold,
    // keyed on the COMPONENT — members of a component share a split
    "q_leakage_safe_split" ->
      """WITH RECURSIVE w AS (
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
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM t a JOIN t b ON a.doc_id < b.doc_id
           WHERE CAST(len(list_intersect(a.tg, b.tg)) AS DOUBLE) /
             (len(a.tg) + len(b.tg) - len(list_intersect(a.tg, b.tg))) >= 0.5),
         e AS (SELECT doc_a AS src, doc_b AS dst FROM p
               UNION ALL SELECT doc_b, doc_a FROM p),
         reach(id, r) AS (
           SELECT src, src FROM e
           UNION
           SELECT e.src, reach.r FROM e JOIN reach ON reach.id = e.dst),
         comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
         cc AS (SELECT d.doc_id,
             coalesce(c.component, d.doc_id) AS component
           FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         hh AS (SELECT doc_id, component,
             md5('42:' || CAST(component AS VARCHAR)) AS h
           FROM cc),
         hv AS (SELECT doc_id, component, list_reduce(list_transform(
             range(1, 9),
             i -> CAST(strpos('0123456789abcdef', h[i:i]) - 1 AS BIGINT)),
             (a, d) -> a * 16 + d) AS v
           FROM hh),
         s AS (SELECT doc_id, component,
             round((CAST(v AS DOUBLE) + 0.5) / 4294967296.0, 6) AS split_u
           FROM hv)
         SELECT doc_id, component,
           CASE WHEN split_u < 0.9 THEN 'train'
                WHEN split_u < 0.95 THEN 'val'
                ELSE 'test' END AS split
         FROM s ORDER BY doc_id""",
    "q_kmv_overlap" -> kmvOverlapOracleSql,
    "docs_stream_kmv" -> kmvDistinctOracleSql,
    "q_shingle_gen" -> shingleGenOracleSql,
    "q_source_repetition" -> sourceRepetitionOracleSql,
    // HHI: exact DECIMAL supplier revenue, 9dp squared-share terms
    // DECIMAL-summed (group order immaterial), final round at 6dp
    "q_hhi" ->
      """WITH rev AS (SELECT s_nationkey, l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(14,2))
               * (CAST(1.00 AS DECIMAL(4,2))
                 - CAST(l_discount AS DECIMAL(4,2)))) AS rv
           FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
           GROUP BY 1, 2),
         tot AS (SELECT s_nationkey, SUM(rv) AS tv,
             COUNT(*) AS n_suppliers
           FROM rev GROUP BY 1),
         terms AS (SELECT rev.s_nationkey, tot.n_suppliers,
             CAST(round(
               (CAST(rv AS DOUBLE) / CAST(tv AS DOUBLE))
               * (CAST(rv AS DOUBLE) / CAST(tv AS DOUBLE))
               * 10000.0, 9) AS DECIMAL(18,9)) AS term
           FROM rev JOIN tot USING (s_nationkey)),
         h AS (SELECT s_nationkey, MIN(n_suppliers) AS n_suppliers,
             round(CAST(SUM(term) AS DOUBLE), 6) AS hhi
           FROM terms GROUP BY 1)
         SELECT n_name, n_suppliers, hhi
         FROM h JOIN nation ON n_nationkey = s_nationkey
         ORDER BY n_name""",
    // Cohen's kappa: integer-sum mean thresholds, exact contingency
    // cells, single final-row divisions rounded at 6dp
    "q_cohen_kappa" ->
      """WITH d AS (SELECT n_chars,
             CAST(length(text) - length(replace(text, ' ', ''))
               AS BIGINT) AS n_spaces
           FROM documents),
         thr AS (SELECT
             CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS avg_chars,
             CAST(SUM(n_spaces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS avg_spaces
           FROM d),
         r AS (SELECT
             CAST(n_chars AS DOUBLE) >= avg_chars AS a_hi,
             CAST(n_spaces AS DOUBLE) >= avg_spaces AS b_hi
           FROM d CROSS JOIN thr),
         cells AS (SELECT COUNT(*) AS n,
             CAST(SUM(CASE WHEN a_hi AND b_hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n11,
             CAST(SUM(CASE WHEN NOT a_hi AND NOT b_hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n00,
             CAST(SUM(CASE WHEN a_hi AND NOT b_hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n10,
             CAST(SUM(CASE WHEN NOT a_hi AND b_hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n01
           FROM r)
         SELECT n, n11, n00, n10, n01,
           round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
           round((CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
               + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
           round((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                 + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             / (1.0
               - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
                 + CAST(n00 + n01 AS DOUBLE) * CAST(n00 + n10 AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
             AS kappa
         FROM cells""",
    // Count-Min: identical md5("j:key") bucket folds rebuild the same
    // 4x256 sketch; probes are the exact-heaviest 8 keys
    "q_countmin" ->
      """WITH li AS (SELECT l_partkey FROM lineitem),
         ex AS (SELECT l_partkey, COUNT(*) AS exact_cnt
           FROM li GROUP BY 1),
         tp AS (SELECT * FROM ex
           ORDER BY exact_cnt DESC, l_partkey LIMIT 8),
         js AS (SELECT UNNEST(range(0, 4)) AS j),
         hb AS (SELECT l_partkey, j,
             md5(CAST(j AS VARCHAR) || ':'
               || CAST(l_partkey AS VARCHAR)) AS h
           FROM li CROSS JOIN js),
         bk AS (SELECT l_partkey, j,
             list_reduce(list_transform(range(1, 9),
               i -> CAST(strpos('0123456789abcdef', h[i:i]) - 1
                 AS BIGINT)), (a, d) -> a * 16 + d) % 256 AS b
           FROM hb),
         cms AS (SELECT j, b, COUNT(*) AS cnt FROM bk GROUP BY 1, 2),
         ph AS (SELECT tp.l_partkey, tp.exact_cnt, j,
             md5(CAST(j AS VARCHAR) || ':'
               || CAST(tp.l_partkey AS VARCHAR)) AS h
           FROM tp CROSS JOIN js),
         pb AS (SELECT l_partkey, exact_cnt, j,
             list_reduce(list_transform(range(1, 9),
               i -> CAST(strpos('0123456789abcdef', h[i:i]) - 1
                 AS BIGINT)), (a, d) -> a * 16 + d) % 256 AS b
           FROM ph),
         est AS (SELECT l_partkey, exact_cnt, MIN(cnt) AS cms_est
           FROM pb JOIN cms USING (j, b) GROUP BY 1, 2)
         SELECT l_partkey, exact_cnt, cms_est,
           cms_est - exact_cnt AS overcount
         FROM est ORDER BY exact_cnt DESC, l_partkey""",
    // PSM ATT: md5-fold arm, backward-nearest control carried by one
    // IGNORE NULLS window per segment, exact DECIMAL outcome sums
    "q_psm_att" ->
      """WITH o AS (SELECT o_custkey AS c_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS outcome
           FROM orders GROUP BY 1),
         c AS (SELECT c_custkey, c_mktsegment, c_acctbal, outcome,
             (CAST(list_reduce(list_transform(range(1, 9),
               i -> CAST(strpos('0123456789abcdef',
                 (md5('17:' || CAST(c_custkey AS VARCHAR)))[i:i]) - 1
                 AS BIGINT)), (a, d) -> a * 16 + d) AS DOUBLE)
               + 0.5) / 4294967296.0 < 0.5 AS treated
           FROM customer JOIN o USING (c_custkey)),
         m AS (SELECT *,
             last_value(CASE WHEN NOT treated THEN outcome END
               IGNORE NULLS) OVER w AS matched,
             last_value(CASE WHEN NOT treated THEN c_acctbal END
               IGNORE NULLS) OVER w AS matched_bal
           FROM c
           WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal, CAST(treated AS INT), c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         agg AS (SELECT
             CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
               AS n_treated,
             CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END)
               AS BIGINT) AS n_control,
             CAST(SUM(CASE WHEN treated AND matched IS NOT NULL
               THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
             SUM(CASE WHEN treated AND matched IS NOT NULL
               THEN outcome - matched END) AS sdiff,
             SUM(CASE WHEN treated AND matched IS NOT NULL
               THEN c_acctbal - matched_bal END) AS sgap,
             SUM(CASE WHEN treated THEN outcome END) AS st,
             SUM(CASE WHEN NOT treated THEN outcome END) AS sc
           FROM m)
         SELECT n_treated, n_control, n_matched,
           round(CAST(sdiff AS DOUBLE) / CAST(n_matched AS DOUBLE), 6)
             AS att,
           round(CAST(sgap AS DOUBLE) / CAST(n_matched AS DOUBLE), 6)
             AS avg_bal_gap,
           round(CAST(st AS DOUBLE) / CAST(n_treated AS DOUBLE)
             - CAST(sc AS DOUBLE) / CAST(n_control AS DOUBLE), 6)
             AS naive_diff
         FROM agg""",
    // Dickey–Fuller: closed-form OLS of Δrev on lag(rev) from exact
    // DECIMAL moment sums; RSS via moments (Syy − β·Sxy), no residual
    // pass; (19,2) factor casts force DuckDB's hugeint product path
    "q_adf_test" -> {
      val sxxc =
        """(CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
             / CAST(n AS DOUBLE))"""
      val sxyc =
        """(CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
             / CAST(n AS DOUBLE))"""
      val syyc =
        """(CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
             / CAST(n AS DOUBLE))"""
      val beta = s"($sxyc / $sxxc)"
      val se =
        s"""sqrt(greatest(($syyc - $beta * $sxyc)
             / (CAST(n AS DOUBLE) - 2.0) / $sxxc, 0.0))"""
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         lagd AS (SELECT
             CAST(rev AS DECIMAL(19,2))
               - lag(CAST(rev AS DECIMAL(19,2)), 1)
                 OVER (ORDER BY day) AS y,
             lag(CAST(rev AS DECIMAL(19,2)), 1)
               OVER (ORDER BY day) AS x
           FROM daily),
         f AS (SELECT y, x FROM lagd WHERE x IS NOT NULL),
         m AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
           FROM f)
         SELECT n AS n_obs,
           round($beta, 9) + 0.0 AS beta,
           round($se, 9) + 0.0 AS se_beta,
           round($beta / $se, 6) + 0.0 AS adf_t
         FROM m"""
    },
    // Granger: restricted vs unrestricted OLS both closed-form from
    // one exact moment pass (2x2 normal equations)
    "q_granger" -> {
      def c(ab: String, a: String, b: String) =
        s"""(CAST(s$ab AS DOUBLE)
           - CAST(s$a AS DOUBLE) * CAST(s$b AS DOUBLE)
             / CAST(n AS DOUBLE))"""
      val cuu = c("uu", "u", "u"); val cvv = c("vv", "v", "v")
      val cuv = c("uv", "u", "v"); val cuy = c("uy", "u", "y")
      val cvy = c("vy", "v", "y"); val cyy = c("yy", "y", "y")
      val det = s"($cuu * $cvv - $cuv * $cuv)"
      val b1 = s"(($cvv * $cuy - $cuv * $cvy) / $det)"
      val b2 = s"(($cuu * $cvy - $cuv * $cuy) / $det)"
      val rssU = s"($cyy - $b1 * $cuy - $b2 * $cvy)"
      val rssR = s"($cyy - $cuy * $cuy / $cuu)"
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev,
             CAST(COUNT(*) AS DECIMAL(18,2)) AS cnt
           FROM orders GROUP BY 1),
         lagd AS (SELECT CAST(rev AS DECIMAL(19,2)) AS y,
             lag(CAST(rev AS DECIMAL(19,2)), 1)
               OVER (ORDER BY day) AS u,
             lag(CAST(cnt AS DECIMAL(19,2)), 1)
               OVER (ORDER BY day) AS v
           FROM daily),
         f AS (SELECT y, u, v FROM lagd WHERE u IS NOT NULL),
         m AS (SELECT COUNT(*) AS n, SUM(y) AS sy, SUM(u) AS su,
             SUM(v) AS sv, SUM(u * y) AS suy, SUM(v * y) AS svy,
             SUM(u * u) AS suu, SUM(v * v) AS svv, SUM(u * v) AS suv,
             SUM(y * y) AS syy
           FROM f)
         SELECT n AS n_obs,
           round($b1, 9) + 0.0 AS b_lag_rev,
           round($b2, 9) + 0.0 AS b_lag_cnt,
           round(1.0 - $rssR / $cyy, 6) + 0.0 AS r2_r,
           round(1.0 - $rssU / $cyy, 6) + 0.0 AS r2_u,
           round(($rssR - $rssU)
             / ($rssU / (CAST(n AS DOUBLE) - 3.0)), 6) + 0.0 AS f_stat
         FROM m"""
    },
    // Ljung–Box: 6-dp demeaned series, lag-k autocovariances as exact
    // DECIMAL sums over a rank-offset self-join, rho rounded before
    // squaring, cumulative Q over the 7 lag rows
    "q_ljung_box" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         mom AS (SELECT COUNT(*) AS n, SUM(rev) AS sm FROM daily),
         d AS (SELECT n, row_number() OVER (ORDER BY day) AS rn,
             CAST(round(CAST(rev AS DOUBLE)
               - CAST(sm AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0
               AS DECIMAL(18,6)) AS dd
           FROM daily CROSS JOIN mom),
         den AS (SELECT MAX(n) AS n_days,
             SUM(CAST(dd AS DECIMAL(19,6))
               * CAST(dd AS DECIMAL(19,6))) AS den
           FROM d),
         lags AS (SELECT CAST(range AS BIGINT) AS lag_k
           FROM range(1, 8)),
         pairs AS (SELECT lag_k,
             SUM(CAST(d1.dd AS DECIMAL(19,6))
               * CAST(d2.dd AS DECIMAL(19,6))) AS num
           FROM d d1 CROSS JOIN lags
           JOIN d d2 ON d2.rn = d1.rn - lag_k
           GROUP BY 1),
         rho AS (SELECT lag_k, n_days,
             round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) + 0.0
               AS rho
           FROM pairs CROSS JOIN den)
         SELECT lag_k, rho,
           round(SUM(CAST(n_days AS DOUBLE)
               * (CAST(n_days AS DOUBLE) + 2.0) * rho * rho
               / (CAST(n_days AS DOUBLE) - CAST(lag_k AS DOUBLE)))
             OVER (ORDER BY lag_k
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS q_cum
         FROM rho ORDER BY lag_k""",
    // Hurst R/S: full blocks of 8/16/32/64 days, block-local cumsum
    // range over population sigma (exact DECIMAL block sums), log2
    // rounded at 9 dp then DECIMAL slope over integer k
    "q_hurst" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev
           FROM orders GROUP BY 1),
         rn AS (SELECT row_number() OVER (ORDER BY day) AS rn, rev
           FROM daily),
         sizes AS (SELECT CAST(range AS INT) AS k,
             CAST(power(2, range) AS BIGINT) AS m
           FROM range(3, 7)),
         blk AS (SELECT k, m, rn.rn AS rn, rev,
             CAST(floor((rn.rn - 1) / m) AS BIGINT) AS b
           FROM rn CROSS JOIN sizes),
         bm AS (SELECT k, m, b, COUNT(*) AS cnt,
             SUM(CAST(rev AS DECIMAL(19,2))) AS bs,
             SUM(CAST(rev AS DECIMAL(19,2))
               * CAST(rev AS DECIMAL(19,2))) AS bs2
           FROM blk GROUP BY 1, 2, 3),
         bmf AS (SELECT * FROM bm WHERE cnt = m),
         dev AS (SELECT blk.k AS k, blk.b AS b, blk.rn AS rn,
             CAST(round(CAST(rev AS DOUBLE)
               - CAST(bs AS DOUBLE) / CAST(blk.m AS DOUBLE), 6) + 0.0
               AS DECIMAL(18,6)) AS e
           FROM blk JOIN bmf ON blk.k = bmf.k AND blk.b = bmf.b),
         cum AS (SELECT k, b,
             SUM(e) OVER (PARTITION BY k, b ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
           FROM dev),
         rng AS (SELECT k, b, MAX(cum) - MIN(cum) AS r
           FROM cum GROUP BY 1, 2),
         rs AS (SELECT rng.k AS k, bmf.m AS m,
             CAST(round(CAST(r AS DOUBLE) / sqrt(greatest(
               CAST(bs2 AS DOUBLE) / CAST(bmf.m AS DOUBLE)
               - (CAST(bs AS DOUBLE) / CAST(bmf.m AS DOUBLE))
                 * (CAST(bs AS DOUBLE) / CAST(bmf.m AS DOUBLE)),
               1e-12)), 6) + 0.0 AS DECIMAL(18,6)) AS rs
           FROM rng JOIN bmf ON rng.k = bmf.k AND rng.b = bmf.b),
         rsm AS (SELECT k, m, COUNT(*) AS n_blocks,
             round(CAST(SUM(rs) AS DOUBLE) / COUNT(*), 6) + 0.0
               AS rs_mean
           FROM rs GROUP BY 1, 2),
         rsl AS (SELECT *,
             CAST(round(log2(rs_mean), 9) + 0.0 AS DECIMAL(18,9)) AS lg
           FROM rsm),
         slope AS (SELECT COUNT(*) AS np, SUM(k) AS sk, SUM(lg) AS sl,
             SUM(k * lg) AS skl, SUM(k * k) AS skk
           FROM rsl)
         SELECT m, n_blocks, rs_mean,
           round((CAST(np AS DOUBLE) * CAST(skl AS DOUBLE)
               - CAST(sk AS DOUBLE) * CAST(sl AS DOUBLE))
             / (CAST(np AS DOUBLE) * CAST(skk AS DOUBLE)
               - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)), 6) + 0.0
             AS hurst
         FROM rsl CROSS JOIN slope ORDER BY m""",
    // Bloom filter rebuilt bit-for-bit from the md5 folds; no-false-
    // negative + measured-FPR readout
    "q_bloom_join" -> {
      val fold = (e: String) =>
        s"""list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef', ($e)[i:i]) - 1
               AS BIGINT)), (a, d) -> a * 16 + d)"""
      val bit = fold("md5(CAST(j AS VARCHAR) || ':' " +
        "|| CAST(c_custkey AS VARCHAR))") + " % 4096"
      s"""WITH cust AS (SELECT c_custkey,
             c_mktsegment = 'BUILDING' AS mem
           FROM customer),
         js AS (SELECT CAST(range AS INT) AS j FROM range(0, 4)),
         bits AS (SELECT DISTINCT $bit AS bit
           FROM cust CROSS JOIN js WHERE mem),
         pb AS (SELECT c_custkey, mem, $bit AS bit
           FROM cust CROSS JOIN js),
         pj AS (SELECT c_custkey, mem,
             SUM(CASE WHEN bits.bit IS NOT NULL THEN 1 ELSE 0 END)
               AS hits
           FROM pb LEFT JOIN bits ON pb.bit = bits.bit
           GROUP BY 1, 2),
         ag AS (SELECT
             CAST(SUM(CASE WHEN mem THEN 1 ELSE 0 END) AS BIGINT)
               AS n_build,
             COUNT(*) AS n_probe,
             CAST(SUM(CASE WHEN hits = 4 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass,
             CAST(SUM(CASE WHEN hits = 4 AND NOT mem THEN 1 ELSE 0 END)
               AS BIGINT) AS n_fp,
             CAST(SUM(CASE WHEN hits < 4 AND mem THEN 1 ELSE 0 END)
               AS BIGINT) AS n_fn
           FROM pj)
         SELECT n_build, n_probe, n_pass, n_fp, n_fn,
           round(CAST(n_fp AS DOUBLE)
             / CAST(n_probe - n_build AS DOUBLE), 6) AS fpr
         FROM ag"""
    },
    // AMS: identical 16 md5-parity sign streams, median of 4 means as
    // (s4_(2) + s4_(3)) / 8 in pure integers
    "q_ams_f2" -> {
      val fold = (e: String) =>
        s"""list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef', ($e)[i:i]) - 1
               AS BIGINT)), (a, d) -> a * 16 + d)"""
      val sign = "CASE WHEN " + fold("md5(CAST(e AS VARCHAR) || ':' " +
        "|| CAST(l_partkey AS VARCHAR))") +
        " % 2 = 0 THEN 1 ELSE -1 END"
      s"""WITH freq AS (SELECT l_partkey, COUNT(*) AS cnt
           FROM lineitem GROUP BY 1),
         exact AS (SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS exact_f2
           FROM freq),
         es AS (SELECT CAST(range AS INT) AS e FROM range(0, 16)),
         sg AS (SELECT e, ($sign) * cnt AS term
           FROM freq CROSS JOIN es),
         z AS (SELECT e, CAST(SUM(term) AS BIGINT) AS zz
           FROM sg GROUP BY 1),
         grp AS (SELECT e // 4 AS g, CAST(SUM(zz * zz) AS BIGINT) AS s4
           FROM z GROUP BY 1),
         rk AS (SELECT s4, row_number() OVER (ORDER BY s4, g) AS rk
           FROM grp),
         med AS (SELECT CAST(SUM(s4) AS DOUBLE) / 8.0 AS ams_est
           FROM rk WHERE rk IN (2, 3))
         SELECT exact_f2, round(ams_est, 2) AS ams_est,
           round((ams_est - CAST(exact_f2 AS DOUBLE))
             / CAST(exact_f2 AS DOUBLE), 6) AS rel_err
         FROM med CROSS JOIN exact"""
    },
    // BH step-up on the same 6-dp z / A&S 26.2.17 tail / 9-dp p
    "q_bh_fdr" -> {
      val tail =
        """(exp(-abs(z) * abs(z) / 2.0) / 2.5066282746310002
           * ((1.0 / (1.0 + 0.2316419 * abs(z)))
             * (0.319381530 + (1.0 / (1.0 + 0.2316419 * abs(z)))
               * (-0.356563782 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                 * (1.781477937 + (1.0 / (1.0 + 0.2316419 * abs(z)))
                   * (-1.821255978
                     + (1.0 / (1.0 + 0.2316419 * abs(z)))
                       * 1.330274429))))))"""
      s"""WITH o AS (SELECT o_orderstatus, c_nationkey
           FROM orders JOIN customer ON o_custkey = c_custkey),
         gl AS (SELECT COUNT(*) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS f
           FROM o),
         per AS (SELECT c_nationkey, COUNT(*) AS ni,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS fi
           FROM o GROUP BY 1),
         pz AS (SELECT c_nationkey, ni,
             round((CAST(fi AS DOUBLE) / CAST(ni AS DOUBLE)
                 - CAST(f AS DOUBLE) / CAST(n AS DOUBLE))
               / sqrt((CAST(f AS DOUBLE) / CAST(n AS DOUBLE))
                 * (1.0 - CAST(f AS DOUBLE) / CAST(n AS DOUBLE))
                 / CAST(ni AS DOUBLE)), 6) + 0.0 AS z
           FROM per CROSS JOIN gl),
         pp AS (SELECT c_nationkey, ni, z,
             round(least($tail * 2.0, 1.0), 9) + 0.0 AS p
           FROM pz),
         ranked AS (SELECT n_name, ni, z, p,
             row_number() OVER (ORDER BY p, n_name) AS rk,
             COUNT(*) OVER () AS m
           FROM pp JOIN nation ON c_nationkey = n_nationkey),
         sat AS (SELECT *,
             p <= CAST(rk AS DOUBLE) * 0.05 / CAST(m AS DOUBLE) AS sat
           FROM ranked),
         km AS (SELECT *,
             MAX(CASE WHEN sat THEN rk ELSE 0 END) OVER () AS kmax
           FROM sat)
         SELECT n_name, ni AS n_orders, z, p,
           CAST(rk AS BIGINT) AS p_rank, rk <= kmax AS rejected
         FROM km ORDER BY p_rank"""
    },
    // power/MDE: exact conditional moments, literal z constants
    "q_power_mde" -> {
      val fold =
        """list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef',
               (md5('23:' || CAST(o_custkey AS VARCHAR)))[i:i]) - 1
               AS BIGINT)), (a, d) -> a * 16 + d)"""
      s"""WITH spend AS (SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
           FROM orders GROUP BY 1),
         arm AS (SELECT CAST(y AS DECIMAL(19,2)) AS y,
             $fold % 2 AS arm
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
             0.0)) AS sd_pooled
           FROM m),
         c2 AS (SELECT *, (1.959964 + 0.841621) * sd_pooled
             * sqrt(1.0 / CAST(n_a AS DOUBLE)
               + 1.0 / CAST(n_b AS DOUBLE)) AS mde_abs
           FROM c)
         SELECT n_a, n_b, round(sd_pooled, 6) AS sd_pooled,
           round(mde_abs, 6) AS mde_abs,
           round(mde_abs / (CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE))
             * 100.0, 6) AS mde_pct
         FROM c2"""
    },
    // Kruskal–Wallis: midranks from the 50-value quantity domain,
    // fixed-order 3-group Σ R²/n, BIGINT tie correction
    "q_kruskal_wallis" -> {
      val h =
        """(12.0 / (CAST(n_total AS DOUBLE)
             * (CAST(n_total AS DOUBLE) + 1.0)) * rr
           - 3.0 * (CAST(n_total AS DOUBLE) + 1.0))"""
      s"""WITH li AS (SELECT CAST(l_quantity AS INT) AS qty,
             l_returnflag
           FROM lineitem),
         dom AS (SELECT qty, COUNT(*) AS t FROM li GROUP BY 1),
         cum AS (SELECT qty, t,
             COALESCE(SUM(t) OVER (ORDER BY qty
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb
           FROM dom),
         mr AS (SELECT qty,
             CAST(CAST(cb AS DOUBLE) + (CAST(t AS DOUBLE) + 1.0) / 2.0
               AS DECIMAL(12,1)) AS mr
           FROM cum),
         ties AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tsum
           FROM dom),
         ranks AS (SELECT
             CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
               AS BIGINT) AS na,
             SUM(CASE WHEN l_returnflag = 'A' THEN mr END) AS ra,
             CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
               AS BIGINT) AS nn,
             SUM(CASE WHEN l_returnflag = 'N' THEN mr END) AS rn,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS nr,
             SUM(CASE WHEN l_returnflag = 'R' THEN mr END) AS rr
           FROM li JOIN mr USING (qty)),
         f AS (SELECT 3 AS n_groups, n AS n_total,
             (CAST(ra AS DOUBLE) * CAST(ra AS DOUBLE)
                 / CAST(na AS DOUBLE)
               + CAST(rn AS DOUBLE) * CAST(rn AS DOUBLE)
                 / CAST(nn AS DOUBLE)
               + CAST(rr AS DOUBLE) * CAST(rr AS DOUBLE)
                 / CAST(nr AS DOUBLE)) AS rr,
             tsum AS ts
           FROM ranks CROSS JOIN ties)
         SELECT CAST(n_groups AS BIGINT) AS n_groups, n_total,
           round($h, 6) AS h,
           round($h / (1.0 - CAST(ts AS DOUBLE)
             / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)
               * CAST(n_total AS DOUBLE) - CAST(n_total AS DOUBLE))),
             6) AS h_tied
         FROM f"""
    },
    // McNemar: discordant cells of the kappa rater pair, continuity
    // corrected
    "q_mcnemar" ->
      """WITH d AS (SELECT n_chars,
             CAST(length(text)
               - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
           FROM documents),
         thr AS (SELECT CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)
               AS avg_chars,
             CAST(SUM(n_spaces) AS DOUBLE) / COUNT(*) AS avg_spaces
           FROM d),
         c AS (SELECT
             CAST(n_chars AS DOUBLE) >= avg_chars AS a_hi,
             CAST(n_spaces AS DOUBLE) >= avg_spaces AS b_hi
           FROM d CROSS JOIN thr),
         ag AS (SELECT COUNT(*) AS n,
             CAST(SUM(CASE WHEN a_hi AND NOT b_hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n10,
             CAST(SUM(CASE WHEN NOT a_hi AND b_hi THEN 1 ELSE 0 END)
               AS BIGINT) AS n01
           FROM c)
         SELECT n, n10, n01,
           round((abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0)
             * (abs(CAST(n10 AS DOUBLE) - CAST(n01 AS DOUBLE)) - 1.0)
             / (CAST(n10 AS DOUBLE) + CAST(n01 AS DOUBLE)), 6)
             AS mcnemar
         FROM ag""",
    // Kendall tau-b: integer concordance counts over the month grid
    "q_kendall_tau" ->
      """WITH m AS (SELECT date_trunc('month', o_orderdate) AS mon,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x,
             COUNT(*) AS y
           FROM orders GROUP BY 1),
         pairs AS (SELECT
             CAST(sign(a.x - b.x) AS INT) AS sx,
             CAST(sign(a.y - b.y) AS INT) AS sy
           FROM m a JOIN m b ON a.mon < b.mon),
         ag AS (SELECT COUNT(*) AS n0,
             CAST(SUM(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS nd,
             CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS tx,
             CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS ty
           FROM pairs)
         SELECT n0 AS n_pairs, nc, nd,
           round((CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE))
             / sqrt((CAST(n0 AS DOUBLE) - CAST(tx AS DOUBLE))
               * (CAST(n0 AS DOUBLE) - CAST(ty AS DOUBLE))), 6)
             AS tau_b
         FROM ag""",
    // Theil T + between/within decomposition, round-ln-at-9 contract
    "q_theil_index" -> {
      val mu = "(CAST(st AS DOUBLE) / CAST(n AS DOUBLE))"
      val muj = "(CAST(sj AS DOUBLE) / CAST(nj AS DOUBLE))"
      s"""WITH spend AS (SELECT o_custkey AS c_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
           FROM orders GROUP BY 1),
         sp AS (SELECT x, c_nationkey
           FROM spend JOIN customer USING (c_custkey)),
         nat AS (SELECT c_nationkey, COUNT(*) AS nj, SUM(x) AS sj
           FROM sp GROUP BY 1),
         tot AS (SELECT CAST(SUM(nj) AS BIGINT) AS n, SUM(sj) AS st
           FROM nat),
         terms AS (SELECT c_nationkey, nj, sj, n, st,
             CAST(round(CAST(x AS DOUBLE) / $mu
               * ln(CAST(x AS DOUBLE) / $mu), 9) + 0.0
               AS DECIMAL(18,9)) AS tg,
             CAST(round(CAST(x AS DOUBLE) / $muj
               * ln(CAST(x AS DOUBLE) / $muj), 9) + 0.0
               AS DECIMAL(18,9)) AS tw
           FROM sp JOIN nat USING (c_nationkey) CROSS JOIN tot),
         within AS (SELECT c_nationkey, MAX(nj) AS nj, MAX(sj) AS sj,
             MAX(n) AS n, MAX(st) AS st,
             SUM(tg) AS stg, SUM(tw) AS stw
           FROM terms GROUP BY 1),
         ag AS (SELECT MAX(n) AS n_customers, SUM(stg) AS g,
             SUM(CAST(round(CAST(sj AS DOUBLE) / CAST(st AS DOUBLE)
               * CAST(stw AS DOUBLE) / CAST(nj AS DOUBLE), 9) + 0.0
               AS DECIMAL(18,9))) AS w,
             SUM(CAST(round(CAST(nj AS DOUBLE) / CAST(n AS DOUBLE)
               * $muj / $mu * ln($muj / $mu), 9) + 0.0
               AS DECIMAL(18,9))) AS b,
             MAX(n) AS nn
           FROM within)
         SELECT n_customers,
           round(CAST(g AS DOUBLE) / CAST(nn AS DOUBLE), 6)
             AS theil_total,
           round(CAST(b AS DOUBLE), 6) AS theil_between,
           round(CAST(w AS DOUBLE), 6) AS theil_within
         FROM ag"""
    },
    // pairwise JSD over shared vocab, round-ln-at-12 contract
    "q_jsd" ->
      """WITH words AS (SELECT lang, u.w AS w FROM documents,
             unnest(list_filter(regexp_split_to_array(lower(text),
               '[^a-z0-9_]+'), x -> x <> '')) u(w)),
         cw AS (SELECT w, COUNT(*) AS c FROM words GROUP BY 1),
         cl AS (SELECT lang, w, COUNT(*) AS clw FROM words
           GROUP BY 1, 2),
         nl AS (SELECT lang, COUNT(*) AS ntok FROM words GROUP BY 1),
         tot AS (SELECT COUNT(*) AS v FROM cw),
         pairs AS (SELECT a.lang AS lang_a, a.ntok AS na,
             b.lang AS lang_b, b.ntok AS nb
           FROM nl a JOIN nl b ON a.lang < b.lang),
         grid AS (SELECT lang_a, lang_b,
             CAST(coalesce(ca.clw, 0) + 1 AS DOUBLE)
               / CAST(na + v AS DOUBLE) AS p,
             CAST(coalesce(cb.clw, 0) + 1 AS DOUBLE)
               / CAST(nb + v AS DOUBLE) AS q
           FROM cw CROSS JOIN pairs CROSS JOIN tot
             LEFT JOIN cl ca ON ca.lang = pairs.lang_a
               AND ca.w = cw.w
             LEFT JOIN cl cb ON cb.lang = pairs.lang_b
               AND cb.w = cw.w),
         terms AS (SELECT lang_a, lang_b,
             CAST(round(0.5 * p * ln(2.0 * p / (p + q))
               + 0.5 * q * ln(2.0 * q / (p + q)), 12)
               AS DECIMAL(28,12)) AS term
           FROM grid),
         ag AS (SELECT lang_a, lang_b,
             round(CAST(SUM(term) AS DOUBLE), 6) AS jsd
           FROM terms GROUP BY 1, 2)
         SELECT lang_a, lang_b, jsd,
           round(jsd / 0.6931471805599453, 6) AS jsd_norm
         FROM ag ORDER BY lang_a, lang_b""",
    // Burrows' delta on the 30-word / 20-source grid, frequencies
    // quantized to 1e-9 so the panel moments are integer-exact
    "q_burrows_delta" ->
      """WITH words AS (SELECT source, u.w AS w FROM documents,
             unnest(list_filter(regexp_split_to_array(lower(text),
               '[^a-z0-9_]+'), x -> x <> '')) u(w)),
         top AS (SELECT w, COUNT(*) AS c FROM words GROUP BY 1
           ORDER BY c DESC, w LIMIT 30),
         ns AS (SELECT source, COUNT(*) AS ntok FROM words GROUP BY 1),
         fr AS (SELECT source, w,
             CAST(COUNT(*) AS DOUBLE) / CAST(MIN(ntok) AS DOUBLE) AS f
           FROM words JOIN top USING (w) JOIN ns USING (source)
           GROUP BY source, w, ntok),
         grid AS (SELECT top.w AS w, ns.source AS source,
             coalesce(fr.f, 0.0) AS f
           FROM top CROSS JOIN ns
             LEFT JOIN fr ON fr.w = top.w AND fr.source = ns.source),
         wstat AS (SELECT w, COUNT(*) AS k,
             CAST(SUM(CAST(round(f * 1e9, 0) AS DECIMAL(18,0)))
               AS DECIMAL(38,0)) AS sf,
             CAST(SUM(CAST(round(f * 1e9, 0) AS DECIMAL(18,0))
               * CAST(round(f * 1e9, 0) AS DECIMAL(18,0)))
               AS DECIMAL(38,0)) AS sf2
           FROM grid GROUP BY 1),
         z AS (SELECT source, grid.w AS w,
             round((round(f * 1e9, 0)
               - CAST(sf AS DOUBLE) / CAST(k AS DOUBLE))
               / sqrt(greatest(CAST(sf2 AS DOUBLE) / CAST(k AS DOUBLE)
                 - (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE))
                   * (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE)), 1e-6)),
               6) + 0.0 AS z
           FROM grid JOIN wstat ON grid.w = wstat.w),
         d AS (SELECT a.source AS src_a, b.source AS src_b,
             CAST(round(abs(a.z - b.z), 6) AS DECIMAL(18,6)) AS d
           FROM z a JOIN z b ON a.w = b.w AND a.source < b.source)
         SELECT src_a, src_b,
           round(CAST(SUM(d) AS DOUBLE) / COUNT(*), 6) AS delta
         FROM d GROUP BY 1, 2
         ORDER BY delta, src_a, src_b LIMIT 15""",
    // CCF at lags -7..7, exact DECIMAL cross-products, full-series
    // normalization
    "q_xcorr" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev,
             COUNT(*) AS cnt
           FROM orders GROUP BY 1),
         mom AS (SELECT COUNT(*) AS n, SUM(rev) AS sx,
             CAST(SUM(cnt) AS BIGINT) AS sy
           FROM daily),
         d AS (SELECT row_number() OVER (ORDER BY day) AS rn,
             CAST(round(CAST(rev AS DOUBLE)
               - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0
               AS DECIMAL(18,6)) AS dx,
             CAST(round(CAST(cnt AS DOUBLE)
               - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0
               AS DECIMAL(18,6)) AS dy
           FROM daily CROSS JOIN mom),
         den AS (SELECT SUM(CAST(dx AS DECIMAL(19,6))
               * CAST(dx AS DECIMAL(19,6))) AS dxx,
             SUM(CAST(dy AS DECIMAL(19,6))
               * CAST(dy AS DECIMAL(19,6))) AS dyy
           FROM d),
         lags AS (SELECT CAST(range AS BIGINT) AS lag_k
           FROM range(-7, 8)),
         num AS (SELECT lag_k, COUNT(*) AS n_pairs,
             SUM(CAST(d1.dx AS DECIMAL(19,6))
               * CAST(d2.dy AS DECIMAL(19,6))) AS num
           FROM d d1 CROSS JOIN lags
           JOIN d d2 ON d2.rn = d1.rn + lag_k
           GROUP BY 1)
         SELECT lag_k, n_pairs,
           round(CAST(num AS DOUBLE)
             / sqrt(CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE)), 6)
             AS r
         FROM num CROSS JOIN den ORDER BY lag_k""",
    // isotonic fit via the Barlow minimax: prefix-sum interval means,
    // suffix-min window, keyed max
    "q_isotonic" ->
      """WITH m0 AS (SELECT CAST(date_trunc('month', o_orderdate)
               AS DATE) AS mon,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp,
             COUNT(*) AS cnt
           FROM orders GROUP BY 1),
         m AS (SELECT mon,
             CAST(round(CAST(sp AS DOUBLE) / CAST(cnt AS DOUBLE), 6)
               + 0.0 AS DECIMAL(18,6)) AS y,
             row_number() OVER (ORDER BY mon) AS i
           FROM m0),
         pre AS (SELECT mon, y, i,
             SUM(y) OVER (ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
           FROM m),
         a AS (SELECT s.i AS si, t.i AS ti,
             CAST(round(CAST(t.pp - (s.pp - s.y) AS DOUBLE)
               / CAST(t.i - s.i + 1 AS DOUBLE), 6) + 0.0
               AS DECIMAL(18,6)) AS avg_st
           FROM pre s JOIN pre t ON t.i >= s.i),
         inner_min AS (SELECT si, ti,
             MIN(avg_st) OVER (PARTITION BY si ORDER BY ti
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS msuf
           FROM a),
         fit AS (SELECT ti AS i, MAX(msuf) AS fit0
           FROM inner_min GROUP BY 1)
         SELECT mon, CAST(y AS DOUBLE) AS y,
           CAST(fit0 AS DOUBLE) AS fit
         FROM m JOIN fit USING (i) ORDER BY mon""",
    // 256-bucket sketch readout vs percentile_disc truth
    "q_quantile_sketch" ->
      """WITH o AS (SELECT o_totalprice AS x FROM orders),
         mm AS (SELECT MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS n
           FROM o),
         hist AS (SELECT LEAST(CAST(floor((x - mn) / (mx - mn)
               * 256.0) AS INT), 255) AS bucket, COUNT(*) AS cnt
           FROM o CROSS JOIN mm GROUP BY 1),
         hc AS (SELECT bucket, cnt,
             COALESCE(SUM(cnt) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb
           FROM hist),
         qs AS (SELECT unnest([CAST(0.5 AS DOUBLE),
             CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q),
         tj AS (SELECT q, q * CAST(n AS DOUBLE) AS target,
             bucket, cnt, cb, mn, mx
           FROM qs CROSS JOIN mm
           JOIN hc ON CAST(cb AS DOUBLE) + CAST(cnt AS DOUBLE)
             >= q * CAST(n AS DOUBLE)),
         est AS (SELECT q, mn + (CAST(bucket AS DOUBLE)
               + (target - CAST(cb AS DOUBLE)) / CAST(cnt AS DOUBLE))
               * (mx - mn) / 256.0 AS est,
             row_number() OVER (PARTITION BY q ORDER BY bucket) AS rn
           FROM tj),
         e1 AS (SELECT q, est FROM est WHERE rn = 1),
         ex AS (SELECT
             percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS e50,
             percentile_disc(0.9) WITHIN GROUP (ORDER BY x) AS e90,
             percentile_disc(0.99) WITHIN GROUP (ORDER BY x) AS e99
           FROM o),
         e2 AS (SELECT q,
             CASE WHEN q = 0.5 THEN e50 WHEN q = 0.9 THEN e90
               ELSE e99 END AS exact, est
           FROM e1 CROSS JOIN ex)
         SELECT q, exact, round(est, 4) AS est,
           round(abs(est - exact) / exact, 6) AS rel_err
         FROM e2 ORDER BY q""",
    // log-rank: integer at-risk suffix counts, 9-dp O-E and V terms
    "q_log_rank" -> {
      val fold =
        """list_reduce(list_transform(range(1, 9),
             i -> CAST(strpos('0123456789abcdef',
               (md5('29:' || CAST(o_custkey AS VARCHAR)))[i:i]) - 1
               AS BIGINT)), (a, d) -> a * 16 + d)"""
      s"""WITH first AS (SELECT o_custkey,
             MIN(CAST(o_orderdate AS DATE)) AS fd,
             $fold % 2 AS arm
           FROM orders GROUP BY o_custkey),
         lo AS (SELECT MIN(fd) AS d0 FROM first),
         ev AS (SELECT CAST(datediff('day', d0, fd) AS BIGINT) AS t,
             CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS d1,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS d2
           FROM first CROSS JOIN lo GROUP BY 1),
         tot AS (SELECT CAST(SUM(d1) AS BIGINT) AS n1,
             CAST(SUM(d2) AS BIGINT) AS n2 FROM ev),
         risk AS (SELECT n1, n2, d1, d2,
             n1 - COALESCE(SUM(d1) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r1,
             n2 - COALESCE(SUM(d2) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r2
           FROM ev CROSS JOIN tot),
         terms AS (SELECT n1, n2, d1,
             CAST(round(CAST(d1 AS DOUBLE)
               - CAST(d1 + d2 AS DOUBLE) * CAST(r1 AS DOUBLE)
                 / CAST(r1 + r2 AS DOUBLE), 9) + 0.0
               AS DECIMAL(18,9)) AS oe,
             CAST(round(CASE WHEN r1 + r2 > 1 THEN
                 CAST(d1 + d2 AS DOUBLE)
                 * (CAST(r1 AS DOUBLE) / CAST(r1 + r2 AS DOUBLE))
                 * (CAST(r2 AS DOUBLE) / CAST(r1 + r2 AS DOUBLE))
                 * (CAST(r1 + r2 - d1 - d2 AS DOUBLE)
                   / CAST(r1 + r2 - 1 AS DOUBLE))
               ELSE 0.0 END, 9) + 0.0 AS DECIMAL(18,9)) AS v
           FROM risk),
         ag AS (SELECT MAX(n1) AS n_a, MAX(n2) AS n_b,
             CAST(SUM(d1) AS BIGINT) AS o_a, SUM(oe) AS soe,
             SUM(v) AS sv
           FROM terms)
         SELECT n_a, n_b, o_a,
           round(CAST(o_a AS DOUBLE) - CAST(soe AS DOUBLE), 6) AS e_a,
           round(CAST(soe AS DOUBLE) * CAST(soe AS DOUBLE)
             / CAST(sv AS DOUBLE), 6) AS chi2_logrank
         FROM ag"""
    },
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
         SELECT node AS suppkey, round(CAST(x AS DOUBLE), 8) AS katz
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
             round(CAST(wc AS DOUBLE) / nw, 4) AS mean_word_len,
             round(CAST(nhash + nell AS DOUBLE) / nw, 4) AS symbol_ratio,
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
           round(CAST(CAST(SUM(is_novel) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novelty_rate
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
           round(CAST(CAST(SUM(CASE WHEN gap_us IS NOT NULL
               AND gap_us <= 5000000 THEN 1 ELSE 0 END) AS BIGINT)
               AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
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
           round(CAST(CAST(SUM(n_events) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_events,
           round(CAST(CAST(SUM(has_view * has_purchase) AS BIGINT)
               AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS conversion_rate
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
    "q_table_stream_agg" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q_table_timetravel_ts" ->
      """SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE doc_id % 4 IN (0, 1)
         GROUP BY 1 ORDER BY 1""",
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
           round(CAST(r.rv AS DOUBLE) / si.seasonal_idx, 6)
             AS deseasonalized
         FROM ratios r JOIN si ON r.dow = si.dow ORDER BY r.day""",
    "q_theil_sen" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(round(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS DECIMAL(18,6)) AS y
           FROM events GROUP BY 1, 2),
         slopes AS (SELECT a.event_type,
             CAST(round(CAST(b.y - a.y AS DOUBLE)
               / CAST(datediff('day', a.day, b.day) AS DOUBLE), 9)
               AS DECIMAL(18,9)) AS slope
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
             round(2.0 * 6371.0 * asin(sqrt(
               sin(radians(lat_s - lat_c) / 2.0)
                 * sin(radians(lat_s - lat_c) / 2.0)
               + cos(radians(lat_c)) * cos(radians(lat_s))
                 * sin(radians(lon_s - lon_c) / 2.0)
                 * sin(radians(lon_s - lon_c) / 2.0))), 3) AS dist_km
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

  /** DuckDB replay of [[graft.ops.Sampling.epochShard]] (seed 7, 8
    * shards): the splitmix64 finalizer expanded in HUGEINT mod-2^64
    * arithmetic, then floor-mod shard + per-shard hash rank.
    */
  private lazy val epochShuffleOracleSql: String = {
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
  private def bpeStagesSql(k: Int): String = {
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

  private lazy val bpeTrainOracleSql: String = {
    val k = 8
    val union = (1 to k)
      .map(i => s"SELECT $i AS step, lhs, rhs, n FROM b$i")
      .mkString(" UNION ALL ")
    s"""${bpeStagesSql(k)}
         SELECT step, lhs, rhs, n FROM ($union) ORDER BY step"""
  }

  private lazy val bpeEncodeOracleSql: String = {
    val k = 8
    s"""${bpeStagesSql(k)}
         SELECT word,
           CAST(len(string_split(trim(seq, '{}'), '}{')) AS INTEGER)
             AS n_tokens,
           seq
         FROM s$k ORDER BY word"""
  }

  private lazy val bpeDocTokensOracleSql: String = {
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
