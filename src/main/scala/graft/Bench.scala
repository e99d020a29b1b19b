package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct, xxhash64}

/** Benchmark entrypoint. Runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * The line is written to raw stdout (sbt `run / outputStrategy :=
  * StdoutOutput` keeps it unprefixed) AND to a file
  * (`SPARK_GRAFT_BENCH_OUT`, default `bench_out.json` in the cwd) so the
  * harness can parse it either way.
  */
object Bench {
  /** Force full evaluation of every output column. A bare `.count()` lets
    * Catalyst prune unreferenced projections, so expression-only queries
    * (clean_text, q_scalar_funcs, lang_id, ...) would time a scan instead
    * of the operator. Hashing a struct of all columns and summing the
    * hashes is a single non-prunable pass with negligible overhead.
    */
  private[graft] def materialize(df: DataFrame): Unit = {
    // xxhash64 rejects MapType, so map-valued columns are hashed through
    // sorted map_entries instead — falling back to a prunable count()
    // here would let Catalyst drop the map computation and under-time
    // the query (the r7 verdict's Bench finding).
    import org.apache.spark.sql.types.MapType
    val cols = df.schema.fields.toSeq.map { f =>
      f.dataType match {
        case _: MapType => org.apache.spark.sql.functions
          .array_sort(org.apache.spark.sql.functions
            .map_entries(col(f.name)))
        case _ => col(f.name)
      }
    }
    try {
      // bit_xor, not sum: summing 64-bit hashes overflows LongType under
      // ANSI mode (Spark 4 default) and would fail the job at runtime.
      df.select(xxhash64(struct(cols: _*)).as("h"))
        .agg(org.apache.spark.sql.functions.bit_xor(col("h"))).head()
    } catch {
      // last-resort guard for types even map_entries can't normalize
      // (e.g. maps nested inside structs); loudly visible so it never
      // silently under-measures again.
      case e: org.apache.spark.sql.AnalysisException =>
        System.err.println(
          s"[bench] WARNING prunable fallback: ${e.getMessage}")
        df.count()
    }
    ()
  }

  /** Solo slice in a FRESH JVM (r12 VERDICT ask #3): fork
    * [[SoloBench]] with this process's own classpath/JVM options and
    * read back its `name\tmedian\tstatus` lines. Fresh process =
    * zero suite residue (the in-JVM solo pass drifted 23.2–32.2 s on
    * identical code); 5-rep medians inside. Runs BEFORE the parent's
    * SparkSession exists so the child competes with nothing. Any
    * launch failure degrades to an empty slice with a stderr warning
    * — never a crashed bench.
    */
  private def runSoloFork(
      slice: Seq[String], sfDir: String): Seq[(String, Double)] = {
    try {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val outFile = java.nio.file.Files.createTempFile("graft_solo", ".tsv")
      val logFile = java.nio.file.Files.createTempFile("graft_solo", ".log")
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val mem = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")
      val cmd = (Seq(javaBin) ++ addOpens ++
        Seq(s"-Xmx$mem", "-cp", cp, "graft.SoloBench")).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_SOLO_ONLY", slice.mkString(","))
      pb.environment().put("SPARK_GRAFT_SOLO_OUT", outFile.toString)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      // child logs must never reach this process's stdout (the harness
      // parses only the tail of it)
      pb.redirectErrorStream(true)
      pb.redirectOutput(logFile.toFile)
      val proc = pb.start()
      val exit = proc.waitFor()
      if (exit != 0)
        System.err.println(s"[bench] solo fork exited $exit — see $logFile")
      scala.io.Source.fromFile(outFile.toFile).getLines().toSeq
        .map(_.split("\t")).collect {
          case Array(n, t, "ok") => n -> t.toDouble
        }
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] solo fork failed: ${e.getMessage}")
        Seq.empty
    }
  }

  /** The 28-query r4-headline slice — the like-for-like cross-round
    * perf signal (BASELINE.md).
    */
  private val r4Slice = Seq(
    "q1_agg", "q3_topk", "q5_join", "q6_filter", "q_window_running",
    "q_topk_per_group", "q_tfidf", "q_bm25", "events_tumbling",
    "events_stream_tumbling", "events_stream_dedup", "dedup_exact",
    "dedup_minhash", "dedup_fuzzy", "neardup_embedding",
    "ann_bruteforce", "ann_lsh_indexed", "doc_embeddings",
    "pipeline_e2e", "q_asof_join_native", "q_gapfill",
    "q_session_window", "q_contamination", "q_seq_packing",
    "dedup_incremental", "q_perplexity", "q_boilerplate", "q_knn_eval")

  /** Recorded per-micro-batch floors (sec/batch, sf0.1) for every
    * streaming gate — per-gate max of BASELINE.md "Round-15 streaming
    * micro-batch floors" and the r15 closing run's `stream_floors`.
    * The regression fence (r15 VERDICT ask #7→#16.7) flags any gate
    * whose measured sec/batch exceeds [[FloorFenceFactor]]× its
    * recorded floor: a floor is a fixed per-batch cost (state-store
    * init + offset/commit log), so a 2× move is a structural
    * regression (an extra stateful exec node, a re-planned static
    * side), never data volume.
    */
  private[graft] val recordedFloors: Map[String, Double] = Map(
    "events_stream_tumbling" -> 1.00, "events_stream_hopping" -> 0.98,
    "events_stream_dedup" -> 0.975, "orders_stream_merge" -> 0.94,
    "events_stream_ohlc" -> 0.84, "events_stream_left_join" -> 1.581,
    "events_stream_join_agg" -> 3.42, "events_stream_static_join" -> 7.77,
    "events_stream_interval_join" -> 6.13, "events_stream_sessions" -> 0.907,
    "q_table_stream_paced" -> 0.42, "q_cdf_stream_agg" -> 2.769,
    "q_table_stream_agg" -> 2.39, "q_table_cdf_stream" -> 0.887,
    "q_table_stream_read" -> 0.528, "docs_stream_curation" -> 0.639,
    "docs_stream_incr_stats" -> 2.024, "docs_stream_neardup" -> 1.198,
    "q_table_stream_sink" -> 0.794, "docs_stream_table" -> 0.681,
    "q_table_stream_evolve" -> 0.825, "q_cdf_incremental_agg" -> 0.723,
    "docs_stream_kmv" -> 1.685)

  private[graft] val FloorFenceFactor = 2.0

  /** Ambient-CPU calibration for the floor fence (r16 VERDICT ask #5):
    * the recorded floors are fixed per-batch choreography costs
    * measured on calm hardware, so on a contended host the fence fired
    * false breaches on unchanged code (9× in the builder's slow r16
    * session, 1× in the driver's contended c32 run). A fence that
    * cries wolf under load gets ignored when a real structural
    * regression lands. Fix: time a fixed single-threaded FNV fold over
    * a deterministic buffer IN THE SAME JVM, divide by its calm-
    * hardware baseline, and stretch the fence by that ratio — ambient
    * contention inflates the probe and the per-batch floors alike,
    * while a structural regression (an extra stateful exec node)
    * moves only the floors. The probe runs OUTSIDE every timed region.
    */
  private[graft] def calibrationProbeSec(reps: Int = 7): Double = {
    val buf = Array.tabulate(1 << 20)(i => (i * 31 + 7).toByte)
    var sink = 0L
    def pass(): Double = {
      val t0 = System.nanoTime()
      var r = 0
      while (r < 16) {
        var acc = 0xcbf29ce484222325L
        var i = 0
        while (i < buf.length) {
          acc = (acc ^ buf(i)) * 0x100000001b3L
          i += 1
        }
        sink ^= acc
        r += 1
      }
      (System.nanoTime() - t0) / 1e9
    }
    val ts = Seq.fill(math.max(1, reps))(pass()).sorted
    if (sink == 42L) System.err.print("") // defeat dead-code elimination
    ts(ts.length / 2)
  }

  /** Calm-hardware median of [[calibrationProbeSec]] on the reference
    * sandbox (measured r17, idle 32-core host, 5 fresh JVMs:
    * 0.0241/0.0245/0.0251/0.0253/0.0261 — median 0.0251, rounded to
    * 0.025). The fence scale is probe/baseline clamped to ≥ 1 — a
    * faster host must never TIGHTEN the fence below the recorded-floor
    * contract, and sub-1.1× ambient wobble barely moves it.
    */
  private[graft] val CalibrationBaselineSec = 0.025

  /** Pure fence decision — spec-testable with injected slowdowns.
    * Input is the per-gate (micro-batches, stream wall sec) Bench
    * meters; output is every (gate, measured sec/batch, recorded
    * floor) that breaches. Gates with no recorded floor (new this
    * round) never fire — they get a floor entry next re-band.
    */
  private[graft] def floorBreaches(
      measured: Iterable[(String, (Long, Double))],
      recorded: Map[String, Double] = recordedFloors,
      factor: Double = FloorFenceFactor): Seq[(String, Double, Double)] =
    measured.iterator.flatMap { case (g, (b, s)) =>
      recorded.get(g).collect {
        case f if b > 0 && s / b.toDouble > f * factor =>
          (g, s / b.toDouble, f)
      }
    }.toSeq

  /** HEAVY-TAIL slice (r11 VERDICT ask #3): the most expensive
    * in-suite rows — their in-suite numbers drift far past the
    * ambient band, so the solo figure is the adjudicator. q_table_cdc
    * joined at r13 (its CDF planner changed at r12; in-suite 1.72×).
    */
  private val heavyTail = Seq("q_textrank", "q_hits", "q_bootstrap_ci",
    "events_stream_join_agg", "q_permutation_test", "q_rake_keywords",
    "q_markov_stationary", "events_stream_left_join",
    "q_cooks_distance", "q_burrows_delta", "q_table_cdc")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val onlyEnv = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SOLO slices in FRESH JVMs, before this process's SparkSession
    // exists (full isolation both ways); skipped when the run is an
    // isolation experiment over named queries
    val skipSolo = onlyEnv.nonEmpty ||
      sys.env.get("SPARK_GRAFT_SKIP_SOLO").contains("1")
    val solo: Seq[(String, Double)] =
      if (skipSolo) Seq.empty else runSoloFork(r4Slice, sfDir)
    val heavySolo: Seq[(String, Double)] =
      if (skipSolo) Seq.empty else runSoloFork(heavyTail, sfDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // session-global so plan shapes are execution-order-independent:
      // only bucketed graft scans report KeyGroupedPartitioning anyway
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // in-suite interference mitigation (r6 verdict #4): shuffle files
      // and broadcast blocks are freed on REFERENCE GC, and the default
      // periodic-GC interval (30 min) never fires inside a bench run —
      // so late queries inherit ~190 predecessors' tmp-disk residue.
      // A 1-minute ContextCleaner GC cadence (plus the existing explicit
      // System.gc() between queries) bounds the accumulation window.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: absorb session/codegen startup so the first timed
    // query isn't charged ~4s of JVM warmup
    try materialize(SparkEntry.queries("q6_filter")(spark, sfDir))
    catch { case _: Throwable => () }
    // build the persisted LSH index layout untimed: it is written once and
    // probed forever (the 100 TB analog is an offline index build), so the
    // timed ann_lsh_indexed row should measure the partition-pruned probe,
    // not the one-off layout write
    try materialize(SparkEntry.queries("ann_lsh_indexed")(spark, sfDir))
    catch { case _: Throwable => () }
    try materialize(SparkEntry.queries("ann_ivf_indexed")(spark, sfDir))
    catch { case _: Throwable => () }
    try materialize(SparkEntry.queries("dedup_incremental")(spark, sfDir))
    catch { case _: Throwable => () }
    try materialize(SparkEntry.queries("ann_incremental")(spark, sfDir))
    catch { case _: Throwable => () }
    // Median-of-N per query (default 3), cache cleared before EVERY timed
    // run: several queries persist() intermediates they keep for the
    // session (tf tables, per-doc stats), so without clearing, (a) later
    // queries inherit accumulated executor storage pressure — the r3
    // driver run showed trivial queries spiking 0.3→2+ s late in the run —
    // and (b) reps 2..N of the SAME query would replay a cached result
    // instead of the plan. The median then absorbs one-off host/GC
    // stalls that a single run records as the query's cost.
    // guarded parse: a non-numeric or <1 value falls back to the default
    // (reps=0 would make times empty and the median index throw)
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).filter(_ >= 1).getOrElse(3)
    // SPARK_GRAFT_BENCH_ONLY=a,b,c — time only the named queries
    // (isolation experiments: a query's solo cost vs its in-suite cost
    // separates plan regressions from run-order interference)
    val only = onlyEnv
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None => SparkEntry.queries
    }
    // Median-timed single query, cache cleared per rep (shared by the
    // solo pass and the in-suite loop).
    // per-gate micro-batch accounting (r14 VERDICT #7): drained after
    // each timed query; name -> (micro-batches, stream wall sec) summed
    // over the reps — sec/batch is the measured per-micro-batch floor
    val streamFloors =
      scala.collection.mutable.LinkedHashMap.empty[String, (Long, Double)]
    def timed(name: String,
        fn: (SparkSession, String) => DataFrame): (String, Double, Boolean) = {
      System.gc()
      var ok = true
      SparkEntry.StreamMeter.drain() // stray entries never mis-attribute
      val times = Seq.fill(reps) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir))
        catch { case e: Throwable =>
          ok = false
          System.err.println(
            s"[bench] $name FAILED: ${e.getClass.getSimpleName}: " +
              s"${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      val drains = SparkEntry.StreamMeter.drain()
      if (drains.nonEmpty && ok)
        streamFloors(name) =
          (drains.map(_._1).sum, drains.map(_._2).sum / 1e3)
      (name, times.sorted.apply(reps / 2), ok)
    }
    // (solo/heavy slices already ran in their own fresh JVMs above)
    // A broken query must NEVER improve the benchmark: the r6 fixtures
    // broke 17 queries and the old blanket catch recorded their
    // time-to-exception (0.05-0.09 s) as a "win". Any rep that throws
    // marks the query FAILED — it is excluded from `queries` and the
    // total and reported under a separate "failed" key instead.
    // In-suite loop. The per-query System.gc() (inside timed) levels the
    // inter-query playing field: shuffle files and broadcast blocks are
    // freed on reference GC, not eagerly — without it, late-run queries
    // inherit hundreds of earlier queries' tmp-disk + heap residue,
    // which the r5 run showed as a 6× swing on a trivial scan+groupBy.
    // ambient calibration for the floor fence — sampled once before
    // the loop and once after (contention can start mid-run; take the
    // max), never inside any timed region
    val ambientScalePre =
      math.max(1.0, calibrationProbeSec() / CalibrationBaselineSec)
    val raw = selected.map { case (name, fn) => timed(name, fn) }
    val ambientScale = math.max(ambientScalePre,
      math.max(1.0, calibrationProbeSec() / CalibrationBaselineSec))
    val fenceFactor = FloorFenceFactor * ambientScale
    if (ambientScale > 1.25)
      System.err.println(
        f"[bench] ambient CPU contention detected: calibration probe " +
          f"${ambientScale}%.2f× the calm-hardware baseline — floor " +
          "fence stretched accordingly")
    // loud stderr fence report — the JSON flag alone could scroll past
    floorBreaches(streamFloors, factor = fenceFactor)
      .foreach { case (g, got, floor) =>
      System.err.println(
        f"[bench] FLOOR BREACH $g%s: ${got}%.3f s/batch vs recorded " +
          f"floor ${floor}%.3f (>${fenceFactor}%.1f× ambient-" +
          "normalized) — structural streaming regression, adjudicate " +
          "before shipping")
    }
    val results = raw.collect { case (n, t, true) => n -> t }.toSeq
    val resultMap = results.toMap
    val failedNames = raw.collect { case (n, _, false) => n }.toSeq
    // Locale.ROOT formatting: the default-locale f"%.3f" renders decimal
    // COMMAS under e.g. de_DE and the JSON line stops parsing
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jsonLine(rs: Iterable[(String, Double)],
        soloDetail: Boolean): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      // total is over all SUCCESSFUL queries; failures are named, never
      // priced
      val total = results.map(_._2).sum
      val failedJson = failedNames.map("\"" + _ + "\"")
        .mkString("[", ",", "]")
      // solo slice: full map in the file line, total-only on stdout
      // (the harness keeps ~2000 stdout chars — the map won't fit)
      val soloJson =
        if (solo.isEmpty) ""
        else {
          val t = f3(solo.map(_._2).sum)
          if (soloDetail) {
            val m = solo.map { case (k, v) => "\"" + k + "\":" + f3(v) }
              .mkString("{", ",", "}")
            s""","headline_solo_total":$t,"headline_solo":$m"""
          } else s""","headline_solo_total":$t"""
        }
      val heavyJson =
        if (heavySolo.isEmpty) ""
        else {
          val t = f3(heavySolo.map(_._2).sum)
          if (soloDetail) {
            val m = heavySolo.map { case (k, v) => "\"" + k + "\":" + f3(v) }
              .mkString("{", ",", "}")
            s""","heavy_solo_total":$t,"heavy_solo":$m"""
          } else s""","heavy_solo_total":$t"""
        }
      // measured micro-batch floors (file line only — stdout stays
      // within the harness's ~2000-char window): batches are summed
      // over the reps, sec_per_batch = stream wall sec / batches
      val floorsJson =
        if (!soloDetail || streamFloors.isEmpty) ""
        else {
          val m = streamFloors.map { case (k, (b, s)) =>
            val perB = if (b > 0) s / b.toDouble else 0.0
            "\"" + k + "\":{\"batches\":" + b +
              ",\"stream_sec\":" + f3(s) +
              ",\"sec_per_batch\":" + f3(perB) + "}"
          }.mkString("{", ",", "}")
          s""","stream_floors":$m"""
        }
      // regression fence: present in BOTH lines when it fires (it is
      // rare and small), omitted entirely when silent — the stdout
      // budget only pays on a real regression
      val breaches = floorBreaches(streamFloors, factor = fenceFactor)
      val breachJson =
        if (breaches.isEmpty) ""
        else {
          val m = breaches.map { case (g, got, floor) =>
            "\"" + g + "\":{\"sec_per_batch\":" + f3(got) +
              ",\"recorded_floor\":" + f3(floor) + "}"
          }.mkString("{", ",", "}")
          s""","floor_breaches":$m"""
        }
      // ambient calibration rides the file line only (stdout budget)
      val ambientJson =
        if (soloDetail) s""","ambient_scale":${f3(ambientScale)}"""
        else ""
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"failed":$failedJson$soloJson$heavyJson$floorsJson$breachJson$ambientJson,"sf":"$sfDir"}"""
    }
    // Full per-query detail goes to the file; stdout gets a HEADLINE subset.
    // The harness keeps only the last ~2000 chars of stdout — an 84-entry
    // queries map (~4.8 KB) gets truncated mid-line and parses as nothing
    // (BENCH_r01/r02 both recorded "parsed": null for exactly this reason).
    val headline = Seq(
      "q1_agg", "q3_topk", "q5_join", "q6_filter", "q_window_running",
      "q_topk_per_group", "q_tfidf", "q_bm25", "events_tumbling",
      "events_stream_tumbling", "events_stream_dedup", "dedup_exact",
      "dedup_minhash", "dedup_fuzzy", "neardup_embedding",
      "ann_bruteforce", "ann_lsh_indexed", "doc_embeddings",
      "pipeline_e2e", "q_asof_join_native", "q_gapfill",
      "q_session_window", "q_contamination", "q_seq_packing",
      "dedup_incremental", "q_perplexity", "q_boilerplate",
      "q_knn_eval", "q_table_snapshot", "q_table_cdc",
      "docs_stream_table", "q_table_maintenance", "q_pca_project",
      "q_pagerank", "q_quality_classifier",
      // round-7 flagships: sketch overlap, bloom point lookup, MOR
      // delete, matryoshka ANN, chained stateful streaming
      "q_kmv_overlap", "q_table_bloom", "q_table_mor_delete",
      "ann_matryoshka", "events_stream_join_agg",
      // round-8 flagships: bipartite HITS, bigram LM, native
      // Jaro-Winkler linkage, incremental MV maintenance, cohort LTV
      "q_hits", "q_bigram_lm", "q_jaro_dedup", "q_mv_incremental",
      "q_cohort_ltv",
      // round-12 flagships: file-group COW and the paced stream drain
      "q_table_cow_pruned", "q_table_stream_paced",
      // round-13 flagships: native streaming sink, SQL maintenance,
      // merge evolution, SQL z-order, dedup accounting
      "q_table_stream_sink", "q_table_sql_maintenance",
      "q_table_merge_evolve", "q_table_sql_zorder", "q_dup_size_hist",
      // round-13 continuation flagships: storage-partitioned join,
      // dynamic file pruning, selective compaction, SQL CDF
      "q_table_bucket_join", "q_table_dyn_prune",
      "q_table_compact_small", "q_table_sql_changes",
      // round-16 flagships: composed partition×bucket layout,
      // source-bound post-delete ANN probe
      "q_table_part_bucket", "ann_post_delete")
    val fullLine = jsonLine(results, soloDetail = true)
    val headLine = jsonLine(
      headline.flatMap(h => resultMap.get(h).map(h -> _)),
      soloDetail = false)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(out),
      (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    // The harness keeps only the last ~2000 chars of combined stdout+stderr,
    // so the headline must be the LAST thing this process emits: silence
    // shutdown logging, stop the session (its executor/ui teardown logs
    // would otherwise land after our line), THEN print.
    spark.sparkContext.setLogLevel("ERROR")
    // a teardown failure must not swallow the headline — it is the
    // harness's only benchmark signal
    try spark.stop() catch { case _: Throwable => () }
    System.out.println(headLine)
    System.out.flush()
  }
}
