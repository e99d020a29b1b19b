package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.json4s.{Formats, NoTypeHints}
import org.json4s.jackson.Serialization

/** Minimal TRANSACTIONAL TABLE FORMAT — the catalog layer that unifies
  * the engine's snapshot-rewrite ops ([[graft.ops.Merge]],
  * [[graft.ops.Compaction]]) and the streaming changelog
  * ([[graft.streaming.DeltaLog]]) behind one durable, versioned table
  * abstraction. The reference (freelawproject/inception) has no storage
  * layer at all — requests are stateless (`routes/embedding.py`) — so
  * this is engine-extension surface, designed the way the public
  * log-structured table formats (Delta Lake, Iceberg) are, re-derived
  * from first principles for this codebase.
  *
  * Layout under a table root (any Hadoop-FS URI — hdfs://, s3a://,
  * file:/ — never java.io.File):
  *
  * {{{
  *   <root>/_log/v00000000000000000000.json   one immutable manifest per version
  *   <root>/data/c<version>-<uuid>/part-*.parquet   immutable data files
  * }}}
  *
  * A manifest lists the COMPLETE set of active data files for its
  * version plus per-file row counts and min/max stats, so:
  *   - reads never list the data directory (O(1) metadata ops at 100 TB,
  *     where a recursive listing of millions of objects is itself a job);
  *   - time travel = read an older manifest;
  *   - file-skipping = filter the manifest's file list by stats BEFORE
  *     the scan (the manifest-level analog of parquet footer pruning —
  *     at cluster scale this is what turns "scan the table" into "scan
  *     the touched hour").
  *
  * COMMIT PROTOCOL (optimistic concurrency): a writer computes the next
  * manifest, writes it to a temp name, and claims the version with an
  * atomic no-overwrite rename (`FileContext.rename` without OVERWRITE —
  * atomic on HDFS/POSIX; on object stores without atomic rename, front
  * the log with a conditional-put or a coordination service, the same
  * caveat [[graft.streaming.DeltaLog]] documents for its high-water
  * mark). Losing the race throws the rename's already-exists error, the
  * writer re-reads the now-newer snapshot, recomputes, and retries —
  * readers are never blocked and never see a partial commit, because a
  * manifest appears in `_log` only fully written.
  *
  * Orphaned data files from lost races (written, never referenced) are
  * reclaimed by [[vacuum]], never by readers.
  */
object TxnTable {

  /** Per-column min/max over one data file, in double-comparable space
    * (numerics as-is; timestamps as epoch-µs; dates as epoch-days).
    */
  case class ColStats(min: Double, max: Double)

  /** One immutable data file of a snapshot; `path` is root-relative
    * (or absolute for files referenced across table roots by
    * [[cloneTable]] — paths starting with '/' or a URI scheme are used
    * as-is).
    * `blooms`: per-column base64 bloom filter over the file's values
    * (present only for the table's `bloomCols`, absent on files written
    * before the property existed — readers treat absence as "might
    * contain", so old manifests stay valid).
    * `dvs`: deletion-vector sidecars — tombstone-key parquet paths that
    * apply to THIS file's rows at read time ([[deleteMor]]). File-scoped
    * by design: rows appended after a delete are written to new entries
    * with no `dvs`, so a re-inserted key is visible again (the semantics
    * a table-wide key blacklist would get wrong).
    */
  /** `nulls`: per-column NULL counts for the table's stats columns —
    * written by the same per-file pass as min/max, and the index that
    * min/max cannot be: an all-null file has no min/max entry at all,
    * but its null count prunes `IS NOT NULL` probes (which Spark
    * implies under almost every predicate), and a zero prunes
    * `IS NULL`. Also what answers a pushed-down COUNT(col) from
    * metadata. Absent on files written before the field existed —
    * readers treat absence as unknown, never as zero.
    */
  /** `pv`: the file's single partition value in canonical string form
    * (see [[PartitionSpec]]; [[NullPv]] for all-null). Present only on
    * files written through a partition-aware path; absence = unknown,
    * readers keep the file conservatively and partition drops rewrite
    * it scoped.
    */
  /** `pvg`: the partition-spec GENERATION the file's `pv` was stamped
    * under (absent = generation 0, so every pre-evolution manifest
    * stays byte-valid). A pv is TRUSTED only when `pvg` equals the
    * current sidecar's generation — after [[evolvePartitionSpec]], a
    * prior era's stamps are ignored (conservative scan, scoped-rewrite
    * drop) rather than misread in the new spec's value space. The
    * Iceberg spec-id discipline, one Option[Int] per file.
    */
  /** `pvf`: FINGERPRINT of the spec VALUE (columns + transforms, not
    * the generation counter) the pv was stamped under. Closes the
    * generation-collision race (ADVICE r15): two concurrent
    * [[evolvePartitionSpec]] calls can both install gen N with
    * DIFFERENT specs (last rename wins), so a gen-equality check alone
    * would trust pvs stamped in the LOSING spec's value space. With
    * the fingerprint, those stamps mismatch the surviving sidecar and
    * fall back to the conservative (unpruned, scoped-rewrite) path.
    * Absent = legacy stamp, trusted on gen equality alone.
    */
  case class FileEntry(
      path: String,
      rows: Long,
      bytes: Long,
      stats: Map[String, ColStats],
      blooms: Option[Map[String, String]] = None,
      dvs: Option[Seq[String]] = None,
      bucket: Option[Int] = None,
      nulls: Option[Map[String, Long]] = None,
      pv: Option[String] = None,
      pvg: Option[Int] = None,
      pvf: Option[Int] = None)

  /** One committed table version. `schemaDdl` is the snapshot's full
    * read schema — reads pass it explicitly, so files written before a
    * column was added serve nulls for it (schema evolution without a
    * footer-merging pass over every file).
    */
  /** `streamHwm`: highest streaming micro-batch id committed INTO this
    * table (carried forward by every commit) — the exactly-once fence
    * for [[appendBatch]]. Recording it in the manifest makes batch-id
    * bookkeeping and data visibility ONE atomic rename, the guarantee
    * [[graft.streaming.DeltaLog]]'s separate `_hwm` file can only
    * approximate on stores without atomic rename.
    */
  /** `constraints`: named CHECK predicates (SQL expression strings)
    * enforced on every commit's INCOMING rows, carried forward like
    * `streamHwm`.
    */
  /** `bloomCols`: table-property list of columns every commit maintains
    * per-file bloom filters for (the point-lookup file-skipping index —
    * min/max stats cannot prune an equality probe on a column whose
    * values interleave across files; a bloom can). Set at [[create]],
    * carried forward by every commit like `constraints`.
    */
  /** `colMap`: COLUMN MAPPING for rename/drop without rewriting files —
    * LOGICAL column name → PHYSICAL name (the name the data files carry,
    * fixed at the column's creation; entries exist only where they
    * differ). [[renameColumn]] updates the map; [[dropColumn]] removes
    * the logical column and parks its physical name in `retired` so a
    * later add cannot silently resurrect the old files' data under the
    * same name; any full rewrite ([[compact]]/[[overwrite]]/...)
    * materializes the mapping and resets both. File-side metadata
    * (per-file `stats`/`blooms` keys) is ALWAYS physical; readers
    * translate probe columns through the map.
    */
  /** `cdfDir`: root-relative directory of THIS version's materialized
    * change rows (parquet of table columns + `_change_type`), written
    * at commit time by row-changing rewrites when the table has CHANGE
    * DATA FEED enabled ([[enableCdf]]). Per-version, never carried
    * forward; absent on appends (their data files ARE the inserts) and
    * on physical-only reorganizations (compact/cluster — no logical
    * change, so no change rows).
    */
  case class Manifest(
      version: Long,
      op: String,
      timestampMs: Long,
      schemaDdl: String,
      files: Seq[FileEntry],
      streamHwm: Option[Long] = None,
      constraints: Option[Map[String, String]] = None,
      bloomCols: Option[Seq[String]] = None,
      colMap: Option[Map[String, String]] = None,
      retired: Option[Seq[String]] = None,
      cdfDir: Option[String] = None)

  private implicit val fmts: Formats = Serialization.formats(NoTypeHints)

  private val LogDir = "_log"
  private val DataDir = "data"
  private val ChangeDir = "_cdf"

  /** Data-directory name for sibling writers (the DSv2 COW path). */
  private[table] def dataDirName: String = DataDir

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Long): Path =
    new Path(s"$root/$LogDir", f"v$v%020d.json")

  /** HASH-BUCKET LAYOUT spec (`_log/_bucket.json`): the table's rows are
    * clustered into `n` buckets by `pmod(murmur3(col), n)` — Spark's own
    * `repartition(n, col)` assignment — and every data file carries its
    * bucket id in the manifest ([[FileEntry.bucket]]). Fixed at
    * [[create]] and immutable for the table's lifetime (re-bucketing is
    * a rewrite, not an evolution), which is why it lives in a sidecar
    * rather than being carried through every commit: the spec cannot
    * change, only the per-file ids matter per version.
    *
    * What it buys at 100 TB: two tables bucketed on their join key by
    * the same `n` join WITHOUT A SHUFFLE — the DSv2 scan reports
    * `KeyGroupedPartitioning(bucket(n, col))` and Spark's
    * storage-partitioned join (SPARK-37375) aligns the bucket ids
    * directly, so a fact-dim join over petabytes moves zero bytes
    * between executors. An equality probe on the bucket column prunes
    * to ONE bucket's files before stats are even consulted.
    *
    * `col` is the PHYSICAL column name (fixed at creation like stats
    * keys; readers translate through `colMap`). Commits whose writers
    * predate or bypass bucketing (COW rewrites, streaming-sink epochs)
    * produce files without bucket ids — readers detect that and fall
    * back to ordinary shuffled planning, so the layout degrades
    * gracefully instead of lying.
    */
  /** `sorted`: rows inside every bucket file are sorted ascending on
    * `col` (nulls first — Spark's default ascending order). Written
    * `true` by every layout writer since the field existed; tables
    * created before it lack the flag and never claim an ordering
    * their files may not have. What it buys: a co-bucketed
    * storage-partitioned join can run its sort-merge WITHOUT
    * per-partition sorts when each bucket resolves to one file — the
    * scan reports the ordering and EnsureRequirements drops both
    * SortExecs.
    */
  /** `cols`: COMPOSITE bucket keys (Some(Seq(c1, c2, …))) — each key
    * column is bucketed INDEPENDENTLY into `n` buckets (`pmod(
    * murmur3(cᵢ), n)`), the file's id is the base-n composition of the
    * per-column ids, and the scan reports one single-column transform
    * PER KEY (`bucket(n, c1), bucket(n, c2)`), the Iceberg-style
    * composition — Spark's storage-partitioned join requires every
    * partition expression to reference exactly one column
    * (KeyGroupedShuffleSpec), so a single chained-hash transform could
    * never co-locate. Dividends of the per-column form: a join on ALL
    * keys is storage-partitioned (zero exchange), and an equality
    * probe on ANY ONE key already prunes to 1/n of the files. Absent
    * on sidecars written before the field (single-column specs) —
    * `col` stays the first key for compatibility; readers use
    * [[bucketColsOf]]. Fixed at create like everything else here.
    */
  case class BucketSpec(col: String, n: Int,
      sorted: Option[Boolean] = None,
      cols: Option[Seq[String]] = None)

  /** The effective bucket key columns of a spec (1 for the classic
    * single-column layout).
    */
  def bucketColsOf(spec: BucketSpec): Seq[String] =
    spec.cols.filter(_.nonEmpty).getOrElse(Seq(spec.col))

  private def bucketSpecPath(root: String): Path =
    new Path(s"$root/$LogDir", "_bucket.json")

  /** IDENTITY / DATE PARTITION LAYOUT spec (`_log/_partition.json`):
    * every data file holds rows of exactly ONE partition value —
    * `col` itself (`identity`) or `to_date(col)` (`days`) — and the
    * manifest records that value per file ([[FileEntry.pv]], the
    * canonical `CAST(value AS STRING)` form; `"__NULL__"` for an
    * all-null-partition file). Fixed at [[create]] and immutable,
    * same sidecar rationale as [[BucketSpec]]; mutually exclusive
    * with bucketing (one physical layout per table).
    *
    * What it buys at 100 TB — the single most common lakehouse
    * layout (daily-partitioned ingest):
    *   - `WHERE day = …` / `IN` probes and dynamic join-key pruning
    *     keep exactly that partition's files, before stats or blooms
    *     are consulted;
    *   - `DELETE WHERE day = …` (retention, GDPR partition drops) is
    *     an O(metadata) MANIFEST operation ([[dropPartitions]]) —
    *     zero data IO where the COW path would rewrite the table;
    *   - compaction bin-packs WITHIN partitions (the layout routes
    *     every rewrite's rows back through the partition value).
    *
    * `col` is the PHYSICAL column name (fixed at create, like the
    * bucket column — rename/drop of it is refused). Files written by
    * layout-unaware writers (COW rewrites, streaming-sink epochs)
    * carry no `pv`; readers keep them conservatively and
    * [[dropPartitions]] rewrites exactly those files, scoped — the
    * same graceful degradation the bucket layout has.
    *
    * MULTI-COLUMN layouts (`PARTITIONED BY (days(ts), source)` — the
    * date × tenant layout real lakehouses run) mirror [[BucketSpec]]'s
    * composite idiom: `cols`/`transforms` list EVERY component in
    * order and `col`/`transform` must equal their heads (old sidecars
    * deserialize with both absent = the single-column layout,
    * bit-compatible). A file's `pv` is then the TUPLE encoding: each
    * component's canonical string with `%`→`%25`, `/`→`%2F` escaped,
    * joined by `/` ([[pvEncoded]]/[[pvComponents]]); single-column
    * layouts keep the bare unescaped value so every existing manifest
    * stays valid. Pruning and O(metadata) drops work per COMPONENT: a
    * conjunct on any subset of the partition columns still decides
    * every file's membership outright.
    */
  /** `gen`: the spec's generation (absent = 0). [[evolvePartitionSpec]]
    * replaces the sidecar with generation+1; per-file [[FileEntry.pvg]]
    * stamps tie every pv to the generation that wrote it.
    */
  case class PartitionSpec(col: String, transform: String = "identity",
      cols: Option[Seq[String]] = None,
      transforms: Option[Seq[String]] = None,
      gen: Option[Int] = None)

  /** Does this file's pv stamp belong to `spec`'s generation? (pv-less
    * files trivially don't; a mismatched-era stamp must never be read
    * in the current spec's value space.)
    */
  private[table] def pvCurrent(f: FileEntry, spec: PartitionSpec): Boolean =
    f.pv.isDefined && f.pvg.getOrElse(0) == spec.gen.getOrElse(0) &&
      f.pvf.forall(_ == specFingerprint(spec))

  /** Order-sensitive hash of the spec's VALUE — its component columns
    * and transforms, never the generation counter ([[FileEntry.pvf]]).
    */
  private[table] def specFingerprint(spec: PartitionSpec): Int =
    scala.util.hashing.MurmurHash3.orderedHash(
      partCompsOf(spec).flatMap(c => Seq(c.col, c.transform)))

  /** The layout's components, in order — `Seq(spec)`-shaped for the
    * single-column layout ([[bucketColsOf]]'s contract, mirrored).
    */
  def partCompsOf(spec: PartitionSpec): Seq[PartitionSpec] =
    (spec.cols.filter(_.nonEmpty), spec.transforms.filter(_.nonEmpty)) match {
      case (Some(cs), Some(ts)) =>
        require(cs.length == ts.length,
          s"partition spec: ${cs.length} cols vs ${ts.length} transforms")
        require(cs.headOption.contains(spec.col) &&
            ts.headOption.contains(spec.transform),
          "partition spec: col/transform must head cols/transforms")
        cs.zip(ts).map { case (c, t) => PartitionSpec(c, t) }
      case (None, None) => Seq(PartitionSpec(spec.col, spec.transform))
      case _ => sys.error(
        "partition spec: cols and transforms must be set together")
    }

  /** Escape ONE component value into the tuple-pv alphabet: `%` and
    * the `/` separator become `%25`/`%2F`, everything else verbatim
    * (NullPv's control char included — it contains neither).
    */
  private[table] def pvEscape(v: String): String =
    v.replace("%", "%25").replace("/", "%2F")
  private[table] def pvUnescape(v: String): String =
    v.replace("%2F", "/").replace("%25", "%")

  /** Decode a manifest pv into its `k` components — `None` when the
    * string does not split into exactly `k` parts (a foreign or
    * corrupt pv: callers must treat the file as layout-UNKNOWN, never
    * guess). k=1 is the legacy bare encoding: the pv IS the value.
    */
  private[table] def pvComponents(pv: String, k: Int): Option[Seq[String]] =
    if (k == 1) Some(Seq(pv))
    else {
      val parts = pv.split("/", -1).toSeq
      if (parts.length != k) None else Some(parts.map(pvUnescape))
    }

  /** Manifest sentinel for "every row's partition value is NULL" —
    * leads with a control char no CAST-to-STRING of a supported
    * partition type can produce, so it cannot collide with a real
    * string partition value.
    */
  private[table] val NullPv = "\u0001NULL"

  private def partitionSpecPath(root: String): Path =
    new Path(s"$root/$LogDir", "_partition.json")

  /** The table's partition layout spec, if any — SparkSession-free
    * (the DSv2 scan resolves it at planning time), one existence
    * probe per plan, mirroring [[bucketSpec]].
    */
  def partitionSpec(
      conf: Configuration, root: String): Option[PartitionSpec] = {
    val p = partitionSpecPath(root)
    val f = p.getFileSystem(conf)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val bytes =
        try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
          out.toByteArray
        } finally in.close()
      Some(Serialization.read[PartitionSpec](
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
    }
  }

  private def writePartitionSpec(
      spark: SparkSession, root: String, spec: PartitionSpec): Unit = {
    val p = partitionSpecPath(root)
    val out = fs(spark, p).create(p, false) // never overwrite: immutable
    try out.write(Serialization.write(spec)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** PARTITION-SPEC EVOLUTION — re-partition a table GOING FORWARD
    * with zero data IO: atomically replace the sidecar with `newSpec`
    * at generation latest+1. Every existing file keeps its pv stamp,
    * but the stamp's generation ([[FileEntry.pvg]]) no longer matches,
    * so readers stop trusting it (conservative scan — correct, just
    * unpruned), partition drops rewrite those files SCOPED, and any
    * [[compactPartitions]] (`OPTIMIZE … WHERE`) HEALS them into the
    * new layout era by era — the Iceberg spec-id pattern. New writes
    * stamp pv under the new spec immediately; a concurrent append that
    * read the OLD sidecar stamps the OLD generation and is therefore
    * ignored, never misread — no fence or clearing commit needed.
    * On bucketed tables the evolution COMPOSES (r16): the partition
    * half evolves, the bucket layout stays — refused only when a new
    * component column anchors the bucket spec, is missing, or is of
    * an unsupported type. Returns the new generation.
    */
  def evolvePartitionSpec(
      spark: SparkSession,
      root: String,
      newSpec: PartitionSpec): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    // a bucket layout COMPOSES with partitioning (r16): evolution may
    // add/replace the partition half as long as no column serves both
    // roles — new writes then stamp (pv, bucket) pairs, old files keep
    // their bucket ids and read conservatively in pv space until
    // OPTIMIZE heals them, exactly like any other evolution era
    bucketSpec(conf, root).foreach { b =>
      val overlap =
        bucketColsOf(b).toSet intersect partCompsOf(newSpec).map(_.col).toSet
      require(overlap.isEmpty,
        s"evolvePartitionSpec: column(s) ${overlap.mkString(", ")} " +
          "anchor the table's bucket layout — a column can serve one " +
          "physical layout role, not both")
    }
    val cur = latestManifest(spark, root).getOrElse(
      sys.error(s"no table at $root — create() first"))
    val schema = StructType.fromDDL(cur.schemaDdl)
    val cm = colMapOf(cur)
    val comps = partCompsOf(newSpec)
    require(comps.map(_.col) == comps.map(_.col).distinct,
      "evolvePartitionSpec: duplicate partition column")
    comps.foreach { p =>
      // spec columns are PHYSICAL; the column must be live (mapped
      // from some logical name, or unmapped and present by that name)
      val logical = cm.find(_._2 == p.col).map(_._1).getOrElse(p.col)
      val field = schema.fields.find(_.name == logical).getOrElse(
        sys.error(s"evolvePartitionSpec: column ${p.col} is not in " +
          "the table schema"))
      require(!cm.get(logical).exists(_ != p.col),
        s"evolvePartitionSpec: ${p.col} is not the physical name of " +
          s"live column $logical")
      p.transform match {
        case "identity" =>
          require(Set[DataType](IntegerType, LongType, StringType,
              DateType).contains(field.dataType),
            s"evolvePartitionSpec: ${p.col} type ${field.dataType} is " +
              "not identity-partitionable")
        case "days" =>
          require(field.dataType == TimestampType ||
              field.dataType == TimestampNTZType ||
              field.dataType == DateType,
            s"evolvePartitionSpec: days(${p.col}) needs a time type")
        case t => sys.error(s"unknown partition transform '$t'")
      }
    }
    val oldGen = partitionSpec(conf, root).flatMap(_.gen).getOrElse(0)
    val newGen = oldGen + 1
    val stamped = newSpec.copy(gen = Some(newGen))
    val p = partitionSpecPath(root)
    val tmp = new Path(s"$root/$LogDir",
      s"._partition-${java.util.UUID.randomUUID.toString.take(8)}")
    val f = fs(spark, tmp)
    val out = f.create(tmp, true)
    try out.write(Serialization.write(stamped)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // Read-back-and-verify (ADVICE r15): two concurrent evolutions both
    // read oldGen and both rename gen = oldGen+1 — last wins. The loser
    // must LEARN it lost (its caller would otherwise write under a spec
    // that is not installed). Value-space safety does not depend on
    // this check — pv stamps carry [[specFingerprint]] and mismatched
    // stamps are never trusted — but the loud failure turns a silent
    // lost update into a retryable error.
    val installed = partitionSpec(conf, root)
    if (!installed.contains(stamped))
      throw new java.util.ConcurrentModificationException(
        s"evolvePartitionSpec: concurrent evolution won generation " +
          s"$newGen at $root (installed: $installed) — re-read the " +
          "table's spec and retry")
    newGen
  }

  /** The partition-value expression of a spec as a STRING column —
    * the canonical space [[FileEntry.pv]] lives in. Probe literals
    * must canonicalize through the SAME Spark cast (the scan and the
    * DELETE fast path run a 1-row job for it, the
    * [[snapshotPointEq]] discipline).
    */
  private[table] def partitionValueExpr(
      spec: PartitionSpec): org.apache.spark.sql.Column = {
    def one(c: PartitionSpec): org.apache.spark.sql.Column =
      c.transform match {
        case "identity" => col(c.col).cast("string")
        case "days" => to_date(col(c.col)).cast("string")
        case t => sys.error(s"unknown partition transform '$t' " +
          "(supported: identity, days)")
      }
    partCompsOf(spec) match {
      case Seq(c) => one(c) // legacy bare encoding, manifests unchanged
      case comps =>
        // tuple encoding: per-component NULL sentinel BEFORE the join
        // (concat_ws would silently drop a null and shift positions),
        // %-escaping so a value containing '/' cannot forge a split
        concat_ws("/", comps.map(c =>
          regexp_replace(regexp_replace(
              coalesce(one(c), lit(NullPv)),
            "%", "%25"), "/", "%2F")): _*)
    }
  }

  /** The table's bucket layout spec, if any — SparkSession-free (the
    * DSv2 scan resolves it at planning time). One existence probe per
    * plan; absent for the overwhelmingly common unbucketed table.
    */
  def bucketSpec(conf: Configuration, root: String): Option[BucketSpec] = {
    val p = bucketSpecPath(root)
    val f = p.getFileSystem(conf)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val bytes =
        try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
          out.toByteArray
        } finally in.close()
      Some(Serialization.read[BucketSpec](
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
    }
  }

  private def writeBucketSpec(
      spark: SparkSession, root: String, spec: BucketSpec): Unit = {
    val p = bucketSpecPath(root)
    val out = fs(spark, p).create(p, false) // never overwrite: immutable
    try out.write(Serialization.write(spec)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** PERSISTED TABLE PROPERTIES (`_log/_props.json`) — currently one
    * key, `statsCols`. Unlike `bloomCols` (manifest-carried since the
    * bloom feature), per-file min/max stats were historically a
    * PER-CALL opt-in, which SQL writers cannot pass: an
    * `INSERT INTO cat.t` has no statsCols parameter. A table created
    * through the catalog with `TBLPROPERTIES ('statsCols'='k')`
    * records the opt-in here, and every write path whose caller did
    * NOT pass explicit stats columns falls back to it — explicit
    * arguments still win, so the Scala API behaves exactly as before.
    */
  private def propsPath(root: String): Path =
    new Path(s"$root/$LogDir", "_props.json")

  def tableProps(conf: Configuration, root: String): Map[String, String] = {
    val p = propsPath(root)
    val f = p.getFileSystem(conf)
    if (!f.exists(p)) Map.empty
    else {
      val in = f.open(p)
      val bytes =
        try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
          out.toByteArray
        } finally in.close()
      Serialization.read[Map[String, String]](
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  // overwrite-allowed: the props sidecar is ADVISORY metadata (a
  // default, never a correctness input) and column renames must be
  // able to keep the statsCols names aligned with the live schema
  private[table] def writeTableProps(
      spark: SparkSession, root: String, props: Map[String, String]): Unit = {
    val p = propsPath(root)
    val out = fs(spark, p).create(p, true)
    try out.write(Serialization.write(props)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Effective stats columns for a write: explicit argument wins; an
    * empty argument falls back to the persisted `statsCols` property.
    */
  private def statsColsFor(
      spark: SparkSession, root: String, explicit: Seq[String]): Seq[String] =
    if (explicit.nonEmpty) explicit
    else tableProps(spark.sparkContext.hadoopConfiguration, root)
      .get("statsCols").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** The bucket id `repartition(n, col)` sends a value to: Spark's
    * `HashPartitioning` — Murmur3 (seed 42) of the value, pmod n. The
    * write side relies on Spark's own partitioner for the assignment;
    * this twin exists for the READ side (equality-probe bucket pruning)
    * and for the catalog's `bucket` V2 function, and must match Spark's
    * hash exactly — BucketJoinSpec pins the agreement mechanically.
    * None for types the layout doesn't support (and for NULL, which
    * Spark hashes to the seed — callers treat that as unprunable).
    */
  def bucketOf(value: Any, n: Int): Option[Int] = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    val h: Option[Int] = value match {
      case null => None
      case i: Int => Some(Murmur3_x86_32.hashInt(i, 42))
      case l: Long => Some(Murmur3_x86_32.hashLong(l, 42))
      case s: String =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
        Some(Murmur3_x86_32.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.numBytes, 42))
      case u: org.apache.spark.unsafe.types.UTF8String =>
        Some(Murmur3_x86_32.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.numBytes, 42))
      case d: java.sql.Date =>
        Some(Murmur3_x86_32.hashInt(d.toLocalDate.toEpochDay.toInt, 42))
      case _ => None
    }
    h.map(v => ((v % n) + n) % n)
  }

  /** Base-n composition of a composite layout's per-column bucket ids
    * into the single id [[FileEntry.bucket]] stores (big-endian:
    * first key column is the most significant digit).
    */
  def compositeIdx(ids: Seq[Int], n: Int): Int =
    ids.foldLeft(0)((acc, b) => acc * n + b)

  /** Inverse of [[compositeIdx]]: the k per-column ids of a stored id. */
  def decomposeIdx(idx: Int, n: Int, k: Int): Seq[Int] = {
    var rest = idx
    val out = new Array[Int](k)
    var i = k - 1
    while (i >= 0) { out(i) = rest % n; rest /= n; i -= 1 }
    out.toSeq
  }

  /** Per-column bucket ids of a tuple under a composite spec; None when
    * any value's type is unsupported (NULL hashes to the seed like
    * Spark's single-column HashPartitioning — [[bucketOf]] maps it to
    * None, so a NULL-keyed probe simply never prunes).
    */
  def bucketIdsOf(values: Seq[Any], n: Int): Option[Seq[Int]] = {
    val ids = values.map(bucketOf(_, n))
    if (ids.forall(_.isDefined)) Some(ids.flatten) else None
  }

  /** All committed versions, ascending (one listing of `_log` — used by
    * the admin surfaces, [[history]] and [[vacuum]], where O(commits) is
    * fine; the read path goes through [[latestVersion]]'s O(1) hint).
    */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(root, LogDir)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else
      f.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .collect { case n if n.matches("v\\d{20}\\.json") =>
          n.stripPrefix("v").stripSuffix(".json").toLong
        }
        .sorted
  }

  /** Best-effort latest-version hint (`_log/_LAST`), updated by every
    * commit winner via atomic-overwrite rename. A hint can lag (crash
    * between commit and hint write, or a lost hint race) but can never
    * lead — it is only written AFTER its manifest exists — so readers
    * trust it as a floor and probe forward. Absent/corrupt hint falls
    * back to the full listing.
    */
  private def hintPath(root: String) = new Path(s"$root/$LogDir", "_LAST")

  private def writeHint(spark: SparkSession, root: String, v: Long): Unit =
    try {
      val hint = hintPath(root)
      val tmp = new Path(s"$root/$LogDir",
        s"._last-${java.util.UUID.randomUUID.toString.take(8)}")
      val f = fs(spark, tmp)
      val out = f.create(tmp, true)
      try out.write(v.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      FileContext.getFileContext(hint.toUri,
        spark.sparkContext.hadoopConfiguration)
        .rename(tmp, hint, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch { case _: java.io.IOException => () } // hint is advisory

  private def readHint(spark: SparkSession, root: String): Option[Long] = {
    val hint = hintPath(root)
    val f = fs(spark, hint)
    if (!f.exists(hint)) None
    else
      try {
        val in = f.open(hint)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
        finally in.close()
      } catch { case _: Exception => None }
  }

  /** Latest committed version in O(1) metadata ops: start at the `_LAST`
    * hint and probe forward until the next manifest is absent. At 100 TB
    * with thousands of commits this replaces an O(commits) directory
    * listing on EVERY read with one small file read + the few probes a
    * stale hint costs.
    */
  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    readHint(spark, root) match {
      case Some(h) if fs(spark, manifestPath(root, h))
          .exists(manifestPath(root, h)) =>
        var v = h
        while (fs(spark, manifestPath(root, v + 1))
            .exists(manifestPath(root, v + 1))) v += 1
        Some(v)
      case _ => versions(spark, root).lastOption
    }

  def readManifest(spark: SparkSession, root: String, v: Long): Manifest =
    readManifestCached(fs(spark, manifestPath(root, v)),
      manifestPath(root, v))

  /** IMMUTABLE-MANIFEST CACHE. A committed `vN.json` never changes
    * (the no-overwrite rename IS the commit), and one query plan
    * touches the manifest many times — schema inference, statistics,
    * partitioning report, scan build — while a 100-TB table's
    * manifest holds 10^5–10^6 file entries: re-reading and re-parsing
    * hundreds of MB of JSON per touch is a pure driver bottleneck.
    * The key carries the file's (mtime, length) alongside its path,
    * so a DROP + re-CREATE at the same root (a NEW v0 with different
    * content — the CREATE OR REPLACE path) can never serve stale
    * state: the hit costs one getFileStatus (a metadata RPC), not the
    * read+parse. Eviction is WEIGHT-aware (total cached file entries),
    * since one huge manifest is worth thousands of small ones.
    */
  private val manifestCache =
    new java.util.LinkedHashMap[(String, Long, Long), Manifest](
      64, 0.75f, true)
  private val manifestCacheParses =
    new java.util.concurrent.atomic.AtomicLong(0) // spec observability
  private[table] def manifestParseCount: Long = manifestCacheParses.get
  private val ManifestCacheMaxEntries = 64
  private val ManifestCacheMaxFiles = 2000000L

  private[table] def readManifestCached(
      f: org.apache.hadoop.fs.FileSystem, p: Path): Manifest = {
    val st = f.getFileStatus(p)
    val key = (p.toString, st.getModificationTime, st.getLen)
    val hit = manifestCache.synchronized(manifestCache.get(key))
    if (hit != null) return hit
    // parse OUTSIDE the lock (concurrent misses on different tables
    // must not serialize); a racing duplicate parse is benign
    val in = f.open(p)
    val m =
      try Serialization.read[Manifest](new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    manifestCacheParses.incrementAndGet()
    manifestCache.synchronized {
      manifestCache.put(key, m)
      var totalFiles = 0L
      val it0 = manifestCache.values().iterator()
      while (it0.hasNext) totalFiles += it0.next().files.size
      val it = manifestCache.entrySet().iterator()
      while (it.hasNext &&
          (manifestCache.size() > ManifestCacheMaxEntries ||
            totalFiles > ManifestCacheMaxFiles)) {
        val e = it.next()
        if (!(e.getKey == key)) { // never evict what we just inserted
          totalFiles -= e.getValue.files.size
          it.remove()
        }
      }
    }
    m
  }

  private def latestManifest(
      spark: SparkSession, root: String): Option[Manifest] =
    latestVersion(spark, root).map(readManifest(spark, root, _))

  /** Per-root in-process commit mutex. The no-overwrite rename is the
    * cross-PROCESS claim (server-side atomic on HDFS), but the local
    * filesystem's FileContext.rename is a non-atomic exists-check +
    * rename, so two committers in ONE JVM could both "win" a version.
    * A JVM lock closes that window exactly where it exists; it costs
    * nothing on a cluster, where contention is cross-process and the
    * store's rename semantics are the arbiter.
    */
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Atomically claim version `m.version`: false = lost the race. */
  private def tryCommit(
      spark: SparkSession, root: String, m: Manifest): Boolean = {
    val dest = manifestPath(root, m.version)
    val logDir = new Path(root, LogDir)
    val f = fs(spark, logDir)
    f.mkdirs(logDir)
    val tmp = new Path(logDir,
      s".tmp-${java.util.UUID.randomUUID.toString.take(12)}.json")
    val out = f.create(tmp, true)
    try out.write(Serialization.write(m)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    commitLocks.computeIfAbsent(root, _ => new Object).synchronized {
      try {
        if (f.exists(dest)) { f.delete(tmp, false); return false }
        // Default Rename.NONE: throws if dest exists — the atomic claim.
        FileContext.getFileContext(dest.toUri,
          spark.sparkContext.hadoopConfiguration).rename(tmp, dest)
        writeHint(spark, root, m.version) // advisory; AFTER the commit
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.nio.file.FileAlreadyExistsException |
            _: org.apache.hadoop.fs.ParentNotDirectoryException =>
          f.delete(tmp, false); false
        case _: java.io.IOException if fs(spark, dest).exists(dest) =>
          f.delete(tmp, false); false
      }
    }
  }

  /** Stats expression for `field` in double-comparable space; None for
    * types without a meaningful total order here (arrays, maps, ...).
    */
  private def statsExpr(field: StructField): Option[org.apache.spark.sql.Column] =
    field.dataType match {
      case _: NumericType => Some(col(field.name).cast("double"))
      case TimestampType | TimestampNTZType =>
        Some(unix_micros(col(field.name).cast(TimestampType)).cast("double"))
      case DateType => Some(unix_date(col(field.name)).cast("double"))
      case _ => None
    }

  /** Per-file bloom filter internals. Fixed geometry: 2^15 bits (4 KB,
    * ~5.5 KB base64 per file per column) with 4 probes taken from
    * DISJOINT 15-bit fields of one xxhash64 — no multiply-add position
    * derivation, so nothing can overflow and the probe side recomputes
    * positions with two shifts and a mask. Values are hashed through
    * `CAST(col AS STRING)` so one canonical byte form serves every
    * column type; the probe hashes its literal through the same cast.
    * At ~1.4k distinct values per file the false-positive rate is
    * ~1e-3; past ~5k values per file it degrades gracefully toward
    * "keep the file", which is merely the no-bloom behavior.
    */
  private[table] object Bloom {
    val Bits = 1 << 15
    val Words: Int = Bits / 64
    val K = 4
    @inline private def pos(h: Long, i: Int): Int =
      ((h >>> (15 * i)) & (Bits - 1)).toInt
    def set(words: Array[Long], h: Long): Unit = {
      var i = 0
      while (i < K) {
        val p = pos(h, i); words(p >> 6) |= (1L << (p & 63)); i += 1
      }
    }
    def mightContain(words: Array[Long], h: Long): Boolean = {
      var i = 0
      while (i < K) {
        val p = pos(h, i)
        if ((words(p >> 6) & (1L << (p & 63))) == 0L) return false
        i += 1
      }
      true
    }
    def toB64(words: Array[Long]): String = {
      val bb = java.nio.ByteBuffer.allocate(words.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      words.foreach(bb.putLong)
      java.util.Base64.getEncoder.encodeToString(bb.array)
    }
    def fromB64(s: String): Array[Long] = {
      val bytes = java.util.Base64.getDecoder.decode(s)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val w = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < w.length) { w(i) = bb.getLong; i += 1 }
      w
    }
  }

  /** Typed aggregator folding xxhash64 values into a bloom bitset —
    * runs inside the same per-file stats pass as min/max, so bloom
    * maintenance adds zero extra scans.
    */
  private class BloomAgg
      extends org.apache.spark.sql.expressions.Aggregator[
        java.lang.Long, Array[Long], Array[Byte]] {
    def zero: Array[Long] = new Array[Long](Bloom.Words)
    def reduce(b: Array[Long], h: java.lang.Long): Array[Long] = {
      if (h != null) Bloom.set(b, h.longValue)
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(b.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.foreach(bb.putLong)
      bb.array
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.Encoders.kryo[Array[Long]]
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    }

  private def bloomColsOf(m: Manifest): Seq[String] =
    m.bloomCols.getOrElse(Nil)

  private def colMapOf(m: Manifest): Map[String, String] =
    m.colMap.getOrElse(Map.empty)

  /** Physical (file-side) name of a logical column — identity unless a
    * rename mapped it. */
  private[table] def physNameIn(m: Manifest, logical: String): String =
    colMapOf(m).getOrElse(logical, logical)

  /** Rename a logical-named df to the physical file-side names, so new
    * data files keep writing a renamed column under its ORIGINAL
    * physical name — one read schema then serves every file generation.
    */
  private def toPhysical(df: DataFrame, cm: Map[String, String]): DataFrame =
    if (cm.isEmpty) df
    else df.select(df.columns.toSeq.map(c =>
      col(c).as(cm.getOrElse(c, c))): _*)

  /** Refuse NEW logical columns whose name is still occupied as a
    * physical name in live data files (a renamed column's original name,
    * or a dropped column's) — mapping them identity would read the OLD
    * column's bytes into the new column. `compact()` materializes the
    * mapping and frees the names.
    */
  private def checkNewCols(cur: Manifest, curSchema: StructType,
      merged: StructType): Unit = {
    val occupied = (colMapOf(cur).values ++ cur.retired.getOrElse(Nil)).toSet
    val fresh = merged.fieldNames.filterNot(curSchema.fieldNames.contains)
    val bad = fresh.filter(occupied.contains)
    require(bad.isEmpty,
      s"new column(s) ${bad.mkString(", ")} collide with physical names " +
        "still carried by existing data files (a renamed or dropped " +
        "column used that name) — choose different names or compact() " +
        "to materialize the column mapping first")
  }

  /** Spark datatypes whose parquet footer min/max are EXACT and
    * bit-identical to the scan-pass `statsExpr` double space: fixed-
    * width integral primitives (INT32/INT64 footer stats are never
    * truncated — truncation applies only to BINARY), dates (INT32
    * days == `unix_date`) and instant timestamps (INT64 micros ==
    * `unix_micros`, session-tz independent). long→double is monotone
    * non-decreasing, so min(double(x)) == double(min(x)) — footer
    * mins/maxes land on the same doubles the scan pass computes.
    * Excluded on purpose: float/double (the scan pass drops a file's
    * stats when ANY value is NaN; footer NaN behavior is writer-
    * version-dependent, and a NaN-excluding footer max would let
    * `c > x` prune a file whose NaN rows qualify), decimals (three
    * physical encodings), NTZ timestamps (`statsExpr` routes them
    * through the session timezone).
    */
  private def footerExactType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType => true
    case _ => false
  }

  /** Thrown when a footer lacks something the stats contract needs —
    * caught by [[footerEntries]], which then falls back wholesale.
    */
  private final class FooterBail extends RuntimeException

  /** Per-file manifest entries recovered from parquet FOOTERS instead
    * of the re-scan job (guide §6 — stop re-reading every written byte
    * to learn what was just written): row counts, per-column min/max
    * and null counts all live in the footer metadata the write tasks
    * already produced, so eligible layouts pay O(KB) of footer I/O per
    * file instead of a full Spark job over the new files. Eligible =
    * flat or single-key-bucket layouts (bucket id comes from the
    * part-file name, not the data), no bloom columns, and only
    * [[footerExactType]] stats columns. ALL-OR-NOTHING: any missing
    * footer stat, unexpected physical type or read error returns None
    * and the caller runs the scan job for the whole file set — a
    * manifest never mixes footer-derived and scan-derived semantics.
    */
  private def footerEntries(
      spark: SparkSession,
      rel: String,
      parts: Seq[org.apache.hadoop.fs.FileStatus],
      subOf: Path => String,
      schema: StructType,
      statsFields: Seq[String],
      bucket: Option[BucketSpec]): Option[Seq[FileEntry]] = {
    if (statsFields.exists(n => !footerExactType(schema(n).dataType)))
      return None
    val conf = spark.sparkContext.hadoopConfiguration
    val partIdx = "part-(\\d+)-.*".r
    def bucketIdOf(name: String): Option[Int] =
      bucket.flatMap(_ => name match {
        case partIdx(i) => Some(i.toInt)
        case _ => None
      })
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation
    def bail(): Nothing = throw new FooterBail
    // footer value → the scan pass's double space; bails on any
    // encoding statsExpr's cast chain would not have produced
    def toD(dt: DataType,
        pt: org.apache.parquet.schema.PrimitiveType, v: Any): Double =
      (dt, pt.getPrimitiveTypeName, pt.getLogicalTypeAnnotation) match {
        case (ByteType | ShortType | IntegerType,
            PrimitiveTypeName.INT32, a)
            if a == null || (a match {
              case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
                i.isSigned && i.getBitWidth <= 32
              case _ => false
            }) =>
          v.asInstanceOf[java.lang.Integer].intValue.toDouble
        case (DateType, PrimitiveTypeName.INT32,
            _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
          v.asInstanceOf[java.lang.Integer].intValue.toDouble
        case (LongType, PrimitiveTypeName.INT64, a)
            if a == null || (a match {
              case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation =>
                i.isSigned && i.getBitWidth == 64
              case _ => false
            }) =>
          v.asInstanceOf[java.lang.Long].longValue.toDouble
        case (TimestampType, PrimitiveTypeName.INT64,
            t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
            if t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS =>
          v.asInstanceOf[java.lang.Long].longValue.toDouble
        case _ => bail() // INT96 timestamps, unsigned ints, anything else
      }
    def entryOf(st: org.apache.hadoop.fs.FileStatus): FileEntry = {
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try {
        import scala.jdk.CollectionConverters._
        val blocks = rd.getFooter.getBlocks.asScala.toSeq
        val rowsN = blocks.map(_.getRowCount).sum
        val name = st.getPath.getName
        val sub = subOf(st.getPath)
        if (rowsN == 0L)
          // mirror the scan pass exactly: a zero-row file gets no
          // stats and no nulls map (it never appeared in `byFile`)
          FileEntry(s"$rel/$sub", 0L, st.getLen, Map.empty,
            bucket = bucketIdOf(name))
        else {
          val perCol = statsFields.map { n =>
            val dt = schema(n).dataType
            var nn = 0L
            var mi = Double.NaN
            var ma = Double.NaN
            var seen = false
            blocks.foreach { b =>
              val cc = b.getColumns.asScala
                .find(_.getPath.toDotString == n).getOrElse(bail())
              val s = cc.getStatistics
              if (s == null || !s.isNumNullsSet || s.getNumNulls < 0)
                bail()
              val chunkNn = b.getRowCount - s.getNumNulls
              nn += chunkNn
              if (chunkNn > 0) {
                if (!s.hasNonNullValue) bail()
                val lo = toD(dt, cc.getPrimitiveType, s.genericGetMin())
                val hi = toD(dt, cc.getPrimitiveType, s.genericGetMax())
                if (!seen) { mi = lo; ma = hi; seen = true }
                else { mi = math.min(mi, lo); ma = math.max(ma, hi) }
              }
            }
            (n, nn, if (seen) Some(ColStats(mi, ma)) else None)
          }
          val stats = perCol.flatMap { case (n, _, cs) =>
            cs.map(n -> _)
          }.toMap
          val nulls = perCol.map { case (n, nn, _) =>
            n -> (rowsN - nn)
          }.toMap
          FileEntry(s"$rel/$sub", rowsN, st.getLen, stats,
            bucket = bucketIdOf(name),
            nulls = if (nulls.isEmpty) None else Some(nulls))
        }
      } finally rd.close()
    }
    try Some(parts.map(entryOf))
    catch { case _: FooterBail => None }
  }

  /** Write `df` as a fresh immutable file set under `data/` and return
    * its manifest entries. ONE extra pass over exactly the new files
    * (grouped by `input_file_name`, ~one row per written file) collects
    * row counts and min/max stats — never a driver-side loop over
    * files, never a second scan of pre-existing table data. r17: for
    * footer-exact layouts (see [[footerEntries]]) that pass reads only
    * the parquet footers the write already produced — no data re-read
    * at all (`spark.graft.write.footerStats=false` restores the scan
    * job; both paths emit identical manifests, pinned by
    * TableFooterStatsSpec).
    */
  private def writeFiles(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      statsCols: Seq[String],
      tag: String,
      bloomCols: Seq[String] = Nil,
      bucket: Option[BucketSpec] = None,
      partition: Option[PartitionSpec] = None): Seq[FileEntry] = {
    val rel = s"$DataDir/c$tag-${java.util.UUID.randomUUID.toString.take(8)}"
    val dir = new Path(root, rel)
    // Bucketed layout: route rows through Spark's own HashPartitioning
    // (repartition(n, col) ⇒ partition index = pmod(murmur3(col), n)) so
    // the task partition id IS the bucket id — recovered below from the
    // `part-NNNNN` file prefix each task stamps. Degrades to an
    // unbucketed write when the column is absent from this df's schema
    // (an evolution-era append predating the column): readers detect
    // unbucketed files and fall back rather than trust a wrong id.
    val bucketed = bucket.filter(b =>
      bucketColsOf(b).forall(df.columns.contains))
    // Identity/date partition layout: rows shuffle by partition value,
    // then Spark's dynamic-partition write (`partitionBy` on a derived
    // column the data files do NOT carry — the real column stays in
    // the data) splits each task's rows so every file holds exactly
    // ONE value. Composes with a bucket layout (create() validates the
    // column sets are disjoint): the composed branch below routes by
    // BOTH derived columns. Same evolution degradation as buckets when
    // the column is absent from this df.
    val parted = partition.filter(p =>
      partCompsOf(p).forall(c => df.columns.contains(c.col)))
    val pvCol = "_graft_pv"
    val bkCol = "_graft_bk"
    // Composite (multi-key) bucket layouts: each key column buckets
    // independently (pmod(hash(c), n) — hash() IS HashPartitioning's
    // murmur3-seed-42) and the base-n composite id routes the rows
    // through the same dynamic-partition split the identity layout
    // uses, so every file holds exactly ONE (b1, …, bk) tuple; the id
    // is recovered from the data in the stats pass below.
    def compositeIdxExpr(b: BucketSpec): org.apache.spark.sql.Column =
      bucketColsOf(b).map(c => pmod(hash(col(c)), lit(b.n)))
        .reduce((acc, x) => acc * lit(b.n) + x)
    val bucketedMulti = bucketed.filter(b => bucketColsOf(b).length > 1)
    // the dynamic-partition routing columns are table-format internals:
    // a user column with the same name would be silently REPLACED by
    // withColumn and its data lost — refuse loudly instead
    if (parted.isDefined || bucketedMulti.isDefined)
      Seq(pvCol, bkCol).filter(df.columns.contains).foreach(c =>
        sys.error(s"column name '$c' is reserved by the graft " +
          "partition/bucket layout routing — rename the column"))
    (parted, bucketed) match {
      case (Some(p), Some(b)) =>
        // COMPOSED layout: one dynamic split over BOTH derived routing
        // columns — every file holds exactly one (pv tuple, bucket id)
        // pair, so partition pruning and the storage-partitioned join
        // index the same file set. The bucket id is recovered from the
        // DATA below (the single-key name-prefix trick doesn't survive
        // the two-column routing); sort inside each file by the bucket
        // keys for the scan's per-partition-ordering claim.
        df.withColumn(pvCol, partitionValueExpr(p))
          .withColumn(bkCol, compositeIdxExpr(b))
          .repartition(col(pvCol), col(bkCol))
          .sortWithinPartitions(
            col(pvCol) +: col(bkCol) +: bucketColsOf(b).map(col): _*)
          .write.partitionBy(pvCol, bkCol).parquet(dir.toString)
      case (Some(p), None) =>
        df.withColumn(pvCol, partitionValueExpr(p))
          .repartition(col(pvCol))
          .write.partitionBy(pvCol).parquet(dir.toString)
      case (None, Some(b)) if bucketedMulti.isDefined =>
        df.withColumn(bkCol, compositeIdxExpr(b))
          .repartition(col(bkCol))
          .sortWithinPartitions(
            col(bkCol) +: bucketColsOf(b).map(col): _*)
          .write.partitionBy(bkCol).parquet(dir.toString)
      case (None, Some(b)) =>
        // sort inside each bucket file (cheap: per-task, in-memory) —
        // what lets the scan report a per-partition ordering and a
        // co-bucketed SMJ skip its sorts
        val c0 = col(bucketColsOf(b).head)
        df.repartition(b.n, c0).sortWithinPartitions(c0)
          .write.parquet(dir.toString)
      case _ =>
        df.write.parquet(dir.toString)
    }

    val f = fs(spark, dir)
    // partitioned writes land one directory level down (`_graft_pv=v/
    // part-*`), where FILE NAMES repeat across value dirs (one task
    // writes its name into every value it holds) — so files are keyed
    // by their dir-relative SUBPATH, which is also what the manifest
    // records. Flat writes: subpath == name, unchanged behavior.
    val dirAbs = dir.toUri.getPath.stripSuffix("/")
    def subOf(p: Path): String =
      p.toUri.getPath.stripPrefix(dirAbs).stripPrefix("/")
    val parts: Seq[org.apache.hadoop.fs.FileStatus] = {
      val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
      val it = f.listFiles(dir, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          out += st
      }
      out.result().sortBy(st => subOf(st.getPath))
    }

    val fields = statsCols.flatMap(c =>
      df.schema.fields.find(_.name == c).flatMap(fd =>
        statsExpr(fd).map(e => (fd.name, e))))
    // bloom columns present in this write's schema (evolution: an older
    // writer's df may predate the column — its files simply get no bloom)
    val bloomFields = bloomCols.filter(c => df.schema.fields.exists(_.name == c))
    // r17 (guide §6, VERDICT item 6): footer fast path — layouts whose
    // manifest entries are fully recoverable from parquet footers skip
    // the stats re-scan job entirely. Partitioned/composite layouts
    // (pv/bk recovered from DATA by design), bloom columns and
    // non-footer-exact stats types fall through to the scan job.
    if (parted.isEmpty && bucketedMulti.isEmpty && bloomFields.isEmpty &&
        spark.conf.get("spark.graft.write.footerStats", "true") == "true") {
      footerEntries(spark, rel, parts, subOf, df.schema,
        fields.map(_._1), bucketed) match {
        case Some(entries) => return entries
        case None => () // footer gap — fall back to the scan pass
      }
    }
    val bloomUdaf = udaf(new BloomAgg,
      org.apache.spark.sql.Encoders.LONG)
    val aggs = ((count(lit(1)).as("_rows") +:
      fields.flatMap { case (n, e) =>
        // count(col) is the NON-NULL count: rows − it = the null count
        // (free in the same pass; an all-null file has no min/max but
        // its null count still indexes IS [NOT] NULL probes)
        Seq(min(e).as(s"_min_$n"), max(e).as(s"_max_$n"),
          count(col(n)).as(s"_nn_$n"))
      }) ++ bloomFields.map(c =>
        bloomUdaf(xxhash64(col(c).cast("string"))).as(s"_bloom_$c"))) ++
      // partition value recovered from the DATA in the same pass (not
      // parsed out of escaped dir names): per-file min==max by the
      // partitionBy split's construction; the agg proves it anyway
      parted.toSeq.flatMap { p =>
        val e = partitionValueExpr(p)
        Seq(min(e).as("_pv_min"), max(e).as("_pv_max"),
          count(e).as("_pv_nn"))
      } ++
      // composite and composed-layout bucket ids recovered the same
      // way (single-valued per file by the partitionBy split's
      // construction)
      bucketed.filter(_ => bucketedMulti.isDefined || parted.isDefined)
        .toSeq.flatMap { b =>
          val e = compositeIdxExpr(b)
          Seq(min(e).as("_bk_min"), max(e).as("_bk_max"))
        }
    // input_file_name() returns a URI STRING with %-ENCODED path
    // characters (a space in a partition value arrives as %20), while
    // the listing side carries the real filesystem characters — keying
    // the join on the raw string silently missed every such file, so
    // its entry recorded rows=0 with no stats/pv (and a partition DROP
    // of that value became a no-op). Decode through java.net.URI.
    def decodeInputFileName(u: String): Path =
      try {
        val uri = new java.net.URI(u)
        if (uri.getPath != null) new Path(uri.getPath) else new Path(u)
      } catch { case _: java.net.URISyntaxException => new Path(u) }
    val byFile: Map[String, Row] =
      if (parts.isEmpty) Map.empty
      else spark.read.parquet(dir.toString)
        .groupBy(input_file_name().as("_file"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => subOf(decodeInputFileName(r.getString(0))) -> r)
        .toMap

    val partIdx = "part-(\\d+)-.*".r
    // single-key layouts: the repartition(n, col) task index IS the
    // bucket id, stamped in the part-file prefix; composite layouts:
    // the id comes from the data agg (min==max per file by the
    // dynamic split's construction — anything else gets no id and
    // readers fall back)
    def bucketIdOf(name: String, r: Option[Row]): Option[Int] =
      if (bucketedMulti.isDefined ||
          (bucketed.isDefined && parted.isDefined)) r.flatMap { row =>
        val mi = row.getAs[Any]("_bk_min")
        val ma = row.getAs[Any]("_bk_max")
        if (mi != null && mi == ma)
          Some(mi.asInstanceOf[Number].intValue)
        else None
      }
      else bucketed.flatMap(_ => name match {
        case partIdx(i) => Some(i.toInt)
        case _ => None
      })
    def pvOf(r: Row, rowsN: Long): Option[String] =
      parted.flatMap { _ =>
        val nn = r.getAs[Long]("_pv_nn")
        if (nn == 0L) Some(NullPv)
        else {
          val mi = r.getAs[String]("_pv_min")
          val ma = r.getAs[String]("_pv_max")
          // single-valued with no null admixture, or no claim at all
          if (nn == rowsN && mi != null && mi == ma) Some(mi) else None
        }
      }
    parts.map { st =>
      val sub = subOf(st.getPath)
      val name = st.getPath.getName
      byFile.get(sub) match {
        case Some(r) =>
          val stats = fields.flatMap { case (n, _) =>
            val mi = r.getAs[Any](s"_min_$n")
            val ma = r.getAs[Any](s"_max_$n")
            // NaN poisons the column's stats for this file: Spark's
            // min/max order NaN largest, so max=NaN whenever any value
            // is NaN — ColStats(…, NaN) is not valid JSON and a
            // NaN-excluding window would let `c > x` prune a file
            // whose NaN rows qualify. No stats = never pruned = sound.
            if (mi == null || ma == null ||
                mi.asInstanceOf[Double].isNaN ||
                ma.asInstanceOf[Double].isNaN) None
            else Some(n -> ColStats(
              mi.asInstanceOf[Double], ma.asInstanceOf[Double]))
          }.toMap
          val blooms = bloomFields.flatMap { c =>
            Option(r.getAs[Array[Byte]](s"_bloom_$c")).map(bytes =>
              c -> java.util.Base64.getEncoder.encodeToString(bytes))
          }.toMap
          val rowsN = r.getAs[Long]("_rows")
          val nulls = fields.map { case (n, _) =>
            n -> (rowsN - r.getAs[Long](s"_nn_$n"))
          }.toMap
          val pvv = pvOf(r, rowsN)
          FileEntry(s"$rel/$sub", rowsN, st.getLen, stats,
            if (blooms.isEmpty) None else Some(blooms),
            bucket = bucketIdOf(name, Some(r)),
            nulls = if (nulls.isEmpty) None else Some(nulls),
            pv = pvv,
            // generation stamp rides only post-evolution writes (gen
            // 0 stays absent, so pre-field manifests are byte-stable);
            // the spec fingerprint rides the same writes, tying the pv
            // to the spec VALUE, not just the collision-prone counter
            pvg = pvv.flatMap(_ =>
              parted.flatMap(_.gen).filter(_ != 0)),
            pvf = pvv.flatMap(_ =>
              parted.filter(_.gen.exists(_ != 0)).map(specFingerprint)))
        case None =>
          // zero-row part files exist only on the FLAT write path
          // (tasks with no rows); the dynamic-partition paths write a
          // file only when rows land in it, so a miss there is the
          // stats-join losing a file — refuse loudly rather than
          // commit a rows=0 entry whose partition silently stops
          // dropping/pruning (the %-encoding bug this guard caught)
          if (parted.isDefined || bucketedMulti.isDefined)
            sys.error(s"writeFiles: stats pass lost track of $sub — " +
              "file-name keying bug; refusing to commit a zero-row " +
              "entry for a data-bearing file")
          FileEntry(s"$rel/$sub", 0L, st.getLen, Map.empty,
            bucket = bucketIdOf(name, None))
      }
    }
  }

  /** Field-by-name schema union: existing fields keep their position and
    * type; genuinely new fields append. Changing an existing column's
    * type is refused — that is a rewrite, not an evolution.
    */
  private def mergeSchemas(old: StructType, nw: StructType): StructType = {
    nw.fields.foreach { f =>
      old.fields.find(_.name == f.name).foreach { o =>
        require(o.dataType == f.dataType,
          s"schema evolution cannot change ${f.name}: " +
            s"${o.dataType} -> ${f.dataType}")
      }
    }
    StructType(old.fields ++ nw.fields.filterNot(f =>
      old.fieldNames.contains(f.name)))
  }

  /** Align `df` to `schema`: missing columns become typed nulls, order
    * follows `schema`. (How an evolved-schema append fills old columns.)
    */
  private def conform(df: DataFrame, schema: StructType): DataFrame =
    df.select(schema.fields.toSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)

  /** Create the table at version 0. Fails if the table exists. */
  /** CHECK-constraint enforcement over incoming rows: ONE aggregation
    * pass counts violations of every named predicate; any violation
    * aborts BEFORE a manifest could publish the rows. SQL-standard CHECK
    * semantics — a NULL predicate result passes, only FALSE violates.
    * Existing table data is never re-checked (it passed at its own
    * commit), so enforcement is priced O(incoming), not O(table).
    */
  private def enforceConstraints(
      df: DataFrame, cs: Map[String, String]): Unit = {
    if (cs.isEmpty) return
    val aggs = cs.toSeq.map { case (n, sql) =>
      sum(when(coalesce(expr(sql), lit(true)), 0L).otherwise(1L)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val bad = cs.keys.toSeq.sorted
      .map(n => n -> row.getAs[Long](n)).filter(_._2 > 0)
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        "constraint violation(s), commit aborted: " + bad.map {
          case (n, c) => s"$n [${cs(n)}]: $c row(s)"
        }.mkString("; "))
  }

  private def constraintsOf(m: Manifest): Map[String, String] =
    m.constraints.getOrElse(Map.empty)

  def create(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      statsCols: Seq[String] = Seq.empty,
      constraints: Map[String, String] = Map.empty,
      bloomCols: Seq[String] = Seq.empty,
      bucketBy: Option[BucketSpec] = None,
      partitionBy: Option[PartitionSpec] = None): Long = {
    require(latestVersion(spark, root).isEmpty,
      s"table already exists at $root")
    // COMPOSED layouts (r15 VERDICT ask #8): partition + bucket in one
    // table — `PARTITIONED BY (days(ts), bucket(n, id))` — is the
    // canonical 100-TB fact layout: partition pruning bounds the scan
    // to the probed days, the bucket layout joins zero-exchange inside
    // them. Every data file holds exactly ONE (pv tuple, bucket id)
    // pair; the only constraint is that a column cannot serve both
    // roles (its file placement would be over-constrained).
    for (b <- bucketBy; p <- partitionBy) {
      val overlap =
        bucketColsOf(b).toSet intersect partCompsOf(p).map(_.col).toSet
      require(overlap.isEmpty,
        s"column(s) ${overlap.mkString(", ")} appear in BOTH the " +
          "bucket and the partition spec — a column can anchor one " +
          "physical layout role, not both")
    }
    bucketBy.foreach { b =>
      require(b.n > 0 && b.n <= 100000,
        s"bucketBy: bucket count must be in [1, 100000], got ${b.n}")
      val bcols = bucketColsOf(b)
      require(bcols == bcols.distinct,
        s"bucketBy: duplicate bucket column in ${bcols.mkString(", ")}")
      require(math.pow(b.n.toDouble, bcols.length.toDouble) <= 100000,
        s"bucketBy: n^k = ${b.n}^${bcols.length} exceeds 100000 " +
          "partitions — choose a smaller n or fewer key columns")
      require(b.cols.forall(_.headOption.contains(b.col)),
        "bucketBy: spec.col must be the first of spec.cols")
      bcols.foreach { c =>
        val field = df.schema.fields.find(_.name == c).getOrElse(
          sys.error(s"bucketBy column $c is not in the data"))
        // only types the catalog's V2 bucket function can bind: a
        // layout on any other type would record a partitioning the
        // storage-partitioned join can never resolve
        require(Set[DataType](IntegerType, LongType, StringType,
            DateType).contains(field.dataType),
          s"bucketBy column $c: type ${field.dataType} is not " +
            "bucketable — supported: INT, BIGINT, STRING, DATE")
      }
    }
    partitionBy.foreach { spec =>
      val comps = partCompsOf(spec) // validates cols/transforms shape
      require(comps.map(_.col) == comps.map(_.col).distinct,
        s"partitionBy: duplicate partition column in " +
          comps.map(_.col).mkString(", "))
      comps.foreach { p =>
        val field = df.schema.fields.find(_.name == p.col).getOrElse(
          sys.error(s"partitionBy column ${p.col} is not in the data"))
        // identity: types whose CAST AS STRING the scan's probe
        // canonicalization provably replicates; days: time types only
        p.transform match {
          case "identity" =>
            require(Set[DataType](IntegerType, LongType, StringType,
                DateType).contains(field.dataType),
              s"partitionBy column ${p.col}: type ${field.dataType} is " +
                "not identity-partitionable — supported: INT, BIGINT, " +
                "STRING, DATE")
          case "days" =>
            require(field.dataType == TimestampType ||
                field.dataType == TimestampNTZType ||
                field.dataType == DateType,
              s"partitionBy days(${p.col}): type ${field.dataType} is " +
                "not a time type — supported: TIMESTAMP, DATE")
          case t => sys.error(s"unknown partition transform '$t' " +
            "(supported: identity, days)")
        }
      }
    }
    enforceConstraints(df, constraints)
    val files = writeFiles(spark, root, df, statsCols, "0", bloomCols,
      bucketBy, partitionBy)
    val m = Manifest(0L, "create", System.currentTimeMillis(),
      df.schema.toDDL, files,
      constraints = if (constraints.isEmpty) None else Some(constraints),
      bloomCols = if (bloomCols.isEmpty) None else Some(bloomCols))
    require(tryCommit(spark, root, m),
      s"concurrent create at $root") // create races don't retry
    // sidecar lands ONLY after the commit won: a failed or lost create
    // can never leave an orphan spec that blocks a retry or haunts an
    // unbucketed re-create. (An append racing into the tiny commit→
    // sidecar window writes unbucketed files; readers detect that and
    // fall back — sound, and the next rewrite heals it.) The `sorted`
    // flag records that every layout writer sorts within buckets.
    bucketBy.foreach(b =>
      writeBucketSpec(spark, root, b.copy(sorted = Some(true))))
    partitionBy.foreach(p => writePartitionSpec(spark, root, p))
    0L
  }

  /** Append rows. New files are written ONCE; only the cheap manifest
    * merge retries on a lost commit race (appends commute, so no
    * recompute is needed — this is why high-frequency ingest into one
    * table scales: N writers serialize on a manifest rename, not on
    * data rewrites).
    *
    * Schema evolution: `df` may carry extra columns (appended to the
    * table schema) or omit existing ones (filled with nulls).
    */
  def append(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      statsCols: Seq[String] = Seq.empty): Long = {
    val base = latestManifest(spark, root).getOrElse(
      sys.error(s"no table at $root — create() first"))
    enforceConstraints(df, constraintsOf(base))
    val baseSchema = StructType.fromDDL(base.schemaDdl)
    val merged = mergeSchemas(baseSchema, df.schema)
    checkNewCols(base, baseSchema, merged)
    val cm = colMapOf(base)
    val v0 = base.version + 1
    val files = writeFiles(spark, root,
      toPhysical(conform(df, merged), cm),
      statsColsFor(spark, root, statsCols).map(c => cm.getOrElse(c, c)),
      v0.toString, bloomColsOf(base).map(c => cm.getOrElse(c, c)),
      bucketSpec(spark.sparkContext.hadoopConfiguration, root),
      partitionSpec(spark.sparkContext.hadoopConfiguration, root))
    var v = v0
    while (!tryCommit(spark, root, {
        val cur = readManifest(spark, root, v - 1)
        val curSchema = StructType.fromDDL(cur.schemaDdl)
        require(colMapOf(cur) == cm,
          "concurrent column rename/drop during append — retry the append")
        Manifest(v, "append", System.currentTimeMillis(),
          mergeSchemas(curSchema, merged).toDDL, cur.files ++ files,
          cur.streamHwm, cur.constraints, cur.bloomCols,
          cur.colMap, cur.retired)
      })) {
      v = latestVersion(spark, root).get + 1
    }
    v
  }

  /** EXACTLY-ONCE streaming append (the foreachBatch sink op): commit
    * `df` as micro-batch `batchId` unless a manifest already records
    * that id (or a later one) in `streamHwm` — a crash-replayed batch
    * is a no-op, and because the fence and the files land in the same
    * atomic manifest rename, there is NO window where data committed
    * but the fence didn't (DeltaLog's two-step append+mark has one,
    * documented there). Creates the table on the first batch. Returns
    * the committed version, or None for a skipped replay.
    */
  def appendBatch(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      batchId: Long,
      statsCols: Seq[String] = Seq.empty): Option[Long] = {
    val base = latestManifest(spark, root)
    if (base.exists(_.streamHwm.exists(_ >= batchId))) return None
    base.foreach(b => enforceConstraints(df, constraintsOf(b)))
    val merged = base.map(b =>
      mergeSchemas(StructType.fromDDL(b.schemaDdl), df.schema))
      .getOrElse(df.schema)
    base.foreach(b =>
      checkNewCols(b, StructType.fromDDL(b.schemaDdl), merged))
    val cmB = base.map(colMapOf).getOrElse(Map.empty[String, String])
    val files = writeFiles(spark, root,
      toPhysical(conform(df, merged), cmB),
      statsColsFor(spark, root, statsCols).map(c => cmB.getOrElse(c, c)),
      s"b$batchId",
      base.map(bloomColsOf).getOrElse(Nil).map(c => cmB.getOrElse(c, c)),
      bucketSpec(spark.sparkContext.hadoopConfiguration, root),
      partitionSpec(spark.sparkContext.hadoopConfiguration, root))
    var result: Option[Long] = None
    var done = false
    while (!done) {
      val cur = latestManifest(spark, root)
      if (cur.exists(_.streamHwm.exists(_ >= batchId))) {
        done = true // concurrent replay won; our files await vacuum()
      } else {
        val v = cur.map(_.version + 1).getOrElse(0L)
        val schema = cur.map(c =>
          mergeSchemas(StructType.fromDDL(c.schemaDdl), merged))
          .getOrElse(merged)
        require(cur.map(colMapOf).getOrElse(Map.empty) == cmB,
          "concurrent column rename/drop during stream append — " +
            "restart the batch")
        if (tryCommit(spark, root, Manifest(v, "stream-append",
            System.currentTimeMillis(), schema.toDDL,
            cur.map(_.files).getOrElse(Seq.empty) ++ files,
            Some(batchId), cur.flatMap(_.constraints),
            cur.flatMap(_.bloomCols), cur.flatMap(_.colMap),
            cur.flatMap(_.retired)))) {
          result = Some(v); done = true
        }
      }
    }
    result
  }

  /** EXACTLY-ONCE epoch commit for the NATIVE streaming sink
    * ([[graft.table.GraftStreamingWrite]] — `writeStream
    * .format("graft")`): the executor tasks already wrote `files`
    * under `data/`; this publishes them as micro-batch `batchId`
    * with the id FENCED in the same atomic manifest rename
    * ([[appendBatch]]'s contract, files-based so the sink never
    * round-trips rows through the driver). Returns None for a
    * crash-replayed epoch (hwm already at-or-past `batchId`) — the
    * caller deletes its orphaned files; a LATER epoch landing first
    * is impossible within one query (epochs commit in order), so the
    * fence is exact, not approximate. One streaming query per table:
    * the hwm is table-scoped, the same contract appendBatch has.
    */
  /** `evolveSchema`: with the sink's `mergeSchema` option, an epoch
    * whose schema carries NEW columns (same-typed existing ones)
    * WIDENS the table schema in the same atomic commit — stored rows
    * back-fill NULL through the explicit-schema read, exactly like
    * [[append]]'s evolution; without it, any name-set mismatch stays
    * a loud refusal (a feed that grew a column must never widen a
    * table by accident — the [[merge]] evolveSchema contract).
    */
  private[table] def commitStreamFiles(
      spark: SparkSession,
      root: String,
      schemaDdl: String,
      files: Seq[FileEntry],
      batchId: Long,
      plannedColMap: Map[String, String],
      evolveSchema: Boolean = false): Option[Long] = {
    while (true) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root — the graft streaming sink " +
          "appends to an existing table; create() it first"))
      if (cur.streamHwm.exists(_ >= batchId)) return None
      val curSchema = StructType.fromDDL(cur.schemaDdl)
      val epochSchema = StructType.fromDDL(schemaDdl)
      val newSchema =
        if (evolveSchema) {
          val merged = mergeSchemas(curSchema, epochSchema)
          checkNewCols(cur, curSchema, merged)
          merged
        } else {
          require(curSchema.fieldNames.sorted.toSeq ==
              epochSchema.fieldNames.sorted.toSeq,
            s"stream sink: epoch schema [$schemaDdl] does not match " +
              s"the table schema [${cur.schemaDdl}] — restart with " +
              ".option(\"mergeSchema\", \"true\") to widen")
          curSchema
        }
      require(colMapOf(cur) == plannedColMap,
        "concurrent column rename/drop during stream epoch — " +
          "restart the query")
      // CHECK constraints on the epoch's rows only (same O(incoming)
      // pricing as appendBatch)
      if (constraintsOf(cur).nonEmpty)
        enforceConstraints(snapshotOf(spark, root,
          cur.copy(schemaDdl = newSchema.toDDL, files = files)),
          constraintsOf(cur))
      if (tryCommit(spark, root, Manifest(cur.version + 1,
          "stream-append", System.currentTimeMillis(), newSchema.toDDL,
          cur.files ++ files, Some(batchId), cur.constraints,
          cur.bloomCols, cur.colMap, cur.retired)))
        return Some(cur.version + 1)
      // lost a race (a concurrent maintenance commit): re-read, re-fence
    }
    None // unreachable
  }

  /** Full-snapshot rewrite op (overwrite / merge / delete / compact):
    * `compute` maps the CURRENT snapshot to the new table contents. On a
    * lost commit race the whole op recomputes against the winner's
    * snapshot — rewrites do NOT commute, so this is the only sound
    * retry. At scale, bound the rewrite by partitioning `compute` to
    * touch only affected partitions' files (the manifest makes the
    * untouched file set reusable verbatim — see [[merge]]).
    */
  private def rewrite(
      spark: SparkSession,
      root: String,
      op: String,
      statsCols: Seq[String],
      enforceOn: Option[DataFrame] = None)(
      compute: DataFrame => DataFrame): Long = {
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root — create() first"))
      enforceOn.foreach(d => enforceConstraints(d, constraintsOf(cur)))
      val snap = snapshotOf(spark, root, cur)
      val out = compute(snap)
      val v = cur.version + 1
      // BUCKETED tables stay bucketed through rewrites: compact,
      // delete, overwrite re-route rows through the layout's hash (so
      // maintenance heals the small-file fragmentation ingest causes —
      // n appends × n buckets of small files bin-pack back to one file
      // per bucket — instead of destroying the layout). cluster /
      // zorder are EXPLICIT re-layouts: they intentionally trade the
      // bucket layout for sorted ranges, and readers detect the
      // dropped ids and fall back.
      val bspec =
        if (op == "cluster") None
        else bucketSpec(spark.sparkContext.hadoopConfiguration, root)
      // the PARTITION layout survives even cluster/zorder: a file
      // mixing partition values would lose its pv and silently turn
      // O(metadata) partition drops back into rewrites — the layout
      // is the stronger invariant, so OPTIMIZE sorts WITHIN the
      // partition routing (partitionBy splits per value regardless of
      // the incoming organization)
      val pspec = partitionSpec(
        spark.sparkContext.hadoopConfiguration, root)
      val files = writeFiles(spark, root, out,
        statsColsFor(spark, root, statsCols), v.toString,
        bloomColsOf(cur), bspec, pspec)
      // a full rewrite MATERIALIZES any column mapping: `out` carries
      // logical names, the new files are written under them, so
      // colMap/retired reset to None (old manifests keep theirs for
      // time travel)
      val cand = Manifest(v, op, System.currentTimeMillis(),
        out.schema.toDDL, files,
        cur.streamHwm, cur.constraints, cur.bloomCols)
      // CHANGE DATA FEED: a row-changing rewrite materializes its
      // change rows BEFORE committing, into a uniquely-named per-
      // version dir the manifest then points at (unique name, not
      // `v$v`, so a lost commit race can never collide with the
      // winner's change data — the loser's dir is orphaned like its
      // data files). The post side re-reads the just-written files
      // (fresh lineage — `out` derives from `snap`, and a direct
      // snap-vs-out join would be a self-join on shared attributes).
      // compact/cluster reorganize bytes without logical change and
      // write nothing. Cost: one keyed diff join per rewrite, at
      // write time — rewrites are already O(table), and appends (the
      // hot path) pay nothing.
      val cdfRel =
        if (op == "compact" || op == "cluster") None
        else cdfKeysOf(spark, root).map { keys =>
          require(snap.columns.sorted.sameElements(out.columns.sorted),
            s"$op under CDF: schema-changing rewrite (change rows " +
              "cannot describe it) — drop _cdf/_keys.json to disable " +
              "the feed first and restart downstream consumers")
          val rel = s"$ChangeDir/v$v-" +
            java.util.UUID.randomUUID.toString.take(8)
          diffRows(snap, snapshotOf(spark, root, cand), keys)
            .write.parquet(s"$root/$rel")
          rel
        }
      if (tryCommit(spark, root, cand.copy(cdfDir = cdfRel)))
        committed = v
      // lost race: loop — recompute against the new latest snapshot;
      // the just-written files stay orphaned until vacuum().
    }
    committed
  }

  /** Replace the table contents. */
  def overwrite(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      statsCols: Seq[String] = Seq.empty): Long =
    rewrite(spark, root, "overwrite", statsCols, Some(df))(_ => df)

  /** DYNAMIC PARTITION OVERWRITE — the daily BACKFILL op on an
    * identity/days layout: atomically replace exactly the partitions
    * PRESENT in `df` (every other partition's files carry into the new
    * manifest VERBATIM — zero IO for the untouched 99.9% of a 100 TB
    * table, where [[overwrite]] would rewrite all of it). Incoming
    * rows are written once through the partition split; replaced
    * partitions' current-generation files leave as pure metadata;
    * layout-unaware or prior-generation straggler files may hold rows
    * of the replaced partitions, so they are rewritten SCOPED with
    * those rows anti-joined out (the [[dropPartitionsWhere]]
    * discipline — exact semantics, priced O(stragglers)). The touched
    * partition list is an O(touched-partitions) driver-side set (a
    * backfill touches a handful; 100k bounds the pathological case).
    * Same append-style schema evolution and constraint enforcement as
    * every other write. An empty `df` is a no-op (it names no
    * partitions to replace). Delta's `partitionOverwriteMode=dynamic`
    * / Iceberg's `replacePartitions`, as one commit.
    */
  def overwritePartitions(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      statsCols: Seq[String] = Seq.empty): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val spec = partitionSpec(conf, root).getOrElse(
      sys.error(s"table at $root has no identity/days partition " +
        "layout — use overwrite()"))
    val base = latestManifest(spark, root).getOrElse(
      sys.error(s"no table at $root — create() first"))
    enforceConstraints(df, constraintsOf(base))
    val baseSchema = StructType.fromDDL(base.schemaDdl)
    val merged = mergeSchemas(baseSchema, df.schema)
    checkNewCols(base, baseSchema, merged)
    val cm = colMapOf(base)
    def logicalOf(pc: String): String =
      cm.find(_._2 == pc).map(_._1).getOrElse(pc)
    val logicalSpec = spec.copy(col = logicalOf(spec.col),
      cols = spec.cols.map(_.map(logicalOf)))
    val missingPart = partCompsOf(logicalSpec).map(_.col)
      .filterNot(df.columns.contains)
    require(missingPart.isEmpty,
      "overwritePartitions: incoming batch lacks partition column(s) " +
        s"${missingPart.mkString(", ")} — dynamic overwrite derives " +
        "the replaced partitions from the batch itself; add the " +
        "column(s) or use append()/overwrite()")
    val pvLogical = coalesce(
      partitionValueExpr(logicalSpec), lit(NullPv))
    val touched = df.select(pvLogical.as("pv")).distinct()
      .limit(100001).collect().map(_.getString(0)).toSet
    require(touched.size <= 100000,
      "overwritePartitions: incoming batch names over 100k distinct " +
        "partitions — that is a table rewrite; use overwrite()")
    if (touched.isEmpty) return base.version // no partitions named
    val v0 = base.version + 1
    val newFiles = writeFiles(spark, root,
      toPhysical(conform(df, merged), cm),
      statsColsFor(spark, root, statsCols).map(c => cm.getOrElse(c, c)),
      v0.toString, bloomColsOf(base).map(c => cm.getOrElse(c, c)),
      bucket = None, partition = Some(spec))
    import org.apache.spark.sql.Encoders
    val touchedDf = spark.createDataset(touched.toSeq)(Encoders.STRING)
      .toDF("_graft_ow_pv")
    val k = partCompsOf(spec).length
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).get
      require(colMapOf(cur) == cm,
        "concurrent column rename/drop during overwritePartitions — " +
          "retry the write")
      val (replaced, rest) = cur.files.partition(f =>
        pvCurrent(f, spec) && f.pv.exists(pv =>
          pvComponents(pv, k).isDefined && touched.contains(pv)))
      val (unknown, kept) = rest.partition(f => f.rows > 0 &&
        (!pvCurrent(f, spec) ||
          !f.pv.forall(pv => pvComponents(pv, k).isDefined)))
      val v = cur.version + 1
      val rewritten =
        if (unknown.isEmpty) Seq.empty
        else {
          val snapU = snapshotOf(spark, root, cur.copy(files = unknown))
          // anti-join (broadcast O(touched)) instead of a giant isin
          val outU = snapU.join(broadcast(touchedDf),
            pvLogical === col("_graft_ow_pv"), "left_anti")
          writeFiles(spark, root, toPhysical(outU, cm),
            statsColsFor(spark, root, statsCols)
              .map(c => cm.getOrElse(c, c)),
            v.toString, bloomColsOf(cur).map(c => cm.getOrElse(c, c)),
            partition = Some(spec))
        }
      val cand = Manifest(v, "overwrite-partitions",
        System.currentTimeMillis(),
        mergeSchemas(StructType.fromDDL(cur.schemaDdl), merged).toDDL,
        kept ++ rewritten ++ newFiles, cur.streamHwm, cur.constraints,
        cur.bloomCols, cur.colMap, cur.retired)
      val cdfRel = cdfKeysOf(spark, root).map { keys =>
        val rel = s"$ChangeDir/v$v-" +
          java.util.UUID.randomUUID.toString.take(8)
        diffRows(
          snapshotOf(spark, root, cur.copy(files = replaced ++ unknown)),
          snapshotOf(spark, root,
            cand.copy(files = rewritten ++ newFiles)), keys)
          .write.parquet(s"$root/$rel")
        rel
      }
      if (tryCommit(spark, root, cand.copy(cdfDir = cdfRel)))
        committed = v
    }
    committed
  }

  /** MERGE/upsert: rows of `updates` replace same-key rows and insert
    * new keys ([[graft.ops.Merge.upsert]] semantics with updates always
    * winning). One anti-join + union — shuffle volume O(|snapshot| +
    * |updates|) on the key, no window sort.
    */
  def merge(
      spark: SparkSession,
      root: String,
      updates: DataFrame,
      keyCols: Seq[String],
      statsCols: Seq[String] = Seq.empty,
      evolveSchema: Boolean = false): Long =
    rewrite(spark, root, "merge", statsCols, Some(updates)) { snap =>
      val (wide, cols) = evolveFor("merge", snap, updates, evolveSchema)
      wide.join(
          updates.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti")
        .unionByName(updates.select(cols.map(col): _*))
    }

  /** MERGE SCHEMA EVOLUTION (opt-in, the `WITH SCHEMA EVOLUTION`
    * semantics of the public formats): with `evolve` set, source
    * columns absent from the table are APPENDED to the schema —
    * stored rows back-fill NULL, source rows carry their values, and
    * the widened schema commits atomically with the merge (no
    * separate DDL; [[rewrite]] commits `out.schema.toDDL`). Without
    * it, extra source columns are silently projected away — merging a
    * feed that grew a column must never widen a table by accident.
    * Returns the (possibly widened) snapshot and the output column
    * list. Dropping/retyping EXISTING columns is never evolution:
    * a source missing a table column still fails the select below.
    */
  private def evolveFor(
      op: String, snap: DataFrame, source: DataFrame,
      evolve: Boolean): (DataFrame, Seq[String]) = {
    if (!evolve) return (snap, snap.columns.toSeq)
    val extra = source.schema.fields
      .filterNot(f => snap.columns.contains(f.name))
    val wide = extra.foldLeft(snap)((d, f) =>
      d.withColumn(f.name, lit(null).cast(f.dataType)))
    (wide, snap.columns.toSeq ++ extra.map(_.name))
  }

  /** FULL three-clause MERGE — the complete SQL `MERGE INTO` surface:
    * WHEN MATCHED → replace with the source row; WHEN NOT MATCHED →
    * insert the source row; WHEN NOT MATCHED BY SOURCE AND `deleteWhen`
    * → delete (rows failing `deleteWhen`, or where it is NULL, are
    * carried). The third clause is what [[merge]] lacks: syncing a
    * table to a dimension snapshot ("delete stale members of the synced
    * region") needs delete-by-absence, and doing it as a separate
    * anti-join pass would not be atomic with the upsert. Same plan
    * shape as [[merge]] plus one narrow filter — no extra shuffle.
    */
  def mergeFull(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keyCols: Seq[String],
      deleteWhen: org.apache.spark.sql.Column,
      statsCols: Seq[String] = Seq.empty,
      evolveSchema: Boolean = false): Long =
    rewrite(spark, root, "merge-full", statsCols, Some(source)) { snap =>
      val (wide, cols) =
        evolveFor("merge-full", snap, source, evolveSchema)
      wide.join(
          source.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti")
        .filter(!coalesce(deleteWhen, lit(false)))
        .unionByName(source.select(cols.map(col): _*))
    }

  /** SCOPE-BOUNDED MERGE — the 100 TB form of [[merge]]: only files
    * whose `scopeCol` stats range intersects the update set's scope
    * values are read and rewritten; every other file is carried into
    * the new manifest VERBATIM (zero IO for the untouched 99.9% of a
    * large table). `scopeCol` plays the partition-column role and must
    * be STABLE PER KEY (an update row's scope value equals the stored
    * row's — the same contract a partitioned MERGE has in the public
    * table formats; violating it can duplicate a key across scopes).
    *
    * The touched scope set is collected to the driver — it is bounded
    * by the table's partition cardinality (days, tenants, shards),
    * never by row count. Works best after [[cluster]]`(scopeCol)` has
    * made per-file scope ranges tight; without stats a file is
    * conservatively rewritten.
    */
  def mergeScoped(
      spark: SparkSession,
      root: String,
      updates: DataFrame,
      keyCols: Seq[String],
      scopeCol: String,
      statsCols: Seq[String] = Seq.empty): Long = {
    val scopeField = updates.schema.fields.find(_.name == scopeCol)
      .getOrElse(sys.error(s"no $scopeCol in updates"))
    val scopeExpr = statsExpr(scopeField).getOrElse(
      sys.error(s"$scopeCol: type ${scopeField.dataType} has no stats order"))
    // misuse guard: the collect is bounded by PARTITION cardinality by
    // contract — a row-cardinality scope column (an id, a timestamp)
    // would OOM the driver here, so refuse loudly past a generous cap
    // instead of dying in the collect
    val maxScopes = 100000
    val touched = updates.select(scopeExpr.as("v")).distinct()
      .limit(maxScopes + 1).collect().map { r =>
        require(!r.isNullAt(0),
          s"$scopeCol must be non-null in updates: a null scope cannot " +
            "be matched against file stats and would strand its stored row")
        r.getDouble(0)
      }
    require(touched.length <= maxScopes,
      s"mergeScoped: updates carry >$maxScopes distinct $scopeCol values " +
        "— that is a row-scoped column, not a partition scope; use " +
        "merge() (full) or pick a coarser scope column")
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root — create() first"))
      enforceConstraints(updates, constraintsOf(cur))
      val (hit, kept) = cur.files.partition(f =>
        f.stats.get(physNameIn(cur, scopeCol)) match {
          case Some(s) => touched.exists(v => v >= s.min && v <= s.max)
          case None => true // no stats: must assume the file is touched
        })
      val hitSnap = snapshotOf(spark, root,
        cur.copy(files = hit))
      val out = hitSnap.join(
          updates.select(keyCols.map(col): _*).distinct(),
          keyCols, "left_anti")
        .unionByName(updates.select(hitSnap.columns.toSeq.map(col): _*))
      val v = cur.version + 1
      // PARTIAL rewrite: `kept` files survive with their physical
      // names, so the new files must use them too and the mapping
      // carries forward (unlike the full-rewrite reset)
      val cmS = colMapOf(cur)
      val files = writeFiles(spark, root, toPhysical(out, cmS),
        statsColsFor(spark, root, statsCols).map(c => cmS.getOrElse(c, c)),
        v.toString,
        bloomColsOf(cur).map(c => cmS.getOrElse(c, c)),
        bucketSpec(spark.sparkContext.hadoopConfiguration, root),
      partitionSpec(spark.sparkContext.hadoopConfiguration, root))
      if (tryCommit(spark, root, Manifest(v, "merge",
          System.currentTimeMillis(), cur.schemaDdl, kept ++ files,
          cur.streamHwm, cur.constraints, cur.bloomCols,
          cur.colMap, cur.retired)))
        committed = v
    }
    committed
  }

  /** Delete by key (anti-join; the GDPR shape of [[graft.ops.Merge.applyDeletes]]). */
  def delete(
      spark: SparkSession,
      root: String,
      tombstones: DataFrame,
      keyCols: Seq[String],
      statsCols: Seq[String] = Seq.empty): Long =
    rewrite(spark, root, "delete", statsCols) { snap =>
      graft.ops.Merge.applyDeletes(snap, tombstones, keyCols)
    }

  /** Commit a COPY-ON-WRITE replacement written by the DSv2 row-level
    * path ([[graft.table.GraftRowLevelOperation]] — SQL UPDATE / MERGE
    * INTO): the executor-written files replace the REPLACEMENT GROUP
    * (`replaced` — the files the COW scan actually planned, post
    * runtime group filtering) at `baseVersion + 1`; every other base
    * manifest entry CARRIES FORWARD VERBATIM, so a selective UPDATE
    * commits O(matched files) of new data, not O(table) (`replaced =
    * None` falls back to whole-table replace — always sound).
    * Unlike [[rewrite]] there is no recompute-and-retry — the
    * replacement rows were produced by Spark's rewrite plan against
    * `baseVersion`'s snapshot, so a concurrent commit means the plan's
    * input is stale and the only sound outcome is a LOUD ABORT (the
    * Delta/Iceberg serializable-conflict contract; the statement can
    * simply be re-run). Column mapping carries forward — the COW
    * writer writes PHYSICAL names, so kept and new files serve one
    * read schema. Under [[enableCdf]] the change rows are materialized
    * here by diffing the REPLACED files' rows against the NEW files'
    * rows — kept files are identical on both sides by construction, so
    * the scoped diff equals the full-table diff at O(group) cost.
    */
  private[table] def commitCow(
      spark: SparkSession,
      root: String,
      op: String,
      schemaDdl: String,
      files: Seq[FileEntry],
      baseVersion: Long,
      replaced: Option[Seq[String]] = None): Long = {
    val base = readManifest(spark, root, baseVersion)
    val replacedSet = replaced.map(_.toSet)
      .getOrElse(base.files.map(_.path).toSet)
    require(StructType.fromDDL(base.schemaDdl).fieldNames.sorted.toSeq ==
        StructType.fromDDL(schemaDdl).fieldNames.sorted.toSeq,
      s"$op: row-level write schema [$schemaDdl] does not match the " +
        s"table schema [${base.schemaDdl}]")
    var attempt = 0
    while (true) {
      attempt += 1
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root"))
      // OPTIMISTIC CONFLICT CHECK (the WriteSerializable rule): a
      // statement planned against v_base may commit on top of LATER
      // versions iff rebasing is provably equivalent to having run the
      // statement BEFORE the intervening commits —
      //   (1) every replaced file is still present in `cur` with an
      //       IDENTICAL entry (same rows/stats/dvs): nobody rewrote,
      //       deleted, compacted, or tombstoned the rows this
      //       statement is replacing (files are immutable, so entry
      //       equality pins content);
      //   (2) schema / column map / constraints / retired set are
      //       unchanged: the planned write schema is still the table's;
      //   (3) no RESTORE intervened: a rewind is an operator's explicit
      //       "make the table THIS again" — silently replaying DML on
      //       top of it would surprise, so it stays a loud conflict.
      // Under these, intervening appends commute with the rewrite
      // (their files carry forward verbatim in `kept`) — the same
      // blind-append-vs-UPDATE non-conflict the public lakehouse
      // formats ship as their default isolation. Anything else aborts
      // loudly, exactly as before.
      if (cur.version != baseVersion) {
        val rebasable =
          cur.schemaDdl == base.schemaDdl &&
          cur.colMap == base.colMap &&
          cur.constraints == base.constraints &&
          cur.retired == base.retired && {
            val curByPath = cur.files.map(f => f.path -> f).toMap
            val baseByPath = base.files.map(f => f.path -> f).toMap
            replacedSet.forall(p =>
              curByPath.get(p).exists(e => baseByPath.get(p).contains(e)))
          } &&
          ((baseVersion + 1) to cur.version).forall(i =>
            readManifest(spark, root, i).op != "restore")
        if (!rebasable)
          throw new IllegalStateException(
            s"$op: conflicting concurrent commit (planned against " +
              s"v$baseVersion, table is at v${cur.version} and the " +
              "intervening commits touched the replaced files, the " +
              "schema, or restored history) — re-run the statement")
      }
      val v = cur.version + 1
      val (gone, kept) = cur.files.partition(f => replacedSet(f.path))
      val cand = Manifest(v, op, System.currentTimeMillis(),
        cur.schemaDdl, kept ++ files, cur.streamHwm, cur.constraints,
        cur.bloomCols, cur.colMap, cur.retired)
      // CHECK constraints hold on the replacement rows (one scan of the
      // NEW files only — kept rows passed at their own commit, the same
      // O(incoming) pricing as append)
      if (constraintsOf(cur).nonEmpty)
        enforceConstraints(
          snapshotOf(spark, root, cand.copy(files = files)),
          constraintsOf(cur))
      val cdfRel = cdfKeysOf(spark, root).map { keys =>
        val rel = s"$ChangeDir/v$v-" +
          java.util.UUID.randomUUID.toString.take(8)
        diffRows(snapshotOf(spark, root, cur.copy(files = gone)),
          snapshotOf(spark, root, cand.copy(files = files)), keys)
          .write.parquet(s"$root/$rel")
        rel
      }
      if (tryCommit(spark, root, cand.copy(cdfDir = cdfRel))) return v
      if (attempt >= 8)
        throw new IllegalStateException(
          s"$op: lost the commit race $attempt times at $root — " +
            "re-run the statement")
      // lost the race to a commit that may still be rebasable: loop —
      // the next iteration re-reads latest and re-checks eligibility
    }
    -1L // unreachable
  }

  /** Predicate DELETE (the `DELETE FROM t WHERE p` semantics — rows
    * where `cond` is TRUE are removed; FALSE and NULL rows are kept,
    * the SQL contract). Routed through [[rewrite]], so constraints,
    * bloom maintenance and CDF change-row materialization all apply;
    * [[graft.table.GraftTable]] exposes it to SQL via DSv2
    * SupportsDelete.
    */
  def deleteWhere(
      spark: SparkSession,
      root: String,
      cond: org.apache.spark.sql.Column,
      statsCols: Seq[String] = Seq.empty): Long =
    rewrite(spark, root, "delete", statsCols) { snap =>
      snap.filter(!coalesce(cond, lit(false)))
    }

  /** O(METADATA) PARTITION DROP — the retention/GDPR operation an
    * identity/days-partitioned table exists for: files whose manifest
    * `pv` matches a dropped value leave the new manifest WITHOUT being
    * read (zero data IO; their bytes await [[vacuum]] like any
    * rewrite's). `values` are canonical partition-value strings (the
    * [[FileEntry.pv]] space — [[NullPv]] drops the null partition).
    *
    * Layout-unaware files (COW rewrites, streaming-sink epochs carry
    * no `pv`) may hold matching rows: EXACTLY those files are
    * rewritten, scoped — O(stragglers), usually zero, never O(table).
    * Under [[enableCdf]] the dropped rows materialize as delete change
    * rows — priced O(dropped partitions), the unavoidable CDF floor.
    * Returns the committed version (current one when nothing matched).
    */
  def dropPartitions(
      spark: SparkSession,
      root: String,
      values: Seq[String],
      statsCols: Seq[String] = Seq.empty): Long = {
    require(values.nonEmpty, "dropPartitions: no partition values given")
    val vs = values.toSet
    dropPartitionsWhere(spark, root, vs.contains,
      rowCond = (pvLogical: org.apache.spark.sql.Column) =>
        pvLogical.isin(vs.toSeq: _*),
      statsCols)
  }

  /** PREDICATE form of [[dropPartitions]] — the RETENTION shape
    * (`DELETE WHERE day < '2026-01-01'` over an identity layout):
    * `pvPred` decides which pv-carrying files leave as pure metadata
    * (called with the canonical pv string, [[NullPv]] included — a
    * range predicate returns false for it, SQL comparisons reject
    * NULL); `rowCond` is the SAME predicate over the logical
    * partition-value column, applied row-level to layout-unaware
    * straggler files so the result is EXACTLY `DELETE WHERE pred` at
    * O(matching partitions + stragglers) cost.
    */
  def dropPartitionsWhere(
      spark: SparkSession,
      root: String,
      pvPred: String => Boolean,
      rowCond: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      statsCols: Seq[String] = Seq.empty): Long = {
    val spec = partitionSpec(spark.sparkContext.hadoopConfiguration, root)
      .getOrElse(sys.error(s"table at $root has no partition layout — " +
        "use deleteWhere()"))
    val k = partCompsOf(spec).length
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root — create() first"))
      // a pv that does not decode into the layout's k components, or
      // was stamped under a PRIOR spec generation, is not this
      // layout's index: route the file through the row-level rewrite
      // (exact semantics) rather than keep OR drop it on a guess
      val (dropped, rest) = cur.files.partition(f =>
        pvCurrent(f, spec) &&
          f.pv.exists(pv => pvComponents(pv, k).isDefined && pvPred(pv)))
      val (unknown, kept) = rest.partition(f => f.rows > 0 &&
        (!pvCurrent(f, spec) ||
          !f.pv.forall(pv => pvComponents(pv, k).isDefined)))
      if (dropped.isEmpty && unknown.isEmpty)
        return cur.version // nothing to drop, nothing to commit
      val cm = colMapOf(cur)
      def logicalOf(pc: String): String =
        cm.find(_._2 == pc).map(_._1).getOrElse(pc)
      val logicalSpec = spec.copy(col = logicalOf(spec.col),
        cols = spec.cols.map(_.map(logicalOf)))
      val pvLogical = coalesce(
        partitionValueExpr(logicalSpec), lit(NullPv))
      val v = cur.version + 1
      val newFiles =
        if (unknown.isEmpty) Seq.empty
        else {
          val snapU = snapshotOf(spark, root, cur.copy(files = unknown))
          val outU =
            snapU.filter(!coalesce(rowCond(pvLogical), lit(false)))
          writeFiles(spark, root, toPhysical(outU, cm),
            statsColsFor(spark, root, statsCols)
              .map(c => cm.getOrElse(c, c)),
            v.toString,
            bloomColsOf(cur).map(c => cm.getOrElse(c, c)),
            partition = Some(spec))
        }
      val cand = Manifest(v, "drop-partition", System.currentTimeMillis(),
        cur.schemaDdl, kept ++ newFiles, cur.streamHwm, cur.constraints,
        cur.bloomCols, cur.colMap, cur.retired)
      val cdfRel = cdfKeysOf(spark, root).map { keys =>
        val rel = s"$ChangeDir/v$v-" +
          java.util.UUID.randomUUID.toString.take(8)
        diffRows(
          snapshotOf(spark, root, cur.copy(files = dropped ++ unknown)),
          snapshotOf(spark, root, cand.copy(files = newFiles)), keys)
          .write.parquet(s"$root/$rel")
        rel
      }
      if (tryCommit(spark, root, cand.copy(cdfDir = cdfRel)))
        committed = v
    }
    committed
  }

  /** MERGE-ON-READ delete: commit a deletion-vector sidecar instead of
    * rewriting data — the O(|tombstones|) delete a 100 TB table needs
    * ([[delete]] rewrites the whole snapshot; a GDPR purge of a few
    * thousand keys must not cost a petabyte of IO). The tombstone keys
    * are written ONCE as a small parquet sidecar and attached to every
    * CURRENT file's `dvs` list; readers anti-join them per file group
    * at scan time. Later appends carry no `dvs`, so re-inserting a
    * deleted key behaves exactly like SQL DELETE-then-INSERT. Any
    * rewrite op ([[compact]], [[merge]], [[cluster]], [[overwrite]])
    * materializes the deletes — its input snapshot already has them
    * applied and its output files carry no `dvs`.
    */
  def deleteMor(
      spark: SparkSession,
      root: String,
      tombstones: DataFrame,
      keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "deleteMor needs at least one key column")
    // existence check BEFORE the sidecar write — a missing table must
    // not leave an orphan dv parquet behind the error
    latestVersion(spark, root).getOrElse(
      sys.error(s"no table at $root — create() first"))
    val rel =
      s"$DataDir/dv-${java.util.UUID.randomUUID.toString.take(8)}"
    tombstones.select(keyCols.map(col): _*).distinct()
      .coalesce(1)
      .write.parquet(s"$root/$rel")
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root — create() first"))
      val files = cur.files.map(f =>
        f.copy(dvs = Some(f.dvs.getOrElse(Seq.empty) :+ rel)))
      if (tryCommit(spark, root, Manifest(cur.version + 1, "delete-mor",
          System.currentTimeMillis(), cur.schemaDdl, files,
          cur.streamHwm, cur.constraints, cur.bloomCols,
          cur.colMap, cur.retired)))
        committed = cur.version + 1
    }
    committed
  }

  /** SHALLOW CLONE: a new independent table whose v0 manifest references
    * the SOURCE's current data files by absolute path — zero data
    * copied, O(#files) metadata. The clone evolves independently (its
    * appends/rewrites land under its own root); the source is never
    * touched. The standard experimentation primitive: branch a 100 TB
    * table in milliseconds, try a migration, drop the root. CAVEAT
    * (same as the public formats'): vacuuming the SOURCE can reclaim
    * files a clone still references — pin or copy before source vacuum.
    */
  def cloneTable(
      spark: SparkSession, srcRoot: String, dstRoot: String): Long = {
    require(latestVersion(spark, dstRoot).isEmpty,
      s"table already exists at $dstRoot")
    val src = latestManifest(spark, srcRoot).getOrElse(
      sys.error(s"no table at $srcRoot"))
    val absolute = src.files.map(f => f.copy(
      path = resolvePath(srcRoot, f.path),
      dvs = f.dvs.map(_.map(resolvePath(srcRoot, _)))))
    val m = Manifest(0L, "clone", System.currentTimeMillis(),
      src.schemaDdl, absolute, src.streamHwm, src.constraints,
      src.bloomCols, src.colMap, src.retired)
    require(tryCommit(spark, dstRoot, m),
      s"concurrent create at $dstRoot")
    0L
  }

  /** Word-boundary scan of the table's CHECK constraints for a column
    * reference — rename/drop must not silently break a stored
    * predicate's meaning.
    */
  private def constraintsReferencing(
      m: Manifest, column: String): Seq[String] = {
    val p = java.util.regex.Pattern
      .compile("\\b" + java.util.regex.Pattern.quote(column) + "\\b")
    constraintsOf(m).toSeq.collect {
      case (n, sql) if p.matcher(sql).find() => n
    }
  }

  private def evolveGuards(m: Manifest, column: String, op: String): Unit = {
    require(m.files.forall(_.dvs.isEmpty),
      s"$op: pending MOR deletion vectors — compact() first so " +
        "tombstone keys and file columns stay aligned")
    val refs = constraintsReferencing(m, column)
    require(refs.isEmpty,
      s"$op: constraint(s) ${refs.mkString(", ")} reference '$column' — " +
        "drop the constraint(s) first")
  }

  /** COLUMN RENAME without rewriting a single data file — the
    * column-mapping evolution (Delta/Iceberg's solution): the manifest
    * maps the new LOGICAL name onto the column's original PHYSICAL
    * name, old files keep serving, and every read path (snapshot,
    * stats/bloom pruning, DSv2) translates through the map. O(metadata)
    * commit; time travel to pre-rename versions serves the old name;
    * any full rewrite materializes the mapping. Refused while MOR
    * deletion vectors are pending or a CHECK constraint references the
    * column.
    */
  def renameColumn(
      spark: SparkSession, root: String, from: String, to: String): Long = {
    require(from != to, "rename to the same name is a no-op")
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root"))
      val schema = StructType.fromDDL(cur.schemaDdl)
      require(schema.fieldNames.contains(from),
        s"renameColumn: no column '$from' " +
          s"(have ${schema.fieldNames.mkString(", ")})")
      require(!schema.fieldNames.contains(to),
        s"renameColumn: column '$to' already exists")
      val occupied =
        (colMapOf(cur).values ++ cur.retired.getOrElse(Nil)).toSet
      require(!occupied.contains(to),
        s"renameColumn: '$to' is still a physical name in existing " +
          "data files — compact() to materialize the mapping first")
      evolveGuards(cur, from, "renameColumn")
      // the bucket layout's sidecar names the column's CREATION-time
      // physical name forever — a rename whose eventual materializing
      // rewrite renames the physical column would silently orphan the
      // layout (files stop bucketing, SPJ dies with no error). Fixed
      // at create by design: refuse, don't rot.
      bucketSpec(spark.sparkContext.hadoopConfiguration, root)
        .foreach(b => require(
          !bucketColsOf(b).contains(physNameIn(cur, from)),
          s"renameColumn: '$from' is a bucket column of the table — " +
            "the layout is fixed at create; re-create the table to " +
            "change it"))
      // same invariant for the partition layout: its sidecar names the
      // creation-time physical column forever
      partitionSpec(spark.sparkContext.hadoopConfiguration, root)
        .foreach(p => require(p.col != physNameIn(cur, from),
          s"renameColumn: '$from' is the table's partition column — " +
            "the layout is fixed at create; re-create the table to " +
            "change it"))
      val phys = physNameIn(cur, from)
      val cm2 = (colMapOf(cur) - from) ++
        (if (to == phys) Map.empty[String, String] else Map(to -> phys))
      val schema2 = StructType(schema.fields.map(f =>
        if (f.name == from) f.copy(name = to) else f))
      val blooms2 = cur.bloomCols.map(_.map(c => if (c == from) to else c))
      if (tryCommit(spark, root, Manifest(cur.version + 1,
          "rename-column", System.currentTimeMillis(), schema2.toDDL,
          cur.files, cur.streamHwm, cur.constraints, blooms2,
          if (cm2.isEmpty) None else Some(cm2), cur.retired))) {
        // keep the persisted stats opt-in speaking the LIVE logical
        // names — a stale entry would silently stop stats collection
        val conf = spark.sparkContext.hadoopConfiguration
        val props = tableProps(conf, root)
        props.get("statsCols").foreach { sc =>
          val cols = sc.split(",").map(_.trim).filter(_.nonEmpty)
          if (cols.contains(from))
            writeTableProps(spark, root, props.updated("statsCols",
              cols.map(c => if (c == from) to else c).mkString(",")))
        }
        committed = cur.version + 1
      }
    }
    committed
  }

  /** COLUMN DROP without touching data files: the column leaves the
    * logical schema and its PHYSICAL name is parked in `retired`, so a
    * later add of the same name cannot resurrect the old files' bytes
    * (the collision is refused until a rewrite materializes the
    * mapping). O(metadata) commit; time travel still serves the column
    * at pre-drop versions; vacuum keeps working (file sets are
    * untouched). Same guards as [[renameColumn]].
    */
  def dropColumn(
      spark: SparkSession, root: String, column: String): Long = {
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root"))
      val schema = StructType.fromDDL(cur.schemaDdl)
      require(schema.fieldNames.contains(column),
        s"dropColumn: no column '$column' " +
          s"(have ${schema.fieldNames.mkString(", ")})")
      require(schema.fields.length > 1,
        "dropColumn: cannot drop the only column")
      evolveGuards(cur, column, "dropColumn")
      // same rationale as renameColumn: the layout sidecar would
      // outlive its column and silently rot every future write
      bucketSpec(spark.sparkContext.hadoopConfiguration, root)
        .foreach(b => require(
          !bucketColsOf(b).contains(physNameIn(cur, column)),
          s"dropColumn: '$column' is a bucket column of the table — " +
            "the layout is fixed at create; re-create the table to " +
            "change it"))
      partitionSpec(spark.sparkContext.hadoopConfiguration, root)
        .foreach(p => require(p.col != physNameIn(cur, column),
          s"dropColumn: '$column' is the table's partition column — " +
            "the layout is fixed at create; re-create the table to " +
            "change it"))
      val phys = physNameIn(cur, column)
      val cm2 = colMapOf(cur) - column
      val retired2 = (cur.retired.getOrElse(Nil) :+ phys).distinct
      val schema2 = StructType(schema.fields.filterNot(_.name == column))
      val blooms2 = cur.bloomCols.map(_.filterNot(_ == column))
        .filter(_.nonEmpty)
      if (tryCommit(spark, root, Manifest(cur.version + 1,
          "drop-column", System.currentTimeMillis(), schema2.toDDL,
          cur.files, cur.streamHwm, cur.constraints, blooms2,
          if (cm2.isEmpty) None else Some(cm2), Some(retired2))))
        committed = cur.version + 1
    }
    committed
  }

  /** EXPLICIT COLUMN ADD without touching data files (the DDL twin of
    * the write-path schema evolution): the column joins the logical
    * schema as a NULLABLE field, O(metadata) commit, and every
    * pre-existing file serves NULL for it (the same explicit-schema
    * read that powers [[append]]'s evolution). Same physical-name
    * collision guard as the write path — a name still carried by live
    * data files (a renamed column's original, or a dropped column's)
    * is refused, or old bytes would resurrect under the new column.
    * Exposed to SQL as `ALTER TABLE ... ADD COLUMN` via
    * [[graft.table.GraftCatalog]].
    */
  /** ADD a named CHECK constraint (the `ALTER TABLE … ADD CONSTRAINT
    * name CHECK (expr)` semantics — SQL reaches here through
    * [[GraftCatalog.alterTable]] and Spark 4's DSv2 constraint
    * TableChanges). EXISTING rows are validated first (one aggregation
    * over the snapshot — a constraint that the table already violates
    * must never commit, or every subsequent write would "violate" it),
    * then the constraint lands as an O(metadata) commit; every write
    * path (append / appendBatch / rewrite / COW / streaming sink)
    * already enforces the manifest's constraint map on incoming rows.
    */
  def addConstraint(
      spark: SparkSession, root: String, name: String,
      exprSql: String): Long = {
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root"))
      require(!constraintsOf(cur).contains(name),
        s"addConstraint: constraint '$name' already exists")
      // validate the expression parses AND holds on current rows
      enforceConstraints(snapshotOf(spark, root, cur),
        Map(name -> exprSql))
      if (tryCommit(spark, root, Manifest(cur.version + 1,
          "add-constraint", System.currentTimeMillis(), cur.schemaDdl,
          cur.files, cur.streamHwm,
          Some(constraintsOf(cur) + (name -> exprSql)),
          cur.bloomCols, cur.colMap, cur.retired)))
        committed = cur.version + 1
    }
    committed
  }

  /** DROP a named CHECK constraint — O(metadata). `ifExists` makes a
    * missing name a no-op returning -1 instead of an error.
    */
  def dropConstraint(
      spark: SparkSession, root: String, name: String,
      ifExists: Boolean = false): Long = {
    var committed = -1L
    var done = false
    while (!done) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root"))
      if (!constraintsOf(cur).contains(name)) {
        require(ifExists,
          s"dropConstraint: no constraint '$name' on the table " +
            s"(have ${constraintsOf(cur).keys.mkString(", ")})")
        done = true
      } else {
        val next = constraintsOf(cur) - name
        if (tryCommit(spark, root, Manifest(cur.version + 1,
            "drop-constraint", System.currentTimeMillis(),
            cur.schemaDdl, cur.files, cur.streamHwm,
            if (next.isEmpty) None else Some(next),
            cur.bloomCols, cur.colMap, cur.retired))) {
          committed = cur.version + 1; done = true
        }
      }
    }
    committed
  }

  def addColumn(
      spark: SparkSession, root: String, column: String,
      dataType: org.apache.spark.sql.types.DataType): Long = {
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root"))
      val schema = StructType.fromDDL(cur.schemaDdl)
      require(!schema.fieldNames.contains(column),
        s"addColumn: column '$column' already exists")
      val schema2 = StructType(schema.fields :+
        StructField(column, dataType, nullable = true))
      checkNewCols(cur, schema, schema2)
      if (tryCommit(spark, root, Manifest(cur.version + 1,
          "add-column", System.currentTimeMillis(), schema2.toDDL,
          cur.files, cur.streamHwm, cur.constraints, cur.bloomCols,
          cur.colMap, cur.retired)))
        committed = cur.version + 1
    }
    committed
  }

  /** Small-file compaction as a COMMITTED no-op rewrite: data identical,
    * file count sized to `targetBytes` ([[graft.ops.Compaction]]'s
    * round-robin sizing). Old versions still time-travel to the
    * pre-compaction files until vacuumed.
    */
  def compact(
      spark: SparkSession,
      root: String,
      targetBytes: Long = 128L << 20,
      statsCols: Seq[String] = Seq.empty): Long =
    rewrite(spark, root, "compact", statsCols) { snap =>
      // a bucketed/partitioned table's writeFiles re-routes rows
      // through its layout anyway — the size-based repartition here
      // would be a second, discarded shuffle (file count = bucket /
      // partition count there)
      if (bucketSpec(spark.sparkContext.hadoopConfiguration,
          root).isDefined ||
        partitionSpec(spark.sparkContext.hadoopConfiguration,
          root).isDefined) snap
      else {
        val cur = latestManifest(spark, root).get
        val bytes = math.max(1L, cur.files.map(_.bytes).sum)
        snap.repartition(graft.ops.Compaction.targetFileCount(
          bytes, targetBytes))
      }
    }

  /** SELECTIVE COMPACTION — the O(small) form of [[compact]], and the
    * only one that makes sense at 100 TB: bin-pack ONLY the files
    * below `minBytes` (the small-file debris ingest leaves behind);
    * every file already at a healthy size is carried into the new
    * manifest VERBATIM — zero IO for the bulk of the table, where
    * [[compact]] rewrites everything every time. Files with deletion
    * vectors are included and their deletes MATERIALIZE (the
    * snapshot read applies them), same as the full compact. A
    * bucketed table's rewritten rows re-route through the layout
    * hash. No-op (no commit) when fewer than two files qualify.
    * Returns the committed version (or the current one for a no-op).
    */
  def compactSmall(
      spark: SparkSession,
      root: String,
      minBytes: Long,
      targetBytes: Long = 128L << 20,
      statsCols: Seq[String] = Seq.empty): Long = {
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root — create() first"))
      // DICTIONARY/ZSTD-AWARE accounting (r15 VERDICT stretch): a
      // byte threshold alone misreads heavily-compressed files as
      // debris — a dictionary-encoded file can hold a full file's
      // rows in a fraction of the bytes, and re-packing it buys
      // nothing. Judge smallness by ROWS too: rowFloor is the row
      // count a typical minBytes-sized file of THIS table holds
      // (median manifest bytes-per-row — free, the writers already
      // paid for the counts); a sub-threshold file at or above the
      // floor is a full file compressed well, not debris. For files
      // at the median ratio the guard is arithmetic-neutral (bytes <
      // minBytes ⇒ rows < floor), so it only exempts the
      // better-than-median outliers it exists for.
      val bprMedian = {
        val rs = cur.files.filter(_.rows > 0)
          .map(f => f.bytes.toDouble / f.rows).sorted
        if (rs.isEmpty) None else Some(rs(rs.size / 2))
      }
      val rowFloor = bprMedian.map(b => (minBytes / b).toLong)
      val (small0, kept0) = cur.files.partition(f =>
        f.bytes < minBytes && rowFloor.forall(f.rows < _))
      // PER-GROUP POLICY: debris groups by physical placement —
      // (partition tuple, bucket id). A group with a single small
      // file is already as packed as the layout allows; rewriting it
      // is pure churn, and on a partitioned table the old table-wide
      // `< 2` guard made every maintenance run O(partitions) forever
      // (each partition legitimately holds one small file after its
      // last compaction). Only groups with ≥ 2 small files, or a
      // deletion vector to materialize, rewrite — O(debris) at any
      // partition count.
      val groups = small0.groupBy(f => (f.pv, f.bucket))
      val (rw, skip) = groups.partition { case (_, fs) =>
        fs.size >= 2 || fs.exists(_.dvs.exists(_.nonEmpty)) }
      val small = rw.values.flatten.toSeq
      val kept = kept0 ++ skip.values.flatten.toSeq
      if (small.isEmpty)
        return cur.version // nothing worth a commit
      val snapSmall = snapshotOf(spark, root, cur.copy(files = small))
      val bspecSmall = bucketSpec(
        spark.sparkContext.hadoopConfiguration, root)
      val pspecSmall = partitionSpec(
        spark.sparkContext.hadoopConfiguration, root)
      // layout tables: writeFiles re-routes — skip the wasted pre-shuffle
      val out =
        if (bspecSmall.isDefined || pspecSmall.isDefined) snapSmall
        else {
          val bytes = math.max(1L, small.map(_.bytes).sum)
          snapSmall.repartition(
            graft.ops.Compaction.targetFileCount(bytes, targetBytes))
        }
      val v = cur.version + 1
      // PARTIAL rewrite: kept files survive under their physical
      // names, so the new files write physical too and the mapping
      // carries forward (the mergeScoped contract, not the full-
      // rewrite materialization)
      val cm = colMapOf(cur)
      val files = writeFiles(spark, root, toPhysical(out, cm),
        statsColsFor(spark, root, statsCols).map(c => cm.getOrElse(c, c)),
        v.toString,
        bloomColsOf(cur).map(c => cm.getOrElse(c, c)),
        bucketSpec(spark.sparkContext.hadoopConfiguration, root),
      partitionSpec(spark.sparkContext.hadoopConfiguration, root))
      if (tryCommit(spark, root, Manifest(v, "compact",
          System.currentTimeMillis(), cur.schemaDdl, kept ++ files,
          cur.streamHwm, cur.constraints, cur.bloomCols,
          cur.colMap, cur.retired)))
        committed = v
      // lost race: loop — re-partition against the new latest
    }
    committed
  }

  /** PARTITION-SCOPED COMPACTION — the maintenance op an identity/days
    * layout makes cheap: bin-pack ONLY the named partitions' files
    * (ingest leaves one small file per partition per append); every
    * other partition's files carry into the new manifest VERBATIM —
    * O(named partitions), never O(table). Layout-unaware straggler
    * files (COW rewrites, streaming epochs — no `pv`) are included and
    * HEALED into the layout (their rows re-route through the partition
    * split), since they may hold the named partitions' rows. Physical
    * reorganization only — no change rows under CDF, same as
    * [[compact]]. No-op (no commit) when nothing would change.
    */
  def compactPartitions(
      spark: SparkSession,
      root: String,
      values: Seq[String],
      statsCols: Seq[String] = Seq.empty): Long = {
    val spec = partitionSpec(spark.sparkContext.hadoopConfiguration, root)
      .getOrElse(sys.error(s"table at $root has no partition layout — " +
        "use compact()/compactSmall()"))
    require(values.nonEmpty, "compactPartitions: no partition values")
    val vs = values.toSet
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root — create() first"))
      val (sel, kept) = cur.files.partition(f =>
        (pvCurrent(f, spec) && f.pv.exists(vs.contains)) ||
          (!pvCurrent(f, spec) && f.rows > 0))
      val worthIt = sel.count(_.rows > 0) >= 2 ||
        sel.exists(_.dvs.exists(_.nonEmpty)) ||
        sel.exists(f => !pvCurrent(f, spec) && f.rows > 0)
      if (!worthIt) return cur.version
      val cm = colMapOf(cur)
      val v = cur.version + 1
      val files = writeFiles(spark, root,
        toPhysical(snapshotOf(spark, root, cur.copy(files = sel)), cm),
        statsColsFor(spark, root, statsCols).map(c => cm.getOrElse(c, c)),
        v.toString,
        bloomColsOf(cur).map(c => cm.getOrElse(c, c)),
        partition = Some(spec))
      if (tryCommit(spark, root, Manifest(v, "compact",
          System.currentTimeMillis(), cur.schemaDdl, kept ++ files,
          cur.streamHwm, cur.constraints, cur.bloomCols,
          cur.colMap, cur.retired)))
        committed = v
    }
    committed
  }

  /** Clustered rewrite: range-partition into `nFiles` files sorted on
    * `cols` ([[graft.ops.Compaction.compactSorted]] as a committed op),
    * so manifest min/max stats on those columns become DISJOINT ranges
    * and [[snapshotPruned]] skips whole files. The optimize-with-sort-
    * order chore every log-structured table needs after enough
    * arrival-ordered appends.
    */
  def cluster(
      spark: SparkSession,
      root: String,
      cols: Seq[String],
      nFiles: Int,
      statsCols: Seq[String] = Seq.empty): Long =
    rewrite(spark, root, "cluster", statsCols) { snap =>
      snap.repartitionByRange(nFiles, cols.map(col): _*)
        .sortWithinPartitions(cols.map(col): _*)
    }

  /** Z-ORDER clustered rewrite ([[graft.ops.ZOrder]] as a committed
    * table op — the `OPTIMIZE … ZORDER BY` shape): rows land in
    * Morton-curve order over `cols`, so per-file manifest min/max
    * stats form tight BOXES in every interleaved dimension and a
    * predicate on ANY of them prunes — where [[cluster]]'s
    * lexicographic sort prunes only its leading column. Same commit
    * protocol and pricing as cluster (one rewrite).
    */
  def clusterZ(
      spark: SparkSession,
      root: String,
      cols: Seq[String],
      nFiles: Int,
      statsCols: Seq[String] = Seq.empty): Long =
    rewrite(spark, root, "cluster", statsCols) { snap =>
      graft.ops.ZOrder.withZValue(snap, cols)
        .repartitionByRange(nFiles, col("z_value"))
        .sortWithinPartitions("z_value")
        .drop("z_value")
    }

  /** Root-relative manifests paths resolve under the table root;
    * absolute paths (shallow clones) pass through untouched.
    */
  private def resolvePath(root: String, p: String): String =
    if (p.startsWith("/") || p.contains("://")) p else s"$root/$p"

  private def snapshotOf(
      spark: SparkSession, root: String, m: Manifest): DataFrame = {
    val schema = StructType.fromDDL(m.schemaDdl)
    val cm = colMapOf(m)
    // files carry PHYSICAL names; read them, then alias back to the
    // logical schema (identity when no rename/drop is in effect)
    val physical = StructType(schema.fields.map(f =>
      f.copy(name = cm.getOrElse(f.name, f.name))))
    def read(paths: Seq[String]): DataFrame = {
      val raw = spark.read.schema(physical).parquet(paths: _*)
      if (cm.isEmpty) raw
      else raw.select(schema.fields.toSeq.map(f =>
        col(cm.getOrElse(f.name, f.name)).as(f.name)): _*)
    }
    if (m.files.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    // group files by their deletion-vector set: each group scans once,
    // then anti-joins its tombstone keys (usually ONE group with no dvs
    // — the plain fast path; MOR generations add a group per dv-set
    // until a rewrite materializes them)
    m.files.groupBy(_.dvs.getOrElse(Seq.empty)).toSeq
      .sortBy(_._1.mkString(","))
      .map { case (dvs, fsGroup) =>
        val base = read(fsGroup.map(f => resolvePath(root, f.path)))
        dvs.foldLeft(base) { (df, dv) =>
          val keys = spark.read.parquet(resolvePath(root, dv))
          df.join(keys, keys.columns.toSeq, "left_anti")
        }
      }
      .reduce(_ unionByName _)
  }

  /** EXACT row count from the manifest alone — zero data files opened,
    * zero jobs run. The per-file counts were paid once at write time;
    * `SELECT COUNT(*)` on a 100 TB table becomes an O(#files) driver
    * fold over metadata already in memory.
    */
  def rowCount(spark: SparkSession, root: String): Long = {
    val files = latestManifest(spark, root).getOrElse(
      sys.error(s"no table at $root")).files
    require(files.forall(_.dvs.isEmpty),
      "MOR deletion vectors present — per-file counts overcount deleted " +
        "rows; compact() to materialize, or count the snapshot")
    files.map(_.rows).sum
  }

  /** Global [min, max] of a stats column from the manifest alone, in
    * the DOUBLE-comparable stats space: every row lives in some file,
    * so min-of-file-mins IS the table min. None when any non-empty file
    * lacks stats for the column, or when merge-on-read deletion vectors
    * are pending (a deleted row may be the extremum) — callers fall
    * back to a scan. CAVEAT for integral columns: stats were collected
    * through a double cast, so values above 2^53 are lossy — a caller
    * converting back to long must check |v| ≤ 2^53 before claiming
    * exactness (the DSv2 aggregate pushdown declines outside that
    * range).
    */
  def statsRange(
      spark: SparkSession, root: String, column: String): Option[ColStats] = {
    val m = latestManifest(spark, root).getOrElse(
      sys.error(s"no table at $root"))
    val files = m.files.filter(_.rows > 0)
    val stats = files.flatMap(_.stats.get(physNameIn(m, column)))
    // dvs: a deleted row may BE the min/max — metadata can't claim a range
    if (files.isEmpty || stats.length < files.length ||
        files.exists(_.dvs.nonEmpty)) None
    else Some(ColStats(stats.map(_.min).min, stats.map(_.max).max))
  }

  /** Latest snapshot. */
  def snapshot(spark: SparkSession, root: String): DataFrame =
    snapshotOf(spark, root, latestManifest(spark, root).getOrElse(
      sys.error(s"no table at $root")))

  /** Time travel: the table exactly as of version `v`. */
  def snapshotAt(spark: SparkSession, root: String, v: Long): DataFrame =
    snapshotOf(spark, root, readManifest(spark, root, v))

  /** Resolve a wall-clock timestamp to the NEWEST version whose commit
    * timestamp is <= `tsMs` (the Delta `timestampAsOf` contract): a
    * timestamp between two commits resolves to the earlier one; a
    * timestamp before the first commit throws. O(commits) manifest
    * reads — the admin/travel price [[history]] already pays; the hot
    * read path stays on [[latestVersion]]'s O(1) hint.
    */
  def versionAtTimestamp(
      spark: SparkSession, root: String, tsMs: Long): Long = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no table at $root")
    val stamped = vs.map(v => v -> readManifest(spark, root, v).timestampMs)
    val at = stamped.filter(_._2 <= tsMs)
    if (at.isEmpty)
      throw new IllegalArgumentException(
        s"timestampAsOf $tsMs: precedes the first commit " +
          s"(${stamped.head._2}) at $root")
    at.map(_._1).max
  }

  /** Time travel by wall clock — the timestamp half of the standard
    * travel pair ([[snapshotAt]] is the version half). */
  def snapshotAsOfTimestamp(
      spark: SparkSession, root: String, tsMs: Long): DataFrame =
    snapshotAt(spark, root, versionAtTimestamp(spark, root, tsMs))

  /** Stats-pruned snapshot: only files whose [lo, hi] range on
    * `statsCol` overlaps the requested one (files without stats for the
    * column are conservatively kept). This prunes at the MANIFEST, so
    * skipped files cost nothing — not a listing, not a footer read.
    * Callers still apply their row-level filter; pruning only shrinks
    * the file set.
    */
  def snapshotPruned(
      spark: SparkSession,
      root: String,
      statsCol: String,
      lo: Double,
      hi: Double): DataFrame = {
    val m = latestManifest(spark, root).getOrElse(
      sys.error(s"no table at $root"))
    val pc = physNameIn(m, statsCol)
    val keep = m.files.filter(f =>
      f.stats.get(pc).forall(s => s.max >= lo && s.min <= hi))
    snapshotOf(spark, root, m.copy(files = keep))
  }

  /** BLOOM-pruned point lookup: `WHERE column = value` reading only
    * files whose bloom filter might contain the value — the skipping
    * min/max stats cannot do when a high-cardinality key's values
    * interleave across files (every file's [min,max] straddles every
    * probe). Files without a bloom for the column (pre-property files,
    * zero-row parts) are conservatively kept; false positives cost one
    * extra file scan, never a wrong row. The probe value is hashed
    * through the same `CAST(.. AS STRING) → xxhash64` pipeline the
    * write side used — and is first cast to the COLUMN's manifest type,
    * because the write side stringified the column in its own type: a
    * probe literal of a different type (7L against DECIMAL(15,2) →
    * "7" vs "7.00") would otherwise hash differently and prune the
    * file holding the real match, silently breaking the index's
    * conservativeness. Computed by a 1-row Spark job so literal-vs-
    * column cast semantics cannot drift either.
    */
  def snapshotPointEq(
      spark: SparkSession,
      root: String,
      column: String,
      value: Any): DataFrame = {
    val m = latestManifest(spark, root).getOrElse(
      sys.error(s"no table at $root"))
    val colType = StructType.fromDDL(m.schemaDdl).fields
      .find(_.name == column)
      .getOrElse(sys.error(s"no column $column in table at $root"))
      .dataType
    val h = spark.range(1)
      .select(xxhash64(lit(value).cast(colType).cast("string")))
      .head().getLong(0)
    val keep = m.files.filter(f =>
      f.blooms.flatMap(_.get(physNameIn(m, column))).forall(b =>
        Bloom.mightContain(Bloom.fromB64(b), h)))
    snapshotOf(spark, root, m.copy(files = keep))
      .filter(col(column) === lit(value))
  }

  /** Predicate-pruned snapshot: bounds extracted from `pred`'s simple
    * conjuncts prune the manifest's file list (see [[predBounds]]);
    * the FULL predicate then applies row-level, so the result equals
    * `snapshot(..).filter(pred)` with only the overlapping files read.
    */
  def snapshotWhere(
      spark: SparkSession,
      root: String,
      pred: org.apache.spark.sql.Column): DataFrame = {
    val m = latestManifest(spark, root).getOrElse(
      sys.error(s"no table at $root"))
    val bounds =
      org.apache.spark.sql.graft.GraftSqlBridge.predicateBounds(pred)
    val keep = m.files.filter(f =>
      bounds.forall { case (c, (lo, hi)) =>
        f.stats.get(physNameIn(m, c))
          .forall(s => s.max >= lo && s.min <= hi)
      })
    snapshotOf(spark, root, m.copy(files = keep)).filter(pred)
  }

  /** Rows appended after version `fromV` (exclusive) — the incremental
    * tail read a downstream pipeline runs per poll, priced O(new files)
    * regardless of table size. Sound only while every commit after
    * `fromV` is an append; a rewrite (merge/delete/compact/...) in the
    * range throws, telling the consumer to fall back to [[cdc]] or a
    * fresh [[snapshot]].
    */
  def appendsSince(
      spark: SparkSession, root: String, fromV: Long): DataFrame = {
    val latest = latestVersion(spark, root).getOrElse(
      sys.error(s"no table at $root"))
    val nonAppend = versions(spark, root)
      .filter(v => v > fromV && v <= latest)
      .map(readManifest(spark, root, _))
      .filterNot(m => m.op == "append" || m.op == "stream-append")
    if (nonAppend.nonEmpty)
      throw new IllegalStateException(
        s"appendsSince($fromV): non-append commit(s) " +
          s"${nonAppend.map(m => s"v${m.version}:${m.op}").mkString(", ")} " +
          "in range — consume via cdc() or re-read snapshot()")
    val mFrom = readManifest(spark, root, fromV)
    val mTo = readManifest(spark, root, latest)
    val old = mFrom.files.map(_.path).toSet
    snapshotOf(spark, root,
      mTo.copy(files = mTo.files.filterNot(f => old.contains(f.path))))
  }

  /** A column name guaranteed absent from `cols` (underscore-extended
    * until free) — used for join-existence sentinels so `withColumn`
    * can never replace a user column.
    */
  private def sentinelName(cols: Array[String]): String = {
    var n = "_graft_ex"
    while (cols.contains(n)) n += "_"
    n
  }

  /** Enable CHANGE DATA FEED on an existing table: every subsequent
    * row-changing rewrite (overwrite / merge / merge-full / delete)
    * materializes its change rows (table columns + `_change_type`) to
    * a per-version `_cdf/` directory at commit time, keyed by
    * `keyCols`. This is what lets a streaming reader
    * (`readChangeFeed=true` on [[graft.table.GraftTableProvider]])
    * ride THROUGH rewrites instead of failing on them: appends stream
    * as plain inserts from the file diff, rewrites stream from their
    * materialized change rows, compact/cluster (no logical change)
    * stream as nothing. The cost model matches Delta's CDF: one keyed
    * diff join per rewrite at WRITE time (rewrites are rare and
    * already O(table)), zero extra work per append, zero read
    * amplification for consumers.
    *
    * Keys are stored once in `_cdf/_keys.json` (not per-manifest — the
    * key set is a table property, and a separate file keeps old
    * manifests byte-stable). Idempotent for the same keys; refuses a
    * key change (downstream checkpoints would misinterpret history).
    */
  def enableCdf(
      spark: SparkSession, root: String, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "enableCdf needs at least one key column")
    latestVersion(spark, root).getOrElse(
      sys.error(s"no table at $root — create() first"))
    cdfKeysOf(spark, root) match {
      case Some(existing) =>
        require(existing == keyCols,
          s"CDF already enabled with keys $existing — cannot change " +
            s"to $keyCols (consumers' checkpoints would misread history)")
      case None =>
        val p = new Path(s"$root/$ChangeDir", "_keys.json")
        val f = fs(spark, p)
        val out = f.create(p, true)
        try out.write(Serialization.write(keyCols)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
    }
  }

  /** CDF key columns if [[enableCdf]] has been called; None = feed
    * disabled (rewrites write no change rows).
    */
  def cdfKeysOf(spark: SparkSession, root: String): Option[Seq[String]] = {
    val p = new Path(s"$root/$ChangeDir", "_keys.json")
    val f = fs(spark, p)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val bytes =
        try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
          out.toByteArray
        } finally in.close()
      Some(Serialization.read[Seq[String]](
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
    }
  }

  /** Row-level CHANGE DATA CAPTURE between two versions, computed as a
    * keyed full-outer join of the two snapshots (one shuffle per side;
    * at cluster scale, run it on the partitions whose file sets differ
    * between the manifests — the manifest diff IS the pruning).
    *
    * Output: key columns + `_change_type` ('insert' | 'update' |
    * 'delete') + the non-key columns — post-image for insert/update,
    * pre-image for delete. Unchanged rows are absent. Column-wise
    * null-safe comparison (`<=>`), so a null→value change is an update.
    */
  def cdc(
      spark: SparkSession,
      root: String,
      fromV: Long,
      toV: Long,
      keyCols: Seq[String]): DataFrame = {
    // Existence after the full-outer join is probed via a non-null
    // sentinel selected on each side BEFORE the join — probing a key
    // column would misclassify a NULL-keyed row present in both
    // versions as an insert (both probes false) even though the
    // null-safe join condition paired it correctly. The sentinel name
    // is derived to be absent from the schema: withColumn silently
    // REPLACES a same-named user column, which would both mask that
    // column in the `differs` probe and corrupt its emitted values.
    val post0 = snapshotAt(spark, root, toV)
    val ex = sentinelName(post0.columns)
    val pre = snapshotAt(spark, root, fromV)
      .withColumn(ex, lit(true)).alias("pre")
    val dataCols = post0.columns.toSeq.filterNot(keyCols.contains)
    val post = post0.withColumn(ex, lit(true)).alias("post")
    val joinCond = keyCols.map(k => col(s"pre.$k") <=> col(s"post.$k"))
      .reduce(_ && _)
    val differs = dataCols.map(c => !(col(s"pre.$c") <=> col(s"post.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val preExists = col(s"pre.$ex").isNotNull
    val postExists = col(s"post.$ex").isNotNull
    pre.join(post, joinCond, "full_outer")
      .withColumn("_change_type",
        when(!preExists, lit("insert"))
          .when(!postExists, lit("delete"))
          .when(differs, lit("update")))
      .filter(col("_change_type").isNotNull)
      .select(
        keyCols.map(k =>
          coalesce(col(s"post.$k"), col(s"pre.$k")).as(k)) ++
          Seq(col("_change_type")) ++
          dataCols.map(c =>
            when(col("_change_type") === "delete", col(s"pre.$c"))
              .otherwise(col(s"post.$c")).as(c)): _*)
  }

  /** CHANGE DATA FEED between two versions: like [[cdc]] but updates
    * emit BOTH images as separate rows (`update_preimage` then
    * `update_postimage`) — the row shape downstream incremental
    * consumers need (an aggregate maintained by delta application
    * subtracts the pre-image and adds the post-image; a single
    * post-only 'update' row cannot express that). Same single keyed
    * full-outer join as [[cdc]]; the two update rows come from ONE
    * generate over the joined row, not a second pass.
    */
  def cdf(
      spark: SparkSession,
      root: String,
      fromV: Long,
      toV: Long,
      keyCols: Seq[String]): DataFrame =
    diffRows(snapshotAt(spark, root, fromV),
      snapshotAt(spark, root, toV), keyCols)

  /** The [[cdf]] diff on two arbitrary same-schema frames — shared by
    * the batch CDF read and the WRITE-time change-row materialization
    * ([[rewrite]] under [[enableCdf]], where pre/post are the commit's
    * input snapshot and output frame and no re-read is needed).
    */
  private[table] def diffRows(
      pre0: DataFrame,
      post0: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    // Same non-null existence sentinel as [[cdc]]: a NULL-keyed row
    // present in both versions must classify by the `differs` probe,
    // not fall through to 'insert'. Sentinel name derived to avoid
    // clobbering a same-named user column (see [[cdc]]).
    val ex = sentinelName(post0.columns)
    val pre = pre0.withColumn(ex, lit(true)).alias("pre")
    val allCols = post0.columns.toSeq
    val dataCols = allCols.filterNot(keyCols.contains)
    val post = post0.withColumn(ex, lit(true)).alias("post")
    val joinCond = keyCols.map(k => col(s"pre.$k") <=> col(s"post.$k"))
      .reduce(_ && _)
    val differs = dataCols.map(c => !(col(s"pre.$c") <=> col(s"post.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val preExists = col(s"pre.$ex").isNotNull
    val postExists = col(s"post.$ex").isNotNull
    def tagged(side: String, t: String) = struct(
      struct(allCols.map(c => col(s"$side.$c").as(c)): _*).as("r"),
      lit(t).as("t"))
    pre.join(post, joinCond, "full_outer")
      .filter(!preExists || !postExists || differs)
      .select(explode(
        when(!preExists, array(tagged("post", "insert")))
          .when(!postExists, array(tagged("pre", "delete")))
          .otherwise(array(tagged("pre", "update_preimage"),
            tagged("post", "update_postimage")))).as("e"))
      .select(allCols.map(c => col(s"e.r.$c").as(c))
        :+ col("e.t").as("_change_type"): _*)
  }

  /** Commit history as a DataFrame (from the manifests alone — no data
    * files touched): version, op, timestamp_ms, n_files, n_rows.
    */
  def history(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    versions(spark, root)
      .map(readManifest(spark, root, _))
      .map(m => (m.version, m.op, m.timestampMs, m.files.size.toLong,
        m.files.map(_.rows).sum))
      .toDF("version", "op", "timestamp_ms", "n_files", "n_rows")
  }

  /** RESTORE the table to an earlier version as a NEW commit (the
    * Delta RESTORE shape): the target manifest's file set, schema and
    * column mapping are re-committed at latest+1 — O(metadata), zero
    * data rewritten, and the in-between history stays time-travelable.
    * Governance state does NOT regress: `streamHwm` (the exactly-once
    * ingest fence), `constraints` and `bloomCols` carry forward from
    * the CURRENT version — a restore must never re-open a committed
    * micro-batch id. Under [[enableCdf]] the restore materializes its
    * change rows (current vs target diff) like any rewrite, so CDF
    * consumers ride through it. Caveat shared with the public formats:
    * the target's files must still exist ([[vacuum]] can reclaim
    * them).
    */
  def restore(spark: SparkSession, root: String, toVersion: Long): Long = {
    var committed = -1L
    while (committed < 0) {
      val cur = latestManifest(spark, root).getOrElse(
        sys.error(s"no table at $root — create() first"))
      require(toVersion < cur.version,
        s"restore($toVersion): not an earlier version " +
          s"(current is ${cur.version})")
      val target = readManifest(spark, root, toVersion)
      val v = cur.version + 1
      // Carried-forward governance must RESOLVE in the restored
      // namespace (the r11 ADVICE hazard: a rename between target and
      // current leaves bloomCols/constraints naming columns the
      // restored schema doesn't have). Bloom columns translate through
      // the PHYSICAL namespace — the physical name is the invariant —
      // and silently drop only if their column no longer exists at the
      // target (the dropColumn precedent: a bloom is an index, absence
      // is merely "might contain"). Constraints are SQL text and
      // cannot be rewritten safely: any constraint referencing a
      // column the target schema lacks REFUSES the restore.
      val targetSchema = StructType.fromDDL(target.schemaDdl)
      val physToTargetLogical = colMapOf(target).map(_.swap)
      def inTarget(curLogical: String): Option[String] = {
        val phys = physNameIn(cur, curLogical)
        val tl = physToTargetLogical.getOrElse(phys, phys)
        if (targetSchema.fieldNames.contains(tl)) Some(tl) else None
      }
      val blooms2 = cur.bloomCols.map(_.flatMap(c => inTarget(c).toSeq))
        .filter(_.nonEmpty)
      val curSchema = StructType.fromDDL(cur.schemaDdl)
      val orphaned = curSchema.fieldNames
        .filter(c => inTarget(c).isEmpty || !inTarget(c).contains(c))
        .flatMap(c => constraintsReferencing(cur, c))
        .distinct
      require(orphaned.isEmpty,
        s"restore($toVersion): constraint(s) ${orphaned.mkString(", ")} " +
          "reference column(s) renamed or absent at the target version " +
          "— drop or rewrite the constraint(s) first")
      val cdfRel = cdfKeysOf(spark, root).map { keys =>
        require(StructType.fromDDL(cur.schemaDdl).fieldNames.sorted
            .sameElements(
              StructType.fromDDL(target.schemaDdl).fieldNames.sorted),
          "restore under CDF: schema-changing restore (change rows " +
            "cannot describe it) — drop _cdf/_keys.json first")
        val rel = s"$ChangeDir/v$v-" +
          java.util.UUID.randomUUID.toString.take(8)
        diffRows(snapshotOf(spark, root, cur),
          snapshotOf(spark, root, target), keys)
          .write.parquet(s"$root/$rel")
        rel
      }
      if (tryCommit(spark, root, Manifest(v, "restore",
          System.currentTimeMillis(), target.schemaDdl, target.files,
          cur.streamHwm, cur.constraints, blooms2,
          target.colMap, target.retired, cdfDir = cdfRel)))
        committed = v
    }
    committed
  }

  /** Reclaim data files not referenced by the `retainLast` most recent
    * manifests (lost-race orphans and pre-rewrite file sets). Older
    * versions stop being time-travelable — their manifests remain as
    * history but their files may be gone. Returns the deleted
    * root-relative paths.
    *
    * `graceMs` (default 20 min) skips unreferenced files YOUNGER than
    * the window — the Delta tombstone-retention pattern. An in-flight
    * distributed write (COW tasks, CDF materialization, appends)
    * creates its files BEFORE the manifest rename publishes them; a
    * vacuum racing that window would otherwise delete about-to-commit
    * data and leave the winning manifest pointing at nothing. Pass 0
    * only when no writer can be in flight (tests, single-writer
    * maintenance windows).
    */
  def vacuum(
      spark: SparkSession, root: String, retainLast: Int = 2,
      graceMs: Long = 20L * 60L * 1000L): Seq[String] = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no table at $root")
    val retainedManifests = vs.takeRight(math.max(1, retainLast))
      .map(readManifest(spark, root, _))
    val retained = retainedManifests
      .flatMap { m =>
        // deletion-vector sidecars live under data/ too — a referenced
        // dv is as load-bearing as a referenced data file. Sidecar
        // paths are directories (one parquet write each): retain every
        // file under them by prefix.
        m.files.map(_.path) ++ m.files.flatMap(_.dvs.getOrElse(Seq.empty))
      }.toSet
    // change-data dirs: a manifest's cdfDir becomes reclaimable only
    // when its version ages out of retention; lost-race orphans (dirs
    // no manifest ever pointed at) are reclaimable immediately
    val retainedCdf = retainedManifests.flatMap(_.cdfDir).toSet
    def isRetained(rel: String): Boolean =
      retained.contains(rel) ||
        retained.exists(p => rel.startsWith(p + "/")) ||
        retainedCdf.exists(p => rel == p || rel.startsWith(p + "/"))
    val deleted = Seq.newBuilder[String]
    val rootUri = new Path(root).toUri.getPath.stripSuffix("/")
    val cutoffMs = System.currentTimeMillis() - math.max(0L, graceMs)
    Seq(new Path(root, DataDir), new Path(root, ChangeDir))
      .foreach { walkRoot =>
        val f = fs(spark, walkRoot)
        if (f.exists(walkRoot)) {
          val it = f.listFiles(walkRoot, true)
          while (it.hasNext) {
            val st = it.next()
            val rel = st.getPath.toUri.getPath.stripPrefix(rootUri)
              .stripPrefix("/")
            if (st.isFile && !isRetained(rel) &&
                st.getModificationTime <= cutoffMs &&
                !st.getPath.getName.startsWith("_")) {
              f.delete(st.getPath, false)
              deleted += rel
            }
          }
        }
      }
    deleted.result()
  }
}
