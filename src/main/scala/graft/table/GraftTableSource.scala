package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** [[TxnTable]] as a FIRST-CLASS Spark DataSource V2 —
  * `spark.read.format("graft.table.GraftTableProvider").load(root)`
  * gives planner-integrated reads of the transactional table:
  *
  *   - schema comes from the latest manifest (no file listing, no
  *     footer reads — O(1) metadata like every TxnTable read path);
  *   - comparison predicates push down into MANIFEST-LEVEL file
  *     skipping at `planInputPartitions` time: a probe of one key
  *     range plans only the stats-overlapping files as input
  *     partitions, so at 100 TB the executor count and IO scale with
  *     the touched range, not the table (the DSv2 twin of
  *     [[TxnTable.snapshotWhere]]);
  *   - pushed filters are also re-applied by Spark above the scan
  *     (`pushFilters` returns every filter as residual), so pruning is
  *     a pure optimization that can never change results.
  *
  * The per-file reader uses the parquet example API (Group) and
  * supports the scalar column types the table format's fixtures use
  * (BOOLEAN/INT32/INT64/FLOAT/DOUBLE/BINARY-string); a column present
  * in the read schema but absent from an (older) data file reads as
  * NULL — schema evolution flows through DSv2 unchanged. Production
  * tables would swap in the vectorized parquet reader; the CONNECTOR
  * surface (schema inference, pushdown, pruned planning) is the real
  * contract and is what the specs pin.
  */
class GraftTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = GraftTableProvider.rootOf(options)
    val conf = new Configuration()
    val m = GraftTableProvider.manifestFor(conf, root,
      GraftTableProvider.resolveVersion(conf, root, options))
    // All-nullable: schema evolution means ANY column can be absent
    // (and thus NULL) in pre-evolution files — a non-nullable field
    // would let Spark constant-fold IsNull and mis-read the nulls.
    val data = StructType(StructType.fromDDL(m.schemaDdl)
      .fields.map(_.copy(nullable = true)))
    // readChangeFeed: rows are CHANGES, tagged with what happened and
    // in which commit (the Delta-CDF column pair).
    if (GraftTableProvider.cdfOf(options))
      StructType(data.fields :+
        StructField("_change_type", StringType, nullable = true) :+
        StructField("_commit_version", LongType, nullable = true))
    else data
  }
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftTable(properties.get("path"), schema,
      cdf = GraftTableProvider.cdfOf(
        new CaseInsensitiveStringMap(properties)))
  override def supportsExternalMetadata(): Boolean = true
}

object GraftTableProvider {
  def rootOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft table source requires a path")
    p
  }

  /** `.option("readChangeFeed", true)` — stream the table as CHANGE
    * ROWS instead of appended rows ([[GraftCdfMicroBatchStream]]). */
  def cdfOf(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("readChangeFeed", false)
  /** Time travel through the connector: `.option("versionAsOf", v)`
    * pins both the schema inference and the scan to version v's
    * manifest — the DSv2 twin of [[TxnTable.snapshotAt]].
    */
  def versionOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("versionAsOf")).map { v =>
      v.toLongOption.getOrElse(
        throw new IllegalArgumentException(
          s"versionAsOf must be an integer version, got '$v'"))
    }

  /** `.option("timestampAsOf", ts)` — the wall-clock half of the
    * travel pair, accepted as epoch millis, an ISO-8601 instant, or
    * `yyyy-MM-dd HH:mm:ss` (UTC). Mutually exclusive with
    * `versionAsOf`; resolved against manifest commit timestamps by
    * the [[TxnTable.versionAtTimestamp]] contract (newest commit at
    * or before ts).
    */
  def timestampOf(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("timestampAsOf")).map { raw =>
      raw.toLongOption.getOrElse {
        try java.time.Instant.parse(raw).toEpochMilli
        catch {
          case _: java.time.format.DateTimeParseException =>
            try java.time.LocalDateTime
              .parse(raw, java.time.format.DateTimeFormatter
                .ofPattern("yyyy-MM-dd HH:mm:ss"))
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
            catch {
              case _: java.time.format.DateTimeParseException =>
                throw new IllegalArgumentException(
                  s"timestampAsOf: cannot parse '$raw' (epoch millis, " +
                    "ISO-8601 instant, or yyyy-MM-dd HH:mm:ss expected)")
            }
        }
      }
    }

  /** The version a read should pin to, from the travel options (at
    * most one of versionAsOf / timestampAsOf; None = latest).
    */
  def resolveVersion(conf: Configuration, root: String,
      options: CaseInsensitiveStringMap): Option[Long] = {
    val v = versionOf(options)
    val ts = timestampOf(options)
    require(v.isEmpty || ts.isEmpty,
      "specify at most one of versionAsOf / timestampAsOf")
    ts match {
      case None => v
      case Some(tsMs) => Some(versionAtMs(conf, root, tsMs))
    }
  }

  /** Newest committed version at-or-before `tsMs` (epoch millis) —
    * the SparkSession-free twin of [[TxnTable.versionAtTimestamp]],
    * shared by the reader option and the catalog's `TIMESTAMP AS OF`
    * overload.
    */
  def versionAtMs(conf: Configuration, root: String, tsMs: Long): Long = {
    val stamped = listVersions(conf, root)
      .map(vv => vv -> manifestFor(conf, root, Some(vv)).timestampMs)
    val at = stamped.filter(_._2 <= tsMs)
    if (at.isEmpty)
      throw new IllegalArgumentException(
        s"timestampAsOf $tsMs: precedes the first commit " +
          s"(${stamped.map(_._2).min}) at $root")
    at.map(_._1).max
  }

  /** All committed versions at `root`, ascending — SparkSession-free
    * ([[TxnTable.versions]]' planning-time twin). */
  def listVersions(conf: Configuration, root: String): Seq[Long] = {
    val dir = new Path(root, "_log")
    val fs = dir.getFileSystem(conf)
    val vs = fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d{20}\\.json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong
      }
    require(vs.nonEmpty, s"no graft table at $root")
    vs.sorted
  }
  /** Manifest read WITHOUT a SparkSession (DSv2 runs during planning
    * and on executors): same layout as [[TxnTable]], Hadoop FS only.
    * `version = None` resolves the latest committed manifest.
    */
  def manifestFor(conf: Configuration, root: String,
      version: Option[Long]): TxnTable.Manifest = {
    val dir = new Path(root, "_log")
    val fs = dir.getFileSystem(conf)
    val vs = listVersions(conf, root)
    val v = version.getOrElse(vs.max)
    require(vs.contains(v),
      s"versionAsOf $v: no such committed version at $root " +
        s"(have ${vs.min}..${vs.max})")
    val p = new Path(dir, f"v$v%020d.json")
    // immutable-manifest cache (see TxnTable.readManifestCached): one
    // plan touches the manifest many times; the hit costs a
    // getFileStatus, not a re-read+parse of the whole file list
    TxnTable.readManifestCached(fs, p)
  }

  def latestManifest(conf: Configuration, root: String): TxnTable.Manifest =
    manifestFor(conf, root, None)
}

/** `pinned` carries a catalog-level time-travel version (`SELECT ...
  * VERSION AS OF` / `TIMESTAMP AS OF` resolve BEFORE scan building, at
  * `loadTable` time) — it takes precedence over reader options, which
  * SQL text has no way to set anyway.
  */
class GraftTable(root: String, tableSchema: StructType,
    pinned: Option[Long] = None, cdf: Boolean = false)
    extends Table
    with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
    with org.apache.spark.sql.connector.catalog.TruncatableTable {

  /** SQL `TRUNCATE TABLE cat.t` — an empty-overwrite COMMIT, not a
    * file purge: history keeps every version (time travel across the
    * truncate works; vacuum reclaims when retention allows), and
    * constraints / bloom opt-ins / the stats property all carry
    * forward, so the next INSERT behaves exactly like before.
    */
  override def truncateTable(): Boolean = {
    require(pinned.isEmpty && !cdf,
      "TRUNCATE TABLE is not supported on time-travel or change-feed " +
        "relations")
    val spark = org.apache.spark.sql.SparkSession.active
    TxnTable.overwrite(spark, root, spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), tableSchema))
    true
  }
  override def name(): String = s"graft_table($root)"

  /** DSv2 layout report (`Table.partitioning()`): DESCRIBE TABLE and
    * catalog tooling see the table's bucket or identity/days layout
    * as standard transforms over LOGICAL column names. Report-only —
    * the write path routes layouts through TxnTable itself; dropped/
    * renamed layout columns simply vanish from the report (the scan
    * degrades the same way).
    */
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    val conf = new Configuration()
    val cm = GraftTableProvider.manifestFor(conf, root, pinned)
      .colMap.getOrElse(Map.empty[String, String])
    def logicalOf(pc: String): Option[String] = {
      val l = cm.find(_._2 == pc).map(_._1).getOrElse(pc)
      if (tableSchema.fieldNames.contains(l) &&
          !cm.get(l).exists(_ != pc)) Some(l) else None
    }
    val buckets = TxnTable.bucketSpec(conf, root).toSeq.flatMap { b =>
      val ls = TxnTable.bucketColsOf(b).map(logicalOf)
      if (ls.forall(_.isDefined))
        Some(Expressions.bucket(b.n, ls.flatten: _*)
          : org.apache.spark.sql.connector.expressions.Transform)
      else None
    }
    val parts = TxnTable.partitionSpec(conf, root).toSeq
      .flatMap(TxnTable.partCompsOf)
      .flatMap(c => logicalOf(c.col).map(l => c.transform match {
        case "days" => Expressions.days(l)
          : org.apache.spark.sql.connector.expressions.Transform
        case _ => Expressions.identity(l)
          : org.apache.spark.sql.connector.expressions.Transform
      }))
    (buckets ++ parts).toArray
  }

  /** `_file` metadata column: the MANIFEST path of the data file each
    * row came from (`SELECT _file, ... FROM cat.t`). Beyond ad-hoc
    * provenance queries, this is the FILE-GROUP HANDLE the row-level
    * COW path prunes on — Spark's runtime group filtering collects the
    * distinct `_file` values matching an UPDATE/MERGE condition and
    * pushes them back as an IN filter, so only matched files rewrite
    * ([[GraftRowLevelOperation]]). Not exposed on change-feed
    * relations: change rows are commit artifacts, not file rows.
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    if (cdf) Array.empty
    else Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = GraftScan.FileCol
        override def dataType()
            : org.apache.spark.sql.types.DataType = StringType
        override def isNullable: Boolean = false
        override def comment(): String =
          "manifest path of the data file this row belongs to"
      })

  /** SQL UPDATE / MERGE INTO (DSv2 row-level operations, group-based
    * copy-on-write with the whole table as the group —
    * [[GraftRowLevelOperation]]); DELETE binds via the cheaper
    * SupportsDelete path above.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinned.isEmpty && !cdf,
      "row-level operations are not supported on time-travel or " +
        "change-feed relations")
    () => new GraftRowLevelOperation(root, tableSchema, info.command())
  }

  /** SQL `DELETE FROM cat.t WHERE p` (DSv2 SupportsDelete): the
    * predicate arrives as v1 filters; every conjunct must convert to a
    * Column or the delete is REFUSED at analysis time
    * (`canDeleteWhere`) — silently deleting more or fewer rows than
    * the predicate names is the one failure mode a table format can
    * never have. Execution is [[TxnTable.deleteWhere]]: a full
    * rewrite commit with constraints/CDF applied.
    */
  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    pinned.isEmpty && !cdf &&
      filters.forall(f => GraftTable.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    require(canDeleteWhere(filters),
      s"graft table DELETE: unsupported predicate " +
        s"${filters.mkString(", ")} (or time-travel/CDF relation)")
    val spark = org.apache.spark.sql.SparkSession.active
    // PARTITION-DROP FAST PATH: a predicate that exactly names
    // partition values of an identity-partitioned table (every
    // conjunct an =/IN on the partition column) commits as an
    // O(metadata) manifest operation — `DELETE WHERE day = …` never
    // reads, let alone rewrites, a petabyte of untouched data.
    partitionDropPredicate(filters) match {
      case Some(pvPred) =>
        // straggler (pv-less) files re-filter by the ORIGINAL
        // predicate over the real columns — exact DELETE semantics
        val cond = filters.flatMap(GraftTable.filterToColumn)
          .reduceOption(_ && _)
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        TxnTable.dropPartitionsWhere(spark, root, pvPred,
          rowCond = _ => cond)
      case None =>
        val cond = filters.flatMap(GraftTable.filterToColumn)
          .reduceOption(_ && _)
          .getOrElse(org.apache.spark.sql.functions.lit(true))
        TxnTable.deleteWhere(spark, root, cond)
    }
    ()
  }

  /** The pv-space predicate a DELETE names, when — and only when —
    * EVERY conjunct is an equality / IN / range comparison on the
    * identity-partition column with typed-comparable literals
    * (conjuncts on other columns, or a non-identity transform, mean
    * only SOME rows of a partition can match → the rewrite path).
    * Comparison happens in the COLUMN's domain, decoded from the
    * canonical pv string — lexical string compare would order ints
    * wrongly ("10" < "9"). The range forms are the RETENTION shape:
    * `DELETE WHERE day < '2026-01-01'` commits as a pure manifest
    * operation. [[TxnTable.NullPv]] matches no comparison (SQL
    * predicates reject NULL).
    */
  private def partitionDropPredicate(
      filters: Array[sources.Filter]): Option[String => Boolean] = {
    if (filters.isEmpty) return None
    val conf = new Configuration()
    val spec = TxnTable.partitionSpec(conf, root).getOrElse(return None)
    val comps = TxnTable.partCompsOf(spec)
    val k = comps.length
    val m = GraftTableProvider.latestManifest(conf, root)
    val cm = m.colMap.getOrElse(Map.empty[String, String])
    val schemaFields = StructType.fromDDL(m.schemaDdl).fields
    // (component index, column type) per IDENTITY component, keyed by
    // logical name — a days component's column cannot decide pv
    // membership through an equality/range on the raw timestamp (many
    // timestamps share one day), so conjuncts on it go the rewrite path
    val identByLogical: Map[String, (Int, DataType)] =
      comps.zipWithIndex.collect {
        case (c, i) if c.transform == "identity" =>
          val logical =
            cm.find(_._2 == c.col).map(_._1).getOrElse(c.col)
          schemaFields.find(_.name == logical)
            .map(f => logical -> (i, f.dataType))
      }.flatten.toMap
    if (identByLogical.isEmpty) return None
    def canon(v: Any, t: DataType): Option[String] = (v, t) match {
      case (s: String, StringType) => Some(s)
      case (i: java.lang.Integer, IntegerType) => Some(i.toString)
      case (l: java.lang.Long, LongType) => Some(l.toString)
      case (d: java.sql.Date, DateType) => Some(d.toLocalDate.toString)
      case _ => None
    }
    // typed total order on canonical pv strings; None = incomparable.
    // Strings order by UTF8String (code-point/binary order — Spark's
    // own string ordering); Java String.compareTo is UTF-16 code-unit
    // order, which disagrees beyond the BMP.
    def cmp(t: DataType)(pv: String, lit: String): Option[Int] = t match {
      case IntegerType | LongType =>
        (pv.toLongOption, lit.toLongOption) match {
          case (Some(a), Some(b)) => Some(java.lang.Long.compare(a, b))
          case _ => None
        }
      case StringType =>
        Some(UTF8String.fromString(pv).compareTo(UTF8String.fromString(lit)))
      case DateType => Some(pv.compareTo(lit)) // ISO dates: digits only
      case _ => None
    }
    val nn = TxnTable.NullPv
    // each conjunct resolves to (component index, per-VALUE predicate)
    type VPred = String => Boolean
    def at(c: String)(build: (DataType, Int) => Option[VPred])
        : Option[(Int, VPred)] =
      identByLogical.get(c).flatMap { case (i, t) =>
        build(t, i).map(p => (i, p))
      }
    val preds: Seq[Option[(Int, VPred)]] = filters.toSeq.map {
      case sources.EqualTo(c, v) => at(c) { (t, _) =>
        canon(v, t).map(cv => (pv: String) => pv != nn && pv == cv)
      }
      case sources.In(c, vs) if vs.nonEmpty => at(c) { (t, _) =>
        val cs = vs.toSeq.map(canon(_, t))
        if (cs.forall(_.isDefined)) {
          val set = cs.flatten.toSet
          Some((pv: String) => pv != nn && set.contains(pv))
        } else None
      }
      case sources.LessThan(c, v) => at(c) { (t, _) =>
        canon(v, t).map(cv =>
          (pv: String) => pv != nn && cmp(t)(pv, cv).exists(_ < 0))
      }
      case sources.LessThanOrEqual(c, v) => at(c) { (t, _) =>
        canon(v, t).map(cv =>
          (pv: String) => pv != nn && cmp(t)(pv, cv).exists(_ <= 0))
      }
      case sources.GreaterThan(c, v) => at(c) { (t, _) =>
        canon(v, t).map(cv =>
          (pv: String) => pv != nn && cmp(t)(pv, cv).exists(_ > 0))
      }
      case sources.GreaterThanOrEqual(c, v) => at(c) { (t, _) =>
        canon(v, t).map(cv =>
          (pv: String) => pv != nn && cmp(t)(pv, cv).exists(_ >= 0))
      }
      // null-scoped conjuncts users commonly add alongside ranges:
      // IS NOT NULL keeps everything but the null partition; DELETE
      // WHERE <part> IS NULL drops exactly the null partition
      case sources.IsNotNull(c) => at(c) { (_, _) =>
        Some((pv: String) => pv != nn)
      }
      case sources.IsNull(c) => at(c) { (_, _) =>
        Some((pv: String) => pv == nn)
      }
      case _ => None
    }
    if (preds.forall(_.isDefined)) {
      val ps = preds.flatten
      // composite pv: decode into components, apply each conjunct to
      // ITS component's value. A conjunction over any SUBSET of the
      // partition columns still decides every file outright — the
      // unconstrained components simply don't filter.
      Some((pv: String) => TxnTable.pvComponents(pv, k) match {
        case Some(parts) => ps.forall { case (i, p) => p(parts(i)) }
        case None => false // undecodable: dropPartitionsWhere rewrites
      })
    } else None
  }
  override def schema(): StructType = tableSchema

  /** The table's CHECK constraints (DSv2 constraint surface): reported
    * from the manifest so `DESCRIBE` and the analyzer see what every
    * write path enforces. Always enforced + validated (addConstraint
    * scanned existing rows before committing).
    */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    if (cdf) Array.empty
    else GraftTableProvider.manifestFor(new Configuration(), root, pinned)
      .constraints.getOrElse(Map.empty).toSeq.sortBy(_._1).map {
        case (name, sql) =>
          org.apache.spark.sql.connector.catalog.constraints.Constraint
            .check(name).predicateSql(sql)
            .enforced(true)
            .validationStatus(org.apache.spark.sql.connector.catalog
              .constraints.Constraint.ValidationStatus.VALID)
            .build(): org.apache.spark.sql.connector.catalog
              .constraints.Constraint
      }.toArray

  /** Table metadata for `DESCRIBE TABLE EXTENDED` / `SHOW
    * TBLPROPERTIES`: the layout and index opt-ins a user needs to
    * understand the table's read/write behavior — bucket spec,
    * bloom'd columns, the persisted stats opt-in, version, file
    * count. O(1) metadata (the manifest read is the same one
    * loadTable already paid for; sidecars are two existence probes).
    */
  override def properties(): java.util.Map[String, String] = {
    val conf = new Configuration()
    val out = new java.util.HashMap[String, String]()
    try {
      val m = GraftTableProvider.manifestFor(conf, root, pinned)
      out.put("version", m.version.toString)
      out.put("numFiles", m.files.size.toString)
      m.bloomCols.filter(_.nonEmpty)
        .foreach(bc => out.put("bloomCols", bc.mkString(",")))
      TxnTable.bucketSpec(conf, root).foreach { b =>
        out.put("bucketColumn", b.col)
        out.put("numBuckets", b.n.toString)
      }
      TxnTable.tableProps(conf, root).foreach { case (k, v) =>
        out.put(k, v)
      }
    } catch { case _: Exception => () } // properties are advisory
    out
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, tableSchema,
      pinned.orElse(GraftTableProvider
        .resolveVersion(new Configuration(), root, options)),
      Option(options.get("startingVersion")).map { v =>
        v.toLongOption.getOrElse(throw new IllegalArgumentException(
          s"startingVersion must be an integer version, got '$v'"))
      },
      cdf || GraftTableProvider.cdfOf(options),
      maxFilesPerTrigger = Option(options.get("maxFilesPerTrigger"))
        .map(v => v.toIntOption.filter(_ > 0).getOrElse(
          throw new IllegalArgumentException(
            s"maxFilesPerTrigger must be a positive integer, got '$v'"))),
      maxBytesPerTrigger = Option(options.get("maxBytesPerTrigger"))
        .map(v => v.toLongOption.filter(_ > 0).getOrElse(
          throw new IllegalArgumentException(
            s"maxBytesPerTrigger must be a positive long, got '$v'"))))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new GraftWriteBuilder(root, info)
}

/** DSv2 WRITE path via the V1Write fallback:
  * `df.write.format(...).mode("append"|"overwrite").save(root)` lands
  * as a [[TxnTable.append]]/[[TxnTable.overwrite]] commit — the data
  * files are written DISTRIBUTED (TxnTable's own parquet write), the
  * fallback only routes orchestration through the session, and the
  * atomic manifest rename stays the single commit point (a failed job
  * leaves only unreferenced files for vacuum, never a partial
  * version). Write option `statsCols` (comma-separated) requests
  * per-file min/max stats so DSv2-written files prune like any others.
  */
object GraftTable {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, not}

  /** Conservative v1-filter → Column translation for SQL DELETE: only
    * predicates with exact Column semantics convert; anything else
    * returns None and the delete is refused (never approximated).
    */
  def filterToColumn(f: sources.Filter): Option[Column] = f match {
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.And(l, r) =>
      for (lc <- filterToColumn(l); rc <- filterToColumn(r))
        yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- filterToColumn(l); rc <- filterToColumn(r))
        yield lc || rc
    case sources.Not(c) => filterToColumn(c).map(not)
    case _ => None
  }
}

class GraftWriteBuilder(
    root: String,
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var overwrite = false
  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    overwrite = true
    this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.V1Write {
      override def toInsertableRelation
          : org.apache.spark.sql.sources.InsertableRelation =
        (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
          val spark = data.sparkSession
          val statsCols = Option(info.options.get("statsCols"))
            .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            .getOrElse(Seq.empty)
          // Delta-style dynamic partition overwrite: mode("overwrite")
          // + .option("partitionOverwriteMode","dynamic") replaces
          // exactly the partitions present in the incoming batch
          // (TxnTable.overwritePartitions) instead of the whole table
          val dynamic = Option(
            info.options.get("partitionOverwriteMode"))
            .exists(_.equalsIgnoreCase("dynamic"))
          if (overwrite && dynamic)
            TxnTable.overwritePartitions(spark, root, data, statsCols)
          else if (overwrite)
            TxnTable.overwrite(spark, root, data, statsCols)
          else TxnTable.append(spark, root, data, statsCols)
          ()
        }

      /** `writeStream.format("graft")` — the native exactly-once
        * sink ([[GraftStreamingWrite]]). Append output mode only;
        * `.option("mergeSchema", "true")` lets a restarted stream
        * whose df grew a column WIDEN the table schema atomically
        * with its first epoch ([[TxnTable.commitStreamFiles]]).
        */
      override def toStreaming: org.apache.spark.sql.connector.write
          .streaming.StreamingWrite = {
        require(!overwrite,
          "graft streaming sink supports APPEND output mode only — " +
            "for complete/upsert semantics use foreachBatch with " +
            "TxnTable.mergeFull/appendBatch")
        val evolve = Option(info.options.get("mergeSchema"))
          .exists(_.equalsIgnoreCase("true"))
        new GraftStreamingWrite(root, info.schema(), evolve)
      }
    }
}

/** `prune = false` (the row-level COW scan): the scan must read the
  * WHOLE table — its output defines the replacement group, so a
  * file-pruned scan would silently DROP the pruned files' rows when
  * the write replaces the table.
  */
class GraftScanBuilder(root: String, schema: StructType,
    version: Option[Long] = None, startingVersion: Option[Long] = None,
    cdf: Boolean = false, prune: Boolean = true,
    register: GraftScan => Unit = _ => (),
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit {
  private var filters: Array[sources.Filter] = Array.empty
  private var required: StructType = schema
  private var aggResult: Option[(StructType, Array[Any])] = None
  private var limit: Option[Int] = None

  override def pushFilters(fs: Array[sources.Filter]): Array[sources.Filter] = {
    // CDF rows are changes, not table rows — manifest stats don't
    // describe them, so no filter is recorded for pruning (all stay
    // residual either way; Spark re-applies row-level). The COW scan
    // (prune=false) likewise records nothing: it must read everything.
    if (!cdf && prune) filters = fs
    fs // ALL residual: pruning is advisory, Spark re-applies row-level
  }
  override def pushedFilters(): Array[sources.Filter] = filters
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT PUSHDOWN bounded at the MANIFEST: a `LIMIT n`-only scan
    * plans just the file prefix whose cumulative manifest row counts
    * reach n — a `SELECT * ... LIMIT 10` over a million-file table
    * opens one file, not the snapshot. Declared PARTIAL, so Spark keeps
    * its own Limit on top and correctness never depends on the file
    * bound; with pushed filters present the bound is skipped entirely
    * (a file's raw row count says nothing about how many rows survive
    * a residual filter).
    */
  override def pushLimit(l: Int): Boolean = {
    limit = Some(l)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  /** AGGREGATE PUSHDOWN answered from the MANIFEST: an unfiltered,
    * ungrouped COUNT(*) / MIN(col) / MAX(col) over the table never
    * opens a data file — the per-file row counts and min/max stats the
    * writers already paid for ARE the answer (the DSv2 twin of
    * [[TxnTable.rowCount]]/[[TxnTable.statsRange]]). Declined — falling
    * back to the ordinary scan — whenever the metadata cannot speak for
    * the data: pushed filters present, GROUP BY present, unmaterialized
    * MOR deletion vectors, a non-empty file without stats for the
    * column, or a non-integral/double column type.
    */
  // ONE manifest read serves both planner callbacks
  // (supportCompletePushDown and pushAggregation both plan the same
  // aggregation) — re-reading would double the planning-time metadata
  // IO and open a window where a concurrent commit makes the two
  // answers disagree.
  private lazy val manifestForAgg: Option[TxnTable.Manifest] =
    try Some(GraftTableProvider.manifestFor(
      new Configuration(), root, version))
    catch { case _: Exception => None }

  private def tryPlanAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Array[Any])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (filters.nonEmpty || agg.groupByExpressions().nonEmpty) return None
    val m = manifestForAgg.getOrElse(return None)
    if (m.files.exists(_.dvs.exists(_.nonEmpty))) return None
    val nonEmpty = m.files.filter(_.rows > 0)
    def colName(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    def statsOf(c: String): Option[Seq[TxnTable.ColStats]] = {
      val pc = m.colMap.getOrElse(Map.empty[String, String])
        .getOrElse(c, c)
      val ss = nonEmpty.flatMap(_.stats.get(pc))
      if (ss.length == nonEmpty.length) Some(ss) else None
    }
    // stats live in DOUBLE space: an integral value above 2^53 was
    // stored lossily, so converting back to long could be off-by-one —
    // decline the pushdown (the ordinary scan answers exactly)
    val MaxExact = 9007199254740992.0 // 2^53
    def convert(c: String, v: Double): Option[Any] =
      schema.fields.find(_.name == c).map(_.dataType).flatMap {
        case LongType if math.abs(v) <= MaxExact => Some(v.toLong)
        case IntegerType if math.abs(v) <= MaxExact => Some(v.toInt)
        case DoubleType => Some(v)
        case FloatType => Some(v.toFloat)
        case _ => None
      }
    // COUNT(col) = Σ(rows − nulls(col)) when every non-empty file
    // carries a null count for the column (the writers' stats pass)
    def nullsOf(c: String): Option[Seq[Long]] = {
      val pc = m.colMap.getOrElse(Map.empty[String, String])
        .getOrElse(c, c)
      val ns = nonEmpty.flatMap(_.nulls.flatMap(_.get(pc)))
      if (ns.length == nonEmpty.length) Some(ns) else None
    }
    val planned = agg.aggregateExpressions().toSeq.map {
      case _: CountStar =>
        Some((StructField("count_star", LongType, nullable = false),
          m.files.map(_.rows).sum: Any))
      case ct: org.apache.spark.sql.connector.expressions.aggregate.Count
          if !ct.isDistinct =>
        for {
          c <- colName(ct.column)
          ns <- nullsOf(c)
        } yield (StructField(s"count_$c", LongType, nullable = false),
          (nonEmpty.map(_.rows).sum - ns.sum): Any)
      case mn: Min =>
        for {
          c <- colName(mn.column)
          ss <- statsOf(c)
          v <- if (ss.isEmpty) Some(null: Any)
               else convert(c, ss.map(_.min).min)
        } yield (StructField(s"min_$c",
          schema.fields.find(_.name == c).get.dataType), v)
      case mx: Max =>
        for {
          c <- colName(mx.column)
          ss <- statsOf(c)
          v <- if (ss.isEmpty) Some(null: Any)
               else convert(c, ss.map(_.max).max)
        } yield (StructField(s"max_$c",
          schema.fields.find(_.name == c).get.dataType), v)
      case _ => None
    }
    if (planned.exists(_.isEmpty)) None
    else Some((StructType(planned.map(_.get._1)),
      planned.map(_.get._2).toArray))
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = !cdf && prune && tryPlanAgg(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    aggResult = if (cdf || !prune) None else tryPlanAgg(agg)
    aggResult.isDefined
  }

  override def build(): Scan = aggResult match {
    case Some((aggSchema, values)) => new GraftAggScan(aggSchema, values)
    case None =>
      val s = new GraftScan(root, required, filters, version,
        if (cdf || !prune) None else limit, startingVersion, cdf,
        maxFilesPerTrigger, maxBytesPerTrigger)
      register(s)
      s
  }
}

/** Scan for a completely-pushed-down aggregation: one partition, one
  * row, zero file IO — the values were folded from the manifest at
  * planning time.
  */
class GraftAggScan(aggSchema: StructType, values: Array[Any])
    extends Scan with Batch {
  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftTableScan aggregated=[${aggSchema.fieldNames.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          private val vals =
            partition.asInstanceOf[GraftAggPartition].values
          override def next(): Boolean =
            if (emitted) false else { emitted = true; true }
          override def get(): InternalRow = InternalRow.fromSeq(vals.toSeq)
          override def close(): Unit = ()
        }
    }
}

case class GraftAggPartition(values: Array[Any]) extends InputPartition

/** One input partition per surviving data file. `relPath` is the
  * MANIFEST path (the `_file` metadata value readers stamp); `nameMap`
  * is the logical→physical column map of the manifest the partition was
  * PLANNED against — carried with the partition so a commit landing
  * between planning and reader-factory creation can never resolve a
  * different mapping generation (the r11 ADVICE hazard).
  */
case class GraftInputPartition(filePath: String, relPath: String = "",
    nameMap: Map[String, String] = Map.empty) extends InputPartition

/** Input partition of a BUCKETED table scan: one data file plus the
  * bucket id the writer assigned its rows ([[TxnTable.BucketSpec]]).
  * `HasPartitionKey` is what lets Spark's storage-partitioned join
  * (SPARK-37375) group same-bucket files across BOTH join sides and
  * skip the shuffle entirely — the key row carries the bucket id in
  * the `bucket(n, col)` transform's result type (int).
  */
case class GraftBucketPartition(filePath: String, relPath: String,
    nameMap: Map[String, String], key: Seq[Int])
    extends InputPartition
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      key.map(b => b: Any).toArray)
}

object GraftScan {
  /** Metadata-column name for row provenance / COW group pruning. */
  val FileCol = "_file"
}

class GraftScan(
    root: String, required: StructType, filters: Array[sources.Filter],
    version: Option[Long] = None, limit: Option[Int] = None,
    startingVersion: Option[Long] = None, cdf: Boolean = false,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends Scan with Batch
    with SupportsRuntimeV2Filtering
    with SupportsReportStatistics
    with SupportsReportPartitioning
    with SupportsReportOrdering {
  override def readSchema(): StructType = required

  /** Bucket layout this scan can REPORT, resolved once per plan:
    * requires the sidecar spec AND every live file in the pinned
    * manifest to carry a bucket id (commits from non-bucketing writers
    * — COW rewrites, compaction — drop ids, and a partial layout must
    * not be reported: Spark would co-locate on a lie). The logical
    * name is the spec's physical column translated back through the
    * column map, and must still exist in the table (not dropped).
    */
  /** (logical key columns in layout order, n, sortedInsideBuckets). */
  private lazy val bucketLayout: Option[(Seq[String], Int, Boolean)] =
    if (cdf) None
    else TxnTable.bucketSpec(new Configuration(), root).flatMap { spec =>
      val m = pinnedManifest
      val cm = m.colMap.getOrElse(Map.empty[String, String])
      val schemaNames = StructType.fromDDL(m.schemaDdl).fieldNames
      val physCols = TxnTable.bucketColsOf(spec)
      val logicals = physCols.map(pc =>
        cm.find(_._2 == pc).map(_._1).getOrElse(pc))
      val live = logicals.zip(physCols).forall { case (l, pc) =>
        schemaNames.contains(l) && !cm.get(l).exists(_ != pc)
      }
      // nonEmpty: an EMPTY table must not report a zero-partition
      // KeyGroupedPartitioning (vacuous forall) — a freshly CREATE'd
      // bucketed table scans as a plain empty relation until data lands
      if (live && m.files.nonEmpty && m.files.forall(_.bucket.isDefined))
        Some((logicals, spec.n, spec.sorted.contains(true)))
      else None
    }

  /** Identity/days partition layout for pv file pruning, resolved once
    * per plan: per COMPONENT (logical column name, component spec,
    * index into the pv tuple) plus the tuple arity. Unlike
    * [[bucketLayout]], a PARTIAL layout still prunes — files without a
    * `pv` are kept conservatively per file, never trusted, so
    * mixed-writer manifests degrade instead of disabling the index;
    * and a component whose column was renamed/dropped simply stops
    * pruning while the others keep working.
    */
  private lazy val partitionLayout
      : Option[(Seq[(String, TxnTable.PartitionSpec, Int)], Int,
        TxnTable.PartitionSpec)] =
    if (cdf) None
    else TxnTable.partitionSpec(new Configuration(), root).map { spec =>
      val comps = TxnTable.partCompsOf(spec)
      val m = pinnedManifest
      val cm = m.colMap.getOrElse(Map.empty[String, String])
      val names = StructType.fromDDL(m.schemaDdl).fieldNames
      val live = comps.zipWithIndex.flatMap { case (c, i) =>
        val logical =
          cm.find(_._2 == c.col).map(_._1).getOrElse(c.col)
        if (names.contains(logical) &&
            !cm.get(logical).exists(_ != c.col))
          Some((logical, c, i))
        else None
      }
      (live, comps.length, spec)
    }.filter(_._1.nonEmpty)

  /** A probe literal in the manifest's canonical pv space (`CAST(value
    * AS STRING)`), for the types whose JVM rendering provably matches
    * Spark's cast — the [[bloomHash]] discipline. Accepts both the v1
    * filter EXTERNAL forms (String, java.sql.Date) and the runtime
    * predicate INTERNAL forms (UTF8String, epoch-day Integer). None =
    * this literal cannot prune.
    */
  private def pvCanonical(v: Any, colType: DataType): Option[String] =
    (v, colType) match {
      case (s: String, StringType) => Some(s)
      case (u: UTF8String, StringType) => Some(u.toString)
      case (i: java.lang.Integer, IntegerType) => Some(i.toString)
      case (l: java.lang.Long, LongType) => Some(l.toString)
      case (d: java.sql.Date, DateType) =>
        Some(d.toLocalDate.toString)
      case (i: java.lang.Integer, DateType) =>
        Some(java.time.LocalDate.ofEpochDay(i.longValue).toString)
      case _ => None
    }

  /** STORAGE-PARTITIONED JOIN surface (SupportsReportPartitioning):
    * a bucketed table's scan declares `KeyGroupedPartitioning(
    * bucket(n, col))`, so joining two tables bucketed on their join
    * key by the same n is planned WITHOUT a shuffle on either side
    * (`spark.sql.sources.v2.bucketing.enabled`) — at 100 TB the
    * fact-dim join moves zero bytes between executors, the reason
    * bucketed layouts exist. Scans that cannot prove the layout
    * (unbucketed tables, mixed-writer manifests, LIMIT-bounded plans
    * whose file prefix drops whole buckets) report unknown and plan
    * exactly as before.
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    bucketLayout match {
      case Some((logicals, n, _)) if limit.isEmpty =>
        // ONE single-column transform per key: Spark's SPJ requires
        // each partition expression to reference exactly one column
        // (KeyGroupedShuffleSpec's one-leaf contract), so composite
        // layouts report bucket(n, c1), bucket(n, c2), … — the
        // partition key row carries the per-column ids in the same
        // order ([[GraftBucketPartition.partitionKey]])
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(
            logicals.map(l =>
              org.apache.spark.sql.connector.expressions.Expressions
                .bucket(n, l)
              : org.apache.spark.sql.connector.expressions.Expression)
              .toArray,
            pinnedManifest.files.flatMap(_.bucket).distinct.size)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(0)
    }

  /** PER-PARTITION ORDERING (SupportsReportOrdering): claimable
    * exactly when the layout writers sorted inside buckets (the
    * sidecar's `sorted` flag — tables from before the flag never
    * claim it) AND each bucket resolves to at most one non-empty file
    * (a grouped multi-file bucket concatenates files in arbitrary
    * order). With both sides of a co-bucketed join reporting it, the
    * storage-partitioned sort-merge drops its per-partition SortExecs
    * — the join becomes a pure merge over pre-sorted files, the full
    * bucketed-sorted-table dividend.
    */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    bucketLayout match {
      case Some((logicals, _, sorted)) if limit.isEmpty && sorted &&
          pinnedManifest.files.filter(_.rows > 0)
            .groupBy(_.bucket).forall(_._2.size == 1) =>
        logicals.map(l =>
          org.apache.spark.sql.connector.expressions.Expressions.sort(
            org.apache.spark.sql.connector.expressions.Expressions
              .column(l),
            org.apache.spark.sql.connector.expressions.SortDirection
              .ASCENDING)).toArray
      case _ => Array.empty
    }

  /** PLANNER STATISTICS from the manifest, POST stats-pruning: exact
    * byte/row totals of the files this scan will actually open (the
    * writers already paid for them — zero extra IO). Without this the
    * scan reports unknown size, Spark assumes it is enormous, and a
    * join against a small graft table never auto-broadcasts — the
    * manifest knows better, at any table size. CDF scans report
    * nothing (change rows are planned per version, the manifest totals
    * don't describe them).
    */
  override def estimateStatistics(): Statistics = {
    if (cdf)
      return new Statistics {
        override def sizeInBytes(): java.util.OptionalLong =
          java.util.OptionalLong.empty()
        override def numRows(): java.util.OptionalLong =
          java.util.OptionalLong.empty()
      }
    val m = pinnedManifest
    val bs = bounds
    val cm = m.colMap.getOrElse(Map.empty[String, String])
    val files = m.files.filter { f =>
      bs.forall { case (c, (lo, hi)) =>
        f.stats.get(cm.getOrElse(c, c))
          .forall(s => s.max >= lo && s.min <= hi)
      }
    }
    val bytes = files.map(_.bytes).sum
    val rows = files.map(_.rows).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      // residual filters still apply above the scan, so the file
      // totals are an UPPER bound — exactly what Statistics reports
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }
  override def toBatch: Batch = {
    require(!cdf,
      "readChangeFeed is a streaming option — for a batch change read " +
        "use TxnTable.cdf(root, fromV, toV, keys)")
    this
  }
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    // Time travel is a batch-read concept; a micro-batch stream always
    // follows the live table — silently streaming latest while the user
    // asked for a pinned version would be a wrong-answer bug.
    require(version.isEmpty,
      "versionAsOf/timestampAsOf are batch-read options and do not " +
        "apply to readStream — use startingVersion to begin the " +
        "stream at a historical version")
    // startingVersion N is INCLUSIVE (the Delta-source contract:
    // "changes from version N on"), and the offset meaning is
    // "delivered THROUGH", so the initial offset is N-1.
    val start = startingVersion.map(_ - 1L).getOrElse(-1L)
    if (cdf) new GraftCdfMicroBatchStream(root, required, start,
      maxFilesPerTrigger, maxBytesPerTrigger)
    else new GraftMicroBatchStream(root, required, start,
      maxFilesPerTrigger, maxBytesPerTrigger)
  }
  override def description(): String =
    s"GraftTableScan pushed=[${filters.mkString(", ")}]" +
      limit.map(l => s" limit=$l").getOrElse("")

  /** Conjunct bounds (col → [lo, hi]) from the pushed v2 filters, in
    * the same double-comparable space as the manifest stats.
    */
  private def bounds: Map[String, (Double, Double)] = {
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue())
      case ts: java.sql.Timestamp => Some(ts.getTime * 1000.0)
      case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toDouble)
      case _ => None
    }
    val acc = scala.collection.mutable.Map
      .empty[String, (Double, Double)]
      .withDefaultValue((Double.NegativeInfinity, Double.PositiveInfinity))
    def tighten(c: String, lo: Double, hi: Double): Unit = {
      val (l0, h0) = acc(c)
      acc(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    filters.foreach {
      case sources.EqualTo(c, v) => num(v).foreach(d => tighten(c, d, d))
      case sources.GreaterThan(c, v) =>
        num(v).foreach(d => tighten(c, d, Double.PositiveInfinity))
      case sources.GreaterThanOrEqual(c, v) =>
        num(v).foreach(d => tighten(c, d, Double.PositiveInfinity))
      case sources.LessThan(c, v) =>
        num(v).foreach(d => tighten(c, Double.NegativeInfinity, d))
      case sources.LessThanOrEqual(c, v) =>
        num(v).foreach(d => tighten(c, Double.NegativeInfinity, d))
      case sources.And(l, r) =>
        // conjuncts usually arrive split; nested ANDs fold the same way
        new GraftScan(root, required, Array(l, r)).bounds.foreach {
          case (c, (lo, hi)) => tighten(c, lo, hi)
        }
      case _ => () // OR/IN/IsNull/...: no bounds, stays conservative
    }
    acc.toMap
  }

  /** The manifest this scan plans AND reads against, resolved ONCE:
    * `planInputPartitions` (file set) and the readers' column map must
    * come from the SAME version, or a rename-materializing commit
    * landing between the two reads would feed old-generation files an
    * empty map and serve silent NULLs (the r11 ADVICE hazard).
    */
  private lazy val pinnedManifest: TxnTable.Manifest =
    GraftTableProvider.manifestFor(new Configuration(), root, version)

  /** RUNTIME file-group filtering (SupportsRuntimeV2Filtering) on the
    * `_file` metadata column: Spark's row-level runtime group filter
    * evaluates the UPDATE/MERGE condition in a subquery, collects the
    * distinct `_file` values of MATCHED rows, and hands them back here
    * as an IN predicate before `planInputPartitions` — so the COW scan
    * (and therefore the replacement group) shrinks to the files that
    * actually contain matched rows. Unrecognized predicates are
    * ignored (filtering is an optimization; the kept-file carry in
    * [[TxnTable.commitCow]] makes any subset sound).
    */
  @volatile private var runtimeFiles: Option[Set[String]] = None

  /** DYNAMIC FILE PRUNING state: runtime IN-values per DATA column
    * (from Spark's dynamic partition pruning over ordinary joins — the
    * broadcast side's distinct join keys, handed to `filter()` before
    * partition planning). Each column's value list prunes the manifest
    * through every index the writers paid for: bucket ids (exact),
    * per-file min/max stats (range), per-file blooms (probabilistic).
    * At 100 TB this is the difference between a fact scan sized by the
    * DIM FILTER and one sized by the table: a join against "last
    * week's customers" reads last week's files.
    */
  @volatile private var runtimeIn: Map[String, Seq[Any]] = Map.empty

  /** Table schema (logical) of the pinned manifest — for runtime-probe
    * typing; `required` is the pruned subset. */
  private lazy val tableSchema: StructType =
    StructType.fromDDL(pinnedManifest.schemaDdl)

  /** Data columns a runtime IN-filter can actually prune files with:
    * the bucket column (exact id match), bloom'd columns (point
    * probes), and columns carrying min/max stats in at least one file
    * (range overlap). Only columns in this scan's OUTPUT are
    * advertised — Spark resolves filterAttributes against the relation
    * output, and a join key is in the output by construction.
    */
  private lazy val runtimeEligible: Set[String] = {
    val m = pinnedManifest
    val cm = m.colMap.getOrElse(Map.empty[String, String])
    def logicalOf(pc: String): String =
      cm.find(_._2 == pc).map(_._1).getOrElse(pc)
    val statsCols = m.files.flatMap(_.stats.keys).map(logicalOf).toSet
    val bloomCols = m.bloomCols.getOrElse(Nil).toSet
    val bucketCol = bucketLayout.toSeq.flatMap(_._1).toSet
    val partCol = partitionLayout.toSeq.flatMap(_._1)
      .filter(_._2.transform == "identity").map(_._1).toSet
    (statsCols ++ bloomCols ++ bucketCol ++ partCol)
      .filter(required.fieldNames.contains)
  }

  // `_file` advertised ONLY when actually in this scan's output (the
  // COW scan always has it via requiredMetadataAttributes): Spark's
  // dynamic partition pruning resolves filterAttributes against the
  // relation output on ORDINARY joins too, and an unselected metadata
  // column there is an analysis error. Eligible data columns are
  // output columns by definition.
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (cdf) Array.empty
    else {
      // A scan that outputs `_file` is the row-level COW scan: Spark's
      // runtime GROUP filter is built over ALL advertised attributes,
      // so `_file` must be advertised ALONE there — mixing in data
      // columns turns the group filter into a multi-column predicate
      // the IN-parser correctly refuses, and the COW write degrades to
      // whole-table replacement (caught by Round12Spec). Ordinary
      // scans advertise the index-bearing data columns instead.
      val cols =
        if (required.fieldNames.contains(GraftScan.FileCol))
          Seq(GraftScan.FileCol)
        else runtimeEligible.toSeq.sorted
      cols.map(org.apache.spark.sql.connector.expressions.Expressions.column)
        .toArray
    }

  override def filter(predicates: Array[
      org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    // (column, complete literal list) of every IN predicate — a list
    // with any non-literal operand is not a complete value set and
    // must be ignored (pruning may only ever shrink soundly)
    val ins: Seq[(String, Seq[Any])] = predicates.toSeq.flatMap { p =>
      if (p.name() != "IN" || p.children().isEmpty) None
      else p.children()(0) match {
        case r: NamedReference if r.fieldNames().length == 1 =>
          val vals: Seq[Any] = p.children().drop(1).toSeq.collect {
            case l: Literal[_] if l.value != null => l.value
          }
          if (vals.length == p.children().length - 1)
            Some(r.fieldNames()(0) -> vals)
          else None
        case _ => None
      }
    }
    val sets = ins.collect {
      case (GraftScan.FileCol, vals) => vals.map(_.toString).toSet
    }
    if (sets.nonEmpty) runtimeFiles = Some(sets.reduce(_ intersect _))
    val dataIns = ins.filter { case (c, _) =>
      c != GraftScan.FileCol && runtimeEligible.contains(c)
    }
    if (dataIns.nonEmpty)
      // repeated columns conjoin: keep the shorter list (both sound)
      runtimeIn = dataIns.groupBy(_._1).map { case (c, vs) =>
        c -> vs.map(_._2).minBy(_.length)
      }
  }

  /** Catalyst runtime value → the double-comparable space manifest
    * stats live in (numerics as-is, dates as epoch-days ints,
    * timestamps as epoch-µs longs — matching TxnTable.statsExpr).
    */
  private def statsSpace(v: Any): Option[Double] = v match {
    case i: java.lang.Integer => Some(i.doubleValue)
    case l: java.lang.Long => Some(l.doubleValue)
    case d: java.lang.Double => Some(d.doubleValue)
    case f: java.lang.Float => Some(f.doubleValue)
    case s: java.lang.Short => Some(s.doubleValue)
    case b: java.lang.Byte => Some(b.doubleValue)
    case d: java.math.BigDecimal => Some(d.doubleValue)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None
  }

  /** The xxhash64 the write side stored in the bloom for this value:
    * `CAST(col AS STRING)` then hash — replicated here for the types
    * whose JVM string form provably matches Spark's cast (integrals,
    * strings, dates). Other types return None and the bloom simply
    * doesn't prune.
    */
  private def bloomHash(v: Any, colType: DataType): Option[Long] = {
    val str: Option[UTF8String] = (v, colType) match {
      case (u: UTF8String, StringType) => Some(u)
      case (i: java.lang.Integer, IntegerType) =>
        Some(UTF8String.fromString(i.toString))
      case (l: java.lang.Long, LongType) =>
        Some(UTF8String.fromString(l.toString))
      case (i: java.lang.Integer, DateType) =>
        Some(UTF8String.fromString(
          java.time.LocalDate.ofEpochDay(i.longValue).toString))
      case _ => None
    }
    str.map(u => org.apache.spark.sql.catalyst.expressions
      .XxHash64Function.hash(u, StringType, 42L))
  }

  /** Apply the runtime IN-values to the file list through bucket ids,
    * min/max stats, and blooms. Every index is consulted only when the
    * ENTIRE value list converted for it — a partial conversion could
    * prune the file holding an unconverted value. Files lacking an
    * index entry for the column are conservatively kept.
    */
  private def dynamicPrune(files: Seq[TxnTable.FileEntry],
      cm: Map[String, String]): Seq[TxnTable.FileEntry] =
    runtimeIn.foldLeft(files) { case (fs, (c, vals)) =>
      val pc = cm.getOrElse(c, c)
      val colType = tableSchema.fields.find(_.name == c).map(_.dataType)
      // (digit position, allowed digit values) for this column's
      // runtime IN-set — composite layouts prune per column's digit
      val bucketIds: Option[(Int, Int, Int, Set[Int])] =
        bucketLayout.collect {
          case (logicals, n, _) if logicals.contains(c) =>
            val ids = vals.map(v => TxnTable.bucketOf(v, n))
            if (ids.forall(_.isDefined))
              Some((logicals.indexOf(c), logicals.size, n,
                ids.flatten.toSet))
            else None
        }.flatten
      val nums: Option[Seq[Double]] = {
        val ds = vals.map(statsSpace)
        if (ds.forall(_.isDefined)) Some(ds.flatten) else None
      }
      val hashes: Option[Seq[Long]] = colType.flatMap { t =>
        val hs = vals.map(bloomHash(_, t))
        if (hs.forall(_.isDefined)) Some(hs.flatten) else None
      }
      // partition values (exact index, like bucket ids): only when the
      // ENTIRE value list canonicalizes — a partial set could prune
      // the file holding an unconverted value. Multi-column layouts
      // match the probe column's COMPONENT of the pv tuple.
      val pvAllow
          : Option[(Int, Int, Set[String], TxnTable.PartitionSpec)] =
        partitionLayout.flatMap { case (comps, k, spec0) =>
          comps.collectFirst {
            case (l, spec, i) if l == c && spec.transform == "identity" =>
              colType.flatMap { t =>
                val cs = vals.map(pvCanonical(_, t))
                if (cs.forall(_.isDefined))
                  Some((i, k, cs.flatten.toSet, spec0))
                else None
              }
          }.flatten
        }
      fs.filter { f =>
        val bOk = bucketIds.forall { case (pos, k, n, allow) =>
          f.bucket.forall(idx =>
            allow.contains(TxnTable.decomposeIdx(idx, n, k)(pos)))
        }
        val sOk = nums.forall(ns => f.stats.get(pc).forall(s =>
          ns.exists(v => v >= s.min && v <= s.max)))
        val blOk = hashes.forall(hs =>
          f.blooms.flatMap(_.get(pc)).forall { b64 =>
            val words = TxnTable.Bloom.fromB64(b64)
            hs.exists(h => TxnTable.Bloom.mightContain(words, h))
          })
        val pOk = pvAllow.forall { case (i, k, a, spec0) =>
          !TxnTable.pvCurrent(f, spec0) ||
            f.pv.forall(pv => TxnTable.pvComponents(pv, k)
              .forall(parts => a.contains(parts(i))))
        }
        bOk && sOk && blOk && pOk
      }
    }

  /** The file entries the last `planInputPartitions` actually planned —
    * the REPLACEMENT GROUP the row-level COW write replaces (everything
    * else in the base manifest carries forward verbatim). `None` until
    * planning ran (the write then falls back to whole-table replace,
    * which is always sound).
    */
  @volatile private var plannedVar: Option[Seq[TxnTable.FileEntry]] = None
  def plannedFiles: Option[Seq[TxnTable.FileEntry]] = plannedVar

  override def planInputPartitions(): Array[InputPartition] = {
    val m = pinnedManifest
    // this file-at-a-time reader cannot apply MOR deletion-vector
    // anti-joins; refuse loudly rather than resurrect deleted rows
    require(m.files.forall(_.dvs.isEmpty),
      s"table at $root has unmaterialized MOR deletion vectors — " +
        "read via TxnTable.snapshot or compact() first")
    val bs = bounds
    val cm = m.colMap.getOrElse(Map.empty[String, String])
    // NULL-count pruning: IS NULL skips files with zero nulls in the
    // column; IS NOT NULL (which Spark implies under almost every
    // predicate) skips ALL-null files — min/max cannot index either
    // (an all-null file has no min/max entry at all). Files without a
    // null count (pre-field writers, un-opted columns) are kept.
    val nullProbes: Seq[(String, Boolean)] = filters.toSeq.collect {
      case sources.IsNull(c) => (c, true)
      case sources.IsNotNull(c) => (c, false)
    }
    val statsPruned = m.files.filter { f =>
      bs.forall { case (c, (lo, hi)) =>
        f.stats.get(cm.getOrElse(c, c))
          .forall(s => s.max >= lo && s.min <= hi)
      } && nullProbes.forall { case (c, wantNull) =>
        f.nulls.flatMap(_.get(cm.getOrElse(c, c))).forall(n =>
          if (wantNull) n > 0 else n < f.rows)
      }
    }
    val runtimePruned = runtimeFiles match {
      case Some(allow) => statsPruned.filter(f => allow.contains(f.path))
      case None => statsPruned
    }
    // BUCKET PRUNING: an equality probe on ANY bucket key column
    // constrains that column's digit of the file's (composite) id —
    // the layout's point-lookup dividend (min/max stats cannot prune a
    // hash-scattered key; the bucket id can). Conjunct-safe: every
    // EqualTo tightens its own column's digit.
    val bucketPruned = bucketLayout match {
      case Some((logicals, n, _)) =>
        val k = logicals.size
        val digitProbes: Seq[(Int, Int)] = filters.toSeq.flatMap {
          case sources.EqualTo(c, v) if logicals.contains(c) =>
            TxnTable.bucketOf(v, n)
              .map(b => logicals.indexOf(c) -> b)
          case _ => None
        }
        if (digitProbes.isEmpty) runtimePruned
        else runtimePruned.filter(f => f.bucket.exists { idx =>
          val digits = TxnTable.decomposeIdx(idx, n, k)
          digitProbes.forall { case (pos, b) => digits(pos) == b }
        })
      case None => runtimePruned
    }
    // PARTITION PRUNING: equality/IN probes on the partition column
    // keep exactly the named partitions' files (files without a pv —
    // layout-unaware writers — are kept conservatively). Conjuncts
    // that fail to canonicalize simply don't prune; row-level filters
    // still apply either way.
    val partPruned = partitionLayout match {
      case Some((comps, k, spec0)) =>
        // per-component allow-sets: an equality/IN probe on ANY
        // identity component constrains ITS slot of the pv tuple —
        // conjuncts on different components compose (date AND tenant)
        val probes: Seq[(Int, Set[String])] = comps.flatMap {
          case (logical, spec, i) if spec.transform == "identity" =>
            val colType =
              tableSchema.fields.find(_.name == logical).map(_.dataType)
            colType.toSeq.flatMap { t =>
              filters.toSeq.flatMap {
                case sources.EqualTo(c, v) if c == logical =>
                  pvCanonical(v, t).map(s => (i, Set(s)))
                case sources.In(c, vs) if c == logical && vs.nonEmpty =>
                  val cs = vs.toSeq.map(pvCanonical(_, t))
                  if (cs.forall(_.isDefined))
                    Some((i, cs.flatten.toSet))
                  else None
                case _ => None
              }
            }
          case _ => Seq.empty
        }
        if (probes.isEmpty) bucketPruned
        else bucketPruned.filter(f =>
          !TxnTable.pvCurrent(f, spec0) || // prior-era stamp: keep
            f.pv.forall(pv => TxnTable.pvComponents(pv, k).forall(parts =>
              probes.forall { case (i, a) => a.contains(parts(i)) })))
      case _ => bucketPruned
    }
    // runtime IN-values from dynamic partition pruning (join-key sets)
    val pruned = dynamicPrune(partPruned, cm)
    // LIMIT-only bound: the prefix of files whose cumulative manifest
    // row counts reach the limit is sufficient — sound ONLY because no
    // row-level filter applies (enforced: with filters the bound is
    // skipped and partial pushdown keeps Spark's Limit on top anyway).
    val keep = limit match {
      case Some(l) if filters.isEmpty =>
        var acc = 0L
        pruned.takeWhile { f =>
          val need = acc < l
          acc += f.rows
          need
        }
      case _ => pruned
    }
    plannedVar = Some(keep)
    keep.map { f =>
      val p = if (f.path.startsWith("/") || f.path.contains("://")) f.path
        else s"$root/${f.path}"
      // a reported KeyGroupedPartitioning requires EVERY partition to
      // carry its key — emit the bucketed form exactly when the layout
      // was reported (limit-bounded plans report unknown and stay plain)
      bucketLayout match {
        case Some((logicals, n, _)) if limit.isEmpty =>
          GraftBucketPartition(p, f.path, cm,
            TxnTable.decomposeIdx(f.bucket.get, n, logicals.size))
            : InputPartition
        case _ => GraftInputPartition(p, f.path, cm): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required)
}

/** Offset for the streaming reads. `(version, Long.MaxValue, false)`
  * — the CANONICAL COMPLETE form — means "everything up to and
  * including manifest `version` has been delivered"; `-1` = nothing
  * consumed yet (the initial offset when no `startingVersion` is
  * given), so the stream begins with the full current snapshot — the
  * Delta-source default. `index < Long.MaxValue` marks a version
  * delivered PARTWAY: the first `index` planned file-units of
  * `version` are done — the admission-control split
  * ([[GraftMicroBatchStream]] `maxFilesPerTrigger` /
  * `maxBytesPerTrigger`), Delta's `DeltaSourceOffset(version, index)`
  * shape. `snapshot = true` tags a partial INITIAL-SNAPSHOT offset
  * (the unit space is the full manifest file list, not the
  * fresh-file diff). Pre-round-12 checkpoints (`{"version":v}`)
  * deserialize as the complete form — fully compatible.
  */
case class GraftStreamOffset(version: Long,
    index: Long = Long.MaxValue, snapshot: Boolean = false)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    s"""{"version":$version,"index":$index,"snapshot":$snapshot}"""

  /** Strictly-before ordering on the global unit sequence (versions
    * ascend; within a version, delivered-unit count ascends; complete
    * = MaxValue index).
    */
  def before(o: GraftStreamOffset): Boolean =
    version < o.version || (version == o.version && index < o.index)
}

object GraftStreamOffset {
  def parse(json: String): GraftStreamOffset = {
    val j = org.json4s.jackson.JsonMethods.parse(json)
    def long(f: String): Option[Long] = j \ f match {
      case org.json4s.JInt(n) => Some(n.toLong)
      case org.json4s.JLong(n) => Some(n)
      case _ => None
    }
    val v = long("version").getOrElse(
      throw new IllegalArgumentException(
        s"graft table stream: malformed offset json '$json'"))
    val snap = j \ "snapshot" match {
      case org.json4s.JBool(b) => b
      case _ => false
    }
    GraftStreamOffset(v, long("index").getOrElse(Long.MaxValue), snap)
  }
}

/** Shared admission-control arithmetic for the two table streams: one
  * planned file-unit sequence, consumed identically by
  * `latestOffset(start, limit)` (prefix by budget) and
  * `planInputPartitions(start, end)` (window between offsets) — the
  * determinism that makes a mid-backlog restart exactly-once.
  */
private[table] object GraftStreamAdmission {
  import org.apache.spark.sql.connector.read.streaming._

  /** (maxFiles, maxBytes, maxRows) from a ReadLimit tree; None = that
    * dimension unbounded. Unknown limit kinds (minRows triggers) are
    * advisory minimums, not caps — ignored.
    */
  def caps(limit: ReadLimit): (Option[Int], Option[Long], Option[Long]) =
    limit match {
      case f: ReadMaxFiles => (Some(f.maxFiles()), None, None)
      case b: ReadMaxBytes => (None, Some(b.maxBytes()), None)
      case r: ReadMaxRows => (None, None, Some(r.maxRows()))
      case c: CompositeReadLimit =>
        c.getReadLimits.map(caps).foldLeft(
          (Option.empty[Int], Option.empty[Long], Option.empty[Long])) {
          case ((f0, b0, r0), (f1, b1, r1)) =>
            def m[T](a: Option[T], b: Option[T])(min: (T, T) => T) =
              (a, b) match {
                case (Some(x), Some(y)) => Some(min(x, y))
                case _ => a.orElse(b)
              }
            (m(f0, f1)(math.min), m(b0, b1)(math.min), m(r0, r1)(math.min))
        }
      case _ => (None, None, None) // ReadAllAvailable / minRows
    }

  /** One plannable unit: a partition plus its admission weights and
    * the offset the stream stands at AFTER delivering it.
    */
  case class FileUnit(part: InputPartition, bytes: Long, rows: Long,
      after: GraftStreamOffset)

  /** Longest prefix of `units` within the caps — always at least one
    * unit when any is pending (a single file larger than maxBytes must
    * still make progress; the Delta/file-source contract).
    */
  def admit(units: Iterator[FileUnit], limit: ReadLimit): Seq[FileUnit] = {
    val (mf, mb, mr) = caps(limit)
    if (mf.isEmpty && mb.isEmpty && mr.isEmpty) return units.toSeq
    val out = Seq.newBuilder[FileUnit]
    var nF = 0L; var nB = 0L; var nR = 0L
    var stop = false
    while (!stop && units.hasNext) {
      val u = units.next()
      if (nF == 0L ||
          (mf.forall(nF + 1 <= _) && mb.forall(nB + u.bytes <= _) &&
            mr.forall(nR + u.rows <= _))) {
        out += u; nF += 1; nB += u.bytes; nR += u.rows
        // a full-file budget needs no lookahead; bytes/rows budgets
        // stop as soon as the NEXT unit would overflow (checked above)
        stop = mf.exists(nF >= _)
      } else stop = true
    }
    out.result()
  }
}

/** [[TxnTable]] as a STRUCTURED STREAMING SOURCE — the Delta-source
  * twin that completes the table's streaming loop (it was already an
  * exactly-once sink via [[TxnTable.appendBatch]]). Offsets are
  * manifest VERSIONS, so a micro-batch is the file-set difference
  * between two manifests: O(new files) planning and IO per poll
  * regardless of table size — the [[TxnTable.appendsSince]] contract
  * lifted into DSv2, with the stream's checkpoint carrying the
  * version high-water mark.
  *
  * Soundness: every commit inside a planned range must be an append
  * (`create`/`append`/`stream-append`). A rewrite (merge / delete /
  * compact / cluster / ...) changes file sets in ways a file-diff
  * cannot interpret — rows would double-deliver (rewritten files) or
  * silently drop (removed files) — so the stream FAILS LOUDLY there
  * and tells the consumer to restart from a fresh snapshot or consume
  * via [[TxnTable.cdc]].
  */
class GraftMicroBatchStream(
    root: String, schema: StructType, startVersion: Long,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit}
  import GraftStreamAdmission.FileUnit
  private def conf = new Configuration()

  override def initialOffset(): SOffset = GraftStreamOffset(startVersion)
  override def latestOffset(): SOffset =
    GraftStreamOffset(GraftTableProvider.listVersions(conf, root).max)
  override def reportLatestOffset(): SOffset = latestOffset()

  /** Trigger.AvailableNow: pin the end of the run at prepare time and
    * keep honoring the read limits batch by batch — Spark's default
    * AvailableNow wrapper would otherwise IGNORE admission control and
    * deliver the whole backlog as one batch (it logs exactly that
    * warning), defeating the point of the knob.
    */
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap =
      Some(GraftTableProvider.listVersions(conf, root).max)

  /** ADMISSION CONTROL (`maxFilesPerTrigger` / `maxBytesPerTrigger`
    * read options → the default ReadLimit; Trigger.AvailableNow
    * composes its own). After consumer downtime the backlog drains in
    * bounded micro-batches instead of one unbounded restart batch —
    * at 100 TB the difference between a restart and an outage. The
    * offset's `index` lets a batch stop PARTWAY through one version's
    * files, so even a single giant commit (or the initial snapshot)
    * splits.
    */
  override def getDefaultReadLimit: ReadLimit = {
    val ls = maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      maxBytesPerTrigger.map(ReadLimit.maxBytes).toSeq
    ls match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val latest = availableNowCap.getOrElse(
      GraftTableProvider.listVersions(conf, root).max)
    val pending = unitsAfter(s, latest)
    if (pending.isEmpty) {
      // nothing new: stand at the canonical complete form of `latest`
      // (never regress below the start offset)
      return if (s.before(GraftStreamOffset(latest))) GraftStreamOffset(latest)
      else s
    }
    val admitted = GraftStreamAdmission.admit(pending.iterator, limit)
    val last = admitted.last.after
    // consumed everything pending → everything through `latest` is
    // delivered, even when trailing versions contributed zero units
    if (admitted.size == pending.size) GraftStreamOffset(latest) else last
  }

  override def deserializeOffset(json: String): SOffset =
    GraftStreamOffset.parse(json)
  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()

  /** The ordered unit sequence strictly after offset `s`, up to and
    * including version `targetV` — the ONE enumeration both
    * `latestOffset` (prefix by budget) and `planInputPartitions`
    * (window to the end offset) consume, so the two can never
    * disagree about what unit N is.
    *
    * Initial snapshot (`s.version < 0` or a partial snapshot offset):
    * the unit space is the FULL manifest file list of the snapshot
    * version — correct regardless of operation history (Delta serves
    * the initial snapshot on any table). Incremental versions after
    * it: the fresh-file diff per version, append-family commits only —
    * a rewrite makes the file diff lie, so the stream FAILS LOUDLY
    * there (restart from a fresh snapshot or consume the change feed).
    */
  private def unitsAfter(s: GraftStreamOffset, targetV: Long): Seq[FileUnit] = {
    if (targetV < s.version)
      throw new IllegalStateException(
        s"graft table stream: end version $targetV precedes the start " +
          s"offset $s at $root — the checkpoint may belong to another " +
          "table or reference pruned log versions")
    val all = GraftTableProvider.listVersions(conf, root)
    val out = Seq.newBuilder[FileUnit]
    def emit(m: TxnTable.Manifest, snap: Boolean, from: Long): Unit = {
      val fs = m.files
      require(fs.forall(_.dvs.isEmpty),
        s"graft table stream at $root: planned file carries MOR " +
          "deletion vectors — compact() before streaming")
      val cm = m.colMap.getOrElse(Map.empty[String, String])
      val n = fs.length
      var i = from.toInt
      while (i < n) {
        val f = fs(i)
        val p = if (f.path.startsWith("/") || f.path.contains("://")) f.path
          else s"$root/${f.path}"
        val after =
          if (i + 1 < n) GraftStreamOffset(m.version, i + 1L, snap)
          else GraftStreamOffset(m.version)
        out += FileUnit(GraftInputPartition(p, f.path, cm), f.bytes,
          f.rows, after)
        i += 1
      }
    }
    // fresh-file diff manifest for an incremental version
    def freshOf(v: Long): TxnTable.Manifest = {
      val m = GraftTableProvider.manifestFor(conf, root, Some(v))
      if (!(m.op == "create" || m.op == "append" ||
          m.op == "stream-append"))
        throw new IllegalStateException(
          s"graft table stream: non-append commit v$v:${m.op} at " +
            s"$root — restart from a fresh snapshot or consume via " +
            "TxnTable.cdc")
      val old: Set[String] = all.filter(_ < v).lastOption match {
        case Some(pv) => GraftTableProvider
          .manifestFor(conf, root, Some(pv)).files.map(_.path).toSet
        case None => Set.empty
      }
      m.copy(files = m.files.filterNot(f => old.contains(f.path)))
    }
    val incFrom: Long =
      if (s.version < 0) {
        // snapshot not started: pin it to the target version
        val snapV = all.filter(_ <= targetV).lastOption.getOrElse(
          throw new IllegalStateException(
            s"graft table stream: no committed versions at or before " +
              s"$targetV at $root — the checkpoint may belong to " +
              "another table or reference pruned log versions"))
        emit(GraftTableProvider.manifestFor(conf, root, Some(snapV)),
          snap = true, from = 0L)
        snapV
      } else if (s.snapshot && s.index != Long.MaxValue) {
        // snapshot partway done: finish it, then go incremental
        emit(GraftTableProvider.manifestFor(conf, root, Some(s.version)),
          snap = true, from = s.index)
        s.version
      } else if (s.index != Long.MaxValue) {
        // incremental version partway done
        emit(freshOf(s.version), snap = false, from = s.index)
        s.version
      } else s.version
    all.filter(v => v > incFrom && v <= targetV)
      .foreach(v => emit(freshOf(v), snap = false, from = 0L))
    out.result()
  }

  override def planInputPartitions(
      start: SOffset, end: SOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val e = end.asInstanceOf[GraftStreamOffset]
    if (!s.before(e)) return Array.empty
    // e beyond s but nothing committed in range and no partial version
    // to finish: the offsets reference a pruned log or another table's
    // checkpoint — say so instead of planning a silent empty batch
    if (s.version >= 0 && s.index == Long.MaxValue &&
        e.version > s.version &&
        !GraftTableProvider.listVersions(conf, root)
          .exists(v => v > s.version && v <= e.version))
      throw new IllegalStateException(
        s"graft table stream (${s.version}, ${e.version}]: no " +
          s"committed versions in range at $root — the checkpoint may " +
          "belong to another table or reference pruned log versions")
    unitsAfter(s, e.version)
      .takeWhile(u => !e.before(u.after))
      .map(_.part).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(schema)
}

/** One CDF input partition: a parquet file plus the commit version
  * its rows belong to. `changeType = Some(t)` tags every row with a
  * constant (append-family commits: the new data files ARE the
  * inserts); `None` means the file is materialized change data and
  * carries its own `_change_type` column.
  */
case class GraftCdfInputPartition(
    filePath: String, version: Long, changeType: Option[String],
    nameMap: Map[String, String] = Map.empty)
    extends InputPartition

/** CHANGE-DATA-FEED streaming read of the [[TxnTable]]
  * (`.option("readChangeFeed", true)`) — the rewrite-crossing story
  * the plain [[GraftMicroBatchStream]] refuses by design: instead of
  * file diffs, each micro-batch emits `_change_type`-tagged CHANGE
  * ROWS per commit (`insert` / `delete` / `update_preimage` /
  * `update_postimage`, plus `_commit_version`), the Delta
  * `readChangeFeed` shape. Per committed version in the planned
  * range:
  *
  *   - append-family commits (`create`/`append`/`stream-append`/
  *     `clone`) plan their NEW data files tagged `insert` — O(new
  *     files), zero write-time cost, the common case;
  *   - row-changing rewrites plan the change rows the writer
  *     materialized at commit time ([[TxnTable.enableCdf]] →
  *     `Manifest.cdfDir`) — reading them is O(changed rows), never a
  *     re-diff;
  *   - `compact`/`cluster` reorganize bytes without logical change and
  *     emit NOTHING — maintenance no longer breaks consumers;
  *   - a rewrite committed WITHOUT change data (CDF not enabled then,
  *     or `delete-mor`/scoped-merge which bypass materialization, or a
  *     schema-changing evolution) fails LOUDLY — silently skipping it
  *     would desynchronize every downstream aggregate.
  *
  * Default start is a FULL HISTORY REPLAY from v0 (every change ever,
  * version-attributed — deterministic and self-describing); use
  * `startingVersion` to begin later. Replay reads old manifests'
  * files, so it races [[TxnTable.vacuum]] like any time travel.
  */
class GraftCdfMicroBatchStream(
    root: String, required: StructType, startVersion: Long,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit}
  import GraftStreamAdmission.FileUnit
  private def conf = new Configuration()

  override def initialOffset(): SOffset = GraftStreamOffset(startVersion)
  override def latestOffset(): SOffset =
    GraftStreamOffset(GraftTableProvider.listVersions(conf, root).max)
  override def reportLatestOffset(): SOffset = latestOffset()

  /** Same Trigger.AvailableNow contract as the plain stream: pin the
    * run's end at prepare time, honor limits batch by batch.
    */
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap =
      Some(GraftTableProvider.listVersions(conf, root).max)
  override def deserializeOffset(json: String): SOffset =
    GraftStreamOffset.parse(json)
  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()

  private val AppendOps = Set("create", "append", "stream-append", "clone")

  /** Same admission surface as the plain stream: a history replay (or
    * a backlog after downtime) drains in bounded micro-batches. Rows
    * of materialized change-data files are unknown until read, so the
    * rows dimension counts manifest-known units only; files/bytes
    * bound everything.
    */
  override def getDefaultReadLimit: ReadLimit = {
    val ls = maxFilesPerTrigger.map(ReadLimit.maxFiles).toSeq ++
      maxBytesPerTrigger.map(ReadLimit.maxBytes).toSeq
    ls match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }

  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val latest = availableNowCap.getOrElse(
      GraftTableProvider.listVersions(conf, root).max)
    val pending = unitsAfter(s, latest)
    if (pending.isEmpty) {
      return if (s.before(GraftStreamOffset(latest))) GraftStreamOffset(latest)
      else s
    }
    val admitted = GraftStreamAdmission.admit(pending.iterator, limit)
    if (admitted.size == pending.size) GraftStreamOffset(latest)
    else admitted.last.after
  }

  /** Ordered change-unit sequence strictly after `s` through
    * `targetV` — the CDF twin of the plain stream's enumeration (same
    * one-sequence determinism; `index` counts this VERSION's planned
    * units, whatever their kind).
    */
  private def unitsAfter(s: GraftStreamOffset, targetV: Long): Seq[FileUnit] = {
    if (targetV < s.version)
      throw new IllegalStateException(
        s"graft table CDF stream: end version $targetV precedes the " +
          s"start offset $s at $root — the checkpoint may belong to " +
          "another table or reference pruned log versions")
    val all = GraftTableProvider.listVersions(conf, root)
    def abs(p: String): String =
      if (p.startsWith("/") || p.contains("://")) p else s"$root/$p"
    /** This version's full unit list: (partition, bytes, rows). */
    def rawUnits(v: Long): Seq[(GraftCdfInputPartition, Long, Long)] = {
      val m = GraftTableProvider.manifestFor(conf, root, Some(v))
      if (AppendOps.contains(m.op)) {
        val old: Set[String] = all.filter(_ < v).lastOption match {
          case Some(pv) => GraftTableProvider
            .manifestFor(conf, root, Some(pv)).files.map(_.path).toSet
          case None => Set.empty
        }
        val fresh = m.files.filterNot(f => old.contains(f.path))
        require(fresh.forall(_.dvs.isEmpty),
          s"graft table CDF stream at $root v$v: new file carries MOR " +
            "deletion vectors — compact() before streaming")
        // data files carry PHYSICAL names: translate through the
        // colMap of the COMMIT'S OWN manifest (pinned per partition —
        // the latest map could postdate a materializing rewrite)
        val cm = m.colMap.getOrElse(Map.empty[String, String])
        fresh.map(f =>
          (GraftCdfInputPartition(abs(f.path), v, Some("insert"), cm),
            f.bytes, f.rows))
      } else m.cdfDir match {
        case Some(dir) =>
          val d = new Path(abs(dir))
          d.getFileSystem(conf).listStatus(d).toSeq
            .filter(st => st.getPath.getName.endsWith(".parquet"))
            .sortBy(_.getPath.getName) // listing order isn't a contract
            // materialized change rows are written from the LOGICAL
            // snapshot (diffRows output) — no physical translation;
            // row count unknown until read (0 for the rows dimension)
            .map(st => (GraftCdfInputPartition(st.getPath.toString, v,
              None), st.getLen, 0L))
        case None if GraftCdfMicroBatchStream.NoChangeOps(m.op) =>
          // compact/cluster reorganize bytes; rename/drop/add-column
          // are metadata-only schema evolution — zero change rows
          // either way, and failing here would permanently brick every
          // CDF consumer over a zero-row-change commit
          Nil
        case None =>
          throw new IllegalStateException(
            s"graft table CDF stream at $root: v$v '${m.op}' committed " +
              "no change data — TxnTable.enableCdf before rewrites " +
              "(or restart the consumer from a fresh snapshot / " +
              "consume via TxnTable.cdc)")
      }
    }
    val out = Seq.newBuilder[FileUnit]
    def emit(v: Long, from: Long): Unit = {
      val us = rawUnits(v)
      val n = us.length
      var i = from.toInt
      while (i < n) {
        val (p, bytes, rows) = us(i)
        val after =
          if (i + 1 < n) GraftStreamOffset(v, i + 1L)
          else GraftStreamOffset(v)
        out += FileUnit(p, bytes, rows, after)
        i += 1
      }
    }
    val incFrom =
      if (s.version >= 0 && s.index != Long.MaxValue) {
        emit(s.version, s.index); s.version
      } else s.version
    all.filter(v => v > incFrom && v <= targetV)
      .foreach(v => emit(v, 0L))
    out.result()
  }

  override def planInputPartitions(
      start: SOffset, end: SOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset]
    val e = end.asInstanceOf[GraftStreamOffset]
    if (!s.before(e)) return Array.empty
    if (s.version >= 0 && s.index == Long.MaxValue &&
        e.version > s.version &&
        !GraftTableProvider.listVersions(conf, root)
          .exists(v => v > s.version && v <= e.version))
      throw new IllegalStateException(
        s"graft table CDF stream (${s.version}, ${e.version}]: no " +
          s"committed versions in range at $root — the checkpoint may " +
          "belong to another table or reference pruned log versions")
    unitsAfter(s, e.version)
      .takeWhile(u => !e.before(u.after))
      .map(_.part).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCdfReaderFactory(required)
}

object GraftCdfMicroBatchStream {
  /** Commits that change NO logical rows: physical reorganizations and
    * metadata-only schema evolution. The CDF planner emits nothing for
    * them instead of failing (the r11 ADVICE fix — a schema evolution
    * must not be fatal to change-feed consumers).
    */
  val NoChangeOps: Set[String] =
    Set("compact", "cluster", "rename-column", "drop-column", "add-column")
}

class GraftCdfReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftCdfInputPartition]
    new GraftCdfPartitionReader(p.filePath, required, p.version,
      p.changeType, p.nameMap)
  }
}

/** Wraps the plain file reader: data columns come from the file
  * (change-data files additionally carry `_change_type` themselves),
  * `_commit_version` and constant change types are stamped per
  * partition. Handles any column-pruned subset of the CDF schema.
  */
class GraftCdfPartitionReader(filePath: String, required: StructType,
    version: Long, constType: Option[String],
    nameMap: Map[String, String])
    extends PartitionReader[InternalRow] {
  private val fromFile = required.fields.filter(f =>
    f.name != "_commit_version" &&
      (f.name != "_change_type" || constType.isEmpty))
  private val inner =
    new GraftPartitionReader(filePath, StructType(fromFile), nameMap)

  override def next(): Boolean = inner.next()
  override def get(): InternalRow = {
    val r = inner.get()
    var j = 0
    val out = required.fields.map { f =>
      f.name match {
        case "_commit_version" => version: Any
        case "_change_type" if constType.isDefined =>
          UTF8String.fromString(constType.get)
        case _ =>
          val v = r.get(j, f.dataType); j += 1; v
      }
    }
    InternalRow.fromSeq(out.toIndexedSeq)
  }
  override def close(): Unit = inner.close()
}

class GraftReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: GraftInputPartition =>
        new GraftPartitionReader(p.filePath, required, p.nameMap, p.relPath)
      case p: GraftBucketPartition =>
        new GraftPartitionReader(p.filePath, required, p.nameMap, p.relPath)
      case other => throw new IllegalArgumentException(
        s"graft reader factory: unexpected partition type $other")
    }
}

/** Parquet example-API row reader: required columns only, missing
  * columns (pre-evolution files) read as NULL. `nameMap` translates a
  * LOGICAL column to the PHYSICAL name data files carry (column
  * mapping after RENAME/DROP COLUMN — [[TxnTable.renameColumn]]);
  * identity when absent. A requested `_file` column is stamped with
  * `relPath` (the manifest path), never read from the file. Scalar
  * columns plus ARRAYs of scalars (both the standard 3-level parquet
  * list and the 2-level legacy layout) are supported — embedding
  * columns (`ARRAY<FLOAT>`) are this engine's flagship payload and
  * must survive the row-level COW read path.
  */
class GraftPartitionReader(filePath: String, required: StructType,
    nameMap: Map[String, String] = Map.empty, relPath: String = "")
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(filePath))
      .withConf(new Configuration()).build()
  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  private def primValue(g: Group, idx: Int, rep: Int,
      t: org.apache.parquet.schema.PrimitiveType, col: String,
      sparkType: DataType = NullType): Any =
    (t.getPrimitiveTypeName, sparkType) match {
      // DECIMAL columns: parquet stores the UNSCALED value (int32/
      // int64 for precision ≤ 18, binary beyond); Spark's internal
      // row form is Decimal — handing back the raw long would CCE in
      // the first generated projection
      case (INT64, d: DecimalType) =>
        org.apache.spark.sql.types.Decimal(
          g.getLong(idx, rep), d.precision, d.scale)
      case (INT32, d: DecimalType) =>
        org.apache.spark.sql.types.Decimal(
          g.getInteger(idx, rep).toLong, d.precision, d.scale)
      case (BINARY | FIXED_LEN_BYTE_ARRAY, d: DecimalType) =>
        org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(
            new java.math.BigInteger(g.getBinary(idx, rep).getBytes),
            d.scale),
          d.precision, d.scale)
      case (INT64, _) => g.getLong(idx, rep)
      case (INT32, _) => g.getInteger(idx, rep)
      case (DOUBLE, _) => g.getDouble(idx, rep)
      case (FLOAT, _) => g.getFloat(idx, rep)
      case (BOOLEAN, _) => g.getBoolean(idx, rep)
      case (BINARY | FIXED_LEN_BYTE_ARRAY, _) =>
        UTF8String.fromBytes(g.getBinary(idx, rep).getBytes)
      case (other, _) => throw new UnsupportedOperationException(
        s"graft table DSv2 reader: unsupported parquet type $other " +
          s"for column $col")
    }

  /** Array column: standard layout is `optional group c (LIST)
    * { repeated group list { optional T element } }`; the legacy
    * 2-level layout keeps a repeated primitive directly inside the
    * outer group. Either way the value is one GenericArrayData.
    */
  private def arrayValue(outer: Group, col: String,
      sparkType: DataType = NullType): Any = {
    val ot = outer.getType
    require(ot.getFieldCount == 1,
      s"graft table DSv2 reader: unrecognized list layout for $col")
    val inner = ot.getType(0)
    val n = outer.getFieldRepetitionCount(0)
    // element type threaded from the required schema so array<decimal>
    // decodes like scalar decimals (raw unscaled longs would CCE in
    // the first generated projection — the scalar fix, mirrored)
    val elemType = sparkType match {
      case ArrayType(et, _) => et
      case _ => NullType
    }
    val vals: Array[Any] =
      if (inner.isPrimitive) // 2-level legacy: repeated primitive
        Array.tabulate(n)(i =>
          primValue(outer, 0, i, inner.asPrimitiveType(), col, elemType))
      else // 3-level standard: repeated group { optional element }
        Array.tabulate(n) { i =>
          val e = outer.getGroup(0, i)
          if (e.getFieldRepetitionCount(0) == 0) null
          else primValue(e, 0, 0,
            e.getType.getType(0).asPrimitiveType(), col, elemType)
        }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(vals)
  }

  override def get(): InternalRow = {
    val g = current
    val fileType = g.getType
    val vals = required.fields.map { f =>
      val n = nameMap.getOrElse(f.name, f.name)
      if (f.name == GraftScan.FileCol) UTF8String.fromString(relPath)
      else if (fileType.containsField(n) &&
          g.getFieldRepetitionCount(n) > 0) {
        val t = fileType.getType(n)
        if (t.isPrimitive)
          primValue(g, fileType.getFieldIndex(n), 0,
            t.asPrimitiveType(), f.name, f.dataType)
        else arrayValue(g.getGroup(n, 0), f.name, f.dataType)
      } else null
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}
