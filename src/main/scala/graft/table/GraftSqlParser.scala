package graft.table

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** SQL MAINTENANCE surface for graft tables — the statements the
  * `graft_history` TVF pattern can't carry (they MUTATE the table, so
  * they must execute as commands at execution time, never during
  * analysis where EXPLAIN / re-analysis would re-run them):
  *
  * {{{
  *   OPTIMIZE '<path>'                              -- compact (whole table)
  *   OPTIMIZE cat.t SMALLER THAN 8 MB               -- bin-pack small files only
  *   OPTIMIZE cat.t WHERE day = '2026-01-01'        -- partition-scoped compaction
  *   OPTIMIZE cat.t WHERE day IN ('a', 'b')
  *   OPTIMIZE cat.t CLUSTER BY (c1, c2) [INTO n FILES]
  *   OPTIMIZE cat.t ZORDER BY (c1, c2) [INTO n FILES]
  *   SHOW PARTITIONS cat.t                          -- manifest-only listing
  *   VACUUM '<path>' [RETAIN n VERSIONS]
  *   RESTORE [TABLE] cat.t TO VERSION AS OF n
  * }}}
  *
  * The target is either a quoted filesystem path (trusted like
  * `DataFrameReader.load`) or a dotted identifier resolved through a
  * registered [[GraftCatalog]]'s warehouse with the same traversal
  * guard the catalog applies. Each statement returns a result row
  * (op, version, files_removed, files_added), so scripts can assert
  * on the outcome. Injected as a PARSER DELEGATE via
  * [[graft.GraftExtensions]] — anything that isn't one of these
  * statements parses through Spark's own parser untouched (the Delta
  * extension-parser pattern, public knowledge).
  *
  * Semantics ride the existing commit protocol: `OPTIMIZE` is
  * [[TxnTable.compact]]/[[TxnTable.cluster]] (a committed rewrite —
  * old versions still time-travel until vacuumed) with the table's
  * opted-in STATS COLUMNS PRESERVED automatically (a SQL OPTIMIZE
  * that silently dropped pruning stats would be a scale regression);
  * `VACUUM` is [[TxnTable.vacuum]] with its retention floor and
  * in-flight-writer grace window intact.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.maintenancePlan(sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  // Spark 4.1's `sql(text, args)` front door. The interface DEFAULT
  // drops the ParameterContext on the floor (it just calls
  // parsePlan), so a delegating parser that fails to forward this
  // breaks every parameterized query in the session with
  // UNBOUND_SQL_PARAMETER — the maintenance statements themselves
  // take no parameters, so they keep matching on the raw text first.
  override def parsePlanWithParameters(
      sqlText: String,
      parameters: org.apache.spark.sql.catalyst.parser.ParameterContext)
      : LogicalPlan =
    GraftSqlParser.maintenancePlan(sqlText)
      .getOrElse(delegate.parsePlanWithParameters(sqlText, parameters))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(
      sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {
  // target: '<path>' | ident(.ident)* with optional backticks
  private val Target = """('[^']+'|(?:`[^`]+`|[\w$]+)(?:\.(?:`[^`]+`|[\w$]+))*)"""
  private val OptimizeRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + Target +
      """(?:\s+SMALLER\s+THAN\s+(\d+)\s*(KB|MB|GB)?)?""" +
      """(?:\s+(CLUSTER|ZORDER)\s+BY\s*\(([^)]+)\))?""" +
      """(?:\s+INTO\s+(\d+)\s+FILES)?\s*;?\s*$""").r
  private val OptimizeWhereRe =
    ("""(?is)^\s*OPTIMIZE\s+""" + Target +
      """\s+WHERE\s+(.+?)\s*;?\s*$""").r
  // the only predicate forms a partition-scoped OPTIMIZE accepts:
  // <col> = <literal>  |  <col> IN (<literal>, ...)
  private val EqPredRe =
    """(?is)^\s*(`[^`]+`|[\w$]+)\s*=\s*('[^']*'|[-\w.]+)\s*$""".r
  private val InPredRe =
    """(?is)^\s*(`[^`]+`|[\w$]+)\s+IN\s*\(([^)]+)\)\s*$""".r
  private val VacuumRe =
    ("""(?is)^\s*VACUUM\s+""" + Target +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*$""").r
  private val ShowPartsRe =
    ("""(?is)^\s*SHOW\s+PARTITIONS\s+""" + Target +
      """\s*;?\s*$""").r
  private val RestoreRe =
    ("""(?is)^\s*RESTORE\s+(?:TABLE\s+)?""" + Target +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""").r
  // component list matches one nesting level of parens (days(ts) et al)
  // — a flat [^)]+ would stop at the transform's ')' and silently fall
  // through to Spark's parser (ADVICE r15)
  private val AlterPartRe =
    ("""(?is)^\s*ALTER\s+TABLE\s+""" + Target +
      """\s+SET\s+PARTITIONED\s+BY\s*""" +
      """\(((?:[^()]|\([^()]*\))+)\)\s*;?\s*$""").r
  private val DaysComp =
    """(?is)^days\s*\(\s*(`[^`]+`|[\w$]+)\s*\)$""".r

  private def stripLit(s: String): String =
    if (s.startsWith("'")) s.substring(1, s.length - 1) else s

  /** Tokenize an IN (...) literal list: each element is a 'quoted
    * string' (commas inside stay part of the VALUE) or a bare
    * word/number, comma-separated. Anything the grammar doesn't fully
    * cover throws — a naive split-on-comma would silently scope the
    * compaction to garbage values.
    */
  private[table] def splitInList(list: String): Seq[String] = {
    val Tok = """\G\s*(?:'([^']*)'|([-\w.]+))\s*(?:,|$)""".r
    val ms = Tok.findAllMatchIn(list).toSeq
    val consumed = ms.lastOption.map(_.end).getOrElse(0)
    if (ms.isEmpty || consumed != list.length)
      throw new IllegalArgumentException(
        "IN list must be comma-separated 'quoted' or bare literals, " +
          s"got: $list")
    ms.map(m => Option(m.group(1)).getOrElse(m.group(2)))
  }

  private[table] def maintenancePlan(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      // WHERE form first: partition-scoped compaction (a predicate
      // cannot combine with SMALLER/CLUSTER/ZORDER by grammar)
      case OptimizeWhereRe(target, pred) =>
        val (col, vals) = pred match {
          case EqPredRe(c, v) => (stripTicks(c), Seq(stripLit(v)))
          case InPredRe(c, list) =>
            (stripTicks(c), splitInList(list))
          case other => throw new IllegalArgumentException(
            "OPTIMIZE ... WHERE supports only <partition-col> = " +
              s"<literal> or <partition-col> IN (...), got: $other")
        }
        Some(GraftMaintenanceCommand("optimize-where",
          parseTarget(target), None, None, None,
          partitionPred = Some((col, vals))))
      case OptimizeRe(target, smaller, unit, kind, clusterCols, nFiles) =>
        val cols = Option(clusterCols).map(_.split(",").toSeq
          .map(c => stripTicks(c.trim)).filter(_.nonEmpty))
        if (cols.isEmpty && nFiles != null)
          throw new IllegalArgumentException(
            "OPTIMIZE ... INTO n FILES requires CLUSTER BY / ZORDER " +
              "BY — plain compaction sizes files by target bytes")
        // SMALLER THAN scopes the rewrite to small-file debris — a
        // re-layout (cluster/zorder) is whole-table by definition
        val minBytes = Option(smaller).map { s =>
          s.toLong * (Option(unit).map(_.toUpperCase) match {
            case Some("KB") => 1L << 10
            case Some("MB") => 1L << 20
            case Some("GB") => 1L << 30
            case _ => 1L
          })
        }
        if (minBytes.isDefined && cols.isDefined)
          throw new IllegalArgumentException(
            "OPTIMIZE ... SMALLER THAN cannot combine with CLUSTER " +
              "BY / ZORDER BY — a re-layout rewrites the whole table")
        val zorder = Option(kind)
          .exists(_.equalsIgnoreCase("ZORDER"))
        Some(GraftMaintenanceCommand("optimize", parseTarget(target),
          cols, Option(nFiles).map(_.toInt), None, zorder, minBytes))
      case VacuumRe(target, retain) =>
        Some(GraftMaintenanceCommand("vacuum", parseTarget(target),
          None, None, Option(retain).map(_.toInt)))
      case RestoreRe(target, toV) =>
        Some(GraftMaintenanceCommand("restore", parseTarget(target),
          None, None, None, toVersion = Some(toV.toLong)))
      case ShowPartsRe(target) =>
        Some(GraftShowPartitionsCommand(
          GraftSqlParser.parseTarget(target)))
      // partition-spec evolution: re-partition the table going forward
      case AlterPartRe(target, list) =>
        val BareCol = """(?s)^(`[^`]+`|[\w$]+)$""".r
        val comps = list.split(",").toSeq.map(_.trim)
          .filter(_.nonEmpty).map {
            case DaysComp(c) => (stripTicks(c), "days")
            case BareCol(c) => (stripTicks(c), "identity")
            case other => throw new IllegalArgumentException(
              "SET PARTITIONED BY components must be a column or " +
                s"days(col), got: $other")
          }
        if (comps.isEmpty) throw new IllegalArgumentException(
          "ALTER TABLE ... SET PARTITIONED BY needs at least one " +
            "identity column or days(col) transform")
        Some(GraftMaintenanceCommand("evolve-partition",
          parseTarget(target), None, None, None,
          evolveTo = Some(comps)))
      case _ => None
    }

  private def stripTicks(s: String): String =
    if (s.startsWith("`") && s.endsWith("`") && s.length >= 2)
      s.substring(1, s.length - 1)
    else s

  /** `Left(path)` for a quoted path, `Right(segments)` for an
    * identifier to resolve through a graft catalog.
    */
  private[table] def parseTarget(t: String): Either[String, Seq[String]] =
    if (t.startsWith("'")) Left(t.substring(1, t.length - 1))
    else Right(t.split("\\.").toSeq.map(stripTicks))
}

/** One maintenance statement, executed ONCE at command execution (the
  * eager-command path `spark.sql(...)` takes), never at analysis.
  */
case class GraftMaintenanceCommand(
    kind: String,
    target: Either[String, Seq[String]],
    clusterCols: Option[Seq[String]],
    nFiles: Option[Int],
    retainVersions: Option[Int],
    zorder: Boolean = false,
    minBytes: Option[Long] = None,
    toVersion: Option[Long] = None,
    partitionPred: Option[(String, Seq[String])] = None,
    evolveTo: Option[Seq[(String, String)]] = None)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("op", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_removed", LongType, nullable = false)(),
    AttributeReference("files_added", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val root = resolveRoot(spark)
    val before = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    kind match {
      case "optimize" =>
        // preserve the table's opted-in stats columns across the
        // rewrite: physical stats keys mapped back to logical names
        val cm = before.colMap.getOrElse(Map.empty[String, String])
        val inv = cm.map(_.swap)
        val statsCols = before.files.flatMap(_.stats.keys).toSet.toSeq
          .map((p: String) => inv.getOrElse(p, p))
        val v = clusterCols match {
          case Some(cols) if zorder =>
            TxnTable.clusterZ(spark, root, cols,
              nFiles.getOrElse(math.max(1, before.files.size)),
              // every interleaved dimension prunes via its stats box
              (statsCols ++ cols).distinct)
          case Some(cols) =>
            TxnTable.cluster(spark, root, cols,
              nFiles.getOrElse(math.max(1, before.files.size)),
              // clustering columns are worth stats by definition
              (statsCols ++ cols).distinct)
          case None => minBytes match {
            case Some(mb) =>
              TxnTable.compactSmall(spark, root, mb,
                statsCols = statsCols)
            case None =>
              TxnTable.compact(spark, root, statsCols = statsCols)
          }
        }
        val after = TxnTable.readManifest(spark, root, v)
        val beforeSet = before.files.map(_.path).toSet
        val afterSet = after.files.map(_.path).toSet
        val opName =
          if (clusterCols.nonEmpty) { if (zorder) "zorder" else "cluster" }
          else if (minBytes.isDefined) "compact-small"
          else "compact"
        Seq(Row(opName, v,
          (beforeSet -- afterSet).size.toLong,
          (afterSet -- beforeSet).size.toLong))
      // OPTIMIZE t WHERE <partition> = v: partition-scoped compaction
      // — O(named partitions) plus any layout-unaware stragglers,
      // which it heals into the layout
      case "optimize-where" =>
        val (pcol, vals) = partitionPred.getOrElse(
          sys.error("optimize-where without a predicate"))
        val spec = TxnTable.partitionSpec(
          spark.sparkContext.hadoopConfiguration, root).getOrElse(
          throw new IllegalArgumentException(
            "OPTIMIZE ... WHERE needs an identity/days-partitioned " +
              s"table; the table at $root has no partition layout"))
        val comps = TxnTable.partCompsOf(spec)
        val cmW = before.colMap.getOrElse(Map.empty[String, String])
        val logicals = comps.map(c =>
          cmW.find(_._2 == c.col).map(_._1).getOrElse(c.col))
        val ci = logicals.indexWhere(_.equalsIgnoreCase(pcol))
        require(ci >= 0,
          s"OPTIMIZE ... WHERE predicate column '$pcol' is not one of " +
            s"the table's partition columns ${logicals.mkString(", ")}")
        // single-column layout: the user's values ARE pv strings
        // (pass through, matching nothing is fine; stragglers still
        // heal); multi-column: component predicate resolves to the
        // matching FULL pv tuples from the live manifest, plus a
        // no-match sentinel so straggler healing survives an empty
        // match (a control-char lead collides with no real pv;
        // NullPv is the only control-char value the writer stamps)
        val vset = vals.toSet
        val pvVals =
          if (comps.length == 1) vals
          else {
            val hit = before.files
              .filter(TxnTable.pvCurrent(_, spec)) // this era's stamps
              .flatMap(_.pv).distinct.filter(pv =>
                TxnTable.pvComponents(pv, comps.length)
                  .exists(parts => vset.contains(parts(ci))))
            if (hit.isEmpty) Seq("\u0001NOMATCH") else hit
          }
        val invW = cmW.map(_.swap)
        val statsColsW = before.files.flatMap(_.stats.keys).toSet.toSeq
          .map((p: String) => invW.getOrElse(p, p))
        val v = TxnTable.compactPartitions(spark, root, pvVals,
          statsCols = statsColsW)
        val after = TxnTable.readManifest(spark, root, v)
        val beforeSet = before.files.map(_.path).toSet
        val afterSet = after.files.map(_.path).toSet
        Seq(Row("compact-partition", v,
          (beforeSet -- afterSet).size.toLong,
          (afterSet -- beforeSet).size.toLong))
      case "vacuum" =>
        val deleted = TxnTable.vacuum(spark, root,
          retainLast = retainVersions.getOrElse(2))
        Seq(Row("vacuum", before.version, deleted.size.toLong, 0L))
      // ALTER TABLE t SET PARTITIONED BY (...) — partition-spec
      // evolution: an atomic sidecar replace, zero data IO; the new
      // generation is reported in the version column (no commit lands)
      case "evolve-partition" =>
        val comps0 = evolveTo.getOrElse(
          sys.error("evolve-partition without a spec"))
        val cmE = before.colMap.getOrElse(Map.empty[String, String])
        val comps = comps0.map { case (c, t) => (cmE.getOrElse(c, c), t) }
        val spec =
          if (comps.length == 1)
            TxnTable.PartitionSpec(comps.head._1, comps.head._2)
          else TxnTable.PartitionSpec(comps.head._1, comps.head._2,
            Some(comps.map(_._1)), Some(comps.map(_._2)))
        val gen = TxnTable.evolvePartitionSpec(spark, root, spec)
        Seq(Row("evolve-partition", gen.toLong, 0L, 0L))
      // RESTORE t TO VERSION AS OF n — a new commit whose file set is
      // the target's (time travel made durable); TxnTable.restore
      // carries streamHwm/constraints/bloomCols forward and
      // materializes CDF rows like any rewrite
      case "restore" =>
        val v = TxnTable.restore(spark, root, toVersion.getOrElse(
          sys.error("RESTORE requires TO VERSION AS OF n")))
        val after = TxnTable.readManifest(spark, root, v)
        val beforeSet = before.files.map(_.path).toSet
        val afterSet = after.files.map(_.path).toSet
        Seq(Row("restore", v,
          (beforeSet -- afterSet).size.toLong,
          (afterSet -- beforeSet).size.toLong))
      case other => sys.error(s"unknown maintenance kind $other")
    }
  }

  /** Same trust split as [[GraftHistoryFunction]]: a quoted path is
    * driver-trusted; an identifier resolves through a REGISTERED graft
    * catalog's warehouse with the catalog's own segment guard.
    */
  private[table] def resolveRoot(spark: SparkSession): String = target match {
    case Left(path) => path
    case Right(parts) =>
      require(parts.length >= 2,
        s"maintenance target must be <catalog>.<table...>, got " +
          parts.mkString("."))
      val cat = parts.head
      val impl = spark.conf.getOption(s"spark.sql.catalog.$cat")
      require(impl.contains(classOf[GraftCatalog].getName),
        s"'$cat' is not a registered graft catalog " +
          s"(spark.sql.catalog.$cat=${impl.getOrElse("<unset>")})")
      val wh = spark.conf.getOption(s"spark.sql.catalog.$cat.warehouse")
        .getOrElse(sys.error(
          s"graft catalog '$cat' has no warehouse configured"))
      val segs = parts.tail
      segs.foreach { s =>
        require(s.nonEmpty && s != "." && s != ".." &&
            !s.contains("/") && !s.contains("\\") && !s.contains(":"),
          s"illegal identifier segment '$s' — segments must not be " +
            "empty, '.', '..', or contain path separators")
      }
      segs.mkString(wh.stripSuffix("/") + "/", "/", "")
  }
}

/** `SHOW PARTITIONS <table>` over an identity/days-partitioned graft
  * table — a MANIFEST-ONLY listing (zero data IO at any table size):
  * one row per partition value with its live file count, row count
  * and byte size, straight from the FileEntry `pv`s. The NULL
  * partition surfaces as the string 'NULL'; layout-unaware straggler
  * files (COW rewrites, streaming epochs — no pv) group under SQL
  * NULL so operators can SEE unhealed debris and schedule the
  * OPTIMIZE/compaction that heals it.
  */
case class GraftShowPartitionsCommand(
    target: Either[String, Seq[String]]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("partition_value", StringType, nullable = true)(),
    AttributeReference("n_files", LongType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    // same trust split as the maintenance command
    val root = GraftMaintenanceCommand(
      "unused", target, None, None, None).resolveRoot(spark)
    val spec = TxnTable.partitionSpec(
      spark.sparkContext.hadoopConfiguration, root).getOrElse(
      throw new IllegalArgumentException(
        s"SHOW PARTITIONS: the table at $root has no identity/days " +
          "partition layout"))
    val k = TxnTable.partCompsOf(spec).length
    val m = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    m.files.filter(_.rows > 0)
      // prior-generation stamps (pre-evolution eras) group under SQL
      // NULL with the other layout-unaware debris — operators SEE the
      // unhealed era and schedule the OPTIMIZE that heals it
      .groupBy(f => f.pv.filter(_ => TxnTable.pvCurrent(f, spec)))
      .toSeq
      .map { case (pv, fs) =>
        // multi-column tuples render component-wise (unescaped, NULL
        // per null slot, '/'-joined); an undecodable pv shows verbatim
        // so operators can SEE a foreign stamp rather than mis-read it
        val shown = pv match {
          case Some(v) => TxnTable.pvComponents(v, k) match {
            case Some(parts) => parts
              .map(p => if (p == TxnTable.NullPv) "NULL" else p)
              .mkString("/")
            case None => v
          }
          case None => null
        }
        Row(shown, fs.size.toLong, fs.map(_.rows).sum,
          fs.map(_.bytes).sum)
      }
      .sortBy(r => Option(r.getString(0)).getOrElse("\uffff"))
  }
}
