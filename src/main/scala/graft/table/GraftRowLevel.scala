package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL `UPDATE` and `MERGE INTO` for the graft table — DSv2
  * SupportsRowLevelOperations in GROUP-BASED COPY-ON-WRITE mode with
  * FILE-GROUP pruning:
  *
  *   - Spark rewrites the statement into a plan that reads the table,
  *     applies the UPDATE/MERGE logic, and hands the post-change rows
  *     of the SCANNED FILES to this operation's write;
  *   - `requiredMetadataAttributes` requests the `_file` metadata
  *     column, so Spark's runtime group filtering
  *     (`RowLevelOperationRuntimeGroupFiltering`) evaluates the
  *     statement condition in a subquery, collects the distinct
  *     `_file` values of MATCHED rows, and pushes them back into the
  *     COW scan as an IN filter ([[GraftScan.filter]]) — a selective
  *     UPDATE reads and rewrites O(matched files), not O(table);
  *   - the scanned files ARE the replacement group: the write's commit
  *     unions every UNTOUCHED manifest entry verbatim with the newly
  *     written files ([[TxnTable.commitCow]]), so file-group pruning
  *     changes WHICH files rewrite, never what the table contains.
  *     Static predicate pruning stays disabled (`prune = false`): the
  *     scan must return every row of each scanned file, matched or
  *     not, or replaced files would silently lose their unmatched
  *     rows;
  *   - the base version is resolved ONCE at operation creation and
  *     pins BOTH the scan and the commit — the driver commit
  *     ([[TxnTable.commitCow]]) aborts loudly if anything else
  *     committed after it (the serializable-conflict contract; the
  *     statement re-runs), never overwrites the winner;
  *   - the write is a real distributed DSv2 BatchWrite: each task
  *     streams its partition into a parquet file under `data/`
  *     ([[GraftCowDataWriter]]), writing PHYSICAL column names (the
  *     base manifest's column mapping), so kept files and new files
  *     serve one read schema.
  *
  * DELETE binds via the cheaper SupportsDelete path and never reaches
  * here.
  */
class GraftRowLevelOperation(
    root: String, tableSchema: StructType,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  /** Base version pinned at operation creation: the COW scan reads
    * this manifest and the commit conflicts against it — one version
    * for planning, execution and commit (no planning/commit split).
    */
  private val baseVersion: Long =
    GraftTableProvider.listVersions(new Configuration(), root).max

  /** The configured COW scan — captured at build so the write can ask
    * which files were ACTUALLY planned (post runtime group filtering):
    * that set is the replacement group.
    */
  @volatile private var cowScan: GraftScan = _

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft COW $cmd on $root (file-group pruned, base v$baseVersion)"

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftScan.FileCol))

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, tableSchema, version = Some(baseVersion),
      prune = false, register = s => cowScan = s)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new Write with RequiresDistributionAndOrdering {
          private val manifest = GraftTableProvider.manifestFor(
            new Configuration(), root, Some(baseVersion))

          /** CLUSTERING PRESERVATION under DML: the base manifest's
            * per-file stats columns are the columns the table prunes
            * on (the writers paid for those stats on purpose) —
            * request a RANGE distribution + per-partition sort on
            * them, so rewritten file groups come back with tight,
            * disjoint min/max ranges instead of arbitrary shuffle
            * residue. Without this, every SQL UPDATE would slowly
            * de-cluster the touched ranges until a manual cluster()
            * — stats would stay PRESENT (the writer collects them
            * inline) but grow WIDE, which prunes like not having
            * them. The 64 MB advisory partition size lets AQE
            * coalesce a small replacement group back to few files.
            */
          // the table's opted-in stats columns, PHYSICAL names — the
          // base manifest's stats key set. The writer tracks min/max
          // for exactly this set (not every numeric column): stats
          // are an opt-in pruning contract, and a rewritten file must
          // carry the same keys the kept files do, no more.
          private val statsPhys: Set[String] =
            manifest.files.flatMap(_.stats.keys).toSet

          private val sortCols: Array[String] = {
            val cm = manifest.colMap.getOrElse(Map.empty[String, String])
            info.schema().fieldNames
              .filter(n => statsPhys.contains(cm.getOrElse(n, n)))
          }

          private def orders
              : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            sortCols.map(c => Expressions.sort(Expressions.column(c),
              org.apache.spark.sql.connector.expressions.SortDirection
                .ASCENDING))

          override def requiredDistribution()
              : org.apache.spark.sql.connector.distributions.Distribution =
            if (sortCols.isEmpty)
              org.apache.spark.sql.connector.distributions.Distributions
                .unspecified()
            else
              org.apache.spark.sql.connector.distributions.Distributions
                .ordered(orders)

          override def requiredOrdering()
              : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
            if (sortCols.isEmpty) Array.empty else orders

          // advisory size is only legal WITH a distribution (Spark
          // refuses it under unspecified)
          override def advisoryPartitionSizeInBytes(): Long =
            if (sortCols.isEmpty) 0L else 64L << 20

          override def toBatch: BatchWrite =
            new GraftCowBatchWrite(root, info.schema(),
              cmd.toString.toLowerCase(java.util.Locale.ROOT),
              baseVersion, manifest.colMap.getOrElse(Map.empty),
              () => Option(cowScan).flatMap(_.plannedFiles), statsPhys)
        }
    }
}

/** One replaced-group commit: executor tasks write parquet files,
  * `commit` turns their messages into a manifest at `baseVersion + 1`
  * whose file set is (base files − replacement group) ++ new files
  * (abort-on-conflict — see [[TxnTable.commitCow]]). `replacedFiles`
  * is read AT COMMIT TIME (after the job ran, so the scan's runtime
  * group filter has been applied); `None` — planning never happened —
  * falls back to whole-table replace, which is always sound. Aborted
  * tasks delete their files; an aborted JOB leaves only unreferenced
  * files for vacuum, never a partial version (the manifest rename is
  * the single commit point, same as every other write path).
  */
class GraftCowBatchWrite(
    root: String, schema: StructType, op: String, baseVersion: Long,
    physMap: Map[String, String],
    replacedFiles: () => Option[Seq[TxnTable.FileEntry]],
    statsPhys: Set[String] = Set.empty)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftCowWriterFactory(root, schema, physMap, statsPhys)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case m: GraftCowCommit if m.rows > 0 =>
        TxnTable.FileEntry(m.relPath, m.rows, m.bytes, m.stats)
    }.toSeq
    val spark = org.apache.spark.sql.SparkSession.active
    TxnTable.commitCow(spark, root, op, schema.toDDL, files, baseVersion,
      replacedFiles().map(_.map(_.path)))
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    messages.foreach {
      case m: GraftCowCommit if m.rows > 0 =>
        val p = new Path(s"$root/${m.relPath}")
        try p.getFileSystem(conf).delete(p, false)
        catch { case _: Exception => () } // vacuum reclaims stragglers
      case _ => ()
    }
  }
}

case class GraftCowCommit(relPath: String, rows: Long, bytes: Long,
    stats: Map[String, TxnTable.ColStats] = Map.empty)
    extends WriterCommitMessage

class GraftCowWriterFactory(root: String, schema: StructType,
    physMap: Map[String, String], statsPhys: Set[String] = Set.empty)
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftCowDataWriter(root, schema, partitionId, taskId, physMap,
      statsPhys)
}

/** Per-task parquet writer (example API Group writer — the symmetric
  * twin of [[GraftPartitionReader]]: the same scalar set PLUS arrays
  * of scalars, so tables carrying `ARRAY<FLOAT>` embedding columns —
  * this engine's flagship payload — take SQL UPDATE/MERGE). Columns
  * are written under their PHYSICAL names (`physMap`), matching the
  * kept files of a partial rewrite. The file is created LAZILY on the
  * first row, so empty partitions commit nothing instead of littering
  * zero-row files. Per-file MIN/MAX STATS for numeric columns are
  * tracked inline (keyed by PHYSICAL name, double-comparable space —
  * the [[TxnTable]] stats contract): without them every SQL UPDATE
  * would strip its rewritten files of pruning stats until the next
  * compact, degrading manifest file-skipping a little more per
  * statement — the quiet scale leak the whole-table COW never
  * surfaced.
  */
class GraftCowDataWriter(
    root: String, schema: StructType, partitionId: Int, taskId: Long,
    physMap: Map[String, String] = Map.empty,
    statsPhys: Set[String] = Set.empty,
    prefix: String = "cow")
    extends DataWriter[InternalRow] {
  import org.apache.parquet.example.data.simple.SimpleGroup
  import org.apache.parquet.hadoop.ParquetWriter
  import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

  private val relPath =
    s"${TxnTable.dataDirName}/$prefix-" +
      s"${java.util.UUID.randomUUID.toString.take(8)}" +
      s"-p$partitionId-t$taskId.parquet"
  private val conf = new Configuration()
  private var writer: ParquetWriter[org.apache.parquet.example.data.Group] = _
  private var messageType: MessageType = _
  private var rows = 0L
  // inline min/max per OPTED-IN stats column (the base manifest's
  // stats key set), physical names. NaN poisons a column's stats for
  // the whole file: NaN compares false against everything, so a
  // min/max window that "contains" it would be wrong either way —
  // under Spark's NaN-is-largest ordering a `c > x` manifest-prune
  // could skip the file and silently drop its NaN rows, and a
  // ColStats(NaN, NaN) doesn't survive the JSON manifest round-trip.
  // A poisoned column simply ships NO stats (never prunable — sound).
  private val statMin = scala.collection.mutable.Map.empty[String, Double]
  private val statMax = scala.collection.mutable.Map.empty[String, Double]
  private val statNaN = scala.collection.mutable.Set.empty[String]
  private def trackStat(phys: String, v: Double): Unit =
    if (statsPhys.contains(phys)) {
      if (v.isNaN) { statNaN += phys; statMin -= phys; statMax -= phys }
      else if (!statNaN.contains(phys)) statMin.get(phys) match {
        case Some(m) =>
          if (v < m) statMin(phys) = v
          if (v > statMax(phys)) statMax(phys) = v
        case None =>
          statMin(phys) = v; statMax(phys) = v
      }
    }

  private def primType(dt: DataType): Option[
      (PrimitiveTypeName, Option[LogicalTypeAnnotation])] = dt match {
    case LongType => Some((PrimitiveTypeName.INT64, None))
    case IntegerType => Some((PrimitiveTypeName.INT32, None))
    case DoubleType => Some((PrimitiveTypeName.DOUBLE, None))
    case FloatType => Some((PrimitiveTypeName.FLOAT, None))
    case BooleanType => Some((PrimitiveTypeName.BOOLEAN, None))
    case StringType => Some((PrimitiveTypeName.BINARY,
      Some(LogicalTypeAnnotation.stringType())))
    case _ => None
  }

  private def open(): Unit = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val name = physMap.getOrElse(f.name, f.name)
      val t: org.apache.parquet.schema.Type = f.dataType match {
        case ArrayType(et, _) =>
          val (p, ann) = primType(et).getOrElse(
            throw new UnsupportedOperationException(
              s"graft COW writer: unsupported array element $et for " +
                s"${f.name}"))
          // standard 3-level list, the layout Spark's own writer emits
          val eb = Types.optionalList().optionalElement(p)
          ann.fold(eb.named(name))(a => eb.as(a).named(name))
        case other =>
          val (p, ann) = primType(other).getOrElse(
            throw new UnsupportedOperationException(
              s"graft COW writer: unsupported type $other for ${f.name} " +
                "(scalars and arrays of scalars — the DSv2 reader's set)"))
          val pb = Types.optional(p)
          ann.fold(pb.named(name))(a => pb.as(a).named(name))
      }
      b.addField(t)
    }
    messageType = b.named("graft_cow")
    GroupWriteSupport.setSchema(messageType, conf)
    writer = ExampleParquetWriter
      .builder(new Path(s"$root/$relPath"))
      .withConf(conf)
      .withType(messageType)
      .build()
  }

  private def addPrim(g: org.apache.parquet.example.data.Group,
      n: String, dt: DataType, row: org.apache.spark.sql.catalyst.util.ArrayData,
      i: Int): Unit = dt match {
    case LongType => g.add(n, row.getLong(i))
    case IntegerType => g.add(n, row.getInt(i))
    case DoubleType => g.add(n, row.getDouble(i))
    case FloatType => g.add(n, row.getFloat(i))
    case BooleanType => g.add(n, row.getBoolean(i))
    case StringType => g.add(n, row.getUTF8String(i).toString)
    case _ => () // unreachable: open() refused the schema
  }

  // ReplaceData prepends internal bookkeeping column(s) — Spark 4.1's
  // `__row_operation` marker — BEFORE the table columns (verified via
  // EXPLAIN: `Project [6 AS __row_operation, k, score]`). The table
  // fields are the TRAILING schema.length fields; anything else is a
  // plan shape this writer doesn't know and must refuse, not guess.
  private var base = -1

  override def write(record: InternalRow): Unit = {
    if (base < 0) {
      base = record.numFields - schema.length
      require(base == 0 || base == 1,
        s"graft COW writer: row has ${record.numFields} fields for a " +
          s"${schema.length}-column schema — unexpected ReplaceData " +
          "projection, refusing to misalign")
    }
    if (writer == null) open()
    val g = new SimpleGroup(messageType)
    var i = 0
    while (i < schema.length) {
      val j = base + i
      if (!record.isNullAt(j)) {
        val n = physMap.getOrElse(schema.fields(i).name,
          schema.fields(i).name)
        schema.fields(i).dataType match {
          case LongType =>
            val v = record.getLong(j); g.add(n, v)
            trackStat(n, v.toDouble)
          case IntegerType =>
            val v = record.getInt(j); g.add(n, v)
            trackStat(n, v.toDouble)
          case DoubleType =>
            val v = record.getDouble(j); g.add(n, v)
            trackStat(n, v)
          case FloatType =>
            val v = record.getFloat(j); g.add(n, v)
            trackStat(n, v.toDouble)
          case BooleanType => g.add(n, record.getBoolean(j))
          case StringType => g.add(n, record.getUTF8String(j).toString)
          case ArrayType(et, _) =>
            val arr = record.getArray(j)
            val outer = g.addGroup(n)
            var k = 0
            while (k < arr.numElements()) {
              val e = outer.addGroup("list")
              if (!arr.isNullAt(k)) addPrim(e, "element", et, arr, k)
              k += 1
            }
          case _ => () // unreachable: open() refused the schema
        }
      }
      i += 1
    }
    writer.write(g)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer == null) GraftCowCommit(relPath, 0L, 0L)
    else {
      writer.close()
      val p = new Path(s"$root/$relPath")
      val stats = statMin.keys.map(k =>
        k -> TxnTable.ColStats(statMin(k), statMax(k))).toMap
      GraftCowCommit(relPath, rows,
        p.getFileSystem(conf).getFileStatus(p).getLen, stats)
    }
  }

  override def abort(): Unit = {
    if (writer != null) {
      try writer.close() catch { case _: Exception => () }
      val p = new Path(s"$root/$relPath")
      try p.getFileSystem(conf).delete(p, false)
      catch { case _: Exception => () }
    }
  }

  override def close(): Unit = ()
}
