package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL `UPDATE` and `MERGE INTO` for the graft table — DSv2
  * SupportsRowLevelOperations in GROUP-BASED COPY-ON-WRITE mode with
  * the WHOLE TABLE as the one replacement group:
  *
  *   - Spark rewrites the statement into a plan that reads the table,
  *     applies the UPDATE/MERGE logic, and hands the FULL post-change
  *     row set to this operation's write;
  *   - the scan is pruning-DISABLED ([[GraftScanBuilder]] `prune =
  *     false`): its output defines the replacement group, so a
  *     file-pruned read would silently drop the pruned rows on
  *     replace;
  *   - the write is a real distributed DSv2 BatchWrite: each task
  *     streams its partition into a parquet file under `data/`
  *     ([[GraftCowDataWriter]]), and the driver commit assembles ONE
  *     manifest ([[TxnTable.commitCow]]) with serializable-conflict
  *     detection — a commit that raced anything ABORTS loudly (the
  *     statement re-runs), never overwrites the winner.
  *
  * The whole-table group is the honest baseline at this surface: a
  * file-group refinement (replace only touched files via a `_file`
  * metadata column) changes WHICH files rewrite, not the commit
  * protocol, and is the documented scale follow-up. DELETE binds via
  * the cheaper SupportsDelete path and never reaches here.
  */
class GraftRowLevelOperation(
    root: String, tableSchema: StructType,
    cmd: RowLevelOperation.Command)
    extends RowLevelOperation {

  override def command(): RowLevelOperation.Command = cmd

  override def description(): String =
    s"graft COW $cmd on $root (whole-table group)"

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(root, tableSchema, prune = false)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftCowBatchWrite(root, info.schema(),
            cmd.toString.toLowerCase(java.util.Locale.ROOT),
            GraftTableProvider.listVersions(new Configuration(), root).max)
      }
    }
}

/** One replaced-table commit: executor tasks write parquet files,
  * `commit` turns their messages into a manifest at `baseVersion + 1`
  * (abort-on-conflict — see [[TxnTable.commitCow]]). Aborted tasks
  * delete their files; an aborted JOB leaves only unreferenced files
  * for vacuum, never a partial version (the manifest rename is the
  * single commit point, same as every other write path).
  */
class GraftCowBatchWrite(
    root: String, schema: StructType, op: String, baseVersion: Long)
    extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftCowWriterFactory(root, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case m: GraftCowCommit if m.rows > 0 =>
        TxnTable.FileEntry(m.relPath, m.rows, m.bytes, Map.empty)
    }.toSeq
    val spark = org.apache.spark.sql.SparkSession.active
    TxnTable.commitCow(spark, root, op, schema.toDDL, files, baseVersion)
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

case class GraftCowCommit(relPath: String, rows: Long, bytes: Long)
    extends WriterCommitMessage

class GraftCowWriterFactory(root: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftCowDataWriter(root, schema, partitionId, taskId)
}

/** Per-task parquet writer (example API Group writer — the symmetric
  * twin of [[GraftPartitionReader]], same scalar type set). The file
  * is created LAZILY on the first row, so empty partitions commit
  * nothing instead of littering zero-row files.
  */
class GraftCowDataWriter(
    root: String, schema: StructType, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  import org.apache.parquet.example.data.simple.SimpleGroup
  import org.apache.parquet.hadoop.ParquetWriter
  import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
  import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

  private val relPath =
    s"${TxnTable.dataDirName}/cow-${java.util.UUID.randomUUID.toString.take(8)}" +
      s"-p$partitionId-t$taskId.parquet"
  private val conf = new Configuration()
  private var writer: ParquetWriter[org.apache.parquet.example.data.Group] = _
  private var messageType: MessageType = _
  private var rows = 0L

  private def open(): Unit = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case LongType => Types.optional(PrimitiveTypeName.INT64)
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT)
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case other => throw new UnsupportedOperationException(
          s"graft COW writer: unsupported type $other for ${f.name} " +
            "(same scalar set as the DSv2 reader)")
      }
      b.addField(t.named(f.name))
    }
    messageType = b.named("graft_cow")
    GroupWriteSupport.setSchema(messageType, conf)
    writer = ExampleParquetWriter
      .builder(new Path(s"$root/$relPath"))
      .withConf(conf)
      .withType(messageType)
      .build()
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
        val n = schema.fields(i).name
        schema.fields(i).dataType match {
          case LongType => g.add(n, record.getLong(j))
          case IntegerType => g.add(n, record.getInt(j))
          case DoubleType => g.add(n, record.getDouble(j))
          case FloatType => g.add(n, record.getFloat(j))
          case BooleanType => g.add(n, record.getBoolean(j))
          case StringType => g.add(n, record.getUTF8String(j).toString)
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
      GraftCowCommit(relPath, rows,
        p.getFileSystem(conf).getFileStatus(p).getLen)
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
