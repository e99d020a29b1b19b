package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** NATIVE STREAMING SINK for the graft table format —
  * `df.writeStream.format("graft").option("checkpointLocation", …)
  * .start(root)` — the DSv2 `StreamingWrite` twin of
  * [[GraftMicroBatchStream]] (which made the table a first-class
  * SOURCE). Until now streams landed exactly-once only via
  * `foreachBatch` + [[TxnTable.appendBatch]]; this surfaces the same
  * manifest-fenced protocol as a first-class sink:
  *
  *   - executor tasks write ordinary graft data files (the
  *     [[GraftCowDataWriter]] parquet writer — scalars + arrays of
  *     scalars, PHYSICAL names under an active column mapping, inline
  *     min/max stats for the table's opted-in stats columns, lazy
  *     file creation so empty partitions commit nothing);
  *   - `commit(epochId, …)` publishes the epoch through
  *     [[TxnTable.commitStreamFiles]], which fences the micro-batch id
  *     in `streamHwm` INSIDE the same atomic manifest rename — a
  *     crash-replayed epoch is detected there and its freshly-written
  *     files are deleted here, so restarts are exactly-once with NO
  *     window where data committed but the fence didn't;
  *   - `abort` deletes the epoch's files; an aborted epoch leaves at
  *     worst unreferenced files for vacuum, never a partial version.
  *
  * Scale shape: rows never round-trip through the driver — the driver
  * handles one manifest CAS per epoch, O(files) metadata. Append mode
  * only (a streaming `complete` rewrite of a 100 TB table per trigger
  * is an anti-pattern; use foreachBatch + mergeFull for upsert
  * streams). The table must exist — schema inference and the column
  * mapping are resolved from its manifest at query start.
  */
class GraftStreamingWrite(root: String, writeSchema: StructType,
    evolveSchema: Boolean = false)
    extends StreamingWrite {

  // resolved ONCE at query start; commitStreamFiles re-checks the map
  // at every epoch so a mid-stream rename aborts loudly instead of
  // writing logical names into physical files
  private val baseManifest =
    GraftTableProvider.latestManifest(new Configuration(), root)
  private val physMap: Map[String, String] =
    baseManifest.colMap.getOrElse(Map.empty)
  // stats opt-in = what existing files already index PLUS the
  // persisted statsCols property — a freshly CREATE'd (empty) table
  // has no files to learn from, but its TBLPROPERTIES opt-in must
  // still govern the stream's files
  private val statsPhys: Set[String] =
    baseManifest.files.flatMap(_.stats.keys).toSet ++
      TxnTable.tableProps(new Configuration(), root).get("statsCols")
        .toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        .map(c => physMap.getOrElse(c, c))

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftStreamWriterFactory(root, writeSchema, physMap, statsPhys)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case m: GraftCowCommit if m.rows > 0 =>
        TxnTable.FileEntry(m.relPath, m.rows, m.bytes, m.stats)
    }.toSeq
    val spark = org.apache.spark.sql.SparkSession.active
    val committed = TxnTable.commitStreamFiles(spark, root,
      writeSchema.toDDL, files, epochId, physMap, evolveSchema)
    if (committed.isEmpty) deleteFiles(messages) // replayed epoch
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    deleteFiles(messages)

  private def deleteFiles(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    messages.foreach {
      case m: GraftCowCommit =>
        val p = new Path(s"$root/${m.relPath}")
        try p.getFileSystem(conf).delete(p, false)
        catch { case _: Exception => () } // vacuum sweeps leftovers
      case _ => ()
    }
  }
}

class GraftStreamWriterFactory(root: String, schema: StructType,
    physMap: Map[String, String], statsPhys: Set[String])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftCowDataWriter(root, schema, partitionId, taskId, physMap,
      statsPhys, prefix = s"stream-e$epochId")
}
