package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_files('<table root>' [, version])` — the current (or
  * time-traveled) manifest's FILE LISTING as a SQL table function: the
  * DESCRIBE-DETAIL surface beside [[GraftHistoryFunction]]'s commit
  * history and [[GraftSqlParser]]'s maintenance statements.
  *
  * {{{
  *   SELECT path, n_rows, bytes FROM graft_files('/data/events')
  *   SELECT COUNT(*) FROM graft_files('/data/events', 3)
  * }}}
  *
  * Columns: `path, n_rows, bytes, n_stats_cols, n_dvs` — one row per
  * data file, straight from the manifest (O(1) metadata reads, zero
  * data IO; the small-file-problem audit and compaction-planning
  * query). Same trust model, session Hadoop conf, and analysis-time
  * LocalRelation mechanics as graft_history; the manifest is
  * O(files)-sized by construction, the same object the driver already
  * holds to plan any scan.
  */
object GraftFilesFunction {
  val name = "graft_files"

  val info = new ExpressionInfo(getClass.getCanonicalName, name,
    "graft_files(path[, version]) - data-file listing of the graft " +
      "table at `path` (path, n_rows, bytes, n_stats_cols, n_dvs); " +
      "metadata-only.")

  private val schema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("n_stats_cols", IntegerType, nullable = false),
    StructField("n_dvs", IntegerType, nullable = false),
    // identity/days layout: the file's partition value (canonical
    // string space); NULL for layout-unaware or unpartitioned files
    StructField("partition_value", StringType, nullable = true)))

  def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty && args.length <= 2 &&
        args.forall(_.foldable) && args.head.dataType == StringType,
      s"$name expects a foldable STRING path and an optional " +
        "INTEGER version")
    val root = GraftTvf.resolveRoot(name,
      Option(args.head.eval(InternalRow.empty))
        .map(_.toString)
        .getOrElse(throw new IllegalArgumentException(
          s"$name: path must not be NULL")))
    val version = args.drop(1).headOption.map { e =>
      Option(e.eval(InternalRow.empty)).map(_.toString.toLong)
        .getOrElse(throw new IllegalArgumentException(
          s"$name: version must not be NULL"))
    }
    val session = org.apache.spark.sql.SparkSession.active
    val conf = session.sessionState.newHadoopConf()
    val m = GraftTableProvider.manifestFor(conf, root, version)
    val rows = m.files.map { f =>
      InternalRow(UTF8String.fromString(f.path), f.rows, f.bytes,
        f.stats.size, f.dvs.map(_.size).getOrElse(0),
        f.pv.map(UTF8String.fromString).orNull)
    }
    LocalRelation(
      schema.fields.toIndexedSeq.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)()),
      rows.toIndexedSeq)
  }
}
