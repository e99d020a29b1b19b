package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** `graft_changes('<table root>', fromVersion, toVersion)` — the
  * table's CHANGE ROWS between two versions as a SQL TABLE FUNCTION
  * (Delta's `table_changes` surface, completing the SQL CDF story the
  * `readChangeFeed` stream and [[TxnTable.cdf]] batch API started):
  *
  * {{{
  *   SELECT _change_type, COUNT(*) FROM
  *     graft_changes('/data/events', 1, 3) GROUP BY 1
  * }}}
  *
  * Unlike [[GraftHistoryFunction]]/[[GraftFilesFunction]] — metadata
  * TVFs that materialize driver-side LocalRelations — change rows are
  * DATA: the builder returns the LOGICAL PLAN of the distributed
  * [[TxnTable.cdf]] diff (one keyed full-outer join between the two
  * snapshots), so rows never touch the driver and every downstream
  * operator plans as ordinary Catalyst on top. Requires the table to
  * have CHANGE DATA FEED enabled ([[TxnTable.enableCdf]] — the key
  * columns the diff joins on live there); both versions' files must
  * still exist (vacuum can reclaim them — same caveat as time travel).
  * Arguments must be foldable (analysis-time resolution); the path
  * shares graft_history's trust model including the optional
  * `spark.graft.sql.history.root` containment root.
  */
object GraftChangesFunction {
  val name = "graft_changes"

  val info = new ExpressionInfo(getClass.getCanonicalName, name,
    "graft_changes(path, fromVersion, toVersion) - change rows of the " +
      "CDF-enabled graft table at `path` between the two versions " +
      "(table columns + _change_type); distributed, never driver-" +
      "materialized.")

  def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 && args.forall(_.foldable) &&
        args.head.dataType == StringType &&
        args.tail.forall(a =>
          a.dataType == LongType || a.dataType == IntegerType),
      s"$name expects (path STRING, fromVersion INT, toVersion INT), " +
        "all foldable")
    val root = GraftTvf.resolveRoot(name,
      Option(args.head.eval(InternalRow.empty))
        .map(_.toString)
        .getOrElse(throw new IllegalArgumentException(
          s"$name: path must not be NULL")))
    def ver(e: Expression): Long =
      Option(e.eval(InternalRow.empty)) match {
        case Some(i: Integer) => i.longValue
        case Some(l: java.lang.Long) => l.longValue
        case _ => throw new IllegalArgumentException(
          s"$name: versions must be non-null integers")
      }
    val fromV = ver(args(1)); val toV = ver(args(2))
    val session = org.apache.spark.sql.SparkSession.active
    val keys = TxnTable.cdfKeysOf(session, root).getOrElse(
      throw new IllegalArgumentException(
        s"$name: table at $root has no change data feed — enable it " +
          "with TxnTable.enableCdf(root, keyCols) first"))
    TxnTable.cdf(session, root, fromV, toV, keys)
      .queryExecution.logical
  }
}
