package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_history('<table root>')` — the table-format's commit history
  * as a SQL TABLE FUNCTION (the DESCRIBE-HISTORY surface, reachable
  * from pure SQL via [[graft.GraftExtensions]]):
  *
  * {{{
  *   SELECT version, op, n_rows FROM graft_history('/data/events')
  * }}}
  *
  * Columns: `version, op, timestamp_ms, n_files, n_rows` — the
  * [[TxnTable.history]] frame. Resolution reads the manifests ONLY
  * (O(commits) driver-side metadata, zero data files — the admin-
  * surface pricing history() already documents) and materializes a
  * LocalRelation at analysis time, so the plan above it is ordinary
  * Catalyst. The path must be a foldable string (a literal or constant
  * expression): history is resolved during analysis, a per-row path
  * has no meaning.
  *
  * TRUST MODEL: by default the path argument is driver-trusted exactly
  * like `spark.read.format("graft").load(path)` — whoever can run SQL
  * can already read any path the driver can. Deployments that expose
  * SQL to less-trusted users can pin the TVF under an allowlist root
  * with `spark.graft.sql.history.root=<dir>`: the resolved path must
  * then sit under that directory (after `..`/`.` normalization), and
  * anything else is refused at analysis time — the same containment
  * contract as [[GraftCatalog]]'s warehouse-rooted identifiers.
  *
  * COST MODEL: resolution reads one manifest per commit on the driver.
  * Re-analysis of the same plan (Spark analyzes some queries more than
  * once) hits a small bounded cache keyed by (root, latest version,
  * commit count), so a stable table costs ONE manifest sweep per new
  * commit, not per analysis pass. The Hadoop conf is the SESSION conf
  * (`spark.hadoop.*` respected — credentials reach object stores).
  */
object GraftHistoryFunction {
  val name = "graft_history"

  val info = new ExpressionInfo(getClass.getCanonicalName, name,
    "graft_history(pathOrIdent) - commit history of the graft table " +
      "at a path or catalog identifier (version, op, timestamp_ms, " +
      "n_files, n_rows); metadata-only.")

  private val schema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("timestamp_ms", LongType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))

  def builder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1 && args.head.foldable &&
        args.head.dataType == StringType,
      s"$name expects exactly one foldable STRING argument " +
        "(the table root path)")
    val root = GraftTvf.resolveRoot(name,
      Option(args.head.eval(InternalRow.empty))
        .map(_.toString)
        .getOrElse(throw new IllegalArgumentException(
          s"$name: path must not be NULL")))
    val session = org.apache.spark.sql.SparkSession.active
    val conf = session.sessionState.newHadoopConf()
    val versions = GraftTableProvider.listVersions(conf, root)
    val cacheKey = (root, versions.lastOption.getOrElse(-1L),
      versions.size)
    val rows = cache.synchronized {
      cache.getOrElseUpdate(cacheKey, {
        if (cache.size >= 64) cache.clear() // bounded, metadata-sized
        versions.map { v =>
          val m = GraftTableProvider.manifestFor(conf, root, Some(v))
          InternalRow(m.version, UTF8String.fromString(m.op),
            m.timestampMs, m.files.size.toLong, m.files.map(_.rows).sum)
        }
      })
    }
    LocalRelation(
      schema.fields.toIndexedSeq.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)()),
      rows.toIndexedSeq)
  }

  private val cache =
    scala.collection.mutable.Map.empty[(String, Long, Int), Seq[InternalRow]]
}
