package graft.table

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** [[TxnTable]] as a Spark SQL CATALOG — the seam that makes the
  * table format addressable from plain SQL, including Spark 4's
  * standard time-travel syntax:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.g", "graft.table.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.g.warehouse", "/data/tables")
  *   spark.sql("SELECT * FROM g.events VERSION AS OF 3")
  *   spark.sql("SELECT * FROM g.events TIMESTAMP AS OF '2026-01-01'")
  * }}}
  *
  * `cat.ns1.ns2.t` resolves to `<warehouse>/ns1/ns2/t`; a table is any
  * directory with a graft `_log`. The travel overloads resolve the
  * version at `loadTable` time — O(manifest) metadata, no file listing
  * — and hand [[GraftTable]] a pinned version so schema AND file set
  * both come from the pinned manifest (`VERSION AS OF` on a
  * pre-schema-evolution version serves the OLD schema, like Delta).
  *
  * Reads, ALTER TABLE RENAME/DROP/ADD COLUMN and constraints
  * (column-mapping evolution, [[TxnTable.renameColumn]]/
  * [[TxnTable.dropColumn]]), CREATE TABLE / CTAS (including the
  * bucketed layout via `PARTITIONED BY (bucket(n, col))`), and DROP
  * TABLE are the catalog surface; RENAME TABLE stays refused — a
  * table's identity is its directory.
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catName: String = _
  private var warehouse: String = _
  private def conf = new Configuration()

  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"graft catalog '$name' requires spark.sql.catalog.$name.warehouse")
  }

  override def name(): String = catName

  // advertise CHECK-constraint DDL (Spark gates ALTER TABLE
  // ADD/DROP CONSTRAINT on this catalog capability)
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  private def rootFor(ident: Identifier): String = {
    val segs = ident.namespace() :+ ident.name()
    // identifier segments become filesystem path segments — refuse
    // anything that could escape the warehouse root (`..`), alias the
    // root (`.`, empty), or smuggle separators/schemes through a
    // quoted identifier (path traversal via SQL)
    segs.foreach { s =>
      require(s.nonEmpty && s != "." && s != ".." &&
          !s.contains("/") && !s.contains("\\") && !s.contains(":"),
        s"graft catalog: illegal identifier segment '$s' — segments " +
          "must not be empty, '.', '..', or contain path separators")
    }
    segs.mkString(warehouse.stripSuffix("/") + "/", "/", "")
  }

  private def schemaOf(m: TxnTable.Manifest): StructType =
    // all-nullable for the same reason as the provider: evolved columns
    // are absent (NULL) in pre-evolution files
    StructType(StructType.fromDDL(m.schemaDdl)
      .fields.map(_.copy(nullable = true)))

  private def load(ident: Identifier, version: Option[Long]): Table = {
    val root = rootFor(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    // bad VERSION AS OF on an existing table stays loud (manifestFor's
    // own range error), never a NoSuchTable mask
    val m = GraftTableProvider.manifestFor(conf, root, version)
    new GraftTable(root, schemaOf(m), pinned = version)
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `SELECT ... FROM cat.t VERSION AS OF v` */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"VERSION AS OF: integer version expected, got '$version'"))))

  /** `SELECT ... FROM cat.t TIMESTAMP AS OF ts` — Spark hands the
    * resolved timestamp in MICROseconds since the epoch.
    */
  override def loadTable(ident: Identifier, timestampUs: Long): Table = {
    val root = rootFor(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val v = GraftTableProvider.versionAtMs(conf, root,
      Math.floorDiv(timestampUs, 1000L))
    load(ident, Some(v))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val log = new Path(rootFor(ident), "_log")
    log.getFileSystem(conf).exists(log)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path((warehouse.stripSuffix("/") +: namespace)
      .mkString("/"))
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Array.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory &&
        fs.exists(new Path(s.getPath, "_log")))
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .toArray
  }

  override def alterTable(
      ident: Identifier, changes: TableChange*): Table = {
    val root = rootFor(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val spark = org.apache.spark.sql.SparkSession.active
    changes.foreach {
      case rc: TableChange.RenameColumn =>
        require(rc.fieldNames().length == 1,
          "graft tables have no nested columns to rename")
        TxnTable.renameColumn(spark, root, rc.fieldNames()(0),
          rc.newName())
      case dc: TableChange.DeleteColumn =>
        require(dc.fieldNames().length == 1,
          "graft tables have no nested columns to drop")
        TxnTable.dropColumn(spark, root, dc.fieldNames()(0))
      case ac: TableChange.AddColumn =>
        require(ac.fieldNames().length == 1,
          "graft tables have no nested columns to add into")
        // columns are nullable by construction (pre-existing files
        // serve NULL); a NOT NULL add would be a lie about old rows
        require(ac.isNullable,
          "graft catalog: ADD COLUMN must be nullable — existing " +
            "rows have no value for it")
        require(ac.position() == null,
          "graft catalog: FIRST/AFTER column positions are not " +
            "supported — new columns append")
        TxnTable.addColumn(spark, root, ac.fieldNames()(0),
          ac.dataType())
      // DSv2 constraints (the Spark 4 constraint SPIP surface):
      // CHECK lands in the manifest's constraint map, enforced by
      // every write path; PRIMARY KEY / UNIQUE / FOREIGN KEY are
      // refused — this format has no index to enforce them with, and
      // an unenforced "informational" key would be a silent lie
      case ac: TableChange.AddConstraint =>
        ac.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            TxnTable.addConstraint(spark, root, c.name(),
              Option(c.predicateSql()).getOrElse(sys.error(
                "graft catalog: CHECK constraint needs a SQL predicate")))
          case other =>
            throw new UnsupportedOperationException(
              s"graft catalog: only CHECK constraints are supported, " +
                s"got ${other.toDDL}")
        }
      case dc: TableChange.DropConstraint =>
        TxnTable.dropConstraint(spark, root, dc.name(),
          ifExists = dc.ifExists())
      case other =>
        throw new UnsupportedOperationException(
          s"graft catalog: unsupported table change $other — " +
            "type changes are refused by design")
    }
    loadTable(ident)
  }

  /** FunctionCatalog half: exactly one function, the bucketed-layout
    * `bucket(n, col)` hash ([[GraftBucketFunction]]). Spark's
    * storage-partitioned join loads it here to resolve the
    * `KeyGroupedPartitioning` transform a bucketed scan reports —
    * without this, the reported layout is silently discarded and every
    * join shuffles.
    */
  override def listFunctions(
      namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      Array(Identifier.of(namespace, "bucket"))
    else Array.empty

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace().isEmpty && ident.name() == "bucket")
      GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  override def functionExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && ident.name() == "bucket"

  /** `CREATE TABLE cat.t (cols…) [PARTITIONED BY (bucket(n, col) |
    * col | days(ts) | days(ts), bucket(n, col), …)] [TBLPROPERTIES
    * ('statsCols'='a,b', 'bloomCols'='c')]` — and the non-atomic half
    * of CTAS (Spark creates, then INSERTs through the table's writer).
    * The format has two physical layout roles that COMPOSE:
    * `bucket(n, col)` ([[TxnTable.BucketSpec]] — the
    * storage-partitioned-join layout) and identity/`days` partitioning
    * ([[TxnTable.PartitionSpec]] — per-file partition values,
    * partition-pruned scans, O(metadata) `DELETE WHERE day = …`
    * drops); a spec may carry at most one bucket transform plus any
    * identity/days components, and every data file then holds exactly
    * one (partition tuple, bucket id) pair. Other transforms are
    * refused loudly rather than silently recorded-but-unenforced.
    * Table property keys `statsCols`/`bloomCols` opt columns into
    * per-file min/max stats and blooms for every future commit.
    */
  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = {
    val root = rootFor(ident)
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val spark = org.apache.spark.sql.SparkSession.active
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    // SQL identifiers resolve case-insensitively: canonicalize to the
    // schema's spelling rather than failing on bucket(4, K)
    def canonicalCol(raw: String, what: String): String = schema.fields
      .find(_.name.equalsIgnoreCase(raw))
      .getOrElse(throw new IllegalArgumentException(
        s"graft catalog: $what column $raw is not in the schema"))
      .name
    def singleCol(
        t: org.apache.spark.sql.connector.expressions.Transform,
        what: String): String = {
      val cols = t.arguments().collect {
        case r: NamedReference if r.fieldNames().length == 1 =>
          r.fieldNames()(0)
      }
      require(cols.length == 1 && t.arguments().length == cols.length,
        s"graft catalog: $what transform takes a single top-level " +
          "column")
      canonicalCol(cols(0), what)
    }
    var bucket: Option[TxnTable.BucketSpec] = None
    var part: Option[TxnTable.PartitionSpec] = None
    partitions.toSeq match {
      case Seq() => ()
      // `PARTITIONED BY ([bucket(n, col[, col…])] [, col | days(ts),
      // …])` — at most one bucket transform ([[TxnTable.BucketSpec]],
      // the storage-partitioned-join layout) freely COMPOSED with
      // identity/days components ([[TxnTable.PartitionSpec]]: per-file
      // partition-value tuples, component-wise pruning, O(metadata)
      // drops). `PARTITIONED BY (days(ts), bucket(4, id))` is the
      // canonical 100-TB fact layout: pruning bounds the scan to the
      // probed days, the bucket layout joins zero-exchange inside them.
      case ts if ts.nonEmpty && ts.forall(t =>
            Seq("bucket", "identity", "days").contains(t.name())) &&
          ts.count(_.name() == "bucket") <= 1 =>
        ts.find(_.name() == "bucket").foreach { t =>
          val ns = t.arguments().collect {
            case l: Literal[_] if l.value().isInstanceOf[Number] =>
              l.value().asInstanceOf[Number].intValue()
          }
          val cols = t.arguments().collect {
            case r: NamedReference if r.fieldNames().length == 1 =>
              r.fieldNames()(0)
          }
          require(ns.length == 1 && cols.nonEmpty &&
              ns.length + cols.length == t.arguments().length,
            "graft catalog: bucket transform must be " +
              "bucket(n, col[, col…]) with top-level columns")
          val canon = cols.toSeq.map(canonicalCol(_, "bucket"))
          bucket = Some(TxnTable.BucketSpec(canon.head, ns(0),
            cols = if (canon.length > 1) Some(canon) else None))
        }
        val pcs = ts.filter(t =>
          t.name() == "identity" || t.name() == "days")
        if (pcs.nonEmpty) {
          val comps = pcs.map { t =>
            TxnTable.PartitionSpec(
              singleCol(t, s"${t.name()} partition"), t.name())
          }
          part = Some(
            if (comps.length == 1) comps.head
            else comps.head.copy(
              cols = Some(comps.map(_.col)),
              transforms = Some(comps.map(_.transform))))
        }
      case other =>
        throw new UnsupportedOperationException(
          "graft catalog: supported partitioning is at most one " +
            "bucket(n, col[, col…]) composed with any identity/" +
            "days(col) transforms — got " + other.mkString(", "))
    }
    def split(k: String): Seq[String] =
      Option(properties.get(k)).toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    TxnTable.create(spark, root, empty,
      statsCols = split("statsCols"),
      bloomCols = split("bloomCols"),
      bucketBy = bucket,
      partitionBy = part)
    // persist the stats opt-in so SQL-driven writes (INSERT INTO, the
    // CTAS data write) inherit it — bloomCols is already manifest-
    // carried, statsCols needs the props sidecar
    if (split("statsCols").nonEmpty)
      TxnTable.writeTableProps(spark, root,
        Map("statsCols" -> split("statsCols").mkString(",")))
    loadTable(ident)
  }

  /** `DROP TABLE cat.t` — removes the table directory (manifests AND
    * data; this format's files live under the table root by layout,
    * clone-shared absolute paths excepted, which stay untouched).
    * Also what Spark's non-atomic CTAS calls to clean up a failed
    * write. Returns false when the table doesn't exist, per contract.
    */
  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val p = new Path(rootFor(ident))
    p.getFileSystem(conf).delete(p, true)
  }

  override def renameTable(
      oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog is a read/evolve surface — a table's identity is " +
        "its directory; move it on the filesystem")
}
