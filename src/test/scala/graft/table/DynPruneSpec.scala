package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** DYNAMIC FILE PRUNING ([[GraftScan.filter]] beyond the COW `_file`
  * path): runtime IN-values on DATA columns — Spark's dynamic
  * partition pruning hands a broadcast join's distinct keys to the
  * scan — prune manifest files through per-file min/max stats, blooms,
  * and bucket ids. Pins the mechanism directly (scan API level) and
  * the Spark wiring (a real join plans runtime filters against the
  * graft scan).
  */
class DynPruneSpec extends AnyFunSuite {

  lazy val spark: SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private def freshRoot(): String =
    Files.createTempDirectory("graft_dynprune").toString

  private def inPredicate(col: String, vals: Seq[Long]): Predicate =
    new Predicate("IN",
      (Expressions.column(col) +:
        vals.map(v => Expressions.literal[java.lang.Long](v)
          : org.apache.spark.sql.connector.expressions.Expression)).toArray)

  private def plannedFiles(root: String, probe: Option[Predicate],
      schema: StructType): Int = {
    val scan = new GraftScanBuilder(root, schema).build()
      .asInstanceOf[GraftScan]
    probe.foreach(p => scan.filter(Array(p)))
    scan.planInputPartitions().length
  }

  test("runtime IN-values prune through CLUSTERED min/max stats: a " +
      "one-range key set plans one file of four") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      spark.range(0, 400).select(col("id").as("k"),
        (col("id") % 9).cast("double").as("v")), Seq("k"))
    TxnTable.cluster(spark, root, Seq("k"), 4, Seq("k"))
    val m = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    assert(m.files.size == 4)
    val schema = StructType.fromDDL(m.schemaDdl)
    val all = plannedFiles(root, None, schema)
    assert(all == 4)
    val pruned = plannedFiles(root,
      Some(inPredicate("k", Seq(5L, 6L, 7L))), schema)
    assert(pruned == 1, s"expected 1 planned file, got $pruned")
    // values spanning two disjoint ranges keep two files
    val two = plannedFiles(root,
      Some(inPredicate("k", Seq(5L, 395L))), schema)
    assert(two == 2)
  }

  test("runtime IN-values prune through BLOOMS when stats cannot " +
      "(interleaved keys), and false negatives are impossible") {
    val root = freshRoot()
    // 4 files, keys interleaved mod 4: every file's [min,max] straddles
    // every probe — only the bloom can skip
    val df = spark.range(0, 4000).select(col("id").as("k"),
      (col("id") % 13).cast("double").as("v"))
      .repartition(4, pmod(col("id"), lit(4)))
    TxnTable.create(spark, root, df, Seq("k"), bloomCols = Seq("k"))
    val m = TxnTable.readManifest(spark, root, 0L)
    // hash-of-residue collisions can merge classes: ≥2 files is enough
    assert(m.files.size >= 2)
    assert(m.files.forall(_.blooms.exists(_.contains("k"))))
    val schema = StructType.fromDDL(m.schemaDdl)
    val all = plannedFiles(root, None, schema)
    // keys 8 and 16 both live in the file of id%4==0 rows: the other
    // blooms reject them (modulo ~1e-3 false positives, which can
    // only ADD files, never lose rows)
    val pruned = plannedFiles(root,
      Some(inPredicate("k", Seq(8L, 16L))), schema)
    assert(pruned < all, s"bloom should prune ($pruned of $all files)")
    assert(pruned >= 1)
    // correctness: the pruned scan still returns the probe rows — run
    // through the full DSv2 read with the same IN as a row filter
    val rows = spark.read.format("graft.table.GraftTableProvider")
      .load(root).filter(col("k").isin(8L, 16L)).count()
    assert(rows == 2)
  }

  test("runtime IN-values prune through BUCKET ids on a bucketed " +
      "table — exact, not probabilistic") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      spark.range(0, 400).select(col("id").as("k"),
        (col("id") % 7).cast("double").as("v")),
      Seq.empty, // no stats: isolate the bucket path
      bucketBy = Some(TxnTable.BucketSpec("k", 8)))
    val m = TxnTable.readManifest(spark, root, 0L)
    val schema = StructType.fromDDL(m.schemaDdl)
    val all = plannedFiles(root, None, schema)
    val k = 17L
    val sameBucket = TxnTable.bucketOf(k, 8).get
    val expect = m.files.count(_.bucket.contains(sameBucket))
    val pruned = plannedFiles(root, Some(inPredicate("k", Seq(k))), schema)
    assert(pruned == expect && pruned < all)
  }

  test("Spark wires DPP to the graft scan: a broadcast join against " +
      "a filtered dim plans RUNTIME FILTERS and answers exactly") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      spark.range(0, 400).select(col("id").as("k"),
        (col("id") % 9).cast("double").as("v")), Seq("k"))
    TxnTable.cluster(spark, root, Seq("k"), 4, Seq("k"))
    val fact = spark.read.format("graft.table.GraftTableProvider")
      .load(root)
    val dim = spark.range(0, 400).select(col("id").as("dk"),
      (col("id") / 100).cast("int").as("grp"))
      .filter(col("grp") === 2) // keys 200..299: one cluster range
    val prevRatio = spark.conf.getOption(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio",
      "10.0") // tiny tables: make the benefit heuristic fire
    try {
      val joined = fact.join(broadcast(dim), col("k") === col("dk"))
      val got = joined.agg(count(lit(1)), sum("k")).head()
      assert(got.getLong(0) == 100)
      assert(got.getLong(1) == (200L to 299L).sum)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"expected a dynamic-pruning runtime filter on the scan:\n$plan")
    } finally prevRatio.fold(spark.conf.unset(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"))(
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", _))
  }

  test("runtime IN-values prune a MULTI-COLUMN partition layout by " +
      "component: the probe column's slot of the pv tuple filters, " +
      "the other component stays unconstrained") {
    val root = freshRoot()
    val df = spark.range(0, 120).select(col("id").as("k"),
      when(col("id") % 3 === 0, "A")
        .when(col("id") % 3 === 1, "B").otherwise("C").as("st"),
      (col("id") % 4).as("g"), // LONG component
      (col("id") % 7).cast("double").as("v"))
    TxnTable.create(spark, root, df, Seq("k"),
      partitionBy = Some(TxnTable.PartitionSpec("st", "identity",
        Some(Seq("st", "g")), Some(Seq("identity", "identity")))))
    val m = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    assert(m.files.size == 12) // 3 st × 4 g tuples
    val schema = StructType.fromDDL(m.schemaDdl)
    assert(plannedFiles(root, None, schema) == 12)
    // runtime IN on the g component keeps 3 files (st unconstrained)
    val g1 = plannedFiles(root,
      Some(inPredicate("g", Seq(1L))), schema)
    assert(g1 == 3, s"expected 3 planned files, got $g1")
    val g2 = plannedFiles(root,
      Some(inPredicate("g", Seq(1L, 3L))), schema)
    assert(g2 == 6)
  }

  test("unknown or partial IN lists are ignored — pruning never " +
      "guesses") {
    val root = freshRoot()
    TxnTable.create(spark, root,
      spark.range(0, 100).select(col("id").as("k"),
        (col("id") % 3).cast("double").as("v")), Seq("k"))
    TxnTable.cluster(spark, root, Seq("k"), 4, Seq("k"))
    val m = TxnTable.readManifest(spark, root,
      TxnTable.versions(spark, root).max)
    val schema = StructType.fromDDL(m.schemaDdl)
    // a column with no index anywhere: no pruning
    val noIdx = plannedFiles(root,
      Some(inPredicate("v", Seq(1L))), schema)
    assert(noIdx == 4)
  }
}
