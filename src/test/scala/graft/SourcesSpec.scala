package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink breadth (SURVEY.md §2.3 scans row): the engine's operators
  * are source-agnostic DataFrame transforms — prove parquet/JSON/CSV all
  * feed the same pipeline with identical results.
  */
class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("JSON sink/source round-trips documents; same clean_text results as parquet") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir).select("doc_id", "text")
    val engine = new graft.engine.InceptionEngine()
    def cleaned(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), engine.cleanText(col("text")).as("c"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cleaned(back) == cleaned(docs))
  }

  test("CSV sink/source round-trips a projection (escaping-safe columns)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
      .select(col("doc_id").cast("long"), col("n_chars").cast("int"))
    assert(back.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      docs.collect().map(r => (r.getLong(0), r.getInt(1))).toSet)
  }

  test("ORC sink/source round-trips documents exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      docs.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
    // ORC scans support predicate pushdown too
    val plan = back.filter(col("doc_id") === 7L).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"), plan)
  }

  test("binaryFile source: media-lake ingest feeds the real multimodal decoders") {
    import graft.ops.Multimodal
    // a directory of real PNG files — the media-lake layout binaryFile
    // was built for: (path, modificationTime, length, content)
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    (0 until 6).foreach { i =>
      val png = Multimodal.encodePng(8 + i, 8, (_, _) => (i * 40, 10, 20))
      java.nio.file.Files.write(dir.resolve(f"img_$i%03d.png"), png)
    }
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .load(dir.toString)
    assert(files.count() == 6)
    // decode the ingested bytes with the real codec path: header width
    // and solid-color channel sums match the on-disk construction
    val decoded = Multimodal.imageStats(
        files.select(
          regexp_extract(col("path"), "img_(\\d+)\\.png", 1)
            .cast("int").as("i"),
          col("content").as("media")),
        "media")
      .select(col("i"), col("istats.format").as("format"),
        col("istats.width").as("width"), col("istats.sum_r").as("sum_r"))
      .collect().map(r => r.getInt(0) ->
        (r.getString(1), r.getInt(2), r.getLong(3))).toMap
    (0 until 6).foreach { i =>
      assert(decoded(i) == (("png", 8 + i, (i * 40).toLong * (8 + i) * 8)),
        s"img $i decoded ${decoded(i)}")
    }
    // binary content never shuffles: decode happens in the scan stage
    val plan = Multimodal.imageStats(
      files.select(col("content").as("media")), "media")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"binary ingest shuffles bytes:\n$plan")
  }

  test("text source: whole-line ingest feeds the clean pipeline (text/plain body analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_text")
    java.nio.file.Files.writeString(dir.resolve("body.txt"),
      "First line of a plain-text body.\nSecond line, still the same doc.\n")
    val lines = spark.read.text(dir.toString) // one row per line, col "value"
    assert(lines.count() == 2)
    val engine = new graft.engine.InceptionEngine()
    val cleaned = lines
      .select(engine.cleanText(col("value")).as("c"))
      .collect().map(_.getString(0))
    assert(cleaned.forall(_.nonEmpty))
  }

  test("corrupt JSON records: PERMISSIVE quarantines bad rows, FAILFAST raises") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_badjson")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"doc_id": 1, "text": "good row"}
        |{"doc_id": 2 "text": "missing comma"}
        |{"doc_id": 3, "text": "another good row"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (default): bad line lands in _corrupt_record, good rows parse
    val permissive = spark.read.schema(schema)
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString).cache()
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(permissive.filter(col("_corrupt_record").isNull)
      .select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 3L)))
    // FAILFAST: the same file is a hard error (ingest gate for pipelines
    // that must not silently drop data)
    val failed = intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.dropRight(1)))
        .option("mode", "FAILFAST").json(dir.toString).collect()
    }
    val chain = Iterator.iterate(failed: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.toLowerCase.contains("malformed"), chain)
  }

  test("SQL DDL surface: CTAS, INSERT INTO ... VALUES/SELECT, catalog round-trip, DROP") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ddl_wh")
    spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
    spark.sql(
      s"""CREATE TABLE graft_ddl_t USING parquet
          LOCATION '${wh.resolve("t")}'
          AS SELECT doc_id, length(text) AS n
             FROM parquet.`$sf/documents.parquet` WHERE doc_id < 10""")
    try {
      assert(spark.table("graft_ddl_t").count() == 10)
      spark.sql("INSERT INTO graft_ddl_t VALUES (9999, 42)")
      spark.sql(
        s"""INSERT INTO graft_ddl_t
            SELECT doc_id, length(text) AS n
            FROM parquet.`$sf/documents.parquet`
            WHERE doc_id >= 10 AND doc_id < 15""")
      val t = spark.table("graft_ddl_t")
      assert(t.count() == 16)
      assert(t.filter(col("doc_id") === 9999).select("n")
        .head().getInt(0) == 42)
      // catalog sees the table and its schema
      val cols = spark.sql("DESCRIBE graft_ddl_t")
        .select("col_name").collect().map(_.getString(0)).toSet
      assert(cols.contains("doc_id") && cols.contains("n"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
    assert(!spark.catalog.tableExists("graft_ddl_t"))
  }

  test("mergeSchema ingest: a later batch adds a column; unified read null-backfills the old batch") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
    val ev = spark.read.parquet(s"$sf/events.parquet")
    ev.filter(col("event_id") % 2 === 0)
      .select("event_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/batch=2")
    val unified = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(unified.columns.toSet == Set("event_id", "event_type", "value", "batch"))
    val n = ev.count()
    assert(unified.count() == n)
    // old-generation rows surface the new column as NULL, not an error
    assert(unified.filter(col("batch") === 1 && col("value").isNotNull)
      .count() == 0)
    assert(unified.filter(col("value").isNotNull).count() == n / 2)
  }

  test("shard export: deterministic content-hash shards, balanced, file-size capped, lossless") {
    import graft.ops.ShardWriter
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    ShardWriter.writeShards(docs, "doc_id", s"$dir/a", nShards = 8,
      maxRecordsPerFile = 32)
    val back = spark.read.parquet(s"$dir/a")
    assert(back.count() == docs.count(), "shard export lost rows")
    val sizes = back.groupBy("shard").count()
      .collect().map(r => r.getLong(1))
    assert(sizes.length == 8, s"expected 8 shards, got ${sizes.length}")
    // content-hash assignment keeps shards balanced (no empty/hot shard)
    assert(sizes.min > 0 && sizes.max <= sizes.min * 4,
      s"unbalanced shards: ${sizes.toSeq.sorted}")
    // maxRecordsPerFile rolls files inside shards
    val aFiles = new java.io.File(s"$dir/a").listFiles
      .filter(_.getName.startsWith("shard=")).flatMap(_.listFiles)
      .count(_.getName.endsWith(".parquet"))
    assert(aFiles >= 16, s"expected rolled files, got $aFiles")
    // re-export is bit-for-bit deterministic in doc→shard assignment
    ShardWriter.writeShards(docs, "doc_id", s"$dir/b", nShards = 8)
    val a = back.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = spark.read.parquet(s"$dir/b").select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "shard assignment not reproducible across exports")
  }

  test("parameterized SQL: named parameter markers bind without string splicing") {
    // the injection-safe front-end surface: values bind as literals
    val r = spark.sql(
      "SELECT :base + 1 AS v, length(:s) AS n",
      Map("base" -> 41, "s" -> "hello")).head()
    assert(r.getInt(0) == 42 && r.getInt(1) == 5)
    // positional markers too
    val p = spark.sql("SELECT ? * ? AS v", Array(6, 7)).head()
    assert(p.getInt(0) == 42)
  }

  test("approx_top_k sketch returns the exact heavy hitters on a skewed column") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.createOrReplaceTempView("docs_topk_v")
    val approx = spark.sql(
      "SELECT approx_top_k(source, 3) AS t FROM docs_topk_v")
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    val exact = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // small cardinality → the sketch holds every item exactly; returned
    // counts must be TRUE counts, and (ties make membership ambiguous)
    // every returned count must be at least the 3rd-largest true count
    val cutoff = exact.values.toSeq.sorted(Ordering[Long].reverse)
      .take(3).last
    assert(approx.size == 3)
    approx.foreach { case (item, cnt) =>
      assert(exact(item) == cnt, s"sketch count wrong for $item")
      assert(cnt >= cutoff, s"$item count $cnt below top-3 cutoff $cutoff")
    }
  }

  test("SQL scripting: BEGIN/DECLARE/WHILE compound executes and returns the final SELECT") {
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try {
      val out = spark.sql(
        """BEGIN
             DECLARE total INT DEFAULT 0;
             DECLARE i INT DEFAULT 1;
             WHILE i <= 5 DO
               SET total = total + i;
               SET i = i + 1;
             END WHILE;
             SELECT total AS s;
           END""").head()
      assert(out.getInt(0) == 15)
    } finally spark.conf.unset("spark.sql.scripting.enabled")
  }

  test("XML sink/source round-trips documents (Spark 4 built-in XML datasource)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_xml").toString
    docs.write.mode("overwrite").option("rowTag", "doc").xml(dir)
    val back = spark.read.option("rowTag", "doc").xml(dir)
      .select(col("doc_id").cast("long"), col("lang"),
        col("n_chars").cast("long"))
    assert(back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet ==
      docs.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSet)
  }
}
