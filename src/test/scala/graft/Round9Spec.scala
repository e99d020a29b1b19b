package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{HeavyHitters, Hits, LabelPropagation}

/** Round-9 specs: advice-fix regressions (Hits empty-graph guard,
  * HeavyHitters partition clamp, TxnTable NULL-key CDC classification)
  * and invariants of the new statistical / graph operators.
  */
class Round9Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("Hits.scores fails fast with a clear message on an empty graph") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Hits.scores(empty, "src", "dst", iters = 1)
    }
    assert(ex.getMessage.contains("empty graph"))
  }

  test("HeavyHitters.topK clamps (not throws) on high partition counts") {
    import spark.implicits._
    // capacity 2^20 × 128 partitions = 2^27 candidates > 2^26 bound:
    // pre-fix this threw; now the sketch pass coalesces and recounts
    // exactly.
    val words = (1 to 2000).map(i => s"w${i % 7}").toDF("w")
      .repartition(128)
    val top = HeavyHitters.topK(words, "w", k = 3, capacity = 1 << 20)
      .collect()
    assert(top.length == 3)
    // exact recount: w1..w5 appear 286 times, w0/w6 285 (2000 = 7×285+5)
    assert(top.map(_.getLong(1)).forall(_ == 286L))
    assert(top.map(_.getString(0)).toSeq == Seq("w1", "w2", "w3"))
  }

  test("TxnTable cdc/cdf classify NULL-keyed rows as update, not insert") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_cdc_null").toString
    val v0 = Seq((Some(1L), "a"), (None, "x"))
      .toDF("k", "v")
    val v1 = Seq((Some(1L), "a"), (None, "y"))
      .toDF("k", "v")
    graft.table.TxnTable.create(spark, root, v0, Seq("k"))
    graft.table.TxnTable.overwrite(spark, root, v1, Seq("k"))
    val cdc = graft.table.TxnTable
      .cdc(spark, root, 0L, 1L, Seq("k")).collect()
    // the NULL-keyed row changed x→y: exactly one change, an update
    assert(cdc.length == 1)
    assert(cdc.head.getAs[String]("_change_type") == "update")
    assert(cdc.head.isNullAt(cdc.head.fieldIndex("k")))
    val cdf = graft.table.TxnTable
      .cdf(spark, root, 0L, 1L, Seq("k")).collect()
    assert(cdf.map(_.getAs[String]("_change_type")).sorted.toSeq ==
      Seq("update_postimage", "update_preimage"))
  }

  test("LabelPropagation merges a clique to one label, keeps components apart") {
    import spark.implicits._
    // two disjoint triangles: {1,2,3} and {10,11,12}
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val lbl = LabelPropagation.labels(e, "src", "dst", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(lbl.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
    assert(Set(lbl(1L), lbl(2L), lbl(3L)).size == 1)
    assert(Set(lbl(10L), lbl(11L), lbl(12L)).size == 1)
    assert(lbl(1L) != lbl(10L))
    // min-label tie-break on a symmetric triangle settles on the min id
    assert(lbl(1L) == 1L && lbl(10L) == 10L)
  }

  test("LabelPropagation rejects an empty / self-loop-only graph") {
    import spark.implicits._
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      LabelPropagation.labels(loops, "src", "dst", iters = 1)
    }
    assert(ex.getMessage.contains("empty graph"))
  }

  test("welch/anova moment formulas agree with direct computation") {
    // tiny closed-form check: a={1,2,3}, b={2,4,6,8}
    val a = Seq(1.0, 2.0, 3.0)
    val b = Seq(2.0, 4.0, 6.0, 8.0)
    def mv(x: Seq[Double]) = {
      val m = x.sum / x.size
      (m, x.map(v => (v - m) * (v - m)).sum / (x.size - 1))
    }
    val (ma, va) = mv(a); val (mb, vb) = mv(b)
    val se2 = va / a.size + vb / b.size
    val tExp = (ma - mb) / math.sqrt(se2)
    import spark.implicits._
    val df = (a.map(("a", _)) ++ b.map(("b", _)))
      .toDF("event_type", "value")
    df.createOrReplaceTempView("events_w9_v")
    val m = spark.sql(
      """SELECT event_type, COUNT(*) AS n,
           SUM(CAST(value AS DECIMAL(18,6))) AS sx,
           SUM(CAST(value AS DECIMAL(18,6))
             * CAST(value AS DECIMAL(18,6))) AS sxx
         FROM events_w9_v GROUP BY 1""")
    val aM = m.filter(col("event_type") === "a")
      .select(col("n").as("na"), col("sx").as("sxa"), col("sxx").as("sxxa"))
    val bM = m.filter(col("event_type") === "b")
      .select(col("n").as("nb"), col("sx").as("sxb"), col("sxx").as("sxxb"))
    val got = aM.crossJoin(bM)
      .select(round(expr(SparkEntry.welchTSql), 6).as("t"))
      .head().getDouble(0)
    assert(math.abs(got - tExp) < 1e-6)
  }

  test("haversine NN picks each customer's minimum-distance supplier") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_haversine_nn")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    // re-derive the full distance table and check the argmin per row
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val sup = spark.read.parquet(s"$dir/supplier.parquet")
    val full = c.select(col("c_custkey"), col("c_nationkey").as("nation"),
        (expr("CAST((c_custkey * 7919) % 17000 AS DOUBLE)") / 100.0 - 85.0)
          .as("lat_c"),
        (expr("CAST((c_custkey * 104729) % 36000 AS DOUBLE)") / 100.0
          - 180.0).as("lon_c"))
      .join(sup.select(col("s_suppkey"), col("s_nationkey").as("nation"),
        (expr("CAST((s_suppkey * 7919) % 17000 AS DOUBLE)") / 100.0 - 85.0)
          .as("lat_s"),
        (expr("CAST((s_suppkey * 104729) % 36000 AS DOUBLE)") / 100.0
          - 180.0).as("lon_s")), "nation")
      .withColumn("d", expr(
        """round(2.0 * 6371.0 * asin(sqrt(
             sin(radians(lat_s - lat_c) / 2.0)
               * sin(radians(lat_s - lat_c) / 2.0)
             + cos(radians(lat_c)) * cos(radians(lat_s))
               * sin(radians(lon_s - lon_c) / 2.0)
               * sin(radians(lon_s - lon_c) / 2.0))), 3)"""))
      .groupBy("c_custkey").agg(min(col("d")).as("dmin"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("dist_km"))
        == full(r.getLong(r.fieldIndex("c_custkey"))))
    }
  }
}
