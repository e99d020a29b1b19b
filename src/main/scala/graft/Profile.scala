package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id","text")
    d.count()
    val sh = udf((t: String) => graft.ops.Dedup.shingles(t, 3))
    val mh = udf((s: Array[Long], k: Int) => graft.ops.Dedup.minHashSignature(s, k))
    t("shingles only") { d.select(sh(col("text")).as("sh")).select(sum(size(col("sh")))).head().getLong(0) }
    t("shingles+minhash") { d.select(mh(sh(col("text")), lit(128)).as("sig")).select(sum(size(col("sig")))).head().getLong(0) }
    val sigs = d.select(col("doc_id"), sh(col("text")).as("sh")).withColumn("sig", mh(col("sh"), lit(128)))
    t("banded explode") {
      sigs.select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 31), b -> hash(b, slice(sig, b * 4 + 1, 4)))")).as(Seq("band","bucket"))).count()
    }
    t("full minHashPairs") {
      graft.ops.Dedup.minHashPairs(d, "doc_id", "text", threshold = 0.35).count()
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("neardup_embedding") {
      val planted = e.select(col("vec_id"), col("embedding"))
        .unionAll(e.select((col("vec_id")+100000).as("vec_id"), col("embedding")))
      graft.ops.Dedup.embeddingNearDup(planted, "vec_id", "embedding", 0.95, 16, 64).count()
    }
    t("doc_embeddings") {
      new graft.engine.InceptionEngine().embedDocumentsExploded(d).count()
    }
    spark.stop()
  }
}
