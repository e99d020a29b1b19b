package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: per-key (count, sum, min, max)
  * statistics kept in a BUCKET-PARTITIONED parquet state table and
  * merged with each arriving batch in O(batch) work — the corpus-stats
  * twin of the incremental MinHash/IVF indexes (Dedup.appendToMinhashIndex,
  * Similarity.appendToIvfIndex): at 100 TB you cannot re-aggregate the
  * corpus to admit a batch, you merge mergeable state.
  *
  * Layout: `statePath/bucket=N/…` with `bucket = pmod(xxhash64(key), n)`
  * (seed-stable across runs, so a key's bucket never moves). An update
  * aggregates the batch (one keyed shuffle over BATCH rows only), reads
  * back ONLY the buckets the batch touches (partition-pruned scan of
  * O(touched-keys) state rows), re-merges with the classic mergeable
  * forms (count+count, sum+sum, min of mins, max of maxes), and swaps
  * just those bucket directories in. Untouched buckets are neither read
  * nor rewritten — the spec pins this by file mtimes.
  *
  * The swap stages merged buckets to a `.staging` dir, then per-bucket
  * delete+rename (each rename atomic in HDFS/posix semantics). A crash
  * mid-swap can leave a PREFIX of the touched buckets updated; replaying
  * the same batch then double-counts the already-swapped ones — gate
  * updates behind a committed-batch high-water mark exactly like
  * [[graft.streaming.DeltaLog.appendSink]] when batches can replay.
  * (The parameter-sidecar pattern of the ANN indexes applies here too:
  * nBuckets is written once and re-read, never guessed.)
  */
object IncrementalAgg {

  private val ParamsFile = "_params.json"

  /** Create or merge the state at `statePath` with one batch.
    * State schema: key STRING, n_rows LONG, sum_val LONG, min_val LONG,
    * max_val LONG, bucket INT (partition column).
    */
  def update(
      batch: DataFrame,
      keyCol: String,
      valCol: String,
      statePath: String,
      nBuckets: Int = 16
  ): Unit = {
    val s = batch.sparkSession
    val root = new Path(statePath)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)

    val buckets =
      if (fs.exists(new Path(root, ParamsFile))) {
        val in = fs.open(new Path(root, ParamsFile))
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        """"nBuckets"\s*:\s*(\d+)""".r.findFirstMatchIn(txt) match {
          case Some(m) => m.group(1).toInt
          case None => sys.error(s"corrupt $ParamsFile at $statePath")
        }
      } else nBuckets

    val batchAgg = batch
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col(valCol).cast("long")).as("sum_val"),
        min(col(valCol).cast("long")).as("min_val"),
        max(col(valCol).cast("long")).as("max_val"))
      .withColumn("bucket",
        pmod(xxhash64(col("key")), lit(buckets.toLong)).cast("int"))

    if (!fs.exists(root)) {
      batchAgg.write.partitionBy("bucket").parquet(statePath)
      writeParams(fs, root, buckets)
      return
    }

    // buckets this batch touches — at most `buckets` ints, never data
    val touched = batchAgg.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    // partition-pruned read of just the touched buckets' state
    val existing = s.read.parquet(statePath)
      .filter(col("bucket").isin(touched.map(Integer.valueOf): _*))
    val merged = existing.unionByName(batchAgg)
      .groupBy("key")
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("sum_val")).as("sum_val"),
        min(col("min_val")).as("min_val"),
        max(col("max_val")).as("max_val"))
      .withColumn("bucket",
        pmod(xxhash64(col("key")), lit(buckets.toLong)).cast("int"))

    // stage the merged buckets, then swap each in (read path != write
    // path, so the merge job never overwrites its own input)
    val staging = new Path(root.getParent,
      root.getName + ".staging")
    fs.delete(staging, true)
    merged.write.partitionBy("bucket").parquet(staging.toString)
    for (b <- touched) {
      val dst = new Path(root, s"bucket=$b")
      val src = new Path(staging, s"bucket=$b")
      fs.delete(dst, true)
      if (fs.exists(src)) fs.rename(src, dst)
    }
    fs.delete(staging, true)
  }

  /** The current per-key statistics (bucket column dropped). */
  def read(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
      .select("key", "n_rows", "sum_val", "min_val", "max_val")

  private def writeParams(
      fs: org.apache.hadoop.fs.FileSystem, root: Path, n: Int): Unit = {
    val out = fs.create(new Path(root, ParamsFile), true)
    try out.write(s"""{"nBuckets":$n}""".getBytes("UTF-8"))
    finally out.close()
  }
}
