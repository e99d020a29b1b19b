package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic shard export — the final "publish the curated corpus as
  * N stable shards" step of a training-data pipeline (consumers address
  * shards independently; re-running the export reproduces the same
  * doc→shard mapping bit-for-bit).
  *
  * Scale shape: shard = xxhash64(id) mod N is computed row-local, ONE
  * hash-partitioned shuffle co-locates each shard, and the writer emits
  * a hive-partitioned `shard=K/` layout. `maxRecordsPerFile` caps file
  * size inside hot shards (the writer rolls files, no extra shuffle).
  * Content-hash assignment (not round-robin/monotonic id) keeps shards
  * balanced under any id distribution and stable under re-ordering.
  */
object ShardWriter {

  def shardCol(idCol: String, nShards: Int) =
    pmod(xxhash64(col(idCol)), lit(nShards.toLong)).cast("int")

  def writeShards(
      df: DataFrame,
      idCol: String,
      path: String,
      nShards: Int,
      maxRecordsPerFile: Long = 0L,
      compression: String = "zstd"): Unit = {
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column — it would be silently " +
        "replaced by the hash-derived shard; rename it first")
    val sharded = df.withColumn("shard", shardCol(idCol, nShards))
    val writer = sharded
      .repartition(nShards, col("shard"))
      .write.mode("overwrite")
      // export shards are write-once-read-many: zstd's better ratio
      // beats snappy's faster encode at 100 TB published-corpus scale
      .option("compression", compression)
    val w =
      if (maxRecordsPerFile > 0)
        writer.option("maxRecordsPerFile", maxRecordsPerFile)
      else writer
    w.partitionBy("shard").parquet(path)
  }
}
