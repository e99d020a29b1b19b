package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the operational chore every long-running
  * 100 TB ingest pipeline needs: streaming/micro-batch sinks leave
  * thousands of KB-sized parquet files per partition, and scan throughput
  * collapses under per-file open/footer costs.
  *
  * Strategy: size the output file count from the actual input bytes
  * (`targetBytes` per file, default 128 MB — one HDFS/object-store block),
  * then rewrite with a round-robin `repartition(n)`. Round-robin (not
  * coalesce) so output files are uniformly sized even when input files
  * are skewed; `coalesce` would glue adjacent small files into unevenly
  * sized outputs and can collapse upstream parallelism.
  */
object Compaction {

  /** Bytes under `path` as seen by the filesystem (recursive). */
  def inputBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Number of target files for `bytes` input at `targetBytes` per file. */
  def targetFileCount(bytes: Long, targetBytes: Long): Int =
    math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)

  /** Rewrite `inPath` (parquet) into `outPath` with ~`targetBytes` files.
    * Returns the number of files written. Parquet re-encodes, so the
    * output is also freshly compressed/dictionary-encoded — compaction
    * doubles as a storage-format refresh.
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long = 128L << 20
  ): Int = {
    val n = targetFileCount(inputBytes(spark, inPath), targetBytes)
    spark.read.parquet(inPath)
      .repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    n
  }

  /** Sort-ordered rewrite: range-partition + sort within files on
    * `sortCols` so min/max footer stats become selective and scans with
    * predicates on those columns skip whole files (the poor man's
    * clustering/Z-order for a single sort dimension).
    */
  def compactSorted(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      sortCols: Seq[String],
      targetBytes: Long = 128L << 20
  ): Int = {
    import org.apache.spark.sql.functions.col
    val n = targetFileCount(inputBytes(spark, inPath), targetBytes)
    spark.read.parquet(inPath)
      .repartitionByRange(n, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    n
  }
}
