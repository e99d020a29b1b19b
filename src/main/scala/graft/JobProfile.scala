package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time profile of one declared query (guide §1.3 "find
  * where the time goes" without the UI): registers a listener, runs
  * the query once through [[Bench.materialize]], and prints every
  * Spark job's wall seconds with its call site — the measure-first
  * step for multi-job gates (table write paths, iterative kernels),
  * where a single end-to-end number can't say which pass to cut.
  * Usage: `JobProfile <sfDir> <query> [query...]` (or via
  * /tmp/graft_java.sh against frozen classes).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          val sec = (System.nanoTime() - t0) / 1e9
          lines.add(f"JOB ${j.jobId}%4d ${sec}%8.3f s  $site%s")
        }
      }
    })
    def runOnce(name: String): Unit = {
      lines.clear()
      val t0 = System.nanoTime()
      Bench.materialize(SparkEntry.queries(name)(spark, sfDir))
      val total = (System.nanoTime() - t0) / 1e9
      // listener events are async — give the bus a moment to drain
      Thread.sleep(300)
      println(s"===== $name (total ${f"$total%.3f"} s) =====")
      lines.toArray(Array.empty[String]).foreach(println)
    }
    // warmup: absorb JVM/codegen startup like Bench does
    try Bench.materialize(SparkEntry.queries("q6_filter")(spark, sfDir))
    catch { case _: Throwable => () }
    args.drop(1).foreach { n => runOnce(n); runOnce(n) }
    spark.stop()
  }
}
