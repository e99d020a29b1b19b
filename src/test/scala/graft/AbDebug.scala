import org.apache.spark.sql.SparkSession
object AbDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = graft.SparkEntry.queries("q_ab_lift")(spark, "/root/testdata/sf0.01")
      df.show(false)
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
