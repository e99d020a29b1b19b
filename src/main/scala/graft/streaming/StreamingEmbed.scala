package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.engine.InceptionEngine

/** Structured Streaming surface (SURVEY.md §2.3/§7.6 extension — the
  * reference is request/response only; its whole document pipeline is
  * stateless per row, so the identical logical plan runs under streaming
  * unmodified).
  */
object StreamingEmbed {

  /** Stream-embed documents: the SAME narrow transforms as
    * InceptionEngine.embedDocumentsExploded — chunk + embed are stateless,
    * so append mode needs no watermark or state store. Works on any
    * streaming DataFrame with (doc_id, text).
    */
  def embedStream(engine: InceptionEngine, stream: DataFrame): DataFrame =
    engine.embedDocumentsExploded(stream).toDF()

  /** Micro-batch sink reusing the batch pipeline verbatim via foreachBatch
    * — the reference's "batched requests" become micro-batches.
    */
  def embedForeachBatch(
      engine: InceptionEngine,
      stream: DataFrame
  )(handle: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        handle(engine.embedDocumentsExploded(batch).toDF(), id)
      }

  /** Event-time tumbling aggregation with watermark over an events stream
    * (ts TIMESTAMP, event_type STRING, value DOUBLE) — the streaming twin
    * of SparkEntry's events_tumbling batch query.
    */
  def eventCountsStream(
      events: DataFrame,
      windowLen: String = "1 hour",
      watermark: String = "2 hours"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
