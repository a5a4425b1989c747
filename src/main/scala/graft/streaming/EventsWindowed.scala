package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming twin of `Relational.qEventsWindow`
  * (SURVEY.md §2 row 34): file source → event-time watermark →
  * tumbling 1-hour window aggregation.
  *
  * The same logical plan serves batch and streaming — at production
  * scale this runs `readStream` over an arriving parquet/Kafka feed
  * with the watermark bounding state, and each micro-batch shuffles
  * only the (window, event_type) partials, never raw events.
  */
object EventsWindowed {

  /** Build the windowed aggregation over any events DataFrame
    * (batch or streaming) — single definition keeps the twins
    * provably identical.
    */
  def windowed(events: DataFrame): DataFrame =
    events
      // event time must be TIMESTAMP; the test corpus stores NTZ micros
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming entry: parquet file source with an explicit schema
    * (file streams cannot infer), watermarked tumbling aggregation.
    */
  def stream(spark: SparkSession, srcDir: String, schema: StructType): DataFrame =
    windowed(spark.readStream.schema(schema).parquet(srcDir))
}
