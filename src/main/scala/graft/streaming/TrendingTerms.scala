package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Trending terms over a document stream — the streaming analytics
  * shape behind "what's hot right now" dashboards (ES would run a
  * `terms` agg over a `date_histogram`; Kafka-native engines a
  * windowed top-k): sliding event-time windows, per-window term
  * counts, rank inside each closed window.
  *
  * Two stages with different streaming semantics:
  *   1. `windowedCounts` — watermark + sliding-window token counts.
  *      Valid under streaming aggregation rules: each micro-batch
  *      shuffles only (window, term) partials, the watermark bounds
  *      state, and windows emit once closed (append mode).
  *   2. `topK` — a rank over the CLOSED windows. Ranking is not a
  *      streaming-supported operation (it would need the whole
  *      window's output), so it runs as a batch post-pass over the
  *      sink — or inside `foreachBatch` once the watermark fires.
  *      Per-window output is |vocab| rows, so the rank's shuffle is
  *      tiny regardless of input scale.
  *
  * The same `windowedCounts` expression serves a batch frame
  * unchanged, which is what the spec uses to prove the streaming
  * result equals the batch twin.
  */
object TrendingTerms {

  /** Sliding-window term counts: 1-hour windows every 30 minutes,
    * tokens split from `textCol`, 2-hour watermark. Works on a batch
    * or streaming frame with (`ts` timestamp, textCol string).
    */
  def windowedCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .select(col("ts"), explode(split(col(textCol), " ")).as("term"))
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("term"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("term"), col("n"))

  /** Top-k terms per closed window, deterministic tie-break on the
    * term itself.
    */
  def topK(counts: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("window_start"))
      .orderBy(col("n").desc, col("term"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("window_start"), col("rank"))
  }

  /** Streaming entry: parquet file source → watermarked sliding
    * window counts (append mode at the caller's sink).
    */
  def stream(spark: SparkSession, srcDir: String, schema: StructType,
             textCol: String = "text"): DataFrame =
    windowedCounts(spark.readStream.schema(schema).parquet(srcDir), textCol)
}
