package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: each click joined to the same user's
  * purchases landing within the following 30 minutes — the funnel /
  * attribution join (Flink interval join, ES transform's equivalent
  * is an offline batch).
  *
  * Both sides are watermarked, so Spark bounds the join state: a
  * buffered click can be dropped once the purchase-side watermark
  * passes click_ts + 30min, and vice versa — state is
  * O(rate × window), never O(history). The same expression tree
  * under static frames is the batch twin below; the spec asserts
  * equality.
  */
object StreamJoin {

  val WindowSec = 1800

  /** The join condition + projection, shared verbatim by the
    * streaming pair and the batch twin.
    */
  def join(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("click_ts"))
    val p = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
    c.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $WindowSec SECONDS"))
      .select(col("click_id"), col("user_id"), col("purchase_id"),
        (unix_millis(col("purchase_ts").cast("timestamp")) - unix_millis(col("click_ts").cast("timestamp"))).as("lag_ms"))
  }

  /** Streaming form: watermark both sides, then the shared join. */
  def joinStreams(clickStream: DataFrame, purchaseStream: DataFrame): DataFrame =
    join(clickStream.withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour"),
      purchaseStream.withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour"))

  /** Batch twin on a static events frame. */
  def batch(events: DataFrame): DataFrame =
    join(events.filter(col("event_type") === "click"),
      events.filter(col("event_type") === "purchase"))
}
