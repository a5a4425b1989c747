package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the ingest-time guard every backend runs
  * before admitting a record: drop any document whose normalized
  * content hash was already seen. Spark-native shape: watermarked
  * `dropDuplicates` keyed on the 16-byte digest, so state is one
  * compact key per distinct document and the watermark bounds it in
  * time — at 100 TB/day the state store holds digests, never text.
  *
  * The batch twin is [[graft.operators.Dedup.qDedupExact]]'s keeper
  * semantics: a spec asserts the streamed survivor set equals the
  * batch `dropDuplicates` on the same data.
  */
object DedupStream {

  /** Works on both batch and streaming frames with (doc_id, text,
    * ts) — single definition keeps the twins provably identical.
    * Streaming input must carry an event-time `ts` for the watermark.
    * `dropDuplicatesWithinWatermark` is the variant whose state the
    * watermark actually evicts — plain `dropDuplicates("h")` would
    * keep one state entry per digest FOREVER (the watermark only
    * bounds dedup state when the event-time column is a key).
    */
  def deduped(docs: DataFrame): DataFrame =
    docs
      .withColumn("h", md5(lower(trim(col("text")))))
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "24 hours")
      .dropDuplicatesWithinWatermark("h")
      .drop("h")
}
