package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Streaming takedown pipeline — the retraction companion of
  * [[NearDupStream]]'s admission gate: a stream of retraction
  * requests (doc ids with their indexed text) is applied to all
  * standing indexes per micro-batch, so a removed document stops
  * vetoing resembling crawls, stops scoring in text search, and
  * stops being served — continuously, without any index rebuild.
  *
  * Each trigger costs |batch|: dedup-index tombstones
  * ([[graft.operators.Dedup.deleteFromMinhashIndex]]) and text-index
  * tombstones + negative df/stats deltas
  * ([[graft.api.TextIndex.delete]]) are appended, nothing standing is
  * read or rewritten. Compaction
  * ([[graft.operators.Dedup.compactMinhashIndex]] /
  * [[graft.api.TextIndex.compact]]) runs on its own cadence, outside
  * the stream. The spec proves the streamed retractions leave both
  * indexes behaving exactly like batch deletes of the same docs.
  *
  * Replay-safe: `foreachBatch` redelivers micro-batches at-least-once
  * on restart, and both sinks tolerate that — dedup tombstones are
  * idempotent by construction (anti-join by id), and
  * `TextIndex.delete` drops already-tombstoned ids before emitting
  * its negative df/stats deltas, so a redelivered takedown batch is a
  * no-op rather than a double-subtraction. Neither sink collects the
  * batch to the driver.
  */
object RetractionStream {

  /** Start the retraction pipeline over a (doc_id, text) stream of
    * takedown requests. Either index path may be absent (`None`
    * skips that index).
    */
  def retractStream(requests: DataFrame, dedupIndexPath: Option[String],
                    textIndexPath: Option[String]): StreamingQuery =
    requests.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint() // both deletes read it; a stream source frame is one-shot
        dedupIndexPath.foreach(p => Dedup.deleteFromMinhashIndex(b.select("doc_id"), p))
        textIndexPath.foreach(p => graft.api.TextIndex.delete(b, p))
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
