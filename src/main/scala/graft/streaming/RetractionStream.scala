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
        val spark = batch.sparkSession
        val b = batch.localCheckpoint() // both deletes read it; a stream source frame is one-shot
        dedupIndexPath.foreach { p =>
          val ids = b.select("doc_id").collect().map(_.getLong(0)).toSeq
          Dedup.deleteFromMinhashIndex(spark, ids, p)
        }
        textIndexPath.foreach(p => graft.api.TextIndex.delete(b, p))
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
