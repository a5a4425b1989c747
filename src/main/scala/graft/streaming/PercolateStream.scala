package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.FullText

/** Streaming percolation — the alerting/saved-search deployment of
  * the ES percolator (reference backends: ES percolate queries,
  * Qdrant/Weaviate have no native equivalent): documents arrive on a
  * stream and every micro-batch is matched against the STORED query
  * set via the exact batch percolate plan
  * ([[graft.operators.FullText.percolate]]) — broadcast stored
  * queries, one higher-order match expression per (doc, query), no
  * shuffle, no state.
  *
  * This is the natural streaming shape for percolation: each alert
  * depends only on its own document, so there is no watermark and no
  * state store — each trigger is an independent bounded job, and the
  * stored-query broadcast is re-planned per batch (query updates are
  * picked up live).
  */
object PercolateStream {

  /** Start a stream that percolates every arriving (doc_id, text)
    * batch and hands the matching (pq_id, doc_id, n_matched) alerts
    * to `sink`.
    */
  def alertStream(docStream: DataFrame)(sink: DataFrame => Unit): StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(FullText.percolate(batch))
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
