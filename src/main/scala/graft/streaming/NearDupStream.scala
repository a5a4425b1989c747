package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Streaming NEAR-dup gate — the ingest-time companion of
  * [[DedupStream]] (which drops only exact content-hash copies):
  * every arriving micro-batch is checked against the standing
  * at-rest MinHash/LSH index ([[graft.operators.Dedup.writeMinhashIndex]])
  * plus itself, its near-dup pairs are handed to the sink (the
  * admit/reject decision), and the batch is then folded into the
  * index so later batches see it.
  *
  * State lives in the PARTITIONED PARQUET INDEX, not the streaming
  * state store: signatures are fixed-permutation, so index rows
  * written by different triggers are mutually comparable, and each
  * trigger costs batch-scan + one pass over the postings — the
  * standing corpus is never re-shingled. At 100 TB the state store
  * could never hold per-doc shingle sets; the at-rest index is the
  * only shape that scales, and it doubles as the offline index for
  * [[graft.operators.Dedup.dedupAgainstIndex]] batch runs.
  *
  * Pair-coverage invariant (spec-proven, batching-independent): over
  * any partition of a corpus into sequential micro-batches, the
  * union of emitted pairs is EXACTLY the full-corpus
  * [[graft.operators.Dedup.minhashPairs]] pairs that touch a
  * streamed doc — each pair surfaces in the trigger where its later
  * doc arrives.
  */
object NearDupStream {

  /** Start the gate over a (doc_id, text) stream. `indexPath` must
    * already hold an index (possibly of an empty corpus). `sink`
    * receives the (doc_a, doc_b, jaccard) pairs of each batch and
    * MUST materialize them before returning — the batch is appended
    * to the index right after, and a lazily-evaluated pair frame
    * would then see the batch as already indexed (self-pairs).
    */
  def gateStream(docStream: DataFrame, indexPath: String,
                 threshold: Double = 0.3)(sink: DataFrame => Unit): StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        sink(Dedup.dedupAgainstIndex(spark, batch, indexPath, threshold))
        Dedup.appendToMinhashIndex(batch, indexPath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
