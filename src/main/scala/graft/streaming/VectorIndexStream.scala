package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.VectorIndex

/** Streaming maintenance of the at-rest vector index — the
  * ingest-while-serving path of Milvus/Qdrant as a Structured
  * Streaming sink: every arriving (vec_id, embedding, label)
  * micro-batch is encoded against the index's PERSISTED geometry
  * (centroids + codebooks read once from `meta/` — never retrained)
  * and appended into the partitioned layout: spilled cluster
  * partitions, PQ/SQ8/BQ code columns, and LSH band postings all
  * land in one batch-sized write.
  *
  * Same state discipline as [[TextIndexStream]] and [[NearDupStream]]:
  * index state lives in the PARTITIONED PARQUET LAYOUT, not the
  * streaming state store, so a trigger costs one batch encode +
  * append and the standing corpus is never read or rewritten.
  * Searches between triggers ([[VectorIndex.searchIvf]] … searchLsh)
  * see everything ingested so far.
  */
object VectorIndexStream {

  /** Start folding a vector stream into the index at `path`. The path
    * must already hold an index layout (possibly of an empty corpus).
    */
  def ingestStream(vecStream: DataFrame, path: String): StreamingQuery =
    vecStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        VectorIndex.append(batch.sparkSession, batch, path)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
