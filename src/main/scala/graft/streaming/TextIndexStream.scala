package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.api.TextIndex

/** Streaming maintenance of the at-rest inverted text index — the
  * ingest-time companion of [[NearDupStream]] for the lexical side:
  * every arriving document micro-batch folds into the standing
  * postings layout via [[graft.api.TextIndex.append]], so searches
  * between triggers see everything indexed so far.
  *
  * Same state discipline as the dedup gate: index state lives in the
  * PARTITIONED PARQUET LAYOUT, not the streaming state store. The
  * side tables hold per-batch mergeable deltas (df partials, doc/
  * length counts), so a trigger costs exactly one batch scan and
  * appends — nothing standing is read or rewritten, which is the
  * only maintenance shape that survives a 100 TB standing corpus
  * under continuous ingest. ES performs the same trick with Lucene
  * segments; here a "segment" is the batch's parquet files and the
  * delta fold happens at query planning over broadcast-sized tables.
  */
object TextIndexStream {

  /** Start indexing a (doc_id, text) stream into `indexPath`. The
    * path must already hold an index layout (possibly of an empty
    * corpus — `TextIndex.write` of zero docs is valid). Searches via
    * [[graft.api.TextIndex.bm25AtRest]] against the same path score
    * exactly as a full rebuild over everything appended so far.
    */
  def indexStream(docStream: DataFrame, indexPath: String): StreamingQuery =
    docStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        TextIndex.append(batch, indexPath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
