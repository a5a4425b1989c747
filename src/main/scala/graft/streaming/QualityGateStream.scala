package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming quality gate — the classifier filter run AT INGEST, the
  * way a production crawl pipeline gates documents before they ever
  * land in the corpus (the CCNet/GPT-3 recipe's filtering step, as a
  * stream): each micro-batch document is scored by the same
  * hashed-bag linear classifier the batch pipeline runs
  * ([[graft.operators.TextAnalysis]] `classifierWithScore` — one
  * definition, so stream and batch provably agree) and only keepers
  * pass.
  *
  * Scale shape: STATELESS — a pure map-only projection + filter, no
  * state store, no watermark, no shuffle; the gate runs at source
  * throughput on any cluster size, and the keep decision is the exact
  * integer weight sum (engine- and fold-order-deterministic), never
  * the rounded float.
  */
object QualityGateStream {

  /** Works on both batch and streaming frames carrying (doc_id,
    * text, ...): appends n_tokens / score and keeps rows whose exact
    * integer weight sum passes the gate. Passthrough columns
    * survive — a gated record lands in the corpus exactly as it
    * arrived, plus its score.
    */
  def gated(docs: DataFrame, minWeightSum: Long = 0L): DataFrame =
    graft.operators.TextAnalysis.classifierWithScore(docs)
      .filter(col("w_sum") >= minWeightSum)
      .drop("w_sum")
}
