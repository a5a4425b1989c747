package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Document → training-chunk pipeline: the end-to-end composition a
  * pretraining corpus runs AFTER cleaning (see [[CleanCorpus]]):
  *
  *  1. PII scrub ([[TextAnalysis.scrubPii]] — per-row regex,
  *     codegen'd),
  *  2. sliding-window chunking ([[TextAnalysis.chunked]] — 32 tokens,
  *     stride 16),
  *  3. per-chunk features: token count and content hash (the dedup
  *     key for a downstream chunk-level exact dedup).
  *
  * The stages are the same oracle-pinned operators the queries use —
  * one definition, no drift. Everything is one lazy plan: scrub and
  * chunk fuse into the same scan (no shuffle anywhere — output order
  * is input order), so the pipeline streams at scan speed over any
  * corpus size. The output schema is what an embedding/tokenizer
  * stage consumes.
  */
object PrepareTrainingData {

  val ChunkSize: Int = TextAnalysis.ChunkSize
  val ChunkStride: Int = TextAnalysis.ChunkStride

  /** docs: (doc_id, text) → (doc_id, chunk_id, n_tokens, chunk_text,
    * chunk_hash).
    */
  def run(docs: DataFrame): DataFrame =
    TextAnalysis.chunked(
        docs.select(col("doc_id"), TextAnalysis.scrubPii(col("text")).as("text")))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
      .withColumn("chunk_hash", md5(col("chunk_text")))
}
