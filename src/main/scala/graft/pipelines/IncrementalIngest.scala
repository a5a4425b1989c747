package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Incremental corpus ingest — the per-crawl admission pipeline a
  * standing 100 TB pretraining corpus runs, composed from the
  * library's own stages so each keeps its scale shape:
  *
  *  1. Gopher-style quality gate (per-row expressions, scan-only),
  *  2. near-dup rejection against the AT-REST MinHash index plus the
  *     batch itself ([[graft.operators.Dedup.dedupAgainstIndex]]) —
  *     batch-scan cost, the standing corpus is never re-processed,
  *  3. append the admitted survivors to the index so the next crawl
  *     sees them.
  *
  * Rejection policy mirrors [[CleanCorpus]]: a batch doc is dropped
  * iff it is the `doc_b` of any verified pair — the indexed side of
  * a cross pair always sits in `doc_a`, and within-batch pairs are
  * emitted lower-id-first, so "drop doc_b" = defer to the standing
  * corpus, then to the lower batch id. Because admitted docs join
  * the index, RE-ingesting the same crawl admits nothing (every doc
  * now has a Jaccard-1.0 twin in the index) — the idempotence the
  * spec asserts.
  */
object IncrementalIngest {

  /** Minimum token count for the gate — the Gopher 50-word floor is
    * tuned for web pages; synthetic test docs run shorter, so the
    * floor is a parameter with the same rule shape.
    */
  val MinWords = 10

  /** Quality gate: word-count floor, mean word length in [3, 10],
    * ≥2 stopword hits, distinct-token ratio > 0.3 — the
    * [[graft.operators.TextAnalysis.qGopherQuality]] rule battery as
    * a filter.
    */
  def gate(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val stop = Seq("the", "a")
    val meanWl = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / size(toks)
    docs.filter(
      size(toks) >= MinWords &&
      meanWl >= 3.0 && meanWl <= 10.0 &&
      size(filter(toks, t => t.isin(stop: _*))) >= 2 &&
      size(array_distinct(toks)).cast("double") / size(toks) > 0.3)
  }

  /** Admit one crawl: gate → dedup vs index+self → append survivors.
    * Returns the admitted (doc_id, text) rows, MATERIALIZED before
    * the index append — the lazily-recomputed frame would otherwise
    * re-read the index post-append and find each survivor's own twin.
    */
  def ingest(spark: SparkSession, batch: DataFrame, indexPath: String): DataFrame = {
    val gated = gate(batch.select(col("doc_id"), col("text")))
    val drops = Dedup.dedupAgainstIndex(spark, gated, indexPath)
      .select(col("doc_b").as("__drop_id")).distinct()
    val admitted = gated
      .join(drops, col("doc_id") === col("__drop_id"), "left_anti")
      .localCheckpoint()
    Dedup.appendToMinhashIndex(admitted, indexPath)
    admitted
  }
}
