package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.Tables

/** End-to-end training-data cleaning pipeline — the composition a
  * 100 TB pretraining corpus actually runs, built entirely from the
  * library's operators so every stage keeps its scale shape:
  *
  *  1. quality gate (per-row expression scoring),
  *  2. exact dedup (hash groupBy, keep min id),
  *  3. MinHash+LSH near-dup removal (linear band-bucket candidates,
  *     drop the higher id of each verified pair),
  *  4. feature annotation (token count) for downstream sampling.
  *
  * Each stage is a DataFrame→DataFrame function; the pipeline is one
  * lazy plan end to end — Catalyst fuses the per-row stages into the
  * same scan, and only the dedup stages shuffle.
  */
object CleanCorpus {

  val QualityThreshold = 0.5

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Dedup.augmentedDocs(spark, sfDir) // corpus with known dups
    clean(docs)
  }

  def clean(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    val stop = Seq("the", "a")
    // 1. quality gate — same formula as TextAnalysis.qQualityScore
    val scored = docs
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("quality",
        lit(0.4) * (least(col("n_tok"), lit(100L)).cast("double") / 100) +
        lit(0.3) * (lit(1) - size(filter(toks, t => t.isin(stop: _*))).cast("long") / col("n_tok")) +
        lit(0.3) * (size(array_distinct(toks)).cast("long") / col("n_tok")))
      .filter(col("quality") >= QualityThreshold)

    // 2. exact dedup: keep the smallest id of each normalized-text group
    val keptExact = scored
      .withColumn("__h", md5(lower(trim(col("text")))))
      .withColumn("__keeper", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))))
      .filter(col("doc_id") === col("__keeper"))
      .drop("__h", "__keeper")

    // 3. near-dup removal: drop the higher id of each verified
    //    MinHash pair (computed over the same corpus)
    val nearPairs = Dedup.minhashPairs(keptExact)
      .select(col("doc_b").as("__drop_id")).distinct()
    keptExact.join(nearPairs, col("doc_id") === col("__drop_id"), "left_anti")
      .select(col("doc_id"), col("text"), col("n_tok"), round(col("quality"), 6).as("quality"))
  }
}
