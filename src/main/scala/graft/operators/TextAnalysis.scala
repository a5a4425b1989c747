package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Text analysis family — the LLM-pipeline extension (SURVEY.md §2
  * rows 24–27): token counting, heuristic language ID, quality
  * scoring, and document fingerprinting.
  *
  * All four are single-scan, per-row expression pipelines (token
  * split + higher-order array functions, no UDFs) with at most one
  * map-side-combinable aggregation — the shapes that stay linear and
  * codegen'd at 100 TB.
  */
object TextAnalysis {

  /** Row 24: token counts per language — corpus profile stats. */
  def qTokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        round(avg(col("n_tok")), 6).as("avg_tokens"),
        max(col("n_tok")).as("max_tokens"))
      .orderBy(col("lang"))

  /** Stopword profiles for the heuristic language ID. The corpus is
    * synthetic (a closed ~30-word vocabulary), so the "languages" are
    * topical registers over that vocabulary; the operator shape —
    * per-profile hit count, argmax with deterministic tie-break — is
    * exactly the classic stopword language identifier.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow", "small", "big"),
    "db" -> Seq("table", "join", "query", "filter", "sort", "scan"),
    "ml" -> Seq("vector", "data", "batch", "stream", "spark", "hash"))

  /** Row 25: language ID — count stopword hits per profile (with
    * multiplicity), argmax profile per doc, ties to the
    * lexicographically smaller profile name. Profiles are a 3-row
    * broadcast; the corpus is scanned once.
    */
  def qLangId(spark: SparkSession, sfDir: String): DataFrame = {
    val profiles = spark.createDataFrame(LangProfiles).toDF("plang", "words")
    val hits = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .crossJoin(broadcast(profiles))
      .select(col("doc_id"), col("plang"),
        size(filter(col("toks"), t => array_contains(col("words"), t))).cast("long").as("hits"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("plang"))
    hits.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("plang").as("pred_lang"), col("hits"))
      .orderBy(col("doc_id"))
  }

  /** Row 26: quality score — length, stopword-ratio, and lexical
    * diversity mixed 0.4/0.3/0.3. Everything per-row; one expression
    * pipeline inside whole-stage codegen.
    */
  def qQualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = Seq("the", "a")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        size(filter(col("toks"), t => t.isin(stop: _*))).cast("long").as("n_stop"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_tok"),
        round(
          lit(0.4) * (least(col("n_tok"), lit(100L)).cast("double") / 100) +
          lit(0.3) * (lit(1) - col("n_stop") / col("n_tok")) +
          lit(0.3) * (col("n_distinct") / col("n_tok")), 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Row 27: polynomial rolling-hash fingerprint: fold tokens left to
    * right as acc·31 + tokval mod 1e9+7, with tokval the first 8 hex
    * digits of md5(token) — a hash both Spark and the SQL oracle
    * compute identically.
    */
  def qFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        aggregate(col("toks"), lit(0L),
          (acc, t) => (acc * 31 + conv(substring(md5(t), 1, 8), 16, 10).cast("long")) % 1000000007L)
          .as("fp"))
      .orderBy(col("doc_id"))
}
