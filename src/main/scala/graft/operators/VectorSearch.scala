package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.vec

/** Brute-force kNN family over the embeddings collection — the exact
  * correctness baseline for the reference's vector query surface
  * (Milvus/Qdrant/Weaviate/Chroma top-k search with metric choice,
  * metadata pre-filter, radius search, grouped search —
  * /root/reference/README.md:69-83).
  *
  * Scale shape (100 TB): the query set is small and broadcast; the
  * corpus is scanned once, partition-parallel, scoring inside
  * whole-stage codegen via the native expressions in
  * [[graft.functions]]. Per-query top-k uses `row_number` over a
  * window, which Spark 4.x plans with `WindowGroupLimit`: each input
  * partition keeps only its local top-k BEFORE the shuffle, so the
  * exchange moves O(partitions × k × |Q|) rows, not the full
  * |corpus| × |Q| score matrix.
  *
  * Determinism (SURVEY.md §5): scores rounded to 6 places before
  * ranking, ties broken by vec_id, so the DuckDB oracle hashes match.
  */
object VectorSearch {

  val K = 10

  /** Deterministic query set: every 100th vector. Tiny at any SF
    * relative to the corpus — always the broadcast side.
    */
  def querySet(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("label").as("q_label"))

  /** Corpus × broadcast(queries) scored with `scoreCol`, top-k per
    * query by `order` (already rounded), ties by vec_id.
    */
  private def knn(corpus: DataFrame, queries: DataFrame, score: (Column, Column) => Column,
                  ascending: Boolean): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .withColumn("score", round(score(col("q_emb"), col("embedding")), 6))
    val ord = if (ascending) col("score").asc else col("score").desc
    val w = Window.partitionBy(col("q_id")).orderBy(ord, col("vec_id"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("rn"), col("score"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Row 1: top-k by cosine similarity. */
  def qKnnCosine(spark: SparkSession, sfDir: String): DataFrame =
    knn(Tables.embeddings(spark, sfDir), querySet(spark, sfDir), vec.cosine, ascending = false)

  /** Row 2: top-k by L2 distance (nearest = smallest). */
  def qKnnL2(spark: SparkSession, sfDir: String): DataFrame =
    knn(Tables.embeddings(spark, sfDir), querySet(spark, sfDir), vec.l2, ascending = true)

  /** Row 3: top-k by inner product. */
  def qKnnDot(spark: SparkSession, sfDir: String): DataFrame =
    knn(Tables.embeddings(spark, sfDir), querySet(spark, sfDir), vec.dot, ascending = false)

  /** Row 4: kNN with metadata pre-filter (label < 5), the
    * Qdrant/Milvus/Weaviate "filtered search". The filter lands in the
    * parquet scan (PushedFilters), so the pruned corpus never
    * materializes unfiltered.
    */
  def qKnnFiltered(spark: SparkSession, sfDir: String): DataFrame =
    knn(Tables.embeddings(spark, sfDir).filter(col("label") < 5),
        querySet(spark, sfDir), vec.cosine, ascending = false)

  /** Row 5: radius search — every corpus vector with cosine ≥ 0.25 of
    * a query. Pure filter after scoring: no shuffle at all beyond the
    * final presentation sort.
    */
  def qRangeSearch(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .crossJoin(broadcast(querySet(spark, sfDir)))
      .withColumn("score", round(vec.cosine(col("q_emb"), col("embedding")), 6))
      .filter(col("score") >= 0.25)
      .select(col("q_id"), col("vec_id"), col("score"))
      .orderBy(col("q_id"), col("vec_id"))

  /** Row 6: grouped top-k — nearest 3 per (query, corpus label),
    * Weaviate's group-by search / Milvus grouping_field. Same
    * WindowGroupLimit shape as kNN, keyed by (q_id, label).
    */
  def qGroupedTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.embeddings(spark, sfDir)
      .crossJoin(broadcast(querySet(spark, sfDir)))
      .withColumn("score", round(vec.cosine(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy(col("q_id"), col("label")).orderBy(col("score").desc, col("vec_id"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("label"), col("vec_id"), col("rn"), col("score"))
      .orderBy(col("q_id"), col("label"), col("rn"))
  }

  /** Row 9: per-label norm stats over the collection — the
    * normalize/stats path every backend runs at ingest. Map-side
    * partial agg; output cardinality = |labels|.
    */
  def qVectorStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("label"), size(col("embedding")).cast("long").as("dim"),
              vec.norm(col("embedding")).as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        max(col("dim")).as("dim"),
        round(avg(col("nrm")), 6).as("avg_norm"),
        round(min(col("nrm")), 6).as("min_norm"),
        round(max(col("nrm")), 6).as("max_norm"))
      .orderBy(col("label"))
}
