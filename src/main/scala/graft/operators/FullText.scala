package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.TextIndex
import graft.functions.vec

/** Full-text relevance — the Elasticsearch side of the reference's
  * unified surface (keyword match, TF-IDF, BM25: the ES backend at
  * /root/reference/tests/cpu/docker-compose.yml:19-29,
  * README.md:72,82) plus the hybrid lexical+vector RRF fusion every
  * backend pair converges on. Thin bindings of
  * [[graft.api.TextIndex]] onto the documents table.
  *
  * Scale shape (see TextIndex): one corpus scan → partial aggs →
  * broadcast joins → per-doc score → top-k. The only corpus-sized
  * shuffle is the (doc_id, term) tf aggregation.
  */
object FullText {

  /** The deterministic lexical query. */
  val Terms: Seq[String] = Seq("spark", "join", "vector")
  val K = 20

  private def index(spark: SparkSession, sfDir: String): TextIndex =
    TextIndex(Tables.documents(spark, sfDir))

  /** Row 15: boolean keyword match — docs matching ≥2 of the query
    * terms, with the per-doc match count. Pure scan + codegen'd
    * array_contains; no shuffle at all.
    */
  def qKeywordMatch(spark: SparkSession, sfDir: String): DataFrame =
    index(spark, sfDir).keywordMatch(Terms, minMatch = 2)
      .select(col("doc_id"), col("lang"), col("n_matched"))
      .orderBy(col("doc_id"))

  /** Row 16: TF-IDF top-k. idf = ln(N/df); score = Σ_t tf·idf_t. */
  def qTfidf(spark: SparkSession, sfDir: String): DataFrame =
    index(spark, sfDir).tfidf(Terms)
      .orderBy(col("tfidf").desc, col("doc_id")).limit(K)

  /** Row 17: BM25(k1=1.2, b=0.75) top-k, Lucene-style idf. */
  def qBm25(spark: SparkSession, sfDir: String): DataFrame =
    index(spark, sfDir).bm25(Terms)
      .orderBy(col("bm25").desc, col("doc_id")).limit(K)

  /** Exact-phrase containment with occurrence counts (ES match_phrase). */
  def qPhraseMatch(spark: SparkSession, sfDir: String): DataFrame =
    index(spark, sfDir).phraseMatch("spark join")
      .select(col("doc_id"), col("n_occurrences"))
      .orderBy(col("doc_id"))

  /** Fuzzy term match (ES fuzzy query): corpus tokens within edit
    * distance 1 of "spark", with document frequencies.
    */
  def qFuzzyMatch(spark: SparkSession, sfDir: String): DataFrame =
    index(spark, sfDir).fuzzyMatch("spark", maxEdits = 1)
      .orderBy(col("token"))

  /** Row 18: hybrid search — RRF fusion (k=60) of the BM25 ranking
    * and the vector-cosine ranking for the paired query (doc_id ≡
    * vec_id in the collection; query vector = vector 0).
    */
  private def vecScores(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    emb.crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(vec.cosine(col("q_emb"), col("embedding")), 6).as("vscore"))
  }

  def qHybridRrf(spark: SparkSession, sfDir: String): DataFrame =
    index(spark, sfDir).hybridRrf(Terms, vecScores(spark, sfDir), "vscore")
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(K)

  /** The deterministic msearch batch: two queries, disjoint term sets. */
  val BatchQueries: Seq[(Long, Seq[String])] =
    Seq(1L -> Seq("spark", "join"), 2L -> Seq("vector", "hash", "scan"))

  /** Batch BM25 (ES msearch): both queries scored in one corpus pass. */
  def qBm25Batch(spark: SparkSession, sfDir: String): DataFrame =
    index(spark, sfDir).bm25Batch(BatchQueries, k = 10)
      .select(col("tq_id"), col("doc_id"), col("rn"), col("bm25"))
      .orderBy(col("tq_id"), col("rn"))

  /** Weighted hybrid fusion (Weaviate's hybrid alpha): min-max
    * normalized 0.75·vec + 0.25·lex over the same candidate pools as
    * the RRF variant.
    */
  def qHybridWeighted(spark: SparkSession, sfDir: String): DataFrame =
    index(spark, sfDir).hybridWeighted(Terms, vecScores(spark, sfDir), "vscore")
      .orderBy(col("hybrid").desc, col("doc_id"))
      .limit(K)
}
