package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.vec

/** Full-text relevance — the Elasticsearch side of the reference's
  * unified surface (keyword match, TF-IDF, BM25) plus the hybrid
  * lexical+vector RRF fusion every backend pair converges on.
  *
  * Scale shape: corpus-side work is token explosion + aggregation on
  * (doc_id, term) — map-side combinable, shuffles only on doc_id.
  * Corpus-level scalars (N, avgdl, per-term df) are single-row /
  * |terms|-row aggregates broadcast back into the scoring join, so
  * the 100 TB plan is: one corpus scan → partial aggs → broadcast
  * joins → per-doc score → WindowGroupLimit top-k. No corpus-sized
  * shuffle anywhere but the (doc_id, term) tf aggregation.
  */
object FullText {

  /** The deterministic lexical query. */
  val Terms: Seq[String] = Seq("spark", "join", "vector")
  val K = 20

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token"))

  /** tf per (doc, query-term) — corpus scan, filter to the term set
    * (pushed down), map-side partial count.
    */
  private def termFreq(docs: DataFrame): DataFrame =
    tokens(docs).filter(col("token").isin(Terms: _*))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Single-row corpus stats (N, avgdl) for broadcast. */
  private def corpusStats(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_docs"),
      avg(size(split(col("text"), " ")).cast("long")).as("avgdl"))

  /** Per-term document frequency, derived from the tf aggregate: tf
    * has one row per (doc, term), so counting rows per term = df.
    * Sharing the tf subtree lets Spark reuse its shuffle exchange
    * instead of scanning and exploding the corpus a second time.
    */
  private def docFreq(tf: DataFrame): DataFrame =
    tf.groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** Row 15: boolean keyword match — docs matching ≥2 of the query
    * terms, with the per-doc match count. Pure scan + codegen'd
    * array_contains; no shuffle at all.
    */
  def qKeywordMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = split(col("text"), " ")
    val nMatched = Terms.map(t => array_contains(toks, t).cast("long"))
      .reduce(_ + _)
    docs.select(col("doc_id"), col("lang"), nMatched.as("n_matched"))
      .filter(col("n_matched") >= 2)
      .orderBy(col("doc_id"))
  }

  /** Row 16: TF-IDF top-k. idf = ln(N/df); score = Σ_t tf·idf_t. */
  def qTfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val tf = termFreq(docs)
    val scored = tf
      .join(broadcast(docFreq(tf)), "token")
      .crossJoin(broadcast(corpusStats(docs)))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("tf") * log(col("n_docs") / col("df"))), 6).as("tfidf"))
    scored.orderBy(col("tfidf").desc, col("doc_id")).limit(K)
  }

  /** Row 17: BM25(k1=1.2, b=0.75) top-k, Lucene-style idf. */
  def qBm25(spark: SparkSession, sfDir: String): DataFrame =
    bm25Scores(Tables.documents(spark, sfDir))
      .orderBy(col("bm25").desc, col("doc_id")).limit(K)

  private def bm25Scores(docs: DataFrame): DataFrame = {
    val k1 = lit(1.2); val b = lit(0.75)
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val w = col("tf") * (k1 + 1) / (col("tf") + k1 * (lit(1) - b + b * col("dl") / col("avgdl")))
    val tf = termFreq(docs)
    tf
      .join(broadcast(docFreq(tf)), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(corpusStats(docs)))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * w), 6).as("bm25"))
  }

  /** Row 18: hybrid search — RRF fusion (k=60) of the BM25 ranking
    * and the vector-cosine ranking for the paired query (doc_id ≡
    * vec_id in the collection; query vector = vector 0). Two top-50
    * candidate lists, full-outer-joined — both lists are k-sized,
    * so the fusion join is trivially broadcastable at any corpus
    * scale.
    */
  def qHybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    val pool = 50
    val lex = bm25Scores(Tables.documents(spark, sfDir))
      .orderBy(col("bm25").desc, col("doc_id")).limit(pool)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))).as("lex_rank"))

    val emb = Tables.embeddings(spark, sfDir)
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val vecRanked = emb.crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
              round(vec.cosine(col("q_emb"), col("embedding")), 6).as("vscore"))
      .orderBy(col("vscore").desc, col("doc_id")).limit(pool)
      .select(col("doc_id"), row_number().over(
        Window.orderBy(col("vscore").desc, col("doc_id"))).as("vec_rank"))

    lex.join(vecRanked, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(
          when(col("lex_rank").isNotNull, lit(1.0) / (lit(60) + col("lex_rank"))).otherwise(lit(0.0)) +
          when(col("vec_rank").isNotNull, lit(1.0) / (lit(60) + col("vec_rank"))).otherwise(lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(K)
  }
}
