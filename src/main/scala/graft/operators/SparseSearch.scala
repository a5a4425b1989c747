package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sparse-vector search — the Qdrant sparse-vectors / Milvus sparse-
  * float / Elasticsearch ELSER index family: documents live in a
  * high-dimensional sparse space (here 1024 hash buckets of their
  * tokens), queries are tiny (bucket → weight) maps, and the score is
  * the sparse dot product.
  *
  * The Spark-first shape is an inverted-index scan, NOT a dense
  * join: tokens are bucketed per row, pruned to the query's buckets
  * BEFORE any aggregation (the posting-list merge — at 100 TB the
  * shuffle carries only rows whose bucket appears in the query, a
  * |query|/1024 fraction of the corpus postings), then one
  * map-side-combinable per-doc sum. The query map is a literal pushed
  * into the scan filter.
  */
object SparseSearch {

  val Dims = 1024
  val K = 20

  /** Deterministic sparse query: term → weight. */
  val QueryWeights: Seq[(String, Double)] =
    Seq("spark" -> 1.0, "join" -> 0.5, "vector" -> 0.25)

  /** Hash bucket of a token — md5-prefix mod Dims, reproducible in
    * the DuckDB oracle (same md5, same arithmetic).
    */
  private def bucketCol(token: org.apache.spark.sql.Column) =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % Dims

  private def bucketOf(term: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.substring(0, 8), 16) % Dims
  }

  /** Sparse dot-product top-k over the documents table. */
  def qSparseKnn(spark: SparkSession, sfDir: String): DataFrame = {
    val weights = QueryWeights.map { case (t, w) => (bucketOf(t), w) }
    val qdf = broadcast(spark.createDataFrame(weights).toDF("b", "w"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .select(col("doc_id"), bucketCol(col("token")).as("b"))
      // posting-list pruning: only buckets present in the query survive
      .filter(col("b").isin(weights.map(_._1): _*))
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .join(qdf, "b")
      .groupBy(col("doc_id"))
      .agg(round(sum(col("tf") * col("w")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(K)
  }
}
