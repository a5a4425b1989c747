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

  /** Sparse dot-product top-k over the documents table, via
    * [[graft.api.TextIndex.sparseSearch]].
    */
  def qSparseKnn(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.TextIndex(Tables.documents(spark, sfDir))
      .sparseSearch(QueryWeights, Dims, K)
}
