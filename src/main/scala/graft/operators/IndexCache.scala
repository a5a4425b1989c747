package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialized index corpora.
  *
  * The reference's backends (Milvus IVF/PQ, Qdrant quantized storage,
  * LSH tables) build their index representation ONCE at ingest and
  * serve every query from it; only [[Ann.writeIvfIndex]] models the
  * true at-rest layout, but inside one session the same lifecycle
  * applies: the encoded corpus (cluster ids, PQ codes, sign words,
  * int8 vectors) is a build artifact, not part of the query. Caching
  * the localCheckpoint also keeps the enormous literal expression
  * trees (per-centroid dot products expanded for codegen) out of
  * every query's plan — they are paid once per corpus, as at ingest.
  *
  * Keyed by (session identity, corpus dir, variant) so independent
  * test sessions never share checkpointed RDDs.
  */
private[graft] object IndexCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def materialized(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent(System.identityHashCode(spark) + "#" + key,
      _ => build.localCheckpoint())
}
