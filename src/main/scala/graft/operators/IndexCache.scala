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
  * Keyed by (session UUID, corpus dir, variant) so independent test
  * sessions never share checkpointed RDDs. The UUID is the session's
  * own stable identifier — unlike an identity hash it can neither
  * collide between two live sessions nor be reused for a new session
  * after an old one is collected.
  */
private[graft] object IndexCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Stable unique id for a session (classic sessions expose their
    * sessionUUID; any other implementation falls back to identity,
    * scoped by class name so the two schemes can't collide).
    */
  private[graft] def sessionKey(spark: SparkSession): String =
    org.apache.spark.sql.graftbridge.ColumnBridge.sessionUUID(spark)
      .getOrElse(spark.getClass.getName + "@" + System.identityHashCode(spark))

  /** Session-lifetime temp directories (index layouts built for the
    * duration of a test/bench session). Registered for recursive
    * cleanup at JVM exit — createTempDirectory alone leaks the tree.
    */
  private[graft] def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file._
      import java.util.Comparator
      try {
        Files.walk(p).sorted(Comparator.reverseOrder())
          .forEach(f => { try Files.deleteIfExists(f) catch { case _: Throwable => () } })
      } catch { case _: Throwable => () }
    }))
    p.toString
  }

  def materialized(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent(sessionKey(spark) + "#" + key,
      _ => build.localCheckpoint())

  /** Drop every cached frame (any session) whose key contains
    * `marker` — the invalidation hook for mutable at-rest layouts: a
    * write that changes what a read should see evicts the path's
    * materialized serving views, and the ContextCleaner reclaims the
    * unreferenced checkpointed RDDs.
    */
  private[graft] def dropMatching(marker: String): Unit =
    cache.keySet.removeIf(_.contains(marker))
}
