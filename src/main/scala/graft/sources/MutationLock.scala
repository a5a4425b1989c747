package graft.sources

import org.apache.hadoop.fs.Path

/** Per-index-path mutation locks for the check-then-act verbs.
  *
  * Most lifecycle verbs are naturally safe under concurrent writers
  * (appends land distinct files; tombstones are idempotent unions),
  * but two read their own layout before writing — [[graft.operators
  * .VectorIndex.setPayload]] assigns the next sequence number,
  * [[graft.api.TextIndex.delete]] anti-joins already-tombstoned ids
  * before emitting negative deltas — and a concurrent pair would
  * observe the same prior state (duplicate seq stamp / double
  * subtraction). Same-JVM writers serialize here; all mutation runs
  * on the driver in this deployment model (the cross-process story is
  * a single maintenance owner per index — the contract table in
  * README.md). The same pattern [[VersionedPointer]] uses for alias
  * swaps.
  */
private[graft] object MutationLock {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def of(path: String): Object =
    locks.computeIfAbsent(
      Path.getPathWithoutSchemeAndAuthority(new Path(path)).toString, _ => new Object)
}
