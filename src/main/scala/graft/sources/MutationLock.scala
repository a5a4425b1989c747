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
  * subtraction). Same-JVM writers serialize here; cross-process
  * writers are fenced by [[WriterLease]] (see the README contract
  * table).
  *
  * Locks are STRIPED, not per-path: a long-lived session touching
  * millions of index paths must not grow a map of lock objects
  * without bound, and evicting a per-path lock that a thread holds
  * would silently break mutual exclusion. Two paths hashing to the
  * same stripe merely over-serialize — correctness is unaffected.
  */
private[graft] object MutationLock {
  private val Stripes = 1024
  private val locks = Array.fill(Stripes)(new Object)

  def of(path: String): Object = {
    val key = Path.getPathWithoutSchemeAndAuthority(new Path(path)).toString
    locks(math.floorMod(key.hashCode, Stripes))
  }

  /** Test hook: the lock table is bounded by construction. */
  private[graft] def lockCount: Int = Stripes
}
