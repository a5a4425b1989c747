package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic GROUPED alias swap — the ES `update_aliases` actions
  * semantics (one request repoints many aliases, observably
  * all-or-nothing; Qdrant's `update_collection_aliases` batches the
  * same way): a reindex that replaces a collection AND its standing
  * vector/text indexes must never be observed half-applied.
  *
  * Single-pointer swaps are already atomic ([[VersionedPointer]]);
  * the gap is ACROSS pointers — two sequential writes leave a window
  * where a reader sees the new collection through the old index
  * generation. The fix is one level of indirection, committed by ONE
  * versioned write:
  *
  *  - every MEMBER pointer's content becomes the redirect
  *    `@group <groupDir>` (written once, at enrollment);
  *  - the group's MANIFEST — a [[VersionedPointer]] at `groupDir`
  *    whose value is the full `memberKey -> value` map, one
  *    tab-separated line per member — is the single source of truth;
  *  - a grouped swap merges its entries into the manifest and
  *    installs the result as the next manifest version: one
  *    rename-CAS, so every member's new value becomes visible at the
  *    same instant;
  *  - a reader needing a CONSISTENT view across members reads the
  *    manifest once ([[snapshot]]) and resolves every member from
  *    that one version — the analogue of an ES search resolving all
  *    its aliases against one cluster state. (Two independent
  *    [[resolveValue]] calls can still straddle a swap, exactly as
  *    two separate ES API calls can.)
  *
  * Member keys are scheme-stripped pointer-directory paths, so a
  * member addressed via different spellings of one filesystem
  * resolves to one manifest entry. Manifest merges are a CAS loop on
  * [[VersionedPointer.writeIfAtVersion]] — two concurrent merges on
  * different members both land (the loser re-reads and re-merges)
  * rather than last-write-wins dropping one. Enrollment is the only
  * non-atomic step (one redirect write per member, AFTER the
  * manifest already carries the member's value) — a reader mid-
  * enrollment sees either the member's old standalone pointer or the
  * manifest value its redirect commits to, never nothing; and the
  * redirect write is VERSION-CONDITIONAL against the pre-merge
  * member version, so a standalone [[setOne]] landing inside the
  * swap window is folded into the manifest (it is the later writer)
  * instead of silently clobbered, while setOne's own standalone
  * branch is conditional in the same way and re-routes through the
  * group when it loses to a fresh redirect.
  */
object AliasGroup {

  /** Manifest versions retained — the pointer history
    * [[IndexAlias.pruneGenerations]]'s drain-grace window reads.
    */
  private val ManifestHistoryKeep = 16

  private val Redirect = "@group "

  private[graft] def keyOf(ptrDir: Path): String =
    Path.getPathWithoutSchemeAndAuthority(ptrDir).toString

  private def decode(s: String): Map[String, String] =
    s.split('\n').iterator.filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      require(i > 0, s"malformed alias-group manifest line: '$line'")
      line.substring(0, i) -> line.substring(i + 1)
    }.toMap

  private def encode(m: Map[String, String]): String =
    m.toSeq.sorted.map { case (k, v) => s"$k\t$v" }.mkString("\n")

  /** The group's current manifest (empty if the group has never
    * committed) — ONE versioned read, so every entry in the returned
    * map is from the same manifest version: the consistent multi-
    * alias view.
    */
  def snapshot(fs: FileSystem, groupDir: Path): Map[String, String] =
    VersionedPointer.read(fs, groupDir).map(decode).getOrElse(Map.empty)

  /** Merge `entries` into the group manifest and commit them as ONE
    * versioned write (the atomic grouped swap), then enroll any
    * member whose pointer does not yet redirect here. CAS loop: a
    * concurrent merge on other members forces a re-read-and-re-merge
    * rather than silently dropping either side's entries.
    */
  def swap(fs: FileSystem, groupDir: Path, entries: Seq[(Path, String)]): Unit = {
    require(entries.nonEmpty, "alias-group swap with no entries")
    // member-pointer versions BEFORE the manifest merge: the
    // enrollment CAS below distinguishes "still the pre-swap
    // standalone value" (superseded by the merge — redirect over it)
    // from "a standalone write landed mid-swap" (a LATER writer —
    // fold it into the manifest before redirecting, or the redirect
    // silently buries it while the manifest serves the older value)
    val preVersions: Map[String, Long] = entries.map { case (d, _) =>
      keyOf(d) -> VersionedPointer.readVersioned(fs, d).map(_._1).getOrElse(-1L)
    }.toMap
    mergeManifest(fs, groupDir, entries.map { case (d, v) => keyOf(d) -> v }.toMap)
    // manifest-first ordering: by the time a member redirects, its
    // value is already in the manifest. The redirect write KEEPS the
    // member's standalone version history — a reader draining on a
    // pre-enrollment generation keeps its [[valueHistory]]-backed
    // prune protection across the enrollment boundary.
    entries.foreach { case (d, _) => enroll(fs, groupDir, d, preVersions(keyOf(d))) }
  }

  /** CAS-merge `updates` into the manifest (remove keys in `drops`)
    * as one versioned write. A concurrent merge on other members
    * forces a re-read-and-re-merge rather than silently dropping
    * either side's entries.
    */
  private def mergeManifest(fs: FileSystem, groupDir: Path,
                            updates: Map[String, String],
                            drops: Set[String] = Set.empty): Unit = {
    var committed = false
    var attempt = 0
    while (!committed) {
      attempt += 1
      require(attempt <= 64, s"alias-group manifest at $groupDir: lost ${attempt - 1} merge races")
      committed = VersionedPointer.readVersioned(fs, groupDir) match {
        case None =>
          // first commit: CAS against "no version yet" (a racing
          // creator loses and retries down the merge path, so
          // neither side's entries are dropped)
          drops.isEmpty && updates.isEmpty ||
            VersionedPointer.writeIfAtVersion(fs, groupDir,
              encode(updates), -1L, keepHistory = ManifestHistoryKeep)
        case Some((v, cur)) =>
          VersionedPointer.writeIfAtVersion(fs, groupDir,
            encode(decode(cur) -- drops ++ updates), v, keepHistory = ManifestHistoryKeep)
      }
    }
  }

  /** Version-conditional enrollment: install the redirect ONLY at the
    * member version captured before the manifest merge. A CAS loss
    * means a standalone write landed in the window — that writer is
    * LATER than this swap, so its value is re-merged into the
    * manifest before the redirect retries at the new version (the
    * counterpart of [[setOne]]'s conditional standalone write, which
    * refuses to clobber a redirect it did not see).
    */
  private[graft] def enroll(fs: FileSystem, groupDir: Path, d: Path,
                            preVersion: Long): Unit = {
    var expect = preVersion
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      require(attempt <= 64, s"alias-group enrollment at $d: lost ${attempt - 1} races")
      val cur = VersionedPointer.readVersioned(fs, d)
      cur match {
        case Some((_, c)) if c.startsWith(Redirect) =>
          done = true // enrolled (here or in another group — see [[valueIn]])
        case other =>
          val v = other.map(_._1).getOrElse(-1L)
          other match {
            case Some((vNow, standalone)) if vNow != expect =>
              // landed after the pre-merge capture: the later writer wins
              mergeManifest(fs, groupDir, Map(keyOf(d) -> standalone))
              expect = vNow
            case _ => ()
          }
          done = VersionedPointer.writeIfAtVersion(fs, d,
            Redirect + groupDir.toString, v, keepHistory = ManifestHistoryKeep)
      }
    }
  }

  /** Drop members from the group: remove their manifest entries in
    * ONE versioned write and clear each member's redirect pointer
    * (conditionally — a member repointed concurrently is left to the
    * later writer). Group readers resolving through [[snapshot]]
    * simply stop seeing the key; a catalog dropping a collection
    * calls this so a long-lived manifest does not accrete dead
    * members that every future swap rewrites.
    */
  /** [[remove]] every manifest member whose pointer directory lies at
    * or under `prefix` — catalog drop hygiene for a collection whose
    * standing-index homes were enrolled in grouped swaps (their
    * pointer dirs vanish with the collection directory; this clears
    * the manifest keys that would otherwise accrete forever and be
    * rewritten by every future swap).
    */
  def removeUnder(fs: FileSystem, groupDir: Path, prefix: Path): Unit = {
    val p = keyOf(prefix)
    val doomed = snapshot(fs, groupDir).keySet
      .filter(k => k == p || k.startsWith(p + "/"))
    if (doomed.nonEmpty) mergeManifest(fs, groupDir, Map.empty, doomed)
  }

  def remove(fs: FileSystem, groupDir: Path, members: Seq[Path]): Unit = {
    if (members.isEmpty) return
    mergeManifest(fs, groupDir, Map.empty, members.map(keyOf).toSet)
    members.foreach { d =>
      VersionedPointer.readVersioned(fs, d) match {
        case Some((_, c)) if c == Redirect + groupDir.toString =>
          fs.delete(d, true); () // dangling redirect of a dropped member
        case _ => () // repointed/standalone/absent: not ours to clear
      }
    }
  }

  /** Repoint ONE member: through the group manifest if the member is
    * enrolled (so grouped readers stay consistent), as a plain
    * standalone pointer write otherwise. `keepHistory` applies to
    * the standalone case; manifest history is group-wide.
    */
  def setOne(fs: FileSystem, ptrDir: Path, value: String,
             keepHistory: Int = 0): Unit = {
    var done = false
    var attempt = 0
    while (!done) {
      attempt += 1
      require(attempt <= 64, s"alias setOne at $ptrDir: lost ${attempt - 1} races")
      done = VersionedPointer.readVersioned(fs, ptrDir) match {
        case Some((_, c)) if c.startsWith(Redirect) =>
          swap(fs, new Path(c.stripPrefix(Redirect)), Seq(ptrDir -> value)); true
        case other =>
          // standalone write CONDITIONAL on the version the
          // enrollment check read: an enrollment redirect landing in
          // the window fails this CAS and the retry routes through
          // the group — an unconditional write here would bury a
          // fresh redirect and permanently detach the member while
          // grouped swaps update a manifest nobody resolves through
          VersionedPointer.writeIfAtVersion(fs, ptrDir, value,
            other.map(_._1).getOrElse(-1L), keepHistory)
      }
    }
  }

  /** The group a member pointer redirects to, if enrolled. */
  def groupOf(fs: FileSystem, ptrDir: Path): Option[Path] =
    VersionedPointer.read(fs, ptrDir)
      .filter(_.startsWith(Redirect))
      .map(s => new Path(s.stripPrefix(Redirect)))

  /** The member's current value: its manifest entry if enrolled, its
    * own pointer content otherwise. For consistency ACROSS members
    * use [[snapshot]] + [[valueIn]] instead — per-member resolution
    * reads the manifest per call.
    */
  def resolveValue(fs: FileSystem, ptrDir: Path): Option[String] =
    VersionedPointer.read(fs, ptrDir).flatMap {
      case r if r.startsWith(Redirect) =>
        snapshot(fs, new Path(r.stripPrefix(Redirect))).get(keyOf(ptrDir))
      case v => Some(v)
    }

  /** Resolve a member against an already-read manifest [[snapshot]]
    * (falling back to the member's standalone pointer if it is not
    * enrolled) — the consistent-multi-read path. A member enrolled in
    * a DIFFERENT group than the snapshot's resolves through that
    * group's own manifest ([[resolveValue]] semantics) rather than
    * returning None — silently dropping the redirect would make
    * `.fold(home)` callers serve the alias-home directory itself as
    * a data path while the member's real generation keeps moving.
    */
  def valueIn(fs: FileSystem, manifest: Map[String, String],
              ptrDir: Path): Option[String] =
    manifest.get(keyOf(ptrDir)).orElse {
      VersionedPointer.read(fs, ptrDir).flatMap {
        case r if r.startsWith(Redirect) =>
          snapshot(fs, new Path(r.stripPrefix(Redirect))).get(keyOf(ptrDir))
        case v => Some(v)
      }
    }

  /** The member's past values, newest first — standalone pointers
    * answer from their own version history, enrolled members from
    * the manifest's (consecutive duplicates collapsed, so only
    * swaps that MOVED this member count) with the member's retained
    * PRE-ENROLLMENT standalone history appended after — so drain
    * grace survives the enrollment boundary.
    */
  def valueHistory(fs: FileSystem, ptrDir: Path, n: Int): Seq[String] =
    groupOf(fs, ptrDir) match {
      case Some(g) =>
        val key = keyOf(ptrDir)
        val past = VersionedPointer.history(fs, g, ManifestHistoryKeep)
          .flatMap { case (_, c) => decode(c).get(key) }
        val cur = snapshot(fs, g).get(key)
        val preEnrollment = VersionedPointer.history(fs, ptrDir, ManifestHistoryKeep)
          .map(_._2).filterNot(_.startsWith(Redirect))
        (cur.toSeq ++ past ++ preEnrollment).foldLeft(Vector.empty[String]) {
          case (acc, v) if acc.lastOption.contains(v) => acc
          case (acc, v) => acc :+ v
        }.drop(1).take(n) // drop the live value; history = superseded
      case None =>
        VersionedPointer.history(fs, ptrDir, n).map(_._2)
    }
}
