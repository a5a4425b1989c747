package graft.api

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import graft.sources.{VersionedPointer, WriterLease}

/** Multi-tenant collection lifecycle — the Weaviate tenant-state
  * machine (`HOT` / `COLD` / `OFFLOADED`; reference stack boots
  * Weaviate at /root/reference/tests/cpu/docker-compose.yml:71-86)
  * re-expressed as a partitioned at-rest layout:
  *
  *   - the collection lands under `<home>/data/tenant=<name>/…`
  *     (Spark partitionBy), so every tenant is a disjoint directory
  *     subtree and a tenant predicate prunes at the FILE LISTING —
  *     one tenant's query never lists, let alone reads, another
  *     tenant's files. At 100 TB across thousands of tenants this is
  *     the property that matters: per-tenant work is bounded by that
  *     tenant's data, not the collection's.
  *   - tenant STATUS lives in a `.tenants` [[VersionedPointer]]
  *     manifest (`name<TAB>status[<TAB>offloadPath]` lines), updated
  *     by CAS merge — concurrent status changes on different tenants
  *     both land; readers resolve one snapshot.
  *   - `HOT` serves; `COLD` keeps files in place but refuses serving
  *     (Weaviate's INACTIVE: no memory/serving cost, instant
  *     reactivation); `OFFLOADED` physically moves the tenant
  *     subtree to an offload root (cold object storage tier) and
  *     records where — reactivation moves it back.
  *
  * All mutations run under [[WriterLease.exclusive]] on the home, so
  * two driver processes cannot interleave status flips with data
  * moves. Same-filesystem moves are renames; a cross-store offload
  * would swap the rename for a copy job at the same seam.
  */
object Tenants {

  sealed abstract class Status(val wire: String)
  case object Hot extends Status("HOT")
  case object Cold extends Status("COLD")
  final case class Offloaded(location: String) extends Status("OFFLOADED")

  final case class TenantState(name: String, status: Status)

  /** One manifest entry: status plus the WRITE-TIME timestamp the
    * age-based lifecycle reads (the [[graft.sources.IndexStats]]
    * manifest lesson: record the signal at write time, never derive
    * it from a tenant-subtree listing at policy time — at thousands
    * of tenants that listing is the cost the manifest exists to
    * avoid). `lastWriteMs` = 0 for entries predating the field.
    */
  final case class Entry(status: Status, lastWriteMs: Long)

  private def fsOf(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(home: String): Path = new Path(home, ".tenants")
  private def dataDir(home: String): String = s"$home/data"
  private def tenantDir(home: String, tenant: String): Path =
    new Path(dataDir(home), s"tenant=$tenant")

  private def render(m: Map[String, Entry]): String =
    m.toSeq.sortBy(_._1).map {
      case (n, Entry(Offloaded(loc), ts)) => s"$n\tOFFLOADED\t$loc\t$ts"
      case (n, Entry(s, ts))              => s"$n\t${s.wire}\t$ts"
    }.mkString("\n")

  private def parse(s: String): Map[String, Entry] =
    s.split("\n").filter(_.nonEmpty).map { line =>
      line.split("\t") match {
        case Array(n, "HOT", ts)            => n -> Entry(Hot, ts.toLong)
        case Array(n, "COLD", ts)           => n -> Entry(Cold, ts.toLong)
        case Array(n, "OFFLOADED", loc, ts) => n -> Entry(Offloaded(loc), ts.toLong)
        // pre-timestamp manifest lines: age unknown, treated as 0
        // (epoch) so an age policy demotes them on its first cycle —
        // loud-by-default beats silently-immortal
        case Array(n, "HOT")            => n -> Entry(Hot, 0L)
        case Array(n, "COLD")           => n -> Entry(Cold, 0L)
        case Array(n, "OFFLOADED", loc) => n -> Entry(Offloaded(loc), 0L)
        case other => throw new IllegalStateException(
          s"corrupt tenant manifest line: ${other.mkString("\t")}")
      }
    }.toMap

  /** CAS-merge a manifest edit: concurrent edits touching DIFFERENT
    * tenants both land; a lost race re-reads and re-applies.
    */
  private def editManifest(fs: FileSystem, home: String)
                          (f: Map[String, Entry] => Map[String, Entry]): Unit = {
    val dir = manifestDir(home)
    var done = false
    var attempt = 0
    while (!done) {
      attempt += 1
      require(attempt <= 64, s"tenant manifest at $home: lost ${attempt - 1} merge races")
      val cur = VersionedPointer.readVersioned(fs, dir)
      val (v, m) = cur.map { case (ver, s) => (ver, parse(s)) }.getOrElse((-1L, Map.empty[String, Entry]))
      done = VersionedPointer.writeIfAtVersion(fs, dir, render(f(m)), v)
    }
  }

  /** Current tenant → status map (one small manifest read). */
  def states(spark: SparkSession, home: String): Map[String, Status] =
    entries(spark, home).map { case (n, e) => n -> e.status }

  /** Current tenant → (status, lastWrite) map — what the age-based
    * lifecycle reads.
    */
  def entries(spark: SparkSession, home: String): Map[String, Entry] =
    VersionedPointer.read(fsOf(spark, home), manifestDir(home))
      .map(parse).getOrElse(Map.empty)

  /** Create (or extend) the collection from a frame carrying a
    * `tenant` column: data lands partitioned by tenant, and every
    * tenant present in the batch is enrolled HOT. Append-mode so
    * `create` and later tenant additions are the same verb.
    */
  def write(spark: SparkSession, home: String, df: DataFrame,
            nowMs: Long = System.currentTimeMillis()): Unit =
    WriterLease.exclusive(spark, home) {
      require(df.columns.contains("tenant"),
        "Tenants.write expects a 'tenant' column to partition by")
      val names = df.select(col("tenant").cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq // bounded: one row per tenant in the batch
      df.write.mode("append").partitionBy("tenant").parquet(dataDir(home))
      // every tenant in the batch gets its write-time stamped (new
      // tenants enroll HOT); untouched tenants keep aging
      editManifest(fsOf(spark, home), home)(m => m ++ names.map(n =>
        n -> Entry(m.get(n).map(_.status).getOrElse(Hot: Status), nowMs)))
    }

  /** Serve one tenant. Only HOT tenants serve — a COLD or OFFLOADED
    * tenant fails loudly (the Weaviate "tenant not active" error)
    * instead of silently scanning a tier the operator retired.
    *
    * The scan is rooted at the tenant's OWN subtree (basePath keeps
    * the partition column): file discovery lists only that tenant's
    * directory — not "list every tenant, then prune", which at
    * thousands of tenants is a collection-sized listing per query.
    * A tenant offloaded between this check and the action surfaces
    * as a missing-path error at scan time (loud), never a silently
    * empty result.
    */
  def read(spark: SparkSession, home: String, tenant: String): DataFrame =
    states(spark, home).get(tenant) match {
      case Some(Hot) =>
        spark.read.option("basePath", dataDir(home))
          .parquet(tenantDir(home, tenant).toString)
      case Some(Cold) => throw new IllegalStateException(
        s"tenant '$tenant' is deactivated (COLD); Tenants.activate it before reading")
      case Some(Offloaded(loc)) => throw new IllegalStateException(
        s"tenant '$tenant' is OFFLOADED to $loc; Tenants.activate it before reading")
      case None => throw new IllegalArgumentException(
        s"unknown tenant '$tenant' under $home")
    }

  /** Serve every HOT tenant (the cross-tenant aggregate path): the
    * hot set's subtrees are enumerated as scan roots, so COLD and
    * OFFLOADED subtrees are never LISTED, let alone read — the
    * discovery cost is bounded by the hot tier, not the collection.
    */
  def readHot(spark: SparkSession, home: String): DataFrame = {
    val hot = states(spark, home).collect { case (n, Hot) => n }.toSeq
    if (hot.isEmpty)
      // schema-stable empty frame: scan the (possibly empty) base
      // with an always-false partition predicate
      spark.read.parquet(dataDir(home)).where(lit(false))
    else
      spark.read.option("basePath", dataDir(home))
        .parquet(hot.map(t => tenantDir(home, t).toString): _*)
  }

  /** HOT → COLD: files stay in place, serving stops, reactivation is
    * a manifest flip.
    */
  def deactivate(spark: SparkSession, home: String, tenant: String): Unit =
    WriterLease.exclusive(spark, home) {
      editManifest(fsOf(spark, home), home) { m =>
        m.get(tenant) match {
          case Some(Entry(Hot, ts)) => m.updated(tenant, Entry(Cold, ts))
          case Some(Entry(Cold, _)) => m
          case Some(Entry(o: Offloaded, _)) => throw new IllegalStateException(
            s"tenant '$tenant' is OFFLOADED to ${o.location}; activate it first")
          case None => throw new IllegalArgumentException(s"unknown tenant '$tenant'")
        }
      }
    }

  /** COLD → HOT (manifest flip), or OFFLOADED → HOT (move the
    * subtree back from the offload tier, then flip).
    */
  def activate(spark: SparkSession, home: String, tenant: String): Unit =
    WriterLease.exclusive(spark, home) {
      val fs = fsOf(spark, home)
      entries(spark, home).get(tenant) match {
        case Some(Entry(Hot, ts)) =>
          editManifest(fs, home)(_.updated(tenant, Entry(Hot, ts)))
        case Some(Entry(Cold, ts)) =>
          editManifest(fs, home)(_.updated(tenant, Entry(Hot, ts)))
        case Some(Entry(Offloaded(loc), _)) =>
          val src = new Path(loc)
          val dst = tenantDir(home, tenant)
          // crash repair: a previous activate that moved the subtree
          // home but died before the manifest flip leaves src gone
          // and dst present — only the flip remains to be done
          if (!(!fs.exists(src) && fs.exists(dst))) {
            if (!fs.rename(src, dst)) {
              // cross-filesystem offload tier: copy, then delete source
              if (!FileUtil.copy(fs, src, fs, dst, true, spark.sparkContext.hadoopConfiguration))
                throw new IllegalStateException(
                  s"failed to restore tenant '$tenant' from $loc")
            }
          }
          // restoration is a write-tier event: the tenant is hot again,
          // so its age clock restarts (otherwise the next lifecycle
          // cycle would instantly re-demote it)
          editManifest(fs, home)(m2 => m2.updated(tenant,
            Entry(Hot, System.currentTimeMillis())))
        case None => throw new IllegalArgumentException(s"unknown tenant '$tenant'")
      }
    }

  /** Move the tenant's subtree to the offload root (cold storage
    * tier) and record the location. The manifest flips AFTER the
    * move: a crash between the two leaves a moved-but-COLD/HOT
    * tenant whose next read fails on the missing dir — loud, and
    * repairable by re-running offload (idempotent on the recorded
    * location) — never a manifest pointing at data that is gone.
    */
  def offload(spark: SparkSession, home: String, tenant: String,
              offloadRoot: String): Unit =
    WriterLease.exclusive(spark, home) {
      val fs = fsOf(spark, home)
      entries(spark, home).get(tenant) match {
        case Some(Entry(Hot, ts)) =>
          doOffload(fs, home, tenant, offloadRoot, ts)
        case Some(Entry(Cold, ts)) =>
          doOffload(fs, home, tenant, offloadRoot, ts)
        case Some(Entry(Offloaded(loc), _)) =>
          if (loc != new Path(offloadRoot, tenant).toString)
            throw new IllegalStateException(
              s"tenant '$tenant' already offloaded to $loc")
        case None => throw new IllegalArgumentException(s"unknown tenant '$tenant'")
      }
    }

  private def doOffload(fs: FileSystem, home: String, tenant: String,
                        offloadRoot: String, ts: Long): Unit = {
    val src = tenantDir(home, tenant)
    val dst = new Path(offloadRoot, tenant)
    fs.mkdirs(new Path(offloadRoot))
    // crash repair: a previous offload that moved the subtree
    // but died before the manifest flip — only the flip remains
    if (!(!fs.exists(src) && fs.exists(dst)) && !fs.rename(src, dst))
      throw new IllegalStateException(
        s"failed to offload tenant '$tenant' to $dst")
    editManifest(fs, home)(_.updated(tenant, Entry(Offloaded(dst.toString), ts)))
  }

  /** Drop a tenant entirely: data deleted, manifest entry removed
    * (the AliasGroup drop-hygiene contract — no tombstone rows
    * accumulate in the manifest).
    */
  def drop(spark: SparkSession, home: String, tenant: String): Unit =
    WriterLease.exclusive(spark, home) {
      val fs = fsOf(spark, home)
      states(spark, home).get(tenant) match {
        case Some(Offloaded(loc)) => fs.delete(new Path(loc), true)
        case Some(_)              => fs.delete(tenantDir(home, tenant), true)
        case None => throw new IllegalArgumentException(s"unknown tenant '$tenant'")
      }
      editManifest(fs, home)(_ - tenant)
    }

  /** Age thresholds for [[applyLifecycle]] — the ES ILM hot→warm→cold
    * policy shape, on the verbs this lifecycle already has. A tenant's
    * age is `now − lastWriteMs` from the manifest (stamped by
    * [[write]] and reset by [[activate]]). `None` disables a rung.
    */
  final case class LifecyclePolicy(
      coldAfterMs: Option[Long] = None,
      offloadAfterMs: Option[Long] = None,
      offloadRoot: Option[String] = None) {
    require(offloadAfterMs.isEmpty || offloadRoot.nonEmpty,
      "offloadAfterMs needs an offloadRoot to move tenants to")
    require(!(coldAfterMs.isDefined && offloadAfterMs.isDefined) ||
      coldAfterMs.get <= offloadAfterMs.get,
      "coldAfterMs must not exceed offloadAfterMs (hot -> cold -> offloaded)")
  }

  /** What [[applyLifecycle]] did — one row per demotion, loggable
    * as-is into an operations table (the [[ScaleOps.MaintenanceReport]]
    * convention).
    */
  final case class LifecycleAction(tenant: String, action: String, reason: String)

  /** The age-based lifecycle cycle — the policy layer ES operators
    * run as ILM, expressed on the existing verbs: every tenant idle
    * past `coldAfterMs` is [[deactivate]]d (files stay, serving
    * stops), and past `offloadAfterMs` is [[offload]]ed to the cold
    * tier. One manifest read decides everything (no tenant-subtree
    * listing — the write-time timestamp IS the signal), and the whole
    * cycle runs under one writer lease like [[ScaleOps.maintain]], so
    * a racing lifecycle process fails loudly instead of interleaving
    * moves. Pass `nowMs` explicitly for deterministic tests/replays.
    */
  def applyLifecycle(spark: SparkSession, home: String, policy: LifecyclePolicy,
                     nowMs: Long = System.currentTimeMillis()): Seq[LifecycleAction] =
    WriterLease.exclusive(spark, home) {
      entries(spark, home).toSeq.sortBy(_._1).flatMap {
        case (_, Entry(Offloaded(_), _)) => None // already on the coldest tier
        case (name, Entry(status, ts)) =>
          val age = nowMs - ts
          (status, policy.offloadAfterMs, policy.coldAfterMs) match {
            case (_, Some(off), _) if age >= off =>
              offload(spark, home, name, policy.offloadRoot.get)
              Some(LifecycleAction(name, "offloaded",
                s"idle ${age}ms >= ${off}ms"))
            case (Hot, _, Some(cold)) if age >= cold =>
              deactivate(spark, home, name)
              Some(LifecycleAction(name, "deactivated",
                s"idle ${age}ms >= ${cold}ms"))
            case _ => None
          }
      }
    }
}
