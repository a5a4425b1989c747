package graft.sources

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.SparkSession

/** Snapshot/restore for the STANDING indexes — the compliance
  * counterpart of [[CollectionCatalog.snapshot]] (ES snapshots cover
  * indexes; Qdrant snapshots collections WITH their indexes). A
  * snapshot copies the live layout's top-level tables — including
  * the PENDING state: tombstones, payload deltas, negative df/stats
  * rows — so restore replays to the exact logical point, not just
  * the last compaction. Snapshots are plain directories under the
  * index home's `.snapshots/<n>`; on an object store this is a
  * prefix copy (or a file manifest under an immutable-file ingest
  * discipline — the native engines' zero-copy snapshot trick).
  *
  * Restore is generation-aware:
  *  - a ROTATING home ([[IndexAlias]]) restores by materializing the
  *    snapshot as the NEXT GENERATION and atomically repointing —
  *    zero-downtime, readers flow throughout, and session caches
  *    (keyed by the concrete generation path) cache-miss onto the
  *    restored state with no invalidation protocol;
  *  - a concrete path restores write-aside into a dot-dir, then
  *    swaps the layout's tables in, and explicitly invalidates the
  *    vector index's session caches for that path.
  *
  * Works for all four standing layouts (vector, text, MinHash-dedup,
  * duplicate-cluster) because each is a self-contained directory of
  * parquet subtables — the snapshot does not interpret them.
  */
object IndexSnapshot {

  private def fsOf(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapRoot(pathOrHome: String): Path =
    new Path(pathOrHome, ".snapshots")

  /** The layout's top-level tables: every non-dot child (dot-dirs
    * are system state — pointers, snapshots, in-flight compactions —
    * never part of the index itself).
    */
  private def tables(fs: FileSystem, dir: Path): Seq[Path] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(_.getPath)
      .filterNot(_.getName.startsWith(".")).toSeq

  private def copyInto(spark: SparkSession, fs: FileSystem,
                       from: Path, to: Path): Unit = {
    fs.mkdirs(to)
    tables(fs, from).foreach { t =>
      FileUtil.copy(fs, t, fs, new Path(to, t.getName), false,
        spark.sparkContext.hadoopConfiguration)
    }
  }

  /** Snapshot the live index state (pending tombstones and deltas
    * included). Returns the snapshot id.
    */
  def create(spark: SparkSession, pathOrHome: String): String = {
    val fs = fsOf(spark, pathOrHome)
    val live = new Path(IndexAlias.resolve(spark, pathOrHome))
    fs.mkdirs(snapRoot(pathOrHome))
    val n = fs.listStatus(snapRoot(pathOrHome)).count(_.isDirectory)
    copyInto(spark, fs, live, new Path(snapRoot(pathOrHome), n.toString))
    n.toString
  }

  /** Snapshot ids available for the index, oldest first. */
  def list(spark: SparkSession, pathOrHome: String): Seq[String] = {
    val fs = fsOf(spark, pathOrHome)
    if (!fs.exists(snapRoot(pathOrHome))) Nil
    else fs.listStatus(snapRoot(pathOrHome)).filter(_.isDirectory)
      .map(_.getPath.getName).toSeq.sortBy(_.toInt)
  }

  /** Restore the index to snapshot `id`. */
  def restore(spark: SparkSession, pathOrHome: String, id: String): Unit = {
    val fs = fsOf(spark, pathOrHome)
    val src = new Path(snapRoot(pathOrHome), id)
    require(fs.exists(src), s"no such index snapshot: $pathOrHome @ $id")
    // restore is a maintenance verb like compact/rotate: fenced
    // against a second writer process (the `.lease` dir is a dot-dir,
    // so neither restore branch's table swap touches it)
    WriterLease.exclusive(spark, pathOrHome) {
    if (IndexAlias.installed(spark, pathOrHome)) {
      // rebuild-aside + swap: the restored state becomes the next
      // generation; in-flight readers drain on the old one
      val next = IndexAlias.nextGenerationPath(spark, pathOrHome)
      copyInto(spark, fs, src, new Path(next))
      // the restored generation needs its own write-time stats
      // manifest (copyInto moves tables, not dot-state)
      IndexStats.refreshManifest(spark, next,
        tables(fs, new Path(next)).map(_.getName))
      IndexAlias.set(spark, pathOrHome, next)
    } else {
      val tmp = new Path(pathOrHome, ".restore")
      fs.delete(tmp, true)
      copyInto(spark, fs, src, tmp)
      tables(fs, new Path(pathOrHome)).foreach(t => fs.delete(t, true))
      tables(fs, tmp).foreach(t =>
        fs.rename(t, new Path(pathOrHome, t.getName)))
      fs.delete(tmp, true)
      // an in-place restore changes what reads at this path must see
      graft.operators.VectorIndex.invalidate(spark, pathOrHome)
      // re-derive the stats manifest from the restored tables (the
      // snapshot is kind-agnostic: list what actually came back)
      IndexStats.refreshManifest(spark, pathOrHome,
        tables(fs, new Path(pathOrHome)).map(_.getName))
    }
    }
  }
}
