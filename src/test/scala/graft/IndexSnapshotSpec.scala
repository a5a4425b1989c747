package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.TextIndex
import graft.operators.{Dedup, IndexCache, VectorIndex, VectorSearch}
import graft.sources.{IndexAlias, IndexSnapshot}

/** Snapshot/restore for the standing indexes — the compliance story's
  * other half next to delete/compact: a snapshot captures the exact
  * logical state INCLUDING pending tombstones and deltas, and restore
  * replays to that point no matter what deletes/compactions happened
  * since.
  */
class IndexSnapshotSpec extends SparkSpec {

  private def queries = VectorSearch.querySet(spark, sfDir)

  private def canon(df: DataFrame) =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"),
      r.getAs[Long]("rn"), r.getAs[Double]("score"))).sortBy(t => (t._1, t._3)).toSeq

  private def families(p: String) = Seq(
    "ivf" -> VectorIndex.searchIvf(spark, p, queries),
    "pq" -> VectorIndex.searchPq(spark, p, queries),
    "ivfpq" -> VectorIndex.searchIvfPq(spark, p, queries),
    "sq8" -> VectorIndex.searchSq8(spark, p, queries),
    "bq" -> VectorIndex.searchBq(spark, p, queries),
    "lsh" -> VectorIndex.searchLsh(spark, p, queries))

  test("vector index: snapshot captures pending tombstones; restore rewinds later deletes and compactions") {
    val meta = VectorIndex.readMeta(spark, VectorIndex.sessionIndexPath(spark, sfDir))
    val p = IndexCache.tempDir("graft-snap-vec") + "/idx"
    VectorIndex.writeCorpus(spark, Tables.embeddings(spark, sfDir), p, meta)
    // first delete stays PENDING (no compact) — the snapshot must
    // carry the tombstones, not just the base files
    val all = VectorIndex.searchIvf(spark, p, queries)
      .select(col("vec_id")).collect().map(_.getLong(0)).distinct
    val (victims1, victims2) = (all.take(3).toSeq, all.drop(3).take(3).toSeq)
    VectorIndex.delete(spark, p, victims1)
    val atSnapshot = families(p).map { case (n, df) => n -> canon(df) }
    val id = IndexSnapshot.create(spark, p)
    // post-snapshot history to rewind: more deletes, then a compact
    // that rewrites files and clears tombstones
    VectorIndex.delete(spark, p, victims2)
    VectorIndex.compact(spark, p)
    assert(families(p).map { case (n, df) => n -> canon(df) } != atSnapshot)
    IndexSnapshot.restore(spark, p, id)
    val restored = families(p).map { case (n, df) => n -> canon(df) }
    restored.zip(atSnapshot).foreach { case ((n, r), (_, s)) =>
      assert(r == s, s"family $n differs after restore")
      assert(r.forall(t => !victims1.contains(t._2)),
        s"family $n serves an id tombstoned before the snapshot")
    }
    assert(restored.exists(_._2.exists(t => victims2.contains(t._2))),
      "post-snapshot deletes were not rewound")
    assert(IndexSnapshot.list(spark, p) == Seq(id))
  }

  test("rotating home: restore lands as a fresh generation behind the alias") {
    val home = IndexCache.tempDir("graft-snap-rot") + "/vix"
    VectorIndex.buildRotating(spark, Tables.embeddings(spark, sfDir), home)
    val gen0 = IndexAlias.resolve(spark, home)
    val pre = families(home).map { case (n, df) => n -> canon(df) }
    val id = IndexSnapshot.create(spark, home)
    val victims = pre.head._2.take(3).map(_._2)
    VectorIndex.delete(spark, home, victims)
    assert(families(home).map { case (n, df) => n -> canon(df) } != pre)
    IndexSnapshot.restore(spark, home, id)
    // the restore is a generation swap, not an in-place rewrite: the
    // damaged generation still exists for in-flight readers
    assert(IndexAlias.resolve(spark, home) != gen0)
    assert(IndexAlias.generations(spark, home).size == 2)
    assert(families(home).map { case (n, df) => n -> canon(df) } == pre)
  }

  test("text index: snapshot -> delete+compact -> restore yields the pre-delete scores") {
    import spark.implicits._
    val docs = (0L until 30L).map(i =>
      (i, s"alpha bravo charlie token$i delta echo")).toDF("doc_id", "text")
    val p = IndexCache.tempDir("graft-snap-text") + "/tix"
    TextIndex.write(docs, p)
    def scores() = TextIndex.bm25AtRest(spark, p, Seq("alpha", "bravo"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val pre = scores()
    val id = IndexSnapshot.create(spark, p)
    TextIndex.delete(docs.filter(col("doc_id") < 10), p)
    TextIndex.compact(spark, p)
    assert(scores().size == 20)
    IndexSnapshot.restore(spark, p, id)
    assert(scores() == pre)
  }

  test("dedup index: restore brings back a compacted-away standing doc") {
    import spark.implicits._
    val docs = (0L until 20L).map(i =>
      (i, s"kilo lima mike token$i november oscar papa quebec")).toDF("doc_id", "text")
    val p = IndexCache.tempDir("graft-snap-dedup") + "/dix"
    Dedup.writeMinhashIndex(docs, p)
    val probe = Seq((9000L, "kilo lima mike token5 november oscar papa quebec"))
      .toDF("doc_id", "text")
    assert(Dedup.dedupAgainstIndex(spark, probe, p).count() >= 1)
    val id = IndexSnapshot.create(spark, p)
    Dedup.deleteFromMinhashIndex(spark, Seq(5L), p)
    Dedup.compactMinhashIndex(spark, p)
    assert(Dedup.dedupAgainstIndex(spark, probe,
      p).filter(col("doc_a") === 5L || col("doc_b") === 5L).count() == 0)
    IndexSnapshot.restore(spark, p, id)
    assert(Dedup.dedupAgainstIndex(spark, probe,
      p).filter(col("doc_a") === 5L || col("doc_b") === 5L).count() >= 1)
  }

  test("cluster index: restore rewinds a takedown + compaction to the snapshot membership") {
    import spark.implicits._
    // docs 0/1 exact copies, 2/3 exact copies, rest unique — two
    // 2-member clusters
    val docs = (0L until 12L).map { i =>
      val text = if (i == 1L) "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
        else if (i == 0L) "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
        else if (i == 3L || i == 2L) "kilo lima mike november oscar papa quebec romeo sierra tango"
        else s"uniform unique$i words$i here$i that$i never$i collide$i with$i others$i token$i"
      (i, text)
    }.toDF("doc_id", "text")
    val p = IndexCache.tempDir("graft-snap-cluster") + "/cix"
    Dedup.writeClusterIndex(docs, p)
    def members(): Set[(Long, Long)] = Dedup.readClusterIndex(spark, p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = members()
    assert(before.map(_._1) == Set(0L, 1L, 2L, 3L))
    val id = IndexSnapshot.create(spark, p)
    // takedown doc 0 (a min-id member: relabels its cluster), then
    // fold the tombstones physically — the snapshot is kind-agnostic
    // and must capture the cluster layout like its three siblings
    Dedup.deleteFromClusterIndex(spark, Seq(0L), p)
    Dedup.compactClusterIndex(spark, p)
    val after = members()
    assert(!after.exists(_._1 == 0L) && after != before)
    IndexSnapshot.restore(spark, p, id)
    assert(members() == before,
      s"restored membership diverged: got ${members()}, want $before")
  }
}
