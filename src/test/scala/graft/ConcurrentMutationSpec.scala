package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.spark.sql.functions._
import graft.api.TextIndex
import graft.operators.{IndexCache, VectorIndex}
import graft.sources.IndexAlias

/** The concurrent-mutation contract (the README table, executable):
  *
  *  - append ∥ append, append ∥ delete, append ∥ setPayload, and
  *    delete ∥ delete commute — every batch lands, and the final
  *    served state equals a serial replay (tombstones and payload
  *    overlay by id, so write interleaving is irrelevant);
  *  - setPayload ∥ setPayload serialize on the per-index mutation
  *    lock: every batch gets a DISTINCT sequence stamp, so
  *    latest-wins stays deterministic instead of tie-breaking on a
  *    duplicated seq;
  *  - text-index delete ∥ delete of an overlapping id set serialize
  *    the same way: the id's df/n_docs contribution is subtracted
  *    exactly once, and scores equal a rebuild-without;
  *  - compact and retrain/rotate are MAINTENANCE verbs: one owner at
  *    a time, quiesced writers (their read-rewrite-swap would lose a
  *    racing batch) — the serialized sequences are pinned by
  *    VectorIndexSpec/IndexStatsSpec, the alias swap under concurrent
  *    writers by RotationSpec's VersionedPointer race specs.
  */
class ConcurrentMutationSpec extends SparkSpec {

  private def runAll(tasks: Seq[() => Unit]): Unit = {
    val pool = Executors.newFixedThreadPool(tasks.size)
    val start = new CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    tasks.foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try t() catch { case e: Throwable => errors.add(e) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "mutators did not drain")
    assert(errors.isEmpty, s"mutator failures: ${errors.toArray.mkString("; ")}")
  }

  test("vector index: concurrent append ∥ delete ∥ setPayload converge to the serial outcome") {
    import spark.implicits._
    val corpus = Tables.embeddings(spark, sfDir)
    val meta = {
      val p = VectorIndex.sessionIndexPath(spark, sfDir)
      VectorIndex.readMeta(spark, p)
    }
    val pC = IndexCache.tempDir("graft-conc-vec") + "/idx"
    val pRef = IndexCache.tempDir("graft-conc-ref") + "/idx"
    VectorIndex.writeCorpus(spark, corpus, pC, meta)

    val appendBatch = corpus.limit(40)
      .select((col("vec_id") + 880000L).as("vec_id"), col("embedding"), col("label"))
      .localCheckpoint()
    val victims = corpus.select("vec_id").orderBy("vec_id").limit(6)
      .collect().map(_.getLong(0)).toSeq
    val payloadIds = corpus.select("vec_id").orderBy(col("vec_id").desc).limit(5)
      .collect().map(_.getLong(0)).toSeq

    runAll(Seq(
      () => VectorIndex.append(spark, appendBatch, pC),
      () => VectorIndex.delete(spark, pC, victims),
      () => VectorIndex.setPayload(spark, pC,
        payloadIds.map(id => (id, 77)).toDF("vec_id", "label"))))

    // reference: the same three mutations applied serially
    VectorIndex.writeCorpus(spark, corpus, pRef, meta)
    VectorIndex.append(spark, appendBatch, pRef)
    VectorIndex.delete(spark, pRef, victims)
    VectorIndex.setPayload(spark, pRef,
      payloadIds.map(id => (id, 77)).toDF("vec_id", "label"))

    val q = graft.operators.VectorSearch.querySet(spark, sfDir)
    def canon(p: String) = VectorIndex.searchIvf(spark, p, q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(canon(pC) == canon(pRef), "concurrent != serial")
    val (_, filt) = VectorIndex.searchIvfFiltered(spark, pC, q,
      col("label") === 77, bruteForceLimit = 1000000L)
    assert(filt.select("vec_id").distinct().count() == payloadIds.size.toLong)
  }

  test("vector index: racing setPayload batches get distinct seq stamps; latest wins deterministically") {
    import spark.implicits._
    val corpus = Tables.embeddings(spark, sfDir)
    val meta = VectorIndex.readMeta(spark, VectorIndex.sessionIndexPath(spark, sfDir))
    val pS = IndexCache.tempDir("graft-conc-seq") + "/idx"
    VectorIndex.writeCorpus(spark, corpus, pS, meta)
    val id = corpus.select("vec_id").orderBy("vec_id").limit(1).collect()(0).getLong(0)

    runAll((0 until 6).map { i =>
      () => VectorIndex.setPayload(spark, pS, Seq((id, 9000 + i)).toDF("vec_id", "label"))
    })
    val deltas = spark.read.parquet(s"$pS/payload").collect()
      .map(r => (r.getAs[Long]("seq"), r.getAs[Int]("label")))
    assert(deltas.length == 6)
    assert(deltas.map(_._1).distinct.length == 6,
      s"duplicate seq stamps: ${deltas.sorted.toSeq}")
    // the served label is the max-seq batch's label — a real label of
    // the race, not a torn mix
    val winner = deltas.maxBy(_._1)._2
    val q = graft.operators.VectorSearch.querySet(spark, sfDir)
    val (_, res) = VectorIndex.searchIvfFiltered(spark, pS, q,
      col("label") === winner, bruteForceLimit = 1000000L)
    assert(res.select("vec_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(id))
  }

  test("text index: concurrent overlapping deletes subtract each id's stats exactly once") {
    import spark.implicits._
    val home = IndexCache.tempDir("graft-conc-text") + "/tix"
    val docs = (0L to 59L).map(i => (i, s"alpha bravo tok$i shared words"))
      .toDF("doc_id", "text").localCheckpoint()
    TextIndex.rotate(docs, home)
    val live = IndexAlias.resolve(spark, home)

    // two deleters with OVERLAPPING victim sets (ids 10-19 in both)
    val d1 = docs.filter(col("doc_id").between(0, 19)).localCheckpoint()
    val d2 = docs.filter(col("doc_id").between(10, 29)).localCheckpoint()
    runAll(Seq(
      () => TextIndex.delete(d1, live),
      () => TextIndex.delete(d2, live)))

    // reference: rebuild without ids 0-29
    val ref = IndexCache.tempDir("graft-conc-text-ref") + "/tix"
    TextIndex.rotate(docs.filter(col("doc_id") > 29), ref)
    val got = TextIndex.bm25AtRest(spark, home, Seq("alpha", "shared")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"))).sorted.toSeq
    val want = TextIndex.bm25AtRest(spark, ref, Seq("alpha", "shared")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("bm25"))).sorted.toSeq
    assert(got == want, "overlapping concurrent deletes drifted from rebuild-without")
    assert(got.nonEmpty && got.forall(_._1 > 29))
  }
}
