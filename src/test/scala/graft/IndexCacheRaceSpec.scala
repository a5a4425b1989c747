package graft

import java.util.concurrent.{CountDownLatch, CyclicBarrier, Executors, TimeUnit}
import graft.operators.IndexCache

/** Concurrent-serving contract of the session index cache — the
  * deployment profile the cache exists for (a long-lived process
  * answering many requests on several threads) rather than the
  * serialized request patterns the unit cases exercise:
  *
  *  - STANDING frames (pinned) must never lose their checkpoint
  *    blocks, whatever [[IndexCache.releaseTransients]] /
  *    [[IndexCache.dropMatching]] interleaving runs — a
  *    localCheckpoint has no lineage, so a lost block is an
  *    unrecoverable job failure, not a recompute;
  *  - a frame INVALIDATED mid-request (a mutation bumped the epoch
  *    and un-pinned it) must survive until the in-flight request's
  *    boundary: retired pins get one release-cycle of drain grace
  *    before their blocks are reclaimed;
  *  - builds registering pins are safe concurrently with release
  *    (the pin-window read-write lock).
  */
class IndexCacheRaceSpec extends SparkSpec {

  test("an invalidated frame survives release cycles through its drain grace, then is reclaimed") {
    val df = IndexCache.materialized(spark, "race-grace#e0") {
      spark.range(40000).toDF("id")
    }
    assert(df.count() == 40000)
    // a mutation invalidates the frame while THIS request still
    // holds it (the epoch-bump pattern every mutation verb uses)
    IndexCache.dropMatching("race-grace#e0")
    // release hygiene fires — repeatedly — inside the grace window:
    // the retired frame's blocks must survive every one of them
    (1 to 3).foreach(_ => IndexCache.releaseTransients(spark))
    assert(df.count() == 40000,
      "invalidated frame lost its blocks before the in-flight request drained")
    // grace elapsed (forced with graceMs = 0): the blocks are
    // reclaimed now (the frame is unreachable by key — a new request
    // builds the next epoch). Only assert reclamation; df is dead.
    val dropped = IndexCache.releaseTransients(spark, graceMs = 0L)
    assert(dropped >= 1, "retired frame was never reclaimed")
  }

  test("targeted releaseIds alone reclaims retired frames once their grace elapses") {
    val df = IndexCache.materialized(spark, "race-targeted#e0") {
      spark.range(20000).toDF("id")
    }
    assert(df.count() == 20000)
    IndexCache.dropMatching("race-targeted#e0") // retire the frame
    // inside the grace window the targeted hygiene must NOT touch it
    assert(IndexCache.releaseIds(spark, Set.empty) == 0)
    assert(df.count() == 20000, "retired frame reclaimed inside its grace window")
    // grace elapsed: a workload that only ever runs the targeted
    // hygiene (an iterative operator freeing its own rounds) still
    // reclaims the retired frame — it must not stay cached until
    // session end waiting for a full releaseTransients
    val dropped = IndexCache.releaseIds(spark, Set.empty, graceMs = 0L)
    assert(dropped >= 1, "retired frame not reclaimed by targeted hygiene after grace")
  }

  test("REAL maintenance: serving threads survive live maintain cycles plus release hygiene") {
    import org.apache.spark.sql.functions._
    import graft.api.ScaleOps
    import graft.operators.VectorIndex
    // a rotating vector index served by two query threads while a
    // maintenance thread runs REAL compact cycles (debt -> maintain
    // compacts -> new generation -> prune keep=1) and a hygiene
    // thread fires releaseTransients — the deployment loop end to
    // end, not a simulation: every query must answer, no
    // lost-checkpoint failures, no torn generation reads
    val home = graft.operators.IndexCache.tempDir("graft-race-maintain") + "/vix"
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    VectorIndex.buildRotating(spark, corpus, home)
    // lineage-backed on purpose: a bare localCheckpoint here would be
    // a TRANSIENT held across release boundaries — the one thing the
    // release contract forbids (and the hygiene thread would prove
    // it by dropping its blocks mid-query)
    val q = Tables.embeddings(spark, sfDir).limit(8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    def server = new Runnable {
      def run(): Unit = {
        start.await()
        try while (!stop.get()) {
          val n = VectorIndex.searchIvf(spark, home, q).count()
          assert(n > 0, "serving query answered empty mid-maintenance")
        } catch { case e: Throwable => errors.add(e) }
      }
    }
    val maintainer = new Runnable {
      def run(): Unit = {
        start.await()
        try {
          (1 to 3).foreach { i =>
            VectorIndex.delete(spark, home, Seq(i.toLong))
            val r = ScaleOps.maintain(spark, "vector", home,
              ScaleOps.MaintenancePolicy(maxDebtRows = 1L))
            assert(r.action == "compacted", s"cycle $i: $r")
            Thread.sleep(300L) // in-flight queries drain within a cycle
          }
        } catch { case e: Throwable => errors.add(e) }
        finally stop.set(true)
      }
    }
    val hygiene = new Runnable {
      def run(): Unit = {
        start.await()
        try while (!stop.get()) {
          graft.operators.IndexCache.releaseTransients(spark)
          Thread.sleep(50L)
        } catch { case e: Throwable => errors.add(e) }
      }
    }
    pool.submit(server); pool.submit(server)
    pool.submit(maintainer); pool.submit(hygiene)
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "maintain race pool did not drain")
    assert(errors.isEmpty,
      s"serving under maintenance failed: ${errors.toArray.take(3).mkString("; ")}")
    // post-churn: the index serves the post-delete state
    val got = VectorIndex.searchIvf(spark, home, q).collect()
    assert(got.nonEmpty &&
      !got.exists(r => Seq(1L, 2L, 3L).contains(r.getAs[Long]("vec_id"))))
  }

  test("standing frames never recompute-fail under mixed serving, builds, invalidation, and release") {
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = Executors.newFixedThreadPool(5)
    val start = new CountDownLatch(1)
    val stopBuilders = new java.util.concurrent.atomic.AtomicBoolean(false)
    // the long-lived standing frame every request touches
    val standingKey = "race-std#A"
    val standing = IndexCache.materialized(spark, standingKey) {
      spark.range(100000).toDF("id")
    }
    assert(standing.count() == 100000)

    // two request threads: each request queries the standing frame,
    // builds+consumes a transient, then meets the other at the
    // request boundary where ONE of them runs the release hygiene —
    // the serving loop's contract, on two threads
    val boundary = new CyclicBarrier(2)
    def requester(id: Int) = new Runnable {
      def run(): Unit = {
        start.await()
        try {
          (1 to 40).foreach { _ =>
            val s = IndexCache.materialized(spark, standingKey) {
              spark.range(100000).toDF("id")
            }
            assert(s.count() == 100000, "standing frame served a wrong count")
            val transient = spark.range(5000).toDF("t").localCheckpoint()
            assert(transient.count() == 5000)
            boundary.await(60, TimeUnit.SECONDS)
            if (id == 0) IndexCache.releaseTransients(spark)
            boundary.await(60, TimeUnit.SECONDS)
          }
        } catch { case e: Throwable => errors.add(e); boundary.reset() }
      }
    }
    // a builder thread registering NEW standing frames concurrently
    // with the release cycles (the pin-window race)
    val builder = new Runnable {
      def run(): Unit = {
        start.await()
        try {
          var i = 0
          while (!stopBuilders.get()) {
            i += 1
            val key = s"race-std#build-$i"
            val b = IndexCache.materialized(spark, key) {
              spark.range(20000).toDF("id")
            }
            assert(b.count() == 20000, s"fresh standing frame $key lost its checkpoint")
            IndexCache.dropMatching(key) // retire it; grace + later release reclaim
          }
        } catch { case e: Throwable => errors.add(e) }
      }
    }
    // an invalidation thread living the epoch-bump life of a mutated
    // index: build epoch e, serve it, invalidate, next epoch
    val invalidator = new Runnable {
      def run(): Unit = {
        start.await()
        try {
          var e = 0
          while (!stopBuilders.get()) {
            val key = s"race-inv#e$e"
            val f = IndexCache.materialized(spark, key) {
              spark.range(30000).toDF("id")
            }
            assert(f.count() == 30000, s"epoch frame $key failed while live")
            IndexCache.dropMatching(key)
            // the frame stays usable through the mutation's own
            // request (grace covers the release hygiene racing us)
            assert(f.count() == 30000, s"epoch frame $key died inside its own request")
            e += 1
          }
        } catch { case e: Throwable => errors.add(e) }
      }
    }

    val reqs = Seq(pool.submit(requester(0)), pool.submit(requester(1)))
    pool.submit(builder); pool.submit(invalidator)
    start.countDown()
    reqs.foreach(_.get(300, TimeUnit.SECONDS))
    stopBuilders.set(true)
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "race pool did not drain")
    assert(errors.isEmpty,
      s"concurrent serving failed: ${errors.toArray.take(3).mkString("; ")}")
    // and the standing frame is STILL alive after all the churn
    assert(IndexCache.materialized(spark, standingKey) {
      spark.range(100000).toDF("id")
    }.count() == 100000)
    IndexCache.dropMatching("race-std#")
    IndexCache.dropMatching("race-inv#")
    IndexCache.releaseTransients(spark)
  }

  test("pinned standing frames serve with a data-sized dispatch width") {
    // a tiny corpus checkpointed over a wide build must NOT make every
    // serving job dispatch one task per near-empty partition (the
    // measured 0.1-0.2 s flat tax on the at-rest serving family); the
    // width floor keeps per-row serving work parallel, and the width
    // can never EXCEED the build's own partition count (a cluster-
    // scale pinned corpus is never downsized by the floor)
    val wide = IndexCache.materialized(spark, "width-probe#e0") {
      spark.range(0, 50000, 1, 32).toDF("id")
    }
    val parts = wide.rdd.getNumPartitions
    assert(parts <= 8, s"tiny pinned frame still dispatches $parts tasks")
    assert(parts >= 1)
    assert(wide.count() == 50000) // content intact through the coalesce
    // distinctness survives (no row loss/duplication)
    assert(wide.distinct().count() == 50000)
    IndexCache.dropMatching("width-probe#")
    IndexCache.releaseTransients(spark)
  }
}
