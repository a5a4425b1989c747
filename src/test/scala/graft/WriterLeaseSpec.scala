package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.{IndexCache, VectorIndex}
import graft.sources.{VersionedPointer, WriterLease}

/** Cross-process writer fencing (the round-7 gap: every other guard
  * is same-JVM). Two processes are simulated by two distinct lease
  * OWNER identities driving the protocol directly — the lease
  * arbitration is pure filesystem state, so identity is the only
  * thing that distinguishes processes from its point of view.
  */
class WriterLeaseSpec extends SparkSpec {

  private def fsFor(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshHome(tag: String): String =
    IndexCache.tempDir(s"graft-lease-$tag") + "/ix"

  test("a live foreign lease refuses mutation verbs; an expired one is stolen") {
    import spark.implicits._
    val home = freshHome("verbs")
    val fs = fsFor(home)
    VectorIndex.buildFrom(spark,
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"), col("label")), home)

    // "another driver process" holds the lease (live, long TTL)
    val foreign = WriterLease.acquire(fs, home, ownerId = "other@999",
      ttlMs = 60000L, settleMs = 0L)
    val ex = intercept[WriterLease.ConcurrentWriterException] {
      VectorIndex.setPayload(spark, home,
        Seq((0L, 5)).toDF("vec_id", "label"))
    }
    assert(ex.getMessage.contains("other@999"))
    // delete and compact refuse the same way
    intercept[WriterLease.ConcurrentWriterException] {
      VectorIndex.delete(spark, home, Seq(1L))
    }
    intercept[WriterLease.ConcurrentWriterException] {
      VectorIndex.compact(spark, home)
    }

    // the foreign process dies without releasing: once the lease
    // EXPIRES, the next writer steals it and mutation proceeds
    WriterLease.release(fs, foreign)
    val dead = WriterLease.acquire(fs, home, ownerId = "dead@1000",
      ttlMs = 50L, settleMs = 0L)
    Thread.sleep(80L)
    VectorIndex.setPayload(spark, home, Seq((0L, 5)).toDF("vec_id", "label"))
    // ... and the dead process's token no longer checks out (fenced)
    assert(!WriterLease.check(fs, dead))
  }

  test("fencing: a paused holder's token fails check after takeover; its release is a no-op") {
    val home = freshHome("fence")
    val fs = fsFor(home)
    val a = WriterLease.acquire(fs, home, ownerId = "A@1",
      ttlMs = 40L, settleMs = 0L)
    assert(WriterLease.check(fs, a))
    Thread.sleep(70L) // A pauses past its TTL (GC pause / network stall)
    val b = WriterLease.acquire(fs, home, ownerId = "B@2",
      ttlMs = 60000L, settleMs = 0L)
    // A resumes: its fencing token is dead, so its commit must abort
    assert(!WriterLease.check(fs, a))
    assert(WriterLease.check(fs, b))
    // A's release must not clobber B's live lease
    WriterLease.release(fs, a)
    assert(WriterLease.check(fs, b))
    // renew keeps B's ownership through a longer mutation
    val b2 = WriterLease.renew(fs, b)
    assert(WriterLease.check(fs, b2) && !WriterLease.check(fs, b))
    WriterLease.release(fs, b2)
    // after release the lease is free for anyone
    val c = WriterLease.acquire(fs, home, ownerId = "C@3", settleMs = 0L)
    WriterLease.release(fs, c)
  }

  test("acquire race between two owners grants at most one lease per round") {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      (1 to 25).foreach { i =>
        val home = freshHome(s"race$i")
        val start = new java.util.concurrent.CountDownLatch(1)
        def claim(owner: String) = pool.submit(
          new java.util.concurrent.Callable[Option[WriterLease.Token]] {
            def call(): Option[WriterLease.Token] = {
              start.await()
              val fs = fsFor(home)
              try Some(WriterLease.acquire(fs, home, ownerId = owner,
                settleMs = WriterLease.DefaultSettleMs))
              catch { case _: WriterLease.ConcurrentWriterException => None }
            }
          })
        val (fa, fb) = (claim("A@1"), claim("B@2"))
        start.countDown()
        val (ra, rb) = (fa.get(), fb.get())
        val fs = fsFor(home)
        // the grant test: a surviving token must still CHECK — and
        // two tokens can never both check against one pointer
        val holders = Seq(ra, rb).flatten.filter(WriterLease.check(fs, _))
        assert(holders.size <= 1,
          s"round $i granted both: ${Seq(ra, rb).flatten.map(_.owner)}")
      }
    } finally pool.shutdown()
  }

  test("nested verbs ride the outer exclusive lease instead of freeing it mid-flight") {
    val home = freshHome("nested")
    val fs = fsFor(home)
    val out = WriterLease.exclusive(spark, home) {
      val inner = WriterLease.exclusive(spark, home) { 42 }
      // the nested exit must NOT have released the outer lease
      val lease = VersionedPointer.read(fs, new Path(home, ".lease"))
      assert(lease.exists(_.startsWith("held ")), s"lease mid-flight: $lease")
      inner
    }
    assert(out == 42)
    // after the outer exit the lease is free
    val after = VersionedPointer.read(fs, new Path(home, ".lease"))
    assert(after.exists(_.startsWith("free ")), s"lease after exit: $after")
  }

  test("renewHeld extends an exclusive's lease from inside the body; errors outside one") {
    val home = freshHome("renew")
    val fs = fsFor(home)
    val r = WriterLease.exclusive(spark, home, ttlMs = 150L) {
      Thread.sleep(60L)
      WriterLease.renewHeld(spark, home, ttlMs = 60000L)
      Thread.sleep(150L) // well past the ORIGINAL expiry
      // still the owner: the lease pointer carries the renewed claim
      val lease = VersionedPointer.read(fs, new Path(home, ".lease"))
      assert(lease.exists(_.startsWith("held ")), s"lease: $lease")
      7
    } // the exit fencing check must pass against the RENEWED token
    assert(r == 7)
    intercept[WriterLease.ConcurrentWriterException] {
      WriterLease.renewHeld(spark, home) // no exclusive block -> error
    }
  }

  test("a REAL second JVM holding the lease refuses this process's mutation (no simulation)") {
    import spark.implicits._
    val home = freshHome("realproc")
    val fs = fsFor(home)
    VectorIndex.buildFrom(spark,
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"), col("label")), home)

    // launch an independent JVM (same classpath, no Spark inside)
    // that acquires the lease on the shared home and holds it
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val proc = new ProcessBuilder(
      java, "-cp", cp, "graft.sources.LeaseHolderMain", home, "8000")
      .redirectErrorStream(true).start()
    try {
      val heldMarker = new Path(home, ".held-marker")
      val deadline = System.currentTimeMillis() + 60000L
      while (!fs.exists(heldMarker) && System.currentTimeMillis() < deadline) {
        assert(proc.isAlive, "lease-holder process died before acquiring")
        Thread.sleep(100L)
      }
      assert(fs.exists(heldMarker), "lease-holder process never acquired")

      // while the OTHER PROCESS holds the lease, this process's
      // mutation verbs refuse — the cross-process contract, for real
      val ex = intercept[WriterLease.ConcurrentWriterException] {
        VectorIndex.setPayload(spark, home,
          Seq((0L, 9)).toDF("vec_id", "label"))
      }
      assert(ex.getMessage.contains("ext@"), ex.getMessage)
    } finally {
      proc.destroyForcibly()
      proc.waitFor()
    }
    // the holder was killed without releasing: its lease EXPIRES and
    // the next writer steals it (crash recovery); shorten the wait by
    // breaking the lease the way an operator would
    graft.sources.WriterLease.break_(fs, home)
    import org.apache.spark.sql.functions.col
    VectorIndex.setPayload(spark, home, Seq((0L, 9)).toDF("vec_id", "label"))
    val served = VectorIndex.searchIvf(spark, home,
      Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    assert(served.count() > 0)
  }

  test("a stale release racing a post-TTL steal cannot clobber the thief's lease") {
    val home = freshHome("staleRelease")
    val fs = fsFor(home)
    val a = WriterLease.acquire(fs, home, ownerId = "A@1",
      ttlMs = 40L, settleMs = 0L)
    Thread.sleep(70L) // A pauses past its TTL
    val b = WriterLease.acquire(fs, home, ownerId = "B@2",
      ttlMs = 60000L, settleMs = 0L)
    // the narrow interleaving: A's release CHECK passed (pre-steal
    // snapshot), then B stole, then A's "free" write runs. The free
    // is version-conditional, so it must refuse — B's live lease
    // survives — rather than install a higher-version "free" a third
    // writer could acquire under while B's verb is mid-flight.
    assert(!VersionedPointer.writeIfAtVersion(fs, new Path(home, ".lease"),
      s"free ${a.owner}", a.version))
    assert(WriterLease.check(fs, b), "thief's lease was clobbered by a stale free")
    // and the full release path is a no-op for the fenced-out token
    WriterLease.release(fs, a)
    assert(WriterLease.check(fs, b))
    WriterLease.release(fs, b)
    assert(!WriterLease.check(fs, b))
  }

  test("a concrete generation path and its alias home contend on ONE lease") {
    import graft.sources.IndexAlias
    val home = freshHome("normalize")
    val fs = fsFor(home)
    val gen = IndexAlias.nextGenerationPath(spark, home)
    fs.mkdirs(new Path(gen))
    IndexAlias.set(spark, home, gen)
    val concrete = IndexAlias.resolve(spark, home)
    assert(new Path(concrete).getName.startsWith("gen-"))
    // a writer addressing the HOME holds the lease; a writer
    // addressing the CONCRETE generation path must be fenced by the
    // SAME lease (both spellings are legal index addresses)
    val t = WriterLease.acquire(fs, home, ownerId = "H@1",
      ttlMs = 60000L, settleMs = 0L)
    intercept[WriterLease.ConcurrentWriterException] {
      WriterLease.acquire(fs, concrete, ownerId = "G@2", settleMs = 0L)
    }
    WriterLease.release(fs, t)
    // and nested exclusive across the two spellings rides one lease
    val out = WriterLease.exclusive(spark, home) {
      WriterLease.exclusive(spark, concrete) { 7 }
    }
    assert(out == 7)
    val after = VersionedPointer.read(fs, new Path(home, ".lease"))
    assert(after.exists(_.startsWith("free ")), s"lease after exit: $after")
  }

  test("first-build fencing: a gen-path lease taken BEFORE the pointer exists fences the home") {
    import graft.sources.IndexAlias
    val home = freshHome("firstbuild")
    val fs = fsFor(home)
    // the first build addresses the concrete generation directory
    // while NO .ptr exists yet (the swap installs it at the end)
    val gen = IndexAlias.nextGenerationPath(spark, home)
    fs.mkdirs(new Path(gen))
    assert(!fs.exists(new Path(home, ".ptr")))
    val t = WriterLease.acquire(fs, gen, ownerId = "B@1",
      ttlMs = 60000L, settleMs = 0L)
    // a home-addressed writer must contend on the SAME lease even
    // pre-pointer — round 8 keyed on the home only once .ptr existed,
    // so these two spellings stopped fencing each other for the
    // first lease's lifetime
    intercept[WriterLease.ConcurrentWriterException] {
      WriterLease.acquire(fs, home, ownerId = "H@2", settleMs = 0L)
    }
    // ...including after the swap installs the pointer mid-lease
    IndexAlias.set(spark, home, gen)
    intercept[WriterLease.ConcurrentWriterException] {
      WriterLease.acquire(fs, home, ownerId = "H@2", settleMs = 0L)
    }
    WriterLease.release(fs, t)
    val t2 = WriterLease.acquire(fs, home, ownerId = "H@2", settleMs = 0L)
    WriterLease.release(fs, t2)
  }

  test("break_ force-frees a stuck lease") {
    val home = freshHome("break")
    val fs = fsFor(home)
    WriterLease.acquire(fs, home, ownerId = "stuck@7",
      ttlMs = 600000L, settleMs = 0L)
    intercept[WriterLease.ConcurrentWriterException] {
      WriterLease.acquire(fs, home, ownerId = "next@8", settleMs = 0L)
    }
    WriterLease.break_(fs, home)
    val t = WriterLease.acquire(fs, home, ownerId = "next@8", settleMs = 0L)
    WriterLease.release(fs, t)
  }
}
