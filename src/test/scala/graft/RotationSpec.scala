package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.api.{ScaleOps, TextIndex}
import graft.functions.vec
import graft.operators.{Dedup, IndexCache, VectorIndex}
import graft.sources.IndexAlias

/** Zero-downtime index rotation — the geometry-drift remedy.
  *
  * The drift under test: [[VectorIndex.append]] encodes new batches
  * against the PERSISTED geometry (the correct ingest-while-serving
  * behavior), so when the data distribution moves away from the
  * training sample, two things erode. Quality: PQ codebooks trained
  * on the old region collapse every out-of-region vector onto the
  * same few extremal codes, so ADC can no longer rank candidates and
  * recall@k drops. Cost: all new vectors assign to the one or two
  * nearest old centroids, so the partition layout skews and IVF
  * probes stop pruning. [[VectorIndex.retrain]] rebuilds the next
  * generation aside and atomically repoints the
  * [[graft.sources.IndexAlias]] home — reads flow against the old
  * generation throughout, and post-swap reads cache-miss onto the
  * fresh geometry because every session cache keys on the concrete
  * generation path.
  */
class RotationSpec extends SparkSpec {

  private val Dim = 64
  private val K = 10

  /** `nClusters` well-separated jittered clusters of `perCluster`
    * points each; centers uniform in [lo, hi] per coordinate.
    */
  private def clustered(seed: Int, nClusters: Int, perCluster: Int,
                        lo: Double, hi: Double, idBase: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val centers = Seq.fill(nClusters)(
      Array.fill(Dim)((lo + rnd.nextDouble() * (hi - lo)).toFloat))
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val emb = centers(c).map(v => v + (rnd.nextDouble() * 0.1 - 0.05).toFloat)
      (idBase + c.toLong * perCluster + i, emb, c)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  /** One slightly perturbed probe per cluster, drawn off-corpus. */
  private def queriesFrom(corpus: DataFrame, n: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val picks = corpus.select(col("vec_id"), col("embedding"), col("label"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("label")).orderBy(col("vec_id"))))
      .filter(col("rn") === 1).limit(n).collect()
    import spark.implicits._
    picks.toSeq.map { r =>
      val emb = r.getSeq[Float](1).toArray.map(v => v + (rnd.nextDouble() * 0.02 - 0.01).toFloat)
      (r.getLong(0) + 900000L, emb, r.getInt(2))
    }.toDF("q_id", "q_emb", "q_label")
  }

  private def exactTopK(corpus: DataFrame, queries: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("d").asc, col("vec_id"))
    corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queries.select(col("q_id"), col("q_emb"))))
      .withColumn("d", vec.l2(col("q_emb"), col("embedding")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"))
  }

  private def meanRecall(exact: DataFrame, approx: DataFrame): Double =
    ScaleOps.recallAtK(exact, approx).agg(avg(col("recall")))
      .collect()(0).getDouble(0)

  private def canon(df: DataFrame) =
    df.select(col("q_id"), col("vec_id"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq

  /** Share of the index's rows (filtered to `pred`) held by the most
    * occupied primary cluster partition — 1.0 means the layout has
    * degenerated to a single list and IVF pruning buys nothing.
    */
  private def maxClusterShare(path: String, pred: org.apache.spark.sql.Column): Double = {
    val v = spark.read.parquet(s"${IndexAlias.resolve(spark, path)}/vectors")
      .filter(col("assign_rank") === 0).filter(pred)
    val counts = v.groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("tot")).collect()(0)
    counts.getLong(0).toDouble / counts.getLong(1).toDouble
  }

  private lazy val corpusA = clustered(seed = 11, nClusters = 16, perCluster = 32,
    lo = -1.0, hi = 1.0, idBase = 0L)
  // drifted region: far from A and angularly TIGHT, the worst case
  // for frozen geometry — every new vector snaps to the same few
  // codes/centroids
  private lazy val corpusB = clustered(seed = 23, nClusters = 16, perCluster = 32,
    lo = 3.0, hi = 3.4, idBase = 100000L)

  test("drift erodes PQ recall and IVF balance; rebuild-aside + swap restores both with reads flowing") {
    val home = IndexCache.tempDir("graft-rotate") + "/vix"
    VectorIndex.buildRotating(spark, corpusA, home)
    assert(IndexAlias.installed(spark, home))
    val gen0 = IndexAlias.resolve(spark, home)
    assert(gen0 != home && gen0.contains("gen-"))

    // pre-drift baseline through the alias
    val qA = queriesFrom(corpusA, 16, seed = 5)
    val r0 = meanRecall(exactTopK(corpusA, qA), VectorIndex.searchPq(spark, home, qA))
    assert(r0 >= 0.9, s"pre-drift PQ recall $r0")

    // drift: append a far, angularly tight region through the alias
    VectorIndex.append(spark, corpusB, home)
    val union = corpusA.unionByName(corpusB)
    val qB = queriesFrom(corpusB, 16, seed = 7)
    val exactB = exactTopK(union, qB).localCheckpoint()
    val rDrift = meanRecall(exactB, VectorIndex.searchPq(spark, home, qB))
    assert(rDrift <= r0 - 0.2 && rDrift < 0.75,
      s"drift did not erode PQ recall: $r0 -> $rDrift")
    // cost drift: the appended region collapsed into almost one list
    val skewDrift = maxClusterShare(home, col("vec_id") >= 100000L)
    assert(skewDrift >= 0.5, s"expected drifted region to skew, got $skewDrift")

    // rebuild ASIDE: reads must keep serving the old generation
    // untouched until the instant of the swap
    val before = canon(VectorIndex.searchPq(spark, home, qB))
    val next = IndexAlias.nextGenerationPath(spark, home)
    VectorIndex.buildFrom(spark, union, next)
    assert(IndexAlias.resolve(spark, home) == gen0,
      "resolve moved before the swap")
    assert(canon(VectorIndex.searchPq(spark, home, qB)) == before,
      "mid-rebuild read did not serve the old generation")

    // the atomic swap, then recall and balance are restored
    IndexAlias.set(spark, home, next)
    assert(IndexAlias.resolve(spark, home) == next)
    val rPost = meanRecall(exactB, VectorIndex.searchPq(spark, home, qB))
    assert(rPost >= 0.9, s"post-swap PQ recall $rPost")
    val rIvf = meanRecall(exactB, VectorIndex.searchIvf(spark, home, qB))
    assert(rIvf >= 0.9, s"post-swap IVF recall $rIvf")
    // old-region queries still serve fine from the retrained geometry
    val rAPost = meanRecall(exactTopK(union, qA), VectorIndex.searchPq(spark, home, qA))
    assert(rAPost >= 0.9, s"post-swap recall on the original region $rAPost")
    val skewPost = maxClusterShare(home, lit(true))
    assert(skewPost < 0.25, s"retrain did not rebalance the layout: $skewPost")

    // prune the drained generation; the live one keeps serving
    val pruned = IndexAlias.pruneGenerations(spark, home)
    assert(pruned.nonEmpty && !IndexAlias.generations(spark, home)
      .contains(new org.apache.hadoop.fs.Path(gen0).getName))
    assert(meanRecall(exactB, VectorIndex.searchPq(spark, home, qB)) >= 0.9)
  }

  test("retrain() is the one-call rotation, honors deletes, and refuses a non-rotating path") {
    val home = IndexCache.tempDir("graft-rotate-api") + "/vix"
    VectorIndex.buildRotating(spark, corpusA, home)
    VectorIndex.append(spark, corpusB, home)
    val qB = queriesFrom(corpusB, 16, seed = 7)

    val gen1 = VectorIndex.retrain(spark, home)
    assert(IndexAlias.resolve(spark, home) == gen1)
    val union = corpusA.unionByName(corpusB)
    assert(meanRecall(exactTopK(union, qB), VectorIndex.searchPq(spark, home, qB)) >= 0.9)

    // tombstones through the alias serve immediately AND a retrain
    // bakes them in: the next generation is born clean
    val victims = VectorIndex.searchIvf(spark, home, qB)
      .filter(col("rn") <= 2).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSeq.distinct
    VectorIndex.delete(spark, home, victims)
    val served = VectorIndex.searchIvf(spark, home, qB)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !served.contains(v)), "tombstoned id still served")
    val gen2 = VectorIndex.retrain(spark, home)
    val fs = new org.apache.hadoop.fs.Path(gen2).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$gen2/tombstones")),
      "retrained generation inherited tombstone debt")
    val servedPost = VectorIndex.searchIvf(spark, home, qB)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(victims.forall(v => !servedPost.contains(v)))

    val bare = IndexCache.tempDir("graft-rotate-bare") + "/vix"
    VectorIndex.buildFrom(spark, corpusA, bare)
    intercept[IllegalArgumentException] { VectorIndex.retrain(spark, bare) }
  }

  test("text and dedup indexes rotate behind the same alias primitive") {
    import spark.implicits._
    val docsA = (0L until 40L).map(i =>
      (i, s"alpha bravo charlie delta echo token$i foxtrot golf hotel india"))
      .toDF("doc_id", "text")
    val docsB = (100L until 140L).map(i =>
      (i, s"kilo lima mike november oscar token$i papa quebec romeo sierra"))
      .toDF("doc_id", "text")

    // text index: rotate re-indexes aside + swaps; bm25 through the
    // alias reflects exactly the live generation's corpus
    val tHome = IndexCache.tempDir("graft-rotate-text") + "/tix"
    TextIndex.rotate(docsA, tHome)
    assert(TextIndex.bm25AtRest(spark, tHome, Seq("alpha")).count() == 40)
    assert(TextIndex.bm25AtRest(spark, tHome, Seq("kilo")).count() == 0)
    TextIndex.rotate(docsA.unionByName(docsB), tHome)
    assert(TextIndex.bm25AtRest(spark, tHome, Seq("kilo")).count() == 40)
    // appends through the alias land in the LIVE generation
    TextIndex.append((200L to 201L).map(i => (i, "alpha kilo zulu"))
      .toDF("doc_id", "text"), tHome)
    assert(TextIndex.bm25AtRest(spark, tHome, Seq("zulu")).count() == 2)
    IndexAlias.pruneGenerations(spark, tHome)
    assert(TextIndex.bm25AtRest(spark, tHome, Seq("kilo")).count() == 42)

    // dedup index: probes through the alias see exactly the live
    // generation's standing corpus
    val dHome = IndexCache.tempDir("graft-rotate-dedup") + "/dix"
    Dedup.rotateMinhashIndex(docsA, dHome)
    val probe = Seq((9000L, "alpha bravo charlie delta echo token3 foxtrot golf hotel india"))
      .toDF("doc_id", "text")
    assert(Dedup.dedupAgainstIndex(spark, probe, dHome).count() >= 1)
    val probeB = Seq((9001L, "kilo lima mike november oscar token101 papa quebec romeo sierra"))
      .toDF("doc_id", "text")
    assert(Dedup.dedupAgainstIndex(spark, probeB, dHome).count() == 0)
    Dedup.rotateMinhashIndex(docsA.unionByName(docsB), dHome)
    assert(Dedup.dedupAgainstIndex(spark, probeB, dHome).count() >= 1)
    IndexAlias.pruneGenerations(spark, dHome)
    assert(Dedup.dedupAgainstIndex(spark, probe, dHome).count() >= 1)
  }

  test("zero-downtime compact: a rotating home hands off to a fresh generation, old one stays complete") {
    import org.apache.hadoop.fs.Path
    val corpus = clustered(seed = 31, nClusters = 8, perCluster = 40,
      lo = -1.0, hi = 1.0, idBase = 0L)
    val q = queriesFrom(corpus, 4, seed = 32)
    val home = IndexCache.tempDir("graft-zdcompact") + "/vix"
    VectorIndex.buildRotating(spark, corpus, home)
    VectorIndex.delete(spark, home, Seq(0L, 1L, 2L))
    val oldGen = IndexAlias.resolve(spark, home)
    val fs = new Path(home).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = VectorIndex.searchIvf(spark, home, q).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rn"), r.getAs[Long]("vec_id"))).toSet

    VectorIndex.compact(spark, home)
    val newGen = IndexAlias.resolve(spark, home)
    assert(newGen != oldGen, "compact on a rotating home must hand off generations")
    // a reader that resolved BEFORE the swap still has a complete
    // layout under it — nothing in the old generation was touched
    for (t <- Seq("vectors", "lsh", "meta", "tombstones"))
      assert(fs.exists(new Path(oldGen, t)), s"old generation lost $t")
    // the new generation serves the identical post-delete state, now
    // physical: no tombstone table, same search answers
    assert(!fs.exists(new Path(newGen, "tombstones")))
    val after = VectorIndex.searchIvf(spark, home, q).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rn"), r.getAs[Long]("vec_id"))).toSet
    assert(after == before, "compact handoff changed search results")
    assert(after.nonEmpty && !after.exists(t => Seq(0L, 1L, 2L).contains(t._3)))
    // drain complete -> prune removes the old generation
    val pruned = IndexAlias.pruneGenerations(spark, home)
    assert(pruned.nonEmpty && !fs.exists(new Path(oldGen)))
  }

  test("VersionedPointer survives concurrent writers: every write lands, max version wins, no lost swap") {
    import graft.sources.VersionedPointer
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = new org.apache.hadoop.fs.Path(IndexCache.tempDir("graft-ptr-race"), ".ptr")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

    val writers = 8
    val rounds = 25
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          (0 until rounds).foreach { r =>
            try VersionedPointer.write(fs, dir, s"w$w-r$r")
            catch { case t: Throwable => errors.add(t) }
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writer pool did not drain")
    assert(errors.isEmpty, s"writer failures: ${errors.toArray.mkString("; ")}")

    // every write CAS-retried to its own version: writers*rounds distinct
    // versions were installed over the pointer's lifetime, so the final
    // max version is at least writers*rounds-1 (versions start at 0) —
    // a silently lost swap would leave a hole below that count
    val vs = VersionedPointer.versions(fs, dir)
    assert(vs.nonEmpty && vs.last >= (writers * rounds - 1).toLong,
      s"expected >=${writers * rounds} installed versions, max is ${vs.last}")
    // pruning converged: only complete, readable state remains, and the
    // value is some writer's final-round write (max version wins)
    val v = VersionedPointer.read(fs, dir)
    assert(v.isDefined && v.get.matches(s"w[0-7]-r${rounds - 1}"), s"final value: $v")
  }

  test("VersionedPointer read during concurrent writes always resolves a complete value") {
    import graft.sources.VersionedPointer
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val dir = new org.apache.hadoop.fs.Path(IndexCache.tempDir("graft-ptr-rw"), ".ptr")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    VersionedPointer.write(fs, dir, "seed-0")

    val pool = Executors.newFixedThreadPool(4)
    val start = new CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val writer = new Runnable {
      def run(): Unit = {
        start.await()
        (1 to 60).foreach(i => VersionedPointer.write(fs, dir, s"seed-$i"))
      }
    }
    val reader = new Runnable {
      def run(): Unit = {
        start.await()
        (1 to 200).foreach { _ =>
          VersionedPointer.read(fs, dir) match {
            case Some(s) if s.matches("seed-\\d+") => ()
            case other => errors.add(s"incomplete read: $other")
          }
        }
      }
    }
    pool.submit(writer); pool.submit(writer)
    pool.submit(reader); pool.submit(reader)
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "rw pool did not drain")
    assert(errors.isEmpty, s"reader saw: ${errors.toArray.mkString("; ")}")
    assert(VersionedPointer.read(fs, dir).contains("seed-60"))
  }

  test("pruneGenerations drain-grace keeps the PREVIOUSLY-LIVE generation, not a crashed rebuild's") {
    import org.apache.hadoop.fs.Path
    val home = IndexCache.tempDir("graft-prune-hist") + "/ix"
    val fs = new Path(home).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mkGen(): String = {
      val g = IndexAlias.nextGenerationPath(spark, home)
      fs.mkdirs(new Path(g)); g
    }
    val g0 = mkGen(); IndexAlias.set(spark, home, g0)
    // swap to g1: g0 becomes the generation in-flight readers are
    // still draining on
    val g1 = mkGen(); IndexAlias.set(spark, home, g1)
    // a crashed/aborted rebuild leaves a half-built HIGHER-numbered
    // directory that was never pointed at — garbage, not a layout
    val g2 = mkGen()
    val pruned = IndexAlias.pruneGenerations(spark, home, keep = 1)
    val left = IndexAlias.generations(spark, home)
    assert(left.contains(new Path(g0).getName),
      s"draining readers' generation was deleted: $left")
    assert(left.contains(new Path(g1).getName), s"live generation missing: $left")
    assert(!left.contains(new Path(g2).getName),
      s"crashed-rebuild garbage displaced the drain-grace window: $left")
    assert(pruned == Seq(new Path(g2).getName))
    // and with keep = 0 the drained generation goes too
    val pruned2 = IndexAlias.pruneGenerations(spark, home, keep = 0)
    assert(pruned2 == Seq(new Path(g0).getName))
    assert(IndexAlias.generations(spark, home) == Seq(new Path(g1).getName))
  }

  test("a short-history pointer never protects crashed-rebuild garbage via the name fallback") {
    import org.apache.hadoop.fs.Path
    val home = IndexCache.tempDir("graft-prune-short") + "/ix"
    val fs = new Path(home).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mkGen(): String = {
      val g = IndexAlias.nextGenerationPath(spark, home)
      fs.mkdirs(new Path(g)); g
    }
    // ONE swap so far: history exists but holds fewer entries than
    // keep = 2 — round 8 topped the window up from newest NAMES,
    // repeatedly protecting a crashed rebuild's half-built dir
    val g0 = mkGen(); IndexAlias.set(spark, home, g0)
    val g1 = mkGen(); IndexAlias.set(spark, home, g1)
    val crashed = mkGen() // never pointed at
    val pruned = IndexAlias.pruneGenerations(spark, home, keep = 2)
    val left = IndexAlias.generations(spark, home)
    assert(left.contains(new Path(g0).getName), "previously-live gen must survive")
    assert(!left.contains(new Path(crashed).getName),
      s"crashed dir protected by the fallback again: $left")
    assert(pruned == Seq(new Path(crashed).getName))
    // a pointer with NO history at all (predates retention) still
    // falls back to newest-named — the only signal it has
    val home2 = IndexCache.tempDir("graft-prune-nohist") + "/ix2"
    def mkGen2(): String = {
      val g = IndexAlias.nextGenerationPath(spark, home2)
      fs.mkdirs(new Path(g)); g
    }
    val h0 = mkGen2(); val h1 = mkGen2()
    graft.sources.VersionedPointer.write(fs,
      new Path(home2, ".ptr"), new Path(h1).getName) // keepHistory = 0
    val pruned2 = IndexAlias.pruneGenerations(spark, home2, keep = 1)
    assert(pruned2.isEmpty, s"no-history fallback should retain newest-named: $pruned2")
    assert(IndexAlias.generations(spark, home2).contains(new Path(h0).getName))
  }
}
