package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.Tenants
import graft.operators.IndexCache

/** Weaviate-style tenant lifecycle over the partitioned at-rest
  * layout: HOT serves (pruned to the tenant's own subtree), COLD
  * refuses without touching data, OFFLOADED physically tiers the
  * subtree out and back, drop leaves no manifest residue, and
  * concurrent status flips on different tenants merge.
  */
class TenantsSpec extends SparkSpec {

  private def corpus(tenants: Seq[String], perTenant: Int): DataFrame = {
    import spark.implicits._
    tenants.zipWithIndex.flatMap { case (t, ti) =>
      (0 until perTenant).map(i => (ti.toLong * 1000 + i, s"doc $t $i", t))
    }.toDF("id", "body", "tenant")
  }

  test("lifecycle: hot serves pruned, cold refuses, offload tiers out and back, drop erases") {
    val home = IndexCache.tempDir("graft-tenants") + "/coll"
    val offloadRoot = IndexCache.tempDir("graft-tenants-offload")
    Tenants.write(spark, home, corpus(Seq("acme", "beta", "corp"), 20))

    assert(Tenants.states(spark, home).keySet === Set("acme", "beta", "corp"))

    // HOT read returns exactly the tenant's rows, and the scan reads
    // only files under that tenant's partition subtree (file-listing
    // pruning — the property that bounds per-tenant cost at scale)
    val acme = Tenants.read(spark, home, "acme")
    assert(acme.count() === 20)
    val filesTouched = acme.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(filesTouched.nonEmpty && filesTouched.forall(_.contains("tenant=acme")))

    // readHot spans all hot tenants
    assert(Tenants.readHot(spark, home).count() === 60)

    // COLD: serving refused, other tenants unaffected, aggregate excludes it
    Tenants.deactivate(spark, home, "beta")
    val e1 = intercept[IllegalStateException](Tenants.read(spark, home, "beta"))
    assert(e1.getMessage.contains("COLD"))
    assert(Tenants.read(spark, home, "acme").count() === 20)
    assert(Tenants.readHot(spark, home).count() === 40)

    // reactivation is a manifest flip — data intact
    Tenants.activate(spark, home, "beta")
    assert(Tenants.read(spark, home, "beta").count() === 20)

    // OFFLOADED: subtree physically moves, read names the location,
    // activate moves it back with rows intact
    val betaBefore = Tenants.read(spark, home, "beta")
      .select("id", "body").collect().map(_.toString).sorted
    Tenants.offload(spark, home, "beta", offloadRoot)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$home/data/tenant=beta")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$offloadRoot/beta")))
    val e2 = intercept[IllegalStateException](Tenants.read(spark, home, "beta"))
    assert(e2.getMessage.contains(offloadRoot))
    assert(Tenants.readHot(spark, home).count() === 40)
    Tenants.activate(spark, home, "beta")
    val betaAfter = Tenants.read(spark, home, "beta")
      .select("id", "body").collect().map(_.toString).sorted
    assert(betaAfter === betaBefore)

    // drop: data gone, manifest entry gone (no tombstone growth)
    Tenants.drop(spark, home, "corp")
    assert(Tenants.states(spark, home).keySet === Set("acme", "beta"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$home/data/tenant=corp")))
    intercept[IllegalArgumentException](Tenants.read(spark, home, "corp"))
  }

  test("age-based lifecycle policy tiers idle tenants down, recent writes reset the clock") {
    val home = IndexCache.tempDir("graft-tenants-ilm") + "/coll"
    val offloadRoot = IndexCache.tempDir("graft-tenants-ilm-off")
    val t0 = 1000000L
    // stale and ancient written at t0; fresh written much later
    Tenants.write(spark, home, corpus(Seq("stale", "ancient"), 5), nowMs = t0)
    Tenants.write(spark, home, corpus(Seq("fresh"), 5), nowMs = t0 + 900000L)

    val policy = Tenants.LifecyclePolicy(
      coldAfterMs = Some(600000L),          // 10 min idle -> COLD
      offloadAfterMs = Some(3600000L),      // 1 h idle -> OFFLOADED
      offloadRoot = Some(offloadRoot))

    // cycle 1 at t0+15min: stale+ancient pass the cold rung, fresh is 6min old
    val acts1 = Tenants.applyLifecycle(spark, home, policy, nowMs = t0 + 900000L)
    assert(acts1.map(a => a.tenant -> a.action).toSet ===
      Set("stale" -> "deactivated", "ancient" -> "deactivated"))
    assert(Tenants.states(spark, home) ===
      Map("stale" -> Tenants.Cold, "ancient" -> Tenants.Cold, "fresh" -> Tenants.Hot))

    // cycle 2 at t0+70min: the COLD pair (idle 70min) passes the
    // offload rung; fresh (last written t0+15min, idle 55min) only
    // the cold rung
    val acts2 = Tenants.applyLifecycle(spark, home, policy, nowMs = t0 + 4200000L)
    assert(acts2.map(a => a.tenant -> a.action).toSet ===
      Set("stale" -> "offloaded", "ancient" -> "offloaded", "fresh" -> "deactivated"))
    val st2 = Tenants.states(spark, home)
    assert(st2("fresh") === Tenants.Cold)
    assert(st2("stale").isInstanceOf[Tenants.Offloaded])
    // idempotent: re-running the same cycle does nothing
    assert(Tenants.applyLifecycle(spark, home, policy, nowMs = t0 + 4200000L).isEmpty)

    // reactivation restores serving AND restarts the age clock — the
    // next cycle does not instantly re-demote
    Tenants.activate(spark, home, "stale")
    assert(Tenants.read(spark, home, "stale").count() === 5)
    val acts3 = Tenants.applyLifecycle(spark, home, policy,
      nowMs = System.currentTimeMillis() + 1000L)
    assert(!acts3.exists(_.tenant == "stale"),
      s"reactivated tenant instantly re-demoted: $acts3")
  }

  test("later write batches enroll new tenants hot and leave existing statuses alone") {
    val home = IndexCache.tempDir("graft-tenants-add") + "/coll"
    Tenants.write(spark, home, corpus(Seq("a"), 5))
    Tenants.deactivate(spark, home, "a")
    Tenants.write(spark, home, corpus(Seq("b"), 5))
    val st = Tenants.states(spark, home)
    assert(st("b") === Tenants.Hot)
    assert(st("a") === Tenants.Cold) // a COLD tenant is not silently reactivated
    assert(Tenants.readHot(spark, home).count() === 5)
  }

  test("crash repair: a moved-but-unflipped offload or activate completes on retry") {
    val home = IndexCache.tempDir("graft-tenants-crash") + "/coll"
    val offloadRoot = IndexCache.tempDir("graft-tenants-crash-off")
    Tenants.write(spark, home, corpus(Seq("a"), 5))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    // simulate an offload that moved the subtree but died before the
    // manifest flip: dir at the offload root, manifest still HOT
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$home/data/tenant=a"),
      new org.apache.hadoop.fs.Path(s"$offloadRoot/a")))
    Tenants.offload(spark, home, "a", offloadRoot) // retry = repair
    assert(Tenants.states(spark, home)("a").isInstanceOf[Tenants.Offloaded])
    // simulate the mirror activate crash: subtree back home, manifest
    // still OFFLOADED
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$offloadRoot/a"),
      new org.apache.hadoop.fs.Path(s"$home/data/tenant=a")))
    Tenants.activate(spark, home, "a") // retry = repair
    assert(Tenants.read(spark, home, "a").count() === 5)
  }

  test("concurrent status flips on different tenants both land (manifest CAS merge)") {
    val home = IndexCache.tempDir("graft-tenants-race") + "/coll"
    val names = (0 until 8).map(i => s"t$i")
    Tenants.write(spark, home, corpus(names, 2))
    val threads = names.map { t =>
      new Thread(() => Tenants.deactivate(spark, home, t))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val st = Tenants.states(spark, home)
    assert(names.forall(t => st(t) === Tenants.Cold))
    assert(Tenants.readHot(spark, home).count() === 0)
  }
}
