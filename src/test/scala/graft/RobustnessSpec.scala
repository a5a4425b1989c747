package graft

import graft.sources.{CollectionCatalog, CollectionSource}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Error-contract coverage: the failure modes the library promises
  * to surface loudly rather than mis-compute through.
  */
class RobustnessSpec extends SparkSpec {

  test("collection import rejects a non-array embedding column") {
    val dir = Files.createTempDirectory("graft-rob-src").toString + "/data"
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("vec_id").cast("string").as("embedding"))
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      CollectionSource.parquet(spark, dir)
    }
    assert(e.getMessage.contains("must be an array column"))
  }

  test("catalog restore of an unknown snapshot fails loudly") {
    val root = Files.createTempDirectory("graft-rob-cat").toString
    val cat = CollectionCatalog(spark, root)
    val e = intercept[IllegalArgumentException] {
      cat.restore("nope/0")
    }
    assert(e.getMessage.contains("no such snapshot"))
  }

  test("dedup-against-index fails loudly on a missing index path") {
    val batch = Tables.documents(spark, sfDir).select("doc_id", "text").limit(5)
    intercept[Exception] {
      graft.operators.Dedup.dedupAgainstIndex(spark, batch,
        "/tmp/graft-no-such-index").collect()
    }
  }

  test("md5Bucket stays in range and is stable across evaluations") {
    val buckets = Tables.embeddings(spark, sfDir)
      .select(graft.functions.hashes.md5Bucket(
        col("vec_id").cast("string"), 7L).as("b"))
      .collect().map(_.getAs[Long]("b"))
    assert(buckets.forall(b => b >= 0 && b < 7))
    assert(buckets.toSet.size == 7) // 500 keys hit all 7 buckets
  }

  test("zValue stays within 2*bits bits for in-range inputs") {
    import graft.api.ScaleOps
    val zs = spark.range(0, 256).toDF("x")
      .select(ScaleOps.zValue("x", "x", bits = 8).as("z"))
      .collect().map(_.getAs[Long]("z"))
    assert(zs.forall(z => z >= 0 && z < (1L << 16)))
    // diagonal points interleave to pairs of identical bits
    assert(zs.distinct.length == 256)
  }

  test("FilterDsl rejects malformed wire-form filters with the offending fragment") {
    import graft.api.FilterDsl
    // a condition with no key
    val e1 = intercept[RuntimeException] {
      FilterDsl.fromJson("""{ "must": [ {"match": {"value": 3}} ] }""")
    }
    assert(e1.getMessage.contains("key"))
    // an unknown condition shape
    val e2 = intercept[RuntimeException] {
      FilterDsl.fromJson("""{ "must": [ {"key": "x", "frobnicate": 1} ] }""")
    }
    assert(e2.getMessage.contains("unsupported"))
    // a non-numeric range bound
    val e3 = intercept[RuntimeException] {
      FilterDsl.fromJson("""{ "must": [ {"key": "x", "range": {"gte": "low"}} ] }""")
    }
    assert(e3.getMessage.contains("range bound"))
    // an empty filter is valid and matches everything
    val n = Tables.documents(spark, sfDir)
      .filter(FilterDsl.fromJson("{}").toColumn).count()
    assert(n == Tables.documents(spark, sfDir).count())
  }

  test("per-path lock/cache state stays bounded across >10k distinct paths") {
    // a long-lived serving session resolves and locks an unbounded
    // stream of index paths; none of the per-path maps may grow
    // monotonically with it
    (0 until 12000).foreach { i =>
      graft.sources.MutationLock.of(s"/tmp/graft-bound/never-$i")
      graft.sources.IndexAlias.resolve(spark, s"/tmp/graft-bound/never-$i")
    }
    assert(graft.sources.MutationLock.lockCount <= 1024)
    assert(graft.sources.IndexAlias.resolveCacheSize <= 8192 + 1,
      s"resolve cache grew to ${graft.sources.IndexAlias.resolveCacheSize}")
    // striping preserves mutual exclusion: same path -> same monitor
    assert(graft.sources.MutationLock.of("/tmp/graft-bound/x")
      eq graft.sources.MutationLock.of("/tmp/graft-bound/x"))
  }

  test("dropMatching un-pins evicted frames so their blocks become releasable") {
    import graft.operators.IndexCache
    val before = IndexCache.pinnedIdsSnapshot()
    val df = IndexCache.materialized(spark, "robust-pin#demo") {
      spark.range(100).toDF("id")
    }
    assert(df.count() == 100)
    val pinned = IndexCache.pinnedIdsSnapshot()
    assert((pinned -- before).nonEmpty, "materialize must pin its checkpoint")
    IndexCache.dropMatching("robust-pin#demo")
    val after = IndexCache.pinnedIdsSnapshot()
    assert((after -- before).isEmpty,
      s"eviction left stale pins: ${(after -- before).mkString(",")}")
  }
}
