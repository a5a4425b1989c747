package graft

import graft.api.{Metric, VectorCollection}
import graft.operators.{Ann, VectorSearch}
import graft.sources.CollectionCatalog
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Capstone: the full collection lifecycle a reference user would
  * run, END TO END on one catalog — import → create → upsert merge →
  * snapshot → index → search → compact → restore — proving the admin
  * surfaces compose (every stage consumes the previous stage's
  * at-rest output, nothing needs a side channel).
  */
class LifecycleSpec extends SparkSpec {

  test("import → create → upsert → snapshot → index → search → compact → restore") {
    val root = Files.createTempDirectory("graft-lifecycle").toString
    val cat = CollectionCatalog(spark, root)
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))

    // 1. create the managed collection from an import
    cat.create("vectors", base)
    assert(cat.list().contains("vectors"))
    val v0 = cat.load("vectors")
    assert(v0.count() == base.count())

    // 2. upsert a patch batch (every 10th vector gets label+100)
    val patch = base.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"), (col("label") + 100).as("label"))
    val merged = VectorCollection(v0, idCol = "vec_id").upsert(patch).df
      .select("vec_id", "embedding", "label")
    cat.create("vectors_v2", merged)

    // 3. snapshot the merged state, then search it
    val snap = cat.snapshot("vectors_v2")
    val queries = VectorSearch.querySet(spark, sfDir).limit(3)
    val hits = VectorCollection(cat.load("vectors_v2"), idCol = "vec_id")
      .search(queries, k = 5, Metric.Cosine).collect()
    assert(hits.length == 3 * 5)

    // 4. the patched labels are visible through the catalog
    val patched = cat.load("vectors_v2").filter(col("vec_id") % 10 === 0)
      .select("label").collect().map(_.getAs[Int]("label"))
    assert(patched.nonEmpty && patched.forall(_ >= 100))

    // 5. compact the (deliberately fragmented) collection
    cat.drop("vectors_v2")
    cat.create("vectors_v2", merged.repartition(16))
    val (before, after) = cat.compact("vectors_v2", targetFileBytes = 1L << 30)
    assert(before == 16 && after < before)
    assert(cat.load("vectors_v2").count() == merged.count())

    // 6. clobber the collection, restore the snapshot, contents agree
    cat.drop("vectors_v2")
    cat.create("vectors_v2", base.limit(1)) // "corruption"
    cat.restore(snap)
    val restored = cat.load("vectors_v2")
    assert(restored.count() == merged.count())
    val a = restored.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = merged.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)

    // 7. the searched results only contain ids that exist in the store
    val ids = restored.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(hits.map(_.getAs[Long]("vec_id")).forall(ids.contains))
  }
}
