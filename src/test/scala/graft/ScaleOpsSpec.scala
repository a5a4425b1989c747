package graft

import graft.api.ScaleOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

class ScaleOpsSpec extends SparkSpec {

  test("saltedAgg equals the direct aggregation") {
    val events = Tables.events(spark, sfDir)
    val salted = ScaleOps.saltedAgg(events, "event_type", "value",
        saltFrom = col("event_id"), buckets = 8)
      .collect().map(r => (r.getAs[String]("event_type"),
        math.round(r.getAs[Double]("sum_value") * 100), r.getAs[Long]("n_rows"))).toSet
    val direct = events.groupBy(col("event_type"))
      .agg(sum(col("value")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[String]("event_type"),
        math.round(r.getAs[Double]("s") * 100), r.getAs[Long]("n"))).toSet
    assert(salted == direct)
  }

  test("saltedJoin equals the direct join") {
    val events = Tables.events(spark, sfDir)
    val dim = spark.createDataFrame(Seq(
      ("click", 1.0), ("view", 0.5), ("signup", 2.0), ("error", -1.0), ("purchase", 3.0)))
      .toDF("event_type", "weight")
    val salted = ScaleOps.saltedJoin(events, dim, "event_type",
        saltFrom = col("event_id"), buckets = 4)
      .agg(sum(col("value") * col("weight"))).head().getDouble(0)
    val direct = events.join(dim, "event_type")
      .agg(sum(col("value") * col("weight"))).head().getDouble(0)
    assert(math.abs(salted - direct) < 1e-6)
  }

  test("bucketed tables join without any exchange") {
    val emb = Tables.embeddings(spark, sfDir)
    ScaleOps.writeBucketed(emb.select("vec_id", "label"), "emb_b1", "vec_id", 8)
    ScaleOps.writeBucketed(emb.select(col("vec_id"), col("embedding")), "emb_b2", "vec_id", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("emb_b1").join(spark.table("emb_b2"), "vec_id")
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("zValue interleaves bits and preserves 2-D locality ordering") {
    val df = spark.range(0, 4).toDF("x").crossJoin(spark.range(0, 4).toDF("y"))
      .select(col("x"), col("y"), ScaleOps.zValue("x", "y", bits = 2).as("z"))
    val got = df.collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")) ->
      r.getAs[Long]("z")).toMap
    // hand-computed Morton codes for the 4x4 grid
    assert(got((0L, 0L)) == 0 && got((1L, 0L)) == 1 && got((0L, 1L)) == 2)
    assert(got((1L, 1L)) == 3 && got((2L, 2L)) == 12 && got((3L, 3L)) == 15)
  }

  test("zorder layout skips files a 1-D sort cannot") {
    import java.nio.file.Files
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"),
        (pmod(hash(col("event_id")), lit(256))).as("x"),
        (pmod(hash(col("event_id") + 7), lit(256))).as("y"))
    val zDir = Files.createTempDirectory("graft-zorder").toString + "/z"
    val hDir = Files.createTempDirectory("graft-zorder").toString + "/h"
    ScaleOps.zorderWrite(events, zDir, "x", "y", numFiles = 16, bits = 8)
    events.repartition(16, col("event_id")).write.parquet(hDir) // hash layout
    // a small (x, y) box — count how many FILES contain matching rows:
    // the min/max footer-pruning bound for a scan with this predicate
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("x") < 64 && col("y") < 64)
        .select(input_file_name()).distinct().count()
    val (zf, hf) = (filesTouched(zDir), filesTouched(hDir))
    // the box is 1/16 of the space: z-order confines it to a few
    // files; a hash layout spreads it across essentially all 16
    assert(zf <= 4, s"zorder touched $zf files")
    assert(hf >= 12, s"hash layout touched only $hf files")
    // same rows either way
    assert(spark.read.parquet(zDir).count() == events.count())
  }

  test("exportShards is deterministic, balanced, and lossless") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "source")
    val dir1 = java.nio.file.Files.createTempDirectory("graft-shards1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft-shards2").toString
    ScaleOps.exportShards(docs, dir1, shards = 8)
    ScaleOps.exportShards(docs, dir2, shards = 8)
    val r1 = spark.read.parquet(dir1)
    // lossless round trip
    assert(r1.count() == docs.count())
    assert(r1.select("doc_id").except(docs.select("doc_id")).isEmpty)
    // membership is the stable id hash — identical across exports
    val m1 = r1.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    val m2 = spark.read.parquet(dir2).select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    assert(m1 == m2, "re-export must reproduce shard membership")
    // every shard present and no shard dominates (hash balance)
    val sizes = m1.values.groupBy(identity).map(_._2.size)
    assert(m1.values.toSet.size == 8)
    assert(sizes.max <= 3 * sizes.min, s"imbalanced shards: $sizes")
  }

  test("recallAtK: exact vs itself is 1.0; IVF at the default budget meets its documented recall") {
    import graft.operators.{Ann, VectorIndex, VectorSearch}
    val exact = VectorSearch.qKnnCosine(spark, sfDir)
    val self = ScaleOps.recallAtK(exact, exact).collect()
    assert(self.nonEmpty && self.forall(_.getAs[Double]("recall") == 1.0))
    // the monitor reproduces the sweep spec's operating-point number
    val path = VectorIndex.sessionIndexPath(spark, sfDir)
    val approx = VectorIndex.searchIvf(spark, path,
      VectorSearch.querySet(spark, sfDir), nprobe = Ann.NProbe)
    val r = ScaleOps.recallAtK(exact, approx)
      .agg(avg(col("recall")).as("mean_recall")).collect()(0).getAs[Double]("mean_recall")
    assert(r >= 0.9, f"mean recall $r%.3f below the documented 0.9 budget")
  }
}
