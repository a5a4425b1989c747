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
}
