package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  test("asof picks the latest right row at or before each left row") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 4L, 101L), (2L, 8L, 102L))
      .toDF("k", "sec", "lid")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("lid"))
    val right = Seq((1L, 5L, 200L), (1L, 8L, 201L), (1L, 12L, 202L), (2L, 8L, 203L))
      .toDF("k", "sec", "rid")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("rid"))
    val out = AsofJoin.asof(left, right, Seq("k"), "ts", "ts", Seq("rid", "ts"))
      .select(col("lid"), col("__asof.rid").as("rid"))
      .collect().map(r => r.getAs[Long]("lid") -> Option(r.getAs[java.lang.Long]("rid"))).toMap
    assert(out(100L).contains(201L)) // ts 10 → latest right at 8
    assert(out(101L).isEmpty)        // ts 4 → nothing at or before
    assert(out(102L).contains(203L)) // equal timestamps match ("at or before")
  }

  test("q_asof_join: every click maps to the user's latest prior purchase") {
    val rows = AsofJoin.qAsofJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("lag_ms") >= 0))
    // brute-force expected pairs from the raw events
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), tsEpochMs(r.getAs[Any]("ts"))))
    val purchases = ev.filter(_._3 == "purchase")
    val expected = ev.filter(_._3 == "click").flatMap { case (cid, u, _, cts) =>
      val prior = purchases.filter(p => p._2 == u && p._4 <= cts)
      if (prior.isEmpty) None
      else Some(cid -> prior.maxBy(p => (p._4, p._1))._1)
    }.toMap
    val got = rows.map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("purchase_id")).toMap
    assert(got == expected)
  }
}
