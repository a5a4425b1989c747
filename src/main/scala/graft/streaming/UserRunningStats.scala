package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Custom-state streaming: per-user running aggregates via
  * `mapGroupsWithState` — the KeyValueGroupedDataset state API the
  * reference's streaming ingestion side would use for per-entity
  * bookkeeping (counters, rate limits, session carts).
  *
  * State is one small record per user key, partitioned by the group
  * key — at production scale state size is O(|users|), independent of
  * event volume, and checkpointed incrementally by the state store.
  */
object UserRunningStats {

  case class Event(user_id: Long, value: Double)
  case class UserStats(user_id: Long, n_events: Long, sum_value: Double)

  def update(userId: Long, events: Iterator[Event],
             state: GroupState[UserStats]): UserStats = {
    val prev = state.getOption.getOrElse(UserStats(userId, 0L, 0.0))
    var n = prev.n_events
    var s = prev.sum_value
    events.foreach { e => n += 1; s += e.value }
    val next = UserStats(userId, n, s)
    state.update(next)
    next
  }

  /** Streaming per-user running stats from a parquet event feed. */
  def stream(spark: SparkSession, srcDir: String, schema: StructType): Dataset[UserStats] = {
    import spark.implicits._
    spark.readStream.schema(schema).parquet(srcDir)
      .select(col("user_id"), col("value"))
      .as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  /** Output mode required by mapGroupsWithState sinks. */
  val Mode: OutputMode = OutputMode.Update()
}
