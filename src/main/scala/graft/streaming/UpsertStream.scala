package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC upsert — the continuous-ingest write path of the
  * reference backends (every one of the five accepts upserts while
  * serving): a stream of update rows is folded into the collection
  * snapshot with latest-wins semantics per id, one merge per
  * micro-batch.
  *
  * Merge rule: within a batch the row with the greatest event time
  * wins per id; across base/batch, the update beats the existing row
  * at equal event time. Batches are assumed to arrive in event order
  * per key (Kafka's per-partition ordering — the assumption every
  * CDC consumer makes), so folding batch-by-batch equals folding the
  * whole update log at once; the spec asserts exactly that.
  *
  * Scale shape: each micro-batch merge is one shuffle keyed on the
  * id, sized |snapshot| + |batch|. At 100 TB the snapshot is the
  * at-rest bucketed-by-id table and the merge writes only the
  * buckets a batch touches (the parquet twin of a Delta/Iceberg
  * MERGE); `localCheckpoint` here plays the role of the committed
  * snapshot.
  */
object UpsertStream {

  /** Start folding `updates` (a streaming frame sharing `base`'s
    * schema) into a snapshot initialized to `base`. Returns the
    * query and a handle reading the current snapshot. Assumes at
    * most one update per (id, event time) within a batch — a CDC log
    * is offset-keyed, so duplicates are deduped upstream.
    */
  def start(updates: DataFrame, base: DataFrame, idCol: String, tsCol: String)
      : (StreamingQuery, () => DataFrame) = {
    @volatile var state = base.localCheckpoint()
    val q = updates.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wB = Window.partitionBy(col(idCol))
          .orderBy(col(tsCol).desc)
        val latest = batch
          .withColumn("__r", row_number().over(wB)).filter(col("__r") === 1)
          .drop("__r")
        val wM = Window.partitionBy(col(idCol))
          .orderBy(col(tsCol).desc, col("__src").desc)
        state = state.withColumn("__src", lit(1))
          .unionByName(latest.withColumn("__src", lit(2)))
          .withColumn("__r", row_number().over(wM)).filter(col("__r") === 1)
          .drop("__r", "__src")
          .localCheckpoint()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    (q, () => state)
  }
}
