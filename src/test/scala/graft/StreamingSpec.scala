package graft

import graft.streaming.EventsWindowed
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  test("streaming windowed aggregation equals the batch twin") {
    val batchEvents = Tables.events(spark, sfDir)
      .select("ts", "event_type", "value")
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    batchEvents.write.mode("overwrite").parquet(srcDir)

    val q = EventsWindowed.stream(spark, srcDir, batchEvents.schema)
      .writeStream
      .format("memory")
      .queryName("events_windowed_test")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getAs[java.sql.Timestamp]("window_start").getTime,
        r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))
    }.sortBy(t => (t._1, t._2))

    val streamed = canon(spark.table("events_windowed_test").collect())
    val batch = canon(EventsWindowed.windowed(batchEvents).collect())
    assert(streamed.nonEmpty)
    assert(streamed.sameElements(batch))

    // and the shared definition matches the relational batch operator
    val relational = graft.operators.Relational.qEventsWindow(spark, sfDir).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime,
        r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).sortBy(t => (t._1, t._2))
    assert(streamed.sameElements(relational))
  }
}
