package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.api.{Metric, VectorCollection}

/** Micro-batch vector search over a continuous query feed — the
  * Spark-native twin of the reference backends' online search
  * endpoint. Queries arrive on a stream; each micro-batch reuses the
  * exact batch search plan (broadcast batch query set, single static
  * corpus scan, WindowGroupLimit top-k), so streaming and batch
  * search are provably the same operator.
  *
  * At production scale the stream is Kafka, the corpus is the
  * at-rest (bucketed / IVF-partitioned) collection, and each trigger
  * is an independent bounded job — state never accumulates, and
  * corpus updates are picked up per batch because the static side is
  * re-planned each trigger.
  */
object StreamingSearch {

  /** Start a stream that searches `corpus` with every arriving query
    * batch and hands each batch's top-k result to `sink`.
    * Query rows: (q_id, q_emb); corpus: (vec_id, embedding, ...).
    */
  def searchStream(queryStream: DataFrame, corpus: DataFrame, k: Int,
                   metric: Metric = Metric.Cosine)
                  (sink: DataFrame => Unit): StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(VectorCollection(corpus, idCol = "vec_id")
          .search(batch, k, metric)
          .select(col("q_id"), col("vec_id"), col("rn"), col("score")))
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
