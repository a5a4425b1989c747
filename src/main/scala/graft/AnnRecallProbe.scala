package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev harness (not part of the library surface): measure
  * recall@10 of each at-rest ANN family against exact ground truth
  * on a standing index + its corpus dir.
  * Args: corpusDir indexPath [qMod] [build]
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val idx = args(1)
    val qMod = if (args.length > 2) args(2).toLong else 10000L
    val doBuild = args.length > 3 && args(3) == "build"
    val spark = SparkSession.builder().master("local[32]")
      // one query's exact scan per shuffle partition: the 250-query ×
      // 5M-row window sort OOMs at 32 partitions
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    if (doBuild) {
      val t0 = System.nanoTime()
      operators.VectorIndex.buildFrom(spark, emb, idx)
      println(f"[probe] build done (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    val queries = emb.filter(col("vec_id") % qMod === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .localCheckpoint()
    println(s"[probe] ${queries.count()} queries")
    val t0 = System.nanoTime()
    val exact = api.VectorCollection(emb, idCol = "vec_id")
      .search(queries, 10, api.Metric.Cosine)
      .select(col("q_id"), col("vec_id"), col("rn"), col("score"))
      .localCheckpoint()
    println(f"[probe] exact done (${(System.nanoTime()-t0)/1e9}%.1f s)")
    def rec(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = api.ScaleOps.recallAtK(exact, df)
        .agg(avg(col("recall"))).head.getDouble(0)
      println(f"[probe] $name recall@10 = $r%.4f (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    import operators.VectorIndex._
    val meta = readMeta(spark, idx)
    println(s"[probe] nlist=${meta.centroids.size} nprobe=${meta.defaultNProbe} " +
      s"pool=${meta.defaultPool} opq=${meta.rotation.isDefined} bound=${meta.budgetBound} " +
      s"bqPool=${meta.defaultBqPool} bqBound=${meta.bqBudgetBound} " +
      s"lshBits=${meta.lshBits} lshBands=${meta.lshBands} lshBound=${meta.lshBudgetBound}")
    rec("ivf", searchIvf(spark, idx, queries, cached = false))
    rec("ivfpq_served_default", searchIvfPq(spark, idx, queries, cached = false))
    rec("ivfpq_pool100", searchIvfPq(spark, idx, queries, pool = 100, cached = false))
    rec("ivfpq_pool1000", searchIvfPq(spark, idx, queries, pool = 1000, cached = false))
    rec("pq_served_default", searchPq(spark, idx, queries, cached = false))
    rec("sq8", searchSq8(spark, idx, queries, cached = false))
    rec("bq_served_default", searchBq(spark, idx, queries, cached = false))
    rec("bq_pool100", searchBq(spark, idx, queries, pool = 100, cached = false))
    rec("bq_pool1000", searchBq(spark, idx, queries, pool = 1000, cached = false))
    rec("lsh", searchLsh(spark, idx, queries, cached = false))
    spark.stop()
  }
}
