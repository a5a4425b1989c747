package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev harness: print embeddingNearDupAuto's route decision
  * and its inputs for a corpus dir at a threshold.
  */
object RouteProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val t = args(1).toDouble
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, dir)
    val aug = e.select(col("vec_id"), col("embedding"), col("label"))
      .unionByName(e.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 1000000000L).as("vec_id"),
          col("embedding"), col("label")))
    val probs = operators.Dedup.samplePlaneProbs(aug)
    val pRand = operators.Dedup.measuredPRandOf(probs)
    val (route, r, b) = operators.Dedup.chooseEmbeddingRoute(aug, t)
    val emp = operators.Dedup.empiricalOccupancy(probs, math.max(1, r), 1.0)
    println(f"ROUTE dir=$dir t=$t route=$route r=$r b=$b pRand=$pRand%.3f EpR=$emp%.3e")
    spark.stop()
  }
}
