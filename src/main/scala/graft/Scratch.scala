package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf dissection main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.region(spark, sfDir).count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    (1 to 2).foreach { rep =>
      // stage dissection of q_dup_clusters
      val docs = t(s"r$rep docs")(operators.Dedup.augmentedDocs(spark, sfDir))
      t(s"r$rep docs.count")(docs.count())
      val tri = t(s"r$rep trigrams ckpt")(
        operators.Dedup.trigrams(docs).localCheckpoint())
      val edges = t(s"r$rep edges build")(
        operators.Dedup.jaccardPairs(tri, materializePairs = true)
          .filter(col("jaccard") >= 0.5))
      t(s"r$rep edges count")(edges.count())
      val cc = t(s"r$rep cc")(
        operators.Dedup.connectedComponents(
          edges.select(col("doc_a").as("a"), col("doc_b").as("b"))))
      t(s"r$rep cc count")(cc.count())
      val full = t(s"r$rep full build")(SparkEntry.queries("q_dup_clusters")(spark, sfDir))
      t(s"r$rep full count")(full.count())
    }
    spark.stop()
  }
}
