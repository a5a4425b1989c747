package graft
import org.apache.spark.sql.SparkSession

/** Dev harness (guide §1): partition counts of the session-pinned
  * serving views — the dispatch width every serving job inherits.
  * Usage: runMain graft.PartProbe [sfDir]
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // force the session index builds via one serving query each
    Seq("q_ivf_knn", "q_ivfpq_knn", "q_sq8_knn", "q_bq_knn", "q_pq_knn")
      .foreach { n => SparkEntry.queries(n)(spark, sfDir).count() }
    spark.sparkContext.getPersistentRDDs.toSeq.sortBy(_._1).foreach {
      case (id, rdd) =>
        val blocks = rdd.partitions.length
        println(s"[partprobe] rdd=$id parts=$blocks name=${rdd.name}")
    }
    spark.stop()
  }
}
