package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe (not part of the surface): cost of an N-task no-op
  * stage on this host, to size rebalance targets from evidence.
  */
object DispatchProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm
    spark.range(1000000).repartition(32).count()
    for (n <- Seq(1, 2, 4, 8, 16, 32, 64)) {
      val df = spark.range(1000000).repartition(n)
      df.count() // materialize once to warm
      val reps = 5
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { df.count(); i += 1 }
      val t = (System.nanoTime() - t0) / 1e9 / reps
      println(f"[dispatch] n=$n%3d  ${t}%.4f s/job")
    }
    // same with real per-row work (xxhash of a string)
    for (n <- Seq(1, 2, 4, 8, 16, 32)) {
      val df = spark.range(2000000)
        .selectExpr("xxhash64(concat('abcdefgh', id)) AS h")
        .repartition(n).selectExpr("xxhash64(concat('zzz', h)) AS g")
      val reps = 3
      df.agg(org.apache.spark.sql.functions.sum("g")).collect()
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { df.agg(org.apache.spark.sql.functions.sum("g")).collect(); i += 1 }
      val t = (System.nanoTime() - t0) / 1e9 / reps
      println(f"[dispatch] work n=$n%3d  ${t}%.4f s/job")
    }
    spark.stop()
  }
}
