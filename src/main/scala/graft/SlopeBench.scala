package graft
import org.apache.spark.sql.SparkSession

/** Dev harness for the scaling-slope measurement (SURVEY §6): time a
  * list of queries at one SF dir in a single JVM, two passes, report
  * the per-query minimum as one JSON line.
  * runMain graft.SlopeBench <sfDir> <name1> <name2> ...
  */
object SlopeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.region(spark, sfDir).count()
    Tables.documents(spark, sfDir).count()
    def pass(): Map[String, Double] = names.map { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val (p1, p2) = (pass(), pass())
    val qs = names.map(n => "\"" + n + "\":" + f"${math.min(p1(n), p2(n))}%.3f")
      .mkString("{", ",", "}")
    println(s"""{"slope_sf":"$sfDir","queries":$qs}""")
    spark.stop()
  }
}
