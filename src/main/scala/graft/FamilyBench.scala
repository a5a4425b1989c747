package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: Bench methodology (one session, alphabetical order,
  * N passes, per-query min + median, /proc/loadavg sentinel per pass)
  * restricted to an explicit query subset — the isolation tool for
  * "did THIS family regress" questions where running all 201 entries
  * would bury the signal in ambient drift.
  * Usage: FamilyBench <name,name,...> [sfDir] [passes]
  */
object FamilyBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq.sorted
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val nPasses = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.documents(spark, sfDir).count()
    val fns = names.map(n => n -> SparkEntry.queries(n))
    def loadSentinel(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      catch { case _: Throwable => "unavailable" }
    def pass(): Map[String, Double] = fns.map { case (n, fn) =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      operators.IndexCache.releaseTransients(spark)
      n -> t
    }.toMap
    val passes = (1 to nPasses).map(_ => (loadSentinel(), pass()))
    val lines = names.map { n =>
      val ts = passes.map(_._2(n)).sorted
      val med = if (ts.size % 2 == 1) ts(ts.size / 2)
                else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      f""""$n":{"min":${ts.min}%.3f,"median":$med%.3f}"""
    }
    val sentinels = passes.map(p => "\"" + p._1 + "\"").mkString(",")
    println(s"""{"sf_dir":"$sfDir","passes":$nPasses,"queries":{${lines.mkString(",")}},"load_sentinels":[$sentinels]}""")
    spark.stop()
  }
}
