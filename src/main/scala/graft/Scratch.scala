package graft
import org.apache.spark.sql.SparkSession

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
    // warm training
    t("train")(operators.Quantization.trainPqCodebooks(spark, sfDir))
    (1 to 3).foreach { rep =>
      val df = t(s"rep$rep build")(SparkEntry.queries("q_ivfpq_knn")(spark, sfDir))
      t(s"rep$rep plan")(df.queryExecution.executedPlan)
      t(s"rep$rep count")(df.count())
    }
    org.apache.log4j.Logger
      .getLogger("org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
      .setLevel(org.apache.log4j.Level.INFO)
    (1 to 2).foreach { rep =>
      val df = SparkEntry.queries("q_ivfpq_knn")(spark, sfDir)
      t(s"logged rep$rep count")(df.count())
    }
    spark.stop()
  }
}
