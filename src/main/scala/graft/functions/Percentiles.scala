package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** The exact ↔ approximate percentile switch.
  *
  * Every percentile in the library goes through [[pctl.of]]: exact
  * `percentile` (linear-interpolation, the DuckDB `quantile_cont`
  * definition the oracles compare against) by default, and
  * `approx_percentile` (t-digest-style G-K sketch, the constant-
  * memory-per-group shape a 100 TB corpus needs) when the session
  * sets `spark.graft.approxPercentile=true`. The swap changes ONLY
  * the aggregate expression — group-by keys, shuffles, and every
  * surrounding plan shape stay identical, which is what makes the
  * "flip this at scale" claim testable: PercentileSwitchSpec runs
  * the full percentile query family in both modes and pins the
  * error bound.
  *
  * `spark.graft.approxPercentile.accuracy` (default 10000) is the
  * G-K accuracy parameter: rank error ≤ n/accuracy. Groups smaller
  * than the accuracy are answered exactly.
  */
object pctl {
  val Flag = "spark.graft.approxPercentile"
  val AccuracyFlag = "spark.graft.approxPercentile.accuracy"

  def approxEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption(Flag).exists(_.toBoolean)

  private def accuracy(spark: SparkSession): Long =
    spark.conf.getOption(AccuracyFlag).fold(10000L)(_.toLong)

  /** Percentile(s) of `c` at probability/probabilities `probs` (a
    * double literal or array of them), exact or approximate per the
    * session flag.
    */
  def of(spark: SparkSession, c: Column, probs: Column): Column =
    if (approxEnabled(spark)) approx_percentile(c, probs, lit(accuracy(spark)))
    else percentile(c, probs)
}
