package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.pctl
import graft.operators.{Relational, TextAnalysis}

/** The exact ↔ approximate percentile switch is executable, not a
  * comment: with `spark.graft.approxPercentile=true` every percentile
  * query compiles to `approx_percentile` (visible in the plan) with
  * NO other plan change, and the answers stay within the sketch's
  * documented rank-error bound of the exact answers.
  */
class PercentileSwitchSpec extends SparkSpec {

  private val queries: Seq[(String, () => DataFrame)] = Seq(
    "q_percentiles" -> (() => Relational.qPercentiles(spark, sfDir)),
    "q_mad" -> (() => Relational.qMad(spark, sfDir)),
    "q_boxplot" -> (() => Relational.qBoxplot(spark, sfDir)),
    "q_percentiles_bucket" -> (() => Relational.qPercentilesBucket(spark, sfDir)),
    "q_moving_percentiles" -> (() => Relational.qMovingPercentiles(spark, sfDir)),
    "q_perplexity_buckets" -> (() => TextAnalysis.qPerplexityBuckets(spark, sfDir)))

  private def withApprox[T](accuracy: Long = 10000L)(body: => T): T = {
    spark.conf.set(pctl.Flag, "true")
    spark.conf.set(pctl.AccuracyFlag, accuracy.toString)
    try body
    finally {
      spark.conf.unset(pctl.Flag)
      spark.conf.unset(pctl.AccuracyFlag)
    }
  }

  test("the flag swaps the aggregate in the plan and nothing else") {
    val exact = Relational.qPercentiles(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    val approx = withApprox()(Relational.qPercentiles(spark, sfDir)
      .queryExecution.optimizedPlan.toString)
    assert(!exact.contains("approx_percentile") && exact.contains("percentile"))
    assert(approx.contains("approx_percentile"))
    // same shape: node kinds line up one-to-one after stripping the
    // expression text (the only difference is the aggregate function)
    def shape(p: String) = p.linesIterator
      .map(_.dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':')
        .takeWhile(_ != ' ')).toSeq
    assert(shape(exact) == shape(approx), s"plan shape changed:\n$exact\nvs\n$approx")
  }

  test("approx q_percentiles answers are rank-certified against the raw value distribution") {
    // the actual G-K guarantee: with every group below the accuracy
    // parameter the sketch answers within ONE rank of the true
    // percentile — certify each approx value against the sorted raw
    // values, one rank of slack either side (the exact interpolated
    // answer can differ more in VALUE on a heavy tail, which is why a
    // flat value-error bound is the wrong spec)
    val raw = Tables.events(spark, sfDir).select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getDouble(1)).sorted
      }
    val approx = withApprox()(Relational.qPercentiles(spark, sfDir).collect())
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val vs = raw(r.getString(0))
      val n = vs.length
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99).foreach { case (c, p) =>
        val v = r.getAs[Double](c)
        val lo = vs(math.max(0, math.floor(p * (n - 1)).toInt - 1))
        val hi = vs(math.min(n - 1, math.ceil(p * (n - 1)).toInt + 1))
        assert(v >= lo - 1e-6 && v <= hi + 1e-6,
          s"${r.getString(0)}.$c: $v outside one-rank band [$lo, $hi] (n=$n)")
      }
    }
  }

  test("approximate answers track exact answers query family-wide") {
    queries.foreach { case (name, build) =>
      val exact = build().collect()
      val approx = withApprox()(build().collect())
      assert(exact.length == approx.length, s"$name: row counts differ")
      // non-tail columns track closely; extreme-tail columns (p9x)
      // are value-unbounded under a one-rank step on a sparse tail —
      // the rank-certified test above is their spec, not a value gap
      val schema = build().schema
      val numeric = schema.fields.zipWithIndex.filter { case (f, _) =>
        f.dataType.typeName == "double" && !f.name.matches("p9\\d") }
      assert(numeric.nonEmpty, s"$name: no numeric columns to compare")
      numeric.foreach { case (f, i) =>
        val e = exact.map(r => if (r.isNullAt(i)) 0.0 else r.getDouble(i))
        val a = approx.map(r => if (r.isNullAt(i)) 0.0 else r.getDouble(i))
        e.zip(a).foreach { case (ev, av) =>
          assert(math.abs(ev - av) <= 0.15 * math.abs(ev) + 0.1,
            s"$name.${f.name}: exact=$ev approx=$av")
        }
      }
    }
  }

  test("a coarse sketch degrades gracefully, a fine sketch converges to exact") {
    val exact = Relational.qPercentilesBucket(spark, sfDir).collect().head
    val fine = withApprox(accuracy = 100000L)(
      Relational.qPercentilesBucket(spark, sfDir).collect().head)
    // fine sketch over a small frame IS exact up to interpolation
    Seq("p25", "p50", "p75").foreach { c =>
      val e = exact.getAs[Double](c)
      val f = fine.getAs[Double](c)
      assert(math.abs(e - f) <= math.abs(e) * 0.02 + 1e-6, s"$c: $e vs $f")
    }
    val coarse = withApprox(accuracy = 10L)(
      Relational.qPercentilesBucket(spark, sfDir).collect().head)
    // rank error ≤ n/accuracy: still ordered, still within the value range
    val (p25, p50, p75) = (coarse.getAs[Double]("p25"),
      coarse.getAs[Double]("p50"), coarse.getAs[Double]("p75"))
    assert(p25 <= p50 && p50 <= p75)
  }
}
