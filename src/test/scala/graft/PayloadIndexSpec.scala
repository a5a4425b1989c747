package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode
import graft.api.{FilterDsl, PayloadIndex}

/** Payload-index layout contract: a FilterDsl predicate over declared
  * fields skips files — directories for keyword fields, footer-stats
  * files for the numeric clustering key — and the planner reports
  * which condition prunes what.
  */
class PayloadIndexSpec extends SparkSpec {

  private val layout = PayloadIndex.Layout(
    keyword = Seq("lang"), numeric = Seq("n_chars"))

  private val wire =
    """{ "must": [ {"key": "lang", "match": {"value": "en"}},
      |            {"key": "n_chars", "range": {"gte": 100, "lt": 220}} ] }""".stripMargin

  test("indexed layout answers a wire filter identically to a raw scan") {
    val docs = Tables.documents(spark, sfDir)
    val dir = Files.createTempDirectory("graft-payload-idx").toString + "/docs"
    PayloadIndex.write(docs, dir, layout)
    val f = FilterDsl.fromJson(wire)
    val got = PayloadIndex.scan(spark, dir, f)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.filter(col("lang") === "en" &&
        col("n_chars") >= 100 && col("n_chars") < 220)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("planner classifies conditions against the layout; keyword predicate partition-prunes in the plan") {
    val f = FilterDsl.fromJson(wire)
    assert(PayloadIndex.plan(f, layout) ==
      Seq("lang" -> "partition_pruned", "n_chars" -> "file_stats_skipped"))
    // an un-indexed field is served, but only as a row filter
    val f2 = FilterDsl.Filter(must = Seq(FilterDsl.TextContains("text", "spark")))
    assert(PayloadIndex.plan(f2, layout) == Seq("text" -> "row_filtered"))

    val docs = Tables.documents(spark, sfDir)
    val dir = Files.createTempDirectory("graft-payload-plan").toString + "/docs"
    PayloadIndex.write(docs, dir, layout)
    val p = PayloadIndex.scan(spark, dir, f)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters") && p.contains("lang"), p)
    // the numeric bounds reach the parquet reader as pushed filters
    assert(p.contains("GreaterThanOrEqual(n_chars,100)") && p.contains("LessThan(n_chars,220)"), p)
  }

  test("range-clustered files skip on footer stats where an unclustered layout reads everything") {
    val docs = Tables.documents(spark, sfDir)
    val iDir = Files.createTempDirectory("graft-payload-z").toString + "/i"
    val hDir = Files.createTempDirectory("graft-payload-z").toString + "/h"
    PayloadIndex.write(docs, iDir, PayloadIndex.Layout(numeric = Seq("n_chars")), numFiles = 8)
    docs.repartition(8, col("doc_id")).write.parquet(hDir) // hash layout, same file count
    // files CONTAINING matching rows = the footer-pruning bound for
    // this predicate (the input_file_name measurement of ScaleOpsSpec)
    def filesTouched(path: String): Long =
      spark.read.parquet(path).filter(col("n_chars") >= 100 && col("n_chars") < 150)
        .select(input_file_name()).distinct().count()
    val (if_, hf) = (filesTouched(iDir), filesTouched(hDir))
    assert(if_ <= 2, s"clustered layout touched $if_ files")
    assert(hf >= 6, s"hash layout touched only $hf of 8 files")
    assert(spark.read.parquet(iDir).count() == docs.count())
  }
}
