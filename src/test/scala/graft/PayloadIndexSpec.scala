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

  test("geo layout: polygon and radius wire filters touch a fraction of the z-clustered files") {
    // a point frame with a geo payload field `loc` (stored as
    // loc_lat/loc_lon): 20k hash-uniform points on the 0.01° grid —
    // big enough that every hash-layout file holds box matches
    val pts = spark.range(0, 20000).toDF("user_id")
      .withColumn("loc_lat",
        pmod(xxhash64(col("user_id")), lit(18000L)).cast("double") / 100.0 - 90.0)
      .withColumn("loc_lon",
        pmod(xxhash64(col("user_id") + 7), lit(36000L)).cast("double") / 100.0 - 180.0)
      .localCheckpoint()
    val gDir = Files.createTempDirectory("graft-payload-geo").toString + "/g"
    val hDir = Files.createTempDirectory("graft-payload-geo").toString + "/h"
    val gl = PayloadIndex.Layout(geo = Some("loc"))
    PayloadIndex.write(pts, gDir, gl, numFiles = 32)
    pts.repartition(32, col("user_id")).write.parquet(hDir) // hash layout

    val polyWire =
      """{ "must": [ {"key": "loc", "geo_polygon": { "exterior": { "points": [
        |  {"lat": 5.0, "lon": 10.0}, {"lat": 5.0, "lon": 40.0},
        |  {"lat": 35.0, "lon": 40.0}, {"lat": 35.0, "lon": 10.0} ] } } } ] }""".stripMargin
    val radiusWire =
      """{ "must": [ {"key": "loc",
        |  "geo_radius": {"center": {"lat": 10.0, "lon": 20.0}, "radius": 1500000.0}} ] }""".stripMargin
    val poly = FilterDsl.fromJson(polyWire)
    val radius = FilterDsl.fromJson(radiusWire)
    assert(PayloadIndex.plan(poly, gl) == Seq("loc" -> "file_stats_skipped"))
    assert(PayloadIndex.plan(radius, gl) == Seq("loc" -> "file_stats_skipped"))

    // identical answers from both layouts (the bbox conjuncts are
    // implied by the exact predicate, so they must not change rows)
    for (f <- Seq(poly, radius)) {
      val got = PayloadIndex.scan(spark, gDir, f)
        .select("user_id").collect().map(_.getLong(0)).toSet
      val want = PayloadIndex.scan(spark, hDir, f)
        .select("user_id").collect().map(_.getLong(0)).toSet
      assert(got == want && got.nonEmpty, s"rows: z=${got.size} hash=${want.size}")
    }

    // the scale claim: files CONTAINING matching rows — the footer
    // min/max pruning bound — are a fraction of the z-layout but
    // essentially all of the hash layout
    def filesTouched(path: String, f: FilterDsl.Filter): Long =
      spark.read.parquet(path).filter(f.toColumn)
        .select(input_file_name()).distinct().count()
    for ((f, label) <- Seq(poly -> "polygon", radius -> "radius")) {
      val (zf, hf) = (filesTouched(gDir, f), filesTouched(hDir, f))
      assert(zf <= 10, s"$label: z-layout touched $zf of 32 files")
      assert(hf >= 26, s"$label: hash layout touched only $hf of 32 files")
    }
  }

  test("geo-shape layout: an intersection wire filter skips most bbox-clustered files") {
    // a shape frame with a shape-valued payload field `zone`:
    // constant-extent diamonds around hash-uniform centers, stored as
    // zone_shape + its four bbox columns (the at-rest geo_shape form)
    val rLat = 2.0; val rLon = 3.0
    val pts = spark.range(0, 20000).toDF("user_id")
      .withColumn("lat",
        pmod(xxhash64(col("user_id")), lit(18000L)).cast("double") / 100.0 - 90.0)
      .withColumn("lon",
        pmod(xxhash64(col("user_id") + 7), lit(36000L)).cast("double") / 100.0 - 180.0)
      .withColumn("zone_shape", array(
        struct((col("lon") + rLon).as("lon"), col("lat").as("lat")),
        struct(col("lon").as("lon"), (col("lat") + rLat).as("lat")),
        struct((col("lon") - rLon).as("lon"), col("lat").as("lat")),
        struct(col("lon").as("lon"), (col("lat") - rLat).as("lat"))))
      .withColumn("zone_latmin", col("lat") - rLat)
      .withColumn("zone_latmax", col("lat") + rLat)
      .withColumn("zone_lonmin", col("lon") - rLon)
      .withColumn("zone_lonmax", col("lon") + rLon)
      .localCheckpoint()
    val sDir = Files.createTempDirectory("graft-payload-shape").toString + "/s"
    val hDir = Files.createTempDirectory("graft-payload-shape").toString + "/h"
    val sl = PayloadIndex.Layout(geoShape = Some("zone"))
    PayloadIndex.write(pts, sDir, sl, numFiles = 32)
    pts.repartition(32, col("user_id")).write.parquet(hDir)

    val wire =
      """{ "must": [ {"key": "zone", "geo_shape": { "shape": { "points": [
        |  {"lat": 5.0, "lon": 10.0}, {"lat": 4.0, "lon": 40.0},
        |  {"lat": 35.0, "lon": 41.0}, {"lat": 36.0, "lon": 11.0} ] } } } ] }""".stripMargin
    val f = FilterDsl.fromJson(wire)
    assert(PayloadIndex.plan(f, sl) == Seq("zone" -> "file_stats_skipped"))
    // identical answers from both layouts, then the pruning bound
    val got = PayloadIndex.scan(spark, sDir, f)
      .select("user_id").collect().map(_.getLong(0)).toSet
    val want = PayloadIndex.scan(spark, hDir, f)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty, s"rows: z=${got.size} hash=${want.size}")
    def filesTouched(path: String): Long =
      spark.read.parquet(path).filter(f.toColumn)
        .select(input_file_name()).distinct().count()
    val (zf, hf) = (filesTouched(sDir), filesTouched(hDir))
    assert(zf <= 10, s"shape z-layout touched $zf of 32 files")
    assert(hf >= 26, s"hash layout touched only $hf of 32 files")
  }
}
