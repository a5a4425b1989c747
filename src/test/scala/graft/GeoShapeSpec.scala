package graft

import org.apache.spark.sql.functions._
import graft.api.FilterDsl
import graft.operators.Geo

/** geo_shape payloads (ES `geo_shape`, relation intersects): the
  * generic three-leg polygon-intersection expression, its agreement
  * with the independent Minkowski formulation the oracle uses, and
  * the wire form.
  */
class GeoShapeSpec extends SparkSpec {

  import spark.implicits._

  private def oneShape(verts: Seq[(Double, Double)]) =
    Seq(Tuple1(verts.map { case (lo, la) => (lo, la) })).toDF("raw")
      .select(transform(col("raw"),
        v => struct(v("_1").as("lon"), v("_2").as("lat"))).as("shape"))

  private def intersects(shapeVerts: Seq[(Double, Double)],
                         p: Seq[(Double, Double)]): Boolean =
    oneShape(shapeVerts)
      .select(Geo.shapeIntersectsPolygon(col("shape"), p).as("hit"))
      .head().getBoolean(0)

  test("three-leg intersection: vertex containment both ways, proper edge crossing, disjoint") {
    val bigDiamond = Seq((10.0, 0.0), (0.0, 10.0), (-10.0, 0.0), (0.0, -10.0))
    val smallTriangleAtOrigin = Seq((-1.0, -1.0), (1.0, -1.0), (0.0, 1.0))
    val triangleUp = Seq((-10.0, -5.0), (10.0, -5.0), (0.0, 12.0))
    val triangleDown = Seq((-10.0, 5.0), (10.0, 5.0), (0.0, -12.0))
    val farAway = Seq((100.0, 50.0), (102.0, 50.0), (101.0, 52.0))

    // leg 1: a stored vertex inside the query polygon
    assert(intersects(smallTriangleAtOrigin, bigDiamond))
    // leg 2: query vertices inside the stored shape (containment the
    // other way — no stored vertex is in the query polygon)
    assert(intersects(bigDiamond, smallTriangleAtOrigin))
    // leg 3: star-of-David — edges cross, NO vertex of either is
    // inside the other
    assert(intersects(triangleUp, triangleDown))
    // disjoint shapes stay disjoint
    assert(!intersects(triangleUp, farAway))
    assert(!intersects(farAway, bigDiamond))
  }

  test("generic intersection agrees with the Minkowski oracle reduction on a dense point frame") {
    // the oracle's claim, machine-checked on 20k hash-uniform
    // centers (the sf0.001 corpus has only 15 users — far too sparse
    // to populate the dilation band): diamond(center, const extents)
    // ∩ P  <=>  center ∈ P ⊕ D
    val pts = spark.range(0, 20000).toDF("user_id")
      .withColumn("lat",
        pmod(xxhash64(col("user_id")), lit(18000L)).cast("double") / 100.0 - 90.0)
      .withColumn("lon",
        pmod(xxhash64(col("user_id") + 7), lit(36000L)).cast("double") / 100.0 - 180.0)
      .withColumn("zone_shape", array(
        struct((col("lon") + Geo.ShapeRLon).as("lon"), col("lat").as("lat")),
        struct(col("lon").as("lon"), (col("lat") + Geo.ShapeRLat).as("lat")),
        struct((col("lon") - Geo.ShapeRLon).as("lon"), col("lat").as("lat")),
        struct(col("lon").as("lon"), (col("lat") - Geo.ShapeRLat).as("lat"))))
      .localCheckpoint()
    val generic = pts
      .filter(Geo.shapeIntersectsPolygon(col("zone_shape"), Geo.ShapeQueryVerts))
      .select("user_id").as[Long].collect().toSet
    val viaMinkowski = pts
      .filter(Geo.pointInPolygon(col("lon"), col("lat"), Geo.shapeOracleVerts))
      .select("user_id").as[Long].collect().toSet
    assert(generic == viaMinkowski,
      s"generic-only: ${(generic -- viaMinkowski).take(5)}; " +
        s"minkowski-only: ${(viaMinkowski -- generic).take(5)}")
    assert(generic.nonEmpty, "degenerate test: no shape intersects the query polygon")
    // and some intersections are PARTIAL (center outside P — the
    // dilation band), so the test isn't just point-in-polygon twice
    val centersInP = pts
      .filter(Geo.pointInPolygon(col("lon"), col("lat"), Geo.ShapeQueryVerts))
      .select("user_id").as[Long].collect().toSet
    assert((generic -- centersInP).nonEmpty,
      "no boundary-band rows: the shape machinery was never exercised beyond centers")
    // the registered query entry equals the corpus-level reduction
    // too (the exact pair the DuckDB oracle hash-checks at sf0.01)
    val entry = Geo.qGeoShape(spark, sfDir).select("user_id").as[Long].collect().toSet
    val corpusMink = Geo.userGeo(spark, sfDir)
      .filter(Geo.pointInPolygon(col("lon"), col("lat"), Geo.shapeOracleVerts))
      .select("user_id").as[Long].collect().toSet
    assert(entry == corpusMink)
  }

  test("geo_shape wire form parses; unsupported relations and malformed shapes fail fast") {
    val wire =
      """{ "must": [ {"key": "zone", "geo_shape": { "relation": "intersects",
        |  "shape": { "points": [ {"lat": -25.115, "lon": -40.37},
        |    {"lat": -30.425, "lon": 35.29}, {"lat": 22.175, "lon": 48.73},
        |    {"lat": 38.645, "lon": -25.19} ] } } } ] }""".stripMargin
    val f = FilterDsl.fromJson(wire)
    f.must match {
      case Seq(FilterDsl.GeoShapeIntersects("zone", verts)) =>
        assert(verts == Geo.ShapeQueryVerts)
      case other => fail(s"parsed to $other")
    }
    val e1 = intercept[RuntimeException] {
      FilterDsl.fromJson(
        """{ "must": [ {"key": "z", "geo_shape": { "relation": "within",
          |  "shape": { "points": [ {"lat": 0, "lon": 0}, {"lat": 1, "lon": 0},
          |  {"lat": 0, "lon": 1} ] } } } ] }""".stripMargin)
    }
    assert(e1.getMessage.contains("within"))
    val e2 = intercept[RuntimeException] {
      FilterDsl.fromJson("""{ "must": [ {"key": "z", "geo_shape": {} } ] }""")
    }
    assert(e2.getMessage.contains("shape.points"))
    // the filter actually filters: apply to the corpus shape frame
    // (field key "zone" matches the stored zone_* columns)
    val shapeWire =
      """{ "must": [ {"key": "zone", "geo_shape": { "shape": { "points": [
        |  {"lat": -25.115, "lon": -40.37}, {"lat": -30.425, "lon": 35.29},
        |  {"lat": 22.175, "lon": 48.73}, {"lat": 38.645, "lon": -25.19} ] } } } ] }""".stripMargin
    val viaWire = Geo.userShapes(spark, sfDir)
      .filter(FilterDsl.fromJson(shapeWire).toColumn)
      .select("user_id").as[Long].collect().toSet
    val direct = Geo.qGeoShape(spark, sfDir).select("user_id").as[Long].collect().toSet
    assert(direct == viaWire, "wire filter disagrees with the query entry")
  }

  test("minkowskiSum: convex sum contains both translates and equals brute force on a grid") {
    val p = Geo.ShapeQueryVerts
    val d = Seq((5.73, 0.0), (0.0, 3.17), (-5.73, 0.0), (0.0, -3.17))
    val m = Geo.minkowskiSum(p, d)
    assert(m.size == p.size + d.size, s"convex sum has ${m.size} vertices")
    // brute force: for a lattice of centers, diamond-intersects-P
    // (computed via the generic Spark expression) must equal
    // center-in-M (computed via the same ray cast the oracle uses)
    val centers = for (i <- 0 until 13; j <- 0 until 13)
      yield (-60.0 + j * 9.7, -45.0 + i * 7.3)
    val centersDf = centers.toDF("lon", "lat")
      .withColumn("shape", array(
        struct((col("lon") + d.head._1).as("lon"), col("lat").as("lat")),
        struct(col("lon").as("lon"), (col("lat") + d(1)._2).as("lat")),
        struct((col("lon") - d.head._1).as("lon"), col("lat").as("lat")),
        struct(col("lon").as("lon"), (col("lat") - d(1)._2).as("lat"))))
    val rows = centersDf.select(
      Geo.shapeIntersectsPolygon(col("shape"), p).as("generic"),
      Geo.pointInPolygon(col("lon"), col("lat"), m).as("mink")).collect()
    val disagree = rows.count(r => r.getBoolean(0) != r.getBoolean(1))
    assert(disagree == 0, s"$disagree of ${rows.length} grid centers disagree")
    assert(rows.count(_.getBoolean(0)) > 10, "degenerate grid: almost nothing intersects")
  }
}
