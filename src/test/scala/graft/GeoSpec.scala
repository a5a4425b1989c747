package graft

import graft.operators.Geo
import org.apache.spark.sql.functions._

/** Pins the closed-form integer geohash encode against an
  * INDEPENDENTLY-written reference implementation of the standard
  * interval-subdivision algorithm — the DuckDB oracle's bit terms are
  * generated from the same loop as the Spark expression, so by
  * construction the oracle cannot catch an interleave bug; this spec
  * can.
  */
class GeoSpec extends SparkSpec {

  /** The textbook geohash algorithm, written from the published
    * description (halve the lon interval on even bits, the lat
    * interval on odd bits, emit base-32 digits of 5 bits) — sharing
    * no arithmetic with [[Geo.geohash3]]'s quantize-and-interleave
    * form.
    */
  private def refGeohash(lat: Double, lon: Double, len: Int): String = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    var (latLo, latHi) = (-90.0, 90.0)
    var (lonLo, lonHi) = (-180.0, 180.0)
    val sb = new StringBuilder
    var even = true; var bit = 0; var ch = 0
    while (sb.length < len) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = ch * 2 + 1; lonLo = mid } else { ch = ch * 2; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = ch * 2 + 1; latLo = mid } else { ch = ch * 2; latHi = mid }
      }
      even = !even; bit += 1
      if (bit == 5) { sb.append(alpha(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  private def sparkGeohash(pts: Seq[(Double, Double)]): Seq[String] = {
    import spark.implicits._
    pts.toDF("lat", "lon")
      .withColumn("gh", Geo.geohash3(col("lat"), col("lon")))
      .collect().map(_.getAs[String]("gh")).toSeq
  }

  test("geohash3 matches published geohashes of fixed landmarks") {
    // well-known precision-3 prefixes of the standard geohash
    val landmarks = Seq(
      (48.8566, 2.3522)    -> "u09", // Paris
      (40.7128, -74.0060)  -> "dr5", // New York
      (-33.8688, 151.2093) -> "r3g", // Sydney
      (35.6762, 139.6503)  -> "xn7", // Tokyo
      (0.0, 0.0)           -> "s00", // null island (on-boundary case)
      (-89.9, -179.9)      -> "000",
      (89.9, 179.9)        -> "zzz")
    val got = sparkGeohash(landmarks.map(_._1))
    landmarks.zip(got).foreach { case (((la, lo), want), g) =>
      assert(g == want, s"($la, $lo): got $g want $want")
      assert(refGeohash(la, lo, 3) == want,
        s"reference encoder itself off at ($la, $lo)")
    }
  }

  test("geohash3 agrees with the reference subdivision on 20k random points") {
    val rnd = new scala.util.Random(4242)
    val pts = Seq.fill(20000)((rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180))
    val got = sparkGeohash(pts)
    pts.zip(got).foreach { case ((la, lo), g) =>
      assert(g == refGeohash(la, lo, 3), s"mismatch at ($la, $lo): $g")
    }
  }
}
