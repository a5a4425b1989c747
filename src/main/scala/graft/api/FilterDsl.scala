package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Structured payload-filter DSL — the boolean filter model every
  * backend of the reference exposes on its wire API (Qdrant `Filter`
  * with `must`/`should`/`must_not`, ES bool query, Milvus boolean
  * expressions, Chroma `where`, Weaviate `where`), compiled to ONE
  * Catalyst [[Column]] predicate.
  *
  * The compile target is the point: a filter built here lands in
  * `VectorCollection.search(preFilter = ...)` or any
  * `DataFrame.filter`, and flat conditions (match / range on plain
  * columns) push down to the parquet scan like hand-written
  * predicates — the DSL costs nothing at plan time. Semantics follow
  * Qdrant: `must` = all match, `mustNot` = none match, `should` = at
  * least `minShould` match (ES `minimum_should_match`).
  */
object FilterDsl {

  sealed trait Condition { def toColumn: Column }

  /** Exact payload match (Qdrant `match.value` / Chroma `$eq`). */
  final case class MatchValue(key: String, value: Any) extends Condition {
    def toColumn: Column = col(key) === lit(value)
  }

  /** Match-any-of (Qdrant `match.any` / ES `terms` / Chroma `$in`). */
  final case class MatchAny(key: String, values: Seq[Any]) extends Condition {
    def toColumn: Column = col(key).isin(values: _*)
  }

  /** Match-none-of (Qdrant `match.except` / Chroma `$nin`): the
    * negated terms filter, kept as NOT(In(...)) so it still pushes
    * to the scan.
    */
  final case class MatchExcept(key: String, values: Seq[Any]) extends Condition {
    def toColumn: Column = !col(key).isin(values: _*)
  }

  /** Numeric range (Qdrant `range` / ES `range`): any bound subset.
    * Bounds keep their integral/floating type — a double literal
    * against a long column would force a cast and lose parquet
    * pushdown.
    */
  final case class Range(key: String,
                         gte: Option[Any] = None, gt: Option[Any] = None,
                         lte: Option[Any] = None, lt: Option[Any] = None)
      extends Condition {
    def toColumn: Column =
      Seq(gte.map(col(key) >= lit(_)), gt.map(col(key) > lit(_)),
        lte.map(col(key) <= lit(_)), lt.map(col(key) < lit(_)))
        .flatten.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Substring containment on a text payload (Qdrant `match.text` /
    * Chroma `where_document.$contains`).
    */
  final case class TextContains(key: String, needle: String) extends Condition {
    def toColumn: Column = col(key).contains(needle)
  }

  /** Negated substring containment (Chroma `where_document`
    * `$not_contains`). NULL text is excluded, matching Chroma (a
    * document store has no null documents; a null payload field
    * satisfies neither polarity).
    */
  final case class TextNotContains(key: String, needle: String) extends Condition {
    def toColumn: Column = !col(key).contains(needle)
  }

  /** Regular-expression match on a text payload (Chroma
    * `where_document` `$regex` / `$not_regex` via `negate`) —
    * UNANCHORED like Chroma's: the pattern may match any substring.
    * Compiles to the codegen'd `RLike`; patterns should stick to the
    * RE2/Java common subset (no backreferences) to stay portable
    * across engines.
    */
  final case class TextRegex(key: String, pattern: String,
                             negate: Boolean = false) extends Condition {
    def toColumn: Column =
      if (negate) !col(key).rlike(pattern) else col(key).rlike(pattern)
  }

  /** Payload field absent (Qdrant `is_null` / ES `must_not exists`). */
  final case class IsNull(key: String) extends Condition {
    def toColumn: Column = col(key).isNull
  }

  /** Array-payload element containment (Milvus `ARRAY_CONTAINS` /
    * Qdrant `match.value` on an array field / ES `term` on a
    * multi-valued field): true when any element equals `value`. A
    * missing (null) array matches neither polarity (SQL null).
    */
  final case class ArrayContains(key: String, value: Any) extends Condition {
    def toColumn: Column = array_contains(col(key), lit(value))
  }

  /** All-of element containment (Milvus `ARRAY_CONTAINS_ALL`).
    * Compiles to a conjunction of `array_contains` — stays inside
    * whole-stage codegen with no per-row set allocation, and the
    * value list is a query constant so the conjunction size is fixed
    * at plan time.
    */
  final case class ArrayContainsAll(key: String, values: Seq[Any]) extends Condition {
    require(values.nonEmpty, s"array_contains_all for key '$key' needs values")
    def toColumn: Column =
      values.map(v => array_contains(col(key), lit(v))).reduce(_ && _)
  }

  /** Any-of element containment (Milvus `ARRAY_CONTAINS_ANY`):
    * native `arrays_overlap` against the literal value set.
    */
  final case class ArrayContainsAny(key: String, values: Seq[Any]) extends Condition {
    require(values.nonEmpty, s"array_contains_any for key '$key' needs values")
    def toColumn: Column =
      arrays_overlap(col(key), array(values.map(lit): _*))
  }

  /** Element-count range on an array payload (Qdrant `values_count`).
    * A missing (null) field counts as ZERO values — the explicit
    * `when` guard (rather than bare `size`) pins that semantics
    * regardless of the engine's legacy `size(NULL)` setting.
    *
    * SEMANTIC PIN, stated explicitly: missing ≡ empty (count 0), the
    * same convention [[IsEmpty]] uses — so an upper-bound-only filter
    * like `{"values_count": {"lt": 5}}` MATCHES points that lack the
    * field entirely. This is deliberate and internally consistent
    * (`values_count lt 5` ∪ `values_count gte 5` partitions the
    * collection), but engines differ here: backends that evaluate
    * conditions only against PRESENT payload fields would exclude
    * missing-field points from every values_count filter. Callers
    * porting filters who need present-only semantics should conjoin
    * `{"is_empty": false}`-style guards (here: a `gte: 1` bound).
    */
  final case class ValuesCount(key: String,
                               gte: Option[Long] = None, gt: Option[Long] = None,
                               lte: Option[Long] = None, lt: Option[Long] = None)
      extends Condition {
    def toColumn: Column = {
      val n = when(col(key).isNull, lit(0)).otherwise(size(col(key)))
      Seq(gte.map(n >= lit(_)), gt.map(n > lit(_)),
        lte.map(n <= lit(_)), lt.map(n < lit(_)))
        .flatten.reduceOption(_ && _).getOrElse(lit(true))
    }
  }

  /** Qdrant `is_empty`: the array field is absent (null) or has no
    * elements.
    */
  final case class IsEmpty(key: String) extends Condition {
    def toColumn: Column =
      when(col(key).isNull, lit(true)).otherwise(size(col(key)) === 0)
  }

  /** A geo payload field `k` is stored as two double columns
    * `k_lat` / `k_lon` (degrees) — the flattened form of Qdrant's
    * `{lat, lon}` geo point / ES `geo_point`.
    */
  sealed trait GeoCondition extends Condition {
    def key: String
    private[api] def latCol: Column = col(s"${key}_lat")
    private[api] def lonCol: Column = col(s"${key}_lon")

    /** The condition's bounding box (minLat, maxLat, minLon,
      * maxLon) — the rectangle that makes a geo predicate PRUNABLE:
      * [[toColumn]] conjoins these four range predicates (logically
      * implied by the exact predicate, so the result set is
      * unchanged) ahead of the exact test, and plain range
      * predicates on the layout's clustering columns are what
      * parquet footer min/max can skip files on. Without them the
      * exact trig/ray-cast expression reaches every file.
      */
    private[api] def bbox: (Double, Double, Double, Double)

    private[api] def bboxColumn: Column = {
      val (latMin, latMax, lonMin, lonMax) = bbox
      latCol >= lit(latMin) && latCol <= lit(latMax) &&
        lonCol >= lit(lonMin) && lonCol <= lit(lonMax)
    }
  }

  /** Rectangle containment (Qdrant `geo_bounding_box` / ES
    * `geo_bounding_box`). Does not model antimeridian-crossing
    * boxes (split into two conditions under `should` for that).
    */
  final case class GeoBoundingBox(key: String,
                                  minLat: Double, maxLat: Double,
                                  minLon: Double, maxLon: Double)
      extends GeoCondition {
    private[api] def bbox: (Double, Double, Double, Double) =
      (minLat, maxLat, minLon, maxLon)
    def toColumn: Column = bboxColumn
  }

  /** Great-circle radius filter (Qdrant `geo_radius` / ES
    * `geo_distance`), radius in meters on the wire like both. The
    * exact test is the same haversine as the geo search operators;
    * the implied bounding box widens the longitude span by the
    * shrinking cos(lat) at the box's most poleward latitude, and
    * degenerates to the whole longitude range across a pole.
    */
  final case class GeoRadius(key: String, lat: Double, lon: Double,
                             radiusMeters: Double) extends GeoCondition {
    private[api] def bbox: (Double, Double, Double, Double) = {
      val rKm = radiusMeters / 1000.0
      val dLat = rKm / 111.195 // km per degree of latitude (R=6371)
      val latMin = math.max(-90.0, lat - dLat)
      val latMax = math.min(90.0, lat + dLat)
      val worstCos = math.min(math.cos(math.toRadians(math.abs(latMin))),
        math.cos(math.toRadians(math.abs(latMax))))
      if (latMin <= -89.999 || latMax >= 89.999 || worstCos <= 1e-6)
        (latMin, latMax, -180.0, 180.0)
      else {
        val dLon = rKm / (111.195 * worstCos)
        (latMin, latMax,
          math.max(-180.0, lon - dLon), math.min(180.0, lon + dLon))
      }
    }
    def toColumn: Column =
      bboxColumn && graft.operators.Geo.haversineKm(
        lit(lat), lit(lon), latCol, lonCol) <= lit(radiusMeters / 1000.0)
  }

  /** Simple-polygon containment (Qdrant `geo_polygon` / ES
    * `geo_polygon`), even-odd ray cast — same arithmetic as the geo
    * search operator. Vertices as (lon, lat) pairs.
    */
  final case class GeoPolygon(key: String, verts: Seq[(Double, Double)])
      extends GeoCondition {
    require(verts.size >= 3, s"polygon needs >= 3 vertices, got ${verts.size}")
    private[api] def bbox: (Double, Double, Double, Double) =
      (verts.map(_._2).min, verts.map(_._2).max,
        verts.map(_._1).min, verts.map(_._1).max)
    def toColumn: Column =
      bboxColumn && graft.operators.Geo.pointInPolygon(lonCol, latCol, verts)
  }

  /** Shape-valued payload intersection (ES `geo_shape` with
    * `relation: intersects`): the field `k` is stored as the vertex
    * column `k_shape` (`array<struct<lon:double,lat:double>>`, a
    * simple polygon ring) plus its bbox columns `k_latmin`/
    * `k_latmax`/`k_lonmin`/`k_lonmax` (ingest-time constants of the
    * shape). The exact test is the generic three-leg polygon
    * intersection ([[graft.operators.Geo.shapeIntersectsPolygon]]);
    * the conjoined bbox-OVERLAP predicate is logically implied by
    * intersection, and — being plain ranges on the stored bbox
    * columns — is what parquet footer min/max prunes files on under
    * the [[PayloadIndex]] geo-shape layout.
    */
  final case class GeoShapeIntersects(key: String, verts: Seq[(Double, Double)])
      extends Condition {
    require(verts.size >= 3, s"query polygon needs >= 3 vertices, got ${verts.size}")
    private def qBbox: (Double, Double, Double, Double) =
      (verts.map(_._2).min, verts.map(_._2).max,
        verts.map(_._1).min, verts.map(_._1).max)
    private[api] def bboxColumn: Column = {
      val (latMin, latMax, lonMin, lonMax) = qBbox
      col(s"${key}_latmax") >= lit(latMin) && col(s"${key}_latmin") <= lit(latMax) &&
        col(s"${key}_lonmax") >= lit(lonMin) && col(s"${key}_lonmin") <= lit(lonMax)
    }
    def toColumn: Column =
      bboxColumn && graft.operators.Geo.shapeIntersectsPolygon(col(s"${key}_shape"), verts)
  }

  /** Nested boolean clause — bool-in-bool, arbitrarily deep. */
  final case class Nested(filter: Filter) extends Condition {
    def toColumn: Column = filter.toColumn
  }

  /** A boolean clause: all of `must`, none of `mustNot`, and at least
    * `minShould` of `should` (when any `should` are present).
    */
  final case class Filter(must: Seq[Condition] = Nil,
                          should: Seq[Condition] = Nil,
                          mustNot: Seq[Condition] = Nil,
                          minShould: Int = 1) {
    def toColumn: Column = {
      val m = must.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
      val n = mustNot.map(c => !c.toColumn).reduceOption(_ && _).getOrElse(lit(true))
      val s =
        if (should.isEmpty) lit(true)
        else should.map(_.toColumn.cast("int"))
          .reduce(_ + _) >= minShould
      m && n && s
    }
  }

  /** Parse the Qdrant-style JSON wire form, e.g.
    * {{{
    * { "must": [ {"key": "label", "match": {"value": 3}},
    *             {"key": "n_chars", "range": {"gte": 100, "lt": 900}} ],
    *   "must_not": [ {"key": "lang", "match": {"any": ["xx", "yy"]}} ],
    *   "should": [ {"key": "text", "match": {"text": "spark"}} ],
    *   "min_should": 1 }
    * }}}
    * Nested clauses nest a full filter object in place of a
    * condition. Unknown shapes fail fast with the offending fragment.
    */
  def fromJson(json: String): Filter = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def cond(v: JValue): Condition = v match {
      case o: JObject if (o \ "must") != JNothing || (o \ "should") != JNothing ||
          (o \ "must_not") != JNothing => Nested(filter(o))
      case o: JObject =>
        val key = (o \ "key") match {
          case JString(k) => k
          case other => sys.error(s"filter condition needs a string key, got $other")
        }
        // one condition = one family. Without this check a wire object
        // mixing families (e.g. array_contains + match) would silently
        // return the first family's condition and DROP the rest — the
        // same-family mixes already fail loudly as "ambiguous ... shape",
        // so cross-family mixes must too (fail-fast wire contract).
        val families = Seq(
          "geo" -> Seq("geo_bounding_box", "geo_radius", "geo_polygon", "geo_shape"),
          "array" -> Seq("array_contains", "array_contains_all",
            "array_contains_any", "values_count", "is_empty"),
          "scalar" -> Seq("match", "range", "is_null"))
        val present = families.collect {
          case (fam, keys) if keys.exists(k => (o \ k) != JNothing) => fam
        }
        if (present.size > 1) sys.error(
          s"condition for key '$key' mixes families ${present.mkString("/")}: $o")
        def dbl(v: JValue, what: String): Double = v match {
          case JDouble(d) => d; case JInt(n) => n.toDouble
          case JLong(n) => n.toDouble; case JDecimal(d) => d.toDouble
          case other => sys.error(s"non-numeric $what: $other")
        }
        def point(v: JValue, what: String): (Double, Double) =
          (dbl(v \ "lat", s"$what.lat"), dbl(v \ "lon", s"$what.lon"))
        (o \ "geo_bounding_box", o \ "geo_radius", o \ "geo_polygon",
          o \ "geo_shape") match {
          case (b: JObject, JNothing, JNothing, JNothing) =>
            val (tlLat, tlLon) = point(b \ "top_left", "top_left")
            val (brLat, brLon) = point(b \ "bottom_right", "bottom_right")
            return GeoBoundingBox(key, minLat = brLat, maxLat = tlLat,
              minLon = tlLon, maxLon = brLon)
          case (JNothing, r: JObject, JNothing, JNothing) =>
            val (cLat, cLon) = point(r \ "center", "center")
            return GeoRadius(key, cLat, cLon, dbl(r \ "radius", "radius"))
          case (JNothing, JNothing, p: JObject, JNothing) =>
            (p \ "exterior" \ "points") match {
              case JArray(pts) =>
                return GeoPolygon(key, pts.map { pt =>
                  val (la, lo) = point(pt, "polygon point"); (lo, la)
                })
              case other => sys.error(s"geo_polygon needs exterior.points: $other")
            }
          case (JNothing, JNothing, JNothing, s: JObject) =>
            (s \ "relation") match {
              case JNothing | JString("intersects") => ()
              case JString(rel) => sys.error(
                s"geo_shape relation '$rel' unsupported (intersects only)")
              case other => sys.error(s"geo_shape relation must be a string: $other")
            }
            (s \ "shape" \ "points") match {
              case JArray(pts) =>
                return GeoShapeIntersects(key, pts.map { pt =>
                  val (la, lo) = point(pt, "shape point"); (lo, la)
                })
              case other => sys.error(s"geo_shape needs shape.points: $other")
            }
          case (JNothing, JNothing, JNothing, JNothing) => // not geo; fall through
          case other => sys.error(s"ambiguous geo condition shape: $other")
        }
        (o \ "array_contains", o \ "array_contains_all", o \ "array_contains_any",
          o \ "values_count", o \ "is_empty") match {
          case (JNothing, JNothing, JNothing, JNothing, JNothing) => // not array; fall through
          case (v, JNothing, JNothing, JNothing, JNothing) if v != JNothing =>
            return ArrayContains(key, scalar(v))
          case (JNothing, JArray(vs), JNothing, JNothing, JNothing) =>
            if (vs.isEmpty) sys.error(s"array_contains_all for key '$key' has no values")
            return ArrayContainsAll(key, vs.map(scalar))
          case (JNothing, JNothing, JArray(vs), JNothing, JNothing) =>
            if (vs.isEmpty) sys.error(s"array_contains_any for key '$key' has no values")
            return ArrayContainsAny(key, vs.map(scalar))
          case (JNothing, JNothing, JNothing, r: JObject, JNothing) =>
            def cnt(f: String): Option[Long] = (r \ f) match {
              case JInt(n) => Some(n.toLong); case JLong(n) => Some(n)
              case JNothing => None
              case other => sys.error(s"non-integer values_count bound $f: $other")
            }
            val vc = ValuesCount(key, cnt("gte"), cnt("gt"), cnt("lte"), cnt("lt"))
            if (vc.gte.isEmpty && vc.gt.isEmpty && vc.lte.isEmpty && vc.lt.isEmpty)
              sys.error(s"values_count for key '$key' has no bounds: $r")
            return vc
          case (JNothing, JNothing, JNothing, JNothing, JBool(true)) =>
            return IsEmpty(key)
          case other => sys.error(s"ambiguous array condition shape: $other")
        }
        (o \ "match", o \ "range", o \ "is_null") match {
          case (m: JObject, JNothing, JNothing) =>
            (m \ "not_text", m \ "regex", m \ "not_regex") match {
              case (JString(t), JNothing, JNothing) => return TextNotContains(key, t)
              case (JNothing, JString(p), JNothing) => return TextRegex(key, p)
              case (JNothing, JNothing, JString(p)) => return TextRegex(key, p, negate = true)
              case (JNothing, JNothing, JNothing) => // plain match; fall through
              case other => sys.error(s"ambiguous text-match shape: $other")
            }
            (m \ "value", m \ "any", m \ "text", m \ "except") match {
              case (JNothing, JNothing, JString(t), JNothing) => TextContains(key, t)
              case (JNothing, JArray(vs), JNothing, JNothing) => MatchAny(key, vs.map(scalar))
              case (JNothing, JNothing, JNothing, JArray(vs)) => MatchExcept(key, vs.map(scalar))
              case (v2, JNothing, JNothing, JNothing) if v2 != JNothing => MatchValue(key, scalar(v2))
              case other => sys.error(s"unsupported match shape: $other")
            }
          case (JNothing, r: JObject, JNothing) =>
            def num(f: String): Option[Any] = (r \ f) match {
              case JInt(n) => Some(n.toLong); case JDouble(d) => Some(d)
              case JLong(n) => Some(n); case JDecimal(d) => Some(d.toDouble)
              case JNothing => None
              case other => sys.error(s"non-numeric range bound $f: $other")
            }
            val rng = Range(key, num("gte"), num("gt"), num("lte"), num("lt"))
            // a bound-less range would compile to match-all — uphold
            // the fail-fast contract instead of silently selecting
            // everything on a malformed wire filter
            if (rng.gte.isEmpty && rng.gt.isEmpty && rng.lte.isEmpty && rng.lt.isEmpty)
              sys.error(s"range for key '$key' has no bounds: $r")
            rng
          case (JNothing, JNothing, JBool(true)) => IsNull(key)
          case other => sys.error(s"unsupported condition shape: $other")
        }
      case other => sys.error(s"unsupported condition: $other")
    }
    def scalar(v: JValue): Any = v match {
      case JString(s) => s
      case JInt(n) => n.toLong
      case JLong(n) => n
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
      case JBool(b) => b
      case other => sys.error(s"unsupported scalar: $other")
    }
    def conds(v: JValue): Seq[Condition] = v match {
      case JArray(vs) => vs.map(cond)
      case JNothing => Nil
      case single => Seq(cond(single))
    }
    def filter(o: JValue): Filter = Filter(
      must = conds(o \ "must"),
      should = conds(o \ "should"),
      mustNot = conds(o \ "must_not"),
      minShould = (o \ "min_should") match {
        case JInt(n) => n.toInt; case JLong(n) => n.toInt; case _ => 1
      })
    filter(JsonMethods.parse(json))
  }
}
