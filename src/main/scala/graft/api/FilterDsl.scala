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

  /** Payload field absent (Qdrant `is_null` / ES `must_not exists`). */
  final case class IsNull(key: String) extends Condition {
    def toColumn: Column = col(key).isNull
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
        (o \ "match", o \ "range", o \ "is_null") match {
          case (m: JObject, JNothing, JNothing) =>
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
