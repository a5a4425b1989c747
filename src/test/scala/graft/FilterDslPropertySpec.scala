package graft

import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.api.FilterDsl
import graft.api.FilterDsl._

/** Fuzz property for the wire-filter contract: every JSON input
  * either parses to a predicate whose three-valued result equals the
  * DSL's interpreted semantics on every row, or fails fast with
  * `sys.error` — NEVER a silent match-all. Guards the class of bug
  * the round-4 advice found at FilterDsl.scala's empty-range clause:
  * a malformed wire filter that quietly compiles to `true` turns a
  * delete-by-filter into a full wipe.
  */
class FilterDslPropertySpec extends SparkSpec {

  // ---- test relation: label BIGINT, score DOUBLE, lang STRING
  // (nullable), text STRING, tags ARRAY<STRING> (nullable, sometimes
  // empty — the array-condition family's three interesting states) ----
  private case class R(id: Long, label: Long, score: Double,
                       lang: Option[String], text: String,
                       tags: Option[Seq[String]])

  private val langs = Seq("en", "de", "fr", "pt")
  private val tokens = Seq("alpha", "bravo", "charlie", "delta", "echo")

  private lazy val rows: Seq[R] = {
    val rnd = new scala.util.Random(42)
    (0L until 200L).map { i =>
      R(i, rnd.nextInt(10).toLong, rnd.nextInt(40) / 4.0,
        if (rnd.nextInt(5) == 0) None else Some(langs(rnd.nextInt(langs.size))),
        Seq.fill(3)(tokens(rnd.nextInt(tokens.size))).mkString(" "),
        if (rnd.nextInt(6) == 0) None
        else Some(Seq.fill(rnd.nextInt(4))(tokens(rnd.nextInt(tokens.size)))))
    }
  }

  // ---- generators over the AST, rendered to wire JSON ----
  private val genScalarKey = Gen.oneOf("label", "lang")
  private def genValueFor(key: String): Gen[Any] =
    if (key == "label") Gen.choose(0L, 10L) else Gen.oneOf(langs :+ "xx")

  private val genLeaf: Gen[Condition] = Gen.frequency(
    3 -> (for { k <- genScalarKey; v <- genValueFor(k) } yield MatchValue(k, v)),
    2 -> (for { k <- genScalarKey; n <- Gen.choose(1, 3)
                vs <- Gen.listOfN(n, genValueFor(k)) } yield MatchAny(k, vs.distinct)),
    2 -> (for { k <- genScalarKey; n <- Gen.choose(1, 3)
                vs <- Gen.listOfN(n, genValueFor(k)) } yield MatchExcept(k, vs.distinct)),
    3 -> (for {
      k <- Gen.oneOf("label", "score")
      bound = if (k == "label") Gen.oneOf(Gen.choose(0L, 10L), Gen.choose(0.0, 10.0).map(d => (d * 4).floor / 4.0))
              else Gen.choose(0.0, 10.0).map(d => (d * 4).floor / 4.0)
      gte <- Gen.option(bound); gt <- Gen.option(bound)
      lte <- Gen.option(bound); lt <- Gen.option(bound)
      if gte.nonEmpty || gt.nonEmpty || lte.nonEmpty || lt.nonEmpty
    } yield Range(k, gte, gt, lte, lt)),
    2 -> Gen.oneOf(tokens ++ Seq("alp", "zz")).map(TextContains("text", _)),
    1 -> Gen.oneOf(tokens ++ Seq("alp", "zz")).map(TextNotContains("text", _)),
    1 -> (for {
      p <- Gen.oneOf("al.ha", "(alpha|echo)", "bravo charlie", "zz+", "^delta", "echo$")
      neg <- Gen.oneOf(false, true)
    } yield TextRegex("text", p, neg)),
    1 -> Gen.oneOf("lang", "label").map(IsNull(_)),
    2 -> Gen.oneOf(tokens :+ "zz").map(ArrayContains("tags", _)),
    1 -> (for { n <- Gen.choose(1, 2); vs <- Gen.listOfN(n, Gen.oneOf(tokens :+ "zz")) }
      yield ArrayContainsAll("tags", vs.distinct)),
    1 -> (for { n <- Gen.choose(1, 2); vs <- Gen.listOfN(n, Gen.oneOf(tokens :+ "zz")) }
      yield ArrayContainsAny("tags", vs.distinct)),
    1 -> (for {
      gte <- Gen.option(Gen.choose(0L, 4L)); gt <- Gen.option(Gen.choose(0L, 4L))
      lte <- Gen.option(Gen.choose(0L, 4L)); lt <- Gen.option(Gen.choose(0L, 4L))
      if gte.nonEmpty || gt.nonEmpty || lte.nonEmpty || lt.nonEmpty
    } yield ValuesCount("tags", gte, gt, lte, lt)),
    1 -> Gen.const(IsEmpty("tags")))

  private def genCond(depth: Int): Gen[Condition] =
    if (depth <= 0) genLeaf
    // a NESTED bool needs at least one clause to be recognizable as
    // one on the wire (and an empty nested bool is rejected by the
    // parser as malformed, which the corruption test relies on)
    else Gen.frequency(4 -> genLeaf, 1 -> genFilter(depth - 1, nonEmpty = true).map(Nested(_)))

  private def genFilter(depth: Int, nonEmpty: Boolean = false): Gen[Filter] = for {
    nm0 <- Gen.choose(0, 2); ns <- Gen.choose(0, 2); nn <- Gen.choose(0, 2)
    nm = if (nonEmpty && nm0 + ns + nn == 0) 1 else nm0
    must <- Gen.listOfN(nm, genCond(depth))
    should <- Gen.listOfN(ns, genCond(depth))
    mustNot <- Gen.listOfN(nn, genCond(depth))
    minShould <- Gen.choose(1, math.max(1, ns))
  } yield Filter(must, should, mustNot, minShould)

  // ---- wire rendering (the client side of the contract) ----
  private def q(s: String) = "\"" + s + "\""
  private def jv(v: Any): String = v match {
    case s: String => q(s)
    case other => other.toString
  }
  private def renderCond(c: Condition): String = c match {
    case MatchValue(k, v) => s"""{"key":${q(k)},"match":{"value":${jv(v)}}}"""
    case MatchAny(k, vs) => s"""{"key":${q(k)},"match":{"any":[${vs.map(jv).mkString(",")}]}}"""
    case MatchExcept(k, vs) => s"""{"key":${q(k)},"match":{"except":[${vs.map(jv).mkString(",")}]}}"""
    case TextContains(k, t) => s"""{"key":${q(k)},"match":{"text":${q(t)}}}"""
    case TextNotContains(k, t) => s"""{"key":${q(k)},"match":{"not_text":${q(t)}}}"""
    case TextRegex(k, p, neg) =>
      val f = if (neg) "not_regex" else "regex"
      s"""{"key":${q(k)},"match":{${q(f)}:${q(p)}}}"""
    case Range(k, gte, gt, lte, lt) =>
      val bs = Seq("gte" -> gte, "gt" -> gt, "lte" -> lte, "lt" -> lt)
        .collect { case (n, Some(v)) => s"${q(n)}:${jv(v)}" }
      s"""{"key":${q(k)},"range":{${bs.mkString(",")}}}"""
    case IsNull(k) => s"""{"key":${q(k)},"is_null":true}"""
    case ArrayContains(k, v) => s"""{"key":${q(k)},"array_contains":${jv(v)}}"""
    case ArrayContainsAll(k, vs) =>
      s"""{"key":${q(k)},"array_contains_all":[${vs.map(jv).mkString(",")}]}"""
    case ArrayContainsAny(k, vs) =>
      s"""{"key":${q(k)},"array_contains_any":[${vs.map(jv).mkString(",")}]}"""
    case ValuesCount(k, gte, gt, lte, lt) =>
      val bs = Seq("gte" -> gte, "gt" -> gt, "lte" -> lte, "lt" -> lt)
        .collect { case (n, Some(v)) => s"${q(n)}:$v" }
      s"""{"key":${q(k)},"values_count":{${bs.mkString(",")}}}"""
    case IsEmpty(k) => s"""{"key":${q(k)},"is_empty":true}"""
    case Nested(f) => renderFilter(f)
  }
  private def renderFilter(f: Filter): String = {
    val parts = Seq(
      if (f.must.nonEmpty) Some(s""""must":[${f.must.map(renderCond).mkString(",")}]""") else None,
      if (f.should.nonEmpty) Some(s""""should":[${f.should.map(renderCond).mkString(",")}]""") else None,
      if (f.mustNot.nonEmpty) Some(s""""must_not":[${f.mustNot.map(renderCond).mkString(",")}]""") else None,
      Some(s""""min_should":${f.minShould}""")).flatten
    s"{${parts.mkString(",")}}"
  }

  // ---- reference interpreter with SQL three-valued logic ----
  private def kAnd(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] =
    (a, b) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
  private def kNot(a: Option[Boolean]): Option[Boolean] = a.map(!_)

  private def field(r: R, k: String): Option[Any] = k match {
    case "label" => Some(r.label); case "score" => Some(r.score)
    case "lang" => r.lang; case "text" => Some(r.text)
    case "tags" => r.tags
  }
  private def tagsOf(r: R, k: String): Option[Seq[String]] =
    field(r, k).map(_.asInstanceOf[Seq[String]])
  private def asD(v: Any): Double = v match {
    case l: Long => l.toDouble; case d: Double => d
    case i: Int => i.toDouble; case other => sys.error(s"non-numeric $other")
  }
  private def evalCond(c: Condition, r: R): Option[Boolean] = c match {
    case MatchValue(k, v) => field(r, k).map(_ == v)
    case MatchAny(k, vs) => field(r, k).map(vs.contains)
    case MatchExcept(k, vs) => field(r, k).map(x => !vs.contains(x))
    case TextContains(k, t) => field(r, k).map(_.toString.contains(t))
    case TextNotContains(k, t) => field(r, k).map(x => !x.toString.contains(t))
    case TextRegex(k, p, neg) => field(r, k).map { x =>
      val hit = java.util.regex.Pattern.compile(p).matcher(x.toString).find()
      if (neg) !hit else hit
    }
    case IsNull(k) => Some(field(r, k).isEmpty)
    case ArrayContains(k, v) => tagsOf(r, k).map(_.contains(v))
    case ArrayContainsAll(k, vs) => tagsOf(r, k).map(s => vs.forall(s.contains))
    case ArrayContainsAny(k, vs) => tagsOf(r, k).map(s => vs.exists(s.contains))
    case ValuesCount(k, gte, gt, lte, lt) =>
      val n = tagsOf(r, k).map(_.size.toLong).getOrElse(0L)
      Some(gte.forall(n >= _) && gt.forall(n > _) &&
        lte.forall(n <= _) && lt.forall(n < _))
    case IsEmpty(k) => Some(tagsOf(r, k).forall(_.isEmpty))
    case Range(k, gte, gt, lte, lt) => field(r, k).map { x0 =>
      val x = asD(x0)
      gte.forall(b => x >= asD(b)) && gt.forall(b => x > asD(b)) &&
        lte.forall(b => x <= asD(b)) && lt.forall(b => x < asD(b))
    }
    case Nested(f) => evalFilter(f, r)
  }
  private def evalFilter(f: Filter, r: R): Option[Boolean] = {
    val m = f.must.map(evalCond(_, r)).foldLeft(Option(true))(kAnd)
    val n = f.mustNot.map(c => kNot(evalCond(c, r))).foldLeft(Option(true))(kAnd)
    // the should-sum mirrors `cast(int)` + addition: any NULL term
    // nulls the sum (SQL addition), so the comparison is NULL too
    val s =
      if (f.should.isEmpty) Option(true)
      else {
        val es = f.should.map(evalCond(_, r))
        if (es.exists(_.isEmpty)) None
        else Some(es.count(_.contains(true)) >= f.minShould)
      }
    kAnd(kAnd(m, n), s)
  }

  test("random wire filters: parse -> compile agrees with the interpreted semantics on every row") {
    import spark.implicits._
    val filters = Gen.listOfN(80, genFilter(2)).sample.get
    val df = rows.map(r => (r.id, r.label, r.score, r.lang, r.text, r.tags))
      .toDF("id", "label", "score", "lang", "text", "tags").localCheckpoint()
    val outCols = filters.zipWithIndex.map { case (f, i) =>
      FilterDsl.fromJson(renderFilter(f)).toColumn.as(s"f$i")
    }
    val got = df.select(col("id") +: outCols: _*).collect()
      .map(r => r.getLong(0) -> r).toMap
    rows.foreach { r =>
      val row = got(r.id)
      filters.zipWithIndex.foreach { case (f, i) =>
        val expected = evalFilter(f, r)
        val actual = if (row.isNullAt(i + 1)) None else Some(row.getBoolean(i + 1))
        assert(actual == expected,
          s"row ${r.id} filter ${renderFilter(f)}: compiled=$actual interpreted=$expected")
      }
    }
    // round-trip stability: parse(render(parse(render(f)))) compiles
    // to the same predicate results (idempotent wire form)
    val again = df.select(col("id") +: filters.zipWithIndex.map { case (f, i) =>
      FilterDsl.fromJson(renderFilter(FilterDsl.fromJson(renderFilter(f)))).toColumn.as(s"g$i")
    }: _*).collect().map(r => r.getLong(0) -> r).toMap
    rows.foreach { r =>
      filters.indices.foreach { i =>
        assert(got(r.id).isNullAt(i + 1) == again(r.id).isNullAt(i + 1) &&
          (got(r.id).isNullAt(i + 1) ||
            got(r.id).getBoolean(i + 1) == again(r.id).getBoolean(i + 1)))
      }
    }
  }

  test("malformed wire filters fail fast — never a silent match-all") {
    val bad = Seq(
      // condition with no recognizable shape
      """{ "must": [ {"key": "label"} ] }""",
      // range with zero bounds (the round-4 advice's contract)
      """{ "must": [ {"key": "label", "range": {}} ] }""",
      // non-numeric range bound
      """{ "must": [ {"key": "label", "range": {"gte": "x"}} ] }""",
      // match with an unsupported shape
      """{ "must": [ {"key": "label", "match": {}} ] }""",
      """{ "must": [ {"key": "label", "match": {"value": 1, "any": [2]}} ] }""",
      // missing key on a leaf
      """{ "must": [ {"match": {"value": 1}} ] }""",
      // is_null must be literal true
      """{ "must": [ {"key": "lang", "is_null": "yes"} ] }""",
      // values_count with zero bounds (same match-all hazard as range)
      """{ "must": [ {"key": "tags", "values_count": {}} ] }""",
      // non-integer values_count bound
      """{ "must": [ {"key": "tags", "values_count": {"gte": "x"}} ] }""",
      // empty array_contains_all / _any value lists
      """{ "must": [ {"key": "tags", "array_contains_all": []} ] }""",
      """{ "must": [ {"key": "tags", "array_contains_any": []} ] }""",
      // is_empty must be literal true
      """{ "must": [ {"key": "tags", "is_empty": "yes"} ] }""",
      // two array shapes on one condition
      """{ "must": [ {"key": "tags", "array_contains": "a", "is_empty": true} ] }""",
      // CROSS-family mixes: previously the first family's condition
      // was returned silently and the rest DROPPED — must fail loud
      """{ "must": [ {"key": "tags", "array_contains": "a", "match": {"value": 1}} ] }""",
      """{ "must": [ {"key": "tags", "values_count": {"lt": 5}, "range": {"gte": 1}} ] }""",
      """{ "must": [ {"key": "loc", "geo_radius": {"center": {"lat": 0, "lon": 0}, "radius": 10}, "match": {"value": 1}} ] }""",
      """{ "must": [ {"key": "loc", "geo_bounding_box": {"top_left": {"lat": 1, "lon": 0}, "bottom_right": {"lat": 0, "lon": 1}}, "is_empty": true} ] }""",
      // scalar where a condition belongs
      """{ "must": [ 42 ] }""",
      // unparseable JSON
      """{ "must": [ {"key": }""")
    bad.foreach { j =>
      assert(util.Try(FilterDsl.fromJson(j)).isFailure, s"accepted: $j")
    }
    // corrupting any VALID generated filter by dropping a leaf's key
    // also fails fast rather than matching all
    val f = Gen.listOfN(20, genFilter(1)).sample.get
      .find(f => f.must.exists(_.isInstanceOf[MatchValue])).getOrElse(
        Filter(must = Seq(MatchValue("label", 1L))))
    val corrupted = renderFilter(f).replaceFirst("\"key\":\"[a-z]+\",", "")
    assert(util.Try(FilterDsl.fromJson(corrupted)).isFailure, corrupted)
  }
}
