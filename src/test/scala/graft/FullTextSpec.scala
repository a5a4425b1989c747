package graft

import graft.operators.FullText
import org.apache.spark.sql.functions._

class FullTextSpec extends SparkSpec {

  test("q_keyword_match rows all contain at least 2 query terms") {
    val rows = FullText.qKeywordMatch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_matched") >= 2))
    // re-verify one row against the raw text
    val id = rows.head.getAs[Long]("doc_id")
    val text = Tables.documents(spark, sfDir).filter(col("doc_id") === id)
      .head().getAs[String]("text")
    val toks = text.split(" ").toSet
    assert(FullText.Terms.count(toks.contains) == rows.head.getAs[Long]("n_matched"))
  }

  test("q_phrase_match counts real substring occurrences") {
    val rows = FullText.qPhraseMatch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val n = "spark join".r.findAllMatchIn(t).length
      assert(n.toLong == r.getAs[Long]("n_occurrences"))
    }
    // non-returned docs genuinely lack the phrase
    val returned = rows.map(_.getAs[Long]("doc_id")).toSet
    texts.filterNot(kv => returned(kv._1)).values.foreach(t => assert(!t.contains("spark join")))
  }

  test("q_fuzzy_match finds the exact token and nothing beyond distance 1") {
    val rows = FullText.qFuzzyMatch(spark, sfDir).collect()
    assert(rows.exists(r => r.getAs[String]("token") == "spark" && r.getAs[Long]("distance") == 0))
    assert(rows.forall(_.getAs[Long]("distance") <= 1))
  }

  test("q_tfidf: top-k descending, scores positive") {
    val rows = FullText.qTfidf(spark, sfDir).collect()
    assert(rows.length == FullText.K)
    val s = rows.map(_.getAs[Double]("tfidf"))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    assert(s.forall(_ > 0))
  }

  test("q_bm25 matches a driver-side recomputation on sf0.001") {
    val rows = FullText.qBm25(spark, sfDir).collect()
    assert(rows.length == FullText.K)
    // recompute BM25 for the top doc from raw text
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = docs.size.toDouble
    val dls = docs.map { case (id, t) => id -> t.split(" ").length.toDouble }
    val avgdl = dls.values.sum / n
    def bm25(id: Long): Double = {
      val toks = docs(id).split(" ")
      FullText.Terms.map { term =>
        val tf = toks.count(_ == term).toDouble
        if (tf == 0) 0.0 else {
          val df = docs.values.count(_.split(" ").contains(term)).toDouble
          val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
          idf * (tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dls(id) / avgdl)))
        }
      }.sum
    }
    val top = rows.head
    assert(math.abs(top.getAs[Double]("bm25") - bm25(top.getAs[Long]("doc_id"))) < 1e-5)
  }

  test("q_hybrid_rrf fuses both rankings with k=60 weights") {
    val rows = FullText.qHybridRrf(spark, sfDir).collect()
    assert(rows.length == FullText.K)
    val s = rows.map(_.getAs[Double]("rrf"))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    // max possible rrf = rank 1 in both lists
    assert(s.head <= 2.0 / 61 + 1e-9)
    // every fused score is at most the best single-list contribution + best other
    assert(s.forall(x => x > 0 && x <= 2.0 / 61 + 1e-9))
  }

  test("q_bm25_batch matches single-query bm25 for the shared terms") {
    val rows = FullText.qBm25Batch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // both queries produce ranked lists
    val byQ = rows.groupBy(_.getAs[Long]("tq_id"))
    assert(byQ.keySet == Set(1L, 2L))
    byQ.values.foreach { rs =>
      val s = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("bm25"))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
    // query 1's scores equal a standalone bm25 over the same terms
    val solo = graft.api.TextIndex(Tables.documents(spark, sfDir))
      .bm25(Seq("spark", "join")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    byQ(1L).foreach { r =>
      assert(solo(r.getAs[Long]("doc_id")) == r.getAs[Double]("bm25"))
    }
  }

  test("q_hybrid_weighted fuses min-max-normalized scores with alpha 0.75") {
    val rows = FullText.qHybridWeighted(spark, sfDir).collect()
    assert(rows.length == FullText.K)
    val s = rows.map(_.getAs[Double]("hybrid"))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    // normalized components are in [0,1], so fused scores are too
    assert(s.forall(x => x >= 0 && x <= 1.0 + 1e-9))
    // the vector query is vec 0 itself → its nv is exactly 1 (pool max),
    // so doc 0 scores at least alpha
    val doc0 = rows.find(_.getAs[Long]("doc_id") == 0L)
    assert(doc0.forall(_.getAs[Double]("hybrid") >= 0.75 - 1e-9))
    assert(doc0.isDefined || s.last >= 0.75 - 1e-9)
  }

  test("q_more_like_this excludes seeds and ranks by descending score") {
    val rows = FullText.qMoreLikeThis(spark, sfDir).collect()
    assert(rows.length == FullText.K)
    assert(rows.forall(r => !Seq(7L, 21L).contains(r.getAs[Long]("doc_id"))))
    val s = rows.map(_.getAs[Double]("score"))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(r => r.getAs[Long]("n_terms") >= 1 && r.getAs[Long]("n_terms") <= 20))
  }

  test("q_significant_terms scores mean the fg rate beats the smoothed bg rate") {
    val rows = FullText.qSignificantTerms(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= FullText.K)
    rows.foreach { r =>
      assert(r.getAs[Long]("df_fg") >= 3)
      assert(r.getAs[Long]("df_bg") >= r.getAs[Long]("df_fg"))
      assert(r.getAs[Double]("score") > 0)
    }
    val s = rows.map(_.getAs[Double]("score"))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b })
  }

  test("q_highlight snippets contain the term at the reported position") {
    val rows = FullText.qHighlight(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val snip = r.getAs[String]("snippet").split(" ")
      assert(snip.length <= 7)
      assert(snip.contains("vector"))
      assert(r.getAs[Long]("pos") >= 1)
    }
  }

  test("q_regex_match counts only full-token pattern hits") {
    val rows = FullText.qRegexMatch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matches") >= r.getAs[Long]("n_distinct"))
      assert(r.getAs[Long]("n_distinct") >= 1)
    }
    // cross-check one doc by hand
    val d = rows.head.getAs[Long]("doc_id")
    val text = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === d).head().getAs[String]("text")
    val expected = text.split(" ").count(_.matches("s[a-z]*n"))
    assert(rows.head.getAs[Long]("n_matches") == expected)
  }

  test("q_suggest returns only prefix matches, by descending frequency") {
    val rows = FullText.qSuggest(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_.getAs[String]("token").startsWith("s")))
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.sameElements(freqs.sorted.reverse))
    rows.foreach(r => assert(r.getAs[Long]("df") <= r.getAs[Long]("freq")))
  }

  test("q_rescore only re-ranks docs inside the lexical window") {
    import org.apache.spark.sql.functions.col
    val rows = FullText.qRescore(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= FullText.K)
    val scores = rows.map(_.getAs[Double]("rescore"))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
    // every rescored doc must come from the bm25 top-50 window
    val window = graft.api.TextIndex(Tables.documents(spark, sfDir))
      .bm25(FullText.Terms)
      .orderBy(col("bm25").desc, col("doc_id")).limit(50)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).forall(window.contains))
  }

  test("q_pinned promotes the pinned ids first, organic ranks follow") {
    val rows = FullText.qPinned(spark, sfDir).collect()
    assert(rows.length == FullText.K)
    FullText.PinnedIds.zipWithIndex.foreach { case (id, i) =>
      assert(rows(i).getAs[Long]("doc_id") == id)
      assert(rows(i).getAs[Long]("rank") == i + 1)
      assert(rows(i).getAs[Boolean]("pinned"))
    }
    val organic = rows.drop(FullText.PinnedIds.size)
    assert(organic.forall(r => !r.getAs[Boolean]("pinned")))
    assert(organic.forall(r => !FullText.PinnedIds.contains(r.getAs[Long]("doc_id"))))
    assert(rows.map(_.getAs[Long]("rank")).sameElements(1L to FullText.K))
  }

  test("q_percolate matches stored queries exactly as a driver replay") {
    val rows = FullText.qPercolate(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("pq_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("n_matched")).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ").toSet)
    val expected = (for {
      (docId, toks) <- docs
      (pqId, terms, minMatch) <- FullText.StoredQueries
      matched = terms.count(toks.contains)
      if matched >= minMatch
    } yield (pqId, docId) -> matched.toLong).toMap
    assert(rows == expected)
  }

  test("q_span_near distances agree with token positions") {
    val rows = FullText.qSpanNear(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ")).toMap
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id"))
      val pa = toks.zipWithIndex.collect { case ("spark", i) => i.toLong }
      val pb = toks.zipWithIndex.collect { case ("join", i) => i.toLong }
      val ds = for (a <- pa; b <- pb) yield math.abs(a - b)
      assert(r.getAs[Long]("min_dist") == ds.min && ds.min <= 3)
      assert(r.getAs[Long]("n_near") == ds.count(_ <= 3))
    }
  }

  test("q_dis_max is bounded by the unboosted field sum per doc") {
    val dm = FullText.qDisMax(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(dm.nonEmpty && dm.size <= FullText.K)
    assert(dm.values.forall(_ > 0))
    // multi_match with title boost 2x: score = 2*ts + bs;
    // dis_max = max(ts,bs) + 0.3*min(ts,bs). Since ts,bs >= 0:
    //   dis_max <= ts + bs <= 2*ts + bs = multi_match score
    val mm = FullText.qMultiMatch(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val both = dm.keySet.intersect(mm.keySet)
    assert(both.nonEmpty)
    both.foreach { id => assert(dm(id) <= mm(id) + 1e-6, s"doc $id") }
  }

  test("q_multi_match boosts title hits over body hits") {
    val rows = FullText.qMultiMatch(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= FullText.K)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
    assert(scores.forall(_ > 0))
  }

  test("q_collapse returns one best doc per lang with group hit counts") {
    val rows = FullText.qCollapse(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val langs = rows.map(_.getAs[String]("lang"))
    assert(langs.distinct.length == langs.length, "one row per collapsed lang")
    // each group's representative is its own best: n_hits >= 1 and
    // scores arrive in descending collapsed order
    assert(rows.forall(_.getAs[Long]("n_hits") >= 1))
    val s = rows.map(_.getAs[Double]("bm25"))
    assert(s.sameElements(s.sortBy(-(_: Double))))
  }

  test("q_phrase_prefix only counts 'the'-adjacent qu-prefixed tokens") {
    val rows = FullText.qPhrasePrefix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_occurrences") >= 1))
    // cross-check one doc by hand
    val docs = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(5).foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ")
      val expected = toks.sliding(2).count(p =>
        p.length == 2 && p(0) == "the" && p(1).startsWith("qu"))
      assert(r.getAs[Long]("n_occurrences") == expected)
    }
  }

  test("q_intervals is ordered: every gap non-negative and within max_gaps") {
    val rows = FullText.qIntervals(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_gap") >= 0 && r.getAs[Long]("min_gap") <= 2)
      assert(r.getAs[Long]("n_intervals") >= 1)
    }
    // ordered ⊆ unordered: every intervals doc with gap g has span
    // distance g+1, so it must appear in span_near when g+1 <= slop 3
    val near = FullText.qSpanNear(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    rows.filter(_.getAs[Long]("min_gap") <= 2).foreach { r =>
      assert(near(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")} ordered-matched but missing from span_near")
    }
  }

  test("q_global_agg reports matched slice against unfiltered totals") {
    val rows = FullText.qGlobalAgg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_all"))
      assert(r.getAs[Long]("n_all") > 0)
    }
    // global totals must equal the corpus partition by lang
    val total = rows.map(_.getAs[Long]("n_all")).sum
    assert(total == Tables.documents(spark, sfDir).count())
  }

  test("q_significant_text: sample terms lift above their corpus rate") {
    val rows = FullText.qSignificantText(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= FullText.K)
    // the query terms themselves must surface in the sampled
    // neighborhood and carry positive lift
    val tokens = rows.map(_.getAs[String]("token")).toSet
    assert(FullText.Terms.exists(tokens.contains),
      s"expected a query term among significant tokens: $tokens")
    rows.foreach { r =>
      assert(r.getAs[Long]("df_fg") >= 3)
      assert(r.getAs[Long]("df_bg") >= r.getAs[Long]("df_fg"))
      assert(r.getAs[Double]("score") > 0)
    }
  }

  test("q_synonym_match finds docs through the expansion only") {
    val rows = FullText.qSynonymMatch(spark, sfDir).collect()
    assert(rows.length == FullText.K)
    // score counts every expanded-token occurrence; with 'join' in the
    // expansion every returned doc matches at least once
    assert(rows.forall(_.getAs[Long]("score") >= 1))
    assert(rows.forall { r =>
      val n = r.getAs[Long]("n_terms"); n >= 1 && n <= 2
    })
    val s = rows.map(_.getAs[Long]("score"))
    assert(s.sameElements(s.sortBy(-(_: Long))))
  }

  test("q_boosting demotes exactly the negative-term docs by the boost factor") {
    val bm = graft.api.TextIndex(Tables.documents(spark, sfDir))
      .bm25(Seq("spark", "join")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    val rows = FullText.qBoosting(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id"); val s = r.getAs[Double]("score")
      val expect = if (r.getAs[Boolean]("demoted")) bm(id) * 0.5 else bm(id)
      assert(math.abs(s - expect) < 1e-9, s"doc $id: $s vs $expect")
    }
  }

  test("q_terms_set enforces each doc's own minimum-should-match") {
    val rows = FullText.qTermsSet(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val msm = r.getAs[Long]("msm")
      assert(msm == (if (r.getAs[String]("lang") == "en") 4L else 3L))
      assert(r.getAs[Long]("n_matched") >= msm)
    }
  }

  test("q_hybrid_dbsf ranks over the same pools as the weighted fusion") {
    val dbsf = FullText.qHybridDbsf(spark, sfDir).collect()
    assert(dbsf.length == FullText.K)
    val s = dbsf.map(_.getAs[Double]("dbsf"))
    assert(s.sameElements(s.sorted.reverse))
    // μ±3σ normalization keeps in-pool scores inside [-?, ~1]-ish
    // bands; fused values stay finite and distinct pools both count
    assert(s.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("q_rank_feature saturation boost is bounded by the boost weight") {
    val bm = graft.api.TextIndex(Tables.documents(spark, sfDir))
      .bm25(Seq("spark", "join", "vector")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    val rows = FullText.qRankFeature(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id"); val s = r.getAs[Double]("score")
      val lift = s - bm(id)
      assert(lift > 0 && lift < 2.0 + 1e-9, s"doc $id lift $lift") // boost = 2, sat < 1
    }
  }

  test("q_phrase_suggest corrects the typo to the corpus-attested bigram") {
    val rows = FullText.qPhraseSuggest(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert(top.getAs[String]("c1") == "spark")
    assert(top.getAs[String]("c2") == "join")
    // "spark join" genuinely occurs adjacently in the corpus
    assert(top.getAs[Long]("bigram_count") > 0)
    val counts = rows.map(_.getAs[Long]("bigram_count"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("hybrid RRF from the at-rest indexes equals the in-memory hybrid at exhaustive probe") {
    import graft.operators.Ann
    val atRest = FullText.hybridAtRest(spark, sfDir, nprobe = Ann.NList).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("rrf")))
    val mem = FullText.qHybridRrf(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("rrf")))
    assert(atRest.nonEmpty && atRest.sameElements(mem),
      s"at-rest ${atRest.toSeq} != in-memory ${mem.toSeq}")
  }

  test("filtered hybrid: both planner paths equal an independent in-memory filtered fusion") {
    import graft.operators.{Ann, FullText}
    import graft.functions.vec
    import org.apache.spark.sql.expressions.Window
    // independent twin, straight off the tables: BM25 stays
    // corpus-global (ES filter-context semantics), candidates filter,
    // pools rank POST-filter, RRF k=60
    val pred = graft.api.FilterDsl.fromJson(FullText.HybridFilterJson).toColumn
    val emb = Tables.embeddings(spark, sfDir)
    val one = pmod(col("doc_id"), lit(1L))
    val lexPool = graft.api.TextIndex(Tables.documents(spark, sfDir)).bm25(FullText.Terms)
      .join(emb.filter(pred).select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .orderBy(col("bm25").desc, col("doc_id")).limit(50)
      .select(col("doc_id"), row_number().over(
        Window.partitionBy(one).orderBy(col("bm25").desc, col("doc_id"))).as("lex_rank"))
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val vecPool = emb.filter(pred).crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(vec.cosine(col("q_emb"), col("embedding")), 6).as("vscore"))
      .orderBy(col("vscore").desc, col("doc_id")).limit(50)
      .select(col("doc_id"), row_number().over(
        Window.partitionBy(one).orderBy(col("vscore").desc, col("doc_id"))).as("vec_rank"))
    val expected = lexPool.join(vecPool, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(
          when(col("lex_rank").isNotNull, lit(1.0) / (lit(60) + col("lex_rank"))).otherwise(lit(0.0)) +
          when(col("vec_rank").isNotNull, lit(1.0) / (lit(60) + col("vec_rank"))).otherwise(lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // selective path (the registered entry): planner picks brute_force
    val bf = FullText.qHybridFiltered(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bf.nonEmpty && bf == expected, s"brute-force path $bf != $expected")
    // broad path at exhaustive probe: planner forced onto ivf_probe
    val probed = FullText.hybridFiltered(spark, sfDir, FullText.HybridFilterJson,
        nprobe = Ann.NList, bruteForceLimit = 1L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probed == expected, s"probe path $probed != $expected")
  }

  test("q_top_hits emits exactly three ranked hits per lang with the bucket count") {
    val total = Tables.documents(spark, sfDir).count()
    val rows = FullText.qTopHits(spark, sfDir).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.sameElements(Array(1L, 2L, 3L)))
      val chars = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("n_chars"))
      assert(chars.zip(chars.tail).forall { case (a, b) => a >= b })
      assert(rs.map(_.getAs[Long]("n_hits")).distinct.length == 1)
    }
    assert(byLang.map { case (_, rs) => rs.head.getAs[Long]("n_hits") }.sum == total)
  }

  test("q_termvectors: per-doc tf sums to doc length, df/ttf match a direct recount") {
    import org.apache.spark.sql.functions._
    val rows = FullText.qTermvectors(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    // tf over a doc's terms sums to that doc's token count, and each
    // first_pos is genuinely the first occurrence (1-based)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      assert(rs.map(_.getAs[Long]("term_freq")).sum == docs(id).length)
      rs.foreach { r =>
        val term = r.getAs[String]("term")
        assert(r.getAs[Long]("first_pos") == docs(id).indexOf(term) + 1)
      }
    }
    // corpus statistics: independently recount df and ttf for a
    // handful of the returned terms
    val terms = rows.map(_.getAs[String]("term")).distinct.take(5)
    val recount = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy("t").agg(countDistinct("doc_id").as("df"), count(lit(1)).as("ttf"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.filter(r => terms.contains(r.getAs[String]("term"))).foreach { r =>
      val (df, ttf) = recount(r.getAs[String]("term"))
      assert(r.getAs[Long]("doc_freq") == df && r.getAs[Long]("ttf") == ttf)
    }
  }
}
