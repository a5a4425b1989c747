package graft

import graft.operators.VectorSearch
import graft.functions.vec
import org.apache.spark.sql.functions._

class VectorSearchSpec extends SparkSpec {

  test("vec expressions match hand-computed values") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      vec.dot($"a", $"b").as("d"),
      vec.l2($"a", $"b").as("l"),
      vec.cosine($"a", $"b").as("c"),
      vec.norm($"a").as("n"),
      vec.l1($"a", $"b").as("m")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(27.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(14.0)) < 1e-12)
    assert(r.getDouble(4) == 9.0)
  }

  test("q_multivec_rrf fuses the two field rankings reciprocally") {
    val rows = VectorSearch.qMultivecRrf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.length == VectorSearch.K)
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      val scores = sorted.map(_.getAs[Double]("rrf"))
      assert(scores.sameElements(scores.sorted.reverse))
      // the query vector itself is rank 1 in both fields → max fuseable score
      assert(sorted.head.getAs[Long]("vec_id") == q)
      val maxFused = BigDecimal(2.0 / 61)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(scores.head == maxFused)
      // every fused score is a sum of at most two reciprocal ranks
      assert(scores.forall(s => s > 0 && s <= maxFused))
    }
  }

  test("q_knn_hamming: self is the zero-distance top hit, distances bounded and ascending") {
    val rows = VectorSearch.qKnnHamming(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      // the query IS a corpus vector: its own word xors to 0
      assert(sorted.head.getAs[Long]("vec_id") == q)
      assert(sorted.head.getAs[Long]("hamming") == 0L)
      val h = sorted.map(_.getAs[Long]("hamming"))
      assert(h.forall(x => x >= 0 && x <= 64))
      assert(h.zip(h.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q_hard_negatives never returns the query's own label") {
    val labels = graft.Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = VectorSearch.qHardNegatives(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id"); val v = r.getAs[Long]("vec_id")
      assert(labels(v) != labels(q), s"query $q returned same-label $v")
    }
    // exactly 5 negatives per query, scores descending
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      assert(rs.length == 5)
      val s = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("score"))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_where_document results all satisfy the content predicate") {
    val matching = graft.Tables.documents(spark, sfDir)
      .filter(array_contains(split(col("text"), " "), "vector"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = VectorSearch.qWhereDocument(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => matching.contains(r.getAs[Long]("vec_id"))))
  }

  test("q_random_sample is deterministic and uniform-ish across labels") {
    val a = VectorSearch.qRandomSample(spark, sfDir).collect().map(_.getAs[Long]("vec_id"))
    val b = VectorSearch.qRandomSample(spark, sfDir).collect().map(_.getAs[Long]("vec_id"))
    assert(a.sameElements(b)) // seeded draw: stable across runs
    assert(a.length == 20 && a.distinct.length == 20)
  }

  test("q_near_object excludes each seed from its own neighbors") {
    val rows = VectorSearch.qNearObject(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.length == VectorSearch.K)
      assert(!rs.exists(_.getAs[Long]("vec_id") == q), s"seed $q returned itself")
      val scores = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("score"))
      assert(scores.sameElements(scores.sorted.reverse))
    }
  }

  test("q_decay_score multiplies similarity by the recency decay and reranks") {
    val rows = VectorSearch.qDecayScore(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      assert(rs.length == VectorSearch.K)
      val scores = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("score"))
      assert(scores.sameElements(scores.sorted.reverse))
    }
    rows.foreach { r =>
      val sim = r.getAs[Double]("sim"); val decay = r.getAs[Double]("decay")
      val score = r.getAs[Double]("score")
      assert(decay > 0 && decay <= 1.0)
      assert(math.abs(score - BigDecimal(sim * decay)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      // decay is a pure function of the id
      val expected = BigDecimal(math.exp(-(r.getAs[Long]("vec_id") % 365).toDouble / 90.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(decay == expected)
    }
  }

  test("q_knn_cosine: k rows per query, self is rank 1, scores descend") {
    val rows = VectorSearch.qKnnCosine(spark, sfDir).collect()
    val perQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(perQ.nonEmpty)
    perQ.foreach { case (qid, rs) =>
      assert(rs.length == VectorSearch.K)
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.head.getAs[Long]("vec_id") == qid) // self-match at sim 1.0
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q_knn_l2: self at distance 0, scores ascend") {
    val rows = VectorSearch.qKnnL2(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.head.getAs[Long]("vec_id") == qid)
      assert(sorted.head.getAs[Double]("score") == 0.0)
      val scores = sorted.map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a <= b })
    }
  }

  test("q_knn_filtered only returns corpus with label < 5") {
    val ids = VectorSearch.qKnnFiltered(spark, sfDir).select("vec_id").collect().map(_.getLong(0)).toSet
    val allowed = Tables.embeddings(spark, sfDir).filter(col("label") < 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(allowed))
  }

  test("q_range_search returns only scores >= 0.25 and includes self matches") {
    val rows = VectorSearch.qRangeSearch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("score") >= 0.25))
    val selfs = rows.filter(r => r.getAs[Long]("q_id") == r.getAs[Long]("vec_id"))
    assert(selfs.length == VectorSearch.querySet(spark, sfDir).count())
  }

  test("q_grouped_topk: at most 3 per (query, label)") {
    val rows = VectorSearch.qGroupedTopk(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val g = rows.groupBy(r => (r.getAs[Long]("q_id"), r.getAs[Int]("label")))
    assert(g.values.forall(_.length <= 3))
    assert(rows.forall(_.getAs[Long]("rn") <= 3))
  }

  test("q_recommend returns k non-example rows in descending score order") {
    val rows = VectorSearch.qRecommend(spark, sfDir).collect()
    assert(rows.length == VectorSearch.K)
    val excluded = (VectorSearch.RecommendPos ++ VectorSearch.RecommendNeg).toSet
    assert(rows.forall(r => !excluded.contains(r.getAs[Long]("vec_id"))))
    val scores = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q_maxsim: self-match scores the full 4-sub maximum") {
    val rows = VectorSearch.qMaxsim(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per query: ranks 1..K, scores descending, all in [-4, 4]
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).sameElements(1L to VectorSearch.K))
      val s = sorted.map(_.getAs[Double]("score"))
      assert(s.zip(s.tail).forall { case (a, b) => a >= b })
      assert(s.forall(x => x >= -4.0 && x <= 4.0 + 1e-9))
    }
    // the query vector itself maximizes every sub-similarity: rank 1, score 4
    val self = rows.filter(r => r.getAs[Long]("q_id") == r.getAs[Long]("vec_id"))
    assert(self.nonEmpty)
    assert(self.forall(r => r.getAs[Long]("rn") == 1L && r.getAs[Double]("score") == 4.0))
  }

  test("q_matryoshka_knn reranks with exact full-dim cosine") {
    val rows = VectorSearch.qMatryoshkaKnn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // rerank scores must equal brute-force cosine for the same pairs
    val exact = VectorSearch.qKnnCosine(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")) -> r.getAs[Double]("score"))
      .toMap
    val agree = rows.count { r =>
      exact.get((r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
        .forall(_ == r.getAs[Double]("score"))
    }
    assert(agree == rows.length)
    // the query vector itself survives the 16-dim prefilter (prefix
    // cosine 1.0) and reranks to the top
    val self = rows.filter(r => r.getAs[Long]("q_id") == r.getAs[Long]("vec_id"))
    assert(self.forall(_.getAs[Long]("rn") == 1L))
    assert(self.length == rows.map(_.getAs[Long]("q_id")).distinct.length)
  }

  test("q_discover ranks by context-pair wins, then target similarity") {
    val rows = VectorSearch.qDiscover(spark, sfDir).collect()
    assert(rows.length == VectorSearch.K)
    // examples excluded, ranks contiguous
    val exampleIds = (VectorSearch.DiscoverTarget +:
      VectorSearch.DiscoverPairs.flatMap(p => Seq(p._1, p._2))).toSet
    assert(rows.forall(r => !exampleIds.contains(r.getAs[Long]("vec_id"))))
    assert(rows.map(_.getAs[Long]("rn")).sorted.sameElements(1L to VectorSearch.K))
    // ordering invariant: ctx descending, tsim descending within ctx
    val sorted = rows.sortBy(_.getAs[Long]("rn"))
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      val (ca, cb) = (a.getAs[Long]("ctx"), b.getAs[Long]("ctx"))
      assert(ca > cb || (ca == cb && a.getAs[Double]("tsim") >= b.getAs[Double]("tsim")))
    }
    assert(rows.forall { r => val c = r.getAs[Long]("ctx"); c >= 0 && c <= 2 })
  }

  test("q_knn_perquery_filter restricts each query to its own label") {
    val rows = VectorSearch.qKnnPerQueryFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val labelOf = Tables.embeddings(spark, sfDir).select("vec_id", "label")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    // every result vector shares its query's label
    rows.foreach { r =>
      assert(labelOf(r.getAs[Long]("vec_id")) == labelOf(r.getAs[Long]("q_id")))
    }
    // and the plan is a hash join on the label, not a filtered cross join
    val p = VectorSearch.qKnnPerQueryFilter(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_search_agg histograms each query's top-50 neighborhood") {
    val rows = VectorSearch.qSearchAgg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      // label counts over the pool sum to exactly the pool size
      assert(rs.map(_.getAs[Long]("n")).sum == VectorSearch.SearchAggPool)
      assert(rs.forall { r =>
        val s = r.getAs[Double]("avg_score"); s >= -1.0 && s <= 1.0
      })
    }
  }

  test("q_vector_stats: one row per label, dim 64, norms ordered") {
    val rows = VectorSearch.qVectorStats(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("dim") == 64)
      assert(r.getAs[Double]("min_norm") <= r.getAs[Double]("avg_norm"))
      assert(r.getAs[Double]("avg_norm") <= r.getAs[Double]("max_norm"))
    }
  }

  test("q_dist_matrix: 5 neighbors per sample point, no self-pairs, scores sorted") {
    val rows = VectorSearch.qDistMatrix(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("vec_a")).foreach { case (a, g) =>
      assert(g.length == 5)
      assert(g.forall(_.getAs[Long]("vec_b") != a))
      val s = g.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("score"))
      assert(s.zip(s.tail).forall { case (x, y) => x >= y })
    }
  }

  test("q_centroid_anomaly: top-3 outliers per label, descending distance") {
    val rows = VectorSearch.qCentroidAnomaly(spark, sfDir).collect()
    assert(rows.length == 30) // 10 labels x 3
    rows.groupBy(_.getAs[Int]("label")).foreach { case (_, g) =>
      val d = g.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("dist"))
      assert(d.forall(_ >= 0))
      assert(d.zip(d.tail).forall { case (x, y) => x >= y })
    }
  }

  test("q_recommend_best_score excludes examples; scores descend within bounds") {
    val rows = VectorSearch.qRecommendBestScore(spark, sfDir).collect()
    assert(rows.length == VectorSearch.K)
    val examples = (VectorSearch.RecommendPos ++ VectorSearch.RecommendNeg).toSet
    assert(!rows.exists(r => examples(r.getAs[Long]("vec_id"))))
    val s = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("score"))
    assert(s.zip(s.tail).forall { case (x, y) => x >= y })
    // positive branch = a cosine (≤1); negative branch = −bn² (≥ −1)
    assert(s.forall(v => v >= -1.000001 && v <= 1.000001))
  }

  test("q_context_search: scores are ≤ 0 (0 = inside every context pair)") {
    val rows = VectorSearch.qContextSearch(spark, sfDir).collect()
    assert(rows.length == VectorSearch.K)
    val examples = VectorSearch.DiscoverPairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(!rows.exists(r => examples(r.getAs[Long]("vec_id"))))
    val s = rows.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("score"))
    assert(s.forall(_ <= 0.0))
    assert(s.zip(s.tail).forall { case (x, y) => x >= y })
  }

  test("q_autocut keeps a rank prefix and cuts only at a real jump") {
    val rows = VectorSearch.qAutocut(spark, sfDir).collect().sortBy(_.getAs[Long]("rn"))
    assert(rows.nonEmpty && rows.length <= VectorSearch.AutocutPool)
    // the kept set is a 1..m rank prefix
    assert(rows.map(_.getAs[Long]("rn")).sameElements(1L to rows.length))
    val s = rows.map(_.getAs[Double]("score"))
    assert(s.sameElements(s.sortBy(-(_: Double))))
    // within the kept prefix no gap exceeds the pool threshold (the
    // cut is at the FIRST jump, so everything kept is pre-jump)
    if (rows.length < VectorSearch.AutocutPool) {
      assert(!rows.map(_.getAs[Long]("vec_id")).contains(0L))
    }
  }

  test("q_move_vector steers toward moveTo and away from moveAway") {
    val rows = VectorSearch.qMoveVector(spark, sfDir).collect()
    assert(rows.length == VectorSearch.K)
    val excluded = Set(VectorSearch.MoveQuery, VectorSearch.MoveTo, VectorSearch.MoveAway)
    assert(!rows.exists(r => excluded(r.getAs[Long]("vec_id"))))
    // the adjusted-query top set must rank the moveTo vector's
    // nearest non-excluded neighbor at least as well as the plain
    // query would: check the steering moved mean similarity-to-target
    // above mean similarity-to-away over the result set
    val emb = Tables.embeddings(spark, sfDir)
    def pick(id: Long) = emb.filter(col("vec_id") === id)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val to = pick(VectorSearch.MoveTo)
    val away = pick(VectorSearch.MoveAway)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0d; var na = 0d; var nb = 0d
      for (i <- a.indices) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = rows.map(_.getAs[Long]("vec_id")).toSet
    val vecs = emb.filter(col("vec_id").isin(ids.toSeq: _*))
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    val meanTo = vecs.map(cos(_, to)).sum / vecs.length
    val meanAway = vecs.map(cos(_, away)).sum / vecs.length
    assert(meanTo > meanAway,
      s"steered results should lean toward moveTo (to=$meanTo, away=$meanAway)")
  }

  test("grouping search returns the top groups by best hit, group_size hits each") {
    val rows = VectorSearch.qGroupingSearch(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rs) =>
      // 3 groups × 2 hits, distinct labels, ranks dense from 1
      val byGroup = rs.groupBy(_.getAs[Long]("group_rank"))
      assert(byGroup.keySet == Set(1L, 2L, 3L), s"q=$q ranks ${byGroup.keySet}")
      assert(rs.map(_.getAs[Int]("label")).distinct.length == 3, s"q=$q labels not distinct")
      byGroup.foreach { case (_, g) =>
        assert(g.map(_.getAs[Long]("hit_rank")).sorted.toSeq == Seq(1L, 2L))
        assert(g.map(_.getAs[Int]("label")).distinct.length == 1)
      }
      // groups ordered by their best hit's score, descending
      val bests = byGroup.toSeq.sortBy(_._1)
        .map(_._2.map(_.getAs[Double]("score")).max)
      assert(bests == bests.sorted.reverse, s"q=$q group order $bests")
      // within a group, hits ordered by score
      byGroup.values.foreach { g =>
        val s = g.sortBy(_.getAs[Long]("hit_rank")).map(_.getAs[Double]("score")).toSeq
        assert(s == s.sorted.reverse)
      }
    }
    assert(byQ.nonEmpty)
  }
}
