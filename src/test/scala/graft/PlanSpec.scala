package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Guards the physical-plan properties the 100 TB design depends on:
  * filters pushed to the scan, small sides broadcast, top-k rank
  * windows executed with partial WindowGroupLimit, point lookups
  * exchange-free. A regression here means a plan silently degraded
  * even if results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q3_join broadcasts both dimension sides") {
    val p = plan(Relational.q3Join(spark, sfDir))
    assert(p.split("BroadcastHashJoin").length - 1 >= 2, p)
    assert(!p.contains("SortMergeJoin"))
  }

  test("star join broadcasts all four dimensions and pushes the part-type filter") {
    val p = plan(Relational.qStarJoin(spark, sfDir))
    assert(p.split("BroadcastHashJoin Inner Build").length - 1 >= 4, p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("EqualTo(p_type,PROMO)"), p)
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = plan(Relational.q1Agg(spark, sfDir))
    assert(p.contains("PushedFilters") && p.contains("LessThan(l_shipdate"), p)
  }

  test("kNN plans broadcast the query set and pre-limit window groups") {
    // also the label-inequality (hard negatives) and doc-content
    // (where_document) variants — the extra predicate/join must not
    // cost the broadcast or the partial top-k
    Seq(plan(VectorSearch.qKnnCosine(spark, sfDir)),
        plan(VectorSearch.qHardNegatives(spark, sfDir)),
        plan(VectorSearch.qWhereDocument(spark, sfDir))).foreach { p =>
      assert(p.contains("BroadcastNestedLoopJoin"), p)
      assert(p.split("WindowGroupLimit").length - 1 >= 2,
        "partial+final WindowGroupLimit expected\n" + p)
    }
  }

  test("filtered kNN pushes the label predicate to the corpus scan") {
    val p = plan(VectorSearch.qKnnFiltered(spark, sfDir))
    assert(p.contains("LessThan(label,5)"), p)
  }

  test("get-by-ids compiles to a pushed IN filter with no exchange except presentation sort") {
    val p = plan(Collection.qGetByIds(spark, sfDir))
    assert(p.contains("In(vec_id"), p)
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("delete-by-filter stays a scan-level filter, not a join") {
    val p = plan(Collection.qDeleteFilter(spark, sfDir))
    assert(!p.contains("Join"), p)
  }

  test("dedup candidate joins never cross-join the corpus") {
    Seq(plan(Dedup.qDedupNgram(spark, sfDir)),
        plan(Dedup.qDedupMinhash(spark, sfDir)),
        plan(Dedup.qDedupSimhash(spark, sfDir)),
        plan(Dedup.qDedupEmbedding(spark, sfDir)))
      .foreach(p => assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"), p))
  }

  test("ANN probe joins keep the corpus un-shuffled before scoring") {
    val ivf = plan(Ann.qIvfKnn(spark, sfDir))
    assert(ivf.contains("BroadcastHashJoin"), ivf)
    val lsh = plan(Ann.qLshKnn(spark, sfDir))
    assert(lsh.contains("BroadcastHashJoin"), lsh)
    val ivfpq = plan(Quantization.qIvfPqKnn(spark, sfDir))
    assert(ivfpq.contains("BroadcastHashJoin"), ivfpq)
    // both rank stages (ADC pool, exact rerank) run as the bounded
    // top-k aggregate — nothing sorts the candidate frame, and no
    // rank window (whose map-side WindowGroupLimit still sorted each
    // task's slice) remains anywhere in the plan
    assert(ivfpq.split("top_k_by_score").length - 1 >= 2, ivfpq)
    assert(!ivfpq.contains("WindowGroupLimit"), ivfpq)
  }

  test("as-of join is one key shuffle, never a range cross-product") {
    val p = plan(AsofJoin.qAsofJoin(spark, sfDir))
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // exactly one hash exchange (the user_id window); the only other
    // exchange is the presentation sort's range partitioning
    assert(p.split("hashpartitioning\\(").length - 1 == 1, p)
  }

  test("two-stage rerank pools stay broadcast (matryoshka, BQ)") {
    Seq(plan(VectorSearch.qMatryoshkaKnn(spark, sfDir)),
        plan(Quantization.qBqKnn(spark, sfDir))).foreach { p =>
      assert(p.contains("BroadcastHashJoin"), p)
      assert(!p.contains("SortMergeJoin"), p)
      // the bounded pre-limit runs map-side either as a rank window's
      // WindowGroupLimit (matryoshka's exact path) or as the bounded
      // top-k aggregate (the at-rest serving tails)
      assert(p.contains("WindowGroupLimit") || p.contains("top_k_by_score"), p)
    }
  }

  test("chunking is scan + explode with no shuffle before presentation") {
    val p = plan(graft.operators.TextAnalysis.qChunkDocs(spark, sfDir))
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("Generate"), p) // the per-doc chunk-start explode
  }

  test("sparse search broadcasts the query weights and prunes postings early") {
    val p = plan(SparseSearch.qSparseKnn(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("percolate is broadcast + scan: no shuffle join ever") {
    val p = plan(FullText.qPercolate(spark, sfDir))
    // the stored-query side broadcasts; matching shuffles nothing
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("terms-by-metric plans as partial agg + top-k, not a full sort") {
    val p = plan(Relational.qTermsByMetric(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("rescore reranks its window through a broadcast join") {
    val p = plan(FullText.qRescore(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("update-by-query is a projected scan + aggregate, never a join") {
    val p = plan(Collection.qUpdateByQuery(spark, sfDir))
    assert(!p.contains("Join"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("composite-agg page ends in a top-k, not a global sort") {
    val p = plan(Relational.qCompositeAgg(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("positional text queries are scan-only: no join, no shuffle agg") {
    // phrase-prefix and ordered-intervals match inside per-row HOFs;
    // the only exchange allowed is the presentation sort
    Seq(FullText.qPhrasePrefix(spark, sfDir), FullText.qIntervals(spark, sfDir))
      .foreach { df =>
        val p = plan(df)
        assert(!p.contains("Join"), p)
        assert(!p.contains("Exchange hashpartitioning"), p)
      }
  }

  test("steered and example-based searches fold examples into one-row broadcasts") {
    // move-vector / best-score / context-search: the example vectors
    // arrive via pushed-down point lookups folded to a single
    // broadcast row — the corpus is scanned exactly once, unshuffled
    Seq(VectorSearch.qMoveVector(spark, sfDir),
        VectorSearch.qRecommendBestScore(spark, sfDir),
        VectorSearch.qContextSearch(spark, sfDir))
      .foreach { df =>
        val p = plan(df)
        assert(p.contains("BroadcastNestedLoopJoin"), p)
        assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
      }
  }

  test("autocut's adaptive cut adds no corpus-sized work beyond the kNN pool") {
    val p = plan(VectorSearch.qAutocut(spark, sfDir))
    // pool = distributed top-k; gap/threshold/cut live on ≤50 rows
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("filtered count pushes the metadata predicate into the scan") {
    val p = plan(Collection.qCountFiltered(spark, sfDir))
    assert(p.contains("LessThan(label,5)"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("hamming search broadcasts the packed query words and pre-limits the top-k") {
    val p = plan(VectorSearch.qKnnHamming(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.split("WindowGroupLimit").length - 1 >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("top-hits and collapse pre-limit each bucket before the lang shuffle") {
    // partial + final WindowGroupLimit: the rank window must stay
    // rank-only (bucket counts join back from a combinable aggregate
    // instead of a count().over, which would disable the pre-limit)
    Seq(plan(FullText.qTopHits(spark, sfDir)),
        plan(FullText.qCollapse(spark, sfDir))).foreach { p =>
      assert(p.split("WindowGroupLimit").length - 1 >= 2, p)
    }
  }

  test("grouping search keeps the corpus window group-limited and broadcasts the group ranking") {
    // the per-(query,group) hit window must stay rank-only so the
    // corpus-sized frame is pre-limited; the group ranking runs over
    // the post-limit frame and joins back as a broadcast
    val p = plan(VectorSearch.qGroupingSearch(spark, sfDir))
    assert(p.split("WindowGroupLimit").length - 1 >= 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dedup index probe broadcasts the batch — the standing postings never shuffle") {
    val docs = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val idx = java.nio.file.Files.createTempDirectory("graft-planspec-idx").toString
    Dedup.writeMinhashIndex(docs.filter("doc_id % 2 = 0"), idx)
    val p = plan(Dedup.dedupAgainstIndex(spark, docs.filter("doc_id % 2 = 1"), idx))
    // every join that touches the standing postings/shingles scans is
    // a broadcast of batch-derived (id-only) frames — the at-rest
    // corpus itself never shuffles; the ONLY sort-merge joins allowed
    // are the final pairwise verifications, whose two inputs are
    // candidate-bounded (broadcasting those would grow the payload
    // with candidate count × shingle width — the round-2 regression)
    // tree lines only ("<op> Inner (<id>)") — the details section
    // repeats every operator name once more
    assert(p.split("BroadcastHashJoin Inner Build").length - 1 >= 3, p)
    assert(p.split("SortMergeJoin Inner \\(").length - 1 <= 2, p)
  }

  test("nested query pushes both child predicates into the orders scan") {
    val p = plan(Relational.qNestedMatch(spark, sfDir))
    assert(p.contains("GreaterThan(o_totalprice,250000.0)"), p)
    assert(p.contains("EqualTo(o_orderpriority,1-URGENT)"), p)
  }

  test("scan-only text gates have no join and no aggregate shuffle") {
    // terms_set (per-doc msm) and the Gopher rule battery are pure
    // per-row expression pipelines — only the presentation sort moves
    Seq(FullText.qTermsSet(spark, sfDir),
        TextAnalysis.qGopherQuality(spark, sfDir))
      .foreach { df =>
        val p = plan(df)
        assert(!p.contains("Join"), p)
        assert(!p.contains("Exchange hashpartitioning"), p)
      }
  }

  test("range agg is one map-side-combinable aggregate, not an unpivot") {
    val p = plan(Relational.qRangeAgg(spark, sfDir))
    assert(p.split("HashAggregate").length - 1 >= 2, p) // partial + final
    assert(!p.contains("Join") && !p.contains("Generate"), p)
  }

  test("random sample is a global top-k on the hash key, not a full sort") {
    val p = plan(VectorSearch.qRandomSample(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("tenant-partitioned layout prunes other tenants' partitions at the scan") {
    import org.apache.spark.sql.functions._
    // multitenancy (Qdrant/Milvus partition-key isolation): the
    // collection lives partitioned by tenant; a tenant-scoped search
    // must touch only that tenant's files — partition pruning, not a
    // post-scan filter
    val path = java.nio.file.Files.createTempDirectory("graft-tenant").toString + "/col"
    Tables.embeddings(spark, sfDir)
      .withColumn("tenant", col("label"))
      .write.mode("overwrite").partitionBy("tenant").parquet(path)
    val col0 = spark.read.parquet(path).filter(col("tenant") === 3)
    val p = plan(graft.api.VectorCollection(col0, idCol = "vec_id")
      .search(VectorSearch.querySet(spark, sfDir).limit(2), k = 5))
    assert(p.contains("PartitionFilters: [isnotnull(tenant"), p)
    // only the tenant's rows are ever read
    val nTenant = Tables.embeddings(spark, sfDir).filter(col("label") === 3).count()
    assert(col0.count() == nTenant)
    assert(nTenant > 0)
  }

  test("rank eval broadcasts queries and pre-limits the top-k before the metric aggregate") {
    val p = plan(VectorSearch.qRankEval(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.split("WindowGroupLimit").length - 1 >= 2,
      "partial+final WindowGroupLimit expected\n" + p)
    // the label histogram attaches as a broadcast, never a shuffle join
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("temperature sampler is one corpus scan with a broadcast fraction table") {
    val p = plan(TrainingPipeline.qTemperatureSample(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the doc-level coin is a per-row expression: the corpus never
    // shuffles on its way to the filter (the only exchanges are the
    // |sources|-row stats aggregate and the presentation sort)
    assert(!p.contains("Exchange hashpartitioning(doc_id"), p)
  }

  test("perplexity buckets attach cut points as a one-row broadcast") {
    val p = plan(TextAnalysis.qPerplexityBuckets(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  /** The plan's scan sections as (location line, block up to the next
    * scan) — for attributing PushedFilters/PartitionFilters lines to
    * the layout directory they scan.
    */
  private def scanBlocks(p: String): Seq[(String, String)] = {
    val lines = p.linesIterator.toIndexedSeq
    val starts = lines.indices.filter(lines(_).contains("Location"))
    starts.zip(starts.map(_ + 30) ++ Seq(lines.length)).map { case (s, e) =>
      (lines(s), lines.slice(s, math.min(e, lines.length)).mkString("\n"))
    }
  }

  test("filtered hybrid pushes the DSL filter into both pools' scans") {
    // cold path (cached = false): the plan a corpus too large to pin
    // executes. The label-band predicate must reach the parquet
    // reader of BOTH the vector-index scan and the payload scan, and
    // the postings scan must stay partition-pruned to the query
    // terms' buckets — no scan in the fused query reads unfiltered
    // corpus-scale data.
    val p = plan(FullText.hybridFiltered(spark, sfDir, FullText.HybridFilterJson,
      cached = false))
    val vecScans = scanBlocks(p).filter(_._1.contains("/vectors"))
    assert(vecScans.nonEmpty && vecScans.forall(b =>
      b._2.contains("GreaterThanOrEqual(label,2)") && b._2.contains("LessThan(label,8)")),
      p)
    val postScans = scanBlocks(p).filter(_._1.contains("/postings"))
    assert(postScans.nonEmpty && postScans.forall(b =>
      b._2.linesIterator.exists(l => l.contains("PartitionFilters") &&
        l.contains("tok_bucket") && (l.contains(" IN ") || l.contains("INSET")))), p)
    val payloadScans = scanBlocks(p).filter(b =>
      b._1.contains("embeddings.parquet"))
    assert(payloadScans.exists(b => b._2.contains("GreaterThanOrEqual(label,2)")), p)
    // fusion sides stay broadcast: the standing layouts never shuffle
    assert(!p.contains("CartesianProduct"), p)
  }

  test("moving percentiles: bounded explode + equi-groupBy, no nested-loop join against the day list") {
    // the trailing-window membership is generated per event (≤7 rows),
    // never discovered by comparing each event against every distinct
    // day — a BroadcastNestedLoopJoin here would scale compare-cost
    // with |days| instead of the constant window width
    val p = plan(graft.operators.Relational.qMovingPercentiles(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Generate") && p.contains("explode"), p)
  }

  test("plan lint: no query in the whole surface compiles to a cartesian product") {
    // the sweeping invariant behind every per-operator guard above:
    // a CartesianProduct (a non-broadcast cross join) is never an
    // acceptable physical plan at 100 TB — every intentional cross
    // join in the library pairs a broadcast side with a corpus scan
    // and must compile to BroadcastNestedLoopJoin instead
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val p = plan(fn(spark, sfDir))
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("de-hinted vocabulary joins still resolve to broadcast at small scale through AQE") {
    // the vocab/df sides deliberately carry NO broadcast hint (Heaps'
    // law: they grow with the corpus) — this lint pins that the
    // adaptive planner still broadcasts them when their measured size
    // is small, i.e. dropping the hint cost nothing at test/bench
    // scale
    for (name <- Seq("q_perplexity", "q_cooccur_pmi")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"$name lost its small-scale broadcast join:\n${finalPlan.take(2000)}")
    }
  }
}
