package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.api.{Metric, VectorCollection}
import graft.functions.vec

/** Brute-force kNN family over the embeddings collection — the exact
  * correctness baseline for the reference's vector query surface
  * (Milvus/Qdrant/Weaviate/Chroma top-k search with metric choice,
  * metadata pre-filter, radius search, grouped search —
  * /root/reference/README.md:69-83).
  *
  * These are thin bindings of [[graft.api.VectorCollection]] onto the
  * test tables; the scale analysis lives on the facade: broadcast
  * query set, single corpus scan, codegen'd scoring, partial
  * WindowGroupLimit top-k before the only shuffle.
  *
  * Determinism (SURVEY.md §5): scores rounded to 6 places before
  * ranking, ties broken by vec_id, so the DuckDB oracle hashes match.
  */
object VectorSearch {

  val K = 10

  def collection(spark: SparkSession, sfDir: String): VectorCollection =
    VectorCollection(Tables.embeddings(spark, sfDir), idCol = "vec_id")

  /** Deterministic query set: every 100th vector. Tiny at any SF
    * relative to the corpus — always the broadcast side.
    */
  def querySet(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("label").as("q_label"))

  private def presentKnn(res: DataFrame): DataFrame =
    res.select(col("q_id"), col("vec_id"), col("rn"), col("score"))
      .orderBy(col("q_id"), col("rn"))

  /** Row 1: top-k by cosine similarity. */
  def qKnnCosine(spark: SparkSession, sfDir: String): DataFrame =
    presentKnn(collection(spark, sfDir).search(querySet(spark, sfDir), K, Metric.Cosine))

  /** Row 2: top-k by L2 distance (nearest = smallest). */
  def qKnnL2(spark: SparkSession, sfDir: String): DataFrame =
    presentKnn(collection(spark, sfDir).search(querySet(spark, sfDir), K, Metric.L2))

  /** Row 3: top-k by inner product. */
  def qKnnDot(spark: SparkSession, sfDir: String): DataFrame =
    presentKnn(collection(spark, sfDir).search(querySet(spark, sfDir), K, Metric.Dot))

  /** Top-k by Manhattan distance (the fourth metric of the unified
    * surface; Qdrant supports it natively).
    */
  def qKnnL1(spark: SparkSession, sfDir: String): DataFrame =
    presentKnn(collection(spark, sfDir).search(querySet(spark, sfDir), K, Metric.L1))

  /** Row 4: kNN with metadata pre-filter (label < 5), the
    * Qdrant/Milvus/Weaviate "filtered search". The filter lands in
    * the parquet scan (PushedFilters), so the pruned corpus never
    * materializes unfiltered.
    */
  def qKnnFiltered(spark: SparkSession, sfDir: String): DataFrame =
    presentKnn(collection(spark, sfDir)
      .search(querySet(spark, sfDir), K, Metric.Cosine, preFilter = Some(col("label") < 5)))

  /** Row 5: radius search — every corpus vector with cosine ≥ 0.25 of
    * a query. Pure filter after scoring: no shuffle at all beyond the
    * final presentation sort.
    */
  def qRangeSearch(spark: SparkSession, sfDir: String): DataFrame =
    collection(spark, sfDir).rangeSearch(querySet(spark, sfDir), 0.25)
      .select(col("q_id"), col("vec_id"), col("score"))
      .orderBy(col("q_id"), col("vec_id"))

  /** Row 6: grouped top-k — nearest 3 per (query, corpus label),
    * Weaviate's group-by search / Milvus grouping_field.
    */
  def qGroupedTopk(spark: SparkSession, sfDir: String): DataFrame =
    collection(spark, sfDir).groupedSearch(querySet(spark, sfDir), 3, "label")
      .select(col("q_id"), col("label"), col("vec_id"), col("rn"), col("score"))
      .orderBy(col("q_id"), col("label"), col("rn"))

  /** Milvus grouping_search: top-3 labels per query by best-hit
    * cosine, 2 hits per label — the "diverse sources" search shape
    * (one result per document, several chunks each). See
    * [[graft.api.VectorCollection.groupingSearch]] for the
    * WindowGroupLimit-preserving plan.
    */
  def qGroupingSearch(spark: SparkSession, sfDir: String): DataFrame =
    collection(spark, sfDir)
      .groupingSearch(querySet(spark, sfDir), groups = 3, groupSize = 2, "label")
      .select(col("q_id"), col("group_rank"), col("label"),
        col("rn").as("hit_rank"), col("vec_id"), col("score"))
      .orderBy(col("q_id"), col("group_rank"), col("hit_rank"))

  /** Recommend example ids (Qdrant-style positive/negative search). */
  val RecommendPos: Seq[Long] = Seq(0L, 100L, 200L)
  val RecommendNeg: Seq[Long] = Seq(300L, 400L)

  /** Qdrant recommend: rank by similarity to mean(positives) −
    * mean(negatives), examples excluded. See
    * [[graft.api.VectorCollection.recommend]].
    */
  def qRecommend(spark: SparkSession, sfDir: String): DataFrame =
    collection(spark, sfDir).recommend(RecommendPos, RecommendNeg, K)
      .select(col("vec_id"), col("rn"), col("score"))
      .orderBy(col("rn"))

  /** Sub-vector layout of the late-interaction (multi-vector) view:
    * each 64-dim embedding is read as `MaxsimSubs` token vectors of
    * `MaxsimDim` dims — the deterministic stand-in for a ColBERT-style
    * per-token embedding matrix (Qdrant multivectors / Milvus
    * multi-vector fields store exactly this shape).
    */
  val MaxsimSubs = 4
  val MaxsimDim = 16

  private def subVec(c: org.apache.spark.sql.Column, i: Int) =
    slice(c, i * MaxsimDim + 1, MaxsimDim)

  /** Late-interaction (MaxSim) search — the multivector comparator of
    * Qdrant/ColBERT, via [[graft.api.VectorCollection.searchMaxsim]].
    */
  def qMaxsim(spark: SparkSession, sfDir: String): DataFrame =
    presentKnn(collection(spark, sfDir)
      .searchMaxsim(querySet(spark, sfDir), K, MaxsimSubs, MaxsimDim))

  /** Matryoshka two-stage search: rank on the 16-dim embedding
    * prefix (MRL-truncated vectors — 4× less compute and scan width),
    * keep the top `MatryoshkaPool` per query, exact-rerank on full
    * dims. Both stages are deterministic, so the whole operator is
    * SQL-oracled — unlike IVF/LSH there is no training state. At
    * 100 TB the first stage reads a quarter of the vector bytes, and
    * only |queries|·pool full vectors are ever re-read (broadcast
    * semi-join into the corpus scan, no corpus shuffle).
    */
  val MatryoshkaPool = 100

  def qMatryoshkaKnn(spark: SparkSession, sfDir: String): DataFrame =
    presentKnn(collection(spark, sfDir)
      .searchTwoStage(querySet(spark, sfDir), K, MaxsimDim, MatryoshkaPool))

  /** MMR diversified search (rows-only — greedy selection has no SQL
    * twin): 5 picks per query at λ=0.5 over a 30-candidate pool, via
    * [[graft.api.VectorCollection.searchMmr]]. MmrSpec proves the
    * anti-crowding behavior on constructed near-duplicates.
    */
  def qMmr(spark: SparkSession, sfDir: String): DataFrame =
    collection(spark, sfDir)
      .searchMmr(querySet(spark, sfDir), k = 5)
      .orderBy(col("q_id"), col("step"))

  /** Multi-vector-field hybrid search (Milvus `hybrid_search` with
    * `RRFRanker`): each record carries several vector fields; the
    * query searches every field and fuses the per-field rankings by
    * reciprocal rank. Here the two fields are the embedding's 32-dim
    * halves (a record's "title" and "body" vectors in a real
    * deployment). Both field scans share one pass over the corpus —
    * the two scores are per-row expressions on the same scan line —
    * so the plan stays a single broadcast-join scan plus two bounded
    * rank windows over the per-field top pools.
    */
  def qMultivecRrf(spark: SparkSession, sfDir: String): DataFrame = {
    val kRrf = 60
    val pool = 50
    def half(c: org.apache.spark.sql.Column, i: Int) = slice(c, i * 32 + 1, 32)
    val scored = Tables.embeddings(spark, sfDir)
      .crossJoin(broadcast(querySet(spark, sfDir)))
      .select(col("q_id"), col("vec_id"),
        round(vec.cosine(half(col("q_emb"), 0), half(col("embedding"), 0)), 6).as("s_a"),
        round(vec.cosine(half(col("q_emb"), 1), half(col("embedding"), 1)), 6).as("s_b"))
    val wA = Window.partitionBy(col("q_id")).orderBy(col("s_a").desc, col("vec_id"))
    val wB = Window.partitionBy(col("q_id")).orderBy(col("s_b").desc, col("vec_id"))
    val ranked = scored
      .withColumn("r_a", row_number().over(wA).cast("long"))
      .withColumn("r_b", row_number().over(wB).cast("long"))
      .filter(col("r_a") <= pool || col("r_b") <= pool)
      .withColumn("rrf", round(
        when(col("r_a") <= pool, lit(1.0) / (col("r_a") + kRrf)).otherwise(0.0) +
          when(col("r_b") <= pool, lit(1.0) / (col("r_b") + kRrf)).otherwise(0.0), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("vec_id"))
    ranked.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("rn"), col("rrf"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Near-object search (Weaviate `nearObject` / Chroma query-by-id):
    * neighbors of stored objects, the seeds excluded — via
    * [[graft.api.VectorCollection.searchByIds]].
    */
  def qNearObject(spark: SparkSession, sfDir: String): DataFrame =
    presentKnn(collection(spark, sfDir)
      .searchByIds(Seq(7L, 21L, 400L), K, Metric.Cosine))

  /** Decay-boosted search (ES `function_score` gauss/exp decay,
    * Qdrant formula queries): final score = cosine similarity ×
    * exponential recency decay over a per-vector age. The corpus
    * carries no timestamp, so age is derived deterministically from
    * the id (vec_id % 365 days, 90-day half-life-ish scale) — the
    * formula, not the provenance, is the operator. Both factors are
    * rounded to 6 places before the product so the DuckDB oracle's
    * exp/cosine agree bit-for-bit after rounding; the boost is a pure
    * per-row expression inside the same scan as the similarity, so
    * the plan shape is identical to plain kNN.
    */
  def qDecayScore(spark: SparkSession, sfDir: String): DataFrame = {
    // (a Fanout.rebalance on the scoring scan was tried and REVERTED:
    // the 0.34 s single-task cosine pass spread 8-wide but the added
    // exchange + AQE round gave it all back — 0.73 -> 0.70 s, noise)
    val scored = Tables.embeddings(spark, sfDir)
      .crossJoin(broadcast(querySet(spark, sfDir)))
      .withColumn("sim", round(vec.cosine(col("q_emb"), col("embedding")), 6))
      .withColumn("decay",
        round(exp(-pmod(col("vec_id"), lit(365L)).cast("double") / 90.0), 6))
      .withColumn("score", round(col("sim") * col("decay"), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("rn"), col("sim"), col("decay"), col("score"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Discovery-search examples: target + (positive, negative)
    * context pairs.
    */
  val DiscoverTarget = 0L
  val DiscoverPairs: Seq[(Long, Long)] = Seq((100L, 300L), (200L, 400L))

  /** Discovery search (Qdrant's discover API): rank the corpus
    * primarily by how many context pairs a vector sits closer to the
    * positive than the negative of, then by similarity to the target;
    * the examples themselves are excluded. The five example vectors
    * are a one-row broadcast built from pushed-down point lookups, so
    * the scan shape is the usual single corpus pass; the global
    * top-10 is a distributed TakeOrderedAndProject with ranks
    * attached to the ten survivors.
    */
  def qDiscover(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val exampleIds = DiscoverTarget +: DiscoverPairs.flatMap(p => Seq(p._1, p._2))
    def pick(idV: Long, out: String) =
      first(when(col("vec_id") === idV, col("embedding")), ignoreNulls = true).as(out)
    val ex = emb.filter(col("vec_id").isin(exampleIds: _*))
      .agg(pick(DiscoverTarget, "t"),
        pick(DiscoverPairs(0)._1, "p1"), pick(DiscoverPairs(0)._2, "n1"),
        pick(DiscoverPairs(1)._1, "p2"), pick(DiscoverPairs(1)._2, "n2"))
    val ctx =
      (round(vec.cosine(col("p1"), col("embedding")), 6) >
        round(vec.cosine(col("n1"), col("embedding")), 6)).cast("long") +
      (round(vec.cosine(col("p2"), col("embedding")), 6) >
        round(vec.cosine(col("n2"), col("embedding")), 6)).cast("long")
    val scored = emb.filter(!col("vec_id").isin(exampleIds: _*))
      .crossJoin(broadcast(ex))
      .select(col("vec_id"), ctx.as("ctx"),
        round(vec.cosine(col("t"), col("embedding")), 6).as("tsim"))
    // global top-10 via sort+limit; ranks attached on the bounded
    // result (pmod keeps the partition spec past constant folding)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("vec_id"), lit(1L)))
      .orderBy(col("ctx").desc, col("tsim").desc, col("vec_id"))
    scored.orderBy(col("ctx").desc, col("tsim").desc, col("vec_id")).limit(K)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("vec_id"), col("ctx"), col("tsim"), col("rn"))
      .orderBy(col("rn"))
  }

  /** Qdrant recommend, `strategy=best_score` (the non-averaging
    * variant of [[qRecommend]]): per corpus vector, best-of-positives
    * vs best-of-negatives — score = best_pos when it beats best_neg,
    * else −best_neg² (the documented Qdrant formula, which pushes
    * negative-dominated vectors below every positive-dominated one).
    * Same plan shape as [[qDiscover]]: the five example vectors fold
    * into a one-row broadcast from pushed-down point lookups, one
    * corpus scan, global top-10 as TakeOrderedAndProject.
    */
  def qRecommendBestScore(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val exampleIds = RecommendPos ++ RecommendNeg
    def pick(idV: Long, out: String) =
      first(when(col("vec_id") === idV, col("embedding")), ignoreNulls = true).as(out)
    val ex = emb.filter(col("vec_id").isin(exampleIds: _*))
      .agg(pick(RecommendPos(0), "p1"), pick(RecommendPos(1), "p2"),
        pick(RecommendPos(2), "p3"), pick(RecommendNeg(0), "n1"),
        pick(RecommendNeg(1), "n2"))
    def sim(e: org.apache.spark.sql.Column) = round(vec.cosine(e, col("embedding")), 6)
    val bp = greatest(sim(col("p1")), sim(col("p2")), sim(col("p3")))
    val bn = greatest(sim(col("n1")), sim(col("n2")))
    val scored = emb.filter(!col("vec_id").isin(exampleIds: _*))
      .crossJoin(broadcast(ex))
      .select(col("vec_id"),
        round(when(bp > bn, bp).otherwise(-(bn * bn)), 6).as("score"))
    val w = Window.partitionBy(pmod(col("vec_id"), lit(1L)))
      .orderBy(col("score").desc, col("vec_id"))
    scored.orderBy(col("score").desc, col("vec_id")).limit(K)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("vec_id"), col("rn"), col("score"))
      .orderBy(col("rn"))
  }

  /** Qdrant context search — the target-less sibling of
    * [[qDiscover]]: score = Σ over context pairs of
    * min(0, sim(positive) − sim(negative)), so a vector "inside" the
    * context of every pair scores the maximum 0 and anything pulled
    * toward a negative goes negative. Ties (the 0-score plateau is
    * wide by design) break by vec_id. One corpus scan against the
    * one-row broadcast of the four pair vectors.
    */
  def qContextSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val exampleIds = DiscoverPairs.flatMap(p => Seq(p._1, p._2))
    def pick(idV: Long, out: String) =
      first(when(col("vec_id") === idV, col("embedding")), ignoreNulls = true).as(out)
    val ex = emb.filter(col("vec_id").isin(exampleIds: _*))
      .agg(pick(DiscoverPairs(0)._1, "p1"), pick(DiscoverPairs(0)._2, "n1"),
        pick(DiscoverPairs(1)._1, "p2"), pick(DiscoverPairs(1)._2, "n2"))
    def sim(e: org.apache.spark.sql.Column) = round(vec.cosine(e, col("embedding")), 6)
    val ctxScore =
      least(lit(0d), sim(col("p1")) - sim(col("n1"))) +
      least(lit(0d), sim(col("p2")) - sim(col("n2")))
    val scored = emb.filter(!col("vec_id").isin(exampleIds: _*))
      .crossJoin(broadcast(ex))
      .select(col("vec_id"), round(ctxScore, 6).as("score"))
    val w = Window.partitionBy(pmod(col("vec_id"), lit(1L)))
      .orderBy(col("score").desc, col("vec_id"))
    scored.orderBy(col("score").desc, col("vec_id")).limit(K)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("vec_id"), col("rn"), col("score"))
      .orderBy(col("rn"))
  }

  /** Move-to/move-away vector ids and force for [[qMoveVector]]. */
  val MoveQuery = 0L
  val MoveTo = 100L
  val MoveAway = 300L
  val MoveForce = 0.5

  /** Weaviate `nearText`-style query steering (`moveTo`/`moveAwayFrom`
    * with force 0.5): the query vector is adjusted element-wise —
    * q + force·to − force·away, in double — and the adjusted vector
    * runs an ordinary cosine top-k with the three source objects
    * excluded. The arithmetic happens once on a one-row broadcast
    * (never per corpus row), so the scan cost is exactly one kNN.
    */
  def qMoveVector(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val ids = Seq(MoveQuery, MoveTo, MoveAway)
    def pick(idV: Long, out: String) =
      first(when(col("vec_id") === idV, col("embedding").cast("array<double>")),
        ignoreNulls = true).as(out)
    val adj = emb.filter(col("vec_id").isin(ids: _*))
      .agg(pick(MoveQuery, "q"), pick(MoveTo, "t"), pick(MoveAway, "a"))
      .select(expr(s"transform(q, (x, i) -> x + $MoveForce * t[i] - $MoveForce * a[i])")
        .as("q_emb"))
    val scored = emb.filter(!col("vec_id").isin(ids: _*))
      .crossJoin(broadcast(adj))
      .select(col("vec_id"),
        round(vec.cosine(col("q_emb"), col("embedding")), 6).as("score"))
    val w = Window.partitionBy(pmod(col("vec_id"), lit(1L)))
      .orderBy(col("score").desc, col("vec_id"))
    scored.orderBy(col("score").desc, col("vec_id")).limit(K)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("vec_id"), col("rn"), col("score"))
      .orderBy(col("rn"))
  }

  /** Autocut pool size and jump factor for [[qAutocut]]. */
  val AutocutPool = 50
  val AutocutFactor = 3.0

  /** Autocut (Weaviate `autocut`): instead of a fixed k, the ranked
    * list is cut at the first QUALITY JUMP — a consecutive-score drop
    * exceeding `AutocutFactor`× the pool's uniform spacing
    * (range / (n−1)). Everything from the jump down is noise relative
    * to the head and is discarded. The pool is a bounded top-50
    * (distributed TakeOrderedAndProject); the gap scan, threshold,
    * and cut are all windows/aggregates over those 50 rows, so the
    * adaptive cut costs nothing beyond the plain kNN at any corpus
    * size. The query vector itself is excluded (its score-1.0 spike
    * would always be the first jump).
    */
  def qAutocut(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val pool = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(vec.cosine(col("q_emb"), col("embedding")), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(AutocutPool)
    val w = Window.partitionBy(pmod(col("vec_id"), lit(1L)))
      .orderBy(col("score").desc, col("vec_id"))
    val ranked = pool
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("gap", lag(col("score"), 1).over(w) - col("score"))
    val thr = ranked.agg(
      ((max(col("score")) - min(col("score"))) / (count(lit(1)) - 1)
        * lit(AutocutFactor)).as("thr"))
    val cut = ranked.crossJoin(broadcast(thr))
      .filter(col("gap") > col("thr"))
      .agg(min(col("rn")).as("cut_rn"))
    ranked.crossJoin(broadcast(cut))
      .filter(col("cut_rn").isNull || col("rn") < col("cut_rn"))
      .select(col("vec_id"), col("rn"), col("score"))
      .orderBy(col("rn"))
  }

  /** Per-query-filter batch search (Qdrant/Milvus batch search where
    * every query carries its own filter — here: only corpus vectors
    * sharing the query's label). Spark-first insight: a per-query
    * equality filter IS a join key, so the query set joins the corpus
    * with a broadcast HASH join on label — each corpus row is scored
    * against only the queries whose filter it satisfies, instead of
    * all queries × post-filter. At 1000 queries over 100 TB that is
    * 1000× less scoring work than filter-after-crossjoin.
    */
  def qKnnPerQueryFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    Tables.embeddings(spark, sfDir)
      .join(broadcast(querySet(spark, sfDir)), col("label") === col("q_label"))
      .select(col("q_id"), col("vec_id"),
        round(vec.cosine(col("q_emb"), col("embedding")), 6).as("score"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("rn"), col("score"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Neighborhood size for the aggregate-over-search operator. */
  val SearchAggPool = 50

  /** Aggregation over search results — Weaviate's Aggregate +
    * nearVector API, via
    * [[graft.api.VectorCollection.searchAggregate]]: per query, the
    * label histogram and mean similarity of its top-50 neighborhood.
    */
  def qSearchAgg(spark: SparkSession, sfDir: String): DataFrame =
    collection(spark, sfDir)
      .searchAggregate(querySet(spark, sfDir), SearchAggPool, "label")
      .orderBy(col("q_id"), col("label"))

  /** Distance matrix (Qdrant `search_matrix`): pairwise cosine over
    * a deterministic sample of the collection, top-5 neighbors per
    * sample point — the input of offline graph builds (HNSW seeding,
    * cluster diagnostics). The sample (n ≪ corpus) is broadcast
    * against itself; at 100 TB the sample is the only data touched
    * after the scan-level filter.
    */
  def qDistMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val sample = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 40 === 0)
      .select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("vec_a")).orderBy(col("score").desc, col("vec_b"))
    sample.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
      .crossJoin(broadcast(sample.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))))
      .filter(col("vec_a") =!= col("vec_b"))
      .withColumn("score", round(vec.cosine(col("emb_a"), col("emb_b")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("vec_a"), col("vec_b"), col("rn"), col("score"))
      .orderBy(col("vec_a"), col("rn"))
  }

  /** Per-label centroid + outlier report: each label's mean vector
    * (components rounded to stabilize the float sum order), then the
    * 3 vectors farthest (L2) from their own centroid — the
    * cluster-hygiene / anomaly pass over an embedding collection.
    * Centroids aggregate by (label, dim) — map-side combinable,
    * cardinality |labels|·dim — and re-enter as a broadcast.
    */
  def qCentroidAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val dims = e.select(col("label"), posexplode(col("embedding")).as(Seq("i", "x")))
    val cent = dims.groupBy(col("label"), col("i"))
      .agg(round(avg(col("x")), 6).as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(i, c))), s -> s.c)").as("centroid"))
    val w = Window.partitionBy(col("label")).orderBy(col("dist").desc, col("vec_id"))
    e.join(broadcast(cent), "label")
      .withColumn("dist", round(vec.l2(col("embedding"), col("centroid")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("label"), col("vec_id"), col("rn"), col("dist"))
      .orderBy(col("label"), col("rn"))
  }

  /** Row 9: per-label norm stats over the collection — the
    * normalize/stats path every backend runs at ingest. Map-side
    * partial agg; output cardinality = |labels|.
    */
  def qVectorStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("label"), size(col("embedding")).cast("long").as("dim"),
              vec.norm(col("embedding")).as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        max(col("dim")).as("dim"),
        round(avg(col("nrm")), 6).as("avg_norm"),
        round(min(col("nrm")), 6).as("min_norm"),
        round(max(col("nrm")), 6).as("max_norm"))
      .orderBy(col("label"))

  /** Binary-vector Hamming search (Milvus BINARY_VECTOR with the
    * HAMMING metric): each embedding binarized to its sign-bit word
    * (bit i ⇔ component i ≥ 0), exact top-k by Hamming distance on
    * the packed 64-bit words — one xor + popcount per candidate,
    * the cheapest exact metric there is. Unlike [[Quantization.qBqKnn]]
    * (where the word is a PREFILTER for a float rerank), here the
    * binary metric IS the ranking, so the whole operator is
    * SQL-oracled (the oracle counts per-dim sign disagreements; same
    * function, unpacked). At scale: corpus → 8 bytes/vector, scan +
    * WindowGroupLimit top-k, no shuffle beyond |queries|·k rows.
    */
  def qKnnHamming(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.matrixops
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), matrixops.signBits(col("embedding")).as("w"))
    val qs = querySet(spark, sfDir)
      .select(col("q_id"), matrixops.signBits(col("q_emb")).as("qw"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("hamming").asc, col("vec_id"))
    corpus.crossJoin(broadcast(qs))
      .select(col("q_id"), col("vec_id"),
        bit_count(col("w").bitwiseXOR(col("qw"))).cast("long").as("hamming"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("rn"), col("hamming"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Document-content filtered search (Chroma `where_document`
    * `$contains`): kNN restricted to points whose paired DOCUMENT
    * contains a token — the content predicate lives on the document
    * store, not the vector payload, so it arrives via a doc_id join
    * (Chroma stores both sides together; the unified engine keeps
    * them as two tables). The filtered id set shrinks at the
    * documents scan before joining the embeddings scan on the id key;
    * scoring and top-k then run on the reduced corpus only.
    */
  def qWhereDocument(spark: SparkSession, sfDir: String): DataFrame = {
    val matching = Tables.documents(spark, sfDir)
      .filter(array_contains(split(col("text"), " "), "vector"))
      .select(col("doc_id").as("vec_id"))
    val corpus = Tables.embeddings(spark, sfDir).join(matching, "vec_id")
    val qs = querySet(spark, sfDir)
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    corpus.crossJoin(broadcast(qs))
      .withColumn("score", round(vec.cosine(col("q_emb"), col("embedding")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("rn"), col("score"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** The negated/regex document-content predicates (Chroma
    * `where_document` `$not_contains` / `$regex`): kNN restricted to
    * points whose paired document does NOT contain a token AND
    * matches a regular expression — the remaining two Chroma
    * document-predicate forms after [[qWhereDocument]]'s
    * `$contains`. Same scale shape: the content predicate shrinks
    * the id set at the documents scan (`NOT contains` is a cheap
    * per-row string scan, the regex a codegen'd `RLike` — both
    * map-side, never shuffled), ids join the embeddings scan, and
    * scoring + top-k run on the reduced corpus only. The wire forms
    * parse via [[graft.api.FilterDsl]] `match.not_text` /
    * `match.regex`.
    */
  def qWhereDocumentNeg(spark: SparkSession, sfDir: String): DataFrame = {
    val matching = Tables.documents(spark, sfDir)
      .filter(!col("text").contains("vector") &&
        col("text").rlike("(hash|sort) (join|merge)"))
      .select(col("doc_id").as("vec_id"))
    val corpus = Tables.embeddings(spark, sfDir).join(matching, "vec_id")
    val qs = querySet(spark, sfDir)
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    corpus.crossJoin(broadcast(qs))
      .withColumn("score", round(vec.cosine(col("q_emb"), col("embedding")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("rn"), col("score"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Hard-negative mining — the contrastive-training data op every
    * embedding pipeline runs (DPR/Contriever-style): for each query,
    * the top-5 most similar corpus vectors whose label DIFFERS from
    * the query's (similar-but-wrong = the informative negatives).
    * The label inequality is a per-pair predicate on the scored
    * frame — same broadcast-queries single-scan shape as plain kNN,
    * filter before the WindowGroupLimit top-k.
    */
  def qHardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.embeddings(spark, sfDir)
      .crossJoin(broadcast(querySet(spark, sfDir)))
      .filter(col("label") =!= col("q_label"))
      .withColumn("score", round(vec.cosine(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("vec_id"), col("rn"), col("score"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Annulus (band) range search — Milvus `radius` + `range_filter`,
    * Qdrant range conditions on score: corpus vectors whose cosine
    * similarity lies in [0.2, 0.3) of a query. Same single-scan
    * shape as [[qRangeSearch]]; the band is two score predicates on
    * the scored frame, still no shuffle beyond presentation.
    */
  def qRangeBandSearch(spark: SparkSession, sfDir: String): DataFrame =
    collection(spark, sfDir).rangeSearch(querySet(spark, sfDir), 0.2)
      .filter(col("score") < 0.3)
      .select(col("q_id"), col("vec_id"), col("score"))
      .orderBy(col("q_id"), col("vec_id"))

  /** Random sampling (Qdrant `sample: random` query API): a
    * deterministic pseudo-random draw of 20 points — order by the
    * md5-bucket of the id (salted), id tie-break. The hash order is
    * uniform but reproducible, so the draw is oracle-checkable; at
    * scale it is a scan + global top-k on the hash key (TakeOrdered,
    * no full sort materialization).
    */
  def qRandomSample(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        graft.functions.hashes.md5Bucket(
          concat(lit("smp"), col("vec_id").cast("string")), 1000000L).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(20)
      .select(col("vec_id"), col("label"))

  /** Ranked-search evaluation (the ES `rank_eval` API): per-query
    * precision@k, reciprocal rank, and NDCG@k for the cosine top-k,
    * with binary relevance = corpus label matches the query's label
    * (the query vector itself is excluded — it is not a judgment).
    * The ideal DCG normalizes against min(total relevant in corpus,
    * k), so a query whose label has fewer than k members is not
    * penalized for the missing slots — ES's `ndcg` metric semantics.
    * This is also the harness that measures ANN recall degradation
    * at corpus scale: run it over any `queries()` search family and
    * compare.
    *
    * Scale shape: one scored corpus scan (queries broadcast,
    * WindowGroupLimit pre-limits the per-query top-k before the
    * shuffle), then everything downstream — metrics, label totals,
    * the ≤k-term IDCG expansion — operates on |queries|·k rows. The
    * label histogram is a combinable aggregate broadcast back; no
    * second corpus pass.
    */
  def qRankEval(spark: SparkSession, sfDir: String): DataFrame = {
    val q = querySet(spark, sfDir)
    val corpus = Tables.embeddings(spark, sfDir)
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", round(Metric.Cosine.score(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    val top = scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .withColumn("rel", (col("label") === col("q_label")).cast("int"))
    val labelCounts = corpus.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
    top.groupBy(col("q_id"), col("q_label"))
      .agg(sum(col("rel")).cast("long").as("n_rel"),
        round(sum(col("rel")).cast("double") / K, 6).as("p_at_k"),
        round(coalesce(max(when(col("rel") === 1, lit(1.0) / col("rn"))), lit(0.0)), 6)
          .as("mrr"),
        sum(when(col("rel") === 1, lit(1.0) / log2(col("rn") + 1)).otherwise(0.0)).as("dcg"))
      .join(broadcast(labelCounts), col("q_label") === col("label"))
      .withColumn("r_total", least(col("n_label") - 1, lit(K.toLong)))
      // sequence(1, 0) would DESCEND; a query label with no other
      // member has idcg undefined → ndcg 0 by convention
      .withColumn("ndcg", when(col("r_total") >= 1, round(col("dcg") / expr(
        "aggregate(sequence(1L, r_total), 0.0D, (acc, i) -> acc + 1.0D / log2(CAST(i AS DOUBLE) + 1))"),
        6)).otherwise(0.0))
      .select(col("q_id"), col("n_rel"), col("p_at_k"), col("mrr"), col("ndcg"))
      .orderBy(col("q_id"))
  }
}
