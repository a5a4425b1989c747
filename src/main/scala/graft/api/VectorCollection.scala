package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.vec

/** Similarity metric of the unified vector surface (the reference's
  * cosine / L2 / inner-product switch shared by all five backends).
  */
sealed trait Metric {
  /** Score of corpus vector `v` for query vector `q` (double). */
  def score(q: Column, v: Column): Column
  /** True when smaller scores are nearer (distances). */
  def ascending: Boolean
}
object Metric {
  case object Cosine extends Metric {
    def score(q: Column, v: Column): Column = vec.cosine(q, v)
    def ascending = false
  }
  case object L2 extends Metric {
    def score(q: Column, v: Column): Column = vec.l2(q, v)
    def ascending = true
  }
  case object L1 extends Metric {
    def score(q: Column, v: Column): Column = vec.l1(q, v)
    def ascending = true
  }
  case object Dot extends Metric {
    def score(q: Column, v: Column): Column = vec.dot(q, v)
    def ascending = false
  }
}

/** A vector collection: any DataFrame with an id column, an
  * `array<float>` embedding column, and arbitrary payload columns —
  * the programmatic surface a user of the reference's unified client
  * would call (search / range / grouped search, recommend, upsert,
  * delete, get, scroll, stats — the shared API of the five backends
  * behind its VECTOR_DB switch, /root/reference/README.md:82,
  * tests/cpu/docker-compose.yml:5-29), each returning a plain
  * DataFrame plan.
  *
  * Every method builds a declarative plan — Catalyst handles
  * pushdown/pruning; query sets and update batches are broadcast;
  * top-k uses rank windows that Spark executes with partial
  * WindowGroupLimit before any shuffle. Nothing here collects to the
  * driver, so every operation scales with executor count.
  *
  * Expected query-set shape: columns `q_id`, `q_emb` (+ optionals).
  * Scores are rounded to 6 decimals and ties broken by id for
  * deterministic results.
  */
final case class VectorCollection(df: DataFrame, idCol: String = "id",
                                  embCol: String = "embedding") {

  private def id: Column = col(idCol)
  private def emb: Column = col(embCol)

  /** Top-k per query, optional metadata pre-filter. */
  def search(queries: DataFrame, k: Int, metric: Metric = Metric.Cosine,
             preFilter: Option[Column] = None): DataFrame = {
    val corpus = preFilter.fold(df)(df.filter)
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("score", round(metric.score(col("q_emb"), emb), 6))
    val ord = if (metric.ascending) col("score").asc else col("score").desc
    val w = Window.partitionBy(col("q_id")).orderBy(ord, id)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** All corpus vectors scoring past `threshold` per query. */
  def rangeSearch(queries: DataFrame, threshold: Double,
                  metric: Metric = Metric.Cosine): DataFrame = {
    val scored = df.crossJoin(broadcast(queries))
      .withColumn("score", round(metric.score(col("q_emb"), emb), 6))
    if (metric.ascending) scored.filter(col("score") <= threshold)
    else scored.filter(col("score") >= threshold)
  }

  /** Top-k per (query, group) — Weaviate group-by / Milvus grouping
    * search. `groupCol` must be a corpus column.
    */
  def groupedSearch(queries: DataFrame, k: Int, groupCol: String,
                    metric: Metric = Metric.Cosine): DataFrame = {
    val scored = df.crossJoin(broadcast(queries))
      .withColumn("score", round(metric.score(col("q_emb"), emb), 6))
    val ord = if (metric.ascending) col("score").asc else col("score").desc
    val w = Window.partitionBy(col("q_id"), col(groupCol)).orderBy(ord, id)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Grouping search (Milvus `grouping_search` with `group_by_field`
    * + `group_size`): the top `groups` groups per query, each
    * represented by its `groupSize` best hits, groups ranked by their
    * best hit's score. Differs from [[groupedSearch]] (which returns
    * top-k for EVERY group): here the groups themselves compete, so a
    * query returns `groups × groupSize` rows no matter how many
    * distinct group values the corpus holds.
    *
    * Plan shape (the window-scale rule): the per-(query, group) hit
    * limit is a pure row_number window — Spark runs it as a partial
    * WindowGroupLimit before the shuffle — and the group ranking is
    * computed on the post-limit |q|·|groups|-sized frame as a
    * combinable max + a second tiny window, then joined back. Mixing
    * the group-best aggregate into the first window would disable the
    * group-limit and pour the corpus into |q|·|groups| tasks.
    */
  def groupingSearch(queries: DataFrame, groups: Int, groupSize: Int,
                     groupCol: String, metric: Metric = Metric.Cosine): DataFrame = {
    val hits = groupedSearch(queries, groupSize, groupCol, metric)
    val best = hits.groupBy(col("q_id"), col(groupCol))
      .agg((if (metric.ascending) min(col("score")) else max(col("score"))).as("best"))
    val ordB = if (metric.ascending) col("best").asc else col("best").desc
    val wg = Window.partitionBy(col("q_id")).orderBy(ordB, col(groupCol))
    val top = best.withColumn("group_rank", row_number().over(wg).cast("long"))
      .filter(col("group_rank") <= groups)
      .select(col("q_id"), col(groupCol), col("group_rank"))
    hits.join(broadcast(top), Seq("q_id", groupCol))
  }

  /** Late-interaction (MaxSim) search over fixed-width sub-vectors:
    * the embedding column is read as `subs` token vectors of `subDim`
    * dims (Qdrant multivectors / ColBERT), scored as Σ over query
    * sub-vectors of the best cosine against any document sub-vector.
    * The subs×subs cosine grid is a static codegen'd expression tree;
    * scan shape identical to `search`.
    */
  def searchMaxsim(queries: DataFrame, k: Int, subs: Int, subDim: Int): DataFrame = {
    def sub(c: Column, i: Int) = slice(c, i * subDim + 1, subDim)
    val score = (0 until subs).map { qi =>
      greatest((0 until subs).map(di =>
        graft.functions.vec.cosine(sub(col("q_emb"), qi), sub(emb, di))): _*)
    }.reduce(_ + _)
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, id)
    df.crossJoin(broadcast(queries))
      .select(col("q_id"), id, round(score, 6).as("score"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Two-stage (matryoshka) search: rank on the `prefixDims`-dim
    * embedding prefix, keep `pool` candidates per query, exact-rerank
    * on full dims. The id-only pool is broadcast back into the corpus
    * scan, so full vectors are read once and never shuffled.
    */
  def searchTwoStage(queries: DataFrame, k: Int, prefixDims: Int, pool: Int): DataFrame = {
    val wPre = Window.partitionBy(col("q_id")).orderBy(col("pscore").desc, id)
    val idPool = df.crossJoin(broadcast(queries))
      .select(col("q_id"), id, round(graft.functions.vec.cosine(
        slice(col("q_emb"), 1, prefixDims), slice(emb, 1, prefixDims)), 6).as("pscore"))
      .withColumn("prn", row_number().over(wPre))
      .filter(col("prn") <= pool)
      .select(col("q_id"), id)
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, id)
    df.select(id, emb)
      .join(broadcast(idPool), idCol)
      .join(broadcast(queries.select(col("q_id"), col("q_emb"))), "q_id")
      .withColumn("score", round(graft.functions.vec.cosine(col("q_emb"), emb), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Aggregation over search results (Weaviate Aggregate +
    * nearVector): per query, group stats of its top-`pool`
    * neighborhood.
    */
  def searchAggregate(queries: DataFrame, pool: Int, groupCol: String,
                      metric: Metric = Metric.Cosine): DataFrame = {
    val ord = if (metric.ascending) col("score").asc else col("score").desc
    val w = Window.partitionBy(col("q_id")).orderBy(ord, id)
    df.crossJoin(broadcast(queries))
      .select(col("q_id"), id, col(groupCol),
        round(metric.score(col("q_emb"), emb), 6).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= pool)
      .groupBy(col("q_id"), col(groupCol))
      .agg(count(lit(1)).as("n"), round(avg(col("score")), 6).as("avg_score"))
  }

  /** Maximal-marginal-relevance search — the RAG diversification
    * reranker: greedily pick k results maximizing
    * λ·sim(query, d) − (1−λ)·max_{s∈selected} sim(d, s), so near-
    * duplicate hits don't crowd the result list. Stage 1 is a plain
    * top-`pool` search; the greedy selection is inherently sequential
    * per query, so it runs as one per-group kernel over the collected
    * pool (≤ `pool` rows per query — constant-bounded at any corpus
    * scale) instead of k−1 rounds of joins: the corpus is touched
    * once, and the selection adds a single |queries|-row aggregate.
    * The kernel mirrors the engine's arithmetic (sequential double
    * cosine, HALF_UP rounding to 6 decimals, ties by id) so results
    * are deterministic and identical to the join formulation.
    */
  def searchMmr(queries: DataFrame, k: Int, lambda: Double = 0.5,
                pool: Int = 30): DataFrame = {
    val cand = search(queries, pool, Metric.Cosine)
      .select(col("q_id"), id.cast("long").as("__cid"),
        col("score").as("__qsim"), emb.cast("array<float>").as("__cemb"))
    val kk = k
    val lam = lambda
    val greedy = udf { cands: Seq[org.apache.spark.sql.Row] =>
      def r6(x: Double): Double =
        java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) {
          val x = a(i).toDouble; val y = b(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val all = cands.map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Float](2))).sortBy { case (cid, qsim, _) => (-qsim, cid) }
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      val selEmb = scala.collection.mutable.ArrayBuffer.empty[Seq[Float]]
      val taken = scala.collection.mutable.HashSet.empty[Long]
      while (sel.length < kk && sel.length < all.length) {
        val step = sel.length + 1
        val best =
          if (step == 1) all.head
          else all.iterator.filterNot(c => taken(c._1)).maxBy { case (cid, qsim, e) =>
            val maxs = selEmb.iterator.map(s => r6(cos(e, s))).max
            (r6(lam * qsim - (1.0 - lam) * maxs), -cid)
          }
        sel += ((best._1, step.toLong, best._2))
        selEmb += best._3
        taken += best._1
      }
      sel.toSeq
    }
    cand.groupBy(col("q_id"))
      .agg(greedy(collect_list(struct(col("__cid"), col("__qsim"), col("__cemb")))).as("__sel"))
      .select(col("q_id"), explode(col("__sel")).as("__p"))
      .select(col("q_id"), col("__p._1").as(idCol),
        col("__p._2").as("step"), col("__p._3").as("qsim"))
  }

  /** Search by existing object ids (Weaviate `nearObject`, Chroma
    * query-by-id, Qdrant recommend with a single positive): each seed
    * id's stored vector becomes a query, the seed itself excluded.
    * The seed set is a pushed-down point lookup that re-enters as the
    * broadcast query side — the corpus scans once, exactly the plain
    * search shape.
    */
  def searchByIds(seedIds: Seq[Long], k: Int,
                  metric: Metric = Metric.Cosine): DataFrame = {
    val seeds = df.filter(id.isin(seedIds: _*))
      .select(id.as("q_id"), emb.as("q_emb"))
    val scored = df.crossJoin(broadcast(seeds))
      .filter(id =!= col("q_id"))
      .withColumn("score", round(metric.score(col("q_emb"), emb), 6))
    val ord = if (metric.ascending) col("score").asc else col("score").desc
    val w = Window.partitionBy(col("q_id")).orderBy(ord, id)
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
  }

  /** Recommendation search (the reference's Qdrant-style recommend
    * API): rank the corpus against the difference of the element-wise
    * means of positive and negative example vectors, excluding the
    * examples themselves. The example sets are a handful of pushed-
    * down point lookups; the mean vector is a 1-row aggregate
    * broadcast into the scoring scan.
    */
  def recommend(positiveIds: Seq[Long], negativeIds: Seq[Long], k: Int,
                metric: Metric = Metric.Cosine): DataFrame = {
    def meanVec(ids: Seq[Long], out: String): DataFrame =
      df.filter(id.isin(ids: _*))
        .select(posexplode(emb).as(Seq("pos", "v")))
        .select(col("pos"), col("v").cast("double").as("v"))
        .groupBy(col("pos"))
        .agg(avg(col("v")).as(out))
    val dimScores =
      if (negativeIds.isEmpty) meanVec(positiveIds, "pv").select(col("pos"), col("pv").as("dv"))
      else meanVec(positiveIds, "pv").join(meanVec(negativeIds, "nv"), "pos")
        .select(col("pos"), (col("pv") - col("nv")).as("dv"))
    // q_id is derived (always 0) rather than a literal: a foldable
    // q_id would be eliminated from the rank window's partition spec
    // by Spark 4's EliminateWindowPartitions, degrading the top-k to
    // an unpartitioned window (pmod survives constant folding; a
    // `* 0` product does not)
    val qdf = dimScores
      .agg(expr("transform(sort_array(collect_list(struct(pos, dv))), s -> s.dv)").as("q_emb"))
      .withColumn("q_id", pmod(size(col("q_emb")), lit(1)).cast("long"))
    val exclude = positiveIds ++ negativeIds
    search(qdf, k, metric, preFilter = Some(!id.isin(exclude: _*)))
  }

  /** Latest-wins merge of an update/insert batch (same schema as the
    * collection). One shuffle on the id; with the collection bucketed
    * by id at rest, none.
    */
  def upsert(batch: DataFrame): VectorCollection = {
    val base = df.withColumn("__version", lit(1))
    val upd = batch.withColumn("__version", lit(2))
    val w = Window.partitionBy(id).orderBy(col("__version").desc)
    val merged = base.unionByName(upd)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    copy(df = merged)
  }

  /** Version column retained by upsert (1 = base, 2 = batch). */
  def versionCol: String = "__version"

  /** Delete-by-filter (the reference's delete(filter=…)). */
  def delete(cond: Column): VectorCollection = copy(df = df.filter(!cond || cond.isNull))

  /** Point lookup — compiles to an IN-set pushed into the scan. */
  def getByIds(ids: Seq[Long]): DataFrame = df.filter(id.isin(ids: _*))

  /** Deterministic scroll page: order by id, skip `offset`, take `limit`. */
  def scroll(offset: Int, limit: Int): DataFrame =
    df.orderBy(id).offset(offset).limit(limit)

  /** Collection stats: count, dim, norm aggregate. */
  def stats(): DataFrame =
    df.select(size(emb).cast("long").as("dim"), vec.norm(emb).as("nrm"))
      .agg(
        count(lit(1)).as("n_vectors"),
        max(col("dim")).as("dim"),
        round(avg(col("nrm")), 6).as("avg_norm"),
        round(min(col("nrm")), 6).as("min_norm"),
        round(max(col("nrm")), 6).as("max_norm"))

  /** Persist the full at-rest index for this collection
    * ([[graft.operators.VectorIndex]] — spilled IVF partitions,
    * PQ/SQ8/BQ codes, LSH postings, trained geometry under `meta/`):
    * the ingest-time build after which any session serves every
    * approximate search family from the layout alone via
    * `VectorIndex.searchIvf/searchPq/…`, appends fold in with
    * `VectorIndex.append`, and the payload `labelCol` (int, default a
    * zero literal when absent) rides along for filtered search.
    */
  def writeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                 labelCol: String = "label"): graft.operators.VectorIndex.Meta = {
    val label =
      if (df.columns.contains(labelCol)) col(labelCol).cast("int")
      else lit(0)
    graft.operators.VectorIndex.buildFrom(spark,
      df.select(id.cast("long").as("vec_id"), emb.as("embedding"),
        label.as("label")), path)
  }
}
