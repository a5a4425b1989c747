package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit, round}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (the coverage
  * inventory) and §7 (build order). Every implemented operator is a
  * `queries` entry; every SQL-expressible one also has a DuckDB
  * oracle in `oracleSql` with identical column names and rounding.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Brute-force cosine kNN — the signature operation of the
    * unified vector surface.
    */
  def entry(spark: SparkSession): DataFrame =
    VectorSearch.qKnnCosine(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"          -> (Relational.q1Agg _),
    "q3_join"         -> (Relational.q3Join _),
    "q_window"        -> (Relational.qWindow _),
    "q_events_window" -> (Relational.qEventsWindow _),
    "q_events_sliding" -> (Relational.qEventsSliding _),
    "q_json_extract"  -> (Relational.qJsonExtract _),
    "q_knn_cosine"    -> (VectorSearch.qKnnCosine _),
    "q_knn_l2"        -> (VectorSearch.qKnnL2 _),
    "q_knn_dot"       -> (VectorSearch.qKnnDot _),
    "q_knn_l1"        -> (VectorSearch.qKnnL1 _),
    "q_knn_filtered"  -> (VectorSearch.qKnnFiltered _),
    "q_knn_perquery_filter" -> (VectorSearch.qKnnPerQueryFilter _),
    "q_range_search"  -> (VectorSearch.qRangeSearch _),
    "q_grouped_topk"  -> (VectorSearch.qGroupedTopk _),
    "q_recommend"     -> (VectorSearch.qRecommend _),
    "q_recommend_best_score" -> (VectorSearch.qRecommendBestScore _),
    "q_discover"      -> (VectorSearch.qDiscover _),
    "q_context_search" -> (VectorSearch.qContextSearch _),
    "q_move_vector"   -> (VectorSearch.qMoveVector _),
    "q_autocut"       -> (VectorSearch.qAutocut _),
    "q_maxsim"        -> (VectorSearch.qMaxsim _),
    "q_search_agg"    -> (VectorSearch.qSearchAgg _),
    "q_matryoshka_knn" -> (VectorSearch.qMatryoshkaKnn _),
    "q_vector_stats"  -> (VectorSearch.qVectorStats _),
    "q_asof_join"     -> (AsofJoin.qAsofJoin _),
    "q_upsert"           -> (Collection.qUpsert _),
    "q_delete_filter"    -> (Collection.qDeleteFilter _),
    "q_get_by_ids"       -> (Collection.qGetByIds _),
    "q_scroll"           -> (Collection.qScroll _),
    "q_collection_stats" -> (Collection.qCollectionStats _),
    "q_count_filtered"   -> (Collection.qCountFiltered _),
    "q_facet"            -> (Collection.qFacet _),
    "q_filters_agg"      -> (Relational.qFiltersAgg _),
    "q_global_agg"       -> (FullText.qGlobalAgg _),
    "q_keyword_match" -> (FullText.qKeywordMatch _),
    "q_phrase_match"  -> (FullText.qPhraseMatch _),
    "q_fuzzy_match"   -> (FullText.qFuzzyMatch _),
    "q_tfidf"         -> (FullText.qTfidf _),
    "q_bm25"          -> (FullText.qBm25 _),
    "q_explain_score" -> (FullText.qExplainScore _),
    "q_bm25_batch"    -> (FullText.qBm25Batch _),
    "q_hybrid_rrf"    -> (FullText.qHybridRrf _),
    "q_hybrid_weighted" -> (FullText.qHybridWeighted _),
    "q_sparse_knn"    -> (SparseSearch.qSparseKnn _),
    "q_dedup_exact"     -> (Dedup.qDedupExact _),
    "q_dedup_ngram"     -> (Dedup.qDedupNgram _),
    "q_dedup_embedding" -> (Dedup.qDedupEmbedding _),
    "q_dedup_embedding_lsh" -> (Dedup.qDedupEmbeddingLsh _),
    "q_dedup_embedding_auto" -> (Dedup.qDedupEmbeddingAuto _),
    "q_dedup_minhash"   -> (Dedup.qDedupMinhash _),
    "q_dedup_simhash"   -> (Dedup.qDedupSimhash _),
    "q_dup_clusters"    -> (Dedup.qDupClusters _),
    "q_token_count"   -> (TextAnalysis.qTokenCount _),
    "q_chunk_docs"    -> (TextAnalysis.qChunkDocs _),
    "q_pii_redact"    -> (TextAnalysis.qPiiRedact _),
    "q_sample_stratified" -> (Collection.qSampleStratified _),
    "q_lang_id"       -> (TextAnalysis.qLangId _),
    "q_quality_score" -> (TextAnalysis.qQualityScore _),
    "q_fingerprint"   -> (TextAnalysis.qFingerprint _),
    // rows-only: HLL++/KLL sketch internals are engine-specific; the
    // error bounds vs exact answers are asserted in TextAnalysisSpec
    "q_sketch_stats"  -> (TextAnalysis.qSketchStats _),
    "q_multimodal_meta" -> ((s: SparkSession, d: String) => Multimodal.qMultimodalMeta(s, d)),
    "q_media_resize"    -> ((s: SparkSession, d: String) => Multimodal.qMediaResize(s, d)),
    "q_media_frames"    -> ((s: SparkSession, d: String) => Multimodal.qMediaFrames(s, d)),
    "q_sessionize" -> ((s: SparkSession, dir: String) =>
      graft.streaming.Sessionize.batch(Tables.events(s, dir))
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), round(col("sum_value"), 2).as("sum_value"))
        .orderBy(col("user_id"), col("session_start"))),
    // rows-only (centroid/hash/quantizer dependent): recall specs in
    // AnnSpec / QuantizationSpec
    "q_contamination"  -> (TrainingPipeline.qContamination _),
    "q_repetition"     -> (TrainingPipeline.qRepetition _),
    "q_mix_sources"    -> (TrainingPipeline.qMixSources _),
    "q_pack_sequences" -> (TrainingPipeline.qPackSequences _),
    "q_shuffle_train"  -> (TrainingPipeline.qShuffleTrain _),
    "q_length_buckets" -> (TrainingPipeline.qLengthBuckets _),
    "q_mixture_plan"      -> (TrainingPipeline.qMixturePlan _),
    "q_temperature_sample" -> (TrainingPipeline.qTemperatureSample _),
    "q_dsir"            -> (TrainingPipeline.qDsir _),
    "q_zipf"            -> (TextAnalysis.qZipf _),
    "q_heaps"           -> (TextAnalysis.qHeaps _),
    "q_perplexity_buckets" -> (TextAnalysis.qPerplexityBuckets _),
    "q_dedup_prefix"   -> (Dedup.qDedupPrefix _),
    "q_dedup_substring" -> (Dedup.qDedupSubstring _),
    "q_rank_eval"      -> (VectorSearch.qRankEval _),
    "q_more_like_this"     -> (FullText.qMoreLikeThis _),
    "q_significant_terms"  -> (FullText.qSignificantTerms _),
    "q_significant_text"   -> (FullText.qSignificantText _),
    "q_highlight"          -> (FullText.qHighlight _),
    "q_media_dedup"        -> ((s: SparkSession, d: String) => Multimodal.qMediaDedup(s, d)),
    "q_media_near_dup"     -> ((s: SparkSession, d: String) => Multimodal.qMediaNearDup(s, d)),
    "q_media_near_dup_auto" -> ((s: SparkSession, d: String) => Multimodal.qMediaNearDupAuto(s, d)),
    "q_media_knn"          -> (Multimodal.qMediaKnn _),
    "q_search_after"   -> (Collection.qSearchAfter _),
    "q_rollup"         -> (Relational.qRollup _),
    "q_percentiles"    -> (Relational.qPercentiles _),
    "q_percentile_ranks" -> (Relational.qPercentileRanks _),
    "q_boxplot"        -> (Relational.qBoxplot _),
    "q_date_histogram" -> (Relational.qDateHistogram _),
    "q_rate"           -> (Relational.qRate _),
    "q_auto_date_histogram" -> (Relational.qAutoDateHistogram _),
    "q_bucket_selector" -> (Relational.qBucketSelector _),
    "q_dist_matrix"      -> (VectorSearch.qDistMatrix _),
    "q_centroid_anomaly" -> (VectorSearch.qCentroidAnomaly _),
    "q_geo_search"     -> (Geo.qGeoSearch _),
    "q_ivf_knn" -> (Ann.qIvfKnn _),
    "q_lsh_knn" -> (Ann.qLshKnn _),
    "q_sq8_knn" -> (Quantization.qSq8Knn _),
    "q_pq_knn"  -> (Quantization.qPqKnn _),
    "q_ivfpq_knn" -> (Quantization.qIvfPqKnn _),
    "q_bq_knn"  -> (Quantization.qBqKnn _),
    "q_mmr"     -> (VectorSearch.qMmr _),
    "q_decay_score"  -> (VectorSearch.qDecayScore _),
    "q_boilerplate"  -> (TrainingPipeline.qBoilerplate _),
    "q_suggest"      -> (FullText.qSuggest _),
    "q_near_object"  -> (VectorSearch.qNearObject _),
    "q_histogram_numeric" -> (Relational.qHistogramNumeric _),
    "q_regex_match"  -> (FullText.qRegexMatch _),
    "q_multivec_rrf" -> (VectorSearch.qMultivecRrf _),
    "q_extended_stats"  -> (Relational.qExtendedStats _),
    "q_adjacency_matrix" -> (Relational.qAdjacencyMatrix _),
    "q_moving_agg"   -> (Relational.qMovingAgg _),
    "q_rare_terms"   -> (TextAnalysis.qRareTerms _),
    "q_perplexity"   -> (TextAnalysis.qPerplexity _),
    "q_cooccur_pmi"  -> (TextAnalysis.qCooccurPmi _),
    "q_frequent_item_sets" -> (TextAnalysis.qFrequentItemSets _),
    "q_percolate"    -> (FullText.qPercolate _),
    "q_span_near"    -> (FullText.qSpanNear _),
    "q_multi_match"  -> (FullText.qMultiMatch _),
    "q_dis_max"      -> (FullText.qDisMax _),
    "q_collapse"     -> (FullText.qCollapse _),
    "q_phrase_prefix" -> (FullText.qPhrasePrefix _),
    "q_intervals"    -> (FullText.qIntervals _),
    "q_synonym_match" -> (FullText.qSynonymMatch _),
    "q_composite_agg" -> (Relational.qCompositeAgg _),
    "q_update_by_query" -> (Collection.qUpdateByQuery _),
    "q_scroll_slice"    -> (Collection.qScrollSlice _),
    "q_geo_grid"        -> (Geo.qGeoGrid _),
    "q_geohash_grid"    -> (Geo.qGeohashGrid _),
    "q_terms_by_metric" -> (Relational.qTermsByMetric _),
    "q_media_audio"     -> ((s: SparkSession, d: String) => Multimodal.qMediaAudio(s, d)),
    "q_rescore"         -> (FullText.qRescore _),
    "q_pinned"          -> (FullText.qPinned _),
    "q_matrix_stats"    -> (Relational.qMatrixStats _),
    "q_t_test"          -> (Relational.qTTest _),
    "q_mad"             -> (Relational.qMad _),
    "q_weighted_avg"    -> (Relational.qWeightedAvg _),
    "q_string_stats"    -> (TextAnalysis.qStringStats _),
    "q_top_metrics"     -> (Relational.qTopMetrics _),
    "q_diversified_sample" -> (Relational.qDiversifiedSample _),
    "q_range_agg"       -> (Relational.qRangeAgg _),
    "q_bucket_script"   -> (Relational.qBucketScript _),
    "q_stats_bucket"    -> (Relational.qStatsBucket _),
    "q_cumulative_cardinality" -> (Relational.qCumulativeCardinality _),
    "q_nested_match"    -> (Relational.qNestedMatch _),
    "q_boosting"        -> (FullText.qBoosting _),
    "q_terms_set"       -> (FullText.qTermsSet _),
    "q_top_hits"        -> (FullText.qTopHits _),
    "q_gopher_quality"  -> (TextAnalysis.qGopherQuality _),
    "q_knn_hamming"     -> (VectorSearch.qKnnHamming _),
    "q_random_sample"   -> (VectorSearch.qRandomSample _),
    "q_hybrid_dbsf"     -> (FullText.qHybridDbsf _),
    "q_rank_feature"    -> (FullText.qRankFeature _),
    "q_multi_terms"     -> (Collection.qMultiTerms _),
    "q_range_band_search" -> (VectorSearch.qRangeBandSearch _),
    "q_geo_rings"       -> (Geo.qGeoRings _),
    "q_geo_line"        -> (Geo.qGeoLine _),
    "q_geo_tile"        -> (Geo.qGeoTile _),
    "q_dedup_keep_best" -> (Dedup.qDedupKeepBest _),
    "q_dedup_soft"      -> (Dedup.qDedupSoft _),
    "q_semdedup"        -> (Dedup.qSemDedup _),
    "q_termvectors"     -> (FullText.qTermvectors _),
    "q_quality_classifier" -> (TextAnalysis.qQualityClassifier _),
    "q_percentiles_bucket" -> (Relational.qPercentilesBucket _),
    "q_change_point"    -> (Relational.qChangePoint _),
    "q_hard_negatives"  -> (VectorSearch.qHardNegatives _),
    "q_where_document"  -> (VectorSearch.qWhereDocument _),
    "q_where_document_neg" -> (VectorSearch.qWhereDocumentNeg _),
    "q_normalize_agg"   -> (Relational.qNormalizeAgg _),
    "q_has_parent"      -> (Relational.qHasParent _),
    "q_geo_bounds"      -> (Geo.qGeoBounds _),
    "q_phrase_suggest"  -> (FullText.qPhraseSuggest _),
    "q_serial_diff"     -> (Relational.qSerialDiff _),
    "q_categorize_text" -> (TextAnalysis.qCategorizeText _),
    "q_var_width_histogram" -> (Relational.qVarWidthHistogram _),
    "q_missing_agg"     -> (Relational.qMissingAgg _),
    "q_reverse_nested"  -> (Relational.qReverseNested _),
    "q_moving_percentiles" -> (Relational.qMovingPercentiles _),
    "q_logsumexp"       -> (Relational.qLogSumExp _),
    "q_geo_polygon"     -> (Geo.qGeoPolygon _),
    "q_geo_polygon_indexed" -> (Geo.qGeoPolygonIndexed _),
    "q_geo_shape"       -> (Geo.qGeoShape _),
    "q_analyze"         -> (FullText.qAnalyze _),
    "q_grouping_search" -> (VectorSearch.qGroupingSearch _),
    "q_bpe_pairs"       -> (TrainingPipeline.qBpePairs _),
    "q_bm25_indexed"    -> (FullText.qBm25Indexed _),
    "q_hybrid_at_rest"  -> (FullText.qHybridAtRest _),
    // rows-only (filesystem-dependent footprint numbers): lifecycle
    // movement of every column is pinned in IndexStatsSpec. Covers
    // the vector index AND the cluster index, so takedown (tombstone)
    // and superseded-row debt of the newest standing structure is
    // operator-visible
    "q_index_stats" -> ((s: SparkSession, dir: String) => {
      val layout = operators.VectorIndex
        .stats(s, operators.VectorIndex.sessionIndexPath(s, dir))
        .unionByName(operators.Dedup.clusterIndexStats(s,
          operators.Dedup.sessionClusterIndexPath(s, dir)))
        .select(col("kind"), col("table"), col("files"), col("bytes"),
          col("debt_rows"), col("n_generations"),
          lit(null).cast("string").as("value"))
      // serving params ride the same report as debt: the calibrated
      // nprobe/pool defaults, the encoding flags — decisively
      // pq_budget_bound (a recall miss there is a code-budget limit;
      // retraining would re-encode the corpus for nothing) — and the
      // embedding-dedup ROUTE with the measured inputs that chose it
      val vparams = operators.VectorIndex
        .servingParams(s, operators.VectorIndex.sessionIndexPath(s, dir))
        .select(lit("vector").as("kind"),
          concat(lit("param:"), col("param")).as("table"),
          lit(null).cast("long").as("files"), lit(null).cast("long").as("bytes"),
          lit(null).cast("long").as("debt_rows"), lit(null).cast("int").as("n_generations"),
          col("value").cast("string").as("value"))
      val route = operators.Dedup
        .routeParams(s, Tables.embeddings(s, dir)
          .select(col("vec_id"), col("embedding"), col("label")), threshold = 0.35)
        .select(lit("dedup_route").as("kind"),
          concat(lit("param:"), col("param")).as("table"),
          lit(null).cast("long").as("files"), lit(null).cast("long").as("bytes"),
          lit(null).cast("long").as("debt_rows"), lit(null).cast("int").as("n_generations"),
          col("value"))
      layout.unionByName(vparams).unionByName(route)
        .orderBy(col("kind"), col("table"))
    }),
    "q_hybrid_filtered" -> (FullText.qHybridFiltered _),
    "q_eql_sequence"    -> (Relational.qEqlSequence _),
    "q_filter_dsl"      -> (Collection.qFilterDsl _),
    "q_array_filter"    -> (Collection.qArrayFilter _),
    "q_payload_schema"  -> (Collection.qPayloadSchema _),
    "q_payload_index_scan" -> (Collection.qPayloadIndexScan _),
    "q_has_child"       -> (Relational.qHasChild _),
    "q_crawl_diff"      -> (TrainingPipeline.qCrawlDiff _),
    "q_star_join"       -> (Relational.qStarJoin _)
  )

  /** Shared oracle fragments for the full-text family (token CTEs). */
  private val oracleTextCtes =
    """toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
      |       WHERE token IN ('spark','join','vector') GROUP BY 1, 2),
      |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
      |       WHERE token IN ('spark','join','vector') GROUP BY 1),
      |st AS (SELECT count(*) AS n_docs, avg(len(string_split(text, ' '))) AS avgdl FROM documents)""".stripMargin

  /** The geohash interleave (8 lon + 7 lat bits, lon first) as SQL —
    * generated from the same loop shape as the Spark expression so
    * the two encoders cannot drift.
    */
  private val geohashBitsSql: String = (
    (0 until 8).map(j => s"((lon_i >> ${7 - j}) & 1) * ${1 << (14 - 2 * j)}") ++
    (0 until 7).map(j => s"((lat_i >> ${6 - j}) & 1) * ${1 << (13 - 2 * j)}")
  ).mkString(" + ")

  private val oracleBm25 =
    s"""WITH $oracleTextCtes,
       |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents)
       |SELECT tf.doc_id, round(sum(
       |  ln(1.0 + (CAST(st.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5)) *
       |  (CAST(tf.tf AS DOUBLE) * (1.2 + 1) /
       |   (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)))), 6) AS bm25
       |FROM tf JOIN df USING (token) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
       |GROUP BY tf.doc_id""".stripMargin

  /** Shared oracle fragment: the deterministic query set (every 100th
    * vector) with embeddings cast to DOUBLE[] so DuckDB's list_*
    * functions accumulate in double like our codegen'd expressions.
    */
  private val oracleQuerySet =
    "SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id % 100 = 0"

  private def oracleKnn(scoreFn: String, order: String, filter: String = "TRUE",
                        k: Int = VectorSearch.K): String =
    s"""WITH q AS ($oracleQuerySet),
       |s AS (SELECT q.q_id, e.vec_id,
       |        round($scoreFn(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
       |      FROM q CROSS JOIN embeddings e WHERE $filter)
       |SELECT q_id, vec_id, rn, score FROM (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score $order, vec_id) AS rn
       |  FROM s)
       |WHERE rn <= $k ORDER BY q_id, rn""".stripMargin

  /** The 4×4 MaxSim cosine grid as DuckDB SQL (1-based inclusive
    * list slices; q_emb is already DOUBLE[]).
    */
  private val oracleMaxsimScore: String =
    (0 until VectorSearch.MaxsimSubs).map { qi =>
      val d = VectorSearch.MaxsimDim
      val qs = s"q.q_emb[${qi * d + 1}:${(qi + 1) * d}]"
      "greatest(" + (0 until VectorSearch.MaxsimSubs).map { di =>
        s"list_cosine_similarity($qs, e.embedding[${di * d + 1}:${(di + 1) * d}]::DOUBLE[])"
      }.mkString(", ") + ")"
    }.mkString(" + ")

  /** DuckDB-runnable ANSI SQL twins; table name = parquet file stem.
    * Column names and rounding must match the Spark results exactly
    * (the driver sorts columns by name and hashes values).
    */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate  > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_window" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, rn, running_rev FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    row_number() OVER w AS rn,
        |    round(sum(l_extendedprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |) t WHERE rn <= 5""".stripMargin,
    "q_events_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q_events_sliding" ->
      """WITH x AS (SELECT event_type, value,
        |    unnest([time_bucket(INTERVAL '30 minutes', ts),
        |            time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS window_start
        |  FROM events)
        |SELECT window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_multivec_rrf" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
        |           FROM embeddings WHERE vec_id % 100 = 0),
        |s AS (SELECT q.q_id, e.vec_id,
        |    round(list_cosine_similarity(q.q_emb[1:32],
        |      (e.embedding::DOUBLE[])[1:32]), 6) AS s_a,
        |    round(list_cosine_similarity(q.q_emb[33:64],
        |      (e.embedding::DOUBLE[])[33:64]), 6) AS s_b
        |  FROM q CROSS JOIN embeddings e),
        |r AS (SELECT q_id, vec_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY s_a DESC, vec_id) AS r_a,
        |    row_number() OVER (PARTITION BY q_id ORDER BY s_b DESC, vec_id) AS r_b
        |  FROM s),
        |f AS (SELECT q_id, vec_id, round(
        |    CASE WHEN r_a <= 50 THEN CAST(1.0 AS DOUBLE) / (r_a + 60) ELSE 0.0 END +
        |    CASE WHEN r_b <= 50 THEN CAST(1.0 AS DOUBLE) / (r_b + 60) ELSE 0.0 END, 6) AS rrf
        |  FROM r WHERE r_a <= 50 OR r_b <= 50)
        |SELECT q_id, vec_id, rn, rrf FROM (
        |  SELECT q_id, vec_id, rrf,
        |    row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, vec_id) AS rn
        |  FROM f)
        |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    "q_histogram_numeric" ->
      """SELECT CAST(floor(n_chars / 100) * 100 AS BIGINT) AS bucket,
        |  count(*) AS n_docs, round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_regex_match" ->
      """WITH h AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '),
        |      t -> regexp_matches(t, '^s[a-z]*n$')) AS hits
        |  FROM documents)
        |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_matches,
        |  CAST(len(list_distinct(hits)) AS BIGINT) AS n_distinct
        |FROM h WHERE len(hits) > 0 ORDER BY doc_id""".stripMargin,
    "q_suggest" ->
      """SELECT token, count(*) AS freq, count(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token LIKE 's%'
        |GROUP BY token ORDER BY freq DESC, token LIMIT 10""".stripMargin,
    "q_near_object" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
        |           FROM embeddings WHERE vec_id IN (7, 21, 400)),
        |s AS (SELECT q.q_id, e.vec_id,
        |        round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
        |      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id)
        |SELECT q_id, vec_id, rn, score FROM (
        |  SELECT q_id, vec_id, score,
        |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
        |  FROM s)
        |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    "q_decay_score" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
        |           FROM embeddings WHERE vec_id % 100 = 0),
        |s AS (SELECT q.q_id, e.vec_id,
        |        round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS sim,
        |        round(exp(-CAST(e.vec_id % 365 AS DOUBLE) / 90.0), 6) AS decay
        |      FROM q CROSS JOIN embeddings e)
        |SELECT q_id, vec_id, rn, sim, decay, score FROM (
        |  SELECT q_id, vec_id, sim, decay, round(sim * decay, 6) AS score,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY round(sim * decay, 6) DESC, vec_id) AS rn
        |  FROM s)
        |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    "q_boilerplate" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[4:], ' ') AS text
        |  FROM documents WHERE doc_id % 11 = 0),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM all_docs
        |      WHERE len(string_split(text, ' ')) >= 8),
        |segs AS (SELECT doc_id,
        |    array_to_string(toks[(i * 8 + 1):(i * 8 + 8)], ' ') AS seg
        |  FROM (SELECT doc_id, toks, unnest(range(len(toks) // 8)) AS i FROM t)),
        |df AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
        |SELECT s.doc_id, count(*) AS n_segments,
        |  CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  round(CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS boiler_frac
        |FROM segs s JOIN df USING (seg)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "q_knn_cosine"   -> oracleKnn("list_cosine_similarity", "DESC"),
    "q_knn_l2"       -> oracleKnn("list_distance", "ASC"),
    "q_knn_dot"      -> oracleKnn("list_inner_product", "DESC"),
    "q_knn_filtered" -> oracleKnn("list_cosine_similarity", "DESC", filter = "e.label < 5"),
    "q_knn_perquery_filter" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb, label AS q_label
         |           FROM embeddings WHERE vec_id % 100 = 0),
         |s AS (SELECT q.q_id, e.vec_id,
         |        round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
         |      FROM q JOIN embeddings e ON e.label = q.q_label)
         |SELECT q_id, vec_id, rn, score FROM (
         |  SELECT q_id, vec_id, score,
         |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= ${VectorSearch.K} ORDER BY q_id, rn""".stripMargin,
    "q_knn_l1" ->
      s"""WITH q AS ($oracleQuerySet),
         |dims AS (SELECT unnest(range(64)) AS d),
         |s AS (SELECT q.q_id, e.vec_id,
         |        round(sum(abs(q.q_emb[d + 1] - e.embedding[d + 1]::DOUBLE)), 6) AS score
         |      FROM q CROSS JOIN embeddings e CROSS JOIN dims
         |      GROUP BY q.q_id, e.vec_id)
         |SELECT q_id, vec_id, rn, score FROM (
         |  SELECT q_id, vec_id, score,
         |    row_number() OVER (PARTITION BY q_id ORDER BY score ASC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    "q_range_search" ->
      s"""WITH q AS ($oracleQuerySet)
         |SELECT q.q_id, e.vec_id,
         |  round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
         |FROM q CROSS JOIN embeddings e
         |WHERE round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) >= 0.25
         |ORDER BY q_id, vec_id""".stripMargin,
    "q_grouped_topk" ->
      s"""WITH q AS ($oracleQuerySet),
         |s AS (SELECT q.q_id, e.label, e.vec_id,
         |        round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
         |      FROM q CROSS JOIN embeddings e)
         |SELECT q_id, label, vec_id, rn, score FROM (
         |  SELECT q_id, label, vec_id, score,
         |    row_number() OVER (PARTITION BY q_id, label ORDER BY score DESC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= 3 ORDER BY q_id, label, rn""".stripMargin,
    "q_recommend" ->
      """WITH dims AS (SELECT unnest(range(64)) AS d),
        |pos AS (SELECT d, avg(embedding[d + 1]::DOUBLE) AS pv
        |        FROM embeddings, dims WHERE vec_id IN (0, 100, 200) GROUP BY d),
        |neg AS (SELECT d, avg(embedding[d + 1]::DOUBLE) AS nv
        |        FROM embeddings, dims WHERE vec_id IN (300, 400) GROUP BY d),
        |qv AS (SELECT list(pv - nv ORDER BY d) AS q FROM pos JOIN neg USING (d)),
        |s AS (SELECT e.vec_id,
        |        round(list_cosine_similarity(qv.q, e.embedding::DOUBLE[]), 6) AS score
        |      FROM embeddings e CROSS JOIN qv
        |      WHERE e.vec_id NOT IN (0, 100, 200, 300, 400))
        |SELECT vec_id, rn, score FROM (
        |  SELECT vec_id, score, row_number() OVER (ORDER BY score DESC, vec_id) AS rn FROM s)
        |WHERE rn <= 10 ORDER BY rn""".stripMargin,
    "q_recommend_best_score" ->
      """WITH ex AS (SELECT
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)   AS p1,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 100) AS p2,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 200) AS p3,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 300) AS n1,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 400) AS n2),
        |s AS (SELECT e.vec_id,
        |    greatest(round(list_cosine_similarity(ex.p1, e.embedding::DOUBLE[]), 6),
        |             round(list_cosine_similarity(ex.p2, e.embedding::DOUBLE[]), 6),
        |             round(list_cosine_similarity(ex.p3, e.embedding::DOUBLE[]), 6)) AS bp,
        |    greatest(round(list_cosine_similarity(ex.n1, e.embedding::DOUBLE[]), 6),
        |             round(list_cosine_similarity(ex.n2, e.embedding::DOUBLE[]), 6)) AS bn
        |  FROM embeddings e CROSS JOIN ex
        |  WHERE e.vec_id NOT IN (0, 100, 200, 300, 400))
        |SELECT vec_id, rn, score FROM (
        |  SELECT vec_id,
        |    round(CASE WHEN bp > bn THEN bp ELSE -(bn * bn) END, 6) AS score,
        |    row_number() OVER (
        |      ORDER BY round(CASE WHEN bp > bn THEN bp ELSE -(bn * bn) END, 6) DESC,
        |        vec_id) AS rn
        |  FROM s)
        |WHERE rn <= 10 ORDER BY rn""".stripMargin,
    "q_context_search" ->
      """WITH ex AS (SELECT
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 100) AS p1,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 300) AS n1,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 200) AS p2,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 400) AS n2),
        |s AS (SELECT e.vec_id,
        |    round(least(0.0, round(list_cosine_similarity(ex.p1, e.embedding::DOUBLE[]), 6)
        |                   - round(list_cosine_similarity(ex.n1, e.embedding::DOUBLE[]), 6))
        |        + least(0.0, round(list_cosine_similarity(ex.p2, e.embedding::DOUBLE[]), 6)
        |                   - round(list_cosine_similarity(ex.n2, e.embedding::DOUBLE[]), 6)), 6)
        |      AS score
        |  FROM embeddings e CROSS JOIN ex
        |  WHERE e.vec_id NOT IN (100, 200, 300, 400))
        |SELECT vec_id, rn, score FROM (
        |  SELECT vec_id, score, row_number() OVER (ORDER BY score DESC, vec_id) AS rn FROM s)
        |WHERE rn <= 10 ORDER BY rn""".stripMargin,
    "q_autocut" ->
      """WITH qv AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0),
        |pool AS (SELECT vec_id,
        |    round(list_cosine_similarity(q_emb, embedding::DOUBLE[]), 6) AS score
        |  FROM embeddings CROSS JOIN qv
        |  WHERE vec_id <> 0 ORDER BY score DESC, vec_id LIMIT 50),
        |r AS (SELECT vec_id, score,
        |    row_number() OVER (ORDER BY score DESC, vec_id) AS rn,
        |    lag(score) OVER (ORDER BY score DESC, vec_id) - score AS gap FROM pool),
        |st AS (SELECT (max(score) - min(score)) / (count(*) - 1) * 3.0 AS thr FROM r),
        |c AS (SELECT min(rn) AS cut_rn FROM r CROSS JOIN st WHERE gap > thr)
        |SELECT vec_id, rn, score FROM r CROSS JOIN c
        |WHERE c.cut_rn IS NULL OR rn < c.cut_rn ORDER BY rn""".stripMargin,
    "q_move_vector" ->
      """WITH v AS (SELECT
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)   AS q,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 100) AS t,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 300) AS a),
        |adj AS (SELECT list_transform(range(1, 65),
        |                 i -> q[i] + 0.5 * t[i] - 0.5 * a[i]) AS q_emb FROM v),
        |s AS (SELECT e.vec_id,
        |    round(list_cosine_similarity(adj.q_emb, e.embedding::DOUBLE[]), 6) AS score
        |  FROM embeddings e CROSS JOIN adj
        |  WHERE e.vec_id NOT IN (0, 100, 300))
        |SELECT vec_id, rn, score FROM (
        |  SELECT vec_id, score, row_number() OVER (ORDER BY score DESC, vec_id) AS rn FROM s)
        |WHERE rn <= 10 ORDER BY rn""".stripMargin,
    "q_discover" ->
      """WITH ex AS (SELECT
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0) AS t,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 100) AS p1,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 300) AS n1,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 200) AS p2,
        |    (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 400) AS n2),
        |s AS (SELECT e.vec_id,
        |    CAST(round(list_cosine_similarity(ex.p1, e.embedding::DOUBLE[]), 6) >
        |         round(list_cosine_similarity(ex.n1, e.embedding::DOUBLE[]), 6) AS BIGINT)
        |  + CAST(round(list_cosine_similarity(ex.p2, e.embedding::DOUBLE[]), 6) >
        |         round(list_cosine_similarity(ex.n2, e.embedding::DOUBLE[]), 6) AS BIGINT) AS ctx,
        |    round(list_cosine_similarity(ex.t, e.embedding::DOUBLE[]), 6) AS tsim
        |  FROM embeddings e CROSS JOIN ex
        |  WHERE e.vec_id NOT IN (0, 100, 200, 300, 400))
        |SELECT vec_id, ctx, tsim, rn FROM (
        |  SELECT vec_id, ctx, tsim,
        |    row_number() OVER (ORDER BY ctx DESC, tsim DESC, vec_id) AS rn
        |  FROM s)
        |WHERE rn <= 10 ORDER BY rn""".stripMargin,
    "q_search_agg" ->
      s"""WITH q AS ($oracleQuerySet),
         |s AS (SELECT q.q_id, e.vec_id, e.label,
         |        round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
         |      FROM q CROSS JOIN embeddings e),
         |p AS (SELECT q_id, label, score FROM (
         |        SELECT q_id, label, score,
         |          row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
         |        FROM s)
         |      WHERE rn <= ${VectorSearch.SearchAggPool})
         |SELECT q_id, label, count(*) AS n, round(avg(score), 6) AS avg_score
         |FROM p GROUP BY q_id, label ORDER BY q_id, label""".stripMargin,
    "q_asof_join" ->
      """SELECT c.event_id, c.user_id, p.event_id AS purchase_id,
        |  CAST(epoch_ms(c.ts) - epoch_ms(p.ts) AS BIGINT) AS lag_ms
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |ASOF JOIN (SELECT max(event_id) AS event_id, user_id, ts
        |           FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q_maxsim" ->
      s"""WITH q AS ($oracleQuerySet),
         |s AS (SELECT q.q_id, e.vec_id, round($oracleMaxsimScore, 6) AS score
         |      FROM q CROSS JOIN embeddings e)
         |SELECT q_id, vec_id, rn, score FROM (
         |  SELECT q_id, vec_id, score,
         |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= ${VectorSearch.K} ORDER BY q_id, rn""".stripMargin,
    "q_matryoshka_knn" ->
      s"""WITH q AS ($oracleQuerySet),
         |c AS (SELECT q.q_id, e.vec_id,
         |        round(list_cosine_similarity(q.q_emb[1:16], e.embedding[1:16]::DOUBLE[]), 6) AS pscore
         |      FROM q CROSS JOIN embeddings e),
         |p AS (SELECT q_id, vec_id FROM (
         |        SELECT q_id, vec_id,
         |          row_number() OVER (PARTITION BY q_id ORDER BY pscore DESC, vec_id) AS prn
         |        FROM c)
         |      WHERE prn <= ${VectorSearch.MatryoshkaPool}),
         |r AS (SELECT p.q_id, p.vec_id,
         |        round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
         |      FROM p JOIN q USING (q_id) JOIN embeddings e ON p.vec_id = e.vec_id)
         |SELECT q_id, vec_id, rn, score FROM (
         |  SELECT q_id, vec_id, score,
         |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
         |  FROM r)
         |WHERE rn <= ${VectorSearch.K} ORDER BY q_id, rn""".stripMargin,
    "q_vector_stats" ->
      """SELECT label, count(*) AS n_vectors, max(len(embedding)) AS dim,
        |  round(avg(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS avg_norm,
        |  round(min(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS min_norm,
        |  round(max(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS max_norm
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "q_upsert" ->
      """WITH u AS (
        |  SELECT vec_id, label, 1 AS version FROM embeddings
        |  UNION ALL
        |  SELECT vec_id, label + 100 AS label, 2 AS version FROM embeddings WHERE vec_id % 10 = 0
        |  UNION ALL
        |  SELECT vec_id + 1000000000 AS vec_id, 999 AS label, 2 AS version FROM embeddings WHERE vec_id % 250 = 0)
        |SELECT vec_id, label, version FROM (
        |  SELECT vec_id, label, version,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY version DESC) AS rn FROM u)
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q_delete_filter" ->
      """SELECT label, count(*) AS n_remaining FROM embeddings
        |WHERE vec_id NOT IN (SELECT vec_id FROM embeddings WHERE label = 3 OR vec_id % 17 = 0)
        |GROUP BY label ORDER BY label""".stripMargin,
    "q_get_by_ids" ->
      """SELECT vec_id, label,
        |  round(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm
        |FROM embeddings WHERE vec_id IN (0,7,13,42,99,123,256,404,444,499)
        |ORDER BY vec_id""".stripMargin,
    "q_scroll" ->
      "SELECT vec_id, label FROM embeddings ORDER BY vec_id LIMIT 50 OFFSET 100",
    "q_facet" ->
      """SELECT source, count(*) AS n_docs,
        |  round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
        |FROM documents WHERE n_chars >= 300
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_collection_stats" ->
      """SELECT count(*) AS n_vectors, count(DISTINCT label) AS n_labels,
        |  max(len(embedding)) AS dim,
        |  round(avg(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS avg_norm
        |FROM embeddings""".stripMargin,
    "q_count_filtered" ->
      """WITH qv AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0)
        |SELECT count(*) AS n_vectors, count(DISTINCT label) AS n_labels
        |FROM embeddings CROSS JOIN qv
        |WHERE label < 5
        |  AND round(list_cosine_similarity(q_emb, embedding::DOUBLE[]), 6) >= 0.2""".stripMargin,
    "q_filters_agg" ->
      """WITH e AS (SELECT event_type, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events),
        |s AS (SELECT
        |    CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    round(avg(CASE WHEN value > 100 THEN value END), 6) AS a1,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |    round(avg(CASE WHEN event_type = 'click' THEN value END), 6) AS a2,
        |    CAST(sum(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |    round(avg(CASE WHEN k >= 50 THEN value END), 6) AS a3
        |  FROM e)
        |SELECT 'high_value' AS bucket, c1 AS n_events, a1 AS avg_value FROM s
        |UNION ALL SELECT 'clicks', c2, a2 FROM s
        |UNION ALL SELECT 'big_k', c3, a3 FROM s
        |ORDER BY bucket""".stripMargin,
    "q_global_agg" ->
      """SELECT lang,
        |  CAST(sum(CASE WHEN list_contains(string_split(text, ' '), 'vector')
        |               THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |  round(avg(CASE WHEN list_contains(string_split(text, ' '), 'vector')
        |                THEN n_chars END), 6) AS avg_chars_matched,
        |  count(*) AS n_all,
        |  round(avg(n_chars), 6) AS avg_chars_all
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_keyword_match" ->
      """SELECT doc_id, lang,
        |  (CAST(list_contains(string_split(text, ' '), 'spark') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'join') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'vector') AS BIGINT)) AS n_matched
        |FROM documents
        |WHERE (CAST(list_contains(string_split(text, ' '), 'spark') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'join') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'vector') AS BIGINT)) >= 2
        |ORDER BY doc_id""".stripMargin,
    "q_phrase_match" ->
      """SELECT doc_id,
        |  CAST((length(text) - length(replace(text, 'spark join', '')))
        |       / length('spark join') AS BIGINT) AS n_occurrences
        |FROM documents
        |WHERE (length(text) - length(replace(text, 'spark join', ''))) > 0
        |ORDER BY doc_id""".stripMargin,
    "q_fuzzy_match" ->
      """SELECT token, CAST(levenshtein(token, 'spark') AS BIGINT) AS distance,
        |  count(*) AS df
        |FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        |      FROM documents)
        |WHERE levenshtein(token, 'spark') <= 1
        |GROUP BY token, distance ORDER BY token""".stripMargin,
    "q_tfidf" ->
      s"""WITH $oracleTextCtes
         |SELECT doc_id, round(sum(tf * ln(CAST(n_docs AS DOUBLE) / df)), 6) AS tfidf
         |FROM tf JOIN df USING (token) CROSS JOIN st
         |GROUP BY doc_id ORDER BY tfidf DESC, doc_id LIMIT 20""".stripMargin,
    "q_bm25" ->
      s"""SELECT doc_id, bm25 FROM ($oracleBm25)
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q_explain_score" ->
      s"""WITH $oracleTextCtes,
         |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents)
         |SELECT tf.doc_id, tf.token, tf.tf, df.df, CAST(dl.dl AS BIGINT) AS dl,
         |  round(ln(1.0 + (CAST(st.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5)), 6) AS idf,
         |  round(CAST(tf.tf AS DOUBLE) * (1.2 + 1) /
         |        (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)), 6) AS tf_weight,
         |  round(ln(1.0 + (CAST(st.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5)) *
         |        (CAST(tf.tf AS DOUBLE) * (1.2 + 1) /
         |         (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))), 6) AS contrib
         |FROM tf JOIN df USING (token) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
         |WHERE tf.doc_id IN (5, 17, 42)
         |ORDER BY tf.doc_id, token""".stripMargin,
    "q_bm25_batch" ->
      """WITH qt(tq_id, token) AS (VALUES
        |  (1, 'spark'), (1, 'join'), (2, 'vector'), (2, 'hash'), (2, 'scan')),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
        |       WHERE token IN (SELECT token FROM qt) GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
        |       WHERE token IN (SELECT token FROM qt) GROUP BY 1),
        |st AS (SELECT count(*) AS n_docs, avg(len(string_split(text, ' '))) AS avgdl FROM documents),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |s AS (SELECT qt.tq_id, tf.doc_id, round(sum(
        |    ln(1.0 + (CAST(st.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5)) *
        |    (CAST(tf.tf AS DOUBLE) * (1.2 + 1) /
        |     (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)))), 6) AS bm25
        |  FROM qt JOIN tf USING (token) JOIN df USING (token)
        |  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
        |  GROUP BY 1, 2)
        |SELECT CAST(tq_id AS BIGINT) AS tq_id, doc_id, rn, bm25 FROM (
        |  SELECT tq_id, doc_id, bm25,
        |    row_number() OVER (PARTITION BY tq_id ORDER BY bm25 DESC, doc_id) AS rn
        |  FROM s)
        |WHERE rn <= 10 ORDER BY tq_id, rn""".stripMargin,
    "q_hybrid_rrf" ->
      s"""WITH bm AS ($oracleBm25),
         |lex AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
         |        FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50),
         |qv AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0),
         |vs AS (SELECT vec_id AS doc_id,
         |         round(list_cosine_similarity(q_emb, embedding::DOUBLE[]), 6) AS vscore
         |       FROM embeddings CROSS JOIN qv),
         |vr AS (SELECT doc_id, row_number() OVER (ORDER BY vscore DESC, doc_id) AS vec_rank
         |       FROM vs ORDER BY vscore DESC, doc_id LIMIT 50)
         |SELECT doc_id,
         |  round(coalesce(CAST(1.0 AS DOUBLE) / (60 + lex_rank), 0)
         |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + vec_rank), 0), 6) AS rrf
         |FROM lex FULL OUTER JOIN vr USING (doc_id)
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q_hybrid_filtered" ->
      s"""WITH bm AS ($oracleBm25),
         |allowed AS (SELECT vec_id AS doc_id FROM embeddings WHERE label >= 2 AND label < 8),
         |lex AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
         |        FROM bm JOIN allowed USING (doc_id) ORDER BY bm25 DESC, doc_id LIMIT 50),
         |qv AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0),
         |vs AS (SELECT vec_id AS doc_id,
         |         round(list_cosine_similarity(q_emb, embedding::DOUBLE[]), 6) AS vscore
         |       FROM embeddings CROSS JOIN qv WHERE label >= 2 AND label < 8),
         |vr AS (SELECT doc_id, row_number() OVER (ORDER BY vscore DESC, doc_id) AS vec_rank
         |       FROM vs ORDER BY vscore DESC, doc_id LIMIT 50)
         |SELECT doc_id,
         |  round(coalesce(CAST(1.0 AS DOUBLE) / (60 + lex_rank), 0)
         |      + coalesce(CAST(1.0 AS DOUBLE) / (60 + vec_rank), 0), 6) AS rrf
         |FROM lex FULL OUTER JOIN vr USING (doc_id)
         |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    "q_hybrid_weighted" ->
      s"""WITH bm AS ($oracleBm25),
         |lexp AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50),
         |lexn AS (SELECT doc_id, coalesce((bm25 - mn) / nullif(mx - mn, 0), 1.0) AS nl
         |         FROM lexp CROSS JOIN (SELECT min(bm25) AS mn, max(bm25) AS mx FROM lexp)),
         |qv AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0),
         |vs AS (SELECT vec_id AS doc_id,
         |         round(list_cosine_similarity(q_emb, embedding::DOUBLE[]), 6) AS vscore
         |       FROM embeddings CROSS JOIN qv),
         |vp AS (SELECT doc_id, vscore FROM vs ORDER BY vscore DESC, doc_id LIMIT 50),
         |vn AS (SELECT doc_id, coalesce((vscore - mn) / nullif(mx - mn, 0), 1.0) AS nv
         |       FROM vp CROSS JOIN (SELECT min(vscore) AS mn, max(vscore) AS mx FROM vp))
         |SELECT doc_id, round(0.75 * coalesce(nv, 0) + 0.25 * coalesce(nl, 0), 6) AS hybrid
         |FROM lexn FULL OUTER JOIN vn USING (doc_id)
         |ORDER BY hybrid DESC, doc_id LIMIT 20""".stripMargin,
    "q_sparse_knn" ->
      """WITH q AS (SELECT CAST('0x' || substring(md5(t), 1, 8) AS BIGINT) % 1024 AS b, w
        |           FROM (VALUES ('spark', 1.0), ('join', 0.5), ('vector', 0.25)) AS v(t, w)),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |buck AS (SELECT doc_id,
        |           CAST('0x' || substring(md5(token), 1, 8) AS BIGINT) % 1024 AS b
        |         FROM toks),
        |tf AS (SELECT doc_id, b, CAST(count(*) AS DOUBLE) AS tf FROM buck
        |       WHERE b IN (SELECT b FROM q) GROUP BY doc_id, b)
        |SELECT doc_id, round(sum(tf * w), 6) AS score
        |FROM tf JOIN q USING (b)
        |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, toks, unnest(range(0, len(toks), 16)) AS start FROM t)
        |SELECT doc_id, CAST(start // 16 AS BIGINT) AS chunk_id,
        |  CAST(len(toks[start + 1 : least(start + 32, len(toks))]) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(toks[start + 1 : least(start + 32, len(toks))], ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q_pii_redact" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com ref ' ||
        |  CAST((doc_id * 7919) % 100000 AS VARCHAR) AS text FROM documents),
        |r AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9._]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
        |  regexp_replace(text, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g') AS t1 FROM p)
        |SELECT doc_id, n_emails,
        |  CAST(len(regexp_extract_all(t1, '[0-9]+')) AS BIGINT) AS n_numbers,
        |  md5(regexp_replace(t1, '[0-9]+', '<NUM>', 'g')) AS redacted_hash
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_sample_stratified" ->
      """WITH b AS (SELECT label,
        |  CASE WHEN CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) % 5 = 0
        |       THEN 1 ELSE 0 END AS keep FROM embeddings)
        |SELECT label, count(*) AS n_total, CAST(sum(keep) AS BIGINT) AS n_sampled,
        |  round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS ratio
        |FROM b GROUP BY label ORDER BY label""".stripMargin,
    "q_dup_clusters" ->
      """WITH RECURSIVE all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[4:], ' ') AS text
        |  FROM documents WHERE doc_id % 11 = 0),
        |g AS (SELECT doc_id,
        |        min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keeper,
        |        count(*) OVER (PARTITION BY md5(lower(trim(text)))) AS n FROM all_docs),
        |e1 AS (SELECT keeper AS a, doc_id AS b FROM g WHERE n > 1 AND doc_id <> keeper),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM all_docs
        |      WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |          i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS gs FROM t),
        |ng AS (SELECT doc_id, unnest(gs) AS g FROM tri),
        |sz AS (SELECT doc_id, len(gs) AS n_g FROM tri),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |      FROM ng a JOIN ng b USING (g) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |e2 AS (SELECT doc_a AS a, doc_b AS b FROM p
        |       JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
        |       WHERE round(CAST(common AS DOUBLE) / (sa.n_g + sb.n_g - common), 6) >= 0.5),
        |edges AS (SELECT a, b FROM e1 UNION SELECT a, b FROM e2
        |          UNION SELECT b AS a, a AS b FROM e1
        |          UNION SELECT b AS a, a AS b FROM e2),
        |reach(n, r) AS (
        |  SELECT a AS n, a AS r FROM edges
        |  UNION
        |  SELECT reach.n, e.b AS r FROM reach JOIN edges e ON reach.r = e.a)
        |SELECT n AS doc_id, min(r) AS cluster_id FROM reach
        |GROUP BY n ORDER BY doc_id""".stripMargin,
    // q_dedup_minhash / q_dedup_simhash: hash-dependent → rows-only,
    // covered by the recall assertions in DedupSpec instead.
    "q_dedup_exact" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[4:], ' ') AS text
        |  FROM documents WHERE doc_id % 11 = 0),
        |g AS (SELECT doc_id,
        |        min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keeper_id,
        |        count(*) OVER (PARTITION BY md5(lower(trim(text)))) AS n_copies
        |      FROM all_docs)
        |SELECT doc_id, keeper_id, doc_id <> keeper_id AS is_dup
        |FROM g WHERE n_copies > 1 ORDER BY doc_id""".stripMargin,
    "q_dedup_ngram" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |          i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS gs FROM t),
        |ng AS (SELECT doc_id, unnest(gs) AS g FROM tri),
        |sz AS (SELECT doc_id, len(gs) AS n_g FROM tri),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |      FROM ng a JOIN ng b USING (g) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b, common,
        |  round(CAST(common AS DOUBLE) / (sa.n_g + sb.n_g - common), 6) AS jaccard
        |FROM p JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
        |ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50""".stripMargin,
    "q_dedup_embedding" ->
      """WITH aug AS (
        |  SELECT vec_id, embedding, label FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000000 AS vec_id, embedding, label FROM embeddings WHERE vec_id % 25 = 0)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS score
        |FROM aug a JOIN aug b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin,
    // the auto verb resolves to the exact blocked scorer at driver
    // scale (avg label block 52 << the measured LSH crossover), so
    // it carries the exact relation's oracle; the above-crossover
    // LSH branch is spec- and slope-covered (DedupSpec, bench/)
    "q_dedup_embedding_auto" ->
      """WITH aug AS (
        |  SELECT vec_id, embedding, label FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000000 AS vec_id, embedding, label FROM embeddings WHERE vec_id % 25 = 0)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS score
        |FROM aug a JOIN aug b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin,
    "q_token_count" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
        |  round(avg(len(string_split(text, ' '))), 6) AS avg_tokens,
        |  max(len(string_split(text, ' '))) AS max_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_lang_id" ->
      """WITH langs(plang, words) AS (VALUES
        |  ('en', ['the','a','fast','slow','small','big']),
        |  ('db', ['table','join','query','filter','sort','scan']),
        |  ('ml', ['vector','data','batch','stream','spark','hash'])),
        |h AS (SELECT d.doc_id, l.plang,
        |        len(list_filter(string_split(d.text, ' '),
        |            t -> list_contains(l.words, t))) AS hits
        |      FROM documents d CROSS JOIN langs l)
        |SELECT doc_id, plang AS pred_lang, hits FROM (
        |  SELECT doc_id, plang, hits,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, plang) AS rn FROM h)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q_quality_score" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT doc_id, len(toks) AS n_tok,
        |        len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS n_stop,
        |        len(list_distinct(toks)) AS n_distinct FROM t)
        |SELECT doc_id, n_tok,
        |  round(0.4 * (CAST(least(n_tok, 100) AS DOUBLE) / 100)
        |      + 0.3 * (1 - CAST(n_stop AS DOUBLE) / n_tok)
        |      + 0.3 * (CAST(n_distinct AS DOUBLE) / n_tok), 6) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ' '),
        |        t -> CAST('0x' || substring(md5(t), 1, 8) AS BIGINT))),
        |    (acc, v) -> (acc * 31 + v) % 1000000007) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_sessionize" ->
      """WITH x AS (SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT user_id, ts, value,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |                     ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM y GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "q_media_resize" ->
      """WITH g AS (SELECT doc_id,
        |    64 + octet_length(encode(text)) % 128 AS width,
        |    64 + (octet_length(encode(text)) * 7) % 128 AS height
        |  FROM documents),
        |s AS (SELECT doc_id, width, height,
        |        least(CAST(224.0 AS DOUBLE) / width,
        |              CAST(224.0 AS DOUBLE) / height) AS scale FROM g)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
        |  CAST(floor(width * scale) AS BIGINT) AS out_w,
        |  CAST(floor(height * scale) AS BIGINT) AS out_h
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_media_frames" ->
      """WITH g AS (SELECT doc_id,
        |    1 + octet_length(encode(text)) % 16 AS n_frames FROM documents)
        |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(unnest(range(0, n_frames, 4)) AS BIGINT) AS frame_idx,
        |  md5(CAST(doc_id AS VARCHAR) || '_' ||
        |      CAST(unnest(range(0, n_frames, 4)) AS VARCHAR)) AS frame_key
        |FROM g ORDER BY doc_id, frame_idx""".stripMargin,
    "q_media_near_dup" ->
      """WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |cnt AS (SELECT doc_id, ch, count(*) AS c FROM c
        |        WHERE ch BETWEEN 'a' AND 'z' GROUP BY 1, 2),
        |alpha AS (SELECT chr(CAST(96 + i AS INTEGER)) AS ch, i FROM range(1, 27) t(i)),
        |vec AS (SELECT d.doc_id, list(CAST(coalesce(cnt.c, 0) AS DOUBLE) ORDER BY a.i) AS v
        |        FROM documents d CROSS JOIN alpha a
        |        LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.ch = a.ch
        |        GROUP BY d.doc_id),
        |f AS (SELECT vec.doc_id, d.source, vec.v
        |      FROM vec JOIN documents d USING (doc_id)),
        |p AS (SELECT a.source, a.doc_id AS a, b.doc_id AS b,
        |        round(list_cosine_similarity(a.v, b.v), 6) AS score
        |      FROM f a JOIN f b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT source, a, b, score FROM p
        |ORDER BY score DESC, a, b LIMIT 20""".stripMargin,
    "q_media_near_dup_auto" ->
      """WITH aug AS (
        |  SELECT doc_id, source, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000000 AS doc_id, source,
        |    array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
        |  FROM documents WHERE doc_id % 9 = 0),
        |c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM aug),
        |cnt AS (SELECT doc_id, ch, count(*) AS c FROM c
        |        WHERE ch BETWEEN 'a' AND 'z' GROUP BY 1, 2),
        |alpha AS (SELECT chr(CAST(96 + i AS INTEGER)) AS ch, i FROM range(1, 27) t(i)),
        |vec AS (SELECT d.doc_id, list(CAST(coalesce(cnt.c, 0) AS DOUBLE) ORDER BY a.i) AS v
        |        FROM aug d CROSS JOIN alpha a
        |        LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.ch = a.ch
        |        GROUP BY d.doc_id),
        |f AS (SELECT vec.doc_id, d.source, vec.v FROM vec JOIN aug d USING (doc_id))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.source,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS score
        |FROM f a JOIN f b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.995
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_media_knn" ->
      """WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |cnt AS (SELECT doc_id, ch, count(*) AS c FROM c
        |        WHERE ch BETWEEN 'a' AND 'z' GROUP BY 1, 2),
        |alpha AS (SELECT chr(CAST(96 + i AS INTEGER)) AS ch, i FROM range(1, 27) t(i)),
        |vec AS (SELECT d.doc_id, list(CAST(coalesce(cnt.c, 0) AS DOUBLE) ORDER BY a.i) AS v
        |        FROM documents d CROSS JOIN alpha a
        |        LEFT JOIN cnt ON cnt.doc_id = d.doc_id AND cnt.ch = a.ch
        |        GROUP BY d.doc_id),
        |q AS (SELECT doc_id AS q_id, v AS qv FROM vec WHERE doc_id % 100 = 0),
        |s AS (SELECT q.q_id, vec.doc_id,
        |        round(list_cosine_similarity(q.qv, vec.v), 6) AS score
        |      FROM q CROSS JOIN vec)
        |SELECT q_id, doc_id, rn, score FROM (
        |  SELECT q_id, doc_id, score,
        |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rn
        |  FROM s)
        |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT source, count(*) AS n_items,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  round(avg(octet_length(encode(text))), 6) AS avg_bytes,
        |  count(DISTINCT md5(text)) AS n_unique
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_contamination" ->
      """WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[4:], ' ') AS text
        |  FROM documents WHERE doc_id % 11 = 0),
        |bt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |       WHERE doc_id % 7 = 0 AND len(string_split(text, ' ')) >= 5),
        |bg AS (SELECT doc_id AS bench_id, unnest(list_distinct(list_transform(range(len(toks) - 4),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]))) AS g
        |       FROM bt),
        |ct AS (SELECT doc_id, string_split(text, ' ') AS toks FROM aug
        |       WHERE doc_id % 7 <> 0 AND len(string_split(text, ' ')) >= 5),
        |cg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(toks) - 4),
        |         i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5]))) AS g
        |       FROM ct)
        |SELECT c.doc_id, count(DISTINCT c.g) AS n_shingles,
        |  count(DISTINCT b.bench_id) AS n_bench_docs
        |FROM cg c JOIN bg b USING (g)
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |per AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  list_transform(range(len(toks) - 1), i -> toks[i+1] || ' ' || toks[i+2]) AS g2,
        |  list_transform(range(len(toks) - 2), i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) AS g3
        |  FROM t),
        |pr AS (SELECT doc_id, n_tokens,
        |  round(CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2), 6) AS dup_bigram_frac,
        |  round(CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3), 6) AS dup_trigram_frac
        |  FROM per),
        |tc AS (SELECT doc_id, token, count(*) AS c
        |       FROM (SELECT doc_id, unnest(toks) AS token FROM t) GROUP BY 1, 2),
        |tt AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
        |         AS top_token_share FROM tc GROUP BY 1)
        |SELECT pr.doc_id, n_tokens, dup_bigram_frac, dup_trigram_frac, top_token_share
        |FROM pr JOIN tt ON pr.doc_id = tt.doc_id ORDER BY pr.doc_id""".stripMargin,
    "q_mix_sources" ->
      """WITH b AS (SELECT source, text,
        |  CASE WHEN CAST(substring(source, 4) AS INT) < 5 THEN 1.0
        |       WHEN CAST(substring(source, 4) AS INT) < 10 THEN 0.5 ELSE 0.25 END AS keep_frac,
        |  CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 AS kb,
        |  CAST('0x' || substring(md5('s' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 AS sb
        |  FROM documents)
        |SELECT source,
        |  CASE WHEN sb < 800 THEN 'train' WHEN sb < 900 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        |FROM b WHERE kb < keep_frac * 1000
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (SELECT source, doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |  CAST(sum(n_tokens + 1) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum
        |  FROM t)
        |SELECT source, (cum - n_tokens - 1) // 256 AS bin_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_shuffle_train" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS shuffle_key,
        |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'))
        |       AS BIGINT) AS train_pos
        |FROM documents ORDER BY train_pos""".stripMargin,
    "q_length_buckets" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |b AS (SELECT doc_id, n_tokens,
        |  CAST(power(2, ceil(log2(greatest(n_tokens, 1)))) AS BIGINT) AS band FROM t),
        |r AS (SELECT band, n_tokens,
        |  (row_number() OVER (PARTITION BY band ORDER BY doc_id) - 1) // 16 AS batch_no
        |  FROM b)
        |SELECT band, CAST(batch_no AS BIGINT) AS batch_no,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  max(n_tokens) AS pad_to,
        |  round(1.0 - CAST(sum(n_tokens) AS DOUBLE) / (max(n_tokens) * count(*)), 6)
        |    AS pad_waste
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_mixture_plan" ->
      """WITH s AS (SELECT source, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |w AS (SELECT source, n_docs, n_tokens,
        |        power(CAST(n_tokens AS DOUBLE), 0.5) AS w FROM s),
        |t AS (SELECT sum(w) AS total_w FROM w)
        |SELECT source, n_docs, n_tokens,
        |  round(w / total_w, 6) AS share,
        |  round(CAST(1000000 AS DOUBLE) * round(w / total_w, 6) / n_tokens, 6) AS epochs
        |FROM w CROSS JOIN t ORDER BY source""".stripMargin,
    "q_heaps" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |fs AS (SELECT tok, min(doc_id) AS first_id FROM toks GROUP BY 1),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |m AS (SELECT max(doc_id) AS max_id FROM documents),
        |cp AS (SELECT CAST(i AS INT) AS checkpoint,
        |              CAST(floor(max_id * i / 10) AS BIGINT) AS cutoff
        |       FROM range(1, 11) t(i) CROSS JOIN m),
        |v AS (SELECT cp.checkpoint, count(*) AS vocab
        |      FROM cp JOIN fs ON fs.first_id <= cp.cutoff GROUP BY 1),
        |tt AS (SELECT cp.checkpoint, CAST(sum(dl.n) AS BIGINT) AS n_tokens
        |       FROM cp JOIN dl ON dl.doc_id <= cp.cutoff GROUP BY 1),
        |p AS (SELECT v.checkpoint, n_tokens, vocab,
        |        ln(CAST(n_tokens AS DOUBLE)) AS x, ln(CAST(vocab AS DOUBLE)) AS y
        |      FROM v JOIN tt USING (checkpoint)),
        |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*x) AS sxx, sum(x*y) AS sxy FROM p)
        |SELECT checkpoint, n_tokens, vocab,
        |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS heaps_beta
        |FROM p CROSS JOIN a ORDER BY checkpoint""".stripMargin,
    "q_zipf" ->
      """WITH f AS (SELECT tk, count(*) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tk FROM documents)
        |  GROUP BY 1),
        |top AS (SELECT c, row_number() OVER (ORDER BY c DESC, tk) AS r
        |        FROM f ORDER BY c DESC, tk LIMIT 1000),
        |p AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM top),
        |a AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
        |             sum(x*x) AS sxx, sum(x*y) AS sxy FROM p)
        |SELECT CAST(n AS BIGINT) AS n_vocab,
        |  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS zipf_slope,
        |  round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS zipf_intercept
        |FROM a""".stripMargin,
    "q_dsir" ->
      """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tk
        |             FROM documents),
        |t AS (SELECT doc_id, lang,
        |        CAST(CAST('0x' || substring(md5(tk), 1, 8) AS BIGINT) % 4096 AS BIGINT) AS b
        |      FROM tok),
        |raw AS (SELECT b, count(*) AS c_raw FROM t GROUP BY 1),
        |tgt AS (SELECT b, count(*) AS c_tgt FROM t WHERE lang = 'en' GROUP BY 1),
        |n AS (SELECT count(*) AS n_raw,
        |             count(*) FILTER (WHERE lang = 'en') AS n_tgt FROM t),
        |r AS (SELECT raw.b,
        |        ln((coalesce(c_tgt, 0) + 1.0) / (n_tgt + 4096.0))
        |        - ln((c_raw + 1.0) / (n_raw + 4096.0)) AS lr
        |      FROM raw LEFT JOIN tgt USING (b) CROSS JOIN n)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       round(avg(lr), 6) AS dsir_logw
        |FROM t JOIN r USING (b) GROUP BY 1
        |ORDER BY dsir_logw DESC, doc_id LIMIT 100""".stripMargin,
    "q_temperature_sample" ->
      """WITH s AS (SELECT source,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |m AS (SELECT min(n_tokens) AS min_tokens FROM s),
        |f AS (SELECT source,
        |        round(power(CAST(min_tokens AS DOUBLE) / n_tokens, 0.5), 6) AS keep_frac
        |      FROM s CROSS JOIN m)
        |SELECT d.doc_id, d.source, f.keep_frac
        |FROM documents d JOIN f USING (source)
        |WHERE CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000
        |      < f.keep_frac * 1000000
        |ORDER BY d.doc_id""".stripMargin,
    "q_perplexity_buckets" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |v AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM v),
        |nll AS (SELECT doc_id, round(avg(-ln(CAST(c AS DOUBLE) / total)), 6) AS nll
        |        FROM tk JOIN v USING (tok) CROSS JOIN tot GROUP BY doc_id),
        |cuts AS (SELECT quantile_cont(nll, CAST(1 AS DOUBLE) / 3) AS c1,
        |                quantile_cont(nll, CAST(2 AS DOUBLE) / 3) AS c2 FROM nll)
        |SELECT CASE WHEN nll <= c1 THEN 'head' WHEN nll <= c2 THEN 'middle'
        |       ELSE 'tail' END AS bucket,
        |  count(*) AS n_docs, round(min(nll), 6) AS min_nll,
        |  round(max(nll), 6) AS max_nll, round(avg(nll), 6) AS avg_nll
        |FROM nll CROSS JOIN cuts GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dedup_substring" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[4:], ' ') AS text
        |  FROM documents WHERE doc_id % 11 = 0),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM all_docs),
        |w AS (SELECT doc_id, md5(array_to_string(toks[i:i+19], ' ')) AS wh
        |      FROM t, UNNEST(range(1, greatest(len(toks) - 18, 1))) AS g(i)),
        |dup AS (SELECT wh FROM w GROUP BY wh HAVING count(DISTINCT doc_id) > 1),
        |c AS (SELECT w.doc_id, count(*) AS n_windows,
        |        CAST(sum(CASE WHEN dup.wh IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |          AS n_dup_windows
        |      FROM w LEFT JOIN dup ON w.wh = dup.wh GROUP BY w.doc_id)
        |SELECT doc_id, n_windows, n_dup_windows,
        |  round(CAST(n_dup_windows AS DOUBLE) / n_windows, 6) AS dup_frac
        |FROM c WHERE n_dup_windows > 0 ORDER BY doc_id""".stripMargin,
    "q_dedup_prefix" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[4:], ' ') AS text
        |  FROM documents WHERE doc_id % 11 = 0),
        |p AS (SELECT doc_id,
        |        md5(array_to_string(string_split(text, ' ')[1:16], ' ')) AS ph
        |      FROM all_docs)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_docs,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
        |FROM p GROUP BY ph HAVING count(*) >= 2 ORDER BY keep_id""".stripMargin,
    "q_rank_eval" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb, label AS q_label
        |           FROM embeddings WHERE vec_id % 100 = 0),
        |s AS (SELECT q.q_id, q.q_label, e.vec_id, e.label,
        |        round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
        |      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
        |t AS (SELECT q_id, q_label, label,
        |        row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
        |      FROM s),
        |top AS (SELECT q_id, q_label, rn,
        |          CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel
        |        FROM t WHERE rn <= 10),
        |perq AS (SELECT q_id, q_label,
        |    CAST(sum(rel) AS BIGINT) AS n_rel,
        |    round(CAST(sum(rel) AS DOUBLE) / 10, 6) AS p_at_k,
        |    round(coalesce(max(CASE WHEN rel = 1 THEN CAST(1 AS DOUBLE) / rn END), 0.0), 6)
        |      AS mrr,
        |    sum(CASE WHEN rel = 1 THEN CAST(1 AS DOUBLE) / log2(rn + 1) ELSE 0 END) AS dcg
        |  FROM top GROUP BY 1, 2),
        |lc AS (SELECT label, count(*) AS n_label FROM embeddings GROUP BY 1),
        |r AS (SELECT perq.*, least(n_label - 1, 10) AS r_total
        |      FROM perq JOIN lc ON perq.q_label = lc.label),
        |i AS (SELECT q_id, sum(CAST(1 AS DOUBLE) / log2(i + 1)) AS idcg
        |      FROM (SELECT q_id, unnest(generate_series(1, CAST(r_total AS BIGINT))) AS i
        |            FROM r)
        |      GROUP BY 1)
        |SELECT r.q_id, n_rel, p_at_k, mrr,
        |  CASE WHEN r_total >= 1 THEN round(dcg / idcg, 6) ELSE 0.0 END AS ndcg
        |FROM r LEFT JOIN i USING (q_id) ORDER BY r.q_id""".stripMargin,
    "q_more_like_this" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |seed_tf AS (SELECT doc_id AS seed_id, token, count(*) AS tf FROM toks
        |            WHERE doc_id IN (7, 21) GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
        |       WHERE token IN (SELECT token FROM seed_tf) GROUP BY 1),
        |st AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (SELECT s.seed_id, s.token, ln(CAST(st.n_docs AS DOUBLE) / df.df) AS idf,
        |    round(s.tf * ln(CAST(st.n_docs AS DOUBLE) / df.df), 6) AS tscore
        |  FROM seed_tf s JOIN df USING (token) CROSS JOIN st),
        |sel AS (SELECT token, idf,
        |    row_number() OVER (PARTITION BY seed_id ORDER BY tscore DESC, token) AS trn
        |  FROM scored),
        |terms AS (SELECT DISTINCT token, idf FROM sel WHERE trn <= 10)
        |SELECT t.doc_id, round(sum(m.idf), 6) AS score, count(DISTINCT t.token) AS n_terms
        |FROM toks t JOIN terms m USING (token)
        |WHERE t.doc_id NOT IN (7, 21)
        |GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q_significant_terms" ->
      """WITH toks AS (SELECT doc_id, source,
        |    unnest(list_distinct(string_split(text, ' '))) AS token FROM documents),
        |fg AS (SELECT token, count(*) AS df_fg FROM toks WHERE source = 'src7'
        |       GROUP BY 1 HAVING count(*) >= 3),
        |bg AS (SELECT token, count(*) AS df_bg FROM toks
        |       WHERE token IN (SELECT token FROM fg) GROUP BY 1),
        |n AS (SELECT count(*) AS n_bg, count(CASE WHEN source = 'src7' THEN 1 END) AS n_fg
        |      FROM documents)
        |SELECT f.token, f.df_fg, b.df_bg,
        |  round((CAST(f.df_fg AS DOUBLE) / n.n_fg) /
        |        ((CAST(b.df_bg AS DOUBLE) + 1) / n.n_bg), 6) AS score
        |FROM fg f JOIN bg b USING (token) CROSS JOIN n
        |ORDER BY score DESC, token LIMIT 20""".stripMargin,
    "q_significant_text" ->
      s"""WITH bm AS ($oracleBm25),
         |samp AS (SELECT doc_id FROM bm ORDER BY bm25 DESC, doc_id LIMIT 100),
         |toks AS (SELECT doc_id,
         |    unnest(list_distinct(string_split(text, ' '))) AS token FROM documents),
         |fg AS (SELECT token, count(*) AS df_fg FROM toks
         |       WHERE doc_id IN (SELECT doc_id FROM samp)
         |       GROUP BY 1 HAVING count(*) >= 3),
         |bg AS (SELECT token, count(*) AS df_bg FROM toks
         |       WHERE token IN (SELECT token FROM fg) GROUP BY 1),
         |n AS (SELECT (SELECT count(*) FROM documents) AS n_bg,
         |             (SELECT count(*) FROM samp) AS n_fg)
         |SELECT f.token, f.df_fg, b.df_bg,
         |  round((CAST(f.df_fg AS DOUBLE) / n.n_fg) /
         |        ((CAST(b.df_bg AS DOUBLE) + 1) / n.n_bg), 6) AS score
         |FROM fg f JOIN bg b USING (token) CROSS JOIN n
         |ORDER BY score DESC, token LIMIT 20""".stripMargin,
    "q_media_dedup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[4:], ' ') AS text
        |  FROM documents WHERE doc_id % 11 = 0)
        |SELECT md5(text) AS digest, min(doc_id) AS keeper_id,
        |  count(*) AS n_copies,
        |  CAST(sum(strlen(text)) - max(strlen(text)) AS BIGINT) AS wasted_bytes
        |FROM all_docs
        |GROUP BY 1 HAVING count(*) > 1 ORDER BY keeper_id""".stripMargin,
    "q_highlight" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |p AS (SELECT doc_id, toks,
        |        CAST(COALESCE(list_position(toks, 'vector'), 0) AS BIGINT) AS pos FROM t)
        |SELECT doc_id, pos,
        |  array_to_string(toks[CAST(greatest(1, pos - 3) AS INT) :
        |                       CAST(greatest(1, pos - 3) + 6 AS INT)], ' ') AS snippet
        |FROM p WHERE pos > 0 ORDER BY doc_id""".stripMargin,
    "q_search_after" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE n_chars < 300 OR (n_chars = 300 AND doc_id > 250)
        |ORDER BY n_chars DESC, doc_id LIMIT 50""".stripMargin,
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS flag,
        |  COALESCE(l_linestatus, 'ALL') AS status,
        |  count(*) AS n, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_date_histogram" ->
      """SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_rate" ->
      """WITH m AS (SELECT date_trunc('month', ts) AS month, count(*) AS n,
        |             round(sum(value), 2) AS sv
        |           FROM events GROUP BY 1)
        |SELECT month,
        |  round(CAST(n AS DOUBLE) / day(last_day(CAST(month AS DATE))), 6) AS doc_rate,
        |  round(sv / day(last_day(CAST(month AS DATE))), 6) AS value_rate
        |FROM m ORDER BY month""".stripMargin,
    "q_percentile_ranks" ->
      """SELECT event_type,
        |  round(100.0 * sum(CASE WHEN value <= 10.0 THEN 1 ELSE 0 END) / count(*), 6) AS r10,
        |  round(100.0 * sum(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END) / count(*), 6) AS r50,
        |  round(100.0 * sum(CASE WHEN value <= 200.0 THEN 1 ELSE 0 END) / count(*), 6) AS r200
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_boxplot" ->
      """SELECT l_returnflag,
        |  round(min(l_quantity), 6) AS min_q,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS q1,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS median,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS q3,
        |  round(quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25), 6) AS iqr,
        |  round(max(l_quantity), 6) AS max_q
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_auto_date_histogram" ->
      """WITH b AS (SELECT date_diff('day', min(o_orderdate), max(o_orderdate)) + 1 AS span
        |           FROM orders),
        |u AS (SELECT CASE WHEN ceil(span / 1.0) <= 40 THEN 'day'
        |                  WHEN ceil(span / 7.0) <= 40 THEN 'week'
        |                  WHEN ceil(span / 30.0) <= 40 THEN 'month'
        |                  WHEN ceil(span / 91.0) <= 40 THEN 'quarter'
        |                  ELSE 'year' END AS unit FROM b)
        |SELECT unit,
        |  CASE unit WHEN 'day' THEN date_trunc('day', o_orderdate)
        |            WHEN 'week' THEN date_trunc('week', o_orderdate)
        |            WHEN 'month' THEN date_trunc('month', o_orderdate)
        |            WHEN 'quarter' THEN date_trunc('quarter', o_orderdate)
        |            ELSE date_trunc('year', o_orderdate) END AS bucket,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders CROSS JOIN u
        |GROUP BY 1, 2 ORDER BY bucket""".stripMargin,
    "q_bucket_selector" ->
      """WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_orders,
        |    sum(o_totalprice) AS rev FROM orders GROUP BY 1),
        |a AS (SELECT avg(rev) AS avg_rev FROM d)
        |SELECT day, n_orders, round(rev, 2) AS revenue, round(rev / avg_rev, 6) AS lift
        |FROM d CROSS JOIN a
        |WHERE rev > 1.1 * avg_rev
        |ORDER BY revenue DESC, day LIMIT 10""".stripMargin,
    "q_dist_matrix" ->
      """WITH s AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
        |           WHERE vec_id % 40 = 0),
        |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |        round(list_cosine_similarity(a.emb, b.emb), 6) AS score
        |      FROM s a CROSS JOIN s b WHERE a.vec_id <> b.vec_id),
        |r AS (SELECT *, CAST(row_number() OVER (
        |        PARTITION BY vec_a ORDER BY score DESC, vec_b) AS BIGINT) AS rn FROM p)
        |SELECT vec_a, vec_b, rn, score FROM r WHERE rn <= 5 ORDER BY vec_a, rn""".stripMargin,
    "q_centroid_anomaly" ->
      """WITH dims AS (SELECT label, CAST(r.range AS INT) AS i,
        |    CAST(embedding[CAST(r.range AS INT)] AS DOUBLE) AS x
        |  FROM embeddings CROSS JOIN range(1, 65) r),
        |cent AS (SELECT label, i, round(avg(x), 6) AS c FROM dims GROUP BY 1, 2),
        |carr AS (SELECT label, list(c ORDER BY i) AS centroid FROM cent GROUP BY 1),
        |d AS (SELECT e.label, e.vec_id,
        |    round(list_distance(e.embedding::DOUBLE[], c.centroid), 6) AS dist
        |  FROM embeddings e JOIN carr c USING (label)),
        |r2 AS (SELECT *, CAST(row_number() OVER (
        |    PARTITION BY label ORDER BY dist DESC, vec_id) AS BIGINT) AS rn FROM d)
        |SELECT label, vec_id, rn, dist FROM r2 WHERE rn <= 3 ORDER BY label, rn""".stripMargin,
    "q_geo_search" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |g AS (SELECT user_id,
        |  CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
        |  CAST(CAST('0x' || substring(md5('x' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
        |  FROM u),
        |d AS (SELECT user_id, lat, lon,
        |  round(2.0 * 6371.0 * asin(sqrt(pow(sin(radians(lat - 10.0) / 2), 2)
        |    + cos(radians(10.0)) * cos(radians(lat)) * pow(sin(radians(lon - 20.0) / 2), 2))), 6)
        |    AS dist_km
        |  FROM g)
        |SELECT user_id, lat, lon, dist_km FROM d
        |WHERE dist_km <= 3000 ORDER BY dist_km, user_id LIMIT 50""".stripMargin,
    "q_geo_polygon" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |g AS (SELECT user_id,
         |  CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
         |       % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
         |  CAST(CAST('0x' || substring(md5('x' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
         |       % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
         |  FROM u),
         |c AS (SELECT user_id, lat, lon,
         |  ${operators.Geo.polygonCrossingsSql(operators.Geo.PolyVerts)} AS crossings
         |  FROM g)
         |SELECT user_id, lat, lon FROM c WHERE crossings % 2 = 1
         |ORDER BY user_id LIMIT 200""".stripMargin,
    // the at-rest geo layout must serve the IDENTICAL answer —
    // same oracle as the in-memory polygon scan
    "q_geo_polygon_indexed" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |g AS (SELECT user_id,
         |  CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
         |       % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
         |  CAST(CAST('0x' || substring(md5('x' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
         |       % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
         |  FROM u),
         |c AS (SELECT user_id, lat, lon,
         |  ${operators.Geo.polygonCrossingsSql(operators.Geo.PolyVerts)} AS crossings
         |  FROM g)
         |SELECT user_id, lat, lon FROM c WHERE crossings % 2 = 1
         |ORDER BY user_id LIMIT 200""".stripMargin,
    // geo_shape intersection: the Spark side runs the GENERIC
    // three-leg polygon-intersection expression over the stored
    // diamond vertices; the oracle answers through the Minkowski
    // reduction — a constant-extent symmetric diamond D intersects
    // the convex query polygon P iff its CENTER lies in P ⊕ D — so
    // two independent formulations of one region must agree row for
    // row (the dilated polygon's vertices are driver doubles shared
    // with nothing: any drift in the generic machinery breaks the
    // hash)
    "q_geo_shape" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |g AS (SELECT user_id,
         |  CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
         |       % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
         |  CAST(CAST('0x' || substring(md5('x' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
         |       % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
         |  FROM u),
         |c AS (SELECT user_id, lat, lon,
         |  ${operators.Geo.polygonCrossingsSql(operators.Geo.shapeOracleVerts)} AS crossings
         |  FROM g)
         |SELECT user_id, lat, lon FROM c WHERE crossings % 2 = 1
         |ORDER BY user_id LIMIT 300""".stripMargin,
    "q_analyze" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents WHERE doc_id = 42),
        |p AS (SELECT toks, CAST(unnest(range(len(toks))) AS BIGINT) AS pos0 FROM t)
        |SELECT pos0 + 1 AS pos, toks[CAST(pos0 + 1 AS INT)] AS token,
        |  CAST(length(toks[CAST(pos0 + 1 AS INT)]) AS BIGINT) AS token_len
        |FROM p ORDER BY pos""".stripMargin,
    "q_extended_stats" ->
      """WITH s AS (SELECT event_type, count(*) AS n,
        |    round(min(value), 6) AS min_v, round(max(value), 6) AS max_v,
        |    sum(value) AS s1, sum(value * value) AS s2
        |  FROM events GROUP BY 1),
        |m AS (SELECT event_type, n, min_v, max_v,
        |    round(s1, 2) AS sum_v,
        |    round(s1 / n, 6) AS avg_v,
        |    round(s2 / n - (s1 / n) * (s1 / n), 6) AS var_v,
        |    round(sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS std_v
        |  FROM s)
        |SELECT event_type, n, min_v, max_v, sum_v, avg_v, var_v, std_v,
        |  round(avg_v + 2 * std_v, 6) AS upper_2sd,
        |  round(avg_v - 2 * std_v, 6) AS lower_2sd
        |FROM m ORDER BY event_type""".stripMargin,
    "q_adjacency_matrix" ->
      """SELECT 'a' AS key, CAST(count(*) FILTER (WHERE event_type IN ('click','view'))
        |    AS BIGINT) AS doc_count FROM events
        |UNION ALL SELECT 'a&b', CAST(count(*) FILTER (
        |  WHERE event_type IN ('click','view') AND value >= 100) AS BIGINT) FROM events
        |UNION ALL SELECT 'a&c', CAST(count(*) FILTER (
        |  WHERE event_type IN ('click','view') AND user_id % 2 = 0) AS BIGINT) FROM events
        |UNION ALL SELECT 'b', CAST(count(*) FILTER (WHERE value >= 100) AS BIGINT) FROM events
        |UNION ALL SELECT 'b&c', CAST(count(*) FILTER (
        |  WHERE value >= 100 AND user_id % 2 = 0) AS BIGINT) FROM events
        |UNION ALL SELECT 'c', CAST(count(*) FILTER (WHERE user_id % 2 = 0) AS BIGINT) FROM events
        |ORDER BY key""".stripMargin,
    "q_moving_agg" ->
      """WITH d AS (SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n_orders,
        |    round(sum(o_totalprice), 2) AS revenue FROM orders GROUP BY 1)
        |SELECT day, n_orders, revenue,
        |  round(avg(revenue) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
        |    AS ma7,
        |  round(revenue - coalesce(lag(revenue) OVER (ORDER BY day), revenue), 2) AS delta,
        |  round(sum(revenue) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS cum_rev
        |FROM d ORDER BY day""".stripMargin,
    "q_rare_terms" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |           WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |          i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS gs FROM t),
        |ng AS (SELECT doc_id, unnest(gs) AS g FROM tri),
        |f AS (SELECT g, count(*) AS df FROM ng GROUP BY g)
        |SELECT g, df FROM f WHERE df <= 2 ORDER BY df, g LIMIT 50""".stripMargin,
    "q_perplexity" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |v AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM v)
        |SELECT doc_id, count(*) AS n_tok,
        |  round(avg(-ln(CAST(c AS DOUBLE) / total)), 6) AS nll
        |FROM tk JOIN v USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_cooccur_pmi" ->
      """WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |           FROM documents),
        |t AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
        |f AS (SELECT tok, count(*) AS df FROM t GROUP BY tok),
        |p AS (SELECT a.tok AS t1, b.tok AS t2, count(*) AS c_ab
        |      FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |      GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT t1, t2, c_ab,
        |  round(ln((CAST(n_docs AS DOUBLE) * c_ab) / (CAST(fa.df AS DOUBLE) * fb.df)), 6) AS pmi
        |FROM p JOIN f fa ON t1 = fa.tok JOIN f fb ON t2 = fb.tok CROSS JOIN n
        |ORDER BY pmi DESC, t1, t2 LIMIT 20""".stripMargin,
    "q_frequent_item_sets" ->
      """WITH d AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |           FROM documents),
        |t AS (SELECT doc_id, unnest(toks) AS tok FROM d),
        |n AS (SELECT count(*) AS n_docs FROM d),
        |f1 AS (SELECT tok FROM t GROUP BY tok
        |       HAVING count(*) >= 0.2 * (SELECT n_docs FROM n)),
        |ft AS (SELECT doc_id, tok FROM t WHERE tok IN (SELECT tok FROM f1)),
        |p AS (SELECT a.tok AS t1, b.tok AS t2, count(*) AS support
        |      FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |      GROUP BY 1, 2)
        |SELECT t1, t2, support FROM p
        |WHERE support >= 0.2 * (SELECT n_docs FROM n)
        |ORDER BY support DESC, t1, t2 LIMIT 20""".stripMargin,
    "q_percolate" ->
      """WITH q AS (SELECT * FROM (VALUES
        |    (CAST(1 AS BIGINT), ['spark','join','scan'], 2),
        |    (CAST(2 AS BIGINT), ['vector','hash'], 2),
        |    (CAST(3 AS BIGINT), ['the','fast','slow','big'], 3))
        |  AS v(pq_id, q_terms, min_match)),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (SELECT pq_id, doc_id,
        |    CAST(len(list_filter(q_terms, qt -> list_contains(toks, qt))) AS BIGINT)
        |      AS n_matched, min_match
        |  FROM t CROSS JOIN q)
        |SELECT pq_id, doc_id, n_matched FROM m
        |WHERE n_matched >= min_match ORDER BY pq_id, doc_id""".stripMargin,
    "q_collapse" ->
      s"""WITH bm AS ($oracleBm25)
         |SELECT lang, doc_id, bm25, n_hits FROM (
         |  SELECT d.lang, bm.doc_id, bm.bm25,
         |    count(*) OVER (PARTITION BY d.lang) AS n_hits,
         |    row_number() OVER (PARTITION BY d.lang ORDER BY bm.bm25 DESC, bm.doc_id) AS rn
         |  FROM bm JOIN documents d USING (doc_id))
         |WHERE rn = 1 ORDER BY bm25 DESC, lang LIMIT 5""".stripMargin,
    "q_phrase_prefix" ->
      """SELECT doc_id, n_occurrences FROM (
        |  SELECT doc_id, CAST(len(list_filter(range(1, len(toks)),
        |      i -> toks[i] = 'the' AND starts_with(toks[i + 1], 'qu'))) AS BIGINT)
        |    AS n_occurrences
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
        |WHERE n_occurrences > 0 ORDER BY doc_id""".stripMargin,
    "q_intervals" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |p AS (SELECT doc_id,
        |    list_filter(list_transform(range(len(toks)),
        |      i -> CASE WHEN toks[i+1] = 'spark' THEN i END), x -> x IS NOT NULL) AS pa,
        |    list_filter(list_transform(range(len(toks)),
        |      i -> CASE WHEN toks[i+1] = 'join' THEN i END), x -> x IS NOT NULL) AS pb
        |  FROM t),
        |g AS (SELECT doc_id,
        |    list_filter(flatten(list_transform(pa, a -> list_transform(pb, b -> b - a - 1))),
        |      x -> x >= 0 AND x <= 2) AS gaps
        |  FROM p WHERE len(pa) > 0 AND len(pb) > 0)
        |SELECT doc_id, CAST(len(gaps) AS BIGINT) AS n_intervals,
        |  CAST(list_min(gaps) AS BIGINT) AS min_gap
        |FROM g WHERE len(gaps) > 0 ORDER BY doc_id""".stripMargin,
    "q_synonym_match" ->
      """WITH syn(canon, token) AS (VALUES
        |    ('rapid', 'rapid'), ('rapid', 'fast'), ('rapid', 'quick'),
        |    ('combine', 'combine'), ('combine', 'merge'), ('combine', 'join')),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |SELECT doc_id, count(*) AS score, count(DISTINCT canon) AS n_terms
        |FROM toks JOIN syn USING (token)
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q_span_near" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |p AS (SELECT doc_id,
        |    list_filter(list_transform(range(len(toks)),
        |      i -> CASE WHEN toks[i+1] = 'spark' THEN i END), x -> x IS NOT NULL) AS pa,
        |    list_filter(list_transform(range(len(toks)),
        |      i -> CASE WHEN toks[i+1] = 'join' THEN i END), x -> x IS NOT NULL) AS pb
        |  FROM t),
        |d AS (SELECT doc_id,
        |    flatten(list_transform(pa, a -> list_transform(pb, b -> abs(a - b)))) AS ds
        |  FROM p WHERE len(pa) > 0 AND len(pb) > 0)
        |SELECT doc_id, CAST(list_min(ds) AS BIGINT) AS min_dist,
        |  CAST(len(list_filter(ds, x -> x <= 3)) AS BIGINT) AS n_near
        |FROM d WHERE list_min(ds) <= 3 ORDER BY doc_id""".stripMargin,
    "q_multi_match" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM t),
        |pos AS (SELECT doc_id,
        |    CASE WHEN i < 5 THEN 'title' ELSE 'body' END AS field, toks[i+1] AS token
        |  FROM (SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM t)
        |  WHERE toks[i+1] IN ('spark','join','vector')),
        |tf AS (SELECT doc_id, field, token, count(*) AS tf FROM pos GROUP BY 1, 2, 3),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM pos GROUP BY 1)
        |SELECT doc_id,
        |  round(sum(CAST(CASE WHEN field = 'title' THEN 2 ELSE 1 END AS DOUBLE)
        |    * tf * ln(CAST(n_docs AS DOUBLE) / df)), 6) AS score
        |FROM tf JOIN df USING (token) CROSS JOIN n
        |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q_dis_max" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM t),
        |pos AS (SELECT doc_id,
        |    CASE WHEN i < 5 THEN 'title' ELSE 'body' END AS field, toks[i+1] AS token
        |  FROM (SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM t)
        |  WHERE toks[i+1] IN ('spark','join','vector')),
        |tf AS (SELECT doc_id, field, token, count(*) AS tf FROM pos GROUP BY 1, 2, 3),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM pos GROUP BY 1),
        |fs AS (SELECT doc_id,
        |    sum(CASE WHEN field = 'title'
        |        THEN tf * ln(CAST(n_docs AS DOUBLE) / df) ELSE CAST(0 AS DOUBLE) END) AS ts,
        |    sum(CASE WHEN field = 'body'
        |        THEN tf * ln(CAST(n_docs AS DOUBLE) / df) ELSE CAST(0 AS DOUBLE) END) AS bs
        |  FROM tf JOIN df USING (token) CROSS JOIN n GROUP BY doc_id)
        |SELECT doc_id,
        |  round(greatest(ts, bs) + CAST(0.3 AS DOUBLE) * least(ts, bs), 6) AS score
        |FROM fs ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q_composite_agg" ->
      """WITH b AS (SELECT date_trunc('day', ts) AS day, event_type,
        |    count(*) AS n_events, round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY 1, 2)
        |SELECT day, event_type, n_events, sum_value FROM b
        |WHERE day > TIMESTAMP '2024-01-10'
        |   OR (day = TIMESTAMP '2024-01-10' AND event_type > 'error')
        |ORDER BY day, event_type LIMIT 20""".stripMargin,
    "q_update_by_query" ->
      """SELECT source, CASE WHEN n_chars < 150 THEN 'low' ELSE 'std' END AS tier,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2 ORDER BY source, tier""".stripMargin,
    "q_scroll_slice" ->
      """SELECT vec_id, label FROM embeddings
        |WHERE CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8) AS BIGINT) % 4 = 1
        |ORDER BY vec_id LIMIT 100""".stripMargin,
    "q_geohash_grid" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |g AS (SELECT
         |  CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
         |       % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
         |  CAST(CAST('0x' || substring(md5('x' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
         |       % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
         |  FROM u),
         |i AS (SELECT lat, lon,
         |  CAST(least(floor((lon + 180.0) / 360.0 * 256.0), 255.0) AS BIGINT) AS lon_i,
         |  CAST(least(floor((lat + 90.0) / 180.0 * 128.0), 127.0) AS BIGINT) AS lat_i
         |  FROM g),
         |b AS (SELECT lat, lon, $geohashBitsSql AS gh_i FROM i),
         |h AS (SELECT lat, lon,
         |  substring('${Geo.GeohashAlphabet}', CAST((gh_i >> 10) & 31 AS INT) + 1, 1) ||
         |  substring('${Geo.GeohashAlphabet}', CAST((gh_i >> 5) & 31 AS INT) + 1, 1) ||
         |  substring('${Geo.GeohashAlphabet}', CAST(gh_i & 31 AS INT) + 1, 1) AS geohash
         |  FROM b)
         |SELECT geohash, count(*) AS n_points,
         |  round(avg(lat), 6) AS centroid_lat, round(avg(lon), 6) AS centroid_lon
         |FROM h GROUP BY 1
         |ORDER BY n_points DESC, geohash LIMIT 20""".stripMargin,
    "q_geo_grid" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |g AS (SELECT user_id,
        |  CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
        |  CAST(CAST('0x' || substring(md5('x' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
        |  FROM u)
        |SELECT CAST(floor(lat / 10.0) * 10 AS BIGINT) AS cell_lat,
        |  CAST(floor(lon / 10.0) * 10 AS BIGINT) AS cell_lon,
        |  count(*) AS n_points,
        |  round(avg(lat), 6) AS centroid_lat, round(avg(lon), 6) AS centroid_lon
        |FROM g GROUP BY 1, 2
        |ORDER BY n_points DESC, cell_lat, cell_lon LIMIT 20""".stripMargin,
    "q_terms_by_metric" ->
      """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY user_id
        |ORDER BY sum_value DESC, user_id LIMIT 20""".stripMargin,
    "q_media_audio" ->
      """WITH m AS (SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
        |a AS (SELECT doc_id,
        |    8000 + (n_bytes % 3) * 4000 AS sample_rate,
        |    1000 + (n_bytes * 13) % 9000 AS duration_ms FROM m)
        |SELECT doc_id, CAST(sample_rate AS BIGINT) AS sample_rate,
        |  CAST(duration_ms AS BIGINT) AS duration_ms,
        |  CAST(unnest(range((duration_ms - 1000) // 500 + 1)) AS BIGINT) AS win_id,
        |  CAST(unnest(range((duration_ms - 1000) // 500 + 1)) * 500 AS BIGINT) AS start_ms,
        |  CAST(unnest(range((duration_ms - 1000) // 500 + 1)) * 500 + 1000 AS BIGINT) AS end_ms,
        |  CAST(unnest(range((duration_ms - 1000) // 500 + 1)) * 500 * sample_rate // 1000
        |    AS BIGINT) AS start_sample
        |FROM a ORDER BY doc_id, win_id""".stripMargin,
    "q_rescore" ->
      s"""WITH bm AS ($oracleBm25),
         |pool AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50),
         |qv AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0),
         |vs AS (SELECT vec_id AS doc_id,
         |         round(list_cosine_similarity(q_emb, embedding::DOUBLE[]), 6) AS vscore
         |       FROM embeddings CROSS JOIN qv)
         |SELECT doc_id,
         |  round(CAST(0.3 AS DOUBLE) * bm25 + CAST(0.7 AS DOUBLE) * vscore, 7) AS rescore
         |FROM pool JOIN vs USING (doc_id)
         |ORDER BY rescore DESC, doc_id LIMIT 20""".stripMargin,
    "q_pinned" ->
      s"""WITH bm AS ($oracleBm25),
         |org AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) + 2 AS BIGINT) AS rank
         |  FROM bm WHERE doc_id NOT IN (42, 7)
         |  ORDER BY bm25 DESC, doc_id LIMIT 18)
         |SELECT doc_id, rank, pinned FROM (
         |  SELECT CAST(42 AS BIGINT) AS doc_id, CAST(1 AS BIGINT) AS rank, TRUE AS pinned
         |  UNION ALL SELECT 7, 2, TRUE
         |  UNION ALL SELECT doc_id, rank, FALSE FROM org)
         |ORDER BY rank""".stripMargin,
    "q_matrix_stats" ->
      """WITH s AS (SELECT count(*) AS n,
        |    sum(l_quantity) AS sq, sum(l_extendedprice) AS se, sum(l_discount) AS sd,
        |    sum(l_quantity * l_quantity) AS sqq,
        |    sum(l_extendedprice * l_extendedprice) AS see,
        |    sum(l_discount * l_discount) AS sdd,
        |    sum(l_quantity * l_extendedprice) AS sqe,
        |    sum(l_quantity * l_discount) AS sqd,
        |    sum(l_extendedprice * l_discount) AS sed
        |  FROM lineitem),
        |m AS (SELECT
        |    round(sqe / n - (sq / n) * (se / n), 6) AS cov_qe,
        |    round((sqe / n - (sq / n) * (se / n)) /
        |      sqrt((sqq / n - (sq / n) * (sq / n)) * (see / n - (se / n) * (se / n))), 6)
        |      AS corr_qe,
        |    round(sqd / n - (sq / n) * (sd / n), 6) AS cov_qd,
        |    round((sqd / n - (sq / n) * (sd / n)) /
        |      sqrt((sqq / n - (sq / n) * (sq / n)) * (sdd / n - (sd / n) * (sd / n))), 6)
        |      AS corr_qd,
        |    round(sed / n - (se / n) * (sd / n), 6) AS cov_ed,
        |    round((sed / n - (se / n) * (sd / n)) /
        |      sqrt((see / n - (se / n) * (se / n)) * (sdd / n - (sd / n) * (sd / n))), 6)
        |      AS corr_ed
        |  FROM s)
        |SELECT 'price_discount' AS pair, cov_ed AS covar, corr_ed AS corr FROM m
        |UNION ALL SELECT 'quantity_discount', cov_qd, corr_qd FROM m
        |UNION ALL SELECT 'quantity_price', cov_qe, corr_qe FROM m
        |ORDER BY pair""".stripMargin,
    "q_t_test" ->
      """WITH m AS (SELECT
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n1,
        |    sum(value) FILTER (WHERE event_type = 'click') AS s1,
        |    sum(value * value) FILTER (WHERE event_type = 'click') AS q1,
        |    CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n2,
        |    sum(value) FILTER (WHERE event_type = 'view') AS s2,
        |    sum(value * value) FILTER (WHERE event_type = 'view') AS q2
        |  FROM events)
        |SELECT n1, n2,
        |  round(s1 / n1, 6) AS mean_click,
        |  round(s2 / n2, 6) AS mean_view,
        |  round((s1 / n1 - s2 / n2) /
        |    sqrt(((q1 - (s1 / n1) * (s1 / n1) * n1) / (n1 - 1)) / n1
        |       + ((q2 - (s2 / n2) * (s2 / n2) * n2) / (n2 - 1)) / n2), 6) AS t_stat
        |FROM m""".stripMargin,
    "q_mad" ->
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |             FROM events GROUP BY 1)
        |SELECT e.event_type, round(min(med), 6) AS median,
        |  round(quantile_cont(abs(e.value - med), 0.5), 6) AS mad
        |FROM events e JOIN med USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q_weighted_avg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_w,
        |  round(sum(value * CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    / sum(CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DOUBLE)), 6)
        |    AS weighted_avg
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_string_stats" ->
      """WITH tc AS (SELECT lang, tok, count(*) AS c
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2),
        |wt AS (SELECT lang, c, sum(c) OVER (PARTITION BY lang) AS tot FROM tc)
        |SELECT lang, CAST(min(tot) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
        |  round(-sum((CAST(c AS DOUBLE) / tot) * ln(CAST(c AS DOUBLE) / tot)), 6)
        |    AS entropy
        |FROM wt GROUP BY lang ORDER BY lang""".stripMargin,
    "q_top_metrics" ->
      """SELECT event_type, event_id, ts AS latest_ts,
        |  round(value, 6) AS latest_value
        |FROM (SELECT *, row_number() OVER (
        |    PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q_diversified_sample" ->
      """WITH r AS (SELECT event_type, value, row_number() OVER (
        |    PARTITION BY user_id
        |    ORDER BY CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 1000000, event_id) AS rn
        |  FROM events)
        |SELECT event_type, count(*) AS n_sampled,
        |  round(avg(value), 6) AS avg_value
        |FROM r WHERE rn <= 3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_range_agg" ->
      """SELECT CASE WHEN n_chars < 200 THEN 'short'
        |            WHEN n_chars < 350 THEN 'medium'
        |            WHEN n_chars < 500 THEN 'long'
        |            ELSE 'xlong' END AS bucket,
        |  count(*) AS n_docs,
        |  round(avg(n_chars), 6) AS avg_chars,
        |  count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_bucket_script" ->
      """SELECT ts::DATE AS day,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
        |  round(CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE)
        |        / sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 6) AS ctr,
        |  round(round(sum(value), 2) / count(*), 6) AS value_per_event
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q_stats_bucket" ->
      """WITH b AS (SELECT o_orderdate::DATE AS day, sum(o_totalprice) AS rev
        |           FROM orders GROUP BY 1)
        |SELECT count(*) AS n_buckets,
        |  round(min(rev), 2) AS min_rev,
        |  round(max(rev), 2) AS max_rev,
        |  round(avg(rev), 6) AS avg_rev,
        |  round(sum(rev), 2) AS sum_rev
        |FROM b""".stripMargin,
    "q_cumulative_cardinality" ->
      """WITH ev AS (SELECT ts::DATE AS day, user_id FROM events),
        |d AS (SELECT day, count(*) AS n_events FROM ev GROUP BY 1),
        |fs AS (SELECT user_id, min(day) AS day FROM ev GROUP BY 1),
        |nu AS (SELECT day, count(*) AS new_users FROM fs GROUP BY 1)
        |SELECT d.day, d.n_events,
        |  coalesce(nu.new_users, 0) AS new_users,
        |  CAST(sum(coalesce(nu.new_users, 0)) OVER (ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM d LEFT JOIN nu USING (day) ORDER BY day""".stripMargin,
    "q_nested_match" ->
      """SELECT c_custkey, c_name, count(*) AS n_inner_hits,
        |  round(max(o_totalprice), 2) AS best_price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE o_totalprice > 250000 AND o_orderpriority = '1-URGENT'
        |GROUP BY 1, 2 ORDER BY c_custkey""".stripMargin,
    "q_boosting" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
        |       WHERE token IN ('spark','join') GROUP BY 1, 2),
        |df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
        |       WHERE token IN ('spark','join') GROUP BY 1),
        |st AS (SELECT count(*) AS n_docs, avg(len(string_split(text, ' '))) AS avgdl FROM documents),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |bm AS (SELECT tf.doc_id, round(sum(
        |    ln(1.0 + (CAST(st.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5)) *
        |    (CAST(tf.tf AS DOUBLE) * (1.2 + 1) /
        |     (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl)))), 6) AS bm25
        |  FROM tf JOIN df USING (token) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
        |  GROUP BY tf.doc_id),
        |neg AS (SELECT doc_id, list_contains(string_split(text, ' '), 'slow') AS demoted
        |        FROM documents)
        |SELECT bm.doc_id,
        |  round(bm.bm25 * CASE WHEN neg.demoted THEN 0.5 ELSE 1.0 END, 7) AS score,
        |  neg.demoted
        |FROM bm JOIN neg USING (doc_id)
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q_terms_set" ->
      """SELECT doc_id, lang,
        |  CAST(CASE WHEN lang = 'en' THEN 4 ELSE 3 END AS BIGINT) AS msm,
        |  (CAST(list_contains(string_split(text, ' '), 'spark') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'join') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'vector') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'data') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'query') AS BIGINT)) AS n_matched
        |FROM documents
        |WHERE (CAST(list_contains(string_split(text, ' '), 'spark') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'join') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'vector') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'data') AS BIGINT)
        |   + CAST(list_contains(string_split(text, ' '), 'query') AS BIGINT))
        |  >= CASE WHEN lang = 'en' THEN 4 ELSE 3 END
        |ORDER BY doc_id""".stripMargin,
    "q_top_hits" ->
      """WITH h AS (SELECT lang, doc_id, n_chars,
        |    count(*) OVER (PARTITION BY lang) AS n_hits,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents)
        |SELECT lang, n_hits, rank, doc_id, n_chars
        |FROM h WHERE rank <= 3 ORDER BY lang, rank""".stripMargin,
    "q_gopher_quality" ->
      """WITH m AS (SELECT doc_id,
        |    len(string_split(text, ' ')) AS n_words,
        |    round(CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t)))
        |          AS DOUBLE) / len(string_split(text, ' ')), 6) AS mean_word_len,
        |    len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS n_stop,
        |    round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |          / len(string_split(text, ' ')), 6) AS distinct_ratio
        |  FROM documents)
        |SELECT doc_id, n_words, mean_word_len, n_stop, distinct_ratio,
        |  (n_words >= 50 AND n_words <= 100000) AS pass_words,
        |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS pass_wordlen,
        |  (n_stop >= 2) AS pass_stop,
        |  (distinct_ratio > 0.3) AS pass_repeat,
        |  ((n_words >= 50 AND n_words <= 100000)
        |   AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        |   AND (n_stop >= 2) AND (distinct_ratio > 0.3)) AS pass_all
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_knn_hamming" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id % 100 = 0),
         |s AS (SELECT q.q_id, e.vec_id,
         |        len(list_filter(range(1, 65),
         |          i -> (q.q_emb[i] >= 0) <> (e.embedding[i] >= 0))) AS hamming
         |      FROM q CROSS JOIN embeddings e)
         |SELECT q_id, vec_id, rn, hamming FROM (
         |  SELECT q_id, vec_id, hamming,
         |    row_number() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    "q_random_sample" ->
      """SELECT vec_id, label FROM (
        |  SELECT vec_id, label,
        |    CAST('0x' || substring(md5('smp' || CAST(vec_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 1000000 AS h
        |  FROM embeddings)
        |ORDER BY h, vec_id LIMIT 20""".stripMargin,
    "q_hybrid_dbsf" ->
      s"""WITH bm AS ($oracleBm25),
         |lexp AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50),
         |lexn AS (SELECT doc_id,
         |    coalesce((bm25 - (mu - 3.0 * sd)) / nullif(6.0 * sd, 0), 1.0) AS nl
         |  FROM lexp CROSS JOIN (SELECT avg(bm25) AS mu, stddev_samp(bm25) AS sd FROM lexp)),
         |qv AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0),
         |vs AS (SELECT vec_id AS doc_id,
         |         round(list_cosine_similarity(q_emb, embedding::DOUBLE[]), 6) AS vscore
         |       FROM embeddings CROSS JOIN qv),
         |vp AS (SELECT doc_id, vscore FROM vs ORDER BY vscore DESC, doc_id LIMIT 50),
         |vn AS (SELECT doc_id,
         |    coalesce((vscore - (mu - 3.0 * sd)) / nullif(6.0 * sd, 0), 1.0) AS nv
         |  FROM vp CROSS JOIN (SELECT avg(vscore) AS mu, stddev_samp(vscore) AS sd FROM vp))
         |SELECT doc_id, round(coalesce(nl, 0) + coalesce(nv, 0), 6) AS dbsf
         |FROM lexn FULL OUTER JOIN vn USING (doc_id)
         |ORDER BY dbsf DESC, doc_id LIMIT 20""".stripMargin,
    "q_rank_feature" ->
      s"""WITH bm AS ($oracleBm25)
         |SELECT bm.doc_id,
         |  round(bm.bm25 + 2.0 * (d.n_chars / (d.n_chars + 300.0)), 6) AS score
         |FROM bm JOIN documents d ON bm.doc_id = d.doc_id
         |ORDER BY score DESC, bm.doc_id LIMIT 20""".stripMargin,
    "q_multi_terms" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
        |FROM documents GROUP BY 1, 2
        |ORDER BY n_docs DESC, lang, source LIMIT 10""".stripMargin,
    "q_range_band_search" ->
      s"""WITH q AS ($oracleQuerySet)
         |SELECT q.q_id, e.vec_id,
         |  round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
         |FROM q CROSS JOIN embeddings e
         |WHERE round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) >= 0.2
         |  AND round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) < 0.3
         |ORDER BY q_id, vec_id""".stripMargin,
    "q_geo_rings" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |g AS (SELECT user_id,
        |  CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
        |  CAST(CAST('0x' || substring(md5('x' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
        |  FROM u),
        |d AS (SELECT round(2.0 * 6371.0 * asin(sqrt(pow(sin(radians(lat - 10.0) / 2), 2)
        |    + cos(radians(10.0)) * cos(radians(lat)) * pow(sin(radians(lon - 20.0) / 2), 2))), 6)
        |    AS dist_km
        |  FROM g)
        |SELECT CASE WHEN dist_km < 1000 THEN 'r0'
        |            WHEN dist_km < 3000 THEN 'r1'
        |            WHEN dist_km < 6000 THEN 'r2'
        |            WHEN dist_km < 10000 THEN 'r3'
        |            ELSE 'r4' END AS ring,
        |  count(*) AS n_users,
        |  round(avg(dist_km), 6) AS avg_dist_km
        |FROM d GROUP BY 1 ORDER BY ring""".stripMargin,
    "q_geo_line" ->
      """WITH e AS (SELECT user_id, event_id, ts,
        |  CAST(CAST('0x' || substring(md5('x' || CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 36000 AS BIGINT) - 18000 AS lonc,
        |  CAST(CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 18000 AS BIGINT) - 9000 AS latc
        |  FROM events WHERE user_id % 15 = 7),
        |r AS (SELECT user_id, lonc, latc,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n_points FROM e)
        |SELECT user_id, n_points,
        |  string_agg(CAST(lonc AS VARCHAR) || ':' || CAST(latc AS VARCHAR), ' ' ORDER BY rn) AS line,
        |  n_points <= 10 AS complete
        |FROM r WHERE rn <= 10
        |GROUP BY user_id, n_points ORDER BY user_id""".stripMargin,
    "q_geo_tile" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |g AS (SELECT user_id,
        |  CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
        |  CAST(CAST('0x' || substring(md5('x' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
        |  FROM u),
        |f AS (SELECT * FROM g WHERE abs(lat) <= 85.0),
        |t AS (SELECT lat, lon,
        |  CAST(floor((lon + 180.0) / 360.0 * 64) AS BIGINT) AS tile_x,
        |  CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi())
        |       / 2.0 * 64) AS BIGINT) AS tile_y
        |  FROM f)
        |SELECT '6/' || tile_x || '/' || tile_y AS tile, count(*) AS n_points,
        |  round(avg(lat), 6) AS centroid_lat, round(avg(lon), 6) AS centroid_lon
        |FROM t GROUP BY 1, tile_x, tile_y
        |ORDER BY n_points DESC, tile LIMIT 20""".stripMargin,
    "q_dedup_keep_best" ->
      """WITH RECURSIVE all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[4:], ' ') AS text
        |  FROM documents WHERE doc_id % 11 = 0),
        |g AS (SELECT doc_id,
        |        min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keeper,
        |        count(*) OVER (PARTITION BY md5(lower(trim(text)))) AS n FROM all_docs),
        |e1 AS (SELECT keeper AS a, doc_id AS b FROM g WHERE n > 1 AND doc_id <> keeper),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM all_docs
        |      WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |          i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS gs FROM t),
        |ng AS (SELECT doc_id, unnest(gs) AS gg FROM tri),
        |sz AS (SELECT doc_id, len(gs) AS n_g FROM tri),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |      FROM ng a JOIN ng b USING (gg) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |e2 AS (SELECT doc_a AS a, doc_b AS b FROM p
        |       JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
        |       WHERE round(CAST(common AS DOUBLE) / (sa.n_g + sb.n_g - common), 6) >= 0.5),
        |edges AS (SELECT a, b FROM e1 UNION SELECT a, b FROM e2
        |          UNION SELECT b AS a, a AS b FROM e1
        |          UNION SELECT b AS a, a AS b FROM e2),
        |reach(n, r) AS (
        |  SELECT a AS n, a AS r FROM edges
        |  UNION
        |  SELECT reach.n, e.b AS r FROM reach JOIN edges e ON reach.r = e.a),
        |c AS (SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n),
        |tok AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |    unnest(string_split(text, ' ')) AS tk FROM all_docs),
        |w AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    sum((CAST(CAST('0x' || substring(md5(tk), 1, 8) AS BIGINT) % 4096 AS BIGINT)
        |         * 2654435761) % 1000003 - 500000) AS w_sum
        |  FROM tok GROUP BY 1, 2),
        |s AS (SELECT doc_id,
        |    round(0.5 + 0.5 * (4.0 * w_sum / (n_tokens * 1000003.0))
        |          / (1.0 + abs(4.0 * w_sum / (n_tokens * 1000003.0))), 6) AS score
        |  FROM w),
        |j AS (SELECT c.cluster_id, c.doc_id, s.score FROM c JOIN s USING (doc_id)),
        |r AS (SELECT cluster_id, doc_id, score,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY cluster_id) AS n_members FROM j)
        |SELECT cluster_id, n_members, doc_id AS keeper_id, score AS keeper_score
        |FROM r WHERE rk = 1 ORDER BY cluster_id""".stripMargin,
    "q_dedup_soft" ->
      """WITH RECURSIVE all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000000 AS doc_id,
        |    array_to_string(string_split(text, ' ')[4:], ' ') AS text
        |  FROM documents WHERE doc_id % 11 = 0),
        |g AS (SELECT doc_id,
        |        min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keeper,
        |        count(*) OVER (PARTITION BY md5(lower(trim(text)))) AS n FROM all_docs),
        |e1 AS (SELECT keeper AS a, doc_id AS b FROM g WHERE n > 1 AND doc_id <> keeper),
        |t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM all_docs
        |      WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
        |          i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS gs FROM t),
        |ng AS (SELECT doc_id, unnest(gs) AS gg FROM tri),
        |sz AS (SELECT doc_id, len(gs) AS n_g FROM tri),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        |      FROM ng a JOIN ng b USING (gg) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |e2 AS (SELECT doc_a AS a, doc_b AS b FROM p
        |       JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
        |       WHERE round(CAST(common AS DOUBLE) / (sa.n_g + sb.n_g - common), 6) >= 0.5),
        |edges AS (SELECT a, b FROM e1 UNION SELECT a, b FROM e2
        |          UNION SELECT b AS a, a AS b FROM e1
        |          UNION SELECT b AS a, a AS b FROM e2),
        |reach(n, r) AS (
        |  SELECT a AS n, a AS r FROM edges
        |  UNION
        |  SELECT reach.n, e.b AS r FROM reach JOIN edges e ON reach.r = e.a),
        |cl AS (SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n),
        |a AS (SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
        |      FROM (SELECT doc_id FROM all_docs) d LEFT JOIN cl USING (doc_id))
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS n_members,
        |  round(1.0 / CAST(count(*) OVER (PARTITION BY cluster_id) AS DOUBLE), 6) AS weight
        |FROM a ORDER BY doc_id""".stripMargin,
    "q_termvectors" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
        |           FROM documents WHERE doc_id IN (5, 17, 42)),
        |p AS (SELECT doc_id, toks, CAST(unnest(range(len(toks))) AS BIGINT) AS pos0 FROM d),
        |t AS (SELECT doc_id, toks[CAST(pos0 + 1 AS INT)] AS term, pos0 + 1 AS pos FROM p),
        |pd AS (SELECT doc_id, term, count(*) AS term_freq, min(pos) AS first_pos
        |       FROM t GROUP BY 1, 2),
        |c AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |cs AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
        |         count(*) AS ttf
        |       FROM c WHERE term IN (SELECT DISTINCT term FROM pd) GROUP BY 1)
        |SELECT pd.doc_id, pd.term, pd.term_freq, pd.first_pos, cs.doc_freq, cs.ttf
        |FROM pd JOIN cs USING (term) ORDER BY doc_id, term""".stripMargin,
    "q_quality_classifier" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |w AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    sum((CAST(CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) % 4096 AS BIGINT)
        |         * 2654435761) % 1000003 - 500000) AS w_sum
        |  FROM t GROUP BY 1, 2),
        |s AS (SELECT doc_id, n_tokens, w_sum,
        |    4.0 * w_sum / (n_tokens * 1000003.0) AS logit FROM w)
        |SELECT doc_id, n_tokens,
        |  round(0.5 + 0.5 * logit / (1.0 + abs(logit)), 6) AS score,
        |  w_sum >= 0 AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_percentiles_bucket" ->
      """WITH b AS (SELECT o_orderdate::DATE AS day, sum(o_totalprice) AS rev
        |           FROM orders GROUP BY 1)
        |SELECT count(*) AS n_buckets,
        |  round(quantile_cont(rev, 0.25), 2) AS p25,
        |  round(quantile_cont(rev, 0.5), 2) AS p50,
        |  round(quantile_cont(rev, 0.75), 2) AS p75
        |FROM b""".stripMargin,
    "q_change_point" ->
      """WITH daily AS (SELECT o_orderdate::DATE AS day,
        |    round(sum(o_totalprice), 2) AS rev FROM orders GROUP BY 1),
        |t AS (SELECT count(*) AS n_all, sum(rev) AS sum_all FROM daily),
        |s AS (SELECT day,
        |    count(*) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_before,
        |    sum(rev) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sum_before
        |  FROM daily),
        |c AS (SELECT day,
        |    round(sum_before / n_before, 2) AS mean_before,
        |    round((t.sum_all - sum_before) / (t.n_all - n_before), 2) AS mean_after
        |  FROM s CROSS JOIN t WHERE n_before >= 1)
        |SELECT day AS change_day, mean_before, mean_after,
        |  round(abs(mean_after - mean_before), 2) AS delta
        |FROM c ORDER BY abs(mean_after - mean_before) DESC, day LIMIT 1""".stripMargin,
    "q_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb, label AS q_label
         |           FROM embeddings WHERE vec_id % 100 = 0),
         |s AS (SELECT q.q_id, e.vec_id,
         |        round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
         |      FROM q CROSS JOIN embeddings e WHERE e.label <> q.q_label)
         |SELECT q_id, vec_id, rn, score FROM (
         |  SELECT q_id, vec_id, score,
         |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,
    "q_where_document" ->
      s"""WITH q AS ($oracleQuerySet),
         |m AS (SELECT doc_id AS vec_id FROM documents
         |      WHERE list_contains(string_split(text, ' '), 'vector')),
         |s AS (SELECT q.q_id, e.vec_id,
         |        round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
         |      FROM q CROSS JOIN embeddings e JOIN m USING (vec_id))
         |SELECT q_id, vec_id, rn, score FROM (
         |  SELECT q_id, vec_id, score,
         |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    "q_where_document_neg" ->
      s"""WITH q AS ($oracleQuerySet),
         |m AS (SELECT doc_id AS vec_id FROM documents
         |      WHERE NOT contains(text, 'vector')
         |        AND regexp_matches(text, '(hash|sort) (join|merge)')),
         |s AS (SELECT q.q_id, e.vec_id,
         |        round(list_cosine_similarity(q.q_emb, e.embedding::DOUBLE[]), 6) AS score
         |      FROM q CROSS JOIN embeddings e JOIN m USING (vec_id))
         |SELECT q_id, vec_id, rn, score FROM (
         |  SELECT q_id, vec_id, score,
         |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
         |  FROM s)
         |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin,
    "q_normalize_agg" ->
      """WITH d AS (SELECT ts::DATE AS day, count(*) AS n_events FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS n_total FROM d)
        |SELECT day, n_events,
        |  round(100.0 * n_events / n_total, 6) AS pct_of_total
        |FROM d CROSS JOIN t ORDER BY day""".stripMargin,
    "q_has_parent" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_geo_bounds" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |g AS (SELECT user_id,
        |  CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 18000 AS DOUBLE) / 100.0 - 90.0 AS lat,
        |  CAST(CAST('0x' || substring(md5('x' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT)
        |       % 36000 AS DOUBLE) / 100.0 - 180.0 AS lon
        |  FROM u)
        |SELECT event_type, count(*) AS n_events,
        |  round(min(lat), 6) AS min_lat, round(max(lat), 6) AS max_lat,
        |  round(min(lon), 6) AS min_lon, round(max(lon), 6) AS max_lon,
        |  round(avg(lat), 6) AS centroid_lat, round(avg(lon), 6) AS centroid_lon
        |FROM events JOIN g USING (user_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_phrase_suggest" ->
      """WITH vocab AS (SELECT token, count(*) AS df FROM (
        |    SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        |    FROM documents) GROUP BY 1),
        |c1 AS (SELECT token AS c1, CAST(levenshtein(token, 'spark') AS BIGINT) AS d1
        |       FROM vocab WHERE levenshtein(token, 'spark') <= 1),
        |c2 AS (SELECT token AS c2, CAST(levenshtein(token, 'joim') AS BIGINT) AS d2
        |       FROM vocab WHERE levenshtein(token, 'joim') <= 1),
        |t AS (SELECT string_split(text, ' ') AS toks FROM documents
        |      WHERE len(string_split(text, ' ')) >= 2),
        |bg AS (SELECT toks[i + 1] AS b1, toks[i + 2] AS b2, count(*) AS bigram_count
        |       FROM t, unnest(range(0, len(toks) - 1)) AS r(i)
        |       GROUP BY 1, 2)
        |SELECT c1, c2,
        |  coalesce(bg.bigram_count, 0) AS bigram_count,
        |  (d1 + d2) AS total_edits
        |FROM c1 CROSS JOIN c2
        |LEFT JOIN bg ON bg.b1 = c1 AND bg.b2 = c2
        |ORDER BY bigram_count DESC, total_edits, c1, c2 LIMIT 5""".stripMargin,
    "q_serial_diff" ->
      """WITH d AS (SELECT ts::DATE AS day, count(*) AS n_events FROM events GROUP BY 1)
        |SELECT day, n_events,
        |  n_events - lag(n_events, 7) OVER (ORDER BY day) AS wow_diff
        |FROM d ORDER BY day""".stripMargin,
    "q_categorize_text" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tc AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |rk AS (SELECT doc_id, token,
        |       row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, token) AS rn FROM tc),
        |cat AS (SELECT doc_id, string_agg(token, ' ' ORDER BY rn) AS category
        |        FROM rk WHERE rn <= 3 GROUP BY doc_id)
        |SELECT category, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS sample_doc
        |FROM cat GROUP BY 1 ORDER BY n_docs DESC, category LIMIT 20""".stripMargin,
    "q_var_width_histogram" ->
      """WITH b AS (SELECT o_orderdate::DATE AS day, round(sum(o_totalprice), 2) AS rev
        |           FROM orders GROUP BY 1),
        |st AS (SELECT 2.0 * (max(rev) - min(rev)) / count(*) AS thr FROM b),
        |g AS (SELECT rev, day, rev - lag(rev) OVER (ORDER BY rev, day) AS gap FROM b),
        |cl AS (SELECT rev, sum(CASE WHEN gap IS NULL OR gap <= (SELECT thr FROM st)
        |                            THEN 0 ELSE 1 END)
        |         OVER (ORDER BY rev, day ROWS UNBOUNDED PRECEDING) AS bucket_id FROM g)
        |SELECT CAST(bucket_id AS BIGINT) AS bucket_id,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  round(min(rev), 2) AS min_rev, round(max(rev), 2) AS max_rev,
        |  round(avg(rev), 6) AS centroid
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_missing_agg" ->
      """WITH d AS (SELECT lang,
        |  CAST(nullif(regexp_extract(text, '[0-9]+'), '') AS BIGINT) AS v
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  count(*) - count(v) AS n_missing, count(v) AS n_values,
        |  round(avg(v), 6) AS avg_value
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    "q_reverse_nested" ->
      """WITH cc AS (SELECT o_orderpriority, count(*) AS n_orders
        |            FROM orders GROUP BY 1),
        |pp AS (SELECT o_orderpriority, count(*) AS n_customers,
        |         round(avg(c_acctbal), 6) AS avg_acctbal
        |       FROM (SELECT DISTINCT o_orderpriority, o_custkey FROM orders) d
        |       JOIN customer ON o_custkey = c_custkey GROUP BY 1)
        |SELECT pp.o_orderpriority, cc.n_orders, pp.n_customers, pp.avg_acctbal
        |FROM pp JOIN cc USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,
    "q_moving_percentiles" ->
      """WITH e AS (SELECT ts::DATE AS eday, value FROM events),
        |days AS (SELECT DISTINCT eday AS day FROM e)
        |SELECT day, count(*) AS n_events,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95
        |FROM e JOIN days ON day - eday BETWEEN 0 AND 6
        |GROUP BY day ORDER BY day""".stripMargin,
    "q_logsumexp" ->
      """WITH m AS (SELECT event_type, max(value) AS mx FROM events GROUP BY 1)
        |SELECT event_type, count(*) AS n_events,
        |  round(any_value(mx) + ln(sum(exp(value - mx))), 6) AS logsumexp
        |FROM events JOIN m USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_grouping_search" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings
        |           WHERE vec_id % 100 = 0),
        |s AS (SELECT q_id, vec_id, label,
        |        round(list_cosine_similarity(q_emb, embedding::DOUBLE[]), 6) AS score
        |      FROM q, embeddings),
        |h AS (SELECT *, row_number() OVER (PARTITION BY q_id, label
        |                                   ORDER BY score DESC, vec_id) AS hit_rank FROM s),
        |t AS (SELECT * FROM h WHERE hit_rank <= 2),
        |lb AS (SELECT q_id, label, max(score) AS best FROM t GROUP BY 1, 2),
        |lr AS (SELECT q_id, label,
        |       row_number() OVER (PARTITION BY q_id ORDER BY best DESC, label) AS group_rank
        |       FROM lb)
        |SELECT t.q_id, CAST(lr.group_rank AS BIGINT) AS group_rank, t.label,
        |  CAST(t.hit_rank AS BIGINT) AS hit_rank, t.vec_id, t.score
        |FROM t JOIN lr ON t.q_id = lr.q_id AND t.label = lr.label
        |WHERE lr.group_rank <= 3
        |ORDER BY t.q_id, lr.group_rank, t.hit_rank""".stripMargin,
    // served from the at-rest inverted index; must hash-match the
    // on-the-fly BM25 oracle exactly
    "q_bm25_indexed" ->
      s"""SELECT doc_id, bm25 FROM ($oracleBm25)
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q_eql_sequence" ->
      """WITH v AS (SELECT user_id, ts AS ts_v FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, ts AS ts_c FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, ts AS ts_p FROM events WHERE event_type = 'purchase')
        |SELECT v.user_id, CAST(count(*) AS BIGINT) AS n_sequences,
        |       min(ts_v) AS first_start
        |FROM v JOIN c ON c.user_id = v.user_id AND ts_c > ts_v
        |       JOIN p ON p.user_id = v.user_id AND ts_p > ts_c
        |                 AND ts_p <= ts_v + INTERVAL 7 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_filter_dsl" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang = 'en' AND n_chars >= 100 AND n_chars < 900
        |  AND source NOT IN ('src0', 'src1')
        |  AND (contains(text, 'spark') OR contains(text, 'join'))
        |ORDER BY doc_id""".stripMargin,
    "q_payload_schema" ->
      """WITH s AS (
        |  SELECT 'lang' AS field, 'keyword' AS dtype,
        |         CAST(count(lang) AS BIGINT) AS points,
        |         CAST(count(DISTINCT lang) AS BIGINT) AS n_distinct FROM documents
        |  UNION ALL
        |  SELECT 'source', 'keyword', CAST(count(source) AS BIGINT),
        |         CAST(count(DISTINCT source) AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', 'integer', CAST(count(n_chars) AS BIGINT),
        |         CAST(count(DISTINCT n_chars) AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT 'text', 'keyword', CAST(count(text) AS BIGINT),
        |         CAST(count(DISTINCT text) AS BIGINT) FROM documents)
        |SELECT field, dtype, points, n_distinct FROM s ORDER BY field""".stripMargin,
    "q_array_filter" ->
      """WITH t AS (SELECT doc_id, lang, n_chars,
        |                  string_split(text, ' ') AS tags FROM documents)
        |SELECT doc_id, lang, n_chars, CAST(len(tags) AS BIGINT) AS n_tags
        |FROM t
        |WHERE list_contains(tags, 'vector')
        |  AND len(tags) >= 40 AND len(tags) < 90
        |  AND NOT (tags IS NULL OR len(tags) = 0)
        |  AND ((list_contains(tags, 'spark') AND list_contains(tags, 'data'))
        |       OR list_contains(tags, 'hash') OR list_contains(tags, 'window'))
        |ORDER BY doc_id""".stripMargin,
    "q_payload_index_scan" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE lang IN ('en', 'de') AND n_chars >= 120 AND n_chars < 400
        |ORDER BY doc_id""".stripMargin,
    "q_has_child" ->
      """WITH kids AS (SELECT o_custkey, count(*) AS n_child,
        |                     sum(o_totalprice) AS child_price
        |              FROM orders
        |              WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
        |              GROUP BY 1)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(n_child) AS BIGINT) AS n_orders,
        |  round(sum(child_price), 2) AS sum_price
        |FROM customer JOIN kids ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_crawl_diff" ->
      """WITH old AS (SELECT doc_id, md5(text) AS h_old, n_chars AS b_old
        |             FROM documents WHERE doc_id % 5 <> 4),
        |neu AS (SELECT doc_id,
        |          md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS h_new,
        |          CAST(length(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)
        |               AS BIGINT) AS b_new
        |        FROM documents WHERE doc_id % 5 <> 0),
        |d AS (SELECT coalesce(old.doc_id, neu.doc_id) AS doc_id, h_old, h_new, b_new,
        |        CASE WHEN h_old IS NULL THEN 'added'
        |             WHEN h_new IS NULL THEN 'removed'
        |             WHEN h_old <> h_new THEN 'changed'
        |             ELSE 'unchanged' END AS status
        |      FROM old FULL OUTER JOIN neu USING (doc_id))
        |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc,
        |  CAST(coalesce(sum(b_new), 0) AS BIGINT) AS new_bytes
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_star_join" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_bpe_pairs" ->
      """WITH words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS c FROM words WHERE length(w) >= 2 GROUP BY 1),
        |pairs AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, c
        |          FROM wc, LATERAL unnest(range(1, length(w))) AS t(i))
        |SELECT pair, CAST(sum(c) AS BIGINT) AS n
        |FROM pairs GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin
  )
}
