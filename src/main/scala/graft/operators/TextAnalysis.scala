package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Text analysis family — the LLM-pipeline extension (SURVEY.md §2
  * rows 24–27): token counting, heuristic language ID, quality
  * scoring, and document fingerprinting.
  *
  * All four are single-scan, per-row expression pipelines (token
  * split + higher-order array functions, no UDFs) with at most one
  * map-side-combinable aggregation — the shapes that stay linear and
  * codegen'd at 100 TB.
  */
object TextAnalysis {

  /** Documents with scan parallelism repaired ([[Fanout.rebalance]])
    * — for the token-explode / per-doc-grid entries whose map-side
    * fan-out otherwise runs at the single-row-group scan's
    * parallelism (one task). Scan-only entries keep the raw frame:
    * their map work is proportional to input bytes, and an exchange
    * would cost more than it parallelizes.
    */
  private def docsPar(spark: SparkSession, sfDir: String): DataFrame =
    Fanout.rebalance(Tables.documents(spark, sfDir), col("doc_id"))

  /** Row 24: token counts per language — corpus profile stats. */
  def qTokenCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        round(avg(col("n_tok")), 6).as("avg_tokens"),
        max(col("n_tok")).as("max_tokens"))
      .orderBy(col("lang"))

  /** Stopword profiles for the heuristic language ID. The corpus is
    * synthetic (a closed ~30-word vocabulary), so the "languages" are
    * topical registers over that vocabulary; the operator shape —
    * per-profile hit count, argmax with deterministic tie-break — is
    * exactly the classic stopword language identifier.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow", "small", "big"),
    "db" -> Seq("table", "join", "query", "filter", "sort", "scan"),
    "ml" -> Seq("vector", "data", "batch", "stream", "spark", "hash"))

  /** Row 25: language ID — count stopword hits per profile (with
    * multiplicity), argmax profile per doc, ties to the
    * lexicographically smaller profile name. Profiles are a 3-row
    * broadcast; the corpus is scanned once.
    */
  def qLangId(spark: SparkSession, sfDir: String): DataFrame = {
    val profiles = spark.createDataFrame(LangProfiles).toDF("plang", "words")
    val hits = docsPar(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .crossJoin(broadcast(profiles))
      .select(col("doc_id"), col("plang"),
        size(filter(col("toks"), t => array_contains(col("words"), t))).cast("long").as("hits"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("hits").desc, col("plang"))
    hits.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("plang").as("pred_lang"), col("hits"))
      .orderBy(col("doc_id"))
  }

  /** Row 26: quality score — length, stopword-ratio, and lexical
    * diversity mixed 0.4/0.3/0.3. Everything per-row; one expression
    * pipeline inside whole-stage codegen.
    */
  def qQualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = Seq("the", "a")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        size(filter(col("toks"), t => t.isin(stop: _*))).cast("long").as("n_stop"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      .select(col("doc_id"), col("n_tok"),
        round(
          lit(0.4) * (least(col("n_tok"), lit(100L)).cast("double") / 100) +
          lit(0.3) * (lit(1) - col("n_stop") / col("n_tok")) +
          lit(0.3) * (col("n_distinct") / col("n_tok")), 6).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Chunking window: 32 tokens per chunk, stride 16 (50% overlap) —
    * the standard RAG/embedding pre-pass shape.
    */
  val ChunkSize = 32
  val ChunkStride = 16

  /** (doc_id, text) → (doc_id, chunk_id, chunk) sliding-window token
    * chunks — the reusable stage shared by the chunking query and
    * [[graft.pipelines.PrepareTrainingData]]. One scan, one explode
    * of per-doc chunk starts; no shuffle.
    */
  def chunked(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1, lit(ChunkStride)))
          .as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("toks"), col("start") + 1, lit(ChunkSize)).as("chunk"))

  /** Sliding-window document chunking — the split-for-embedding stage
    * every RAG/training pipeline runs before vectorization. Chunks
    * are emitted as (doc, chunk ordinal, length, content hash) — the
    * hash keeps the oracle check exact without materializing chunk
    * text in the result.
    */
  def qChunkDocs(spark: SparkSession, sfDir: String): DataFrame =
    chunked(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** PII patterns: lowercase emails and digit runs — shared with
    * [[graft.pipelines.PrepareTrainingData]] (the corpus is
    * digit-free, so the query injects deterministic PII per doc,
    * mirrored in the oracle, the same constructed-positives pattern
    * as the dedup family).
    */
  val EmailPat = "[a-z0-9._]+@[a-z0-9.]+"
  val NumPat = "[0-9]+"

  /** Scrub emails then digit runs out of a text column. */
  def scrubPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(c, EmailPat, "<EMAIL>"), NumPat, "<NUM>")

  /** PII redaction — scrub emails then digit runs, report per-doc
    * match counts and the hash of the redacted text. Pure per-row
    * regex pipeline (codegen'd `RegExpReplace`), no shuffle: the
    * shape of every scrubbing pass in a training-data pipeline.
    */
  def qPiiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val withPii = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com ref "),
          ((col("doc_id") * 7919) % 100000).cast("string")).as("text"))
    withPii
      .select(col("doc_id"),
        regexp_count(col("text"), lit(EmailPat)).cast("long").as("n_emails"),
        regexp_replace(col("text"), EmailPat, "<EMAIL>").as("t1"))
      .select(col("doc_id"), col("n_emails"),
        regexp_count(col("t1"), lit(NumPat)).cast("long").as("n_numbers"),
        md5(regexp_replace(col("t1"), NumPat, "<NUM>")).as("redacted_hash"))
      .orderBy(col("doc_id"))
  }

  /** Sketch-based corpus profile (rows-only): approximate distinct
    * tokens (HyperLogLog++) and token-count quantiles (KLL-style
    * approx_percentile) per language — the constant-memory shapes
    * that replace exact distinct/percentile at 100 TB, where exact
    * distinct is a corpus-wide shuffle and exact percentiles need a
    * full sort. Sketches are mergeable, so the aggregation stays
    * map-side-partial + tiny final merge. Sketch internals are
    * engine-specific → no DuckDB hash oracle; the spec bounds the
    * error against the exact answers instead.
    */
  def qSketchStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("lang"))
      .agg(
        approx_count_distinct(col("token"), rsd = 0.02).as("approx_distinct"),
        count(lit(1)).as("n_tokens"))
      .join(
        Tables.documents(spark, sfDir)
          .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_tok"))
          .groupBy(col("lang"))
          .agg(percentile_approx(col("n_tok"), lit(0.5), lit(10000)).as("p50_tokens"),
            percentile_approx(col("n_tok"), lit(0.95), lit(10000)).as("p95_tokens")),
        "lang")
      .orderBy(col("lang"))

  /** Rare terms (ES `rare_terms` aggregation): terms by ASCENDING
    * document frequency with a max-df cutoff — the long-tail inverse
    * of a terms agg. The unit is the trigram shingle (the corpus has
    * a closed word vocabulary, so single words are all frequent;
    * shingles have a genuine df tail). Per-doc-distinct shingles
    * explode map-side, df is one combinable count, and the df<=2
    * filter cuts the result before the final order — one scan plus
    * one small aggregate at any corpus size (ES approximates this
    * with a CuckooFilter; exact df is the natural Spark form).
    */
  def qRareTerms(spark: SparkSession, sfDir: String): DataFrame =
    // rebalance: the trigram explode is the query's dominant stage and
    // ran on the corpus file's single split (measured 0.55 s one-task)
    graft.operators.Fanout.rebalance(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
        col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")))
        .as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 2)
      .orderBy(col("df"), col("g"))
      .limit(50)

  /** Unigram-LM negative log-likelihood per document — the CCNet/
    * Gopher-style "perplexity" quality gate, with the corpus itself
    * as the language model (p(t) = count(t) / total tokens). Two
    * scans: one builds the unigram table (map-side-combinable count,
    * |vocab| rows — small even at web scale, so it BROADCASTS back),
    * one attaches probabilities to every token position and averages
    * per doc. No driver collection; the LM join is broadcast-hash.
    */
  def qPerplexity(spark: SparkSession, sfDir: String): DataFrame =
    docNll(spark, sfDir)
      .select(col("doc_id"), col("n_tok"), col("nll"))
      .orderBy(col("doc_id"))

  /** Per-doc (n_tok, nll) under the corpus unigram LM — shared by
    * [[qPerplexity]] and [[qPerplexityBuckets]]; nll lands on the
    * 1e-6 grid so everything downstream is engine-deterministic.
    */
  private def docNll(spark: SparkSession, sfDir: String): DataFrame = {
    // (a rebalance at this explode was tried and REVERTED: toks feeds
    // two branches with no materialization, so the repair exchange is
    // planned once per branch — measured flat-to-worse, +12 exchange
    // mentions in q_perplexity_buckets' plan)
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("total"))
    toks
      // NO broadcast hint on the vocab side: a natural-language
      // vocabulary grows with the corpus (Heaps' law) and at 100 TB
      // outgrows any broadcast. The vocab is an aggregation output,
      // so AQE reads its ACTUAL size and still broadcasts it when it
      // is small (every test/bench scale); past the threshold the
      // join degrades to the scalable shuffle-by-token plan instead
      // of a driver OOM.
      .join(vocab.crossJoin(broadcast(total)), "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        round(avg(-log(col("c").cast("double") / col("total"))), 6).as("nll"))
  }

  /** CCNet-style perplexity bucketing: split the corpus into
    * head / middle / tail terciles of the unigram-LM nll (head =
    * most-fluent third) — the quality-stratification step CCNet
    * applies before keeping head+middle for training. Cut points are
    * the exact 1/3 and 2/3 percentiles of the rounded per-doc nll;
    * buckets then aggregate to (count, nll bounds, mean).
    *
    * Scale shape: the nll pass is [[docNll]]'s two combinable scans;
    * the percentile is a single-aggregate reduction whose exact form
    * is memory-bounded by |docs| scores — at true 100 TB scale swap
    * `percentile` for `approx_percentile` (same plan shape, sketch
    * state); the cut points come back as a one-row broadcast and the
    * bucket assignment is a per-row comparison, so nothing
    * corpus-sized shuffles after the nll aggregate. Ties sit exactly
    * ON the rounded grid (interpolated cuts either fall strictly
    * between grid points or collapse onto one), so `<=` is
    * engine-stable.
    */
  def qPerplexityBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val nll = docNll(spark, sfDir).select(col("doc_id"), col("nll"))
    val cuts = nll.agg(
      graft.functions.pctl.of(spark, col("nll"), lit(1.0 / 3)).as("c1"),
      graft.functions.pctl.of(spark, col("nll"), lit(2.0 / 3)).as("c2"))
    nll.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("nll") <= col("c1"), "head")
          .when(col("nll") <= col("c2"), "middle")
          .otherwise("tail"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("nll")), 6).as("min_nll"),
        round(max(col("nll")), 6).as("max_nll"),
        round(avg(col("nll")), 6).as("avg_nll"))
      .orderBy(col("bucket"))
  }

  /** String stats (ES `string_stats` with `show_distribution`):
    * per-language token count, distinct count, and Shannon entropy
    * of the token distribution — the lexical-diversity profile next
    * to the perplexity gate. Entropy comes from the (lang, token)
    * count table: -Σ p·ln p with p = c/total, all double arithmetic
    * mirrored in the oracle. Two combinable aggregates, output =
    * |langs| rows.
    */
  def qStringStats(spark: SparkSession, sfDir: String): DataFrame = {
    val tc = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
    val p = col("c").cast("double") / col("tot")
    tc.withColumn("tot", sum(col("c")).over(Window.partitionBy(col("lang"))))
      .groupBy(col("lang"))
      .agg(min(col("tot")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(-sum(p * log(p)), 6).as("entropy"))
      .orderBy(col("lang"))
  }

  /** Minimum co-occurring-document support for a PMI pair. */
  val PmiMinSupport = 5

  /** Token-pair PMI (pointwise mutual information) over per-document
    * distinct tokens — the co-occurrence statistic behind phrase
    * mining and word-association analytics (ES `significant_terms`'
    * doc-level cousin). Pairs are generated MAP-SIDE by a
    * higher-order expression over the sorted distinct-token array
    * (quadratic in per-doc DISTINCT tokens, which doc length bounds)
    * — no self-join of the exploded corpus, so the only shuffles are
    * the two combinable counts (pair df, unigram df). The unigram
    * table broadcasts back onto the pair frame.
    */
  def qCooccurPmi(spark: SparkSession, sfDir: String): DataFrame = {
    // the sorted-distinct token frame feeds three branches (pair
    // explode, unigram df, corpus count) — materialize it once, the
    // persisted-intermediate shape of every multi-branch corpus plan
    val docs = docsPar(spark, sfDir)
      .select(col("doc_id"), array_sort(array_distinct(split(col("text"), " "))).as("st"))
      .localCheckpoint()
    val t = docs.select(col("doc_id"), explode(col("st")).as("tok"))
    val dfreq = t.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // sequence(0, -1) would DESCEND, not be empty — guard 1-token docs
    val pairs = docs
      .filter(size(col("st")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(st) - 2), i ->
          |  transform(slice(st, i + 2, size(st) - i - 1), b -> struct(st[i] AS t1, b AS t2))))"""
          .stripMargin)).as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= PmiMinSupport)
    pairs
      // the df table is vocabulary-sized — no broadcast hint (Heaps'
      // law; see docNll). AQE still broadcasts it at small scale
      // from its measured aggregation-output size.
      .join(dfreq.withColumnRenamed("tok", "t1").withColumnRenamed("df", "df_a"), "t1")
      .join(dfreq.withColumnRenamed("tok", "t2").withColumnRenamed("df", "df_b"), "t2")
      .crossJoin(broadcast(nDocs))
      .select(col("t1"), col("t2"), col("c_ab"),
        round(log(col("n_docs").cast("double") * col("c_ab") /
          (col("df_a").cast("double") * col("df_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
      .limit(20)
  }

  /** Itemsets must co-occur in at least this fraction of docs. */
  val ItemSetMinSupport = 0.2
  val ItemSetTopK = 20

  /** Row 229: ES `frequent_item_sets` aggregation — association-rule
    * support mining (Apriori) over per-document token baskets: the
    * top-K token PAIRS by document co-occurrence count, with a
    * minimum support ratio.
    *
    * The Apriori prune is what makes this linear at corpus scale:
    * frequent singletons are counted first (one combinable groupBy)
    * and broadcast back, so candidate pairs are generated only from
    * tokens already known frequent — per-doc pair fan-out is bounded
    * by the frequent vocabulary (which SHRINKS relative to corpus
    * size as the corpus diversifies), never by raw doc length. No
    * corpus self-join anywhere; the three shuffles are all
    * map-side-combinable counts.
    */
  def qFrequentItemSets(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("st"))
      .localCheckpoint() // feeds token df, baskets, and the corpus count
    val t = docs.select(col("doc_id"), explode(col("st")).as("tok"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val freq = t.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= col("n_docs") * lit(ItemSetMinSupport))
      .select(col("tok"))
    // baskets restricted to frequent tokens BEFORE pair generation.
    // The basket aggregate's exchange is user-pinned (repartition on
    // the SAME key the groupBy needs, so the planner plans exactly one
    // exchange either way — the repartition IS the aggregate's
    // required distribution): its OUTPUT bytes are small (one row per
    // doc) while the pair explode READING it is quadratic per row, so
    // AQE's byte-based coalescing otherwise collapses it to one
    // partition and the grid runs single-task (measured: a 1.4 s
    // one-task job under default confs; the bench session's AQE floor
    // used to mask this — the fix now lives here, in the operator).
    // Width is non-downsizing (Fanout.gridWidth, never below what the
    // un-pinned exchange would get), and collect_list has no map-side
    // reduction, so pinning costs nothing: the same (doc, tok) rows
    // cross the wire either way.
    // the frequent vocabulary is BOUNDED (Σ df ≤ n·L, so tokens with
    // df ≥ minsup·n number ≤ L/minsup — avg basket width over the
    // support floor, independent of corpus size) — collect it sorted
    // and run the whole pair grid on vocabulary INDICES: baskets
    // shuffle ints instead of strings, the support aggregate hashes
    // ONE long key instead of a two-string struct (guide §2.3 narrower
    // types), and the ≤V² surviving pairs decode back to tokens at the
    // very end. Index order ≡ string sort order by construction, so
    // sorted index baskets generate exactly the former (t1 < t2) pairs.
    val vocab = freq.orderBy(col("tok")).collect().map(_.getString(0))
    if (vocab.isEmpty)
      return docs.select(col("doc_id").cast("string").as("t1"),
        col("doc_id").cast("string").as("t2"),
        lit(0L).as("support")).limit(0)
    val v = vocab.length.toLong
    import spark.implicits._
    val vIdx = vocab.zipWithIndex.map { case (tk, i) => (tk, i.toLong) }
      .toSeq.toDF("tok", "ti")
    val pruned = t.join(broadcast(vIdx), "tok")
      .select(col("doc_id"), col("ti"))
    val baskets = pruned.repartition(Fanout.gridWidth(pruned), col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("ti"))).as("st"))
    baskets
      .filter(size(col("st")) >= 2)
      .select(explode(expr(
        s"""flatten(transform(sequence(0, size(st) - 2), i ->
           |  transform(slice(st, i + 2, size(st) - i - 1), b -> st[i] * ${v}L + b)))"""
          .stripMargin)).as("p"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(nDocs))
      .filter(col("support") >= col("n_docs") * lit(ItemSetMinSupport))
      .select(
        element_at(typedLit(vocab.toSeq),
          expr(s"cast(p div ${v}L as int)") + 1).as("t1"),
        element_at(typedLit(vocab.toSeq),
          expr(s"cast(p % ${v}L as int)") + 1).as("t2"),
        col("support"))
      .orderBy(col("support").desc, col("t1"), col("t2"))
      .limit(ItemSetTopK)
  }

  /** Row 27: polynomial rolling-hash fingerprint: fold tokens left to
    * right as acc·31 + tokval mod 1e9+7, with tokval the first 8 hex
    * digits of md5(token) — a hash both Spark and the SQL oracle
    * compute identically.
    */
  def qFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        aggregate(col("toks"), lit(0L),
          (acc, t) => (acc * 31 + conv(substring(md5(t), 1, 8), 16, 10).cast("long")) % 1000000007L)
          .as("fp"))
      .orderBy(col("doc_id"))

  /** Gopher-style rule battery (Rae et al. 2021 §A1.1, the Dolma /
    * RefinedWeb pretraining gate): per-document PASS/FAIL flags for
    * each rule plus the overall gate —
    *   - word count within [50, 100000],
    *   - mean word length within [3, 10],
    *   - at least 2 stopword hits,
    *   - distinct-token ratio > 0.3 (the repetition section's
    *     document-level proxy; the windowed dup-n-gram gates live in
    *     [[graft.operators.TrainingPipeline.qRepetition]]).
    * The composite SCORE twin is [[qQualityScore]]; this one is the
    * boolean filter a 100 TB corpus clean actually runs, and it is
    * scan-only: every metric is a higher-order expression over one
    * token split, no shuffle, trivially parallel over any partition
    * count.
    */
  def qGopherQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = Seq("the", "a")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        round(aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t))
          .cast("double") / size(col("toks")), 6).as("mean_word_len"),
        size(filter(col("toks"), t => t.isin(stop: _*))).cast("long").as("n_stop"),
        round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 6)
          .as("distinct_ratio"))
      .withColumn("pass_words", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("pass_wordlen", col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("pass_stop", col("n_stop") >= 2)
      .withColumn("pass_repeat", col("distinct_ratio") > 0.3)
      .withColumn("pass_all",
        col("pass_words") && col("pass_wordlen") && col("pass_stop") && col("pass_repeat"))
      .orderBy(col("doc_id"))
  }

  /** Text categorization (ES `categorize_text` agg): group
    * semi-structured messages by their dominant vocabulary. ES uses
    * an online drain-tree clusterer; the deterministic (and so
    * oracle-able) variant here keys each document by its top-3 tokens
    * ordered by (frequency desc, token asc) — documents sharing a
    * dominant vocabulary land in one category. Top-20 categories by
    * size with a sample doc id.
    *
    * Scale shape: per-doc token counts are one map-side-combinable
    * aggregate; the per-doc top-3 is a sort of a per-doc-sized array
    * inside the agg (no window over the corpus); the category
    * histogram is a wordcount. Three combinable shuffles, no joins.
    */
  def qCategorizeText(spark: SparkSession, sfDir: String): DataFrame =
    docsPar(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      // struct sort is lexicographic: (-c) ascending = count descending,
      // then token ascending — the deterministic per-doc top-3.
      .agg(concat_ws(" ", expr(
        "transform(slice(array_sort(collect_list(named_struct('nc', -c, 'tok', token))), 1, 3), s -> s.tok)"))
        .as("category"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("sample_doc"))
      .orderBy(col("n_docs").desc, col("category"))
      .limit(20)

  /** Zipf's-law fit over the top-K vocabulary — the corpus-health
    * check every pretraining data audit runs (natural text follows
    * rank-frequency slope ≈ −1; a synthetic, templated, or spam-heavy
    * corpus bends the log-log line). Least squares of log(freq) on
    * log(rank) in closed form from five sums, so both engines
    * evaluate the SAME grid points (ranks are integers, the tie order
    * (freq desc, token asc) total).
    *
    * Scale shape: the vocabulary count is one combinable groupBy; the
    * top-K truncation is a TakeOrdered (K = 1000, driver-safe), and
    * the rank window runs over that K-row frame — never over the
    * Heaps-law full vocabulary, which at 100 TB would put an unbounded
    * single-partition sort on one executor.
    */
  def qZipf(spark: SparkSession, sfDir: String): DataFrame = {
    val freq = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val top = freq.orderBy(col("c").desc, col("tok")).limit(1000)
    // the rank window runs over the already-limited K-row frame (the
    // top-k itself is a distributed TakeOrdered), so a one-partition
    // window is the intended plan; the constant-valued but
    // non-foldable partition key keeps it off WindowExec's
    // unpartitioned-window path (the TextIndex.hybridRrf idiom) —
    // same rows, same order, no corpus-growing global window
    val pts = top
      .withColumn("r",
        row_number().over(Window.partitionBy(pmod(length(col("tok")), lit(1)))
          .orderBy(col("c").desc, col("tok"))))
      .select(log(col("r").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    pts
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(col("n").cast("long").as("n_vocab"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"),
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("n"), 6)
          .as("zipf_intercept"))
  }

  /** Heaps'-law vocabulary-growth fit — [[qZipf]]'s companion corpus
    * audit (V = K·n^β; natural text sits at β ≈ 0.4–0.6, and a
    * templated or looped corpus flattens the curve): distinct-vocab
    * size at ten cumulative corpus checkpoints, with the log-log
    * least-squares exponent attached.
    *
    * The checkpoint vocabularies come from ONE trick that keeps the
    * shape linear: per token, only its FIRST document id matters
    * (vocab at cutoff c = tokens first seen ≤ c), so one
    * groupBy(token).min pass — the same exchange q_zipf's frequency
    * count pays — feeds all ten checkpoints, which then count a
    * broadcast 10-row frame against it. No per-checkpoint rescans,
    * no cumulative window over the corpus. The β fit is the closed
    * five-sum form over ten points, broadcast back onto them.
    *
    * On the driver's synthetic corpus the audit fires exactly as
    * designed: the fixed 31-word vocabulary saturates at the first
    * checkpoint and β lands at 0 — the flat curve that tells a data
    * engineer the corpus is templated, not natural text. On the
    * Heaps-mode organic corpus it reads β ≈ 0.5 (OrganicCorpusSpec
    * pins [0.35, 0.65]), the natural-text band.
    *
    * Scale note: the checkpoint joins below fan the first-seen vocab
    * and doc-length frames CHECKPOINT-COUNT× (a broadcast 10-row
    * inequality join) before the combinable counts — the checkpoint
    * count, a query constant, is the row multiplier, so widening the
    * audit to k checkpoints costs k× one corpus-column scan, never a
    * rescan of the corpus text.
    */
  def qHeaps(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val maxId = docs.agg(max(col("doc_id")).as("max_id"))
    val firstSeen = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("first_id"))
    val docLens = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val cp = spark.range(1, 11)
      .select(col("id").cast("int").as("checkpoint"))
      .crossJoin(broadcast(maxId))
      .select(col("checkpoint"),
        floor(col("max_id") * col("checkpoint") / lit(10)).cast("long").as("cutoff"))
    val vocab = cp.join(firstSeen, firstSeen("first_id") <= cp("cutoff"))
      .groupBy(col("checkpoint")).agg(count(lit(1)).as("vocab"))
    val toks = cp.join(docLens, docLens("doc_id") <= cp("cutoff"))
      .groupBy(col("checkpoint")).agg(sum(col("n")).as("n_tokens"))
    val pts = vocab.join(toks, "checkpoint")
      .select(col("checkpoint"), col("n_tokens"), col("vocab"),
        log(col("n_tokens").cast("double")).as("x"),
        log(col("vocab").cast("double")).as("y"))
    val fit = pts.agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(round((col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("heaps_beta"))
    pts.crossJoin(broadcast(fit))
      .select(col("checkpoint"), col("n_tokens"), col("vocab"), col("heaps_beta"))
      .orderBy(col("checkpoint"))
  }

  /** Linear quality-classifier inference (the fasttext-style filter
    * of CCNet / GPT-3-class pipeline cleans): hash each token into a
    * 4096-bucket feature space, look up the bucket's weight, and
    * score the document by the mean weight through a bounded link —
    * exactly the hashed-bag-of-words linear model shape, with the
    * trained weight vector replaced by a closed-form keyed weight so
    * the DuckDB oracle can recompute it (a real model is one
    * broadcast `Array[Double]` lookup in the same expression slot).
    *
    * Determinism across engines: the per-token weight is an INTEGER
    * (`(bucket · 2654435761) mod 1000003 − 500000`, exact in int64
    * for both engines), so the document sum is exact integer
    * arithmetic in any fold order; floats appear only in the final
    * per-doc division and link, on exact integer inputs. The link is
    * the algebraic sigmoid x/(1+|x|) — engine-portable where
    * libm `exp` is not bit-stable across implementations.
    *
    * Scale shape: scan-only — one higher-order fold per row, no
    * explode, no shuffle; the classifier runs at parquet-scan
    * throughput on any corpus size.
    */
  def qQualityClassifier(spark: SparkSession, sfDir: String): DataFrame =
    classifierScored(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("n_tokens"), col("score"),
        // keep decided on the exact integer sum, not the rounded float
        (col("w_sum") >= 0L).as("keep"))
      .orderBy(col("doc_id"))

  /** The reusable scoring core of [[qQualityClassifier]]: for any
    * (doc_id, text) frame, (doc_id, n_tokens, w_sum, score) — w_sum
    * the exact integer feature-weight sum, score the rounded bounded
    * link. Other pipeline stages (duplicate-representative selection,
    * mixture weighting) rank on the same score the filter thresholds.
    */
  private[graft] def classifierScored(docs: DataFrame): DataFrame =
    classifierWithScore(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("n_tokens"), col("w_sum"), col("score"))

  /** Column-PRESERVING variant of [[classifierScored]]: appends
    * n_tokens / w_sum / score to whatever frame carries a `text`
    * column — the form the streaming ingest gate
    * ([[graft.streaming.QualityGateStream]]) needs, since a stateless
    * stream stage cannot join scores back on. Same expressions, one
    * definition, so batch and stream scoring provably agree.
    */
  private[graft] def classifierWithScore(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("w_sum",
        expr("""aggregate(toks, 0L, (acc, t) ->
            acc + (pmod(cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint), 4096)
                   * 2654435761L) % 1000003L - 500000L)"""))
      .withColumn("logit",
        lit(4.0) * col("w_sum") / (col("n_tokens") * lit(1000003.0)))
      .withColumn("score",
        round(lit(0.5) + lit(0.5) * col("logit") / (lit(1.0) + abs(col("logit"))), 6))
      .drop("toks", "logit")
}
