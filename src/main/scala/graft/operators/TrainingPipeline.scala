package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Training-data curation operators — the LLM-pipeline extension
  * beyond dedup: benchmark decontamination, repetition/quality
  * metrics, weighted source mixing with a deterministic split, and
  * context-window sequence packing. These are the operations a
  * 100 TB pretraining corpus passes through between raw crawl and
  * tokenizer, each expressed as a declarative Spark plan.
  */
object TrainingPipeline {

  /** Distinct 5-token shingles per doc (docs with ≥5 tokens). */
  private def fiveGrams(docs: DataFrame): DataFrame =
    // rebalance at the input: the 5-gram map fans out ~5 words per
    // token and ran on the corpus file's 3 splits (guide §2.5;
    // measured 0.41 s single-digit-task job inside q_contamination)
    Fanout.rebalance(docs.select(col("doc_id"), col("text")), col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(toks)-5), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))"))
        .as("gs"))

  /** Benchmark decontamination (the eval-overlap scan every serious
    * pretraining run performs): the "benchmark" is every 7th base doc;
    * the corpus is the augmented collection (with its constructed
    * copies and near-dups — known contamination). A corpus doc is
    * contaminated if it shares any 5-token shingle with a benchmark
    * doc. Benchmark docs themselves are excluded from the report.
    *
    * Scale shape: the benchmark side is ≪ corpus (an eval suite is
    * thousands of docs) and travels as a broadcast; the corpus scan
    * is linear, and the only corpus-sized shuffle is the final
    * per-doc aggregate. Shingles travel as xxhash64 longs (the
    * [[Dedup]] trick — a 64-bit collision between two distinct
    * corpus/bench shingles is ~1e-8), and the bench side is
    * pre-aggregated per shingle so the join emits one row per
    * (doc, shingle): the per-doc counts are then collision-free
    * plain aggregates — no countDistinct expand, no string shuffle.
    */
  def qContamination(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Dedup.augmentedDocs(spark, sfDir)
    val bench = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 7 === 0).select(col("doc_id"), col("text"))
    def gramHashes(docs: DataFrame): DataFrame =
      fiveGrams(docs).select(col("doc_id"),
        explode(array_distinct(expr("transform(gs, g -> xxhash64(g))"))).as("gh"))
    val bg = gramHashes(bench)
      .groupBy(col("gh")).agg(collect_set(col("doc_id")).as("bids"))
    val cg = gramHashes(corpus.filter(col("doc_id") % 7 =!= 0))
    cg.join(broadcast(bg), "gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        size(array_distinct(flatten(collect_list(col("bids"))))).cast("long")
          .as("n_bench_docs"))
      .orderBy(col("doc_id"))
  }

  /** Within-document repetition metrics (the Gopher/Dolma repetition
    * quality gates): duplicate bigram/trigram fraction and the share
    * of the most frequent token. Pure per-row expressions except the
    * top-token aggregate (one wordcount-shaped shuffle).
    */
  def qRepetition(spark: SparkSession, sfDir: String): DataFrame = {
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    val perRow = t.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
      expr("transform(sequence(0, size(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1]))").as("g2"),
      expr("transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))").as("g3"))
      .select(col("doc_id"), col("n_tokens"),
        round((size(col("g2")) - size(array_distinct(col("g2")))) /
          size(col("g2")).cast("double"), 6).as("dup_bigram_frac"),
        round((size(col("g3")) - size(array_distinct(col("g3")))) /
          size(col("g3")).cast("double"), 6).as("dup_trigram_frac"))
    val topTok = t.select(col("doc_id"), explode(col("toks")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(round(max(col("c")) / sum(col("c")).cast("double"), 6).as("top_token_share"))
    perRow.join(topTok, "doc_id").orderBy(col("doc_id"))
  }

  /** Boilerplate-segment detection (the CCNet/RefinedWeb shared-line
    * removal pass, over token segments since the synthetic corpus has
    * no line structure): docs are cut into non-overlapping 8-token
    * segments; a segment is boilerplate when it occurs in ≥ 2
    * distinct docs corpus-wide. Per-doc report: total segments,
    * boilerplate segments, boilerplate fraction. Corpus = the
    * augmented collection, whose exact copies are the known shared
    * segments.
    *
    * Scale shape: segments travel as xxhash64 longs; the corpus-wide
    * df is one hash-keyed aggregate and rejoins the segment stream on
    * the same key — two linear shuffles of 16-byte rows, the standard
    * shared-line-dedup layout. (The oracle groups the raw strings;
    * counts agree unless two distinct corpus segments collide in 64
    * bits, ~1e-8.)
    */
  def qBoilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    val segW = 8
    val segs = Fanout.rebalance(Dedup.augmentedDocs(spark, sfDir), col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= segW)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(toks) DIV $segW - 1), " +
          s"i -> xxhash64(concat_ws(' ', slice(toks, i * $segW + 1, $segW))))"))
        .as("gh"))
    val df = segs.groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("df"))
    segs.join(df, "gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_segments"), col("n_boiler"),
        round(col("n_boiler") / col("n_segments").cast("double"), 6).as("boiler_frac"))
      .orderBy(col("doc_id"))
  }

  /** md5 bucket in [0, 1000) over a salted id — the deterministic
    * sampling coin shared with the oracle.
    */
  private def bucket1000(salt: String): org.apache.spark.sql.Column =
    graft.functions.hashes.md5Bucket(
      concat(lit(salt), col("doc_id").cast("string")), 1000L)

  /** Weighted source mixing + deterministic train/val/test split:
    * each source keeps a target fraction of its docs (1.0 / 0.5 /
    * 0.25 by source tier — the up/down-weighting step of corpus
    * assembly), then survivors land in train/val/test by a second
    * salted hash (80/10/10). Everything is a per-row expression; the
    * only shuffle is the reporting aggregate — the mix itself would
    * scale to 100 TB as a pure filter.
    */
  def qMixSources(spark: SparkSession, sfDir: String): DataFrame = {
    val tier = substring(col("source"), 4, 10).cast("int")
    val keepFrac = when(tier < 5, 1.0).when(tier < 10, 0.5).otherwise(0.25)
    val b = Tables.documents(spark, sfDir)
      .withColumn("keep", bucket1000("") < keepFrac * 1000)
      .filter(col("keep"))
      .withColumn("split",
        when(bucket1000("s") < 800, "train")
          .when(bucket1000("s") < 900, "val").otherwise("test"))
    b.groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("sum_tokens"))
      .orderBy(col("source"), col("split"))
  }

  /** Context-window sequence packing: docs are packed in id order
    * into 256-token bins per source shard — bin = (running token
    * count before this doc) div budget, the streaming first-fit
    * approximation every packed-pretraining loader uses (each doc
    * costs its tokens + 1 separator). The window partitions by
    * source, so at 100 TB each shard packs independently — no global
    * sort, no single-partition window.
    */
  def qPackSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val budget = 256
    val t = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    t.withColumn("cum", sum(col("n_tokens") + 1).over(w))
      .withColumn("bin_id", expr(s"(cum - n_tokens - 1) DIV $budget"))
      .groupBy(col("source"), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("source"), col("bin_id"))
  }

  /** Seeded deterministic corpus shuffle — the data-order step every
    * pretraining run performs before sharding: examples must arrive
    * in a pseudo-random order that is exactly REPRODUCIBLE (resume,
    * re-run, audit) and independent of partitioning. The shuffle key
    * is md5(doc_id ":" seed); the global position is assigned
    * DISTRIBUTEDLY: per-bucket ranks (window partitioned by the key's
    * first byte) plus broadcast running bucket offsets (256 longs
    * collected to the driver) — a global total order with no
    * single-partition window, the only shape that survives 100 TB.
    * Oracle: DuckDB's row_number over the same md5 order (md5 agrees
    * byte-for-byte across engines).
    */
  def qShuffleTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val seed = 42
    val keyed = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":" + seed))).as("shuffle_key"))
      .withColumn("bucket", substring(col("shuffle_key"), 1, 2))
    val counts = keyed.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).init).toSeq
    val offCol = map(offsets.flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*)
    val wb = Window.partitionBy(col("bucket")).orderBy(col("shuffle_key"))
    keyed
      .withColumn("train_pos",
        (row_number().over(wb).cast("long") + element_at(offCol, col("bucket"))))
      .select(col("doc_id"), col("shuffle_key"), col("train_pos"))
      .orderBy(col("train_pos"))
  }

  /** Length-grouped batching (the padding-efficiency trick of every
    * LLM fine-tuning loader): docs bucket into power-of-2 token-count
    * bands, and each band is cut into fixed-size batches in id order
    * — batching similar lengths together bounds padding waste to the
    * band ratio. The window partitions by band, so at 100 TB each
    * band batches independently; the report aggregates per batch.
    */
  def qLengthBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val batchSize = 16
    val t = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("band",
        pow(lit(2.0), ceil(log2(greatest(col("n_tokens"), lit(1L))))).cast("long"))
    val w = Window.partitionBy(col("band")).orderBy(col("doc_id"))
    t.withColumn("batch_no", ((row_number().over(w) - 1) / batchSize).cast("long"))
      .groupBy(col("band"), col("batch_no"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        max(col("n_tokens")).as("pad_to"))
      .withColumn("pad_waste",
        round(lit(1.0) - col("sum_tokens") / (col("pad_to") * col("n_docs")), 6))
      .orderBy(col("band"), col("batch_no"))
  }

  /** Crawl-snapshot diff — the change audit between two corpus
    * snapshots every recurring-crawl pipeline runs before deciding
    * what to re-process: per doc, `added` (only in the new crawl),
    * `removed` (only in the old), `changed` (content digest differs),
    * `unchanged`. Snapshots are derived deterministically from the
    * base table (old = doc_id % 5 ≠ 4; new = doc_id % 5 ≠ 0, with
    * every third doc's text edited) so the oracle sees the same two
    * frames. Reported per (status): doc count, id bounds, changed
    * bytes.
    *
    * Plan shape: two pruned scans of the same table, one full-outer
    * equi-join on the id, digests compared as md5 — at 100 TB both
    * snapshots would be bucketed by doc_id and the join co-locates
    * with zero shuffle; the status aggregate is combinable.
    */
  def qCrawlDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir)
    val old = base.filter(col("doc_id") % 5 =!= 4)
      .select(col("doc_id"), md5(col("text")).as("h_old"),
        col("n_chars").as("b_old"))
    val neu = base.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text2",
        when(col("doc_id") % 3 === 0, concat(col("text"), lit(" v2"))).otherwise(col("text")))
      .select(col("doc_id"), md5(col("text2")).as("h_new"),
        length(col("text2")).cast("long").as("b_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        coalesce(sum(col("b_new")), lit(0L)).as("new_bytes"))
      .orderBy(col("status"))
  }

  /** The distinct-word frequency table — the frame every byte-pair-
    * encoding step runs over. BPE's key scale property: after the
    * first wordcount, all iterations touch |vocab| rows (≪ corpus),
    * never the corpus again.
    */
  private def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))

  /** Adjacent-symbol pair counts over `sym` (space-joined symbol
    * strings) weighted by word frequency `c` — one BPE iteration's
    * statistics as a combinable aggregate.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(split(col("sym"), " ")) >= 2)  // sequence(1,0) would DESCEND, not return empty
      .select(explode(expr(
      "transform(sequence(1, size(split(sym, ' ')) - 1), " +
        "i -> concat(split(sym, ' ')[i-1], ' ', split(sym, ' ')[i]))")).as("pair"),
      col("c"))
      .groupBy(col("pair")).agg(sum(col("c")).as("n"))

  /** First-iteration BPE pair statistics (the corpus-side half of
    * tokenizer training): adjacent CHARACTER pair counts over the
    * corpus, weighted by word frequency — the argmax of this table is
    * the first merge every BPE/WordPiece trainer performs. Top-20 by
    * (count desc, pair asc).
    *
    * Scale shape: the wordcount is the only corpus-sized shuffle;
    * pair explosion runs over the DISTINCT-word table (Zipf: tiny
    * relative to the corpus) with counts carried as weights. This is
    * exactly how SentencePiece/HF tokenizer trainers shard the
    * counting step over a 100 TB corpus.
    */
  def qBpePairs(spark: SparkSession, sfDir: String): DataFrame =
    pairCounts(
      wordCounts(Tables.documents(spark, sfDir))
        .select(concat_ws(" ", split(col("w"), "")).as("sym"), col("c")))
      // first-iteration symbols are single chars: "e r" → "er", the
      // 2-char substring form the oracle counts directly.
      .select(regexp_replace(col("pair"), " ", "").as("pair"), col("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)

  /** Byte-pair-encoding trainer (Sennrich et al. 2016; the
    * SentencePiece/HF `trainers.BpeTrainer` role): learn `nMerges`
    * merge rules from the corpus. The corpus is read once (the
    * initial wordcount); every iteration's working set is |vocab|
    * rows, so training cost is independent of corpus size after the
    * first scan — the property that makes BPE trainable on a 100 TB
    * corpus at all.
    *
    * Pair statistics are DELTA-MAINTAINED, the trick every reference
    * trainer uses: the global (pair, n) table is built once, and each
    * merge updates it from only the words that CONTAIN the merged
    * pair — subtract those words' old pair counts, add their
    * post-merge pair counts, fold into the standing table with one
    * combinable aggregate over |pairs| + |delta| rows. Under Zipf,
    * affected words shrink rapidly as merges specialize, so the
    * per-merge shuffle is a sliver of the full recount (which touched
    * every adjacent pair of every vocab word, every iteration).
    * The argmax reads the standing table directly: count desc, pair
    * asc — the deterministic tie-break. Both iterated frames are
    * localCheckpoint'd per merge, so plan size (and per-iteration
    * planning cost) stays flat across thousands of merges instead of
    * accreting one projection per merge.
    *
    * Returns the learned merges in order.
    */
  def bpeTrain(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    var words = wordCounts(docs)
      .select(concat_ws(" ", split(col("w"), "")).as("sym"), col("c"))
      .localCheckpoint()
    var pc = pairCounts(words).localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val top = pc.orderBy(col("n").desc, col("pair")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val pair = top(0).getString(0)
        val Array(a, b) = pair.split(" ", 2)
        merges += ((a, b))
        // whole-symbol match: the pair only merges where `a` and `b`
        // are complete space-separated symbols; regexp_replace scans
        // left-to-right non-overlapping = standard BPE application.
        val pat = "(?<=^| )" + java.util.regex.Pattern.quote(a) + " " +
          java.util.regex.Pattern.quote(b) + "(?=$| )"
        val hit = col("sym").rlike(pat)
        val affected = words.filter(hit).localCheckpoint()
        val merged = affected
          .withColumn("sym", regexp_replace(col("sym"), pat, a + b))
          .localCheckpoint()
        words = words.filter(!hit).unionByName(merged).localCheckpoint()
        pc = pc
          .unionByName(pairCounts(merged))
          .unionByName(pairCounts(affected).withColumn("n", -col("n")))
          .groupBy(col("pair")).agg(sum(col("n")).as("n"))
          .filter(col("n") > 0)
          .localCheckpoint()
        i += 1
      }
    }
    merges.result()
  }

  /** Batched BPE training: per round, select the top-`batchK`
    * MUTUALLY NON-INTERACTING pairs from the round-start counts and
    * apply them in ONE delta-maintenance job — the sequential-BPE
    * remedy for the one-driver-round-trip-per-merge cost (a 32k-merge
    * production vocab is 32k Spark jobs under [[bpeTrain]]; here it
    * is ~32k/K).
    *
    * Selection: walk candidates in (count desc, pair) order — the
    * reference trainer's order — and keep a pair only if its two
    * symbols AND its merged output are disjoint from every pair
    * already kept this round. Non-interacting merges neither create
    * nor destroy each other's matches, so applying the batch in one
    * chained replace is EXACTLY sequential application of those K
    * merges, and each kept pair's round-start count is still its true
    * count when it applies. The one deviation from reference BPE,
    * documented: a pair first CREATED by an earlier merge of the same
    * round (e.g. `(ab, c)` right after `a+b`) cannot be picked until
    * the next round, so for K>1 the merge LIST can differ from the
    * reference trainer's even though every individual merge is
    * frequency-justified; at K=1 the output is identical to
    * [[bpeTrain]] (spec-pinned).
    */
  def bpeTrainBatched(docs: DataFrame, nMerges: Int, batchK: Int = 8): Seq[(String, String)] = {
    require(batchK >= 1, s"batchK must be positive: $batchK")
    def pat(a: String, b: String): String =
      "(?<=^| )" + java.util.regex.Pattern.quote(a) + " " +
        java.util.regex.Pattern.quote(b) + "(?=$| )"
    var words = wordCounts(docs)
      .select(concat_ws(" ", split(col("w"), "")).as("sym"), col("c"))
      .localCheckpoint()
    var pc = pairCounts(words).localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var total = 0
    var done = false
    while (total < nMerges && !done) {
      val want = math.min(batchK, nMerges - total)
      // a bounded over-fetch: overlapping candidates are skipped, so
      // pull a few extra rows beyond the batch size
      val top = pc.orderBy(col("n").desc, col("pair")).limit(want * 4 + 8).collect()
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set[String]()
        val batch = scala.collection.mutable.ArrayBuffer[(String, String)]()
        val it = top.iterator
        while (batch.size < want && it.hasNext) {
          val Array(a, b) = it.next().getString(0).split(" ", 2)
          if (!used(a) && !used(b) && !used(a + b)) {
            used += a; used += b; used += (a + b)
            batch += ((a, b))
          }
        }
        merges ++= batch
        total += batch.size
        val hitAny = batch.map { case (a, b) => col("sym").rlike(pat(a, b)) }
          .reduce(_ || _)
        val affected = words.filter(hitAny).localCheckpoint()
        val merged = affected
          .withColumn("sym", batch.foldLeft(col("sym")) { case (c, (a, b)) =>
            regexp_replace(c, pat(a, b), a + b)
          })
          .localCheckpoint()
        words = words.filter(!hitAny).unionByName(merged).localCheckpoint()
        pc = pc
          .unionByName(pairCounts(merged))
          .unionByName(pairCounts(affected).withColumn("n", -col("n")))
          .groupBy(col("pair")).agg(sum(col("n")).as("n"))
          .filter(col("n") > 0)
          .localCheckpoint()
      }
    }
    merges.result()
  }

  /** Apply learned merges to a corpus: tokenize each word by
    * replaying the merge list in order (the inference half of BPE).
    * Per-row expression chain — scan-only, no shuffle.
    */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val sym = merges.foldLeft(concat_ws(" ", split(col("w"), ""))) { case (acc, (a, b)) =>
      regexp_replace(acc,
        "(?<=^| )" + java.util.regex.Pattern.quote(a) + " " +
          java.util.regex.Pattern.quote(b) + "(?=$| )", a + b)
    }
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("bpe_tokens", split(sym, " "))
  }

  /** The merge chain as a per-element expression (for use inside a
    * higher-order `transform` lambda).
    */
  private def applyMerges(w: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(concat_ws(" ", split(w, ""))) { case (acc, (a, b)) =>
      regexp_replace(acc,
        "(?<=^| )" + java.util.regex.Pattern.quote(a) + " " +
          java.util.regex.Pattern.quote(b) + "(?=$| )", a + b)
    }

  /** Tokenize-and-pack — the LAST stage of the pretraining pipeline:
    * every document becomes its BPE token stream (the learned merges
    * replayed per word, all inside one higher-order expression — no
    * per-word explode), documents pack into per-source bins in id
    * order (the [[qPackSequences]] assignment over BPE token counts),
    * and each bin is cut into fixed-`budget` training rows. Output:
    * (source, bin_id, seq_no, n_tokens, tokens).
    *
    * Scale shape: tokenization is scan-only; the bin window
    * partitions by source shard; the only data movement is the
    * per-bin gather, whose groups are budget-bounded by construction
    * (a bin holds ≤ budget + max-doc tokens). Token order is fully
    * deterministic: docs sort by id inside a bin, rows slice
    * sequentially — a re-run reproduces the exact token stream, which
    * is what makes checkpoint-resume of a tokenizer job possible.
    */
  def tokenizeAndPack(docs: DataFrame, merges: Seq[(String, String)],
                      budget: Int): DataFrame = {
    val toks = docs.select(col("source"), col("doc_id"),
      flatten(transform(split(col("text"), " "),
        w => split(applyMerges(w, merges), " "))).as("btoks"))
      .withColumn("n", size(col("btoks")).cast("long"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val binned = toks.withColumn("cum", sum(col("n")).over(w))
      .withColumn("bin_id", expr(s"(cum - n) DIV $budget"))
    binned
      .groupBy(col("source"), col("bin_id"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("doc_id"), col("btoks")))),
        s => s.getField("btoks"))).as("seq"))
      .select(col("source"), col("bin_id"),
        posexplode(expr(
          s"transform(sequence(0, (size(seq) - 1) DIV $budget), i -> slice(seq, i * $budget + 1, $budget))")))
      .select(col("source"), col("bin_id"), col("pos").cast("long").as("seq_no"),
        size(col("col")).cast("long").as("n_tokens"), col("col").as("tokens"))
  }

  /** Temperature exponent for the mixture plan / sampler: α < 1
    * flattens the source distribution toward uniform (the
    * multilingual/multi-domain reweighting every published
    * pretraining mix uses).
    */
  val MixAlpha = 0.5

  /** Token budget the mixture plan allocates (a config constant; at
    * production scale this is the run's total training-token target).
    */
  val MixBudget = 1000000L

  /** Per-source (n_docs, n_tokens) — one map-side-combinable
    * aggregate over the corpus, |sources| output rows.
    */
  private def sourceStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

  /** Temperature-weighted mixture plan — the per-source sampling
    * table of a pretraining run (the "data mixture" table every
    * model report publishes): source weight ∝ n_tokens^α, normalized
    * to shares, converted to a per-source token allocation of the
    * run's budget and an epoch count (allocation / available tokens;
    * >1 means the source is upsampled and repeats). α < 1 shifts
    * mass from huge sources to small ones.
    *
    * Scale shape: one combinable aggregate (corpus scan → |sources|
    * rows), then a one-row total broadcast back onto the tiny frame —
    * the plan itself costs one scan at any corpus size. The epoch
    * column derives from the ROUNDED share so the arithmetic is
    * grid-deterministic across engines.
    */
  def qMixturePlan(spark: SparkSession, sfDir: String): DataFrame = {
    val weighted = sourceStats(spark, sfDir)
      .withColumn("w", pow(col("n_tokens").cast("double"), MixAlpha))
    val totalW = weighted.agg(sum(col("w")).as("total_w"))
    weighted.crossJoin(broadcast(totalW))
      .withColumn("share", round(col("w") / col("total_w"), 6))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share"),
        round(lit(MixBudget.toDouble) * col("share") / col("n_tokens"), 6).as("epochs"))
      .orderBy(col("source"))
  }

  /** Temperature-weighted downsampling — the executable twin of
    * [[qMixturePlan]]: each source keeps a deterministic
    * (min_tokens / n_tokens)^(1−α) fraction of its docs, so the
    * smallest source survives whole and larger sources shed mass
    * until the retained mixture matches the α-tempered shares. The
    * sampling coin is the salted-md5 bucket shared with
    * [[qMixSources]]' oracle — reproducible across engines and runs,
    * and a per-row expression: the whole sampler is one corpus scan
    * with a broadcast |sources|-row fraction table attached, no
    * shuffle of the corpus at any scale. keep_frac is rounded to the
    * 1e-6 grid before the bucket comparison so the threshold is
    * engine-independent.
    */
  /** DSIR — Data Selection via Importance Resampling (Xie et al.
    * 2023, arXiv:2302.03169), the hashed-n-gram importance weighting
    * used to pick pretraining data that "looks like" a target domain:
    * rank raw-corpus documents by the mean log ratio of their hashed
    * token features' probability under the TARGET distribution vs the
    * raw corpus's own. Target here = the `en` slice (stand-in for any
    * curated seed corpus); features = unigrams hashed into the same
    * 4096-bucket space as the quality classifier (md5-derived, so the
    * oracle recomputes it bit-identically); both distributions
    * Laplace-smoothed over the bucket space so a bucket unseen in the
    * target stays finite. Output = the top-100 selected documents.
    *
    * Scale shape: the bucket space is FIXED at 4096, so both grouped
    * counts collapse to 4096-row frames at ANY corpus size and the
    * per-bucket log-ratio table is an always-broadcastable join side
    * (an explicit `broadcast` is CORRECT here, unlike a Heaps-law
    * vocabulary — the width never grows with the data). The only
    * corpus-sized exchange is the token→doc grouping every per-doc
    * text score pays, and the top-k is a TakeOrdered, never a global
    * sort.
    */
  def qDsir(spark: SparkSession, sfDir: String): DataFrame = {
    // the per-token md5 bucket map below runs TWICE (distribution
    // pass + score pass, the deliberate recompute-over-materialize
    // choice for a corpus-sized frame) — repair the unsplittable
    // scan's parallelism so both passes use the machine
    val toks = Fanout.rebalance(Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("lang"),
        expr("pmod(cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint), 4096)")
          .as("b"))
    // ONE pass builds both distributions (raw count + target count
    // per bucket); the totals then reduce the 4096-row frame, not
    // the corpus — two document scans total (this one and the final
    // score join), regardless of corpus size
    val cnt = toks.groupBy(col("b"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_tgt"))
    val totals = cnt.agg(sum(col("c_raw")).as("n_raw"), sum(col("c_tgt")).as("n_tgt"))
    val ratio = cnt.crossJoin(broadcast(totals))
      .select(col("b"),
        (log((col("c_tgt") + lit(1.0)) / (col("n_tgt") + lit(4096.0)))
          - log((col("c_raw") + lit(1.0)) / (col("n_raw") + lit(4096.0)))).as("lr"))
    toks.join(broadcast(ratio), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("lr")), 6).as("dsir_logw"))
      .orderBy(col("dsir_logw").desc, col("doc_id"))
      .limit(100)
  }

  def qTemperatureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val stats = sourceStats(spark, sfDir)
    val minT = stats.agg(min(col("n_tokens")).as("min_tokens"))
    val fracs = stats.crossJoin(broadcast(minT))
      .withColumn("keep_frac", round(
        pow(col("min_tokens").cast("double") / col("n_tokens"), 1 - MixAlpha), 6))
      .select(col("source"), col("keep_frac"))
    Tables.documents(spark, sfDir)
      .join(broadcast(fracs), "source")
      .filter(graft.functions.hashes.md5Bucket(col("doc_id").cast("string"), 1000000L) <
        col("keep_frac") * 1000000L)
      .select(col("doc_id"), col("source"), col("keep_frac"))
      .orderBy(col("doc_id"))
  }
}
