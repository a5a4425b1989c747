package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.{MediaCodec, MediaFeatures, StubMediaCodec}

/** Multimodal column plumbing (SURVEY.md §2 row 28): media payloads
  * as opaque `binary` columns with typed metadata, exactly how a
  * 100 TB training-data lake stores image/audio bytes next to the
  * text and embeddings they belong to.
  *
  * The *decode* step is the pluggable [[graft.api.MediaCodec]]
  * boundary: one codec instance per partition inside a single
  * `mapPartitions` stage ([[decodeWith]]), emitting the typed
  * [[graft.api.MediaFeatures]] record. Decoded frames MATERIALIZE
  * once per (codec, corpus) — the decode-at-ingest step of every
  * production media pipeline — and all `q_media_*` plans are
  * relational reads off that frame, so a real CLIP/CLAP codec drops
  * in without touching a single query plan. The default
  * [[graft.api.StubMediaCodec]] derives features deterministically
  * from payload bytes (the codec libraries are not in this
  * environment), which keeps the whole family DuckDB-oracle-able.
  */
object Multimodal {

  /** The "media" collection: document bytes reinterpreted as an
    * opaque binary payload column — the plumbing is identical for
    * real image/audio bytes.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        encode(col("text"), "UTF-8").as("payload"))

  /** Run `media` (doc_id, source, payload) through `codec`: ONE
    * codec instance per partition — `open()` before the first item,
    * `close()` after the last — so a production codec amortizes
    * context/model init across a whole parquet row-group batch and
    * the payload bytes never shuffle (the decode is map-only; only
    * the much smaller feature record flows downstream).
    */
  def decodeWith(media: DataFrame, codec: MediaCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        codec.open()
        // close exactly once, and ALWAYS: eagerly at exhaustion (frees
        // codec contexts before downstream stage work continues), and
        // via the task-completion listener for the paths the iterator
        // contract can't see — a consumer that stops early (limit), or
        // a task failing mid-decode. A real codec holds native
        // contexts; "closed on the happy path only" is a leak.
        val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
        def closeOnce(): Unit =
          if (closed.compareAndSet(false, true)) codec.close()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        new Iterator[MediaFeatures] {
          def hasNext: Boolean = {
            val h = rows.hasNext
            if (!h) closeOnce()
            h
          }
          def next(): MediaFeatures = {
            val (id, src, bytes) = rows.next()
            codec.decode(id, src, bytes)
          }
        }
      }
  }

  /** The corpus's decoded-feature frame, materialized once per
    * (codec, corpus) — every `q_media_*` plan reads columns off this
    * frame. At cluster scale this is the table the ingest job
    * persists next to the raw bytes; here the session cache stands in
    * for that at-rest table.
    */
  def decoded(spark: SparkSession, sfDir: String,
              codec: MediaCodec = StubMediaCodec): DataFrame =
    IndexCache.materialized(spark, s"media-decoded#${codec.name}#$sfDir") {
      decodeWith(mediaTable(spark, sfDir), codec).toDF()
    }

  /** Typed decode of the corpus through `codec` (default stub) — the
    * uncached building block; [[decoded]] is the cached frame the
    * queries use.
    */
  def decodeFeatures(spark: SparkSession, sfDir: String,
                     codec: MediaCodec = StubMediaCodec): Dataset[MediaFeatures] =
    decodeWith(mediaTable(spark, sfDir), codec)

  /** Resize planning (aspect-preserving fit into 224×224) — the
    * geometry half of every image pre-processing stage, as a pure
    * per-row expression pipeline over the decoded frame: the pixel
    * work happens in the partition-local codec, but WHAT to resize
    * to is computed (and verified) relationally. No shuffle.
    */
  def qMediaResize(spark: SparkSession, sfDir: String,
                   codec: MediaCodec = StubMediaCodec): DataFrame = {
    val scale = least(lit(224.0) / col("width"), lit(224.0) / col("height"))
    decoded(spark, sfDir, codec)
      .select(col("doc_id"), col("width"), col("height"),
        floor(col("width") * scale).as("out_w"),
        floor(col("height") * scale).as("out_h"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling — every 4th frame index of each media row, the
    * video-pipeline shape (decode → sample → per-frame features): one
    * read of the decoded frame, one per-row explode of the sampled
    * index sequence, no shuffle. The per-frame digest stands in for
    * the frame's feature payload.
    */
  def qMediaFrames(spark: SparkSession, sfDir: String,
                   codec: MediaCodec = StubMediaCodec): DataFrame =
    decoded(spark, sfDir, codec)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        md5(concat(col("doc_id").cast("string"), lit("_"), col("frame_idx").cast("string")))
          .as("frame_key"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Audio windowing — the audio-pipeline twin of frame sampling:
    * fixed 1 s analysis windows with a 500 ms hop over each clip
    * (the universal STFT/feature-extraction pre-pass). Sample rate
    * and duration come off the decoded frame (the codec reads them
    * from the payload — header fields in a real codec); the window
    * plan — ids, start/end ms, start sample — is pure per-row
    * arithmetic + one explode, no shuffle: scan-bound at any corpus
    * size, exactly like the video frame sampler.
    */
  def qMediaAudio(spark: SparkSession, sfDir: String,
                  codec: MediaCodec = StubMediaCodec): DataFrame =
    decoded(spark, sfDir, codec)
      .select(col("doc_id"), col("sample_rate"), col("duration_ms"),
        explode(sequence(lit(0L), expr("(duration_ms - 1000) div 500"))).as("win_id"))
      .select(col("doc_id"), col("sample_rate"), col("duration_ms"), col("win_id"),
        (col("win_id") * 500).as("start_ms"),
        (col("win_id") * 500 + 1000).as("end_ms"),
        expr("win_id * 500 * sample_rate div 1000").as("start_sample"))
      .orderBy(col("doc_id"), col("win_id"))

  /** Row 28 (SQL-oracled): per-source metadata over the decoded
    * frame — byte sizes and content digests, the part of the
    * multimodal path DuckDB can replicate bit-for-bit. Single read,
    * map-side combinable aggregate.
    */
  def qMultimodalMeta(spark: SparkSession, sfDir: String,
                      codec: MediaCodec = StubMediaCodec): DataFrame =
    decoded(spark, sfDir, codec)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("n_bytes")), 6).as("avg_bytes"),
        countDistinct(col("digest")).as("n_unique"))
      .orderBy(col("source"))

  /** Exact media dedup (content-addressable-storage shape): the
    * binary payloads of the duplicate-augmented corpus decoded
    * through the codec and grouped by content digest — one row per
    * duplicate group with its keeper, copy count, and reclaimable
    * bytes. Unlike text dedup there is no normalization: media bytes
    * either match or don't, so the digest groupBy (16-byte keys,
    * map-side combinable) IS the whole operator — the petabyte-scale
    * dedup every multimodal lake runs at ingest. The augmented
    * corpus differs from the standing media corpus, so this decode
    * runs inline (the ingest-time pass itself), not off the cached
    * frame.
    */
  def qMediaDedup(spark: SparkSession, sfDir: String,
                  codec: MediaCodec = StubMediaCodec): DataFrame =
    decodeWith(
      Dedup.augmentedDocs(spark, sfDir)
        .select(col("doc_id"), lit("aug").as("source"),
          encode(col("text"), "UTF-8").as("payload")),
      codec).toDF()
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"),
        // copies are byte-identical, so every member has the same
        // size; reclaimable = all but the keeper
        (sum(col("n_bytes")) - max(col("n_bytes"))).as("wasted_bytes"))
      .filter(col("n_copies") > 1)
      .orderBy(col("keeper_id"))

  /** Near-media search (Weaviate `near_image` / `near_audio`): the
    * codec's feature vector — for the stub, the 26-dim
    * letter-frequency histogram of the payload bytes, deterministic
    * so the whole query is SQL-oracle-able; a real codec emits
    * CLIP/CLAP embeddings into the same column — and search is then
    * plain cosine top-k over the decoded frame, sharing every scale
    * property of the vector family (broadcast query set,
    * WindowGroupLimit partial top-k). The query item itself ranks
    * first at similarity 1 — near_image is "find items like this
    * one", self included.
    */
  def qMediaKnn(spark: SparkSession, sfDir: String): DataFrame =
    mediaKnn(spark, sfDir, col("doc_id") % 100 === 0)

  /** Perceptual media near-dup — the feature-space twin of
    * [[qMediaDedup]]'s byte-exact digest pass: the top-20
    * most-similar same-source pairs by feature cosine. Re-encodes,
    * crops, and transcodes of one asset have digest-DIFFERENT
    * payloads but near-identical feature vectors — exactly what the
    * digest pass cannot see. Pairs are blocked by source and
    * canonically ordered (a < b); the top-k plans as a TakeOrdered,
    * never a global sort. This exact blocked scorer is the ORACLE
    * baseline (the q_dedup_embedding doctrine); the production path
    * is the registered [[qMediaNearDupAuto]].
    */
  def qMediaNearDup(spark: SparkSession, sfDir: String,
                    codec: MediaCodec = StubMediaCodec): DataFrame = {
    val feats = decoded(spark, sfDir, codec)
      .select(col("doc_id"), col("source"), col("feature").as("v"))
    val a = feats.select(col("source"), col("doc_id").as("a"), col("v").as("va"))
    val b = feats.select(col("source"), col("doc_id").as("b"), col("v").as("vb"))
    a.join(b, Seq("source")).filter(col("a") < col("b"))
      .select(col("source"), col("a"), col("b"),
        round(graft.functions.vec.cosine(col("va"), col("vb")), 6).as("score"))
      .orderBy(col("score").desc, col("a"), col("b"))
      .limit(20)
  }

  /** The media corpus augmented with RE-ENCODES — every 9th item
    * re-serialized with its tokens reversed: payload bytes and digest
    * DIFFER (invisible to [[qMediaDedup]]'s digest pass) while the
    * letter-frequency feature is IDENTICAL (cosine exactly 1 with the
    * original) — the crop/transcode construction the perceptual pass
    * exists to catch. The 3e9 id offset keeps injected ids disjoint
    * from every other id band in use (the
    * [[Dedup.augmentedDocs]] discipline).
    */
  private[graft] def augmentedMedia(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val re = d.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 3000000000L).as("doc_id"), col("source"),
        concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
    d.unionByName(re)
      .select(col("doc_id"), col("source"), encode(col("text"), "UTF-8").as("payload"))
  }

  /** The PRODUCTION perceptual near-dup entry — codec features routed
    * through [[Dedup.embeddingNearDupAuto]] (source as the blocking
    * label, threshold 0.995: the near-identical regime where
    * re-encodes of one asset live; the corpus's organic same-source
    * pairs sit at median cosine ≈ 0.945, p99 ≈ 0.984). Exactly the
    * structure the embedding family got in rows 267–269: below the
    * measured crossover the auto verb resolves to the exact blocked
    * scorer — which keeps this entry DuckDB-oracle-able at driver
    * scale — and above it the corpus-adaptive LSH path runs, covered
    * by the MultimodalSpec subset-of-exact/recall spec and the
    * committed x10 slope artifact. [[qMediaNearDup]] stays the exact
    * all-pairs ORACLE baseline.
    */
  def qMediaNearDupAuto(spark: SparkSession, sfDir: String,
                        codec: MediaCodec = StubMediaCodec): DataFrame =
    mediaNearDupAuto(spark, sfDir, codec)

  /** [[qMediaNearDupAuto]] with the crossover exposed for the spec
    * (forcing the adaptive-LSH branch at test scale).
    */
  private[graft] def mediaNearDupAuto(spark: SparkSession, sfDir: String,
      codec: MediaCodec = StubMediaCodec,
      lshCrossover: Double = Dedup.LshCrossoverAvgBlock): DataFrame = {
    // decode ONCE: the auto verb probes the collection's size and then
    // self-joins it — without the materialization barrier each of those
    // consumers (and each join SIDE) would re-run the codec over the
    // whole corpus. Transient checkpoint: ids + label + 26 doubles per
    // row, reclaimed by the request-boundary hygiene.
    val feats = decodeWith(augmentedMedia(spark, sfDir), codec).toDF()
      .select(col("doc_id").as("vec_id"), col("feature").as("embedding"),
        col("source").as("label"))
      .localCheckpoint()
    Dedup.embeddingNearDupAuto(feats, threshold = 0.995, lshCrossover = lshCrossover)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"),
        col("label").as("source"), col("score"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** [[qMediaKnn]] with an explicit query-set predicate — the slope
    * harness uses a FIXED query set (base-replica ids only) to
    * separate the operator's corpus slope from the benchmark
    * query-set growth (the registered entry queries every 100th doc,
    * so its work grows as queries × corpus = quadratic in corpus
    * size BY CONSTRUCTION of the benchmark, not of the operator).
    */
  def mediaKnn(spark: SparkSession, sfDir: String, queryPred: Column,
               codec: MediaCodec = StubMediaCodec): DataFrame = {
    // features come off the materialized decoded frame (the
    // decode-at-ingest step — a real codec's embeddings would be
    // persisted exactly like the quantized vector corpora): without
    // the materialization barrier Catalyst would collapse the decode
    // into the scoring join and re-decode every payload once per
    // (query, doc) pair.
    val feats = decoded(spark, sfDir, codec).select(col("doc_id"), col("feature").as("v"))
    val q = feats.filter(queryPred)
      .select(col("doc_id").as("q_id"), col("v").as("qv"))
    val scored = feats.crossJoin(broadcast(q))
      .withColumn("score", round(graft.functions.vec.cosine(col("qv"), col("v")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("doc_id"), col("rn"), col("score"))
      .orderBy(col("q_id"), col("rn"))
  }
}
