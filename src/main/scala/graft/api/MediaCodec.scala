package graft.api

/** The typed record a media decode emits — one row per media item,
  * carrying everything the downstream relational pipeline consumes:
  * geometry (resize planning, frame sampling), audio timing (window
  * planning), a content digest (exact dedup), and a dense feature
  * vector (near-media search). A real CLIP/CLAP codec fills the same
  * record from actual codec headers and model forward passes; the
  * query plans never see the difference.
  */
case class MediaFeatures(
    doc_id: Long,
    source: String,
    n_bytes: Long,
    digest: String,
    width: Long,
    height: Long,
    n_frames: Long,
    sample_rate: Long,
    duration_ms: Long,
    feature: Array[Double])

/** The pluggable bytes→features boundary of the multimodal pipeline
  * (reference: Weaviate `near_image`/`near_audio` modules — the
  * codec/model runs next to the data, the database only ever sees
  * the emitted features).
  *
  * Contract: [[graft.operators.Multimodal.decodeWith]] runs one codec
  * instance per PARTITION — [[open]] once before the first item
  * (load codec contexts, map model weights), [[decode]] per item,
  * [[close]] after the last — inside a single `mapPartitions` stage,
  * so a production codec amortizes its init across a whole parquet
  * row-group batch and never serializes per-row. Everything
  * downstream of this seam is relational: decoded frames are
  * materialized once per (codec, corpus) and every `q_media_*` plan
  * reads columns off that frame, so swapping the codec changes ONLY
  * the feature values, not a single query plan.
  *
  * Implementations must be [[Serializable]] (the instance ships to
  * executors) and deterministic per payload if their outputs feed
  * oracled queries.
  */
trait MediaCodec extends Serializable {

  /** Codec identity — part of the decoded-frame cache key, so two
    * codecs never share a materialized feature frame.
    */
  def name: String

  /** Once per partition, before the first [[decode]]. */
  def open(): Unit = ()

  /** Once per partition, after the last [[decode]]. */
  def close(): Unit = ()

  /** Decode ONE media item into its typed feature record. */
  def decode(docId: Long, source: String, payload: Array[Byte]): MediaFeatures
}

/** The default (and declared-stub) codec: the codec libraries are
  * not in this environment, so geometry, audio timing, and the
  * feature vector derive DETERMINISTICALLY from the payload bytes —
  * bit-reproducible in the DuckDB oracle, which is what keeps the
  * whole multimodal family hash-verifiable end to end. The
  * arithmetic mirrors the SQL the oracles use:
  * `width = 64 + n % 128`, `height = 64 + 7n % 128`,
  * `n_frames = 1 + n % 16`, `sample_rate = 8000 + (n % 3)·4000`,
  * `duration_ms = 1000 + 13n % 9000`, digest = MD5 hex, feature =
  * the 26-dim letter-frequency histogram of the UTF-8 payload.
  */
object StubMediaCodec extends MediaCodec {
  override def name: String = "stub"

  override def decode(docId: Long, source: String, payload: Array[Byte]): MediaFeatures = {
    val n = payload.length.toLong
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(payload).map("%02x".format(_)).mkString
    val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val hist = new Array[Double](26)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c >= 'a' && c <= 'z') hist(c - 'a') += 1.0
      i += 1
    }
    MediaFeatures(
      doc_id = docId,
      source = source,
      n_bytes = n,
      digest = digest,
      width = 64L + n % 128,
      height = 64L + (n * 7) % 128,
      n_frames = 1L + n % 16,
      sample_rate = 8000L + (n % 3) * 4000L,
      duration_ms = 1000L + (n * 13) % 9000,
      feature = hist)
  }
}
