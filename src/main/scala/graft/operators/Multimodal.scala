package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing (SURVEY.md §2 row 28): media payloads
  * as opaque `binary` columns with typed metadata, exactly how a
  * 100 TB training-data lake stores image/audio bytes next to the
  * text and embeddings they belong to.
  *
  * The *decode* step (JPEG/audio codec) is STUBBED — the codec
  * libraries are not in this environment — with a deterministic fake
  * that reads structural bytes, so the Spark-side contract that
  * matters at scale is real and tested: binary column handling,
  * schema of the extracted features, per-partition batching, and the
  * aggregation shapes downstream.
  */
object Multimodal {

  /** A typed media-feature record, the schema a real decoder would
    * emit (dimensions, frame count, channel stats).
    */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      digest: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** The "media" collection: document bytes reinterpreted as an
    * opaque binary payload column — the plumbing is identical for
    * real image/audio bytes.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: a real implementation would hand `payload` to a
    * codec (JPEG/PNG/PCM) per partition. The fake derives
    * "dimensions" deterministically from payload bytes so the
    * pipeline shape — mapPartitions over binary, one codec init per
    * partition, typed output — is the production one.
    */
  def decodeFeatures(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // codec initialization would happen once per partition here
        rows.map { case (id, bytes) =>
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString
          MediaFeatures(
            doc_id = id,
            n_bytes = bytes.length.toLong,
            digest = digest,
            width = 64 + (bytes.headOption.getOrElse(0: Byte) & 0x7f),
            height = 64 + (bytes.lastOption.getOrElse(0: Byte) & 0x7f),
            n_frames = 1 + bytes.length % 16)
        }
      }
  }

  /** Row 28 (SQL-oracled): per-source metadata over the binary
    * payload column — byte sizes and content digests, the part of the
    * multimodal path DuckDB can replicate bit-for-bit. Single scan,
    * map-side combinable aggregate.
    */
  def qMultimodalMeta(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("source"), length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("n_bytes")), 6).as("avg_bytes"),
        countDistinct(col("digest")).as("n_unique"))
      .orderBy(col("source"))
}
