package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Bulk-import readers for vector collections — the ingest formats
  * the reference's backends accept (parquet/JSON lines/delimited
  * text), normalized to the collection contract: embedding column as
  * `array<float>`.
  *
  * All readers are plain DataFrame sources, so schema pruning and
  * (for parquet) predicate pushdown apply; at 100 TB ingest is a
  * parallel read + cast, no driver involvement.
  */
object CollectionSource {

  /** Cast the embedding column to array<float> whatever numeric array
    * the source produced (JSON gives array<double>).
    */
  private def normalize(df: DataFrame, embCol: String): DataFrame =
    df.schema(embCol).dataType match {
      case ArrayType(FloatType, _) => df
      case _: ArrayType            => df.withColumn(embCol, col(embCol).cast("array<float>"))
      case other => throw new IllegalArgumentException(
        s"$embCol must be an array column, got ${other.catalogString}")
    }

  def parquet(spark: SparkSession, path: String, embCol: String = "embedding"): DataFrame =
    normalize(spark.read.parquet(path), embCol)

  /** ORC import — the other columnar format with native Spark
    * readers; predicate pushdown and column pruning apply as with
    * parquet (ORC carries its own min/max stripe statistics).
    */
  def orc(spark: SparkSession, path: String, embCol: String = "embedding"): DataFrame =
    normalize(spark.read.orc(path), embCol)

  /** JSON-lines import: numbers parse as doubles, cast down. */
  def jsonLines(spark: SparkSession, path: String, embCol: String = "embedding"): DataFrame =
    normalize(spark.read.json(path), embCol)

  /** Delimited-text import where the embedding is a single field of
    * `sep`-joined numbers (the common CSV export shape for vectors).
    */
  def delimited(spark: SparkSession, path: String, embCol: String = "embedding",
                sep: String = ";", header: Boolean = true): DataFrame = {
    val raw = spark.read.option("header", header.toString).csv(path)
    raw.withColumn(embCol, split(col(embCol), sep).cast("array<float>"))
  }

  /** Raw media import via Spark's `binaryFile` source — the ingest
    * half of the multimodal pipeline (one row per file: path,
    * modification time, length, content bytes). `pathGlobFilter`
    * prunes at the LISTING level, so ingesting the .jpg subset of a
    * 100 TB bucket never opens the other files; downstream this
    * frame feeds [[graft.operators.Multimodal]]'s decode/feature
    * stages unchanged.
    */
  def binaryFiles(spark: SparkSession, path: String,
                  globFilter: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    globFilter.fold(reader)(g => reader.option("pathGlobFilter", g)).load(path)
  }
}
