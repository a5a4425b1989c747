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

  // ----------------------------------------------------------------
  // Product quantization (the Milvus/FAISS IVF_PQ code path): split
  // each vector into M subvectors, k-means each subspace to KStar
  // centroids, store one 4-bit-ish code per subvector (M bytes total,
  // 32x smaller than float32·64). Queries score via an ADC table —
  // per-query distances to every subspace centroid — then the top
  // candidate pool is exactly reranked.
  // ----------------------------------------------------------------

  val M = 8        // subvectors
  val SubDim = 8   // dims per subvector (M * SubDim = 64)
  val KStar = 16  // centroids per subspace
  val PqRerankPool = 100

  /** Trained codebooks per corpus dir — deterministic, so cached:
    * like IVF centroids, PQ codebooks are built once at ingest and
    * reused by every query, never retrained per search.
    */
  private val codebookCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Seq[Float]]]]()

  def trainPqCodebooks(spark: SparkSession, sfDir: String): Seq[Seq[Seq[Float]]] =
    codebookCache.computeIfAbsent(sfDir, _ => trainPqCodebooksUncached(spark, sfDir))

  /** Driver-side per-subspace Lloyd k-means on the deterministic
    * fixed-SIZE sample (every 3rd vector by id, capped at
    * [[Ann.TrainSampleCap]] rows — orderBy+limit compiles to a
    * per-partition top-k, so both scan and driver memory are bounded
    * at any corpus scale).
    */
  private def trainPqCodebooksUncached(spark: SparkSession, sfDir: String): Seq[Seq[Seq[Float]]] = {
    val sample = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 3 === 0).orderBy(col("vec_id"))
      .limit(Ann.TrainSampleCap)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    (0 until M).map { j =>
      val sub = sample.map(v => v.slice(j * SubDim, (j + 1) * SubDim))
      val n = sub.length
      var cents = Array.tabulate(KStar)(i => sub((i.toLong * n / KStar).toInt).clone())
      for (_ <- 0 until 10) {
        val sums = Array.fill(KStar)(new Array[Double](SubDim))
        val counts = new Array[Long](KStar)
        sub.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          for (c <- 0 until KStar) {
            var d = 0.0
            for (i <- 0 until SubDim) { val t = v(i) - cents(c)(i); d += t * t }
            if (d < bestD) { bestD = d; best = c }
          }
          counts(best) += 1
          for (i <- 0 until SubDim) sums(best)(i) += v(i)
        }
        cents = Array.tabulate(KStar)(c =>
          if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
      }
      cents.map(_.map(_.toFloat).toSeq).toSeq
    }
  }

  /** Per-query ADC table — all M × KStar squared distances
    * (||c||² − 2·c·s [+ ||s||²]) as ONE native matrix expression
    * (graft.functions.PqAdcTable): a single plan node and one fused
    * codegen loop, instead of an M·KStar-term literal tree re-planned
    * and re-compiled per query.
    */
  private def adcTable(embCol: org.apache.spark.sql.Column, codebooks: Seq[Seq[Seq[Float]]],
                       absolute: Boolean): org.apache.spark.sql.Column =
    graft.functions.matrixops.pqAdcTable(embCol, codebooks, SubDim, absolute)

  /** Encode: per-subspace nearest-centroid codes, M tinyints per row.
    * Pure expression, no shuffle: argmin over the ranking-only ADC
    * table (first-min index, matching the trained assignment).
    */
  def pqEncode(df: DataFrame, codebooks: Seq[Seq[Seq[Float]]],
               embCol: String = "embedding"): DataFrame = {
    val codes = transform(adcTable(col(embCol), codebooks, absolute = false),
      d => (array_position(d, array_min(d)) - 1).cast("tinyint"))
    df.withColumn("pq_codes", codes)
  }

  /** ADC distance: Σ_j adc[j][code_j], expanded to a static M-term
    * sum of GetArrayItem lookups so the whole expression stays inside
    * whole-stage codegen — the `aggregate()` higher-order form is
    * evaluated interpreted and was the hot path's bottleneck.
    */
  private def adcDist: org.apache.spark.sql.Column =
    (0 until M).map(j => col("adc")(j)(col("pq_codes")(j).cast("int"))).reduce(_ + _)

  /** Exact rerank of an id-only (q_id, vec_id) candidate pool: the
    * pool (|queries|·pool rows) is broadcast against the corpus scan,
    * so the full-precision embeddings are read once and never
    * shuffled; query vectors re-attach by a second broadcast join.
    */
  private def rerank(spark: SparkSession, sfDir: String, pool: DataFrame,
                     score: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column = vec.l2(_, _),
                     metricAsc: Boolean = true): DataFrame = {
    val ord = if (metricAsc) col("score").asc else col("score").desc
    val w = Window.partitionBy(col("q_id")).orderBy(ord, col("vec_id"))
    Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
      .join(broadcast(pool), "vec_id")
      .join(broadcast(VectorSearch.querySet(spark, sfDir).select(col("q_id"), col("q_emb"))), "q_id")
      .withColumn("score", round(score(col("q_emb"), col("embedding")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("rn"), col("score"))
      .orderBy(col("q_id"), col("rn"))
  }

  // ----------------------------------------------------------------
  // Binary quantization (Qdrant BQ / FAISS binary index): one sign
  // bit per dimension — the 64-dim embedding becomes ONE 64-bit word,
  // 32× smaller than float32. Candidates by Hamming distance
  // (bit_count(xor), single codegen'd instruction pair per pair),
  // exact rerank of the pool.
  // ----------------------------------------------------------------

  val BqPool = 100

  /** Sign-bit word: bit i set iff component i ≥ 0. One native fused
    * loop (graft.functions.SignBits) — pure codegen, no shuffle, no
    * training state.
    */
  def bqWord(embCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.matrixops.signBits(embCol)

  /** BQ kNN (rows-only): Hamming prefilter on the packed words, exact
    * cosine rerank. The candidate scan reads 8 bytes per vector —
    * at 100 TB the entire sign index of a 10^11-vector collection
    * fits in ~1 TB, and the Hamming pass shuffles only
    * (q_id, vec_id, hamming) triples pre-pruned by WindowGroupLimit.
    */
  def qBqKnn(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = IndexCache.materialized(spark, sfDir + "#bq") {
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), bqWord(col("embedding")).as("w"))
    }
    val queries = VectorSearch.querySet(spark, sfDir)
      .select(col("q_id"), bqWord(col("q_emb")).as("qw"))
    val wHam = Window.partitionBy(col("q_id")).orderBy(col("hamming").asc, col("vec_id"))
    val pool = corpus.crossJoin(broadcast(queries))
      .select(col("q_id"), col("vec_id"),
        bit_count(col("w").bitwiseXOR(col("qw"))).as("hamming"))
      .withColumn("hrn", row_number().over(wHam))
      .filter(col("hrn") <= BqPool)
      .select(col("q_id"), col("vec_id"))
    rerank(spark, sfDir, pool, vec.cosine(_, _), metricAsc = false)
  }

  /** PQ kNN (rows-only): ADC scoring over the M-byte codes, exact
    * rerank of the top `pool` candidates per query. The corpus-side
    * ADC scan touches only vec_id + codes — at 100 TB it reads 32×
    * fewer bytes than a float scan — and the ADC top-pool window
    * shuffles only (q_id, vec_id, adc_dist) triples, pre-pruned per
    * task by WindowGroupLimit.
    */
  def qPqKnn(spark: SparkSession, sfDir: String): DataFrame = {
    val codebooks = trainPqCodebooks(spark, sfDir)
    val corpus = IndexCache.materialized(spark, sfDir + "#pq-flat") {
      pqEncode(Tables.embeddings(spark, sfDir), codebooks)
        .select(col("vec_id"), col("pq_codes"))
    }
    val queries = VectorSearch.querySet(spark, sfDir)
      .withColumn("adc", adcTable(col("q_emb"), codebooks, absolute = true))
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc_dist").asc, col("vec_id"))
    val pool = corpus.select(col("vec_id"), col("pq_codes"))
      .crossJoin(broadcast(queries.select(col("q_id"), col("adc"))))
      .select(col("q_id"), col("vec_id"), adcDist.as("adc_dist"))
      .withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= PqRerankPool)
      .select(col("q_id"), col("vec_id"))
    rerank(spark, sfDir, pool, metricAsc = true)
  }

  /** IVF_PQ (rows-only): the combined index every Milvus/FAISS
    * deployment defaults to at scale — IVF centroids prune the
    * candidate set to nprobe/nlist of the corpus, PQ codes make the
    * surviving scan 32× narrower, ADC (codegen'd) scores it, and the
    * top pool is exactly reranked via broadcast joins. Composes
    * [[Ann]]'s probe machinery with the PQ path above.
    */
  def qIvfPqKnn(spark: SparkSession, sfDir: String): DataFrame = {
    val codebooks = trainPqCodebooks(spark, sfDir)
    val corpus = IndexCache.materialized(spark, sfDir + "#pq-ivf") {
      pqEncode(Ann.assignedCorpus(spark, sfDir), codebooks)
        .select(col("vec_id"), col("pq_codes"), col("cluster_id"))
    }
    val queries = Ann.probes(spark, sfDir)
      .withColumn("adc", adcTable(col("q_emb"), codebooks, absolute = true))
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc_dist").asc, col("vec_id"))
    val pool = corpus.select(col("vec_id"), col("pq_codes"), col("cluster_id"))
      .join(broadcast(queries.select(col("q_id"), col("adc"), col("cluster_id"))), "cluster_id")
      .select(col("q_id"), col("vec_id"), adcDist.as("adc_dist"))
      .withColumn("arn", row_number().over(wAdc))
      .filter(col("arn") <= PqRerankPool)
      .select(col("q_id"), col("vec_id"))
    rerank(spark, sfDir, pool, metricAsc = true)
  }

  /** SQ8 kNN (rows-only): cosine top-k over the dequantized corpus —
    * the scan reads 1/4 the bytes of the float corpus; scoring stays
    * in whole-stage codegen via the double-array overload of the
    * native cosine expression.
    */
  def qSq8Knn(spark: SparkSession, sfDir: String): DataFrame = {
    // the stored artifact is the int8 corpus; dequantization happens
    // at scan time in the query (it must not be materialized — that
    // would store the floats back)
    val corpus = IndexCache.materialized(spark, sfDir + "#sq8") {
        quantize(Tables.embeddings(spark, sfDir))
      }
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
