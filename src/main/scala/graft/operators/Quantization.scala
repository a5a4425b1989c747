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
    * -128..127 as int8-ish ints). `dropEmb = false` keeps the float
    * column alongside the codes — the at-rest layout stores both (the
    * codes serve the scan, the floats serve the rerank) and relies on
    * parquet column pruning so a code-only read never touches them.
    */
  def quantize(df: DataFrame, embCol: String = "embedding",
               dropEmb: Boolean = true): DataFrame = {
    val q = df
      .withColumn("__mn", array_min(col(embCol)).cast("double"))
      .withColumn("__mx", array_max(col(embCol)).cast("double"))
      .withColumn("sq8_scale",
        when(col("__mx") > col("__mn"), (col("__mx") - col("__mn")) / 255.0).otherwise(lit(1.0)))
      .withColumn("sq8_min", col("__mn"))
      .withColumn("sq8", expr(
        s"transform($embCol, x -> cast(round((x - __mn) / sq8_scale) - 128 as tinyint))"))
      .drop("__mn", "__mx")
    if (dropEmb) q.drop(embCol) else q
  }

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
  private def trainPqCodebooksUncached(spark: SparkSession, sfDir: String): Seq[Seq[Seq[Float]]] =
    trainPqCodebooksFrom(Tables.embeddings(spark, sfDir),
      Ann.trainCentroids(spark, sfDir))

  /** RESIDUAL codebooks (the FAISS IVF_PQ training shape): each
    * sample vector is assigned to its nearest IVF centroid — the same
    * ranking [[graft.functions.NearestClusters]] serves, normalized
    * query side — and the subspace k-means trains on the RESIDUAL
    * v − c. Raw-vector codebooks spend the 4-bit-per-subspace budget
    * encoding where in the cloud a vector sits — which the cluster id
    * already says — and on a concentrated cloud the distinctions that
    * decide top-k live entirely below that scale: measured recall@10
    * on the aniso-sf100 corpus was 0.427 (IVFPQ) / 0.400 (flat PQ)
    * with raw codes. Residuals re-center every list at the origin, so
    * the codebooks resolve the within-list scale where neighbors
    * actually differ.
    */
  private[operators] def trainPqCodebooksFrom(corpus: DataFrame,
      cents: Seq[Seq[Float]]): Seq[Seq[Seq[Float]]] = {
    val raw = corpus
      .filter(col("vec_id") % 3 === 0).orderBy(col("vec_id"))
      .limit(Ann.TrainSampleCap)
      .select(col("embedding")).collect()
      .map(r => Ann.numericArray(r.getSeq[Any](0)))
    val cc = cents.map(_.toArray.map(_.toDouble)).toArray
    val ccNormSq = cc.map(c => c.map(x => x * x).sum)
    val sample = raw.map { v =>
      var nrm = 0.0; var i = 0
      while (i < v.length) { nrm += v(i) * v(i); i += 1 }
      nrm = math.sqrt(nrm)
      var best = 0; var bestD = Double.MaxValue; var c = 0
      while (c < cc.length) {
        var dot = 0.0; var j = 0
        val m = math.min(cc(c).length, v.length)
        while (j < m) { dot += cc(c)(j) * v(j); j += 1 }
        val d = ccNormSq(c) - 2.0 * dot / math.max(1e-12, nrm)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      val r = new Array[Double](v.length)
      var k = 0
      while (k < v.length) {
        r(k) = v(k) - (if (k < cc(best).length) cc(best)(k) else 0.0); k += 1
      }
      r
    }
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
  private[operators] def adcTable(embCol: org.apache.spark.sql.Column, codebooks: Seq[Seq[Seq[Float]]],
                                  absolute: Boolean): org.apache.spark.sql.Column =
    graft.functions.matrixops.pqAdcTable(embCol, codebooks, SubDim, absolute)

  /** Encode: per-subspace nearest-centroid codes, M tinyints per row.
    * Pure expression, no shuffle: argmin over the ranking-only ADC
    * table (first-min index, matching the trained assignment).
    */
  def pqEncode(df: DataFrame, codebooks: Seq[Seq[Seq[Float]]],
               embCol: String = "embedding"): DataFrame =
    pqEncodeCol(df, codebooks, col(embCol))

  /** [[pqEncode]] over an arbitrary vector expression — the residual
    * encode path ([[VectorIndex]] passes v − c of the row's assigned
    * cluster).
    */
  private[operators] def pqEncodeCol(df: DataFrame,
      codebooks: Seq[Seq[Seq[Float]]],
      embCol: org.apache.spark.sql.Column): DataFrame = {
    val codes = transform(adcTable(embCol, codebooks, absolute = false),
      d => (array_position(d, array_min(d)) - 1).cast("tinyint"))
    df.withColumn("pq_codes", codes)
  }

  /** Decode M codes back to the quantized vector (concatenated
    * codebook entries) — the flat-PQ serving path for RESIDUAL
    * layouts reconstructs v̂ = decode(codes) + c once inside the
    * served view. HOF + element_at over a single nested literal:
    * M lookups per row, materialized once per session.
    */
  private[operators] def pqReconstruct(codesCol: org.apache.spark.sql.Column,
      codebooks: Seq[Seq[Seq[Float]]]): org.apache.spark.sql.Column = {
    val cb = typedLit(codebooks)
    flatten(transform(sequence(lit(0), lit(M - 1)),
      j => element_at(element_at(cb, j + 1), codesCol(j).cast("int") + 1)))
  }

  /** ADC distance: Σ_j adc[j][code_j], expanded to a static M-term
    * sum of GetArrayItem lookups so the whole expression stays inside
    * whole-stage codegen — the `aggregate()` higher-order form is
    * evaluated interpreted and was the hot path's bottleneck.
    */
  private[operators] def adcDist: org.apache.spark.sql.Column =
    (0 until M).map(j => col("adc")(j)(col("pq_codes")(j).cast("int"))).reduce(_ + _)

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

  /** BQ kNN (rows-only), served from the AT-REST index's persisted
    * sign words ([[VectorIndex.searchBq]]): Hamming prefilter reading
    * 8 bytes per vector — at 100 TB the entire sign index of a
    * 10^11-vector collection fits in ~1 TB — then exact cosine rerank
    * from the stored floats. The Hamming pass shuffles only
    * (q_id, vec_id, hamming) triples pre-pruned by WindowGroupLimit.
    */
  def qBqKnn(spark: SparkSession, sfDir: String): DataFrame =
    VectorIndex.searchBq(spark, VectorIndex.sessionIndexPath(spark, sfDir),
      VectorSearch.querySet(spark, sfDir))

  /** PQ kNN (rows-only), served from the AT-REST index's persisted
    * codes ([[VectorIndex.searchPq]] — encoded once at ingest, a
    * restart re-encodes nothing): ADC scoring over the M-byte codes,
    * exact rerank of the top `pool` candidates per query. The ADC
    * scan touches only vec_id + codes — at 100 TB it reads 32× fewer
    * bytes than a float scan — and the top-pool window shuffles only
    * (q_id, vec_id, adc_dist) triples, pre-pruned per task by
    * WindowGroupLimit.
    */
  def qPqKnn(spark: SparkSession, sfDir: String): DataFrame =
    VectorIndex.searchPq(spark, VectorIndex.sessionIndexPath(spark, sfDir),
      VectorSearch.querySet(spark, sfDir))

  /** IVF_PQ (rows-only): the combined index every Milvus/FAISS
    * deployment defaults to at scale, served from the at-rest layout
    * ([[VectorIndex.searchIvfPq]]) — IVF probes PARTITION-prune the
    * index scan to nprobe/nlist of the files, the persisted PQ codes
    * make the surviving scan 32× narrower, ADC (codegen'd) scores it,
    * and the top pool is exactly reranked via broadcast joins.
    */
  def qIvfPqKnn(spark: SparkSession, sfDir: String): DataFrame =
    VectorIndex.searchIvfPq(spark, VectorIndex.sessionIndexPath(spark, sfDir),
      VectorSearch.querySet(spark, sfDir))

  /** SQ8 kNN (rows-only), served from the AT-REST index's persisted
    * int8 codes ([[VectorIndex.searchSq8]]): cosine top-k over the
    * scan-time-dequantized corpus — the scan reads 1/4 the bytes of
    * the float corpus (which is never touched); scoring stays in
    * whole-stage codegen via the double-array overload of the native
    * cosine expression.
    */
  def qSq8Knn(spark: SparkSession, sfDir: String): DataFrame =
    VectorIndex.searchSq8(spark, VectorIndex.sessionIndexPath(spark, sfDir),
      VectorSearch.querySet(spark, sfDir))
}
