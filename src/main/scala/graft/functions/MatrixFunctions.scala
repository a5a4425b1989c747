package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Trained-matrix × vector expressions.
  *
  * The ANN index family (IVF centroids, PQ codebooks, binary sign
  * words — the Milvus/FAISS/Qdrant index machinery the reference
  * deploys) needs "distance of this row's vector to EVERY trained
  * vector" as a single value. Composing that from per-centroid dot
  * expressions works, but the literal tree grows with nlist × M —
  * hundreds of nodes that Catalyst re-analyzes and Janino re-compiles
  * on every query. These expressions embed the trained matrix as one
  * broadcast-style reference object and emit one fused loop: the plan
  * carries a single node, the generated code a single method, and per
  * row the matrix streams through the CPU cache once.
  *
  * Arithmetic is sequential double accumulation in the same order as
  * the per-centroid expression tree it replaces, so trained-index
  * results are bit-identical to the composed form.
  */
abstract class VectorMatrixExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float>/array<double> argument, got ${other.catalogString}")
  }

  protected def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** Interpreted: input array as double[]. */
  protected def extract(a: ArrayData): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    out
  }

  /** Codegen: statements materializing input `a` into `double[] vv`
    * (and `int vvn`).
    */
  protected def extractCode(ctx: CodegenContext, a: String, vv: String): String = {
    val i = ctx.freshName("i")
    val get = if (isFloat) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
    s"""int ${vv}n = $a.numElements();
       |double[] $vv = new double[${vv}n];
       |for (int $i = 0; $i < ${vv}n; $i++) { $vv[$i] = $get; }""".stripMargin
  }
}

/** IVF assignment/probe distances: for each trained centroid c,
  * ||c||² − 2·(c·v)/||v|| — cosine ordering on unit-trained
  * centroids, up to the per-row constant +1 (see Ann.centroidDists).
  * Output: array<double>, one entry per centroid.
  */
case class CentroidDistances(child: Expression, centroids: Array[Array[Float]])
    extends VectorMatrixExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val normSq: Array[Double] =
    centroids.map(c => c.map(x => x.toDouble * x.toDouble).sum)

  override def nullSafeEval(v: Any): Any = {
    val vv = extract(v.asInstanceOf[ArrayData])
    var nrm = 0.0
    var i = 0
    while (i < vv.length) { nrm += vv(i) * vv(i); i += 1 }
    nrm = math.sqrt(nrm)
    val out = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cc = centroids(c)
      val m = math.min(cc.length, vv.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += cc(j).toDouble * vv(j); j += 1 }
      out(c) = normSq(c) - 2.0 * dot / nrm
      c += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
      val norms = ctx.addReferenceObj("centroidNormSq", normSq, "double[]")
      val vv = ctx.freshName("vv")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      // every local via freshName: two graft expressions in ONE
      // whole-stage method both declaring a fixed `dot`/`cc`/`m` is a
      // Janino compile error that silently drops the stage to
      // interpreted eval
      val cc = ctx.freshName("cc")
      val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      s"""
         |${extractCode(ctx, a, vv)}
         |double $nrm = 0.0;
         |for (int $j = 0; $j < ${vv}n; $j++) { $nrm += $vv[$j] * $vv[$j]; }
         |$nrm = java.lang.Math.sqrt($nrm);
         |double[] $out = new double[$cents.length];
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  float[] $cc = $cents[$c];
         |  int $m = java.lang.Math.min($cc.length, ${vv}n);
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $m; $j++) { $dot += (double)$cc[$j] * $vv[$j]; }
         |  $out[$c] = $norms[$c] - 2.0 * $dot / $nrm;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "centroid_dists"
}

/** The `k` nearest centroid ids for an input vector, ascending by
  * (distance, id) — the single-pass replacement for sorting the full
  * [[CentroidDistances]] table per row. Distances compute ONCE
  * (O(nlist·dim)) and a bounded insertion-selection picks k; the
  * composed `transform(sequence(...), c -> struct(dists[c], c))` +
  * `array_sort` form embedded the distance EXPRESSION inside the
  * lambda, so Catalyst re-evaluated the whole matrix per lambda
  * element — O(nlist²·dim) per row, interpreted. Invisible at 16
  * lists; ~10⁸ multiplies per row at the adaptive geometry's
  * thousands (measured: all 32 executors pinned in
  * ArrayTransform.eval during an sf100 index build). Tie order
  * matches the struct sort exactly: ascending distance, then
  * ascending centroid id.
  */
case class NearestClusters(child: Expression, centroids: Array[Array[Float]], k: Int)
    extends VectorMatrixExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val normSq: Array[Double] =
    centroids.map(c => c.map(x => x.toDouble * x.toDouble).sum)

  override def nullSafeEval(v: Any): Any = {
    val vv = extract(v.asInstanceOf[ArrayData])
    var nrm = 0.0
    var i = 0
    while (i < vv.length) { nrm += vv(i) * vv(i); i += 1 }
    nrm = math.sqrt(nrm)
    val kk = math.min(k, centroids.length)
    val bestD = Array.fill(kk)(Double.MaxValue)
    val bestC = new Array[Int](kk)
    var c = 0
    while (c < centroids.length) {
      val cc = centroids(c)
      val m = math.min(cc.length, vv.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += cc(j).toDouble * vv(j); j += 1 }
      val d = normSq(c) - 2.0 * dot / nrm
      // ascending-c iteration + strict < keeps equal-distance ties in
      // centroid-id order, matching array_sort on struct(d, cid)
      if (d < bestD(kk - 1)) {
        var p = kk - 1
        while (p > 0 && d < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
        }
        bestD(p) = d; bestC(p) = c
      }
      c += 1
    }
    new GenericArrayData(bestC)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
      val norms = ctx.addReferenceObj("centroidNormSq", normSq, "double[]")
      val vv = ctx.freshName("vv")
      val nrm = ctx.freshName("nrm")
      val bd = ctx.freshName("bestD")
      val bc = ctx.freshName("bestC")
      val kk = ctx.freshName("kk")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val cc = ctx.freshName("cc")
      val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      s"""
         |${extractCode(ctx, a, vv)}
         |double $nrm = 0.0;
         |for (int $j = 0; $j < ${vv}n; $j++) { $nrm += $vv[$j] * $vv[$j]; }
         |$nrm = java.lang.Math.sqrt($nrm);
         |int $kk = java.lang.Math.min($k, $cents.length);
         |double[] $bd = new double[$kk];
         |int[] $bc = new int[$kk];
         |java.util.Arrays.fill($bd, Double.MAX_VALUE);
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  float[] $cc = $cents[$c];
         |  int $m = java.lang.Math.min($cc.length, ${vv}n);
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $m; $j++) { $dot += (double)$cc[$j] * $vv[$j]; }
         |  double $d = $norms[$c] - 2.0 * $dot / $nrm;
         |  if ($d < $bd[$kk - 1]) {
         |    int $p = $kk - 1;
         |    while ($p > 0 && $d < $bd[$p - 1]) {
         |      $bd[$p] = $bd[$p - 1]; $bc[$p] = $bc[$p - 1]; $p--;
         |    }
         |    $bd[$p] = $d; $bc[$p] = $c;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nearest_clusters"
}

/** PQ asymmetric-distance table: for subspace j and codebook entry c,
  * ||c||² − 2·(c·s_j) [+ ||s_j||² when absolute], where s_j is the
  * j-th subDim-wide slice of the input vector. Output:
  * array<array<double>> indexed [subspace][code] — the per-query ADC
  * lookup table (Quantization.subDists composed per entry before).
  */
case class PqAdcTable(child: Expression, codebooks: Array[Array[Array[Float]]],
                      subDim: Int, absolute: Boolean)
    extends VectorMatrixExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  @transient private lazy val normSq: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x.toDouble * x.toDouble).sum))

  override def nullSafeEval(v: Any): Any = {
    val vv = extract(v.asInstanceOf[ArrayData])
    val tables = new Array[org.apache.spark.sql.catalyst.util.ArrayData](codebooks.length)
    var j = 0
    while (j < codebooks.length) {
      val base = j * subDim
      var sNorm = 0.0
      if (absolute) {
        var i = 0
        while (i < subDim && base + i < vv.length) {
          val x = vv(base + i); sNorm += x * x; i += 1
        }
      }
      val cb = codebooks(j)
      val row = new Array[Double](cb.length)
      var c = 0
      while (c < cb.length) {
        val cc = cb(c)
        var dot = 0.0
        var i = 0
        while (i < cc.length && base + i < vv.length) {
          dot += cc(i).toDouble * vv(base + i); i += 1
        }
        row(c) = normSq(j)(c) - 2.0 * dot + sNorm
        c += 1
      }
      tables(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(tables.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val books = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
      val norms = ctx.addReferenceObj("codebookNormSq", normSq, "double[][]")
      val vv = ctx.freshName("vv")
      val tbl = ctx.freshName("tbl")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val sNorm = ctx.freshName("sNorm")
      val base = ctx.freshName("base")
      val cb = ctx.freshName("cb")
      val rowV = ctx.freshName("row")
      val cc = ctx.freshName("cc")
      val dot = ctx.freshName("dot")
      val x = ctx.freshName("x")
      val sNormCode =
        if (absolute)
          s"""for (int $i = 0; $i < $subDim && $base + $i < ${vv}n; $i++) {
             |  double $x = $vv[$base + $i]; $sNorm += $x * $x;
             |}""".stripMargin
        else ""
      s"""
         |${extractCode(ctx, a, vv)}
         |org.apache.spark.sql.catalyst.util.ArrayData[] $tbl =
         |  new org.apache.spark.sql.catalyst.util.ArrayData[$books.length];
         |for (int $j = 0; $j < $books.length; $j++) {
         |  int $base = $j * $subDim;
         |  double $sNorm = 0.0;
         |  $sNormCode
         |  float[][] $cb = $books[$j];
         |  double[] $rowV = new double[$cb.length];
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    float[] $cc = $cb[$c];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $cc.length && $base + $i < ${vv}n; $i++) {
         |      $dot += (double)$cc[$i] * $vv[$base + $i];
         |    }
         |    $rowV[$c] = $norms[$j][$c] - 2.0 * $dot + $sNorm;
         |  }
         |  $tbl[$j] = new org.apache.spark.sql.catalyst.util.GenericArrayData($rowV);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $tbl);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "pq_adc_table"
}

/** Binary-quantization word: bit i of the output long is set iff
  * component i (i < 64) of the vector is ≥ 0 — the Qdrant/FAISS
  * sign-bit code, one fused loop instead of a 64-term OR tree.
  * Components beyond the vector's length contribute 0 bits, matching
  * the null-item semantics of the composed form.
  */
case class SignBits(child: Expression) extends VectorMatrixExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val vv = extract(v.asInstanceOf[ArrayData])
    var w = 0L
    var i = 0
    val n = math.min(64, vv.length)
    while (i < n) { if (vv(i) >= 0) w |= 1L << i; i += 1 }
    w
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val vv = ctx.freshName("vv")
      val w = ctx.freshName("w")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |${extractCode(ctx, a, vv)}
         |long $w = 0L;
         |int $n = java.lang.Math.min(64, ${vv}n);
         |for (int $i = 0; $i < $n; $i++) { if ($vv[$i] >= 0) $w |= 1L << $i; }
         |${ev.value} = $w;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sign_bits"
}

/** Random-hyperplane LSH band buckets: with `planes` holding
  * `tables × bitsPerBand` hyperplanes row-major, output[t] =
  * Σ_{i<bitsPerBand} (plane[t·r+i] · v ≥ 0 ? 1 : 0) << i — one
  * `array<long>` of band buckets per row (long: the corpus-adaptive
  * chooser sizes r against the MEASURED random-pair collision
  * probability, and concentrated collections need r beyond 31 bits —
  * up to 62 fit a long exactly, no key hashing, no aliasing).
  *
  * This expression exists because banding is a CORPUS-ADAPTIVE knob
  * (`Dedup.chooseBanding`): r·b grows with corpus size and recall
  * target, and the composed per-plane expression tree grew CODE
  * with it — at (10, 48) the 480-term Project breached Janino's
  * method limits, fell back to interpreted eval, and turned a
  * signature scan into minutes. Here the plane matrix is a
  * REFERENCE OBJECT (data, not code): the plan carries one node,
  * the generated method two fixed loops, and any (r, b) the chooser
  * picks compiles to the same few hundred bytes. Dot accumulation
  * is sequential double, bit-identical to the composed
  * `vec_dot ≥ 0` form it replaces.
  */
case class LshBandBuckets(child: Expression, planes: Array[Array[Float]],
                          bitsPerBand: Int)
    extends VectorMatrixExpression {
  require(bitsPerBand >= 1 && bitsPerBand <= 62,
    s"bitsPerBand out of [1, 62]: $bitsPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def tables: Int = planes.length / bitsPerBand

  override def nullSafeEval(v: Any): Any = {
    val vv = extract(v.asInstanceOf[ArrayData])
    val out = new Array[Long](tables)
    var t = 0
    while (t < out.length) {
      var bucket = 0L
      var i = 0
      while (i < bitsPerBand) {
        val p = planes(t * bitsPerBand + i)
        val m = math.min(p.length, vv.length)
        var dot = 0.0
        var j = 0
        while (j < m) { dot += p(j).toDouble * vv(j); j += 1 }
        if (dot >= 0) bucket |= 1L << i
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("lshPlanes", planes, "float[][]")
      val vv = ctx.freshName("vv")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      // every local via freshName: a fixed identifier colliding with
      // an enclosing codegen scope is a Janino compile error that
      // silently drops the stage to interpreted eval
      val bucket = ctx.freshName("bucket")
      val pRow = ctx.freshName("p")
      val m = ctx.freshName("m")
      val dot = ctx.freshName("dot")
      s"""
         |${extractCode(ctx, a, vv)}
         |long[] $out = new long[$pl.length / $bitsPerBand];
         |for (int $t = 0; $t < $out.length; $t++) {
         |  long $bucket = 0L;
         |  for (int $i = 0; $i < $bitsPerBand; $i++) {
         |    float[] $pRow = $pl[$t * $bitsPerBand + $i];
         |    int $m = java.lang.Math.min($pRow.length, ${vv}n);
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $m; $j++) { $dot += (double)$pRow[$j] * $vv[$j]; }
         |    if ($dot >= 0) $bucket |= 1L << $i;
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "lsh_band_buckets"
}

/** Dense trained-matrix × vector product: out[i] = Σ_j M[i][j]·v[j].
  * The OPQ serving primitive (FAISS OPQMatrix apply): the learned
  * orthogonal rotation is a REFERENCE OBJECT, so rotating a 64-dim
  * vector is one fused 64×64 loop per row inside whole-stage codegen —
  * the composed transform/aggregate HOF form evaluates interpreted
  * and re-walks the literal matrix per output element. Components
  * beyond the matrix's column count contribute 0 (matching the
  * dot-product truncation of the other expressions here); output
  * length is the matrix's row count.
  */
case class MatVec(child: Expression, matrix: Array[Array[Float]])
    extends VectorMatrixExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val vv = extract(v.asInstanceOf[ArrayData])
    val out = new Array[Double](matrix.length)
    var i = 0
    while (i < matrix.length) {
      val row = matrix(i)
      val m = math.min(row.length, vv.length)
      var acc = 0.0
      var j = 0
      while (j < m) { acc += row(j).toDouble * vv(j); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("matrix", matrix, "float[][]")
      val vv = ctx.freshName("vv")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      // every local goes through freshName: a fixed identifier that
      // collides with one in the enclosing codegen scope is a Janino
      // compile error, and the whole stage silently falls back to
      // interpreted eval — defeating the expression's purpose
      val row = ctx.freshName("row")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |${extractCode(ctx, a, vv)}
         |double[] $out = new double[$mat.length];
         |for (int $i = 0; $i < $mat.length; $i++) {
         |  float[] $row = $mat[$i];
         |  int $m = java.lang.Math.min($row.length, ${vv}n);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m; $j++) { $acc += (double)$row[$j] * $vv[$j]; }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "mat_vec"
}

/** Column API over the matrix expressions. */
object matrixops {
  def centroidDists(emb: Column, centroids: Seq[Seq[Float]]): Column =
    ColumnBridge.column(
      CentroidDistances(ColumnBridge.expression(emb), centroids.map(_.toArray).toArray))

  def pqAdcTable(emb: Column, codebooks: Seq[Seq[Seq[Float]]], subDim: Int,
                 absolute: Boolean): Column =
    ColumnBridge.column(
      PqAdcTable(ColumnBridge.expression(emb),
        codebooks.map(_.map(_.toArray).toArray).toArray, subDim, absolute))

  def signBits(emb: Column): Column =
    ColumnBridge.column(SignBits(ColumnBridge.expression(emb)))

  def lshBandBuckets(emb: Column, planes: Seq[Seq[Float]], bitsPerBand: Int): Column =
    ColumnBridge.column(
      LshBandBuckets(ColumnBridge.expression(emb), planes.map(_.toArray).toArray, bitsPerBand))

  def nearestClusters(emb: Column, centroids: Seq[Seq[Float]], k: Int): Column =
    ColumnBridge.column(
      NearestClusters(ColumnBridge.expression(emb), centroids.map(_.toArray).toArray, k))

  def matVec(emb: Column, matrix: Seq[Seq[Float]]): Column =
    ColumnBridge.column(
      MatVec(ColumnBridge.expression(emb), matrix.map(_.toArray).toArray))
}
