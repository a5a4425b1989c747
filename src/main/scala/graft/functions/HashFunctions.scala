package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fingerprint primitives as native codegen'd expressions.
  *
  * The dedup family's hot path is per-document signature computation.
  * Written with Spark's higher-order array lambdas (`aggregate` /
  * `transform`) these run interpreted — 64 boxed lambda calls per
  * token per document made SimHash the slowest operator in the suite
  * (120 s at sf0.1). As native `UnaryExpression`s the same math is a
  * tight generated-Java loop inside whole-stage codegen: linear,
  * allocation-free, and two orders of magnitude faster — the
  * difference between a dedup pass over 100 TB finishing or not.
  */

/** 64-bit SimHash over an array of 64-bit token hashes: majority vote
  * per bit position (strict majority sets the bit).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = a.getLong(i)
      var j = 0
      while (j < 64) { cnt(j) += ((h >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < 64) { if (2 * cnt(j) > n) r |= (1L << j); j += 1 }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val h = ctx.freshName("h"); val r = ctx.freshName("r")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) { $cnt[$j] += (int)(($h >>> $j) & 1L); }
         |}
         |long $r = 0L;
         |for (int $j = 0; $j < 64; $j++) { if (2 * $cnt[$j] > $n) $r |= (1L << $j); }
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
  override def prettyName: String = "simhash64"
}

/** MinHash signature over an array of raw 64-bit shingle hashes:
  * sig[k] = min over shingles x of (a_k · (x mod p) + b_k) mod p,
  * with the (a, b) coefficient table baked in as a literal.
  */
case class MinHashSignature(child: Expression, coeffA: Seq[Long], coeffB: Seq[Long], prime: Long)
    extends UnaryExpression {
  require(coeffA.length == coeffB.length)
  private val nPerm = coeffA.length
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got ${other.catalogString}")
  }

  @transient private lazy val aArr = coeffA.toArray
  @transient private lazy val bArr = coeffB.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(nPerm)(prime)
    var i = 0
    while (i < n) {
      val xm = ((arr.getLong(i) % prime) + prime) % prime
      var k = 0
      while (k < nPerm) {
        val v = (aArr(k) * xm + bArr(k)) % prime
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val xm = ctx.freshName("xm"); val v = ctx.freshName("v")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      s"""
         |int $n = $arr.numElements();
         |long[] $sig = new long[$nPerm];
         |java.util.Arrays.fill($sig, ${prime}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xm = (($arr.getLong($i) % ${prime}L) + ${prime}L) % ${prime}L;
         |  for (int $k = 0; $k < $nPerm; $k++) {
         |    long $v = ($aRef[$k] * $xm + $bRef[$k]) % ${prime}L;
         |    if ($v < $sig[$k]) $sig[$k] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** Column-level API. */
/** Per-term occurrence counts of a LITERAL term list over an
  * array<string> of tokens: one pass, counts in term order. The
  * lexical scorers' tf computation — as a higher-order
  * `filter(toks, _ = t)` per term this ran interpreted (boxed lambda
  * eval per token per term — measured ~1 s/query over the corpus);
  * as a native expression it is a tight generated loop inside
  * whole-stage codegen, like the signature primitives above.
  */
case class TermCounts(child: Expression, terms: Seq[String]) extends UnaryExpression {
  require(terms.nonEmpty, "term_counts needs a non-empty term list")
  private val nTerms = terms.length
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_counts requires array<string>, got ${other.catalogString}")
  }

  @transient private lazy val termU: Array[org.apache.spark.unsafe.types.UTF8String] =
    terms.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Long](nTerms)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        var j = 0
        while (j < nTerms) { if (termU(j).equals(s)) cnt(j) += 1; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(cnt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("termCountsTerms", termU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $n = $arr.numElements();
         |long[] $cnt = new long[$nTerms];
         |for (int $i = 0; $i < $n; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |  if ($s != null) {
         |    for (int $j = 0; $j < $nTerms; $j++) {
         |      if ($tRef[$j].equals($s)) $cnt[$j]++;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cnt);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
  override def prettyName: String = "term_counts"
}

object hashes {
  /** SimHash of an array<bigint> of token hashes. */
  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))

  /** MinHash signature of an array<bigint> of shingle hashes. */
  def minhashSignature(shingleHashes: Column, coeffA: Seq[Long], coeffB: Seq[Long],
                       prime: Long): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingleHashes), coeffA, coeffB, prime))

  /** Deterministic md5 bucket of a string key in [0, mod) — the
    * engine-portable stand-in for an RNG (stable across runs,
    * cluster topologies, and the DuckDB oracle, where the same
    * expression is `CAST('0x' || substring(md5(k), 1, 8) AS BIGINT)
    * % mod`). Used for sampling, slicing, and synthetic profiles.
    */
  def md5Bucket(key: Column, mod: Long): Column = {
    import org.apache.spark.sql.functions.{conv, lit, md5, pmod, substring}
    pmod(conv(substring(md5(key), 1, 8), 16, 10).cast("long"), lit(mod))
  }

  /** Occurrence counts of a literal term list over array<string>
    * tokens, in term order.
    */
  def termCounts(tokens: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TermCounts(ColumnBridge.expression(tokens), terms))
}
