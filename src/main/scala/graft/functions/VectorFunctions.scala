package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector similarity primitives as native Catalyst expressions.
  *
  * The reference's query surface (the Chroma/Milvus/Qdrant/Weaviate kNN
  * APIs behind its VECTOR_DB switch — /root/reference/README.md:69-83)
  * exposes cosine / L2 / inner-product metrics. Each metric here is a
  * codegen'd `BinaryExpression` over `array<float>` or `array<double>`
  * (mixed is fine), so the scoring loop runs inside whole-stage
  * codegen — no UDF serialization, no per-element boxing — which is
  * what keeps a 100 TB brute-force scan compute-bound instead of
  * allocation-bound.
  *
  * Determinism contract (SURVEY.md §5): accumulation is sequential in
  * double precision, matching DuckDB's `list_*` functions on
  * `DOUBLE[]`, so oracle hashes agree after `round(·, 6)`.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** Number of double accumulators (`acc0..accN-1`) the loop uses. */
  private[functions] def accSize: Int
  /** Java statement(s) updating the accumulators; `x`/`y` are double
    * expressions for element `i` of each side.
    */
  private[functions] def loopBody(x: String, y: String): String
  /** Java expression producing the final double from the accumulators. */
  private[functions] def finishCode: String

  /** Scala twin of the generated loop (interpreted fallback). */
  private[functions] def combine(x: Double, y: Double, acc: Array[Double]): Unit
  private[functions] def finishEval(acc: Array[Double]): Double

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    val acc = new Array[Double](accSize)
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      combine(x, y, acc)
      i += 1
    }
    finishEval(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val decls = (0 until accSize).map(j => s"double acc$j = 0.0;").mkString(" ")
      def elem(arr: String, float: Boolean) =
        if (float) s"(double)$arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |$decls
         |for (int $i = 0; $i < $n; $i++) {
         |  ${loopBody(elem(a, isFloat(left)), elem(b, isFloat(right)))}
         |}
         |${ev.value} = $finishCode;
       """.stripMargin
    })
}

/** Inner product: sum_i a_i * b_i. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  private[functions] def accSize = 1
  private[functions] def combine(x: Double, y: Double, acc: Array[Double]): Unit = acc(0) += x * y
  private[functions] def finishEval(acc: Array[Double]): Double = acc(0)
  private[functions] def loopBody(x: String, y: String): String = s"acc0 += $x * $y;"
  private[functions] def finishCode: String = "acc0"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "vec_dot"
}

/** Euclidean (L2) distance: sqrt(sum_i (a_i - b_i)^2). */
case class L2Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  private[functions] def accSize = 1
  private[functions] def combine(x: Double, y: Double, acc: Array[Double]): Unit = { val d = x - y; acc(0) += d * d }
  private[functions] def finishEval(acc: Array[Double]): Double = math.sqrt(acc(0))
  private[functions] def loopBody(x: String, y: String): String =
    s"{ double d = $x - $y; acc0 += d * d; }"
  private[functions] def finishCode: String = "java.lang.Math.sqrt(acc0)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "vec_l2"
}

/** Manhattan (L1) distance: sum_i |a_i - b_i|. */
case class L1Distance(left: Expression, right: Expression) extends VectorBinaryExpression {
  private[functions] def accSize = 1
  private[functions] def combine(x: Double, y: Double, acc: Array[Double]): Unit = acc(0) += math.abs(x - y)
  private[functions] def finishEval(acc: Array[Double]): Double = acc(0)
  private[functions] def loopBody(x: String, y: String): String =
    s"acc0 += java.lang.Math.abs($x - $y);"
  private[functions] def finishCode: String = "acc0"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "vec_l1"
}

/** Cosine similarity: dot(a,b) / (||a|| * ||b||). */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  private[functions] def accSize = 3
  private[functions] def combine(x: Double, y: Double, acc: Array[Double]): Unit = {
    acc(0) += x * y; acc(1) += x * x; acc(2) += y * y
  }
  private[functions] def finishEval(acc: Array[Double]): Double =
    acc(0) / (math.sqrt(acc(1)) * math.sqrt(acc(2)))
  private[functions] def loopBody(x: String, y: String): String =
    s"""{ double x = $x; double y = $y;
       |  acc0 += x * y; acc1 += x * x; acc2 += y * y; }""".stripMargin
  private[functions] def finishCode: String =
    "acc0 / (java.lang.Math.sqrt(acc1) * java.lang.Math.sqrt(acc2))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "vec_cosine"
}

/** Column-level API over the native expressions. */
object vec {
  private def lift(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine similarity of two array<float|double> columns, as double. */
  def cosine(a: Column, b: Column): Column = lift(CosineSimilarity)(a, b)
  /** Euclidean distance of two array<float|double> columns, as double. */
  def l2(a: Column, b: Column): Column = lift(L2Distance)(a, b)
  /** Manhattan distance of two array<float|double> columns, as double. */
  def l1(a: Column, b: Column): Column = lift(L1Distance)(a, b)
  /** Inner product of two array<float|double> columns, as double. */
  def dot(a: Column, b: Column): Column = lift(DotProduct)(a, b)
  /** L2 norm of an array<float|double> column, as double. */
  def norm(a: Column): Column = {
    val e = ColumnBridge.expression(a)
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.Sqrt(DotProduct(e, e)))
  }
}
