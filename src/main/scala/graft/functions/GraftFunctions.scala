package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the native graft expressions, so the library
  * surface is reachable from `spark.sql("... vec_cosine(a, b) ...")`
  * as well as the Column API — the way the reference's users would
  * query through a SQL gateway.
  *
  * Two entry points:
  *  - [[GraftFunctions.register]] on an existing session;
  *  - `spark.sql.extensions=graft.GraftSqlExtensions` at session
  *    build time (the standard extension hook).
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VectorBinaryExpression].getName, null, name)

  private val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_cosine", "cosine similarity of two array<float>",
      (c: Seq[Expression]) => CosineSimilarity(c(0), c(1))),
    ("vec_l2", "euclidean distance of two array<float>",
      (c: Seq[Expression]) => L2Distance(c(0), c(1))),
    ("vec_l1", "manhattan distance of two array<float>",
      (c: Seq[Expression]) => L1Distance(c(0), c(1))),
    ("vec_dot", "inner product of two array<float>",
      (c: Seq[Expression]) => DotProduct(c(0), c(1))),
    ("simhash64", "64-bit simhash of an array<bigint> of token hashes",
      (c: Seq[Expression]) => SimHash64(c(0))))

  /** Register all graft SQL functions on an existing session. */
  def register(spark: SparkSession): Unit = fns.foreach { case (name, usage, builder) =>
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info(name, usage), builder)
  }

  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}

/** `spark.sql.extensions` entry point. */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
