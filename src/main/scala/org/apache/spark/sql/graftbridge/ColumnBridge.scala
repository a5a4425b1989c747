package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters
  * (Spark 4.x moved Column onto ColumnNode; classic.ExpressionUtils is
  * the sanctioned conversion). Lives under org.apache.spark.sql so the
  * accessor scope resolves; nothing else in graft touches Spark
  * internals.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The session's own stable UUID (`private[sql]` on classic
    * sessions) — unlike an identity hash it can neither collide
    * between two live sessions nor be reused after a GC, which makes
    * it the correct cache key for session-scoped index state.
    */
  def sessionUUID(spark: org.apache.spark.sql.SparkSession): Option[String] =
    spark match {
      case c: org.apache.spark.sql.classic.SparkSession => Some(c.sessionUUID)
      case _ => None
    }
}
