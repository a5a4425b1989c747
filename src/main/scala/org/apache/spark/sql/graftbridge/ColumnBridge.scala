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
}
