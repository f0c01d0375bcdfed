package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the Column <-> Expression conversion, which is
  * `private[sql]` in Spark 4 (Column no longer wraps an Expression
  * publicly). Lives inside the org.apache.spark.sql package tree solely
  * to re-export the two conversions needed to mount custom Catalyst
  * expressions; nothing else from the internals is touched. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
