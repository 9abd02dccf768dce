package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Thin visibility bridge: Spark 4 made the Expression<->Column conversions
  * `private[sql]`, so extension libraries host the two calls inside the
  * `org.apache.spark.sql` namespace (the standard technique used by Spark
  * connector/extension projects). No Spark internals are re-implemented here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
