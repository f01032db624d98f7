package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal private[sql]-access bridge: wrap/unwrap custom Catalyst
  * expressions as public Columns. This is the one conventional spot where
  * an extension library must live inside the org.apache.spark.sql package
  * tree (ExpressionUtils and friends are private[sql] in Spark 4). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
