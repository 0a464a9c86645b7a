package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column ↔ Expression converters —
  * the one place this library steps into Spark's namespace. Needed to
  * expose native codegen'd expressions (graft.functions.*) through the
  * public Column API without requiring spark.sql.extensions config on
  * every session. */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
