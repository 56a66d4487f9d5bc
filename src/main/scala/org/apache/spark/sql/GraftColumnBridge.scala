package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters, for
  * exposing custom Catalyst expressions (graft.functions.CosineSimilarity)
  * through the public Column API. Placing the accessor inside
  * `org.apache.spark.sql` is the standard extension-library pattern for
  * these converters (the supported alternative, SparkSessionExtensions
  * function injection, requires a session at registration time — our
  * function API is session-free Column combinators). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
