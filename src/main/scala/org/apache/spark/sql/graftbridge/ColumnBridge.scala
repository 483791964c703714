package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column ⇄ Expression bridge. Spark 4 moved `Column` to a connect-neutral
 * ColumnNode representation; the classic-mode converters
 * (`classic.ExpressionUtils`) are `private[sql]`, so the one blessed way
 * for a library to attach a custom Catalyst `Expression` (e.g.
 * [[graft.functions.CosineToQuery]]) to a DataFrame is a forwarder
 * living under `org.apache.spark.sql`. This object is the repo's ONLY
 * Spark-package intrusion; it adds no behavior.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
