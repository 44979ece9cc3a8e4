package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is private[sql], so
  * this one-file shim lives inside the org.apache.spark.sql package —
  * the standard pattern Spark extension libraries use to hand a
  * custom Catalyst Expression to the public Column API without a
  * per-session function registry round-trip. No other internals are
  * touched.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
