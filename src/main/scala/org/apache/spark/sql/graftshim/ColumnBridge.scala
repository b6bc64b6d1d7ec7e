package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's sql-private Column <-> Expression converters so the
  * engine's native Catalyst expressions (graft.functions) can surface as
  * Columns. The ONLY code outside the `graft` namespace: Spark marks these
  * helpers private[sql], and a shim subpackage is the established pattern
  * for libraries that ship custom expressions without forking Spark.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
