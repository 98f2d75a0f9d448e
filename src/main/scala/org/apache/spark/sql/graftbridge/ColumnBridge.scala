package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column <-> catalyst Expression bridge
  * (`classic.ExpressionUtils`) private[sql]; this shim re-exports the
  * two conversions graft's native expressions need. Lives under the
  * org.apache.spark.sql package solely for access — no Spark internals
  * are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
