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

/** Declares (double, long) input types with implicit casts for an
  * expression defined outside the sql package: Spark 4 made
  * `AbstractDataType` private[sql], so `ImplicitCastInputTypes` cannot
  * be overridden directly from graft code — mixing in this bridge
  * trait from inside the package does it. Used by TopKBySim so an int
  * id or float sim column is cast instead of crashing the aggregate's
  * unboxing at runtime. */
trait DoubleLongInputCast
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  self: Expression =>
  override def inputTypes
      : Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.DoubleType,
      org.apache.spark.sql.types.LongType)
}
