package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column<->Expression converters (Spark 4 moved
  * Column internals behind ColumnNode; `classic.ExpressionUtils` is
  * `private[sql]`). Lives in the spark.sql package purely to re-export the
  * two conversions the engine's native expressions need.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `types.AbstractDataType` is `private[sql]`; expressions outside the
    * sql package need this alias to declare `inputTypes` contracts
    * (ExpectsInputTypes / ImplicitCastInputTypes).
    */
  type AbstractDT = org.apache.spark.sql.types.AbstractDataType
}
