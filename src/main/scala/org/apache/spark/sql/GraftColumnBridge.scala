package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for [[graft.GraftExtensions]]'s SQL
  * function registrations.
  *
  * Spark 4 routes every `Column` through a ColumnNode tree and keeps the
  * converter (`classic.ExpressionUtils`) package-private, so an extension
  * that wants to expose an EXISTING Column-level kernel as a SQL function
  * (builder: `Seq[Expression] => Expression`) needs this one-hop adapter
  * in the `org.apache.spark.sql` package — the standard pattern for Spark
  * extension libraries. No behavior: a pure accessibility shim, so the
  * SQL surface reuses the exact Column implementations (and their
  * codegen) instead of a duplicated expression tree that could drift.
  */
object GraftColumnBridge {
  /** EAGER conversion (ColumnNodeToExpressionConverter), not the lazy
    * `ExpressionUtils.expression` wrapper: a function builder's return
    * value goes straight into the analyzed plan, where a lazy
    * ColumnNodeExpression would never be converted (it codegen-fails).
    * Unresolved function nodes inside the converted tree are resolved by
    * the analyzer's normal fixpoint iteration.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
