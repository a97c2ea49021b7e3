package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** A per-iteration driver scalar that keeps generated code STABLE across
  * values.
  *
  * `lit(x)` embeds the double into the generated Java source, so an
  * iterative operator that feeds a fresh scalar into each round's plan
  * (PageRank's dangling mass, any damped fixpoint) recompiles the same
  * stage every round — the source differs only in one constant, but the
  * whole-stage-codegen cache keys on source text. This expression routes
  * the value through the codegen reference array instead: every round
  * generates byte-identical source and the Janino cache hits from round 2
  * on.
  *
  * Deliberately NOT foldable — constant folding would collapse it back
  * into the very `Literal` it exists to avoid.
  */
case class StableScalar(value: Double) extends LeafExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftStableScalar",
      java.lang.Double.valueOf(value), "java.lang.Double")
    ev.copy(code = code"final double ${ev.value} = $ref.doubleValue();",
      isNull = FalseLiteral)
  }
}

object StableScalar {
  /** A double column whose generated code is identical for every value. */
  def column(value: Double): Column = GraftShim.column(StableScalar(value))
}
