package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector dot product over two array columns.
  *
  * The declarative form — `aggregate(zip_with(a, b, (x, y) => x*y), 0,
  * +)` — is semantically right but materializes an intermediate array
  * per row and walks three higher-order-function eval layers; on the ANN
  * hot path (brute-force/refine cosine over every corpus row) that is
  * the dominant per-row cost. This expression compiles to a single tight
  * `for` loop over the two `ArrayData` buffers inside whole-stage
  * codegen: no intermediate array, no lambda dispatch.
  *
  * Semantics are IDENTICAL to the declarative form it replaces
  * (pinned in `VectorMathSpec`): elements widen to double BEFORE the
  * multiply, accumulation is left-to-right in index order (bit-for-bit
  * the engine-portable fold the oracles replay), a null array OR null
  * element OR length mismatch yields null — exactly what `zip_with` +
  * null-propagating `+` produce.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vector_dot needs two arrays of the same float/double element " +
        s"type, got ${left.dataType.simpleString} and " +
        s"${right.dataType.simpleString}")
    }
  }

  private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum +=
        (if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)) *
          (if (isFloat) b.getFloat(i).toDouble else b.getDouble(i))
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $sum += ((double) $a.$get($i)) * ((double) $b.$get($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VectorDot = copy(left = newLeft, right = newRight)
}

object VectorMath {
  /** Codegen'd dot product; same fold as the declarative form. */
  def dotNative(a: Column, b: Column): Column =
    GraftShim.column(VectorDot(GraftShim.expression(a),
      GraftShim.expression(b)))
}
