package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Codegen'd quantized dot product over two `array<float>` columns:
  * Σ floor(a_i·10⁶)·floor(b_i·10⁶) as a single BIGINT — bit-identical to
  * the `aggregate(zip_with(...))` higher-order composite it replaces
  * (same float→double widening, same floor, same 64-bit accumulation).
  *
  * Why an expression: the HOF composite allocates a zipped intermediate
  * array and evaluates two lambda closures per element per row; this is
  * one static Java loop over the unsafe array data inside the SAME
  * whole-stage span (a static call does not break codegen the way
  * CodegenFallback would). In the ANN family the dot runs once per
  * (probe, candidate) pair — the hot path of similarity search.
  * Null elements contribute 0 (embedding arrays are dense; the quantized
  * family never produces null elements).
  */
case class QDotExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "qdot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"qdot expects (array<float>, array<float>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    QDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.QDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QDot {

  /** Static entry point referenced from generated code. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val qa = math.floor(a.getFloat(i).toDouble * 1000000.0).toLong
        val qb = math.floor(b.getFloat(i).toDouble * 1000000.0).toLong
        acc += qa * qb
      }
      i += 1
    }
    acc
  }

  /** Column API: quantized integer dot of two `array<float>` columns. */
  def qdot(a: Column, b: Column): Column =
    GraftShim.column(QDotExpr(GraftShim.expression(a), GraftShim.expression(b)))
}
