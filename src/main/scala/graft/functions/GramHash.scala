package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 5-gram polynomial hash H(g) = Σ cp(g_k)·131^(4−k) mod (2³¹−1),
  * where cp(c) is the code point of character c — bit-identical to the
  * SQL composite `(ascii(substr(g,1,1))·294499921 + … + ascii(substr(g,5,1)))
  * % P` it replaces (Spark's and DuckDB's `ascii` both return the code
  * point; characters past the string end contribute 0), including for
  * non-ASCII and short inputs.
  *
  * Why an expression and not the composite: the composite materializes five
  * substring UTF8Strings and five Ascii calls per row in the generated code;
  * this is one static Java call over the original bytes — shorter generated
  * code inside the SAME whole-stage span (a static call does not break
  * codegen the way CodegenFallback would). The dedup family evaluates it
  * ~200× per document, so it sits on the hot path of the shingle scan.
  */
case class GramHash5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "gram_hash5"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gram_hash5 expects STRING, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    GramHash.hash5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHash.hash5($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHash {

  val P = 2147483647L // 2^31 − 1
  private val Coef = Array(294499921L, 2248091L, 17161L, 131L, 1L)

  /** Static entry point referenced from generated code. */
  def hash5(s: UTF8String): Long = {
    val str = s.toString
    var i = 0
    var k = 0
    var acc = 0L
    while (k < 5 && i < str.length) {
      // Ascii(substring(g, k+1, 1)) = code point of the k-th character
      val cp = str.codePointAt(i)
      acc += cp.toLong * Coef(k)
      i += Character.charCount(cp)
      k += 1
    }
    acc % P
  }

  /** Column API. */
  def gramHash5(c: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(GramHash5(GraftShim.expression(c)))
  }
}
