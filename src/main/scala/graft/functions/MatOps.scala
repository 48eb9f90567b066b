package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The dimension-bounded tail of q_pca_power_iter as ONE opaque
  * expression: given the corpus-wide moment sums (n, sx[D],
  * sxy[D·D] row-major; D = 64 in the registry, generic so the
  * PcaRescaleSpec 2-dim >2^53 fixture drives the same code), compute
  * the centered covariance in 128-bit integer space, q8-rescale it, run
  * ten exact matrix squarings (each re-rescaled q8), and return the
  * q6-rescaled row-sum vector — the oracle's c0…c10/w/mw CTE chain
  * verbatim, in compiled code.
  *
  * Every step matches the unrolled DuckDB oracle bit for bit:
  *   - cov = n·sxy − sx_i·sx_j exceeds int64 (bounded by n²·10⁶), so it
  *     is carried as BigInteger — the HUGEINT/DECIMAL(38,0) twin;
  *   - every rescale uses the shift identity
  *     floor(v·S/m) = (v+m)·S div m − S with a NON-NEGATIVE shifted
  *     numerator, where BigInteger's truncating divide IS the floor —
  *     bit-identical to DuckDB `//` and Spark decimal `div`;
  *   - squaring cells are exact int64 (|entry| ≤ 10⁸ ⇒ |cell| ≤ 64·10¹⁶);
  *     row sums ≤ 64·10⁸.
  *
  * Why an expression and not SQL: the recursion is 4096 cells at ANY
  * corpus size and runs on one row, but as chained higher-order
  * functions the optimizer's alias inlining (CollapseProject /
  * predicate-pushdown trimAliases) substitutes each round's array
  * expression INTO the next round's lambda, re-evaluating it per
  * element — observed as an analyzer/executor blow-up measured in
  * minutes. One single-reference opaque node keeps the plan a chain and
  * the arithmetic a compiled loop (~3 ms). Interpreted eval only
  * (CodegenFallback): it executes once per query, never per data row.
  */
case class PcaPowerTop(n: Expression, sx: Expression, sxy: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = n
  override def second: Expression = sx
  override def third: Expression = sxy

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pca_power_top"

  override def checkInputDataTypes(): TypeCheckResult =
    (n.dataType, sx.dataType, sxy.dataType) match {
      case (LongType, ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"pca_power_top expects (bigint, array<bigint>, array<bigint>), " +
          s"got (${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  protected override def nullSafeEval(nv: Any, sxv: Any, sxyv: Any): Any = {
    val nn = BigInteger.valueOf(nv.asInstanceOf[Long])
    val sxA = sxv.asInstanceOf[ArrayData].toLongArray()
    val sxyA = sxyv.asInstanceOf[ArrayData].toLongArray()
    val dims = sxA.length
    val cells = dims * dims
    require(sxyA.length == cells,
      s"expected ${cells} moment cells for $dims dims, got ${sxyA.length}")
    // centered covariance in 128-bit space, then the first q8 rescale
    val cov = new Array[BigInteger](cells)
    var k = 0
    while (k < cells) {
      cov(k) = nn.multiply(BigInteger.valueOf(sxyA(k))).subtract(
        BigInteger.valueOf(sxA(k / dims)).multiply(BigInteger.valueOf(sxA(k % dims))))
      k += 1
    }
    var m0 = BigInteger.ZERO
    k = 0
    while (k < cells) { val a = cov(k).abs(); if (a.compareTo(m0) > 0) m0 = a; k += 1 }
    val Q8 = BigInteger.valueOf(100000000L)
    var c = new Array[Long](cells)
    if (m0.signum() != 0) {
      k = 0
      while (k < cells) {
        c(k) = cov(k).add(m0).multiply(Q8).divide(m0).longValueExact() - 100000000L
        k += 1
      }
    }
    // ten exact squaring + q8-rescale rounds
    var r = 0
    while (r < 10) { c = MatOps.squareRescale(c, dims, 100000000L); r += 1 }
    // row sums, final q6 rescale
    val w = new Array[Long](dims)
    var i = 0
    while (i < dims) {
      var acc = 0L
      var j = 0
      while (j < dims) { acc += c(i * dims + j); j += 1 }
      w(i) = acc
      i += 1
    }
    var mw = 0L
    i = 0
    while (i < dims) { val a = math.abs(w(i)); if (a > mw) mw = a; i += 1 }
    val out = new Array[Long](dims)
    if (mw != 0L) {
      val mB = BigInteger.valueOf(mw)
      val sB = BigInteger.valueOf(1000000L)
      i = 0
      while (i < dims) {
        out(i) = BigInteger.valueOf(w(i)).add(mB)
          .multiply(sB).divide(mB).longValueExact() - 1000000L
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PcaPowerTop =
    copy(n = f, sx = s, sxy = t)
}

object MatOps {

  /** One exact squaring + max-abs q-rescale round over a flat row-major
    * D×D int64 matrix (cells exact: |entry| ≤ 10⁸ ⇒ |cell| ≤ D·10¹⁶,
    * int64-safe to D = 92). The shifted numerator (p+m)·S is ~2⁸⁷ bits,
    * hence BigInteger. */
  private[functions] def squareRescale(c: Array[Long], dims: Int,
      scale: Long): Array[Long] = {
    val cells = dims * dims
    val p = new Array[Long](cells)
    var i = 0
    while (i < dims) {
      var j = 0
      while (j < dims) {
        var acc = 0L
        var t = 0
        while (t < dims) { acc += c(i * dims + t) * c(t * dims + j); t += 1 }
        p(i * dims + j) = acc
        j += 1
      }
      i += 1
    }
    var m = 0L
    var k = 0
    while (k < cells) { val v = math.abs(p(k)); if (v > m) m = v; k += 1 }
    val out = new Array[Long](cells)
    if (m != 0L) {
      val mB = BigInteger.valueOf(m)
      val sB = BigInteger.valueOf(scale)
      k = 0
      while (k < cells) {
        out(k) = BigInteger.valueOf(p(k)).add(mB)
          .multiply(sB).divide(mB).longValueExact() - scale
        k += 1
      }
    }
    out
  }

  /** Column wrapper over [[PcaPowerTop]]. */
  def pcaPowerTop(n: Column, sx: Column, sxy: Column): Column =
    GraftShim.column(PcaPowerTop(
      GraftShim.expression(n), GraftShim.expression(sx), GraftShim.expression(sxy)))
}
