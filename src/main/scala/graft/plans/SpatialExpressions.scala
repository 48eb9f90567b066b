package graft.plans

import graft.functions.GeoFunctions
import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.index.strtree.STRtree
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}

/** Native Catalyst expression for the exact-refine spatial predicate
  * (SURVEY.md §4 "custom Catalyst work actually warranted").
  *
  * Beats the equivalent Scala UDF in two ways a UDF cannot:
  *   - a foldable right side (the usual case: `ST_Intersects(geom,
  *     lit(queryWkt))`) is parsed ONCE per executor and prepared
  *     (`PreparedGeometry` — cached edge index, ~10× faster repeated
  *     intersects);
  *   - no ScalaUDF boxing/closure dispatch per row.
  *
  * Evaluation is CodegenFallback (topology can't be inlined into janino
  * anyway); the expression still sits inside a codegen'd filter stage.
  */
case class StIntersectsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_intersects"

  @transient private lazy val preparedRight: Option[PreparedGeometry] = right match {
    case Literal(s: UTF8String, StringType) if s != null =>
      Some(PreparedGeometryFactory.prepare(GeoFunctions.parseWkt(s.toString)))
    case _ => None
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val g = GeoFunctions.parseWkt(l.toString)
    preparedRight match {
      case Some(p) => p.intersects(g)
      case None => g.intersects(GeoFunctions.parseWkt(r.toString))
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object SpatialExpressions {
  import org.apache.spark.sql.{Column, GraftShim}
  import org.apache.spark.sql.functions.lit

  /** Column API for the native expression. */
  def stIntersectsNative(geom: Column, other: Column): Column =
    GraftShim.column(StIntersectsExpr(
      GraftShim.expression(geom), GraftShim.expression(other)))

  def stIntersectsNative(geom: Column, wkt: String): Column =
    stIntersectsNative(geom, lit(wkt))
}
