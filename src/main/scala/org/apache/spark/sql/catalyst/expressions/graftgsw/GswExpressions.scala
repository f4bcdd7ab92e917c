/*
 * Lives under org.apache.spark.sql.* because ExpectsInputTypes' contract
 * (`inputTypes: Seq[AbstractDataType]`) names a private[sql] type — the
 * standard pattern for third-party native expressions.
 */
package org.apache.spark.sql.catalyst.expressions.graftgsw

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType}

/**
 * Native Catalyst expressions for the hot TEOS-10 scalars — the top rung of
 * the custom-function ladder (SURVEY §7.3): unlike a Scala UDF, these
 * participate in whole-stage codegen (no Row boxing, no closure dispatch;
 * the generated Java calls the static math directly), stay null-intolerant,
 * and are registrable for pure-SQL use via [[graft.GraftExtensions]].
 */
abstract class GswBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Fully-qualified static call target, e.g. "graft.gsw.Gsw.sigma0". */
  protected def staticFn: String
  protected def fn(a: Double, b: Double): Double

  override protected def nullSafeEval(a: Any, b: Any): Any =
    fn(a.asInstanceOf[Double], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$staticFn($a, $b)")
}

/** sigma0(SA, CT): potential density anomaly, 75-term polynomial at p=0. */
case class Sigma0Expr(left: Expression, right: Expression) extends GswBinaryExpression {
  override protected def staticFn: String = "graft.gsw.Gsw.sigma0"
  override protected def fn(a: Double, b: Double): Double = graft.gsw.Gsw.sigma0(a, b)
  override def prettyName: String = "gsw_sigma0"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** p_from_z(z, lat): sea pressure from height. */
case class PFromZExpr(left: Expression, right: Expression) extends GswBinaryExpression {
  override protected def staticFn: String = "graft.gsw.Gsw.pFromZ"
  override protected def fn(a: Double, b: Double): Double = graft.gsw.Gsw.pFromZ(a, b)
  override def prettyName: String = "gsw_p_from_z"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** z_from_p(p, lat): height from sea pressure. */
case class ZFromPExpr(left: Expression, right: Expression) extends GswBinaryExpression {
  override protected def staticFn: String = "graft.gsw.Gsw.zFromP"
  override protected def fn(a: Double, b: Double): Double = graft.gsw.Gsw.zFromP(a, b)
  override def prettyName: String = "gsw_z_from_p"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** distance(lon1, lat1, lon2, lat2): haversine meters. */
case class DistanceExpr(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(DoubleType, DoubleType, DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gsw_distance"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    graft.gsw.Gsw.distance(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c, d) => s"graft.gsw.Gsw.distance($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object GswExpressions {

  /** (name, info, builder) triples in the shape SparkSessionExtensions /
    * FunctionRegistry want. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("gsw_sigma0"),
      new ExpressionInfo(classOf[Sigma0Expr].getName, "gsw_sigma0"),
      (c: Seq[Expression]) => Sigma0Expr(c(0), c(1))),
    (FunctionIdentifier("gsw_p_from_z"),
      new ExpressionInfo(classOf[PFromZExpr].getName, "gsw_p_from_z"),
      (c: Seq[Expression]) => PFromZExpr(c(0), c(1))),
    (FunctionIdentifier("gsw_z_from_p"),
      new ExpressionInfo(classOf[ZFromPExpr].getName, "gsw_z_from_p"),
      (c: Seq[Expression]) => ZFromPExpr(c(0), c(1))),
    (FunctionIdentifier("gsw_distance"),
      new ExpressionInfo(classOf[DistanceExpr].getName, "gsw_distance"),
      (c: Seq[Expression]) => DistanceExpr(c(0), c(1), c(2), c(3))))

  /** Register into a live session's function registry (the extensions path
    * covers new sessions; this covers an existing one). */
  def registerInto(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils

  private def lift(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column-API forms of the native expressions (codegen path — preferred
    * over the equivalent UDFs in graft.gsw.Gsw.registerAll). */
  def sigma0(sa: Column, ct: Column): Column =
    ExpressionUtils.column(Sigma0Expr(lift(sa), lift(ct)))
  def pFromZ(z: Column, lat: Column): Column =
    ExpressionUtils.column(PFromZExpr(lift(z), lift(lat)))
  def zFromP(p: Column, lat: Column): Column =
    ExpressionUtils.column(ZFromPExpr(lift(p), lift(lat)))
  def distanceCol(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    ExpressionUtils.column(DistanceExpr(lift(lon1), lift(lat1), lift(lon2), lift(lat2)))
}
