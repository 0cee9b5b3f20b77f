package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Single source of truth for the great-circle formula: the Scala UDF
  * surface (Geo.haversineKm), the native expression's interpreted eval,
  * and its GENERATED code all call this one static method, so the three
  * paths cannot drift. Top-level object with no companion class → scalac
  * emits a static forwarder (`graft.functions.Haversine.km`) the codegen
  * string can reference directly. */
object Haversine {
  def km(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val r = 6371.0088
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * r * math.asin(math.sqrt(a))
  }
}

/** `haversine_km(lat1, lon1, lat2, lon2)` as a NATIVE codegen expression —
  * the SURVEY §2.12 stretch item: the same geodesic the q_geo_haversine
  * UDF computes, but visible to Catalyst (constant-foldable, null-aware,
  * and inlined into whole-stage codegen instead of boxing four doubles
  * through a Scala closure per row). q_geo_haversine deliberately KEEPS
  * the UDF — it is the declared "geospatial UDF" surface — while
  * q_geo_dist_native runs this expression; GeoExprSpec pins the two paths
  * bit-identical. */
case class HaversineKm(lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression)
    extends QuaternaryExpression {

  // ExpectsInputTypes is private[sql]; enforce doubles explicitly (the
  // same route MinHashSigs takes). Callers write literals as `43.65d`.
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.filterNot(_.dataType == DoubleType)
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"haversine_km expects 4 DOUBLE args, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "haversine_km"

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Haversine.km(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.Haversine.km($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)
}
