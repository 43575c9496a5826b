package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Ray-casting point-in-polygon as a native Catalyst expression (reference
  * semantics: codes/to_codes.py:154-180 resolves `in_geometry$lat,lng`
  * locations by scanning district polygons with shapely `contains`).
  *
  * A custom `Expression` with `doGenCode` (not a Scala UDF): null handling is
  * native and whole-stage codegen emits a direct static call — this sits in
  * the location-resolution projection of every record at 100 TB.
  *
  * Polygon encoding: array<array<double>> of [lon, lat] vertex pairs (one
  * ring; the caller ORs over rings for multipolygons). Boundary behavior is
  * the even-odd rule — equal to shapely `contains` except for points exactly
  * on an edge, which GPS float inputs never hit meaningfully.
  */
case class PointInPolygon(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == DoubleType && second.dataType == DoubleType &&
      (third.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => true
        case _ => false
      })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"point_in_polygon expects (double, double, array<array<double>>), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override protected def nullSafeEval(lonV: Any, latV: Any, ringV: Any): Any =
    PointInPolygon.contains(lonV.asInstanceOf[Double], latV.asInstanceOf[Double],
      ringV.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = "graft.functions.PointInPolygon"
    defineCodeGen(ctx, ev, (lon, lat, ring) => s"$cls.contains($lon, $lat, $ring)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PointInPolygon {
  /** Even-odd ray casting over an ArrayData of [lon, lat] vertex arrays.
    * Static (Java-callable) so generated code can invoke it directly. */
  def contains(x: Double, y: Double, ring: ArrayData): Boolean = {
    val n = ring.numElements()
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val vi = ring.getArray(i)
      val vj = ring.getArray(j)
      val xi = vi.getDouble(0); val yi = vi.getDouble(1)
      val xj = vj.getDouble(0); val yj = vj.getDouble(1)
      if (((yi > y) != (yj > y)) &&
          (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Column wrapper. `ring`: array<array<double>> of [lon,lat] pairs. */
  def pointInPolygon(lon: Column, lat: Column, ring: Column): Column =
    GraftColumnBridge.column(PointInPolygon(
      GraftColumnBridge.expression(lon),
      GraftColumnBridge.expression(lat),
      GraftColumnBridge.expression(ring)))
}
