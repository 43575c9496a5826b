package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd vector folds (dot product, squared L2) over
  * `array<double>` columns.
  *
  * Why expressions and not `aggregate(zip_with(...))`: lambda HOFs are
  * CodegenFallback, and the similarity operators evaluate one fold PER
  * CANDIDATE PAIR — the single most executed expression in the ANN/near-dup
  * family ran interpreted (measured: the pair stage dominated
  * `dedup_embedding`). These compile to a tight primitive loop inside
  * whole-stage codegen.
  *
  * Semantics are IDENTICAL to the HOF formulation the DuckDB oracle
  * mirrors: a left fold in index order over doubles (fixed accumulation
  * order — never a parallel reduction, results feed thresholds), null if
  * the lengths differ or any element is null (zip_with pads with null and
  * a null poisons the sum), 0.0 on empty arrays. */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double>, got (${left.dataType}, ${right.dataType})")
  }

  /** Static helper name on [[VectorExprs]] (Java-callable from codegen). */
  protected def helper: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VectorExprs.$helper($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })
}

case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "vec_dot"
  override protected def helper: String = "dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class SqDistance(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override def prettyName: String = "vec_sqdist"
  override protected def helper: String = "sqDist"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {

  /** Index-order left-fold Σ aᵢ·bᵢ; null on length mismatch or null
    * element (the zip_with/aggregate contract). Static-forwarded for
    * generated code. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Index-order left-fold Σ (aᵢ−bᵢ)²; same null contract as [[dot]]. */
  def sqDist(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  // float arrays are coerced here (the expressions demand exact
  // array<double> and, unlike the HOF formulation they replaced, get no
  // analyzer-inserted cast); the no-op case is erased by SimplifyCasts
  def dotColumn(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a.cast("array<double>")),
      GraftColumnBridge.expression(b.cast("array<double>"))))

  def sqDistColumn(a: Column, b: Column): Column =
    GraftColumnBridge.column(SqDistance(
      GraftColumnBridge.expression(a.cast("array<double>")),
      GraftColumnBridge.expression(b.cast("array<double>"))))
}
