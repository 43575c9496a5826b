package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/** Native scalar-quantization kernels — the per-element min-max encode
  * floor and the midpoint decode. The HOF formulations
  * (`transform(vec, (x, i) => …element_at(mins, i+1)…)`) were the last
  * interpreted per-element sites on a corpus-shaped path
  * ([[graft.operators.ScalarQuant]]): a CodegenFallback tree-walk per
  * DIMENSION per vector, and interpreter traffic of the kind that
  * poisons shared-JVM JIT profiles (see [[SpanScrub]]).
  *
  * Element contract (bit-identical to the HOF shape, property-checked):
  * encode = `hi == lo → 0; else min(255, floor((x−lo)/(hi−lo)·256))` —
  * single IEEE ops in the same association order, so codes are
  * cross-engine exact; values BELOW lo floor negative, exactly as the
  * unclamped HOF did. A null element or a dimension past the stats
  * arrays' length encodes to 255 — the HOF's `least(255, null)` SKIPS
  * nulls (least/greatest return the extreme of the non-null operands),
  * so its null-propagating floor collapses to the clamp; the kernel
  * replicates that quirk rather than "fixing" it (corpus-fitted stats
  * and well-formed vectors never hit it — the gates pin the real
  * distribution). decode = `lo + (c+0.5)·(hi−lo)/256`; there nulls DO
  * propagate (plain arithmetic, no least), so a null code or
  * out-of-stats dimension decodes to a null element.
  */
case class SqEncode(first: Expression, second: Expression,
                    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (v, mn, mx) => TypeCheckResult.TypeCheckFailure(
        s"sq_encode expects (array<double> ×3), got ($v, $mn, $mx)")
    }

  override protected def nullSafeEval(vec: Any, mins: Any,
                                      maxes: Any): Any =
    ScalarQuantExprs.encode(vec.asInstanceOf[ArrayData],
      mins.asInstanceOf[ArrayData], maxes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, mn, mx) =>
      s"graft.functions.ScalarQuantExprs.encode($v, $mn, $mx)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Midpoint reconstruction of [[SqEncode]] codes; see the contract
  * there. */
case class SqDecode(first: Expression, second: Expression,
                    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(DoubleType)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _),
            ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (c, mn, mx) => TypeCheckResult.TypeCheckFailure(
        s"sq_decode expects (array<int>, array<double>, array<double>), got ($c, $mn, $mx)")
    }

  override protected def nullSafeEval(codes: Any, mins: Any,
                                      maxes: Any): Any =
    ScalarQuantExprs.decode(codes.asInstanceOf[ArrayData],
      mins.asInstanceOf[ArrayData], maxes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, mn, mx) =>
      s"graft.functions.ScalarQuantExprs.decode($c, $mn, $mx)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ScalarQuantExprs {

  def sqEncode(vec: Column, mins: Column, maxes: Column): Column =
    GraftColumnBridge.column(SqEncode(
      GraftColumnBridge.expression(vec),
      GraftColumnBridge.expression(mins),
      GraftColumnBridge.expression(maxes)))

  def sqDecode(codes: Column, mins: Column, maxes: Column): Column =
    GraftColumnBridge.column(SqDecode(
      GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(mins),
      GraftColumnBridge.expression(maxes)))

  /** Static (Java-callable from generated code): 256-bucket floor codes. */
  def encode(vec: ArrayData, mins: ArrayData,
             maxes: ArrayData): GenericArrayData = {
    val n = vec.numElements()
    val nStats = math.min(mins.numElements(), maxes.numElements())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i >= nStats || mins.isNullAt(i) || maxes.isNullAt(i)) {
        out(i) = 255 // least(255, null-floor) — see the header contract
      } else {
        val lo = mins.getDouble(i)
        val hi = maxes.getDouble(i)
        // degenerate-dimension check FIRST: the HOF's when(hi = lo, 0)
        // branch never looks at x, so a null element still codes 0 there
        if (hi == lo) out(i) = 0
        else if (vec.isNullAt(i)) out(i) = 255 // least(255, null-floor)
        else {
          val f = math.floor((vec.getDouble(i) - lo) / (hi - lo) * 256.0)
          // WRAP first, clamp second — the HOF is floor→LONG→cast(int)
          // (non-ANSI long→int truncation wraps) and THEN least(255, _),
          // so a value far below lo (f under Int.MinValue) wraps to a
          // positive int and clamps to 255 there; min-before-truncate
          // would instead emit the wrapped positive value. Scala's
          // Double→Long conversion saturates exactly like Spark's cast,
          // so the huge-positive path (f → Long.MaxValue → int -1 →
          // least → -1) matches too.
          out(i) = math.min(255, f.toLong.toInt)
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Static: midpoint reconstruction. */
  def decode(codes: ArrayData, mins: ArrayData,
             maxes: ArrayData): GenericArrayData = {
    val n = codes.numElements()
    val nStats = math.min(mins.numElements(), maxes.numElements())
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i >= nStats || codes.isNullAt(i) ||
          mins.isNullAt(i) || maxes.isNullAt(i)) out(i) = null
      else {
        val lo = mins.getDouble(i)
        val hi = maxes.getDouble(i)
        out(i) = lo + (codes.getInt(i).toDouble + 0.5) * (hi - lo) / 256.0
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
