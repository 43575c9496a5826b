package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/** Native product-quantization kernels — the per-row encode argmin and
  * the ADC table-lookup sum. The HOF formulations were nested
  * interpreted folds (`transform(1..m, j => aggregate(cells, argmin))`
  * costs m × k × subDim tree-walked evaluations PER VECTOR; the ADC sum
  * walks m lookups per candidate pair) — the hottest remaining
  * CodegenFallback sites after the shingle/gopher/span sweeps, and
  * interpreter traffic of the kind that poisons shared-JVM JIT profiles
  * (see [[SpanScrub]]).
  *
  * Floating-point contract: distances accumulate `(a-b)²` in index
  * order and the per-subspace sums add in subspace order — bit-identical
  * to the [[VectorExprs.sqDist]]-based HOF chain (and therefore to the
  * DuckDB oracles that replay it). Argmin ties keep the LOWEST cell
  * (strict `<` update), matching the fold's `when(d < acc.d)`.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(DoubleType, _),
          ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects (array<double>, array<array<array<double>>>), got ($l, $r)")
  }

  override protected def nullSafeEval(vec: Any, books: Any): Any =
    PqExprs.encode(vec.asInstanceOf[ArrayData], books.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, b) => s"graft.functions.PqExprs.encode($v, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `adc_dist = Σⱼ tables[j][codes[j]]` — the asymmetric-distance lookup
  * sum over a candidate's PQ codes; see [[PqEncode]] for the contract.
  * Null (not error) on any out-of-range or null lookup, mirroring the
  * non-ANSI `element_at` fold on inputs a trained index never produces. */
case class AdcDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_dist expects (array<int>, array<array<double>>), got ($l, $r)")
  }

  override protected def nullSafeEval(codes: Any, tables: Any): Any =
    PqExprs.adcDist(codes.asInstanceOf[ArrayData],
      tables.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, t) => s"graft.functions.PqExprs.adcDist($c, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `struct(cell, dist)` of the nearest centroid — the in-row argmin that
  * replaces the broadcast-join × k row blowup + per-vector min-struct
  * aggregation in cell assignment (KMeans.assign / IVF routing): one
  * narrow codegen'd projection, no exchange. Same distance and tie
  * contract as [[PqEncode]] (index-order (a-b)², strict-< ties to the
  * lowest POSITION — callers map position → cell id via the packed id
  * array). Null when no cell is length-compatible (a well-formed
  * centroid frame never is). */
case class NearestCell(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = PqExprs.nearestType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell expects (array<double>, array<array<double>>), got ($l, $r)")
  }

  override protected def nullSafeEval(vec: Any, cells: Any): Any =
    PqExprs.nearestCell(vec.asInstanceOf[ArrayData],
      cells.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val tmp = ctx.freshName("nearest")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $tmp =
         |  graft.functions.PqExprs.nearestCell($v, $c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqExprs {

  private[graft] val nearestType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))

  def nearestCell(vec: Column, cells: Column): Column =
    GraftColumnBridge.column(NearestCell(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(cells)))

  /** Static: argmin position + its distance over the packed cell list;
    * null when no cell matches the vector's length. */
  def nearestCell(vec: ArrayData, cells: ArrayData)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val nCells = cells.numElements()
    val nVec = vec.numElements()
    var best = Double.MaxValue
    var bestCell = -1
    var c = 0
    while (c < nCells) {
      val cent = cells.getArray(c)
      if (cent.numElements() == nVec) {
        var acc = 0.0
        var i = 0
        var valid = true
        while (valid && i < nVec) {
          if (vec.isNullAt(i) || cent.isNullAt(i)) valid = false
          else {
            val d = vec.getDouble(i) - cent.getDouble(i)
            acc += d * d
            i += 1
          }
        }
        if (valid && acc < best) { best = acc; bestCell = c }
      }
      c += 1
    }
    if (bestCell < 0) null
    else org.apache.spark.sql.catalyst.InternalRow(bestCell, best)
  }

  def pqEncode(vec: Column, books: Column): Column =
    GraftColumnBridge.column(PqEncode(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(books)))

  def adcDist(codes: Column, tables: Column): Column =
    GraftColumnBridge.column(AdcDist(
      GraftColumnBridge.expression(codes), GraftColumnBridge.expression(tables)))

  /** Static (Java-callable from generated code): per-subspace argmin of
    * index-order (a-b)² sums, ties to the lowest cell. A subspace whose
    * slice runs past the vector's end, or any null element, yields code
    * -1 for that subspace (the fold's null-skip semantics: every cell's
    * distance is null, so the seed (-1) survives). */
  def encode(vec: ArrayData, books: ArrayData): GenericArrayData = {
    val m = books.numElements()
    val out = new Array[Any](m)
    val nVec = vec.numElements()
    var j = 0
    while (j < m) {
      val cells = books.getArray(j)
      val nCells = cells.numElements()
      var best = Double.MaxValue
      var bestCell = -1
      var c = 0
      while (c < nCells) {
        val cent = cells.getArray(c)
        val subDim = cent.numElements()
        val off = j * subDim
        if (off + subDim <= nVec) {
          var acc = 0.0
          var i = 0
          var valid = true
          while (valid && i < subDim) {
            if (vec.isNullAt(off + i) || cent.isNullAt(i)) valid = false
            else {
              val d = vec.getDouble(off + i) - cent.getDouble(i)
              acc += d * d
              i += 1
            }
          }
          if (valid && acc < best) { best = acc; bestCell = c }
        }
        c += 1
      }
      out(j) = bestCell
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Static: Σⱼ tables[j][codes[j]] in subspace order; null on any
    * missing/out-of-range lookup. */
  def adcDist(codes: ArrayData, tables: ArrayData): java.lang.Double = {
    val m = tables.numElements()
    if (codes.numElements() != m) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val row = tables.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      acc += row.getDouble(c)
      j += 1
    }
    acc
  }
}
