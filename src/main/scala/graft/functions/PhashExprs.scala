package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/** Native codegen'd perceptual-hash kernel: the aHash / dHash band
  * derivation of [[graft.operators.PerceptualHash]] — block-mean luma
  * cells, floor-mean threshold (aHash) or wrap gradient (dHash),
  * MSB-first 16-bit band packing — as ONE static array pass.
  *
  * The HOF formulation ([[graft.operators.PerceptualHash.ahashBands]])
  * is the readable reference shape, but HOF lambdas are
  * CodegenFallback AND don't CSE: every bit's `element_at(cells, …)`
  * re-evaluates the whole cell transform, so a 64-bit hash costs
  * ~10⁴ interpreted node evaluations per row (measured: 135 s for
  * 5 000 rows at sf0.1). This kernel computes the identical bands in
  * one O(pixels) loop — the [[GopherStats]]/[[PqExprs]] discipline:
  * static Java-callable helper + defineCodeGen + a property spec
  * pinning kernel ≡ HOF shape.
  */
case class PhashBands(child: Expression, w: Int, h: Int, grid: Int,
                      bandBits: Int, dhash: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"phash_bands expects array<bigint> pixels, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    PhashExprs.bands(input.asInstanceOf[ArrayData], w, h, grid, bandBits,
      dhash)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PhashExprs.bands($c, $w, $h, $grid, $bandBits, $dhash)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PhashExprs {

  private def make(pixels: Column, w: Int, h: Int, grid: Int,
                   bandBits: Int, dhash: Boolean): Column = {
    require(w > 0 && h > 0 && grid > 0, s"w=$w h=$h grid=$grid")
    require(w % grid == 0 && h % grid == 0,
      s"grid $grid must divide width $w and height $h")
    require((grid * grid) % bandBits == 0,
      s"bandBits $bandBits must divide ${grid * grid}")
    GraftColumnBridge.column(PhashBands(
      GraftColumnBridge.expression(pixels), w, h, grid, bandBits, dhash))
  }

  /** Native aHash bands — identical output contract to
    * [[graft.operators.PerceptualHash.ahashBands]]. */
  def ahashBands(pixels: Column, w: Int, h: Int, grid: Int = 8,
                 bandBits: Int = 16): Column =
    make(pixels, w, h, grid, bandBits, dhash = false)

  /** Native dHash (wrap-gradient) bands — identical output contract to
    * [[graft.operators.PerceptualHash.dhashBands]]. */
  def dhashBands(pixels: Column, w: Int, h: Int, grid: Int = 8,
                 bandBits: Int = 16): Column =
    make(pixels, w, h, grid, bandBits, dhash = true)

  /** Static (Java-callable from generated code): cells by integer block
    * mean, then threshold (aHash: cell >= floor-mean of all cells;
    * dHash: cell > right neighbour with wrap), then MSB-first packing
    * into (grid²/bandBits) band values. Exactly the
    * [[graft.operators.PerceptualHash]] arithmetic. */
  def bands(pixels: ArrayData, w: Int, h: Int, grid: Int, bandBits: Int,
            dhash: Boolean): GenericArrayData = {
    // a wrong-sized raster is a data-contract violation, not an index
    // accident — fail with the contract, not an opaque out-of-bounds
    if (pixels.numElements() != w * h)
      throw new IllegalArgumentException(
        s"phash_bands: raster has ${pixels.numElements()} pixels, " +
          s"declared ${w}x$h = ${w * h}; decode/resize upstream must " +
          "emit exactly the declared geometry")
    val bw = w / grid
    val bh = h / grid
    val nCells = grid * grid
    val cells = new Array[Long](nCells)
    var cellSum = 0L
    var c = 0
    while (c < nCells) {
      val cy = c / grid
      val cx = c % grid
      var s = 0L
      var i = 0
      while (i < bw * bh) {
        val py = cy * bh + i / bw
        val px = cx * bw + i % bw
        s += pixels.getLong(py * w + px)
        i += 1
      }
      cells(c) = s / (bw * bh)
      cellSum += cells(c)
      c += 1
    }
    val mean = cellSum / nCells
    val nBands = nCells / bandBits
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var v = 0L
      var j = 0
      while (j < bandBits) {
        val bitIdx = b * bandBits + j
        val bit =
          if (dhash) {
            val r = bitIdx / grid
            val col = bitIdx % grid
            if (cells(r * grid + col) > cells(r * grid + (col + 1) % grid))
              1L
            else 0L
          } else if (cells(bitIdx) >= mean) 1L else 0L
        v = v * 2 + bit
        j += 1
      }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }
}
