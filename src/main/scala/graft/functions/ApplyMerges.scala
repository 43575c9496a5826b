package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** One greedy left-to-right pass applying a BATCH of BPE merges to a
  * piece array — the re-segmentation kernel of [[graft.operators
  * .BpeLearn]]. The HOF formulation (`aggregate` carrying the
  * accumulator array, with one CaseWhen branch per batch member probed
  * per element) is CodegenFallback: a batch-64 round walked the
  * interpreted expression tree 64 times per piece AND reallocated the
  * accumulator array per element — measured ~30% of a training round,
  * and the tail that kept larger batches from paying off.
  *
  * EXACT combined-scan semantics (property-checked; the sequential gate
  * oracles replay the same scan): the accumulator's LAST piece joins the
  * next element when they form a batch pair. Batch members have pairwise
  * distinct left AND right symbols (the trainer's greedy disjoint
  * acceptance), so any (last, next) matches at most ONE pair and the
  * scan is order-free; a merged symbol may itself merge again only when
  * a batch pair's left symbol equals it (possible when that symbol
  * already existed pre-batch — the chain fold behaves identically).
  * Lookup is a hash map keyed on the left symbol. */
case class ApplyMerges(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"apply_merges expects array<string>, got $t")
  }

  // left symbol → (right symbol, merged symbol); lefts are distinct by
  // the trainer's contract (enforced here — a duplicate left would make
  // "first match" depend on chain order)
  @transient private lazy val table: java.util.HashMap[UTF8String,
      (UTF8String, UTF8String)] = {
    val m = new java.util.HashMap[UTF8String, (UTF8String, UTF8String)]()
    merges.foreach { case (l, r) =>
      val prev = m.put(UTF8String.fromString(l),
        (UTF8String.fromString(r), UTF8String.fromString(l + r)))
      require(prev == null, s"apply_merges: duplicate left symbol '$l'")
    }
    m
  }

  def applyBatch(pieces: ArrayData): GenericArrayData = {
    val n = pieces.numElements()
    val out = new Array[AnyRef](n)
    var top = -1
    var i = 0
    while (i < n) {
      val x = pieces.getUTF8String(i)
      var merged: UTF8String = null
      if (top >= 0) {
        val hit = table.get(out(top))
        if (hit != null && hit._1.equals(x)) merged = hit._2
      }
      if (merged != null) out(top) = merged
      else { top += 1; out(top) = x }
      i += 1
    }
    val res = new Array[Any](top + 1)
    System.arraycopy(out, 0, res, 0, top + 1)
    new GenericArrayData(res)
  }

  override protected def nullSafeEval(input: Any): Any =
    applyBatch(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("applyMerges", this,
      classOf[ApplyMerges].getName)
    defineCodeGen(ctx, ev, c => s"$ref.applyBatch($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object ApplyMerges {
  def apply(pieces: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(new ApplyMerges(
      GraftColumnBridge.expression(pieces), merges))
}
