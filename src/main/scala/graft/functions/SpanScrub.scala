package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Token-span scrubbing as ONE native pass — the apply half of
  * substring-level dedup ([[graft.operators.SubstringDedup.scrubSpans]]):
  * drop every token whose 0-based index falls inside any [s, e) span,
  * join the survivors with single spaces.
  *
  * The HOF formulation — `filter(toks, (t, i) => !exists(spans, sp => i
  * >= sp.s && i < sp.e))` — is CodegenFallback: Spark's lambda HOFs have
  * no `doGenCode`, so every token of every document walked the
  * interpreted `Expression.eval` tree (tens of expression nodes per
  * element). Beyond its own ~2× cost, that interpreter traffic turned
  * out to POISON THE JVM for the rest of a shared-session run: a bench
  * family that executed the HOF scrub before the flagship coding query
  * left `dsl_to_codes_alert` at a flat 2.9 s vs 0.9 s isolated —
  * reproducible, load-free, and permanent for the JVM's life. The
  * mega-polymorphic profiles the tree-walk feeds into shared call sites
  * (`Expression.eval`/`InternalRow` accessors) deoptimize the generic
  * paths other queries' codegen'd plans still cross at stage
  * boundaries. A single static method with a tight byte loop keeps the
  * whole call site monomorphic and codegen'd.
  *
  * EXACT equivalence to the HOF shape (property-checked, pinned by the
  * `dedup_substring_scrub` oracle gate):
  *  - tokens are maximal runs of non-`[ \t\n\x0B\f\r]` bytes — the
  *    [[TokenCount]]/[[WordShingles]] tokenizer;
  *  - spans may overlap and arrive in any order (membership is a pure
  *    any-of test); indices are token ordinals, end-exclusive;
  *  - no surviving tokens → empty string (matching `concat_ws`).
  * Callers coalesce a null span list (anti-join miss) to an empty array
  * — this expression is null-propagating like any binary expression.
  */
case class SpanScrub(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (StringType, ArrayType(StructType(
        Array(StructField(_, IntegerType, _, _),
              StructField(_, IntegerType, _, _))), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"span_scrub expects (string, array<struct<int,int>>), got ($l, $r)")
  }

  override protected def nullSafeEval(text: Any, spans: Any): Any =
    SpanScrub.scrub(text.asInstanceOf[UTF8String],
      spans.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, sp) => s"graft.functions.SpanScrub.scrub($t, $sp)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanScrub {

  def scrub(text: Column, spans: Column): Column =
    GraftColumnBridge.column(SpanScrub(
      GraftColumnBridge.expression(text),
      GraftColumnBridge.expression(spans)))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Static (Java-callable from generated code): tokenize `s`, drop
    * tokens inside any span, re-join with single spaces. One byte copy
    * in, one exact-size byte buffer out. */
  def scrub(s: UTF8String, spans: ArrayData): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) i += 1
      else {
        val st = i
        while (i < n && !isWs(bytes(i))) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st; ends(nTok) = i; nTok += 1
      }
    }
    val nSpans = spans.numElements()
    val ss = new Array[Int](nSpans)
    val es = new Array[Int](nSpans)
    var j = 0
    while (j < nSpans) {
      val row = spans.getStruct(j, 2)
      ss(j) = row.getInt(0); es(j) = row.getInt(1); j += 1
    }
    def kept(idx: Int): Boolean = {
      var m = 0
      while (m < nSpans) {
        if (idx >= ss(m) && idx < es(m)) return false
        m += 1
      }
      true
    }
    // exact-size output: surviving token bytes + one space between them
    var outLen = 0
    var nKept = 0
    var t = 0
    while (t < nTok) {
      if (kept(t)) { outLen += ends(t) - starts(t); nKept += 1 }
      t += 1
    }
    if (nKept > 1) outLen += nKept - 1
    val out = new Array[Byte](outLen)
    var pos = 0
    var emitted = 0
    t = 0
    while (t < nTok) {
      if (kept(t)) {
        if (emitted > 0) { out(pos) = ' '; pos += 1 }
        val l = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), out, pos, l)
        pos += l
        emitted += 1
      }
      t += 1
    }
    UTF8String.fromBytes(out)
  }
}
