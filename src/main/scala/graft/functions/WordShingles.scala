package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT k-word shingles as ONE native scan — the feed of the whole
  * near-dup detector family (Jaccard / containment / MinHash-LSH postings,
  * decontamination grams). The HOF formulation
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(toks, i+1, k))))` is CodegenFallback end-to-end (ArrayFilter for
  * the token split, ArrayTransform + per-shingle `slice` allocation for
  * the windows), interpreted once per document over corpus-scale scans.
  * This expression tokenizes and emits distinct shingles in a single pass
  * over the raw UTF-8 bytes: one `getBytes` copy per row, one allocation
  * per DISTINCT shingle, fully codegen'd call site.
  *
  * EXACTLY equivalent (property-checked, and pinned by the six oracle
  * gates that consume it) to
  * `array_distinct(Dedup.shinglesFromTokens(TextAnalysis.tokens(text), k))`:
  *  - tokens are maximal runs of non-`[ \t\n\x0B\f\r]` bytes (Java `\s`
  *    without UNICODE_CHARACTER_CLASS — multi-byte UTF-8 sequences are
  *    all >= 0x80 and never split), the [[TokenCount]] argument;
  *  - >= k tokens → one shingle per window, joined by single spaces;
  *  - fewer → ONE shingle of all tokens joined (the empty string for a
  *    blank document), matching the HOF's `otherwise` branch;
  *  - distinct keeps FIRST-occurrence order (array_distinct's order).
  */
case class WordShingles(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(k >= 1, s"k=$k: shingle length must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingles(input.asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.shingles($c, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  def shingles(text: Column, k: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(text), k))

  /** ALL k-word windows in token order, repeats kept, and NO short-doc
    * fallback (fewer than k tokens → empty array — k=1 over a blank doc
    * emits nothing). This is the n-gram FEATURE shape (DSIR hashed grams,
    * count-based models), where multiplicity is the signal — unlike the
    * distinct POSTING shape above, where each (doc, shingle) must appear
    * once. */
  def allShingles(text: Column, k: Int): Column =
    GraftColumnBridge.column(
      WordShingles(GraftColumnBridge.expression(text), k, distinct = false))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Static (Java-callable from generated code): k-shingles in token
    * order — distinct-with-short-doc-fallback (the posting shape) or
    * all-windows (the feature shape; see [[allShingles]]). One byte copy
    * per row; each shingle is one exact-size byte array (token bytes +
    * single-space joints). */
  def shingles(s: UTF8String, k: Int, distinct: Boolean = true)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token byte ranges [start, end)
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
    def join(from: Int, until: Int): UTF8String = {
      // exact-size buffer: token bytes + one space between adjacent tokens
      var len = 0
      var t = from
      while (t < until) { len += ends(t) - starts(t); t += 1 }
      if (until > from) len += until - from - 1
      val out = new Array[Byte](len)
      var pos = 0
      t = from
      while (t < until) {
        if (t > from) { out(pos) = ' '; pos += 1 }
        val l = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), out, pos, l)
        pos += l
        t += 1
      }
      UTF8String.fromBytes(out)
    }
    if (!distinct) {
      val m = if (nTok >= k) nTok - k + 1 else 0
      val arr = new Array[Any](m)
      var w = 0
      while (w < m) { arr(w) = join(w, w + k); w += 1 }
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }
    val set = new java.util.LinkedHashSet[UTF8String]()
    if (nTok >= k) {
      var w = 0
      while (w <= nTok - k) { set.add(join(w, w + k)); w += 1 }
    } else set.add(join(0, nTok))
    val arr = new Array[Any](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}
