package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution statistics as ONE native in-row scan —
  * [n_chars, n_distinct_chars, entropy_micro_nats] per document.
  *
  * Entropy per document is a pure function of the document, so the
  * explode → (doc, char) aggregate → rejoin formulation pays three
  * exchanges and a row blow-up of ×length for what a single pass over the
  * string computes in place (measured at sf0.1: 4.0 s exploded vs ~0.4 s
  * here). The scan walks CODE POINTS (surrogate pairs count once —
  * matching DuckDB/Python length semantics), builds a small open-addressed
  * count table, and folds Σ floor((c/n)·ln(n/c)·10⁶) with each term
  * floored to integer micro-nats — bit-identical to the SQL oracle's
  * formulation because floor pins the one ln() call per distinct char.
  *
  * Codegen'd via a static helper (the [[TokenCount]] pattern); the count
  * table is per-invocation (no shared state), sized to the document's
  * distinct-char count.
  */
case class CharEntropyStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropyStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyStats {

  /** Static (Java-callable from generated code): one pass over the code
    * points, then the micro-nat fold over the distinct-char counts. */
  def stats(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1L)) else slot(0) += 1
      n += 1
      i += Character.charCount(cp)
    }
    var entropy = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      entropy += math.floor(
        (c.toDouble / n) * math.log(n.toDouble / c) * 1e6).toLong
    }
    new GenericArrayData(Array(n, counts.size.toLong, entropy))
  }

  /** Column wrapper: array [n_chars, n_distinct_chars, entropy_micro_nats]. */
  def charEntropyStats(text: Column): Column =
    GraftColumnBridge.column(CharEntropyStats(
      GraftColumnBridge.expression(text)))
}
