package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compression ratio of a document's UTF-8 bytes — the classic
  * repetitive-content quality signal (RedPajama-v2/Dolma publish it as a
  * per-document attribute): templated, looping, or keyword-stuffed text
  * compresses far below prose, catching patterns token-level repetition
  * counters miss. ratio = deflate(bytes).length / bytes.length at zlib
  * level 6 (raw stream, no header); empty text defines ratio 1.0.
  *
  * Native codegen'd expression (the [[Md5Prefix]] pattern): one
  * thread-local Deflater + scratch buffer per task thread, reset per row
  * — no per-row allocation beyond the input bytes. NO DuckDB oracle
  * exists (no SQL zlib), so the gate is a rows-only check and the
  * semantics are pinned by a direct java.util.zip reference spec; the
  * value is a pure function of the bytes and the fixed zlib level, so
  * any two JVM runs agree bit-for-bit. */
case class CompressRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"compress_ratio expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    CompressRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressRatio {

  /** Fixed zlib level — part of the signal's definition; changing it
    * changes every stored attribute, so treat like a hash constant. */
  val Level = 6

  def ratio(text: Column): Column =
    GraftColumnBridge.column(
      CompressRatio(GraftColumnBridge.expression(text)))

  private val deflaters = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(Level, true) // raw stream, no zlib header
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  /** Static (Java-callable from generated code). */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = scratch.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}
