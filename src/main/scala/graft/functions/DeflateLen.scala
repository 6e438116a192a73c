package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string's UTF-8 bytes, as one
  * codegen'd scalar — the compressibility quality signal (deflate is
  * a crude language model: repetitive boilerplate compresses far
  * below natural prose, random/base64 spray barely compresses at
  * all; compression-ratio cuts appear in large-corpus quality
  * pipelines alongside the Gopher rules).
  *
  * Level 6 (zlib default), `nowrap = false`, single `deflate` drain —
  * deterministic for a fixed zlib build, which is what the JVM
  * bundles; the value is engine-specific byte accounting, so the
  * operator built on this is rows-gated (no SQL oracle) with the
  * spec asserting ordering properties and an independent local
  * recompute. A Deflater is allocated per call: the expression is
  * for doc-grain scans (hundreds of bytes to megabytes per row),
  * where the allocation is noise next to the compression itself.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(s: Any): Any =
    DeflateLen.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  /** Called from generated code. */
  def compute(s: UTF8String): Int = {
    val input = s.getBytes
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(input)
      d.finish()
      val buf = new Array[Byte](math.max(64, input.length + 64))
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Column wrapper. */
  def of(text: Column): Column =
    GraftColumnBridge.column(DeflateLen(GraftColumnBridge.expression(text)))
}
